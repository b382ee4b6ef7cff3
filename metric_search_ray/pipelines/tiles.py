"""Raster-tile <-> vector assignment.

A tile is a quadkey cell at a fixed resolution, exposed under its
row-major ``tile_id = iy * 2^res + ix`` alias (integer-exact, so the
DuckDB oracle reproduces assignments bit-for-bit).

- ``assign_tiles``: every image row -> its tile (stateless map_batches).
- ``tile_polygon_cover``: every (tile, polygon) pair whose closed tile
  box intersects the polygon — exact rectangle/polygon intersection
  (geom.rect_intersects_polygon).  Computed per polygon over its bbox's
  tile range; polygons are the small side, so this runs as a flat-map
  over the polygon table, never touching the image table.
- ``tiles_with_images``: grouped per-tile stats (image count) — the
  raster side of raster<->vector joins.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .. import cell as cellmod
from .. import geom
from ..stages import assign


def assign_tiles(points_ds, res: int):
    """Adds tile_id (and keeps lat/lon) — input needs lat_u/lon_u."""
    return points_ds.map_batches(lambda b: assign.assign_tile(b, res),
                                 batch_format="pyarrow", zero_copy_batch=True)


def tile_range_of_bbox(bbox: np.ndarray, res: int) -> tuple[int, int, int, int]:
    """Inclusive (ix0, iy0, ix1, iy1) tile range covering a lon/lat bbox."""
    n = 1 << res
    lon0, lat0, lon1, lat1 = bbox
    ix0 = int(np.floor((lon0 + 180.0) / 360.0 * n))
    ix1 = int(np.floor((lon1 + 180.0) / 360.0 * n))
    iy0 = int(np.floor((lat0 + 90.0) / 180.0 * n))
    iy1 = int(np.floor((lat1 + 90.0) / 180.0 * n))
    clamp = lambda v: max(0, min(n - 1, v))
    return clamp(ix0), clamp(iy0), clamp(ix1), clamp(iy1)


def polygon_tiles(ring: np.ndarray, res: int) -> np.ndarray:
    """Row-major tile ids of every tile whose closed box intersects ring."""
    n = 1 << res
    bbox = geom.ring_bbox(ring)
    ix0, iy0, ix1, iy1 = tile_range_of_bbox(bbox, res)
    out = []
    for iy in range(iy0, iy1 + 1):
        lat0 = -90.0 + 180.0 * iy / n
        lat1 = -90.0 + 180.0 * (iy + 1) / n
        for ix in range(ix0, ix1 + 1):
            lon0 = -180.0 + 360.0 * ix / n
            lon1 = -180.0 + 360.0 * (ix + 1) / n
            if geom.rect_intersects_polygon(lon0, lat0, lon1, lat1, ring):
                out.append(iy * n + ix)
    return np.asarray(out, np.int64)


def tile_polygon_cover(polygon_layer: dict, res: int) -> pa.Table:
    """(tile_id, polygon_id) covering pairs for the whole layer."""
    tids, pids = [], []
    for pid, ring in zip(polygon_layer["polygon_id"], polygon_layer["ring"]):
        t = polygon_tiles(np.asarray(ring, np.float64), res)
        tids.append(t)
        pids.extend([pid] * len(t))
    tids = np.concatenate(tids) if tids else np.empty(0, np.int64)
    return pa.table({
        "tile_id": pa.array(tids, pa.int64()),
        "polygon_id": pa.array(pids, pa.string()),
    })


def tiles_with_images(points_ds, res: int, driver_combine: bool | None = None):
    """Per-tile image counts: the raster aggregation side.

    Pre-aggregates inside map_batches (one row per tile per batch) —
    the partial/combiner pattern from SURVEY.md §7.2.  The final
    combine is bounded by #tiles = 4^res, so for res <= 8 (<= 65k
    tiles) the partials are merged on the driver with one vectorized
    bincount instead of paying a groupby shuffle; finer resolutions
    fall back to the distributed groupby.
    """
    def partial_counts(batch: pa.Table) -> pa.Table:
        t = batch.column("tile_id").to_numpy()
        vals, cnt = np.unique(t, return_counts=True)
        return pa.table({"tile_id": pa.array(vals, pa.int64()),
                         "partial_n": pa.array(cnt, pa.int64())})

    partials = assign_tiles(points_ds, res).map_batches(
        partial_counts, batch_format="pyarrow", zero_copy_batch=True)
    if driver_combine is None:
        driver_combine = res <= 8
    if driver_combine:
        import ray.data as rd
        tids, cnts = [], []
        for b in partials.iter_batches(batch_format="pyarrow", batch_size=None):
            tids.append(b.column("tile_id").to_numpy())
            cnts.append(b.column("partial_n").to_numpy())
        tids = np.concatenate(tids) if tids else np.empty(0, np.int64)
        cnts = np.concatenate(cnts) if cnts else np.empty(0, np.int64)
        # one vectorized combine: sum partial counts per distinct tile
        keys, inv = np.unique(tids, return_inverse=True)
        sums = np.zeros(len(keys), np.int64)
        np.add.at(sums, inv, cnts)
        return rd.from_arrow(pa.table({
            "tile_id": pa.array(keys, pa.int64()),
            "count()": pa.array(sums, pa.int64()),
        }))
    from .fastagg import sort_block_aggregate
    return sort_block_aggregate(partials, "tile_id",
                                {"count()": ("partial_n", "sum")})


def quadkey_pyramid(points_ds, res: int, driver_combine: bool | None = None):
    """Multi-resolution tile-count pyramid: point counts aggregated at
    EVERY quadkey prefix level 1..res — the hierarchical drill-down a
    map dashboard reads (zoom L shows the level-L counts).

    One pass computes the full-resolution quadkey per point
    (cell.quadkey_num, pure int64), then each batch emits partial
    counts per (level, prefix) — prefixes are integer digit
    truncations (qnum // 10^(res-L)), so no strings exist until the
    final bounded result.  Output size is bounded by
    sum_L min(4^L, #occupied tiles), independent of point count; for
    res <= 8 the partials combine on the driver with one vectorized
    pass (no shuffle), finer resolutions fall back to the distributed
    sort-block aggregate.

    Returns rows (level, quadkey VARCHAR, n).
    """
    pow10 = np.array([10**k for k in range(res + 1)], np.int64)

    def partial(batch: pa.Table) -> pa.Table:
        lat_u = batch.column("lat_u").to_numpy()
        lon_u = batch.column("lon_u").to_numpy()
        q = cellmod.quadkey_num(lat_u, lon_u, res)
        keys, counts = [], []
        for lvl in range(1, res + 1):
            pref = q // pow10[res - lvl]
            vals, cnt = np.unique(pref, return_counts=True)
            # pack (level, prefix) in one int64: level * 10^res + prefix
            keys.append(np.int64(lvl) * pow10[res] + vals)
            counts.append(cnt)
        return pa.table({
            "lk": pa.array(np.concatenate(keys), pa.int64()),
            "partial_n": pa.array(np.concatenate(counts), pa.int64()),
        })

    partials = points_ds.map_batches(partial, batch_format="pyarrow",
                                     zero_copy_batch=True)
    if driver_combine is None:
        driver_combine = res <= 8

    def unpack(lk: np.ndarray, n: np.ndarray) -> pa.Table:
        lvl = lk // pow10[res]
        pref = lk % pow10[res]
        qk = [str(p).zfill(int(l)) for p, l in zip(pref, lvl)]
        return pa.table({
            "level": pa.array(lvl, pa.int64()),
            "quadkey": pa.array(qk, pa.string()),
            "n": pa.array(n, pa.int64()),
        })

    if driver_combine:
        import ray.data as rd
        lks, cnts = [], []
        for b in partials.iter_batches(batch_format="pyarrow", batch_size=None):
            lks.append(b.column("lk").to_numpy())
            cnts.append(b.column("partial_n").to_numpy())
        lks = np.concatenate(lks) if lks else np.empty(0, np.int64)
        cnts = np.concatenate(cnts) if cnts else np.empty(0, np.int64)
        keys, inv = np.unique(lks, return_inverse=True)
        sums = np.zeros(len(keys), np.int64)
        np.add.at(sums, inv, cnts)
        return rd.from_arrow(unpack(keys, sums))

    from .fastagg import sort_block_aggregate
    combined = sort_block_aggregate(partials, "lk", {"n": ("partial_n", "sum")})
    return combined.map_batches(
        lambda b: unpack(b.column("lk").to_numpy(), b.column("n").to_numpy()),
        batch_format="pyarrow", zero_copy_batch=True)


def focal_sum(points_ds, res: int, driver_combine: bool | None = None):
    """Focal (neighborhood) statistics over the tile-count raster: for
    every occupied tile, the sum of point counts in its 3x3 tile
    neighborhood (edge tiles see a clipped window, no wraparound) —
    the raster map-algebra smoothing that density/hotspot maps read.

    Counts are map-side partials bounded by occupied tiles.  For
    res <= 8 the stencil runs on the driver over a dense 2^res x 2^res
    int64 grid (<= 65k cells — one vectorized pad+shift pass); finer
    resolutions use the distributed form: each tile emits its count
    under its 9 neighbor keys, a sort-block aggregate sums them, and a
    hash join restricts to occupied tiles.  Both paths are pure int64
    and return identical rows.

    Returns (tile_id, n, focal_n) for occupied tiles.
    """
    m = 1 << res

    def partial(batch: pa.Table) -> pa.Table:
        t = cellmod.tile_of(batch.column("lat_u").to_numpy(),
                            batch.column("lon_u").to_numpy(), res)
        vals, cnt = np.unique(t, return_counts=True)
        return pa.table({"tile_id": pa.array(vals, pa.int64()),
                         "partial_n": pa.array(cnt, pa.int64())})

    partials = points_ds.map_batches(partial, batch_format="pyarrow",
                                     zero_copy_batch=True)
    if driver_combine is None:
        driver_combine = res <= 8

    if driver_combine:
        import ray.data as rd
        grid = np.zeros((m, m), np.int64)
        for b in partials.iter_batches(batch_format="pyarrow",
                                       batch_size=None):
            t = b.column("tile_id").to_numpy()
            c = b.column("partial_n").to_numpy()
            np.add.at(grid, (t // m, t % m), c)
        pad = np.pad(grid, 1)
        focal = sum(pad[1 + dy:1 + dy + m, 1 + dx:1 + dx + m]
                    for dy in (-1, 0, 1) for dx in (-1, 0, 1))
        iy, ix = np.nonzero(grid)
        return rd.from_arrow(pa.table({
            "tile_id": pa.array(iy * m + ix, pa.int64()),
            "n": pa.array(grid[iy, ix], pa.int64()),
            "focal_n": pa.array(focal[iy, ix], pa.int64()),
        }))

    from .fastagg import sort_block_aggregate
    from .joins import shuffle_hash_join
    counts = sort_block_aggregate(partials, "tile_id",
                                  {"n": ("partial_n", "sum")})

    def shift9(b: pa.Table) -> pa.Table:
        t = b.column("tile_id").to_numpy()
        n = b.column("n").to_numpy()
        ix, iy = t % m, t // m
        out_t, out_n = [], []
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                jx, jy = ix + dx, iy + dy
                ok = (jx >= 0) & (jx < m) & (jy >= 0) & (jy < m)
                out_t.append(jy[ok] * m + jx[ok])
                out_n.append(n[ok])
        return pa.table({"tile_id": pa.array(np.concatenate(out_t), pa.int64()),
                         "sh_n": pa.array(np.concatenate(out_n), pa.int64())})

    shifted = counts.map_batches(shift9, batch_format="pyarrow",
                                 zero_copy_batch=True)
    focal = sort_block_aggregate(shifted, "tile_id",
                                 {"focal_n": ("sh_n", "sum")})
    return shuffle_hash_join(counts, focal, "tile_id", ["n"], ["focal_n"],
                             how="inner")


def raster_vector_assignment(points_ds, polygon_layer: dict, res: int):
    """Join images -> tiles -> covering polygons.

    The (tile, polygon) cover table is tiny (small side) so the join is
    a broadcast hash lookup inside map_batches — no shuffle of the
    image table beyond the tile assignment column add.
    Output: (image_id, tile_id, polygon_id) rows (inner).
    """
    import ray

    cover = tile_polygon_cover(polygon_layer, res)
    lookup: dict[int, list[str]] = {}
    for t, p in zip(cover.column("tile_id").to_pylist(),
                    cover.column("polygon_id").to_pylist()):
        lookup.setdefault(t, []).append(p)
    ref = ray.put(lookup)

    class TileJoin:
        def __init__(self):
            self.lookup = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            tids = batch.column("tile_id").to_numpy()
            ids = batch.column("image_id").to_numpy(zero_copy_only=False)
            out_i, out_t, out_p = [], [], []
            for i, t in enumerate(tids):
                for p in self.lookup.get(int(t), ()):
                    out_i.append(ids[i])
                    out_t.append(int(t))
                    out_p.append(p)
            return pa.table({
                "image_id": pa.array(out_i, pa.string()),
                "tile_id": pa.array(out_t, pa.int64()),
                "polygon_id": pa.array(out_p, pa.string()),
            })

    return assign_tiles(points_ds, res).map_batches(
        TileJoin, batch_format="pyarrow", concurrency=2, num_cpus=1)


def zonal_stats(points_ds, polygon_layer: dict, res: int, value_col: str):
    """Zonal statistics: per-polygon aggregates of point values over the
    polygon's raster-tile cover (count + sum; the classic raster zonal
    operation, computed in tile space rather than by point-in-polygon).

    Scale shape: the (tile, polygon) cover is the broadcast small side
    (bounded by n_polygons x bbox tiles); points stream through one
    map_batches that emits PARTIAL per-polygon aggregates per batch
    (combiner pattern), and the final combine is a driver-side
    vectorized merge bounded by n_polygons — no groupby shuffle of the
    point table.  Polygons whose cover holds no points still emit a
    row (n_points = 0), so the output row count equals the layer size.

    Output: (polygon_id, n_tiles, n_points, sum_val) pandas frame —
    small by construction (one row per polygon).
    """
    import ray

    cover = tile_polygon_cover(polygon_layer, res)
    pids = list(dict.fromkeys(polygon_layer["polygon_id"]))
    pid_idx = {p: i for i, p in enumerate(pids)}
    n_poly = len(pids)
    lut: dict[int, np.ndarray] = {}
    n_tiles = np.zeros(n_poly, np.int64)
    for t, p in zip(cover.column("tile_id").to_pylist(),
                    cover.column("polygon_id").to_pylist()):
        lut.setdefault(int(t), []).append(pid_idx[p])
        n_tiles[pid_idx[p]] += 1
    lut = {t: np.asarray(v, np.int64) for t, v in lut.items()}
    ref = ray.put(lut)

    def partial(batch: pa.Table) -> pa.Table:
        table = ray.get(ref)
        tids = batch.column("tile_id").to_numpy()
        vals = batch.column(value_col).to_numpy(zero_copy_only=False)
        cnt = np.zeros(n_poly, np.int64)
        tot = np.zeros(n_poly, np.int64)
        # group batch rows by tile once; accumulate per covering polygon
        uniq, inv = np.unique(tids, return_inverse=True)
        sums = np.zeros(len(uniq), np.int64)
        np.add.at(sums, inv, vals.astype(np.int64))
        counts = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
        for ui, t in enumerate(uniq):
            hit = table.get(int(t))
            if hit is not None:
                cnt[hit] += counts[ui]
                tot[hit] += sums[ui]
        nz = np.flatnonzero(cnt)
        return pa.table({
            "pidx": pa.array(nz, pa.int64()),
            "n_partial": pa.array(cnt[nz], pa.int64()),
            "sum_partial": pa.array(tot[nz], pa.int64()),
        })

    partials = assign_tiles(points_ds, res).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True)
    n_points = np.zeros(n_poly, np.int64)
    sum_val = np.zeros(n_poly, np.int64)
    for b in partials.iter_batches(batch_format="pyarrow", batch_size=None):
        idx = b.column("pidx").to_numpy()
        np.add.at(n_points, idx, b.column("n_partial").to_numpy())
        np.add.at(sum_val, idx, b.column("sum_partial").to_numpy())
    import pandas as pd
    return pd.DataFrame({"polygon_id": pids, "n_tiles": n_tiles,
                         "n_points": n_points, "sum_val": sum_val})


def tile_mosaic(images_ds, res: int, thumb: int = 8,
                concurrency: int = 4, batch_size: int = 256):
    """Per-tile mean thumbnail over geotagged images (map-tile mosaic
    build): decode -> gray -> bilinear thumb x thumb -> integer-rounded
    pixel grid, then per-tile pixel-sum partials inside the actor pool
    and an O(n_tiles x thumb^2) driver combine.  The heavy side (image
    bytes) streams once and never shuffles; only (tile, 64 sums)
    partials leave each task.

    Determinism: per-pixel values are ``rint`` int64 before summation,
    so the distributed result equals a serial replay exactly (same
    bit-identical ``_resize_batch`` kernel, integer accumulation).

    Output: pandas (tile_id, n_images, pix: list<int64> of thumb*thumb
    sums) — mean pixel = pix / n_images.
    """
    from collections import defaultdict

    from .. import codecs
    from ..phash import _resize_batch, to_gray
    from ..stages import assign

    t2 = thumb * thumb

    class MosaicPartial:
        def __call__(self, batch: pa.Table) -> pa.Table:
            batch = assign.geotag(batch)
            batch = assign.assign_tile(batch, res)
            bufs = batch.column("bytes").to_pylist()
            fmts = batch.column("fmt").to_pylist()
            tids = batch.column("tile_id").to_numpy()
            pix = codecs.decode_many(bufs, fmts)
            groups: dict = defaultdict(list)
            thumbs = np.empty((len(pix), t2), np.int64)
            for i, p in enumerate(pix):
                g = to_gray(p)
                groups[g.shape].append(i)
                pix[i] = g
            for shape, idxs in groups.items():
                stack = np.stack([pix[i] for i in idxs])
                r = _resize_batch(stack.astype(np.float64), thumb, thumb)
                thumbs[np.asarray(idxs)] = np.rint(r).astype(
                    np.int64).reshape(len(idxs), t2)
            uniq, inv = np.unique(tids, return_inverse=True)
            sums = np.zeros((len(uniq), t2), np.int64)
            np.add.at(sums, inv, thumbs)
            cnt = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
            return pa.table({
                "tile_id": pa.array(uniq, pa.int64()),
                "n_partial": pa.array(cnt, pa.int64()),
                "pix": pa.FixedSizeListArray.from_arrays(
                    pa.array(sums.ravel(), pa.int64()), t2),
            })

    partials = images_ds.map_batches(
        MosaicPartial, batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, num_cpus=1)
    acc: dict[int, tuple] = {}
    total_n: dict[int, int] = {}
    for b in partials.iter_batches(batch_format="pyarrow", batch_size=None):
        tid = b.column("tile_id").to_numpy()
        cnt = b.column("n_partial").to_numpy()
        pix = np.stack(b.column("pix").to_numpy(zero_copy_only=False))
        for j, t in enumerate(tid):
            t = int(t)
            if t in acc:
                acc[t] = acc[t] + pix[j]
                total_n[t] += int(cnt[j])
            else:
                acc[t] = pix[j].copy()
                total_n[t] = int(cnt[j])
    import pandas as pd
    keys = sorted(acc)
    return pd.DataFrame({
        "tile_id": np.asarray(keys, np.int64),
        "n_images": np.asarray([total_n[k] for k in keys], np.int64),
        "pix": [acc[k] for k in keys],
    })


def tile_cover_areas(polygon_layer: dict, res: int,
                     rings_in_microdegrees: bool = False) -> pa.Table:
    """(polygon_id, tile_id, area_u2) — the area-weighted refinement of
    ``tile_polygon_cover``: for every covering tile, the EXACT overlap
    area between the polygon and the tile box, in square microdegrees.

    Exactness contract: the clip runs in TILE-LOCAL microdegree
    coordinates (ring*1e6 minus the tile origin), so for axis-aligned
    rings every vertex is an exact double and the shoelace sum stays
    far below 2^53 at res >= 4 — the result is bit-equal to the SQL
    width x height expression over the same integers.  General
    (non-axis-aligned) rings get correct floating-point areas with
    ordinary rounding, tested against numpy references.

    Driver-side like tile_polygon_cover (the layer is the small side);
    output is the broadcastable cover table for area-weighted zonal
    aggregation."""
    n = 1 << res
    wx = 360e6 / n   # exact doubles (power-of-two division)
    wy = 180e6 / n
    tids, pids, areas = [], [], []
    for pid, ring in zip(polygon_layer["polygon_id"],
                         polygon_layer["ring"]):
        # degree rings pay one inexact *1e6 scaling; callers who hold
        # exact microdegree coordinates pass them directly to keep the
        # bit-exact contract (deg/1e6*1e6 double-rounds off by ~1 ulp)
        if rings_in_microdegrees:
            ring_u = np.asarray(ring, np.float64)
            bbox = geom.ring_bbox(ring_u / 1e6)
        else:
            ring_u = np.asarray(ring, np.float64) * 1e6
            bbox = geom.ring_bbox(np.asarray(ring, np.float64))
        ix0, iy0, ix1, iy1 = tile_range_of_bbox(bbox, res)
        for iy in range(iy0, iy1 + 1):
            ty0 = -90e6 + iy * wy
            for ix in range(ix0, ix1 + 1):
                tx0 = -180e6 + ix * wx
                local = ring_u - np.array([tx0, ty0])
                pts = geom.clip_ring_rect(local, 0.0, 0.0, wx, wy)
                a = geom.ring_area(pts)
                if a > 0.0:
                    tids.append(iy * n + ix)
                    pids.append(pid)
                    areas.append(a)
    return pa.table({
        "tile_id": pa.array(np.asarray(tids, np.int64), pa.int64()),
        "polygon_id": pa.array(pids, pa.string()),
        "area_u2": pa.array(np.asarray(areas, np.float64), pa.float64()),
    })


def raster_convolve(points_ds, res: int, stencil: "np.ndarray",
                    driver_combine: bool | None = None):
    """Weighted raster convolution over the tile-count raster — the
    general map-algebra focal operator (focal_sum is the all-ones 3x3
    case): for every occupied tile, sum(w[dy, dx] * count[tile+d])
    over an ODD-sided integer stencil.  Gaussian-ish kernels give KDE
    heatmaps; difference kernels give edge/gradient maps.

    Same two exact paths as focal_sum: a dense driver pad+shift for
    res <= 8 (counts are bounded by occupied tiles), else each tile
    scatters w * n under its shifted neighbor keys and one sort-block
    aggregate sums them.  Pure int64, identical rows either way.

    Returns (tile_id, n, conv_n) for occupied tiles.
    """
    stencil = np.asarray(stencil, np.int64)
    if stencil.ndim != 2 or stencil.shape[0] % 2 == 0 \
            or stencil.shape[1] % 2 == 0:
        raise ValueError("stencil must be 2-D with odd side lengths")
    ry, rx = stencil.shape[0] // 2, stencil.shape[1] // 2
    m = 1 << res

    def partial(batch: pa.Table) -> pa.Table:
        t = cellmod.tile_of(batch.column("lat_u").to_numpy(),
                            batch.column("lon_u").to_numpy(), res)
        vals, cnt = np.unique(t, return_counts=True)
        return pa.table({"tile_id": pa.array(vals, pa.int64()),
                         "partial_n": pa.array(cnt, pa.int64())})

    partials = points_ds.map_batches(partial, batch_format="pyarrow",
                                     zero_copy_batch=True)
    if driver_combine is None:
        driver_combine = res <= 8

    if driver_combine:
        import ray.data as rd
        grid = np.zeros((m, m), np.int64)
        for b in partials.iter_batches(batch_format="pyarrow",
                                       batch_size=None):
            t = b.column("tile_id").to_numpy()
            c = b.column("partial_n").to_numpy()
            np.add.at(grid, (t // m, t % m), c)
        pad = np.pad(grid, (ry, rx) if ry == rx else ((ry, ry), (rx, rx)))
        conv = np.zeros((m, m), np.int64)
        for dy in range(-ry, ry + 1):
            for dx in range(-rx, rx + 1):
                w = int(stencil[dy + ry, dx + rx])
                if w == 0:
                    continue
                # output[y,x] += w * grid[y+dy, x+dx]
                conv += w * pad[ry + dy:ry + dy + m, rx + dx:rx + dx + m]
        iy, ix = np.nonzero(grid)
        return rd.from_arrow(pa.table({
            "tile_id": pa.array(iy * m + ix, pa.int64()),
            "n": pa.array(grid[iy, ix], pa.int64()),
            "conv_n": pa.array(conv[iy, ix], pa.int64()),
        }))

    from .fastagg import sort_block_aggregate
    from .joins import shuffle_hash_join
    counts = sort_block_aggregate(partials, "tile_id",
                                  {"n": ("partial_n", "sum")})

    def scatter(b: pa.Table) -> pa.Table:
        t = b.column("tile_id").to_numpy()
        n = b.column("n").to_numpy()
        ix, iy = t % m, t // m
        out_t, out_n = [], []
        for dy in range(-ry, ry + 1):
            for dx in range(-rx, rx + 1):
                # a source tile at (ix, iy) contributes w[dy,dx] to the
                # OUTPUT tile at (ix - dx, iy - dy), so output[o] =
                # sum w[d] * grid[o + d] — the same cross-correlation
                # the dense driver path computes
                w = int(stencil[dy + ry, dx + rx])
                if w == 0:
                    continue
                jx, jy = ix - dx, iy - dy
                ok = (jx >= 0) & (jx < m) & (jy >= 0) & (jy < m)
                out_t.append(jy[ok] * m + jx[ok])
                out_n.append(w * n[ok])
        if not out_t:
            return pa.table({"tile_id": pa.array([], pa.int64()),
                             "sh_n": pa.array([], pa.int64())})
        return pa.table({"tile_id": pa.array(np.concatenate(out_t), pa.int64()),
                         "sh_n": pa.array(np.concatenate(out_n), pa.int64())})

    shifted = counts.map_batches(scatter, batch_format="pyarrow",
                                 zero_copy_batch=True)
    conv = sort_block_aggregate(shifted, "tile_id",
                                {"conv_n": ("sh_n", "sum")})
    # LEFT join: an occupied tile can receive zero stencil contributions
    # (e.g. a zero-center gradient stencil over an isolated tile) — the
    # dense driver path emits it with conv_n=0, so the distributed path
    # must too.  Coalesce the no-match nulls to 0 to keep both paths
    # row-identical.
    joined = shuffle_hash_join(counts, conv, "tile_id", ["n"], ["conv_n"],
                               how="left")

    def fill0(b: pa.Table) -> pa.Table:
        c = b.column("conv_n")
        if c.null_count:
            b = b.set_column(b.schema.get_field_index("conv_n"), "conv_n",
                             pc.fill_null(c, 0))
        return b

    return joined.map_batches(fill0, batch_format="pyarrow",
                              zero_copy_batch=True)
