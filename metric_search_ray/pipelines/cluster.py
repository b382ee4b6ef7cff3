"""Distribution-quantile clustering over the partitioned index.

Distributed form of the reference's ``clustering`` entry point
(details/tree.cpp:1354-1430): quantile-bucket neighborhoods around an
anchor.  Partitioning assumption (documented per SURVEY.md): the
neighborhood walk runs WITHIN the anchor's (cell, salt) partition tree
— the cell lattice is the level hierarchy above the per-cell trees, so
a cell is the natural neighborhood scope; quantile sizes are taken
against the partition size, exactly like the reference sizes buckets
against its (single) tree size (tree.cpp:1387-1405).

``cluster_all_partitions`` fans the same walk over every partition in
parallel (one task per checkpoint file — embarrassingly parallel, no
shuffle) and returns a (cell, salt, image_id, bucket) Dataset.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .. import cell as cellmod
from ..metrics import PlanarDeg
from . import build as buildmod


def cluster_partition(ckpt_dir: str, cell_id: int, salt: int,
                      distribution, center: tuple[float, float]) -> list[list[str]]:
    """Quantile buckets of image_ids around (lat, lon) center in one
    partition — the direct port of tree.clustering."""
    path = buildmod.part_path(ckpt_dir, cell_id, salt)
    tree, tbl = buildmod.load_partition_tree(path, metric=PlanarDeg())
    rid = tbl.column("row_id").to_numpy()
    raw = tbl.column("image_id").to_numpy(zero_copy_only=False)
    ids = np.empty(len(rid), dtype=object)
    ids[rid] = raw
    buckets = tree._clustering_impl(list(distribution), np.asarray(center, np.float64),
                                    radius=_anchor_radius(tree, center))
    return [[str(ids[i]) for i in b] for b in buckets]


def _anchor_radius(tree, center) -> float:
    # single-anchor case: DBL_MIN like the reference (tree.cpp:1200-1239)
    return 2.2250738585072014e-308


def clustering(ckpt_dir: str, distribution, center: tuple[float, float],
               anchors: list[tuple[float, float]] | None = None) -> list[list[str]]:
    """Reference-shaped entry: validate distribution, compute the anchor
    radius from the anchor point set, locate the anchor's partition,
    walk its tree.  Multi-anchor radius = max dist from the first anchor
    (tree.cpp:1213-1226)."""
    from ..covertree import _is_distribution_ok

    _is_distribution_ok(list(distribution))
    radius = _anchor_radius(None, center)
    if anchors:
        c0 = np.asarray(anchors[0], np.float64)
        radius = max((float(np.sqrt(((np.asarray(a) - c0) ** 2).sum())) for a in anchors[1:]),
                     default=radius)
        center = tuple(c0)
    manifest = buildmod.load_manifest(ckpt_dir)
    by_cell = buildmod.cells_in_manifest(manifest)
    res = int(cellmod.cell_res(manifest.column("cell").to_numpy()[:1])[0])
    lat_u, lon_u = cellmod.latlon_to_units(np.asarray([center[0]]), np.asarray([center[1]]))
    home = int(cellmod.cell_of(lat_u, lon_u, res)[0])
    if home not in by_cell:
        # nearest nonempty cell hosts the anchor (nn across cells)
        cells = np.asarray(sorted(by_cell), np.int64)
        lbs = cellmod.point_cell_min_dist_deg(center[0], center[1], cells)
        home = int(cells[np.argmin(lbs)])
    # anchor partition: the salt whose tree holds the nn of center
    best = None
    for salt, path in by_cell[home]:
        tree, tbl = buildmod.load_partition_tree(path, metric=PlanarDeg())
        _, d = tree.nn(np.asarray(center, np.float64))
        if best is None or d < best[1]:
            best = (salt, d, tree, tbl)
    salt, _, tree, tbl = best
    rid = tbl.column("row_id").to_numpy()
    raw = tbl.column("image_id").to_numpy(zero_copy_only=False)
    ids = np.empty(len(rid), dtype=object)
    ids[rid] = raw
    buckets = tree._clustering_impl(list(distribution), np.asarray(center, np.float64), radius)
    return [[str(ids[i]) for i in b] for b in buckets]


def cluster_all_partitions(ckpt_dir: str, distribution):
    """Run the quantile walk in every partition in parallel (anchor =
    partition tree root).  Returns Dataset (cell, salt, image_id, bucket)."""
    import ray.data as rd

    manifest = buildmod.load_manifest(ckpt_dir)
    parts = rd.from_arrow(manifest.select(["cell", "salt", "path"]))
    dist = list(distribution)

    def one(batch: pa.Table) -> pa.Table:
        out_c, out_s, out_i, out_b = [], [], [], []
        for cell_id, salt, path in zip(batch.column("cell").to_pylist(),
                                       batch.column("salt").to_pylist(),
                                       batch.column("path").to_pylist()):
            tree, tbl = buildmod.load_partition_tree(path, metric=PlanarDeg())
            rid = tbl.column("row_id").to_numpy()
            raw = tbl.column("image_id").to_numpy(zero_copy_only=False)
            ids = np.empty(len(rid), dtype=object)
            ids[rid] = raw
            center = np.asarray(tree.root.data, np.float64)
            buckets = tree._clustering_impl(dist, center,
                                            2.2250738585072014e-308)
            for b, bucket in enumerate(buckets):
                for i in bucket:
                    out_c.append(cell_id)
                    out_s.append(salt)
                    out_i.append(str(ids[i]))
                    out_b.append(b)
        return pa.table({
            "cell": pa.array(out_c, pa.int64()),
            "salt": pa.array(out_s, pa.int64()),
            "image_id": pa.array(out_i, pa.string()),
            "bucket": pa.array(out_b, pa.int64()),
        })

    return parts.map_batches(one, batch_format="pyarrow", batch_size=4)


def grid_density_clusters(ds, res: int, min_pts: int,
                          lat_col: str = "lat_u", lon_col: str = "lon_u",
                          num_partitions: int = 8):
    """Grid-density clustering (DBSCAN over the tile raster): cells
    holding >= min_pts points are CORE; core cells that touch
    (8-adjacency) merge into one cluster; the cluster id is the MIN
    tile id of the component (deterministic, partitioning-free).
    Sub-threshold cells are noise and appear in no cluster — the grid
    variant of DBSCAN's border-point simplification, documented.

    Shape (every step bounded by OCCUPIED cells <= 4^res, never by
    points):
      1. map-side tile counts (one grouped aggregate);
      2. core filter;
      3. adjacency WITHOUT broadcasting the cell set: every core cell
         emits (key=neighbor, src=self) probes plus one (key=self)
         anchor row; a groupby(key) turns probe+anchor co-presence
         into an edge — cells are their own hash index;
      4. distributed min-label connected components
         (graph.connected_components_ray, label-of-label squaring);
      5. one grouped (min label, sum n) merge that also restores
         isolated core cells as singleton clusters.

    Output: (tile_id, cluster_id, n_points) per core cell.
    """
    import pyarrow.compute as pc
    from .fastagg import sort_block_aggregate
    from ..graph import connected_components_ray
    from .. import cell as cellmod

    n_side = np.int64(1) << np.int64(res)

    def tile_stage(b: pa.Table) -> pa.Table:
        lat = b.column(lat_col).to_numpy().astype(np.int64, copy=False)
        lon = b.column(lon_col).to_numpy().astype(np.int64, copy=False)
        return pa.table({
            "tile": pa.array(cellmod.tile_of(lat, lon, res), pa.int64()),
        })

    counts = sort_block_aggregate(
        ds.select_columns([lat_col, lon_col]).map_batches(
            tile_stage, batch_format="pyarrow", zero_copy_batch=True),
        "tile", {"n": (None, "count")})
    core = counts.map_batches(
        lambda b: b.filter(pc.greater_equal(b.column("n"),
                                            pa.scalar(min_pts))),
        batch_format="pyarrow").materialize()

    def probes(b: pa.Table) -> pa.Table:
        t = b.column("tile").to_numpy()
        ix = t % n_side
        iy = t // n_side
        keys, srcs, anch = [t], [t], [np.ones(len(t), np.int8)]
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                if dx == 0 and dy == 0:
                    continue
                jx, jy = ix + dx, iy + dy
                ok = ((jx >= 0) & (jx < n_side)
                      & (jy >= 0) & (jy < n_side))
                keys.append(jy[ok] * n_side + jx[ok])
                srcs.append(t[ok])
                anch.append(np.zeros(int(ok.sum()), np.int8))
        return pa.table({
            "key": pa.array(np.concatenate(keys), pa.int64()),
            "src": pa.array(np.concatenate(srcs), pa.int64()),
            "anchor": pa.array(np.concatenate(anch), pa.int8()),
        })

    def edges_of_key(g: pa.Table) -> pa.Table:
        anchor = g.column("anchor").to_numpy()
        if not (anchor == 1).any():  # key is not a core cell
            return pa.table({"src": pa.array([], pa.int64()),
                             "dst": pa.array([], pa.int64())})
        key = g.column("key")[0].as_py()
        srcs = g.column("src").to_numpy()[anchor == 0]
        return pa.table({
            "src": pa.array(np.full(len(srcs), key, np.int64)),
            "dst": pa.array(srcs, pa.int64()),
        })

    edges = core.map_batches(probes, batch_format="pyarrow").groupby(
        "key").map_groups(edges_of_key, batch_format="pyarrow")
    edges = edges.materialize()
    has_edges = edges.count() > 0
    if has_edges:
        labels = connected_components_ray(edges,
                                          num_partitions=num_partitions)
        lbl_rows = labels.map_batches(
            lambda b: pa.table({
                "tile": b.column("node"),
                "lbl": b.column("component"),
                "nn": pa.array(np.zeros(len(b), np.int64)),
            }), batch_format="pyarrow")
    # merge pass: labelled rows (n=0) + core rows (label=self, real n);
    # min(label) resolves the cluster id, sum(n) restores the count —
    # isolated cells simply keep label=self
    self_rows = core.map_batches(
        lambda b: pa.table({
            "tile": b.column("tile"),
            "lbl": b.column("tile"),
            "nn": b.column("n"),
        }), batch_format="pyarrow")
    allrows = self_rows.union(lbl_rows) if has_edges else self_rows
    out = sort_block_aggregate(
        allrows, "tile", {"cluster_id": ("lbl", "min"),
                          "n_points": ("nn", "sum")})
    return out.map_batches(
        lambda b: pa.table({"tile_id": b.column("tile"),
                            "cluster_id": b.column("cluster_id"),
                            "n_points": b.column("n_points")}),
        batch_format="pyarrow")
