"""Hierarchical quadkey geo cells (H3/S2 stand-in), pure numpy, integer-exact.

The reference cover tree's scale geometry is ``covdist(node) = base^level``
with base 2 (reference: details/tree.cpp:197-200) — each level halves the
covering radius.  This module is the *partitioning-layer continuation* of
that geometry: a lat/lon quadkey grid whose cell side halves per
resolution step, so resolution r here plays the role of tree level, and
the per-partition cover tree (covertree.py) continues the same hierarchy
below cell scale.

Design rules (all load-bearing for oracle exactness):

- Coordinates are **integer microdegrees** (``lat_u`` in [-90e6, 90e6],
  ``lon_u`` in [-180e6, 180e6)).  Cell indices are computed with pure
  integer arithmetic, so DuckDB SQL oracles reproduce them bit-exactly —
  no float rounding can diverge between engine and oracle.
- ``ix = ((lon_u + 180_000_000) << r) // 360_000_000`` and likewise for
  ``iy`` over 180e6.  Max r = 28 keeps products < 2^63.
- ``cell_id`` packs resolution in the top byte and the Morton (Z-order)
  interleave of (ix, iy) below: parent/child is a 2-bit shift, matching
  H3/S2 parent semantics.
- ``tile_id`` (row-major ``iy * 2^r + ix``) is the SQL-friendly alias
  used by oracle queries; it is a bijection with cell_id at fixed r.

Distances are planar degrees: ``d = sqrt(dlat^2 + dlon^2)`` on float
degrees.  This is the engine's geo metric (pluggable; chosen so the
brute-force oracle is a one-liner in both numpy and SQL).
"""

from __future__ import annotations

import numpy as np

MAX_RES = 28
LON_SPAN_U = 360_000_000
LAT_SPAN_U = 180_000_000
LON_OFF_U = 180_000_000
LAT_OFF_U = 90_000_000


def latlon_to_units(lat_deg: np.ndarray, lon_deg: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Float degrees -> integer microdegrees (round-half-away like SQL CAST)."""
    lat_u = np.rint(np.asarray(lat_deg, dtype=np.float64) * 1e6).astype(np.int64)
    lon_u = np.rint(np.asarray(lon_deg, dtype=np.float64) * 1e6).astype(np.int64)
    return lat_u, lon_u


def units_to_latlon(lat_u: np.ndarray, lon_u: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    return np.asarray(lat_u, np.float64) / 1e6, np.asarray(lon_u, np.float64) / 1e6


# ---------------------------------------------------------------- Morton


def _spread_bits32(v: np.ndarray) -> np.ndarray:
    """Spread the low 32 bits of v so bit i lands at position 2i."""
    x = v.astype(np.uint64)
    x = (x | (x << np.uint64(16))) & np.uint64(0x0000FFFF0000FFFF)
    x = (x | (x << np.uint64(8))) & np.uint64(0x00FF00FF00FF00FF)
    x = (x | (x << np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    x = (x | (x << np.uint64(2))) & np.uint64(0x3333333333333333)
    x = (x | (x << np.uint64(1))) & np.uint64(0x5555555555555555)
    return x


def _compact_bits32(v: np.ndarray) -> np.ndarray:
    x = v.astype(np.uint64) & np.uint64(0x5555555555555555)
    x = (x | (x >> np.uint64(1))) & np.uint64(0x3333333333333333)
    x = (x | (x >> np.uint64(2))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    x = (x | (x >> np.uint64(4))) & np.uint64(0x00FF00FF00FF00FF)
    x = (x | (x >> np.uint64(8))) & np.uint64(0x0000FFFF0000FFFF)
    x = (x | (x >> np.uint64(16))) & np.uint64(0x00000000FFFFFFFF)
    return x


def morton_encode(ix: np.ndarray, iy: np.ndarray) -> np.ndarray:
    return (_spread_bits32(np.asarray(ix)) | (_spread_bits32(np.asarray(iy)) << np.uint64(1))).astype(np.uint64)


def morton_decode(m: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    m = np.asarray(m, dtype=np.uint64)
    return _compact_bits32(m).astype(np.int64), _compact_bits32(m >> np.uint64(1)).astype(np.int64)


# ---------------------------------------------------------------- cell ids


def cell_xy(lat_u: np.ndarray, lon_u: np.ndarray, res: int) -> tuple[np.ndarray, np.ndarray]:
    """Integer cell coordinates at resolution res. Pure int64 arithmetic."""
    if not 0 <= res <= MAX_RES:
        raise ValueError(f"res must be in [0, {MAX_RES}]")
    n = np.int64(1) << np.int64(res)
    lon_q = np.asarray(lon_u, np.int64) + LON_OFF_U
    lat_q = np.asarray(lat_u, np.int64) + LAT_OFF_U
    ix = (lon_q * n) // LON_SPAN_U
    iy = (lat_q * n) // LAT_SPAN_U
    # points exactly on the +180 / +90 edge belong to the last cell
    ix = np.minimum(ix, n - 1)
    iy = np.minimum(iy, n - 1)
    return ix, iy


def cell_id_from_xy(ix: np.ndarray, iy: np.ndarray, res: int) -> np.ndarray:
    """Pack (res, morton(ix, iy)) into an int64 cell id."""
    m = morton_encode(np.asarray(ix, np.int64), np.asarray(iy, np.int64))
    return ((np.uint64(res) << np.uint64(56)) | m).astype(np.int64)


def cell_of(lat_u: np.ndarray, lon_u: np.ndarray, res: int) -> np.ndarray:
    ix, iy = cell_xy(lat_u, lon_u, res)
    return cell_id_from_xy(ix, iy, res)


def cell_res(cell: np.ndarray) -> np.ndarray:
    return (np.asarray(cell).astype(np.uint64) >> np.uint64(56)).astype(np.int64)


def cell_to_xy(cell: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """cell id -> (ix, iy, res)."""
    c = np.asarray(cell).astype(np.uint64)
    res = (c >> np.uint64(56)).astype(np.int64)
    ix, iy = morton_decode(c & np.uint64((1 << 56) - 1))
    return ix, iy, res


def tile_id_from_xy(ix: np.ndarray, iy: np.ndarray, res: int) -> np.ndarray:
    """Row-major tile id iy * 2^res + ix — the SQL-oracle-friendly alias."""
    return np.asarray(iy, np.int64) * (np.int64(1) << np.int64(res)) + np.asarray(ix, np.int64)


def tile_of(lat_u: np.ndarray, lon_u: np.ndarray, res: int) -> np.ndarray:
    ix, iy = cell_xy(lat_u, lon_u, res)
    return tile_id_from_xy(ix, iy, res)


def quadkey_num(lat_u: np.ndarray, lon_u: np.ndarray, res: int) -> np.ndarray:
    """Quadkey at resolution ``res``, packed as a base-10 int64: digit p
    (most significant first) is ``bit(res-1-p, ix) + 2*bit(res-1-p, iy)``
    — the standard quadtree child index, so the decimal representation
    zero-padded to ``res`` chars IS the quadkey string, and truncating
    digits (integer-dividing by 10^k) gives the ancestor's quadkey.
    Pure int64 arithmetic for exact SQL parity; res <= 18 keeps the
    packed value < 10^18 inside int64."""
    if not 1 <= res <= 18:
        raise ValueError("quadkey res must be in [1, 18]")
    ix, iy = cell_xy(lat_u, lon_u, res)
    q = np.zeros(np.shape(ix), np.int64)
    for p in range(res):
        shift = np.int64(res - 1 - p)
        digit = ((ix >> shift) & 1) + 2 * ((iy >> shift) & 1)
        q = q * 10 + digit
    return q


def quadkey_str(qnum: np.ndarray, level: int) -> np.ndarray:
    """Decimal zero-pad of a packed quadkey to its string form."""
    return np.char.zfill(np.asarray(qnum, np.int64).astype("U"), level)


def parent(cell: np.ndarray, parent_res: int | None = None) -> np.ndarray:
    """Parent cell (default: one level up) — a 2-bit Morton shift."""
    ix, iy, res = cell_to_xy(cell)
    pres = parent_res if parent_res is not None else int(np.max(res)) - 1
    if np.any(res < pres):
        raise ValueError("parent_res coarser than cell res required")
    shift = (res - pres).astype(np.int64)
    return cell_id_from_xy(ix >> shift, iy >> shift, pres)


def children(cell: int) -> np.ndarray:
    """The four child cells one level finer."""
    ix, iy, res = cell_to_xy(np.asarray([cell]))
    r = int(res[0]) + 1
    if r > MAX_RES:
        raise ValueError("cannot refine beyond MAX_RES")
    bx = int(ix[0]) << 1
    by = int(iy[0]) << 1
    cx = np.array([bx, bx + 1, bx, bx + 1], np.int64)
    cy = np.array([by, by, by + 1, by + 1], np.int64)
    return cell_id_from_xy(cx, cy, r)


def cell_bounds_u(cell: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """(lon0_u, lat0_u, lon1_u, lat1_u) integer-microdegree bounds (half-open)."""
    ix, iy, res = cell_to_xy(cell)
    n = (np.int64(1) << res).astype(np.int64)
    # ceil-division bounds so integer cells partition the units range exactly
    lon0 = -(-(ix * LON_SPAN_U) // n) - LON_OFF_U
    lon1 = -(-((ix + 1) * LON_SPAN_U) // n) - LON_OFF_U
    lat0 = -(-(iy * LAT_SPAN_U) // n) - LAT_OFF_U
    lat1 = -(-((iy + 1) * LAT_SPAN_U) // n) - LAT_OFF_U
    return lon0, lat0, lon1, lat1


def ring(cell: int, k: int) -> np.ndarray:
    """Cells at Chebyshev grid distance exactly k (k=0 -> the cell itself).

    Longitude wraps (mod 2^res); latitude clamps (rows outside the grid
    are dropped).  This is the candidate-cell iterator for the kNN
    exactness ring protocol (see pipelines/knn.py).
    """
    ix0, iy0, res0 = cell_to_xy(np.asarray([cell]))
    res = int(res0[0])
    n = 1 << res
    cx, cy = int(ix0[0]), int(iy0[0])
    if k == 0:
        return np.asarray([cell], np.int64)
    xs, ys = [], []
    for dx in range(-k, k + 1):
        for dy in (-k, k):
            xs.append(cx + dx); ys.append(cy + dy)
    for dy in range(-k + 1, k):
        for dx in (-k, k):
            xs.append(cx + dx); ys.append(cy + dy)
    xs = np.asarray(xs, np.int64) % n
    ys = np.asarray(ys, np.int64)
    keep = (ys >= 0) & (ys < n)
    if not keep.any():
        return np.empty(0, np.int64)
    return np.unique(cell_id_from_xy(xs[keep], ys[keep], res))


def points_cells_min_dist_deg(lat_deg: np.ndarray, lon_deg: np.ndarray,
                              cells: np.ndarray) -> np.ndarray:
    """(n_points, n_cells) planar-degree lower bounds — the vectorized
    form of point_cell_min_dist_deg for query batches."""
    lon0, lat0, lon1, lat1 = cell_bounds_u(cells)
    lon0d, lat0d = lon0 / 1e6, lat0 / 1e6
    lon1d, lat1d = lon1 / 1e6, lat1 / 1e6
    q_lon = np.asarray(lon_deg, np.float64)[:, None]
    q_lat = np.asarray(lat_deg, np.float64)[:, None]
    dx = np.maximum(np.maximum(lon0d[None, :] - q_lon, q_lon - lon1d[None, :]), 0.0)
    dx_wrap = 360.0 - np.maximum(np.abs(lon0d[None, :] - q_lon),
                                 np.abs(q_lon - lon1d[None, :]))
    dx = np.minimum(dx, np.maximum(dx_wrap, 0.0))
    dy = np.maximum(np.maximum(lat0d[None, :] - q_lat, q_lat - lat1d[None, :]), 0.0)
    return np.sqrt(dx * dx + dy * dy)


def point_cell_min_dist_deg(lat_deg: float, lon_deg: float, cells: np.ndarray) -> np.ndarray:
    """Min planar-degree distance from a point to each cell's closed box.

    This is the cell-lattice lift of the cover tree's pruning bound
    ``best > d(child, q) - child.parent_dist`` (reference:
    details/tree.cpp:624, 686): a cell can hold a closer neighbor only
    if its nearest boundary point is closer than the current k-th best.
    """
    lon0, lat0, lon1, lat1 = cell_bounds_u(cells)
    lon0d, lat0d = lon0 / 1e6, lat0 / 1e6
    lon1d, lat1d = lon1 / 1e6, lat1 / 1e6
    dx = np.maximum(np.maximum(lon0d - lon_deg, lon_deg - lon1d), 0.0)
    # account for longitude wrap: distance via the antimeridian
    dx_wrap = 360.0 - np.maximum(np.abs(lon0d - lon_deg), np.abs(lon_deg - lon1d))
    dx = np.minimum(dx, np.maximum(dx_wrap, 0.0))
    dy = np.maximum(np.maximum(lat0d - lat_deg, lat_deg - lat1d), 0.0)
    return np.sqrt(dx * dx + dy * dy)


def compact_cells(cells: np.ndarray) -> np.ndarray:
    """H3-style set compaction: wherever all 4 siblings are present,
    replace them with their parent, repeated up the hierarchy.

    Input: int64 cell ids, any mix of resolutions, duplicates allowed
    (deduped).  Output: the unique minimal mixed-resolution set covering
    exactly the same area, sorted.  Fully vectorized per level: group
    finest-level cells by parent with one sort + run-length count."""
    cells = np.unique(np.asarray(cells, np.int64))
    if len(cells) == 0:
        return cells
    out = []
    cur = cells
    while True:
        _, _, res = cell_to_xy(cur)
        top = int(res.max())
        if top == 0:
            out.append(cur)
            break
        fine = cur[res == top]
        rest = cur[res != top]
        par = parent(fine, top - 1)
        uniq, cnt = np.unique(par, return_counts=True)
        full = uniq[cnt == 4]
        if len(full) == 0:
            out.append(fine)
            cur = rest
            if len(cur) == 0:
                break
            continue
        keep = fine[~np.isin(par, full)]
        out.append(keep)
        cur = np.unique(np.concatenate([rest, full]))
    return np.sort(np.concatenate(out)) if out else cells


def uncompact_cells(cells: np.ndarray, res: int) -> np.ndarray:
    """Expand a mixed-resolution cell set to uniform ``res`` (every
    input cell must be at resolution <= res).  Vectorized per level:
    each pass splits every too-coarse cell into its 4 children at
    once (2-bit Morton append)."""
    cur = np.unique(np.asarray(cells, np.int64))
    if len(cur) == 0:
        return cur
    _, _, r = cell_to_xy(cur)
    if np.any(r > res):
        raise ValueError("uncompact_cells: input finer than target res")
    done = [cur[r == res]]
    work = cur[r < res]
    # one pass per level: split exactly the coarsest cells each round
    # (the set may mix resolutions)
    while len(work):
        ix, iy, r = cell_to_xy(work)
        lev = int(r.min())
        sel = r == lev
        bx, by = ix[sel] << 1, iy[sel] << 1
        cx = np.concatenate([bx, bx + 1, bx, bx + 1])
        cy = np.concatenate([by, by, by + 1, by + 1])
        ch = cell_id_from_xy(cx, cy, lev + 1)
        if lev + 1 == res:
            done.append(ch)
            work = work[~sel]
        else:
            work = np.concatenate([work[~sel], ch])
    return np.sort(np.unique(np.concatenate(done)))
