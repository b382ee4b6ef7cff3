"""Trajectory operators: Douglas-Peucker polyline simplification.

A track table is (track_id, order, lat, lon) rows; simplification is a
per-track recursive geometry reduction — the classic prep step before
shipping GPS traces / camera paths to an index.  Distribution shape:
``groupby(track).map_groups`` — each group is one polyline, so the
shuffle moves each track's points to one task and the per-group kernel
is a vectorized iterative DP (stack of segments, numpy point-to-line
distances; no per-point Python recursion).

Partitioning assumption (documented per the custom-operator contract):
a single track must fit one task's memory.  Tracks are device/user
trajectories — bounded by collection rate, not corpus size — so this
holds at 100 TB total; a pathological multi-GB single track would need
chunked pre-simplification, which this module does not do.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def simplify_polyline(xy: np.ndarray, eps: float) -> np.ndarray:
    """Douglas-Peucker on an ordered (n, 2) polyline.

    Returns the sorted indices of kept points (endpoints always kept).
    Distance is perpendicular distance to the infinite chord line
    (degenerate zero-length chords fall back to point distance).
    Deterministic: the split point is numpy argmax (first maximum)."""
    xy = np.asarray(xy, np.float64)
    n = len(xy)
    if n <= 2:
        return np.arange(n)
    keep = np.zeros(n, bool)
    keep[0] = keep[-1] = True
    stack = [(0, n - 1)]
    while stack:
        a, b = stack.pop()
        if b - a < 2:
            continue
        seg = xy[a + 1:b]
        p0, p1 = xy[a], xy[b]
        dx, dy = p1[0] - p0[0], p1[1] - p0[1]
        l2 = dx * dx + dy * dy
        if l2 == 0.0:
            dist = np.hypot(seg[:, 0] - p0[0], seg[:, 1] - p0[1])
        else:
            dist = np.abs(dx * (seg[:, 1] - p0[1])
                          - dy * (seg[:, 0] - p0[0])) / np.sqrt(l2)
        i = int(np.argmax(dist))
        if dist[i] > eps:
            m = a + 1 + i
            keep[m] = True
            stack.append((a, m))
            stack.append((m, b))
    return np.flatnonzero(keep)


def simplify_tracks(ds, eps: float, track_col: str = "track_id",
                    order_col: str = "seq", lat_col: str = "lat",
                    lon_col: str = "lon"):
    """Dataset of track points -> kept points per track.

    Output: (track_id, <order_col>, pos) where pos is the 1-based
    position of the kept point along the simplified track.  Rows within
    a group are ordered by ``order_col`` before simplification, so the
    result is independent of block layout."""

    def per_track(g: pa.Table) -> pa.Table:
        okeys = g.column(order_col).to_numpy()
        order = np.argsort(okeys, kind="stable")
        lat = g.column(lat_col).to_numpy()[order]
        lon = g.column(lon_col).to_numpy()[order]
        kept = simplify_polyline(np.stack([lon, lat], axis=1), eps)
        tid = g.column(track_col)[0].as_py()
        return pa.table({
            track_col: pa.array([tid] * len(kept),
                                g.schema.field(track_col).type),
            order_col: pa.array(okeys[order][kept],
                                g.schema.field(order_col).type),
            "pos": pa.array(np.arange(1, len(kept) + 1), pa.int64()),
        })

    return ds.groupby(track_col).map_groups(per_track,
                                            batch_format="pyarrow")


def segment_tracks(ds, gap2_u: int, track_col: str = "track_id",
                   order_col: str = "seq", lat_col: str = "lat_u",
                   lon_col: str = "lon_u"):
    """Split each track into contiguous segments wherever consecutive
    points jump further than the gap threshold — the GPS-trace
    "teleport split" that precedes any per-trip analysis.

    All arithmetic is int64 microdegrees: a split happens when the
    squared planar step distance ``dlat^2 + dlon^2 > gap2_u``; the
    segment id is the running count of splits (cumulative sum), so the
    result is exactly the SQL ``lag() ... sum() OVER`` window form and
    hash-reproducible.  Same partitioning contract as simplify_tracks:
    one track per task.

    Output: (track_id, <order_col>, segment_id, step2_u) per point,
    ordered by ``order_col`` within each track; the first point of a
    track has step2_u = 0 and opens segment 1.
    """
    gap2 = np.int64(gap2_u)

    def per_track(g: pa.Table) -> pa.Table:
        okeys = g.column(order_col).to_numpy()
        order = np.argsort(okeys, kind="stable")
        lat = g.column(lat_col).to_numpy()[order].astype(np.int64)
        lon = g.column(lon_col).to_numpy()[order].astype(np.int64)
        dlat = np.diff(lat)
        dlon = np.diff(lon)
        step2 = np.concatenate([[np.int64(0)], dlat * dlat + dlon * dlon])
        seg = 1 + np.cumsum(step2 > gap2)  # step2[0]=0 opens segment 1
        tid = g.column(track_col)[0].as_py()
        return pa.table({
            track_col: pa.array([tid] * len(seg),
                                g.schema.field(track_col).type),
            order_col: pa.array(okeys[order],
                                g.schema.field(order_col).type),
            "segment_id": pa.array(seg, pa.int64()),
            "step2_u": pa.array(step2, pa.int64()),
        })

    return ds.groupby(track_col).map_groups(per_track,
                                            batch_format="pyarrow")


def zone_transitions(ds, rects: list[dict], track_col: str = "track_id",
                     order_col: str = "seq", lat_col: str = "lat_u",
                     lon_col: str = "lon_u"):
    """Geofence enter/exit detection: for each track, the points where
    membership of any zone changes — the alerting primitive behind
    "vehicle entered region R" / "camera left the survey area".

    Zones are axis-aligned rectangles (the PIP-rect predicate:
    ``x0 < lon_u <= x1 AND y0 < lat_u <= y1``, exact int64 integer
    comparisons).  The layer is the broadcast small side (<= 64 zones:
    membership packs into ONE uint64 bitmask per point).  Shape:

      1. streaming ``map_batches`` computes the per-point zone bitmask
         (vectorized (n_points x n_zones) compare, no shuffle);
      2. ``groupby(track)`` orders each track and XORs consecutive
         masks — a changed bit is an enter (now inside) or exit (now
         outside).  Same one-track-per-task contract as
         simplify_tracks.

    A track's first point inside a zone emits an enter (previous state
    defaults to outside, the SQL ``COALESCE(lag(..), 0)`` convention).
    Exits at the end of a track (track never leaves) emit nothing.

    Output: (track_col, order_col, polygon_id, delta) with delta = +1
    for enter, -1 for exit, ordered deterministically by the caller's
    downstream sort.
    """
    if len(rects) > 64:
        raise ValueError("zone_transitions packs zone membership into "
                         "one uint64 word; pass <= 64 zones (chunk the "
                         "layer and union the outputs for more)")
    order0 = sorted(range(len(rects)), key=lambda i: rects[i]["polygon_id"])
    pids = [rects[i]["polygon_id"] for i in order0]
    x0 = np.asarray([rects[i]["x0"] for i in order0], np.int64)
    x1 = np.asarray([rects[i]["x1"] for i in order0], np.int64)
    y0 = np.asarray([rects[i]["y0"] for i in order0], np.int64)
    y1 = np.asarray([rects[i]["y1"] for i in order0], np.int64)
    nz = len(pids)

    def mask_stage(b: pa.Table) -> pa.Table:
        x = b.column(lon_col).to_numpy().astype(np.int64, copy=False)
        y = b.column(lat_col).to_numpy().astype(np.int64, copy=False)
        inside = ((x[:, None] > x0[None, :]) & (x[:, None] <= x1[None, :])
                  & (y[:, None] > y0[None, :]) & (y[:, None] <= y1[None, :]))
        mask = (inside.astype(np.uint64)
                << np.arange(nz, dtype=np.uint64)[None, :]).sum(axis=1)
        return pa.table({
            track_col: b.column(track_col),
            order_col: b.column(order_col),
            "__mask": pa.array(mask.astype(np.int64), pa.int64()),
        })

    masked = ds.select_columns(
        [track_col, order_col, lat_col, lon_col]).map_batches(
        mask_stage, batch_format="pyarrow", zero_copy_batch=True)

    def per_track(g: pa.Table) -> pa.Table:
        okeys = g.column(order_col).to_numpy()
        order = np.argsort(okeys, kind="stable")
        okeys = okeys[order]
        mask = g.column("__mask").to_numpy()[order].astype(np.uint64)
        prev = np.concatenate([[np.uint64(0)], mask[:-1]])
        diff = mask ^ prev
        out_ok, out_pid, out_delta = [], [], []
        for bit in range(nz):
            b = np.uint64(1) << np.uint64(bit)
            hit = np.flatnonzero(diff & b)
            if len(hit) == 0:
                continue
            out_ok.append(okeys[hit])
            out_pid.extend([pids[bit]] * len(hit))
            out_delta.append(np.where(mask[hit] & b, 1, -1).astype(np.int64))
        n = sum(len(a) for a in out_ok)
        tid = g.column(track_col)[0].as_py()
        return pa.table({
            track_col: pa.array([tid] * n, g.schema.field(track_col).type),
            order_col: pa.array(
                np.concatenate(out_ok) if out_ok
                else np.empty(0, okeys.dtype),
                g.schema.field(order_col).type),
            "polygon_id": pa.array(out_pid, pa.string()),
            "delta": pa.array(
                np.concatenate(out_delta) if out_delta
                else np.empty(0, np.int64), pa.int64()),
        })

    return masked.groupby(track_col).map_groups(per_track,
                                                batch_format="pyarrow")


def hausdorff_pairs(ds, pairs: list[tuple], track_col: str = "track_id",
                    lat_col: str = "lat_u", lon_col: str = "lon_u"):
    """Symmetric discrete Hausdorff distance between track pairs — the
    trajectory-similarity measure: H(A,B) = max(h(A,B), h(B,A)) with
    h(A,B) = max over a in A of min over b in B of d2(a,b), all in
    exact int64 squared microdegrees (order-free, so no within-track
    sort is needed).

    ``pairs`` is the (bounded, broadcast) list of (track_a, track_b)
    to score — the candidate pairs from a coarse prefilter (shared
    cells, LSH, same route id), never all-pairs of the corpus.  Shape:
    each point replicates once per pair containing its track (a flat
    map against the broadcast membership dict), ONE groupby(pair)
    exchange co-locates both tracks, and the per-pair kernel is a
    single vectorized |A| x |B| distance matrix (tracks are small by
    the per-task track contract, so the matrix is too).

    Pairs where either track has no points emit nothing (Hausdorff is
    undefined on an empty set).  Output: (track_a, track_b, n_a, n_b,
    h2_u) — one row per scored pair.
    """
    pairs = [(a, b) for a, b in pairs]
    membership: dict = {}
    for idx, (a, b) in enumerate(pairs):
        membership.setdefault(a, []).append((idx, 0))
        membership.setdefault(b, []).append((idx, 1))

    def expand(batch: pa.Table) -> pa.Table:
        tr = batch.column(track_col).to_numpy(zero_copy_only=False)
        x = batch.column(lon_col).to_numpy().astype(np.int64, copy=False)
        y = batch.column(lat_col).to_numpy().astype(np.int64, copy=False)
        # group the batch by track ONCE (argsort + run boundaries)
        # instead of a full `tr == t` scan per track — the scan was
        # O(#tracks x batch rows)
        order = np.argsort(tr, kind="stable")
        st = tr[order]
        if len(st):
            starts = np.flatnonzero(
                np.concatenate([[True], st[1:] != st[:-1]]))
            ends = np.append(starts[1:], len(st))
        else:
            starts = ends = np.empty(0, np.int64)
        op, os_, ox, oy = [], [], [], []
        for s0, s1 in zip(starts, ends):
            mem = membership.get(st[s0])
            if not mem:
                continue
            sel = order[s0:s1]
            for idx, side in mem:
                op.append(np.full(len(sel), idx, np.int64))
                os_.append(np.full(len(sel), side, np.int8))
                ox.append(x[sel])
                oy.append(y[sel])
        cat = (lambda a, dt: np.concatenate(a) if a else np.empty(0, dt))
        return pa.table({
            "__pair": pa.array(cat(op, np.int64), pa.int64()),
            "__side": pa.array(cat(os_, np.int8), pa.int8()),
            "__x": pa.array(cat(ox, np.int64), pa.int64()),
            "__y": pa.array(cat(oy, np.int64), pa.int64()),
        })

    halo = ds.select_columns([track_col, lat_col, lon_col]).map_batches(
        expand, batch_format="pyarrow", zero_copy_batch=True)

    def per_pair(g: pa.Table) -> pa.Table:
        idx = int(g.column("__pair")[0].as_py())
        a, b = pairs[idx]
        side = g.column("__side").to_numpy()
        x = g.column("__x").to_numpy()
        y = g.column("__y").to_numpy()
        ai = np.flatnonzero(side == 0)
        bi = np.flatnonzero(side == 1)
        empty = pa.table({
            "track_a": pa.array([], pa.string()),
            "track_b": pa.array([], pa.string()),
            "n_a": pa.array([], pa.int64()),
            "n_b": pa.array([], pa.int64()),
            "h2_u": pa.array([], pa.int64()),
        })
        if len(ai) == 0 or len(bi) == 0:
            return empty
        dx = x[ai][:, None] - x[bi][None, :]
        dy = y[ai][:, None] - y[bi][None, :]
        d2 = dx * dx + dy * dy
        h = max(int(d2.min(axis=1).max()), int(d2.min(axis=0).max()))
        return pa.table({
            "track_a": pa.array([str(a)], pa.string()),
            "track_b": pa.array([str(b)], pa.string()),
            "n_a": pa.array([len(ai)], pa.int64()),
            "n_b": pa.array([len(bi)], pa.int64()),
            "h2_u": pa.array([h], pa.int64()),
        })

    return halo.groupby("__pair").map_groups(per_pair,
                                             batch_format="pyarrow")



def covisit_pairs(ds, res: int, min_shared: int = 2, cell_cap: int = 256,
                  track_col: str = "track_id", lat_col: str = "lat_u",
                  lon_col: str = "lon_u"):
    """Co-visitation mining: pairs of tracks that visited at least
    ``min_shared`` DISTINCT grid cells in common — the "traveled
    together" / co-occurrence join behind contact graphs and convoy
    detection.

    Shape (the bucketed pair-generation pattern, same family as the
    LSH dedup buckets):

      1. streaming tile assignment (``tile_of`` at ``res``, no shuffle);
      2. ``groupby(tile)``: per-cell UNIQUE track set (within-cell
         repeat visits collapse here, giving distinct-cell semantics);
         cells hotter than ``cell_cap`` tracks are DROPPED — an
         everyone-visits cell (airport, downtown) carries no pair
         signal and would emit O(m^2) pairs (the df-cap / stop-shingle
         rule, applied identically in the SQL form via HAVING);
      3. pair emission a < b (bounded by cell_cap^2/2 per cell);
      4. ONE grouped count over (a, b) + threshold filter.

    Output: (a, b, n_shared) with a < b by track id.
    """
    from . import fastagg

    def tile_stage(b: pa.Table) -> pa.Table:
        lat = b.column(lat_col).to_numpy().astype(np.int64, copy=False)
        lon = b.column(lon_col).to_numpy().astype(np.int64, copy=False)
        from .. import cell as cellmod
        return pa.table({
            "tile": pa.array(cellmod.tile_of(lat, lon, res), pa.int64()),
            track_col: b.column(track_col),
        })

    tiled = ds.select_columns([track_col, lat_col, lon_col]).map_batches(
        tile_stage, batch_format="pyarrow", zero_copy_batch=True)

    def per_cell(g: pa.Table) -> pa.Table:
        # preserve the caller's track-id type (string ids are accepted
        # by every other track operator via the generic track_col API)
        id_type = g.schema.field(track_col).type
        u = np.unique(g.column(track_col).to_numpy(zero_copy_only=False))
        empty = pa.table({"a": pa.array([], id_type),
                          "b": pa.array([], id_type)})
        if len(u) < 2 or len(u) > cell_cap:
            return empty
        ia, ib = np.triu_indices(len(u), 1)
        return pa.table({"a": pa.array(u[ia], type=id_type),
                         "b": pa.array(u[ib], type=id_type)})

    pairs = tiled.groupby("tile").map_groups(per_cell,
                                             batch_format="pyarrow")
    counted = fastagg.sort_block_aggregate(
        pairs, ["a", "b"], {"n_shared": (None, "count")})

    def thresh(b: pa.Table) -> pa.Table:
        keep = b.column("n_shared").to_numpy() >= min_shared
        return b.filter(pa.array(keep))

    return counted.map_batches(thresh, batch_format="pyarrow",
                               zero_copy_batch=True)


def od_matrix(ds, res: int, track_col: str = "track_id",
              order_col: str = "seq", lat_col: str = "lat_u",
              lon_col: str = "lon_u"):
    """Origin-destination flow matrix: each track contributes one
    (first-point cell -> last-point cell) trip at resolution ``res``;
    flows are counted per cell pair — the classic mobility aggregation
    behind commute maps and demand matrices.

    Shape: one ``groupby(track)`` picks each track's endpoint
    coordinates (ordered by ``order_col``, exact integer tile
    assignment), then ONE grouped count over (o_tile, d_tile) via
    sort_block_aggregate.  Output is bounded by the number of tracks,
    never the number of points.

    Output: (o_tile, d_tile, n_tracks).
    """
    from . import fastagg
    from .. import cell as cellmod

    def per_track(g: pa.Table) -> pa.Table:
        okeys = g.column(order_col).to_numpy()
        first = int(np.argmin(okeys))
        last = int(np.argmax(okeys))
        lat = g.column(lat_col).to_numpy().astype(np.int64)
        lon = g.column(lon_col).to_numpy().astype(np.int64)
        ot = cellmod.tile_of(lat[first:first + 1], lon[first:first + 1], res)
        dt = cellmod.tile_of(lat[last:last + 1], lon[last:last + 1], res)
        return pa.table({"o_tile": pa.array(ot, pa.int64()),
                         "d_tile": pa.array(dt, pa.int64())})

    trips = ds.select_columns(
        [track_col, order_col, lat_col, lon_col]).groupby(
        track_col).map_groups(per_track, batch_format="pyarrow")
    return fastagg.sort_block_aggregate(
        trips, ["o_tile", "d_tile"], {"n_tracks": (None, "count")})


def motion_stats(ds, track_col: str = "track_id", order_col: str = "seq",
                 lat_col: str = "lat_u", lon_col: str = "lon_u"):
    """Per-track motion feature extraction — the trajectory summary a
    mobility-ML pipeline consumes: step count, total path length,
    largest jump, and an 8-bucket heading histogram.

    Determinism contract (everything SQL-replicable):
      * ``len_u`` = sum over steps of floor(sqrt(step2)) where the
        int64 step2 first converts to float64 (IEEE nearest) and sqrt
        is IEEE correctly-rounded — numpy and SQL produce identical
        values even when step2 > 2^53;
      * heading octant = pure integer comparisons, no atan2:
        bit2 = dlon < 0, bit1 = dlat < 0, bit0 = |dlon| < |dlat|
        (zero steps land in octant 0).

    One ``groupby(track)`` (same one-track-per-task contract as the
    other track ops).  Output: (track_col, n_steps, len_u, max_step2,
    oct0..oct7).
    """

    def per_track(g: pa.Table) -> pa.Table:
        okeys = g.column(order_col).to_numpy()
        order = np.argsort(okeys, kind="stable")
        lat = g.column(lat_col).to_numpy()[order].astype(np.int64)
        lon = g.column(lon_col).to_numpy()[order].astype(np.int64)
        dlat = np.diff(lat)
        dlon = np.diff(lon)
        step2 = dlat * dlat + dlon * dlon
        oct_idx = ((dlon < 0).astype(np.int64) << 2
                   | (dlat < 0).astype(np.int64) << 1
                   | (np.abs(dlon) < np.abs(dlat)).astype(np.int64))
        octs = np.bincount(oct_idx, minlength=8).astype(np.int64)
        tid = g.column(track_col)[0].as_py()
        cols = {
            track_col: pa.array([tid], g.schema.field(track_col).type),
            "n_steps": pa.array([len(step2)], pa.int64()),
            "len_u": pa.array([int(np.floor(np.sqrt(
                step2.astype(np.float64))).astype(np.int64).sum())],
                pa.int64()),
            "max_step2": pa.array([int(step2.max()) if len(step2) else 0],
                                  pa.int64()),
        }
        for i in range(8):
            cols[f"oct{i}"] = pa.array([int(octs[i])], pa.int64())
        return pa.table(cols)

    return ds.select_columns(
        [track_col, order_col, lat_col, lon_col]).groupby(
        track_col).map_groups(per_track, batch_format="pyarrow")
