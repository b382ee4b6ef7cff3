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
