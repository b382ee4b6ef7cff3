"""Polygon geometry, pure numpy (shapely unavailable offline).

Polygon model: one outer ring as an (n, 2) float64 array of
(lon, lat) vertices, implicitly closed.  A polygon layer is a small
Arrow-able table (polygon_id, ring, bbox, props) that the engine
broadcasts via ``ray.put`` to every task of a point-in-polygon stage —
never shuffled (SURVEY.md §7.2).

Algorithms:
- ``points_in_polygon``: vectorized even-odd ray casting (half-open on
  edges crossing the horizontal ray; boundary points may land either
  way per the standard crossing convention — the fixtures avoid exact
  boundary points, same as the reference avoids dist==0 ties).
- ``bbox_prefilter``: cheap rectangle rejection before the exact test.
- ``rect_intersects_polygon``: exact rectangle/polygon intersection for
  raster-tile <-> vector assignment (tile covering).
"""

from __future__ import annotations

import numpy as np


def ring_bbox(ring: np.ndarray) -> np.ndarray:
    r = np.asarray(ring, np.float64)
    return np.asarray([r[:, 0].min(), r[:, 1].min(), r[:, 0].max(), r[:, 1].max()])


def points_in_polygon(lon: np.ndarray, lat: np.ndarray, ring: np.ndarray) -> np.ndarray:
    """Even-odd ray casting: (m,) bool for m points against one ring."""
    lon = np.asarray(lon, np.float64)
    lat = np.asarray(lat, np.float64)
    r = np.asarray(ring, np.float64)
    x1, y1 = r[:, 0], r[:, 1]
    x2, y2 = np.roll(x1, -1), np.roll(y1, -1)
    # edge straddles the horizontal line through the point (half-open)
    px = lon[:, None]
    py = lat[:, None]
    straddle = (y1[None, :] > py) != (y2[None, :] > py)
    with np.errstate(divide="ignore", invalid="ignore"):
        xint = x1[None, :] + (py - y1[None, :]) * (x2 - x1)[None, :] / (y2 - y1)[None, :]
    crossings = (straddle & (px < xint)).sum(axis=1)
    return (crossings % 2).astype(bool)


def bbox_prefilter(lon: np.ndarray, lat: np.ndarray, bbox: np.ndarray) -> np.ndarray:
    return ((lon >= bbox[0]) & (lon <= bbox[2]) & (lat >= bbox[1]) & (lat <= bbox[3]))


def point_in_polygons(lon: np.ndarray, lat: np.ndarray,
                      rings: list[np.ndarray]) -> tuple[np.ndarray, np.ndarray]:
    """Points x polygon-list inner join: returns (point_idx, polygon_idx)."""
    pts_i, polys_j = [], []
    lon = np.asarray(lon, np.float64)
    lat = np.asarray(lat, np.float64)
    for j, ring in enumerate(rings):
        bb = ring_bbox(ring)
        cand = np.flatnonzero(bbox_prefilter(lon, lat, bb))
        if len(cand) == 0:
            continue
        inside = points_in_polygon(lon[cand], lat[cand], ring)
        hit = cand[inside]
        pts_i.append(hit)
        polys_j.append(np.full(len(hit), j, np.int64))
    if not pts_i:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    return np.concatenate(pts_i), np.concatenate(polys_j)


def _segments_intersect(p1, p2, q1, q2) -> np.ndarray:
    """Vectorized proper/improper segment intersection test."""

    def orient(a, b, c):
        return (b[..., 0] - a[..., 0]) * (c[..., 1] - a[..., 1]) - \
               (b[..., 1] - a[..., 1]) * (c[..., 0] - a[..., 0])

    d1 = orient(q1, q2, p1)
    d2 = orient(q1, q2, p2)
    d3 = orient(p1, p2, q1)
    d4 = orient(p1, p2, q2)
    proper = ((d1 > 0) != (d2 > 0)) & ((d3 > 0) != (d4 > 0))
    coll = (d1 == 0) | (d2 == 0) | (d3 == 0) | (d4 == 0)
    return proper | coll & _on_any(p1, p2, q1, q2, d1, d2, d3, d4)


def _on_any(p1, p2, q1, q2, d1, d2, d3, d4):
    def on_seg(a, b, c):
        return (np.minimum(a[..., 0], b[..., 0]) <= c[..., 0]) & \
               (c[..., 0] <= np.maximum(a[..., 0], b[..., 0])) & \
               (np.minimum(a[..., 1], b[..., 1]) <= c[..., 1]) & \
               (c[..., 1] <= np.maximum(a[..., 1], b[..., 1]))

    return ((d1 == 0) & on_seg(q1, q2, p1)) | ((d2 == 0) & on_seg(q1, q2, p2)) | \
           ((d3 == 0) & on_seg(p1, p2, q1)) | ((d4 == 0) & on_seg(p1, p2, q2))


def rect_intersects_polygon(lon0: float, lat0: float, lon1: float, lat1: float,
                            ring: np.ndarray) -> bool:
    """Exact closed-rectangle vs polygon intersection: any vertex inside
    the rect, any rect corner inside the polygon, or any edge crossing."""
    r = np.asarray(ring, np.float64)
    if ((r[:, 0] >= lon0) & (r[:, 0] <= lon1) & (r[:, 1] >= lat0) & (r[:, 1] <= lat1)).any():
        return True
    cx = np.asarray([lon0, lon1, lon1, lon0])
    cy = np.asarray([lat0, lat0, lat1, lat1])
    if points_in_polygon(cx, cy, r).any():
        return True
    rect = np.asarray([[lon0, lat0], [lon1, lat0], [lon1, lat1], [lon0, lat1]])
    re1 = rect
    re2 = np.roll(rect, -1, axis=0)
    pe1 = r
    pe2 = np.roll(r, -1, axis=0)
    # all pairs: rect edges (4) x polygon edges (n)
    a1 = re1[:, None, :]
    a2 = re2[:, None, :]
    b1 = pe1[None, :, :]
    b2 = pe2[None, :, :]
    return bool(_segments_intersect(a1, a2, b1, b2).any())


def clip_ring_rect(ring: np.ndarray, x0: float, y0: float,
                   x1: float, y1: float) -> np.ndarray:
    """Sutherland-Hodgman clip of a simple ring against an axis-aligned
    box -> (m, 2) vertices (possibly empty).  For axis-aligned input
    edges every output coordinate is an exact copy/boundary value (the
    interpolation term vanishes), which the exact-area contract of
    ``tiles.tile_cover_areas`` relies on."""
    pts = np.asarray(ring, np.float64)

    def clip(poly, inside, intersect):
        out = []
        n = len(poly)
        for i in range(n):
            a = poly[i]
            b = poly[(i + 1) % n]
            ia, ib = inside(a), inside(b)
            if ia:
                out.append(a)
                if not ib:
                    out.append(intersect(a, b))
            elif ib:
                out.append(intersect(a, b))
        return np.asarray(out, np.float64).reshape(-1, 2)

    def ix_at_x(xc):
        def f(a, b):
            t = (xc - a[0]) / (b[0] - a[0])
            return np.array([xc, a[1] + t * (b[1] - a[1])])
        return f

    def ix_at_y(yc):
        def f(a, b):
            t = (yc - a[1]) / (b[1] - a[1])
            return np.array([a[0] + t * (b[0] - a[0]), yc])
        return f

    pts = clip(pts, lambda p: p[0] >= x0, ix_at_x(x0))
    if len(pts):
        pts = clip(pts, lambda p: p[0] <= x1, ix_at_x(x1))
    if len(pts):
        pts = clip(pts, lambda p: p[1] >= y0, ix_at_y(y0))
    if len(pts):
        pts = clip(pts, lambda p: p[1] <= y1, ix_at_y(y1))
    return pts


def ring_area(pts: np.ndarray) -> float:
    """Shoelace area (absolute) of a ring given as (n, 2) vertices."""
    if len(pts) < 3:
        return 0.0
    x, y = pts[:, 0], pts[:, 1]
    s = float(np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y))
    return abs(s) * 0.5
