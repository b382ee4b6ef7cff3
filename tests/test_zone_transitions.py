"""zone_transitions: geofence enter/exit vs a per-track Python oracle."""
import numpy as np
import pyarrow as pa
import pytest

from metric_search_ray.pipelines.tracks import zone_transitions


RECTS = [
    {"polygon_id": "zb", "x0": -50, "x1": 10, "y0": -20, "y1": 25},
    {"polygon_id": "za", "x0": 0, "x1": 100, "y0": 0, "y1": 80},
    {"polygon_id": "zc", "x0": -200, "x1": 300, "y0": -90, "y1": 90},
]


def _inside(x, y, r):
    return r["x0"] < x <= r["x1"] and r["y0"] < y <= r["y1"]


def _brute(tracks):
    rows = []
    for tid, pts in tracks.items():
        pts = sorted(pts)  # by order key
        for r in RECTS:
            prev = 0
            for okey, x, y in pts:
                cur = 1 if _inside(x, y, r) else 0
                if cur != prev:
                    rows.append((tid, okey, r["polygon_id"], cur - prev))
                prev = cur
    return sorted(rows)


def _run(tracks):
    import ray.data as rd
    tid, okey, x, y = [], [], [], []
    for t, pts in tracks.items():
        for o, px, py in pts:
            tid.append(t)
            okey.append(o)
            x.append(px)
            y.append(py)
    # shuffled input: the operator must order within each track itself
    rng = np.random.default_rng(0)
    perm = rng.permutation(len(tid))
    ds = rd.from_arrow(pa.table({
        "track_id": pa.array(np.asarray(tid, np.int64)[perm]),
        "seq": pa.array(np.asarray(okey, np.int64)[perm]),
        "lat_u": pa.array(np.asarray(y, np.int64)[perm]),
        "lon_u": pa.array(np.asarray(x, np.int64)[perm]),
    }))
    out = zone_transitions(ds, RECTS, track_col="track_id").to_pandas()
    if len(out) == 0:
        return []
    return sorted(zip(out["track_id"], out["seq"],
                      out["polygon_id"], out["delta"]))


def test_enter_exit_basic(ray_session):
    tracks = {
        1: [(1, -100, 0), (2, 5, 5), (3, 50, 40), (4, 400, 0)],
        # in zb+zc, out of everything, back into za
    }
    assert _run(tracks) == _brute(tracks)


def test_first_point_inside_emits_enter(ray_session):
    tracks = {7: [(10, 5, 5), (11, 5, 6)]}
    got = _run(tracks)
    assert got == _brute(tracks)
    assert (7, 10, "za", 1) in got


def test_boundary_predicate_exact(ray_session):
    # points exactly ON the rect edges: x0 exclusive, x1 inclusive
    tracks = {3: [(1, 0, 40), (2, 100, 40), (3, 101, 40)]}
    got = _run(tracks)
    assert got == _brute(tracks)
    # x=0 is OUTSIDE za (x0 exclusive), x=100 INSIDE (x1 inclusive)
    assert (3, 2, "za", 1) in got and (3, 3, "za", -1) in got


def test_random_tracks_match_brute(ray_session):
    rng = np.random.default_rng(42)
    tracks = {}
    for t in range(25):
        n = int(rng.integers(1, 30))
        tracks[t] = [(i, int(rng.integers(-250, 350)),
                      int(rng.integers(-100, 100))) for i in range(n)]
    assert _run(tracks) == _brute(tracks)


def test_no_zones_crossed(ray_session):
    tracks = {5: [(1, 1000, 1000), (2, 2000, 2000)]}
    assert _run(tracks) == []


def test_too_many_zones_raises():
    with pytest.raises(ValueError):
        zone_transitions(None, [dict(RECTS[0], polygon_id=str(i))
                                for i in range(65)])
