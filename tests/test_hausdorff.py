"""hausdorff_pairs: symmetric discrete Hausdorff vs a Python oracle."""
import numpy as np
import pyarrow as pa

from metric_search_ray.pipelines.tracks import hausdorff_pairs


def _brute(tracks, pairs):
    rows = []
    for a, b in pairs:
        A = np.asarray(tracks.get(a, []), np.int64)
        B = np.asarray(tracks.get(b, []), np.int64)
        if len(A) == 0 or len(B) == 0:
            continue
        d2 = ((A[:, None, 0] - B[None, :, 0]) ** 2
              + (A[:, None, 1] - B[None, :, 1]) ** 2)
        h = max(int(d2.min(axis=1).max()), int(d2.min(axis=0).max()))
        rows.append((str(a), str(b), len(A), len(B), h))
    return sorted(rows)


def _run(tracks, pairs):
    import ray.data as rd
    tid, x, y = [], [], []
    for t, pts in tracks.items():
        for px, py in pts:
            tid.append(t)
            x.append(px)
            y.append(py)
    ds = rd.from_arrow(pa.table({
        "track_id": pa.array(np.asarray(tid, np.int64)),
        "lat_u": pa.array(np.asarray(y, np.int64)),
        "lon_u": pa.array(np.asarray(x, np.int64)),
    }))
    out = hausdorff_pairs(ds, pairs).to_pandas()
    if len(out) == 0:
        return []
    return sorted(zip(out["track_a"], out["track_b"], out["n_a"],
                      out["n_b"], out["h2_u"]))


def test_identical_tracks_distance_zero(ray_session):
    tracks = {1: [(0, 0), (10, 10), (20, 5)],
              2: [(0, 0), (10, 10), (20, 5)]}
    got = _run(tracks, [(1, 2)])
    assert got == [("1", "2", 3, 3, 0)]


def test_asymmetric_directed_components(ray_session):
    # A is a subset of B: h(A,B)=0 but h(B,A)>0 -> symmetric max picks it
    tracks = {1: [(0, 0)], 2: [(0, 0), (100, 0)]}
    got = _run(tracks, [(1, 2)])
    assert got == [("1", "2", 1, 2, 100 * 100)]


def test_random_tracks_match_brute(ray_session):
    rng = np.random.default_rng(7)
    tracks = {t: [(int(rng.integers(-1000, 1000)),
                   int(rng.integers(-1000, 1000)))
                  for _ in range(int(rng.integers(1, 40)))]
              for t in range(12)}
    pairs = [(a, b) for a in range(12) for b in range(a + 1, 12)]
    assert _run(tracks, pairs) == _brute(tracks, pairs)


def test_missing_track_emits_nothing(ray_session):
    tracks = {1: [(0, 0)]}
    assert _run(tracks, [(1, 99)]) == []
