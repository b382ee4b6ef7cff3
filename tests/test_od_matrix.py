"""od_matrix: per-track origin->destination flow counts vs oracle."""
import numpy as np
import pyarrow as pa

from metric_search_ray.pipelines.tracks import od_matrix
from metric_search_ray import cell as cellmod


def _brute(tid, seq, lat, lon, res):
    from collections import Counter
    by_t: dict = {}
    for t, s, la, lo in zip(tid, seq, lat, lon):
        by_t.setdefault(t, []).append((s, la, lo))
    n = Counter()
    for t, pts in by_t.items():
        pts.sort()
        _, la0, lo0 = pts[0]
        _, la1, lo1 = pts[-1]
        ot = int(cellmod.tile_of(np.asarray([la0], np.int64),
                                 np.asarray([lo0], np.int64), res)[0])
        dt = int(cellmod.tile_of(np.asarray([la1], np.int64),
                                 np.asarray([lo1], np.int64), res)[0])
        n[(ot, dt)] += 1
    return sorted((o, d, k) for (o, d), k in n.items())


def test_od_matrix_matches_brute(ray_session):
    import ray.data as rd
    rng = np.random.default_rng(5)
    n = 3000
    tid = rng.integers(0, 120, n).astype(np.int64)
    seq = rng.permutation(n).astype(np.int64)  # shuffled order keys
    lat = rng.integers(-89_000_000, 89_000_000, n).astype(np.int64)
    lon = rng.integers(-179_000_000, 179_000_000, n).astype(np.int64)
    ds = rd.from_arrow(pa.table({
        "track_id": pa.array(tid), "seq": pa.array(seq),
        "lat_u": pa.array(lat), "lon_u": pa.array(lon)}))
    out = od_matrix(ds, res=3).to_pandas()
    got = sorted(zip(out["o_tile"], out["d_tile"], out["n_tracks"]))
    assert got == _brute(tid, seq, lat, lon, 3)


def test_single_point_track_self_flow(ray_session):
    import ray.data as rd
    ds = rd.from_arrow(pa.table({
        "track_id": pa.array([9], pa.int64()),
        "seq": pa.array([0], pa.int64()),
        "lat_u": pa.array([1_000_000], pa.int64()),
        "lon_u": pa.array([2_000_000], pa.int64())}))
    out = od_matrix(ds, res=4).to_pandas()
    assert len(out) == 1 and out["o_tile"][0] == out["d_tile"][0]
    assert out["n_tracks"][0] == 1
