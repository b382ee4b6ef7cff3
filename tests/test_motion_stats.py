"""motion_stats: per-track motion features vs a Python oracle."""
import math

import numpy as np
import pyarrow as pa

from metric_search_ray.pipelines.tracks import motion_stats


def _brute(tracks):
    rows = []
    for tid, pts in tracks.items():
        pts = sorted(pts)
        octs = [0] * 8
        length = 0
        max2 = 0
        for (_, y0, x0), (_, y1, x1) in zip(pts, pts[1:]):
            dlat, dlon = y1 - y0, x1 - x0
            s2 = dlat * dlat + dlon * dlon
            length += math.floor(math.sqrt(float(s2)))
            max2 = max(max2, s2)
            octs[(4 if dlon < 0 else 0) | (2 if dlat < 0 else 0)
                 | (1 if abs(dlon) < abs(dlat) else 0)] += 1
        rows.append((tid, len(pts) - 1, length, max2, tuple(octs)))
    return sorted(rows)


def _run(tracks):
    import ray.data as rd
    tid, seq, lat, lon = [], [], [], []
    for t, pts in tracks.items():
        for s, y, x in pts:
            tid.append(t)
            seq.append(s)
            lat.append(y)
            lon.append(x)
    rng = np.random.default_rng(0)
    perm = rng.permutation(len(tid))
    ds = rd.from_arrow(pa.table({
        "track_id": pa.array(np.asarray(tid, np.int64)[perm]),
        "seq": pa.array(np.asarray(seq, np.int64)[perm]),
        "lat_u": pa.array(np.asarray(lat, np.int64)[perm]),
        "lon_u": pa.array(np.asarray(lon, np.int64)[perm])}))
    out = motion_stats(ds).to_pandas()
    return sorted(
        (r.track_id, r.n_steps, r.len_u, r.max_step2,
         tuple(getattr(r, f"oct{i}") for i in range(8)))
        for r in out.itertuples())


def test_random_tracks_match_brute(ray_session):
    rng = np.random.default_rng(13)
    tracks = {t: [(i, int(rng.integers(-80_000_000, 80_000_000)),
                   int(rng.integers(-170_000_000, 170_000_000)))
                  for i in range(int(rng.integers(1, 25)))]
              for t in range(30)}
    assert _run(tracks) == _brute(tracks)


def test_octants_and_zero_steps(ray_session):
    # one step in each cardinal/diagonal direction + a zero step
    tracks = {5: [(0, 0, 0), (1, 0, 10), (2, 10, 10), (3, 10, 0),
                  (4, 0, 0), (5, 0, 0)]}
    got = _run(tracks)
    exp = _brute(tracks)
    assert got == exp
    # the zero step (seq 4 -> 5) lands in octant 0 by the contract
    assert got[0][4][0] >= 1


def test_single_point_track(ray_session):
    got = _run({9: [(0, 5, 5)]})
    assert got == [(9, 0, 0, 0, (0,) * 8)]
