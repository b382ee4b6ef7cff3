"""covisit_pairs: shared-distinct-cell pair mining vs a Python oracle."""
import numpy as np
import pyarrow as pa

from metric_search_ray.pipelines.tracks import covisit_pairs
from metric_search_ray import cell as cellmod


def _brute(tid, lat, lon, res, min_shared, cell_cap):
    tiles = cellmod.tile_of(np.asarray(lat, np.int64),
                            np.asarray(lon, np.int64), res)
    cells: dict = {}
    for t, c in zip(tid, tiles):
        cells.setdefault(int(c), set()).add(int(t))
    from collections import Counter
    n = Counter()
    for c, tr in cells.items():
        if len(tr) > cell_cap:
            continue
        tr = sorted(tr)
        for i in range(len(tr)):
            for j in range(i + 1, len(tr)):
                n[(tr[i], tr[j])] += 1
    return sorted((a, b, k) for (a, b), k in n.items() if k >= min_shared)


def _run(tid, lat, lon, res, min_shared, cell_cap):
    import ray.data as rd
    ds = rd.from_arrow(pa.table({
        "track_id": pa.array(np.asarray(tid, np.int64)),
        "lat_u": pa.array(np.asarray(lat, np.int64)),
        "lon_u": pa.array(np.asarray(lon, np.int64)),
    }))
    out = covisit_pairs(ds, res=res, min_shared=min_shared,
                        cell_cap=cell_cap).to_pandas()
    if len(out) == 0:
        return []
    return sorted(zip(out["a"], out["b"], out["n_shared"]))


def test_random_matches_brute(ray_session):
    rng = np.random.default_rng(11)
    n = 2000
    tid = rng.integers(0, 40, n)
    lat = rng.integers(-80_000_000, 80_000_000, n)
    lon = rng.integers(-170_000_000, 170_000_000, n)
    got = _run(tid, lat, lon, res=3, min_shared=2, cell_cap=256)
    assert got == _brute(tid, lat, lon, 3, 2, 256)
    assert len(got) > 0  # the fixture actually produces co-visits


def test_repeat_visits_collapse(ray_session):
    # one track visiting the same cell 100 times still counts ONCE
    tid = [1] * 100 + [2]
    lat = [5_000_000] * 101
    lon = [5_000_000] * 101
    # only 1 shared cell -> below min_shared=2 threshold
    assert _run(tid, lat, lon, res=4, min_shared=2, cell_cap=10) == []
    # at min_shared=1 it appears exactly once
    assert _run(tid, lat, lon, res=4, min_shared=1, cell_cap=10) == \
        [(1, 2, 1)]


def test_hot_cell_cap_drops(ray_session):
    # 30 tracks in one cell, cap 10 -> the cell contributes nothing
    tid = list(range(30))
    lat = [0] * 30
    lon = [0] * 30
    assert _run(tid, lat, lon, res=4, min_shared=1, cell_cap=10) == []
    got = _run(tid, lat, lon, res=4, min_shared=1, cell_cap=64)
    assert len(got) == 30 * 29 // 2


def test_string_track_ids_preserved(ray_session):
    # string ids — accepted by the generic track_col API — must come
    # back as strings, matching the int-id result under the t<NN> map
    import ray.data as rd
    rng = np.random.default_rng(13)
    n = 600
    tid = rng.integers(0, 20, n)
    lat = rng.integers(-40_000_000, 40_000_000, n)
    lon = rng.integers(-40_000_000, 40_000_000, n)
    exp = _brute(tid, lat, lon, 3, 2, 256)
    ds = rd.from_arrow(pa.table({
        "track_id": pa.array([f"t{int(t):02d}" for t in tid], pa.string()),
        "lat_u": pa.array(np.asarray(lat, np.int64)),
        "lon_u": pa.array(np.asarray(lon, np.int64)),
    }))
    out = covisit_pairs(ds, res=3, min_shared=2, cell_cap=256).to_pandas()
    assert out["a"].map(type).eq(str).all()
    got = sorted((int(a[1:]), int(b[1:]), int(k))
                 for a, b, k in zip(out["a"], out["b"], out["n_shared"]))
    assert got == exp
