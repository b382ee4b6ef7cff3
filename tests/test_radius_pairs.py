"""radius_pairs_join: bipartite within-distance join vs brute force."""
import numpy as np
import pyarrow as pa

from metric_search_ray.pipelines.joins import radius_pairs_join


def _mk(n, seed, span=170_000_000):
    rng = np.random.default_rng(seed)
    ids = np.arange(n, dtype=np.int64) * 2 + seed
    x = rng.integers(-span, span, n).astype(np.int64)
    y = rng.integers(-span // 2, span // 2, n).astype(np.int64)
    return ids, x, y


def _brute(a, b, radius_u):
    r2 = np.int64(radius_u) ** 2
    ia, xa, ya = a
    ib, xb, yb = b
    rows = []
    for i in range(len(ia)):
        d2 = (xb - xa[i]) ** 2 + (yb - ya[i]) ** 2
        for j in np.flatnonzero(d2 <= r2):
            rows.append((ia[i], ib[j], int(d2[j])))
    return sorted(rows)


def _run(a, b, radius_u):
    import ray.data as rd

    def ds(t, idc):
        ids, x, y = t
        return rd.from_arrow(pa.table({
            idc: pa.array(ids), "lat_u": pa.array(y),
            "lon_u": pa.array(x)}))

    out = radius_pairs_join(ds(a, "id_a"), ds(b, "id_b"),
                            radius_u=radius_u).to_pandas()
    if len(out) == 0:
        return []
    return sorted(zip(out["id_a"], out["id_b"], out["d2_u"]))


def test_random_matches_brute(ray_session):
    a = _mk(300, 1)
    b = _mk(400, 2)
    got = _run(a, b, 25_000_000)
    assert got == _brute(a, b, 25_000_000)
    assert len(got) > 0


def test_equal_ids_across_sides_pair(ray_session):
    # the sides are distinct tables: same id value must still pair
    a = (np.asarray([7], np.int64), np.asarray([0], np.int64),
         np.asarray([0], np.int64))
    b = (np.asarray([7], np.int64), np.asarray([10], np.int64),
         np.asarray([0], np.int64))
    assert _run(a, b, 100) == [(7, 7, 100)]


def test_boundary_inclusive(ray_session):
    a = (np.asarray([1], np.int64), np.asarray([0], np.int64),
         np.asarray([0], np.int64))
    b = (np.asarray([2, 3], np.int64), np.asarray([50, 51], np.int64),
         np.asarray([0, 0], np.int64))
    # d2 = 2500 exactly on the boundary is IN; 2601 is out
    assert _run(a, b, 50) == [(1, 2, 2500)]


def test_empty_side(ray_session):
    a = _mk(50, 3)
    b = (np.empty(0, np.int64), np.empty(0, np.int64),
         np.empty(0, np.int64))
    assert _run(a, b, 1_000_000) == []
