"""knn_self_join: halo-cell bounded kNN self-join vs brute force."""
import numpy as np
import pyarrow as pa
import pytest

from metric_search_ray.pipelines.joins import knn_self_join, _halo_res
from metric_search_ray import cell as cellmod


def _brute(ids, x, y, k, radius_u):
    """Exact oracle: per point, k nearest others within radius, ties by id."""
    r2 = np.int64(radius_u) * np.int64(radius_u)
    rows = []
    for i in range(len(ids)):
        dx = x - x[i]
        dy = y - y[i]
        d2 = dx * dx + dy * dy
        ok = np.flatnonzero((d2 <= r2) & (ids != ids[i]))
        order = ok[np.lexsort((ids[ok], d2[ok]))][:k]
        for rank, j in enumerate(order, 1):
            rows.append((ids[i], ids[j], rank, int(d2[j])))
    return sorted(rows)


def _points(n, seed, span=180_000_000):
    rng = np.random.default_rng(seed)
    ids = np.arange(n, dtype=np.int64) * 7 + 3
    x = rng.integers(-span, span, n).astype(np.int64)
    y = rng.integers(-span // 2, span // 2, n).astype(np.int64)
    return ids, x, y


def _run(ids, x, y, k, radius_u):
    import ray.data as rd
    ds = rd.from_arrow(pa.table({
        "o_orderkey": pa.array(ids), "lat_u": pa.array(y),
        "lon_u": pa.array(x)}))
    out = knn_self_join(ds, k=k, radius_u=radius_u).to_pandas()
    if len(out) == 0:
        return []
    return sorted(zip(out["o_orderkey"], out["neighbor_id"],
                      out["rank"], out["d2_u"]))


def test_halo_res_monotone():
    assert _halo_res(cellmod.LON_SPAN_U) == 0
    # cell side must stay >= radius in both axes
    for r in (1_000, 250_000, 2_000_000, 40_000_000):
        res = _halo_res(r)
        assert (cellmod.LON_SPAN_U >> res) >= r
        assert (cellmod.LAT_SPAN_U >> res) >= r
        if res < cellmod.MAX_RES:  # coarsest such grid
            assert ((cellmod.LON_SPAN_U >> (res + 1)) < r
                    or (cellmod.LAT_SPAN_U >> (res + 1)) < r)


def test_knn_self_join_matches_brute(ray_session):
    ids, x, y = _points(400, seed=1)
    got = _run(ids, x, y, k=3, radius_u=20_000_000)
    assert got == _brute(ids, x, y, 3, 20_000_000)


def test_knn_self_join_dense_ties(ray_session):
    # many co-located points: d2 == 0 ties must break by neighbor id
    ids, x, y = _points(120, seed=2)
    x[::3] = x[0]
    y[::3] = y[0]
    got = _run(ids, x, y, k=5, radius_u=30_000_000)
    assert got == _brute(ids, x, y, 5, 30_000_000)


def test_knn_self_join_huge_radius_single_cell(ray_session):
    # radius > half the span -> res 0, one global cell, no halo rows
    ids, x, y = _points(80, seed=3)
    got = _run(ids, x, y, k=4, radius_u=cellmod.LON_SPAN_U)
    assert got == _brute(ids, x, y, 4, cellmod.LON_SPAN_U)


def test_knn_self_join_sparse_no_neighbors(ray_session):
    # radius so small nothing pairs up (random 64-bit-ish coords)
    ids, x, y = _points(100, seed=4)
    got = _run(ids, x, y, k=3, radius_u=10)
    assert got == []


def test_knn_self_join_chunking_invariant(ray_session):
    ids, x, y = _points(150, seed=5)
    import ray.data as rd
    ds = rd.from_arrow(pa.table({
        "o_orderkey": pa.array(ids), "lat_u": pa.array(y),
        "lon_u": pa.array(x)}))
    a = knn_self_join(ds, k=3, radius_u=25_000_000, chunk=7).to_pandas()
    b = knn_self_join(ds, k=3, radius_u=25_000_000, chunk=4096).to_pandas()
    key = ["o_orderkey", "neighbor_id", "rank", "d2_u"]
    sa = a[key].sort_values(key).reset_index(drop=True)
    sb = b[key].sort_values(key).reset_index(drop=True)
    assert sa.equals(sb)


def test_knn_self_join_bad_args():
    with pytest.raises(ValueError):
        _halo_res(0)
    with pytest.raises(ValueError):
        knn_self_join(None, k=0, radius_u=10)


def test_hot_cell_two_level_kernel(ray_session):
    # a dense "city" cluster big enough to cross _DENSE_LIMIT plus
    # sparse outliers and co-located ties: exercises the fine-binned
    # level-1 resolve + unresolved fallback, must stay brute-exact
    rng = np.random.default_rng(9)
    n_city = 2500
    ids = np.arange(n_city + 60, dtype=np.int64) * 3 + 1
    x = np.concatenate([
        rng.integers(0, 3_000_000, n_city),      # dense cluster
        rng.integers(-60_000_000, 60_000_000, 60)]).astype(np.int64)
    y = np.concatenate([
        rng.integers(0, 3_000_000, n_city),
        rng.integers(-30_000_000, 30_000_000, 60)]).astype(np.int64)
    x[10:20] = x[10]  # co-located block inside the hot cell
    y[10:20] = y[10]
    got = _run(ids, x, y, k=4, radius_u=2_000_000)
    assert got == _brute(ids, x, y, 4, 2_000_000)


def test_string_ids_supported(ray_session):
    # id_col is a free parameter: string ids must work, including the
    # typed empty tables emitted by no-home-row halo groups
    import ray.data as rd
    ids, x, y = _points(120, seed=8)
    sids = np.asarray([f"p-{i:04d}" for i in ids], object)
    ds = rd.from_arrow(pa.table({
        "o_orderkey": pa.array(sids, pa.string()),
        "lat_u": pa.array(y), "lon_u": pa.array(x)}))
    out = knn_self_join(ds, k=3, radius_u=25_000_000).to_pandas()
    got = sorted(zip(out["o_orderkey"], out["neighbor_id"],
                     out["rank"], out["d2_u"]))
    exp = [(f"p-{a:04d}", f"p-{b:04d}", r, d)
           for a, b, r, d in _brute(ids, x, y, 3, 25_000_000)]
    assert got == sorted(exp)
