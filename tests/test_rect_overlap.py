"""rect_overlap_join: PBSM + reference-point dedup vs brute force."""
import numpy as np
import pyarrow as pa

from metric_search_ray.pipelines.joins import rect_overlap_join


def _mk(n, seed, span=150_000_000, wmax=30_000_000):
    rng = np.random.default_rng(seed)
    ids = np.arange(n, dtype=np.int64) * 5 + 2
    x0 = rng.integers(-span, span - wmax, n).astype(np.int64)
    y0 = rng.integers(-span // 2, span // 2 - wmax, n).astype(np.int64)
    x1 = x0 + rng.integers(0, wmax, n)
    y1 = y0 + rng.integers(0, wmax, n)
    return ids, x0, x1, y0, y1


def _brute(r):
    ids, x0, x1, y0, y1 = r
    rows = []
    for i in range(len(ids)):
        for j in range(len(ids)):
            if ids[i] >= ids[j]:
                continue
            ox = min(x1[i], x1[j]) - max(x0[i], x0[j])
            oy = min(y1[i], y1[j]) - max(y0[i], y0[j])
            if ox >= 0 and oy >= 0:
                rows.append((ids[i], ids[j], int(ox) * int(oy)))
    return sorted(rows)


def _run(r, res):
    import ray.data as rd
    ids, x0, x1, y0, y1 = r
    ds = rd.from_arrow(pa.table({
        "rect_id": pa.array(ids), "x0": pa.array(x0), "x1": pa.array(x1),
        "y0": pa.array(y0), "y1": pa.array(y1)}))
    out = rect_overlap_join(ds, res=res).to_pandas()
    if len(out) == 0:
        return []
    return sorted(zip(out["id_a"], out["id_b"], out["area_u2"]))


def test_matches_brute_multiple_resolutions(ray_session):
    r = _mk(150, seed=1)
    exp = _brute(r)
    assert len(exp) > 0
    # the reference-point rule must give identical output at ANY grid:
    # resolution changes replication, never the result
    for res in (1, 3, 5):
        assert _run(r, res) == exp


def test_touching_edges_count_with_zero_area(ray_session):
    ids = np.asarray([1, 2], np.int64)
    x0 = np.asarray([0, 100], np.int64)
    x1 = np.asarray([100, 200], np.int64)
    y0 = np.asarray([0, 0], np.int64)
    y1 = np.asarray([50, 50], np.int64)
    assert _run((ids, x0, x1, y0, y1), 4) == [(1, 2, 0)]


def test_disjoint_rects_empty(ray_session):
    ids = np.asarray([1, 2], np.int64)
    x0 = np.asarray([0, 1_000_000], np.int64)
    x1 = np.asarray([10, 1_000_010], np.int64)
    y0 = np.asarray([0, 0], np.int64)
    y1 = np.asarray([10, 10], np.int64)
    assert _run((ids, x0, x1, y0, y1), 4) == []


def test_contained_rect_full_area(ray_session):
    ids = np.asarray([3, 9], np.int64)
    x0 = np.asarray([0, 10], np.int64)
    x1 = np.asarray([1_000_000, 20], np.int64)
    y0 = np.asarray([0, 10], np.int64)
    y1 = np.asarray([1_000_000, 20], np.int64)
    assert _run((ids, x0, x1, y0, y1), 3) == [(3, 9, 100)]


def test_empty_rects_dataset(ray_session):
    import ray.data as rd
    ds = rd.from_arrow(pa.table({
        "rect_id": pa.array([], pa.int64()), "x0": pa.array([], pa.int64()),
        "x1": pa.array([], pa.int64()), "y0": pa.array([], pa.int64()),
        "y1": pa.array([], pa.int64())}))
    assert rect_overlap_join(ds, res=3).count() == 0
