"""hamming_pairs scope_col: same-scope-only pair generation."""
import numpy as np


def test_hamming_pairs_scope_col(ray_session):
    """scope_col: only same-scope pairs emitted, exact hamming."""
    import ray.data as rd
    import pyarrow as pa
    from metric_search_ray.pipelines.dedup import hamming_pairs
    rng = np.random.default_rng(3)
    n = 600
    ids = np.arange(n, dtype=np.int64)
    h = rng.integers(0, 1 << 16, n).astype(np.int64)
    h[100:140] = h[100]          # identical cluster, split across scopes
    scope = rng.integers(0, 5, n).astype(np.int64)
    ds = rd.from_arrow(pa.table({
        "image_id": pa.array(ids), "phash": pa.array(h),
        "tile": pa.array(scope)}))
    out = hamming_pairs(ds, max_hamming=2, bit_width=16,
                        scope_col="tile").to_pandas()
    got = sorted(zip(out["id_a"], out["id_b"], out["hamming"]))
    exp = []
    for i in range(n):
        for j in range(i + 1, n):
            if scope[i] != scope[j]:
                continue
            d = bin(int(h[i]) ^ int(h[j])).count("1")
            if d <= 2:
                exp.append((ids[i], ids[j], d))
    assert got == sorted(exp)
    assert len(exp) > 0


def test_hamming_pairs_scope_overflow_raises(ray_session):
    import ray.data as rd
    import pyarrow as pa
    from metric_search_ray.pipelines.dedup import hamming_pairs
    ds = rd.from_arrow(pa.table({
        "image_id": pa.array([1, 2], pa.int64()),
        "phash": pa.array([3, 3], pa.int64()),
        "tile": pa.array([0, 1 << 60], pa.int64())}))
    import pytest as _pytest
    with _pytest.raises(Exception):
        hamming_pairs(ds, max_hamming=2, bit_width=16,
                      scope_col="tile").to_pandas()


def test_scope_rejects_wide_band(ray_session):
    # max_hamming=0 -> one 64-bit band: no headroom for a scope fold
    import ray.data as rd
    import pyarrow as pa
    import pytest as _pytest
    from metric_search_ray.pipelines.dedup import hamming_pairs
    ds = rd.from_arrow(pa.table({
        "image_id": pa.array([1], pa.int64()),
        "phash": pa.array([3], pa.int64()),
        "tile": pa.array([0], pa.int64())}))
    with _pytest.raises(ValueError, match="headroom"):
        hamming_pairs(ds, max_hamming=0, bit_width=64, scope_col="tile")
