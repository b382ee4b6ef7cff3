"""HyperLogLog sketch: accuracy vs exact, merge semilattice, both hash paths."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from metric_search_ray.pipelines import sketch


def test_registers_merge_is_semilattice():
    h = sketch.splitmix64(np.arange(30_000, dtype=np.uint64))
    full = sketch.registers_of(h, 12)
    a = sketch.registers_of(h[:10_000], 12)
    b = sketch.registers_of(h[10_000:], 12)
    assert np.array_equal(full, np.maximum(a, b))
    assert np.array_equal(np.maximum(a, b), np.maximum(b, a))
    assert np.array_equal(np.maximum(a, a), a)


@pytest.mark.parametrize("n", [500, 20_000, 200_000])
def test_hll_accuracy_int(n):
    vals = np.arange(n, dtype=np.int64) * 13 + 7
    est = sketch.estimate(
        sketch.registers_of(sketch.splitmix64(vals.astype(np.uint64)), 12))
    assert abs(est - n) / n < 0.08          # 5 sigma at p=12


def test_hll_distinct_dataset_matches_singlepass(ray_session):
    rng = np.random.default_rng(5)
    vals = rng.integers(0, 40_000, 120_000)        # heavy duplication
    exact = len(np.unique(vals))
    ds = rd.from_arrow(pa.table({"u": pa.array(vals, pa.int64())})).repartition(8)
    est = sketch.hll_distinct(ds, "u", p=12)
    # distributed estimate must EQUAL the single-pass estimate (register
    # max-merge is deterministic), and be close to exact
    h = sketch.splitmix64(vals.astype(np.uint64))
    single = sketch.estimate(sketch.registers_of(h, 12))
    assert est == pytest.approx(single, rel=0, abs=1e-9)
    assert abs(est - exact) / exact < 0.08


def test_hll_string_column(ray_session):
    docs = [f"doc body {i} text" for i in range(15_000)] + ["dup"] * 5_000
    ds = rd.from_arrow(pa.table({"t": pa.array(docs)})).repartition(4)
    est = sketch.hll_distinct(ds, "t", p=12)
    assert abs(est - 15_001) / 15_001 < 0.08


def test_hll_empty_and_unsupported():
    ds_like = pa.table({"x": pa.array([], pa.float64())})
    with pytest.raises(TypeError):
        sketch._hash_column(ds_like.column("x"))
    assert sketch.estimate(np.zeros(4096, np.uint8)) == 0.0
