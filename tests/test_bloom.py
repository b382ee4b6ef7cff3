"""Bloom-filter semi-join: no false negatives, exact composed result."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from metric_search_ray.pipelines import bloom


def test_bloom_no_false_negatives_and_low_fp():
    keys = np.arange(0, 20_000, 2, dtype=np.int64)          # evens
    m_bits = len(keys) * 16
    h = bloom.splitmix64(keys.astype(np.uint64))
    bits = np.zeros((m_bits + 7) // 8, np.uint8)
    pos = bloom._probe_positions(h, m_bits, 4).ravel()
    np.bitwise_or.at(bits, pos >> 3, np.left_shift(np.uint8(1), (pos & 7).astype(np.uint8)))
    # every inserted key must hit
    ph = bloom._probe_positions(h, m_bits, 4)
    hit = np.ones(len(keys), bool)
    for i in range(4):
        p = ph[:, i]
        hit &= (bits[p >> 3] & np.left_shift(np.uint8(1), (p & 7).astype(np.uint8))) != 0
    assert hit.all()
    # odds: false-positive rate well under 2%
    odds = np.arange(1, 20_000, 2, dtype=np.int64)
    po = bloom._probe_positions(bloom.splitmix64(odds.astype(np.uint64)), m_bits, 4)
    fp = np.ones(len(odds), bool)
    for i in range(4):
        p = po[:, i]
        fp &= (bits[p >> 3] & np.left_shift(np.uint8(1), (p & 7).astype(np.uint8))) != 0
    assert fp.mean() < 0.02


def test_bloom_semi_join_exact(ray_session):
    rng = np.random.default_rng(3)
    probe = pa.table({"pk": pa.array(rng.integers(0, 50_000, 30_000), pa.int64()),
                      "payload": pa.array(np.arange(30_000), pa.int64())})
    keys = pa.table({"kk": pa.array(rng.choice(50_000, 2_000, replace=False)
                                    .astype(np.int64))})
    pds = rd.from_arrow(probe).repartition(6)
    kds = rd.from_arrow(keys).repartition(2)
    got = (bloom.bloom_semi_join(pds, kds, "pk", "kk").to_pandas()
           .sort_values(["pk", "payload"]).reset_index(drop=True))
    kset = set(keys.column("kk").to_pylist())
    exp = (probe.to_pandas()[lambda d: d["pk"].isin(kset)]
           .sort_values(["pk", "payload"]).reset_index(drop=True))
    assert got["pk"].tolist() == exp["pk"].tolist()
    assert got["payload"].tolist() == exp["payload"].tolist()


def test_bloom_build_distributed_matches_single(ray_session):
    vals = np.arange(5_000, dtype=np.int64)
    ds = rd.from_arrow(pa.table({"x": pa.array(vals)})).repartition(5)
    bits_d = bloom.build_bloom(ds, "x", 80_000)
    bits_s = bloom.build_bloom(rd.from_arrow(pa.table({"x": pa.array(vals)})), "x", 80_000)
    assert np.array_equal(bits_d, bits_s)


def test_bloom_string_keys(ray_session):
    keys = rd.from_arrow(pa.table({"s": pa.array([f"k-{i}" for i in range(500)])}))
    probe = rd.from_arrow(pa.table(
        {"s": pa.array([f"k-{i}" for i in range(0, 1500, 3)])}))
    got = bloom.bloom_semi_join(probe, keys, "s", "s").to_pandas()
    assert sorted(got["s"]) == sorted(f"k-{i}" for i in range(0, 500, 3))
