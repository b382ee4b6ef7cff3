"""Distributed stats operators vs DuckDB ground truth."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from metric_search_ray.pipelines import stats


@pytest.fixture(scope="module")
def kv_table():
    rng = np.random.default_rng(3)
    n = 5000
    return pa.table({
        "k": pa.array(rng.integers(0, 7, n), pa.int64()),
        "u": pa.array(rng.integers(0, 400, n), pa.int64()),
        "q": pa.array(rng.integers(1, 51, n).astype(np.float64)),
    })


def test_distinct_count_matches_duckdb(ray_session, kv_table):
    ds = rd.from_arrow(kv_table).repartition(8)
    got = (stats.distinct_count(ds, "k", "u", out="n_u").to_pandas()
           .sort_values("k").reset_index(drop=True))
    exp = duckdb.connect().execute(
        "SELECT k, COUNT(DISTINCT u) AS n_u FROM kv GROUP BY 1 ORDER BY 1"
    ).df() if False else None
    con = duckdb.connect()
    con.register("kv", kv_table)
    exp = con.execute(
        "SELECT k, COUNT(DISTINCT u) AS n_u FROM kv GROUP BY 1 ORDER BY 1").df()
    assert got["k"].tolist() == exp["k"].tolist()
    assert got["n_u"].tolist() == exp["n_u"].tolist()


def test_grouped_quantiles_match_duckdb(ray_session, kv_table):
    probs = [0.25, 0.5, 0.75, 0.9]
    ds = rd.from_arrow(kv_table).repartition(8)
    got = stats.grouped_quantiles(ds, "k", "q", probs).sort_values(
        "k").reset_index(drop=True)
    con = duckdb.connect()
    con.register("kv", kv_table)
    exp = con.execute("""
        SELECT k, quantile_disc(q, 0.25) AS p25, quantile_disc(q, 0.5) AS p50,
               quantile_disc(q, 0.75) AS p75, quantile_disc(q, 0.9) AS p90
        FROM kv GROUP BY 1 ORDER BY 1""").df()
    for c in ["p25", "p50", "p75", "p90"]:
        assert got[c].tolist() == exp[c].tolist(), c


@pytest.mark.parametrize("n,q", [(1, 0.5), (2, 0.5), (4, 0.9), (10, 0.9),
                                 (7, 0.25), (100, 0.999)])
def test_quantile_disc_index_matches_duckdb(n, q):
    vals = list(range(1, n + 1))
    exp = duckdb.connect().execute(
        f"SELECT quantile_disc(x, {q}) FROM (SELECT unnest({vals}) AS x)"
    ).fetchone()[0]
    assert vals[stats.quantile_disc_index(q, n)] == exp


def test_distinct_count_single_block_and_empty_groups(ray_session):
    t = pa.table({"k": pa.array([1, 1, 1], pa.int64()),
                  "u": pa.array([5, 5, 5], pa.int64())})
    out = stats.distinct_count(rd.from_arrow(t), "k", "u").to_pandas()
    assert out["n_distinct"].tolist() == [1]


def test_grouped_percent_rank_matches_duckdb(ray_session, kv_table):
    ds = rd.from_arrow(kv_table).repartition(8)
    got = (stats.grouped_percent_rank(ds, "k", "q").to_pandas()
           .sort_values(["k", "q", "u"]).reset_index(drop=True))
    con = duckdb.connect()
    con.register("kv", kv_table)
    exp = con.execute("""
        SELECT k, u, q, percent_rank() OVER (PARTITION BY k ORDER BY q) AS pr
        FROM kv ORDER BY k, q, u""").df().reset_index(drop=True)
    assert np.array_equal(got["pr"].to_numpy(), exp["pr"].to_numpy())


def test_grouped_percent_rank_single_row_key(ray_session):
    t = pa.table({"k": pa.array([9], pa.int64()),
                  "q": pa.array([5.0])})
    out = stats.grouped_percent_rank(rd.from_arrow(t), "k", "q").to_pandas()
    assert out["pr"].tolist() == [0.0]


def test_exact_quantile_histogram_matches_duckdb(ray_session):
    rng = np.random.default_rng(17)
    # lognormal continuous values: high distinct count, heavy tail
    vals = np.round(rng.lognormal(4, 1, 30_000), 6)
    ds = rd.from_arrow(pa.table({"x": pa.array(vals, pa.float64())})).repartition(8)
    probs = [0.01, 0.25, 0.5, 0.9, 0.999]
    got = stats.exact_quantile_histogram(ds, "x", probs, bins=256,
                                         refine_limit=512)
    con = duckdb.connect()
    import pandas as pd
    con.register("t", pd.DataFrame({"x": vals}))
    for p in probs:
        exp = con.execute(f"SELECT quantile_disc(x, {p}) FROM t").fetchone()[0]
        assert got[p] == exp, (p, got[p], exp)


def test_exact_quantile_histogram_degenerate_hot_value(ray_session):
    # >refine_limit rows share one value -> zero-width short circuit
    vals = np.concatenate([np.full(5000, 7.5), np.array([1.0, 99.0])])
    ds = rd.from_arrow(pa.table({"x": pa.array(vals, pa.float64())}))
    got = stats.exact_quantile_histogram(ds, "x", [0.5], bins=16,
                                         refine_limit=100)
    assert got[0.5] == 7.5


def test_grouped_zscore_bit_equal_to_sql_closed_form(ray_session, kv_table):
    import pandas as pd
    ds = rd.from_arrow(kv_table).repartition(8)
    got = (stats.grouped_zscore(ds, "k", "u").to_pandas()
           .sort_values(["k", "u", "q"]).reset_index(drop=True))
    con = duckdb.connect()
    con.register("kv", kv_table)
    exp = con.execute("""
      WITH m AS (SELECT k, count(*) AS n, sum(u) AS s, sum(u*u) AS ss
                 FROM kv GROUP BY 1)
      SELECT kv.k, kv.u, kv.q,
        CASE WHEN m.n = 1 OR (CAST(m.ss AS DOUBLE) - CAST(m.s AS DOUBLE)*CAST(m.s AS DOUBLE)/m.n)/(m.n-1) = 0
             THEN 0.0
             ELSE (CAST(kv.u AS DOUBLE) - CAST(m.s AS DOUBLE)/m.n)
                  / sqrt((CAST(m.ss AS DOUBLE) - CAST(m.s AS DOUBLE)*CAST(m.s AS DOUBLE)/m.n)/(m.n-1)) END AS z
      FROM kv JOIN m USING (k) ORDER BY k, u, q""").df().reset_index(drop=True)
    assert np.array_equal(got["z"].to_numpy(), exp["z"].to_numpy())


def test_grouped_zscore_degenerate_groups(ray_session):
    t = pa.table({"k": pa.array([1, 2, 2, 3, 3], pa.int64()),
                  "u": pa.array([5, 7, 7, 1, 9], pa.int64())})
    out = (stats.grouped_zscore(rd.from_arrow(t), "k", "u").to_pandas()
           .sort_values(["k", "u"]).reset_index(drop=True))
    assert out["z"].tolist()[0] == 0.0          # n=1
    assert out["z"].tolist()[1:3] == [0.0, 0.0]  # var=0
    assert out["z"].tolist()[3] < 0 < out["z"].tolist()[4]


def test_exact_quantile_histogram_constant_and_null(ray_session):
    # constant column: early return, no histogram pass needed
    vals = np.full(1000, 42.5)
    ds = rd.from_arrow(pa.table({"x": pa.array(vals)}))
    assert stats.exact_quantile_histogram(ds, "x", [0.1, 0.9]) == {
        0.1: 42.5, 0.9: 42.5}
    # null rows are excluded from ranks (SQL quantile semantics)
    t = pa.table({"x": pa.array([1.0, 2.0, 3.0, None, None])})
    got = stats.exact_quantile_histogram(rd.from_arrow(t), "x", [0.5],
                                         bins=16, refine_limit=2)
    assert got[0.5] == 2.0


def test_distinct_count_ignores_nulls(ray_session):
    t = pa.table({"k": pa.array([1, 1, 1], pa.int64()),
                  "u": pa.array([5, None, 7], pa.int64())})
    out = stats.distinct_count(rd.from_arrow(t), "k", "u").to_pandas()
    assert out["n_distinct"].tolist() == [2]


def test_histogram_matches_numpy_and_sql_clip(ray_session):
    rng = np.random.default_rng(12)
    vals = np.concatenate([rng.uniform(0, 100, 5000), [100.0, 0.0, -5.0, 120.0]])
    ds = rd.from_arrow(pa.table({"x": pa.array(vals, pa.float64())})).repartition(6)
    got = stats.histogram(ds, "x", 0.0, 100.0, 10)
    inb = vals[(vals >= 0) & (vals <= 100)]
    idx = np.minimum(((inb - 0.0) / 10.0).astype(np.int64), 9)
    exp = np.bincount(idx, minlength=10)
    assert got.set_index("bin")["n"].to_dict() == {
        int(b): int(exp[b]) for b in np.flatnonzero(exp)}
    assert got["n"].sum() == len(inb)     # out-of-range rows dropped


# ------------------------------------------------------- round-3 regressions

def test_grouped_top_k_unsigned_order_with_zero(ray_session):
    """Descending top-k over an UNSIGNED order column containing 0:
    np.negative would wrap 0 to the TOP of an edge group (review
    finding) — dense-rank negation must keep it last."""
    import pyarrow as pa
    import ray.data as rd
    from metric_search_ray.pipelines import topk

    # one group spanning blocks (every group is an edge group with
    # target_num_blocks tiny), values include 0 and big uint64s
    n = 40
    vals = np.concatenate([[0, 2**63 + 7], np.arange(1, n - 1)]).astype(
        np.uint64)
    t = pa.table({"g": pa.array(["a"] * n),
                  "v": pa.array(vals, pa.uint64()),
                  "id": pa.array(np.arange(n, dtype=np.int64))})
    out = topk.grouped_top_k(rd.from_arrow(t).repartition(6), "g", "v", 3,
                             id_col="id", descending=True).to_pandas()
    got = set(out["v"].astype(np.uint64))
    exp = set(np.sort(vals)[-3:])
    assert got == exp, (got, exp)
    assert 0 not in got


def test_grouped_top_k_nan_rejected(ray_session):
    import pyarrow as pa
    import ray.data as rd
    from metric_search_ray.pipelines import topk

    t = pa.table({"g": ["a", "a", "a"], "v": [1.0, float("nan"), 2.0],
                  "id": [1, 2, 3]})
    with pytest.raises((ValueError, Exception)):
        topk.grouped_top_k(rd.from_arrow(t).repartition(2), "g", "v", 2,
                           id_col="id", descending=True).to_pandas()


def test_sort_block_aggregate_null_key_count(ray_session):
    """'count' with col=None counts ROWS — a NULL-valued group key must
    not zero it (count_all fix)."""
    import pyarrow as pa
    import ray.data as rd
    from metric_search_ray.pipelines.fastagg import sort_block_aggregate

    # nullable float key (Ray's own sort rejects None in string keys,
    # so nullable-numeric is the reachable case)
    t = pa.table({"k": pa.array([1.5, None, None, 2.5, 1.5], pa.float64()),
                  "v": pa.array([1, 2, 3, 4, 5], pa.int64())})
    out = sort_block_aggregate(rd.from_arrow(t).repartition(3), "k",
                               {"n": (None, "count"),
                                "s": ("v", "sum")}).to_pandas()
    m = {("<null>" if (k is None or (isinstance(k, float) and np.isnan(k)))
          else k): (n, s)
         for k, n, s in zip(out["k"], out["n"], out["s"])}
    assert m[1.5] == (2, 6)
    assert m[2.5] == (1, 4)
    assert m["<null>"] == (2, 5)


def test_percent_rank_and_zscore_reject_nulls(ray_session):
    import pyarrow as pa
    import ray.data as rd
    from metric_search_ray.pipelines import stats

    t = pa.table({"k": pa.array(["a", "a", "b"]),
                  "v": pa.array([1.0, None, 2.0], pa.float64())})
    with pytest.raises(Exception, match="NULL"):
        stats.grouped_percent_rank(rd.from_arrow(t), "k", "v").to_pandas()
    t2 = pa.table({"k": pa.array(["a", None, "b"]),
                   "v": pa.array([1, 2, 3], pa.int64())})
    with pytest.raises(Exception, match="NULL"):
        stats.grouped_zscore(rd.from_arrow(t2), "k", "v").to_pandas()
