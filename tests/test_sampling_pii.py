"""Sampling + PII-scrub operators: determinism, SQL-hash parity, rates."""

import hashlib

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from metric_search_ray.pipelines import sampling, text as textops


def _docs(n=400):
    rng = np.random.default_rng(7)
    langs = np.array(["en", "de", "fr", "es", "zh"])[rng.integers(0, 5, n)]
    return pa.table({"doc_id": pa.array(np.arange(n), pa.int64()),
                     "lang": pa.array(langs, pa.string())})


def test_hash_split_deterministic_and_layout_independent(ray_session):
    t = _docs()
    a = sampling.hash_split(rd.from_arrow(t), "doc_id").to_pandas()
    b = sampling.hash_split(rd.from_arrow(t).repartition(7), "doc_id").to_pandas()
    a = a.sort_values("doc_id").reset_index(drop=True)
    b = b.sort_values("doc_id").reset_index(drop=True)
    assert (a["split"] == b["split"]).all()
    # matches the md5 bucket contract row by row
    for did, split in zip(a["doc_id"], a["split"]):
        bkt = int.from_bytes(hashlib.md5(str(did).encode()).digest()[8:],
                             "little") % 100
        assert split == ("test" if bkt < 10 else "train")
    frac = (a["split"] == "test").mean()
    assert 0.03 < frac < 0.2  # ~10% of 400


def test_stratified_sample_independent_per_stratum(ray_session):
    t = _docs(1000)
    out = sampling.stratified_sample(
        rd.from_arrow(t), "doc_id", "lang", keep_buckets=20).to_pandas()
    full = t.to_pandas()
    # every kept row satisfies the salted-hash contract; every
    # satisfying row is kept (exactness, not just rate)
    kept = set(out["doc_id"])
    for did, lang in zip(full["doc_id"], full["lang"]):
        bkt = int.from_bytes(
            hashlib.md5(f"{lang}|{did}".encode()).digest()[8:],
            "little") % 100
        assert (did in kept) == (bkt < 20)
    # each stratum individually near the target rate
    full["kept"] = full["doc_id"].isin(kept).astype(float)
    rates = full.groupby("lang")["kept"].mean()
    assert ((rates > 0.05) & (rates < 0.45)).all(), rates.to_dict()


def test_hash_sample_subset_of_split(ray_session):
    t = _docs()
    samp = sampling.hash_sample(rd.from_arrow(t), "doc_id",
                                keep_buckets=10).to_pandas()
    split = sampling.hash_split(rd.from_arrow(t), "doc_id").to_pandas()
    test_ids = set(split[split["split"] == "test"]["doc_id"])
    assert set(samp["doc_id"]) == test_ids


@pytest.mark.parametrize("txt,n_exp,clean_exp", [
    ("mail bob.smith+x@ex.co.uk now", 1, "mail [EMAIL] now"),
    ("ip 10.0.12.255 stop", 1, "ip [IP] stop"),
    ("call +44 20 7946 0958 ok", 1, "call [PHONE] ok"),
    ("a@b.io 1.2.3.4 +1 555 123 4567", 3, "[EMAIL] [IP] [PHONE]"),
    ("nothing here", 0, "nothing here"),
    ("", 0, ""),
])
def test_pii_scrub_cases(ray_session, txt, n_exp, clean_exp):
    ds = rd.from_arrow(pa.table({"doc_id": pa.array([1], pa.int64()),
                                 "text": pa.array([txt], pa.string())}))
    out = textops.pii_scrub(ds).to_pandas()
    assert out["n_redactions"][0] == n_exp
    assert out["clean_text"][0] == clean_exp


def test_pii_scrub_ip_not_double_counted_as_phone(ray_session):
    # dotted quad must be consumed by the IP pass before the phone pass
    ds = rd.from_arrow(pa.table({"doc_id": pa.array([1], pa.int64()),
                                 "text": pa.array(["x 192.168.001.001 y"],
                                                  pa.string())}))
    out = textops.pii_scrub(ds).to_pandas()
    assert out["n_redactions"][0] == 1
    assert "[IP]" in out["clean_text"][0]
    assert "[PHONE]" not in out["clean_text"][0]


def test_near_dup_dedup_transitive_closure(ray_session):
    # planted chain 1~2, 2~3 (1!~3) plus isolated 4,5: dedup must keep
    # exactly {1, 4, 5} — transitivity through the component, min id kept
    from metric_search_ray.pipelines import dedup

    docs = pa.table({"doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
                     "text": pa.array(["a", "b", "c", "d", "e"])})
    pairs = pa.table({"id_a": pa.array([1, 2], pa.int64()),
                      "id_b": pa.array([2, 3], pa.int64())})
    kept = dedup.near_dup_dedup(rd.from_arrow(docs), rd.from_arrow(pairs))
    assert sorted(kept.to_pandas()["doc_id"]) == [1, 4, 5]


def test_near_dup_dedup_no_pairs_keeps_all(ray_session):
    from metric_search_ray.pipelines import dedup

    docs = pa.table({"doc_id": pa.array([7, 8], pa.int64())})
    pairs = pa.table({"id_a": pa.array([], pa.int64()),
                      "id_b": pa.array([], pa.int64())})
    kept = dedup.near_dup_dedup(rd.from_arrow(docs), rd.from_arrow(pairs))
    assert sorted(kept.to_pandas()["doc_id"]) == [7, 8]


def test_bm25_matches_bruteforce(ray_session):
    from metric_search_ray.pipelines import text as textops

    docs = ["table spark table", "window vector", "spark", "nothing here",
            "table table table spark window", ""]
    ids = np.arange(len(docs), dtype=np.int64)
    terms = ["table", "spark", "window"]
    ds = rd.from_arrow(pa.table({"doc_id": pa.array(ids, pa.int64()),
                                 "text": pa.array(docs, pa.string())}))
    out = (textops.bm25_score(ds, terms).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    # brute force
    toks = [d.split() for d in docs]
    lens = np.array([len(t) for t in toks], np.float64)
    n = len(docs)
    avgdl = lens.sum() / n
    k1, b = 1.2, 0.75
    exp = {}
    for i, t in enumerate(toks):
        s = 0.0
        for term in terms:
            df = sum(1 for tt in toks if term in tt)
            idf = np.log((n - df + 0.5) / (df + 0.5) + 1.0)
            tf = t.count(term)
            s += idf * tf * (k1 + 1.0) / (tf + k1 * (1 - b + b * lens[i] / avgdl))
        if s > 0:
            exp[int(ids[i])] = s
    assert sorted(out["doc_id"]) == sorted(exp)
    for did, sc in zip(out["doc_id"], out["score"]):
        assert abs(sc - exp[int(did)]) < 1e-12, (did, sc, exp[int(did)])


def test_near_dup_dedup_paths_agree_and_match_unionfind(ray_session):
    from metric_search_ray import graph
    from metric_search_ray.pipelines import dedup

    rng = np.random.default_rng(5)
    e = rng.integers(0, 40, (30, 2))
    e = e[e[:, 0] != e[:, 1]]
    docs = pa.table({"doc_id": pa.array(np.arange(50), pa.int64())})
    pairs = pa.table({"id_a": pa.array(e[:, 0], pa.int64()),
                      "id_b": pa.array(e[:, 1], pa.int64())})
    k_driver = dedup.near_dup_dedup(rd.from_arrow(docs), rd.from_arrow(pairs))
    k_dist = dedup.near_dup_dedup(rd.from_arrow(docs), rd.from_arrow(pairs),
                                  num_partitions=4, driver_edge_cap=0)
    a = sorted(k_driver.to_pandas()["doc_id"])
    b = sorted(k_dist.to_pandas()["doc_id"])
    assert a == b
    # union-find oracle: keep ids that are the min of their component
    g = graph.Graph(e, n_nodes=50)
    drop = set()
    for comp in g.connected_components():
        if len(comp) > 1:
            drop |= set(comp) - {min(comp)}
    assert a == sorted(set(range(50)) - drop)


def test_grouped_top_k_matches_window_oracle(ray_session):
    import duckdb
    from metric_search_ray.pipelines import topk

    rng = np.random.default_rng(11)
    n = 5000
    t = pa.table({
        "g": pa.array(rng.integers(0, 137, n), pa.int64()),  # many groups
        "v": pa.array(rng.integers(0, 50, n).astype(np.float64)),  # heavy ties
        "rid": pa.array(np.arange(n), pa.int64()),
    })
    out = (topk.grouped_top_k(rd.from_arrow(t).repartition(9), "g", "v",
                              k=3, id_col="rid")
           .to_pandas().sort_values(["g", "rank"]).reset_index(drop=True))
    exp = duckdb.sql("""
        SELECT g, v, rid,
               row_number() OVER (PARTITION BY g ORDER BY v DESC, rid) AS rank
        FROM t QUALIFY rank <= 3 ORDER BY g, rank""").df()
    assert len(out) == len(exp)
    assert (out["g"].to_numpy() == exp["g"].to_numpy()).all()
    assert (out["rid"].to_numpy() == exp["rid"].to_numpy()).all()
    assert (out["rank"].to_numpy() == exp["rank"].to_numpy()).all()


def test_grouped_top_k_ascending_and_small_groups(ray_session):
    import duckdb
    from metric_search_ray.pipelines import topk

    t = pa.table({"g": pa.array([1, 1, 2], pa.int64()),
                  "v": pa.array([5.0, 3.0, 9.0]),
                  "rid": pa.array([10, 11, 12], pa.int64())})
    out = (topk.grouped_top_k(rd.from_arrow(t), "g", "v", k=2,
                              id_col="rid", descending=False)
           .to_pandas().sort_values(["g", "rank"]).reset_index(drop=True))
    exp = duckdb.sql("""
        SELECT g, v, rid, row_number() OVER (PARTITION BY g ORDER BY v, rid) AS rank
        FROM t QUALIFY rank <= 2 ORDER BY g, rank""").df()
    assert out["rid"].tolist() == exp["rid"].tolist()
    assert out["rank"].tolist() == exp["rank"].tolist()


def test_grouped_top_k_fuzz_vs_duckdb(ray_session):
    import duckdb
    from metric_search_ray.pipelines import topk

    for seed, k, ngroups, blocks, desc in [(0, 1, 3, 2, True), (1, 7, 50, 5, True),
                                           (2, 3, 1, 3, False), (3, 2, 200, 8, True),
                                           (4, 10, 5, 4, False)]:
        rng = np.random.default_rng(seed)
        n = int(rng.integers(50, 2000))
        t = pa.table({
            "g": pa.array(rng.integers(0, ngroups, n), pa.int64()),
            "v": pa.array(rng.integers(-5, 6, n).astype(np.float64)),
            "rid": pa.array(rng.permutation(n).astype(np.int64)),
        })
        out = (topk.grouped_top_k(rd.from_arrow(t).repartition(blocks), "g",
                                  "v", k=k, id_col="rid", descending=desc)
               .to_pandas().sort_values(["g", "rank"]).reset_index(drop=True))
        direction = "DESC" if desc else ""
        exp = duckdb.sql(f"""
            SELECT g, v, rid, row_number() OVER
                   (PARTITION BY g ORDER BY v {direction}, rid) AS rank
            FROM t QUALIFY rank <= {k} ORDER BY g, rank""").df()
        assert out["rid"].tolist() == exp["rid"].tolist(), (seed, k)
        assert out["rank"].tolist() == exp["rank"].tolist(), (seed, k)


def test_repetition_signals_bruteforce(ray_session):
    from collections import Counter

    from metric_search_ray.pipelines import text as textops

    docs = ["a b a b a", "x y z", "q", "", "m m m m"]
    ds = rd.from_arrow(pa.table({"doc_id": pa.array(np.arange(5), pa.int64()),
                                 "text": pa.array(docs, pa.string())}))
    out = (textops.repetition_signals(ds).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    for i, d in enumerate(docs):
        toks = d.split()
        for g, name in ((2, "bi"), (3, "tri")):
            grams = [tuple(toks[j:j + g]) for j in range(len(toks) - g + 1)]
            c = Counter(grams)
            assert out[f"n_{name}"][i] == len(grams), (i, name)
            assert out[f"n_{name}_distinct"][i] == len(c), (i, name)
            assert out[f"top_{name}"][i] == (max(c.values()) if c else 0), (i, name)


def test_hash_top_n_exact_size_and_layout_independent(ray_session):
    import hashlib

    from metric_search_ray.pipelines import sampling

    t = _docs(500)
    a = sampling.hash_top_n(rd.from_arrow(t), "doc_id", 37).to_pandas()
    b = sampling.hash_top_n(rd.from_arrow(t).repartition(11), "doc_id",
                            37).to_pandas()
    assert len(a) == len(b) == 37
    assert sorted(a["doc_id"]) == sorted(b["doc_id"])
    # matches the global smallest-hash contract
    hs = {did: int.from_bytes(hashlib.md5(str(did).encode()).digest()[8:],
                              "little") % 2**63 for did in range(500)}
    exp = sorted(hs, key=lambda d: (hs[d], str(d)))[:37]
    assert sorted(a["doc_id"]) == sorted(exp)


def test_hash_top_n_larger_than_table(ray_session):
    from metric_search_ray.pipelines import sampling

    t = _docs(5)
    out = sampling.hash_top_n(rd.from_arrow(t), "doc_id", 100).to_pandas()
    assert sorted(out["doc_id"]) == [0, 1, 2, 3, 4]


def test_weighted_top_n_matches_duckdb_replay(ray_session):
    import duckdb
    import pandas as pd
    rng = np.random.default_rng(8)
    n = 4000
    t = pa.table({"doc_id": pa.array(np.arange(n), pa.int64()),
                  "w": pa.array(rng.integers(0, 500, n), pa.int64())})
    got = (sampling.weighted_top_n(rd.from_arrow(t).repartition(6),
                                   "doc_id", "w", n=50).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    con = duckdb.connect()
    con.register("d", t)
    exp = con.execute("""
      SELECT doc_id, w FROM d
      ORDER BY pow((CAST(md5_number_lower(CAST(doc_id AS VARCHAR)) AS DOUBLE) + 0.5)
                   / 18446744073709551616.0, 1.0 / (w + 1)) DESC,
               CAST(doc_id AS VARCHAR)
      LIMIT 50""").df().sort_values("doc_id").reset_index(drop=True)
    assert got["doc_id"].tolist() == exp["doc_id"].tolist()


def test_weighted_top_n_prefers_heavy_rows(ray_session):
    # weights 1 vs 1000: heavy rows should dominate the sample
    n = 2000
    w = np.where(np.arange(n) < 100, 1000, 1)
    t = pa.table({"doc_id": pa.array(np.arange(n), pa.int64()),
                  "w": pa.array(w, pa.int64())})
    out = sampling.weighted_top_n(rd.from_arrow(t), "doc_id", "w", n=40).to_pandas()
    frac_heavy = (out["doc_id"] < 100).mean()
    assert frac_heavy > 0.5          # 5% of rows carry ~98% of weight
    # layout independence: different partitioning, same selection
    out2 = sampling.weighted_top_n(rd.from_arrow(t).repartition(7),
                                   "doc_id", "w", n=40).to_pandas()
    assert sorted(out["doc_id"]) == sorted(out2["doc_id"])
