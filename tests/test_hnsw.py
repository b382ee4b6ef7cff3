"""Sharded HNSW: determinism, recall vs brute force, persistence /
resume, replay parity (pipelines/hnsw.py vs the driver oracle's
independent heapless implementation)."""

import os
import shutil

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from metric_search_ray.pipelines import hnsw


@pytest.fixture(scope="module")
def vecs():
    rng = np.random.default_rng(11)
    n, d = 900, 24
    ids = np.arange(n, dtype=np.int64)
    x = rng.normal(size=(n, d)).astype(np.float64)
    return ids, x


def _brute_topk(ids, x, qv, k):
    d2 = ((x - qv) ** 2).sum(axis=1)
    return ids[np.lexsort((ids, d2))[:k]].tolist()


def test_levels_deterministic_and_geometric(vecs):
    ids, _ = vecs
    lv = hnsw.hnsw_levels(ids, 8)
    assert (lv == hnsw.hnsw_levels(ids, 8)).all()
    assert (lv >= 0).all()
    # geometric ladder: level 0 dominates, each level ~1/M of the prior
    counts = np.bincount(lv)
    assert counts[0] > 0.8 * len(ids)


def test_build_deterministic(vecs):
    ids, x = vecs
    a1, l1, e1 = hnsw.build_shard_graph(ids, x, m=8, ef_construction=32)
    a2, l2, e2 = hnsw.build_shard_graph(ids, x, m=8, ef_construction=32)
    assert e1 == e2 and (l1 == l2).all()
    assert all(a1[layer] == a2[layer] for layer in range(len(a1)))


def test_search_recall_and_exhaustive_exactness(vecs):
    ids, x = vecs
    adj, _, entry = hnsw.build_shard_graph(ids, x, m=8, ef_construction=64)
    rng = np.random.default_rng(5)
    q = rng.normal(size=(15, x.shape[1]))
    hit = 0
    for qi in range(len(q)):
        got = [i for _, i in
               hnsw.search_shard_graph(q[qi], 10, 64, adj, x, ids, entry)]
        hit += len(set(got) & set(_brute_topk(ids, x, q[qi], 10)))
        # ef >= n: the beam covers the whole (connected) graph -> exact,
        # in exactly the brute-force (dist, id) order
        full = [i for _, i in
                hnsw.search_shard_graph(q[qi], 10, len(ids) + 1, adj, x,
                                        ids, entry)]
        assert full == _brute_topk(ids, x, q[qi], 10)
    assert hit / (len(q) * 10) >= 0.9


def test_index_roundtrip_resume_and_query(ray_session, vecs, tmp_path):
    ids, x = vecs
    shuf = np.random.default_rng(1).permutation(len(ids))
    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array(ids[shuf], pa.int64()),
        "embedding": pa.array([v.tolist() for v in x[shuf]],
                              pa.list_(pa.float32())),
    })).repartition(5)
    ck = str(tmp_path / "hnsw_idx")
    man = hnsw.build_hnsw_index(ds, ck, n_shards=3, m=8,
                                ef_construction=48).to_pandas()
    assert sorted(man["shard"]) == [0, 1, 2]
    assert man["n_rows"].sum() == len(ids)
    assert not man["resumed"].any()

    x64 = x.astype(np.float32).astype(np.float64)   # stored precision
    rng = np.random.default_rng(9)
    q = rng.normal(size=(6, x.shape[1]))
    out = hnsw.knn_hnsw(ck, [f"q{i}" for i in range(len(q))], q,
                        k=5, ef_search=64)
    assert list(out.columns) == ["query_id", "vec_id", "rank", "dist"]
    assert len(out) == len(q) * 5
    hit = 0
    for qi in range(len(q)):
        got = out[out["query_id"] == f"q{qi}"].sort_values("rank")
        assert got["rank"].tolist() == [1, 2, 3, 4, 5]
        # reported dist is the true L2 of the stored vector
        for vid, dd in zip(got["vec_id"], got["dist"]):
            assert dd == pytest.approx(
                float(np.sqrt(((x64[vid] - q[qi]) ** 2).sum())), abs=1e-9)
        hit += len(set(got["vec_id"]) & set(_brute_topk(ids, x64, q[qi], 5)))
    assert hit / (len(q) * 5) >= 0.9

    # resume: a second build touches no shard; results are identical
    man2 = hnsw.build_hnsw_index(ds, ck, n_shards=3, m=8,
                                 ef_construction=48).to_pandas()
    assert man2["resumed"].all()
    out2 = hnsw.knn_hnsw(ck, [f"q{i}" for i in range(len(q))], q,
                         k=5, ef_search=64)
    assert out.equals(out2)


def test_empty_and_tiny_shards(ray_session, tmp_path):
    """n_shards > populated shards: only-even ids leave the odd shards
    with no file at all; single-row and empty shards must still answer."""
    ids = np.arange(0, 40, 2, dtype=np.int64)          # evens only
    rng = np.random.default_rng(2)
    x = rng.normal(size=(len(ids), 8))
    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array([v.tolist() for v in x],
                              pa.list_(pa.float32())),
    }))
    ck = str(tmp_path / "sparse")
    man = hnsw.build_hnsw_index(ds, ck, n_shards=4, m=4,
                                ef_construction=16).to_pandas()
    assert sorted(man["shard"]) == [0, 2]              # odd shards absent
    out = hnsw.knn_hnsw(ck, ["q0"], x[:1].astype(np.float64), k=3,
                        ef_search=16)
    assert out["vec_id"].tolist()[0] == 0 and len(out) == 3

    # k larger than the corpus: every row returns, ranks stay dense
    out = hnsw.knn_hnsw(ck, ["q0"], x[:1].astype(np.float64), k=100,
                        ef_search=200)
    assert len(out) == len(ids)
    assert out["rank"].tolist() == list(range(1, len(ids) + 1))


def test_ivf_routed_shards_and_nprobe(ray_session, tmp_path):
    """Centroid-routed layout (the scale path): shards = IVF lists;
    nprobe=C must equal probe-all, and nprobe=2 keeps high recall on
    clustered data while touching only 2 graphs per query."""
    rng = np.random.default_rng(21)
    centers = rng.normal(0, 10, (8, 12))
    x = np.concatenate([c + rng.normal(0, 0.5, (120, 12))
                        for c in centers])
    ids = np.arange(len(x), dtype=np.int64)
    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array([v.tolist() for v in x],
                              pa.list_(pa.float32())),
    })).repartition(4)
    ck = str(tmp_path / "routed")
    man = hnsw.build_hnsw_index(ds, ck, m=8, ef_construction=48,
                                centroids=centers).to_pandas()
    assert len(man) == 8 and man["n_rows"].sum() == len(ids)
    q = np.stack([c + rng.normal(0, 0.5, 12) for c in centers]
                 ).astype(np.float64)
    qids = [f"q{i}" for i in range(len(q))]
    full = hnsw.knn_hnsw(ck, qids, q, k=5, ef_search=48)
    allp = hnsw.knn_hnsw(ck, qids, q, k=5, ef_search=48, nprobe=8)
    assert full.equals(allp)
    routed = hnsw.knn_hnsw(ck, qids, q, k=5, ef_search=48, nprobe=2)
    x64 = x.astype(np.float32).astype(np.float64)
    hit = 0
    for qi, qid in enumerate(qids):
        got = set(routed[routed["query_id"] == qid]["vec_id"])
        hit += len(got & set(_brute_topk(ids, x64, q[qi], 5)))
    assert hit / (len(q) * 5) >= 0.9
    # an id-mod index refuses nprobe routing loudly
    ck2 = str(tmp_path / "idmod")
    hnsw.build_hnsw_index(ds, ck2, n_shards=2, m=8, ef_construction=16)
    with pytest.raises(ValueError, match="centroid-routed"):
        hnsw.knn_hnsw(ck2, qids, q, k=3, nprobe=1)


def test_duplicate_vectors_tie_by_id():
    """Exact-duplicate vectors: ties resolve by ascending id, matching
    the brute-force (dist, id) order."""
    ids = np.arange(20, dtype=np.int64)
    x = np.zeros((20, 4))
    x[10:] = 1.0                                       # two point-clouds
    adj, _, entry = hnsw.build_shard_graph(ids, x, m=4, ef_construction=16)
    got = [i for _, i in
           hnsw.search_shard_graph(np.zeros(4), 5, 32, adj, x, ids, entry)]
    assert got == [0, 1, 2, 3, 4]


def test_replay_parity_with_driver_oracle(ray_session, tmp_path):
    """The package pipeline and the driver oracle's independent serial
    replay must agree bit-for-bit on the real sf0.001 embeddings —
    the contract the driver's hash check enforces at sf0.01."""
    import importlib.util

    import pyarrow.parquet as pq

    sf = "/root/testdata/sf0.001"
    if not os.path.exists(os.path.join(sf, "embeddings.parquet")):
        pytest.skip("testdata missing")
    spec = importlib.util.spec_from_file_location(
        "rent_hnsw_test", os.path.join(os.path.dirname(__file__),
                                       "..", "__ray_entry__.py"))
    rent = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(rent)

    ds = rd.read_parquet(os.path.join(sf, "embeddings.parquet"),
                         columns=["vec_id", "embedding"])
    head = pq.read_table(os.path.join(sf, "embeddings.parquet"),
                         columns=["vec_id", "embedding"],
                         filters=[("vec_id", "in", [0, 1, 2])]
                         ).to_pandas().sort_values("vec_id")
    qv = np.stack(head["embedding"].to_numpy()).astype(np.float64)
    ck = str(tmp_path / "hnsw_sf0001")
    shutil.rmtree(ck, ignore_errors=True)
    hnsw.build_hnsw_index(ds, ck, n_shards=4, m=8, ef_construction=48)
    out = hnsw.knn_hnsw(ck, [int(i) for i in head["vec_id"]], qv,
                        k=5, ef_search=48)
    got = [(int(a), int(b), int(c), round(float(d), 6))
           for a, b, c, d in out[["query_id", "vec_id", "rank", "dist"]
                                 ].itertuples(index=False)]
    assert got == rent._hnsw_replay(sf)
