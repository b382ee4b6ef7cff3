"""Product quantization: encode determinism, ADC recall, exact rerank."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from metric_search_ray.pipelines import similarity


@pytest.fixture(scope="module")
def clustered_vecs():
    rng = np.random.default_rng(4)
    centers = rng.normal(0, 10, (16, 64))
    x = np.concatenate([c + rng.normal(0, 0.6, (150, 64)) for c in centers])
    ids = np.arange(len(x))
    return ids, x.astype(np.float32)


def _ds_of(ids, x):
    return rd.from_arrow(pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array([v.tolist() for v in x],
                              pa.list_(pa.float32())),
    })).repartition(6)


def test_pq_recall_and_rerank(ray_session, clustered_vecs):
    ids, x = clustered_vecs
    ds = _ds_of(ids, x)
    books = similarity.train_pq_codebooks(ds, m=8, nbits=8,
                                          sample_rows=1024)
    codes = similarity.pq_encode(ds, books).materialize()
    q = x[::500][:4].astype(np.float64)
    qids = [f"q{i}" for i in range(len(q))]
    out = similarity.knn_pq(codes, books, q, qids, k=10, rerank_ds=ds,
                            rerank_factor=8)
    # exact brute-force L2 truth
    for qi, qid in enumerate(qids):
        d = ((x.astype(np.float64) - q[qi][None, :]) ** 2).sum(axis=1)
        truth = set(ids[np.lexsort((ids, d))[:10]])
        got = set(out[out.query_id == qid]["vec_id"])
        recall = len(truth & got) / 10
        assert recall >= 0.8, (qid, recall)
    # the query vector itself (in-corpus) must be rank 1 at distance 0
    r1 = out[(out.query_id == "q0") & (out["rank"] == 1)]
    assert r1["dist"].iloc[0] == 0.0


def test_pq_encode_deterministic_across_layouts(ray_session, clustered_vecs):
    ids, x = clustered_vecs
    books = similarity.train_pq_codebooks(_ds_of(ids, x), m=8, nbits=8,
                                          sample_rows=512)
    a = (similarity.pq_encode(_ds_of(ids, x), books).to_pandas()
         .sort_values("vec_id").reset_index(drop=True))
    b = (similarity.pq_encode(_ds_of(ids, x).repartition(3), books)
         .to_pandas().sort_values("vec_id").reset_index(drop=True))
    assert (a["pq_code"] == b["pq_code"]).all()
    assert len(a["pq_code"].iloc[0]) == 8       # m bytes per vector


def test_ivf_pq_composition_recall(ray_session, clustered_vecs):
    ids, x = clustered_vecs
    ds = _ds_of(ids, x)
    books = similarity.train_pq_codebooks(ds, m=8, nbits=8, sample_rows=1024)
    cent = similarity.train_ivf_centroids(ds, n_lists=16, sample_rows=1024)
    q = x[::500][:3].astype(np.float64)
    qids = [f"v{i}" for i in range(len(q))]
    out = similarity.knn_ivf_pq(ds, books, cent, q, qids, k=10, nprobe=4)
    for qi, qid in enumerate(qids):
        d = ((x.astype(np.float64) - q[qi][None, :]) ** 2).sum(axis=1)
        truth = set(ids[np.lexsort((ids, d))[:10]])
        got = set(out[out.query_id == qid]["vec_id"])
        assert len(truth & got) / 10 >= 0.7, qid


def test_lsh_bucketed_knn_recall(ray_session, clustered_vecs):
    ids, x = clustered_vecs
    ds = _ds_of(ids, x)
    q = x[::700][:3].astype(np.float64)
    qids = [f"l{i}" for i in range(len(q))]
    out = (similarity.knn_lsh(ds, qids, q, k=10, nbits=10).to_pandas())
    xn = x.astype(np.float64)
    xn = xn / np.linalg.norm(xn, axis=1, keepdims=True)
    for qi, qid in enumerate(qids):
        qv = q[qi] / np.linalg.norm(q[qi])
        sim = xn @ qv
        truth = set(ids[np.lexsort((ids, -sim))[:10]])
        got = set(out[out.query_id == qid]["vec_id"])
        assert len(truth & got) / 10 >= 0.6, (qid, len(truth & got))
