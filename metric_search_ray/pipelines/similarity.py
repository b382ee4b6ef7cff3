"""Similarity search over embedding columns (list<float>).

- ``knn_cosine`` — brute-force exact cosine top-k: the baseline.
  Queries broadcast once; per-batch numpy matmul against the query
  matrix; per-query global merge.  This is `knn.knn_metric` under the
  cosine metric.
- ``IvfIndex`` / ``knn_ivf`` — the scale path: a seeded k-means (IVF)
  coarse quantizer trained on a driver-side sample, centroids broadcast;
  every row is assigned to its nearest centroid once (`map_batches`);
  queries probe the ``nprobe`` nearest lists only.  Approximate; recall
  is tested against the brute-force baseline.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from . import knn as knnmod


def knn_cosine(ds, query_ids, query_vecs, k: int = 10,
               vec_col: str = "embedding", id_col: str = "vec_id"):
    """Exact cosine top-k (descending similarity, ties by id)."""
    return knnmod.knn_metric(ds, query_ids, np.asarray(query_vecs, np.float64), k,
                             metric="cosine_sim", data_col=vec_col, id_col=id_col)


def knn_l2(ds, query_ids, query_vecs, k: int = 10,
           vec_col: str = "embedding", id_col: str = "vec_id"):
    return knnmod.knn_metric(ds, query_ids, np.asarray(query_vecs, np.float64), k,
                             metric="euclidian", data_col=vec_col, id_col=id_col)


def train_ivf_centroids(ds, vec_col: str = "embedding", n_lists: int = 16,
                        sample_rows: int = 4096, iters: int = 10,
                        seed: int = 42) -> np.ndarray:
    """Seeded Lloyd k-means on a sample (driver-side; the sample is
    small by construction — this is the only non-streaming step)."""
    sample = ds.select_columns([vec_col]).limit(sample_rows).to_pandas()
    x = np.stack(sample[vec_col].to_numpy())
    x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(seed)
    cent = x[rng.choice(len(x), size=min(n_lists, len(x)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(x @ cent.T, axis=1)
        for c in range(len(cent)):
            m = assign == c
            if m.any():
                v = x[m].mean(axis=0)
                cent[c] = v / max(np.linalg.norm(v), 1e-12)
    return cent


def seed_centroids(ds, n_lists: int = 8, vec_col: str = "embedding",
                   id_col: str = "vec_id") -> np.ndarray:
    """Deterministic coarse quantizer: centroid c = the L2-normalized
    embedding of the row with id c (c in 0..n_lists-1).  Quantization
    quality is below k-means, but assignment/probing is exactly
    reproducible in SQL — used where a DuckDB oracle must replay the
    IVF path (``train_ivf_centroids`` stays the default for real use)."""
    import pyarrow.compute as pc

    sub = (ds.map_batches(
        lambda b: b.filter(pc.less(b.column(id_col), n_lists)),
        batch_format="pyarrow").to_pandas().sort_values(id_col))
    x = np.stack(sub[vec_col].to_numpy()).astype(np.float64)
    return x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)


def assign_ivf_lists(ds, centroids: np.ndarray, vec_col: str = "embedding"):
    """Add ``ivf_list`` = nearest-centroid id (one pass, broadcast)."""
    ref = ray.put(np.asarray(centroids, np.float64))

    class Assign:
        def __init__(self):
            self.cent = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            x = np.stack(batch.column(vec_col).to_numpy(zero_copy_only=False))
            xn = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
            lists = np.argmax(xn @ self.cent.T, axis=1).astype(np.int64)
            return batch.append_column("ivf_list", pa.array(lists, pa.int64()))

    return ds.map_batches(Assign, batch_format="pyarrow", concurrency=2)


def build_ivf_index(ds, ckpt_dir: str, centroids: np.ndarray,
                    vec_col: str = "embedding", id_col: str = "vec_id",
                    resume: bool = True) -> "pa.Table":
    """Persist the IVF index: centroids + one parquet file per inverted
    list, so repeated queries read only their probed lists instead of
    re-assigning the corpus per call.

    Same checkpoint discipline as pipelines/build.py: atomic tmp+rename
    per list file (file presence = completed, rerun skips), manifest
    parquet with per-list lineage/metrics."""
    import os

    import pyarrow.parquet as pq

    os.makedirs(ckpt_dir, exist_ok=True)
    cent = np.asarray(centroids, np.float64)
    cpath = os.path.join(ckpt_dir, "centroids.npy")
    if not os.path.exists(cpath):
        tmp = os.path.join(ckpt_dir, f"centroids.tmp.{os.getpid()}.npy")
        np.save(tmp, cent)
        os.replace(tmp, cpath)

    def write_list(g: pa.Table) -> pa.Table:
        lid = int(g.column("ivf_list")[0].as_py())
        path = os.path.join(ckpt_dir, f"list-{lid:05d}.parquet")
        if resume and os.path.exists(path):
            md = pq.read_metadata(path)
            return pa.table({"ivf_list": [lid], "n_rows": [md.num_rows],
                             "path": [path], "resumed": [True]})
        tmp = path + f".tmp.{os.getpid()}"
        pq.write_table(g.drop_columns(["ivf_list"]), tmp)
        os.replace(tmp, path)
        return pa.table({"ivf_list": [lid], "n_rows": [g.num_rows],
                         "path": [path], "resumed": [False]})

    manifest_ds = (assign_ivf_lists(ds, cent, vec_col)
                   .groupby("ivf_list").map_groups(write_list, batch_format="pyarrow"))
    manifest = pa.Table.from_pandas(manifest_ds.to_pandas(), preserve_index=False)
    tmp = os.path.join(ckpt_dir, f"manifest.tmp.{os.getpid()}")
    pq.write_table(manifest, tmp)
    os.replace(tmp, os.path.join(ckpt_dir, "manifest.parquet"))
    return manifest


def knn_ivf_index(ckpt_dir: str, query_ids, query_vecs, k: int = 10,
                  nprobe: int = 4, vec_col: str = "embedding",
                  id_col: str = "vec_id"):
    """Approximate cosine top-k over a persisted IVF index: loads the
    centroids, picks each query's nprobe lists, and reads ONLY those
    list files (column pruning + file pruning at the source)."""
    import os

    import pyarrow.parquet as pq
    import ray.data as rd

    cent = np.load(os.path.join(ckpt_dir, "centroids.npy"))
    q = np.asarray(query_vecs, np.float64)
    qn = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
    probes = np.argsort(-(qn @ cent.T), axis=1, kind="stable")[:, :nprobe]
    manifest = pq.read_table(os.path.join(ckpt_dir, "manifest.parquet"))
    by_list = dict(zip(manifest.column("ivf_list").to_pylist(),
                       manifest.column("path").to_pylist()))
    paths = [by_list[int(l)] for l in np.unique(probes) if int(l) in by_list]
    if not paths:
        import pandas as pd
        return rd.from_pandas(pd.DataFrame(
            {"query_id": [], id_col: [], "similarity": [], "rank": []}))
    listed = rd.read_parquet(paths, columns=[id_col, vec_col])
    return knn_cosine(listed, query_ids, q, k, vec_col=vec_col, id_col=id_col)


def knn_ivf(ds, query_ids, query_vecs, centroids: np.ndarray, k: int = 10,
            nprobe: int = 4, vec_col: str = "embedding", id_col: str = "vec_id"):
    """Approximate cosine top-k probing the nprobe nearest IVF lists.

    The filter happens map-side (each batch keeps only rows whose
    ivf_list is probed by some query), so the candidate set shrinks
    before any shuffle.
    """
    q = np.asarray(query_vecs, np.float64)
    qn = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
    cent = np.asarray(centroids, np.float64)
    # stable sort: probe ties resolve to the lowest list id, deterministically
    probes = np.argsort(-(qn @ cent.T), axis=1, kind="stable")[:, :nprobe]
    probed_lists = np.unique(probes)
    assigned = assign_ivf_lists(ds, centroids, vec_col)
    listed = assigned.map_batches(
        lambda b: b.filter(pa.compute.is_in(b.column("ivf_list"),
                                            value_set=pa.array(probed_lists))),
        batch_format="pyarrow")
    return knn_cosine(listed, query_ids, q, k, vec_col=vec_col, id_col=id_col)
