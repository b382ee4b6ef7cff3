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
    small by construction — this is the only non-streaming step).
    NOTE: train_pq_codebooks carries a sibling Lloyd loop under L2
    (un-normalized, pad-by-repeat init) — the two differ in metric and
    update rule, kept separate deliberately; fix bugs in both."""
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


# ---------------------------------------------------------- product quantization


def train_pq_codebooks(ds, vec_col: str = "embedding", m: int = 8,
                       nbits: int = 8, sample_rows: int = 4096,
                       iters: int = 10, seed: int = 42) -> np.ndarray:
    """PQ codebooks (m, 2^nbits, d/m): per-subspace seeded Lloyd
    k-means on a driver-side sample (the only non-streaming step).
    The sample is an md5-hash spread over row ids — layout-independent
    and unbiased across the corpus (``limit(n)`` would take the first
    blocks only and train codebooks blind to later clusters).  Vectors
    are NOT normalized — PQ approximates L2 geometry."""
    import ray

    from .sampling import _bucket_of

    id_col_s = "vec_id" if "vec_id" in ds.schema().names else None
    n_total = ds.count()
    if n_total > sample_rows and id_col_s is not None:
        stride = int(np.ceil(n_total / sample_rows))

        def keep(batch: pa.Table) -> pa.Table:
            b = _bucket_of(batch.column(id_col_s).to_pylist(), stride,
                           salt="pqtrain")
            return batch.filter(pa.array(b == 0)).select([id_col_s, vec_col])

        sample = ds.map_batches(keep, batch_format="pyarrow").to_pandas()
        sample = sample.sort_values(id_col_s)     # layout-independent order
    elif id_col_s is not None:
        # whole corpus fits the sample: take it all, sorted by id — the
        # limit() path would be a non-deterministic row subset/order
        sample = ds.select_columns([id_col_s, vec_col]).to_pandas()
        sample = sample.sort_values(id_col_s)
    else:
        sample = ds.select_columns([vec_col]).limit(sample_rows).to_pandas()
    x = np.stack(sample[vec_col].to_numpy()).astype(np.float64)
    d = x.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    if nbits > 8:
        raise ValueError("nbits > 8 would overflow the uint8 code layout")
    k = 1 << nbits
    sub = d // m
    rng = np.random.default_rng(seed)
    books = np.empty((m, k, sub), np.float64)
    for j in range(m):
        xj = x[:, j * sub:(j + 1) * sub]
        cent = xj[rng.choice(len(xj), size=min(k, len(xj)), replace=False)]
        if len(cent) < k:                      # tiny sample: pad by repeat
            cent = cent[np.arange(k) % len(cent)]
        for _ in range(iters):
            d2 = ((xj[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            asg = np.argmin(d2, axis=1)
            for c in range(k):
                sel = asg == c
                if sel.any():
                    cent[c] = xj[sel].mean(axis=0)
        books[j] = cent
    return books


def pq_encode(ds, codebooks: np.ndarray, vec_col: str = "embedding",
              id_col: str = "vec_id"):
    """One streaming pass: vector -> m uint8 codes (32x compression at
    m=8/nbits=8 over 64-dim float32).  Codebooks broadcast once."""
    import ray
    ref = ray.put(np.asarray(codebooks, np.float64))

    class Encode:
        def __init__(self):
            self.books = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            x = np.stack(batch.column(vec_col).to_numpy(
                zero_copy_only=False)).astype(np.float64)
            m, k, sub = self.books.shape
            codes = np.empty((len(x), m), np.uint8)
            for j in range(m):
                xj = x[:, j * sub:(j + 1) * sub]
                d2 = ((xj[:, None, :] - self.books[j][None, :, :]) ** 2
                      ).sum(axis=2)
                codes[:, j] = np.argmin(d2, axis=1).astype(np.uint8)
            return pa.table({
                id_col: batch.column(id_col),
                "pq_code": pa.array([c.tobytes() for c in codes],
                                    pa.binary()),
            })

    return ds.map_batches(Encode, batch_format="pyarrow", concurrency=2)


def knn_pq(codes_ds, codebooks: np.ndarray, query_vecs: np.ndarray,
           query_ids: list, k: int = 10, rerank_ds=None,
           vec_col: str = "embedding", id_col: str = "vec_id",
           rerank_factor: int = 4):
    """Approximate L2 top-k over PQ codes via ADC (asymmetric distance
    computation): per query, one (m, 2^nbits) subspace distance table;
    each row's approximate distance is m table lookups summed — no
    float vector ever touches the scan.  With ``rerank_ds`` (the raw
    vectors), the top k*rerank_factor ADC candidates are re-scored
    exactly (ids-only join back; the classic IVF-PQ rerank step).

    Scale shape: codes are m bytes/row (the 100-TB path: a 10^9-vector
    corpus at m=8 is 8 GB of codes vs 256 GB of float32); queries and
    tables broadcast; per-partition top-k then a bounded merge."""
    import ray

    books = np.asarray(codebooks, np.float64)
    m, kk, sub = books.shape
    q = np.asarray(query_vecs, np.float64)
    # distance tables: (n_q, m, 2^nbits)
    tabs = np.empty((len(q), m, kk), np.float64)
    for j in range(m):
        qj = q[:, j * sub:(j + 1) * sub]
        tabs[:, j, :] = ((qj[:, None, :] - books[j][None, :, :]) ** 2
                         ).sum(axis=2)
    ref = ray.put((list(query_ids), tabs))
    nc = k * rerank_factor

    def scan(batch: pa.Table) -> pa.Table:
        qids, t = ray.get(ref)
        raw = batch.column("pq_code").to_pylist()
        codes = np.frombuffer(b"".join(raw), np.uint8).reshape(len(raw), m)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        out_q, out_i, out_d = [], [], []
        # one gather per subspace per query set: adc[q, row] = sum_j t[q, j, code[row, j]]
        adc = np.zeros((len(qids), len(raw)), np.float64)
        for j in range(m):
            adc += t[:, j, :][:, codes[:, j]]
        for qi in range(len(qids)):
            d = adc[qi]
            kc = min(nc, len(d))
            if kc < len(d):
                kth = np.partition(d, kc - 1)[kc - 1]
                sel = np.flatnonzero(d <= kth)  # keep boundary ties; the
                # merge re-cuts on (adc, id) deterministically
            else:
                sel = np.arange(len(d))
            out_q.extend([qids[qi]] * len(sel))
            out_i.extend(ids[sel])
            out_d.extend(d[sel])
        return pa.table({"query_id": pa.array(out_q),
                         id_col: pa.array(out_i),
                         "adc": pa.array(out_d, pa.float64())})

    local = codes_ds.map_batches(scan, batch_format="pyarrow",
                                 batch_size=8192)

    def merge(g: pa.Table) -> pa.Table:
        d = g.column("adc").to_numpy()
        ids = g.column(id_col).to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, d))[:nc]
        return pa.table({
            "query_id": pa.array([g.column("query_id")[0].as_py()] * len(order)),
            id_col: pa.array(ids[order]),
            "adc": pa.array(d[order], pa.float64()),
        })

    cands = local.groupby("query_id").map_groups(merge, batch_format="pyarrow")
    if rerank_ds is None:
        # honor the top-k contract without rerank: cut each group to k
        # ADC-nearest (ties already resolved by (adc, id) in merge)
        def cut_k(g: pa.Table) -> pa.Table:
            n = min(k, g.num_rows)
            return (g.slice(0, n)
                    .append_column("rank",
                                   pa.array(np.arange(1, n + 1), pa.int64())))
        return cands.groupby("query_id").map_groups(cut_k,
                                                    batch_format="pyarrow")
    # exact rerank: fetch candidate vectors only (ids join), rescore
    cand_tbl = pa.concat_tables(
        [t for t in ray.get(cands.to_arrow_refs()) if t.num_rows])
    cand_ids = pa.compute.unique(cand_tbl.column(id_col))
    import pyarrow.compute as pc
    vecs = (rerank_ds.map_batches(
        lambda b: b.filter(pc.is_in(b.column(id_col), value_set=cand_ids)),
        batch_format="pyarrow").to_pandas())
    vec_by_id = dict(zip(vecs[id_col], vecs[vec_col]))
    rows = {"query_id": [], id_col: [], "dist": [], "rank": []}
    cdf = cand_tbl.to_pandas()
    for qi, qid in enumerate(query_ids):
        g = cdf[cdf["query_id"] == qid]
        ids = g[id_col].to_numpy()
        x = np.stack([np.asarray(vec_by_id[i], np.float64) for i in ids])
        d = ((x - q[qi][None, :]) ** 2).sum(axis=1)
        order = np.lexsort((ids, d))[:k]
        rows["query_id"].extend([qid] * len(order))
        rows[id_col].extend(ids[order])
        rows["dist"].extend(np.sqrt(d[order]))
        rows["rank"].extend(range(1, len(order) + 1))
    import pandas as pd
    return pd.DataFrame(rows)


def knn_ivf_pq(ds, codebooks: np.ndarray, centroids: np.ndarray,
               query_vecs: np.ndarray, query_ids: list, k: int = 10,
               nprobe: int = 4, rerank_factor: int = 8,
               vec_col: str = "embedding", id_col: str = "vec_id"):
    """FAISS-style IVF-PQ composition: coarse quantizer prunes the
    corpus to the queries' ``nprobe`` nearest lists map-side, PQ codes
    ADC-scan only those survivors, and the candidate pool reranks
    exactly against the raw vectors.  At 100 TB this is the standard
    shape: the scan touches nprobe/n_lists of the corpus and moves
    m-byte codes, not float vectors; only ~k*rerank_factor raw vectors
    per query are ever fetched."""
    q = np.asarray(query_vecs, np.float64)
    qn = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
    cent = np.asarray(centroids, np.float64)
    probes = np.argsort(-(qn @ cent.T), axis=1, kind="stable")[:, :nprobe]
    wanted = np.unique(probes)

    # TASK-mode assign+filter (no actor pool): this stage re-executes
    # inside the rerank pass, and a second reserved actor pool can
    # deadlock small-CPU sessions on resource reservation
    cref = ray.put(cent)

    def assign_and_filter(b: pa.Table) -> pa.Table:
        c = ray.get(cref)
        x = np.stack(b.column(vec_col).to_numpy(zero_copy_only=False)
                     ).astype(np.float64)
        xn = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
        lists = np.argmax(xn @ c.T, axis=1)
        return b.filter(pa.array(np.isin(lists, wanted)))

    listed = ds.map_batches(assign_and_filter, batch_format="pyarrow")
    codes = pq_encode(listed, codebooks, vec_col=vec_col,
                      id_col=id_col).materialize()
    return knn_pq(codes, codebooks, q, query_ids, k=k, rerank_ds=listed,
                  rerank_factor=rerank_factor, vec_col=vec_col,
                  id_col=id_col)


def knn_lsh(ds, query_ids, query_vecs, k: int = 10, nbits: int = 12,
            n_tables: int = 8, multiprobe: int = 1, seed: int = 42,
            vec_col: str = "embedding", id_col: str = "vec_id"):
    """LSH-bucketed approximate cosine top-k — the hash-pruned sibling
    of ``knn_ivf``: ``n_tables`` independent random-hyperplane
    signatures put every row in one of 2^nbits buckets per table
    map-side (one pass, seeded planes — no training at all); queries
    probe their bucket plus all single-bit flips per table
    (``multiprobe=1``), and a row that collides with any query in ANY
    table reaches the exact cosine rerank.  Candidate fraction
    ~ n_tables * (1 + nbits) / 2^nbits.  Recall is probabilistic
    (tested vs brute force); assignments are deterministic given the
    seed."""
    q = np.asarray(query_vecs, np.float64)
    d = q.shape[1]
    rng = np.random.default_rng(seed)
    planes = rng.normal(size=(n_tables, d, nbits))
    pow2 = (1 << np.arange(nbits, dtype=np.uint64))

    def buckets_of(x: np.ndarray, t: int) -> np.ndarray:
        bits = (x @ planes[t] > 0).astype(np.uint64)
        return (bits * pow2[None, :]).sum(axis=1, dtype=np.uint64)

    wanted = []
    for t in range(n_tables):
        qb = buckets_of(q, t)
        w = set(int(b) for b in qb)
        if multiprobe >= 1:
            for b in qb:
                for j in range(nbits):
                    w.add(int(b ^ np.uint64(1 << j)))
        wanted.append(np.asarray(sorted(w), np.uint64))

    def filt(batch: pa.Table) -> pa.Table:
        x = np.stack(batch.column(vec_col).to_numpy(zero_copy_only=False)
                     ).astype(np.float64)
        if len(x) == 0:
            return batch
        keep = np.zeros(len(x), bool)
        for t in range(n_tables):
            keep |= np.isin(buckets_of(x, t), wanted[t])
        return batch.filter(pa.array(keep))

    pruned = ds.map_batches(filt, batch_format="pyarrow")
    return knn_cosine(pruned, query_ids, q, k, vec_col=vec_col,
                      id_col=id_col)
