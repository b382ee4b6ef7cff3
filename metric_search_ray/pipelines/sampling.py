"""Deterministic sampling / train-test splitting over any keyed table.

A large-scale training-data pipeline needs REPRODUCIBLE row selection:
the same corpus must produce the same sample on every run, on any
cluster size, regardless of block layout — so `Dataset.random_sample`
(seed-per-block, layout-dependent) is the wrong tool.  Everything here
keys off a content hash of the row's id:

    bucket(id) = md5(utf8(id))[8:16] as little-endian uint64  mod  B

which is a pure function of the id — embarrassingly parallel, no
shuffle, no coordination, and exactly replayable in SQL (DuckDB's
``md5_number_lower(x) % B``), which is how the driver oracles verify
these operators.

The md5 call is per-row C code (~0.5us/row via hashlib); at extreme
scale swap in a vectorized 64-bit hash (xxhash/wyhash over a byte
matrix) — the bucketing contract stays the same.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _bucket_of(ids, n_buckets: int, salt: str = "") -> np.ndarray:
    """uint64 md5-low-8 bucket per id.  ``salt`` namespaces independent
    draws (stratified sampling salts with the stratum so strata are
    sampled independently)."""
    out = np.empty(len(ids), np.uint64)
    enc = (salt + "|").encode() if salt else b""
    for i, v in enumerate(ids):
        key = enc + str(v).encode()
        out[i] = int.from_bytes(hashlib.md5(key).digest()[8:], "little")
    return out % np.uint64(n_buckets)


def hash_split(ds, id_col: str, test_buckets: int = 10, n_buckets: int = 100):
    """Add a ``split`` column: 'test' where bucket(id) < test_buckets,
    else 'train'.  Deterministic, layout-independent, shuffle-free."""
    def fn(batch: pa.Table) -> pa.Table:
        b = _bucket_of(batch.column(id_col).to_pylist(), n_buckets)
        split = np.where(b < test_buckets, "test", "train")
        return batch.append_column("split", pa.array(split, pa.string()))
    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def hash_sample(ds, id_col: str, keep_buckets: int, n_buckets: int = 100,
                salt: str = ""):
    """Keep rows with bucket(id) < keep_buckets — a deterministic
    ~keep_buckets/n_buckets fraction of the table."""
    def fn(batch: pa.Table) -> pa.Table:
        b = _bucket_of(batch.column(id_col).to_pylist(), n_buckets, salt)
        return batch.filter(pa.array(b < keep_buckets))
    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def stratified_sample(ds, id_col: str, stratum_col: str, keep_buckets: int,
                      n_buckets: int = 100):
    """Per-stratum deterministic sample: bucket over (stratum|id) so
    each stratum is an independent draw at the same rate — a skewed
    stratum can't eat the whole budget.  Still one narrow map pass, no
    groupby/shuffle (the census-then-sample design would need one)."""
    def fn(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        strata = batch.column(stratum_col).to_pylist()
        out = np.empty(len(ids), np.uint64)
        for i, (v, s) in enumerate(zip(ids, strata)):
            key = (str(s) + "|" + str(v)).encode()
            out[i] = int.from_bytes(hashlib.md5(key).digest()[8:], "little")
        return batch.filter(pa.array(out % np.uint64(n_buckets) < keep_buckets))
    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def hash_top_n(ds, id_col: str, n: int):
    """Deterministic FIXED-SIZE sample: the ``n`` rows whose id hashes
    are globally smallest (md5 low-8, ties impossible modulo md5
    collisions; broken by id anyway).  Unlike ``hash_sample`` (fixed
    RATE), the output size is exact — the "give me 10k random-but-
    reproducible rows" shape.

    Per-block top-n (argpartition) then one bounded driver merge of
    <= n rows per block; no shuffle, no full sort."""
    import ray

    def block_top(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        h = _bucket_of(ids, 2**63)
        k = min(n, len(h))
        if k < len(h):
            sel = np.argpartition(h, k - 1)[:k]
        else:
            sel = np.arange(len(h))
        return (batch.take(pa.array(np.sort(sel)))
                     .append_column("_h", pa.array(h[np.sort(sel)].astype(np.int64),
                                                   pa.int64())))

    parts = ds.map_batches(block_top, batch_format="pyarrow",
                           zero_copy_batch=True)
    tbls = [t for t in ray.get(parts.to_arrow_refs()) if t.num_rows]
    if not tbls:
        return parts.drop_columns(["_h"])
    allt = pa.concat_tables(tbls).combine_chunks()
    h = allt.column("_h").to_numpy()
    ids = np.asarray(allt.column(id_col).to_pylist(), dtype=object)
    order = np.lexsort((ids.astype(str), h))[:n]
    import ray.data as rd
    return rd.from_arrow(allt.take(pa.array(np.sort(order)))
                             .drop_columns(["_h"]))


def weighted_top_n(ds, id_col: str, weight_col: str, n: int):
    """Deterministic WEIGHTED fixed-size sample (Efraimidis–Spirakis
    A-Res): rank rows by key = u^(1/w) with u a fixed md5-derived
    uniform in (0,1) and the EFFECTIVE weight w = weight+1 (the +1
    keeps zero-weight rows sampleable and the key finite; inclusion
    odds are therefore proportional to weight+1, converging to
    weight-proportional as weights grow).  Weights must be >= 0.
    The draw is fully reproducible (no RNG state) and SQL-replayable:
    ``pow((CAST(md5_number_lower(id) AS DOUBLE)+0.5)/2^64, 1.0/(w+1))``
    with identical IEEE op order.

    Same scale shape as ``hash_top_n``: per-block top-n, one bounded
    driver merge of <= n rows per block, no shuffle."""
    import ray

    DENOM = np.float64(18446744073709551616.0)

    def keys_of(batch: pa.Table) -> np.ndarray:
        ids = batch.column(id_col).to_pylist()
        h = np.empty(len(ids), np.uint64)
        for i, v in enumerate(ids):
            h[i] = int.from_bytes(hashlib.md5(str(v).encode()).digest()[8:],
                                  "little")
        u = (h.astype(np.float64) + 0.5) / DENOM
        w = batch.column(weight_col).to_numpy(zero_copy_only=False).astype(
            np.float64)
        if np.any(w < 0):
            raise ValueError("weighted_top_n weights must be >= 0")
        return np.power(u, 1.0 / (w + 1.0))

    def block_top(batch: pa.Table) -> pa.Table:
        k = keys_of(batch)
        m = min(n, len(k))
        if m < len(k):
            kth = -np.partition(-k, m - 1)[m - 1]
            sel = np.flatnonzero(k >= kth)   # keep boundary ties; the
            # driver merge re-cuts on (key, id) deterministically
        else:
            sel = np.arange(len(k))
        sel = np.sort(sel)
        return batch.take(pa.array(sel)).append_column(
            "_wkey", pa.array(k[sel], pa.float64()))

    parts = ds.map_batches(block_top, batch_format="pyarrow",
                           zero_copy_batch=True)
    tbls = [t for t in ray.get(parts.to_arrow_refs()) if t.num_rows]
    if not tbls:
        return parts.drop_columns(["_wkey"])
    allt = pa.concat_tables(tbls).combine_chunks()
    k = allt.column("_wkey").to_numpy()
    ids = np.asarray([str(v) for v in allt.column(id_col).to_pylist()],
                     dtype=object)
    order = np.lexsort((ids, -k))[:n]
    import ray.data as rd
    return rd.from_arrow(allt.take(pa.array(np.sort(order)))
                             .drop_columns(["_wkey"]))
