"""Deduplication operators for large-scale training-data pipelines.

All shapes follow the shuffle-minimizing rules:
- exact dedup: content-hash column added vectorized in map_batches,
  then ``groupby(hash)`` keeping the min-id row — the distributed
  analogue of the reference's ``insert_if`` novelty filter
  (details/tree.cpp:358-377), with hash partitioning instead of a tree;
- MinHash-LSH near-dup: shingle -> minhash signature per batch ->
  explode to (band, band_hash, id) rows -> ``groupby(band)`` buckets ->
  candidate pairs -> exact-Jaccard verify.  Only signatures shuffle,
  never documents;
- SimHash: 64-bit signature; **pigeonhole banding is exact** for
  Hamming <= t (split into t+1 bands: any pair within t must collide
  on at least one band), so candidate generation provably misses
  nothing — the verify stage then computes true Hamming;
- embedding cosine near-dup: random-hyperplane SimHash over vectors,
  same banding, cosine verify.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from .. import phash as phashmod

# ---------------------------------------------------------------- exact


def add_content_hash(batch: pa.Table, text_col: str, out: str = "content_hash") -> pa.Table:
    texts = batch.column(text_col).to_pylist()
    h = [hashlib.md5(t.encode("utf-8")).hexdigest() if t is not None else None
         for t in texts]
    return batch.append_column(out, pa.array(h, pa.string()))


def exact_dedup(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Keep the min-id row per distinct content (hash-partitioned).

    Keeper selection is a grouped Min over (content_hash -> min id) —
    with mostly-unique content, #groups ~= #rows, so it runs through
    fastagg.sort_block_aggregate (per-BLOCK C++ group_by after the
    sort; Ray's built-in aggregate pays per-group Python overhead at
    this cardinality).  The min-id set then joins back to the rows by
    id to recover full keeper rows."""
    import ray as _ray

    from .fastagg import sort_block_aggregate

    if ds.limit(1).count() == 0:
        return ds   # empty input: the id join would see schema-less blocks
    hashed = ds.map_batches(lambda b: add_content_hash(b, text_col),
                            batch_format="pyarrow", zero_copy_batch=True)
    keep_ids = (sort_block_aggregate(
                    hashed.select_columns(["content_hash", id_col]),
                    "content_hash", {"keep_id": (id_col, "min")})
                .select_columns(["keep_id"]))
    npart = max(2, min(16, int(_ray.cluster_resources().get("CPU", 8)) // 2))
    joined = ds.join(keep_ids, join_type="inner", num_partitions=npart,
                     on=(id_col,), right_on=("keep_id",))
    cols = ds.schema().names
    return joined.map_batches(lambda b: b.select(cols), batch_format="pyarrow")


# ---------------------------------------------------------------- shingles / minhash

# Signature/band-key field: the Mersenne prime 2^31 - 1.  With a, b, x
# all < 2^31, (a*x + b) < 2^62 fits uint64 exactly, so one vectorized
# multiply + add + mod per permutation — no split-multiply, no object
# dtype — and DuckDB reproduces it in plain BIGINT (no HUGEINT).
_MERSENNE31 = (1 << 31) - 1
_SHINGLE_BASE = 257
_BAND_BASE = np.uint64(1_000_003)


def _shingle_hashes(text: str, k: int) -> np.ndarray:
    """Distinct char-k-gram hashes: polynomial over unicode codepoints,
    h(i) = sum_j cp[i+j] * 257^(k-1-j).

    Exact small integers (< 2^56 for k=5), vectorized via shifted
    slices — and bit-reproducible in SQL as
    ``unicode(substr(text, i+j, 1)) * 257^(k-1-j)`` sums, which is what
    makes the doc_minhash_pairs DuckDB oracle possible.  Texts shorter
    than k hash their full codepoint sequence with the same left-aligned
    exponents (empty text => single shingle 0)."""
    cp = np.frombuffer(text.encode("utf-32-le"), np.uint32).astype(np.uint64)
    n = len(cp)
    pows = [np.uint64(_SHINGLE_BASE ** (k - 1 - j)) for j in range(k)]
    if n < k:
        h = np.uint64(0)
        for j in range(n):
            h += cp[j] * pows[j]
        return np.asarray([h], np.uint64)
    m = n - k + 1
    acc = np.zeros(m, np.uint64)
    for j in range(k):
        acc += cp[j:j + m] * pows[j]
    return np.unique(acc)


class MinHasher:
    """Stateful map_batches stage: permutation parameters built once;
    signatures for the whole batch computed over the concatenated
    shingle array with one multiply/add/mod pass per permutation and a
    segmented min (np.minimum.reduceat) — no per-doc or per-perm Python
    arithmetic."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id",
                 num_perm: int = 64, k: int = 5, seed: int = 42):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _MERSENNE31, num_perm, dtype=np.uint64)
        self.b = rng.integers(0, _MERSENNE31, num_perm, dtype=np.uint64)
        self.text_col = text_col
        self.id_col = id_col
        self.k = k
        self.num_perm = num_perm

    def _sigs(self, shingles: list[np.ndarray]) -> np.ndarray:
        """(n_docs, num_perm) signatures from per-doc shingle arrays."""
        n_docs = len(shingles)
        if n_docs == 0:
            return np.empty((0, self.num_perm), np.uint64)
        lens = np.asarray([len(s) for s in shingles], np.int64)
        x = np.concatenate(shingles) % np.uint64(_MERSENNE31)
        offs = np.concatenate([[0], np.cumsum(lens)[:-1]])
        sigs = np.empty((self.num_perm, n_docs), np.uint64)
        buf = np.empty_like(x)
        for j in range(self.num_perm):
            np.multiply(x, self.a[j], out=buf)   # < 2^62, exact in uint64
            buf += self.b[j]
            buf %= np.uint64(_MERSENNE31)
            sigs[j] = np.minimum.reduceat(buf, offs)
        return sigs.T

    def signature(self, text: str) -> np.ndarray:
        """One doc's signature (kept for tests; batches use __call__)."""
        return self._sigs([_shingle_hashes(text, self.k)])[0]

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_pylist()
        sigs = self._sigs([_shingle_hashes(t or "", self.k) for t in texts])
        return pa.table({
            self.id_col: batch.column(self.id_col),
            "minhash": pa.array(list(sigs.astype(np.int64)),
                                pa.list_(pa.int64(), self.num_perm)),
        })


def _band_keys(sig: np.ndarray, bands: int) -> np.ndarray:
    """(n_docs, bands) int64 band keys: polynomial fold of each band's
    signature values mod 2^31-1 (SQL-replayable, unlike a salted or
    library hash).  acc*base + s < 2^51 — exact in uint64 and BIGINT."""
    n, num_perm = sig.shape
    rpb = num_perm // bands
    u = sig.astype(np.int64).astype(np.uint64)
    keys = np.zeros((n, bands), np.uint64)
    for bi in range(bands):
        acc = np.zeros(n, np.uint64)
        for j in range(rpb):
            acc = (acc * _BAND_BASE + u[:, bi * rpb + j]) % np.uint64(_MERSENNE31)
        keys[:, bi] = acc
    return keys.astype(np.int64)


def minhash_lsh_candidates(ds, text_col: str = "text", id_col: str = "doc_id",
                           num_perm: int = 64, bands: int = 16, k: int = 5,
                           seed: int = 42):
    """Candidate near-dup pairs via LSH banding: Dataset (id_a, id_b)."""
    sigs = ds.map_batches(MinHasher, fn_constructor_kwargs=dict(
        text_col=text_col, id_col=id_col, num_perm=num_perm, k=k, seed=seed),
        batch_format="pyarrow", concurrency=2)

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        sig = np.stack(batch.column("minhash").to_numpy(zero_copy_only=False))
        keys = _band_keys(sig, bands)
        n = len(ids)
        return pa.table({
            id_col: pa.array(np.tile(ids, bands)),
            "band": pa.array(np.repeat(np.arange(bands, dtype=np.int64), n), pa.int64()),
            "band_hash": pa.array(keys.T.reshape(-1), pa.int64()),
        })

    exploded = sigs.map_batches(explode, batch_format="pyarrow")

    # self-join on (band, band_hash) instead of a per-bucket map_groups
    # UDF — see hamming_pairs for the rationale (bucket count ~= row
    # count makes per-group Python calls the bottleneck)
    import ray as _ray
    npart = max(2, min(8, int(_ray.cluster_resources().get("CPU", 8)) // 2))
    joined = exploded.join(exploded, join_type="inner", num_partitions=npart,
                           on=("band", "band_hash"),
                           right_on=("band", "band_hash"), right_suffix="_r")

    def ordered_pairs(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        keep = pc.less(b.column(id_col), b.column(f"{id_col}_r"))
        sub = b.filter(keep)
        return pa.table({"id_a": sub.column(id_col),
                         "id_b": sub.column(f"{id_col}_r")})

    pairs = joined.map_batches(ordered_pairs, batch_format="pyarrow")
    # dedupe pairs found in multiple bands: #groups ~ #candidate pairs,
    # so block-aggregated (per-group Python cost would dominate)
    from .fastagg import sort_block_aggregate
    dedup = sort_block_aggregate(pairs, ["id_a", "id_b"],
                                 {"n_bands_hit": (None, "count")})
    return dedup.select_columns(["id_a", "id_b"])


def jaccard_counts(text_a: str, text_b: str, k: int = 5) -> tuple[int, int]:
    """(|A ∩ B|, |A ∪ B|) over distinct k-shingle hashes — integer-exact
    (empty text hashes to the single shingle 0, so the union is never
    empty)."""
    sa = set(_shingle_hashes(text_a, k).tolist())
    sb = set(_shingle_hashes(text_b, k).tolist())
    inter = len(sa & sb)
    return inter, len(sa) + len(sb) - inter


def jaccard(text_a: str, text_b: str, k: int = 5) -> float:
    i, u = jaccard_counts(text_a, text_b, k)
    return i / u


def ngram_jaccard_pairs(ds, text_col: str = "text", id_col: str = "doc_id",
                        threshold: float = 0.5, k: int = 5, df_cap: int = 50,
                        num_partitions: int = 8):
    """Exact n-gram Jaccard near-dup pairs via an inverted shingle index.

    Unlike ``minhash_dedup_pairs`` (probabilistic candidate recall),
    this computes the TRUE Jaccard similarity over the df-capped
    shingle universe: shingles appearing in more than ``df_cap``
    documents ("stop shingles") are dropped on BOTH sides of the
    similarity, and every surviving pair intersection is found by a
    distributed self-join on shingle hash.  Semantics: Jaccard over
    {h : df(h) <= df_cap}, exact — no sampling, no hashing error.

    Scale shape: the self-join's output is bounded by
    ``df_cap * sum(|shingles per doc|)`` — LINEAR in corpus size (each
    exploded row meets at most df_cap partners), so the cap is what
    makes the all-pairs semantics tractable at 100 TB; without it the
    hot-shingle groups contribute O(df^2) pairs.  Only (id, h, ns) int
    rows ever shuffle; documents never move.  One wide groupby (shingle
    df census), one self-join, one pair-groupby — the hot set rides a
    ray.put broadcast and per-doc sizes are computed map-side, so no
    semi-join or sizes join exists.

    Returns (id_a, id_b, n_inter, n_union) with id_a < id_b and
    n_inter >= threshold * n_union — integer columns, so a DuckDB
    oracle hash-compares exactly.
    """
    import pyarrow.compute as pc
    import ray as _ray

    from .fastagg import sort_block_aggregate

    def explode(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        hs = [_shingle_hashes(t or "", k) for t in texts]
        return pa.table({
            "h": pa.array(np.concatenate(hs).astype(np.int64) if len(hs) else
                          np.empty(0, np.int64), pa.int64()),
        })

    # pass A: the hot-shingle ("stop shingle") set, df > cap.  It is the
    # SMALL side — |hot| <= total_occurrences / df_cap — so it
    # broadcasts (ray.put once, zero-copy numpy per worker) instead of
    # paying a semi-join; the per-(h)-count census is the only wide op
    # (block-aggregated: #distinct shingles ~ corpus size).
    exploded = ds.select_columns([text_col]).map_batches(
        explode, batch_format="pyarrow")
    hot_df = (sort_block_aggregate(exploded, "h",
                                   {"df": (None, "count")})
              .map_batches(lambda b: b.filter(pc.greater(b.column("df"),
                                                         df_cap)),
                           batch_format="pyarrow")
              .select_columns(["h"]).to_pandas())
    hot_ref = _ray.put(np.sort(hot_df["h"].to_numpy()))

    # pass B: re-shingle per document (vectorized, cheaper than
    # shuffling shingles back), drop hot shingles, and compute each
    # doc's capped size ns IN-BATCH — whole docs never split across
    # batches here, so no sizes shuffle/join is needed at all.
    def capped_rows(batch: pa.Table) -> pa.Table:
        hot = _ray.get(hot_ref)
        texts = batch.column(text_col).to_pylist()
        ids = batch.column(id_col).to_pylist()
        out_id, out_h, out_ns = [], [], []
        for i, t in enumerate(texts):
            hs = _shingle_hashes(t or "", k).astype(np.int64)
            if len(hot):
                hs = hs[~np.isin(hs, hot)]
            if len(hs) == 0:
                continue
            out_id.append(np.repeat(np.asarray([ids[i]], object), len(hs)))
            out_h.append(hs)
            out_ns.append(np.full(len(hs), len(hs), np.int64))
        idt = batch.schema.field(id_col).type
        if not out_h:
            return pa.table({id_col: pa.array([], idt),
                             "h": pa.array([], pa.int64()),
                             "ns": pa.array([], pa.int64())})
        return pa.table({
            id_col: pa.array(np.concatenate(out_id)).cast(idt),
            "h": pa.array(np.concatenate(out_h), pa.int64()),
            "ns": pa.array(np.concatenate(out_ns), pa.int64()),
        })

    withns = ds.select_columns([id_col, text_col]).map_batches(
        capped_rows, batch_format="pyarrow").materialize()
    joined = withns.join(withns, join_type="inner",
                         num_partitions=num_partitions,
                         on=("h",), right_on=("h",), right_suffix="_r")

    def ordered(b: pa.Table) -> pa.Table:
        keep = pc.less(b.column(id_col), b.column(f"{id_col}_r"))
        sub = b.filter(keep)
        return pa.table({"id_a": sub.column(id_col),
                         "id_b": sub.column(f"{id_col}_r"),
                         "ns_a": sub.column("ns"),
                         "ns_b": sub.column("ns_r")})

    # pair reduction: #groups ~ #candidate pairs, so Ray's built-in
    # grouped aggregate pays ~10s of per-group Python at 100k pairs —
    # sort_block_aggregate does the same reduction in C++ per block
    from .fastagg import sort_block_aggregate
    pairs = sort_block_aggregate(
        joined.map_batches(ordered, batch_format="pyarrow"),
        ["id_a", "id_b"],
        {"n_inter": (None, "count"),
         "na": ("ns_a", "min"),
         "nb": ("ns_b", "min")})

    def finish(b: pa.Table) -> pa.Table:
        ni = b.column("n_inter").to_numpy()
        nu = (b.column("na").to_numpy() + b.column("nb").to_numpy() - ni)
        out = pa.table({"id_a": b.column("id_a"), "id_b": b.column("id_b"),
                        "n_inter": pa.array(ni, pa.int64()),
                        "n_union": pa.array(nu, pa.int64())})
        return out.filter(pa.array(ni >= threshold * nu))

    return pairs.map_batches(finish, batch_format="pyarrow")


def minhash_dedup_pairs(ds, text_col: str = "text", id_col: str = "doc_id",
                        threshold: float = 0.7, num_perm: int = 64,
                        bands: int = 16, k: int = 5, num_partitions: int = 8):
    """Verified near-dup pairs: LSH candidates + exact shingle Jaccard.

    Verification joins candidate ids back to the document table (two
    hash joins on id) so full texts move only for candidate pairs.
    """
    # materialize: candidates are small, and this decouples the
    # candidate self-join from the two verify joins below (3 concurrent
    # join operators starve each other's aggregator pools on few CPUs)
    cands = minhash_lsh_candidates(ds, text_col, id_col, num_perm, bands, k
                                   ).materialize()
    docs = ds.select_columns([id_col, text_col])
    j1 = cands.join(docs, join_type="inner", num_partitions=num_partitions,
                    on=("id_a",), right_on=(id_col,), right_suffix="_a")
    j1 = _rename_first_present(j1, [f"{text_col}_a", text_col], "text_a")
    j2 = j1.join(docs, join_type="inner", num_partitions=num_partitions,
                 on=("id_b",), right_on=(id_col,), right_suffix="_b")
    j2 = _rename_first_present(j2, [f"{text_col}_b", text_col], "text_b")

    def verify(batch: pa.Table) -> pa.Table:
        cnt = [jaccard_counts(a, b, k)
               for a, b in zip(batch.column("text_a").to_pylist(),
                               batch.column("text_b").to_pylist())]
        ni = np.asarray([c[0] for c in cnt], np.int64)
        nu = np.asarray([c[1] for c in cnt], np.int64)
        # integer outputs so the DuckDB oracle hash-compares exactly;
        # the threshold predicate uses the same float expression on both
        # sides (identical int inputs => identical doubles)
        out = (batch.select(["id_a", "id_b"])
               .append_column("n_inter", pa.array(ni, pa.int64()))
               .append_column("n_union", pa.array(nu, pa.int64())))
        return out.filter(pa.array(ni >= threshold * nu))

    return j2.map_batches(verify, batch_format="pyarrow")


def _rename_first_present(ds, candidates: list[str], new_name: str):
    """Rename whichever of ``candidates`` exists in the schema to
    ``new_name`` (join suffixes apply only on collision)."""
    def fix(batch: pa.Table) -> pa.Table:
        names = batch.column_names
        for c in candidates:
            if c in names:
                return batch.rename_columns([new_name if n == c else n for n in names])
        raise KeyError(f"none of {candidates} in {names}")
    return ds.map_batches(fix, batch_format="pyarrow")


# ---------------------------------------------------------------- simhash



def simhash64(text: str) -> int:
    """64-bit SimHash over md5 token hashes (sign of weighted bit sums).

    Token hash = low 8 digest bytes little-endian == DuckDB's
    ``md5_number_lower`` — chosen so a SQL oracle can replay the whole
    signature (bit i set iff 2 * ones_i > n_tokens)."""
    toks = text.split()
    if not toks:
        return 0
    hs = np.asarray([int.from_bytes(hashlib.md5(t.encode()).digest()[8:], "little")
                     for t in toks], np.uint64)
    bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1))
    score = (2 * bits.astype(np.int64) - 1).sum(axis=0)
    sel = score > 0
    word = np.sum((np.uint64(1) << np.arange(64, dtype=np.uint64))[sel],
                  dtype=np.uint64)
    return int(np.uint64(word).astype(np.int64))


def simhash_pairs(ds, text_col: str = "text", id_col: str = "doc_id",
                  max_hamming: int = 3):
    """Exact near-dup pairs with simhash Hamming <= max_hamming.

    Pigeonhole banding: the 64-bit signature splits into
    ``max_hamming + 1`` bands; any pair within max_hamming bits must
    agree on >= 1 full band, so bucketing by (band, band_bits) finds
    every qualifying pair — no recall loss, then verify exactly.
    """
    def sig(batch: pa.Table) -> pa.Table:
        s = [simhash64(t or "") for t in batch.column(text_col).to_pylist()]
        return pa.table({id_col: batch.column(id_col),
                         "simhash": pa.array(s, pa.int64())})

    sigs = ds.map_batches(sig, batch_format="pyarrow")
    return hamming_pairs(sigs, hash_col="simhash", id_col=id_col,
                         max_hamming=max_hamming)


# per-worker memo of the broadcast (ids, hashes, band, run_end) arrays
# used by the small-input pair scan
_SCAN_BCAST_CACHE: dict = {}


def _band_bits_of_g(h: np.ndarray, bi: int, n_bands: int, width: int,
                    bit_width: int) -> np.ndarray:
    lo = bi * width
    hi = bit_width if bi == n_bands - 1 else lo + width
    mask = (np.uint64(1) << np.uint64(hi - lo)) - np.uint64(1)
    return (h >> np.uint64(lo)) & mask


def _first_band_only_g(ha: np.ndarray, hb: np.ndarray, band: np.ndarray,
                       n_bands: int, width: int, bit_width: int) -> np.ndarray:
    """True where ``band`` is the FIRST band in which ha and hb agree —
    makes pair emission globally unique by construction (no dedup
    shuffle); module-level twin of hamming_pairs' nested helper."""
    keep = np.ones(len(ha), bool)
    for bi in range(n_bands - 1):
        match = (_band_bits_of_g(ha, bi, n_bands, width, bit_width)
                 == _band_bits_of_g(hb, bi, n_bands, width, bit_width))
        keep &= ~(match & (band > bi))
    return keep


def _pairs_small_collected(exploded, *, id_col, hash_col, max_hamming,
                           n_bands, width, bit_width, warn_bucket_rows, log):
    """Small-input pair generation: bucket-sort the (bounded) exploded
    table on the driver, ``ray.put`` the sorted arrays once, and emit
    pairs from comparison-budgeted row-chunk tasks.

    Every task scans rows [i0, i1) of the sorted arrays against the
    remainder of their own (band, band_bits) run, so hot and small
    buckets flow through one mechanism, a hot run is split ACROSS
    chunks (the per-bucket map_groups path serialized each hot bucket
    into a single task), and each pair is produced exactly once at its
    smaller row index.  The driver collect is bounded by the caller
    (<= 1M exploded rows); larger inputs take the join+census path.
    """
    import pyarrow.compute as pc

    import ray as _ray
    import ray.data as _rd

    tb = pa.concat_tables(
        exploded.iter_batches(batch_format="pyarrow", batch_size=None))
    id_type = tb.schema.field(id_col).type
    # Arrow C++ multi-key sort + takes: the previous np.lexsort keyed
    # on an OBJECT id array — ~0.5s of driver-serial python for a 288k
    # exploded table, a fixed cost the 2->8 scaling ladder charges 4x
    # against the high level.  Ids stay Arrow end-to-end (zero-copy
    # through the object store; C++ gathers in the scan tasks).
    order = pc.sort_indices(tb, sort_keys=[
        ("band", "ascending"), ("band_bits", "ascending"),
        (id_col, "ascending")])
    tb = tb.take(order).combine_chunks()
    ids = tb.column(id_col).combine_chunks()
    if isinstance(ids, pa.ChunkedArray):
        ids = ids.chunk(0) if ids.num_chunks else pa.array([], id_type)
    hs = tb.column(hash_col).to_numpy().astype(np.uint64)
    band = tb.column("band").to_numpy()
    bits = tb.column("band_bits").to_numpy()
    n = len(ids)
    newrun = np.concatenate([[True], (np.diff(band) != 0)
                             | (np.diff(bits) != 0)])
    starts = np.flatnonzero(newrun)
    lens = np.diff(np.concatenate([starts, [n]]))
    if len(lens) and int(lens.max()) > warn_bucket_rows:
        log.warning("hamming_pairs hot bucket has %d rows — O(n^2) scan; "
                    "check bit_width", int(lens.max()))
    run_end = np.repeat(starts + lens, lens)        # per-row, exclusive
    cmp_rows = run_end - np.arange(n) - 1
    cum = np.concatenate([[0], np.cumsum(cmp_rows)])
    total = int(cum[-1])
    empty = pa.table({"id_a": pa.array([], id_type),
                      "id_b": pa.array([], id_type),
                      "hamming": pa.array([], pa.int64())})
    if total == 0:
        return _rd.from_arrow(empty)
    ncpu = max(1, int(_ray.cluster_resources().get("CPU", 8)))
    budget = max(65536, min(1 << 22, -(-total // (4 * ncpu))))
    marks = np.arange(budget, total, budget, dtype=np.int64)
    cuts = np.unique(np.searchsorted(cum, marks, side="left"))
    bounds = np.unique(np.concatenate([[0], cuts, [n]]))
    ref = _ray.put((ids, hs, band, run_end))

    def scan(bt: pa.Table) -> pa.Table:
        got = _SCAN_BCAST_CACHE.get(ref)
        if got is None:
            got = _ray.get(ref)
            _SCAN_BCAST_CACHE.clear()
            _SCAN_BCAST_CACHE[ref] = got
        sids, shs, sband, srun_end = got
        outs = []
        for i0, i1 in zip(bt.column("i0").to_pylist(),
                          bt.column("i1").to_pylist()):
            rows = np.arange(i0, i1)
            counts = srun_end[rows] - rows - 1
            tot = int(counts.sum())
            if tot == 0:
                continue
            rr = np.repeat(rows, counts)
            base = np.concatenate([[0], np.cumsum(counts)])[:-1]
            off = np.arange(tot) - np.repeat(base, counts)
            cc = rr + 1 + off
            ham = phashmod.popcount64(shs[rr] ^ shs[cc]).astype(np.int64)
            ok = ham <= max_hamming
            if not ok.any():
                continue
            rr, cc, ham = rr[ok], cc[ok], ham[ok]
            keep = _first_band_only_g(shs[rr], shs[cc], sband[rr],
                                      n_bands, width, bit_width)
            rr, cc, ham = rr[keep], cc[keep], ham[keep]
            if not len(rr):
                continue
            ida = pc.take(sids, pa.array(rr, pa.int64()))
            idb = pc.take(sids, pa.array(cc, pa.int64()))
            outs.append(pa.table({"id_a": ida, "id_b": idb,
                                  "hamming": pa.array(ham, pa.int64())}))
        return pa.concat_tables(outs) if outs else empty

    desc = pa.table({"i0": pa.array(bounds[:-1], pa.int64()),
                     "i1": pa.array(bounds[1:], pa.int64())})
    return (_rd.from_arrow(desc).repartition(desc.num_rows)
            .map_batches(scan, batch_format="pyarrow", batch_size=None,
                         num_cpus=1))


def hamming_pairs(ds, hash_col: str = "phash", id_col: str = "image_id",
                  max_hamming: int = 3, bit_width: int = 64,
                  warn_bucket_rows: int = 20_000, scope_col: str | None = None):
    """All pairs with Hamming(hash) <= max_hamming over any int64 hash
    column (phash near-dup dedup).  Exact by pigeonhole banding.

    ``bit_width``: the populated bit range of the hashes.  Banding
    splits [0, bit_width) into max_hamming+1 bands — banding the full
    64 bits of a 16-bit hash would put every row into one (band,
    bits=0) bucket for each all-zero band, degenerating into a serial
    O(n^2) scan; callers with narrow hashes must pass their width.
    Buckets larger than ``warn_bucket_rows`` log a skew warning (the
    pairwise scan inside a bucket is O(n^2)).

    ``scope_col``: optional non-negative int64 partition column (e.g.
    a geo tile id).  Only pairs WITHIN the same scope are emitted: the
    scope folds into the bucket key, so cross-scope rows never meet —
    the "same place AND looks alike" composition, with no post-filter
    join and a pair stream bounded per scope.
    """
    import logging

    n_bands = max_hamming + 1
    if bit_width < n_bands:
        raise ValueError(f"bit_width {bit_width} < {n_bands} bands")
    width = bit_width // n_bands
    # widest band (the last absorbs the remainder) -> scope shift
    shift = max(width, bit_width - (n_bands - 1) * width)
    if scope_col is not None and shift >= 62:
        raise ValueError(
            f"hamming_pairs: scope_col needs headroom beside the widest "
            f"band ({shift} bits with max_hamming={max_hamming}, "
            f"bit_width={bit_width}); raise max_hamming or narrow "
            f"bit_width so the widest band is < 62 bits")
    log = logging.getLogger(__name__)

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        h = batch.column(hash_col).to_numpy().astype(np.uint64)
        n = len(ids)
        if scope_col is not None:
            s = batch.column(scope_col).to_numpy().astype(np.int64)
            if len(s) and (int(s.min()) < 0
                           or int(s.max()) >= (1 << (62 - shift))):
                raise ValueError(
                    f"hamming_pairs: scope values must be in "
                    f"[0, 2^{62 - shift}) to fold beside {shift} band bits")
        bits_parts = []
        for bi in range(n_bands):
            lo = bi * width
            hi = bit_width if bi == n_bands - 1 else lo + width
            mask = (np.uint64(1) << np.uint64(hi - lo)) - np.uint64(1)
            bits = ((h >> np.uint64(lo)) & mask).astype(np.int64)
            if scope_col is not None:
                bits = (s << shift) | bits
            bits_parts.append(bits)
        return pa.table({
            id_col: pa.array(np.tile(ids, n_bands)),
            hash_col: pa.array(np.tile(h.astype(np.int64), n_bands), pa.int64()),
            "band": pa.array(np.repeat(np.arange(n_bands, dtype=np.int64), n), pa.int64()),
            "band_bits": pa.array(np.concatenate(bits_parts), pa.int64()),
        })

    proj = [id_col, hash_col] + ([scope_col] if scope_col else [])
    exploded = ds.select_columns(proj).map_batches(
        explode, batch_format="pyarrow")

    # Two regimes, two mechanisms (both exact):
    #
    # - SMALL buckets dominate when hashes are well distributed: bucket
    #   count ~= row count, so a groupby().map_groups per bucket pays
    #   ~1ms of Python UDF overhead each (measured: 60k rows -> 180k
    #   buckets -> minutes).  A SELF-JOIN on (band, band_bits) pairs
    #   them inside the join engine with no per-bucket Python, and its
    #   output is bounded by small_cap x rows.
    # - HOT buckets (skewed hashes, e.g. near-identical images): the
    #   join would MATERIALIZE the full O(n^2) cross-product as rows
    #   (measured: 13M-pair join batches).  Those few buckets instead
    #   run a chunked in-place matrix scan that filters to
    #   hamming <= max before emitting anything.
    #
    # The census that routes rows is a distributed bucket count; only
    # buckets above small_cap are collected to the driver (few, by the
    # definition of skew) and broadcast into the split filter.
    import ray as _ray
    import pyarrow.compute as pc

    small_cap = 64
    exploded = exploded.materialize()   # consumed by census + both splits
    if exploded.count() == 0:
        # empty input: the join path would hand schema-less blocks to
        # the hash aggregator (ArrowInvalid) — return a typed empty set
        import ray.data as _rd
        sch = ds.schema()
        id_type = dict(zip(sch.names, sch.types))[id_col]
        return _rd.from_arrow(pa.table({
            "id_a": pa.array([], id_type), "id_b": pa.array([], id_type),
            "hamming": pa.array([], pa.int64())}))
    if exploded.count() <= 1_000_000:
        # SMALL-INPUT FAST PATH: the join/census route below pays
        # several seconds of fixed exchange cost (hash-join aggregator
        # pool spawn, two filtered materializes, a hot-bucket sort) —
        # measured ~10s at 8 cpus for a 36k-row exploded table whose
        # actual pair compute is ~2M popcounts.  Instead: one bounded
        # driver collect (<= 1M rows, the same bounded-collect pattern
        # as build.plan_salts), broadcast the bucket-sorted arrays via
        # ray.put, and scan runs with comparison-budgeted chunk tasks
        # (compute stays distributed; hot and small buckets share the
        # one mechanism).  The join route remains the at-scale path.
        return _pairs_small_collected(
            exploded, id_col=id_col, hash_col=hash_col,
            max_hamming=max_hamming, n_bands=n_bands, width=width,
            bit_width=bit_width, warn_bucket_rows=warn_bucket_rows,
            log=log)
    # at-scale census: distributed groupby count; only the few buckets
    # above small_cap are collected to the driver
    counts = exploded.groupby(["band", "band_bits"]).count()
    hot = counts.map_batches(
        lambda b: b.filter(pc.greater(b.column("count()"), small_cap)),
        batch_format="pyarrow").to_pandas()
    # an empty filter result loses its schema on the pandas conversion
    hot_keys = ([] if "band" not in hot.columns else
                list(zip(hot["band"].tolist(), hot["band_bits"].tolist())))
    if hot_keys:
        log.warning("hamming_pairs: %d hot buckets (> %d rows) routed to "
                    "chunked scans", len(hot_keys), small_cap)

    def hot_mask(batch: pa.Table) -> np.ndarray:
        band = batch.column("band").to_numpy()
        bits = batch.column("band_bits").to_numpy()
        m = np.zeros(len(band), bool)
        for b_, bb_ in hot_keys:
            m |= (band == b_) & (bits == bb_)
        return m

    small = exploded.map_batches(
        lambda b: b.filter(pa.array(~hot_mask(b))), batch_format="pyarrow")
    # materialize + coalesce: with heavy skew most/all rows are hot and
    # the filter leaves empty (schema-less) blocks that the join's
    # aggregator rejects; repartition merges them away, and an entirely
    # empty small side skips the join
    small = small.materialize()
    n_small = small.count()
    small_empty = n_small == 0
    # size-adaptive partition count: each hash-join partition costs an
    # aggregator actor (pool spawn is the stage's fixed cost); a small
    # exploded table doesn't amortize 16 of them
    npart = max(2, min(16, int(_ray.cluster_resources().get("CPU", 8)) // 2,
                       -(-n_small // 50_000)))
    if not small_empty:
        small = small.repartition(npart)
    joined = small.join(small, join_type="inner", num_partitions=npart,
                        on=("band", "band_bits"),
                        right_on=("band", "band_bits"), right_suffix="_r")

    def _band_bits_of(h: np.ndarray, bi: int) -> np.ndarray:
        lo = bi * width
        hi = bit_width if bi == n_bands - 1 else lo + width
        mask = (np.uint64(1) << np.uint64(hi - lo)) - np.uint64(1)
        return (h >> np.uint64(lo)) & mask

    def _first_band_only(ha: np.ndarray, hb: np.ndarray,
                         band: np.ndarray) -> np.ndarray:
        """True where ``band`` is the FIRST band in which ha and hb
        agree.  Emitting a pair only from its first matching band makes
        emission globally unique BY CONSTRUCTION — no (id_a, id_b)
        dedup shuffle afterwards (that aggregate was the single most
        expensive phase of this operator)."""
        keep = np.ones(len(ha), bool)
        for bi in range(n_bands - 1):
            match = _band_bits_of(ha, bi) == _band_bits_of(hb, bi)
            keep &= ~(match & (band > bi))
        return keep

    def verify_pairs(b: pa.Table) -> pa.Table:
        sub = b.filter(pc.less(b.column(id_col), b.column(f"{id_col}_r")))
        ha = sub.column(hash_col).to_numpy().astype(np.uint64)
        hb = sub.column(f"{hash_col}_r").to_numpy().astype(np.uint64)
        ham = phashmod.popcount64(ha ^ hb)
        ok = (ham <= max_hamming) & _first_band_only(
            ha, hb, sub.column("band").to_numpy())
        return pa.table({
            "id_a": sub.column(id_col).filter(pa.array(ok)),
            "id_b": sub.column(f"{id_col}_r").filter(pa.array(ok)),
            "hamming": pa.array(ham[ok], pa.int64()),
        })

    if small_empty:
        sch = ds.schema()
        id_type = dict(zip(sch.names, sch.types))[id_col]
        import ray.data as _rd
        pairs = _rd.from_arrow(pa.table({
            "id_a": pa.array([], id_type), "id_b": pa.array([], id_type),
            "hamming": pa.array([], pa.int64())}))
    else:
        pairs = joined.map_batches(verify_pairs, batch_format="pyarrow")

    if hot_keys:
        big = exploded.map_batches(
            lambda b: b.filter(pa.array(hot_mask(b))), batch_format="pyarrow")

        def bucket_scan(g: pa.Table) -> pa.Table:
            ids = g.column(id_col).to_numpy(zero_copy_only=False)
            hs = g.column(hash_col).to_numpy()
            bnd = int(g.column("band")[0].as_py())
            order = np.argsort(ids, kind="stable")
            ids, hs = ids[order], hs[order]
            n = len(ids)
            if n > warn_bucket_rows:
                log.warning("hamming_pairs hot bucket has %d rows — O(n^2) "
                            "scan; check bit_width", n)
            a, b, d = [], [], []
            chunk = max(1, (1 << 23) // max(n, 1))
            rows_all = np.arange(n)
            hu = hs.astype(np.uint64)
            for i0 in range(0, n, chunk):
                i1 = min(i0 + chunk, n)
                ham = phashmod.hamming_matrix(hs[i0:i1], hs)
                rr, cc = np.nonzero((ham <= max_hamming)
                                    & (rows_all[None, :]
                                       > rows_all[i0:i1, None]))
                if len(rr):
                    keep = _first_band_only(hu[i0 + rr], hu[cc],
                                            np.full(len(rr), bnd, np.int64))
                    rr, cc = rr[keep], cc[keep]
                if len(rr):
                    a.append(ids[i0 + rr])
                    b.append(ids[cc])
                    d.append(ham[rr, cc].astype(np.int64))
            if not a:
                empty = pa.array([], pa.string() if ids.dtype == object else pa.int64())
                return pa.table({"id_a": empty, "id_b": empty,
                                 "hamming": pa.array([], pa.int64())})
            return pa.table({"id_a": pa.array(np.concatenate(a)),
                             "id_b": pa.array(np.concatenate(b)),
                             "hamming": pa.array(np.concatenate(d), pa.int64())})

        hot_pairs = big.groupby(["band", "band_bits"]).map_groups(
            bucket_scan, batch_format="pyarrow")
        pairs = pairs.union(hot_pairs)

    # no dedup pass needed: first-matching-band emission is unique by
    # construction across bands AND across the small/hot split (a
    # bucket is either wholly small or wholly hot)
    return pairs


# ---------------------------------------------------------------- embeddings


def embedding_dedup_pairs(ds, vec_col: str = "embedding", id_col: str = "vec_id",
                          cos_threshold: float = 0.95, n_planes: int = 64,
                          max_hamming: int = 12, seed: int = 42):
    """Near-dup pairs by embedding cosine via random-hyperplane SimHash.

    Candidate recall is probabilistic in max_hamming (unlike the exact
    text paths); the verify stage computes true cosine, so precision is
    exact.  Raise max_hamming and/or n_planes (<= 64: the signature is
    packed into one 64-bit word) for higher recall at more candidates.
    """
    if not 1 <= n_planes <= 64:
        raise ValueError("n_planes must be in [1, 64] (one-word packing); "
                         "use more LSH tables (similarity.knn_lsh) for "
                         "wider signatures")

    def sig(batch: pa.Table) -> pa.Table:
        x = np.stack(batch.column(vec_col).to_numpy(zero_copy_only=False))
        rng = np.random.default_rng(seed)
        planes = rng.normal(size=(x.shape[1], n_planes))
        bits = (x @ planes > 0).astype(np.uint64)
        words = (bits << np.arange(n_planes, dtype=np.uint64)[None, :]).sum(
            axis=1, dtype=np.uint64)
        return pa.table({id_col: batch.column(id_col),
                         "planehash": pa.array(words.astype(np.int64), pa.int64()),
                         vec_col: batch.column(vec_col)})

    sigs = ds.map_batches(sig, batch_format="pyarrow")
    # materialized for the same join-decoupling reason as minhash
    cands = hamming_pairs(sigs, hash_col="planehash", id_col=id_col,
                          max_hamming=max_hamming,
                          bit_width=n_planes).materialize()

    # Ray's hash join rejects (fixed_size_)list non-key fields — carry the
    # vector as raw float64 bytes through the two id joins instead
    # (ONE matrix tobytes + a vectorized offset build, no per-row loop)
    def to_bytes(batch: pa.Table) -> pa.Table:
        x = np.ascontiguousarray(np.stack(
            batch.column(vec_col).to_numpy(zero_copy_only=False)).astype(
            np.float64))
        stride = x.shape[1] * 8
        offs = np.arange(0, (len(x) + 1) * stride, stride, dtype=np.int32)
        vec_bytes = pa.BinaryArray.from_buffers(
            pa.binary(), len(x),
            [None, pa.py_buffer(offs.tobytes()), pa.py_buffer(x.tobytes())])
        return pa.table({id_col: batch.column(id_col),
                         "vec_bytes": vec_bytes})

    vecs = ds.select_columns([id_col, vec_col]).map_batches(
        to_bytes, batch_format="pyarrow")
    j1 = cands.join(vecs, join_type="inner", num_partitions=8,
                    on=("id_a",), right_on=(id_col,), right_suffix="_a")
    j1 = _rename_first_present(j1, ["vec_bytes_a", "vec_bytes"], "vec_a")
    j2 = j1.join(vecs, join_type="inner", num_partitions=8,
                 on=("id_b",), right_on=(id_col,), right_suffix="_b")
    j2 = _rename_first_present(j2, ["vec_bytes_b", "vec_bytes"], "vec_b")

    def _mat(col: pa.ChunkedArray) -> np.ndarray:
        # equal-width binary column -> (n, dim) float64 view of the data
        # buffer (no per-row frombuffer)
        a = col.combine_chunks()
        off = np.frombuffer(a.buffers()[1], np.int32,
                            len(a) + 1, a.offset * 4)
        widths = np.diff(off)
        assert len(widths) == 0 or (widths == widths[0]).all()
        flat = np.frombuffer(a.buffers()[2], np.uint8)[off[0]:off[-1]]
        return flat.view(np.float64).reshape(len(a), -1)

    def verify(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.select(["id_a", "id_b"]).append_column(
                "cosine", pa.array([], pa.float64()))
        xa = _mat(batch.column("vec_a"))
        xb = _mat(batch.column("vec_b"))
        cos = (xa * xb).sum(1) / (np.linalg.norm(xa, axis=1) * np.linalg.norm(xb, axis=1))
        out = batch.select(["id_a", "id_b"]).append_column(
            "cosine", pa.array(cos, pa.float64()))
        return out.filter(pa.compute.greater_equal(out.column("cosine"), cos_threshold))

    return j2.map_batches(verify, batch_format="pyarrow")


def _minlabel_components_numpy(src: np.ndarray, dst: np.ndarray):
    """(unique nodes, component = min reachable node id) — vectorized
    min-label propagation with pointer doubling, O(E log V) total work,
    no per-edge Python.  Same fixpoint as the distributed CC."""
    nodes, inv = np.unique(np.concatenate([src, dst]), return_inverse=True)
    a, b = inv[:len(src)], inv[len(src):]
    lab = np.arange(len(nodes))
    while True:
        new = lab.copy()
        np.minimum.at(new, a, lab[b])     # hook: each endpoint takes the
        np.minimum.at(new, b, lab[a])     # smaller neighbour label
        while True:                        # pointer doubling: label-of-label
            nn = new[new]
            if np.array_equal(nn, new):
                break
            new = nn
        if np.array_equal(new, lab):
            return nodes, nodes[lab]
        lab = new


def near_dup_dedup(ds, pairs, id_col: str = "doc_id",
                   num_partitions: int = 8,
                   driver_edge_cap: int = 1_000_000):
    """End-to-end near-duplicate DEDUP: a pair table (id_a, id_b) from
    any candidate generator (minhash / simhash / jaccard / hamming /
    embedding) -> transitive duplicate clusters -> keep the min-id
    member of each cluster.  Returns the kept ids (one column,
    ``id_col``).

    Near-duplication is not transitive, but dedup must be: if A~B and
    B~C, keeping both A and C leaves a near-pair in the corpus.  The
    standard resolution (and the one MinHash-LSH pipelines use) is to
    union the pair graph into connected components and keep one
    canonical member per component.

    Size-adaptive closure: the pair graph is normally MUCH smaller
    than the corpus, so up to ``driver_edge_cap`` edges (~16 MB at the
    default) the components run as one vectorized numpy pass on the
    driver and the drop set broadcasts into a shuffle-free ``is_in``
    filter — the distributed min-label CC plus LEFT ANTI hash join
    (both all-to-all) only engage above the cap, where they are the
    scale-correct shape.
    """
    import pyarrow.compute as pc

    import ray as _ray

    from ..graph import connected_components_ray

    edges = pairs.map_batches(
        lambda b: pa.table({"src": b.column("id_a").cast(pa.int64()),
                            "dst": b.column("id_b").cast(pa.int64())}),
        batch_format="pyarrow").materialize()
    ids = ds.select_columns([id_col])
    n_edges = edges.count()
    if n_edges == 0:
        return ids
    if n_edges <= driver_edge_cap:
        # zero-row blocks can carry an EMPTY schema (filter/map leftovers)
        # that concat_tables rejects — drop them, they hold no edges
        tbl = pa.concat_tables(
            [t for t in _ray.get(edges.to_arrow_refs()) if t.num_rows])
        nodes, comp = _minlabel_components_numpy(
            tbl.column("src").to_numpy(), tbl.column("dst").to_numpy())
        drop_arr = pa.array(nodes[nodes != comp], pa.int64())
        drop_ref = _ray.put(drop_arr)

        def keep_fn(batch: pa.Table) -> pa.Table:
            dropped = _ray.get(drop_ref)
            m = pc.is_in(batch.column(id_col).cast(pa.int64()),
                         value_set=dropped)
            return batch.filter(pc.invert(m))

        return ids.map_batches(keep_fn, batch_format="pyarrow",
                               zero_copy_batch=True)
    labels = connected_components_ray(edges, num_partitions=num_partitions)
    drop = labels.map_batches(
        lambda b: b.filter(pc.not_equal(b.column("node"),
                                        b.column("component")))
                   .select(["node"]),
        batch_format="pyarrow").materialize()
    n_drop = drop.count()
    if n_drop == 0:
        return ids
    # coalesce away the empty blocks the filter leaves (rowless blocks
    # on a join side trip the Ray 2.49 schema-broadcast bug — see
    # graph._connected_components_ray)
    drop = drop.repartition(max(2, min(num_partitions, n_drop)))
    return ids.join(drop, join_type="left_anti",
                    num_partitions=num_partitions,
                    on=(id_col,), right_on=("node",))


# ------------------------------------------- duplicate token-span census


def duplicate_ngram_stats(ds, n: int = 5, text_col: str = "text",
                          id_col: str = "doc_id"):
    """Per-doc duplicate token-n-gram census — the signal behind
    exact-substring training-data dedup (Lee et al., "Deduplicating
    Training Data Makes Language Models Better", ACL 2022; the
    suffix-array span removal reduces at scale to: which of a doc's
    token n-grams occur >= 2 times in the corpus, counting every
    occurrence — within-doc repeats included).

    -> Dataset (id_col, n_ngrams, n_dup): per doc, its whitespace-token
    n-gram count (``max(len - n + 1, 0)``; token semantics =
    ``text._tok_flat``, SQL-equivalent) and how many of those n-gram
    OCCURRENCES have a corpus-wide occurrence count >= 2.

    Scale shape: grams pre-aggregate per (gram, doc) inside each batch,
    then exchange ONCE keyed by the gram's int64 splitmix hash (the
    gram strings travel only to their own hash group, where exact
    string sub-grouping resolves hash collisions — no false merges);
    per-doc sums and the n-gram totals meet in one final int-keyed
    groupby via a union (no join).  Nothing materializes corpus-wide;
    the gram exchange is linear in token count, the same bound as the
    MinHash shingle pass above."""
    import pyarrow.compute as pc

    from .sketch import _poly_hash_strings
    from .text import _join_ngrams, _tok_flat

    empty_grams = pa.table({
        "ghash": pa.array([], pa.int64()),
        "gram": pa.array([], pa.string()),
        id_col: pa.array([], pa.int64()),
        "c": pa.array([], pa.int64()),
    })

    def gram_pairs(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy()
        flat, row, _lens = _tok_flat(batch.column(text_col))
        g, grow = _join_ngrams(flat, row, n)
        if len(g) == 0:
            return empty_grams
        gdoc = ids[grow]
        # per-batch (gram, doc) pre-aggregation: dictionary-encode the
        # grams, compose (gram code, dense doc) int keys, count runs
        codes = pc.dictionary_encode(g)
        gidx = np.asarray(codes.indices, np.int64)
        key = gidx * np.int64(len(ids) + 1) + np.searchsorted(
            np.unique(gdoc), gdoc)
        order = np.argsort(key, kind="stable")
        ks = key[order]
        starts = np.flatnonzero(np.concatenate(([True], ks[1:] != ks[:-1])))
        cnt = np.diff(np.append(starts, len(ks)))
        first = order[starts]
        gram_arr = pc.take(codes, pa.array(first, pa.int64())).cast(
            pa.string())
        return pa.table({
            "ghash": pa.array(
                _poly_hash_strings(gram_arr).view(np.int64), pa.int64()),
            "gram": gram_arr,
            id_col: pa.array(gdoc[first], pa.int64()),
            "c": pa.array(cnt.astype(np.int64), pa.int64()),
        })

    def census(grp: pa.Table) -> pa.Table:
        """One hash group: exact-string sub-group; grams with a global
        occurrence count >= 2 emit their per-doc counts."""
        grams = np.asarray(grp.column("gram").to_pylist(), object)
        docs = grp.column(id_col).to_numpy()
        cs = grp.column("c").to_numpy()
        out_d, out_c = [], []
        uniq, inv = np.unique(grams, return_inverse=True)
        for gi in range(len(uniq)):
            m = inv == gi
            if cs[m].sum() >= 2:
                out_d.append(docs[m])
                out_c.append(cs[m])
        if not out_d:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "n_ngrams": pa.array([], pa.int64()),
                             "n_dup": pa.array([], pa.int64())})
        d = np.concatenate(out_d)
        c = np.concatenate(out_c)
        return pa.table({id_col: pa.array(d, pa.int64()),
                         "n_ngrams": pa.array(np.zeros(len(d), np.int64)),
                         "n_dup": pa.array(c, pa.int64())})

    def totals(batch: pa.Table) -> pa.Table:
        _f, _r, lens = _tok_flat(batch.column(text_col))
        return pa.table({
            id_col: batch.column(id_col),
            "n_ngrams": pa.array(np.maximum(lens - (n - 1), 0), pa.int64()),
            "n_dup": pa.array(np.zeros(len(lens), np.int64)),
        })

    narrow = ds.select_columns([id_col, text_col])
    dup_rows = (narrow.map_batches(gram_pairs, batch_format="pyarrow",
                                   zero_copy_batch=True)
                      .groupby("ghash")
                      .map_groups(census, batch_format="pyarrow"))
    tot_rows = narrow.map_batches(totals, batch_format="pyarrow",
                                  zero_copy_batch=True)

    agg = (tot_rows.union(dup_rows)
                   .groupby(id_col).sum(["n_ngrams", "n_dup"]))
    return agg.map_batches(
        lambda b: b.select([id_col, "sum(n_ngrams)", "sum(n_dup)"])
                   .rename_columns([id_col, "n_ngrams", "n_dup"]),
        batch_format="pyarrow", zero_copy_batch=True)


def remove_duplicate_spans(ds, n: int = 5, text_col: str = "text",
                           id_col: str = "doc_id"):
    """Exact-substring span REMOVAL (the action behind
    ``duplicate_ngram_stats``; Lee et al. 2022 semantics): every token
    n-gram occurrence whose gram appears >= 2 times corpus-wide is
    removed EXCEPT the globally first occurrence — keeper = the
    occurrence with the smallest (doc_id, start_pos).  A doc's output
    is its tokens minus the union of removed spans, joined with a
    single space (whitespace is not preserved; token semantics =
    ``text._tok_flat``).

    -> Dataset (id_col, text, n_tokens, n_removed): scrubbed text plus
    the token counts the driver oracle replays in SQL.

    Scale shape: same int-keyed gram exchange as
    ``duplicate_ngram_stats`` but carrying (doc, pos) occurrence rows
    (positions matter here, so the per-batch pre-aggregation is by
    exact occurrence, already unique); removals route back keyed by
    doc id and meet the doc's text in one grouped pass — per-doc
    groups are bounded by doc length, never corpus-wide."""
    from .sketch import _poly_hash_strings
    from .text import _join_ngrams_pos, _tok_flat

    def gram_occurrences(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy()
        flat, row, _lens = _tok_flat(batch.column(text_col))
        grams, grow, gpos = _join_ngrams_pos(flat, row, n)
        if len(grams) == 0:
            return pa.table({
                "ghash": pa.array([], pa.int64()),
                "gram": pa.array([], pa.string()),
                id_col: pa.array([], pa.int64()),
                "pos": pa.array([], pa.int64()),
            })
        return pa.table({
            "ghash": pa.array(
                _poly_hash_strings(grams).view(np.int64), pa.int64()),
            "gram": grams,
            id_col: pa.array(ids[grow], pa.int64()),
            "pos": pa.array(gpos, pa.int64()),
        })

    def removals(grp: pa.Table) -> pa.Table:
        """One hash group: per exact gram with >= 2 occurrences, every
        occurrence except the (doc, pos)-smallest is a removal."""
        grams = np.asarray(grp.column("gram").to_pylist(), object)
        docs = grp.column(id_col).to_numpy()
        pos = grp.column("pos").to_numpy()
        out_d, out_p = [], []
        uniq, inv = np.unique(grams, return_inverse=True)
        for gi in range(len(uniq)):
            m = np.flatnonzero(inv == gi)
            if len(m) < 2:
                continue
            keep = m[np.lexsort((pos[m], docs[m]))[0]]
            rest = m[m != keep]
            out_d.append(docs[rest])
            out_p.append(pos[rest])
        if not out_d:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "pos": pa.array([], pa.int64())})
        return pa.table({
            id_col: pa.array(np.concatenate(out_d), pa.int64()),
            "pos": pa.array(np.concatenate(out_p), pa.int64()),
        })

    rem = (ds.select_columns([id_col, text_col])
             .map_batches(gram_occurrences, batch_format="pyarrow",
                          zero_copy_batch=True)
             .groupby("ghash").map_groups(removals, batch_format="pyarrow")
             .map_batches(lambda b: b.append_column(
                 "text", pa.array([None] * b.num_rows, pa.string())),
                 batch_format="pyarrow"))
    txt = ds.select_columns([id_col, text_col]).map_batches(
        lambda b: pa.table({
            id_col: b.column(id_col).cast(pa.int64()),
            "pos": pa.array(np.full(b.num_rows, -1, np.int64)),
            "text": b.column(text_col),
        }), batch_format="pyarrow", zero_copy_batch=True)

    def rebuild(grp: pa.Table) -> pa.Table:
        docs = grp.column(id_col)
        pos = grp.column("pos").to_numpy()
        texts = grp.column("text").to_pylist()
        text = next(t for p, t in zip(pos, texts) if p < 0)
        toks = (text or "").split()
        covered = np.zeros(len(toks), bool)
        for p in pos[pos >= 0]:
            covered[int(p):int(p) + n] = True
        kept = [t for t, c in zip(toks, covered) if not c]
        return pa.table({
            id_col: docs.slice(0, 1),
            "text": pa.array([" ".join(kept)], pa.string()),
            "n_tokens": pa.array([len(toks)], pa.int64()),
            "n_removed": pa.array([int(covered.sum())], pa.int64()),
        })

    return (txt.union(rem.select_columns([id_col, "pos", "text"]))
               .groupby(id_col)
               .map_groups(rebuild, batch_format="pyarrow"))
