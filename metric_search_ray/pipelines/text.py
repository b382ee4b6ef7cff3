"""Text analysis operators (documents table): language-ID, quality
scoring, token counting, fingerprinting.

All stateless vectorized ``map_batches`` stages (actor pool only for
LangId, whose marker tables are built once per actor).  Definitions are
deliberately SQL-reproducible where the driver's DuckDB oracle needs to
replay them (token_count, quality metrics).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

STOPWORDS = ("the", "a", "of", "and", "to")


def _tok_flat(col, lowercase: bool = False):
    """Whitespace tokenization of a string column entirely in Arrow C++
    kernels (trim -> whitespace split -> flatten -> drop empty pieces)
    — the shared hot path for every text operator; no per-row Python
    and no Python-string materialization anywhere.

    Returns ``(flat, row, lens)``: the flattened token array (an ARROW
    StringArray — keep it in Arrow; use ``pc.is_in``/``pc.index_in``/
    ``pc.value_counts``/``dictionary_encode`` for lookups), each
    token's 0-based doc row (numpy int64), and per-doc token counts
    (numpy int64; whitespace-only/empty/NULL docs count 0 and
    contribute no flat entries).  Token semantics match the SQL replay
    used by the driver oracles:
    ``len(string_split_regex(trim(text), '\\s+'))`` with the
    empty-string -> 0 correction."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    t = pc.utf8_trim_whitespace(pc.fill_null(arr, ""))
    if lowercase:
        t = pc.utf8_lower(t)
    # utf8_split_whitespace is ~3.5x faster than the RE2 \s+ split but
    # emits empty pieces around whitespace runs at string edges — drop
    # them (a real token is never empty)
    split = pc.utf8_split_whitespace(t)
    raw_lens = pc.list_value_length(split).to_numpy(
        zero_copy_only=False).astype(np.int64)
    flat_all = pc.list_flatten(split)
    nonempty = pc.not_equal(flat_all, "")
    ne = nonempty.to_numpy(zero_copy_only=False)
    row_all = np.repeat(np.arange(len(raw_lens), dtype=np.int64), raw_lens)
    flat = flat_all.filter(nonempty)
    row = row_all[ne]
    lens = np.bincount(row, minlength=len(raw_lens)).astype(np.int64) \
        if len(row) else np.zeros(len(raw_lens), np.int64)
    return flat, row, lens


def _join_ngrams_pos(flat: pa.Array, row: np.ndarray, n: int,
                     sep: str = " "):
    """(grams, gram_row, gram_pos) — n-grams of the flattened token
    stream that stay within one doc, joined with ``sep`` via one Arrow
    C++ kernel; ``gram_pos`` is each gram's 0-based start-token index
    WITHIN its doc.  Shared by the contamination check, the duplicate
    n-gram census and the span-removal scrub — one tokenization/join
    definition, never three."""
    m = len(flat) - (n - 1)
    if m <= 0:
        return (pa.array([], pa.string()), np.empty(0, np.int64),
                np.empty(0, np.int64))
    valid = row[n - 1:] == row[:m]
    parts = [flat.slice(j, m) for j in range(n)]
    grams = pc.binary_join_element_wise(*parts, sep)
    # in-doc position: token index minus the doc's first-token index
    # (row is sorted, so that's one searchsorted)
    pos_in_doc = (np.arange(len(flat), dtype=np.int64)
                  - np.searchsorted(row, row))
    return (grams.filter(pa.array(valid)), row[:m][valid],
            pos_in_doc[:m][valid])


def _join_ngrams(flat: pa.Array, row: np.ndarray, n: int, sep: str = " "):
    """(grams, gram_row) — see ``_join_ngrams_pos``."""
    g, r, _p = _join_ngrams_pos(flat, row, n, sep)
    return g, r

# tiny per-language marker vocabularies for the n-gram/stopword heuristic
LANG_MARKERS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "that", "it", "for"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "mit", "zu", "auf"},
    "fr": {"le", "la", "les", "et", "est", "une", "des", "que", "pas", "pour"},
    "es": {"el", "la", "los", "y", "es", "una", "que", "no", "por", "con"},
    "zh": set(),  # CJK detected by codepoint range, not markers
}


def token_count(ds, text_col: str = "text", id_col: str = "doc_id"):
    """(id, n_tokens) — whitespace tokens, SQL-equivalent to
    len(string_split_regex(trim(text), '\\s+'))."""
    def fn(batch: pa.Table) -> pa.Table:
        _, _, lens = _tok_flat(batch.column(text_col))
        return pa.table({id_col: batch.column(id_col),
                         "n_tokens": pa.array(lens, pa.int64())})
    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def bpe_ish_token_count(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Regex token count approximating BPE pre-tokenization (GPT-2-style
    split on words / numbers / punctuation runs) — one vectorized
    str.count pass, no per-doc findall."""
    def fn(batch: pa.Table) -> pa.Table:
        col = pc.fill_null(batch.column(text_col), "")
        n = pc.count_substring_regex(
            col, r"[A-Za-z]+|\d+|[^\sA-Za-z\d]+").to_numpy(
            zero_copy_only=False).astype(np.int64)
        return pa.table({id_col: batch.column(id_col),
                         "n_bpe_tokens": pa.array(n, pa.int64())})
    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def quality_score(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Per-doc quality features: n_chars, n_words, avg word length,
    stopword ratio, punctuation ratio + a combined [0,1] score."""
    stop_set = pa.array(list(STOPWORDS), pa.string())

    def fn(batch: pa.Table) -> pa.Table:
        col = pc.fill_null(batch.column(text_col).combine_chunks()
                           if isinstance(batch.column(text_col),
                                         pa.ChunkedArray)
                           else batch.column(text_col), "")
        n_chars = pc.utf8_length(col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        flat, row, n_words = _tok_flat(col)
        # stopword hits: one C++ lower + is_in over the flat token
        # stream, np.add.at per doc — no per-token Python
        # stopword lookup over the UNIQUE tokens (dictionary), then a
        # numpy gather — the is_in/lower pass runs on |vocab| strings,
        # not |tokens|
        sw = np.zeros(len(n_words), np.int64)
        if len(flat):
            enc = flat.dictionary_encode()
            hd = pc.is_in(pc.utf8_lower(enc.dictionary),
                          value_set=stop_set).to_numpy(zero_copy_only=False)
            hit = hd[enc.indices.to_numpy(zero_copy_only=False)]
            sw = np.bincount(row[hit], minlength=len(n_words)).astype(np.int64)
        punct = pc.count_substring_regex(col, r"[^\w\s]").to_numpy(
            zero_copy_only=False).astype(np.int64)
        avg_wlen = np.where(n_words > 0,
                            (n_chars - np.maximum(n_words - 1, 0)) / np.maximum(n_words, 1),
                            0.0)
        stop_ratio = np.where(n_words > 0, sw / np.maximum(n_words, 1), 0.0)
        punct_ratio = np.where(n_chars > 0, punct / np.maximum(n_chars, 1), 0.0)
        # heuristic score: reasonable length, some stopwords, few symbols
        score = (np.clip(n_words / 20.0, 0, 1) * 0.4
                 + np.clip(stop_ratio * 5, 0, 1) * 0.3
                 + (1 - np.clip(punct_ratio * 10, 0, 1)) * 0.3)
        return pa.table({
            id_col: batch.column(id_col),
            "n_chars_q": pa.array(n_chars, pa.int64()),
            "n_words": pa.array(n_words, pa.int64()),
            "avg_word_len": pa.array(avg_wlen, pa.float64()),
            "stopword_ratio": pa.array(stop_ratio, pa.float64()),
            "punct_ratio": pa.array(punct_ratio, pa.float64()),
            "quality": pa.array(score, pa.float64()),
        })
    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


class LangId:
    """Actor-pool stage: marker-vocabulary language id (n-gram heuristic)."""

    def __init__(self):
        self.markers = {k: pa.array(sorted(v), pa.string())
                        for k, v in LANG_MARKERS.items()}

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = pc.fill_null(batch.column("text").combine_chunks()
                           if isinstance(batch.column("text"), pa.ChunkedArray)
                           else batch.column("text"), "")
        n_rows = len(col)
        n_chars = pc.utf8_length(col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        cjk = pc.count_substring_regex(col, r"[一-鿿]").to_numpy(
            zero_copy_only=False).astype(np.int64)
        flat, idx, n_toks = _tok_flat(col, lowercase=True)
        # one dictionary_encode, then per-language is_in over the
        # (tiny) dictionary + numpy gather — 4 marker passes cost
        # O(|vocab|), not O(|tokens|)
        order = ["en", "de", "fr", "es"]
        counts = np.zeros((n_rows, len(order)), np.int64)
        if len(flat):
            enc = flat.dictionary_encode()
            codes = enc.indices.to_numpy(zero_copy_only=False)
            for li, lang in enumerate(order):
                hd = pc.is_in(enc.dictionary,
                              value_set=self.markers[lang]).to_numpy(
                    zero_copy_only=False)
                counts[:, li] = np.bincount(idx[hd[codes]], minlength=n_rows)
        # first-max wins on ties: argmax over the fixed language order
        best_li = np.argmax(counts, axis=1)
        best_n = counts[np.arange(n_rows), best_li]
        lang_arr = np.asarray(order, dtype=object)[best_li]
        lang_arr[best_n == 0] = "unknown"
        # integer-only CJK gate (cjk/len > 0.2) — exact, SQL-replayable
        is_zh = cjk * 5 > n_chars
        lang_arr[is_zh] = "zh"
        n_best = np.where(is_zh, cjk, best_n)
        conf = np.where(is_zh, cjk / np.maximum(n_chars, 1),
                        best_n / np.maximum(n_toks, 1))
        out = batch.append_column("lang_pred", pa.array(lang_arr, pa.string()))
        out = out.append_column("lang_conf", pa.array(conf, pa.float64()))
        out = out.append_column("n_best", pa.array(n_best, pa.int64()))
        return out.append_column("n_toks", pa.array(n_toks, pa.int64()))


def lang_id(ds):
    return ds.map_batches(LangId, batch_format="pyarrow", concurrency=2)


def top_tokens(ds, k: int = 20, text_col: str = "text",
               lowercase: bool = True):
    """Corpus-wide heavy hitters: the k most frequent whitespace tokens
    (ties broken by token ascending).

    Shuffle shape: per-batch PARTIAL counts (np.unique over the
    exploded token array) reduce each batch to its distinct tokens
    before the grouped Sum — the exchange carries vocabulary, not
    corpus; the final top-k runs over the aggregated vocabulary."""
    def partial(batch: pa.Table) -> pa.Table:
        flat, _, _ = _tok_flat(batch.column(text_col), lowercase=lowercase)
        vc = pc.value_counts(flat)
        return pa.table({"token": vc.field("values"),
                         "partial_n": pc.cast(vc.field("counts"), pa.int64())})

    # vocabulary-sized group count: block-aggregated
    from .fastagg import sort_block_aggregate
    counts = sort_block_aggregate(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        "token", {"n": ("partial_n", "sum")})

    def topk(batch: pa.Table) -> pa.Table:
        # per-block candidate top-k (top-k is a semilattice: the global
        # top-k survives any per-block pre-truncation)
        t = batch.column("token").to_numpy(zero_copy_only=False)
        n = batch.column("n").to_numpy()
        order = np.lexsort((t, -n))[:k]
        return pa.table({"token": pa.array(t[order], pa.string()),
                         "n": pa.array(n[order], pa.int64())})

    # final cut on the tiny candidate set (<= k per block)
    cand = counts.map_batches(topk, batch_format="pyarrow").to_pandas()
    cand = cand.sort_values(["n", "token"], ascending=[False, True]).head(k)
    return cand.reset_index(drop=True)


def fingerprint_mod(ds, text_col: str = "text", id_col: str = "doc_id",
                    base: int = 257, mod: int = (1 << 31) - 1):
    """31-bit document fingerprint: Horner fold of the raw text's
    unicode codepoints, ``h = fold(acc*base + cp) mod p`` — the same
    value DuckDB computes with
    ``list_reduce(list_transform(string_split(text, ''), c ->
    unicode(c)), (a, x) -> (a*257 + x) % p)``, making this the
    SQL-oracled fingerprint (``fingerprint`` keeps the full-width
    64-bit variant).

    Vectorized: one power-table build per batch, then per doc a single
    elementwise multiply + chunked exact sums (cp < 2^21, pow < 2^31,
    2048-term chunks < 2^63 — no overflow)."""
    def fn(batch: pa.Table) -> pa.Table:
        texts = [t or "" for t in batch.column(text_col).to_pylist()]
        max_len = max((len(t) for t in texts), default=0)
        pows = np.empty(max(max_len, 1), np.uint64)
        pows[0] = 1
        for i in range(1, len(pows)):           # scalar ladder, once per batch
            pows[i] = (pows[i - 1] * base) % mod
        out = np.zeros(len(texts), np.int64)
        for i, t in enumerate(texts):
            if not t:
                continue
            cp = np.frombuffer(t.encode("utf-32-le"), np.uint32).astype(np.uint64)
            v = cp * pows[len(cp) - 1::-1]
            total = np.uint64(0)
            for j in range(0, len(v), 2048):
                total = (total + np.sum(v[j:j + 2048], dtype=np.uint64)) % np.uint64(mod)
            out[i] = int(total)
        return pa.table({id_col: batch.column(id_col),
                         "fp31": pa.array(out, pa.int64())})
    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def fingerprint(ds, text_col: str = "text", id_col: str = "doc_id"):
    """64-bit document fingerprint: polynomial hash (base = the FNV
    prime, natural uint64 wrap) of the normalized text's bytes
    (whitespace-collapsed, lowercased).

    h = sum_i byte[i] * B^(n-1-i) mod 2^64, computed per doc as two
    vectorized numpy passes (power ladder via multiply.accumulate +
    one dot) — sequential FNV chaining would force a per-byte Python
    loop; a polynomial admits the same distribution with none."""
    B = np.uint64(1099511628211)

    def fn(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        out = np.zeros(len(texts), np.uint64)
        with np.errstate(over="ignore"):
            for i, t in enumerate(texts):
                norm = " ".join((t or "").lower().split()).encode("utf-8")
                if not norm:
                    continue
                data = np.frombuffer(norm, np.uint8).astype(np.uint64)
                pows = np.full(len(data), B, np.uint64)
                pows[0] = 1
                np.multiply.accumulate(pows, out=pows)   # B^i, wraps mod 2^64
                out[i] = np.sum(data * pows[::-1], dtype=np.uint64)
        return pa.table({id_col: batch.column(id_col),
                         "fingerprint": pa.array(out.astype(np.int64), pa.int64())})
    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


# PII scrubbing patterns, applied in order: emails first (an address
# can contain digit runs a later pattern would half-match), then IPv4
# (dotted quads would otherwise match the phone pattern), then phone
# numbers.  Deliberately RE2-compatible (no lookarounds/backrefs) so
# the DuckDB oracle replays them verbatim with regexp_replace/
# regexp_extract_all — parity verified empirically per pattern.
PII_PATTERNS = (
    ("EMAIL", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("IP", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"),
    ("PHONE", r"\+?\d[\d -]{7,}\d"),
)


def pii_scrub(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Redact emails / IPv4 addresses / phone numbers: each match is
    replaced with its [TAG].  Returns (id, clean_text, n_redactions).

    One Arrow RE2 ``count_substring_regex`` + ``replace_substring_regex``
    pass per pattern per batch (the SAME regex engine the DuckDB oracle
    uses) — no per-row Python.  Stateless map stage: embarrassingly
    parallel, shuffle-free."""
    def fn(batch: pa.Table) -> pa.Table:
        s = pc.fill_null(batch.column(text_col), "")
        n = np.zeros(len(s), np.int64)
        for tag, pat in PII_PATTERNS:
            n += pc.count_substring_regex(s, pat).to_numpy(
                zero_copy_only=False).astype(np.int64)
            s = pc.replace_substring_regex(s, pat, f"[{tag}]")
        return pa.table({id_col: batch.column(id_col),
                         "clean_text": s,
                         "n_redactions": pa.array(n, pa.int64())})
    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def bm25_score(ds, terms: list[str], k1: float = 1.2, b: float = 0.75,
               text_col: str = "text", id_col: str = "doc_id"):
    """BM25 relevance of every document against a fixed term list
    (Robertson/Sparck-Jones idf in the non-negative Lucene form).
    Returns (id, score) for docs matching at least one term.

    Two passes, both shuffle-free:
    1. census — per-batch partials of (df per term, total doc length,
       doc count) stream to the driver; output size is bounded by
       len(terms), independent of corpus size;
    2. score — one vectorized pass: tokens exploded per batch with
       np.repeat, per-term tf via np.bincount over an object-array
       equality mask (C loop), no per-row Python.

    Token semantics match token_count (whitespace split, empty -> 0
    tokens) so the SQL oracle can replay both passes exactly.
    """
    terms = list(terms)

    def census(batch: pa.Table) -> pa.Table:
        flat, row, lens = _tok_flat(batch.column(text_col))
        df = np.empty(len(terms), np.int64)
        for j, t in enumerate(terms):
            hit = row[pc.equal(flat, t).to_numpy(zero_copy_only=False)]
            df[j] = len(np.unique(hit))
        return pa.table({
            "term_idx": pa.array(np.arange(len(terms)), pa.int64()),
            "df": pa.array(df, pa.int64()),
            "n_docs": pa.array(np.full(len(terms), len(lens)), pa.int64()),
            "sum_dl": pa.array(np.full(len(terms), lens.sum()), pa.int64()),
        })

    parts = ds.map_batches(census, batch_format="pyarrow",
                           zero_copy_batch=True).to_pandas()
    agg = parts.groupby("term_idx").agg(df=("df", "sum"))
    per_batch = parts[parts["term_idx"] == 0]
    n_total = int(per_batch["n_docs"].sum())
    avgdl = float(per_batch["sum_dl"].sum()) / max(n_total, 1)
    dfv = agg["df"].to_numpy(np.float64)
    idf = np.log((n_total - dfv + 0.5) / (dfv + 0.5) + 1.0)

    def score(batch: pa.Table) -> pa.Table:
        flat, row, lens = _tok_flat(batch.column(text_col))
        n = len(lens)
        sc = np.zeros(n, np.float64)
        norm = k1 * (1.0 - b + b * lens / avgdl)
        for j, t in enumerate(terms):
            hit = pc.equal(flat, t).to_numpy(zero_copy_only=False)
            tf = np.bincount(row[hit], minlength=n).astype(np.float64)
            sc += idf[j] * tf * (k1 + 1.0) / (tf + norm)
        keep = sc > 0
        return pa.table({id_col: batch.column(id_col).filter(pa.array(keep)),
                         "score": pa.array(sc[keep], pa.float64())})

    return ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)


def repetition_signals(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Within-document repetition signals (the Gopher/C4 quality-filter
    family): per doc, total / distinct / top-count of word bigrams and
    trigrams.  Duplicate-n-gram fraction = 1 - distinct/total and
    top-n-gram fraction = top/total are then driver-side arithmetic;
    integer counts are returned so the SQL oracle compares bit-exact.

    Vectorized: one token explosion per batch (np.repeat), n-grams as
    integer codes (batch-local vocab code * V^j folds), per-doc
    distinct/top via np.unique + bincount/maximum.at — no per-row
    Python beyond the explode."""
    def fn(batch: pa.Table) -> pa.Table:
        flat, row, lens = _tok_flat(batch.column(text_col))
        n = len(lens)
        # dictionary_encode == np.unique(return_inverse) in C++ (codes
        # are first-appearance order, which the fold only needs to be
        # a bijection, not sorted)
        enc = flat.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64) \
            if len(flat) else np.empty(0, np.int64)
        V = np.int64(max(len(enc.dictionary), 1))
        out = {id_col: batch.column(id_col)}
        for g, name in ((2, "bi"), (3, "tri")):
            m = len(flat) - (g - 1)
            if m > 0:
                valid = row[g - 1:] == row[:m]
                grow = row[:m][valid]
                gcode = np.zeros(int(valid.sum()), np.int64)
                for j in range(g):
                    gcode = gcode * V + codes[j:m + j][valid]
                total = np.bincount(grow, minlength=n)
                # dense-rank the n-gram code before pairing with the doc
                # row so the combined key stays far from int64 overflow
                # (V^g alone is safe below ~2M batch vocab; V^g * n_rows
                # would not be)
                _, dcode = np.unique(gcode, return_inverse=True)
                D = np.int64(dcode.max()) + 1 if len(dcode) else np.int64(1)
                key = grow * D + dcode
                ukey, ucnt = np.unique(key, return_counts=True)
                udoc = (ukey // D).astype(np.int64)
                distinct = np.bincount(udoc, minlength=n)
                top = np.zeros(n, np.int64)
                np.maximum.at(top, udoc, ucnt)
            else:
                total = distinct = top = np.zeros(n, np.int64)
            out[f"n_{name}"] = pa.array(total.astype(np.int64), pa.int64())
            out[f"n_{name}_distinct"] = pa.array(distinct.astype(np.int64),
                                                 pa.int64())
            out[f"top_{name}"] = pa.array(top, pa.int64())
        return pa.table(out)
    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def _top_m_counts(counts_ds, key_col: str, n_col: str, m: int):
    """Top-``m`` (count desc, key asc) rows of a distributed census —
    the heavy-hitters semilattice: each block pre-cuts to its own top-m
    (the global top-m survives any per-block truncation), the driver
    merges <= m rows per block."""
    def topm(batch: pa.Table) -> pa.Table:
        kv = batch.column(key_col).to_numpy(zero_copy_only=False)
        nv = batch.column(n_col).to_numpy()
        order = np.lexsort((kv, -nv))[:m]
        return pa.table({key_col: pa.array(kv[order], pa.string()),
                         n_col: pa.array(nv[order], pa.int64())})

    cand = counts_ds.map_batches(topm, batch_format="pyarrow").to_pandas()
    return cand.sort_values([n_col, key_col],
                            ascending=[False, True]).head(m)


def bigram_lm_score(ds, text_col: str = "text", id_col: str = "doc_id",
                    max_bigrams: int | None = None):
    """CCNet-style language-model quality score: add-one-smoothed
    bigram log-likelihood of each doc under the corpus's own bigram
    counts (the perplexity-filter stage of a training-data pipeline).

    Two passes:
    1. bigram census — one distributed grouped count (fastagg) over
       (w1, w2) pairs; unigram first-position counts and the vocab size
       derive from it.
    2. scoring — census broadcast once (ray.put, sorted-array binary
       search), then a vectorized map over docs.

    SCALE CONTRACT: the exact path materializes the full bigram census
    on the driver — fine for bounded vocabularies, wrong for open-vocab
    web corpora.  Pass ``max_bigrams=M`` to cap BOTH the bigram and the
    first-position-unigram tables to their top-M heavy hitters (count
    desc, key asc — a per-block semilattice cut, driver memory O(M)
    regardless of corpus size); bigrams/contexts outside the cap score
    with count 0 (unseen under smoothing), a documented approximation.
    The vocab size V is a distributed ``count()`` either way (never
    materialized).

    Each bigram contributes floor(1e6 * ln((c2+1)/(c1+V))) as int64, so
    the per-doc SUM is order-independent and replayable in SQL exactly
    (float sums would hash-mismatch across reduction orders).  Docs
    with fewer than 2 tokens emit no row.  Returns
    (doc_id, n_bigrams, score_u)."""
    import ray

    from .fastagg import sort_block_aggregate

    SEP = " "       # tokens are whitespace-split, so space is unambiguous

    def _firsts(flat: pa.Array, row: np.ndarray) -> pa.Array:
        if len(flat) < 2:
            return pa.array([], pa.string())
        return flat.slice(0, len(flat) - 1).filter(
            pa.array(row[1:] == row[:-1]))

    def census_partial(batch: pa.Table) -> pa.Table:
        flat, row, _ = _tok_flat(batch.column(text_col))
        grams, grow = _join_ngrams(flat, row, 2, SEP)
        bvc = pc.value_counts(grams)
        uvc = pc.value_counts(_firsts(flat, row))
        return pa.table({
            "k": pa.concat_arrays([bvc.field("values"), uvc.field("values")]),
            "cnt": pc.cast(pa.concat_arrays([bvc.field("counts"),
                                             uvc.field("counts")]),
                           pa.int64()),
            "kind": pa.array([0] * len(bvc) + [1] * len(uvc), pa.int8()),
        })

    parts = ds.map_batches(census_partial,
                           batch_format="pyarrow").materialize()
    def _of_kind(kind: int):
        return parts.map_batches(
            lambda b, k=kind: b.filter(
                pc.equal(b.column("kind"), k)).select(["k", "cnt"]),
            batch_format="pyarrow")

    bg_counts = sort_block_aggregate(_of_kind(0), "k", {"c": ("cnt", "sum")})
    u_counts = sort_block_aggregate(_of_kind(1), "k", {"c": ("cnt", "sum")})
    if max_bigrams is not None:
        bdf = _top_m_counts(bg_counts, "k", "c", max_bigrams)
        udf = _top_m_counts(u_counts, "k", "c", max_bigrams)
    else:
        bdf = bg_counts.to_pandas()
        udf = u_counts.to_pandas()
    bdf = bdf.sort_values("k")
    udf = udf.sort_values("k")
    # vocab: distinct tokens anywhere — a distributed count, never a
    # driver materialization
    def uni_partial(batch: pa.Table) -> pa.Table:
        flat, _, _ = _tok_flat(batch.column(text_col))
        vals = np.unique(flat) if len(flat) else np.empty(0, object)
        return pa.table({"w": pa.array(vals, pa.string()),
                         "one": pa.array(np.ones(len(vals), np.int64))})
    V = sort_block_aggregate(
        ds.map_batches(uni_partial, batch_format="pyarrow"),
        "w", {"n": ("one", "sum")}).count()

    # broadcast Arrow key arrays + numpy counts: zero-copy from plasma
    # in every map task (a pickled dict of Python strings would
    # re-deserialize per worker)
    lut_ref = ray.put({"bg": pa.array(bdf["k"], pa.string()),
                       "c2": bdf["c"].to_numpy(np.int64),
                       "u": pa.array(udf["k"], pa.string()),
                       "c1": udf["c"].to_numpy(np.int64), "V": V})

    def _lookup(keys: pa.Array, counts: np.ndarray, q: pa.Array) -> np.ndarray:
        """counts for q, 0 when absent (capped censuses have misses) —
        one C++ hash lookup (index_in), no Python strings."""
        if len(keys) == 0 or len(q) == 0:
            return np.zeros(len(q), np.int64)
        idx = pc.index_in(q, value_set=keys)
        iv = idx.to_numpy(zero_copy_only=False)    # float with NaN at miss
        miss = np.isnan(iv)
        return np.where(miss, 0,
                        counts[np.where(miss, 0, iv).astype(np.int64)])

    def score(batch: pa.Table) -> pa.Table:
        lut = ray.get(lut_ref)
        ids = batch.column(id_col)
        flat, row, toklens = _tok_flat(batch.column(text_col))
        lens = np.maximum(toklens - 1, 0)
        grams, _ = _join_ngrams(flat, row, 2, SEP)
        firsts = _firsts(flat, row)
        if lens.sum() == 0:
            return pa.table({id_col: ids.slice(0, 0),
                             "n_bigrams": pa.array([], pa.int64()),
                             "score_u": pa.array([], pa.int64())})
        cc2 = _lookup(lut["bg"], lut["c2"], grams).astype(np.float64)
        cc1 = _lookup(lut["u"], lut["c1"], firsts).astype(np.int64)
        term = np.floor(
            np.float64(1e6) * np.log((cc2 + 1.0) / (cc1 + lut["V"]).astype(
                np.float64))).astype(np.int64)
        bounds = np.concatenate([[0], np.cumsum(lens)])
        sums = np.add.reduceat(term, bounds[:-1][lens > 0]) \
            if len(term) else np.empty(0, np.int64)
        keep = np.flatnonzero(lens > 0)
        return pa.table({
            id_col: ids.take(pa.array(keep)),
            "n_bigrams": pa.array(lens[keep], pa.int64()),
            "score_u": pa.array(sums.astype(np.int64), pa.int64()),
        })

    return ds.map_batches(score, batch_format="pyarrow")


def contamination_check(train_ds, bench_ds, n: int = 8,
                        text_col: str = "text", id_col: str = "doc_id"):
    """Benchmark decontamination: for every training doc, count its
    token n-grams that appear in ANY benchmark doc (docs with hits
    get dropped or flagged before pretraining).

    Scale shape: the benchmark side is SMALL by definition (eval sets)
    — its n-gram set builds in one pass and broadcasts via ``ray.put``
    (as a sorted numpy array: binary-search membership, zero-copy from
    plasma); the training corpus streams through ``map_batches`` and
    never shuffles.  Returns (doc_id, n_ngrams, n_contaminated) for
    every training doc.  Token semantics match token_count."""
    import ray

    def bench_grams(batch: pa.Table) -> pa.Table:
        flat, row, _ = _tok_flat(batch.column(text_col))
        grams, _ = _join_ngrams(flat, row, n)
        return pa.table({"g": pc.unique(grams)})

    parts = [t.column("g").combine_chunks()
             for t in ray.get(bench_ds.map_batches(
                 bench_grams, batch_format="pyarrow").to_arrow_refs())
             if t.num_rows]
    gram_set = (pc.unique(pa.concat_arrays(parts)) if parts
                else pa.array([], pa.string()))
    set_ref = ray.put(gram_set)        # Arrow array: zero-copy per task

    def score(batch: pa.Table) -> pa.Table:
        gs = ray.get(set_ref)
        ids = batch.column(id_col)
        flat, row, toklens = _tok_flat(batch.column(text_col))
        n_g = np.maximum(toklens - (n - 1), 0)
        n_hit = np.zeros(len(n_g), np.int64)
        grams, grow = _join_ngrams(flat, row, n)
        if len(grams) and len(gs):
            hit = pc.is_in(grams, value_set=gs).to_numpy(
                zero_copy_only=False)
            np.add.at(n_hit, grow[hit], 1)
        return pa.table({
            id_col: ids,
            "n_ngrams": pa.array(n_g, pa.int64()),
            "n_contaminated": pa.array(n_hit, pa.int64()),
        })

    return train_ds.map_batches(score, batch_format="pyarrow")


def normalize_text(ds, text_col: str = "text", id_col: str = "doc_id",
                   out: str = "norm"):
    """Canonical text cleanup before dedup/tokenize: lowercase, trim,
    collapse whitespace runs to one space.  Pure map stage (vectorized
    pandas .str kernels), no shuffle; SQL-equivalent to
    ``lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))`` for ASCII
    corpora.  Parity details: the whitespace class is RE2's \\s
    ([\\t\\n\\f\\r ] — Python's \\s additionally matches \\x0b, so the
    class is written out explicitly), NULL stays NULL (SQL semantics),
    and trailing/leading trim removes spaces only (= SQL trim; runs
    were already collapsed to single spaces).  Non-ASCII case folding
    can differ between Python and ICU — pin inputs first."""
    def fn(batch: pa.Table) -> pa.Table:
        # NULL propagates through every Arrow kernel (SQL semantics)
        s = pc.replace_substring_regex(batch.column(text_col),
                                       "[\t\n\f\r ]+", " ")
        n = pc.utf8_lower(pc.utf8_trim(s, " "))
        return pa.table({id_col: batch.column(id_col), out: n})
    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def chunk_documents(ds, max_tokens: int, overlap: int = 0,
                    text_col: str = "text", id_col: str = "doc_id"):
    """Split documents into fixed-token windows with ``overlap`` shared
    tokens between consecutive chunks (stride = max_tokens - overlap) —
    the long-document splitter that feeds context-window-bounded
    training.  Output: one row per chunk (doc_id, start_tok, n_toks,
    chunk_text); a doc with <= max_tokens tokens (including empty)
    emits exactly one chunk; every token is covered and chunk
    boundaries are deterministic functions of the token count, so the
    SQL oracle replays them with generate_series.

    Fully vectorized flat-map: shared Arrow tokenizer, numpy range
    arithmetic for the (possibly overlapping) token windows, one
    pc.take gather + pc.binary_join to materialize chunk texts.  Rows
    multiply by ~n/stride — size downstream batches accordingly."""
    stride = max_tokens - overlap
    if max_tokens <= 0 or overlap < 0 or stride <= 0:
        raise ValueError("need max_tokens > overlap >= 0")

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col)
        flat, _row, lens = _tok_flat(batch.column(text_col))
        nd = len(lens)
        doc_off = np.zeros(nd + 1, np.int64)
        np.cumsum(lens, out=doc_off[1:])
        n_chunks = (np.maximum(lens - overlap, 1) + stride - 1) // stride
        total_c = int(n_chunks.sum())
        doc_idx = np.repeat(np.arange(nd, dtype=np.int64), n_chunks)
        coff = np.zeros(nd + 1, np.int64)
        np.cumsum(n_chunks, out=coff[1:])
        chunk_no = np.arange(total_c, dtype=np.int64) - coff[doc_idx]
        starts = chunk_no * stride
        clen = np.maximum(np.minimum(max_tokens, lens[doc_idx] - starts), 0)
        first = doc_off[doc_idx] + starts
        toff = np.zeros(total_c + 1, np.int64)
        np.cumsum(clen, out=toff[1:])
        take = (np.repeat(first, clen)
                + np.arange(int(toff[-1]), dtype=np.int64)
                - np.repeat(toff[:-1], clen))
        toks = flat.take(pa.array(take, pa.int64()))
        lists = pa.ListArray.from_arrays(
            pa.array(toff, pa.int64()).cast(pa.int32()), toks)
        txt = pc.binary_join(lists, " ")
        return pa.table({
            id_col: ids.take(pa.array(doc_idx, pa.int64())),
            "start_tok": pa.array(starts, pa.int64()),
            "n_toks": pa.array(clen, pa.int64()),
            "chunk_text": txt,
        })

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)
