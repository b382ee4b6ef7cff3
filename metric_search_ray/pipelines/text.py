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

STOPWORDS = ("the", "a", "of", "and", "to")

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
        s = pd.Series(batch.column(text_col).to_pylist())
        n = s.fillna("").str.strip().str.split(r"\s+").map(
            lambda t: 0 if t == [""] else len(t))
        return pa.table({id_col: batch.column(id_col),
                         "n_tokens": pa.array(n.to_numpy(np.int64), pa.int64())})
    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def bpe_ish_token_count(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Regex token count approximating BPE pre-tokenization (GPT-2-style
    split on words / numbers / punctuation runs) — one vectorized
    str.count pass, no per-doc findall."""
    def fn(batch: pa.Table) -> pa.Table:
        s = pd.Series(batch.column(text_col).to_pylist()).fillna("")
        n = s.str.count(r"[A-Za-z]+|\d+|[^\sA-Za-z\d]+").to_numpy(np.int64)
        return pa.table({id_col: batch.column(id_col),
                         "n_bpe_tokens": pa.array(n, pa.int64())})
    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def quality_score(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Per-doc quality features: n_chars, n_words, avg word length,
    stopword ratio, punctuation ratio + a combined [0,1] score."""
    def fn(batch: pa.Table) -> pa.Table:
        texts = [t or "" for t in batch.column(text_col).to_pylist()]
        s = pd.Series(texts)
        n_chars = s.str.len().to_numpy(np.int64)
        words = s.str.strip().str.split(r"\s+")
        n_words = words.map(lambda t: 0 if t == [""] else len(t)).to_numpy(np.int64)
        sw = words.map(lambda t: sum(1 for w in t if w.lower() in STOPWORDS)).to_numpy(np.int64)
        punct = s.str.count(r"[^\w\s]").to_numpy(np.int64)
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
        self.markers = {k: frozenset(v) for k, v in LANG_MARKERS.items()}

    def __call__(self, batch: pa.Table) -> pa.Table:
        s = pd.Series([t or "" for t in batch.column("text").to_pylist()])
        n_rows = len(s)
        n_chars = s.str.len().to_numpy(np.int64)
        cjk = s.str.count(r"[一-鿿]").to_numpy(np.int64)
        toks = s.str.lower().str.split()
        n_toks = toks.map(len).to_numpy(np.int64)
        # per-language marker counts via one explode + isin per language
        flat = toks.explode()
        idx = flat.index.to_numpy()
        order = ["en", "de", "fr", "es"]
        counts = np.zeros((n_rows, len(order)), np.int64)
        for li, lang in enumerate(order):
            hit = flat.isin(self.markers[lang]).to_numpy()
            np.add.at(counts[:, li], idx[hit], 1)
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
        s = pd.Series(batch.column(text_col).to_pylist()).fillna("")
        if lowercase:
            s = s.str.lower()
        toks = s.str.split().explode().dropna()
        vals, cnt = np.unique(toks.to_numpy(dtype=object), return_counts=True) \
            if len(toks) else (np.empty(0, object), np.empty(0, np.int64))
        return pa.table({"token": pa.array(vals, pa.string()),
                         "partial_n": pa.array(cnt, pa.int64())})

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

    One vectorized pandas ``str.count`` + ``str.replace`` pass per
    pattern per batch (compiled regex, C loop) — no per-row Python.
    Stateless map stage: embarrassingly parallel, shuffle-free."""
    import re as _re
    compiled = [(tag, _re.compile(pat)) for tag, pat in PII_PATTERNS]

    def fn(batch: pa.Table) -> pa.Table:
        s = pd.Series(batch.column(text_col).to_pylist()).fillna("")
        n = np.zeros(len(s), np.int64)
        for tag, rx in compiled:
            n += s.str.count(rx).to_numpy(np.int64)
            s = s.str.replace(rx, f"[{tag}]", regex=True)
        return pa.table({id_col: batch.column(id_col),
                         "clean_text": pa.array(s.tolist(), pa.string()),
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

    def _toks(batch: pa.Table):
        s = pd.Series(batch.column(text_col).to_pylist()).fillna("")
        toks = s.str.strip().str.split(r"\s+")
        lens = toks.map(lambda t: 0 if t == [""] else len(t)).to_numpy(np.int64)
        flat = (np.concatenate([t for t in toks.to_list() if t != [""]])
                if lens.sum() else np.empty(0, object))
        row = np.repeat(np.arange(len(s)), lens)
        return flat, row, lens

    def census(batch: pa.Table) -> pa.Table:
        flat, row, lens = _toks(batch)
        df = np.empty(len(terms), np.int64)
        for j, t in enumerate(terms):
            hit = row[flat == t]
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
        flat, row, lens = _toks(batch)
        n = len(lens)
        sc = np.zeros(n, np.float64)
        norm = k1 * (1.0 - b + b * lens / avgdl)
        for j, t in enumerate(terms):
            tf = np.bincount(row[flat == t], minlength=n).astype(np.float64)
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
        s = pd.Series(batch.column(text_col).to_pylist()).fillna("")
        toks = s.str.strip().str.split(r"\s+")
        lens = toks.map(lambda t: 0 if t == [""] else len(t)).to_numpy(np.int64)
        n = len(s)
        flat = (np.concatenate([t for t in toks.to_list() if t != [""]])
                if lens.sum() else np.empty(0, object))
        row = np.repeat(np.arange(n), lens)
        vocab, codes = (np.unique(flat, return_inverse=True)
                        if len(flat) else (np.empty(0, object),
                                           np.empty(0, np.int64)))
        V = np.int64(max(len(vocab), 1))
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


def bigram_lm_score(ds, text_col: str = "text", id_col: str = "doc_id"):
    """CCNet-style language-model quality score: add-one-smoothed
    bigram log-likelihood of each doc under the corpus's own bigram
    counts (the perplexity-filter stage of a training-data pipeline).

    Two passes:
    1. bigram census — one distributed grouped count (fastagg) over
       (w1, w2) pairs; unigram first-position counts and the vocab size
       derive from it.  CONTRACT: the census must fit the object store
       (bounded vocab); for open-vocab web corpora train the counts on
       a sample or cap to top-M bigrams first.
    2. scoring — census broadcast once (ray.put, sorted-array binary
       search), then a vectorized map over docs.

    Each bigram contributes floor(1e6 * ln((c2+1)/(c1+V))) as int64, so
    the per-doc SUM is order-independent and replayable in SQL exactly
    (float sums would hash-mismatch across reduction orders).  Docs
    with fewer than 2 tokens emit no row.  Returns
    (doc_id, n_bigrams, score_u)."""
    import ray

    from .fastagg import sort_block_aggregate

    SEP = " "       # tokens are whitespace-split, so space is unambiguous

    def _toks(batch: pa.Table) -> list[list[str]]:
        s = pd.Series(batch.column(text_col).to_pylist())
        return [t if t != [""] else []
                for t in s.fillna("").str.strip().str.split(r"\s+")]

    def census_partial(batch: pa.Table) -> pa.Table:
        big: list[str] = []
        for toks in _toks(batch):
            big.extend(toks[i] + SEP + toks[i + 1]
                       for i in range(len(toks) - 1))
        if not big:
            return pa.table({"bg": pa.array([], pa.string()),
                             "cnt": pa.array([], pa.int64())})
        vals, cnt = np.unique(np.asarray(big, object), return_counts=True)
        return pa.table({"bg": pa.array(vals, pa.string()),
                         "cnt": pa.array(cnt, pa.int64())})

    parts = ds.map_batches(census_partial, batch_format="pyarrow")
    census_ds = sort_block_aggregate(parts, "bg", {"c": ("cnt", "sum")})
    census = pa.concat_tables(
        [t for t in ray.get(census_ds.to_arrow_refs()) if t.num_rows])
    bg = np.asarray(census.column("bg").to_pylist(), object)
    c2 = census.column("c").to_numpy()
    w1 = np.asarray([b.split(SEP, 1)[0] for b in bg], object)
    # unigram first-position counts: sum of bigram counts per w1
    u_vals, u_inv = np.unique(w1, return_inverse=True)
    c1 = np.zeros(len(u_vals), np.int64)
    np.add.at(c1, u_inv, c2)
    # vocab: distinct tokens anywhere (firsts + last tokens); compute
    # distributed to keep the contract honest
    def uni_partial(batch: pa.Table) -> pa.Table:
        toks = [w for ts in _toks(batch) for w in ts]
        vals = np.unique(np.asarray(toks, object)) if toks else np.empty(0, object)
        return pa.table({"w": pa.array(vals, pa.string()),
                         "one": pa.array(np.ones(len(vals), np.int64))})
    vocab_ds = sort_block_aggregate(
        ds.map_batches(uni_partial, batch_format="pyarrow"),
        "w", {"n": ("one", "sum")})
    V = sum(t.num_rows for t in ray.get(vocab_ds.to_arrow_refs()))

    order = np.argsort(bg, kind="stable")
    lut_ref = ray.put({"bg": bg[order], "c2": c2[order],
                       "u": u_vals, "c1": c1, "V": V})

    def score(batch: pa.Table) -> pa.Table:
        lut = ray.get(lut_ref)
        ids = batch.column(id_col)
        out_id, out_n, out_s = [], [], []
        toks_list = _toks(batch)
        doc_big, doc_first, lens = [], [], []
        for toks in toks_list:
            n = max(len(toks) - 1, 0)
            lens.append(n)
            doc_big.extend(toks[i] + SEP + toks[i + 1] for i in range(n))
            doc_first.extend(toks[:n])
        if sum(lens) == 0:
            return pa.table({id_col: ids.slice(0, 0),
                             "n_bigrams": pa.array([], pa.int64()),
                             "score_u": pa.array([], pa.int64())})
        ab = np.asarray(doc_big, object)
        af = np.asarray(doc_first, object)
        i2 = np.searchsorted(lut["bg"], ab)
        i1 = np.searchsorted(lut["u"], af)
        cc2 = lut["c2"][i2].astype(np.float64)
        cc1 = lut["c1"][i1].astype(np.int64)
        term = np.floor(
            np.float64(1e6) * np.log((cc2 + 1.0) / (cc1 + lut["V"]).astype(
                np.float64))).astype(np.int64)
        bounds = np.cumsum([0] + lens)
        sums = np.add.reduceat(term, bounds[:-1][np.asarray(lens) > 0]) \
            if len(term) else np.empty(0, np.int64)
        keep = np.flatnonzero(np.asarray(lens) > 0)
        return pa.table({
            id_col: ids.take(pa.array(keep)),
            "n_bigrams": pa.array(np.asarray(lens, np.int64)[keep], pa.int64()),
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

    def _toks(batch: pa.Table) -> list[list[str]]:
        s = pd.Series(batch.column(text_col).to_pylist())
        return [t if t != [""] else []
                for t in s.fillna("").str.strip().str.split(r"\s+")]

    def bench_grams(batch: pa.Table) -> pa.Table:
        grams: list[str] = []
        for toks in _toks(batch):
            grams.extend(" ".join(toks[i:i + n])
                         for i in range(len(toks) - n + 1))
        vals = (np.unique(np.asarray(grams, object)) if grams
                else np.empty(0, object))
        return pa.table({"g": pa.array(vals, pa.string())})

    parts = [t.column("g").to_numpy(zero_copy_only=False)
             for t in ray.get(bench_ds.map_batches(
                 bench_grams, batch_format="pyarrow").to_arrow_refs())
             if t.num_rows]
    gram_set = (np.unique(np.concatenate(parts)) if parts
                else np.empty(0, object))
    set_ref = ray.put(gram_set)

    def score(batch: pa.Table) -> pa.Table:
        gs = ray.get(set_ref)
        ids = batch.column(id_col)
        n_g, n_hit = [], []
        for toks in _toks(batch):
            grams = [" ".join(toks[i:i + n])
                     for i in range(len(toks) - n + 1)]
            n_g.append(len(grams))
            if grams and len(gs):
                a = np.asarray(grams, object)
                pos = np.searchsorted(gs, a)
                pos = np.minimum(pos, len(gs) - 1)
                n_hit.append(int((gs[pos] == a).sum()))
            else:
                n_hit.append(0)
        return pa.table({
            id_col: ids,
            "n_ngrams": pa.array(np.asarray(n_g, np.int64), pa.int64()),
            "n_contaminated": pa.array(np.asarray(n_hit, np.int64), pa.int64()),
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
        s = pd.Series(batch.column(text_col).to_pylist())
        n = (s.str.replace("[\t\n\f\r ]+", " ", regex=True)
             .str.strip(" ").str.lower())
        return pa.table({id_col: batch.column(id_col),
                         out: pa.array(n.to_numpy(object), pa.string())})
    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)
