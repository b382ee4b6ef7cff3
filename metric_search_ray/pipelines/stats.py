"""Distributed statistics operators: exact distinct counts and exact
grouped quantiles.

Neither exists in the reference engine (its aggregates are the
cover-tree accessors, SURVEY.md §2.4); these are the rollup operators
a 100-TB training-data pipeline needs, built scale-first:

* ``distinct_count`` — exact COUNT(DISTINCT value) per key without a
  per-key set: per-block dedupe inside ``map_batches`` (shrinks the
  exchange before it happens), ONE global sort on (key, value) with
  per-block vectorized dedupe (fastagg), then a per-key row count.
  The shuffle carries distinct (key, value) pairs only — skew-safe in
  the value dimension because hot duplicated values collapse map-side.

* ``grouped_quantiles`` — exact ``quantile_disc`` per key for columns
  with BOUNDED distinct values (grades, integer quantities, enum-ish
  measures): a distributed (key, value) census (map-side partial
  counts, combine by sum), then a driver-side cumulative walk over the
  census — O(#keys x #distinct) driver work, independent of row count.
  For unbounded continuous columns use a histogram refinement or
  sketch instead (not this operator); the census size is the documented
  contract.

DuckDB ``quantile_disc`` semantics (verified empirically): the sorted
element at index ``ceil(q*n) - 1`` (0-based, clamped at 0).  The index
is computed in exact rational arithmetic here (``Fraction``) so float
rounding of q*n can never pick a neighbouring element.
"""

from __future__ import annotations

from fractions import Fraction

import numpy as np
import pandas as pd
import pyarrow as pa

from .fastagg import sort_block_aggregate


def _keylist(key) -> list[str]:
    return [key] if isinstance(key, str) else list(key)


def distinct_count(ds, key, value_col: str, out: str = "n_distinct"):
    """Exact per-key COUNT(DISTINCT value_col) as a Dataset."""
    keys = _keylist(key)
    cols = keys + [value_col]

    def block_unique(batch: pa.Table) -> pa.Table:
        # per-block dedupe: one C++ hash group-by, no aggregates.
        # NULL values drop first — COUNT(DISTINCT) ignores them.
        t = batch.select(cols).drop_null()
        return t.group_by(cols, use_threads=False).aggregate([])

    pairs = ds.map_batches(block_unique, batch_format="pyarrow")
    # global dedupe: after the sort all copies of a (key, value) pair are
    # contiguous; fastagg's count collapses them (edge-healed, exact)
    distinct = sort_block_aggregate(pairs, cols, {"_n": (None, "count")})
    return sort_block_aggregate(distinct, keys, {out: (None, "count")})


def grouped_percent_rank(ds, key, value_col: str, out: str = "pr"):
    """Exact per-row percent_rank() OVER (PARTITION BY key ORDER BY
    value) for bounded-distinct value columns, WITHOUT a global sort:
    a distributed (key, value) census (one small exchange), a
    driver-built lookup of per-(key, value) smaller-counts (bounded by
    #keys x #distinct — same contract as grouped_quantiles), broadcast
    once via ray.put, then a map-side vectorized lookup per row.
    Matches SQL: pr = (#rows with smaller value in the key) / (n_key-1),
    0.0 for single-row keys.  NULL keys or values are REJECTED (raise):
    a NULL would become NaN in the broadcast numpy LUT and searchsorted
    against NaN returns arbitrary indices — wrong ranks for the whole
    key, silently.  Filter or fill NULLs upstream."""
    import ray

    keys = _keylist(key)
    if len(keys) != 1:
        raise ValueError("grouped_percent_rank supports a single key column")
    kc = keys[0]
    cols = keys + [value_col]

    def block_census(batch: pa.Table) -> pa.Table:
        for c in cols:
            if batch.column(c).null_count:
                raise ValueError(
                    f"grouped_percent_rank: NULL in {c!r} is unsupported "
                    "(would corrupt the searchsorted LUT) — drop or fill "
                    "NULLs upstream")
        gb = (batch.select(cols).group_by(cols, use_threads=False)
              .aggregate([([], "count_all")]))
        return gb.rename_columns(cols + ["cnt"])

    partial = ds.map_batches(block_census, batch_format="pyarrow")
    census_ds = sort_block_aggregate(partial, cols, {"n": ("cnt", "sum")})
    census = pa.concat_tables(
        [t for t in ray.get(census_ds.to_arrow_refs()) if t.num_rows]
    ).to_pandas().sort_values(cols)
    grp = census.groupby(kc, sort=True)
    census["smaller"] = (grp["n"].cumsum() - census["n"]).astype(np.int64)
    census["n_key"] = grp["n"].transform("sum").astype(np.int64)
    # census is already sorted by (key, value) — put it sorted so the
    # hot map path does a pure binary search, no per-batch re-sort
    lut_ref = ray.put({
        kc: census[kc].to_numpy(),
        "v": census[value_col].to_numpy(),
        "smaller": census["smaller"].to_numpy(),
        "n_key": census["n_key"].to_numpy(),
    })

    def add_pr(batch: pa.Table) -> pa.Table:
        lut = ray.get(lut_ref)
        import numpy as _np
        ck, cv = lut[kc], lut["v"]
        sm, nk = lut["smaller"], lut["n_key"]
        bk = batch.column(kc).to_numpy(zero_copy_only=False)
        bv = batch.column(value_col).to_numpy(zero_copy_only=False)
        # rows of one key are contiguous in the census; offset within
        # the key by value
        out_pr = _np.empty(len(bk), _np.float64)
        for kval in _np.unique(bk):          # #distinct keys per batch, small
            m = bk == kval
            lo = int(_np.searchsorted(ck, kval, side="left"))
            hi = int(_np.searchsorted(ck, kval, side="right"))
            idx = lo + _np.searchsorted(cv[lo:hi], bv[m])
            n1 = nk[idx] - 1
            out_pr[m] = _np.where(n1 > 0, sm[idx] / _np.maximum(n1, 1), 0.0)
        return batch.append_column(out, pa.array(out_pr, pa.float64()))

    return ds.map_batches(add_pr, batch_format="pyarrow")


def grouped_zscore(ds, key, value_col: str, out: str = "z"):
    """Per-row z-score within the key group for INTEGER-VALUED measure
    columns, in two streaming passes: a small grouped (n, sum, sumsq)
    aggregate in exact int64 (map-side partials via fastagg), broadcast
    once, then a map-side transform.  Because the moments are exact
    integers and the float expression is evaluated in one fixed order —
    mean = sum/n; var = (ss - sum*sum/n)/(n-1); z = (v-mean)/sqrt(var)
    — the result is bit-equal to the same SQL expression (n==1 or
    var==0 groups map to z=0)."""
    import ray

    keys = _keylist(key)
    if len(keys) != 1:
        raise ValueError("grouped_zscore supports a single key column")
    kc = keys[0]
    cols = keys + [value_col]

    def block_moments(batch: pa.Table) -> pa.Table:
        t = batch.select(cols)
        for c in cols:
            if t.column(c).null_count:
                raise ValueError(
                    f"grouped_zscore: NULL in {c!r} is unsupported — "
                    "drop or fill NULLs upstream")
        v = t.column(value_col).to_numpy(zero_copy_only=False).astype(np.int64)
        t = (t.drop_columns([value_col])
             .append_column("_v", pa.array(v, pa.int64()))
             .append_column("_v2", pa.array(v * v, pa.int64())))
        gb = (t.group_by(keys, use_threads=False)
              .aggregate([([], "count_all"), ("_v", "sum"), ("_v2", "sum")]))
        return gb.rename_columns(keys + ["cnt", "s", "ss"])

    partial = ds.map_batches(block_moments, batch_format="pyarrow")
    moments_ds = sort_block_aggregate(
        partial, keys, {"n": ("cnt", "sum"), "s": ("s", "sum"),
                        "ss": ("ss", "sum")})
    moments = pa.concat_tables(
        [t for t in ray.get(moments_ds.to_arrow_refs()) if t.num_rows]
    ).to_pandas().sort_values(keys)
    # broadcast pre-sorted by key: the map path binary-searches only
    lut_ref = ray.put({k: moments[k].to_numpy() for k in keys} |
                      {c: moments[c].to_numpy() for c in ("n", "s", "ss")})

    def add_z(batch: pa.Table) -> pa.Table:
        lut = ray.get(lut_ref)
        ck = lut[kc]
        n = lut["n"].astype(np.float64)
        s = lut["s"].astype(np.float64)
        ss = lut["ss"].astype(np.float64)
        bk = batch.column(kc).to_numpy(zero_copy_only=False)
        bv = batch.column(value_col).to_numpy(zero_copy_only=False).astype(
            np.float64)
        idx = np.searchsorted(ck, bk)
        mean = s[idx] / n[idx]
        with np.errstate(invalid="ignore", divide="ignore"):
            var = (ss[idx] - s[idx] * s[idx] / n[idx]) / (n[idx] - 1.0)
            z = (bv - mean) / np.sqrt(var)
        z = np.where((n[idx] == 1.0) | (var == 0.0), 0.0, z)
        return batch.append_column(out, pa.array(z, pa.float64()))

    return ds.map_batches(add_z, batch_format="pyarrow")


def quantile_disc_index(q: Fraction | float, n: int) -> int:
    """DuckDB quantile_disc: 0-based sorted index = max(0, ceil(q*n)-1)."""
    qf = Fraction(q).limit_denominator(10**9) if not isinstance(q, Fraction) else q
    return max(0, -((-qf.numerator * n) // qf.denominator) - 1)


def histogram(ds, value_col: str, lo: float, hi: float, bins: int):
    """Fixed-width histogram of a numeric column as (bin, n) rows:
    per-block ``np.bincount`` partials, one tiny driver combine —
    O(bins) output regardless of row count, no shuffle.  Bin index is
    floor((v - lo) / width) clipped to the last bin at v == hi; rows
    outside [lo, hi] (and NULL/NaN) are dropped.  The same expression
    evaluates in SQL, so results hash-match bit-exactly."""
    import ray

    if bins <= 0 or not hi > lo:
        raise ValueError("need bins > 0 and hi > lo")
    width = (hi - lo) / bins

    def partial(batch: pa.Table) -> pa.Table:
        v = batch.column(value_col).to_numpy(zero_copy_only=False).astype(
            np.float64, copy=False)
        v = v[(v >= lo) & (v <= hi)]
        if len(v) == 0:
            return pa.table({"bin": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        idx = np.minimum(((v - lo) / width).astype(np.int64), bins - 1)
        c = np.bincount(idx, minlength=bins)
        nz = np.flatnonzero(c)
        return pa.table({"bin": pa.array(nz, pa.int64()),
                         "n": pa.array(c[nz], pa.int64())})

    total = np.zeros(bins, np.int64)
    for t in ray.get(ds.map_batches(partial, batch_format="pyarrow")
                     .to_arrow_refs()):
        if t.num_rows:
            np.add.at(total, t.column("bin").to_numpy(),
                      t.column("n").to_numpy())
    nz = np.flatnonzero(total)
    return pd.DataFrame({"bin": nz.astype(np.int64), "n": total[nz]})


def exact_quantile_histogram(ds, value_col: str, probs: list[float],
                             bins: int = 65536,
                             refine_limit: int = 262144) -> dict[float, float]:
    """Exact global quantile_disc for UNBOUNDED continuous columns —
    the scale path where a census would explode and a global sort is
    an all-to-all shuffle:

    1. one distributed min/max pass;
    2. one fixed-width histogram pass (per-block ``np.bincount``
       partials, nonzero (bin, count) pairs to the driver — bounded by
       ``bins`` x #blocks, independent of row count);
    3. for each requested rank, histogram-RECURSE into the one bin
       holding it until the bin population <= ``refine_limit``, then
       fetch just that bin's values and take the exact order statistic.

    Bin membership at every level is the SAME floor((v-lo)/width)
    expression for counting, refining and fetching (a selector chain
    of bin-index equalities), so counted and fetched populations agree
    bit-for-bit — no range-compare/floor mismatch at bin edges.  NULL
    and NaN rows are excluded (SQL quantile semantics); ranks are
    computed over the non-null count.  Every pass streams; no shuffle.
    Degenerate convergence (>refine_limit rows sharing one float
    value) short-circuits via a relative-epsilon width check.
    """
    import ray
    from ray.data.aggregate import Max, Min

    agg = ds.aggregate(Min(value_col), Max(value_col))
    vmin, vmax = float(agg[f"min({value_col})"]), float(agg[f"max({value_col})"])
    if not np.isfinite(vmin) or not np.isfinite(vmax):
        raise ValueError("exact_quantile_histogram needs finite min/max")
    if vmin == vmax:
        return {p: vmin for p in probs}

    def chain_mask(v: np.ndarray, levels) -> np.ndarray:
        m = (v >= vmin) & (v <= vmax)        # also drops NaN/null
        for lo, hi, b in levels:
            w = (hi - lo) / bins
            idx = np.minimum(((v - lo) / w).astype(np.int64), bins - 1)
            m &= idx == b
        return m

    def hist_counts(levels, lo, hi):
        width = (hi - lo) / bins

        def partial(batch: pa.Table) -> pa.Table:
            v = batch.column(value_col).to_numpy(zero_copy_only=False).astype(
                np.float64, copy=False)
            v = v[chain_mask(v, levels)]
            if len(v) == 0:
                return pa.table({"bin": pa.array([], pa.int64()),
                                 "cnt": pa.array([], pa.int64())})
            idx = np.minimum(((v - lo) / width).astype(np.int64), bins - 1)
            c = np.bincount(idx, minlength=bins)
            nz = np.flatnonzero(c)
            return pa.table({"bin": pa.array(nz, pa.int64()),
                             "cnt": pa.array(c[nz], pa.int64())})

        parts = ds.map_batches(partial, batch_format="pyarrow")
        total = np.zeros(bins, np.int64)
        for t in ray.get(parts.to_arrow_refs()):
            if t.num_rows:
                np.add.at(total, t.column("bin").to_numpy(),
                          t.column("cnt").to_numpy())
        return total

    base_hist = hist_counts([], vmin, vmax)
    n_total = int(base_hist.sum())          # non-null, in-range rows
    if n_total == 0:
        return {}

    out: dict[float, float] = {}
    for p in probs:
        kth = quantile_disc_index(p, n_total) + 1      # 1-based rank
        levels: list[tuple[float, float, int]] = []
        lo, hi, hist, skip = vmin, vmax, base_hist, 0
        while True:
            cum = np.cumsum(hist)
            b = int(np.searchsorted(cum, kth - skip))
            blo = lo + (hi - lo) / bins * b
            bhi = lo + (hi - lo) / bins * (b + 1) if b < bins - 1 else hi
            pop = int(hist[b])
            rank_in_bin = kth - skip - int(cum[b - 1] if b else 0)
            converged = (bhi - blo) <= max(abs(blo), abs(bhi), 1e-300) * 2**-50
            if pop <= refine_limit or converged:
                break
            skip += int(cum[b - 1] if b else 0)
            levels.append((lo, hi, b))
            lo, hi = blo, bhi
            hist = hist_counts(levels, lo, hi)
        # fetch exactly the winning bin's values — same selector chain
        sel = levels + [(lo, hi, b)]
        vals_refs = ds.map_batches(
            lambda t, sel=sel: pa.table({
                "v": pa.array(
                    (lambda v: v[chain_mask(v, sel)])(
                        t.column(value_col).to_numpy(zero_copy_only=False)
                        .astype(np.float64, copy=False)),
                    pa.float64())}),
            batch_format="pyarrow").to_arrow_refs()
        vals = np.concatenate(
            [t.column("v").to_numpy() for t in ray.get(vals_refs)] or
            [np.empty(0)])
        vals.sort()
        out[p] = float(vals[rank_in_bin - 1])
    return out


def grouped_quantiles(ds, key, value_col: str, probs: list[float],
                      prefix: str = "p") -> pd.DataFrame:
    """Exact per-key quantile_disc for bounded-distinct value columns.

    Returns a pandas DataFrame: key columns + one ``{prefix}{q*100}``
    column per prob.  Driver memory is O(#keys x #distinct values) —
    the caller asserts that bound, not this function.
    """
    import ray

    keys = _keylist(key)
    cols = keys + [value_col]

    def block_census(batch: pa.Table) -> pa.Table:
        gb = (batch.select(cols).group_by(cols, use_threads=False)
              .aggregate([([], "count_all")]))
        return gb.rename_columns(cols + ["cnt"])

    partial = ds.map_batches(block_census, batch_format="pyarrow")
    census_ds = sort_block_aggregate(partial, cols, {"n": ("cnt", "sum")})
    census = pa.concat_tables(
        [t for t in ray.get(census_ds.to_arrow_refs()) if t.num_rows]
    ).to_pandas()

    qfracs = [Fraction(p).limit_denominator(10**9) for p in probs]
    names = [f"{prefix}{int(p * 100) if (p * 100) == int(p * 100) else p}"
             for p in probs]
    rows = []
    for kv, g in census.groupby(keys, sort=True):
        g = g.sort_values(value_col)
        vals = g[value_col].to_numpy()
        cum = g["n"].to_numpy().cumsum()
        n = int(cum[-1])
        row = dict(zip(keys, kv if isinstance(kv, tuple) else (kv,)))
        for q, name in zip(qfracs, names):
            idx = quantile_disc_index(q, n)
            row[name] = vals[np.searchsorted(cum, idx + 1)]
        rows.append(row)
    return pd.DataFrame(rows, columns=keys + names)
