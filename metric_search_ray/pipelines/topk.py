"""Group-wise top-k (the SQL ``row_number() OVER (PARTITION BY g
ORDER BY v) <= k`` window) without per-group Python.

Same shape as fastagg.sort_block_aggregate: ONE global sort on
(group keys..., order column, tiebreak id) — the exchange any exact
grouped ranking needs — then a vectorized per-BLOCK rank pass.  After
the sort a group's rows are globally contiguous, so only a block's
FIRST and LAST group can span block edges; interior groups' local
ranks are exact.  Edge-group candidates (at most 2 groups x k rows
per block, independent of group count or corpus size) are re-ranked
in one bounded driver pass.

Determinism: ties on the order column are broken by ``id_col`` (both
in the sort and the re-rank), so the selected rows — not just their
count — are reproducible across runs and parallelism levels.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _group_starts(*cols: np.ndarray) -> np.ndarray:
    n = len(cols[0])
    if n == 0:
        return np.empty(0, np.int64)
    change = np.zeros(n, bool)
    change[0] = True
    for c in cols:
        change[1:] |= c[1:] != c[:-1]
    return np.flatnonzero(change)


def grouped_top_k(ds, keys: list[str] | str, order_col: str, k: int,
                  id_col: str, descending: bool = True):
    """Top-``k`` rows per group of ``keys``, ordered by ``order_col``
    (desc by default), ties broken by ``id_col``.  Returns the input
    columns plus ``rank`` (1-based)."""
    import ray

    keys = [keys] if isinstance(keys, str) else list(keys)
    sort_cols = keys + [order_col, id_col]
    desc = [False] * len(keys) + [descending, False]
    out_cols = None  # filled on first batch

    def block_rank(batch: pa.Table) -> pa.Table:
        cols = [batch.column(c).to_numpy(zero_copy_only=False) for c in keys]
        n = batch.num_rows
        if n == 0:
            return (batch.append_column("rank", pa.array([], pa.int64()))
                         .append_column("_edge", pa.array([], pa.bool_())))
        starts = _group_starts(*cols)
        sizes = np.diff(np.append(starts, n))
        local = np.arange(n, dtype=np.int64) - np.repeat(starts, sizes)
        is_first = np.ones(n, bool)
        is_last = np.ones(n, bool)
        for c in cols:
            is_first &= c == c[0]
            is_last &= c == c[-1]
        edge = is_first | is_last
        # interior groups: local rank IS the global rank (contiguity);
        # edge groups: the first k rows per block form an exact superset
        # of the group's global top-k (a row with <= k-1 predecessors
        # globally has <= k-1 in its own block)
        keep = local < k
        sub = batch.filter(pa.array(keep))
        return (sub.append_column("rank", pa.array(local[keep] + 1, pa.int64()))
                   .append_column("_edge", pa.array(edge[keep], pa.bool_())))

    parts = (ds.sort(sort_cols, descending=desc)
               .map_batches(block_rank, batch_size=None,
                            batch_format="pyarrow")
               .materialize())
    finals = parts.map_batches(
        lambda b: b.filter(pc.invert(b.column("_edge"))).drop_columns(["_edge"]),
        batch_format="pyarrow")
    edge_tbls = [t for t in ray.get(
        parts.map_batches(lambda b: b.filter(b.column("_edge")),
                          batch_format="pyarrow").to_arrow_refs())
        if t.num_rows]
    if not edge_tbls:
        return finals
    healed = pa.concat_tables(edge_tbls).combine_chunks()
    # bounded driver re-rank (<= 2 groups x k rows per block): global
    # order within a group = (order_col desc?, id_col); groups keyed on
    # the key tuple
    sort_np = [healed.column(id_col).to_numpy(zero_copy_only=False)]
    ov = healed.column(order_col).to_numpy(zero_copy_only=False)
    if descending and not np.issubdtype(ov.dtype, np.number):
        raise TypeError("descending grouped_top_k needs a numeric order column")
    if np.issubdtype(ov.dtype, np.floating) and np.isnan(ov).any():
        raise ValueError("grouped_top_k: NaN order values are unsupported "
                         "(their sort position would differ between the "
                         "distributed sort and the driver re-rank)")
    if descending:
        # dense-rank then negate — np.negative on unsigned ints WRAPS
        # (0 stays smallest) and can overflow int64 min; ranks are
        # always small non-negative ints, ties collapse to one rank so
        # the id tiebreak below still applies
        _, inv = np.unique(ov, return_inverse=True)
        sort_np.append(-inv.astype(np.int64))
    else:
        sort_np.append(ov)
    kcols = [healed.column(c).to_numpy(zero_copy_only=False) for c in keys]
    order = np.lexsort(tuple(reversed(kcols + [sort_np[1], sort_np[0]])))
    # after lexsort: grouped by keys, ordered by (order, id) within
    g = [c[order] for c in kcols]
    starts = _group_starts(*g)
    sizes = np.diff(np.append(starts, len(order)))
    local = np.arange(len(order), dtype=np.int64) - np.repeat(starts, sizes)
    keep = local < k
    sel = healed.take(pa.array(order[keep]))
    sel = sel.drop_columns(["rank", "_edge"]).append_column(
        "rank", pa.array(local[keep] + 1, pa.int64()))
    import ray.data as rd
    return finals.union(rd.from_arrow(sel))
