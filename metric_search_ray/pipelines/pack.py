"""Sequence packing: group documents into fixed token-budget training
sequences.

The LLM-training operator that turns a tokenized corpus into context
windows: iterate docs in a deterministic order, accumulate token
counts, start a new pack when the budget would overflow (greedy
first-fit in order; an oversized doc occupies a pack alone).  The
reference engine has nothing comparable — semantics here are the
standard greedy packing used by large-scale pretraining pipelines.

Scale shape (the sort + per-block + boundary-heal pattern of
``fastagg.sort_block_aggregate``, adapted to a SEQUENTIAL heal):
packing is sequential WITHIN a group and embarrassingly parallel
ACROSS groups.  One global sort on (group, id) makes every group's
rows globally contiguous; each block then packs its COMPLETE group
runs (those not touching a block edge) in parallel, and the runs that
span block edges are packed by a sequential per-block carry chain of
Ray tasks whose state is three scalars (group, open pack id, open pack
fill).  A corpus-wide single group therefore degrades to a
bounded-memory pipeline of per-block tasks — sequential in time (the
greedy recurrence is inherently serial) but never a single straggler
task holding every row.  The edge chain is ONE sequential task chain
across all blocks (each edge task only holds its block's first/last
runs, so the chain's work is tiny next to the parallel interior wave;
breaking the chain at carry-group changes would let unrelated blocks'
edge tasks overlap, at the cost of the driver inspecting every edge
table's groups — not done).  Only two int64 columns and the group key
shuffle; the text never moves.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def greedy_pack_ids(n_tokens: np.ndarray, budget: int) -> np.ndarray:
    """Pack ids (0-based, consecutive) for docs in the given order.

    Rule: doc i joins the current pack unless that would push the
    pack's token sum over ``budget``; then it starts the next pack.
    A doc with n_tokens > budget gets a pack of its own.
    """
    n = len(n_tokens)
    if n == 0:
        return np.empty(0, np.int64)
    cum = np.cumsum(n_tokens, dtype=np.int64)
    starts = [0]
    i, base = 0, 0
    while True:
        j = int(np.searchsorted(cum, base + budget, side="right"))
        if j <= i:                       # oversized doc: its own pack
            j = i + 1
        if j >= n:
            break
        starts.append(j)
        base = int(cum[j - 1])
        i = j
    pack = np.zeros(n, np.int64)
    pack[starts[1:]] = 1
    return np.cumsum(pack)


def greedy_pack_continue(n_tokens: np.ndarray, budget: int,
                         fill: int, base: int):
    """Pack ids for a run CONTINUING an open pack: the pack ``base``
    already holds ``fill`` tokens from earlier rows of the same group.
    Returns ``(pack_ids, open_pack_id, open_fill)`` — the run's last
    pack stays open for a possible continuation in the next block.

    ``fill < 0`` means NO pack is open yet (fresh group): plain
    greedy, ids offset by ``base``.  ``fill == 0`` means the open pack
    holds docs whose tokens sum to zero — that pack EXISTS, so an
    oversized next doc must start a new pack exactly as the unsplit
    greedy would (the old ``fill <= 0`` conflation re-used the open
    pack there, making pack ids depend on where Ray cut the blocks).
    """
    n = len(n_tokens)
    if n == 0:
        return np.empty(0, np.int64), base, fill
    if fill < 0:
        ids = greedy_pack_ids(n_tokens, budget) + base
    else:
        cum = np.cumsum(n_tokens, dtype=np.int64)
        # leading docs that still fit the open pack; the rest is a
        # fresh greedy chain (greedy is self-synchronizing: once a new
        # pack starts, packing depends only on the data from there on)
        j0 = int(np.searchsorted(cum, budget - fill, side="right"))
        if j0 >= n:
            return np.full(n, base, np.int64), base, fill + int(cum[-1])
        ids = np.concatenate([
            np.full(j0, base, np.int64),
            greedy_pack_ids(n_tokens[j0:], budget) + base + 1])
    open_id = int(ids[-1])
    start = int(np.searchsorted(ids, open_id, side="left"))
    return ids, open_id, int(np.sum(n_tokens[start:], dtype=np.int64))


def _run_bounds(gcol: np.ndarray):
    """Start/stop row index of each group run in a sorted column."""
    change = np.flatnonzero(gcol[1:] != gcol[:-1]) + 1
    starts = np.concatenate(([0], change))
    stops = np.concatenate((change, [len(gcol)]))
    return starts, stops


def _pack_runs(tbl: pa.Table, group_col: str, budget: int, carry):
    """Pack every group run of ``tbl`` (sorted by group, id) given an
    incoming carry; -> (packed table, carry_out).  ``carry`` is
    (group, open_pack_id, open_fill) or None."""
    if tbl.num_rows == 0:
        return tbl.append_column("pack_id", pa.array([], pa.int64())), carry
    gcol = tbl.column(group_col).to_numpy(zero_copy_only=False)
    nt = tbl.column("n_tokens").to_numpy()
    packs = np.empty(len(gcol), np.int64)
    for a, b in zip(*_run_bounds(gcol)):
        g = gcol[a]
        if carry is not None and carry[0] == g:
            ids, oid, ofill = greedy_pack_continue(
                nt[a:b], budget, carry[2], carry[1])
        else:
            ids, oid, ofill = greedy_pack_continue(nt[a:b], budget, -1, 0)
        packs[a:b] = ids
        carry = (g, oid, ofill)
    return tbl.append_column("pack_id", pa.array(packs, pa.int64())), carry


def pack_sequences(ds, group_col: str, id_col: str, text_col: str,
                   budget: int):
    """-> Dataset (group, id, n_tokens, pack_id): greedy packing per
    group in ascending id order.  Token counts use the engine's
    whitespace token_count semantics (empty text -> 0 tokens).

    Skew-safe: no task ever holds a whole group — see module docstring.
    Assumes non-null group/id keys (the global sort's null placement
    would otherwise diverge from the driver chain's ordering).
    """
    import ray as _ray
    import ray.data as _rd

    def project(batch: pa.Table) -> pa.Table:
        # same kernel + SQL equivalence as text.token_count
        s = pd.Series(batch.column(text_col).to_pylist())
        nt = s.fillna("").str.strip().str.split(r"\s+").map(
            lambda t: 0 if t == [""] else len(t))
        return pa.table({
            group_col: batch.column(group_col),
            id_col: batch.column(id_col),
            "n_tokens": pa.array(nt.to_numpy(np.int64), pa.int64()),
        })

    narrow = (ds.map_batches(project, batch_format="pyarrow")
                .sort([group_col, id_col]).materialize())
    # blocks in dataset (= sorted) order
    refs = list(narrow.to_arrow_refs())
    if not refs:
        return narrow.map_batches(
            lambda b: b.append_column(
                "pack_id", pa.array(np.zeros(b.num_rows, np.int64))),
            batch_format="pyarrow")

    @_ray.remote(num_returns=2)
    def split_block(t: pa.Table):
        """Parallel wave: pack the block's interior (complete) runs;
        hand the first/last run (the only ones that can span a block
        edge) to the sequential chain."""
        if t.num_rows == 0:
            empty = t.append_column("pack_id", pa.array([], pa.int64()))
            return empty, t
        gcol = t.column(group_col).to_numpy(zero_copy_only=False)
        starts, stops = _run_bounds(gcol)
        if len(starts) <= 2:
            # 1-2 runs: everything is an edge run
            return (t.slice(0, 0).append_column(
                "pack_id", pa.array([], pa.int64())), t)
        inner = t.slice(stops[0], starts[-1] - stops[0])
        packed, _ = _pack_runs(inner, group_col, budget, None)
        edge = pa.concat_tables(
            [t.slice(0, stops[0]),
             t.slice(starts[-1], t.num_rows - starts[-1])])
        return packed, edge

    @_ray.remote(num_returns=2)
    def pack_edges(edge_tbl: pa.Table, carry):
        """Sequential wave: pack one block's edge runs given the carry
        from the previous block.  (With >=2 runs the block's first and
        last run have different groups — sorted data keeps one group in
        one contiguous range — so concatenating them preserves run
        semantics.)"""
        return _pack_runs(edge_tbl, group_col, budget, carry)

    interior, edges = [], []
    for r in refs:
        it, et = split_block.remote(r)
        interior.append(it)
        edges.append(et)
    carry = None
    edge_out = []
    for et in edges:
        eo, carry = pack_edges.remote(et, carry)
        edge_out.append(eo)
    return _rd.from_arrow_refs(interior + edge_out)
