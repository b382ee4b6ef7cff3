"""Sequence packing: group documents into fixed token-budget training
sequences.

The LLM-training operator that turns a tokenized corpus into context
windows: iterate docs in a deterministic order, accumulate token
counts, start a new pack when the budget would overflow (greedy
first-fit in order; an oversized doc occupies a pack alone).  The
reference engine has nothing comparable — semantics here are the
standard greedy packing used by large-scale pretraining pipelines.

Scale shape: packing is sequential WITHIN a group (source, shard,
language...) and embarrassingly parallel ACROSS groups, so it runs as
``groupby(group).map_groups``.  The per-group kernel is NOT a per-doc
Python loop: one cumsum, then one ``np.searchsorted`` per PACK
boundary — O(#packs log n) Python-level steps, and #packs ~=
total_tokens/budget, far below #docs for real budgets.  Partitioning
assumption: one group's (id, n_tokens) pairs fit one task — only two
int64 columns shuffle, never the text.
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


def pack_sequences(ds, group_col: str, id_col: str, text_col: str,
                   budget: int):
    """-> Dataset (group, id, n_tokens, pack_id): greedy packing per
    group in ascending id order.  Token counts use the engine's
    whitespace token_count semantics (empty text -> 0 tokens)."""

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

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col)
        pack = greedy_pack_ids(g["n_tokens"].to_numpy(), budget)
        return pd.DataFrame({
            group_col: g[group_col].to_numpy(),
            id_col: g[id_col].to_numpy(),
            "n_tokens": g["n_tokens"].to_numpy(),
            "pack_id": pack,
        })

    return (ds.map_batches(project, batch_format="pyarrow")
              .groupby(group_col).map_groups(per_group, batch_format="pandas"))
