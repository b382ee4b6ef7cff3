"""Stream-shaped windowed aggregates over an ordered event log.

Ray Data is a batch engine with no event-time watermarks; the engine
treats a stream as an ordered, partitioned log (the `events` table:
partition by key, sort by ts within partition) and implements windows
as grouped computations (ray_guide.md pattern):

- ``tumbling``: fixed-size bucket per (key, floor(ts/size)) — a pure
  groupby after a vectorized bucket column (map-side partials first);
- ``sliding``: windows every ``slide`` covering ``size`` — each event
  replicates into the ceil(size/slide) windows containing it
  (flat-map style expansion inside map_batches), then the same grouped
  aggregate;
- ``session``: gap-based sessions per key — needs ordered per-key
  state, so it runs as ``groupby(key).map_groups`` over ts-sorted
  groups (documented ordering assumption: one group = one key, sorted
  in the UDF).

All emit integer epoch-second window starts so DuckDB oracles compare
bit-exactly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _ts_to_epoch(batch: pa.Table, ts_col: str) -> np.ndarray:
    return batch.column(ts_col).to_numpy().astype("datetime64[s]").astype(np.int64)


def tumbling(ds, key_col: str, ts_col: str, size_s: int, value_col: str):
    """(key, window_start, n, sum_value) for fixed windows of size_s."""
    def bucket(batch: pa.Table) -> pa.Table:
        ep = _ts_to_epoch(batch, ts_col)
        ws = (ep // size_s) * size_s
        return pa.table({
            key_col: batch.column(key_col),
            "window_start": pa.array(ws, pa.int64()),
            value_col: batch.column(value_col),
        })

    # #groups ~ (keys x windows) grows with the log: block-aggregated
    from .fastagg import sort_block_aggregate
    return sort_block_aggregate(
        ds.map_batches(bucket, batch_format="pyarrow", zero_copy_batch=True),
        [key_col, "window_start"],
        {"n": (None, "count"), "sum_value": (value_col, "sum")})


def sliding(ds, key_col: str, ts_col: str, size_s: int, slide_s: int, value_col: str):
    """Windows starting every slide_s covering size_s (size % slide == 0)."""
    if size_s % slide_s != 0:
        raise ValueError("size_s must be a multiple of slide_s")
    k = size_s // slide_s

    def explode(batch: pa.Table) -> pa.Table:
        ep = _ts_to_epoch(batch, ts_col)
        base = (ep // slide_s) * slide_s
        keys, ws, vals = [], [], []
        v = batch.column(value_col).to_numpy()
        kv = batch.column(key_col).to_numpy(zero_copy_only=False)
        for j in range(k):
            start = base - j * slide_s
            keep = ep < start + size_s   # event inside [start, start+size)
            keys.append(kv[keep])
            ws.append(start[keep])
            vals.append(v[keep])
        return pa.table({
            key_col: pa.array(np.concatenate(keys)),
            "window_start": pa.array(np.concatenate(ws), pa.int64()),
            value_col: pa.array(np.concatenate(vals), pa.float64()),
        })

    from .fastagg import sort_block_aggregate
    return sort_block_aggregate(
        ds.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True),
        [key_col, "window_start"],
        {"n": (None, "count"), "sum_value": (value_col, "sum")})


def _sessionize(ep: np.ndarray, vals: np.ndarray, gap_s: int):
    """ts-sorted epochs/values -> (starts, ends, counts, sums) arrays,
    one entry per gap-delimited session — all segment-reduce numpy."""
    new_session = np.concatenate([[True], np.diff(ep) > gap_s])
    starts = np.flatnonzero(new_session)
    ends = np.concatenate([starts[1:], [len(ep)]])
    return (ep[starts], ep[ends - 1], (ends - starts).astype(np.int64),
            np.add.reduceat(vals, starts))


def sessions(ds, key_col: str, ts_col: str, gap_s: int, value_col: str):
    """Gap-based sessions per key: (key, session_start, session_end, n,
    sum_value).  Ordering assumption: map_groups hands one full key per
    group; events are sorted by ts inside the UDF.

    SKEW NOTE: one key's entire history lands in one task.  For keys
    holding a large fraction of all events use ``sessions_scalable``,
    which pre-splits by coarse time range and merges boundary sessions.
    """

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(ts_col)
        ep = g[ts_col].astype("datetime64[s]").astype(np.int64).to_numpy()
        s0, s1, n, sv = _sessionize(ep, g[value_col].to_numpy(), gap_s)
        return pd.DataFrame({
            key_col: g[key_col].iloc[0],
            "session_start": s0.astype(np.int64),
            "session_end": s1.astype(np.int64),
            "n": n,
            "sum_value": sv.astype(np.float64),
        })

    return ds.groupby(key_col).map_groups(per_key, batch_format="pandas")


def asof_join_ids(left_ds, right_ds, key_col: str, ts_col: str,
                  left_id: str, right_id: str, strict: bool = True):
    """Per-key backward as-of join (an operator Ray Data lacks): for
    every left row, the right row of the same key with the greatest
    timestamp < left.ts (``strict``) or <= (non-strict); -1 when no
    right row precedes it.

    Shuffle shape: both sides project to (key, ts, id) — payloads never
    move; callers hash-join payloads back by id.  The match itself is a
    union + ``groupby(key)`` with a vectorized searchsorted per key
    (ties on ts resolve to the greatest right id — deterministic).
    Partitioning assumption: one key's rows fit one task (same skew
    note as ``sessions``; pre-split by coarse time range + boundary
    carry is the mitigation at extreme key skew).

    Returns (left_id, matched right_id | -1, matched ts | -1).
    """
    def project(ds_, id_col_, side_):
        def fn(b: pa.Table) -> pa.Table:
            return pa.table({
                key_col: b.column(key_col),
                "ep": pa.array(_ts_to_epoch(b, ts_col), pa.int64()),
                "row_id": b.column(id_col_),
                "side": pa.array(np.full(b.num_rows, side_, np.int8)),
            })
        return ds_.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)

    both = project(left_ds, left_id, 0).union(project(right_ds, right_id, 1))

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        l = g[g["side"] == 0]
        r = g[g["side"] == 1]
        lid = l["row_id"].to_numpy()
        lep = l["ep"].to_numpy()
        rep = r["ep"].to_numpy()
        rid = r["row_id"].to_numpy()
        if len(rep) == 0:
            out_id = np.full(len(lid), -1, np.int64)
            out_ep = np.full(len(lid), -1, np.int64)
        else:
            order = np.lexsort((rid, rep))    # ties -> greatest id is LAST
            rep, rid = rep[order], rid[order]
            pos = np.searchsorted(rep, lep,
                                  side="left" if strict else "right") - 1
            hit = pos >= 0
            out_id = np.where(hit, rid[np.maximum(pos, 0)], -1)
            out_ep = np.where(hit, rep[np.maximum(pos, 0)], -1)
        return pd.DataFrame({left_id: lid,
                             "asof_" + right_id: out_id.astype(np.int64),
                             "asof_ep": out_ep.astype(np.int64)})

    return both.groupby(key_col).map_groups(per_key, batch_format="pandas")


def sessions_scalable(ds, key_col: str, ts_col: str, gap_s: int, value_col: str,
                      bucket_s: int | None = None):
    """Skew-hardened sessions: identical output to ``sessions``.

    Phase 1 globally sorts by (key, ts) and sessionizes each BLOCK with
    one vectorized pass (a new segment starts on key change or time gap
    > gap_s) — a hot key's events spread over many sorted blocks, and
    no per-group Python UDF runs (a (key, time-bucket) ``map_groups``
    variant measured ~1ms of overhead per group with #groups = #keys x
    #buckets).  Phase 2 merges adjacent partial sessions per key: any
    split — a real gap boundary never splits, so splits only come from
    block boundaries — has gap <= gap_s between its pieces and is
    healed by the same merge rule.  Phase 2's input is one row per
    partial session, bounded by #sessions + #blocks, not by the hot
    key's event count.

    ``bucket_s`` is accepted for backward compatibility and ignored
    (the sort-based phase 1 needs no bucketing).
    """
    def project(batch: pa.Table) -> pa.Table:
        ep = _ts_to_epoch(batch, ts_col)
        return pa.table({
            key_col: batch.column(key_col),
            "ep": pa.array(ep, pa.int64()),
            value_col: batch.column(value_col),
        })

    def per_block(batch: pa.Table) -> pa.Table:
        k = batch.column(key_col).to_numpy()
        ep = batch.column("ep").to_numpy()
        v = batch.column(value_col).to_numpy()
        if len(k) == 0:
            return pa.table({key_col: pa.array([], batch.schema.field(key_col).type),
                             "session_start": pa.array([], pa.int64()),
                             "session_end": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64()),
                             "sum_value": pa.array([], pa.float64())})
        new_seg = np.concatenate([[True], (k[1:] != k[:-1])
                                  | (np.diff(ep) > gap_s)])
        starts = np.flatnonzero(new_seg)
        ends = np.concatenate([starts[1:], [len(ep)]])
        return pa.table({
            key_col: pa.array(k[starts]),
            "session_start": pa.array(ep[starts], pa.int64()),
            "session_end": pa.array(ep[ends - 1], pa.int64()),
            "n": pa.array((ends - starts).astype(np.int64), pa.int64()),
            "sum_value": pa.array(np.add.reduceat(v, starts), pa.float64()),
        })

    partial = (ds.map_batches(project, batch_format="pyarrow", zero_copy_batch=True)
               .sort([key_col, "ep"])
               .map_batches(per_block, batch_format="pyarrow"))

    def merge_key(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("session_start")
        s0 = g["session_start"].to_numpy()
        s1 = g["session_end"].to_numpy()
        # chain-merge adjacent bucket sessions across boundaries
        keep = np.concatenate([[True], s0[1:] - s1[:-1] > gap_s])
        grp = np.flatnonzero(keep)
        ends = np.concatenate([grp[1:], [len(s0)]])
        return pd.DataFrame({
            key_col: g[key_col].iloc[0],
            "session_start": s0[grp].astype(np.int64),
            "session_end": s1[ends - 1].astype(np.int64),
            "n": np.add.reduceat(g["n"].to_numpy(), grp).astype(np.int64),
            "sum_value": np.add.reduceat(g["sum_value"].to_numpy(), grp),
        })

    return partial.groupby(key_col).map_groups(merge_key, batch_format="pandas")


def funnel(ds, key_col: str, ts_col: str, type_col: str, steps: list[str]):
    """Ordered-funnel analysis: per key, the earliest chain
    step1 -> step2 -> ... with strictly increasing timestamps
    (min ts of step1; then min ts of step2 AFTER that; ...).  Returns
    one row per key that completed step 1: (key, steps_completed,
    ts_1..ts_k epoch-us, -1 for unreached steps).

    Shuffle shape: projects to (key, ep, step-index) — payloads never
    move — then one ``groupby(key)``; the per-key kernel is a
    searchsorted chain over that key's sorted step timestamps, one
    call per funnel STEP (not per event).  Same partitioning
    assumption as sessions/asof: one key's projected rows fit a task.
    """
    step_idx = {s: i for i, s in enumerate(steps)}

    def project(batch: pa.Table) -> pa.Table:
        et = batch.column(type_col).to_pylist()
        si = np.asarray([step_idx.get(t, -1) for t in et], np.int64)
        keep = si >= 0
        # MICROSECOND epochs: second-resolution truncation could merge
        # distinct events and flip the strictly-after comparisons
        ep = batch.column(ts_col).to_numpy().astype("datetime64[us]"
                                                    ).astype(np.int64)
        return pa.table({
            key_col: batch.column(key_col).filter(pa.array(keep)),
            "ep": pa.array(ep[keep], pa.int64()),
            "si": pa.array(si[keep], pa.int64()),
        })

    k = len(steps)

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        out_ts = np.full(k, -1, np.int64)
        cur = -1  # strictly-after threshold
        done = 0
        for i in range(k):
            eps = np.sort(g.loc[g["si"] == i, "ep"].to_numpy())
            pos = np.searchsorted(eps, cur, side="right")
            if pos >= len(eps):
                break
            cur = int(eps[pos])
            out_ts[i] = cur
            done += 1
        if done == 0:
            # typed empty frame: object-dtype empties arrow-convert to
            # null columns and break cross-block schema unification
            return pd.DataFrame({
                key_col: pd.Series([], dtype=g[key_col].dtype),
                "steps_completed": pd.Series([], dtype=np.int64),
                **{f"ts_{i+1}": pd.Series([], dtype=np.int64)
                   for i in range(k)}})
        return pd.DataFrame({key_col: [g[key_col].iloc[0]],
                             "steps_completed": [done],
                             **{f"ts_{i+1}": [out_ts[i]] for i in range(k)}})

    return (ds.map_batches(project, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby(key_col).map_groups(per_key, batch_format="pandas"))


def tumbling_checkpointed(ds, ckpt_dir: str, key_col: str, ts_col: str,
                          size_s: int, value_col: str,
                          partition_days: int = 1):
    """Tumbling aggregate persisted through the resumable sink: one
    atomic parquet file per ``partition_days`` of window starts."""
    from . import sink

    day = 86400 * partition_days

    def part_col(b: pa.Table) -> pa.Table:
        p = (b.column("window_start").to_numpy() // day) * day
        return b.append_column("part", pa.array(p, pa.int64()))

    agg = tumbling(ds, key_col, ts_col, size_s, value_col).map_batches(
        part_col, batch_format="pyarrow")
    return sink.write_partitioned(agg, ckpt_dir, "part")


def tumbling_merge_update(new_ds, ckpt_dir: str, key_col: str, ts_col: str,
                          size_s: int, value_col: str,
                          partition_days: int = 1):
    """Incremental ingest into a checkpointed tumbling aggregate — the
    aggregate-side analogue of build.update_index: aggregate ONLY the
    new events, read back ONLY the sink partitions their windows touch,
    sum-merge (count and sum are semilattice-mergeable partials), and
    atomically rewrite just those partitions.  Untouched partitions are
    never read.  Returns the updated manifest."""
    import os

    import pyarrow.parquet as pq
    import ray

    from . import sink
    from .fastagg import sort_block_aggregate

    day = 86400 * partition_days
    delta = tumbling(new_ds, key_col, ts_col, size_s, value_col)

    def part_col(b: pa.Table) -> pa.Table:
        p = (b.column("window_start").to_numpy() // day) * day
        return b.append_column("part", pa.array(p, pa.int64()))

    delta = delta.map_batches(part_col, batch_format="pyarrow").materialize()
    touched = set()
    for t in ray.get(delta.select_columns(["part"]).to_arrow_refs()):
        touched |= set(np.unique(t.column("part").to_numpy()).tolist())
    old_manifest = pq.read_table(os.path.join(ckpt_dir, "manifest.parquet"))
    have = {p: path for p, path in
            zip(old_manifest.column("partition").to_pylist(),
                old_manifest.column("path").to_pylist())}
    exist = [p for p in touched if str(p) in have and
             os.path.exists(have[str(p)])]
    merged = delta
    if exist:
        merged = sink.read_partitioned(ckpt_dir, partitions=exist).union(delta)
    merged = sort_block_aggregate(
        merged, [key_col, "window_start", "part"],
        {"n": ("n", "sum"), "sum_value": ("sum_value", "sum")})
    # rewrite only touched partitions: drop their files, resume skips rest
    for p in exist:
        os.remove(have[str(p)])
    new_manifest = sink.write_partitioned(merged, ckpt_dir, "part",
                                          resume=True)
    # write_partitioned's manifest covers only the partitions in
    # ``merged`` — merge back the untouched partitions' rows so the
    # manifest stays complete
    touched_strs = {str(p) for p in touched}
    keep_rows = [i for i in range(old_manifest.num_rows)
                 if old_manifest.column("partition")[i].as_py()
                 not in touched_strs]
    full = pa.concat_tables([
        old_manifest.take(pa.array(keep_rows, pa.int64())),
        new_manifest]).combine_chunks()
    tmp = os.path.join(ckpt_dir, f"manifest.tmp.{os.getpid()}")
    pq.write_table(full, tmp)
    os.replace(tmp, os.path.join(ckpt_dir, "manifest.parquet"))
    return full
