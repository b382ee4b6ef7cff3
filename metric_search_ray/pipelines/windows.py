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
    sum_value).

    DEFAULTS to the skew-hardened sort-based implementation
    (``sessions_scalable``): a hot key's events spread across many
    sorted blocks instead of landing in one task, and session
    boundaries (key, start, end, n) are bit-identical to the per-key
    path; float sums can differ only in add order.  The per-key
    ``map_groups`` variant survives as ``_unsafe_sessions_grouped`` for
    workloads with many small keys where the global sort isn't worth
    it."""
    return sessions_scalable(ds, key_col, ts_col, gap_s, value_col)


def _unsafe_sessions_grouped(ds, key_col: str, ts_col: str, gap_s: int,
                     value_col: str):
    """Per-key ``map_groups`` sessionizer.  Ordering assumption:
    map_groups hands one full key per group; events are sorted by ts
    inside the UDF.  SKEW NOTE: one key's entire history lands in one
    task — prefer ``sessions`` (sort-based) when any key may be hot."""

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

    Skew-safe shape (no per-key task): both sides project to
    (key, ts, id) — payloads never move; callers hash-join payloads
    back by id.  The union is globally sorted by (key, ep, ord, id)
    where ``ord`` places rights before/after equal-ts lefts according
    to ``strict``, so "the match" is simply THE LAST RIGHT ROW ABOVE
    each left row within its key — a vectorized maximum.accumulate per
    sorted block.  Lefts whose preceding right sits in an earlier block
    resolve against a per-(block, key) CARRY (last right per key per
    block, prefix-combined on the driver — bounded by #keys x #blocks,
    never by a hot key's event count).  Ties on ts resolve to the
    greatest right id — deterministic, identical to a per-key
    searchsorted.

    Returns (left_id, matched right_id | -1, matched ts | -1).
    """
    import ray
    import ray.data as rd

    def project(ds_, id_col_, side_):
        # ord: sort position at EQUAL ts — strict excludes equal-ts
        # rights (lefts first), non-strict includes them (rights first)
        ordv = (side_ if strict else 1 - side_)

        def fn(b: pa.Table) -> pa.Table:
            return pa.table({
                key_col: b.column(key_col),
                "ep": pa.array(_ts_to_epoch(b, ts_col), pa.int64()),
                "ord": pa.array(np.full(b.num_rows, ordv, np.int8)),
                "row_id": b.column(id_col_),
                "side": pa.array(np.full(b.num_rows, side_, np.int8)),
            })
        return ds_.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)

    both = project(left_ds, left_id, 0).union(project(right_ds, right_id, 1))
    sorted_ds = both.sort([key_col, "ep", "ord", "row_id"]).materialize()
    refs = sorted_ds.to_arrow_refs()        # range partitions, in order

    @ray.remote
    def block_last_right(tbl: pa.Table):
        """(last right row per key in this sorted block, block bounds)."""
        bounds = None
        if tbl.num_rows:
            bounds = (tbl.column(key_col)[0].as_py(),
                      tbl.column("ep")[0].as_py(),
                      tbl.column(key_col)[-1].as_py(),
                      tbl.column("ep")[-1].as_py())
        r = tbl.filter(pa.compute.equal(tbl.column("side"), 1))
        if r.num_rows == 0:
            return r.select([key_col, "ep", "row_id"]), bounds
        k = r.column(key_col).to_numpy(zero_copy_only=False)
        last = np.concatenate([k[1:] != k[:-1], [True]])
        return (r.select([key_col, "ep", "row_id"]).filter(pa.array(last)),
                bounds)

    lasts_bounds = ray.get([block_last_right.remote(ref) for ref in refs])
    lasts = [lb[0] for lb in lasts_bounds]
    # the carry protocol requires refs in global sort order — verify
    # block bounds are non-decreasing (cheap, fails loudly if Ray ever
    # changes sorted-block ordering)
    prev = None
    for _, bounds in lasts_bounds:
        if bounds is None:
            continue
        lo, hi = (bounds[0], bounds[1]), (bounds[2], bounds[3])
        if prev is not None and lo < prev:
            raise AssertionError("asof_join_ids: sorted blocks arrived "
                                 "out of order; carry protocol invalid")
        prev = hi

    @ray.remote
    def resolve(tbl: pa.Table, carry: pa.Table | None) -> pa.Table:
        n = tbl.num_rows
        k = tbl.column(key_col).to_numpy(zero_copy_only=False)
        ep = tbl.column("ep").to_numpy()
        rid = tbl.column("row_id").to_numpy()
        side = tbl.column("side").to_numpy()
        is_right = side == 1
        idx = np.arange(n, dtype=np.int64)
        lastr = np.maximum.accumulate(np.where(is_right, idx, -1)) \
            if n else np.empty(0, np.int64)
        # valid only if that right belongs to the SAME key: compare
        # against the key's first index in this block
        new_key = np.concatenate([[True], k[1:] != k[:-1]]) if n else \
            np.empty(0, bool)
        starts = np.flatnonzero(new_key)
        counts = np.diff(np.append(starts, n))
        key_start = np.repeat(starts, counts)
        lmask = ~is_right
        lpos = idx[lmask]
        cand = lastr[lmask]
        in_block = cand >= key_start[lmask]
        out_id = np.where(in_block, rid[np.maximum(cand, 0)], -1)
        out_ep = np.where(in_block, ep[np.maximum(cand, 0)], -1)
        if carry is not None and carry.num_rows and (~in_block).any():
            ck = carry.column(key_col).to_numpy(zero_copy_only=False)
            cep = carry.column("ep").to_numpy()
            cid = carry.column("row_id").to_numpy()
            need = ~in_block
            lk = k[lmask][need]
            pos = np.searchsorted(ck, lk)
            pos_c = np.minimum(pos, len(ck) - 1)
            hit = ck[pos_c] == lk
            sub_id = np.where(hit, cid[pos_c], -1)
            sub_ep = np.where(hit, cep[pos_c], -1)
            out_id[need] = sub_id
            out_ep[need] = sub_ep
        return pa.table({
            left_id: pa.array(rid[lmask]),
            "asof_" + right_id: pa.array(out_id.astype(np.int64), pa.int64()),
            "asof_ep": pa.array(out_ep.astype(np.int64), pa.int64()),
        })

    # driver prefix-combine: carry for block b = last right per key over
    # blocks < b (incremental dict of per-key lasts, snapshot per block)
    out_refs = []
    state: dict = {}
    for b, ref in enumerate(refs):
        if state:
            keys_sorted = sorted(state)
            carry = pa.table({
                key_col: pa.array(keys_sorted),
                "ep": pa.array([state[kk][0] for kk in keys_sorted],
                               pa.int64()),
                "row_id": pa.array([state[kk][1] for kk in keys_sorted]),
            })
        else:
            carry = None
        out_refs.append(resolve.remote(ref, carry))
        lt = lasts[b]
        for kk, e, i in zip(lt.column(key_col).to_pylist(),
                            lt.column("ep").to_pylist(),
                            lt.column("row_id").to_pylist()):
            state[kk] = (e, i)
    return rd.from_arrow_refs(out_refs)


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

    Skew-proof shape (no per-key grouping of raw events at all): the
    chain advances one step per PASS.  Pass i holds a per-key threshold
    ``cur`` (the ts reached at step i-1; one entry per surviving key,
    bounded by the OUTPUT size, broadcast once via ``ray.put``), and
    computes ``min ep of step-i events with ep > cur[key]`` — a
    map-side per-block partial min per key (a grouped-min census, tiny
    exchange to the driver), so a key with a billion step-i events
    contributes at most one row per block.  k passes over the projected
    step events (materialized once).
    """
    import ray
    import pyarrow.compute as pc

    step_idx = {s: i for i, s in enumerate(steps)}
    k = len(steps)

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

    proj = ds.map_batches(project, batch_format="pyarrow",
                          zero_copy_batch=True).materialize()

    def step_min(i: int, state_ref):
        """Distributed per-key min over step-i events strictly after the
        key's threshold; None state = pass 0 (every key, cur = -inf)."""
        def partial(batch: pa.Table) -> pa.Table:
            m = pc.equal(batch.column("si"), i).to_numpy(
                zero_copy_only=False)
            kv = batch.column(key_col).to_numpy(zero_copy_only=False)[m]
            ev = batch.column("ep").to_numpy()[m]
            if state_ref is not None:
                st = ray.get(state_ref)
                sk, scur = st["k"], st["cur"]
                pos = np.searchsorted(sk, kv)
                pos_c = np.minimum(pos, max(len(sk) - 1, 0))
                hit = (sk[pos_c] == kv) if len(sk) else np.zeros(len(kv), bool)
                after = np.zeros(len(kv), bool)
                after[hit] = ev[hit] > scur[pos_c[hit]]
                kv, ev = kv[after], ev[after]
            if len(kv) == 0:
                return pa.table({key_col: pa.array([], batch.schema.field(
                    key_col).type), "ep": pa.array([], pa.int64())})
            t = pa.table({key_col: pa.array(kv), "ep": pa.array(ev, pa.int64())})
            gb = t.group_by([key_col], use_threads=False).aggregate(
                [("ep", "min")])
            return gb.rename_columns([key_col, "ep"])

        parts = [t for t in ray.get(
            proj.map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs()) if t.num_rows]
        if not parts:
            return None
        allp = pa.concat_tables(parts)
        gb = allp.group_by([key_col], use_threads=False).aggregate(
            [("ep", "min")])
        kv = gb.column(key_col).to_numpy(zero_copy_only=False)
        ev = gb.column("ep_min").to_numpy()
        order = np.argsort(kv, kind="stable")
        return kv[order], ev[order]

    state_ref = None
    survivors: list[tuple[np.ndarray, np.ndarray]] = []
    for i in range(k):
        res = step_min(i, state_ref)
        if res is None:
            break
        kv, ev = res
        survivors.append((kv, ev))
        state_ref = ray.put({"k": kv, "cur": ev})

    if not survivors:
        import ray.data as rd
        ktype = proj.schema().base_schema.field(key_col).type \
            if hasattr(proj.schema(), "base_schema") else pa.string()
        return rd.from_arrow(pa.table({
            key_col: pa.array([], ktype),
            "steps_completed": pa.array([], pa.int64()),
            **{f"ts_{i+1}": pa.array([], pa.int64()) for i in range(k)}}))

    # assemble one row per key that completed step 1
    keys0, _ = survivors[0]
    done = np.ones(len(keys0), np.int64)
    ts_cols = np.full((len(keys0), k), -1, np.int64)
    ts_cols[:, 0] = survivors[0][1]
    for i in range(1, len(survivors)):
        kv, ev = survivors[i]
        pos = np.searchsorted(keys0, kv)
        ts_cols[pos, i] = ev
        done[pos] = i + 1
    import ray.data as rd
    return rd.from_arrow(pa.table({
        key_col: pa.array(keys0),
        "steps_completed": pa.array(done, pa.int64()),
        **{f"ts_{i+1}": pa.array(ts_cols[:, i], pa.int64())
           for i in range(k)}}))


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
    never read.  Returns the updated manifest.

    Single-writer contract: one merge at a time per ckpt_dir (the
    orphan sweep would otherwise delete a concurrent merge's fresh
    files)."""
    import os
    import time

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
    missing = [p for p in touched if str(p) in have and
               not os.path.exists(have[str(p)])]
    if missing:
        # a manifest-listed file vanished: the directory is corrupt —
        # merging delta-only here would silently drop accumulated
        # counts, so refuse (crash-resume contract)
        raise FileNotFoundError(
            f"{ckpt_dir}: manifest lists partitions {missing[:3]}... whose "
            "files are missing; refusing a delta-only merge")
    exist = [p for p in touched if str(p) in have]
    merged = delta
    if exist:
        merged = sink.read_partitioned(ckpt_dir, partitions=exist).union(delta)
    merged = sort_block_aggregate(
        merged, [key_col, "window_start", "part"],
        {"n": ("n", "sum"), "sum_value": ("sum_value", "sum")})
    # CRASH-SAFE ORDER: (1) write merged partitions to NEW versioned
    # files (old files untouched -> a crash here loses nothing: the old
    # manifest still points at complete old files, the orphan new files
    # are swept below on the next merge); (2) install the combined
    # manifest in ONE atomic rename; (3) only then delete the stale old
    # files (a crash between 2 and 3 leaves unreferenced orphans only).
    suffix = f"-m{time.time_ns():x}"
    new_manifest = sink.write_partitioned(merged, ckpt_dir, "part",
                                          resume=False,
                                          filename_suffix=suffix,
                                          write_manifest=False)
    touched_strs = {str(p) for p in touched}
    keep_rows = [i for i in range(old_manifest.num_rows)
                 if old_manifest.column("partition")[i].as_py()
                 not in touched_strs]
    full = pa.concat_tables([
        old_manifest.take(pa.array(keep_rows, pa.int64())),
        new_manifest]).combine_chunks()
    sink.replace_manifest(ckpt_dir, full)
    live = set(full.column("path").to_pylist())
    for p in exist:                          # stale files, post-swap
        if have[str(p)] not in live:
            os.remove(have[str(p)])
    for f in os.listdir(ckpt_dir):           # orphans from crashed merges
        fp = os.path.join(ckpt_dir, f)
        if (f.startswith("part-") and f.endswith(".parquet")
                and fp not in live):
            os.remove(fp)
    return full
