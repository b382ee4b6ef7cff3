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
    from ray.data.aggregate import Count, Sum

    def bucket(batch: pa.Table) -> pa.Table:
        ep = _ts_to_epoch(batch, ts_col)
        ws = (ep // size_s) * size_s
        return pa.table({
            key_col: batch.column(key_col),
            "window_start": pa.array(ws, pa.int64()),
            value_col: batch.column(value_col),
        })

    return (ds.map_batches(bucket, batch_format="pyarrow", zero_copy_batch=True)
            .groupby([key_col, "window_start"])
            .aggregate(Count(alias_name="n"), Sum(value_col, alias_name="sum_value")))


def sliding(ds, key_col: str, ts_col: str, size_s: int, slide_s: int, value_col: str):
    """Windows starting every slide_s covering size_s (size % slide == 0)."""
    from ray.data.aggregate import Count, Sum

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

    return (ds.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)
            .groupby([key_col, "window_start"])
            .aggregate(Count(alias_name="n"), Sum(value_col, alias_name="sum_value")))


def sessions(ds, key_col: str, ts_col: str, gap_s: int, value_col: str):
    """Gap-based sessions per key: (key, session_start, session_end, n,
    sum_value).  Ordering assumption: map_groups hands one full key per
    group; events are sorted by ts inside the UDF."""

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(ts_col)
        ep = g[ts_col].astype("datetime64[s]").astype(np.int64).to_numpy()
        new_session = np.concatenate([[True], np.diff(ep) > gap_s])
        sid = np.cumsum(new_session) - 1
        out = []
        for s in np.unique(sid):
            m = sid == s
            out.append({
                key_col: g[key_col].iloc[0],
                "session_start": int(ep[m].min()),
                "session_end": int(ep[m].max()),
                "n": int(m.sum()),
                "sum_value": float(g[value_col].to_numpy()[m].sum()),
            })
        return pd.DataFrame(out)

    return ds.groupby(key_col).map_groups(per_key, batch_format="pandas")
