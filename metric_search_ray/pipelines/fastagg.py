"""High-cardinality grouped aggregation without per-group Python cost.

Ray Data's ``groupby(...).aggregate(...)`` pays Python-level per-group
overhead (~50-100us per group per aggregate); with #groups ~ #rows —
pair counting, shingle censuses, per-key rollups — that dwarfs the
actual compute (measured: 10s for 104k groups x 3 aggregates that
pyarrow's C++ hash aggregate does in ~30ms).

``sort_block_aggregate`` keeps the same all-to-all cost shape (one
global sort, the exchange Ray's own sort-based aggregate performs
anyway) but replaces the per-group reduction with ONE vectorized
``pyarrow.Table.group_by`` call per BLOCK.  Groups split across block
edges are healed in a second pass over only the edge groups: after a
global sort, all rows of one key are globally contiguous, so a split
group's partial rows are necessarily the first/last key of their
blocks — at most 2 partial rows per block leave the distributed path,
a driver-side combine bounded by block count, independent of group
count (scale-safe at any corpus size).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# partial fn on raw rows -> fn that combines partials of the same group
_COMBINE = {"count": "sum", "sum": "sum", "min": "min", "max": "max"}


def sort_block_aggregate(ds, key: list[str] | str, aggs: dict):
    """Grouped aggregate via sort + per-block pyarrow group_by.

    ``aggs`` maps output column name -> (input column | None, fn) with
    fn in {"count", "sum", "min", "max"} ("count" counts group rows;
    pass None as the column).  Result rows/values equal
    ``ds.groupby(key).aggregate(...)`` with the matching built-ins.
    (src, fn) pairs must be distinct across ``aggs`` entries.
    """
    import ray
    import ray.data as rd

    keys = [key] if isinstance(key, str) else list(key)
    partial_spec, rename = [], {}
    for out, (col, fn) in aggs.items():
        if fn not in _COMBINE:
            raise ValueError(f"unsupported aggregate {fn!r}")
        if col is None and fn == "count":
            # row count: pyarrow count_all (a plain "count" over a key
            # column would skip rows whose key is NULL)
            if "count_all" in rename:
                raise ValueError("duplicate row-count aggregate")
            partial_spec.append(([], "count_all"))
            rename["count_all"] = out
            continue
        src = col if col is not None else keys[0]
        pa_name = f"{src}_{fn}"
        if pa_name in rename:
            raise ValueError(f"duplicate aggregate source {(src, fn)}")
        partial_spec.append((src, fn))
        rename[pa_name] = out
    combine_spec = [(out, _COMBINE[fn]) for out, (_, fn) in aggs.items()]
    combine_rename = {f"{out}_{_COMBINE[fn]}": out
                      for out, (_, fn) in aggs.items()}
    out_cols = keys + [rename["count_all" if f == "count_all"
                              else f"{c}_{f}"] for c, f in partial_spec]

    def block_partials(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            cols = {kc: batch.column(kc).slice(0, 0) for kc in keys}
            for out, (col, fn) in aggs.items():
                src = col if col is not None else keys[0]
                t = (pa.int64() if fn == "count"
                     else batch.schema.field(src).type)
                cols[out] = pa.array([], t)
            return (pa.table(cols).select(out_cols)
                    .append_column("_edge", pa.array([], pa.bool_())))
        gb = batch.group_by(keys, use_threads=False).aggregate(partial_spec)
        gb = gb.rename_columns([rename.get(n, n) for n in gb.column_names])
        # edge groups: the block's first and last key tuples.  After the
        # global sort a key's rows are globally contiguous, so every
        # partial row of a block-spanning key is an edge — healing only
        # edges is exact.
        def _eq_scalar(col: pa.ChunkedArray, scalar) -> np.ndarray:
            # null-safe: a NULL key groups with NULL (sorted contiguous),
            # so null == null must be True here
            if not scalar.is_valid:
                return pc.is_null(col).to_numpy(zero_copy_only=False)
            return pc.fill_null(pc.equal(col, scalar), False).to_numpy(
                zero_copy_only=False)

        is_first = np.ones(gb.num_rows, bool)
        is_last = np.ones(gb.num_rows, bool)
        for kc in keys:
            col = gb.column(kc)
            is_first &= _eq_scalar(col, batch.column(kc)[0])
            is_last &= _eq_scalar(col, batch.column(kc)[-1])
        return (gb.select(out_cols)
                .append_column("_edge", pa.array(is_first | is_last,
                                                 pa.bool_())))

    parts = (ds.sort(keys)
             .map_batches(block_partials, batch_size=None,
                          batch_format="pyarrow")
             .materialize())
    finals = parts.map_batches(
        lambda b: b.filter(pc.invert(b.column("_edge"))).select(out_cols),
        batch_format="pyarrow")
    edge_refs = (parts.map_batches(
        lambda b: b.filter(b.column("_edge")).select(out_cols),
        batch_format="pyarrow").to_arrow_refs())
    edge_tbls = [t for t in ray.get(edge_refs) if t.num_rows]
    if not edge_tbls:
        return finals
    healed = (pa.concat_tables(edge_tbls)
              .group_by(keys, use_threads=False).aggregate(combine_spec))
    healed = healed.rename_columns(
        [combine_rename.get(n, n) for n in healed.column_names])
    return finals.union(rd.from_arrow(healed.select(out_cols)))
