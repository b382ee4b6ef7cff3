"""Resumable partitioned parquet sink.

The write-side discipline the index/IVF checkpoints use
(pipelines/build.py), generalized to any Dataset: one atomic parquet
file per partition-key value (tmp + rename — file presence is the
completion marker), a manifest recording lineage, and resume that
skips completed partitions.  A failed 100-TB run re-does only the
partitions whose files are missing; no giant single file, every
partition independently listable/readable.

Partition count = distinct key values — choose a key with sane
cardinality (date, shard id, key range), exactly like any hive-style
layout.  The write itself is ``groupby(key).map_groups``: each task
writes its partition's file independently (embarrassingly parallel
across partitions).
"""

from __future__ import annotations

import os
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SINK_MANIFEST = pa.schema([
    ("partition", pa.string()),
    ("n_rows", pa.int64()),
    ("path", pa.string()),
    ("write_ms", pa.float64()),
    ("resumed", pa.bool_()),
])


def partition_path(out_dir: str, value, suffix: str = "") -> str:
    safe = str(value).replace(os.sep, "_")
    return os.path.join(out_dir, f"part-{safe}{suffix}.parquet")


def write_partitioned(ds, out_dir: str, partition_col: str,
                      resume: bool = True, filename_suffix: str = "",
                      write_manifest: bool = True) -> pa.Table:
    """Write one parquet file per distinct partition_col value.
    Returns the manifest table (also written as manifest.parquet,
    atomically, unless ``write_manifest=False`` — merge-style callers
    that must transition the manifest old->new in ONE atomic step pass
    False and write the combined manifest themselves).  Rerun with
    ``resume=True`` skips partitions whose files exist (atomic rename
    guarantees a present file is complete).  ``filename_suffix`` writes
    versioned file names (``part-<val><suffix>.parquet``) so a merge
    can write new data WITHOUT touching the files a crash-recovery
    would still need.
    """
    os.makedirs(out_dir, exist_ok=True)

    def write_one(g: pa.Table) -> pa.Table:
        val = g.column(partition_col)[0].as_py()
        path = partition_path(out_dir, val, filename_suffix)
        if resume and os.path.exists(path):
            md = pq.read_metadata(path)
            return pa.table({"partition": [str(val)], "n_rows": [md.num_rows],
                             "path": [path], "write_ms": [0.0],
                             "resumed": [True]}, schema=SINK_MANIFEST)
        t0 = time.perf_counter()
        tmp = path + f".tmp.{os.getpid()}"
        pq.write_table(g, tmp)
        os.replace(tmp, path)
        return pa.table({"partition": [str(val)], "n_rows": [g.num_rows],
                         "path": [path],
                         "write_ms": [(time.perf_counter() - t0) * 1000],
                         "resumed": [False]}, schema=SINK_MANIFEST)

    manifest_ds = ds.groupby(partition_col).map_groups(
        write_one, batch_format="pyarrow")
    manifest = pa.Table.from_pandas(manifest_ds.to_pandas(),
                                    schema=SINK_MANIFEST,
                                    preserve_index=False)
    if write_manifest:
        replace_manifest(out_dir, manifest)
    return manifest


def replace_manifest(out_dir: str, manifest: pa.Table) -> None:
    """Atomically install ``manifest`` as the directory's manifest."""
    tmp = os.path.join(out_dir, f"manifest.tmp.{os.getpid()}")
    pq.write_table(manifest, tmp)
    os.replace(tmp, os.path.join(out_dir, "manifest.parquet"))


def read_partitioned(out_dir: str, partitions: list | None = None):
    """Read back selected partitions (or all) through the manifest —
    file-pruned at the source.  A manifest-listed file that is MISSING
    on disk is corruption (the manifest is authoritative): fail loudly
    instead of silently reading a subset."""
    import ray.data as rd

    manifest = pq.read_table(os.path.join(out_dir, "manifest.parquet"))
    paths = manifest.column("path").to_pylist()
    if partitions is not None:
        want = {str(p) for p in partitions}
        parts = manifest.column("partition").to_pylist()
        paths = [p for p, v in zip(paths, parts) if v in want]
    missing = [p for p in paths if not os.path.exists(p)]
    if missing:
        raise FileNotFoundError(
            f"{out_dir}: {len(missing)} manifest-listed partition file(s) "
            f"missing (e.g. {missing[0]}) — the sink directory is "
            "corrupted; refusing to read a silent subset")
    return rd.read_parquet(paths)
