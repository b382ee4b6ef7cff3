"""Partitioned cover-tree index build — the engine's core shuffle stage.

Replaces the reference's single mutex-guarded global tree
(details/tree.cpp:393 — writers serialize on one shared_timed_mutex)
with partition parallelism: rows are bucketed into quadkey geo cells
(`groupby` shuffle), hot cells are salted into sub-partitions from a
count pre-pass (explicit skew handling: cities vs empty ocean —
the distributed analogue of the reference's degenerate-tree warning,
README.md:239-241), and one exact cover tree is built per (cell, salt)
partition inside `map_groups`.

Determinism: rows are sorted by image_id inside each partition before
the sequential build, so the tree shape — which depends on insertion
order (tree.cpp:304-322) — is identical across runs and parallelism
levels.

Resumability: each partition checkpoint is one parquet file named by
(cell, salt), written atomically (tmp + rename); a manifest parquet
records lineage + metrics per partition.  A rerun skips completed
partitions (file presence = completed, because the rename is atomic).

Scale notes (100 TB / 10^12 rows):
- the index is built on NARROW columns only (image_id, lat, lon,
  phash) — image bytes never enter this shuffle (`select_columns`
  before calling build_index);
- the count pre-pass output is tiny (#cells rows) and is broadcast;
- target_partition_rows bounds per-actor heap: a 200k-row partition's
  tree is ~tens of MB;
- checkpoints are one file per partition => resumable and listable;
  the partition-count floor is the occupied-cell count (4^res), so at
  SMALL scale cold cells yield many tiny files (sf0.1: ~1k files of
  ~600 rows) — a test-scale artifact, not a design property: at the
  target 100-TB scale every cell carries orders of magnitude more than
  target_partition_rows and every checkpoint file is full-sized.
"""

from __future__ import annotations

import os
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray.data as rd

from ..covertree import CoverTree
from ..metrics import PlanarDeg
from ..stages import assign

DEFAULT_RES = 6
DEFAULT_TARGET_ROWS = 50_000

CKPT_SCHEMA = pa.schema([
    ("row_id", pa.int64()),        # tree node ID == within-partition insert order
    ("level", pa.int64()),
    ("parent_row_id", pa.int64()),
    ("parent_dist", pa.float64()),
    ("maxdist", pa.float64()),
    ("image_id", pa.string()),
    ("lat", pa.float64()),
    ("lon", pa.float64()),
    ("phash", pa.int64()),
])

MANIFEST_SCHEMA = pa.schema([
    ("cell", pa.int64()),
    ("salt", pa.int64()),
    ("n_rows", pa.int64()),
    ("tree_height", pa.int64()),
    ("build_ms", pa.float64()),
    ("path", pa.string()),
    ("min_image_id", pa.string()),   # lineage: input key range of the partition
    ("max_image_id", pa.string()),
    ("resumed", pa.bool_()),
])


def part_path(ckpt_dir: str, cell_id: int, salt: int) -> str:
    return os.path.join(ckpt_dir, f"part-{np.uint64(np.int64(cell_id)):016x}-{salt:03d}.parquet")


def _cell_counts(ds: "rd.Dataset") -> tuple[np.ndarray, np.ndarray]:
    """Count pre-pass: per-batch partial counts stream to the driver
    (one row per distinct cell per batch, bounded by 4^res per batch)
    and combine with one vectorized pass — no groupby shuffle for a
    result this small.  Returns (cells, totals), both sorted by cell."""
    def partial(batch: pa.Table) -> pa.Table:
        vals, cnt = np.unique(batch.column("cell").to_numpy(), return_counts=True)
        return pa.table({"cell": pa.array(vals, pa.int64()),
                         "partial_n": pa.array(cnt, pa.int64())})

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    cs, ns = [], []
    for b in partials.iter_batches(batch_format="pyarrow", batch_size=None):
        cs.append(b.column("cell").to_numpy())
        ns.append(b.column("partial_n").to_numpy())
    if not cs:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    cs = np.concatenate(cs)
    ns = np.concatenate(ns)
    cells, inv = np.unique(cs, return_inverse=True)
    totals = np.zeros(len(cells), np.int64)
    np.add.at(totals, inv, ns)
    return cells, totals


def plan_salts(ds: "rd.Dataset", target_rows: int = DEFAULT_TARGET_ROWS) -> dict[int, int]:
    """Cells with more than target_rows get k > 1 salts."""
    cells, totals = _cell_counts(ds)
    k = np.maximum(1, np.ceil(totals / target_rows)).astype(int)
    return {int(c): int(n) for c, n in zip(cells, k) if n > 1}


def _pack_bins(cells: np.ndarray, totals: np.ndarray,
               salt_plan: dict[int, int], n_bins: int
               ) -> tuple[np.ndarray, np.ndarray, int]:
    """LPT bin-pack every (cell, salt) partition into ``n_bins``
    row-balanced build tasks.

    The per-partition tree build is the expensive leg of the build
    shuffle, and partition sizes are long-tailed (cold ocean cells vs
    salted city caps): grouping by (cell, salt) directly hands Ray's
    sort-based shuffle long-tailed groups, and the resulting map_groups
    task times spread ~6x — a last-wave straggler at every parallelism
    level (measured 67% worker occupancy at 8 cpus).  Packing the
    known partition row counts (free — the salting pre-pass already
    counted them) into equal-row bins and grouping by the bin id makes
    every build task the same size by construction.

    Returns (composite keys sorted asc, bin id per key, salt modulus S)
    where composite key = rank(cell) * S + salt — cell RANKS, not raw
    quadkey ids, keep the composite inside int64 at any resolution.
    """
    import heapq

    S = max(salt_plan.values(), default=1)
    keys: list[int] = []
    rows: list[float] = []
    for r, (c, n) in enumerate(zip(cells, totals)):
        k = salt_plan.get(int(c), 1)
        for s in range(k):
            keys.append(r * S + s)
            rows.append(n / k)
    if not keys:
        return np.empty(0, np.int64), np.empty(0, np.int64), S
    keys_a = np.asarray(keys, np.int64)
    rows_a = np.asarray(rows, np.float64)
    bin_of = np.empty(len(keys_a), np.int64)
    heap = [(0.0, b) for b in range(max(1, n_bins))]
    for i in np.argsort(-rows_a, kind="stable"):
        load, b = heapq.heappop(heap)
        bin_of[i] = b
        heapq.heappush(heap, (load + rows_a[i], b))
    order = np.argsort(keys_a, kind="stable")
    return keys_a[order], bin_of[order], S


def _assign_bin(batch: pa.Table, cells_sorted: np.ndarray,
                keys_sorted: np.ndarray, bins: np.ndarray,
                S: int) -> pa.Table:
    """Vectorized (cell, salt) -> build-task bin lookup."""
    if len(keys_sorted) == 0:
        return batch.append_column(
            "bin", pa.array(np.zeros(batch.num_rows, np.int64), pa.int64()))
    rank = np.searchsorted(cells_sorted, batch.column("cell").to_numpy())
    comp = rank * S + batch.column("salt").to_numpy()
    idx = np.minimum(np.searchsorted(keys_sorted, comp), len(keys_sorted) - 1)
    out = bins[idx]
    # a (cell, salt) present in this scan but absent from the count
    # pre-pass (non-deterministic source between the two scans) would
    # otherwise read an arbitrary neighbor's bin — route it by hash
    # instead; ANY bin is correct because _build_bin splits its rows by
    # (cell, salt) before building
    miss = keys_sorted[idx] != comp
    if miss.any():
        out = out.copy()
        out[miss] = bins[comp[miss] % len(bins)]
    return batch.append_column("bin", pa.array(out, pa.int64()))


def _build_bin(tbl: pa.Table, ckpt_dir: str, resume: bool) -> pa.Table:
    """Build every (cell, salt) partition present in one bin's rows."""
    if tbl.num_rows == 0:
        return MANIFEST_SCHEMA.empty_table()
    cells = tbl.column("cell").to_numpy()
    salts = tbl.column("salt").to_numpy()
    order = np.lexsort((salts, cells))
    srt = tbl.take(pa.array(order))
    # boundary where either key changes (no composite — raw quadkey ids
    # times a salt modulus can overflow int64)
    bounds = np.flatnonzero((np.diff(cells[order]) != 0)
                            | (np.diff(salts[order]) != 0)) + 1
    starts = np.concatenate(([0], bounds))
    stops = np.concatenate((bounds, [len(cells)]))
    return pa.concat_tables(
        _build_partition(srt.slice(a, b - a), ckpt_dir, resume)
        for a, b in zip(starts, stops))


def _split_by_bin(block, n_bins: int, route=None):
    """Map side of the exact exchange: one sub-table per bin.

    ``route`` (optional) fuses the salt + bin assignment into this
    task: a (salt_plan, cells_sorted, keys_sorted, bins, S) tuple (the
    arguments ``assign_salt`` / ``_assign_bin`` need).  The fused form
    lets ``build_index`` route the TAGGED blocks directly — the
    standalone salted map_batches + materialize pass wrote one full
    extra copy of the projection through the object store just to
    append two int64 columns."""
    from ..stages import assign as _assign

    tbl = block if isinstance(block, pa.Table) else pa.Table.from_pandas(block)
    if route is not None:
        salt_plan, cells_sorted, keys_sorted, bins, S = route
        tbl = _assign_bin(_assign.assign_salt(tbl, salt_plan),
                          cells_sorted, keys_sorted, bins, S)
    bins_col = tbl.column("bin").to_numpy()
    order = np.argsort(bins_col, kind="stable")
    srt = tbl.take(pa.array(order))
    counts = np.bincount(bins_col, minlength=n_bins)
    stops = np.cumsum(counts)
    starts = stops - counts
    out = [srt.slice(int(a), int(b - a)) for a, b in zip(starts, stops)]
    return out if n_bins > 1 else out[0]


def _build_bin_shards(ckpt_dir: str, resume: bool, *shards) -> pa.Table:
    """Reduce side of the exact exchange: build one bin from its shards."""
    parts = [s for s in shards if s.num_rows]
    if not parts:
        return MANIFEST_SCHEMA.empty_table()
    return _build_bin(pa.concat_tables(parts), ckpt_dir, resume)


def _exact_exchange_build(salted_mat: "rd.Dataset", ckpt_dir: str,
                          resume: bool, n_bins: int,
                          route=None) -> pa.Table:
    """Exact bin-routed exchange over raw Ray tasks.

    Ray Data's sort-based groupby shuffle picks reducer boundaries from
    ~10 samples per reducer, so output block row counts spread ~5x
    around the mean (measured 31k-150k rows at a 75k target) — the
    build tasks inherit that spread and the last wave straggles
    (67% worker occupancy at 8 cpus).  Here the bin id IS the target
    partition, known exactly per row, so the Dataset API's shuffle
    machinery (sampling, sorting) buys nothing: M split tasks each cut
    one materialized block into n_bins sub-tables (num_returns=n_bins),
    and n_bins build tasks each pull their M shards.  Object count is
    M x n_bins, bounded by (tasks-per-cpu x cpus)^2 per exchange —
    at multi-node scale keep n_bins ~ cluster cores (bins already pack
    to target_rows-bounded partitions, so bin count, not row count,
    governs the fan-out).
    """
    import ray as _ray

    block_refs = [br for bundle in salted_mat.iter_internal_ref_bundles()
                  for br in bundle.block_refs]
    if not block_refs:
        return MANIFEST_SCHEMA.empty_table()
    split = _ray.remote(num_returns=n_bins)(_split_by_bin)
    route_ref = _ray.put(route) if route is not None else None
    shards = [split.remote(ref, n_bins, route_ref) for ref in block_refs]
    if n_bins == 1:
        shards = [[s] for s in shards]
    build_task = _ray.remote(_build_bin_shards)
    outs = [build_task.remote(ckpt_dir, resume, *[s[b] for s in shards])
            for b in range(n_bins)]
    return pa.concat_tables(_ray.get(outs))


def _cell_counts_from_refs(mat_ds) -> tuple[np.ndarray, np.ndarray]:
    """``_cell_counts`` over an already-materialized dataset's block
    refs with raw tasks — no second Dataset execution pass, no block
    copies; one (cells, counts) pair returns per block."""
    import ray as _ray

    refs = [br for bundle in mat_ds.iter_internal_ref_bundles()
            for br in bundle.block_refs]
    if not refs:
        return np.empty(0, np.int64), np.empty(0, np.int64)

    @_ray.remote
    def part(blk):
        tbl = blk if isinstance(blk, pa.Table) else pa.Table.from_pandas(blk)
        vals, cnt = np.unique(tbl.column("cell").to_numpy(),
                              return_counts=True)
        return vals, cnt.astype(np.int64)

    outs = _ray.get([part.remote(r) for r in refs])
    cs = np.concatenate([v for v, _ in outs])
    ns = np.concatenate([c for _, c in outs])
    cells, inv = np.unique(cs, return_inverse=True)
    totals = np.zeros(len(cells), np.int64)
    np.add.at(totals, inv, ns)
    return cells, totals


def _build_partition(tbl: pa.Table, ckpt_dir: str, resume: bool) -> pa.Table:
    cell_id = int(tbl.column("cell")[0].as_py())
    salt = int(tbl.column("salt")[0].as_py())
    path = part_path(ckpt_dir, cell_id, salt)
    ids = tbl.column("image_id").to_numpy(zero_copy_only=False)
    order = np.argsort(ids, kind="stable")  # determinism contract
    if resume and os.path.exists(path):
        md = pq.read_metadata(path)
        lv = pq.read_table(path, columns=["level"]).column("level").to_numpy()
        return pa.table({
            "cell": [cell_id], "salt": [salt], "n_rows": [md.num_rows],
            "tree_height": [int(lv.max() - lv.min()) if len(lv) else 0],
            "build_ms": [0.0], "path": [path],
            "min_image_id": [str(ids[order[0]])], "max_image_id": [str(ids[order[-1]])],
            "resumed": [True],
        }, schema=MANIFEST_SCHEMA)

    t0 = time.perf_counter()
    lat = tbl.column("lat").to_numpy()[order]
    lon = tbl.column("lon").to_numpy()[order]
    ph = tbl.column("phash").to_numpy()[order]
    ids_sorted = ids[order]
    pts = np.stack([lat, lon], axis=1)
    # flat-array builder: bit-identical to sequential CoverTree.insert
    # (asserted in tests), ~10x faster — the build loop dominated the
    # headline pipeline before (BENCH r1)
    from ..covertree import build_planar_tree_arrays
    arrays = build_planar_tree_arrays(pts)
    node_ids = arrays["ID"]
    # covering invariant over stored edges: parent_dist is the exact
    # parent-child distance, so the check is one vectorized compare
    lvl_by_id = np.empty(len(node_ids), np.int64)
    lvl_by_id[node_ids] = arrays["level"]
    has_parent = arrays["parent_ID"] >= 0
    cov = np.power(2.0, lvl_by_id[arrays["parent_ID"][has_parent]].astype(np.float64))
    if not np.all(arrays["parent_dist"][has_parent] <= cov):
        raise AssertionError(f"covering invariant violated in partition {cell_id}/{salt}")
    node_tbl = pa.table({
        "row_id": pa.array(node_ids, pa.int64()),
        "level": pa.array(arrays["level"], pa.int64()),
        "parent_row_id": pa.array(arrays["parent_ID"], pa.int64()),
        "parent_dist": pa.array(arrays["parent_dist"], pa.float64()),
        "maxdist": pa.array(arrays["maxdist"], pa.float64()),
        "image_id": pa.array(ids_sorted[node_ids], pa.string()),
        "lat": pa.array(lat[node_ids], pa.float64()),
        "lon": pa.array(lon[node_ids], pa.float64()),
        "phash": pa.array(ph[node_ids], pa.int64()),
    }, schema=CKPT_SCHEMA)
    tmp = path + f".tmp.{os.getpid()}"
    pq.write_table(node_tbl, tmp)
    os.replace(tmp, path)  # atomic completion marker
    ms = (time.perf_counter() - t0) * 1000
    lv = arrays["level"]
    return pa.table({
        "cell": [cell_id], "salt": [salt], "n_rows": [len(node_ids)],
        "tree_height": [int(lv.max() - lv.min()) if len(lv) else 0],
        "build_ms": [ms], "path": [path],
        "min_image_id": [str(ids_sorted[0])], "max_image_id": [str(ids_sorted[-1])],
        "resumed": [False],
    }, schema=MANIFEST_SCHEMA)


def build_index(ds: "rd.Dataset", ckpt_dir: str, res: int = DEFAULT_RES,
                target_rows: int = DEFAULT_TARGET_ROWS, resume: bool = True,
                id_column: str = "image_id",
                materialize_tagged: bool = False) -> pa.Table:
    """images Dataset -> per-partition cover-tree checkpoints + manifest.

    ``ds`` needs columns (image_id, phash); geotag/cell/salt columns are
    derived here.  Returns the manifest table (small: one row per
    partition) and writes ``manifest.parquet`` into ckpt_dir.

    ``materialize_tagged``: pin the narrow tagged columns in the object
    store so the salting count pre-pass and the main shuffle share one
    source scan.  Off by default (streaming, two scans); turn on when
    the narrow projection comfortably fits the object store.
    """
    os.makedirs(ckpt_dir, exist_ok=True)
    import ray as _ray
    # block count for the groupby exchange: groupby emits one sorted
    # block per input block and map_groups parallelism == block count.
    # 4 tasks/CPU; measured both directions: 16 coarse blocks leave a
    # 2-wave straggler tail at 8 cpus, while passing a well-split read
    # straight through (192 blocks) costs more in O(B^2) shuffle-object
    # handling than the tail it saves.
    n_blocks = max(16, 4 * int(_ray.cluster_resources().get("CPU", 8)))
    narrow = ds.select_columns([id_column, "phash"])
    tagged = (narrow
              .map_batches(assign.geotag, batch_format="pyarrow", zero_copy_batch=True)
              # drop the microdegree columns once the cell is assigned:
              # nothing downstream reads them, and they are 24 of the
              # ~67 bytes/row the groupby exchange would otherwise move
              .map_batches(lambda b: assign.assign_cell(b, res)
                           .drop_columns(["lat_u", "lon_u"]),
                           batch_format="pyarrow", zero_copy_batch=True))
    if materialize_tagged:
        # coalesce INSIDE the materialize barrier: the later shuffle
        # then starts from n_blocks directly — one fewer standalone
        # repartition execution between the salt map and the groupby
        tagged = tagged.repartition(n_blocks).materialize()
        # count pre-pass over the pinned block refs with raw tasks —
        # a second Dataset execution pass over the same blocks costs
        # ~0.25 s of fixed executor spin at sf0.1 and reads nothing new
        cells, totals = _cell_counts_from_refs(tagged)
    else:
        cells, totals = _cell_counts(tagged)
    k = np.maximum(1, np.ceil(totals / target_rows)).astype(int)
    salt_plan = {int(c): int(n) for c, n in zip(cells, k) if n > 1}
    # persist the plan: incremental update/erase must route with the
    # SAME modulus even after partitions empty out of the manifest
    import json as _json
    _tmp = os.path.join(ckpt_dir, f"salts.tmp.{os.getpid()}")
    with open(_tmp, "w") as f:
        _json.dump({str(c): k for c, k in salt_plan.items()}, f)
    os.replace(_tmp, os.path.join(ckpt_dir, "salts.json"))
    # row-balanced build tasks: pack the known (cell, salt) partition
    # sizes into n_blocks equal-row bins and shuffle by the bin id —
    # the per-(cell,salt) groupby handed the executor 6x-skewed build
    # tasks (last-wave stragglers; 67% occupancy at 8 cpus)
    keys_sorted, bins, S = _pack_bins(cells, totals, salt_plan, n_blocks)
    if materialize_tagged:
        # the narrow tagged projection is already pinned in the object
        # store — route it through the exact bin exchange with the
        # salt + bin assignment FUSED into the split tasks (the
        # standalone salted map_batches + materialize wrote one full
        # extra copy through the object store to append two columns)
        manifest = _exact_exchange_build(
            tagged, ckpt_dir, resume, n_blocks,
            route=(salt_plan, cells, keys_sorted, bins, S))
    else:
        salted = tagged.map_batches(
            lambda b: _assign_bin(assign.assign_salt(b, salt_plan),
                                  cells, keys_sorted, bins, S),
            batch_format="pyarrow", zero_copy_batch=True)
        # streaming path (projection larger than the object store):
        # the source may be a single parquet file — split so every CPU
        # gets build work, then let the sort-based groupby shuffle
        # stream with backpressure; bins keep the build tasks balanced
        # even though reducer block sizes spread on sampled boundaries
        salted = salted.repartition(n_blocks)
        manifest_ds = salted.groupby("bin").map_groups(
            lambda t: _build_bin(t, ckpt_dir, resume), batch_format="pyarrow")
        manifest = pa.Table.from_pandas(manifest_ds.to_pandas(),
                                        schema=MANIFEST_SCHEMA,
                                        preserve_index=False)
    tmp = os.path.join(ckpt_dir, f"manifest.tmp.{os.getpid()}")
    pq.write_table(manifest, tmp)
    os.replace(tmp, os.path.join(ckpt_dir, "manifest.parquet"))
    return manifest


def load_manifest(ckpt_dir: str) -> pa.Table:
    return pq.read_table(os.path.join(ckpt_dir, "manifest.parquet"))


def load_partition_tree(path: str, metric=None) -> tuple[CoverTree, pa.Table]:
    """Checkpoint file -> (rebuilt CoverTree, node table).

    Pointer rebuild from parent_row_id replaces the reference's
    stack-driven deserialize (tree.cpp:1041-1080); preorder row order
    preserves children order, so the restored tree is structurally
    identical (same_tree parity, tested).
    """
    tbl = pq.read_table(path)
    lat = tbl.column("lat").to_numpy()
    lon = tbl.column("lon").to_numpy()
    tree = CoverTree.from_arrays({
        "ID": tbl.column("row_id").to_numpy(),
        "level": tbl.column("level").to_numpy(),
        "parent_ID": tbl.column("parent_row_id").to_numpy(),
        "parent_dist": tbl.column("parent_dist").to_numpy(),
        "maxdist": tbl.column("maxdist").to_numpy(),
        "data": np.stack([lat, lon], axis=1),
    }, metric=metric if metric is not None else PlanarDeg())
    return tree, tbl


def cells_in_manifest(manifest: pa.Table) -> dict[int, list[tuple[int, str]]]:
    """cell -> [(salt, path), ...] lookup for the query side."""
    out: dict[int, list[tuple[int, str]]] = {}
    for c, s, p in zip(manifest.column("cell").to_pylist(),
                       manifest.column("salt").to_pylist(),
                       manifest.column("path").to_pylist()):
        out.setdefault(int(c), []).append((int(s), p))
    return out


# ----------------------------------------------------- incremental updates


def salt_plan_from_manifest(manifest: pa.Table,
                            ckpt_dir: str | None = None) -> dict[int, int]:
    """cell -> #salts for incremental routing.  Prefers the persisted
    ``salts.json`` sidecar (authoritative: survives partitions
    emptying out of the manifest); falls back to max(salt)+1 per cell
    — NOT the row count, which under-counts once any middle salt's
    partition is dropped."""
    if ckpt_dir is not None:
        p = os.path.join(ckpt_dir, "salts.json")
        if os.path.exists(p):
            import json as _json
            with open(p) as f:
                return {int(c): int(k) for c, k in _json.load(f).items()}
    cells = manifest.column("cell").to_numpy()
    salts = manifest.column("salt").to_numpy()
    plan: dict[int, int] = {}
    for c, s in zip(cells, salts):
        k = int(s) + 1
        if k > plan.get(int(c), 1):
            plan[int(c)] = k
    return {c: k for c, k in plan.items() if k > 1}


def _route(ds: "rd.Dataset", res: int, salt_plan: dict[int, int],
           id_column: str) -> "rd.Dataset":
    return (ds.map_batches(lambda b: assign.geotag(b, id_column),
                           batch_format="pyarrow", zero_copy_batch=True)
            .map_batches(lambda b: assign.assign_cell(b, res),
                         batch_format="pyarrow", zero_copy_batch=True)
            .map_batches(lambda b: assign.assign_salt(b, salt_plan,
                                                      id_column),
                         batch_format="pyarrow", zero_copy_batch=True))


def _manifest_row(cell_id: int, salt: int, path: str, tbl_len: int,
                  levels: np.ndarray, ids_by_node: np.ndarray,
                  ms: float) -> pa.Table:
    srt = np.sort(ids_by_node.astype(str)) if tbl_len else np.asarray([""])
    return pa.table({
        "cell": [cell_id], "salt": [salt], "n_rows": [tbl_len],
        "tree_height": [int(levels.max() - levels.min()) if tbl_len else 0],
        "build_ms": [ms], "path": [path],
        "min_image_id": [str(srt[0])], "max_image_id": [str(srt[-1])],
        "resumed": [False],
    }, schema=MANIFEST_SCHEMA)


def _rewrite_partition(tree: "CoverTree", meta_by_id: dict, path: str,
                       cell_id: int, salt: int, t0: float) -> pa.Table:
    arrays = tree.to_arrays()
    node_ids = arrays["ID"]
    if len(node_ids) == 0:
        if os.path.exists(path):
            os.remove(path)          # partition fully erased
        return _manifest_row(cell_id, salt, path, 0,
                             np.zeros(0, np.int64), np.asarray([], object),
                             (time.perf_counter() - t0) * 1000)
    lvl_by_id = {int(i): int(l) for i, l in zip(node_ids, arrays["level"])}
    has_parent = arrays["parent_ID"] >= 0
    cov = np.asarray([2.0 ** lvl_by_id[int(p)]
                      for p in arrays["parent_ID"][has_parent]])
    if not np.all(arrays["parent_dist"][has_parent] <= cov):
        raise AssertionError(f"covering invariant violated after update "
                             f"{cell_id}/{salt}")
    img = np.asarray([meta_by_id[int(i)][0] for i in node_ids], object)
    ph = np.asarray([meta_by_id[int(i)][1] for i in node_ids], np.int64)
    data = np.asarray(arrays["data"], np.float64)
    node_tbl = pa.table({
        "row_id": pa.array(node_ids, pa.int64()),
        "level": pa.array(arrays["level"], pa.int64()),
        "parent_row_id": pa.array(arrays["parent_ID"], pa.int64()),
        "parent_dist": pa.array(arrays["parent_dist"], pa.float64()),
        "maxdist": pa.array(arrays["maxdist"], pa.float64()),
        "image_id": pa.array(img, pa.string()),
        "lat": pa.array(data[:, 0], pa.float64()),
        "lon": pa.array(data[:, 1], pa.float64()),
        "phash": pa.array(ph, pa.int64()),
    }, schema=CKPT_SCHEMA)
    tmp = path + f".tmp.{os.getpid()}"
    pq.write_table(node_tbl, tmp)
    os.replace(tmp, path)
    return _manifest_row(cell_id, salt, path, len(node_ids),
                         arrays["level"], img,
                         (time.perf_counter() - t0) * 1000)


def _merge_manifest(ckpt_dir: str, updated: pa.Table) -> pa.Table:
    """Replace/add the updated partitions' rows; drop emptied ones."""
    import pyarrow.compute  # noqa: F401  (pa.compute below)

    old = load_manifest(ckpt_dir)
    upd_keys = set(zip(updated.column("cell").to_pylist(),
                       updated.column("salt").to_pylist()))
    keep = [i for i in range(old.num_rows)
            if (old.column("cell")[i].as_py(),
                old.column("salt")[i].as_py()) not in upd_keys]
    merged = pa.concat_tables([
        old.take(pa.array(keep, pa.int64())),
        updated.filter(pa.compute.greater(updated.column("n_rows"), 0)),
    ]).combine_chunks()
    tmp = os.path.join(ckpt_dir, f"manifest.tmp.{os.getpid()}")
    pq.write_table(merged, tmp)
    os.replace(tmp, os.path.join(ckpt_dir, "manifest.parquet"))
    return merged


def update_index(new_ds: "rd.Dataset", ckpt_dir: str,
                 id_column: str = "image_id") -> pa.Table:
    """Distributed incremental INSERT into an existing partitioned
    index — the reference's ``insert`` (tree.cpp:304-356) at engine
    scale: new rows route to their (cell, salt) partition with the
    same pure assignment the build used, each affected partition's
    tree absorbs its rows via sequential ``CoverTree.insert`` (sorted
    by id — deterministic append order), and checkpoints + manifest
    rewrite atomically.  Untouched partitions are not read.  Returns
    the merged manifest."""
    manifest = load_manifest(ckpt_dir)
    from .. import cell as cellmod
    res = int(cellmod.cell_res(manifest.column("cell").to_numpy()[:1])[0])
    narrow = new_ds.select_columns([id_column, "phash"])
    if id_column != "image_id":
        # checkpoint schema stores ids under image_id (CKPT_SCHEMA);
        # rename up front so the new-partition path works too
        narrow = narrow.map_batches(
            lambda b: b.rename_columns(["image_id", "phash"]),
            batch_format="pyarrow", zero_copy_batch=True)
        id_column = "image_id"
    routed = _route(narrow, res,
                    salt_plan_from_manifest(manifest, ckpt_dir), id_column)

    def upd(tbl: pa.Table) -> pa.Table:
        cell_id = int(tbl.column("cell")[0].as_py())
        salt = int(tbl.column("salt")[0].as_py())
        path = part_path(ckpt_dir, cell_id, salt)
        t0 = time.perf_counter()
        ids = tbl.column(id_column).to_numpy(zero_copy_only=False)
        order = np.argsort(ids.astype(str), kind="stable")
        if not os.path.exists(path):
            return _build_partition(tbl, ckpt_dir, resume=False)
        tree, node_tbl = load_partition_tree(path)
        tree.N = int(node_tbl.column("row_id").to_numpy().max()) + 1
        meta_by_id = {int(r): (i, int(p)) for r, i, p in zip(
            node_tbl.column("row_id").to_pylist(),
            node_tbl.column("image_id").to_pylist(),
            node_tbl.column("phash").to_pylist())}
        lat = tbl.column("lat").to_numpy()[order]
        lon = tbl.column("lon").to_numpy()[order]
        ph = tbl.column("phash").to_numpy()[order]
        for j in range(len(order)):
            nid = tree.N
            tree.insert(np.asarray([lat[j], lon[j]], np.float64))
            meta_by_id[nid] = (str(ids[order[j]]), int(ph[j]))
        return _rewrite_partition(tree, meta_by_id, path, cell_id, salt, t0)

    updated_ds = routed.groupby(["cell", "salt"]).map_groups(
        upd, batch_format="pyarrow")
    updated = pa.Table.from_pandas(updated_ds.to_pandas(),
                                   schema=MANIFEST_SCHEMA,
                                   preserve_index=False)
    return _merge_manifest(ckpt_dir, updated)


def apply_changes(changes_ds, ckpt_dir: str, id_column: str = "image_id",
                  op_column: str = "op") -> pa.Table:
    """CDC merge into an existing partitioned index: one streaming pass
    that applies a changelog of ``upsert`` / ``delete`` rows, touching
    each affected partition exactly ONCE (composing
    ``erase_from_index`` + ``update_index`` would read and atomically
    rewrite the hot partitions twice).

    ``changes_ds``: Dataset (or pa.Table) with (id, phash, op) where op
    is 'upsert' or 'delete'.  Semantics per partition, deterministic:
    deletes first (sorted by id), then upserts sorted by id — an upsert
    of an existing id erases its point before reinserting (reference
    erase tree.cpp:526-582 + insert tree.cpp:304-356).  Ids route
    purely (geotag/salt derive from the id), so only partitions named
    by the changelog are read; checkpoint files and the manifest
    rewrite atomically, keeping the run resumable.
    """
    import ray.data as _rd

    if isinstance(changes_ds, pa.Table):
        changes_ds = _rd.from_arrow(changes_ds)
    manifest = load_manifest(ckpt_dir)
    from .. import cell as cellmod
    res = int(cellmod.cell_res(manifest.column("cell").to_numpy()[:1])[0])
    narrow = changes_ds.select_columns([id_column, "phash", op_column])
    if id_column != "image_id":
        narrow = narrow.map_batches(
            lambda b: b.rename_columns(["image_id", "phash", op_column]),
            batch_format="pyarrow", zero_copy_batch=True)
    routed = _route(narrow, res, salt_plan_from_manifest(manifest, ckpt_dir),
                    "image_id")

    def merge(tbl: pa.Table) -> pa.Table:
        cell_id = int(tbl.column("cell")[0].as_py())
        salt = int(tbl.column("salt")[0].as_py())
        path = part_path(ckpt_dir, cell_id, salt)
        t0 = time.perf_counter()
        ops = np.asarray(tbl.column(op_column).to_pylist(), object)
        bad = set(ops) - {"upsert", "delete"}
        if bad:
            raise ValueError(f"unknown change op(s): {sorted(bad)}")
        ids = tbl.column("image_id").to_numpy(zero_copy_only=False
                                              ).astype(str)
        ups = np.flatnonzero(ops == "upsert")
        if not os.path.exists(path):
            # brand-new partition: only the upserts materialize; a
            # changelog can carry several upserts of one key — keep the
            # LAST occurrence per id (the existing-partition path's
            # erase-then-reinsert sequence lands on the same last-wins
            # state), else the key would be inserted multiple times
            if len(ups) == 0:
                return MANIFEST_SCHEMA.empty_table()
            last_of: dict = {}
            for j in ups:
                last_of[ids[j]] = j
            keep = np.asarray(sorted(last_of.values()), np.int64)
            return _build_partition(tbl.take(pa.array(keep, pa.int64())),
                                    ckpt_dir, resume=False)
        tree, node_tbl = load_partition_tree(path)
        # monotone id allocator: CoverTree.erase decrements N (reference
        # semantics), so after erases a plain tree.N insert would REUSE
        # a live node's id — corrupting the id-keyed metadata; ids here
        # only ever grow and erased ids are never reissued
        next_id = int(node_tbl.column("row_id").to_numpy().max()) + 1
        tree.N = next_id
        meta_by_id = {int(r): (i, int(p)) for r, i, p in zip(
            node_tbl.column("row_id").to_pylist(),
            node_tbl.column("image_id").to_pylist(),
            node_tbl.column("phash").to_pylist())}
        by_img = {i: int(r) for r, (i, _) in meta_by_id.items()}
        lat_by_id = dict(zip(node_tbl.column("row_id").to_pylist(),
                             zip(node_tbl.column("lat").to_pylist(),
                                 node_tbl.column("lon").to_pylist())))

        def erase_one(img: str) -> None:
            """Erase one id's point EXACTLY.  Point-erase may remove a
            coordinate TWIN's node instead of the target's (identical
            coordinates — hashed int keys collide mod 2^31); when that
            happens, relabel the target's surviving node with the
            twin's identity: the tree is unchanged (equal coordinates),
            the twin lives on under the surviving node id, and the
            TARGET's record is the one that disappears — without this,
            a replace (erase + reinsert) left the target's old record
            in place and silently dropped the untouched twin."""
            rid = by_img.get(img)
            if rid is None:
                return
            la, lo = lat_by_id[rid]
            if tree.erase(np.asarray([la, lo], np.float64)):
                if rid in tree._by_id:
                    # a twin's node left: move its identity onto the
                    # target's surviving node, then drop the target
                    gone = next(i for i in meta_by_id
                                if i not in tree._by_id)
                    twin_img, twin_ph = meta_by_id[gone]
                    meta_by_id[rid] = (twin_img, twin_ph)
                    by_img[twin_img] = rid
                    meta_by_id.pop(gone, None)
                    lat_by_id.pop(gone, None)
                    by_img.pop(img, None)
                else:
                    meta_by_id.pop(rid, None)
                    by_img.pop(img, None)

        dels = np.flatnonzero(ops == "delete")
        for img in sorted(ids[dels]):
            erase_one(img)
        order = ups[np.argsort(ids[ups], kind="stable")]
        lat = tbl.column("lat").to_numpy()
        lon = tbl.column("lon").to_numpy()
        ph = tbl.column("phash").to_numpy()
        for j in order:
            img = ids[j]
            if img in by_img:                        # replace = erase first
                erase_one(img)
            nid = tree.N = next_id
            tree.insert(np.asarray([float(lat[j]), float(lon[j])],
                                   np.float64))
            next_id += 1
            meta_by_id[nid] = (img, int(ph[j]))
            by_img[img] = nid
            lat_by_id[nid] = (float(lat[j]), float(lon[j]))
        return _rewrite_partition(tree, meta_by_id, path, cell_id, salt, t0)

    updated_ds = routed.groupby(["cell", "salt"]).map_groups(
        merge, batch_format="pyarrow")
    updated = pa.Table.from_pandas(updated_ds.to_pandas(),
                                   schema=MANIFEST_SCHEMA,
                                   preserve_index=False)
    return _merge_manifest(ckpt_dir, updated)


def erase_from_index(ids, ckpt_dir: str) -> pa.Table:
    """Distributed ERASE by id — the reference's ``erase``
    (tree.cpp:526-582) with the engine's documented orphan-record
    reinsertion fix.  Ids route purely (their geotag/salt derive from
    the id), so only partitions that actually hold them are touched."""
    import ray.data as _rd

    manifest = load_manifest(ckpt_dir)
    from .. import cell as cellmod
    res = int(cellmod.cell_res(manifest.column("cell").to_numpy()[:1])[0])
    ids = [str(i) for i in ids]
    ds = _rd.from_arrow(pa.table({
        "image_id": pa.array(ids, pa.string()),
        "phash": pa.array(np.zeros(len(ids), np.int64)),
    }))
    routed = _route(ds, res, salt_plan_from_manifest(manifest, ckpt_dir),
                    "image_id")

    def er(tbl: pa.Table) -> pa.Table:
        cell_id = int(tbl.column("cell")[0].as_py())
        salt = int(tbl.column("salt")[0].as_py())
        path = part_path(ckpt_dir, cell_id, salt)
        t0 = time.perf_counter()
        if not os.path.exists(path):
            return pa.table({c: [] for c in MANIFEST_SCHEMA.names},
                            schema=MANIFEST_SCHEMA)
        tree, node_tbl = load_partition_tree(path)
        tree.N = int(node_tbl.column("row_id").to_numpy().max()) + 1
        meta_by_id = {int(r): (i, int(p)) for r, i, p in zip(
            node_tbl.column("row_id").to_pylist(),
            node_tbl.column("image_id").to_pylist(),
            node_tbl.column("phash").to_pylist())}
        by_img = {i: int(r) for r, (i, _) in meta_by_id.items()}
        lat_by_id = dict(zip(node_tbl.column("row_id").to_pylist(),
                             zip(node_tbl.column("lat").to_pylist(),
                                 node_tbl.column("lon").to_pylist())))
        for img in sorted(tbl.column("image_id").to_pylist()):
            rid = by_img.get(img)
            if rid is None:
                continue
            la, lo = lat_by_id[rid]
            if tree.erase(np.asarray([la, lo], np.float64)):
                # erase is by POINT (reference semantics): with exact
                # coordinate twins the removed node may carry a twin's
                # id — drop whichever id actually left the tree
                if rid not in tree._by_id:
                    meta_by_id.pop(rid, None)
                else:
                    gone = next(i for i in meta_by_id
                                if i not in tree._by_id)
                    meta_by_id.pop(gone, None)
        return _rewrite_partition(tree, meta_by_id, path, cell_id, salt, t0)

    updated_ds = routed.groupby(["cell", "salt"]).map_groups(
        er, batch_format="pyarrow")
    updated = pa.Table.from_pandas(updated_ds.to_pandas(),
                                   schema=MANIFEST_SCHEMA,
                                   preserve_index=False)
    return _merge_manifest(ckpt_dir, updated)


def compact_index(ckpt_dir: str, target_rows: int = DEFAULT_TARGET_ROWS
                  ) -> pa.Table:
    """Checkpoint COMPACTION for a CDC-mutated index: cells whose row
    totals have drifted from their salt plan (``apply_changes`` /
    ``update_index`` / ``erase_from_index`` churn) are re-salted to
    ``k' = ceil(total / target_rows)`` and rebuilt fresh — one task per
    affected cell, untouched cells never read.

    Normalization guarantee (tested): a compacted cell's partition
    files are BIT-IDENTICAL to a fresh ``build_index`` of the same
    surviving points at the same ``target_rows`` — ascending-id
    insertion through the same salt hash — so compaction also repairs
    erase-degraded tree shapes, not just sizes.

    Crash safety (what IS and is NOT guaranteed): every individual file
    write is atomic (tmp + rename) and the write order is new partition
    files -> manifest -> salts.json -> stale-salt unlink, BUT the
    operation as a whole is not atomic: a crash after some new files
    land but before the manifest rewrite leaves a window where the old
    manifest still references stale salts whose rows now ALSO live in
    the rewritten low salts — concurrent queries in that window can see
    duplicated rows.  Recovery is idempotent: ``compact_cell`` keeps ONE
    row per image_id when it concatenates a cell's files (torn-run
    duplicates are exact row copies, so any keeper is correct), so
    re-running ``compact_index`` after a crash reconstructs the exact
    surviving set; run compaction when
    the index is not serving queries, or re-run it on restart before
    serving.  Returns the merged manifest.
    """
    import ray as _ray

    from .. import geocode

    manifest = load_manifest(ckpt_dir)
    plan = salt_plan_from_manifest(manifest, ckpt_dir)
    cells = manifest.column("cell").to_numpy()
    rows = manifest.column("n_rows").to_numpy()
    uc = np.unique(cells)
    totals = np.zeros(len(uc), np.int64)
    np.add.at(totals, np.searchsorted(uc, cells), rows)
    todo: list[tuple[int, int, int]] = []     # (cell, k_now, k_new)
    for c, tot in zip(uc, totals):
        k_now = plan.get(int(c), 1)
        k_new = max(1, int(np.ceil(tot / target_rows)))
        if k_new != k_now:
            todo.append((int(c), k_now, k_new))
    if not todo:
        return manifest

    by_cell = cells_in_manifest(manifest)

    @_ray.remote
    def compact_cell(cell_id: int, paths: list, k_new: int):
        import pyarrow.parquet as _pq
        cols = ["image_id", "lat", "lon", "phash"]
        tbl = pa.concat_tables([_pq.read_table(p, columns=cols)
                                for p in paths])
        # dedupe by id: after a TORN previous compaction a row can
        # appear in both its old-salt and new-salt file; keeping the
        # first occurrence of each id makes crash recovery idempotent
        # (duplicates are exact row copies, so any keeper is correct)
        ids = tbl.column("image_id").to_numpy(zero_copy_only=False)
        _, first = np.unique(ids, return_index=True)
        if len(first) != len(ids):
            tbl = tbl.take(pa.array(np.sort(first), pa.int64()))
        key = geocode.key_of_image_id(tbl.column("image_id"))
        salt_hash = geocode.lcg_next(geocode.lcg_next(key) + 9176)
        salt = (salt_hash % np.uint64(k_new)).astype(np.int64) \
            if k_new > 1 else np.zeros(tbl.num_rows, np.int64)
        outs = []
        for s in range(k_new):
            sub = tbl.filter(pa.array(salt == s))
            if sub.num_rows == 0:
                # a fresh build never materializes empty (cell, salt)
                # partitions: emit a zero-row manifest update so the
                # stale row drops; the stale FILE unlinks in the final
                # phase with the other stale salts (write order holds)
                outs.append(_manifest_row(
                    cell_id, s, part_path(ckpt_dir, cell_id, s), 0,
                    np.zeros(0, np.int64), np.asarray([], object), 0.0))
                continue
            sub = sub.append_column(
                "cell", pa.array(np.full(sub.num_rows, cell_id, np.int64)))
            sub = sub.append_column(
                "salt", pa.array(np.full(sub.num_rows, s, np.int64)))
            outs.append(_build_partition(sub, ckpt_dir, resume=False))
        return pa.concat_tables(outs)

    futs = [compact_cell.remote(c, [p for _s, p in by_cell[c]], k_new)
            for c, _k_now, k_new in todo]
    updated = pa.concat_tables(_ray.get(futs))
    # manifest rows for stale salts must DROP, not linger: emit them as
    # zero-row updates so _merge_manifest filters them out
    drops = []
    for c, k_now, k_new in todo:
        for s in range(k_new, max(k_now, k_new)):
            drops.append(_manifest_row(c, s, part_path(ckpt_dir, c, s), 0,
                                       np.zeros(0, np.int64),
                                       np.asarray([], object), 0.0))
    merged = _merge_manifest(
        ckpt_dir, pa.concat_tables([updated] + drops) if drops else updated)
    # salts.json: authoritative routing modulus
    import json as _json
    new_plan = dict(plan)
    for c, _k_now, k_new in todo:
        if k_new > 1:
            new_plan[c] = k_new
        else:
            new_plan.pop(c, None)
    _tmp = os.path.join(ckpt_dir, f"salts.tmp.{os.getpid()}")
    with open(_tmp, "w") as f:
        _json.dump({str(c): k for c, k in new_plan.items()}, f)
    os.replace(_tmp, os.path.join(ckpt_dir, "salts.json"))
    # stale files last: everything above no longer references them
    # (salts beyond k_new, plus any in-range salt whose re-split came
    # up empty — its zero-row manifest update dropped the reference)
    u_cells = updated.column("cell").to_numpy()
    u_salts = updated.column("salt").to_numpy()
    u_rows = updated.column("n_rows").to_numpy()
    for c, s in zip(u_cells[u_rows == 0], u_salts[u_rows == 0]):
        p = part_path(ckpt_dir, int(c), int(s))
        if os.path.exists(p):
            os.remove(p)
    for c, k_now, k_new in todo:
        for s in range(k_new, max(k_now, k_new)):
            p = part_path(ckpt_dir, c, s)
            if os.path.exists(p):
                os.remove(p)
    return merged
