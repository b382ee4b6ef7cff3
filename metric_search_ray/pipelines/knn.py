"""Exact kNN over the partitioned cover-tree index.

Two distributed query shapes:

1. ``knn_geo`` — geo queries against the partitioned geo index, with the
   **exactness ring protocol**: the cover tree's pruning inequality
   ``best > d(child, q) - subtree_radius`` (tree.cpp:686) lifted to the
   cell lattice.  A query searches its home cell's trees, then expands
   Chebyshev rings of cells; ring r's lower bound is the min planar
   distance from the query to any cell box in the ring (monotone
   nondecreasing in r), so the search stops exactly when the k-th best
   distance can no longer improve.  Salted cells search every salt.
   No true neighbor can be missed: every unvisited cell has
   lower-bound >= the stopping bound >= kth distance.

2. ``knn_metric`` — metric kNN (Hamming over phash, L2/cosine over
   vectors) with the scatter-gather scheme: the query set is broadcast
   (``ray.put`` once), every data partition computes its local top-k
   per query vectorized, and a ``groupby(query_id)`` merges per-query
   candidates to the global top-k.  Exact because every partition is
   searched; the shuffle moves only n_queries * k candidate rows.

Stateful pieces (loaded checkpoints, LRU tree cache) live in actor
pools (`map_batches(cls, concurrency=N)`), loaded once per actor.
"""

from __future__ import annotations

import collections

import numpy as np
import pyarrow as pa

import ray
import ray.data as rd

from .. import cell as cellmod
from .. import phash as phashmod
from ..metrics import PlanarDeg, planar_dist, planar_dist_outer
from . import build as buildmod


# Process-global LRU of loaded partition trees.  Ray reuses worker
# processes across tasks, so task-mode stages (pickled instances) get
# warm caches after the first wave — without this, every task pays the
# full checkpoint-load cost (~2s/batch measured vs ~0.1s warm).
_TREE_CACHE: "collections.OrderedDict[str, tuple]" = collections.OrderedDict()
_ARRAY_CACHE: "collections.OrderedDict[tuple, tuple]" = collections.OrderedDict()

# Driver-side memo of the staged-index handle, keyed by
# (ckpt_dir, manifest mtime): knn_geo and radius_join against the same
# index share one staging wave.
_STAGE_REFS: dict = {}
# Per-process memo of resolved {path: ObjectRef} dicts (one ray.get of
# the outer handle per worker process, not per task).
_STAGE_DICT_CACHE: dict = {}


def _read_partition_arrays(path: str):
    """One partition checkpoint -> the scan arrays (lat, lon, ids).

    ids are a fixed-width numpy unicode array, not object dtype: object
    arrays pickle as one Python string per row, so every worker that
    resolves a staged partition re-materializes its id heap (a
    per-worker cost that grows with worker count — exactly what the
    scaling bar punishes); U arrays are a single flat buffer."""
    import pyarrow.parquet as _pq
    tbl = _pq.read_table(path, columns=["lat", "lon", "image_id"])
    return (tbl.column("lat").to_numpy(),
            tbl.column("lon").to_numpy(),
            tbl.column("image_id").to_numpy(zero_copy_only=False
                                            ).astype(np.str_))


def _augment_subcells(lat: np.ndarray, lon: np.ndarray, ids: np.ndarray,
                      res_base: int | None):
    """Attach a sub-cell CSR index to a partition's scan arrays.

    Rows are sorted by their cell id at a finer resolution (~1024 rows
    per occupied sub-cell), giving the scan kernels a pruning grid ~2
    orders finer than the partition cell without more checkpoint files:
    a k=10 query then touches a few hundred candidate rows instead of
    the partition's full 20k (the full-matrix distance passes were
    DRAM-bound — the dominant reason the knn stage under-scaled at
    high parallelism).  Returns (lat, lon, ids) unchanged for small
    partitions, else (lat, lon, ids, sub_cells, sub_starts) with rows
    sub-cell-sorted; consumers that don't know about the CSR use
    ``arrs[:3]`` (any row order is a valid scan order)."""
    m = len(lat)
    if res_base is None or m <= 4096:
        # below ~4k rows the full-matrix scan is already cache-friendly
        # and the CSR's extra sub-cell merges cost more in numpy fixed
        # overhead than the pruning saves
        return (lat, lon, ids)
    import math
    extra = max(1, int(math.ceil(math.log(m / 1024, 4))))
    res_sub = min(int(res_base) + extra, cellmod.MAX_RES)
    lat_u, lon_u = cellmod.latlon_to_units(lat, lon)
    sc = cellmod.cell_of(lat_u, lon_u, res_sub)
    order = np.argsort(sc, kind="stable")
    sc = sc[order]
    uniq, starts = np.unique(sc, return_index=True)
    return (lat[order], lon[order], ids[order], uniq,
            np.append(starts, m).astype(np.int64))


def _stage_chunk(paths: list, res_base: int | None = None):
    """Staging task: read a CHUNK of partition checkpoints; each
    partition's scan arrays become their OWN task-return object (the
    call site sets ``num_returns=len(paths)``), so every per-path ref
    is driver-owned.  (An earlier version ``ray.put`` inside the task —
    worker-owned refs nested through a second driver ``ray.put`` never
    resolved their pulls and hung consumers.)  Per-path refs keep
    selective resolution (a query stream that never touches a partition
    never fetches it) while the chunking bounds the task count at huge
    partition counts.  The sub-cell CSR (``_augment_subcells``) is
    built here, in the distributed wave, so workers share the indexed
    form zero-copy instead of each re-sorting per process."""
    arrs = [_augment_subcells(*_read_partition_arrays(p), res_base)
            for p in paths]
    return arrs[0] if len(arrs) == 1 else tuple(arrs)


def _stage_launch(ckpt_dir: str, files_per_task: int | None = None):
    """Submit the staging read wave WITHOUT waiting for it.

    Returns ``(key, refs_dict | None)``: refs is None when a memoized
    handle already covers this (ckpt_dir, manifest mtime) — the caller
    then skips ``_stage_finish``'s wait entirely.  Splitting launch
    from finish lets callers overlap the staging wave with their own
    pre-scan exchange (e.g. knn_geo's routing sort): both workloads
    fill the same CPUs, and the driver only blocks once, after the
    exchange, by which point staging has usually completed."""
    import os as _os
    man_path = _os.path.join(ckpt_dir, "manifest.parquet")
    key = (ckpt_dir, _os.stat(man_path).st_mtime_ns)
    if _STAGE_REFS.get(key) is not None:
        return key, None
    manifest = buildmod.load_manifest(ckpt_dir)
    paths = manifest.column("path").to_pylist()
    man_cells = manifest.column("cell").to_numpy()
    res_base = (int(cellmod.cell_res(man_cells[:1])[0])
                if len(man_cells) else None)
    if files_per_task is None:
        ncpu = max(1, int(ray.cluster_resources().get("CPU", 8)))
        files_per_task = max(1, min(32, -(-len(paths) // (4 * ncpu))))
    fn = ray.remote(num_cpus=1)(_stage_chunk)
    refs: dict = {}
    for i in range(0, len(paths), files_per_task):
        chunk = paths[i:i + files_per_task]
        out = fn.options(num_returns=len(chunk)).remote(chunk, res_base)
        if len(chunk) == 1:
            out = [out]
        refs.update(zip(chunk, out))
    return key, refs


def _stage_finish(pending) -> "ray.ObjectRef":
    """Wait for a ``_stage_launch`` wave and memoize the ref-dict handle."""
    key, refs = pending
    if refs is None:
        return _STAGE_REFS[key]
    ray.wait(list(refs.values()), num_returns=len(refs), fetch_local=False)
    handle = ray.put(refs)
    _STAGE_REFS.clear()          # one live index per driver is the norm
    _STAGE_REFS[key] = handle
    return handle


def stage_partition_arrays(ckpt_dir: str, files_per_task: int | None = None):
    """Stage every partition's scan arrays into the Ray object store.

    One distributed read wave — ``files_per_task`` checkpoint files per
    staging task (a 10^5-partition index is ~3k tasks, not 10^5) —
    instead of every worker decoding every parquet file through its
    private LRU: task-mode kNN at W workers otherwise pays up to W
    reads per partition (cold page cache made this stage swing 4-19s
    at 16 cpus).

    Returns ONE ObjectRef wrapping the {path: ObjectRef} dict.  Tasks
    must not carry the raw dict: pickling a 1000-entry ref dict into
    every task serializes per-task borrower registration on the driver
    (measured: flattens 4->16 scaling of the scan stage).  With the
    dict behind a single ref, each worker process gets it once, then
    resolves only the partitions its queries touch (zero-copy float
    buffers; Ray handles spill + node locality).  Memoized per
    (ckpt_dir, manifest mtime) so successive query stages share one
    wave.

    The finish half blocks until the whole wave EXISTS in the object
    store (created, not fetched: fetch_local=False pulls nothing to the
    driver).  Returning pending refs deadlocks whenever the downstream
    query actor pool claims every CPU first — the num_cpus=1 staging
    tasks then wait for a slot the blocked-in-ray.get actors never
    release (reproduced at num_cpus=4 with concurrency=4; raylet showed
    CPU:0 available + 1 task waiting_for_remote_node_resources).  The
    driver holds no CPU, so blocking here is deadlock-free.
    """
    return _stage_finish(_stage_launch(ckpt_dir, files_per_task))


def _resolve_arrays(path: str, part_refs, cap: int = 2048,
                    res_base: int | None = None):
    """Scan arrays for one partition: from the staged index handle when
    available (zero-copy get, memoized per process), else from disk.
    ``part_refs`` is the ObjectRef returned by stage_partition_arrays
    (or None).  Returns a 3-tuple (lat, lon, ids), or a 5-tuple with
    the sub-cell CSR appended when the partition is large enough and
    ``res_base`` is known (staged arrays carry the CSR regardless —
    CSR-unaware callers use ``arrs[:3]``)."""
    if part_refs is None:
        return _load_arrays_cached(path, cap, res_base)
    refs = _STAGE_DICT_CACHE.get(part_refs)
    if refs is None:
        refs = ray.get(part_refs)
        _STAGE_DICT_CACHE.clear()
        _STAGE_DICT_CACHE[part_refs] = refs
    ref = refs.get(path)
    if ref is None:
        return _load_arrays_cached(path, cap, res_base)
    key = ("ref", path)
    hit = _ARRAY_CACHE.get(key)
    if hit is not None:
        _ARRAY_CACHE.move_to_end(key)
        return hit
    arrays = ray.get(ref)
    _ARRAY_CACHE[key] = arrays
    if len(_ARRAY_CACHE) > cap:
        _ARRAY_CACHE.popitem(last=False)
    return arrays


def _load_arrays_cached(path: str, cap: int = 2048,
                        res_base: int | None = None):
    """Light checkpoint load for the vectorized scan path: (lat, lon,
    image_ids) numpy arrays only — ~5x cheaper than rebuilding Node
    objects, and the scan needs nothing else.  One cache entry per
    path: when a CSR-aware caller passes ``res_base`` and the cached
    entry is plain, the entry is upgraded in place (the augmented
    arrays are a valid plain view, just sub-cell-sorted)."""
    import os as _os
    import pyarrow.parquet as _pq
    st = _os.stat(path)
    key = (path, st.st_mtime_ns, st.st_size)
    hit = _ARRAY_CACHE.get(key)
    if hit is not None:
        _ARRAY_CACHE.move_to_end(key)
        if res_base is None or len(hit) > 3 or len(hit[0]) <= 4096:
            return hit
        hit = _augment_subcells(*hit[:3], res_base)
        _ARRAY_CACHE[key] = hit
        return hit
    tbl = _pq.read_table(path, columns=["lat", "lon", "image_id"])
    lat = tbl.column("lat").to_numpy()
    lon = tbl.column("lon").to_numpy()
    ids = tbl.column("image_id").to_numpy(zero_copy_only=False).astype(np.str_)
    _ARRAY_CACHE[key] = _augment_subcells(lat, lon, ids, res_base)
    if len(_ARRAY_CACHE) > cap:
        _ARRAY_CACHE.popitem(last=False)
    return _ARRAY_CACHE[key]


def _load_tree_cached(path: str, metric, cap: int = 512):
    import os as _os
    st = _os.stat(path)
    key = (path, st.st_mtime_ns, st.st_size)  # rebuilt checkpoints invalidate
    hit = _TREE_CACHE.get(key)
    if hit is not None:
        _TREE_CACHE.move_to_end(key)
        return hit
    tree, tbl = buildmod.load_partition_tree(path, metric=metric)
    # checkpoint rows are preorder — reindex image_id by node row_id
    rid = tbl.column("row_id").to_numpy()
    raw = tbl.column("image_id").to_numpy(zero_copy_only=False)
    ids = np.empty(len(rid), dtype=object)
    ids[rid] = raw
    _TREE_CACHE[key] = (tree, ids)
    if len(_TREE_CACHE) > cap:
        _TREE_CACHE.popitem(last=False)
    return _TREE_CACHE[key]


_MANIFEST_LOOKUP_CACHE: dict = {}


def _manifest_lookup_cached(ckpt_dir: str):
    """Per-process memo: manifest -> (cell -> [(salt, path)]) lookup +
    cell resolution.  Keyed by manifest mtime so a rebuilt index is
    picked up; bounded to a handful of live indexes per process."""
    import os as _os
    key = (ckpt_dir,
           _os.stat(_os.path.join(ckpt_dir, "manifest.parquet")).st_mtime_ns)
    got = _MANIFEST_LOOKUP_CACHE.get(key)
    if got is None:
        manifest = buildmod.load_manifest(ckpt_dir)
        by_cell = buildmod.cells_in_manifest(manifest)
        res = int(cellmod.cell_res(np.asarray([next(iter(by_cell))]))[0]) \
            if by_cell else buildmod.DEFAULT_RES
        if len(_MANIFEST_LOOKUP_CACHE) >= 8:
            _MANIFEST_LOOKUP_CACHE.clear()
        got = _MANIFEST_LOOKUP_CACHE[key] = (by_cell, res)
    return got


class KnnActor:
    """Geo kNN with ring expansion over checkpoints; works as an actor
    pool (class) or as pickled-instance tasks.

    __init__ (once per actor / on the driver in task mode): read the
    manifest, build the cell->(salt,path) lookup.  Trees are loaded
    lazily through the process-global LRU — queries are sorted by home
    cell before this stage, so the cache hit rate is high.
    """

    def __init__(self, ckpt_dir: str, cache_trees: int = 512,
                 method: str = "scan", part_refs=None):
        """``method='scan'`` answers per-partition queries with a
        vectorized exact distance scan over the partition's points —
        optimal below ~10^5 rows/partition, where numpy throughput beats
        pruned Python traversal by 10-50x.  ``method='tree'`` walks the
        restored cover tree (the pruning pays off for very large
        partitions / tiny k).  Both are exact; results are identical."""
        self.ckpt_dir = ckpt_dir
        self._by_cell = None
        self._res = None
        self._cache: collections.OrderedDict = collections.OrderedDict()
        self.cache_trees = cache_trees
        self.method = method
        self.part_refs = part_refs
        self.metric = PlanarDeg()

    @property
    def by_cell(self):
        if self._by_cell is None:
            self._by_cell, self._res = _manifest_lookup_cached(self.ckpt_dir)
        return self._by_cell

    @property
    def res(self):
        if self._res is None:
            self._by_cell, self._res = _manifest_lookup_cached(self.ckpt_dir)
        return self._res

    def __getstate__(self):
        # instance (task) mode: ship ONLY the tiny config — the
        # manifest lookup (~300KB at 2k partitions) is re-derived per
        # worker process from the checkpoint manifest through a
        # process-global memo.  Shipping it serialized it into every
        # task spec, a driver-side serial cost that grew with task
        # count and charged the high parallelism level of the scaling
        # ladder (task fan-out is proportional to CPUs).
        return {k: getattr(self, k) for k in
                ("ckpt_dir", "cache_trees", "metric", "method",
                 "part_refs")}

    def __setstate__(self, state):
        for k, v in state.items():
            setattr(self, k, v)
        self._by_cell = None
        self._res = None
        self._cache = collections.OrderedDict()

    def _tree(self, path: str):
        return _load_tree_cached(path, self.metric, self.cache_trees)

    def _prefetch_cells(self, cells: np.ndarray):
        """Batch-resolve the staged arrays of the given cells (plus
        their ring-1 neighbors) in ONE ``ray.get``: a task's scan
        otherwise issues one sequential get per partition first touched
        (~134us each vs ~40us batched), a per-worker cost that grows
        with worker count because scrambled routing gives every worker
        a scattered cell footprint."""
        if self.part_refs is None:
            return
        refs = _STAGE_DICT_CACHE.get(self.part_refs)
        if refs is None:
            refs = ray.get(self.part_refs)
            _STAGE_DICT_CACHE.clear()
            _STAGE_DICT_CACHE[self.part_refs] = refs
        # home cells + their 3x3 neighborhoods, vectorized (ring scans
        # overwhelmingly stop within ring 1; a neighbor missed by this
        # approximation — exotic wrap cases — just resolves lazily).
        cells = np.asarray(cells, np.int64)
        if len(cells) == 0:
            return
        ix, iy, _res = cellmod.cell_to_xy(cells)
        n = np.int64(1) << np.int64(self.res)
        hood: set = set()
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                nx = (ix + dx) % n
                ny = iy + dy
                ok = (ny >= 0) & (ny < n)
                if ok.any():
                    hood.update(cellmod.cell_id_from_xy(
                        nx[ok], ny[ok], self.res).tolist())
        want: list = []
        for c in hood:
            for _salt, path in self.by_cell.get(int(c), ()):
                if ("ref", path) not in _ARRAY_CACHE and path in refs:
                    want.append(path)
        want = list(dict.fromkeys(want))
        if not want:
            return
        got = ray.get([refs[p] for p in want])
        for p, arrays in zip(want, got):
            _ARRAY_CACHE[("ref", p)] = arrays
        while len(_ARRAY_CACHE) > 4096:
            _ARRAY_CACHE.popitem(last=False)

    def _search_cell(self, cell_id: int, qlat: float, qlon: float, k: int, best: list):
        """Search every salt partition of one cell, merging into best
        (sorted).  All salts are searched: exactness does not depend on
        salt assignment."""
        for _salt, path in self.by_cell.get(cell_id, ()):
            if self.method == "scan":
                lat, lon, ids = _resolve_arrays(path, self.part_refs)[:3]
                d = planar_dist(lat - qlat, lon - qlon)
                kk = min(k, len(d))
                if kk < len(d):
                    sel = np.argpartition(d, kk - 1)[:kk]
                    # argpartition cuts equal distances at the boundary
                    # arbitrarily; include every tie with the kth value so
                    # the (dist, id) sort below decides deterministically
                    sel = np.flatnonzero(d <= d[sel].max())
                else:
                    sel = np.arange(len(d))
                for i in sel:
                    best.append((float(d[i]), str(ids[i])))
            else:
                tree, ids = self._tree(path)
                for node, dd in tree.knn(np.asarray([qlat, qlon]), k):
                    best.append((float(dd), str(ids[node.ID])))
        best.sort()
        del best[k:]

    def query_one(self, qlat: float, qlon: float, k: int) -> list[tuple[float, str]]:
        lat_u, lon_u = cellmod.latlon_to_units(np.asarray([qlat]), np.asarray([qlon]))
        home = int(cellmod.cell_of(lat_u, lon_u, self.res)[0])
        best: list[tuple[float, str]] = []
        n = 1 << self.res
        max_ring = 2 * n  # full-grid sweep bound
        # Longitude wraps, so cell.ring() re-emits a cell on later rings
        # (offsets dx and dx-n map to the same column): without dedup a
        # partition is scanned once per appearance, duplicating neighbors
        # whenever k is large enough to keep both copies.  Restricting
        # each ring to its FIRST-appearance cells makes the scanned sets
        # the true wrapped-Chebyshev annuli — disjoint, and with
        # min-box-distance monotone nondecreasing in r, which is exactly
        # the nesting property the stop bound below relies on.  Annuli
        # are contiguous in r, so an empty annulus ends the sweep.
        seen_cells: set[int] = set()
        for r in range(max_ring + 1):
            ring_cells = cellmod.ring(home, r)
            fresh = [int(c) for c in ring_cells if int(c) not in seen_cells]
            seen_cells.update(fresh)
            if not fresh:
                if r > 0:
                    break
                continue
            ring_cells = np.asarray(fresh, np.int64)
            # Stop bound over ALL boxes of the ring (present or not): ring
            # annuli nest, so min-box-distance is monotone nondecreasing in
            # r — if the k-th best can't be beaten by ANY box of this ring,
            # no farther ring can beat it either.  (Using present-only
            # cells here would be unsound: a missing near cell in this
            # ring does not bound a present cell in the next.)
            lbs_all = cellmod.point_cell_min_dist_deg(qlat, qlon, ring_cells)
            if len(best) >= k and best[-1][0] <= lbs_all.min():
                break
            order = np.argsort(lbs_all, kind="stable")
            for oi in order:
                c = int(ring_cells[oi])
                if c not in self.by_cell:
                    continue
                if len(best) >= k and best[-1][0] <= lbs_all[oi]:
                    continue
                self._search_cell(c, qlat, qlon, k, best)
        return best

    def _group_scan(self, home: int, qlat: np.ndarray, qlon: np.ndarray,
                    kmax: int):
        """Vectorized ring search for all queries sharing one home cell.

        Per ring: one lower-bound matrix for the whole group, one
        distance matrix per candidate partition, one argpartition-based
        top-k merge — the per-query Python cost of the serial path
        amortizes across the group.  Exactness argument identical to
        query_one: a query leaves the active set only when its k-th
        best distance is <= the min lower bound over ALL boxes of the
        current ring (monotone nondecreasing over rings).
        """
        nq = len(qlat)
        best_d = np.full((nq, kmax), np.inf)
        # candidates merge as packed int64 codes (partition_serial << 32
        # | row) instead of object-dtype id arrays: the per-partition
        # top-k merge then moves 8-byte ints, not Python string pointers
        # — measured 12.4 ms/query on cells whose rings touch a 25-salt
        # hot cell (vs ~0.5 ms/query typical), almost all of it
        # object-array concat/take; ids decode once at the end for nq*k
        # winners (and for the rare boundary-tie re-cut rows)
        best_code = np.full((nq, kmax), -1, np.int64)
        kth = np.full(nq, np.inf)         # per-query current k-th best
        parts: list[np.ndarray] = []       # partition serial -> ids array
        n = 1 << self.res
        max_ring = 2 * n
        active = np.arange(nq)
        # first-appearance-only rings: see query_one — prevents duplicate
        # neighbors from longitude-wrap cell re-emission and restores the
        # annulus-nesting monotonicity the per-query stop bound needs
        seen_cells: set[int] = set()
        for r in range(max_ring + 1):
            ring_cells = cellmod.ring(home, r)
            fresh = [int(c) for c in ring_cells if int(c) not in seen_cells]
            seen_cells.update(fresh)
            if not fresh:
                if r > 0:
                    break
                continue
            ring_cells = np.asarray(fresh, np.int64)
            lbs = cellmod.points_cells_min_dist_deg(qlat[active], qlon[active],
                                                    ring_cells)
            ring_lb = lbs.min(axis=1)
            keep = kth[active] > ring_lb
            active = active[keep]
            if len(active) == 0:
                break
            lbs = lbs[keep]
            # nearest cells first: early merges tighten kth, so later
            # cells of the same ring prune more queries
            for oi in np.argsort(lbs.min(axis=0), kind="stable"):
                ci = int(ring_cells[oi])
                if ci not in self.by_cell:
                    continue
                # per-(query, cell) pruning — the group analogue of the
                # serial path's per-cell skip (query_one): only queries
                # whose k-th best can still improve against THIS cell's
                # box enter its distance matrices.  The old group scan
                # computed every ring partition's distances for EVERY
                # active query; spread groups scanned ~6x more rows
                # than the serial bound requires (and those matrix
                # passes are DRAM-bound — the main reason the knn stage
                # under-scaled at high parallelism).
                need = np.flatnonzero(kth[active] > lbs[:, oi])
                if len(need) == 0:
                    continue
                sub = active[need]
                for _salt, path in self.by_cell[ci]:
                    arrs = _resolve_arrays(path, self.part_refs,
                                           res_base=self.res)
                    lat, lon, ids = arrs[0], arrs[1], arrs[2]
                    serial = len(parts)
                    parts.append(ids)
                    if len(arrs) > 3 and len(sub) * len(lat) >= (1 << 16):
                        self._scan_partition_csr(
                            arrs, serial, sub, qlat, qlon,
                            best_d, best_code, kth, parts, kmax)
                        continue
                    d = planar_dist_outer(lat, lon, qlat[sub], qlon[sub])
                    codes = ((np.int64(serial) << np.int64(32))
                             | np.arange(d.shape[1], dtype=np.int64))
                    self._merge_block(best_d, best_code, kth, sub, d,
                                      codes, parts, kmax)
        return best_d, self._decode_codes(best_code.ravel(),
                                          parts).reshape(best_code.shape)

    def _scan_partition_csr(self, arrs, serial, sub, qlat, qlon,
                            best_d, best_code, kth, parts, kmax):
        """Sub-cell-pruned scan of one large partition for the query
        subset ``sub``.

        Phase A seeds each query from its OWN sub-cell (one padded
        gather + one merge for the whole subset), so its k-th bound is
        tight before any other sub-cell is considered; Phase B sweeps
        the remaining sub-cells nearest-first with the same per-(query,
        sub-cell) bound check used at cell level.  Exactness: a
        (query, sub-cell) pair is skipped only when the query's current
        k-th best is <= the true lower bound to that sub-cell's box —
        the cover tree's pruning inequality one level further down."""
        lat, lon, _ids = arrs[0], arrs[1], arrs[2]
        sub_cells, sub_starts = arrs[3], arrs[4]
        ql, qo = qlat[sub], qlon[sub]
        # Phase A: own-sub-cell seed (padded block-diagonal gather)
        lat_u, lon_u = cellmod.latlon_to_units(ql, qo)
        own = cellmod.cell_of(lat_u, lon_u,
                              int(cellmod.cell_res(sub_cells[:1])[0]))
        pos = np.searchsorted(sub_cells, own)
        posc = np.minimum(pos, len(sub_cells) - 1)
        found = sub_cells[posc] == own
        own_pos = np.where(found, posc, -1)
        fidx = np.flatnonzero(found)
        if len(fidx):
            a = sub_starts[own_pos[fidx]]
            b = sub_starts[own_pos[fidx] + 1]
            cnt = b - a
            pad = int(cnt.max())
            col = np.arange(pad)[None, :]
            valid = col < cnt[:, None]
            rows = np.where(valid, a[:, None] + col, 0)
            d = planar_dist(lat[rows] - ql[fidx, None],
                            lon[rows] - qo[fidx, None])
            d[~valid] = np.inf
            codes = np.where(valid,
                             (np.int64(serial) << np.int64(32)) | rows,
                             np.int64(-1))
            self._merge_block(best_d, best_code, kth, sub[fidx], d,
                              codes, parts, kmax)
        # Phase B: remaining sub-cells, nearest-first, bound-pruned
        slb = cellmod.points_cells_min_dist_deg(ql, qo, sub_cells)
        for j in np.argsort(slb.min(axis=0), kind="stable"):
            needj = np.flatnonzero((kth[sub] > slb[:, j]) & (own_pos != j))
            if len(needj) == 0:
                continue
            a, b = int(sub_starts[j]), int(sub_starts[j + 1])
            s2 = sub[needj]
            d = planar_dist_outer(lat[a:b], lon[a:b],
                                  qlat[s2], qlon[s2])
            codes = ((np.int64(serial) << np.int64(32))
                     | np.arange(a, b, dtype=np.int64))
            self._merge_block(best_d, best_code, kth, s2, d, codes,
                              parts, kmax)

    def _merge_block(self, best_d, best_code, kth, rows, d, codes,
                     parts, kmax):
        """Merge a candidate distance block into the per-query best
        lists (in place).  ``d`` is (len(rows), m); ``codes`` packs
        (partition_serial << 32 | row) and is (m,) or per-row (len(rows),
        m) for gathered blocks; inf distances (padding) never win and
        their -1 codes decode to None.

        A partition-level pre-cut (top-kmax of d per row) keeps the
        merge on (kmax + kmax)-wide arrays instead of copying the full
        m-wide matrix through a concat.  Boundary ties: candidates
        equal to the k-th distance may be cut arbitrarily by either
        argpartition; rows holding more candidates at <= kth than kmax
        re-cut on the (dist, image_id) order the serial path uses.
        The tie count touches the full matrix only for rows whose k-th
        equals the pre-cut's k-th (elsewhere every dropped candidate is
        strictly greater — no full pass needed)."""
        ns, m = d.shape
        codes2d = codes.ndim == 2
        kk = min(kmax, m)
        if m > kk:
            # two-pivot partition: positions of the top-kk AND the
            # (kk+1)-th smallest in one pass — the (kk+1)-th is the
            # minimum DROPPED value, so "did the pre-cut drop a
            # boundary tie?" is answered without re-reading the full
            # matrix (the old single-pivot version paid one extra full
            # pass over d for exactly that question on every ring-0
            # merge)
            pboth = np.argpartition(d, (kk - 1, kk), axis=1)
            psel = pboth[:, :kk]
            min_dropped = np.take_along_axis(
                d, pboth[:, kk:kk + 1], axis=1)[:, 0]
            d_top = np.take_along_axis(d, psel, axis=1)
            code_top = (np.take_along_axis(codes, psel, axis=1)
                        if codes2d else codes[psel])
        else:
            d_top = d
            min_dropped = None
            code_top = codes if codes2d else np.broadcast_to(codes, (ns, m))
        old_d = best_d[rows]
        old_code = best_code[rows]
        all_d = np.concatenate([old_d, d_top], axis=1)
        all_code = np.concatenate([old_code, code_top], axis=1)
        sel = np.argpartition(all_d, min(kmax, all_d.shape[1]) - 1,
                              axis=1)[:, :kmax]
        new_d = np.take_along_axis(all_d, sel, axis=1)
        new_code = np.take_along_axis(all_code, sel, axis=1)
        kth_new = new_d.max(axis=1)
        n_le = (np.count_nonzero(d_top <= kth_new[:, None], axis=1)
                + np.count_nonzero(old_d <= kth_new[:, None], axis=1))
        if min_dropped is not None:
            # rows where the min dropped value ties the k-th need the
            # exact count over the full matrix (rare: true value ties
            # at the cut boundary)
            full = np.flatnonzero(min_dropped <= kth_new)
            if len(full) * 2 >= ns:
                n_le = (np.count_nonzero(d <= kth_new[:, None], axis=1)
                        + np.count_nonzero(old_d <= kth_new[:, None],
                                           axis=1))
            elif len(full):
                n_le[full] = (
                    np.count_nonzero(d[full] <= kth_new[full, None], axis=1)
                    + np.count_nonzero(old_d[full] <= kth_new[full, None],
                                       axis=1))
        for ri in np.flatnonzero((n_le > kmax) & np.isfinite(kth_new)):
            di = np.concatenate([old_d[ri], d[ri]])
            cd = np.concatenate([old_code[ri],
                                 codes[ri] if codes2d else codes])
            # every strictly-closer candidate is kept; only the ties AT
            # the k-th value compete for the remaining slots, smallest
            # image_id first (the serial path's order) — decoding just
            # the few tied ids instead of every candidate <= kth
            lt = np.flatnonzero(di < kth_new[ri])
            eq = np.flatnonzero(di == kth_new[ri])
            tie_ids = self._decode_codes(cd[eq], parts).astype(str)
            pick = eq[np.argsort(tie_ids, kind="stable")[:kmax - len(lt)]]
            keep_idx = np.concatenate([lt, pick])
            new_d[ri] = di[keep_idx]
            new_code[ri] = cd[keep_idx]
        best_d[rows] = new_d
        best_code[rows] = new_code
        kth[rows] = new_d.max(axis=1)

    @staticmethod
    def _decode_codes(codes: np.ndarray, parts: list) -> np.ndarray:
        """Packed (serial << 32 | row) codes -> object id array; -1
        (unfilled slot, paired with an inf distance) decodes to None."""
        out = np.full(codes.shape, None, dtype=object)
        ok = codes >= 0
        if ok.any():
            ser = codes[ok] >> np.int64(32)
            row = codes[ok] & np.int64(0xFFFFFFFF)
            dec = np.empty(ser.shape, dtype=object)
            for s in np.unique(ser):
                msk = ser == s
                dec[msk] = parts[int(s)][row[msk]]
            out[ok] = dec
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids = np.asarray(batch.column("query_id").to_pylist(), dtype=object)
        lats = batch.column("lat").to_numpy()
        lons = batch.column("lon").to_numpy()
        ks = batch.column("k").to_numpy().astype(np.int64)
        out_qid, out_iid, out_d, out_rank = [], [], [], []
        if self.method == "scan" and len(qids):
            lat_u, lon_u = cellmod.latlon_to_units(lats, lons)
            homes = cellmod.cell_of(lat_u, lon_u, self.res)
            order = np.argsort(homes, kind="stable")
            uniq_homes = np.unique(homes)
            self._prefetch_cells(uniq_homes)
            # vectorized result assembly: one lexsort over the whole
            # group's (row, dist, id) instead of a Python loop per
            # result row — the per-row append version was ~30% of the
            # stage's task time at 400k queries
            for home in uniq_homes:
                grp = order[np.searchsorted(homes[order], home):
                            np.searchsorted(homes[order], home, side="right")]
                kmax = int(ks[grp].max())
                bd, bi = self._group_scan(int(home), lats[grp], lons[grp], kmax)
                nq, km = bd.shape
                rows = np.repeat(np.arange(nq), km)
                flat_d = bd.ravel()
                keep = np.isfinite(flat_d)
                rows, flat_d = rows[keep], flat_d[keep]
                flat_i = bi.ravel()[keep].astype(str)
                # (row, dist, id) order == the serial path's per-row
                # (dist, image_id) lexsort
                o = np.lexsort((flat_i, flat_d, rows))
                rows, flat_d, flat_i = rows[o], flat_d[o], flat_i[o]
                starts = np.searchsorted(rows, np.arange(nq))
                rank = np.arange(len(rows)) - starts[rows] + 1
                sel = rank <= ks[grp][rows]
                out_qid.append(qids[grp][rows[sel]])
                out_iid.append(flat_i[sel])
                out_d.append(flat_d[sel])
                out_rank.append(rank[sel])
            return pa.table({
                "query_id": pa.array(
                    np.concatenate(out_qid) if out_qid else [], pa.string()),
                "image_id": pa.array(
                    np.concatenate(out_iid) if out_iid else [], pa.string()),
                "dist": pa.array(
                    np.concatenate(out_d) if out_d else
                    np.empty(0, np.float64), pa.float64()),
                "rank": pa.array(
                    np.concatenate(out_rank) if out_rank else
                    np.empty(0, np.int64), pa.int64()),
            })
        else:
            for qid, la, lo, k in zip(qids, lats, lons, ks):
                res = self.query_one(float(la), float(lo), int(k))
                for rank, (d, iid) in enumerate(res):
                    out_qid.append(qid)
                    out_iid.append(iid)
                    out_d.append(d)
                    out_rank.append(rank + 1)
        return pa.table({
            "query_id": pa.array(out_qid, pa.string()),
            "image_id": pa.array(out_iid, pa.string()),
            "dist": pa.array(out_d, pa.float64()),
            "rank": pa.array(out_rank, pa.int64()),
        })


def clamp_pool(concurrency: int) -> int:
    """Clamp a FIXED actor-pool size to cluster CPUs minus one.

    A fixed pool of size == cluster CPUs spawns every actor up front
    and starves the upstream exchange (sort / repartition) tasks that
    feed it: the pool idles waiting for input blocks that can never be
    produced — a deadlock, reproduced at num_cpus=4 with
    concurrency=4 (raylet: CPU available 0, dispatch queue 1, all four
    KnnActors idle).  Leaving one CPU keeps the input side live; on
    real clusters (32+ cpus) the default pools are far below the cap
    and this is a no-op."""
    import ray as _ray
    total = int(_ray.cluster_resources().get("CPU", 8))
    return max(1, min(int(concurrency), total - 1))


def _cost_balanced_slices(srt: pa.Table, manifest: pa.Table,
                          width: int) -> list[pa.Table]:
    """Cut a route-sorted query table into ``width`` contiguous chunks
    of equal estimated SCAN COST, not equal rows: a query's scan cost
    is roughly its home cell's candidate count, which spreads ~2.4x
    across cells (measured task times 143-344ms on equal-row chunks —
    a last-wave tail the scaling ladder charges against the high
    parallelism level).  The manifest's n_rows per cell is a free cost
    model; the +64 floor covers per-query ring-bound overhead for
    queries homed in empty cells."""
    nq_total = srt.num_rows
    man_cells = manifest.column("cell").to_numpy()
    man_rows = manifest.column("n_rows").to_numpy()
    uc = np.unique(man_cells)
    rows_of = np.zeros(len(uc), np.int64)
    np.add.at(rows_of, np.searchsorted(uc, man_cells), man_rows)
    qhome = srt.column("home_cell").to_numpy()
    if len(uc):
        # cost = candidate rows of the query's full 3x3 NEIGHBORHOOD,
        # not just its home cell: the ring scan overwhelmingly touches
        # ring 1, and a home-only model mis-ranked queries homed next
        # to dense cells (measured task-time spread 0.63-0.91 s on
        # "equal-cost" chunks — the wave-quantization tail the scaling
        # ladder charges against the high level)
        uq = np.unique(qhome)
        ix, iy, _res = cellmod.cell_to_xy(uq)
        res = int(cellmod.cell_res(uc[:1])[0])
        n = np.int64(1) << np.int64(res)
        cost_u = np.zeros(len(uq), np.float64)
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                nx = (ix + dx) % n
                ny = iy + dy
                ok = (ny >= 0) & (ny < n)
                if not ok.any():
                    continue
                cid = cellmod.cell_id_from_xy(nx[ok], ny[ok], res)
                pos = np.clip(np.searchsorted(uc, cid), 0,
                              len(uc) - 1)
                hit = uc[pos] == cid
                add = np.zeros(len(cid), np.float64)
                add[hit] = rows_of[pos[hit]]
                cost_u[np.flatnonzero(ok)] += add
        qpos = np.searchsorted(uq, qhome)
        w = cost_u[qpos] + 64.0
    else:
        w = np.full(nq_total, 64.0)
    cumw = np.cumsum(w)
    targets = np.linspace(0, cumw[-1], width + 1)[1:-1]
    cuts = np.searchsorted(cumw, targets)
    bounds = np.concatenate(([0], cuts, [nq_total]))
    return [srt.slice(int(a), int(b - a))
            for a, b in zip(bounds[:-1], bounds[1:]) if b > a]


def knn_geo(queries_ds, ckpt_dir: str, concurrency: int = 4, batch_size: int = 256,
            use_actor_pool: bool = True, route_by_home_cell: bool | None = None,
            route_strategy: str = "auto", preload: bool | None = None):
    """Geo kNN pipeline.  ``use_actor_pool=False`` ships a pickled
    KnnActor instance to stateless tasks instead — no pool spawn cost,
    warm-worker reuse; right for short bursts, while long-running query
    streams amortize the actor pool's per-actor caches better.

    ``route_by_home_cell`` (default on): co-locate queries by home cell.
    This is load-bearing twice over — worker partition caches serve a
    locality of cells, AND the scan path vectorizes per home-cell
    group, so a batch of co-located queries costs one ring sweep
    instead of one per query (measured 8x when disabled).

    ``route_strategy`` picks the exchange that does the co-location:
    - ``"auto"`` (default): query streams up to 2M rows (the small
      side; tens of MB) are routed ON THE DRIVER — one argsort + take
      + equal-row split into blocks, replacing the sort->repartition->
      materialize barrier chain (each exchange a ~0.1-0.3s fixed cost
      that the 2->8 scaling ladder charges 4x against the high level).
      Larger streams fall through to the distributed sort.
    - ``"driver"``: force the driver route regardless of size.
    - ``"sort"``: global sort by home cell.  A barrier, but
      cheap in practice — measured 0.76 s for 10k queries at 32 cpus.
    - ``"hash"``: ``repartition(keys=["home_cell"])`` under Ray's
      hash-shuffle strategy.  No sort barrier, but the hash exchange
      spawns an aggregator actor pool whose startup (~seconds) swamps
      small/medium query tables — measured 8.6 s for the same 10k
      queries.  Worth it only for very large query streams where the
      pool cost amortizes; it also flips the shuffle strategy on the
      queries dataset's captured DataContext (scoped to that lineage).

    ``preload`` (default: auto — ON iff the cluster has more than one
    alive node): stage partition scan arrays into the object store once
    (``stage_partition_arrays``) so workers resolve refs instead of
    each decoding the parquet checkpoints.  On a single node the page
    cache makes repeated parquet decodes cheap and staging measured
    net-negative (interleaved A/B at 16 cpus); the win case is
    multi-node with remote/cold storage, where W workers otherwise
    issue W redundant reads per partition — there Ray also replicates
    the staged refs with node locality.
    """
    import ray as _ray

    if preload is None:
        preload = sum(1 for n in _ray.nodes() if n.get("Alive")) > 1

    manifest = buildmod.load_manifest(ckpt_dir)
    res = int(cellmod.cell_res(manifest.column("cell").to_numpy()[:1])[0])
    # per-cell salt counts -> sub-shard factors for hot-cell queries
    # (see add_home); tiny arrays, captured by the routing closure
    _mc = manifest.column("cell").to_numpy()
    _cells_u, _salt_n = np.unique(_mc, return_counts=True)
    _hot = _salt_n > 1
    hot_cells = _cells_u[_hot]
    hot_shards = np.minimum(_salt_n[_hot], 64).astype(np.uint64)
    if route_by_home_cell is None:
        route_by_home_cell = True
    if isinstance(queries_ds, pa.Table) and not (
            route_by_home_cell and route_strategy in ("auto", "driver")):
        # a pa.Table input takes the driver-routing fast path ONLY when
        # the knobs select it — with route_by_home_cell=False or an
        # explicit sort/hash strategy, wrap it in a Dataset so those
        # paths (and the hash-shuffle DataContext flip below) apply
        queries_ds = rd.from_arrow(queries_ds)
    use_keyed = False
    if route_by_home_cell and route_strategy == "hash":
        from ray.data.context import ShuffleStrategy
        qctx = getattr(queries_ds, "context", None)
        if qctx is not None:
            qctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
            use_keyed = True

    def add_home(batch: pa.Table) -> pa.Table:
        lat_u, lon_u = cellmod.latlon_to_units(batch.column("lat").to_numpy(),
                                               batch.column("lon").to_numpy())
        home = cellmod.cell_of(lat_u, lon_u, res)
        out = batch.append_column("home_cell", pa.array(home, pa.int64()))
        # route key = Knuth-scrambled home cell: sorting by it still
        # keeps each cell's queries contiguous (one ring sweep per cell
        # — the 8x group-vectorization win), but ADJACENT cells land in
        # unrelated blocks, so dense/expensive regions spread across
        # tasks instead of concentrating in a few straggler blocks.
        # Measured (no-Ray multiprocessing control, 150k queries, 8
        # procs): contiguous ranges 0.458 scaling efficiency from a 3x
        # per-chunk work spread; scrambled 0.556 with 8 coarse chunks;
        # per-core kernel contention at 8 busy cores is ~1.006x, so the
        # residual gap is pure load balance — finer Ray tasks close it.
        #
        # Queries homed in a SALTED (hot) cell additionally sub-shard
        # round-robin, each shard scattered to its own region of the
        # route space: a hot home cell scans every salt partition for
        # every query, so one cell's group can be ~20x the mean task
        # (measured 2.59s max vs 0.47s mean task at 8 cpus) — splitting
        # its queries across shards keeps total evals identical (the
        # scan is per-query-row) and only duplicates the cheap ring
        # bound sweep per shard.
        route = (home.astype(np.uint64) * np.uint64(2654435761))
        if len(hot_cells):
            pos = np.searchsorted(hot_cells, home)
            ok = (pos < len(hot_cells))
            okpos = np.where(ok, pos, 0)
            ok &= hot_cells[okpos] == home
            shards = np.ones(len(home), np.uint64)
            shards[ok] = hot_shards[okpos[ok]]
            sub = (np.arange(len(home), dtype=np.uint64)) % shards
            route = route + sub * np.uint64(0x9E3779B1)
        route = (route & np.uint64(0xFFFFFFFF)).astype(np.int64)
        return out.append_column("route_cell", pa.array(route, pa.int64()))

    # -- driver routing: the query table is the SMALL side of this join
    # (few hundred bytes/row).  When it fits comfortably on the driver
    # (<= ~2M rows, tens of MB), do the route+sort+split locally: one
    # argsort + take replaces a 3-barrier distributed exchange
    # (sort -> repartition -> materialize, each a ~0.1-0.3s fixed cost
    # that the 2->8 scaling ladder charges 4x against the high level),
    # and the split is EXACTLY cost-balanced instead of
    # boundary-sampled.  Callers may pass the queries as a pa.Table
    # directly — that skips even the materialize executor spin.
    # Larger query streams keep the distributed sort path below.
    qtab = queries_ds if isinstance(queries_ds, pa.Table) else None
    if qtab is None and route_by_home_cell and \
            route_strategy in ("auto", "driver"):
        mat = queries_ds.materialize()
        nq_total = mat.count()
        if route_strategy == "driver" or nq_total <= 2_000_000:
            qtab = pa.concat_tables(
                _ray.get(mat.to_arrow_refs())).combine_chunks()
        else:
            queries_ds = mat  # large stream: reuse the materialization
    if qtab is not None:
        nq_total = qtab.num_rows
        if nq_total == 0:
            return rd.from_arrow(qtab).map_batches(
                KnnActor(ckpt_dir), batch_format="pyarrow")
        pending = _stage_launch(ckpt_dir) if preload else None
        qtbl = add_home(qtab)
        order = np.argsort(qtbl.column("route_cell").to_numpy(),
                           kind="stable")
        srt = qtbl.take(pa.array(order))
        width = max(int(float(__import__("os").environ.get(
            "GRAFT_KNN_WPC", "4")) * int(_ray.cluster_resources().get("CPU", 8))),
            concurrency * 2, 8)
        width = min(width, nq_total)
        routed = rd.from_arrow(_cost_balanced_slices(srt, manifest, width))
        part_refs = _stage_finish(pending) if preload else None
        if not use_actor_pool:
            return routed.map_batches(
                KnnActor(ckpt_dir, part_refs=part_refs),
                batch_format="pyarrow", batch_size=batch_size,
                num_cpus=1)
        return routed.map_batches(
            KnnActor,
            fn_constructor_kwargs={"ckpt_dir": ckpt_dir,
                                   "part_refs": part_refs},
            batch_format="pyarrow", batch_size=batch_size,
            concurrency=clamp_pool(concurrency), num_cpus=1)

    routed = queries_ds.map_batches(add_home, batch_format="pyarrow",
                                    zero_copy_batch=True)
    # few input blocks starve the map stage (task parallelism == blocks);
    # 8 tasks per CPU: home cells have skewed candidate-set sizes, and
    # the last-wave straggler tail costs ~skew/waves — 2 tasks/CPU gave
    # only 2 waves at the scaling ladder's high level vs 4 at the low,
    # penalizing exactly the configuration the efficiency bar measures
    # 8 tasks/CPU default: home cells have skewed candidate-set sizes —
    # measured on the 150k-query ladder workload, 8/CPU beat 4/CPU at
    # BOTH levels (2 cpus: 13.5->11.3s; 8 cpus: 3.6->3.5s) and 16/CPU
    # lost it again to per-task overhead
    width = max(int(float(__import__("os").environ.get("GRAFT_KNN_WPC", "8")) * int(_ray.cluster_resources().get("CPU", 8))),
                concurrency * 2, 8)
    if route_by_home_cell and use_keyed:
        # keyed path: width also sets the hash-shuffle aggregator-actor
        # count — 8 tasks/CPU worth of aggregators starves the map side
        # on small sessions (observed deadlock at num_cpus=4); keep the
        # exchange at 2/CPU, the straggler-tail argument for fine tasks
        # applies to the stateless scan fan-out, not the aggregator pool
        kwidth = max(2 * int(_ray.cluster_resources().get("CPU", 8)),
                     concurrency * 2, 8)
        routed = routed.repartition(kwidth, keys=["home_cell"])
    elif route_by_home_cell:
        routed = routed.sort("route_cell").repartition(width)
    else:
        routed = routed.repartition(width)
    part_refs = None
    if preload:
        # overlap the staging read wave with the routing exchange: both
        # fill the same CPUs, and the driver blocks once, after the
        # exchange (by which point staging has normally finished) —
        # measured ~0.8s saved at 8 cpus on the 150k-query workload.
        # The routed exchange is materialized here (queries are the
        # small side; 150k routed rows ≈ 6 MB of blocks), which also
        # means the exchange doesn't re-run if the caller consumes the
        # result twice.
        pending = _stage_launch(ckpt_dir)
        routed = routed.materialize()
        part_refs = _stage_finish(pending)
    if not use_actor_pool:
        return routed.map_batches(KnnActor(ckpt_dir, part_refs=part_refs),
                                  batch_format="pyarrow",
                                  batch_size=batch_size, num_cpus=1)
    return routed.map_batches(KnnActor,
                              fn_constructor_kwargs={"ckpt_dir": ckpt_dir,
                                                     "part_refs": part_refs},
                              batch_format="pyarrow", batch_size=batch_size,
                              concurrency=clamp_pool(concurrency), num_cpus=1)


# ---------------------------------------------------------------- metric kNN


class _PartitionTopK:
    """Stateless task fn with a broadcast query set: local top-k per
    partition batch, vectorized."""

    def __init__(self, queries_ref, k: int, metric: str, data_col: str, id_col: str):
        self.queries_ref = queries_ref
        self.k = k
        self.metric = metric
        self.data_col = data_col
        self.id_col = id_col
        self._q = None

    def _queries(self):
        if self._q is None:
            self._q = ray.get(self.queries_ref)
        return self._q

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids, qdata = self._queries()
        ids = batch.column(self.id_col).to_numpy(zero_copy_only=False)
        if self.metric == "hamming":
            x = batch.column(self.data_col).to_numpy()
            dmat = phashmod.hamming_matrix(qdata, x).astype(np.float64)
        elif self.metric == "euclidian":
            # float64 throughout: float32 partial sums in the expanded
            # form make self-distances ~1e-5 instead of ~1e-13
            x = np.stack(batch.column(self.data_col).to_numpy(zero_copy_only=False)
                         ).astype(np.float64)
            d2 = ((qdata**2).sum(1)[:, None] - 2 * qdata @ x.T + (x**2).sum(1)[None, :])
            dmat = np.sqrt(np.maximum(d2, 0))
        elif self.metric == "cosine_sim":
            x = np.stack(batch.column(self.data_col).to_numpy(zero_copy_only=False)
                         ).astype(np.float64)
            qn = qdata / np.linalg.norm(qdata, axis=1, keepdims=True)
            xn = x / np.linalg.norm(x, axis=1, keepdims=True)
            dmat = -(qn @ xn.T)  # rank by similarity descending
        else:
            raise ValueError(f"unknown metric {self.metric}")
        if dmat.shape[1] == 0:
            return pa.table({"query_id": pa.array([], pa.string()),
                             self.id_col: pa.array([], pa.string()),
                             "dist": pa.array([], pa.float64())})
        k = min(self.k, dmat.shape[1])
        kth = np.partition(dmat, k - 1, axis=1)[:, k - 1]
        out_q, out_i, out_d = [], [], []
        for qi in range(dmat.shape[0]):
            # keep ALL candidates at or below the local k-th distance so the
            # global (dist, id) tie-break in the merge stage stays exact
            cols = np.flatnonzero(dmat[qi] <= kth[qi])
            out_q.extend([qids[qi]] * len(cols))
            out_i.extend(ids[cols])
            out_d.extend(dmat[qi, cols])
        return pa.table({
            "query_id": pa.array(out_q),
            self.id_col: pa.array(out_i),
            "dist": pa.array(np.asarray(out_d, np.float64), pa.float64()),
        })


def knn_metric(data_ds, query_ids, query_data, k: int, metric: str = "hamming",
               data_col: str = "phash", id_col: str = "image_id",
               batch_size: int = 8192):
    """Exact metric kNN: broadcast queries, partition-local top-k, then a
    per-query merge.  ``query_data`` is a small numpy array (n_q, ...).

    Scale contract: the query set is the BROADCAST SMALL SIDE (every
    data task scans all queries, and the merge runs one group per
    query) — right for asking hundreds-to-thousands of questions of an
    arbitrarily large corpus.  For large query TABLES use the
    partitioned-index routing (knn_geo / a metric-space analogue), not
    this scatter-gather."""
    ref = ray.put((list(query_ids), np.asarray(query_data)))
    local = data_ds.map_batches(
        _PartitionTopK(ref, k, metric, data_col, id_col),
        batch_format="pyarrow", batch_size=batch_size)

    def merge(g: pa.Table) -> pa.Table:
        d = g.column("dist").to_numpy()
        ids = g.column(id_col).to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, d))[:k]  # ties broken by id: deterministic
        sign = -1.0 if metric == "cosine_sim" else 1.0
        return pa.table({
            "query_id": pa.array([g.column("query_id")[0].as_py()] * len(order)),
            id_col: pa.array(ids[order]),
            "dist" if metric != "cosine_sim" else "similarity":
                pa.array(sign * d[order], pa.float64()),
            "rank": pa.array(np.arange(1, len(order) + 1), pa.int64()),
        })

    return local.groupby("query_id").map_groups(merge, batch_format="pyarrow")
