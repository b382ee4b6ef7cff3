"""Spatial joins: point-in-polygon (inner/semi/anti) and radius (rnn) join.

Point-in-polygon follows the broadcast-small-side rule (SURVEY.md §7.2):
the polygon layer (a few KB..MB) is ``ray.put`` once on the driver and
read once per actor in ``__init__`` — never shuffled, never re-shipped
per batch.  Each task does a vectorized bbox prefilter then exact ray
casting (geom.py).

The radius join is the distributed form of the reference's ``rnn``
(details/tree.cpp:698-735): all indexed points with dist < radius of
each query.  Candidate cells are every cell whose box lower-bound is
below the radius — known up front, so no ring iteration is needed
(SURVEY.md §2.2).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from .. import cell as cellmod
from .. import geom
from ..metrics import planar_dist, planar_dist_outer
from . import build as buildmod


class PipActor:
    """Actor pool: polygons fetched once per actor, vectorized PIP per batch."""

    def __init__(self, polygons_ref, how: str = "inner", id_col: str = "image_id"):
        # accepts either an object-store ref (actor-pool mode) or the
        # layer dict directly (pickled-instance task mode)
        layer = ray.get(polygons_ref) if not isinstance(polygons_ref, dict) else polygons_ref
        self.ids = layer["polygon_id"]
        self.rings = [np.asarray(r, np.float64) for r in layer["ring"]]
        self.bboxes = np.asarray([geom.ring_bbox(r) for r in self.rings])
        self.how = how
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        lon = batch.column("lon").to_numpy()
        lat = batch.column("lat").to_numpy()
        pi, pj = [], []
        for j, ring in enumerate(self.rings):
            bb = self.bboxes[j]
            cand = np.flatnonzero(geom.bbox_prefilter(lon, lat, bb))
            if len(cand) == 0:
                continue
            inside = geom.points_in_polygon(lon[cand], lat[cand], ring)
            hit = cand[inside]
            pi.append(hit)
            pj.append(np.full(len(hit), j, np.int64))
        pi = np.concatenate(pi) if pi else np.empty(0, np.int64)
        pj = np.concatenate(pj) if pj else np.empty(0, np.int64)
        ids = batch.column(self.id_col).to_numpy(zero_copy_only=False)
        if self.how == "inner":
            order = np.lexsort((pj, pi))  # deterministic output order per batch
            return pa.table({
                self.id_col: pa.array(ids[pi[order]]),
                "polygon_id": pa.array([self.ids[j] for j in pj[order]], pa.string()),
            })
        hit_mask = np.zeros(len(ids), bool)
        hit_mask[pi] = True
        keep = hit_mask if self.how == "semi" else ~hit_mask
        return batch.filter(pa.array(keep))


def point_in_polygon_join(points_ds, polygon_layer: dict, how: str = "inner",
                          id_col: str = "image_id", concurrency: int = 4,
                          batch_size: int = 16384, use_actor_pool: bool = True):
    """how='inner' -> (id, polygon_id) pairs; 'semi'/'anti' -> filtered rows."""
    if not use_actor_pool:
        return points_ds.map_batches(PipActor(polygon_layer, how=how, id_col=id_col),
                                     batch_format="pyarrow", batch_size=batch_size,
                                     num_cpus=1)
    ref = ray.put(polygon_layer)
    return points_ds.map_batches(
        PipActor, fn_constructor_kwargs={"polygons_ref": ref, "how": how,
                                         "id_col": id_col},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, num_cpus=1)


def nearest_rect_join(points_ds, rects: list[dict],
                      id_col: str = "image_id",
                      lat_col: str = "lat_u", lon_col: str = "lon_u",
                      batch_size: int = 16384):
    """Nearest-geometry join: for each point, the closest axis-aligned
    rectangle and the exact squared clamp distance to it, all in int64
    microdegrees (dx = max(0, x0-x, x-x1); d2 = dx*dx + dy*dy) — pure
    integer arithmetic, so results are bit-reproducible and directly
    SQL-checkable.  Points inside a rectangle get d2_u = 0.  Ties
    (including multi-rect containment) break by polygon_id ascending.

    Unlike point_in_polygon_join (membership), this answers "which
    geometry is CLOSEST" — the nearest-road/nearest-zone assignment of
    a geospatial enrichment stage.  The layer is the broadcast small
    side (numpy closure, a few KB); the points stream through
    map_batches, so no shuffle at any scale.

    Returns (id_col, polygon_id, d2_u) with one row per point.
    """
    pids = np.asarray([r["polygon_id"] for r in rects])
    order = np.argsort(pids, kind="stable")  # tie-break by polygon_id
    pids = pids[order]
    x0 = np.asarray([r["x0"] for r in rects], np.int64)[order]
    x1 = np.asarray([r["x1"] for r in rects], np.int64)[order]
    y0 = np.asarray([r["y0"] for r in rects], np.int64)[order]
    y1 = np.asarray([r["y1"] for r in rects], np.int64)[order]

    def nearest(batch: pa.Table) -> pa.Table:
        x = batch.column(lon_col).to_numpy().astype(np.int64)
        y = batch.column(lat_col).to_numpy().astype(np.int64)
        # (n_pts, n_rects) clamp distances; rect count is small by contract
        dx = np.maximum(0, np.maximum(x0[None, :] - x[:, None],
                                      x[:, None] - x1[None, :]))
        dy = np.maximum(0, np.maximum(y0[None, :] - y[:, None],
                                      y[:, None] - y1[None, :]))
        d2 = dx * dx + dy * dy
        best = np.argmin(d2, axis=1)  # first minimum = smallest polygon_id
        return pa.table({
            id_col: batch.column(id_col),
            "polygon_id": pa.array(pids[best], pa.string()),
            "d2_u": pa.array(d2[np.arange(len(x)), best], pa.int64()),
        })

    return points_ds.map_batches(nearest, batch_format="pyarrow",
                                 batch_size=batch_size, zero_copy_batch=True)


# ---------------------------------------------------------------- radius join


class RnnActor:
    """Actor pool: radius search against the partitioned geo index.

    Output is assembled with Arrow C++ gathers (``pc.take`` against the
    incoming query-id column and a per-partition Arrow id cache) — at
    1M+ hit rows the result build itself is the bottleneck, so no
    Python string ever materializes per hit.  ``emit='ids'`` skips the
    dist column entirely: callers that re-verify with their own exact
    predicate (the integer-rerank pattern) move ~1/3 less data."""

    def __init__(self, ckpt_dir: str, radius: float, cache_trees: int = 64,
                 part_refs=None, emit: str = "full"):
        import collections
        self.ckpt_dir = ckpt_dir
        self._by_cell = None
        self._cells = None
        self._res = None
        self.radius = radius
        self._cache: "collections.OrderedDict" = collections.OrderedDict()
        self.cache_trees = cache_trees
        self.part_refs = part_refs
        self.emit = emit
        self._aid: dict = {}          # path -> Arrow ids (gather source)

    @property
    def by_cell(self):
        if self._by_cell is None:
            from .knn import _manifest_lookup_cached
            self._by_cell, self._res = _manifest_lookup_cached(self.ckpt_dir)
        return self._by_cell

    @property
    def res(self):
        if self._by_cell is None:
            self.by_cell
        return self._res

    @property
    def cells(self):
        if self._cells is None:
            self._cells = np.asarray(sorted(self.by_cell), np.int64)
        return self._cells

    def __getstate__(self):
        # ship only the tiny config; the manifest lookup is re-derived
        # per worker process (see KnnActor.__getstate__)
        return {k: getattr(self, k) for k in
                ("ckpt_dir", "radius", "cache_trees", "part_refs", "emit")}

    def __setstate__(self, state):
        import collections
        for k, v in state.items():
            setattr(self, k, v)
        self._by_cell = None
        self._cells = None
        self._res = None
        self._cache = collections.OrderedDict()
        self._aid = {}

    def _tree(self, path: str):
        from .knn import _load_tree_cached
        from ..metrics import PlanarDeg
        return _load_tree_cached(path, PlanarDeg(), self.cache_trees)

    def _arrow_ids(self, path: str, ids: np.ndarray) -> pa.Array:
        got = self._aid.get(path)
        if got is None:
            got = pa.array(ids, pa.string())
            if len(self._aid) >= 4 * self.cache_trees:
                self._aid.clear()
            self._aid[path] = got
        return got

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        from .knn import _resolve_arrays
        qid_col = batch.column("query_id")
        lats = batch.column("lat").to_numpy()
        lons = batch.column("lon").to_numpy()
        out_q, out_i, hit_d = [], [], []
        if batch.num_rows:
            # one (n_queries, n_cells) lower-bound matrix for the whole
            # batch; then one distance matrix per candidate partition
            # shared by every query probing it (grouped-scan shape, like
            # knn._group_scan) — no per-query or per-hit Python work
            lbs = cellmod.points_cells_min_dist_deg(lats, lons, self.cells)
            probe = lbs < self.radius                    # (n_q, n_cells)
            for ci in np.flatnonzero(probe.any(axis=0)):
                qs = np.flatnonzero(probe[:, ci])
                for _salt, path in self.by_cell[int(self.cells[ci])]:
                    arrs = _resolve_arrays(path, self.part_refs,
                                           res_base=self.res)
                    plat, plon, ids = arrs[0], arrs[1], arrs[2]
                    if len(arrs) > 3 and len(qs) * len(plat) >= (1 << 16):
                        # hot partition with a staged sub-cell CSR: a
                        # radius query only needs sub-cells whose box
                        # lower bound is inside the radius — same true-
                        # lower-bound pruning as the cell-level probe,
                        # one level down (strict d < radius predicate
                        # unchanged on the surviving rows)
                        sub_cells, sub_starts = arrs[3], arrs[4]
                        slb = cellmod.points_cells_min_dist_deg(
                            lats[qs], lons[qs], sub_cells)
                        sprobe = slb < self.radius
                        for j in np.flatnonzero(sprobe.any(axis=0)):
                            q2 = qs[np.flatnonzero(sprobe[:, j])]
                            a = int(sub_starts[j])
                            b = int(sub_starts[j + 1])
                            d = planar_dist_outer(plat[a:b], plon[a:b],
                                                  lats[q2], lons[q2])
                            rr, cc = np.nonzero(d < self.radius)
                            if len(rr):
                                out_q.append(pc.take(
                                    qid_col, pa.array(q2[rr], pa.int64())))
                                out_i.append(pc.take(
                                    self._arrow_ids(path, ids),
                                    pa.array(cc + a, pa.int64())))
                                if self.emit == "full":
                                    hit_d.append(d[rr, cc])
                        continue
                    d = planar_dist_outer(plat, plon, lats[qs], lons[qs])
                    rr, cc = np.nonzero(d < self.radius)  # strict: rnn semantics
                    if len(rr):
                        out_q.append(pc.take(qid_col,
                                             pa.array(qs[rr], pa.int64())))
                        out_i.append(pc.take(self._arrow_ids(path, ids),
                                             pa.array(cc, pa.int64())))
                        if self.emit == "full":
                            hit_d.append(d[rr, cc])
        if out_q:
            cols = {
                "query_id": pa.concat_arrays(
                    [a.combine_chunks() if isinstance(a, pa.ChunkedArray)
                     else a for a in out_q]),
                "image_id": pa.concat_arrays(
                    [a.combine_chunks() if isinstance(a, pa.ChunkedArray)
                     else a for a in out_i]),
            }
            if self.emit == "full":
                cols["dist"] = pa.array(np.concatenate(hit_d), pa.float64())
            return pa.table(cols)
        cols = {"query_id": pa.array([], pa.string()),
                "image_id": pa.array([], pa.string())}
        if self.emit == "full":
            cols["dist"] = pa.array([], pa.float64())
        return pa.table(cols)


def radius_join(queries_ds, ckpt_dir: str, radius: float, concurrency: int = 4,
                batch_size: int = 256, use_actor_pool: bool = True,
                preload: bool | None = None, emit: str = "full"):
    """All (query, image) pairs with planar-degree dist < radius (strict,
    matching the reference's rnn).  ``use_actor_pool=False`` ships a
    pickled RnnActor to stateless tasks — parallelism then follows the
    cluster instead of the fixed pool size (same tradeoff as knn_geo).
    ``preload`` (default auto: ON iff the cluster has more than one
    alive node, see knn.knn_geo): share staged object-store partition
    arrays instead of per-worker parquet decodes — for multi-node
    remote-storage deployments.  ``emit='ids'`` drops the
    dist column (callers re-verifying with an exact predicate)."""
    import ray as _ray

    from .knn import _stage_finish, _stage_launch, clamp_pool, stage_partition_arrays

    if preload is None:
        preload = sum(1 for n in _ray.nodes() if n.get("Alive")) > 1
    part_refs = None
    stage_pending = None
    if preload:
        if use_actor_pool:
            part_refs = stage_partition_arrays(ckpt_dir)
        else:
            # task path: overlap the staging wave with the routing
            # exchange below (same scheme as knn_geo)
            stage_pending = _stage_launch(ckpt_dir)
    if not use_actor_pool:
        # Route by SCRAMBLED home cell (same scheme as knn_geo): a block
        # of co-located queries probes a handful of cells, so the
        # per-batch candidate-cell loop stays short — unrouted random
        # batches each probed ~all occupied cells, a per-task fixed cost
        # that grew with task count (measured: 27.2s aggregate remote
        # time at 8 cpus vs 19.4s at 2 for the same 30k queries).  The
        # scramble spreads dense regions across blocks for balance.
        actor = RnnActor(ckpt_dir, radius, part_refs=None, emit=emit)
        res = (int(cellmod.cell_res(actor.cells[:1])[0])
               if len(actor.cells) else 5)

        def add_route(batch: pa.Table) -> pa.Table:
            lat_u, lon_u = cellmod.latlon_to_units(
                batch.column("lat").to_numpy(), batch.column("lon").to_numpy())
            home = cellmod.cell_of(lat_u, lon_u, res)
            route = ((home.astype(np.uint64) * np.uint64(2654435761))
                     & np.uint64(0xFFFFFFFF)).astype(np.int64)
            return (batch.append_column("home_cell", pa.array(home, pa.int64()))
                         .append_column("route_cell", pa.array(route, pa.int64())))

        width = max(4 * int(_ray.cluster_resources().get("CPU", 8)), 8)
        # driver routing for small query tables — same scheme and
        # rationale as knn_geo: one argsort + cost-balanced contiguous
        # split replaces the sort->repartition barrier chain
        qtab = queries_ds if isinstance(queries_ds, pa.Table) else None
        if qtab is None:
            mat = queries_ds.materialize()
            if mat.count() <= 2_000_000:
                qtab = pa.concat_tables(
                    _ray.get(mat.to_arrow_refs())).combine_chunks()
            else:
                queries_ds = mat
        if qtab is not None and qtab.num_rows:
            from .build import load_manifest
            from .knn import _cost_balanced_slices
            import ray.data as _rd
            srt_in = add_route(qtab)
            order = np.argsort(srt_in.column("route_cell").to_numpy(),
                               kind="stable")
            srt = srt_in.take(pa.array(order))
            manifest = load_manifest(ckpt_dir)
            routed = _rd.from_arrow(_cost_balanced_slices(
                srt, manifest, min(width, qtab.num_rows)))
        else:
            if qtab is not None:   # empty table input
                import ray.data as _rd
                queries_ds = _rd.from_arrow(qtab)
            routed = (queries_ds.map_batches(add_route, batch_format="pyarrow",
                                             zero_copy_batch=True)
                      .sort("route_cell").repartition(width))
            if stage_pending is not None:
                routed = routed.materialize()
        if stage_pending is not None:
            actor.part_refs = _stage_finish(stage_pending)
        return routed.map_batches(actor, batch_format="pyarrow",
                                  batch_size=batch_size, num_cpus=1)
    if isinstance(queries_ds, pa.Table):
        # mirror knn_geo's contract: a pa.Table input is accepted in
        # BOTH modes (the task path routes it on the driver above; the
        # actor-pool path just wraps it in a Dataset here)
        import ray.data as _rd
        queries_ds = _rd.from_arrow(queries_ds)
    return queries_ds.map_batches(
        RnnActor, fn_constructor_kwargs={"ckpt_dir": ckpt_dir, "radius": radius,
                                         "part_refs": part_refs, "emit": emit},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=clamp_pool(concurrency), num_cpus=1)


# ----------------------------------------------------------------- range join


class RangeJoinActor:
    """Broadcast interval (theta) join: rows x intervals containing the value.

    The reference engine has no interval machinery; this is the generic
    "range join" a training-data pipeline needs (price bands, length
    buckets, time windows) expressed Ray-Data-first: the interval side
    is SMALL (bands/buckets — KBs) and is ``ray.put`` once, read once
    per actor; the fact side streams through ``map_batches`` and never
    shuffles.  Two vectorized paths:

    * intervals pairwise DISJOINT (the common bucketing case, detected
      at init): one ``np.searchsorted`` per batch — O(n log m);
    * overlapping intervals: one boolean mask per interval —
      O(n * m) but each pass is a numpy kernel, fine for the
      broadcast-sized interval counts this operator is for (an interval
      TREE side belongs in a different operator).
    """

    def __init__(self, layer_ref, value_col: str, how: str = "inner",
                 closed: str = "left"):
        layer = ray.get(layer_ref) if not isinstance(layer_ref, dict) else layer_ref
        iv_id = np.asarray(layer["interval_id"])
        lo = np.asarray(layer["lo"], np.float64)
        hi = np.asarray(layer["hi"], np.float64)
        if closed not in ("left", "both"):
            raise ValueError(f"closed must be 'left' or 'both', got {closed!r}")
        if how not in ("inner", "semi", "anti"):
            raise ValueError(f"how must be inner/semi/anti, got {how!r}")
        if np.any(hi < lo):
            raise ValueError("interval with hi < lo")
        order = np.argsort(lo, kind="stable")
        self.iv_id, self.lo, self.hi = iv_id[order], lo[order], hi[order]
        # disjoint iff, sorted by lo, each interval ends before the next
        # begins (strictly before for closed='both')
        nxt = self.lo[1:]
        end = self.hi[:-1]
        self.disjoint = bool(np.all(end < nxt) if closed == "both"
                             else np.all(end <= nxt))
        self.value_col, self.how, self.closed = value_col, how, closed

    def _match(self, v: np.ndarray):
        """-> (row_idx, interval_idx) sorted by (row, interval-lo-order)."""
        if self.disjoint:
            idx = np.searchsorted(self.lo, v, side="right") - 1
            ok = idx >= 0
            iv = np.where(ok, idx, 0)
            inside = (v <= self.hi[iv]) if self.closed == "both" else (v < self.hi[iv])
            ok &= inside
            ri = np.flatnonzero(ok)
            return ri, idx[ri]
        ri_parts, ii_parts = [], []
        for j in range(len(self.lo)):
            m = v >= self.lo[j]
            m &= (v <= self.hi[j]) if self.closed == "both" else (v < self.hi[j])
            hit = np.flatnonzero(m)
            if len(hit):
                ri_parts.append(hit)
                ii_parts.append(np.full(len(hit), j, np.int64))
        if not ri_parts:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        ri = np.concatenate(ri_parts)
        ii = np.concatenate(ii_parts)
        order = np.lexsort((ii, ri))     # deterministic: row-major
        return ri[order], ii[order]

    def __call__(self, batch: pa.Table) -> pa.Table:
        v = batch.column(self.value_col).to_numpy(zero_copy_only=False).astype(
            np.float64, copy=False)
        ri, ii = self._match(v)
        if self.how == "inner":
            out = batch.take(pa.array(ri, pa.int64()))
            return out.append_column("interval_id", pa.array(self.iv_id[ii]))
        hit = np.zeros(len(v), bool)
        hit[ri] = True
        keep = hit if self.how == "semi" else ~hit
        return batch.filter(pa.array(keep))


def range_join(ds, intervals: dict, value_col: str, how: str = "inner",
               closed: str = "left", concurrency: int = 4,
               batch_size: int = 16384, use_actor_pool: bool = True):
    """Join each row to every interval containing ``row[value_col]``.

    ``intervals``: {"interval_id": [...], "lo": [...], "hi": [...]} —
    must be broadcast-small (bands, buckets, windows).  ``closed``:
    'left' = [lo, hi), 'both' = [lo, hi].  how='inner' appends an
    ``interval_id`` column (rows matching k intervals emit k times);
    'semi'/'anti' filter rows.  Output order within a batch is
    row-major then interval lo-order — deterministic.
    """
    if not use_actor_pool:
        return ds.map_batches(
            RangeJoinActor(intervals, value_col, how=how, closed=closed),
            batch_format="pyarrow", batch_size=batch_size, num_cpus=1)
    ref = ray.put(intervals)
    return ds.map_batches(
        RangeJoinActor,
        fn_constructor_kwargs={"layer_ref": ref, "value_col": value_col,
                               "how": how, "closed": closed},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, num_cpus=1)


def shuffle_hash_join(left, right, on: str, left_cols: list[str],
                      right_cols: list[str], how: str = "inner"):
    """Generic large x large equi-join: neither side broadcastable.

    Shape: tag each side, union the (projected) streams, one
    ``groupby(on)`` exchange co-locates both sides' rows per key, and
    the per-group kernel emits the vectorized cross-product of the two
    sides (np.repeat/np.tile index gathers — no Python row loop).
    ``how='inner'`` or ``'left'`` (left rows with no match emit nulls).

    Scale contract: ONE all-to-all exchange over the union of the two
    projections (project before joining!).  Every row of a key lands in
    one task, so a pathologically hot key serializes — for those,
    pre-split with the bloom/broadcast variants or salt the build side.
    ``left_cols``/``right_cols`` must be disjoint output names.
    """
    overlap = set(left_cols) & set(right_cols)
    if overlap:
        raise ValueError(f"shuffle_hash_join: overlapping output columns "
                         f"{sorted(overlap)}; rename before joining")
    if how not in ("inner", "left"):
        raise ValueError(f"how={how!r} unsupported (inner|left)")

    lsch, rsch = left.schema(), right.schema()
    type_of = {c: lsch.base_schema.field(c).type for c in left_cols}
    type_of.update({c: rsch.base_schema.field(c).type for c in right_cols})

    def tag(side: int, keep: list[str], other: list[str]):
        def fn(b: pa.Table) -> pa.Table:
            out = {on: b.column(on)}
            for c in keep:
                out[c] = b.column(c)
            n = len(b)
            for c in other:
                out[c] = pa.nulls(n, type_of[c])
            out["__side"] = pa.array(np.full(n, side, np.int8))
            return pa.table(out)
        return fn

    lt = left.map_batches(tag(0, left_cols, right_cols),
                          batch_format="pyarrow", zero_copy_batch=True)
    rt = right.map_batches(tag(1, right_cols, left_cols),
                           batch_format="pyarrow", zero_copy_batch=True)
    both = lt.union(rt)

    def join_group(g: pa.Table) -> pa.Table:
        side = g.column("__side").to_numpy()
        li = np.flatnonzero(side == 0)
        ri = np.flatnonzero(side == 1)
        nl, nr = len(li), len(ri)
        empty_match = nr == 0
        if nl == 0 or (empty_match and how == "inner"):
            cols = {on: g.column(on).slice(0, 0)}
            for c in left_cols + right_cols:
                cols[c] = g.column(c).slice(0, 0)
            return pa.table(cols)
        key = g.column(on)
        if empty_match:  # how == 'left': keep left rows, null right
            take_l = li
            out = {on: key.take(pa.array(take_l))}
            for c in left_cols:
                out[c] = g.column(c).take(pa.array(take_l))
            for c in right_cols:
                out[c] = pa.nulls(nl, g.schema.field(c).type)
            return pa.table(out)
        take_l = np.repeat(li, nr)
        take_r = np.tile(ri, nl)
        out = {on: key.take(pa.array(take_l))}
        for c in left_cols:
            out[c] = g.column(c).take(pa.array(take_l))
        for c in right_cols:
            out[c] = g.column(c).take(pa.array(take_r))
        return pa.table(out)

    return both.groupby(on).map_groups(join_group, batch_format="pyarrow")


def _halo_res(radius_u: int) -> int:
    """Finest grid resolution whose cell side is >= radius_u in BOTH
    axes, so every neighbor within the radius lies in the 3x3 cell
    neighborhood (the ghost/halo-cell guarantee) with the smallest
    possible candidate groups."""
    if radius_u <= 0:
        raise ValueError("radius_u must be positive")
    res = 0
    while (res < cellmod.MAX_RES
           and (cellmod.LON_SPAN_U >> (res + 1)) >= radius_u
           and (cellmod.LAT_SPAN_U >> (res + 1)) >= radius_u):
        res += 1
    return res


# direct-matrix budget per group: above this many home x candidate
# products, the per-cell kernel switches to the two-level fine-binned
# path (a dense city cell would otherwise cost O(m^2) on all homes)
_DENSE_LIMIT = 4_000_000


def _matrix_topk(hpos: np.ndarray, cpos: np.ndarray, ids: np.ndarray,
                 x: np.ndarray, y: np.ndarray, k: int, r2,
                 chunk: int) -> tuple[tuple, np.ndarray]:
    """Exact top-k scan: for each home row (``hpos`` indexes into the
    id-sorted group arrays), the k nearest candidate rows (``cpos``,
    MUST be ascending so candidate position order == id order and
    distance ties break by neighbor id) with d2 <= r2, self-id
    excluded.

    (d2, candidate-position) packs into ONE int64 whenever r2*m + m
    fits, so per home row the cut is argpartition (O(m)) + a k-wide
    sort instead of a full-row argsort — the difference between 3s and
    36s on a dense cell.  Falls back to the O(m log m) stable argsort
    for huge radii.

    Returns ((home_row_idx, nb_global_pos, rank, d2), counts) where
    home_row_idx indexes into ``hpos`` and counts[i] is the number of
    emitted neighbors for hpos[i].
    """
    sentinel = np.iinfo(np.int64).max
    m = len(cpos)
    cx, cy, cid = x[cpos], y[cpos], ids[cpos]
    pos = np.arange(m, dtype=np.int64)[None, :]
    r2 = np.int64(r2)
    packable = m > 0 and r2 <= (sentinel - m) // max(m, 1)
    counts = np.zeros(len(hpos), np.int64)
    out_hr, out_nb, out_rk, out_d2 = [], [], [], []
    kk = min(k, m)
    for s in range(0, len(hpos), chunk):
        hp = hpos[s:s + chunk]
        dx = x[hp][:, None] - cx[None, :]
        dy = y[hp][:, None] - cy[None, :]
        d2 = dx * dx + dy * dy
        bad = (d2 > r2) | (ids[hp][:, None] == cid[None, :])
        if packable:
            key = d2 * m + pos
            np.copyto(key, sentinel, where=bad)
            if kk < m:
                part = np.argpartition(key, kk - 1, axis=1)[:, :kk]
                pkey = np.take_along_axis(key, part, axis=1)
            else:
                part = np.broadcast_to(pos, key.shape)
                pkey = key
            ord_k = np.argsort(pkey, axis=1, kind="stable")
            top = np.take_along_axis(part, ord_k, axis=1)
            valid = np.take_along_axis(pkey, ord_k, axis=1) < sentinel
            dtop = np.take_along_axis(d2, top, axis=1)
        else:  # huge-radius degenerate cell: exact but O(m log m)
            np.copyto(d2, sentinel, where=bad)
            top = np.argsort(d2, axis=1, kind="stable")[:, :kk]
            dtop = np.take_along_axis(d2, top, axis=1)
            valid = dtop < sentinel
        ii, jj = np.nonzero(valid)
        counts[s:s + len(hp)] = valid.sum(axis=1)
        out_hr.append(s + ii)
        out_nb.append(cpos[top[ii, jj]])
        out_rk.append(jj.astype(np.int64) + 1)
        out_d2.append(dtop[ii, jj])
    cat = (lambda a: np.concatenate(a) if a else np.empty(0, np.int64))
    return (cat(out_hr), cat(out_nb), cat(out_rk), cat(out_d2)), counts



_MAX_DEPTH = 10
_BIN_AXIS = 8


def _local_knn(hpos: np.ndarray, cpos: np.ndarray, ids: np.ndarray,
               x: np.ndarray, y: np.ndarray, k: int, r2, chunk: int,
               depth: int = 0) -> tuple[tuple, np.ndarray]:
    """Exact top-k within r2 for home rows ``hpos`` among candidate
    rows ``cpos`` (both ascending position arrays into the id-sorted
    group; hpos must be a subset of cpos).

    Recursive grid refinement: bin the candidate extent into
    _BIN_AXIS-per-side tiles; a home that finds k neighbors within ONE
    tile side (all such neighbors lie in its 3x3 tile block — the halo
    argument, one level down) is exactly resolved; unresolved homes
    fall back to a full matrix scan at this level.  Dense
    concentrations (a city inside one coarse cell) keep subdividing
    until leaf matrices fit _DENSE_LIMIT, so per-home work is
    O(local density) instead of O(cell population).

    Returns ((home_global_pos, nb_global_pos, rank, d2), counts) with
    counts aligned to ``hpos``.
    """
    m = len(cpos)
    empty = tuple(np.empty(0, np.int64) for _ in range(4))
    if len(hpos) == 0:
        return empty, np.zeros(0, np.int64)
    if len(hpos) * m <= _DENSE_LIMIT or m <= 4 * k or depth >= _MAX_DEPTH:
        r, counts = _matrix_topk(hpos, cpos, ids, x, y, k, r2, chunk)
        return (cpos_take(hpos, r[0]), r[1], r[2], r[3]), counts
    cx, cy = x[cpos], y[cpos]
    x0, y0 = int(cx.min()), int(cy.min())
    ext = max(int(cx.max()) - x0, int(cy.max()) - y0, 1)
    side = ext // _BIN_AXIS + 1
    nby = _BIN_AXIS + 1
    cbid = ((cx - x0) // side) * nby + (cy - y0) // side
    if cbid.min() == cbid.max():  # co-located mass: cannot shrink
        r, counts = _matrix_topk(hpos, cpos, ids, x, y, k, r2, chunk)
        return (cpos_take(hpos, r[0]), r[1], r[2], r[3]), counts
    r1_2 = min(int(r2), side * side)
    corder = np.argsort(cbid, kind="stable")
    sb = cbid[corder]
    ub, ust = np.unique(sb, return_index=True)
    uen = np.append(ust[1:], m)
    slot = {int(b): (int(s0), int(s1))
            for b, s0, s1 in zip(ub, ust, uen)}
    hbid = ((x[hpos] - x0) // side) * nby + (y[hpos] - y0) // side
    counts = np.zeros(len(hpos), np.int64)
    rows, un_list, unsel_list = [], [], []
    for b in np.unique(hbid):
        sel = np.flatnonzero(hbid == b)
        hp = hpos[sel]
        bi, bj = divmod(int(b), nby)
        cps = []
        for di in (-1, 0, 1):
            for dj in (-1, 0, 1):
                s01 = slot.get((bi + di) * nby + (bj + dj))
                if s01 is not None:
                    cps.append(corder[s01[0]:s01[1]])
        cp = cpos[np.sort(np.concatenate(cps))]
        subrows, subcounts = _local_knn(hp, cp, ids, x, y, k, r1_2,
                                        chunk, depth + 1)
        ok = subcounts >= k
        if subrows[0].size:
            keep = ok[np.searchsorted(hp, subrows[0])]
            rows.append(tuple(a[keep] for a in subrows))
        counts[sel[ok]] = subcounts[ok]
        un_list.append(hp[~ok])
        unsel_list.append(sel[~ok])
    un = np.concatenate(un_list)
    if len(un):
        unsel = np.concatenate(unsel_list)
        uo = np.argsort(un, kind="stable")  # _matrix_topk wants ascending
        r, c2 = _matrix_topk(un[uo], cpos, ids, x, y, k, r2, chunk)
        rows.append((un[uo][r[0]], r[1], r[2], r[3]))
        counts[unsel[uo]] = c2
    cat = (lambda i: np.concatenate([rr[i] for rr in rows])
           if rows else np.empty(0, np.int64))
    return (cat(0), cat(1), cat(2), cat(3)), counts


def cpos_take(hpos: np.ndarray, hrow: np.ndarray) -> np.ndarray:
    """hrow (indices into hpos) -> global positions; empty-safe."""
    return hpos[hrow] if len(hrow) else np.empty(0, np.int64)


def _halo_masks(x: np.ndarray, y: np.ndarray, ix: np.ndarray,
                iy: np.ndarray, res: int, radius_u: int):
    """Per-axis boundary-gap tests for halo replication: a point needs
    a copy in a neighbor cell ONLY if that cell's nearest boundary is
    within the radius (any in-radius home point there is at least that
    far away).  With cell side in [radius, 2*radius) this cuts mean
    replication from 9x to ~2-4x.  Returns (need_dx_minus,
    need_dx_plus, need_dy_minus, need_dy_plus) boolean arrays.

    Cell boundaries follow cell_xy exactly: the first offset
    coordinate of cell i is ceil(i * SPAN / 2^res).
    """
    n = np.int64(1) << np.int64(res)
    r = np.int64(radius_u)
    qx = np.asarray(x, np.int64) + cellmod.LON_OFF_U
    qy = np.asarray(y, np.int64) + cellmod.LAT_OFF_U
    lon_span = np.int64(cellmod.LON_SPAN_U)
    lat_span = np.int64(cellmod.LAT_SPAN_U)
    x_low = (ix * lon_span + n - 1) // n       # first coord of own cell
    x_next = ((ix + 1) * lon_span + n - 1) // n
    y_low = (iy * lat_span + n - 1) // n
    y_next = ((iy + 1) * lat_span + n - 1) // n
    # nearest coordinate of cell i-1 is x_low - 1; of cell i+1 is x_next
    return (qx - (x_low - 1) <= r, x_next - qx <= r,
            qy - (y_low - 1) <= r, y_next - qy <= r)


def knn_self_join(ds, k: int, radius_u: int, id_col: str = "o_orderkey",
                  lat_col: str = "lat_u", lon_col: str = "lon_u",
                  chunk: int = 1024):
    """Bounded kNN self-join: for EVERY point, its k nearest OTHER
    points within planar distance ``radius_u`` (int64-exact squared
    microdegree arithmetic; ties broken by neighbor id).

    This is the self-join form of the reference's knn/rnn
    (details/tree.cpp:635-735) with no query side — the pattern a
    broadcast cannot express because both sides are the full corpus.
    Distribution shape (halo / ghost cells): points land in the
    finest grid whose cell side >= radius_u; each point emits one
    HOME row in its own cell plus <=8 HALO copies into adjacent cells
    (<=9x replication, bounded, no all-pairs anywhere).  ONE
    groupby(cell) exchange then co-locates every point with its full
    candidate set, and the per-group kernel is a chunked vectorized
    distance matrix with a stable top-k cut.  Output is <= k rows per
    point.

    Scale contract: replication is <=9x the (projected!) point stream;
    a dense cell costs O(m^2) distance evaluations — inherent to an
    exact bounded join — but peak memory stays O(chunk x m) via home-
    row chunking.  Distances are planar (no +-180 wraparound), matching
    the SQL band-join formulation.
    """
    if k <= 0:
        raise ValueError("k must be positive")
    radius_u = int(radius_u)
    r2 = np.int64(radius_u) * np.int64(radius_u)
    res = _halo_res(radius_u)
    n_side = np.int64(1) << np.int64(res)

    def expand(b: pa.Table) -> pa.Table:
        ids = b.column(id_col).to_numpy()
        x = b.column(lon_col).to_numpy().astype(np.int64, copy=False)
        y = b.column(lat_col).to_numpy().astype(np.int64, copy=False)
        ix, iy = cellmod.cell_xy(y, x, res)
        nxm, nxp, nym, nyp = _halo_masks(x, y, ix, iy, res, radius_u)
        need_x = {-1: nxm, 0: None, 1: nxp}
        need_y = {-1: nym, 0: None, 1: nyp}
        gid, gx, gy, gg, gh = [], [], [], [], []
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                jx, jy = ix + dx, iy + dy
                ok = (jx >= 0) & (jx < n_side) & (jy >= 0) & (jy < n_side)
                if need_x[dx] is not None:
                    ok &= need_x[dx]
                if need_y[dy] is not None:
                    ok &= need_y[dy]
                gid.append(ids[ok])
                gx.append(x[ok])
                gy.append(y[ok])
                gg.append(jy[ok] * n_side + jx[ok])
                gh.append(np.full(int(ok.sum()),
                                  1 if dx == 0 and dy == 0 else 0, np.int8))
        return pa.table({
            "gcell": pa.array(np.concatenate(gg), pa.int64()),
            "__home": pa.array(np.concatenate(gh), pa.int8()),
            id_col: pa.array(np.concatenate(gid)),
            "__x": pa.array(np.concatenate(gx), pa.int64()),
            "__y": pa.array(np.concatenate(gy), pa.int64()),
        })

    halo = ds.select_columns([id_col, lat_col, lon_col]).map_batches(
        expand, batch_format="pyarrow", zero_copy_batch=True)

    def per_cell(g: pa.Table) -> pa.Table:
        ids = g.column(id_col).to_numpy(zero_copy_only=False)
        x = g.column("__x").to_numpy()
        y = g.column("__y").to_numpy()
        home = g.column("__home").to_numpy()
        # candidates sorted by id once: everywhere below, candidate
        # POSITION order == id order, so distance ties break by
        # neighbor id ascending without any per-row lexsort
        order = np.argsort(ids, kind="stable")
        ids, x, y, home = ids[order], x[order], y[order], home[order]
        hsel = np.flatnonzero(home == 1)
        allpos = np.arange(len(ids), dtype=np.int64)
        (hrow, nbpos, rk, d2v), _ = _local_knn(hsel, allpos, ids, x, y,
                                               k, r2, chunk)
        id_type = g.schema.field(id_col).type
        return pa.table({
            id_col: pa.array(ids[hrow], id_type) if len(hrow)
            else pa.array([], id_type),
            "neighbor_id": pa.array(ids[nbpos], id_type) if len(nbpos)
            else pa.array([], id_type),
            "rank": pa.array(rk, pa.int64()),
            "d2_u": pa.array(d2v, pa.int64()),
        })

    return halo.groupby("gcell").map_groups(per_cell, batch_format="pyarrow")


def radius_pairs_join(left, right, radius_u: int,
                      left_id: str = "id_a", right_id: str = "id_b",
                      lat_col: str = "lat_u", lon_col: str = "lon_u",
                      chunk: int = 2048):
    """Bipartite within-distance join: ALL (left, right) pairs with
    planar distance <= radius_u, where BOTH sides are full corpora —
    the spatial equi-join neither a broadcast (small-side) nor an
    index lookup (bounded query set) can express.

    Same halo shape as knn_self_join: left rows land home-only in the
    finest grid whose cell side >= radius_u, right rows replicate into
    <=9 adjacent cells, ONE groupby(cell) exchange co-locates every
    left row with every right row it could pair with, and the per-cell
    kernel is a chunked vectorized distance filter (exact int64).

    Output is the TRUE pair set (left_id, right_id, d2_u): on dense
    data its size is inherently quadratic in local density — size the
    radius to the question, not the other way around.  Rows of the two
    sides are never compared within a side, and equal ids across sides
    are paired (the sides are different tables by contract).
    """
    radius_u = int(radius_u)
    r2 = np.int64(radius_u) * np.int64(radius_u)
    res = _halo_res(radius_u)
    n_side = np.int64(1) << np.int64(res)

    def tag(side: int, idc: str):
        def fn(b: pa.Table) -> pa.Table:
            ids = b.column(idc).to_numpy()
            x = b.column(lon_col).to_numpy().astype(np.int64, copy=False)
            y = b.column(lat_col).to_numpy().astype(np.int64, copy=False)
            ix, iy = cellmod.cell_xy(y, x, res)
            if side == 0:  # left: home cell only
                return pa.table({
                    "gcell": pa.array(iy * n_side + ix, pa.int64()),
                    "__side": pa.array(np.zeros(len(ids), np.int8)),
                    "__id": pa.array(ids),
                    "__x": pa.array(x, pa.int64()),
                    "__y": pa.array(y, pa.int64()),
                })
            nxm, nxp, nym, nyp = _halo_masks(x, y, ix, iy, res, radius_u)
            need_x = {-1: nxm, 0: None, 1: nxp}
            need_y = {-1: nym, 0: None, 1: nyp}
            gid, gx, gy, gg = [], [], [], []
            for dx in (-1, 0, 1):
                for dy in (-1, 0, 1):
                    jx, jy = ix + dx, iy + dy
                    ok = ((jx >= 0) & (jx < n_side)
                          & (jy >= 0) & (jy < n_side))
                    if need_x[dx] is not None:
                        ok &= need_x[dx]
                    if need_y[dy] is not None:
                        ok &= need_y[dy]
                    gid.append(ids[ok])
                    gx.append(x[ok])
                    gy.append(y[ok])
                    gg.append(jy[ok] * n_side + jx[ok])
            return pa.table({
                "gcell": pa.array(np.concatenate(gg), pa.int64()),
                "__side": pa.array(np.ones(sum(len(a) for a in gid),
                                           np.int8)),
                "__id": pa.array(np.concatenate(gid)),
                "__x": pa.array(np.concatenate(gx), pa.int64()),
                "__y": pa.array(np.concatenate(gy), pa.int64()),
            })
        return fn

    lt = left.select_columns([left_id, lat_col, lon_col]).map_batches(
        tag(0, left_id), batch_format="pyarrow", zero_copy_batch=True)
    rt = right.select_columns([right_id, lat_col, lon_col]).map_batches(
        tag(1, right_id), batch_format="pyarrow", zero_copy_batch=True)

    def per_cell(g: pa.Table) -> pa.Table:
        side = g.column("__side").to_numpy()
        ids = g.column("__id").to_numpy(zero_copy_only=False)
        x = g.column("__x").to_numpy()
        y = g.column("__y").to_numpy()
        li = np.flatnonzero(side == 0)
        ri = np.flatnonzero(side == 1)
        id_type = g.schema.field("__id").type
        empty = pa.table({left_id: pa.array([], id_type),
                          right_id: pa.array([], id_type),
                          "d2_u": pa.array([], pa.int64())})
        if len(li) == 0 or len(ri) == 0:
            return empty
        rx, ry, rid = x[ri], y[ri], ids[ri]
        out_a, out_b, out_d = [], [], []
        for s in range(0, len(li), chunk):
            ls = li[s:s + chunk]
            dx = x[ls][:, None] - rx[None, :]
            dy = y[ls][:, None] - ry[None, :]
            d2 = dx * dx + dy * dy
            ii, jj = np.nonzero(d2 <= r2)
            out_a.append(ids[ls][ii])
            out_b.append(rid[jj])
            out_d.append(d2[ii, jj])
        if not out_a or not sum(len(a) for a in out_a):
            return empty
        return pa.table({
            left_id: pa.array(np.concatenate(out_a), id_type),
            right_id: pa.array(np.concatenate(out_b), id_type),
            "d2_u": pa.array(np.concatenate(out_d), pa.int64())})

    return lt.union(rt).groupby("gcell").map_groups(
        per_cell, batch_format="pyarrow")


def rect_overlap_join(rects, res: int, id_col: str = "rect_id",
                      chunk: int = 2048):
    """Spatial overlap self-join over a set of axis-aligned rectangles
    (id, x0, x1, y0, y1 in int64 microdegrees): all pairs whose CLOSED
    boxes intersect (touching edges count, overlap area may be 0),
    plus the exact int64 intersection area.

    This is the textbook PBSM (partition-based spatial merge) join:
    every rectangle replicates to each grid cell its box overlaps at
    resolution ``res``; candidate pairs meet inside a cell; and the
    classic REFERENCE-POINT rule deduplicates globally without any
    shuffle — a pair is emitted only by the cell containing the
    intersection's lower-left corner (max(x0), max(y0)), which lies in
    exactly one cell.  Pick ``res`` so a typical rectangle spans a few
    cells: replication is O(box area / cell area) per rectangle.

    Output: (id_a, id_b, area_u2) with id_a < id_b.
    """
    n_side = np.int64(1) << np.int64(res)

    def expand(b: pa.Table) -> pa.Table:
        ids = b.column(id_col).to_numpy()
        x0 = b.column("x0").to_numpy().astype(np.int64, copy=False)
        x1 = b.column("x1").to_numpy().astype(np.int64, copy=False)
        y0 = b.column("y0").to_numpy().astype(np.int64, copy=False)
        y1 = b.column("y1").to_numpy().astype(np.int64, copy=False)
        if len(ids) == 0:  # np.repeat below cannot broadcast (1,)x(0,)
            return pa.table({
                "gcell": pa.array([], pa.int64()),
                id_col: b.column(id_col),
                "__x0": pa.array([], pa.int64()),
                "__x1": pa.array([], pa.int64()),
                "__y0": pa.array([], pa.int64()),
                "__y1": pa.array([], pa.int64()),
            })
        ix0, iy0 = cellmod.cell_xy(y0, x0, res)
        ix1, iy1 = cellmod.cell_xy(y1, x1, res)
        w = ix1 - ix0 + 1
        h = iy1 - iy0 + 1
        ncells = (w * h).astype(np.int64)
        total = int(ncells.sum())
        idx = np.repeat(np.arange(len(ids), dtype=np.int64), ncells)
        offs = np.arange(total, dtype=np.int64) - np.repeat(
            np.concatenate([[0], np.cumsum(ncells)[:-1]]), ncells)
        dx = offs % w[idx]
        dy = offs // w[idx]
        cell = (iy0[idx] + dy) * n_side + (ix0[idx] + dx)
        return pa.table({
            "gcell": pa.array(cell, pa.int64()),
            id_col: pa.array(ids[idx]),
            "__x0": pa.array(x0[idx], pa.int64()),
            "__x1": pa.array(x1[idx], pa.int64()),
            "__y0": pa.array(y0[idx], pa.int64()),
            "__y1": pa.array(y1[idx], pa.int64()),
        })

    halo = rects.select_columns(
        [id_col, "x0", "x1", "y0", "y1"]).map_batches(
        expand, batch_format="pyarrow", zero_copy_batch=True)

    def per_cell(g: pa.Table) -> pa.Table:
        cell = int(g.column("gcell")[0].as_py())
        ids = g.column(id_col).to_numpy(zero_copy_only=False)
        x0 = g.column("__x0").to_numpy()
        x1 = g.column("__x1").to_numpy()
        y0 = g.column("__y0").to_numpy()
        y1 = g.column("__y1").to_numpy()
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        x0, x1, y0, y1 = x0[order], x1[order], y0[order], y1[order]
        m = len(ids)
        out_a, out_b, out_ar = [], [], []
        for s in range(0, m, chunk):
            sl = slice(s, min(s + chunk, m))
            rx0 = np.maximum(x0[sl][:, None], x0[None, :])
            rx1 = np.minimum(x1[sl][:, None], x1[None, :])
            ry0 = np.maximum(y0[sl][:, None], y0[None, :])
            ry1 = np.minimum(y1[sl][:, None], y1[None, :])
            hit = (rx0 <= rx1) & (ry0 <= ry1) \
                & (ids[sl][:, None] < ids[None, :])
            if not hit.any():
                continue
            # reference-point dedup: the pair belongs to the cell
            # holding the intersection's lower-left corner
            rix, riy = cellmod.cell_xy(ry0[hit], rx0[hit], res)
            mine = (riy * n_side + rix) == cell
            ii, jj = np.nonzero(hit)
            ii, jj = ii[mine], jj[mine]
            if len(ii) == 0:
                continue
            out_a.append(ids[sl][ii])
            out_b.append(ids[jj])
            out_ar.append(((rx1 - rx0)[hit][mine]
                           * (ry1 - ry0)[hit][mine]).astype(np.int64))
        if not out_a:
            id_type = g.schema.field(id_col).type
            return pa.table({"id_a": pa.array([], id_type),
                             "id_b": pa.array([], id_type),
                             "area_u2": pa.array([], pa.int64())})
        return pa.table({
            "id_a": pa.array(np.concatenate(out_a)),
            "id_b": pa.array(np.concatenate(out_b)),
            "area_u2": pa.array(np.concatenate(out_ar), pa.int64()),
        })

    return halo.groupby("gcell").map_groups(per_cell,
                                            batch_format="pyarrow")
