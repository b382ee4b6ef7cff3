"""Sharded HNSW approximate-nearest-neighbor over an embedding column.

Completes the engine's ANN family (brute-force ``knn_cosine``/``knn_l2``,
IVF, PQ/ADC, IVF-PQ, hyperplane LSH — ``pipelines/similarity.py``) with
the graph-based member: Hierarchical Navigable Small World (Malkov &
Yashunin, TPAMI 2018; public algorithm).  Nothing comparable exists in
the reference — its index is the cover tree (``details/tree.cpp``) —
so, like IVF/PQ, this is an engine addition for the large-scale
training-data pipeline axis.

Scale shape (the standard sharded-HNSW deployment): rows are routed to
``n_shards`` disjoint shards by ``vec_id % n_shards``; each shard's
graph is built INDEPENDENTLY in its own task (bounded memory: one
shard's vectors + adjacency), persisted as one parquet file with the
same atomic tmp+rename / manifest / resume discipline as
``build_ivf_index``.  A query probes every shard (scatter-gather —
per-shard top-k rows are the ONLY thing that moves) and merges by
(dist, id).  Search cost is O(n_shards * ef * log(shard_rows)); at
10^12 rows one sizes shards ~1M rows and fronts the scatter with a
coarse router (e.g. the IVF centroids) — the probe-every-shard baseline
here is exact over the graph and keeps recall independent of routing.

Determinism (required by the driver's serial-replay oracle, the same
contract as PQ — see ``_embed_knn_pq_sql`` in ``__ray_entry__.py``):
- level(id) = floor(-ln(u(id)) / ln(M)) with u(id) derived from the
  splitmix64 finalizer of the row id — no RNG state, no seeds;
- insertion strictly in ascending id order within a shard;
- every ordering (candidate heaps, neighbor selection, degree-bound
  shrink, final top-k) breaks ties by ascending id.
Two independent implementations of this spec — the vectorized one here
and the plain heapless replay in ``__ray_entry__._hnsw_replay`` — must
produce identical output; ``tests/test_hnsw.py`` pins that, plus
recall vs brute force.
"""

from __future__ import annotations

import heapq
import os
import time

import numpy as np
import pyarrow as pa

from .sketch import splitmix64

_TWO53 = float(1 << 53)


def hnsw_levels(ids: np.ndarray, m: int) -> np.ndarray:
    """Deterministic per-id layer assignment: the standard geometric
    ladder (mL = 1/ln(M)) driven by a splitmix64 uniform instead of a
    stateful RNG, so any process computes the same level for an id."""
    u = ((splitmix64(np.asarray(ids).astype(np.uint64)) >> np.uint64(11))
         .astype(np.float64) + 0.5) / _TWO53
    return np.floor(-np.log(u) / np.log(float(m))).astype(np.int32)


def _search_layer(qv: np.ndarray, eps: list, ef: int, layer_adj: dict,
                  vecs: np.ndarray, ids: np.ndarray):
    """Best-first beam over one layer -> the ef closest (d2, id, idx),
    ascending.  Classic HNSW SEARCH-LAYER with every comparison on the
    (squared-distance, id) pair; neighbor distances are computed in one
    vectorized numpy call per expansion."""
    eps = list(dict.fromkeys(eps))
    dv = ((vecs[eps] - qv) ** 2).sum(axis=1)
    visited = set(eps)
    cand = [(float(d), int(ids[e]), e) for d, e in zip(dv, eps)]
    heapq.heapify(cand)
    res = [(-d, -i, e) for d, i, e in cand]
    heapq.heapify(res)
    while len(res) > ef:
        heapq.heappop(res)
    while cand:
        d, di, c = heapq.heappop(cand)
        fd, fdi = -res[0][0], -res[0][1]
        if len(res) >= ef and (d, di) > (fd, fdi):
            break
        nbrs = [e for e in layer_adj[c] if e not in visited]
        if not nbrs:
            continue
        visited.update(nbrs)
        dn = ((vecs[nbrs] - qv) ** 2).sum(axis=1)
        for dd, e in zip(dn, nbrs):
            dd = float(dd)
            ei = int(ids[e])
            fd, fdi = -res[0][0], -res[0][1]
            if len(res) < ef or (dd, ei) < (fd, fdi):
                heapq.heappush(cand, (dd, ei, e))
                heapq.heappush(res, (-dd, -ei, e))
                if len(res) > ef:
                    heapq.heappop(res)
    return sorted((-d, -i, e) for d, i, e in res)


def build_shard_graph(ids: np.ndarray, vecs: np.ndarray, m: int = 8,
                      ef_construction: int = 64):
    """Build one shard's HNSW graph.  ``ids`` must be ascending (the
    insertion order IS the id order — determinism contract).  Returns
    (adj, levels, entry_idx): ``adj`` is a list over layers of dicts
    {node_idx: [neighbor_idx, ...]}.

    Neighbor policy (spec, shared with the replay): selected neighbors
    = the M closest of the ef_construction beam; degree bound M above
    layer 0 and 2M at layer 0, shrink-by-distance on overflow; entry
    points for the next layer down = the selected neighbors."""
    n = len(ids)
    levels = hnsw_levels(ids, m)
    adj: list[dict] = []
    entry = -1
    max_level = -1
    for i in range(n):
        li = int(levels[i])
        while len(adj) <= li:
            adj.append({})
        if entry < 0:
            for layer in range(li + 1):
                adj[layer][i] = []
            entry, max_level = i, li
            continue
        qv = vecs[i]
        ep = [entry]
        for layer in range(max_level, li, -1):
            w = _search_layer(qv, ep, 1, adj[layer], vecs, ids)
            ep = [w[0][2]]
        for layer in range(min(li, max_level), -1, -1):
            w = _search_layer(qv, ep, ef_construction, adj[layer],
                              vecs, ids)
            sel = [e for _, _, e in w[:m]]
            adj[layer][i] = list(sel)
            mmax = m if layer > 0 else 2 * m
            for e in sel:
                lst = adj[layer][e]
                lst.append(i)
                if len(lst) > mmax:
                    dd = ((vecs[lst] - vecs[e]) ** 2).sum(axis=1)
                    order = np.lexsort((ids[np.asarray(lst)], dd))[:mmax]
                    adj[layer][e] = [lst[j] for j in order]
            ep = sel
        for layer in range(max_level + 1, li + 1):
            adj[layer][i] = []
        if li > max_level:
            entry, max_level = i, li
    return adj, levels, entry


def search_shard_graph(qv: np.ndarray, k: int, ef: int, adj: list,
                       vecs: np.ndarray, ids: np.ndarray, entry: int):
    """Top-k of one shard's graph for one query -> [(d2, id)] ascending
    (greedy descent above layer 0, ef-beam at layer 0)."""
    if entry < 0:
        return []
    ep = [entry]
    for layer in range(len(adj) - 1, 0, -1):
        w = _search_layer(qv, ep, 1, adj[layer], vecs, ids)
        ep = [w[0][2]]
    w = _search_layer(qv, ep, max(ef, k), adj[0], vecs, ids)
    return [(d, i) for d, i, _ in w[:k]]


# ------------------------------------------------------------ persistence

_NBRS_TYPE = pa.list_(pa.list_(pa.int64()))


def _shard_to_table(ids, vecs, adj, levels) -> pa.Table:
    """One shard -> one parquet-able table.  Neighbors serialize as
    list<list<int64>> of neighbor IDS per layer (ids are stable across
    load; node indices are not guaranteed to be)."""
    nbrs = [[[int(ids[e]) for e in adj[layer].get(i, [])]
             for layer in range(int(levels[i]) + 1)]
            for i in range(len(ids))]
    return pa.table({
        "vec_id": pa.array(ids.astype(np.int64), pa.int64()),
        "level": pa.array(levels.astype(np.int32), pa.int32()),
        "embedding": pa.array([v.tolist() for v in vecs],
                              pa.list_(pa.float64())),
        "nbrs": pa.array(nbrs, _NBRS_TYPE),
    })


def _table_to_shard(tbl: pa.Table):
    """Inverse of ``_shard_to_table`` -> (ids, vecs, adj, entry)."""
    ids = tbl.column("vec_id").to_numpy()
    levels = tbl.column("level").to_numpy()
    vecs = np.stack(tbl.column("embedding").to_numpy(zero_copy_only=False))
    nbrs = tbl.column("nbrs").to_pylist()
    n_layers = int(levels.max()) + 1 if len(levels) else 0
    adj: list[dict] = [{} for _ in range(n_layers)]
    for i, per_layer in enumerate(nbrs):
        for layer, lst in enumerate(per_layer):
            pos = np.searchsorted(ids, lst)
            adj[layer][i] = [int(p) for p in pos]
    # the entry point is NOT derivable from the table alone — the
    # builder records its entry id in the manifest, and
    # ``_load_shard_cached`` resolves it to an index; this function
    # always returns -1 for it
    return ids, vecs, adj, -1


def build_hnsw_index(ds, ckpt_dir: str, n_shards: int = 4, m: int = 8,
                     ef_construction: int = 64, vec_col: str = "embedding",
                     id_col: str = "vec_id", resume: bool = True,
                     centroids=None) -> pa.Table:
    """Partition-parallel HNSW build: route by ``id % n_shards``, build
    each shard's graph in its own task (``map_groups``), persist one
    file per shard + a manifest (atomic, resumable — same discipline as
    ``build_ivf_index``).

    ``centroids`` (optional, (C, dim)): shard by nearest centroid
    instead of ``id % n_shards`` — the IVF-routed layout, where a query
    needs to probe only its ``nprobe`` nearest shards' graphs
    (``knn_hnsw(..., nprobe=...)``) instead of all of them.  This is
    the 10^12-row scale path the module docstring describes: recall
    then depends on the router (tested), while the id-mod layout keeps
    recall routing-independent.  The centroids persist beside the
    manifest so the query side routes identically."""
    import pyarrow.parquet as pq

    os.makedirs(ckpt_dir, exist_ok=True)
    if centroids is not None:
        cent = np.ascontiguousarray(np.asarray(centroids, np.float64))
        cpath = os.path.join(ckpt_dir, "centroids.npy")
        if not (resume and os.path.exists(cpath)):
            tmp = os.path.join(ckpt_dir, f"centroids.tmp.{os.getpid()}.npy")
            np.save(tmp, cent)
            os.replace(tmp, cpath)

        def add_shard(batch: pa.Table) -> pa.Table:
            x = np.stack(batch.column(vec_col).to_numpy(
                zero_copy_only=False)).astype(np.float64)
            # argmin is first-match on ties -> lowest centroid id,
            # deterministic
            d2 = ((x[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            sid = np.argmin(d2, axis=1).astype(np.int64)
            return batch.append_column("shard", pa.array(sid, pa.int64()))
    else:
        def add_shard(batch: pa.Table) -> pa.Table:
            sid = batch.column(id_col).to_numpy() % n_shards
            return batch.append_column("shard", pa.array(sid, pa.int64()))

    def build_one(g: pa.Table) -> pa.Table:
        sid = int(g.column("shard")[0].as_py())
        path = os.path.join(ckpt_dir, f"shard-{sid:05d}.parquet")
        if resume and os.path.exists(path):
            meta = pq.read_table(path, columns=["vec_id", "level"])
            lv = meta.column("level").to_numpy()
            ii = meta.column("vec_id").to_numpy()
            # ascending-id insertion means the entry is the FIRST node
            # to attain the max level = lowest id among max-level nodes
            ent = int(ii[lv == lv.max()].min()) if len(ii) else -1
            return pa.table({"shard": [sid], "n_rows": [meta.num_rows],
                             "max_level": [int(lv.max()) if len(lv) else -1],
                             "entry_id": [ent], "path": [path],
                             "build_s": [0.0], "resumed": [True]})
        t0 = time.perf_counter()
        order = np.argsort(g.column(id_col).to_numpy(), kind="stable")
        g = g.take(pa.array(order, pa.int64()))
        ids = g.column(id_col).to_numpy().astype(np.int64)
        vecs = np.stack(g.column(vec_col).to_numpy(zero_copy_only=False)
                        ).astype(np.float64)
        adj, levels, entry = build_shard_graph(ids, vecs, m, ef_construction)
        tmp = path + f".tmp.{os.getpid()}"
        pq.write_table(_shard_to_table(ids, vecs, adj, levels), tmp)
        os.replace(tmp, path)
        return pa.table({"shard": [sid], "n_rows": [len(ids)],
                         "max_level": [int(levels.max()) if len(ids) else -1],
                         "entry_id": [int(ids[entry]) if entry >= 0 else -1],
                         "path": [path],
                         "build_s": [time.perf_counter() - t0],
                         "resumed": [False]})

    manifest_ds = (ds.select_columns([id_col, vec_col])
                     .map_batches(add_shard, batch_format="pyarrow")
                     .groupby("shard")
                     .map_groups(build_one, batch_format="pyarrow"))
    manifest = pa.Table.from_pandas(manifest_ds.to_pandas(),
                                    preserve_index=False)
    tmp = os.path.join(ckpt_dir, f"manifest.tmp.{os.getpid()}")
    pq.write_table(manifest, tmp)
    os.replace(tmp, os.path.join(ckpt_dir, "manifest.parquet"))
    return manifest


import collections as _collections

_SHARD_CACHE: "_collections.OrderedDict" = _collections.OrderedDict()
_SHARD_CACHE_CAP = 64


def _load_shard_cached(path: str, entry_id: int):
    """Per-process shard LRU (mtime-keyed, same multi-entry shape as
    the knn checkpoint caches — a worker serving several shards'
    probe tasks must not reload a shard's parquet per task):
    parquet -> (ids, vecs, adj, entry_idx)."""
    import pyarrow.parquet as pq

    st = os.stat(path)
    key = (path, st.st_mtime_ns)
    hit = _SHARD_CACHE.get(key)
    if hit is None:
        ids, vecs, adj, _ = _table_to_shard(pq.read_table(path))
        entry = int(np.searchsorted(ids, entry_id)) if len(ids) else -1
        hit = (ids, vecs, adj, entry)
        _SHARD_CACHE[key] = hit
        while len(_SHARD_CACHE) > _SHARD_CACHE_CAP:
            _SHARD_CACHE.popitem(last=False)
    else:
        _SHARD_CACHE.move_to_end(key)
    return hit


def knn_hnsw(ckpt_dir: str, query_ids, query_vecs, k: int = 10,
             ef_search: int = 64, nprobe: int | None = None):
    """Approximate L2 top-k over a persisted sharded HNSW index:
    queries broadcast once (``ray.put``), one task per shard searches
    its graph for the queries routed to it, and only (n_queries x k)
    candidate rows per shard return for the final (dist, id) merge —
    the scatter-gather shape of ``knn.knn_metric``.

    ``nprobe`` (requires a centroid-routed index): each query probes
    only its nprobe nearest shards — search cost drops from all-shards
    to nprobe graphs at the router's recall risk; ``nprobe=None``
    probes every shard (exact over the graphs, layout-independent
    recall).  -> pandas (query_id, vec_id, rank, dist) with dist =
    true L2, ascending (ties by id)."""
    import pandas as pd
    import pyarrow.parquet as pq
    import ray

    manifest = pq.read_table(os.path.join(ckpt_dir, "manifest.parquet"))
    q = np.asarray(query_vecs, np.float64)
    qref = ray.put(q)
    shards = manifest.column("shard").to_pylist()
    sub_of: dict = {}                  # shard -> query-row subset, or None
    if nprobe is not None:
        cpath = os.path.join(ckpt_dir, "centroids.npy")
        if not os.path.exists(cpath):
            raise ValueError("nprobe routing needs a centroid-routed "
                             "index (build_hnsw_index(..., centroids=))")
        cent = np.load(cpath)
        d2 = ((q[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        # stable argsort: probe ties resolve to the lowest shard id
        probes = np.argsort(d2, axis=1, kind="stable")[:, :nprobe]
        for s in shards:
            qs_idx = np.flatnonzero((probes == int(s)).any(axis=1))
            sub_of[int(s)] = qs_idx

    @ray.remote
    def probe(path: str, entry_id: int, qref, k: int, ef: int, qsel):
        qs = ray.get(qref) if isinstance(qref, ray.ObjectRef) else qref
        if qsel is not None:
            qs = qs[qsel]
        ids, vecs, adj, entry = _load_shard_cached(path, entry_id)
        out_d = np.full((len(qs), k), np.inf)
        out_i = np.full((len(qs), k), -1, np.int64)
        for qi in range(len(qs)):
            hits = search_shard_graph(qs[qi], k, ef, adj, vecs, ids, entry)
            for r, (d2, vid) in enumerate(hits):
                out_d[qi, r] = d2
                out_i[qi, r] = vid
        return out_d, out_i

    futs, fut_sel = [], []
    for p, e, s in zip(manifest.column("path").to_pylist(),
                       manifest.column("entry_id").to_pylist(), shards):
        qsel = sub_of.get(int(s)) if nprobe is not None else None
        if qsel is not None and len(qsel) == 0:
            continue
        futs.append(probe.remote(p, int(e), qref, k, ef_search, qsel))
        fut_sel.append(qsel)
    qids = list(query_ids)
    if not futs:
        return pd.DataFrame({"query_id": pd.Series(qids[:0]),
                             "vec_id": pd.Series([], dtype=np.int64),
                             "rank": pd.Series([], dtype=np.int64),
                             "dist": pd.Series([], dtype=np.float64)})
    parts = ray.get(futs)
    nq = len(q)
    if nprobe is None:
        all_d = np.concatenate([d for d, _ in parts], axis=1)
        all_i = np.concatenate([i for _, i in parts], axis=1)
    else:
        # scatter each shard's subset rows back to full query rows
        blocks_d, blocks_i = [], []
        for (d, i), qsel in zip(parts, fut_sel):
            fd = np.full((nq, d.shape[1]), np.inf)
            fi = np.full((nq, i.shape[1]), -1, np.int64)
            fd[qsel] = d
            fi[qsel] = i
            blocks_d.append(fd)
            blocks_i.append(fi)
        all_d = np.concatenate(blocks_d, axis=1)
        all_i = np.concatenate(blocks_i, axis=1)
    rows = []
    for qi in range(len(qids)):
        order = np.lexsort((all_i[qi], all_d[qi]))
        kept = 0
        for j in order:
            if all_i[qi, j] < 0:
                continue
            rows.append((qids[qi], int(all_i[qi, j]), kept + 1,
                         float(np.sqrt(all_d[qi, j]))))
            kept += 1
            if kept >= k:
                break
    return pd.DataFrame(rows, columns=["query_id", "vec_id", "rank", "dist"])
