"""Geodesic (great-circle) distance operators: haversine kNN + radius.

The planar operators (cell.py / pipelines/knn.py) treat lat/lon as a
flat integer-microdegree plane — exact and fast for tile-local work,
but wrong for "within R kilometres" questions at continental radii.
These operators compute true great-circle distances on the WGS84 mean
sphere (R = 6371.0088 km, the IUGG mean radius).

Scale contract (same as pipelines/knn.py::knn_metric): the query set
is the BROADCAST SMALL SIDE — ``ray.put`` once, read once per task —
and the corpus streams through ``map_batches``; per-partition top-k
keeps the merge input at O(n_queries x k x n_blocks) rows.  For large
query TABLES route through the partitioned index instead.

A vectorized latitude-band prefilter (|dlat| <= r/deg_km, the exact
necessary condition that one coordinate alone cannot exceed the
radius) skips the trig for the vast majority of the corpus on
selective radii.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

EARTH_RADIUS_KM = 6371.0088
_KM_PER_DEG_LAT = np.pi * EARTH_RADIUS_KM / 180.0  # ~111.195


def haversine_km(lat1, lon1, lat2, lon2):
    """Vectorized great-circle distance in km (degrees in, broadcasts).

    Operation order mirrors the engine's SQL oracle expression exactly
    so both sides round identically at the 1e-3 km grid."""
    la1 = np.radians(np.asarray(lat1, np.float64))
    la2 = np.radians(np.asarray(lat2, np.float64))
    dla = np.radians((np.asarray(lat2, np.float64)
                      - np.asarray(lat1, np.float64)) / 2.0)
    dlo = np.radians((np.asarray(lon2, np.float64)
                      - np.asarray(lon1, np.float64)) / 2.0)
    a = np.sin(dla) ** 2 + np.cos(la1) * np.cos(la2) * np.sin(dlo) ** 2
    return 2.0 * EARTH_RADIUS_KM * np.arcsin(np.sqrt(np.minimum(a, 1.0)))


def round_km(d, grid: int = 1000):
    """floor(d*grid + 0.5)/grid — identical expression on the SQL side
    (numpy round() is half-even, DuckDB round() is half-away; this
    avoids the disagreement)."""
    return np.floor(np.asarray(d, np.float64) * grid + 0.5) / grid


class _HavTopK:
    """Partition-local haversine top-k against a broadcast query set."""

    def __init__(self, queries_ref, k: int, id_col: str,
                 lat_col: str, lon_col: str, carry_cols=()):
        self.queries_ref = queries_ref
        self.k = k
        self.id_col = id_col
        self.lat_col = lat_col
        self.lon_col = lon_col
        self.carry_cols = tuple(carry_cols)
        self._q = None

    def _queries(self):
        if self._q is None:
            self._q = ray.get(self.queries_ref)
        return self._q

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids, qlat, qlon = self._queries()
        ids = batch.column(self.id_col).to_numpy(zero_copy_only=False)
        lat = batch.column(self.lat_col).to_numpy(zero_copy_only=False)
        lon = batch.column(self.lon_col).to_numpy(zero_copy_only=False)
        if len(ids) == 0:
            empty = {"query_id": pa.array([], pa.string()),
                     self.id_col: pa.array([], batch.schema
                                           .field(self.id_col).type),
                     "dist_km": pa.array([], pa.float64())}
            for c in self.carry_cols:
                empty[c] = pa.array([], batch.schema.field(c).type)
            return pa.table(empty)
        # (n_q, n_pts) distance matrix — queries are few by contract
        dmat = haversine_km(qlat[:, None], qlon[:, None],
                            lat[None, :], lon[None, :])
        k = min(self.k, dmat.shape[1])
        kth = np.partition(dmat, k - 1, axis=1)[:, k - 1]
        out_q, out_i, out_d, out_c = [], [], [], []
        for qi in range(dmat.shape[0]):
            # keep all candidates <= local kth so the global (dist, id)
            # tie-break stays exact
            cols = np.flatnonzero(dmat[qi] <= kth[qi])
            out_q.extend([qids[qi]] * len(cols))
            out_i.extend(ids[cols])
            out_d.extend(dmat[qi, cols])
            out_c.append(cols)
        out = {
            "query_id": pa.array(out_q, pa.string()),
            self.id_col: pa.array(out_i),
            "dist_km": pa.array(np.asarray(out_d, np.float64), pa.float64()),
        }
        if self.carry_cols:
            take = np.concatenate(out_c)
            for c in self.carry_cols:
                out[c] = batch.column(c).take(pa.array(take))
        return pa.table(out)


def haversine_knn(points_ds, query_ids, query_lat, query_lon, k: int,
                  id_col: str = "image_id", lat_col: str = "lat",
                  lon_col: str = "lon", batch_size: int = 8192,
                  carry_cols=()):
    """Exact great-circle kNN: (query_id, id, rank, dist_km) Dataset.

    Ties on distance break by id ascending (deterministic).
    ``carry_cols`` pass point attributes through the scan so downstream
    consumers (e.g. idw_interpolate) need no join back to the corpus."""
    carry_cols = tuple(carry_cols)
    ref = ray.put((list(query_ids),
                   np.asarray(query_lat, np.float64),
                   np.asarray(query_lon, np.float64)))
    local = points_ds.map_batches(
        _HavTopK(ref, k, id_col, lat_col, lon_col, carry_cols),
        batch_format="pyarrow", batch_size=batch_size)

    def merge(g: pa.Table) -> pa.Table:
        d = g.column("dist_km").to_numpy()
        ids = g.column(id_col).to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, d))[:k]
        out = {
            "query_id": pa.array([g.column("query_id")[0].as_py()]
                                 * len(order), pa.string()),
            id_col: pa.array(ids[order]),
            "rank": pa.array(np.arange(1, len(order) + 1), pa.int64()),
            "dist_km": pa.array(d[order], pa.float64()),
        }
        take = pa.array(order)
        for c in carry_cols:
            out[c] = g.column(c).take(take)
        return pa.table(out)

    return local.groupby("query_id").map_groups(merge, batch_format="pyarrow")


def idw_interpolate(points_ds, query_ids, query_lat, query_lon, k: int,
                    value_col: str, id_col: str = "image_id",
                    lat_col: str = "lat", lon_col: str = "lon",
                    w_scale: int = 1_000_000_000,
                    batch_size: int = 8192):
    """Inverse-distance-weighted interpolation at query points from the
    k great-circle-nearest corpus points (classic IDW / Shepard's
    method over an integer-valued field, e.g. a sensor reading per
    geotagged image).

    The weight of neighbor i is the FIXED-POINT integer
    ``floor(w_scale / (d_km_i^2 + 1.0))`` — integerizing per row makes
    the per-query aggregate an exact int64 sum, so the result is
    independent of summation order (float IDW would not hash-stably
    reproduce across partitionings).  The interpolated estimate is
    returned in milli-units as ``est_mu = (wvsum * 1000) // wsum``.

    Scale contract: identical to haversine_knn — the query set is the
    broadcast small side, the corpus streams; the value column rides
    through the top-k scan (carry_cols), so no join back to the corpus
    and no extra shuffle beyond the k-row-per-query merge.

    Returns a Dataset of (query_id, n_neighbors, wsum, wvsum, est_mu).
    """
    knn = haversine_knn(points_ds, query_ids, query_lat, query_lon, k,
                        id_col=id_col, lat_col=lat_col, lon_col=lon_col,
                        batch_size=batch_size, carry_cols=(value_col,))

    def agg(g: pa.Table) -> pa.Table:
        d = g.column("dist_km").to_numpy()
        v = g.column(value_col).to_numpy(zero_copy_only=False).astype(np.int64)
        # op order mirrors the SQL oracle term for term:
        # floor(w_scale / (dkm * dkm + 1.0))
        w = np.floor(float(w_scale) / (d * d + 1.0)).astype(np.int64)
        wsum = int(w.sum())
        wvsum = int((w * v).sum())
        return pa.table({
            "query_id": pa.array([g.column("query_id")[0].as_py()],
                                 pa.string()),
            "n_neighbors": pa.array([len(d)], pa.int64()),
            "wsum": pa.array([wsum], pa.int64()),
            "wvsum": pa.array([wvsum], pa.int64()),
            "est_mu": pa.array([(wvsum * 1000) // wsum], pa.int64()),
        })

    return knn.groupby("query_id").map_groups(agg, batch_format="pyarrow")


class _HavRadius:
    """Per-batch radius scan with a latitude-band prefilter."""

    def __init__(self, queries_ref, radius_km: float, id_col: str,
                 lat_col: str, lon_col: str):
        self.queries_ref = queries_ref
        self.radius_km = float(radius_km)
        self.id_col = id_col
        self.lat_col = lat_col
        self.lon_col = lon_col
        self._q = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self._q is None:
            self._q = ray.get(self.queries_ref)
        qids, qlat, qlon = self._q
        ids = batch.column(self.id_col).to_numpy(zero_copy_only=False)
        lat = batch.column(self.lat_col).to_numpy(zero_copy_only=False)
        lon = batch.column(self.lon_col).to_numpy(zero_copy_only=False)
        out_q, out_i, out_d = [], [], []
        # |dlat| alone bounds great-circle distance from below:
        # d >= |dlat| * km_per_deg, so points outside the band can
        # never be within radius.  The band mask is one vector compare.
        band = self.radius_km / _KM_PER_DEG_LAT
        for qi in range(len(qids)):
            near = np.flatnonzero(np.abs(lat - qlat[qi]) <= band)
            if len(near) == 0:
                continue
            d = haversine_km(qlat[qi], qlon[qi], lat[near], lon[near])
            hit = d < self.radius_km
            sel = near[hit]
            out_q.extend([qids[qi]] * len(sel))
            out_i.extend(ids[sel])
            out_d.extend(d[hit])
        return pa.table({
            "query_id": pa.array(out_q, pa.string()),
            self.id_col: pa.array(
                out_i, batch.schema.field(self.id_col).type),
            "dist_km": pa.array(np.asarray(out_d, np.float64), pa.float64()),
        })


def haversine_radius_join(points_ds, query_ids, query_lat, query_lon,
                          radius_km: float, id_col: str = "image_id",
                          lat_col: str = "lat", lon_col: str = "lon",
                          batch_size: int = 8192):
    """All (query, point) pairs with great-circle distance < radius_km
    (strict, matching radius_join's contract).  Output streams — no
    driver materialization; row count is data-bound."""
    ref = ray.put((list(query_ids),
                   np.asarray(query_lat, np.float64),
                   np.asarray(query_lon, np.float64)))
    return points_ds.map_batches(
        _HavRadius(ref, radius_km, id_col, lat_col, lon_col),
        batch_format="pyarrow", batch_size=batch_size)
