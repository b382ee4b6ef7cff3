"""Geodesic operators: haversine metric, kNN, radius join, zonal stats."""

import numpy as np
import pyarrow as pa
import pytest

from metric_search_ray import geodesic
from metric_search_ray.pipelines import tiles

rng = np.random.default_rng(11)


def _random_points(n):
    lat = rng.uniform(-85, 85, n)
    lon = rng.uniform(-180, 180, n)
    ids = np.arange(n, dtype=np.int64)
    return ids, lat, lon


def test_haversine_known_values():
    R = geodesic.EARTH_RADIUS_KM
    # quarter circumference: equator to pole
    assert geodesic.haversine_km(0.0, 0.0, 90.0, 0.0) == pytest.approx(
        np.pi / 2 * R, rel=1e-12)
    # antipodal
    assert geodesic.haversine_km(-90.0, 0.0, 90.0, 0.0) == pytest.approx(
        np.pi * R, rel=1e-12)
    # zero distance
    assert geodesic.haversine_km(51.5, -0.12, 51.5, -0.12) == 0.0
    # symmetric
    a = geodesic.haversine_km(40.7, -74.0, 48.85, 2.35)
    b = geodesic.haversine_km(48.85, 2.35, 40.7, -74.0)
    assert a == pytest.approx(b, rel=0)
    assert 5830 < a < 5860  # NYC-Paris great circle ~5,84x km


def test_haversine_matches_spherical_law_of_cosines():
    _, lat1, lon1 = _random_points(200)
    _, lat2, lon2 = _random_points(200)
    got = geodesic.haversine_km(lat1, lon1, lat2, lon2)
    p1, p2 = np.radians(lat1), np.radians(lat2)
    dl = np.radians(lon2 - lon1)
    cosd = np.clip(np.sin(p1) * np.sin(p2)
                   + np.cos(p1) * np.cos(p2) * np.cos(dl), -1, 1)
    want = geodesic.EARTH_RADIUS_KM * np.arccos(cosd)
    # law of cosines is ill-conditioned near 0 — compare loosely there
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def _brute_knn(qlat, qlon, ids, lat, lon, k):
    d = geodesic.haversine_km(qlat, qlon, lat, lon)
    order = np.lexsort((ids, d))[:k]
    return ids[order], d[order]


def test_haversine_knn_matches_brute_force(ray_session):
    import ray.data as rd
    ids, lat, lon = _random_points(3000)
    ds = rd.from_arrow(pa.table({
        "image_id": pa.array(ids), "lat": pa.array(lat),
        "lon": pa.array(lon)})).repartition(7)
    qids = [f"q{i}" for i in range(5)]
    _, qlat, qlon = _random_points(5)
    out = geodesic.haversine_knn(ds, qids, qlat, qlon, k=8).to_pandas()
    assert len(out) == 40
    for i, q in enumerate(qids):
        g = out[out["query_id"] == q].sort_values("rank")
        want_ids, want_d = _brute_knn(qlat[i], qlon[i], ids, lat, lon, 8)
        np.testing.assert_array_equal(g["image_id"].to_numpy(), want_ids)
        np.testing.assert_allclose(g["dist_km"].to_numpy(), want_d,
                                   rtol=0, atol=0)  # bit-exact: same kernel
        assert list(g["rank"]) == list(range(1, 9))


def test_haversine_radius_matches_brute_force(ray_session):
    import ray.data as rd
    ids, lat, lon = _random_points(3000)
    ds = rd.from_arrow(pa.table({
        "image_id": pa.array(ids), "lat": pa.array(lat),
        "lon": pa.array(lon)})).repartition(5)
    qids = ["a", "b", "c"]
    _, qlat, qlon = _random_points(3)
    R = 1500.0
    out = geodesic.haversine_radius_join(ds, qids, qlat, qlon, R).to_pandas()
    for i, q in enumerate(qids):
        d = geodesic.haversine_km(qlat[i], qlon[i], lat, lon)
        want = set(ids[d < R].tolist())
        got = set(out[out["query_id"] == q]["image_id"].tolist())
        assert got == want
    # strict inequality contract: radius 0 returns nothing even with
    # a query placed exactly on a point
    z = geodesic.haversine_radius_join(ds, ["z"], [lat[0]], [lon[0]], 0.0)
    assert z.count() == 0


def test_round_km_matches_sql_floor_expression():
    # the engine and the DuckDB oracle share floor(d*1000+0.5)/1000
    d = np.array([0.0, 1.0004999, 1.0005001, 123.4567891])
    np.testing.assert_array_equal(geodesic.round_km(d),
                                  np.floor(d * 1000 + 0.5) / 1000)


def test_haversine_knn_carry_cols(ray_session):
    import ray.data as rd
    ids, lat, lon = _random_points(1000)
    val = rng.integers(0, 65536, 1000).astype(np.int64)
    ds = rd.from_arrow(pa.table({
        "image_id": pa.array(ids), "lat": pa.array(lat),
        "lon": pa.array(lon), "val": pa.array(val)})).repartition(4)
    _, qlat, qlon = _random_points(3)
    out = geodesic.haversine_knn(ds, ["a", "b", "c"], qlat, qlon, k=6,
                                 carry_cols=("val",)).to_pandas()
    assert len(out) == 18
    # carried values line up with their ids row-for-row
    vmap = dict(zip(ids.tolist(), val.tolist()))
    assert all(vmap[i] == v for i, v in zip(out["image_id"], out["val"]))


def test_idw_interpolate_matches_brute_force(ray_session):
    import ray.data as rd
    n, k, scale = 2500, 7, 1_000_000_000
    ids, lat, lon = _random_points(n)
    val = rng.integers(0, 65536, n).astype(np.int64)
    ds = rd.from_arrow(pa.table({
        "image_id": pa.array(ids), "lat": pa.array(lat),
        "lon": pa.array(lon), "val": pa.array(val)})).repartition(6)
    qids = [f"q{i}" for i in range(4)]
    _, qlat, qlon = _random_points(4)
    out = (geodesic.idw_interpolate(ds, qids, qlat, qlon, k=k,
                                    value_col="val", w_scale=scale)
           .to_pandas().set_index("query_id"))
    assert len(out) == 4
    for i, q in enumerate(qids):
        nbr_ids, nbr_d = _brute_knn(qlat[i], qlon[i], ids, lat, lon, k)
        w = np.floor(scale / (nbr_d * nbr_d + 1.0)).astype(np.int64)
        v = val[np.searchsorted(ids, nbr_ids)]
        wsum, wvsum = int(w.sum()), int((w * v).sum())
        assert out.loc[q, "n_neighbors"] == k
        assert out.loc[q, "wsum"] == wsum
        assert out.loc[q, "wvsum"] == wvsum
        assert out.loc[q, "est_mu"] == (wvsum * 1000) // wsum
        # the estimate is a convex combination of neighbor values
        assert v.min() * 1000 <= out.loc[q, "est_mu"] <= v.max() * 1000


def test_idw_weights_are_integer_and_order_free(ray_session):
    # two different partitionings must give bit-identical aggregates
    import ray.data as rd
    n = 800
    ids, lat, lon = _random_points(n)
    val = rng.integers(0, 100, n).astype(np.int64)
    t = pa.table({"image_id": pa.array(ids), "lat": pa.array(lat),
                  "lon": pa.array(lon), "val": pa.array(val)})
    _, qlat, qlon = _random_points(2)
    res = []
    for parts in (2, 11):
        ds = rd.from_arrow(t).repartition(parts)
        res.append(geodesic.idw_interpolate(
            ds, ["x", "y"], qlat, qlon, k=9, value_col="val")
            .to_pandas().sort_values("query_id").reset_index(drop=True))
    assert res[0].equals(res[1])


def test_zonal_stats_matches_brute_force(ray_session):
    import ray.data as rd
    from metric_search_ray import cell

    n = 4000
    ids, lat, lon = _random_points(n)
    lat_u = np.rint(lat * 1e6).astype(np.int64)
    lon_u = np.rint(lon * 1e6).astype(np.int64)
    val = rng.integers(0, 1000, n).astype(np.int64)
    ds = rd.from_arrow(pa.table({
        "image_id": pa.array(ids), "lat_u": pa.array(lat_u),
        "lon_u": pa.array(lon_u), "val": pa.array(val)})).repartition(6)
    rings = []
    pids = []
    for i in range(6):
        x0, y0 = rng.uniform(-170, 150), rng.uniform(-80, 60)
        w, h = rng.uniform(5, 40), rng.uniform(5, 30)
        rings.append(np.asarray([[x0, y0], [x0 + w, y0],
                                 [x0 + w, y0 + h], [x0, y0 + h]]))
        pids.append(f"p{i}")
    layer = {"polygon_id": pids, "ring": rings}
    res = 5
    out = (tiles.zonal_stats(ds, layer, res, "val")
           .set_index("polygon_id"))
    assert len(out) == len(pids)  # zero-point polygons still emit
    cover = tiles.tile_polygon_cover(layer, res)
    tile = cell.tile_of(lat_u, lon_u, res)
    for pid in pids:
        tset = set(t for t, p in zip(cover.column("tile_id").to_pylist(),
                                     cover.column("polygon_id").to_pylist())
                   if p == pid)
        mask = np.isin(tile, list(tset))
        assert out.loc[pid, "n_tiles"] == len(tset)
        assert out.loc[pid, "n_points"] == mask.sum()
        assert out.loc[pid, "sum_val"] == val[mask].sum()
