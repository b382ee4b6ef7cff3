import numpy as np

from metric_search_ray import fixtures, geom


def test_square_pip():
    ring = np.asarray([[0, 0], [10, 0], [10, 10], [0, 10]], float)
    lon = np.asarray([5, 15, -1, 9.99, 5])
    lat = np.asarray([5, 5, 5, 9.99, -5])
    inside = geom.points_in_polygon(lon, lat, ring)
    assert inside.tolist() == [True, False, False, True, False]


def test_concave_star_pip():
    # 4-point star: outer radius 10, inner 3, centered at origin
    ang = np.linspace(0, 2 * np.pi, 8, endpoint=False)
    rad = np.where(np.arange(8) % 2 == 0, 10.0, 3.0)
    ring = np.stack([rad * np.cos(ang), rad * np.sin(ang)], axis=1)
    # origin inside; a point between spikes (diag at radius 6) outside
    lon = np.asarray([0.0, 6 * np.cos(np.pi / 8 + np.pi / 16)])
    lat = np.asarray([0.0, 6 * np.sin(np.pi / 8 + np.pi / 16)])
    inside = geom.points_in_polygon(lon, lat, ring)
    assert inside[0]
    assert not inside[1]


def test_pip_against_matplotlib_free_oracle():
    """Cross-check ray casting vs winding-angle oracle on random polys."""
    rng = np.random.default_rng(0)
    layer = fixtures.polygon_layer(seed=1)
    lon = rng.uniform(-180, 180, 400)
    lat = rng.uniform(-90, 90, 400)
    for ring in layer["ring"][:20]:
        got = geom.points_in_polygon(lon, lat, ring)
        # winding number oracle
        v = ring[None, :, :] - np.stack([lon, lat], axis=1)[:, None, :]
        v2 = np.roll(v, -1, axis=1)
        ang = np.arctan2(
            v[:, :, 0] * v2[:, :, 1] - v[:, :, 1] * v2[:, :, 0],
            (v * v2).sum(axis=2),
        ).sum(axis=1)
        exp = np.abs(ang) > np.pi  # winding != 0
        # convex & simple polygons: both must agree away from boundaries
        agree = (got == exp).mean()
        assert agree > 0.99


def test_rect_intersects_polygon():
    ring = np.asarray([[0, 0], [10, 0], [10, 10], [0, 10]], float)
    assert geom.rect_intersects_polygon(2, 2, 3, 3, ring)      # rect inside poly
    assert geom.rect_intersects_polygon(-5, -5, 15, 15, ring)  # poly inside rect
    assert geom.rect_intersects_polygon(9, 9, 12, 12, ring)    # overlap
    assert not geom.rect_intersects_polygon(11, 11, 12, 12, ring)
    assert geom.rect_intersects_polygon(10, 5, 12, 6, ring)    # touching edge


def test_point_in_polygons_join():
    layer = fixtures.polygon_layer(seed=42)
    rng = np.random.default_rng(5)
    lon = rng.uniform(-180, 180, 500)
    lat = rng.uniform(-90, 90, 500)
    pi, pj = geom.point_in_polygons(lon, lat, layer["ring"])
    assert len(pi) == len(pj)
    # every reported pair verifies exactly
    for i, j in zip(pi[:50], pj[:50]):
        assert geom.points_in_polygon(lon[i : i + 1], lat[i : i + 1], layer["ring"][j])[0]


def test_clip_ring_rect_cases():
    import numpy as np
    from metric_search_ray import geom

    sq = np.array([[0, 0], [4, 0], [4, 4], [0, 4]], float)
    # fully inside
    got = geom.clip_ring_rect(sq, -1, -1, 5, 5)
    assert geom.ring_area(got) == 16.0
    # fully outside
    assert len(geom.clip_ring_rect(sq, 10, 10, 12, 12)) == 0
    # half overlap
    got = geom.clip_ring_rect(sq, 2, -1, 10, 10)
    assert geom.ring_area(got) == 8.0
    # corner overlap
    got = geom.clip_ring_rect(sq, 3, 3, 10, 10)
    assert geom.ring_area(got) == 1.0
    # triangle clipped to half
    tri = np.array([[0, 0], [4, 0], [0, 4]], float)
    assert geom.ring_area(geom.clip_ring_rect(tri, 0, 0, 2, 4)) == 6.0


def test_clip_area_partition_of_unity():
    """Tile overlap areas partition the polygon exactly."""
    import numpy as np
    from metric_search_ray import geom
    from metric_search_ray.pipelines import tiles

    rng = np.random.default_rng(41)
    for _ in range(6):
        # random convex polygon (hull of random points)
        pts = rng.uniform(-50, 50, (12, 2))
        c = pts.mean(axis=0)
        ang = np.arctan2(pts[:, 1] - c[1], pts[:, 0] - c[0])
        ring = pts[np.argsort(ang)]
        layer = {"polygon_id": ["p"], "ring": [ring]}
        cov = tiles.tile_cover_areas(layer, 5)
        total = sum(cov.column("area_u2").to_pylist())
        want = geom.ring_area(ring * 1e6)
        assert abs(total - want) <= 1e-6 * max(want, 1.0)


def test_tile_cover_areas_consistent_with_boolean_cover():
    import numpy as np
    from metric_search_ray.pipelines import tiles

    ring = np.array([[10.25, -5.75], [22.51, -5.75], [22.51, 8.25],
                     [10.25, 8.25]])
    layer = {"polygon_id": ["r"], "ring": [ring]}
    res = 6
    areas = tiles.tile_cover_areas(layer, res)
    boolean = tiles.tile_polygon_cover(layer, res)
    # edges off tile boundaries: the two covers agree exactly
    a = set(areas.column("tile_id").to_pylist())
    b = set(boolean.column("tile_id").to_pylist())
    assert a == b
    # edge ON a tile boundary (22.5 = -180 + 36/64*360): the boolean
    # cover keeps the zero-width touching tiles, the area cover drops
    # them — the documented semantic difference
    ring2 = np.array([[10.25, -5.75], [22.5, -5.75], [22.5, 8.25],
                      [10.25, 8.25]])
    layer2 = {"polygon_id": ["r"], "ring": [ring2]}
    a2 = set(tiles.tile_cover_areas(layer2, res)
             .column("tile_id").to_pylist())
    b2 = set(tiles.tile_polygon_cover(layer2, res)
             .column("tile_id").to_pylist())
    assert a2 < b2 and all(t not in a2 for t in (b2 - a2))
    # each area bounded by the tile box area
    n = 1 << res
    tile_area = (360e6 / n) * (180e6 / n)
    assert all(0 < v <= tile_area + 1e-6
               for v in areas.column("area_u2").to_pylist())
