import numpy as np
import pytest

from metric_search_ray import cell


def test_morton_roundtrip():
    rng = np.random.default_rng(0)
    ix = rng.integers(0, 1 << 28, 1000)
    iy = rng.integers(0, 1 << 28, 1000)
    m = cell.morton_encode(ix, iy)
    rx, ry = cell.morton_decode(m)
    assert np.array_equal(rx, ix)
    assert np.array_equal(ry, iy)


def test_cell_id_roundtrip_and_res():
    rng = np.random.default_rng(1)
    lat_u = rng.integers(-90_000_000, 90_000_001, 500)
    lon_u = rng.integers(-180_000_000, 180_000_000, 500)
    for res in (0, 1, 6, 12, 28):
        c = cell.cell_of(lat_u, lon_u, res)
        assert np.all(cell.cell_res(c) == res)
        ix, iy, r = cell.cell_to_xy(c)
        assert np.all(r == res)
        n = 1 << res
        assert np.all((ix >= 0) & (ix < n))
        assert np.all((iy >= 0) & (iy < n))


def test_point_within_own_cell_bounds():
    rng = np.random.default_rng(2)
    lat_u = rng.integers(-90_000_000, 90_000_001, 300)
    lon_u = rng.integers(-180_000_000, 180_000_000, 300)
    c = cell.cell_of(lat_u, lon_u, 9)
    lon0, lat0, lon1, lat1 = cell.cell_bounds_u(c)
    assert np.all(lon_u >= lon0) and np.all(lon_u < lon1)
    assert np.all(lat_u >= lat0) and np.all(lat_u < lat1)


def test_parent_child_consistency():
    lat_u = np.asarray([40_700_000])
    lon_u = np.asarray([-74_000_000])
    c10 = cell.cell_of(lat_u, lon_u, 10)
    c8 = cell.cell_of(lat_u, lon_u, 8)
    assert cell.parent(c10, 8)[0] == c8[0]
    kids = cell.children(int(c8[0]))
    c9 = cell.cell_of(lat_u, lon_u, 9)
    assert int(c9[0]) in set(int(k) for k in kids)


def test_ring_sizes_and_wrap():
    c = int(cell.cell_of(np.asarray([0]), np.asarray([0]), 6)[0])
    assert len(cell.ring(c, 0)) == 1
    assert len(cell.ring(c, 1)) == 8
    assert len(cell.ring(c, 2)) == 16
    # near the pole rows clamp: fewer cells
    cp = int(cell.cell_of(np.asarray([89_900_000]), np.asarray([0]), 6)[0])
    assert 0 < len(cell.ring(cp, 1)) < 8 + 1
    # antimeridian wrap: ring of a cell at lon ~ -180 still has 8 members
    cw = int(cell.cell_of(np.asarray([0]), np.asarray([-179_999_999]), 6)[0])
    assert len(cell.ring(cw, 1)) == 8


def test_point_cell_min_dist():
    c = cell.cell_of(np.asarray([0]), np.asarray([0]), 4)
    # the point is inside its own cell -> distance 0
    assert cell.point_cell_min_dist_deg(0.0, 0.0, c)[0] == 0.0
    # a faraway cell has positive lower bound <= true point distance
    c2 = cell.cell_of(np.asarray([50_000_000]), np.asarray([50_000_000]), 4)
    lb = cell.point_cell_min_dist_deg(0.0, 0.0, c2)[0]
    true_d = np.hypot(50.0, 50.0)
    assert 0 < lb <= true_d


def test_tile_id_row_major():
    lat_u = np.asarray([0])
    lon_u = np.asarray([0])
    r = 3
    ix, iy = cell.cell_xy(lat_u, lon_u, r)
    t = cell.tile_of(lat_u, lon_u, r)
    assert t[0] == iy[0] * 8 + ix[0]


def test_res_out_of_range():
    with pytest.raises(ValueError):
        cell.cell_xy(np.asarray([0]), np.asarray([0]), 29)


def test_compact_uncompact_roundtrip():
    import numpy as np
    from metric_search_ray import cell

    rng = np.random.default_rng(31)
    for trial in range(8):
        res = int(rng.integers(2, 7))
        n = 1 << res
        # random region: union of a few rectangles of res-cells
        ids = set()
        for _ in range(int(rng.integers(1, 4))):
            x0, y0 = rng.integers(0, n, 2)
            w, h = rng.integers(1, max(2, n // 2), 2)
            for x in range(int(x0), min(n, int(x0 + w))):
                for y in range(int(y0), min(n, int(y0 + h))):
                    ids.add((x, y))
        xs = np.asarray([x for x, _ in ids], np.int64)
        ys = np.asarray([y for _, y in ids], np.int64)
        cells = cell.cell_id_from_xy(xs, ys, res)
        comp = cell.compact_cells(cells)
        # compaction never grows the set and covers the same area
        assert len(comp) <= len(cells)
        back = cell.uncompact_cells(comp, res)
        np.testing.assert_array_equal(back, np.sort(cells))
        # idempotent, and no complete sibling quad remains
        np.testing.assert_array_equal(cell.compact_cells(comp), comp)
        _, _, r = cell.cell_to_xy(comp)
        for lev in np.unique(r):
            if lev == 0:
                continue
            sub = comp[r == lev]
            par = cell.parent(sub, int(lev) - 1)
            _, cnt = np.unique(par, return_counts=True)
            assert cnt.max() < 4


def test_compact_full_plane_collapses_to_root():
    import numpy as np
    from metric_search_ray import cell

    res = 3
    n = 1 << res
    xs, ys = np.meshgrid(np.arange(n), np.arange(n))
    cells = cell.cell_id_from_xy(xs.ravel(), ys.ravel(), res)
    comp = cell.compact_cells(cells)
    assert len(comp) == 1
    _, _, r = cell.cell_to_xy(comp)
    assert r[0] == 0
    np.testing.assert_array_equal(cell.uncompact_cells(comp, res),
                                  np.sort(cells))


def test_uncompact_rejects_finer_input():
    import numpy as np
    import pytest
    from metric_search_ray import cell

    c = cell.cell_id_from_xy(np.array([3]), np.array([5]), 4)
    with pytest.raises(ValueError, match="finer"):
        cell.uncompact_cells(c, 2)
    assert len(cell.compact_cells(np.empty(0, np.int64))) == 0
