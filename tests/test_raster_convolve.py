"""raster_convolve: weighted stencil over the tile raster vs numpy."""
import numpy as np
import pyarrow as pa

from metric_search_ray.pipelines.tiles import raster_convolve
from metric_search_ray import cell as cellmod

GAUSS5 = np.array([[1, 4, 6, 4, 1],
                   [4, 16, 24, 16, 4],
                   [6, 24, 36, 24, 6],
                   [4, 16, 24, 16, 4],
                   [1, 4, 6, 4, 1]], np.int64)
EDGE3 = np.array([[0, -1, 0], [-1, 4, -1], [0, -1, 0]], np.int64)


def _brute(lat, lon, res, stencil):
    m = 1 << res
    t = cellmod.tile_of(np.asarray(lat, np.int64),
                        np.asarray(lon, np.int64), res)
    grid = np.zeros((m, m), np.int64)
    np.add.at(grid, (t // m, t % m), 1)
    ry, rx = stencil.shape[0] // 2, stencil.shape[1] // 2
    rows = []
    for iy, ix in zip(*np.nonzero(grid)):
        acc = 0
        for dy in range(-ry, ry + 1):
            for dx in range(-rx, rx + 1):
                jy, jx = iy + dy, ix + dx
                if 0 <= jy < m and 0 <= jx < m:
                    acc += int(stencil[dy + ry, dx + rx]) * int(grid[jy, jx])
        rows.append((int(iy * m + ix), int(grid[iy, ix]), acc))
    return sorted(rows)


def _run(lat, lon, res, stencil, driver_combine):
    import ray.data as rd
    ds = rd.from_arrow(pa.table({
        "lat_u": pa.array(np.asarray(lat, np.int64)),
        "lon_u": pa.array(np.asarray(lon, np.int64))}))
    out = raster_convolve(ds, res=res, stencil=stencil,
                          driver_combine=driver_combine).to_pandas()
    return sorted(zip(out["tile_id"], out["n"], out["conv_n"]))


def test_gaussian_both_paths_match_brute(ray_session):
    rng = np.random.default_rng(6)
    lat = rng.integers(-80_000_000, 80_000_000, 2000)
    lon = rng.integers(-170_000_000, 170_000_000, 2000)
    exp = _brute(lat, lon, 4, GAUSS5)
    assert _run(lat, lon, 4, GAUSS5, driver_combine=True) == exp
    assert _run(lat, lon, 4, GAUSS5, driver_combine=False) == exp


def test_asymmetric_stencil_paths_agree(ray_session):
    # deliberately non-symmetric kernel: catches a flip mismatch
    # between the dense pad+shift and the distributed scatter
    st = np.array([[0, 0, 5], [-1, 2, 0], [0, 7, 0]], np.int64)
    rng = np.random.default_rng(8)
    lat = rng.integers(-50_000_000, 50_000_000, 800)
    lon = rng.integers(-50_000_000, 50_000_000, 800)
    exp = _brute(lat, lon, 3, st)
    assert _run(lat, lon, 3, st, driver_combine=True) == exp
    assert _run(lat, lon, 3, st, driver_combine=False) == exp


def test_edge_kernel_negative_weights(ray_session):
    lat = [0] * 9 + [3_000_000]
    lon = [0] * 9 + [3_000_000]
    exp = _brute(lat, lon, 6, EDGE3)
    got = _run(lat, lon, 6, EDGE3, driver_combine=True)
    assert got == exp
    assert any(v < 0 or v > 0 for _, _, v in got)


def test_zero_center_stencil_keeps_isolated_tiles(ray_session):
    # Zero-center stencil (pure gradient): an isolated occupied tile
    # receives NO contribution.  The distributed path must still emit
    # it with conv_n=0, exactly like the dense driver path.
    st = np.array([[0, 1, 0], [1, 0, 1], [0, 1, 0]], np.int64)
    # one isolated point far from a small cluster
    lat = [0, 0, 0, 40_000_000]
    lon = [0, 1_000_000, 2_000_000, 40_000_000]
    exp = _brute(lat, lon, 6, st)
    dense = _run(lat, lon, 6, st, driver_combine=True)
    dist = _run(lat, lon, 6, st, driver_combine=False)
    assert dense == exp
    assert dist == exp
    # the isolated tile really is in the output with conv_n == 0
    assert any(n == 1 and c == 0 for _, n, c in exp)


def test_bad_stencil_raises():
    import pytest
    with pytest.raises(ValueError):
        raster_convolve(None, 4, np.ones((2, 3), np.int64))
