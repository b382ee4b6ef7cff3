"""grid_density_clusters: DBSCAN over the tile raster vs a union-find
oracle."""
import numpy as np
import pyarrow as pa

from metric_search_ray.pipelines.cluster import grid_density_clusters
from metric_search_ray import cell as cellmod


def _brute(lat, lon, res, min_pts):
    n_side = 1 << res
    tiles = cellmod.tile_of(np.asarray(lat, np.int64),
                            np.asarray(lon, np.int64), res)
    from collections import Counter
    cnt = Counter(int(t) for t in tiles)
    core = {t for t, n in cnt.items() if n >= min_pts}
    parent = {t: t for t in core}

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    for t in core:
        ix, iy = t % n_side, t // n_side
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                jx, jy = ix + dx, iy + dy
                if 0 <= jx < n_side and 0 <= jy < n_side:
                    u = jy * n_side + jx
                    if u in core:
                        ra, rb = find(t), find(u)
                        if ra != rb:
                            parent[max(ra, rb)] = min(ra, rb)
    out = {}
    for t in core:
        r = find(t)
        out.setdefault(r, []).append(t)
    rows = []
    for comp in out.values():
        cid = min(comp)
        for t in comp:
            rows.append((t, cid, cnt[t]))
    return sorted(rows)


def _run(lat, lon, res, min_pts):
    import ray.data as rd
    ds = rd.from_arrow(pa.table({
        "lat_u": pa.array(np.asarray(lat, np.int64)),
        "lon_u": pa.array(np.asarray(lon, np.int64))}))
    out = grid_density_clusters(ds, res=res, min_pts=min_pts,
                                num_partitions=2).to_pandas()
    if len(out) == 0:
        return []
    return sorted(zip(out["tile_id"], out["cluster_id"], out["n_points"]))


def test_two_blobs_and_noise(ray_session):
    rng = np.random.default_rng(2)
    blob1 = (rng.integers(0, 8_000_000, (300, 2)))
    blob2 = (rng.integers(60_000_000, 75_000_000, (300, 2)))
    noise = np.stack([rng.integers(-170_000_000, 170_000_000, 80),
                      rng.integers(-85_000_000, 85_000_000, 80)], axis=1)
    pts = np.concatenate([blob1, blob2, noise])
    lat, lon = pts[:, 1], pts[:, 0]
    got = _run(lat, lon, res=5, min_pts=3)
    exp = _brute(lat, lon, res=5, min_pts=3)
    assert got == exp
    assert len({c for _, c, _ in got}) >= 2  # the blobs stay separate


def test_isolated_core_cell_is_singleton_cluster(ray_session):
    # min_pts points in ONE cell, nothing adjacent
    lat = [5_000_000] * 4
    lon = [5_000_000] * 4
    got = _run(lat, lon, res=6, min_pts=4)
    assert len(got) == 1
    t, c, n = got[0]
    assert t == c and n == 4  # own tile id = cluster id


def test_all_noise_empty(ray_session):
    rng = np.random.default_rng(4)
    lat = rng.integers(-80_000_000, 80_000_000, 50)
    lon = rng.integers(-170_000_000, 170_000_000, 50)
    assert _run(lat, lon, res=8, min_pts=5) == []


def test_matches_brute_random(ray_session):
    rng = np.random.default_rng(11)
    lat = rng.integers(-20_000_000, 20_000_000, 1500)
    lon = rng.integers(-20_000_000, 20_000_000, 1500)
    assert _run(lat, lon, res=6, min_pts=2) == _brute(lat, lon, 6, 2)
