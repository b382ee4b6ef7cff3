"""End-to-end Ray Data pipeline tests with brute-force oracles (sf-tiny)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import ray.data as rd

from metric_search_ray import cell, fixtures, geocode, geom
from metric_search_ray.pipelines import build, joins, knn, tiles
from metric_search_ray.stages import assign, decode


@pytest.fixture(scope="module")
def geo_points(tiny_images):
    """(image_id, lat, lon, phash) numpy oracle table for the fixture set."""
    tbl = pq.read_table(tiny_images, columns=["image_id", "phash"])
    ids = tbl.column("image_id").to_numpy(zero_copy_only=False)
    lat_u, lon_u = geocode.geocode_image_ids(ids)
    return {
        "image_id": ids,
        "lat": lat_u / 1e6,
        "lon": lon_u / 1e6,
        "phash": tbl.column("phash").to_numpy(),
    }


@pytest.fixture(scope="module")
def index_dir(ray_session, tiny_images, tmp_path_factory):
    ckpt = str(tmp_path_factory.mktemp("ckpt"))
    ds = rd.read_parquet(tiny_images, columns=["image_id", "phash"])
    manifest = build.build_index(ds, ckpt, res=4, target_rows=100)
    return ckpt, manifest


def test_decode_validate_all_rows_valid(ray_session, tiny_images):
    ds = rd.read_parquet(tiny_images)
    out = ds.map_batches(decode.DecodeValidate, batch_format="pyarrow",
                         batch_size=256, concurrency=2).to_pandas()
    assert len(out) == 1000
    assert out["valid"].all()
    # lossless rows must rehash identically
    ppm = out[out["fmt"] == "ppm"]
    assert (ppm["phash"] == ppm["phash_decoded"]).all()


def test_build_index_manifest_and_covering(index_dir):
    ckpt, manifest = index_dir
    df = manifest.to_pandas()
    assert df["n_rows"].sum() == 1000
    assert (df["n_rows"] <= 100 * 2).all()  # salting bounds partitions (ceil slack)
    # every checkpoint restores to a covering tree identical to a rebuild
    for path in df["path"][:5]:
        tree, tbl = build.load_partition_tree(path)
        assert tree.check_covering()
        assert tree.size() == len(tbl)


def test_build_fused_exchange_matches_streaming(ray_session, tiny_images,
                                                tmp_path):
    """materialize_tagged=True (fused salt+bin in the split tasks,
    counts from block refs) and the streaming groupby path must write
    BIT-IDENTICAL partition checkpoints and equal manifests."""
    import hashlib
    import os

    ds = rd.read_parquet(tiny_images, columns=["image_id", "phash"])
    a, b = str(tmp_path / "fused"), str(tmp_path / "stream")
    ma = build.build_index(ds, a, res=4, target_rows=100, resume=False,
                           materialize_tagged=True).to_pandas()
    mb = build.build_index(ds, b, res=4, target_rows=100, resume=False,
                           materialize_tagged=False).to_pandas()
    cols = ["cell", "salt", "n_rows", "tree_height"]
    ma = ma.sort_values(["cell", "salt"]).reset_index(drop=True)
    mb = mb.sort_values(["cell", "salt"]).reset_index(drop=True)
    assert ma[cols].equals(mb[cols])

    def digest(d):
        h = hashlib.md5()
        for f in sorted(os.listdir(d)):
            if f.startswith("part-") and f.endswith(".parquet"):
                h.update(f.encode())
                h.update(open(os.path.join(d, f), "rb").read())
        return h.hexdigest()

    assert digest(a) == digest(b)


def test_build_resume_skips_completed(ray_session, tiny_images, index_dir):
    ckpt, _ = index_dir
    ds = rd.read_parquet(tiny_images, columns=["image_id", "phash"])
    manifest2 = build.build_index(ds, ckpt, res=4, target_rows=100, resume=True)
    assert manifest2.to_pandas()["resumed"].all()


def test_knn_geo_matches_bruteforce(index_dir, geo_points):
    ckpt, _ = index_dir
    q = fixtures.knn_queries(60)
    qds = rd.from_arrow(__import__("pyarrow").table(q))
    out = knn.knn_geo(qds, ckpt, concurrency=2).to_pandas()
    pts = np.stack([geo_points["lat"], geo_points["lon"]], axis=1)
    for qid, qlat, qlon, k in zip(q["query_id"], q["lat"], q["lon"], q["k"]):
        got = out[out["query_id"] == qid].sort_values("rank")
        d = np.hypot(pts[:, 0] - qlat, pts[:, 1] - qlon)
        order = np.argsort(d, kind="stable")[: int(k)]
        assert len(got) == int(k)
        # distances must match brute force exactly (the reference's bar)
        np.testing.assert_allclose(got["dist"].to_numpy(), d[order], rtol=1e-12, atol=1e-12)
        # neighbor sets equal modulo exact-tie permutations
        got_ids = set(got["image_id"])
        exp_ids = set(geo_points["image_id"][order])
        if got_ids != exp_ids:
            sym = got_ids ^ exp_ids
            tie_d = {iid: d[np.flatnonzero(geo_points["image_id"] == iid)[0]] for iid in sym}
            assert len(set(np.round(list(tie_d.values()), 12))) <= 1


def test_radius_join_matches_bruteforce(index_dir, geo_points):
    ckpt, _ = index_dir
    q = fixtures.knn_queries(20)
    import pyarrow as pa
    qds = rd.from_arrow(pa.table({k: q[k] for k in ("query_id", "lat", "lon")}))
    radius = 8.0
    out = joins.radius_join(qds, ckpt, radius=radius, concurrency=2).to_pandas()
    for qid, qlat, qlon in zip(q["query_id"], q["lat"], q["lon"]):
        got = sorted(out[out["query_id"] == qid]["image_id"])
        d = np.hypot(geo_points["lat"] - qlat, geo_points["lon"] - qlon)
        exp = sorted(geo_points["image_id"][d < radius])
        assert got == exp


def test_radius_join_table_input_both_modes(index_dir, geo_points):
    # a pa.Table queries input must work in BOTH modes (the actor-pool
    # path crashed on it before round 5) and match the Dataset path
    ckpt, _ = index_dir
    q = fixtures.knn_queries(12)
    qt = pa.table({k: q[k] for k in ("query_id", "lat", "lon")})
    base = joins.radius_join(rd.from_arrow(qt), ckpt, radius=6.0,
                             concurrency=2).to_pandas()
    pool = joins.radius_join(qt, ckpt, radius=6.0, concurrency=2).to_pandas()
    task = joins.radius_join(qt, ckpt, radius=6.0,
                             use_actor_pool=False).to_pandas()
    key = ["query_id", "image_id"]
    exp = sorted(map(tuple, base[key].itertuples(index=False)))
    assert sorted(map(tuple, pool[key].itertuples(index=False))) == exp
    assert sorted(map(tuple, task[key].itertuples(index=False))) == exp


def test_knn_geo_table_input_honors_route_knobs(index_dir):
    # pa.Table queries with non-driver routing knobs must take the
    # Dataset paths (knobs were silently ignored before round 5) and
    # return identical results
    ckpt, _ = index_dir
    q = fixtures.knn_queries(15)
    qt = pa.table(q)
    base = knn.knn_geo(qt, ckpt, concurrency=2).to_pandas()
    unrouted = knn.knn_geo(qt, ckpt, concurrency=2,
                           route_by_home_cell=False).to_pandas()
    sorted_route = knn.knn_geo(qt, ckpt, concurrency=2,
                               route_strategy="sort").to_pandas()
    key = ["query_id", "rank", "image_id"]
    exp = sorted(map(tuple, base[key].itertuples(index=False)))
    assert sorted(map(tuple, unrouted[key].itertuples(index=False))) == exp
    assert sorted(map(tuple, sorted_route[key].itertuples(index=False))) == exp


def test_assign_bin_unseen_key_routes_by_hash():
    # a (cell, salt) absent from the count pre-pass (non-deterministic
    # source between scans) must route to SOME valid bin, never raise
    cells_sorted = np.array([10, 20, 30], np.int64)
    keys_sorted = np.array([0, 1, 2 * 2 + 0], np.int64)   # S=2
    bins = np.array([0, 1, 2], np.int64)
    batch = pa.table({
        "cell": pa.array([10, 20, 30, 40], pa.int64()),   # 40 unseen
        "salt": pa.array([0, 0, 1, 0], pa.int64()),       # (20,0),(30,1) unseen
        "image_id": pa.array(["a", "b", "c", "d"]),
    })
    out = build._assign_bin(batch, cells_sorted, keys_sorted, bins, 2)
    got = out.column("bin").to_numpy()
    assert got[0] == 0                       # exact match keeps its bin
    assert set(got).issubset(set(bins.tolist()))


def test_pip_join_matches_numpy_oracle(ray_session, tiny_images, geo_points):
    layer = fixtures.polygon_layer()
    ds = (rd.read_parquet(tiny_images, columns=["image_id"])
          .map_batches(assign.geotag, batch_format="pyarrow"))
    got = joins.point_in_polygon_join(ds, layer, how="inner", concurrency=2).to_pandas()
    pi, pj = geom.point_in_polygons(geo_points["lon"], geo_points["lat"], layer["ring"])
    exp = sorted(zip(geo_points["image_id"][pi], [layer["polygon_id"][j] for j in pj]))
    assert sorted(zip(got["image_id"], got["polygon_id"])) == exp
    assert len(exp) > 0  # hot-spot rectangles guarantee hits
    # semi + anti partition the input
    semi = joins.point_in_polygon_join(ds, layer, how="semi", concurrency=2).count()
    anti = joins.point_in_polygon_join(ds, layer, how="anti", concurrency=2).count()
    assert semi + anti == 1000
    assert semi == len(set(geo_points["image_id"][pi]))


def test_nearest_rect_join_matches_bruteforce(ray_session):
    rng = np.random.default_rng(21)
    n = 3000
    lat_u = rng.integers(-89_000_000, 89_000_000, n)
    lon_u = rng.integers(-179_000_000, 179_000_000, n)
    ids = np.arange(n, dtype=np.int64)
    rects = []
    for i in range(9):
        cx = int(rng.integers(-150_000_000, 150_000_000))
        cy = int(rng.integers(-70_000_000, 70_000_000))
        w = int(rng.integers(1_000_000, 20_000_000))
        h = int(rng.integers(1_000_000, 20_000_000))
        rects.append({"polygon_id": f"r{i}", "x0": cx - w, "x1": cx + w,
                      "y0": cy - h, "y1": cy + h})
    ds = rd.from_arrow(pa.table({
        "image_id": pa.array(ids), "lat_u": pa.array(lat_u),
        "lon_u": pa.array(lon_u)})).repartition(5)
    out = (joins.nearest_rect_join(ds, rects)
           .to_pandas().set_index("image_id").sort_index())
    assert len(out) == n
    # brute force: (n, 9) clamp distance matrix, argmin with id tie-break
    x0 = np.array([r["x0"] for r in rects]); x1 = np.array([r["x1"] for r in rects])
    y0 = np.array([r["y0"] for r in rects]); y1 = np.array([r["y1"] for r in rects])
    dx = np.maximum(0, np.maximum(x0[None] - lon_u[:, None], lon_u[:, None] - x1[None]))
    dy = np.maximum(0, np.maximum(y0[None] - lat_u[:, None], lat_u[:, None] - y1[None]))
    d2 = dx * dx + dy * dy
    for i in ids:
        row = out.loc[i]
        j = [r["polygon_id"] for r in rects].index(row["polygon_id"])
        assert d2[i, j] == row["d2_u"] == d2[i].min()
        # tie-break: no smaller polygon_id at the same distance
        mins = [rects[m]["polygon_id"] for m in np.flatnonzero(d2[i] == d2[i].min())]
        assert row["polygon_id"] == min(mins)
    # a point inside a rect scores 0
    inside = (joins.nearest_rect_join(
        rd.from_arrow(pa.table({
            "image_id": pa.array([0], pa.int64()),
            "lat_u": pa.array([(rects[0]["y0"] + rects[0]["y1"]) // 2], pa.int64()),
            "lon_u": pa.array([(rects[0]["x0"] + rects[0]["x1"]) // 2], pa.int64()),
        })), rects).to_pandas())
    assert inside["d2_u"].iloc[0] == 0


def test_quadkey_num_prefix_is_ancestor():
    rng = np.random.default_rng(33)
    lat_u = rng.integers(-89_999_999, 89_999_999, 500)
    lon_u = rng.integers(-179_999_999, 179_999_999, 500)
    q6 = cell.quadkey_num(lat_u, lon_u, 6)
    # digit truncation equals the coarser-resolution quadkey
    for res in (1, 3, 5):
        np.testing.assert_array_equal(q6 // 10 ** (6 - res),
                                      cell.quadkey_num(lat_u, lon_u, res))
    # digits reconstruct the tile coordinates
    ix, iy = cell.cell_xy(lat_u, lon_u, 6)
    rx = np.zeros_like(ix)
    ry = np.zeros_like(iy)
    for p in range(6):
        d = (q6 // 10 ** (6 - 1 - p)) % 10
        assert d.max() <= 3
        rx = (rx << 1) | (d & 1)
        ry = (ry << 1) | (d >> 1)
    np.testing.assert_array_equal(rx, ix)
    np.testing.assert_array_equal(ry, iy)
    # string form zero-pads: a point in the SW-most tile
    assert cell.quadkey_str(np.array([1]), 4)[0] == "0001"


def test_quadkey_pyramid_matches_bruteforce(ray_session):
    rng = np.random.default_rng(34)
    n, res = 5000, 5
    lat_u = rng.integers(-89_000_000, 89_000_000, n)
    lon_u = rng.integers(-179_000_000, 179_000_000, n)
    ds = rd.from_arrow(pa.table({
        "lat_u": pa.array(lat_u), "lon_u": pa.array(lon_u)})).repartition(7)
    for combine in (True, False):
        out = (tiles.quadkey_pyramid(ds, res, driver_combine=combine)
               .to_pandas())
        q = cell.quadkey_num(lat_u, lon_u, res)
        want = {}
        for lvl in range(1, res + 1):
            vals, cnt = np.unique(q // 10 ** (res - lvl), return_counts=True)
            for v, c in zip(vals, cnt):
                want[(lvl, str(v).zfill(lvl))] = int(c)
        got = {(int(l), k): int(c) for l, k, c in
               zip(out["level"], out["quadkey"], out["n"])}
        assert got == want
        # every level partitions the full point set
        assert all(out[out["level"] == L]["n"].sum() == n
                   for L in range(1, res + 1))


def test_focal_sum_matches_bruteforce_both_paths(ray_session):
    rng = np.random.default_rng(35)
    n, res = 4000, 5
    m = 1 << res
    lat_u = rng.integers(-89_000_000, 89_000_000, n)
    lon_u = rng.integers(-179_000_000, 179_000_000, n)
    ds = rd.from_arrow(pa.table({
        "lat_u": pa.array(lat_u), "lon_u": pa.array(lon_u)})).repartition(6)
    t = cell.tile_of(lat_u, lon_u, res)
    grid = np.zeros((m, m), np.int64)
    np.add.at(grid, (t // m, t % m), 1)
    pad = np.pad(grid, 1)
    want_focal = sum(pad[1 + dy:1 + dy + m, 1 + dx:1 + dx + m]
                     for dy in (-1, 0, 1) for dx in (-1, 0, 1))
    results = []
    for combine in (True, False):
        out = (tiles.focal_sum(ds, res, driver_combine=combine)
               .to_pandas().sort_values("tile_id").reset_index(drop=True))
        for _, r in out.iterrows():
            iy, ix = divmod(int(r["tile_id"]), m)
            assert grid[iy, ix] == r["n"]
            assert want_focal[iy, ix] == r["focal_n"]
        assert len(out) == int((grid > 0).sum())
        results.append(out)
    # distributed shifted-key path is row-identical to the driver stencil
    assert results[0].equals(results[1])
    # focal >= own count always; a lone corner point sums only itself
    assert (results[0]["focal_n"] >= results[0]["n"]).all()


def test_tile_assignment_and_cover(ray_session, tiny_images, geo_points):
    res = 5
    ds = (rd.read_parquet(tiny_images, columns=["image_id"])
          .map_batches(assign.geotag, batch_format="pyarrow"))
    out = tiles.assign_tiles(ds, res).to_pandas()
    lat_u, lon_u = cell.latlon_to_units(geo_points["lat"], geo_points["lon"])
    exp = cell.tile_of(lat_u, lon_u, res)
    merged = out.set_index("image_id").loc[geo_points["image_id"]]
    np.testing.assert_array_equal(merged["tile_id"].to_numpy(), exp)

    layer = fixtures.polygon_layer()
    cover = tiles.tile_polygon_cover(layer, res).to_pandas()
    # oracle: a tile containing a point inside polygon j must be covered by j
    pi, pj = geom.point_in_polygons(geo_points["lon"], geo_points["lat"], layer["ring"])
    cov = set(zip(cover["tile_id"], cover["polygon_id"]))
    for i, j in zip(pi, pj):
        assert (int(exp[i]), layer["polygon_id"][j]) in cov


def test_knn_metric_hamming_matches_bruteforce(ray_session, tiny_images, geo_points):
    from metric_search_ray import phash as ph
    ds = rd.read_parquet(tiny_images, columns=["image_id", "phash"])
    qidx = [0, 50, 100, 999]
    qids = [geo_points["image_id"][i] for i in qidx]
    qdata = geo_points["phash"][qidx]
    out = knn.knn_metric(ds, qids, qdata, k=5, metric="hamming").to_pandas()
    for qi, qid in zip(qidx, qids):
        got = out[out["query_id"] == qid].sort_values("rank")
        d = ph.hamming(np.full(1000, geo_points["phash"][qi], np.int64), geo_points["phash"])
        order = np.lexsort((geo_points["image_id"], d))[:5]
        np.testing.assert_array_equal(got["dist"].to_numpy(), d[order].astype(float))
        assert list(got["image_id"]) == list(geo_points["image_id"][order])
    # planted near-duplicates: img-00000050 duplicates img-00000049
    got50 = out[out["query_id"] == "img-00000050"]
    top = got50.sort_values("rank").iloc[1]
    assert top["dist"] <= 6


def test_knn_methods_agree(index_dir):
    """scan and tree query methods must return identical exact results."""
    import pyarrow as pa
    ckpt, _ = index_dir
    q = fixtures.knn_queries(25)
    qds1 = rd.from_arrow(pa.table(q))
    out_scan = knn.knn_geo(qds1, ckpt, concurrency=2).to_pandas()
    qds2 = rd.from_arrow(pa.table(q))
    manifest = build.load_manifest(ckpt)
    actor = knn.KnnActor(ckpt, method="tree")
    import numpy as np
    got_tree = actor(pa.table({
        "query_id": pa.array(q["query_id"]),
        "lat": pa.array(q["lat"]), "lon": pa.array(q["lon"]),
        "k": pa.array(q["k"], pa.int32()),
    })).to_pandas()
    a = out_scan.sort_values(["query_id", "rank"]).reset_index(drop=True)
    b = got_tree.sort_values(["query_id", "rank"]).reset_index(drop=True)
    np.testing.assert_allclose(a["dist"].to_numpy(), b["dist"].to_numpy(), rtol=1e-12)


def test_ssim_verify_pairs(ray_session, tiny_images):
    import pyarrow as pa
    from metric_search_ray.pipelines import dedup, ssimverify
    ds = rd.read_parquet(tiny_images)
    pairs = dedup.hamming_pairs(ds.select_columns(["image_id", "phash"]),
                                max_hamming=2)
    out = ssimverify.ssim_verify_pairs(ds, pairs).to_pandas()
    assert len(out) > 0
    # planted near-duplicates (img-N vs img-N-1 at N % 50 == 0) score low;
    # same-shape non-dup pairs score higher on average
    import numpy as np
    dup_mask = out.apply(lambda r: abs(int(r["id_a"][4:]) - int(r["id_b"][4:])) == 1, axis=1)
    scored = out[~out["ssim_dist"].isna()]
    if dup_mask.any() and (~dup_mask).any():
        dup_scores = out[dup_mask]["ssim_dist"].dropna()
        other = out[~dup_mask]["ssim_dist"].dropna()
        if len(dup_scores) and len(other):
            assert dup_scores.mean() <= other.mean() + 1e-9


def test_knn_geo_hash_routing_matches_sort(index_dir, geo_points):
    """route_strategy='hash' (keyed repartition, no sort barrier) must
    return exactly the default sort-routed results."""
    ckpt, _ = index_dir
    q = fixtures.knn_queries(40)
    import pyarrow as pa
    a = (knn.knn_geo(rd.from_arrow(pa.table(q)), ckpt, concurrency=2)
         .to_pandas().sort_values(["query_id", "rank"]).reset_index(drop=True))
    b = (knn.knn_geo(rd.from_arrow(pa.table(q)), ckpt, concurrency=2,
                     route_strategy="hash")
         .to_pandas().sort_values(["query_id", "rank"]).reset_index(drop=True))
    assert a[["query_id", "image_id", "rank"]].equals(
        b[["query_id", "image_id", "rank"]])
    np.testing.assert_allclose(a["dist"], b["dist"], atol=0)


def test_knn_geo_k_exceeds_dataset_no_duplicates(index_dir, geo_points):
    """k >= dataset size must return every point exactly once.

    Regression: cell.ring() wraps longitude, so a cell at wrapped offset
    dx reappears on ring n-dx — before the first-appearance dedup the
    full-grid sweep scanned most partitions twice, duplicating neighbors
    whenever k was large enough to retain both copies."""
    import pyarrow as pa
    ckpt, _ = index_dir
    n_pts = len(geo_points["image_id"])
    q = pa.table({
        # antimeridian + mid-grid homes: both wrap regimes
        "query_id": pa.array(["full-0", "full-1"], pa.string()),
        "lat": pa.array([-89.99, 10.0], pa.float64()),
        "lon": pa.array([-180.0, 20.0], pa.float64()),
        "k": pa.array([n_pts + 1, n_pts], pa.int32()),
    })
    out = knn.knn_geo(rd.from_arrow(q), ckpt, concurrency=2).to_pandas()
    for qid in ("full-0", "full-1"):
        got = out[out["query_id"] == qid]
        assert len(got) == n_pts, (qid, len(got))
        assert got["image_id"].is_unique
        assert sorted(got["rank"]) == list(range(1, n_pts + 1))
    # serial path (query_one) must agree
    actor = knn.KnnActor(ckpt)
    res = actor.query_one(-89.99, -180.0, n_pts + 1)
    assert len(res) == n_pts
    assert len({iid for _, iid in res}) == n_pts


def test_knn_geo_empty_queries(index_dir):
    import pyarrow as pa
    ckpt, _ = index_dir
    q = rd.from_arrow(pa.table({
        "query_id": pa.array([], pa.string()),
        "lat": pa.array([], pa.float64()),
        "lon": pa.array([], pa.float64()),
        "k": pa.array([], pa.int32()),
    }))
    assert knn.knn_geo(q, ckpt, concurrency=2).count() == 0


def test_job_entrypoint(ray_session, tiny_images, tmp_path):
    """python -m metric_search_ray.job contract: runs inside an existing
    Ray session, writes knn/pip/tiles parquet + metrics.json, and a
    rerun resumes every index partition."""
    import json
    from metric_search_ray import job

    out1 = tmp_path / "out1"
    rc = job.main(["--input", tiny_images, "--ckpt", str(tmp_path / "idx"),
                   "--output", str(out1), "--res", "4", "--target-rows", "500",
                   "--knn-concurrency", "2"])
    assert rc == 0
    m = json.loads((out1 / "metrics.json").read_text())
    assert m["invalid_rows"] == 0 and m["resumed_partitions"] == 0
    assert (out1 / "knn").exists() and (out1 / "pip").exists()
    out2 = tmp_path / "out2"
    rc = job.main(["--input", tiny_images, "--ckpt", str(tmp_path / "idx"),
                   "--output", str(out2), "--res", "4", "--target-rows", "500",
                   "--knn-concurrency", "2", "--skip-validate"])
    assert rc == 0
    m2 = json.loads((out2 / "metrics.json").read_text())
    assert m2["resumed_partitions"] == m2["index_partitions"]


def test_knn_boundary_ties_deterministic(ray_session, tmp_path):
    """More than kmax equidistant points: the grouped scan must return
    the same id set as the serial path (ties cut on (dist, image_id))."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    # 30 points at the SAME location + 10 spread out
    n_dup, n_far = 30, 10
    ids = [f"img-{i:08d}" for i in range(n_dup + n_far)]
    lat = np.concatenate([np.full(n_dup, 10.0), np.linspace(20, 60, n_far)])
    lon = np.concatenate([np.full(n_dup, 10.0), np.linspace(20, 60, n_far)])
    from metric_search_ray import geocode
    # build index over explicit coordinates via a synthetic checkpoint:
    # use build_index on ids whose geotag we override is complex — instead
    # write rows through the normal build by choosing ids, then query the
    # actor paths directly against a hand-made checkpoint
    from metric_search_ray.covertree import build_planar_tree_arrays
    import os
    ck = str(tmp_path / "idx"); os.makedirs(ck)
    from metric_search_ray.pipelines import build as buildmod
    from metric_search_ray import cell as cellmod
    lat_u = (lat * 1e6).astype(np.int64)
    lon_u = (lon * 1e6).astype(np.int64)
    cells = cellmod.cell_of(lat_u, lon_u, 4)
    import pandas as pd
    rows = pd.DataFrame({"cell": cells, "salt": 0, "image_id": ids,
                         "lat": lat, "lon": lon, "phash": np.zeros(len(ids), np.int64)})
    manifest_parts = []
    for c, g in rows.groupby("cell"):
        t = pa.table({k: g[k].to_numpy() if k != "image_id" else g[k].tolist()
                      for k in ("cell", "salt", "image_id", "lat", "lon", "phash")})
        manifest_parts.append(buildmod._build_partition(t, ck, resume=False))
    manifest = pa.concat_tables(manifest_parts)
    pq.write_table(manifest, os.path.join(ck, "manifest.parquet"))
    from metric_search_ray.pipelines.knn import KnnActor
    actor_scan = KnnActor(ck, method="scan")
    qb = pa.table({"query_id": pa.array(["q"]),
                   "lat": pa.array([10.0]), "lon": pa.array([10.0]),
                   "k": pa.array([5], pa.int32())})
    got = actor_scan(qb).to_pandas().sort_values("rank")
    # serial oracle
    serial = actor_scan.query_one(10.0, 10.0, 5)
    assert got["image_id"].tolist() == [iid for _, iid in serial]
    # deterministic: the 5 smallest (dist, id) — all dup points tie at 0,
    # so ids img-00000000..4 must win
    assert got["image_id"].tolist() == [f"img-{i:08d}" for i in range(5)]


def test_build_partial_resume(ray_session, tiny_images, tmp_path):
    """Deleting some checkpoint files rebuilds ONLY those partitions."""
    import os
    ds = rd.read_parquet(tiny_images, columns=["image_id", "phash"])
    ck = str(tmp_path / "idx")
    m1 = build.build_index(ds, ck, res=4, target_rows=200).to_pandas()
    victims = sorted(m1["path"])[:3]
    for p in victims:
        os.remove(p)
    m2 = build.build_index(ds, ck, res=4, target_rows=200).to_pandas()
    rebuilt = m2[~m2["resumed"]]["path"].tolist()
    assert sorted(rebuilt) == sorted(victims)
    assert m2["resumed"].sum() == len(m2) - 3


def test_apply_changes_cdc_merge(ray_session, tiny_images, tmp_path):
    """CDC merge: one pass applies deletes + upserts (replace and
    insert) and kNN stays brute-force-exact over the surviving set."""
    ckpt = str(tmp_path / "cdc_idx")
    ds = rd.read_parquet(tiny_images, columns=["image_id", "phash"])
    build.build_index(ds, ckpt, res=4, target_rows=100)
    ids = sorted(pq.read_table(tiny_images, columns=["image_id"])
                 .column("image_id").to_pylist())
    dels = ids[::7][:40]
    new_ids = [f"cdc-{i:04d}" for i in range(50)]
    replace_id = ids[1]
    assert replace_id not in dels
    n_ch = len(dels) + len(new_ids) + 2
    changes = pa.table({
        "image_id": pa.array(dels + new_ids + [replace_id, "ghost-000"]),
        "phash": pa.array(np.arange(n_ch, dtype=np.int64)),
        "op": pa.array(["delete"] * len(dels) + ["upsert"] * (len(new_ids) + 1)
                       + ["delete"]),          # ghost delete: no-op
    })
    manifest = build.apply_changes(changes, ckpt)
    remaining = sorted((set(ids) - set(dels)) | set(new_ids))
    assert int(manifest.column("n_rows").to_numpy().sum()) == len(remaining)
    # the replaced id carries its upserted phash in the checkpoint
    found = []
    for path in manifest.column("path").to_pylist():
        t = pq.read_table(path, columns=["image_id", "phash"])
        m = dict(zip(t.column("image_id").to_pylist(),
                     t.column("phash").to_pylist()))
        if replace_id in m:
            found.append(m[replace_id])
    assert found == [len(dels) + len(new_ids)]
    # kNN brute-force-exact over the surviving geotags
    q = fixtures.knn_queries(25)
    out = knn.knn_geo(pa.table(q), ckpt, concurrency=2).to_pandas()
    lat_u, lon_u = geocode.geocode_image_ids(np.asarray(remaining, object))
    lat, lon = lat_u / 1e6, lon_u / 1e6
    for qid, qlat, qlon, k in zip(q["query_id"], q["lat"], q["lon"], q["k"]):
        got = out[out["query_id"] == qid].sort_values("rank")
        d = np.hypot(lat - qlat, lon - qlon)
        order = np.argsort(d, kind="stable")[: int(k)]
        np.testing.assert_allclose(got["dist"].to_numpy(), d[order],
                                   rtol=1e-12, atol=1e-12)


def test_preload_auto_switch_on_mocked_multinode(index_dir, monkeypatch):
    """The preload auto-default turns ON iff the cluster has >1 alive
    node (knn_geo / radius_join); single-node sandboxes can't exercise
    that branch for real, so mock ray.nodes() and assert the staged
    path is actually taken AND results equal the non-staged path."""
    import ray as ray_mod
    from metric_search_ray.pipelines import knn as knnmod
    ckpt, _ = index_dir
    q = fixtures.knn_queries(10)
    qt = pa.table(q)
    base = knn.knn_geo(qt, ckpt, preload=False).to_pandas()
    rbase = joins.radius_join(
        qt.drop_columns(["k"]), ckpt, radius=6.0,
        use_actor_pool=False, preload=False).to_pandas()

    launches = []
    orig_launch = knnmod._stage_launch
    monkeypatch.setattr(knnmod, "_stage_launch",
                        lambda *a, **k: launches.append(a) or orig_launch(*a, **k))
    monkeypatch.setattr(ray_mod, "nodes",
                        lambda: [{"Alive": True}, {"Alive": True}])
    got = knn.knn_geo(qt, ckpt).to_pandas()          # preload=None -> auto-on
    assert launches, "multi-node auto-switch did not take the staged path"
    key = ["query_id", "rank", "image_id"]
    assert (sorted(map(tuple, got[key].itertuples(index=False)))
            == sorted(map(tuple, base[key].itertuples(index=False))))

    n0 = len(launches)
    rgot = joins.radius_join(qt.drop_columns(["k"]), ckpt, radius=6.0,
                             use_actor_pool=False).to_pandas()
    assert len(launches) > n0, "radius_join auto-switch did not stage"
    rkey = ["query_id", "image_id"]
    assert (sorted(map(tuple, rgot[rkey].itertuples(index=False)))
            == sorted(map(tuple, rbase[rkey].itertuples(index=False))))


def test_preload_staging_paths_match_default(index_dir):
    """The opt-in object-store staging path (preload=True) must return
    the same kNN and radius results as the parquet-decode default —
    regression guard for the multi-node code path."""
    import pyarrow as pa

    ckpt, _ = index_dir
    q = fixtures.knn_queries(25)
    qds = pa.table(q)
    base = knn.knn_geo(rd.from_arrow(qds), ckpt, concurrency=2).to_pandas()
    pre = knn.knn_geo(rd.from_arrow(qds), ckpt, concurrency=2,
                      preload=True).to_pandas()
    key = lambda df: sorted(map(tuple, df[["query_id", "image_id", "rank"]]
                                .values.tolist()))
    assert key(base) == key(pre)
    rq = pa.table({k: v for k, v in q.items() if k != "k"})
    rbase = joins.radius_join(rd.from_arrow(rq), ckpt, radius=1.0).to_pandas()
    rpre = joins.radius_join(rd.from_arrow(rq), ckpt, radius=1.0,
                             preload=True).to_pandas()
    pkey = lambda df: sorted(map(tuple, df[["query_id", "image_id"]]
                                 .values.tolist()))
    assert pkey(rbase) == pkey(rpre)


# ------------------------------------------------------------------ range join


def _rj_brute(vals, ids, intervals, closed):
    exp = []
    for r, v in enumerate(vals):
        for j in range(len(intervals["lo"])):
            lo, hi = intervals["lo"][j], intervals["hi"][j]
            inside = (lo <= v <= hi) if closed == "both" else (lo <= v < hi)
            if inside:
                exp.append((ids[r], intervals["interval_id"][j]))
    return sorted(exp)


@pytest.mark.parametrize("closed", ["left", "both"])
def test_range_join_overlapping_matches_bruteforce(ray_session, closed):
    rng = np.random.default_rng(7)
    vals = np.round(rng.uniform(0, 100, 500), 3)
    ids = np.arange(500, dtype=np.int64)
    intervals = {"interval_id": ["a", "b", "c", "d", "e"],
                 "lo": [0.0, 10.0, 25.0, 25.0, 90.0],
                 "hi": [30.0, 50.0, 75.0, 30.0, 100.0]}   # overlapping
    import pyarrow as pa
    ds = rd.from_arrow(pa.table({"rid": ids, "v": vals}))
    out = joins.range_join(ds, intervals, "v", closed=closed,
                           concurrency=2).to_pandas()
    got = sorted(zip(out["rid"], out["interval_id"]))
    assert got == _rj_brute(vals, ids, intervals, closed)


def test_range_join_disjoint_fast_path_and_semi_anti(ray_session):
    rng = np.random.default_rng(11)
    vals = np.round(rng.uniform(0, 100, 400), 3)
    ids = np.arange(400, dtype=np.int64)
    intervals = {"interval_id": [10, 20, 30],
                 "lo": [0.0, 40.0, 80.0],
                 "hi": [20.0, 60.0, 100.0]}               # disjoint, gaps
    actor = joins.RangeJoinActor(intervals, "v")
    assert actor.disjoint
    import pyarrow as pa
    ds = rd.from_arrow(pa.table({"rid": ids, "v": vals}))
    out = joins.range_join(ds, intervals, "v", use_actor_pool=False).to_pandas()
    exp = _rj_brute(vals, ids, intervals, "left")
    assert sorted(zip(out["rid"], out["interval_id"])) == exp
    matched = {r for r, _ in exp}
    semi = joins.range_join(ds, intervals, "v", how="semi",
                            use_actor_pool=False).to_pandas()
    anti = joins.range_join(ds, intervals, "v", how="anti",
                            use_actor_pool=False).to_pandas()
    assert set(semi["rid"]) == matched
    assert set(anti["rid"]) == set(ids) - matched
    assert len(semi) + len(anti) == 400


# ------------------------------------------------- incremental index updates


def test_update_and_erase_index_keep_knn_exact(ray_session, tmp_path):
    import pyarrow as pa

    from metric_search_ray import geocode
    from metric_search_ray.metrics import planar_dist
    from metric_search_ray.pipelines import build as B, knn as K

    def img_tbl(lo, hi):
        ids = np.array([f"img-{i:08d}" for i in range(lo, hi)], object)
        return pa.table({
            "image_id": pa.array(ids, pa.string()),
            "phash": pa.array(np.arange(lo, hi) * 7, pa.int64()),
        })

    ckpt = str(tmp_path / "idx")
    B.build_index(rd.from_arrow(img_tbl(0, 800)), ckpt, res=4,
                  target_rows=100)
    m0 = B.load_manifest(ckpt)

    # ---- insert 200 new ids (some land in existing partitions)
    m1 = B.update_index(rd.from_arrow(img_tbl(800, 1000)), ckpt)
    assert int(m1.column("n_rows").to_numpy().sum()) == 1000

    def brute(ids, qlat, qlon, k):
        lat_u, lon_u = geocode.geocode_image_ids(ids)
        d = planar_dist(lat_u / 1e6 - qlat, lon_u / 1e6 - qlon)
        return list(ids[np.lexsort((ids.astype(str), d))[:k]])

    all_ids = np.array([f"img-{i:08d}" for i in range(1000)], object)
    qt = pa.table({"query_id": pa.array(["u-0", "u-1"], pa.string()),
                   "lat": pa.array([10.0, -45.0]),
                   "lon": pa.array([20.0, 100.0]),
                   "k": pa.array([7, 7], pa.int32())})
    out = K.knn_geo(rd.from_arrow(qt), ckpt, concurrency=2).to_pandas()
    for qid, qla, qlo in [("u-0", 10.0, 20.0), ("u-1", -45.0, 100.0)]:
        got = out[out.query_id == qid].sort_values("rank")["image_id"].tolist()
        assert got == brute(all_ids, qla, qlo, 7), qid

    # ---- erase 150 ids (mix of old and new)
    gone = [f"img-{i:08d}" for i in range(700, 850)]
    m2 = B.erase_from_index(gone, ckpt)
    assert int(m2.column("n_rows").to_numpy().sum()) == 850
    left = np.array([f"img-{i:08d}" for i in
                     list(range(700)) + list(range(850, 1000))], object)
    out2 = K.knn_geo(rd.from_arrow(qt), ckpt, concurrency=2).to_pandas()
    for qid, qla, qlo in [("u-0", 10.0, 20.0), ("u-1", -45.0, 100.0)]:
        got = out2[out2.query_id == qid].sort_values("rank")["image_id"].tolist()
        assert got == brute(left, qla, qlo, 7), qid
    # erased ids are really gone from every checkpoint
    import pyarrow.parquet as pq
    held = set()
    for p in m2.column("path").to_pylist():
        held |= set(pq.read_table(p, columns=["image_id"])
                    .column("image_id").to_pylist())
    assert held == set(left.tolist())


def test_shuffle_hash_join_vs_duckdb(ray_session):
    import duckdb
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from metric_search_ray.pipelines.joins import shuffle_hash_join

    rng = np.random.default_rng(2)
    L = pa.table({"k": pa.array(rng.integers(0, 50, 500)),
                  "lv": pa.array(rng.integers(0, 1000, 500))})
    R = pa.table({"k": pa.array(rng.integers(0, 60, 300)),
                  "rv": pa.array([f"s{i}" for i in range(300)])})
    for how in ("inner", "left"):
        got = shuffle_hash_join(rd.from_arrow(L).repartition(5),
                                rd.from_arrow(R).repartition(3),
                                "k", ["lv"], ["rv"], how=how).to_pandas()
        con = duckdb.connect()
        con.register("L", L.to_pandas())
        con.register("R", R.to_pandas())
        j = "JOIN" if how == "inner" else "LEFT JOIN"
        want = con.execute(f"SELECT L.k, lv, rv FROM L {j} R USING (k)").df()
        gs = got.sort_values(["k", "lv", "rv"], na_position="last",
                             ).reset_index(drop=True)
        ws = want.sort_values(["k", "lv", "rv"], na_position="last",
                              ).reset_index(drop=True)
        pd.testing.assert_frame_equal(gs, ws, check_dtype=False)


def test_shuffle_hash_join_contracts(ray_session):
    import pyarrow as pa
    import pytest
    import ray.data as rd

    from metric_search_ray.pipelines.joins import shuffle_hash_join

    L = rd.from_arrow(pa.table({"k": [1], "v": [2]}))
    R = rd.from_arrow(pa.table({"k": [1], "v": [3]}))
    with pytest.raises(ValueError, match="overlapping"):
        shuffle_hash_join(L, R, "k", ["v"], ["v"])
    with pytest.raises(ValueError, match="unsupported"):
        shuffle_hash_join(L, R, "k", ["v"], [], how="full")
    # no matching keys: inner empty, left keeps all with nulls
    R2 = rd.from_arrow(pa.table({"k": [9], "rv": ["x"]}))
    assert shuffle_hash_join(L, R2, "k", ["v"], ["rv"], how="inner").count() == 0
    left = shuffle_hash_join(L, R2, "k", ["v"], ["rv"], how="left").to_pandas()
    assert len(left[left["k"] == 1]) == 1
    assert left[left["k"] == 1]["rv"].isna().all()


def test_ssim_verify_auto_paths_agree(ray_session, tiny_images):
    """ssim_verify picks broadcast vs join by candidate-set size; both
    paths must score every pair identically."""
    import numpy as np
    import pyarrow as pa
    from metric_search_ray.pipelines import dedup, ssimverify
    ds = rd.read_parquet(tiny_images)
    pairs = (dedup.hamming_pairs(ds.select_columns(["image_id", "phash"]),
                                 max_hamming=2).limit(200).materialize())

    def norm(df):
        return (df.sort_values(["id_a", "id_b"]).reset_index(drop=True))

    a = norm(ssim_df := ssimverify.ssim_verify(ds, pairs).to_pandas())
    # broadcast_limit_bytes=0 forces the hash-join path
    b = norm(ssimverify.ssim_verify(ds, pairs,
                                    broadcast_limit_bytes=0).to_pandas())
    assert len(a) == len(b) > 0
    assert (a["id_a"] == b["id_a"]).all() and (a["id_b"] == b["id_b"]).all()
    np.testing.assert_allclose(a["ssim_dist"].to_numpy(),
                               b["ssim_dist"].to_numpy(), rtol=1e-12)
    # staged-decode path (decode-once into plasma): identical scores
    dref = ssimverify.stage_decoded_gray(ds)
    c = norm(ssimverify.ssim_verify_pairs_staged(pairs, dref).to_pandas())
    assert len(c) == len(a)
    assert (a["id_a"] == c["id_a"]).all() and (a["id_b"] == c["id_b"]).all()
    np.testing.assert_allclose(a["ssim_dist"].to_numpy(),
                               c["ssim_dist"].to_numpy(), rtol=1e-12)


def test_stage_partition_arrays_batched(ray_session, index_dir):
    """Batched staging (several checkpoint files per task) must expose a
    per-path ref for every manifest partition, resolving to the same
    arrays as a direct read, and knn with preload=True must match
    preload=False."""
    import numpy as np
    import pyarrow as pa
    import ray
    from metric_search_ray.pipelines import build, knn
    ckpt, _ = index_dir
    knn._STAGE_REFS.clear()
    handle = knn.stage_partition_arrays(ckpt, files_per_task=3)
    refs = ray.get(handle)
    manifest = build.load_manifest(ckpt)
    paths = manifest.column("path").to_pylist()
    assert set(refs) == set(paths)
    lat, lon, ids = ray.get(refs[paths[0]])
    dlat, dlon, dids = knn._read_partition_arrays(paths[0])
    np.testing.assert_array_equal(lat, dlat)
    np.testing.assert_array_equal(ids, dids)
    q = fixtures.knn_queries(15)
    a = (knn.knn_geo(rd.from_arrow(pa.table(q)), ckpt, preload=True)
         .to_pandas().sort_values(["query_id", "rank"]).reset_index(drop=True))
    b = (knn.knn_geo(rd.from_arrow(pa.table(q)), ckpt, preload=False)
         .to_pandas().sort_values(["query_id", "rank"]).reset_index(drop=True))
    assert a[["query_id", "image_id", "rank"]].equals(b[["query_id", "image_id", "rank"]])


def test_compact_index_shrink_grow_and_normalize(ray_session, tmp_path):
    """CDC-drifted cells re-salt to ceil(total/target); compacted cell
    files are bit-identical to a fresh build of the surviving points;
    kNN stays brute-force exact through shrink, grow, and compaction."""
    import hashlib
    import os

    import pyarrow.parquet as pq_

    from metric_search_ray import cell as cellmod
    from metric_search_ray import fixtures, geocode
    from metric_search_ray.pipelines import knn

    work = str(tmp_path)
    pq_.write_table(fixtures.image_table(3000), f"{work}/images.parquet")
    ds = rd.read_parquet(f"{work}/images.parquet",
                         columns=["image_id", "phash"])
    idx = f"{work}/idx"
    build.build_index(ds, idx, res=3, target_rows=150)
    man0 = build.load_manifest(idx).to_pandas()
    plan0 = build.salt_plan_from_manifest(None, idx)
    big = int(man0.groupby("cell")["n_rows"].sum().idxmax())

    ids = pq_.read_table(f"{work}/images.parquet", columns=["image_id"]
                         ).column("image_id").to_numpy(
                             zero_copy_only=False).astype(str)
    lat_u, lon_u = geocode.geocode_image_ids(ids)
    cells = cellmod.cell_of(lat_u, lon_u, 3)
    in_big = ids[cells == big]
    dels = in_big[:int(len(in_big) * 0.6)]
    build.apply_changes(pa.table({
        "image_id": pa.array(dels, pa.string()),
        "phash": pa.array(np.zeros(len(dels), np.int64)),
        "op": pa.array(["delete"] * len(dels), pa.string()),
    }), idx)
    man1 = build.load_manifest(idx).to_pandas()
    tot1 = int(man1[man1.cell == big]["n_rows"].sum())

    man2 = build.compact_index(idx, target_rows=150).to_pandas()
    plan2 = build.salt_plan_from_manifest(None, idx)
    k_new = max(1, int(np.ceil(tot1 / 150)))
    assert plan2.get(big, 1) == k_new < plan0.get(big, 1)
    assert int(man2[man2.cell == big]["n_rows"].sum()) == tot1
    for s in range(k_new, plan0.get(big, 1)):
        assert not os.path.exists(build.part_path(idx, big, s))

    # normalization: bit-identical to a fresh build of the survivors
    keep = ~np.isin(ids, dels)
    surv = pq_.read_table(f"{work}/images.parquet").filter(pa.array(keep))
    idx2 = f"{work}/idx_fresh"
    build.build_index(rd.from_arrow(surv.select(["image_id", "phash"])),
                      idx2, res=3, target_rows=150)
    for s in range(k_new):
        ha = hashlib.md5(open(build.part_path(idx, big, s), "rb").read())
        hb = hashlib.md5(open(build.part_path(idx2, big, s), "rb").read())
        assert ha.hexdigest() == hb.hexdigest(), s

    # grow: upsert enough NEW ids landing in the big cell to re-split
    cand = np.asarray([f"img-{i:08d}" for i in range(3000, 40000)],
                      np.str_)
    cl, co = geocode.geocode_image_ids(cand)
    grow = cand[cellmod.cell_of(cl, co, 3) == big][:400]
    assert len(grow) >= 300
    build.apply_changes(pa.table({
        "image_id": pa.array(grow, pa.string()),
        "phash": pa.array(np.arange(len(grow), dtype=np.int64)),
        "op": pa.array(["upsert"] * len(grow), pa.string()),
    }), idx)
    man3 = build.compact_index(idx, target_rows=150).to_pandas()
    plan3 = build.salt_plan_from_manifest(None, idx)
    tot3 = int(man3[man3.cell == big]["n_rows"].sum())
    assert tot3 == tot1 + len(grow)
    assert plan3.get(big, 1) == max(1, int(np.ceil(tot3 / 150)))

    # kNN brute-force exactness over the final survivor set
    la = np.concatenate([lat_u[keep], cl[np.isin(cand, grow)]]) / 1e6
    lo = np.concatenate([lon_u[keep], co[np.isin(cand, grow)]]) / 1e6
    q = pa.table(fixtures.knn_queries(15))
    out = knn.knn_geo(rd.from_arrow(q), idx, concurrency=2).to_pandas()
    qd = q.to_pandas()
    for qi in range(len(qd)):
        sub = out[out["query_id"] == qd["query_id"][qi]].sort_values("rank")
        d = np.sqrt((la - qd["lat"][qi]) ** 2 + (lo - qd["lon"][qi]) ** 2)
        assert np.allclose(np.sort(d)[:len(sub)], sub["dist"].to_numpy(),
                           atol=1e-9), qi


def test_apply_changes_duplicate_upserts_new_partition(ray_session,
                                                       tiny_images,
                                                       tmp_path):
    """Two upserts of the same NEW key in one changelog must land as
    ONE record (last-wins), on both the brand-new-partition path and
    the existing-partition path."""
    ckpt = str(tmp_path / "dupup_idx")
    # a SMALL index leaves most res-4 cells without a partition file,
    # guaranteeing a brand-new-partition route below
    ds = rd.read_parquet(tiny_images, columns=["image_id", "phash"]).limit(60)
    build.build_index(ds, ckpt, res=4, target_rows=100)
    # pick a key routed to a cell with NO existing partition: probe
    # candidates until one's (cell, salt) file is absent
    import os as _os

    from metric_search_ray.pipelines.build import (part_path,
                                                   salt_plan_from_manifest)
    man = build.load_manifest(ckpt)
    plan = salt_plan_from_manifest(man, ckpt)
    pick = None
    for i in range(50_000, 90_000):
        cand = f"img-{i:08d}"
        la, lo = geocode.geocode_image_ids(np.asarray([cand], np.str_))
        c = int(cell.cell_of(la, lo, 4)[0])
        import numpy as _np
        k = plan.get(c, 1)
        key = geocode.key_of_image_id(_np.asarray([cand], _np.str_))
        s = int((geocode.lcg_next(geocode.lcg_next(key) + 9176)
                 % _np.uint64(k))[0]) if k > 1 else 0
        if not _os.path.exists(part_path(ckpt, c, s)):
            pick = cand
            break
    assert pick is not None
    build.apply_changes(pa.table({
        "image_id": pa.array([pick, pick]),
        "phash": pa.array([11, 22], pa.int64()),
        "op": pa.array(["upsert", "upsert"]),
    }), ckpt)
    man2 = build.load_manifest(ckpt)
    hits = []
    for p in man2.column("path").to_pylist():
        t = pq.read_table(p, columns=["image_id", "phash"])
        for iid, ph in zip(t.column("image_id").to_pylist(),
                           t.column("phash").to_pylist()):
            if iid == pick:
                hits.append(ph)
    assert hits == [22]                      # once, last-wins


def test_apply_changes_replace_with_coordinate_twin(ray_session, tmp_path):
    """Ids whose hashed keys collide mod 2^31 geocode identically;
    replacing one must leave exactly one record of it (new phash) and
    the untouched twin intact."""
    a, b = "12345", str(12345 + 2**31)       # identical geotag
    la, lo = geocode.geocode_image_ids(np.asarray([a, b], np.str_))
    assert la[0] == la[1] and lo[0] == lo[1]
    others = [f"img-{i:08d}" for i in range(40)]
    ds = rd.from_arrow(pa.table({
        "image_id": pa.array([a, b] + others),
        "phash": pa.array(np.arange(42, dtype=np.int64)),
    }))
    ckpt = str(tmp_path / "twin_idx")
    build.build_index(ds, ckpt, res=3, target_rows=1000)
    build.apply_changes(pa.table({
        "image_id": pa.array([b]),
        "phash": pa.array([777], pa.int64()),
        "op": pa.array(["upsert"]),
    }), ckpt)
    man = build.load_manifest(ckpt)
    counts = {a: [], b: []}
    for p in man.column("path").to_pylist():
        t = pq.read_table(p, columns=["image_id", "phash"])
        for iid, ph in zip(t.column("image_id").to_pylist(),
                           t.column("phash").to_pylist()):
            if iid in counts:
                counts[iid].append(ph)
    assert counts[b] == [777]                # replaced once, new phash
    assert counts[a] == [0]                  # twin untouched
