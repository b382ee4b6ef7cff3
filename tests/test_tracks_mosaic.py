"""tile_mosaic (per-tile mean thumbnails) + Douglas-Peucker tracks."""

import numpy as np
import pyarrow as pa
import pytest

from metric_search_ray.pipelines.tracks import (segment_tracks,
                                                simplify_polyline,
                                                simplify_tracks)

rng = np.random.default_rng(23)


# ------------------------------------------------------------------ DP

def test_dp_straight_line_keeps_endpoints_only():
    xy = np.stack([np.linspace(0, 10, 50), np.linspace(0, 5, 50)], axis=1)
    kept = simplify_polyline(xy, eps=1e-9)
    np.testing.assert_array_equal(kept, [0, 49])


def test_dp_keeps_real_corner():
    xy = np.array([[0, 0], [1, 0.001], [2, 0], [2, 1], [2, 2]], float)
    kept = simplify_polyline(xy, eps=0.5)
    assert 2 in kept  # the corner survives
    assert 1 not in kept  # the near-collinear point does not
    assert kept[0] == 0 and kept[-1] == 4


def test_dp_eps_zero_keeps_everything_noncollinear():
    xy = rng.normal(size=(30, 2))
    kept = simplify_polyline(xy, eps=0.0)
    assert len(kept) == 30


def test_dp_matches_recursive_reference():
    def dp_ref(xy, eps):
        # textbook recursive formulation, independently written
        def rec(a, b):
            if b - a < 2:
                return []
            p0, p1 = xy[a], xy[b]
            d = p1 - p0
            l2 = d @ d
            best, bi = -1.0, -1
            for i in range(a + 1, b):
                if l2 == 0:
                    dist = float(np.hypot(*(xy[i] - p0)))
                else:
                    dist = abs(d[0] * (xy[i][1] - p0[1])
                               - d[1] * (xy[i][0] - p0[0])) / np.sqrt(l2)
                if dist > best:
                    best, bi = dist, i
            if best > eps:
                return rec(a, bi) + [bi] + rec(bi, b)
            return []
        return np.array([0] + rec(0, len(xy) - 1) + [len(xy) - 1])

    for trial in range(10):
        n = int(rng.integers(3, 60))
        xy = rng.normal(size=(n, 2)) * 10
        eps = float(rng.uniform(0.1, 5))
        got = simplify_polyline(xy, eps)
        np.testing.assert_array_equal(got, np.sort(dp_ref(xy, eps)))


def test_dp_degenerate_repeated_points():
    xy = np.zeros((5, 2))
    kept = simplify_polyline(xy, eps=0.1)
    np.testing.assert_array_equal(kept, [0, 4])
    assert len(simplify_polyline(np.array([[1.0, 2.0]]), 0.1)) == 1


def test_simplify_tracks_distributed_layout_independent(ray_session):
    import ray.data as rd
    n_tracks, pts = 12, 40
    rows = []
    for t in range(n_tracks):
        path = np.cumsum(rng.normal(size=(pts, 2)), axis=0)
        for i in range(pts):
            rows.append({"track_id": t, "seq": i,
                         "lat": path[i, 1], "lon": path[i, 0]})
    rng.shuffle(rows)  # rows arrive unordered
    ds = rd.from_items(rows).repartition(9)
    out = simplify_tracks(ds, eps=1.0).to_pandas()
    assert set(out["track_id"]) == set(range(n_tracks))
    for t in range(n_tracks):
        g = out[out["track_id"] == t].sort_values("seq")
        full = sorted([r for r in rows if r["track_id"] == t],
                      key=lambda r: r["seq"])
        xy = np.array([[r["lon"], r["lat"]] for r in full])
        want = simplify_polyline(xy, 1.0)
        np.testing.assert_array_equal(g["seq"].to_numpy(), np.sort(np.asarray([r["seq"] for r in full])[want]))
        # kept point count strictly less than input for eps=1 noise walks
        assert 2 <= len(g) <= pts


# ------------------------------------------------------------------ mosaic

def test_segment_tracks_matches_window_oracle(ray_session):
    import duckdb
    import ray.data as rd
    n_tracks, pts_per = 40, 25
    tid = np.repeat(np.arange(n_tracks, dtype=np.int64), pts_per)
    seq = np.tile(np.arange(pts_per, dtype=np.int64), n_tracks)
    lat_u = rng.integers(-89_000_000, 89_000_000, n_tracks * pts_per)
    lon_u = rng.integers(-179_000_000, 179_000_000, n_tracks * pts_per)
    gap2 = int(80_000_000) ** 2
    t = pa.table({"track_id": pa.array(tid), "seq": pa.array(seq),
                  "lat_u": pa.array(lat_u), "lon_u": pa.array(lon_u)})
    # shuffle row order so the sort inside the group is what fixes it
    perm = rng.permutation(len(tid))
    ds = rd.from_arrow(t.take(pa.array(perm))).repartition(6)
    out = (segment_tracks(ds, gap2).to_pandas()
           .sort_values(["track_id", "seq"]).reset_index(drop=True))
    con = duckdb.connect()
    con.register("pts", t.to_pandas())
    want = con.execute(f"""
        WITH st AS (SELECT track_id, seq,
            COALESCE((lat_u - lag(lat_u) OVER w) * (lat_u - lag(lat_u) OVER w)
                   + (lon_u - lag(lon_u) OVER w) * (lon_u - lag(lon_u) OVER w),
                     0) AS step2_u
            FROM pts WINDOW w AS (PARTITION BY track_id ORDER BY seq))
        SELECT track_id, seq, step2_u,
               1 + sum(CASE WHEN step2_u > {gap2} THEN 1 ELSE 0 END)
                   OVER (PARTITION BY track_id ORDER BY seq
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS segment_id
        FROM st ORDER BY track_id, seq
    """).df()
    np.testing.assert_array_equal(out["segment_id"].to_numpy(),
                                  want["segment_id"].to_numpy())
    np.testing.assert_array_equal(out["step2_u"].to_numpy(),
                                  want["step2_u"].to_numpy())
    # every track opens with segment 1, and segments are contiguous
    firsts = out.groupby("track_id").first()
    assert (firsts["segment_id"] == 1).all()
    assert (firsts["step2_u"] == 0).all()


def test_tile_mosaic_matches_serial_replay(ray_session):
    import ray.data as rd
    from metric_search_ray import cell, codecs, geocode
    from metric_search_ray.phash import _resize_batch, to_gray
    from metric_search_ray.pipelines import tiles

    from metric_search_ray import fixtures
    n = 300
    tbl = fixtures.image_table(n)
    ds = rd.from_arrow(tbl).repartition(5)
    out = tiles.tile_mosaic(ds, res=3, thumb=8, concurrency=2)
    # serial replay
    ids = np.asarray(tbl.column("image_id").to_pylist(), object)
    la, lo = geocode.geocode_image_ids(ids)
    tid = cell.tile_of(la, lo, 3)
    pix = codecs.decode_many(tbl.column("bytes").to_pylist(),
                             tbl.column("fmt").to_pylist())
    want: dict = {}
    cnt: dict = {}
    for i, p in enumerate(pix):
        g = to_gray(p)
        th = np.rint(_resize_batch(g[None].astype(np.float64), 8, 8)
                     ).astype(np.int64).reshape(64)
        t = int(tid[i])
        want[t] = want.get(t, np.zeros(64, np.int64)) + th
        cnt[t] = cnt.get(t, 0) + 1
    assert set(out["tile_id"]) == set(want)
    assert out["n_images"].sum() == n
    for _, row in out.iterrows():
        t = int(row["tile_id"])
        assert row["n_images"] == cnt[t]
        np.testing.assert_array_equal(np.asarray(row["pix"]), want[t])


def test_tile_mosaic_mean_in_pixel_range(ray_session):
    import ray.data as rd
    from metric_search_ray import fixtures
    from metric_search_ray.pipelines import tiles
    ds = rd.from_arrow(fixtures.image_table(100))
    out = tiles.tile_mosaic(ds, res=2, thumb=4, concurrency=2)
    for _, row in out.iterrows():
        mean = np.asarray(row["pix"]) / row["n_images"]
        assert (mean >= 0).all() and (mean <= 255).all()
        assert len(mean) == 16
