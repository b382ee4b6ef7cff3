import numpy as np
import pyarrow as pa
import pytest

from metric_search_ray.matrixdist import DistanceMatrix, grouped_pairwise, pairwise_long
from metric_search_ray.metrics import L2


def test_distance_matrix_parity():
    rng = np.random.default_rng(0)
    recs = rng.normal(size=(20, 3))
    m = DistanceMatrix(recs, L2())
    assert m.size() == 20
    for i in range(0, 20, 5):
        for j in range(0, 20, 7):
            assert m(i, j) == pytest.approx(np.linalg.norm(recs[i] - recs[j]))
            assert m(i, j) == m(j, i)
    np.testing.assert_array_equal(m[3], recs[3])


def test_pairwise_long_upper_triangle():
    recs = np.asarray([[0.0], [3.0], [7.0]])
    t = pairwise_long(recs, L2(), ids=["a", "b", "c"])
    rows = set(zip(t["id_i"].to_pylist(), t["id_j"].to_pylist(), t["dist"].to_pylist()))
    assert rows == {("a", "b", 3.0), ("a", "c", 7.0), ("b", "c", 4.0)}


def test_grouped_pairwise_ray(ray_session):
    import ray.data as rd
    rng = np.random.default_rng(1)
    n = 40
    tbl = pa.table({
        "grp": pa.array(rng.integers(0, 4, n), pa.int64()),
        "x": pa.array(rng.normal(size=n), pa.float64()),
        "y": pa.array(rng.normal(size=n), pa.float64()),
        "rid": pa.array([f"r{i}" for i in range(n)], pa.string()),
    })
    out = grouped_pairwise(rd.from_arrow(tbl), "grp", ["x", "y"], L2(),
                           id_col="rid").to_pandas()
    df = tbl.to_pandas()
    for g, sub in df.groupby("grp"):
        k = len(sub)
        assert (out["grp"] == g).sum() == k * (k - 1) // 2
    # spot check one value
    row = out.iloc[0]
    a = df[df["rid"] == row["id_i"]][["x", "y"]].to_numpy()[0]
    b = df[df["rid"] == row["id_j"]][["x", "y"]].to_numpy()[0]
    assert row["dist"] == pytest.approx(np.linalg.norm(a - b))


def test_clustering_pipeline(ray_session, tiny_images, tmp_path_factory):
    import ray.data as rd
    from metric_search_ray.pipelines import build, cluster

    ckpt = str(tmp_path_factory.mktemp("cl"))
    ds = rd.read_parquet(tiny_images, columns=["image_id", "phash"])
    build.build_index(ds, ckpt, res=3, target_rows=2000)
    buckets = cluster.clustering(ckpt, [0.0, 0.001, 0.01, 0.05],
                                 center=(40.7, -74.0))
    assert len(buckets) == 4
    sizes = [len(b) for b in buckets]
    assert sizes[0] == 0
    assert sum(sizes) > 0
    # all returned ids are distinct
    flat = [i for b in buckets for i in b]
    assert len(flat) == len(set(flat))
    # distributed per-partition clustering covers partitions
    out = cluster.cluster_all_partitions(ckpt, [0.0, 0.5, 1.0]).to_pandas()
    assert out["bucket"].isin([0, 1, 2]).all()
    assert len(out) > 0
