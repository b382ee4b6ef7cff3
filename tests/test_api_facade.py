"""MetricIndex facade tests — ports of the n-api vows suite shapes
(n-api/test/test.js:10-241)."""

import numpy as np
import pytest

from metric_search_ray.api import MetricIndex
from metric_search_ray.metrics import Dimension, Edit, L2


def test_scalar_insert_get_nn():  # test.js scalar cases
    idx = MetricIndex(0)  # euclidian
    for v in [1.0, 2.0, 5.0, 9.0]:
        idx.insert(v)
    assert idx.size() == 4
    assert not idx.empty()
    assert idx.get(0) == 1.0
    nn = idx.nn(4.7)
    assert nn["data"] == 5.0
    assert nn["distance"] == pytest.approx(0.3)


def test_vector_knn_shape_and_monotone():  # test.js vector knn
    idx = MetricIndex("euclidian")
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(50, 3))
    idx.insert([p for p in pts])
    out = idx.knn(pts[7], 5)
    assert len(out) == 5
    assert out[0]["distance"] == pytest.approx(0.0)
    dists = [o["distance"] for o in out]
    assert dists == sorted(dists)
    for o in out:
        assert set(o) == {"ID", "level", "data", "parent_dist", "distance"}
    r = idx.rnn(pts[7], 1.0)
    for o in r:
        assert o["distance"] < 1.0


def test_string_records_with_edit_metric():
    idx = MetricIndex(Edit())
    for w in ["kitten", "sitting", "mitten", "bitten"]:
        idx.insert(w)
    nn = idx.nn("fitten")
    assert nn["data"] in {"kitten", "mitten", "bitten"}
    assert nn["distance"] == 1


def test_mixed_kinds_rejected():  # MetricWrapper rejects mixed types
    idx = MetricIndex(0)
    idx.insert(1.0)
    with pytest.raises(TypeError):
        idx.insert("hello")


def test_matrix_records_ssim():
    idx = MetricIndex(7)  # ssim
    rng = np.random.default_rng(1)
    imgs = [rng.integers(0, 255, (16, 16)).astype(float) for _ in range(6)]
    for im in imgs:
        idx.insert(im)
    nn = idx.nn(imgs[2] + 0.01)
    assert nn["ID"] == 2
    assert idx.check_covering()


def test_erase_traverse_levels_json():
    idx = MetricIndex(0)
    idx.insert_many([3, 5, -10, 50, 1, -200, 200])
    seen = []
    idx.traverse(lambda n: seen.append(n["ID"]))
    assert len(seen) == 7
    assert sum(idx.print_levels().values()) == 7
    assert idx.level_size() >= 1
    assert "(" in idx.print()
    assert '"nodes"' in idx.to_json()
    idx.erase(3)
    assert idx.size() == 6
    assert idx.check_covering()
    assert idx.to_vector() == [5, -10, 50, 1, -200, 200]


def test_clustering_through_facade():
    idx = MetricIndex(0)
    idx.insert_many([7, 8, 9, 10, 11, 12, 13])
    r = idx.clustering([0.1, 0.2, 0.3, 0.5], points=[8, 9, 10])
    assert r == [[], [1], [0], [2]]


def test_dimension_metric():
    recs = [{"name": f"r{i}", "vec": np.asarray([float(i), 0.0])} for i in range(10)]
    m = Dimension(lambda r: r["vec"], L2())
    assert m(recs[2], recs[6]) == pytest.approx(4.0)
    np.testing.assert_allclose(m.batch(recs[0], recs), np.arange(10.0))
    # and it drives a tree
    from metric_search_ray.covertree import CoverTree
    t = CoverTree(metric=m)
    for r in recs:
        t.insert(r)
    node, d = t.nn({"name": "q", "vec": np.asarray([4.2, 0.0])})
    assert node.data["name"] == "r4"


def test_emd_facade_auto_grid_matrices():
    # MetricIndex(5) without C=: the facade builds
    # ground_distance_matrix_of_2dgrid from the first record's shape
    # (EMD.cpp:1108 serialization convention), so matrix-kind records
    # insert and query directly.
    from metric_search_ray.metrics import EMD
    rng = np.random.default_rng(4)
    mats = [rng.integers(0, 50, (3, 4)).astype(float) for _ in range(6)]
    idx = MetricIndex(5)
    for m in mats:
        idx.insert(m)  # first insert returns False (root creation parity)
    assert idx.size() == 6
    q = rng.integers(0, 50, (3, 4)).astype(float)
    got = idx.nn(q)
    # oracle: explicit-C EMD over column-major serialization
    C = EMD.ground_distance_matrix_of_2dgrid(cols=4, rows=3)
    emd = EMD(C)
    dists = [emd(q.ravel(order="F"), m.ravel(order="F")) for m in mats]
    assert got["distance"] == pytest.approx(min(dists), rel=1e-12)


def test_emd_facade_auto_grid_shape_mismatch_rejected():
    idx = MetricIndex(5)
    idx.insert(np.ones((3, 4)))
    with pytest.raises(ValueError):
        idx.nn(np.ones((4, 3)))


def test_emd_facade_explicit_C_still_works():
    from metric_search_ray.metrics import EMD
    C = EMD.ground_distance_matrix_of_2dgrid(cols=4, rows=1)
    idx = MetricIndex(5, C=C)
    idx.insert([1.0, 0.0, 0.0, 0.0])
    idx.insert([0.0, 0.0, 0.0, 1.0])
    got = idx.nn([1.0, 0.0, 0.0, 0.0])
    assert got["distance"] == pytest.approx(0.0, abs=1e-12)
