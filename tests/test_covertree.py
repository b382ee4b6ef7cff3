"""Ports of the reference's golden tests (tests/test_api.cpp,
tests/test_cluster.cpp, examples/fuzzy_test.cpp, examples/test_balance.cpp)."""

import numpy as np
import pytest

from metric_search_ray.covertree import (
    BadDistributionException,
    CoverTree,
    UnsortedDistributionException,
)
from metric_search_ray.metrics import L2


class AbsDist:
    """distance<int> from the reference tests: |a-b| as int."""

    def __call__(self, a, b):
        return abs(int(a) - int(b))


DATA = [3, 5, -10, 50, 1, -200, 200]


def make_tree(data=DATA):
    t = CoverTree(metric=AbsDist())
    t.insert_many(data)
    return t


def test_insert_covering_each_step():  # test_api.cpp:25-32
    t = CoverTree(metric=AbsDist())
    for d in DATA:
        t.insert(d)
        assert t.check_covering()


def test_insert_batch():  # test_api.cpp:34-39
    assert make_tree().check_covering()


def test_nn():  # test_api.cpp:40-50
    node, d = make_tree().nn(200)
    assert node.data == 200
    assert d == 0


def test_knn_golden_ordering():  # test_api.cpp:52-65
    k1 = make_tree().knn(3, 15)
    assert len(k1) == 7
    assert [n.data for n, _ in k1] == [3, 1, 5, -10, 50, 200, -200]
    dists = [d for _, d in k1]
    assert dists == sorted(dists)


def test_erase():  # test_api.cpp:67-77
    # Stronger than the reference test (which never asserts erase()'s
    # return): our nn is exact, so every erase must find its point,
    # and the tree must end empty.
    t = make_tree()
    for d in DATA:
        assert t.erase(d)
        assert t.check_covering()
    assert t.empty()


def test_erase_root_repeatedly():  # test_api.cpp:79-90
    t = make_tree()
    for _ in range(7):
        root = t.root
        assert t.erase(root.data)
        assert t.check_covering()
    assert t.empty()


def test_insert_if():  # test_api.cpp:92-99 — threshold vs ROOT, which moves
    t = CoverTree(metric=AbsDist())
    t.insert(1)
    assert not t.insert_if(2, 10)
    assert t.insert_if(15, 10)
    assert not t.insert_if(14, 10)
    assert t.insert_if(26, 10)


def test_to_json_goldens():  # test_api.cpp:108-117
    t = CoverTree(metric=AbsDist())
    t.insert(1)
    assert t.to_json() == '{\n"nodes": [\n{ "id":0, "values":1}\n],\n"edges": [\n]}\n'
    t.insert(2)
    assert t.to_json() == (
        '{\n"nodes": [\n{ "id":0, "values":1},\n{ "id":1, "values":2}\n],'
        '\n"edges": [\n{ "source":0, "target":1, "distance":1}\n]}\n'
    )


# ---------------------------------------------------------------- clustering


def test_cluster1():  # test_cluster.cpp:23-47
    t = make_tree([7, 8, 9, 10, 11, 12, 13])
    distribution = [0.1, 0.2, 0.3, 0.5]
    r1 = t.clustering(distribution, IDS=[1, 2, 3], points=[7, 8, 9, 10, 11, 12, 13])
    r2 = t.clustering(distribution, points=[8, 9, 10])
    assert r1 == [[], [1], [0], [2]]
    assert r2 == [[], [1], [0], [2]]


def test_cluster2():  # test_cluster.cpp:49-72
    t = make_tree([7, 8, 9, 10, 11, 12, 13])
    distribution = [0.1, 0.2, 0.3, 0.5]
    r1 = t.clustering(distribution, IDS=[3], points=[7, 8, 9, 10, 11, 12, 13])
    r2 = t.clustering(distribution, points=[10])
    assert r1 == [[], [3], [4], [2]]
    assert r2 == [[], [3], [4], [2]]


def test_cluster3():  # test_cluster.cpp:74-95
    t = make_tree([7, 8, 9, 10, 11, 12, 13])
    distribution = [0.1, 0.2, 0.5, 0.9]
    r1 = t.clustering(distribution, IDS=[3], points=[7, 8, 9, 10, 11, 12, 13])
    r2 = t.clustering(distribution, points=[10])
    assert r1 == [[], [3], [4, 2], [1, 0, 5]]
    assert r2 == [[], [3], [4, 2], [1, 0, 5]]


def test_cluster_exceptions():  # test_cluster.cpp:97-112
    t = make_tree([7, 8, 9, 10, 11, 12, 13])
    bad_unsorted = [0.9, 0.1, 0.2, 0.5, 0.9]
    out_of_range = [0.1, 0.2, 0.5, 0.9, 1, 5]
    ok = [0.1, 0.2, 0.5, 0.9]
    pts = [7, 8, 9, 10, 11, 12, 13]
    with pytest.raises(UnsortedDistributionException):
        t.clustering(bad_unsorted, IDS=[3], points=pts)
    with pytest.raises(UnsortedDistributionException):
        t.clustering(bad_unsorted, points=[10])
    with pytest.raises(BadDistributionException):
        t.clustering(out_of_range, IDS=[3], points=pts)
    with pytest.raises(BadDistributionException):
        t.clustering(out_of_range, points=[10])
    t.clustering(ok, IDS=[3], points=pts)
    t.clustering(ok, points=[10])


# ---------------------------------------------------------------- fuzz / property


def brute_knn(points, metric, q, k):
    d = sorted((metric(p, q), i) for i, p in enumerate(points))
    return d[:k]


def test_fuzz_covering_and_knn_vs_bruteforce():  # fuzzy_test.cpp:36-73 shape
    rng = np.random.default_rng(42)
    metric = L2()
    for trial in range(8):
        n = int(rng.integers(1, 300))
        dim = int(rng.integers(1, 6))
        pts = rng.normal(0, 10, (n, dim))
        t = CoverTree(metric=metric)
        for p in pts:
            t.insert(p)
            assert t.check_covering()
        assert t.size() == n
        # exact knn: neighbor sets AND distances equal to brute force
        for _ in range(5):
            q = rng.normal(0, 10, dim)
            k = min(n, int(rng.integers(1, 8)))
            got = t.knn(q, k)
            expect = brute_knn(pts, metric, q, k)
            np.testing.assert_allclose([d for _, d in got], [d for d, _ in expect],
                                       rtol=1e-10, atol=1e-10)
        # rnn matches brute force (strict <)
        q = rng.normal(0, 10, dim)
        radius = float(rng.uniform(1, 20))
        got_ids = sorted(n_.ID for n_, _ in t.rnn(q, radius))
        exp_ids = sorted(i for i, p in enumerate(pts) if metric(p, q) < radius)
        assert got_ids == exp_ids


def test_adversarial_root_promotion():  # test_balance.cpp:16-33
    t = CoverTree(metric=AbsDist())
    for i in range(20):
        t.insert(2**i)
        assert t.check_covering()
    assert t.size() == 20
    node, d = t.nn(2**10 + 1)
    assert node.data == 2**10 and d == 1


def test_erase_to_empty_fuzz():
    rng = np.random.default_rng(7)
    pts = rng.normal(0, 5, (60, 3))
    t = CoverTree(metric=L2())
    t.insert_many(pts)
    order = rng.permutation(60)
    for i in order:
        assert t.erase(pts[i])
        assert t.check_covering()
    assert t.empty()


# ---------------------------------------------------------------- checkpoint


def test_to_arrays_roundtrip_equality():  # serialize round-trip analogue
    rng = np.random.default_rng(3)
    pts = rng.normal(0, 3, (50, 4))
    t = CoverTree(metric=L2())
    t.insert_many(pts)
    arrays = t.to_arrays()
    t2 = CoverTree.from_arrays(arrays, metric=L2())
    assert t.same_tree(t2)
    assert t2.check_covering()
    # restored tree answers identically
    q = rng.normal(0, 3, 4)
    got = [(n.ID, d) for n, d in t.knn(q, 5)]
    got2 = [(n.ID, d) for n, d in t2.knn(q, 5)]
    assert got == got2


def test_to_vector_sorted_by_id():
    t = make_tree()
    assert t.to_vector() == DATA


def test_introspection():
    t = make_tree()
    assert t.size() == 7
    assert not t.empty()
    assert t.level_size() == t.root.level
    counts = t.print_levels()
    assert sum(counts.values()) == 7
    assert t[0] == 3  # ID 0 was the first insert
    seen = []
    t.traverse(lambda n: seen.append(n.ID))
    assert len(seen) == 7 and seen[0] == t.root.ID
    kids = []
    t.traverse_child(lambda n: kids.append(n.ID))
    assert len(kids) == 6  # all but root


def test_fast_builder_matches_node_tree():
    """build_planar_tree_arrays must be bit-identical to sequential
    CoverTree(PlanarDeg).insert + to_arrays, including promotion-heavy
    and duplicate/tie-heavy inputs."""
    from metric_search_ray.covertree import build_planar_tree_arrays
    from metric_search_ray.metrics import PlanarDeg

    for trial, n in [(1, 300), (2, 1500)]:
        r = np.random.default_rng(trial)
        pts = np.stack([r.uniform(-90, 90, n), r.uniform(-180, 180, n)], axis=1)
        pts[n // 2:n // 2 + 5] = pts[0]          # exact duplicates
        pts[n // 4:n // 4 + 30] = pts[10] + r.normal(0, 1e-4, (30, 2))  # hot cluster
        t = CoverTree(metric=PlanarDeg())
        for p in pts:
            t.insert(p)
        a = t.to_arrays()
        b = build_planar_tree_arrays(pts)
        for k in ("ID", "level", "parent_ID", "parent_dist", "maxdist"):
            assert np.array_equal(a[k], b[k]), k
