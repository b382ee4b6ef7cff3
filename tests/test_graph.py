import numpy as np
import pytest

from metric_search_ray import graph


def test_grid4_structure():
    g = graph.grid4(3, 3)
    assert g.get_nodes_number() == 9
    # center node 4 has 4 neighbours; corner 0 has 2
    assert sorted(g.adj[4].tolist()) == [1, 3, 5, 7]
    assert sorted(g.adj[0].tolist()) == [1, 3]


def test_grid8_structure():
    g = graph.grid8(3, 3)
    assert sorted(g.adj[4].tolist()) == [0, 1, 2, 3, 5, 6, 7, 8]
    assert sorted(g.adj[0].tolist()) == [1, 3, 4]


def test_grid6_degree():
    g = graph.grid6(4, 4)
    degs = sorted(len(a) for a in g.adj)
    assert max(degs) == 6  # interior hex nodes
    assert g.get_nodes_number() == 16


def test_paley_is_regular():
    g = graph.paley(13)
    # Paley graph on 13 vertices is 6-regular
    degs = {len(a) for a in g.adj}
    assert degs == {6}
    with pytest.raises(ValueError):
        graph.paley(12)


def test_lps_valid_and_invalid():
    g = graph.lps(11)
    assert g.get_nodes_number() == 11
    assert all(len(a) >= 2 for a in g.adj)
    with pytest.raises(ValueError):
        graph.lps(10)


def test_margulis_torus():
    g = graph.margulis(16)
    assert g.get_nodes_number() == 16
    with pytest.raises(ValueError):
        graph.margulis(15)


def test_random_uniform_seeded():
    g1 = graph.random_uniform(30, 3, seed=7)
    g2 = graph.random_uniform(30, 3, seed=7)
    assert np.array_equal(g1.edges, g2.edges)


def test_get_neighbours_by_depth():
    g = graph.grid4(5, 5)
    hops = g.get_neighbours(12, 2)  # center of 5x5
    assert hops[0] == [12]
    assert sorted(hops[1]) == [7, 11, 13, 17]
    assert sorted(hops[2]) == [2, 6, 8, 10, 14, 16, 18, 22]
    # weighted graphs return empty in the reference; we support bool graphs
    empty = g.get_neighbours(99, 2)
    assert empty == [[], [], []]


def test_connected_components_local():
    edges = [(0, 1), (1, 2), (3, 4), (5, 5), (6, 7), (7, 8), (8, 6)]
    g = graph.Graph(edges, n_nodes=10)
    comps = g.connected_components()
    as_sets = sorted([frozenset(c) for c in comps], key=len, reverse=True)
    assert frozenset({0, 1, 2}) in as_sets
    assert frozenset({3, 4}) in as_sets
    assert frozenset({6, 7, 8}) in as_sets
    assert frozenset({5}) in as_sets  # self-loop dropped -> singleton
    assert frozenset({9}) in as_sets
    assert set(g.largest_connected_component()) in ({0, 1, 2}, {6, 7, 8})


def test_connected_components_ray_matches_local(ray_session):
    import pyarrow as pa
    import ray.data as rd

    rng = np.random.default_rng(3)
    edges = rng.integers(0, 60, (120, 2))
    g = graph.Graph(edges, n_nodes=60)
    expected = {}
    for comp in g.connected_components():
        label = min(comp)
        for n in comp:
            expected[n] = label
    e = g.edges
    ds = rd.from_arrow(pa.table({"src": pa.array(e[:, 0], pa.int64()),
                                 "dst": pa.array(e[:, 1], pa.int64())}))
    out = graph.connected_components_ray(ds, num_partitions=4).to_pandas()
    got = dict(zip(out["node"], out["component"]))
    # distributed CC only sees nodes with edges; isolated nodes excluded
    for n, lbl in got.items():
        assert expected[n] == lbl
    touched = set(e.ravel().tolist())
    assert set(got) == touched


def test_get_neighbours_old_matches_bfs():
    """Legacy DFS variant (graph.cpp:50-109): min depth over all walks
    == BFS depth, so results must be identical per depth (as sets)."""
    g = graph.grid8(5, 5)
    for start in (0, 12, 24):
        a = g.get_neighbours(start, 3)
        b = g.get_neighbours_old(start, 3)
        assert [sorted(x) for x in a] == [sorted(x) for x in b]


def test_random_uniform_weighted():
    """Reference RandomUniform semantics (graph.cpp:671-774): directed,
    per-column constant in-degree with retry, weights in range; dense
    overload fills everything; weighted get_neighbours is the
    reference's stub (empty)."""
    import numpy as np
    g = graph.RandomUniformWeighted(40, 0.5, 2.0, n_connections=3, seed=7)
    assert g.is_valid() and g.get_nodes_number() == 40
    cols, counts = np.unique(g.edges[:, 1], return_counts=True)
    assert len(cols) == 40 and (counts == 3).all()      # exact in-degree
    # distinct rows per column
    for c in cols:
        rows = g.edges[g.edges[:, 1] == c, 0]
        assert len(set(rows.tolist())) == len(rows)
    assert ((g.weights >= 0.5) & (g.weights < 2.0)).all()
    assert g.get_neighbours(0, 2) == []                 # weighted stub parity
    d = graph.RandomUniformWeighted(6, -1.0, 1.0, n_connections=0, seed=3)
    assert len(d.edges) == 36 and len(d.weights) == 36
    assert ((d.weights >= -1.0) & (d.weights < 1.0)).all()
    # determinism
    g2 = graph.RandomUniformWeighted(40, 0.5, 2.0, n_connections=3, seed=7)
    assert np.array_equal(g.edges, g2.edges) and np.array_equal(g.weights, g2.weights)


def test_pagerank_int_matches_numpy_recurrence(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from metric_search_ray import graph as G
    g = G.margulis(144)
    e = np.asarray(g.edges)
    ds = rd.from_arrow(pa.table({"src": pa.array(e[:, 0], pa.int64()),
                                 "dst": pa.array(e[:, 1], pa.int64())}))
    out = (G.pagerank_int(ds, 144, iters=3, num_partitions=2).to_pandas()
           .sort_values("node").reset_index(drop=True))
    scale, N = 10**12, 144
    base = (15 * scale) // (100 * N)
    deg = np.zeros(N, np.int64)
    np.add.at(deg, e[:, 0], 1)
    r = np.full(N, scale // N, np.int64)
    for _ in range(3):
        s = np.zeros(N, np.int64)
        np.add.at(s, e[:, 1], r[e[:, 0]] // deg[e[:, 0]])
        r = base + (85 * s) // 100
    assert out["rank_u"].tolist() == r.tolist()
    assert out["node"].tolist() == list(range(N))


def test_pagerank_int_sink_node(ray_session):
    # a node with no in-edges keeps exactly the base mass
    import pyarrow as pa
    import ray.data as rd

    from metric_search_ray import graph as G
    edges = pa.table({"src": pa.array([0, 1], pa.int64()),
                      "dst": pa.array([1, 0], pa.int64())})
    out = (G.pagerank_int(rd.from_arrow(edges), 3, iters=2, num_partitions=2)
           .to_pandas().sort_values("node"))
    scale, N = 10**12, 3
    base = (15 * scale) // (100 * N)
    assert out[out.node == 2]["rank_u"].iloc[0] == base


def test_triangle_count_matches_bruteforce(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from metric_search_ray import graph as G
    for gen, n in [(G.margulis, 144), (G.grid8, 25)]:
        g = gen(n)
        e = np.asarray(g.edges)
        ds = rd.from_arrow(pa.table({"src": pa.array(e[:, 0], pa.int64()),
                                     "dst": pa.array(e[:, 1], pa.int64())}))
        got = G.triangle_count(ds, num_partitions=2)
        # brute force: adjacency-set triangle enumeration a<b<c
        adj = {i: set(g.adj[i].tolist()) for i in range(g.n)}
        exp = sum(1 for a in range(g.n) for b in adj[a] if b > a
                  for c in adj[a] if c > b and c in adj[b])
        assert got == exp, (gen.__name__, got, exp)


def test_sssp_int_matches_bellman_ford(ray_session):
    """graph.sssp_int == numpy Bellman-Ford after the same number of
    rounds (both the converged case and the exact-R-rounds contract)."""
    import pyarrow as pa
    import ray.data as rd

    from metric_search_ray import graph

    g = graph.margulis(64)
    e = np.asarray(g.edges)
    src = np.concatenate([e[:, 0], e[:, 1]])
    dst = np.concatenate([e[:, 1], e[:, 0]])
    keep = src != dst
    src, dst = src[keep], dst[keep]
    pairs = np.unique(np.stack([src, dst], 1), axis=0)
    src, dst = pairs[:, 0], pairs[:, 1]
    lo, hi = np.minimum(src, dst), np.maximum(src, dst)
    w = (1 + (lo * 31 + hi * 17) % 9).astype(np.int64)
    inf = 10**15

    def bf(rounds):
        d = np.full(64, inf, np.int64)
        d[0] = 0
        for _ in range(rounds):
            cand = np.minimum(d[src] + w, inf)
            new = d.copy()
            np.minimum.at(new, dst, cand)
            d = new
        return d

    ds = rd.from_arrow(pa.table({"src": pa.array(src, pa.int64()),
                                 "dst": pa.array(dst, pa.int64()),
                                 "w": pa.array(w, pa.int64())}))
    for rounds in (2, 8):
        out = (graph.sssp_int(ds, 64, source=0, rounds=rounds, inf=inf)
               .to_pandas().sort_values("node"))
        np.testing.assert_array_equal(out["dist_u"].to_numpy(), bf(rounds))
