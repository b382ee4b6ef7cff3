"""Graph module: generators, BFS neighbourhoods, connected components.

Mirrors the reference's ``metric::graph`` (details/graph.cpp /
details/graph/connected_components.hpp) with an edge-list data model:

- local ``Graph`` over a (src, dst) edge array with adjacency lists —
  ``get_neighbours(index, max_deep)`` is the reference's frontier BFS
  grouped by hop count (graph.cpp:175-242); self-loops dropped at build
  like ``buildEdges`` (graph.cpp:128-160);
- deterministic generators ``grid4/grid6/grid8/paley/lps/margulis/
  random_uniform`` (graph.cpp:317-774).  LPS uses a deterministic
  Miller-Rabin witness set instead of the reference's ``rand()``
  (graph.cpp:571-636) — same accept/reject on every run;
- ``connected_components`` both local (union-find) and distributed:
  iterative min-label propagation over an edge ``ray.data.Dataset``
  (the reference implements "Cracker", Lulli et al. TPDS 2016, itself a
  distributed vertex-pruning algorithm — the groupby-min formulation
  here is the Ray Data-native equivalent;
  connected_components.hpp:203-266).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


# ---------------------------------------------------------------- local graph


class Graph:
    """Boolean adjacency over an edge list; nodes are 0..n-1."""

    def __init__(self, edges: np.ndarray | list[tuple[int, int]], n_nodes: int | None = None,
                 symmetric: bool = True):
        e = np.asarray(edges, np.int64).reshape(-1, 2)
        e = e[e[:, 0] != e[:, 1]]  # drop self-loops (buildEdges, graph.cpp:150)
        if symmetric and len(e):
            # the reference's default matrix type is blaze::SymmetricMatrix
            # (graph.hpp) — setting (i, j) implies (j, i)
            e = np.concatenate([e, e[:, ::-1]])
        n = int(e.max()) + 1 if len(e) else 0
        if n_nodes is not None:
            n = max(n, n_nodes)
        self.n = n
        self.edges = np.unique(e, axis=0) if len(e) else e
        self.adj: list[np.ndarray] = [np.empty(0, np.int64) for _ in range(n)]
        if len(self.edges):
            order = np.lexsort((self.edges[:, 1], self.edges[:, 0]))
            se = self.edges[order]
            starts = np.searchsorted(se[:, 0], np.arange(n))
            ends = np.searchsorted(se[:, 0], np.arange(n) + 1)
            for i in range(n):
                self.adj[i] = se[starts[i]:ends[i], 1]

    def get_nodes_number(self) -> int:
        return self.n

    def is_valid(self) -> bool:
        return self.n > 0

    def get_neighbours(self, index: int, max_deep: int) -> list[list[int]]:
        """Nodes grouped by BFS hop count 0..max_deep (graph.cpp:175-242)."""
        out: list[list[int]] = [[] for _ in range(max_deep + 1)]
        if index >= self.n:
            return out
        seen = np.zeros(self.n, bool)
        seen[index] = True
        out[0] = [index]
        frontier = [index]
        for depth in range(1, max_deep + 1):
            nxt = []
            for u in frontier:
                for v in self.adj[u]:
                    if not seen[v]:
                        seen[v] = True
                        out[depth].append(int(v))
                        nxt.append(int(v))
            frontier = nxt
        return out

    def get_neighbours_old(self, index: int, max_deep: int) -> list[list[int]]:
        """Parity port of the reference's legacy DFS variant
        (graph.cpp:50-109, "left for comparison" there).

        That implementation enumerates EVERY walk of length <= maxDeep
        from the start node and keeps each node's minimum depth seen.
        The minimum over all walks of length <= k is exactly the BFS
        shortest-path depth, so its RESULT equals ``get_neighbours``
        (the reference's own per-depth order is an unordered_map walk —
        unspecified); only its cost differs (exponential vs linear).
        Delegates to the BFS accordingly — re-enacting the walk
        enumeration would reproduce cost, not semantics."""
        return self.get_neighbours(index, max_deep)

    def connected_components(self) -> list[list[int]]:
        """All components, sorted by size descending (parity with
        all_connected_components, connected_components.hpp:241-258)."""
        parent = np.arange(self.n)

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in self.edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        roots = np.asarray([find(i) for i in range(self.n)])
        comps: dict[int, list[int]] = {}
        for i, r in enumerate(roots):
            comps.setdefault(int(r), []).append(i)
        return sorted(comps.values(), key=len, reverse=True)

    def largest_connected_component(self) -> list[int]:
        c = self.connected_components()
        return c[0] if c else []


# ---------------------------------------------------------------- generators


def grid4(width: int, height: int | None = None) -> Graph:
    if height is None:
        s = int(np.sqrt(width))
        if s * s != width:
            raise ValueError("nodesNumber must be a perfect square")
        width = height = s
    i, j = np.mgrid[0:height, 0:width]
    src = (i * width + j).ravel()
    edges = []
    for di, dj in [(-1, 0), (1, 0), (0, -1), (0, 1)]:
        ii, jj = i + di, j + dj
        ok = (ii >= 0) & (ii < height) & (jj >= 0) & (jj < width)
        edges.append(np.stack([src[ok.ravel()], (ii * width + jj).ravel()[ok.ravel()]], 1))
    return Graph(np.concatenate(edges), n_nodes=width * height)


def grid8(width: int, height: int | None = None) -> Graph:
    if height is None:
        s = int(np.sqrt(width))
        if s * s != width:
            raise ValueError("nodesNumber must be a perfect square")
        width = height = s
    i, j = np.mgrid[0:height, 0:width]
    src = (i * width + j).ravel()
    edges = []
    for di in (-1, 0, 1):
        for dj in (-1, 0, 1):
            if di == 0 and dj == 0:
                continue
            ii, jj = i + di, j + dj
            ok = (ii >= 0) & (ii < height) & (jj >= 0) & (jj < width)
            edges.append(np.stack([src[ok.ravel()], (ii * width + jj).ravel()[ok.ravel()]], 1))
    return Graph(np.concatenate(edges), n_nodes=width * height)


def grid6(width: int, height: int | None = None) -> Graph:
    """Hex lattice exactly as the reference lays it out (graph.cpp:382-465):
    4-neighbourhood plus two diagonals chosen by row parity."""
    if height is None:
        s = int(np.sqrt(width))
        if s * s != width:
            raise ValueError("nodesNumber must be a perfect square")
        width = height = s
    edges = []
    for i in range(height):
        odd = i % 2 == 1
        for j in range(width):
            u = i * width + j
            up, down = i > 0, i < height - 1
            left, right = j > 0, j < width - 1
            if up:
                edges.append((u, (i - 1) * width + j))
            if down:
                edges.append((u, (i + 1) * width + j))
            if left:
                edges.append((u, i * width + j - 1))
            if right:
                edges.append((u, i * width + j + 1))
            if not odd and left:
                if up:
                    edges.append((u, (i - 1) * width + j - 1))
                if down:
                    edges.append((u, (i + 1) * width + j - 1))
            if odd and right:
                if up:
                    edges.append((u, (i - 1) * width + j + 1))
                if down:
                    edges.append((u, (i + 1) * width + j + 1))
    return Graph(edges, n_nodes=width * height)


def paley(n: int) -> Graph:
    """Quadratic-residue expander, n prime = 1 mod 4 (graph.cpp:536-562)."""
    if n % 4 != 1:
        raise ValueError("nodesNumber % 4 must be 1")
    ell = (n - 1) // 2
    squares = np.unique((np.arange(ell, dtype=np.int64) ** 2) % n)
    i = np.arange(n, dtype=np.int64)
    edges = np.stack([np.repeat(i, len(squares)),
                      (np.repeat(i, len(squares)) + np.tile(squares, n)) % n], 1)
    return Graph(edges, n_nodes=n)


def _is_prime(n: int) -> bool:
    """Deterministic Miller-Rabin for 64-bit (replaces the reference's
    rand()-seeded version, graph.cpp:571-636, for reproducibility)."""
    if n < 2:
        return False
    for p in (2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37):
        if n % p == 0:
            return n == p
    d, s = n - 1, 0
    while d % 2 == 0:
        d //= 2
        s += 1
    for a in (2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37):
        x = pow(a, d, n)
        if x in (1, n - 1):
            continue
        for _ in range(s - 1):
            x = x * x % n
            if x == n - 1:
                break
        else:
            return False
    return True


def lps(n: int) -> Graph:
    """Ring + modular-inverse expander, n prime (graph.cpp:571-594)."""
    if not _is_prime(n):
        raise ValueError("nodesNumber must be prime")
    edges = [(0, n - 1), (0, 1)]
    for i in range(1, n):
        edges.append((i, i - 1))
        edges.append((i, (i + 1) % n))
        edges.append((i, pow(i, n - 2, n)))
    return Graph(edges, n_nodes=n)


def margulis(n: int) -> Graph:
    """Margulis expander on the sqrt(n) x sqrt(n) torus (graph.cpp:645-665)."""
    s = int(np.sqrt(n))
    if s * s != n:
        raise ValueError("nodesNumber must be a perfect square")
    edges = []
    for i in range(s):
        for j in range(s):
            u = i * s + j
            edges.append((u, ((i + 2 * j) % s) * s + j))
            edges.append((u, i * s + (2 * i + j) % s))
            edges.append((u, i * s + (2 * i + j + 1) % s))
            edges.append((u, ((i + 2 * j + 1) % s) * s + j))
    return Graph(edges, n_nodes=n)


def random_uniform(n: int, n_connections: int, seed: int = 42) -> Graph:
    """Random unweighted graph with ~n_connections out-edges per node,
    seeded (the engine's everyday generator; the reference's weighted
    fill semantics live in RandomUniformWeighted)."""
    rng = np.random.default_rng(seed)
    src = np.repeat(np.arange(n, dtype=np.int64), n_connections)
    dst = rng.integers(0, n, n * n_connections)
    return Graph(np.stack([src, dst], 1), n_nodes=n)


class RandomUniformWeighted:
    """Faithful port of the reference's ``RandomUniform`` weighted graph
    (graph.cpp:671-774): DIRECTED (isSymmetric=false), weighted.

    - ``n_connections > 0``: for every COLUMN, draw rows uniformly with
      retry-on-collision until exactly n_connections distinct entries
      exist, each weighted U(lower, upper) — constant in-degree per
      column, self-loops permitted (the reference writes the matrix
      directly, bypassing buildEdges' self-loop drop).  The reference's
      "empty cell" test is ``weight == 0``, so a drawn weight of
      exactly 0 leaves the cell refillable — quirk preserved.
    - ``n_connections <= 0``: dense total fill, every (row, col) drawn.

    The reference uses an UNSEEDED std::default_random_engine (fixed
    implementation-defined stream); this port keeps the exact
    structure under a seeded numpy Generator instead — same semantics,
    explicit determinism.
    ``get_neighbours`` mirrors the reference's weighted stub (a bare
    ``return {}`` at graph.cpp:52-55): weighted traversal is
    unimplemented there too."""

    def __init__(self, n_nodes: int, lower_bound: float = 0.0,
                 upper_bound: float = 1.0, n_connections: int = 0,
                 seed: int = 1):
        self.n = n_nodes
        rng = np.random.default_rng(seed)
        if n_connections > 0:
            rows, cols, ws = [], [], []
            filled: set[tuple[int, int]] = set()
            for c in range(n_nodes):
                count = 0
                while count < n_connections:
                    r = int(rng.integers(0, n_nodes))
                    if (r, c) not in filled:
                        wt = float(rng.uniform(lower_bound, upper_bound))
                        count += 1
                        if wt == 0.0:
                            # quirk preserved: the reference assigns the 0
                            # and advances count, but its occupancy test is
                            # "weight == 0" — the cell stays refillable and
                            # the column may end under n_connections
                            continue
                        filled.add((r, c))
                        rows.append(r)
                        cols.append(c)
                        ws.append(wt)
                    # else: retry (count--)
            self.edges = np.stack([np.asarray(rows, np.int64),
                                   np.asarray(cols, np.int64)], axis=1)
            self.weights = np.asarray(ws, np.float64)
        else:
            r, c = np.mgrid[0:n_nodes, 0:n_nodes]
            self.edges = np.stack([r.ravel().astype(np.int64),
                                   c.ravel().astype(np.int64)], axis=1)
            self.weights = rng.uniform(lower_bound, upper_bound,
                                       n_nodes * n_nodes)

    def get_nodes_number(self) -> int:
        return self.n

    def is_valid(self) -> bool:
        return self.n > 0

    def get_neighbours(self, index: int, max_deep: int) -> list[list[int]]:
        """Weighted-graph neighbour metric is a stub in the reference
        (graph.cpp:171 returns {}); mirrored."""
        return []


# ------------------------------------------------------- distributed CC


def connected_components_ray(edges_ds, num_partitions: int = 8,
                             max_iters: int = 50):
    """Distributed connected components over a (src, dst) edge Dataset.

    Iterative min-label propagation with label-of-label squaring: each
    round, every node's label becomes the min of (its own label, its
    neighbours' labels, the label of its label).  The neighbour term
    advances one hop per round; the label-of-label term (one extra hash
    join keyed by the current component id) composes the mapping with
    itself, so convergence takes O(log diameter) rounds instead of
    O(diameter).  Each round's shuffles carry one row per edge endpoint
    plus one row per node.  Convergence is detected with a cheap global
    sum(label) aggregate (monotone decreasing).

    Returns a Dataset (node:int64, component:int64) with component =
    min node id of the component, matching the local union-find oracle.

    Raises RuntimeError if max_iters rounds pass without reaching the
    fixpoint — silently returning unconverged labels would be a wrong
    answer (with squaring, 50 rounds covers diameters ~2^50).
    """
    from ray.data.context import DataContext, ShuffleStrategy

    # Pin the sort-based shuffle for this function: the per-round plan
    # holds 2 joins + an aggregate, and under HASH_SHUFFLE each wants
    # its own long-lived aggregator actor pool — on small CPU counts
    # those pools starve each other (observed deadlock).  Every dataset
    # here is materialized inside this call, so the pin can be scoped
    # with a save/restore.
    # Ray captures a DataContext copy on the ROOT dataset; derived
    # datasets inherit it, so pin the strategy on the input dataset's
    # captured context (the global context would be ignored).
    ctx = getattr(edges_ds, "context", None) or DataContext.get_current()
    prev_strategy = ctx.shuffle_strategy
    ctx.shuffle_strategy = ShuffleStrategy.SORT_SHUFFLE_PULL_BASED
    try:
        return _connected_components_ray(edges_ds, num_partitions, max_iters)
    finally:
        ctx.shuffle_strategy = prev_strategy


def _connected_components_ray(edges_ds, num_partitions: int, max_iters: int):
    sym = edges_ds.map_batches(
        lambda b: pa.table({
            "node": pa.array(np.concatenate([b.column("src").to_numpy(),
                                             b.column("dst").to_numpy()]), pa.int64()),
            "nbr": pa.array(np.concatenate([b.column("dst").to_numpy(),
                                            b.column("src").to_numpy()]), pa.int64()),
        }), batch_format="pyarrow").materialize()  # reused every round

    # per-node min reductions run through fastagg.sort_block_aggregate:
    # #groups == #nodes, where Ray's built-in aggregate pays per-group
    # Python overhead every round
    from .pipelines.fastagg import sort_block_aggregate

    # The trailing repartition (here and per round below) is load-bearing
    # twice over: it stops per-round block-count growth (union + sort
    # otherwise compound blocks every iteration), and it removes EMPTY
    # blocks, which trigger a Ray 2.49 hash-shuffle join bug — if the
    # first block a join side submits is empty, _shuffle_block returns
    # before the schema broadcast, and rowless partitions then fail in
    # acero with "No match for FieldRef" (hash_shuffle.py:223-258).
    labels = sort_block_aggregate(
        sym, "node", {"mn": ("nbr", "min")}).map_batches(
        lambda b: pa.table({
            "node": b.column("node"),
            "component": pa.compute.min_element_wise(b.column("node"), b.column("mn")),
        }), batch_format="pyarrow").repartition(
        num_partitions).materialize()  # consumed 3x per round

    prev_sum = None
    for it in range(max_iters):
        # Right side of both joins: labels keyed by node, with columns
        # renamed so neither join has a name conflict.  Distinct names
        # sidestep the suffix-rename path entirely, and a renamed COPY
        # avoids a self-join of one dataset object with itself — both
        # were observed to nondeterministically corrupt the join-side
        # schema ("No match or multiple matches for FieldRef") in the
        # hash-shuffle finalize.
        rlab = labels.map_batches(
            lambda b: pa.table({"rnode": b.column("node"),
                                "rcomp": b.column("component")}),
            batch_format="pyarrow")
        # propagate: neighbour labels via hash join on the edge list
        prop = sym.join(rlab, join_type="inner", num_partitions=num_partitions,
                        on=("nbr",), right_on=("rnode",))
        prop = prop.map_batches(
            lambda b: pa.table({"node": b.column("node"),
                                "component": b.column("rcomp")}),
            batch_format="pyarrow")
        # squaring: label-of-label — join labels to itself on component=node
        sq = labels.join(rlab, join_type="inner", num_partitions=num_partitions,
                         on=("component",), right_on=("rnode",))
        sq = sq.map_batches(
            lambda b: pa.table({"node": b.column("node"),
                                "component": b.column("rcomp")}),
            batch_format="pyarrow")
        cand = prop.union(labels).union(sq)
        labels = sort_block_aggregate(
            cand, "node", {"component": ("component", "min")}).repartition(
            num_partitions).materialize()
        s = labels.sum("component")
        if s == prev_sum:
            return labels
        prev_sum = s
    raise RuntimeError(
        f"connected_components_ray did not converge in {max_iters} rounds; "
        "raise max_iters (labels would be wrong if returned)")


def pagerank_int(edges_ds, n_nodes: int, iters: int = 5,
                 scale: int = 10**12, num_partitions: int = 4):
    """Deterministic integer fixed-point PageRank (damping 0.85):

        r_0(v)    = scale // N
        r_{t+1}(v) = (15*scale)//(100*N) + (85 * S_t(v)) // 100
        S_t(v)    = sum over edges (u -> v) of  r_t(u) // outdeg(u)

    All arithmetic is int64 floor division, so the result is exact,
    order-independent, and replayable in SQL — the usual float
    PageRank can never hash-match an oracle because per-node float
    sums depend on reduction order.  Iterative shape follows the CC
    learnings: per-round hash joins against a materialized edge table,
    labels materialized + repartitioned each round to bound block
    growth.  Shuffle cost per round: one join on src + one grouped sum
    on dst (both hash exchanges on the edge set).
    """
    import pyarrow as pa
    import ray.data as rd

    from .pipelines.fastagg import sort_block_aggregate

    outdeg = sort_block_aggregate(edges_ds, "src", {"deg": (None, "count")})
    edeg = (edges_ds.join(outdeg, join_type="inner",
                          num_partitions=num_partitions, on=("src",))
            .materialize())
    base = (15 * scale) // (100 * n_nodes)
    nodes = rd.from_arrow(pa.table({
        "node": pa.array(np.arange(n_nodes), pa.int64())})).repartition(2)
    ranks = rd.from_arrow(pa.table({
        "node": pa.array(np.arange(n_nodes), pa.int64()),
        "rank_u": pa.array(np.full(n_nodes, scale // n_nodes), pa.int64()),
    })).repartition(num_partitions)

    for _ in range(iters):
        contrib = (edeg.join(ranks, join_type="inner",
                             num_partitions=num_partitions,
                             on=("src",), right_on=("node",))
                   .map_batches(
                       lambda b: pa.table({
                           "dst": b.column("dst"),
                           "c": pa.array(
                               b.column("rank_u").to_numpy()
                               // b.column("deg").to_numpy(), pa.int64())}),
                       batch_format="pyarrow"))
        sums = sort_block_aggregate(contrib, "dst", {"s": ("c", "sum")})
        joined = nodes.join(sums.repartition(num_partitions),
                            join_type="left_outer",
                            num_partitions=num_partitions,
                            on=("node",), right_on=("dst",))

        def apply(b: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            # fill nulls (left-outer misses) in ARROW, never via a
            # float64 round-trip — sums above 2^53 must stay exact
            s = pc.fill_null(b.column("s"), 0).to_numpy(
                zero_copy_only=False).astype(np.int64)
            return pa.table({
                "node": b.column("node"),
                "rank_u": pa.array(base + (85 * s) // 100, pa.int64()),
            })

        ranks = (joined.map_batches(apply, batch_format="pyarrow")
                 .materialize().repartition(num_partitions))
    return ranks


def sssp_int(edges_ds, n_nodes: int, source: int = 0, rounds: int = 6,
             weight_col: str = "w", inf: int = 10**15,
             num_partitions: int = 4):
    """Integer-weight single-source shortest paths, exactly ``rounds``
    Bellman-Ford relaxation rounds (distributed; an operator the
    reference's graph module lacks — its getNeighbours is hop-count
    BFS only, details/graph.cpp:175-242):

        d_0(v)     = 0 if v == source else inf
        d_{t+1}(v) = min(d_t(v), min over edges (u -> v) of d_t(u) + w)

    All arithmetic is int64 min/plus, so the after-exactly-R-rounds
    result is exact and replayable in SQL via R unrolled CTE rounds
    (the pagerank_int trick) whether or not it has converged; with
    rounds >= graph diameter it IS the shortest-path distance.
    Shuffle cost per round: one hash join on src + one grouped min on
    dst — the same two-exchange shape as pagerank_int; distances are
    materialized + repartitioned per round (bounds block growth,
    avoids the Ray 2.49 empty-first-block join flake)."""
    import pyarrow as pa
    import ray.data as rd

    from .pipelines.fastagg import sort_block_aggregate

    edges = edges_ds.materialize()
    d0 = np.full(n_nodes, inf, np.int64)
    d0[source] = 0
    nodes = rd.from_arrow(pa.table({
        "node": pa.array(np.arange(n_nodes), pa.int64())})).repartition(2)
    dist = rd.from_arrow(pa.table({
        "node": pa.array(np.arange(n_nodes), pa.int64()),
        "dist_u": pa.array(d0, pa.int64()),
    })).repartition(num_partitions)

    for _ in range(rounds):
        relax = (edges.join(dist, join_type="inner",
                            num_partitions=num_partitions,
                            on=("src",), right_on=("node",))
                 .map_batches(
                     lambda b: pa.table({
                         "dst": b.column("dst"),
                         "cand": pa.array(np.minimum(
                             b.column("dist_u").to_numpy()
                             + b.column(weight_col).to_numpy(), inf),
                             pa.int64())}),
                     batch_format="pyarrow"))
        best = sort_block_aggregate(relax, "dst", {"m": ("cand", "min")})
        joined = dist.join(best.repartition(num_partitions),
                           join_type="left_outer",
                           num_partitions=num_partitions,
                           on=("node",), right_on=("dst",))

        def apply(b: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            m = pc.fill_null(b.column("m"), inf).to_numpy(
                zero_copy_only=False).astype(np.int64)
            return pa.table({
                "node": b.column("node"),
                "dist_u": pa.array(np.minimum(
                    b.column("dist_u").to_numpy(), m), pa.int64()),
            })

        dist = (joined.map_batches(apply, batch_format="pyarrow")
                .materialize().repartition(num_partitions))
    return dist


def triangle_count(edges_ds, num_partitions: int = 4):
    """Distributed triangle count via the wedge-join algorithm:

    1. canonicalize: every undirected edge once as (lo, hi), lo < hi
       (dedupe through one fastagg exchange);
    2. wedges: group edges by their low endpoint; each group emits its
       neighbor PAIRS (v < w) — a vectorized triu expansion;
    3. join wedges against the canonical edge set on (v, w): a wedge
       closed by an edge is exactly one triangle (each triangle is
       counted once: at its smallest vertex).

    Scale notes: wedge count is sum(deg_lo^2) — the classic skew knob;
    for power-law graphs orient by DEGREE (not id) before step 2 to
    bound per-node wedges at O(sqrt(m)); id orientation is kept here
    because the engine's graphs are near-regular and id order is what
    the SQL oracle can replay exactly.  Returns the scalar count.
    """
    import pyarrow.compute as pc
    import ray.data as rd

    from .pipelines.fastagg import sort_block_aggregate

    def canon(b: pa.Table) -> pa.Table:
        s = b.column("src").to_numpy()
        d = b.column("dst").to_numpy()
        keep = s != d
        lo = np.minimum(s[keep], d[keep])
        hi = np.maximum(s[keep], d[keep])
        return pa.table({"lo": pa.array(lo, pa.int64()),
                         "hi": pa.array(hi, pa.int64())})

    und = sort_block_aggregate(
        edges_ds.map_batches(canon, batch_format="pyarrow",
                             zero_copy_batch=True),
        ["lo", "hi"], {"_n": (None, "count")})

    def wedges(g: pa.Table) -> pa.Table:
        nb = np.sort(g.column("hi").to_numpy())
        i, j = np.triu_indices(len(nb), k=1)
        return pa.table({"a": pa.array(nb[i], pa.int64()),
                         "b": pa.array(nb[j], pa.int64())})

    w = (und.groupby("lo").map_groups(wedges, batch_format="pyarrow")
         .repartition(num_partitions))
    closed = w.join(und.repartition(num_partitions), join_type="inner",
                    num_partitions=num_partitions,
                    on=("a", "b"), right_on=("lo", "hi"))
    return closed.count()
