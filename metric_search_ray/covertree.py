"""Cover tree with the reference's exact semantics, pure Python + numpy.

Faithful reimplementation (not a copy) of the reference cover tree
(/root/reference/details/tree.cpp).  Per-partition instances of this
tree are the engine's index payload: one tree per (geo cell, salt)
partition, built inside `groupby().map_groups` / actor-pool stages and
checkpointed as Arrow node tables (see pipelines/build.py).

Ported semantics, with reference file:line for parity checks:

- base = 2; ``covdist(node) = base^level`` (tree.cpp:197-200),
  ``sepdist = 2*base^(level-1)`` declared-but-advisory (tree.cpp:203-206).
- ``insert``: new node gets ID = N++ at level 0 (tree.cpp:391-401);
  **root promotion** when ``dist(root,x) > covdist(root)``: while
  ``dist > base*covdist/(base-1)`` re-root at the last leaf (following
  ``children.back()``), else bump the root level; finally the new point
  becomes the root one level above (tree.cpp:414-452).
- ``insert_``: children sorted by distance (tree.cpp:335-351); descend
  into the first covering child, else attach as new child at
  ``p.level-1`` (tree.cpp:1104-1131).  The textbook rebalance variant
  exists in the reference but is disabled (tree.cpp:1130) — not ported.
- ``nn/knn/rnn`` pruned DFS (tree.cpp:591-735); knn keeps a sorted
  k-list with upper-bound insertion; rnn is strict ``dist < radius``.
  DELIBERATE FIX vs the reference: its pruning bound uses
  ``child.parent_dist`` as a subtree radius (tree.cpp:624/686/732),
  which is unsound — the reference's knn can miss true neighbors (its
  tests only pin a 7-point golden).  We maintain a true ``maxdist``
  (max distance to any descendant, updated along insert descent paths)
  and prune with ``best > d(child,q) - child.maxdist``, making all
  searches brute-force-exact as the target rule requires.
- ``erase``: exact-match delete via nn, root re-rooting at any leaf,
  orphan re-insertion at root (tree.cpp:526-582).
- ``insert_if``: novelty filter — threshold compares the distance to
  the ROOT, not to the nearest neighbor (tree.cpp:358-377).
- ``check_covering`` invariant verifier (tree.cpp:842-870).
- ``clustering`` distribution-quantile neighborhoods incl. the
  reference's exact bucket-walk quirks (tree.cpp:1200-1430).
- ``to_json`` node/edge export in the reference's traverse order
  (tree.cpp:1459-1506; traverse at 943-961 is a LIFO stack, so children
  are visited last-first — preserved because the reference's golden
  JSON tests depend on it).

Determinism contract: tree shape depends on insertion order
(batch ctor tree.cpp:304-322); the engine sorts partition rows by
image_id before building so N-vs-4N runs produce identical indexes.
"""

from __future__ import annotations

import sys
from typing import Callable

import numpy as np

from .metrics import L2


class UnsortedDistributionException(Exception):
    """Reference: unsorted_distribution_exception (details/tree.hpp:43)."""


class BadDistributionException(Exception):
    """Reference: bad_distribution_exception (details/tree.hpp:44)."""


class Node:
    __slots__ = ("data", "level", "parent", "children", "parent_dist", "ID", "maxdist", "_cmat")

    def __init__(self, data=None, level=0, parent=None, parent_dist=0.0, ID=0,
                 maxdist=0.0):
        self.data = data
        self.level = level
        self.parent = parent
        self.children: list[Node] = []
        self.parent_dist = parent_dist
        self.ID = ID
        self._cmat = None  # cached stacked children coords (hot-path)
        # Upper bound on dist(self, any descendant).  The reference prunes
        # with child.parent_dist in this role (tree.cpp:624/686/732 and the
        # comment at tree.cpp:86), which is NOT a valid subtree radius — its
        # knn can miss true neighbors (its own tests only pin a 7-point
        # golden).  The target rule requires brute-force equality, so we
        # maintain a sound bound instead: updated along the insert descent
        # path at zero extra distance computations.
        self.maxdist = maxdist

    def covdist(self, base: float = 2.0) -> float:
        return float(base**self.level)

    def sepdist(self, base: float = 2.0) -> float:
        return float(2 * base ** (self.level - 1))

    def __repr__(self):  # debug only
        return f"Node(ID={self.ID}, level={self.level}, n_children={len(self.children)})"


def _is_distribution_ok(distribution) -> None:
    """Validation quirks preserved: element 0's range is unchecked
    (tree.cpp:1341-1353)."""
    if len(distribution) == 0:
        return
    d0 = distribution[0]
    for d in distribution[1:]:
        if d < d0:
            raise UnsortedDistributionException(distribution)
        if d < 0.0 or d > 1.0:
            raise BadDistributionException(distribution)
        d0 = d


class CoverTree:
    base = 2.0

    def __init__(self, points=None, truncate: int = -1, metric: Callable = None):
        self.metric = metric if metric is not None else L2()
        self.root: Node | None = None
        self.truncate_level = truncate
        self.N = 0
        self.min_scale = 1000
        self.max_scale = 0
        self._by_id: dict[int, Node] = {}
        if points is not None:
            for p in points:
                self.insert(p)

    # ------------------------------------------------------------ basics

    def dist(self, a, b):
        """Raw metric value — NOT coerced to float: the reference's
        Distance type is whatever the metric returns (details/tree.hpp:68),
        and the to_json golden prints integer distances without decimals."""
        return self.metric(a, b)

    def size(self) -> int:
        return self.N

    def empty(self) -> bool:
        return self.root is None

    def level_size(self) -> int:
        """Root level == max level (tree.cpp:810-814)."""
        return self.root.level

    def _child_dists(self, p: Node, x) -> np.ndarray:
        """Distances from each child of p to record x, vectorized when the
        metric supports batching over stacked child data.  The stacked
        children array is cached on the node (invalidated by every
        children mutation) — it dominates insert/search cost otherwise."""
        ch = p.children
        if not ch:
            return np.empty(0)
        batch = getattr(self.metric, "batch", None)
        if batch is not None:
            try:
                cm = p._cmat
                if cm is None:
                    cm = np.asarray([c.data for c in ch])
                    p._cmat = cm
                return np.asarray(batch(x, cm), np.float64)
            except (TypeError, ValueError):
                p._cmat = None
        return np.asarray([self.dist(c.data, x) for c in ch], np.float64)

    def _sorted_children(self, p: Node, x) -> tuple[np.ndarray, np.ndarray]:
        """(sorted child indices, per-child distances) — tree.cpp:335-351.
        Stable sort matches std::sort's effect on the goldens here."""
        dists = self._child_dists(p, x)
        return np.argsort(dists, kind="stable"), dists

    # ------------------------------------------------------------ insert

    def insert(self, x) -> bool:
        node = Node(data=x, level=0, parent=None, parent_dist=0.0, ID=self.N)
        self.N += 1
        self._by_id[node.ID] = node
        if self.root is None:
            self.root = node
            return False
        self.root = self._insert_entry(self.root, node)
        return True

    def insert_many(self, points) -> bool:
        for p in points:
            self.insert(p)
        return True

    def insert_if(self, p, threshold: float) -> bool:
        """Insert only if dist(ROOT, p) > threshold (tree.cpp:358-377)."""
        if self.root is None:
            self.insert(p)
            return True
        if self.dist(self.root.data, p) > threshold:
            self.insert(p)
            return True
        return False

    def insert_if_many(self, points, threshold: float) -> int:
        return sum(1 for p in points if self.insert_if(p, threshold))

    def _insert_entry(self, p: Node, x: Node) -> Node:
        """tree.cpp:414-458 — root promotion or recursive descent."""
        b = self.base
        d_px = self.dist(p.data, x.data)
        if d_px > p.covdist(b):
            while self.dist(p.data, x.data) > b * p.covdist(b) / (b - 1):
                current, par = p, None
                while current.children:
                    par = current
                    current = current.children[-1]
                if par is not None:
                    par.children.pop()
                    par._cmat = None
                    current.level = p.level + 1
                    current.children.append(p)
                    current._cmat = None
                    p.parent = current
                    p.parent_dist = self.dist(p.data, current.data)
                    current.maxdist = max(current.maxdist, p.parent_dist + p.maxdist)
                    p = current
                    p.parent = None
                    p.parent_dist = 0.0
                else:
                    p.level += 1
            x.level = p.level + 1
            x.parent = None
            x.children.append(p)
            x._cmat = None
            p.parent_dist = self.dist(p.data, x.data)
            p.parent = x
            x.maxdist = p.parent_dist + p.maxdist
            self.max_scale = x.level
            return x
        return self._insert_(p, x, d_px)

    def _insert_(self, p: Node, x: Node, d_px=None) -> Node:
        """Nearest-ancestor descent (tree.cpp:1104-1131), iterative to
        avoid Python recursion limits on degenerate chains.  Maintains the
        sound ``maxdist`` subtree-radius bound along the descent path."""
        if d_px is None:
            d_px = self.dist(p.data, x.data)
        while True:
            p.maxdist = max(p.maxdist, d_px + x.maxdist)
            idx, dists = self._sorted_children(p, x.data)
            descended = False
            for qi in idx:
                q = p.children[qi]
                if dists[qi] <= q.covdist(self.base):
                    p = q
                    d_px = dists[qi]
                    descended = True
                    break
            if not descended:
                p.children.append(x)
                p._cmat = None
                x.parent = p
                x.parent_dist = d_px
                x.level = p.level - 1
                # climb back to the subtree root we were called with
                top = p
                while top.parent is not None:
                    top = top.parent
                return top

    # ------------------------------------------------------------ search

    def nn(self, p) -> tuple[Node, float]:
        """Exact nearest neighbor (tree.cpp:591-627). Returns (node, dist)."""
        best = [self.root, self.dist(self.root.data, p)]
        self._nn_(self.root, best[1], p, best)
        return best[0], best[1]

    def _nn_(self, current: Node, dist_current: float, p, best: list) -> None:
        if dist_current < best[1]:
            best[0], best[1] = current, dist_current
        idx, dists = self._sorted_children(current, p)
        for ci in idx:
            child = current.children[ci]
            if best[1] > dists[ci] - child.maxdist:
                self._nn_(child, dists[ci], p, best)

    def knn(self, p, k: int = 10) -> list[tuple[Node, float]]:
        """Exact k-NN, sorted ascending (tree.cpp:635-690)."""
        nn_list: list[tuple[Node | None, float]] = [(None, np.inf)] * k
        n_found = self._knn_(self.root, self.dist(self.root.data, p), p, nn_list, 0)
        if n_found < k:
            nn_list = nn_list[:n_found]
        return nn_list

    def _knn_(self, current, dist_current, p, nn_list, n_found) -> int:
        if dist_current < nn_list[-1][1]:
            # upper-bound insertion keeps first-seen order among ties
            lo, hi = 0, len(nn_list)
            while lo < hi:
                mid = (lo + hi) // 2
                if nn_list[mid][1] <= dist_current:
                    lo = mid + 1
                else:
                    hi = mid
            nn_list.insert(lo, (current, dist_current))
            nn_list.pop()
            n_found += 1
        idx, dists = self._sorted_children(current, p)
        for ci in idx:
            child = current.children[ci]
            if nn_list[-1][1] > dists[ci] - child.maxdist:
                n_found = self._knn_(child, dists[ci], p, nn_list, n_found)
        return n_found

    def rnn(self, p, radius: float = 1.0) -> list[tuple[Node, float]]:
        """All nodes with dist < radius, strict (tree.cpp:698-735)."""
        out: list[tuple[Node, float]] = []
        self._rnn_(self.root, self.dist(self.root.data, p), p, radius, out)
        return out

    def _rnn_(self, current, dist_current, p, radius, out) -> None:
        if dist_current < radius:
            out.append((current, dist_current))
        idx, dists = self._sorted_children(current, p)
        for ci in idx:
            child = current.children[ci]
            if radius > dists[ci] - child.maxdist:
                self._rnn_(child, dists[ci], p, radius, out)

    # ------------------------------------------------------------ erase

    def _find_any_leaf(self) -> Node:
        current = self.root
        while current.children:
            current = current.children[-1]
        return current

    def erase(self, p) -> bool:
        """Exact-point delete (tree.cpp:526-582).

        DELIBERATE FIX vs the reference: it re-inserts orphan SUBTREES
        wholesale (tree.cpp:570-575), which can leave covering violations
        once erase actually removes interior nodes (masked there because
        its unsound nn pruning usually fails to find the exact node and
        erase silently no-ops).  We detach the node and re-insert each
        orphan RECORD individually with its original ID, so the covering
        invariant holds by construction — the property the reference's
        own fuzz test intends to pin (examples/fuzzy_test.cpp:36-73).
        """
        if self.root is None:
            return False
        node, d = self.nn(p)
        if d > 0.0:
            return False
        # collect orphan records (everything below the erased node)
        orphans: list[tuple[int, object]] = []
        stack = list(node.children)
        while stack:
            c = stack.pop()
            orphans.append((c.ID, c.data))
            stack.extend(c.children)
        orphans.sort()  # re-insert in original insertion order (determinism)
        if node is self.root:
            self.root = None
        else:
            parent = node.parent
            i = parent.children.index(node)
            parent.children[i] = parent.children[-1]
            parent.children.pop()
            parent._cmat = None
        self._by_id.pop(node.ID, None)
        self.N -= 1
        for rid, data in orphans:
            n = Node(data=data, level=0, ID=rid)
            self._by_id[rid] = n
            if self.root is None:
                self.root = n
            else:
                self.root = self._insert_entry(self.root, n)
        return True

    # ------------------------------------------------------------ introspection

    def traverse(self, f: Callable[[Node], None]) -> None:
        """LIFO-stack DFS — children visited last-first, preserving the
        reference's golden to_json order (tree.cpp:943-961)."""
        if self.root is None:
            return
        stack = [self.root]
        while stack:
            cur = stack.pop()
            f(cur)
            for child in cur.children:
                stack.append(child)

    def traverse_child(self, f: Callable[[Node], None]) -> None:
        if self.root is None:
            return
        stack = [self.root]
        while stack:
            cur = stack.pop()
            for child in cur.children:
                stack.append(child)
                f(child)

    def to_vector(self) -> list:
        """All records sorted by insertion ID (tree.cpp:755-783)."""
        out = []
        self.traverse(lambda n: out.append((n.ID, n.data)))
        out.sort(key=lambda t: t[0])
        return [d for _, d in out]

    def get(self, ID: int) -> Node:
        return self._by_id[ID]

    def __getitem__(self, ID: int):
        return self._by_id[ID].data

    def print_levels(self) -> dict[int, int]:
        counts: dict[int, int] = {}
        self.traverse(lambda n: counts.__setitem__(n.level, counts.get(n.level, 0) + 1))
        return counts

    def print_str(self) -> str:
        """ASCII tree art equivalent of print() (tree.cpp:873-940)."""
        lines: list[str] = []

        def rec(node: Node, depth: str):
            lines.append(f"({node.ID})")
            for i, child in enumerate(node.children):
                last = i == len(node.children) - 1
                lines.append(depth + (" └──" if last else " ├──"))
                pre = len(lines) - 1
                sub_depth = depth + ("    " if last else " |  ")
                rec_lines_start = len(lines)
                rec(child, sub_depth)
                # splice the child's first line onto the branch stub
                lines[pre] = lines[pre] + lines[rec_lines_start]
                del lines[rec_lines_start]

        if self.root is None:
            return "Empty tree"
        rec(self.root, "")
        return "\n".join(lines)

    def check_covering(self) -> bool:
        """Covering invariant: dist(parent, child) <= covdist(parent) for
        every edge (tree.cpp:842-870)."""
        if self.root is None:
            return True
        stack = [self.root]
        ok = True
        while stack:
            cur = stack.pop()
            for child in cur.children:
                stack.append(child)
                if self.dist(cur.data, child.data) > cur.covdist(self.base):
                    ok = False
        return ok

    # ------------------------------------------------------------ checkpoint

    def to_arrays(self) -> dict[str, np.ndarray]:
        """Preorder node table — the engine's checkpoint format.

        Replaces the reference's preorder-with-sentinels serialize
        (tree.cpp:1014-1040): a ``parent_ID`` column carries the
        structure; preorder row order preserves sibling order so
        ``from_arrays`` rebuilds an identical tree (operator== parity,
        tree.cpp:1081-1102).
        """
        ids, levels, parent_ids, pdists, maxds, datas = [], [], [], [], [], []
        if self.root is not None:
            stack = [self.root]
            while stack:
                cur = stack.pop()
                ids.append(cur.ID)
                levels.append(cur.level)
                parent_ids.append(cur.parent.ID if cur.parent is not None else -1)
                pdists.append(cur.parent_dist)
                maxds.append(cur.maxdist)
                datas.append(cur.data)
                for child in reversed(cur.children):  # preorder, children in order
                    stack.append(child)
        return {
            "ID": np.asarray(ids, np.int64),
            "level": np.asarray(levels, np.int64),
            "parent_ID": np.asarray(parent_ids, np.int64),
            "parent_dist": np.asarray(pdists, np.float64),
            "maxdist": np.asarray(maxds, np.float64),
            "data": np.asarray(datas) if datas else np.empty((0,)),
        }

    @classmethod
    def from_arrays(cls, arrays: dict, metric=None, truncate: int = -1,
                    next_id: int | None = None) -> "CoverTree":
        t = cls(metric=metric, truncate=truncate)
        ids = np.asarray(arrays["ID"], np.int64)
        levels = np.asarray(arrays["level"], np.int64)
        parent_ids = np.asarray(arrays["parent_ID"], np.int64)
        pdists = np.asarray(arrays["parent_dist"], np.float64)
        maxds = np.asarray(arrays.get("maxdist", np.zeros(len(ids))), np.float64)
        datas = arrays["data"]
        for i in range(len(ids)):
            n = Node(data=datas[i], level=int(levels[i]),
                     parent_dist=float(pdists[i]), ID=int(ids[i]),
                     maxdist=float(maxds[i]))
            t._by_id[n.ID] = n
            if parent_ids[i] == -1:
                t.root = n
            else:
                par = t._by_id[int(parent_ids[i])]
                n.parent = par
                par.children.append(n)
        t.N = next_id if next_id is not None else (int(ids.max()) + 1 if len(ids) else 0)
        return t

    def same_tree(self, other: "CoverTree") -> bool:
        """Structural equality (tree.cpp:1081-1102)."""

        def eq(a: Node | None, b: Node | None) -> bool:
            if (a is None) != (b is None):
                return False
            if a is None:
                return True
            if (a.ID != b.ID or a.level != b.level
                    or abs(a.parent_dist - b.parent_dist) > 1e-12
                    or not np.array_equal(np.asarray(a.data), np.asarray(b.data))
                    or len(a.children) != len(b.children)):
                return False
            return all(eq(x, y) for x, y in zip(a.children, b.children))

        return eq(self.root, other.root)

    __eq__ = same_tree

    def __hash__(self):
        return id(self)

    # ------------------------------------------------------------ export

    def to_json(self, printer: Callable | None = None) -> str:
        """Node/edge JSON in the reference's exact textual format
        (tree.cpp:1459-1506): values via std::to_string (6-decimal fixed
        for floats), edge distances "%f"."""
        import numbers

        def cxx_to_string(v) -> str:
            if isinstance(v, numbers.Integral):
                return str(int(v))
            if isinstance(v, numbers.Real):
                return f"{float(v):.6f}"
            return str(v)

        def default_printer(r) -> str:
            arr = np.asarray(r)
            if arr.ndim == 0:
                return cxx_to_string(arr.item())
            items = ",".join(cxx_to_string(x) for x in arr.tolist())
            return f"[ {items} ]"

        pr = printer or default_printer
        nodes: list[Node] = []
        self.traverse(nodes.append)
        lines = ["{", '"nodes": [']
        for i, n in enumerate(nodes):
            comma = "," if i != len(nodes) - 1 else ""
            lines.append(f'{{ "id":{n.ID}, "values":{pr(n.data)}}}{comma}')
        lines.append("],")
        lines.append('"edges": [')
        edges = [n for n in nodes if n.parent is not None]
        import numbers
        for i, n in enumerate(edges):
            comma = "," if i != len(edges) - 1 else ""
            d = n.parent_dist
            # std::fixed on an integral Distance prints no decimals
            dstr = str(int(d)) if isinstance(d, numbers.Integral) else f"{float(d):.6f}"
            lines.append(f'{{ "source":{n.parent.ID}, "target":{n.ID}, "distance":{dstr}}}{comma}')
        lines.append("]}")
        return "\n".join(lines) + "\n"

    # ------------------------------------------------------------ clustering

    def _find_neighbour_radius_points(self, points) -> float:
        """Max distance from the first anchor to the others; a single
        anchor leaves the reference's DBL_MIN initial value
        (tree.cpp:1200-1239)."""
        p1 = points[0]
        return max((self.dist(p1, points[i]) for i in range(1, len(points))),
                   default=2.2250738585072014e-308)

    def clustering(self, distribution, IDS=None, points=None) -> list[list[int]]:
        """Distribution-quantile neighborhoods (tree.cpp:1354-1430).

        Three overloads like the reference: (distribution, IDS, points),
        (distribution, IDS) — anchors by node ID, (distribution, points).
        """
        _is_distribution_ok(distribution)
        if IDS is not None and points is not None:
            anchor_pts = [points[i] for i in IDS]
            radius = self._find_neighbour_radius_points(anchor_pts)
            center = points[IDS[0]]
        elif IDS is not None:
            anchor_pts = [self[int(i)] for i in IDS]
            radius = self._find_neighbour_radius_points(anchor_pts)
            center = self[int(IDS[0])]
        else:
            radius = self._find_neighbour_radius_points(points)
            center = points[0]
        return self._clustering_impl(distribution, center, radius)

    def _clustering_impl(self, distribution, center, radius: float) -> list[list[int]]:
        sizes = [int(float(self.size()) * d) for d in distribution]
        last = sizes[0]
        for i in range(1, len(sizes)):
            cur = sizes[i]
            sizes[i] -= last
            last = cur
        proot, _ = self.nn(center)
        while self.base**proot.level < radius:
            if proot.parent is None:
                break  # reference would dereference null here; stop at root
            proot = proot.parent
        result: list[list[int]] = [[] for _ in distribution]
        cur_idx = 0
        while cur_idx < len(sizes) and sizes[cur_idx] == 0:
            cur_idx += 1
        if cur_idx == len(sizes):
            return result
        parsed: set[int] = set()
        state = [cur_idx]
        self._grab_tree(proot, center, parsed, sizes, state, result)
        return result

    def _update_idx(self, state, sizes, result) -> bool:
        if len(result[state[0]]) == sizes[state[0]]:
            state[0] += 1
        return state[0] == len(result)

    def _grab_sub_tree(self, proot: Node, center, parsed, sizes, state, result) -> bool:
        """tree.cpp:1273-1318 — including its quirky reads of the
        *unsorted* dists[0] / dists[loop-counter]."""
        idx, dists = self._sorted_children(proot, center)
        d_root = self.dist(proot.data, center)
        is_root_added = False
        if len(dists) == 0 or dists[0] > d_root:
            if proot.ID not in parsed:
                result[state[0]].append(proot.ID)
                parsed.add(proot.ID)
                is_root_added = True
                if self._update_idx(state, sizes, result):
                    return True
        for index, i in enumerate(idx):
            if not is_root_added and dists[index] > d_root:
                if proot.ID not in parsed:
                    result[state[0]].append(proot.ID)
                    parsed.add(proot.ID)
                    is_root_added = True
                    if self._update_idx(state, sizes, result):
                        return True
            if proot.children[i].ID not in parsed:
                if self._grab_sub_tree(proot.children[i], center, parsed, sizes, state, result):
                    return True
        if not is_root_added and proot.ID not in parsed:
            result[state[0]].append(proot.ID)
            parsed.add(proot.ID)
            if self._update_idx(state, sizes, result):
                return True
        return False

    def _grab_tree(self, start: Node, center, parsed, sizes, state, result) -> bool:
        if self._grab_sub_tree(start, center, parsed, sizes, state, result):
            return True
        parsed.add(start.ID)
        proot = start.parent
        while proot is not None:
            if self._grab_sub_tree(proot, center, parsed, sizes, state, result):
                return True
            proot = proot.parent
        return False


sys.setrecursionlimit(max(sys.getrecursionlimit(), 20000))


# ---------------------------------------------------------------- fast build
#
# Flat-array builder for the engine's hot path (2-D planar points).
# Replicates CoverTree(metric=PlanarDeg()) sequential insertion
# EXACTLY — same descent rule, same root-promotion walk, same maxdist
# updates, and bit-identical float values: PlanarDeg is defined as
# sqrt(dx*dx + dy*dy) in a fixed op order (metrics.planar_dist), which
# is IEEE-754-exact per operation, so this builder's scalar Python
# arithmetic produces the same doubles as the Node-based tree's numpy
# kernels.  Scalar arithmetic is the point: per-visit child lists are
# small (median ~4), where a numpy call costs ~3us of dispatch but a
# scalar multiply costs ~30ns — this builder is ~10x the Node tree
# (BENCH r1: the Python insert loop was 67% of headline wall-clock).
# Output is bit-identical to CoverTree.to_arrays() (asserted by
# tests/test_covertree.py).


def build_planar_tree_arrays(pts: np.ndarray) -> dict[str, np.ndarray]:
    """pts: (n, 2) float64 rows in insertion order -> preorder node
    arrays {ID, level, parent_ID, parent_dist, maxdist} identical to
    ``CoverTree(metric=PlanarDeg()); insert_many(pts); to_arrays()``."""
    from math import sqrt

    pts = np.asarray(pts, np.float64)
    n = len(pts)
    if n == 0:
        return {"ID": np.empty(0, np.int64), "level": np.empty(0, np.int64),
                "parent_ID": np.empty(0, np.int64),
                "parent_dist": np.empty(0, np.float64),
                "maxdist": np.empty(0, np.float64)}
    la: list[float] = pts[:, 0].tolist()
    lo: list[float] = pts[:, 1].tolist()
    level = [0] * n
    parent = [-1] * n
    pdist = [0.0] * n
    maxd = [0.0] * n
    cov = [1.0] * n                     # cached 2.0**level per node
    children: list[list[int]] = [[] for _ in range(n)]

    root = 0
    for x in range(1, n):
        x0 = la[x]
        x1 = lo[x]
        p = root
        dx = la[p] - x0
        dy = lo[p] - x1
        d_px = sqrt(dx * dx + dy * dy)
        if d_px > cov[p]:
            # root promotion (tree.cpp:414-452): while the new point is
            # outside b*covdist/(b-1), re-root at the last leaf
            while True:
                dx = la[p] - x0
                dy = lo[p] - x1
                if sqrt(dx * dx + dy * dy) <= 2.0 * cov[p]:
                    break
                current, par = p, -1
                while children[current]:
                    par = current
                    current = children[current][-1]
                if par != -1:
                    children[par].pop()
                    level[current] = level[p] + 1
                    cov[current] = 2.0 ** level[current]
                    children[current].append(p)
                    ddx = la[p] - la[current]
                    ddy = lo[p] - lo[current]
                    parent[p] = current
                    pdist[p] = sqrt(ddx * ddx + ddy * ddy)
                    md = pdist[p] + maxd[p]
                    if md > maxd[current]:
                        maxd[current] = md
                    p = current
                    parent[p] = -1
                    pdist[p] = 0.0
                else:
                    level[p] += 1
                    cov[p] = 2.0 ** level[p]
            level[x] = level[p] + 1
            cov[x] = 2.0 ** level[x]
            children[x].append(p)
            dx = la[p] - x0
            dy = lo[p] - x1
            pdist[p] = sqrt(dx * dx + dy * dy)
            parent[p] = x
            maxd[x] = pdist[p] + maxd[p]
            root = x
            continue
        # nearest-ancestor descent (tree.cpp:1104-1131): follow the
        # closest covering child (ties -> earliest sibling)
        while True:
            if d_px > maxd[p]:
                maxd[p] = d_px
            best = -1
            best_d = 0.0
            for c in children[p]:
                dx = la[c] - x0
                dy = lo[c] - x1
                d = sqrt(dx * dx + dy * dy)
                if d <= cov[c] and (best == -1 or d < best_d):
                    best = c
                    best_d = d
            if best != -1:
                p = best
                d_px = best_d
                continue
            children[p].append(x)
            parent[x] = p
            pdist[x] = d_px
            level[x] = level[p] - 1
            cov[x] = 2.0 ** level[x]
            break

    # preorder traversal, children in insertion order (to_arrays parity)
    order = np.empty(n, np.int64)
    stack = [root]
    w = 0
    while stack:
        cur = stack.pop()
        order[w] = cur
        w += 1
        ch = children[cur]
        if ch:
            stack.extend(reversed(ch))
    level_a = np.asarray(level, np.int64)[order]
    parent_a = np.asarray(parent, np.int64)[order]
    pdist_a = np.asarray(pdist, np.float64)[order]
    maxd_a = np.asarray(maxd, np.float64)[order]
    return {"ID": order, "level": level_a, "parent_ID": parent_a,
            "parent_dist": pdist_a, "maxdist": maxd_a}
