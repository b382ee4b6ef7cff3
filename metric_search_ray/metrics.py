"""Vectorized metric registry mirroring the reference's metric enum.

Reference surface: ``euclidian=0, manhatten=1, euclidian_thresholded=2,
cosine=3, p_norm=4, emd=5, twed=6, ssim=7`` (n-api/lib/index.js:2,
n-api/metric_search_js.hpp:8-18; ``edit`` implemented but disabled
there) plus the engine additions the target rule requires: ``hamming``
over int64 phash and ``planar_deg`` (the geo metric used by the
partitioned index).

Every metric object is a callable ``m(a, b) -> float`` (the reference's
functor protocol, details/tree.hpp:53) and additionally provides
``m.batch(q, X) -> (n,) float64`` — distances from one query record to
n records — which is what the engine's hot paths use.  Semantics notes:

- ``Cosine`` returns the **similarity** dot/(|a||b|), not 1-cos, exactly
  as the reference does (n-api/metric_distance/details/Standards.cpp:84-96).
- ``EuclidianThresholded`` is min(thres, factor*L2) with defaults
  thres=1000, factor=3000 (Standards.hpp:65-66).
- ``TWED`` reproduces the reference recurrence with timestamps = element
  indices, defaults penalty=0, elastic=1 (details/TWED.cpp:10-76).
- ``SSIM`` is the reference's structural *dissimilarity*:
  11x11 window w(x,y) ~ exp(-((x-5)^2+(y-5)^2)/2.25) normalized,
  per-window sqrt(2 - S1 - S2) averaged over all stride-1 windows,
  defaults dynamic_range=255, masking=2.0 (SSIM.cpp:57-169, SSIM.hpp:16-22).
- ``EMD`` is EMD-hat (Pele & Werman ICCV'09): min-cost flow of the
  matched mass plus ``extra_mass_penalty * |sum(P)-sum(Q)|`` where the
  default penalty -1 means max(C) (EMD.cpp:1135-1210).  Implemented as
  successive-shortest-paths; exact, intended for small histograms.
- ``Edit`` is plain Levenshtein (details/Edit.cpp:11-64).
"""

from __future__ import annotations

import numpy as np

from . import phash as _ph


class L2:
    """Euclidean distance (tree default, details/tree.cpp:38-51)."""

    name = "euclidian"

    def __call__(self, a, b) -> float:
        d = np.asarray(a, np.float64) - np.asarray(b, np.float64)
        return float(np.sqrt(np.dot(d.ravel(), d.ravel())))

    def batch(self, q, X) -> np.ndarray:
        X = np.asarray(X, np.float64)
        q = np.asarray(q, np.float64).ravel()
        d = X.reshape(len(X), -1) - q
        return np.sqrt(np.einsum("ij,ij->i", d, d))


class L1:
    name = "manhatten"

    def __call__(self, a, b) -> float:
        return float(np.abs(np.asarray(a, np.float64) - np.asarray(b, np.float64)).sum())

    def batch(self, q, X) -> np.ndarray:
        X = np.asarray(X, np.float64)
        q = np.asarray(q, np.float64).ravel()
        return np.abs(X.reshape(len(X), -1) - q).sum(axis=1)


class EuclidianThresholded:
    name = "euclidian_thresholded"

    def __init__(self, thres: float = 1000.0, factor: float = 3000.0):
        self.thres, self.factor = thres, factor

    def __call__(self, a, b) -> float:
        return min(self.thres, self.factor * L2()(a, b))

    def batch(self, q, X) -> np.ndarray:
        return np.minimum(self.thres, self.factor * L2().batch(q, X))


class PNorm:
    name = "p_norm"

    def __init__(self, p: float = 1.0):
        self.p = p

    def __call__(self, a, b) -> float:
        d = np.abs(np.asarray(a, np.float64) - np.asarray(b, np.float64)).ravel()
        return float(np.power(np.power(d, self.p).sum(), 1.0 / self.p))

    def batch(self, q, X) -> np.ndarray:
        X = np.asarray(X, np.float64)
        q = np.asarray(q, np.float64).ravel()
        d = np.abs(X.reshape(len(X), -1) - q)
        return np.power(np.power(d, self.p).sum(axis=1), 1.0 / self.p)


class Cosine:
    """Cosine *similarity* — preserved exactly as the reference computes it."""

    name = "cosine"

    def __call__(self, a, b) -> float:
        a = np.asarray(a, np.float64).ravel()
        b = np.asarray(b, np.float64).ravel()
        return float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b)))

    def batch(self, q, X) -> np.ndarray:
        X = np.asarray(X, np.float64).reshape(len(X), -1)
        q = np.asarray(q, np.float64).ravel()
        return (X @ q) / (np.linalg.norm(X, axis=1) * np.linalg.norm(q))


class Hamming:
    """Bitwise Hamming over int64 phash (engine addition per north rule)."""

    name = "hamming"

    def __call__(self, a, b) -> float:
        return float(_ph.hamming(np.asarray([a]), np.asarray([b]))[0])

    def batch(self, q, X) -> np.ndarray:
        return _ph.hamming(np.full(len(X), q, np.int64) if np.isscalar(q) else
                           np.full(len(X), int(np.asarray(q).item()), np.int64),
                           np.asarray(X, np.int64)).astype(np.float64)


def planar_dist_outer(lat, lon, qlat, qlon):
    """(n_q, n_pts) planar distance matrix, bit-identical to
    ``planar_dist(lat - qlat[:, None], lon - qlon[:, None])`` (same ops
    in the same IEEE order), but fused in-place: 2 temporaries instead
    of 6 — the matrix kernels in the kNN/radius scans are memory-bound,
    so the saved 4 full-matrix allocations are the savings."""
    d = np.subtract(lat[None, :], qlat[:, None])
    np.multiply(d, d, out=d)
    t = np.subtract(lon[None, :], qlon[:, None])
    np.multiply(t, t, out=t)
    np.add(d, t, out=d)
    return np.sqrt(d, out=d)


def planar_dist(dx, dy):
    """sqrt(dx*dx + dy*dy) in a fixed op order.  Unlike ``hypot``
    (implementation-defined rounding), every op here is IEEE-754-exact
    per element, so scalar Python math, numpy vectors and any future
    kernel produce bit-identical values — which is what lets the
    flat-array tree builder (covertree.build_planar_tree_arrays) use
    scalar arithmetic and still match the Node-based tree bit-for-bit."""
    return np.sqrt(dx * dx + dy * dy)


class PlanarDeg:
    """Planar lat/lon degree distance — the geo-partitioning metric."""

    name = "planar_deg"

    def __call__(self, a, b) -> float:
        a = np.asarray(a, np.float64)
        b = np.asarray(b, np.float64)
        return float(planar_dist(a[0] - b[0], a[1] - b[1]))

    def batch(self, q, X) -> np.ndarray:
        X = np.asarray(X, np.float64)
        q = np.asarray(q, np.float64).ravel()
        return planar_dist(X[:, 0] - q[0], X[:, 1] - q[1])


class Edit:
    """Levenshtein distance (details/Edit.cpp:11-64)."""

    name = "edit"

    def __call__(self, a, b) -> float:
        a, b = str(a), str(b)
        if not a:
            return float(len(b))
        if not b:
            return float(len(a))
        bb = np.frombuffer(b.encode("utf-32-le"), np.uint32)
        prev = np.arange(len(bb) + 1)
        for i, ca in enumerate(np.frombuffer(a.encode("utf-32-le"), np.uint32), 1):
            cur = np.empty(len(bb) + 1, np.int64)
            cur[0] = i
            sub = prev[:-1] + (bb != ca)
            np.minimum(sub, prev[1:] + 1, out=cur[1:])
            for j in range(1, len(cur)):       # insertion chain is sequential
                if cur[j - 1] + 1 < cur[j]:
                    cur[j] = cur[j - 1] + 1
            prev = cur
        return float(prev[-1])

    def batch(self, q, X) -> np.ndarray:
        return np.asarray([self(q, x) for x in X], np.float64)


class TWED:
    """Time-Warp Edit Distance, reference recurrence (details/TWED.cpp:10-76)."""

    name = "twed"

    def __init__(self, penalty: float = 0.0, elastic: float = 1.0):
        self.penalty, self.elastic = penalty, elastic

    def __call__(self, a, b) -> float:
        A = np.asarray(a, np.float64).ravel()
        B = np.asarray(b, np.float64).ravel()
        la, lb = len(A), len(B)
        nu, lam = self.elastic, self.penalty
        j_idx = np.arange(lb)
        step_b = np.empty(lb)               # C2 increment: |B[j-1]-B[j]| + nu + lam
        step_b[0] = 0.0
        step_b[1:] = np.abs(np.diff(B)) + nu + lam
        D0 = np.empty(lb)
        D0[0] = abs(A[0] - B[0])            # timeA[0] == 0 so the elastic term vanishes
        for j in range(1, lb):
            D0[j] = D0[j - 1] + step_b[j]
        for i in range(1, la):
            da = abs(A[i - 1] - A[i]) + nu + lam
            c1 = D0 + da                                        # delete-in-A
            c3 = np.empty(lb)                                   # match
            c3[0] = np.inf
            c3[1:] = D0[:-1] + np.abs(A[i] - B[1:]) \
                + np.abs(A[i - 1] - B[:-1]) + nu * 2 * np.abs(i - j_idx[1:])
            Di = np.minimum(c1, c3)
            Di[0] = c1[0]
            for j in range(1, lb):                              # delete-in-B chain (sequential)
                v = Di[j - 1] + step_b[j]
                if v < Di[j]:
                    Di[j] = v
            D0 = Di
        return float(D0[-1])

    def batch(self, q, X) -> np.ndarray:
        return np.asarray([self(q, x) for x in X], np.float64)


class SSIM:
    """Structural dissimilarity over 2-D images (details/SSIM.cpp:57-169)."""

    name = "ssim"

    def __init__(self, dynamic_range: float = 255.0, masking: float = 2.0):
        if masking <= 0.0:
            # the reference would divide by zero in the C3 exponent /
            # lp-norm power; reject the degenerate value loudly
            raise ValueError("SSIM masking must be > 0")
        self.dynamic_range, self.masking = dynamic_range, masking
        n = 11
        d = n // 2
        y, x = np.mgrid[0:n, 0:n].astype(np.float64)
        g = np.exp(-(((x - d) ** 2 + (y - d) ** 2) / 2.25))
        self._g = g / g.sum()
        # the reference's gaussian is separable: g == outer(g1, g1) with
        # g1 normalized — the per-pair kernel runs two 1-D correlations
        # (22 MACs/output px) instead of one 2-D window sum (121)
        g1 = np.exp(-((np.arange(n, dtype=np.float64) - d) ** 2) / 2.25)
        self._g1 = g1 / g1.sum()

    @staticmethod
    def _gray(img) -> np.ndarray:
        a = np.asarray(img, np.float64)
        if a.ndim == 3:
            a = a.mean(axis=2)
        if a.shape[0] < 11 or a.shape[1] < 11:
            raise ValueError("image smaller than the 11x11 SSIM window")
        return a

    def __call__(self, img1, img2) -> float:
        # NOTE on masking parity (details/SSIM.cpp:57-169): when
        # masking < 2.0 the reference computes a per-window
        # "visibility" stabilizer (SSIM.cpp:102-144) — and then never
        # folds it into the result: `sum += sqrt(2 - S1 - S2)` at
        # SSIM.cpp:161 ignores it (a dead store).  The returned
        # distance is therefore masking-INDEPENDENT in the reference,
        # and this port matches that exactly by skipping the dead
        # computation.  The visibility branch itself is ported and
        # tested as ``visibility_map`` below.
        a = self._gray(img1)
        b = self._gray(img2)
        return float(self.batch_pairs(a[None], b[None])[0])

    def _sepconv(self, X: np.ndarray) -> np.ndarray:
        """Gaussian window sum over a stack (N, H, W) via two 1-D
        correlations (the window is outer(g1, g1)) -> (N, H', W')."""
        from numpy.lib.stride_tricks import sliding_window_view
        g1 = self._g1
        t = sliding_window_view(X, len(g1), axis=2) @ g1
        return sliding_window_view(t, len(g1), axis=1) @ g1

    def batch_pairs(self, A: np.ndarray, B: np.ndarray) -> np.ndarray:
        """SSIM dissimilarity for N aligned pairs of same-shape grayscale
        images: A, B are (N, H, W) float stacks -> (N,) distances.
        Identical math to the per-pair reference port (the luminance /
        contrast-structure terms of SSIM.cpp:145-161); vectorized across
        the stack and separable across the window axes.

        The stack is processed in cache-sized chunks: the convolution
        temps are ~15x the input size, so a large stack streams every
        temp through DRAM — measured saturating memory bandwidth at 8
        busy cores (per-core throughput -40%).  ~32 64x64 pairs of
        temps fit L3; results are bit-identical (same per-pair ops)."""
        A = np.asarray(A, np.float64)
        B = np.asarray(B, np.float64)
        n = len(A)
        px = max(int(A.shape[1]) * int(A.shape[2]), 1)
        chunk = max(1, min(n, (32 * 64 * 64) // px))
        out = np.empty(n, np.float64)
        c1 = (0.01 * self.dynamic_range) ** 2
        c2 = (0.03 * self.dynamic_range) ** 2
        for i in range(0, n, chunk):
            a = A[i:i + chunk]
            b = B[i:i + chunk]
            mu1 = self._sepconv(a)
            mu2 = self._sepconv(b)
            s1 = self._sepconv(a * a) - mu1 * mu1
            s2 = self._sepconv(b * b) - mu2 * mu2
            np.maximum(s1, 0, out=s1)
            np.maximum(s2, 0, out=s2)
            S1 = (2 * mu1 * mu2 + c1) / (mu1**2 + mu2**2 + c1)
            S2 = (2 * np.sqrt(s1 * s2) + c2) / (s1 + s2 + c2)
            out[i:i + chunk] = np.sqrt(np.maximum(2 - S1 - S2, 0)).mean(axis=(1, 2))
        return out

    def visibility_map(self, img1, img2) -> np.ndarray:
        """Per-window visibility stabilizer — the reference's
        ``is_visibility`` branch (details/SSIM.cpp:102-144), ported
        verbatim and vectorized:

          sscale = n*n;  C3 = C2 * sscale^(2/masking - 1)
          l2norm  = sum (k - mu)^2        * gauss * sscale
          lpnorm  = (sum |k - mu|^masking * gauss * sscale)^(2/masking)
          vis     = ((l2a + l2b + C3) / (lpa + lpb + C3))^(masking/2),
                    clamped to [0, 1]

        The reference computes this whenever masking < 2.0 and then
        discards it (the local sum at SSIM.cpp:161 never multiplies by
        it), so ``__call__`` intentionally does not apply it; this
        method exposes the branch for direct use and testing.  At
        masking == 2.0 the map is identically 1 (lpnorm == l2norm and
        all exponents are unity).
        """
        a = self._gray(img1)
        b = self._gray(img2)
        n = 11
        from numpy.lib.stride_tricks import sliding_window_view
        g = self._g
        wa = sliding_window_view(a, (n, n))
        wb = sliding_window_view(b, (n, n))
        mu1 = np.einsum("ijyx,yx->ij", wa, g)
        mu2 = np.einsum("ijyx,yx->ij", wb, g)
        m = self.masking
        sscale = float(n * n)
        c2 = (0.03 * self.dynamic_range) ** 2
        c3 = c2 * sscale ** (2.0 / m - 1.0)
        gv = g * sscale
        v1 = wa - mu1[:, :, None, None]
        v2 = wb - mu2[:, :, None, None]
        l2a = np.einsum("ijyx,yx->ij", v1 * v1, gv)
        l2b = np.einsum("ijyx,yx->ij", v2 * v2, gv)
        lpa = np.einsum("ijyx,yx->ij", np.abs(v1) ** m, gv) ** (2.0 / m)
        lpb = np.einsum("ijyx,yx->ij", np.abs(v2) ** m, gv) ** (2.0 / m)
        vis = ((l2a + l2b + c3) / (lpa + lpb + c3)) ** (m / 2.0)
        return np.clip(vis, 0.0, 1.0)

    def batch(self, q, X) -> np.ndarray:
        return np.asarray([self(q, x) for x in X], np.float64)


class EMD:
    """EMD-hat via successive shortest paths (exact, small histograms)."""

    name = "emd"

    def __init__(self, C: np.ndarray, extra_mass_penalty: float = -1.0):
        self.C = np.asarray(C, np.float64)
        self.extra_mass_penalty = extra_mass_penalty

    @staticmethod
    def ground_distance_matrix_of_2dgrid(cols: int, rows: int, thres: float = 1000.0,
                                         factor: float = 3000.0) -> np.ndarray:
        """Grid ground distances, thresholded-L2 default like the reference
        (EMD.cpp:73-113 uses Euclidian_thresholded as the grid metric)."""
        r, c = np.mgrid[0:rows, 0:cols]
        pts = np.stack([r.T.ravel(), c.T.ravel()], axis=1).astype(np.float64)
        d = np.linalg.norm(pts[:, None, :] - pts[None, :, :], axis=2)
        return np.minimum(thres, factor * d)

    def __call__(self, P, Q) -> float:
        P = np.asarray(P, np.float64).ravel().copy()
        Q = np.asarray(Q, np.float64).ravel().copy()
        C = self.C
        # pre-flow the zero-cost diagonal (metric property), as the reference does
        m = np.minimum(P, Q)
        P -= m
        Q -= m
        extra = abs(P.sum() - Q.sum())
        pen = self.extra_mass_penalty if self.extra_mass_penalty >= 0 else float(C.max())
        cost = _min_cost_transport(P, Q, C)
        return float(cost + pen * extra)

    def batch(self, q, X) -> np.ndarray:
        return np.asarray([self(q, x) for x in X], np.float64)


def _min_cost_transport(P: np.ndarray, Q: np.ndarray, C: np.ndarray) -> float:
    """Exact min-cost transport of min(sum P, sum Q) mass.

    Successive shortest augmenting paths (Bellman-Ford on the bipartite
    residual graph).  O(augmentations * V * E) — fine for histogram-sized
    inputs; the engine only uses EMD as a per-pair metric in small scorer
    stages, never inside a wide shuffle.
    """
    sup = np.flatnonzero(P > 0)
    dem = np.flatnonzero(Q > 0)
    if len(sup) == 0 or len(dem) == 0:
        return 0.0
    p, q = P[sup].copy(), Q[dem].copy()
    c = C[np.ix_(sup, dem)]
    ns, nd = len(sup), len(dem)
    f = np.zeros((ns, nd))
    cost = 0.0
    remaining = min(p.sum(), q.sum())
    eps = 1e-12
    while remaining > eps:
        # Bellman-Ford: ds[i] = cheapest path cost source->supply i,
        # dd[j] = source->demand j.  Forward arcs i->j cost c[i,j];
        # backward arcs j->i (where f[i,j] > 0) cost -c[i,j].
        ds = np.where(p > eps, 0.0, np.inf)
        dd = np.full(nd, np.inf)
        from_s = np.full(nd, -1)   # supply used to reach demand j
        from_d = np.full(ns, -1)   # demand used to reach supply i (backward)
        for _ in range(ns + nd):
            cand = ds[:, None] + c
            bi = np.argmin(cand, axis=0)
            bv = cand[bi, np.arange(nd)]
            upd = bv < dd - eps
            changed = bool(upd.any())
            dd[upd] = bv[upd]
            from_s[upd] = bi[upd]
            back = np.where(f > eps, dd[None, :] - c, np.inf)  # (ns, nd): reach i via backward from j
            bj = np.argmin(back, axis=1)
            bvs = back[np.arange(ns), bj]
            upds = bvs < ds - eps
            if upds.any():
                ds[upds] = bvs[upds]
                from_d[upds] = bj[upds]
                changed = True
            if not changed:
                break
        open_d = np.flatnonzero(q > eps)
        finite = open_d[np.isfinite(dd[open_d])]
        if len(finite) == 0:
            break
        j = int(finite[np.argmin(dd[finite])])
        # trace the alternating path back to a source supply; find bottleneck
        arcs = []  # (i, j, +1 forward | -1 backward)
        cur_j = j
        amt = q[j]
        start_i = -1
        while True:
            i = int(from_s[cur_j])
            arcs.append((i, cur_j, 1))
            if from_d[i] == -1:        # reached directly from the source
                amt = min(amt, p[i])
                start_i = i
                break
            prev_j = int(from_d[i])
            amt = min(amt, f[i, prev_j])
            arcs.append((i, prev_j, -1))
            cur_j = prev_j
        for (i, jj, sgn) in arcs:
            f[i, jj] += sgn * amt
            cost += sgn * amt * c[i, jj]
        p[start_i] -= amt
        q[j] -= amt
        remaining -= amt
    return cost


class Dimension:
    """Accessor-projected metric: extract a field from structured records
    then apply the underlying metric (n-api/metric_distance/dimension.hpp:16-64).

    ``accessor`` is a callable record -> value (e.g. operator.itemgetter
    on dict rows, an attribute getter, or a column projector).
    """

    name = "dimension"

    def __init__(self, accessor, metric):
        self.accessor = accessor
        self.metric = metric

    def __call__(self, a, b) -> float:
        return self.metric(self.accessor(a), self.accessor(b))

    def batch(self, q, X) -> np.ndarray:
        inner = getattr(self.metric, "batch", None)
        qq = self.accessor(q)
        vals = [self.accessor(x) for x in X]
        if inner is not None:
            try:
                return np.asarray(inner(qq, np.asarray(vals)), np.float64)
            except (TypeError, ValueError):
                pass
        return np.asarray([self.metric(qq, v) for v in vals], np.float64)


def registry(**kwargs) -> dict:
    """Name -> constructed metric, mirroring n-api make_metric factory
    (n-api/metric_distance/metric_factory.hpp:7-23)."""
    return {
        "euclidian": L2(),
        "manhatten": L1(),
        "euclidian_thresholded": EuclidianThresholded(**kwargs.get("euclidian_thresholded", {})),
        "cosine": Cosine(),
        "p_norm": PNorm(**kwargs.get("p_norm", {})),
        "twed": TWED(**kwargs.get("twed", {})),
        "ssim": SSIM(**kwargs.get("ssim", {})),
        "edit": Edit(),
        "hamming": Hamming(),
        "planar_deg": PlanarDeg(),
    }
