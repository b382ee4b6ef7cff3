"""Hypothesis fuzz: pure-local properties (no Ray session needed)."""

import numpy as np
from hypothesis import given, settings, strategies as st

from metric_search_ray.covertree import CoverTree, build_planar_tree_arrays
from metric_search_ray.metrics import PlanarDeg, planar_dist
from metric_search_ray.pipelines import dedup
from metric_search_ray import phash as phashmod


@settings(max_examples=25, deadline=None)
@given(st.integers(0, 2**32 - 1), st.integers(2, 120),
       st.sampled_from([0, 1, 3]))
def test_fast_builder_parity_fuzz(seed, n, dup_mode):
    """Flat-array builder == Node tree on arbitrary point sets,
    including duplicate-heavy and collinear layouts."""
    rng = np.random.default_rng(seed)
    pts = np.stack([rng.uniform(-90, 90, n), rng.uniform(-180, 180, n)], axis=1)
    if dup_mode == 1 and n >= 4:           # heavy duplicates
        pts[n // 2:] = pts[: n - n // 2]
    elif dup_mode == 3:                    # collinear chain
        pts[:, 1] = pts[:, 0] * 2.0
    t = CoverTree(metric=PlanarDeg())
    for p in pts:
        t.insert(p)
    a = t.to_arrays()
    b = build_planar_tree_arrays(pts)
    for key in ("ID", "level", "parent_ID", "parent_dist", "maxdist"):
        assert np.array_equal(a[key], b[key]), key


@settings(max_examples=25, deadline=None)
@given(st.integers(0, 2**32 - 1), st.integers(1, 40))
def test_tree_knn_bruteforce_fuzz(seed, n):
    """Tree kNN distances == brute force for every k on random sets."""
    rng = np.random.default_rng(seed)
    pts = np.stack([rng.uniform(-10, 10, n), rng.uniform(-10, 10, n)], axis=1)
    t = CoverTree(metric=PlanarDeg())
    for p in pts:
        t.insert(p)
    q = rng.uniform(-12, 12, 2)
    d = planar_dist(pts[:, 0] - q[0], pts[:, 1] - q[1])
    for k in (1, min(5, n), n):
        got = sorted(dd for _, dd in t.knn(q, k))
        exp = sorted(np.sort(d)[:k])
        np.testing.assert_allclose(got, exp, rtol=0, atol=0)


@settings(max_examples=20, deadline=None)
@given(st.integers(0, 2**32 - 1), st.integers(2, 60), st.integers(0, 6))
def test_minhash_signature_monotone_fuzz(seed, n_words, max_h):
    """Identical texts share signatures; banding keys are deterministic
    functions of the signature."""
    rng = np.random.default_rng(seed)
    vocab = ["alpha", "beta", "gamma", "delta", "eps"]
    text = " ".join(rng.choice(vocab, n_words))
    mh = dedup.MinHasher()
    s1 = mh.signature(text)
    s2 = mh.signature(text)
    assert np.array_equal(s1, s2)
    k1 = dedup._band_keys(s1[None, :].astype(np.int64), 16)
    k2 = dedup._band_keys(s2[None, :].astype(np.int64), 16)
    assert np.array_equal(k1, k2)


@settings(max_examples=30, deadline=None)
@given(st.integers(0, 2**32 - 1), st.integers(2, 50), st.integers(0, 8),
       st.sampled_from([16, 48, 64]))
def test_pigeonhole_banding_never_misses_fuzz(seed, n, max_h, bit_width):
    """Local check of the exact-recall invariant: any pair within
    max_hamming (over bit_width bits) agrees on at least one band."""
    rng = np.random.default_rng(seed)
    lim = (1 << bit_width) - 1
    h = rng.integers(0, lim + 1, n, dtype=np.uint64)
    # plant a near pair
    flip = np.uint64(0)
    for b in rng.choice(bit_width, min(max_h, bit_width), replace=False):
        flip |= np.uint64(1) << np.uint64(int(b))
    h[1] = h[0] ^ flip
    n_bands = max_h + 1
    if bit_width < n_bands:
        return
    width = bit_width // n_bands
    ham = phashmod.hamming_matrix(h.astype(np.int64), h.astype(np.int64))
    for i in range(n):
        for j in range(i + 1, n):
            if ham[i, j] <= max_h:
                agree = False
                for bi in range(n_bands):
                    lo = bi * width
                    hi = bit_width if bi == n_bands - 1 else lo + width
                    mask = (np.uint64(1) << np.uint64(hi - lo)) - np.uint64(1)
                    if (h[i] >> np.uint64(lo)) & mask == (h[j] >> np.uint64(lo)) & mask:
                        agree = True
                        break
                assert agree, (i, j, ham[i, j])
