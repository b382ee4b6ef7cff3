import numpy as np
import pytest

from metric_search_ray import metrics


def test_l2_l1_pnorm_cosine():
    a = np.asarray([1.0, 2.0, 3.0])
    b = np.asarray([4.0, 6.0, 3.0])
    assert metrics.L2()(a, b) == pytest.approx(5.0)
    assert metrics.L1()(a, b) == pytest.approx(7.0)
    assert metrics.PNorm(p=2)(a, b) == pytest.approx(5.0)
    assert metrics.PNorm(p=1)(a, b) == pytest.approx(7.0)
    # cosine is a SIMILARITY in the reference — preserved
    cos = metrics.Cosine()(a, b)
    assert cos == pytest.approx(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b)))
    # batch forms agree with scalar forms
    X = np.asarray([b, a, [0.0, 0.0, 1.0]])
    np.testing.assert_allclose(metrics.L2().batch(a, X), [metrics.L2()(a, x) for x in X])
    np.testing.assert_allclose(metrics.L1().batch(a, X), [metrics.L1()(a, x) for x in X])
    np.testing.assert_allclose(metrics.Cosine().batch(a, X), [metrics.Cosine()(a, x) for x in X])


def test_euclidian_thresholded_defaults():
    # defaults thres=1000 factor=3000 (Standards.hpp:65-66)
    m = metrics.EuclidianThresholded()
    assert m(np.asarray([0.0]), np.asarray([0.1])) == pytest.approx(300.0)
    assert m(np.asarray([0.0]), np.asarray([10.0])) == 1000.0


def test_edit_distance():
    e = metrics.Edit()
    assert e("kitten", "sitting") == 3
    assert e("", "abc") == 3
    assert e("abc", "") == 3
    assert e("abc", "abc") == 0
    assert e("flaw", "lawn") == 2


def _twed_reference(A, B, penalty, elastic):
    """Direct transliteration of the reference recurrence for oracle use
    (details/TWED.cpp:10-76); O(nm) scalar loops."""
    A = list(map(float, A))
    B = list(map(float, B))
    la, lb = len(A), len(B)
    D0 = [0.0] * lb
    D0[0] = abs(A[0] - B[0])
    for j in range(1, lb):
        D0[j] = D0[j - 1] + abs(B[j - 1] - B[j]) + elastic + penalty
    for i in range(1, la):
        Di = [0.0] * lb
        Di[0] = D0[0] + abs(A[i - 1] - A[i]) + elastic + penalty
        for j in range(1, lb):
            c1 = D0[j] + abs(A[i - 1] - A[i]) + elastic + penalty
            c2 = Di[j - 1] + abs(B[j - 1] - B[j]) + elastic + penalty
            c3 = D0[j - 1] + abs(A[i] - B[j]) + abs(A[i - 1] - B[j - 1]) \
                + elastic * (abs(i - j) + abs(i - j))
            Di[j] = min(c1, c2, c3)
        D0 = Di
    return D0[-1]


def test_twed_matches_reference_recurrence():
    rng = np.random.default_rng(0)
    for _ in range(10):
        A = rng.normal(0, 2, int(rng.integers(2, 12)))
        B = rng.normal(0, 2, int(rng.integers(2, 12)))
        for pen, ela in [(0.0, 1.0), (0.5, 2.0)]:
            got = metrics.TWED(penalty=pen, elastic=ela)(A, B)
            exp = _twed_reference(A, B, pen, ela)
            assert got == pytest.approx(exp, rel=1e-12)


def test_ssim_identical_zero_and_symmetric():
    rng = np.random.default_rng(1)
    a = rng.integers(0, 256, (16, 16)).astype(float)
    b = rng.integers(0, 256, (16, 16)).astype(float)
    s = metrics.SSIM()
    assert s(a, a) == pytest.approx(0.0, abs=1e-9)
    assert s(a, b) == pytest.approx(s(b, a))
    assert s(a, b) > 0


def test_ssim_small_perturbation_monotone():
    rng = np.random.default_rng(2)
    a = rng.integers(40, 200, (20, 20)).astype(float)
    b_small = a + rng.normal(0, 2, a.shape)
    b_big = a + rng.normal(0, 40, a.shape)
    s = metrics.SSIM()
    assert s(a, b_small) < s(a, b_big)


def _visibility_loop_oracle(a, b, masking, dynamic_range=255.0):
    """Direct loop transcription of the reference is_visibility branch
    (details/SSIM.cpp:102-144) — the oracle for the vectorized port."""
    n = 11
    d = n // 2
    y, x = np.mgrid[0:n, 0:n].astype(float)
    g = np.exp(-(((x - d) ** 2 + (y - d) ** 2) / 2.25))
    g = g / g.sum()
    C2 = (0.03 * dynamic_range) ** 2
    H = a.shape[0] - n + 1
    W = a.shape[1] - n + 1
    out = np.empty((H, W))
    for i in range(H):
        for j in range(W):
            mu1 = mu2 = 0.0
            for yy in range(n):
                for xx in range(n):
                    mu1 += a[i + yy, j + xx] * g[yy, xx]
                    mu2 += b[i + yy, j + xx] * g[yy, xx]
            sscale = n * n
            C3 = C2 * sscale ** (2.0 / masking - 1.0)
            l2a = l2b = lpa = lpb = 0.0
            for yy in range(n):
                for xx in range(n):
                    valv = g[yy, xx] * sscale
                    v1 = a[i + yy, j + xx] - mu1
                    v2 = b[i + yy, j + xx] - mu2
                    l2a += v1 * v1 * valv
                    l2b += v2 * v2 * valv
                    lpa += abs(v1) ** masking * valv
                    lpb += abs(v2) ** masking * valv
            lpa = lpa ** (2.0 / masking)
            lpb = lpb ** (2.0 / masking)
            vis = ((l2a + l2b + C3) / (lpa + lpb + C3)) ** (masking / 2.0)
            out[i, j] = min(max(vis, 0.0), 1.0)
    return out


def test_ssim_masking_below_two_accepted_and_distance_unchanged():
    # The reference computes the visibility stabilizer when
    # masking < 2.0 and then DISCARDS it (SSIM.cpp:161 never applies
    # it), so the distance is masking-independent — exact parity.
    rng = np.random.default_rng(7)
    a = rng.integers(0, 256, (16, 18)).astype(float)
    b = rng.integers(0, 256, (16, 18)).astype(float)
    base = metrics.SSIM()(a, b)
    for m in (0.5, 1.0, 1.5, 1.99, 3.0):
        assert metrics.SSIM(masking=m)(a, b) == base


def test_ssim_visibility_map_matches_cpp_loop_oracle():
    rng = np.random.default_rng(8)
    a = rng.integers(0, 256, (13, 14)).astype(float)
    b = (a + rng.normal(0, 25, a.shape)).clip(0, 255)
    for m in (0.7, 1.0, 1.5):
        got = metrics.SSIM(masking=m).visibility_map(a, b)
        exp = _visibility_loop_oracle(a, b, m)
        np.testing.assert_allclose(got, exp, rtol=1e-10, atol=1e-12)
        assert got.min() >= 0.0 and got.max() <= 1.0


def test_ssim_visibility_is_one_at_masking_two():
    rng = np.random.default_rng(9)
    a = rng.integers(0, 256, (15, 15)).astype(float)
    b = rng.integers(0, 256, (15, 15)).astype(float)
    vis = metrics.SSIM(masking=2.0).visibility_map(a, b)
    np.testing.assert_allclose(vis, 1.0, rtol=0, atol=1e-12)


def test_ssim_masking_nonpositive_rejected():
    with pytest.raises(ValueError):
        metrics.SSIM(masking=0.0)
    with pytest.raises(ValueError):
        metrics.SSIM(masking=-1.0)


def test_emd_1d_matches_cdf_oracle():
    """For 1-D histograms with |i-j| ground distance, EMD == sum |cdf diff|."""
    rng = np.random.default_rng(3)
    n = 8
    C = np.abs(np.arange(n)[:, None] - np.arange(n)[None, :]).astype(float)
    for _ in range(8):
        P = rng.integers(0, 10, n).astype(float)
        Q = rng.permutation(P)  # equal mass
        got = metrics.EMD(C)(P, Q)
        exp = np.abs(np.cumsum(P - Q)).sum()
        assert got == pytest.approx(exp, rel=1e-9, abs=1e-9)


def test_emd_extra_mass_penalty():
    C = np.asarray([[0.0, 1.0], [1.0, 0.0]])
    # P has 2 extra units of mass; default penalty = max(C) = 1
    got = metrics.EMD(C)([3.0, 0.0], [1.0, 0.0])
    assert got == pytest.approx(2.0)


def test_hamming_metric():
    h = metrics.Hamming()
    assert h(0b1011, 0b0010) == 2
    np.testing.assert_array_equal(h.batch(5, np.asarray([5, 4, 7], np.int64)), [0, 1, 1])


def test_registry_surface():
    reg = metrics.registry()
    for name in ["euclidian", "manhatten", "euclidian_thresholded", "cosine",
                 "p_norm", "twed", "ssim", "edit", "hamming", "planar_deg"]:
        assert name in reg


def test_ssim_batch_pairs_matches_pairwise():
    import numpy as np
    from metric_search_ray.metrics import SSIM
    s = SSIM()
    rng = np.random.default_rng(7)
    A = rng.uniform(0, 255, (6, 24, 17))
    B = A + rng.normal(0, 9, A.shape)
    got = s.batch_pairs(A, B)
    want = np.array([s(A[i], B[i]) for i in range(len(A))])
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-14)
