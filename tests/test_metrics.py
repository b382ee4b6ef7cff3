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
