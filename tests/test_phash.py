import numpy as np

from metric_search_ray import phash


def test_popcount_matches_python():
    rng = np.random.default_rng(0)
    x = rng.integers(0, 2**63, 200, dtype=np.int64).astype(np.uint64)
    expect = np.asarray([bin(int(v)).count("1") for v in x])
    assert np.array_equal(phash.popcount64(x), expect)


def test_hamming_identical_zero():
    rng = np.random.default_rng(1)
    pix = rng.integers(0, 256, (32, 32)).astype(np.uint8)
    h1 = phash.phash64(pix)
    h2 = phash.phash64(pix.copy())
    assert phash.hamming(np.asarray([h1]), np.asarray([h2]))[0] == 0


def test_near_duplicate_close_random_far():
    rng = np.random.default_rng(2)
    yy, xx = np.mgrid[0:32, 0:32].astype(np.float64)
    a = np.clip(127 + 90 * np.sin(0.2 * xx) + 40 * np.cos(0.3 * yy), 0, 255).astype(np.uint8)
    b = np.clip(a.astype(np.int16) + rng.integers(-2, 3, a.shape), 0, 255).astype(np.uint8)
    c = np.clip(127 + 90 * np.sin(0.33 * yy + 1) + 40 * np.cos(0.11 * xx + 2), 0, 255).astype(np.uint8)
    d_ab = phash.hamming(np.asarray([phash.phash64(a)]), np.asarray([phash.phash64(b)]))[0]
    d_ac = phash.hamming(np.asarray([phash.phash64(a)]), np.asarray([phash.phash64(c)]))[0]
    assert d_ab <= 6
    assert d_ac > d_ab


def test_hamming_matrix_shape():
    rng = np.random.default_rng(3)
    a = rng.integers(-2**62, 2**62, 5, dtype=np.int64)
    b = rng.integers(-2**62, 2**62, 7, dtype=np.int64)
    m = phash.hamming_matrix(a, b)
    assert m.shape == (5, 7)
    assert m[2, 3] == phash.hamming(a[2:3], b[3:4])[0]
