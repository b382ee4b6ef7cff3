import numpy as np

from metric_search_ray import codecs


def _img(seed, shape):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, shape).astype(np.uint8)


def test_ppm_roundtrip_gray_and_rgb():
    for shape in [(16, 16), (32, 64), (17, 23), (16, 16, 3), (33, 31, 3)]:
        pix = _img(1, shape)
        buf = codecs.ppm_encode(pix)
        out = codecs.ppm_decode(buf)
        assert out.shape == pix.shape
        assert np.array_equal(out, pix)
        assert codecs.psnr(pix, out) == float("inf")


def test_qdct_psnr_gate():
    """Calibration: the lossy codec must clear the 40 dB gate by construction."""
    for shape in [(16, 16), (64, 64), (33, 31), (32, 32, 3)]:
        pix = _img(2, shape)
        out = codecs.qdct_decode(codecs.qdct_encode(pix))
        assert out.shape == pix.shape
        assert codecs.psnr(pix, out) >= 40.0


def test_qdct_smooth_image_near_lossless():
    yy, xx = np.mgrid[0:32, 0:32]
    pix = ((xx + yy) * 2).astype(np.uint8)
    out = codecs.qdct_decode(codecs.qdct_encode(pix))
    assert codecs.psnr(pix, out) >= 45.0


def test_dispatch():
    pix = _img(3, (16, 16))
    for fmt in ("ppm", "qdct"):
        out = codecs.decode(codecs.encode(pix, fmt), fmt)
        assert out.shape == pix.shape
