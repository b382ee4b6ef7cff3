"""64-bit perceptual hash + Hamming popcount, pure numpy.

The target rule adds a Hamming metric over ``phash:int64`` to the
reference's metric enum (the reference has no phash; its closest image
metric is SSIM, n-api/metric_distance/details/SSIM.cpp).

Definition used here (gradient hash, the "dHash" family): gray ->
bilinear resample to 8 rows x 9 cols -> bit (r, c) = pixel(r, c+1) >
pixel(r, c), 64 bits row-major.  Chosen over the classic median-DCT
pHash because median-thresholded DCT bits are unstable for
sparse-spectrum images (half the low-frequency coefficients sit at ~0
and flip under tiny noise); the gradient hash gives near-duplicate
Hamming <= ~6 vs random-pair ~32 on the fixture corpus (asserted in
tests/test_phash.py).  ``dct_phash64`` keeps the classic DCT variant
for completeness.

Stored as signed int64 (two's-complement view of the uint64 word) to
fit the Arrow/parquet column type of the input schema.
"""

from __future__ import annotations

import numpy as np

from .codecs import _dct_mat

_D32 = _dct_mat(32)
_BITVALS = (np.uint64(1) << np.arange(64, dtype=np.uint64))


def to_gray(pix: np.ndarray) -> np.ndarray:
    pix = np.asarray(pix)
    if pix.ndim == 3:
        return pix.astype(np.float64).mean(axis=2)
    return pix.astype(np.float64)


def _resize32(g: np.ndarray) -> np.ndarray:
    """Bilinear resample to 32x32 (align-corners=False convention)."""
    h, w = g.shape
    if (h, w) == (32, 32):
        return g
    ys = (np.arange(32) + 0.5) * h / 32 - 0.5
    xs = (np.arange(32) + 0.5) * w / 32 - 0.5
    y0 = np.clip(np.floor(ys).astype(int), 0, h - 1)
    x0 = np.clip(np.floor(xs).astype(int), 0, w - 1)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    fy = np.clip(ys - y0, 0, 1)[:, None]
    fx = np.clip(xs - x0, 0, 1)[None, :]
    a = g[np.ix_(y0, x0)] * (1 - fy) * (1 - fx)
    b = g[np.ix_(y0, x1)] * (1 - fy) * fx
    c = g[np.ix_(y1, x0)] * fy * (1 - fx)
    d = g[np.ix_(y1, x1)] * fy * fx
    return a + b + c + d


def _resize(g: np.ndarray, oh: int, ow: int) -> np.ndarray:
    """Bilinear resample to (oh, ow) (align-corners=False convention)."""
    h, w = g.shape
    ys = (np.arange(oh) + 0.5) * h / oh - 0.5
    xs = (np.arange(ow) + 0.5) * w / ow - 0.5
    y0 = np.clip(np.floor(ys).astype(int), 0, h - 1)
    x0 = np.clip(np.floor(xs).astype(int), 0, w - 1)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    fy = np.clip(ys - y0, 0, 1)[:, None]
    fx = np.clip(xs - x0, 0, 1)[None, :]
    return (g[np.ix_(y0, x0)] * (1 - fy) * (1 - fx) + g[np.ix_(y0, x1)] * (1 - fy) * fx
            + g[np.ix_(y1, x0)] * fy * (1 - fx) + g[np.ix_(y1, x1)] * fy * fx)


def phash64(pix: np.ndarray) -> int:
    """Perceptual (gradient) hash of one image -> signed int64."""
    s = _resize(to_gray(pix), 8, 9)
    bits = (s[:, 1:] > s[:, :-1]).astype(np.uint64).ravel()
    word = np.uint64(np.sum(bits * _BITVALS, dtype=np.uint64))
    return int(word.astype(np.int64))


def _resize_batch(g: np.ndarray, oh: int, ow: int) -> np.ndarray:
    """(n, h, w) -> (n, oh, ow), bit-identical per element to ``_resize``
    (same expression shape and multiply order, one leading batch dim)."""
    _, h, w = g.shape
    ys = (np.arange(oh) + 0.5) * h / oh - 0.5
    xs = (np.arange(ow) + 0.5) * w / ow - 0.5
    y0 = np.clip(np.floor(ys).astype(int), 0, h - 1)
    x0 = np.clip(np.floor(xs).astype(int), 0, w - 1)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    fy = np.clip(ys - y0, 0, 1)[None, :, None]
    fx = np.clip(xs - x0, 0, 1)[None, None, :]
    iy0, ix0 = y0[:, None], x0[None, :]
    iy1, ix1 = y1[:, None], x1[None, :]
    return (g[:, iy0, ix0] * (1 - fy) * (1 - fx)
            + g[:, iy0, ix1] * (1 - fy) * fx
            + g[:, iy1, ix0] * fy * (1 - fx)
            + g[:, iy1, ix1] * fy * fx)


def phash64_batch(stack: np.ndarray) -> np.ndarray:
    """Gradient hash of a (n, h, w) same-size gray stack -> int64 (n,).
    Bit-identical to per-image ``phash64`` (parity-tested)."""
    if len(stack) == 0:
        return np.empty(0, np.int64)
    s = _resize_batch(np.asarray(stack, np.float64), 8, 9)
    bits = (s[:, :, 1:] > s[:, :, :-1]).reshape(len(stack), 64).astype(
        np.uint64)
    return (bits * _BITVALS[None, :]).sum(axis=1, dtype=np.uint64).astype(
        np.int64)


def dct_phash64(pix: np.ndarray) -> int:
    """Classic median-DCT pHash (kept for completeness; see module doc)."""
    g = _resize32(to_gray(pix))
    coef = _D32 @ g @ _D32.T
    low = coef[:8, :8].ravel()
    med = np.median(low[1:])
    bits = (low > med).astype(np.uint64)
    word = np.uint64(np.sum(bits * _BITVALS, dtype=np.uint64))
    return int(word.astype(np.int64))


def popcount64(x: np.ndarray) -> np.ndarray:
    """SWAR popcount over uint64 (numpy<2 has no bit_count ufunc)."""
    x = np.asarray(x).astype(np.uint64)
    x = x - ((x >> np.uint64(1)) & np.uint64(0x5555555555555555))
    x = (x & np.uint64(0x3333333333333333)) + ((x >> np.uint64(2)) & np.uint64(0x3333333333333333))
    x = (x + (x >> np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    with np.errstate(over="ignore"):  # modular multiply is intentional
        return ((x * np.uint64(0x0101010101010101)) >> np.uint64(56)).astype(np.int64)


def hamming(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Elementwise Hamming distance between int64 phashes."""
    ua = np.asarray(a, np.int64).astype(np.uint64)
    ub = np.asarray(b, np.int64).astype(np.uint64)
    return popcount64(ua ^ ub)


def hamming_matrix(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Pairwise Hamming distances, shape (len(a), len(b))."""
    ua = np.asarray(a, np.int64).astype(np.uint64)[:, None]
    ub = np.asarray(b, np.int64).astype(np.uint64)[None, :]
    return popcount64(ua ^ ub)
