"""Image codecs (pure numpy): lossless PPM/PGM and a lossy DCT codec.

PIL is unavailable in this environment, so the engine ships its own
codecs to make the per-row invariant of the target rule testable:
decoded pixels must match the source exactly for lossless rows and at
PSNR >= 40 dB for lossy rows, captions byte-equal (BASELINE.json
input_hint).

- ``ppm``: binary PPM (P6, RGB) / PGM (P5, gray).  Lossless, PSNR = inf.
- ``qdct``: 8x8 orthonormal block-DCT with uniform quantization step Q.
  Uniform quantization of an orthonormal transform gives per-pixel
  MSE ~= Q^2/12; Q=6 -> PSNR ~= 43 dB, comfortably above the 40 dB
  gate by construction (calibration asserted in tests).

Pixel model everywhere: uint8 array of shape (h, w) or (h, w, 3).
"""

from __future__ import annotations

import numpy as np

QDCT_MAGIC = b"QDM1"
QDCT_DEFAULT_Q = 6


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    mse = np.mean((a - b) ** 2)
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(255.0**2 / mse))


# ---------------------------------------------------------------- PPM / PGM


def ppm_encode(pix: np.ndarray) -> bytes:
    pix = np.ascontiguousarray(pix, np.uint8)
    if pix.ndim == 2:
        h, w = pix.shape
        return b"P5\n%d %d\n255\n" % (w, h) + pix.tobytes()
    if pix.ndim == 3 and pix.shape[2] == 3:
        h, w, _ = pix.shape
        return b"P6\n%d %d\n255\n" % (w, h) + pix.tobytes()
    raise ValueError(f"unsupported pixel shape {pix.shape}")


def ppm_decode(buf: bytes) -> np.ndarray:
    if not (buf.startswith(b"P5") or buf.startswith(b"P6")):
        raise ValueError("not a P5/P6 stream")
    # header: magic ws w ws h ws maxval + exactly ONE ws, then raw raster.
    # A naive split(None) would also strip raster bytes that happen to be
    # whitespace values (0x09/0x0a/0x20...), corrupting the image.
    magic = buf[:2]
    pos = 2
    vals = []
    while len(vals) < 3:
        while buf[pos] in b" \t\r\n":
            pos += 1
        start = pos
        while buf[pos] not in b" \t\r\n":
            pos += 1
        vals.append(int(buf[start:pos]))
    pos += 1  # the single whitespace byte after maxval
    w, h, maxval = vals
    if maxval != 255:
        raise ValueError("only maxval=255 supported")
    if magic == b"P5":
        return np.frombuffer(buf, np.uint8, count=w * h, offset=pos).reshape(h, w)
    return np.frombuffer(buf, np.uint8, count=w * h * 3, offset=pos).reshape(h, w, 3)


# ---------------------------------------------------------------- QDCT

def _dct_mat(n: int) -> np.ndarray:
    """Orthonormal DCT-II matrix (n x n)."""
    k = np.arange(n)[:, None]
    i = np.arange(n)[None, :]
    m = np.cos(np.pi * (2 * i + 1) * k / (2 * n)) * np.sqrt(2.0 / n)
    m[0] /= np.sqrt(2.0)
    return m


_D8 = _dct_mat(8)


def _blockify(ch: np.ndarray) -> tuple[np.ndarray, int, int]:
    h, w = ch.shape
    ph, pw = (-h) % 8, (-w) % 8
    ch = np.pad(ch, ((0, ph), (0, pw)), mode="edge")
    H, W = ch.shape
    blocks = ch.reshape(H // 8, 8, W // 8, 8).transpose(0, 2, 1, 3)
    return blocks, H, W


def qdct_encode(pix: np.ndarray, q: int = QDCT_DEFAULT_Q) -> bytes:
    pix = np.asarray(pix, np.uint8)
    gray = pix.ndim == 2
    chans = pix[..., None] if gray else pix
    h, w, c = chans.shape
    out = [QDCT_MAGIC, np.asarray([h, w], np.uint32).tobytes(),
           np.asarray([c, q], np.uint8).tobytes()]
    for ci in range(c):
        blocks, _, _ = _blockify(chans[:, :, ci].astype(np.float64) - 128.0)
        coef = np.einsum("ab,ijbc,dc->ijad", _D8, blocks, _D8)
        qc = np.rint(coef / q).astype(np.int16)
        out.append(qc.tobytes())
    return b"".join(out)


def qdct_decode(buf: bytes) -> np.ndarray:
    if buf[:4] != QDCT_MAGIC:
        raise ValueError("not a QDCT stream")
    h, w = np.frombuffer(buf, np.uint32, count=2, offset=4)
    c, q = np.frombuffer(buf, np.uint8, count=2, offset=12)
    h, w, c, q = int(h), int(w), int(c), int(q)
    bh, bw = -(-h // 8), -(-w // 8)
    per = bh * bw * 64
    chans = []
    off = 14
    for ci in range(c):
        qc = np.frombuffer(buf, np.int16, count=per, offset=off).reshape(bh, bw, 8, 8)
        off += per * 2
        coef = qc.astype(np.float64) * q
        blocks = np.einsum("ba,ijbc,cd->ijad", _D8, coef, _D8)
        ch = blocks.transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)[:h, :w] + 128.0
        chans.append(np.clip(np.rint(ch), 0, 255).astype(np.uint8))
    out = np.stack(chans, axis=-1)
    return out[:, :, 0] if c == 1 else out


def qdct_decode_many(bufs: list) -> list:
    """Decode many QDCT buffers with ONE inverse-DCT einsum per
    (h, w, q) group (bit-identical per image to ``qdct_decode``;
    color or odd streams fall back per-buffer).  Raises like
    ``qdct_decode`` on a malformed stream."""
    from collections import defaultdict

    groups: dict = defaultdict(list)
    for i, buf in enumerate(bufs):
        if buf[:4] != QDCT_MAGIC:
            raise ValueError("not a QDCT stream")
        h, w = np.frombuffer(buf, np.uint32, count=2, offset=4)
        c, q = np.frombuffer(buf, np.uint8, count=2, offset=12)
        groups[(int(h), int(w), int(c), int(q))].append(i)
    out: list = [None] * len(bufs)
    for (h, w, c, q), idxs in groups.items():
        if c != 1:
            for i in idxs:
                out[i] = qdct_decode(bufs[i])
            continue
        bh, bw = -(-h // 8), -(-w // 8)
        per = bh * bw * 64
        qc = np.stack([np.frombuffer(bufs[i], np.int16, count=per, offset=14
                                     ).reshape(bh, bw, 8, 8) for i in idxs])
        blocks = np.einsum("ba,nijbc,cd->nijad", _D8,
                           qc.astype(np.float64) * q, _D8)
        ch = (blocks.transpose(0, 1, 3, 2, 4)
              .reshape(len(idxs), bh * 8, bw * 8)[:, :h, :w] + 128.0)
        dec = np.clip(np.rint(ch), 0, 255).astype(np.uint8)
        for j, i in enumerate(idxs):
            out[i] = dec[j]
    return out


def decode_many(bufs: list, fmts: list) -> list:
    """Decode a batch, batching the QDCT inverse transform by size
    group.  Per-buffer errors propagate like ``decode`` — callers that
    tolerate bad rows should catch per row (see stages/decode.py)."""
    idx_q = [i for i, f in enumerate(fmts) if f == "qdct"]
    out: list = [None] * len(bufs)
    if idx_q:
        dec = qdct_decode_many([bufs[i] for i in idx_q])
        for j, i in enumerate(idx_q):
            out[i] = dec[j]
    for i, (buf, fmt) in enumerate(zip(bufs, fmts)):
        if out[i] is None:
            out[i] = decode(buf, fmt)
    return out


def qdct_roundtrip_batch(stack: np.ndarray,
                         q: int = QDCT_DEFAULT_Q) -> np.ndarray:
    """encode->decode roundtrip of a same-size GRAY (n, h, w) uint8
    stack without serialization — the same quantize/dequantize math as
    ``qdct_decode(qdct_encode(pix))`` with one leading batch dim (used
    by the validate stage's batched PSNR gate; parity-tested)."""
    n, h, w = stack.shape
    ph, pw = (-h) % 8, (-w) % 8
    ch = np.pad(stack.astype(np.float64) - 128.0,
                ((0, 0), (0, ph), (0, pw)), mode="edge")
    H, W = ch.shape[1:]
    blocks = ch.reshape(n, H // 8, 8, W // 8, 8).transpose(0, 1, 3, 2, 4)
    coef = np.einsum("ab,nijbc,dc->nijad", _D8, blocks, _D8)
    qc = np.rint(coef / q).astype(np.int16)
    blocks2 = np.einsum("ba,nijbc,cd->nijad", _D8, qc.astype(np.float64) * q,
                        _D8)
    out = blocks2.transpose(0, 1, 3, 2, 4).reshape(n, H, W)[:, :h, :w] + 128.0
    return np.clip(np.rint(out), 0, 255).astype(np.uint8)


def psnr_batch(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Per-image PSNR of two (n, h, w) stacks (inf where identical)."""
    d = a.astype(np.float64) - b.astype(np.float64)
    mse = (d * d).mean(axis=(1, 2))
    with np.errstate(divide="ignore"):
        return np.where(mse == 0, np.inf, 10.0 * np.log10(255.0**2
                                                          / np.maximum(mse, 1e-300)))


# ---------------------------------------------------------------- dispatch

from .pngcodec import png_decode, png_encode  # noqa: E402
from .jpegcodec import jpeg_decode, jpeg_encode  # noqa: E402

CODECS = {
    "ppm": (ppm_encode, ppm_decode),
    "qdct": (lambda p: qdct_encode(p), qdct_decode),
    # real containers: pure-numpy PNG (lossless) + baseline JPEG (lossy)
    "png": (png_encode, png_decode),
    "jpeg": (lambda p: jpeg_encode(p), jpeg_decode),
}


def encode(pix: np.ndarray, fmt: str) -> bytes:
    try:
        enc, _ = CODECS[fmt]
    except KeyError:
        raise ValueError(f"unknown fmt {fmt!r}") from None
    return enc(pix)


def decode(buf: bytes, fmt: str) -> np.ndarray:
    try:
        _, dec = CODECS[fmt]
    except KeyError:
        raise ValueError(f"unknown fmt {fmt!r}") from None
    return dec(buf)
