"""PNG + WAV real-container codecs.

The PNG decoder must invert scanline filtering for ALL five filter
types, not just the filter-0 rows our encoder emits — so the test
carries its own independent forward-filter implementation written
directly from the spec (per-byte loops, no shared code with
pngcodec.py) and hand-assembles PNG streams row-filtered every way.
"""

import struct
import zlib

import numpy as np
import pytest

from metric_search_ray.pngcodec import png_decode, png_encode
from metric_search_ray.pipelines.multimodal import (
    AudioFeatures, _decode_wav, encode_wav)
import pyarrow as pa

rng = np.random.default_rng(7)


# ------------------------------------------------ independent forward filter

def _paeth(a, b, c):
    p = a + b - c
    pa_, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa_ <= pb and pa_ <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _filter_rows(pix: np.ndarray, ftype_of_row) -> bytes:
    """Spec-literal forward filtering (slow per-byte Python)."""
    if pix.ndim == 2:
        pix = pix[:, :, None]
    h, w, ch = pix.shape
    stride = w * ch
    flat = pix.reshape(h, stride).astype(int)
    out = bytearray()
    for y in range(h):
        f = ftype_of_row(y)
        out.append(f)
        for i in range(stride):
            x = flat[y, i]
            left = flat[y, i - ch] if i >= ch else 0
            up = flat[y - 1, i] if y > 0 else 0
            upleft = flat[y - 1, i - ch] if (y > 0 and i >= ch) else 0
            if f == 0:
                v = x
            elif f == 1:
                v = x - left
            elif f == 2:
                v = x - up
            elif f == 3:
                v = x - (left + up) // 2
            else:
                v = x - _paeth(left, up, upleft)
            out.append(v & 0xFF)
    return bytes(out)


def _assemble(w, h, ctype, raw, plte=None, trns=None):
    def chunk(tag, data):
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))
    png = b"\x89PNG\r\n\x1a\n"
    png += chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0))
    if plte is not None:
        png += chunk(b"PLTE", plte)
    if trns is not None:
        png += chunk(b"tRNS", trns)
    # split IDAT to exercise multi-chunk concatenation
    z = zlib.compress(raw)
    mid = len(z) // 2
    png += chunk(b"IDAT", z[:mid]) + chunk(b"IDAT", z[mid:])
    png += chunk(b"IEND", b"")
    return png


CTYPE_OF_CH = {1: 0, 2: 4, 3: 2, 4: 6}


@pytest.mark.parametrize("ch", [1, 2, 3, 4])
@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_decode_inverts_every_filter(ch, ftype):
    shape = (11, 7) if ch == 1 else (11, 7, ch)
    pix = rng.integers(0, 256, shape, dtype=np.uint8)
    raw = _filter_rows(pix, lambda y: ftype)
    got = png_decode(_assemble(7, 11, CTYPE_OF_CH[ch], raw))
    np.testing.assert_array_equal(got, pix)


def test_decode_mixed_filters_per_row():
    pix = rng.integers(0, 256, (23, 13, 3), dtype=np.uint8)
    raw = _filter_rows(pix, lambda y: y % 5)
    got = png_decode(_assemble(13, 23, 2, raw))
    np.testing.assert_array_equal(got, pix)


@pytest.mark.parametrize("shape", [(1, 1), (1, 1, 3), (37, 1, 4),
                                   (1, 53), (64, 48, 3), (5, 300, 2)])
def test_roundtrip(shape):
    pix = rng.integers(0, 256, shape, dtype=np.uint8)
    got = png_decode(png_encode(pix))
    np.testing.assert_array_equal(got, pix)


def test_palette_with_and_without_trns():
    idx = rng.integers(0, 5, (9, 6), dtype=np.uint8)
    pal = rng.integers(0, 256, (5, 3), dtype=np.uint8)
    raw = _filter_rows(idx, lambda y: y % 5)
    got = png_decode(_assemble(6, 9, 3, raw, plte=pal.tobytes()))
    np.testing.assert_array_equal(got, pal[idx])
    trns = bytes([10, 20, 30])  # first 3 entries translucent, rest 255
    got4 = png_decode(_assemble(6, 9, 3, raw, plte=pal.tobytes(), trns=trns))
    alpha = np.array([10, 20, 30, 255, 255], np.uint8)
    np.testing.assert_array_equal(got4[..., :3], pal[idx])
    np.testing.assert_array_equal(got4[..., 3], alpha[idx])


def test_ancillary_chunks_skipped_and_crc_checked():
    pix = rng.integers(0, 256, (4, 4, 3), dtype=np.uint8)
    buf = bytearray(png_encode(pix))
    # splice a tEXt chunk after IHDR (8 sig + 25 IHDR)
    text = b"spam"
    chunk = (struct.pack(">I", len(text)) + b"tEXt" + text
             + struct.pack(">I", zlib.crc32(b"tEXt" + text) & 0xFFFFFFFF))
    spliced = bytes(buf[:33]) + chunk + bytes(buf[33:])
    np.testing.assert_array_equal(png_decode(spliced), pix)
    # corrupt one IDAT payload byte -> CRC error
    bad = bytearray(spliced)
    bad[33 + len(chunk) + 8] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        png_decode(bytes(bad))


def test_rejects_what_it_cannot_parse():
    with pytest.raises(ValueError, match="signature"):
        png_decode(b"JFIF not a png")
    pix = np.zeros((2, 2), np.uint8)
    raw = _filter_rows(pix, lambda y: 0)
    # 16-bit depth
    def ihdr_variant(depth=8, interlace=0):
        def chunk(tag, data):
            return (struct.pack(">I", len(data)) + tag + data
                    + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))
        return (b"\x89PNG\r\n\x1a\n"
                + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, depth, 0, 0,
                                             0, interlace))
                + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="depth"):
        png_decode(ihdr_variant(depth=16))
    with pytest.raises(ValueError, match="interlace"):
        png_decode(ihdr_variant(interlace=1))


def test_engine_dispatch_includes_png():
    from metric_search_ray import codecs
    pix = rng.integers(0, 256, (8, 9, 3), dtype=np.uint8)
    buf = codecs.encode(pix, "png")
    np.testing.assert_array_equal(codecs.decode(buf, "png"), pix)
    assert codecs.psnr(codecs.decode(buf, "png"), pix) == float("inf")


# ----------------------------------------------------------------- WAV

def test_wav_roundtrip_pcm16_mono():
    s = rng.integers(-32768, 32767, 480, dtype=np.int16)
    rate, got = _decode_wav(encode_wav(16000, s))
    assert rate == 16000
    np.testing.assert_array_equal(got, s)


def test_wav_stereo_downmix_and_widths():
    left = rng.integers(-1000, 1000, 100, dtype=np.int16)
    right = rng.integers(-1000, 1000, 100, dtype=np.int16)
    inter = np.empty(200, np.int16)
    inter[0::2], inter[1::2] = left, right
    rate, got = _decode_wav(encode_wav(8000, inter, channels=2))
    want = np.rint((left.astype(np.float64)
                    + right.astype(np.float64)) / 2).astype(np.int16)
    np.testing.assert_array_equal(got, want)
    # float32 WAV (format 3), hand-assembled
    f = (rng.random(64).astype(np.float32) - 0.5)
    fmt = (b"fmt " + (16).to_bytes(4, "little") + (3).to_bytes(2, "little")
           + (1).to_bytes(2, "little") + (44100).to_bytes(4, "little")
           + (44100 * 4).to_bytes(4, "little") + (4).to_bytes(2, "little")
           + (32).to_bytes(2, "little"))
    data = b"data" + f.nbytes.to_bytes(4, "little") + f.tobytes()
    body = b"WAVE" + fmt + data
    rate, got = _decode_wav(b"RIFF" + len(body).to_bytes(4, "little") + body)
    assert rate == 44100
    want = np.clip(np.rint(f.astype(np.float64) * 32767), -32768,
                   32767).astype(np.int16)
    np.testing.assert_array_equal(got, want)


def test_wav_rejects_junk():
    with pytest.raises(ValueError, match="RIFF"):
        _decode_wav(b"OggS" + b"\x00" * 40)


def test_audio_features_accepts_wav_rows():
    s = (np.sin(np.linspace(0, 40 * np.pi, 8000)) * 12000).astype(np.int16)
    from metric_search_ray.pipelines.multimodal import encode_pcm16
    batch = pa.table({
        "audio_id": pa.array(["a", "b"]),
        "bytes": pa.array([encode_wav(8000, s), encode_pcm16(8000, s)],
                          pa.binary()),
        "fmt": pa.array(["wav", "pcm16"]),
    })
    out = AudioFeatures()(batch)
    f = np.asarray(out.column("features").to_pylist())
    # identical samples through either container -> identical features
    np.testing.assert_allclose(f[0], f[1], rtol=0, atol=0)
    assert f[0][0] == pytest.approx(1.0)  # 8000 samples at 8 kHz
