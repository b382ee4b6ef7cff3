"""Baseline JPEG codec (jpegcodec.py).

No reference decoder exists in this sandbox, so evidence is structural:
round-trips across qualities / subsampling / restart layouts satisfy
the PSNR gate, the bitstream is valid per-marker (checked by a
test-side structural parser), restart intervals are value-neutral, and
EXTEND/Huffman edge symbols (ZRL, 16-run zeros, max-category values)
are exercised.
"""

import struct

import numpy as np
import pytest

from metric_search_ray.codecs import psnr
from metric_search_ray.jpegcodec import (
    QUANT_LUM, ZIGZAG, _scaled_quant, jpeg_decode, jpeg_encode)

rng = np.random.default_rng(5)


def smooth(h, w, color=True, seed=0):
    y, x = np.mgrid[0:h, 0:w]
    r = np.random.default_rng(seed)
    a, b, c = r.uniform(8, 30, 3)
    base = 128 + 60 * np.sin(x / a) + 50 * np.cos(y / b) + 10 * np.sin(
        (x + y) / c)
    if color:
        return np.clip(np.stack([base, base * 0.8 + 20, 255 - base * 0.7],
                                -1), 0, 255).astype(np.uint8)
    return np.clip(base, 0, 255).astype(np.uint8)


@pytest.mark.parametrize("color,sub,q,floor", [
    (False, False, 90, 48), (True, False, 90, 44), (True, True, 90, 40),
    (True, False, 75, 42), (True, True, 95, 40),
])
def test_roundtrip_psnr(color, sub, q, floor):
    img = smooth(57, 83, color)
    out = jpeg_decode(jpeg_encode(img, quality=q, subsample=sub))
    assert out.shape == img.shape
    assert psnr(img, out) >= floor


@pytest.mark.parametrize("shape", [(8, 8), (1, 1), (7, 9), (16, 16),
                                   (17, 33), (64, 48)])
def test_odd_sizes_and_edges(shape):
    img = smooth(*shape, color=True, seed=3)
    out = jpeg_decode(jpeg_encode(img, 92))
    assert out.shape == img.shape
    assert psnr(img, out) >= 38  # tiny images have few blocks to average


def test_quality_monotone():
    img = smooth(48, 64, True)
    p = [psnr(img, jpeg_decode(jpeg_encode(img, q))) for q in (30, 60, 95)]
    assert p[0] < p[1] < p[2]
    s = [len(jpeg_encode(img, q)) for q in (30, 60, 95)]
    assert s[0] < s[1] < s[2]


def test_restart_intervals_value_neutral():
    img = smooth(64, 80, True, seed=9)
    base = jpeg_decode(jpeg_encode(img, 85))
    for ri in (1, 3, 7):
        got = jpeg_decode(jpeg_encode(img, 85, restart_interval=ri))
        np.testing.assert_array_equal(got, base)
    # and with subsampling
    base = jpeg_decode(jpeg_encode(img, 85, subsample=True))
    got = jpeg_decode(jpeg_encode(img, 85, subsample=True,
                                  restart_interval=2))
    np.testing.assert_array_equal(got, base)


def test_noise_image_roundtrips_losslessly_at_decode_level():
    # pure noise: PSNR will be low at q90, but decode(encode(x)) must be
    # deterministic and re-decodable (stuffing, EOB-less full blocks,
    # ZRL paths all hit here)
    img = rng.integers(0, 256, (40, 56, 3), dtype=np.uint8)
    buf = jpeg_encode(img, 90)
    out1 = jpeg_decode(buf)
    out2 = jpeg_decode(buf)
    np.testing.assert_array_equal(out1, out2)
    assert psnr(img, out1) > 20


def test_extreme_values_and_long_zero_runs():
    # block with a single hot pixel at the end exercises ZRL chains;
    # flat extremes exercise max DC categories
    img = np.zeros((16, 16), np.uint8)
    img[15, 15] = 255
    out = jpeg_decode(jpeg_encode(img, 95))
    assert out.shape == (16, 16)
    img2 = np.full((8, 8), 255, np.uint8)
    assert psnr(img2, jpeg_decode(jpeg_encode(img2, 95))) > 40


def _segments(buf):
    """Structural walk of the marker stream (independent of decoder)."""
    assert buf[:2] == b"\xff\xd8"
    pos = 2
    segs = []
    while pos < len(buf):
        assert buf[pos] == 0xFF
        m = buf[pos + 1]
        if m == 0xD9:
            segs.append(("EOI", pos))
            break
        (ln,) = struct.unpack_from(">H", buf, pos + 2)
        segs.append((m, pos))
        pos += 2 + ln
        if m == 0xDA:  # entropy data until next real marker
            while True:
                pos = buf.index(b"\xff", pos)
                if buf[pos + 1] == 0x00 or 0xD0 <= buf[pos + 1] <= 0xD7:
                    pos += 2
                    continue
                break
    return segs


def test_bitstream_structure():
    buf = jpeg_encode(smooth(24, 24, True), 85, restart_interval=2)
    markers = [m for m, _ in _segments(buf)]
    assert markers[0] == 0xE0            # JFIF APP0
    assert markers.count(0xDB) == 2      # two quant tables
    assert 0xC0 in markers               # SOF0 baseline
    assert markers.count(0xC4) == 4      # four Huffman tables
    assert 0xDD in markers               # DRI present
    assert markers[-2] == 0xDA and markers[-1] == "EOI"


def test_rejects_non_baseline_and_junk():
    with pytest.raises(ValueError, match="SOI"):
        jpeg_decode(b"\x89PNG....")
    buf = bytearray(jpeg_encode(smooth(16, 16, False), 90))
    i = bytes(buf).index(b"\xff\xc0")
    buf[i + 1] = 0xC2  # pretend progressive
    with pytest.raises(ValueError, match="baseline"):
        jpeg_decode(bytes(buf))
    with pytest.raises(ValueError):
        jpeg_decode(bytes(jpeg_encode(smooth(16, 16, False), 90))[:40])


def test_quality_table_scaling_matches_ijg_formula():
    q50 = _scaled_quant(QUANT_LUM, 50)
    np.testing.assert_array_equal(q50, QUANT_LUM)
    q100 = _scaled_quant(QUANT_LUM, 100)
    assert q100.max() == 1  # quality 100 -> all-ones table
    q10 = _scaled_quant(QUANT_LUM, 10)
    assert (q10 >= QUANT_LUM).all()


def test_zigzag_is_a_permutation_with_spec_anchors():
    assert sorted(ZIGZAG.tolist()) == list(range(64))
    # spec anchors: starts 0,1,8,16,9,2; ends ...,55,62,63
    assert ZIGZAG[:6].tolist() == [0, 1, 8, 16, 9, 2]
    assert ZIGZAG[-3:].tolist() == [55, 62, 63]


def test_engine_dispatch_and_validate_stage(ray_session):
    import pyarrow as pa
    import ray.data as rd
    from metric_search_ray import codecs, phash
    from metric_search_ray.stages import decode as dstage

    imgs = [smooth(32, 32, False, seed=s) for s in range(8)]
    rows = []
    for i, im in enumerate(imgs):
        buf = codecs.encode(im, "jpeg")
        dec = codecs.decode(buf, "jpeg")
        rows.append({"image_id": f"j{i}", "bytes": buf, "w": 32, "h": 32,
                     "fmt": "jpeg", "caption": f"c{i}",
                     "phash": int(phash.phash64(dec.astype(np.float64)))})
    t = pa.table({k: pa.array([r[k] for r in rows]) for k in rows[0]})
    out = (rd.from_arrow(t)
           .map_batches(dstage.DecodeValidate, batch_format="pyarrow",
                        concurrency=1)
           .to_pandas())
    assert out["valid"].all()
