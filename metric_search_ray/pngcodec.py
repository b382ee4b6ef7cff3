"""Pure numpy + zlib PNG codec (no PIL in this environment).

Closes the real-format gap flagged in round 2: a user feeding actual
``.png`` bytes previously hit the ``NotImplementedError`` stub in
``pipelines/multimodal.py``.  This is a from-scratch implementation of
the PNG spec (RFC 2083 / W3C PNG 1.2) over stdlib ``zlib`` — decode
supports every filter type (None/Sub/Up/Average/Paeth) and color types
0 (gray), 2 (RGB), 3 (palette, with optional tRNS alpha), 4 (gray+alpha)
and 6 (RGBA) at bit depth 8, non-interlaced.  Encode emits filter-0
scanlines (always valid; favors throughput over ratio — the engine's
lossless invariant is exactness, not size).

Out of scope (loud ``ValueError``, never a wrong image): bit depths
other than 8 and Adam7 interlacing.

Performance notes for the hot path (actor-pool decode stages):
- filters 0/2 are fully vectorized; Sub is a per-channel ``cumsum``
  (mod-256 via uint8 wraparound of int32 sums is wrong — we mod
  explicitly); Average/Paeth carry a left-pixel dependency and run a
  per-column loop vectorized across channels (w iterations per row,
  worst case).  Filter-0-encoded files (ours) decode with zero Python
  per-pixel work.
- CRCs are verified with ``zlib.crc32`` per chunk.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"
# color type -> samples per pixel
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))


def png_encode(pix: np.ndarray, level: int = 6) -> bytes:
    """uint8 (h,w) | (h,w,2) | (h,w,3) | (h,w,4) -> PNG bytes.

    Channel count maps to color type 0/4/2/6.  Scanlines use filter 0
    (None): lossless round-trip is the contract (PSNR = inf)."""
    pix = np.ascontiguousarray(pix, np.uint8)
    if pix.ndim == 2:
        h, w = pix.shape
        ch, ctype = 1, 0
    elif pix.ndim == 3 and pix.shape[2] in (2, 3, 4):
        h, w, ch = pix.shape
        ctype = {2: 4, 3: 2, 4: 6}[ch]
    else:
        raise ValueError(f"unsupported pixel shape {pix.shape}")
    if h == 0 or w == 0:
        raise ValueError("empty image")
    stride = w * ch
    raw = np.zeros((h, 1 + stride), np.uint8)
    raw[:, 1:] = pix.reshape(h, stride)
    idat = zlib.compress(raw.tobytes(), level)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat)
            + _chunk(b"IEND", b""))


def _unfilter(data: bytes, h: int, w: int, bpp: int) -> np.ndarray:
    """Invert PNG scanline filtering -> (h, w*bpp) uint8."""
    stride = w * bpp
    need = h * (1 + stride)
    if len(data) < need:
        raise ValueError(f"PNG pixel data truncated: {len(data)} < {need}")
    arr = np.frombuffer(data, np.uint8, count=need).reshape(h, 1 + stride)
    ftypes = arr[:, 0]
    out = np.zeros((h, stride), np.uint8)
    prev = np.zeros(stride, np.int32)
    for y in range(h):
        f = int(ftypes[y])
        raw = arr[y, 1:].astype(np.int32)
        if f == 0:
            cur = raw
        elif f == 1:  # Sub: out[x] = raw[x] + out[x-1] per channel
            cur = np.cumsum(raw.reshape(w, bpp), axis=0).ravel() & 0xFF
        elif f == 2:  # Up
            cur = (raw + prev) & 0xFF
        elif f == 3:  # Average — left-decoded dependency: column loop
            r = raw.reshape(w, bpp)
            p = prev.reshape(w, bpp)
            c = np.empty((w, bpp), np.int32)
            left = np.zeros(bpp, np.int32)
            for x in range(w):
                left = (r[x] + ((left + p[x]) >> 1)) & 0xFF
                c[x] = left
            cur = c.ravel()
        elif f == 4:  # Paeth — column loop, vectorized over channels
            r = raw.reshape(w, bpp)
            p = prev.reshape(w, bpp)
            c = np.empty((w, bpp), np.int32)
            left = np.zeros(bpp, np.int32)
            upleft = np.zeros(bpp, np.int32)
            for x in range(w):
                up = p[x]
                est = left + up - upleft
                pa_ = np.abs(est - left)
                pb = np.abs(est - up)
                pc = np.abs(est - upleft)
                pred = np.where((pa_ <= pb) & (pa_ <= pc), left,
                                np.where(pb <= pc, up, upleft))
                left = (r[x] + pred) & 0xFF
                upleft = up
                c[x] = left
            cur = c.ravel()
        else:
            raise ValueError(f"bad PNG filter type {f} on row {y}")
        out[y] = cur
        prev = cur if cur.dtype == np.int32 else cur.astype(np.int32)
    return out


def png_decode(buf: bytes, check_crc: bool = True) -> np.ndarray:
    """PNG bytes -> uint8 array (h,w) gray, (h,w,2) gray+alpha,
    (h,w,3) RGB, or (h,w,4) RGBA.  Palette images expand through PLTE
    (plus tRNS alpha when present)."""
    if not buf.startswith(_SIG):
        raise ValueError("not a PNG stream (bad signature)")
    pos = len(_SIG)
    ihdr = None
    plte = None
    trns = None
    idats = []
    seen_iend = False
    n = len(buf)
    while pos + 8 <= n:
        (length,) = struct.unpack_from(">I", buf, pos)
        tag = buf[pos + 4:pos + 8]
        data = buf[pos + 8:pos + 8 + length]
        if len(data) != length:
            raise ValueError(f"truncated PNG chunk {tag!r}")
        if check_crc:
            (crc,) = struct.unpack_from(">I", buf, pos + 8 + length)
            if crc != (zlib.crc32(tag + data) & 0xFFFFFFFF):
                raise ValueError(f"PNG chunk {tag!r} CRC mismatch")
        pos += 12 + length
        if tag == b"IHDR":
            ihdr = data
        elif tag == b"PLTE":
            plte = data
        elif tag == b"tRNS":
            trns = data
        elif tag == b"IDAT":
            idats.append(data)
        elif tag == b"IEND":
            seen_iend = True
            break
        # ancillary chunks (gAMA, pHYs, tEXt, ...) are skipped
    if ihdr is None or not idats or not seen_iend:
        raise ValueError("PNG missing IHDR/IDAT/IEND")
    w, h, depth, ctype, comp, filt, interlace = struct.unpack(
        ">IIBBBBB", ihdr)
    if comp != 0 or filt != 0:
        raise ValueError("unsupported PNG compression/filter method")
    if interlace != 0:
        raise ValueError("Adam7 interlaced PNG unsupported")
    if depth != 8:
        raise ValueError(f"PNG bit depth {depth} unsupported (8 only)")
    if ctype not in _CHANNELS:
        raise ValueError(f"unknown PNG color type {ctype}")
    if w == 0 or h == 0:
        raise ValueError("empty PNG image")
    bpp = _CHANNELS[ctype]
    data = zlib.decompress(b"".join(idats))
    flat = _unfilter(data, h, w, bpp)
    if ctype == 3:
        if plte is None or len(plte) % 3:
            raise ValueError("palette PNG missing/invalid PLTE")
        pal = np.frombuffer(plte, np.uint8).reshape(-1, 3)
        idx = flat.reshape(h, w)
        if idx.max(initial=0) >= len(pal):
            raise ValueError("palette index out of range")
        rgb = pal[idx]
        if trns is not None:
            alpha = np.full(len(pal), 255, np.uint8)
            a = np.frombuffer(trns, np.uint8)
            alpha[:len(a)] = a
            return np.dstack([rgb, alpha[idx]])
        return rgb
    if bpp == 1:
        return flat.reshape(h, w)
    return flat.reshape(h, w, bpp)
