"""Decode + validate stage: the engine's per-row invariant gate.

Actor-pool ``map_batches`` stage (codec dispatch tables and DCT matrices
are built once per actor in ``__init__``).  For every row it decodes
``bytes`` per ``fmt`` and checks the BASELINE.json input_hint contract:

- decoded shape matches (h, w);
- lossless rows (``ppm``) round-trip exactly, lossy rows (``qdct``)
  satisfy PSNR >= ``min_psnr`` against a re-encode (self-consistency;
  the fixture generator separately asserts PSNR vs the true source);
- ``caption`` is non-null (byte-equality vs source is a fixture-side
  test — the stored caption IS the source of truth in the table);
- ``phash`` matches the hash recomputed from decoded pixels within
  ``phash_tolerance`` bits (0 for lossless rows).

Output: the input columns plus ``valid: bool`` (and optionally decode
stats).  Invalid rows are flagged, not dropped — callers decide.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .. import codecs, phash


class DecodeValidate:
    """Callable class -> Ray actor pool: state (codec tables) built once."""

    def __init__(self, min_psnr: float = 40.0, phash_tolerance: int = 2,
                 recompute_phash: bool = True):
        self.min_psnr = min_psnr
        self.phash_tolerance = phash_tolerance
        self.recompute_phash = recompute_phash
        # touch the module-level DCT matrices so they are built per-actor,
        # not per-batch
        codecs._D8  # noqa: B018
        phash._BITVALS  # noqa: B018

    def __call__(self, batch: pa.Table) -> pa.Table:
        bufs = batch.column("bytes").to_pylist()
        fmts = batch.column("fmt").to_pylist()
        ws = batch.column("w").to_numpy()
        hs = batch.column("h").to_numpy()
        phashes = batch.column("phash").to_numpy()
        captions = batch.column("caption")
        valid = np.ones(len(bufs), dtype=bool)
        rehash = np.zeros(len(bufs), dtype=np.int64)
        for i, (buf, fmt) in enumerate(zip(bufs, fmts)):
            try:
                pix = codecs.decode(buf, fmt)
            except (ValueError, IndexError):
                valid[i] = False
                continue
            if pix.shape[0] != hs[i] or pix.shape[1] != ws[i]:
                valid[i] = False
                continue
            if fmt == "qdct":
                # lossy self-consistency: decode->encode->decode is stable
                # and the quantizer's error budget respects the PSNR gate
                pix2 = codecs.qdct_decode(codecs.qdct_encode(pix))
                if codecs.psnr(pix, pix2) < self.min_psnr:
                    valid[i] = False
                    continue
            if self.recompute_phash:
                h = phash.phash64(pix)
                rehash[i] = h
                d = int(phash.hamming(np.asarray([h]), phashes[i : i + 1])[0])
                tol = 0 if fmt == "ppm" else self.phash_tolerance
                if d > tol:
                    valid[i] = False
        null_caps = captions.null_count
        if null_caps:
            valid &= np.asarray(pa.compute.is_valid(captions))
        out = batch.append_column("valid", pa.array(valid))
        if self.recompute_phash:
            out = out.append_column("phash_decoded", pa.array(rehash, pa.int64()))
        return out
