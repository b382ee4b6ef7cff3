"""Multimodal column stages: opaque binary payloads + typed metadata.

Model: image/audio/video payloads are opaque ``binary`` columns with
typed metadata columns alongside (w, h, fmt / sample_rate, n_samples /
fps, n_frames).  Each transform is an actor-pool ``map_batches`` stage
with real Ray-side plumbing (schema, batch sizing, actor signature,
output layout); decode is REAL for the engine's own codecs
(ppm/qdct via codecs.py), for PNG (from-scratch numpy+zlib,
pngcodec.py), for baseline JPEG (from-scratch numpy entropy+DCT,
jpegcodec.py) and for RIFF/WAV PCM audio (``_decode_wav`` below), and
STUBBED behind ``NotImplementedError`` for container formats whose
libraries aren't in this environment (webp/flac/mp4) — the stub
boundary is explicit per stage.

Batch-size guidance: payload columns dominate block size; callers
should pass small ``batch_size`` (e.g. 64-256) for megapixel images so
batch x concurrency fits worker heaps (the engine's own fixtures are
tiny, but the stage contract is written for real payloads).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .. import codecs

STUBBED_FORMATS = {"webp", "flac", "mp4", "webm"}


def _decode_or_raise(buf: bytes, fmt: str) -> np.ndarray:
    if fmt in codecs.CODECS:
        return codecs.decode(buf, fmt)
    if fmt in STUBBED_FORMATS:
        raise NotImplementedError(
            f"codec {fmt!r} requires an image/audio library not present in "
            "this environment; plug a decoder into codecs.CODECS")
    raise ValueError(f"unknown fmt {fmt!r}")


class ImageResize:
    """Decode -> bilinear resize -> re-encode (same fmt).  Output schema
    mirrors the input with updated (bytes, w, h)."""

    def __init__(self, out_w: int, out_h: int):
        self.out_w, self.out_h = out_w, out_h
        from ..phash import _resize  # bilinear kernel, built once per actor
        self._resize = _resize

    def __call__(self, batch: pa.Table) -> pa.Table:
        bufs = batch.column("bytes").to_pylist()
        fmts = batch.column("fmt").to_pylist()
        out_b = []
        for buf, fmt in zip(bufs, fmts):
            pix = _decode_or_raise(buf, fmt)
            if pix.ndim == 3:
                chans = [self._resize(pix[:, :, c].astype(np.float64),
                                      self.out_h, self.out_w) for c in range(pix.shape[2])]
                rez = np.stack(chans, axis=-1)
            else:
                rez = self._resize(pix.astype(np.float64), self.out_h, self.out_w)
            out_b.append(codecs.encode(np.clip(np.rint(rez), 0, 255).astype(np.uint8), fmt))
        t = batch.drop_columns(["bytes", "w", "h"])
        return (t.append_column("bytes", pa.array(out_b, pa.binary()))
                 .append_column("w", pa.array([self.out_w] * len(out_b), pa.int32()))
                 .append_column("h", pa.array([self.out_h] * len(out_b), pa.int32())))


class ImageFeatures:
    """Decode -> compact feature vector (mean/std/8-bin histogram/edge
    energy) as fixed_size_list<float32, 12> — the model-free stand-in
    for an embedding stage (same actor signature a real model would use:
    weights in __init__, batched inference in __call__)."""

    DIM = 12

    def __call__(self, batch: pa.Table) -> pa.Table:
        from collections import defaultdict

        bufs = batch.column("bytes").to_pylist()
        fmts = batch.column("fmt").to_pylist()
        n = len(bufs)
        feats = np.empty((n, self.DIM), np.float32)
        # decode per row, batch the descriptor math per same-size group
        # (one numpy dispatch per group, not ~7 per image)
        for fmt in set(fmts):
            if fmt not in codecs.CODECS:
                _decode_or_raise(b"", fmt)       # stub/unknown boundary
        pix_list = codecs.decode_many(bufs, fmts)
        groups: dict = defaultdict(list)
        for i, pix in enumerate(pix_list):
            pix = pix.astype(np.float64)
            if pix.ndim == 3:
                pix = pix.mean(axis=2)
            pix_list[i] = pix
            groups[pix.shape].append(i)
        for shape, idx_list in groups.items():
            idxs = np.asarray(idx_list, np.int64)
            stack = np.stack([pix_list[i] for i in idx_list])
            size = shape[0] * shape[1]
            # 8-bin histogram over [0, 256) == floor(v / 32) bincount
            # (np.histogram edge semantics for v in [0, 256))
            bins = np.minimum((stack.reshape(len(idxs), size) // 32.0
                               ).astype(np.int64), 7)
            flat = bins + np.arange(len(idxs), dtype=np.int64)[:, None] * 8
            hist = np.bincount(flat.ravel(),
                               minlength=8 * len(idxs)).reshape(len(idxs), 8)
            feats[idxs, 0] = stack.mean(axis=(1, 2))
            feats[idxs, 1] = stack.std(axis=(1, 2))
            feats[idxs, 2:10] = hist / size
            feats[idxs, 10] = np.abs(np.diff(stack, axis=2)).mean(axis=(1, 2))
            feats[idxs, 11] = np.abs(np.diff(stack, axis=1)).mean(axis=(1, 2))
        return pa.table({
            "image_id": batch.column("image_id"),
            "features": pa.FixedSizeListArray.from_arrays(
                pa.array(feats.ravel(), pa.float32()), self.DIM),
        })


def _decode_pcm16(buf: bytes) -> tuple[int, np.ndarray]:
    """Deterministic raw-audio container: 8-byte header (sample_rate
    uint32 LE, n_samples uint32 LE) + s16le mono samples.  Real RIFF/WAV
    decodes via ``_decode_wav``; flac/mp3 remain stubbed."""
    if len(buf) < 8:
        raise ValueError("pcm16 buffer shorter than its header")
    rate = int.from_bytes(buf[0:4], "little")
    n = int.from_bytes(buf[4:8], "little")
    samples = np.frombuffer(buf, np.int16, count=n, offset=8)
    if len(samples) != n:
        raise ValueError("pcm16 truncated payload")
    return rate, samples


def encode_pcm16(rate: int, samples: np.ndarray) -> bytes:
    s = np.asarray(samples, np.int16)
    return (int(rate).to_bytes(4, "little") + len(s).to_bytes(4, "little")
            + s.tobytes())


def _decode_wav(buf: bytes) -> tuple[int, np.ndarray]:
    """RIFF/WAVE PCM decoder (real container, stdlib-only parse).

    Supports format 1 (integer PCM, 8/16/32-bit) and format 3 (float32),
    any channel count; multichannel is downmixed to mono by mean, and
    every width is normalized to int16 range so downstream features see
    one sample model.  Returns (sample_rate, int16 mono samples)."""
    if len(buf) < 12 or buf[0:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    pos = 12
    fmt_chunk = None
    data = None
    n = len(buf)
    while pos + 8 <= n:
        tag = buf[pos:pos + 4]
        size = int.from_bytes(buf[pos + 4:pos + 8], "little")
        body = buf[pos + 8:pos + 8 + size]
        if len(body) != size:
            raise ValueError(f"truncated WAV chunk {tag!r}")
        if tag == b"fmt ":
            fmt_chunk = body
        elif tag == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt_chunk is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    if len(fmt_chunk) < 16:
        raise ValueError("WAV fmt chunk too short")
    audio_fmt = int.from_bytes(fmt_chunk[0:2], "little")
    channels = int.from_bytes(fmt_chunk[2:4], "little")
    rate = int.from_bytes(fmt_chunk[4:8], "little")
    bits = int.from_bytes(fmt_chunk[14:16], "little")
    if channels == 0 or rate == 0:
        raise ValueError("WAV fmt declares zero channels/rate")
    if audio_fmt == 1 and bits == 16:
        x = np.frombuffer(data, "<i2").astype(np.float64)
    elif audio_fmt == 1 and bits == 8:  # 8-bit PCM is unsigned
        x = (np.frombuffer(data, np.uint8).astype(np.float64) - 128.0) * 256.0
    elif audio_fmt == 1 and bits == 32:
        x = np.frombuffer(data, "<i4").astype(np.float64) / 65536.0
    elif audio_fmt == 3 and bits == 32:
        x = np.frombuffer(data, "<f4").astype(np.float64) * 32767.0
    else:
        raise ValueError(f"WAV format {audio_fmt}/{bits}-bit unsupported")
    if channels > 1:
        usable = (len(x) // channels) * channels
        x = x[:usable].reshape(-1, channels).mean(axis=1)
    return rate, np.clip(np.rint(x), -32768, 32767).astype(np.int16)


def encode_wav(rate: int, samples: np.ndarray, channels: int = 1) -> bytes:
    """int16 samples (interleaved if channels>1) -> PCM16 RIFF/WAVE."""
    s = np.asarray(samples, np.int16)
    byte_rate = rate * channels * 2
    fmt = (b"fmt " + (16).to_bytes(4, "little")
           + (1).to_bytes(2, "little") + int(channels).to_bytes(2, "little")
           + int(rate).to_bytes(4, "little") + byte_rate.to_bytes(4, "little")
           + (channels * 2).to_bytes(2, "little") + (16).to_bytes(2, "little"))
    data = b"data" + (s.nbytes).to_bytes(4, "little") + s.tobytes()
    body = b"WAVE" + fmt + data
    return b"RIFF" + len(body).to_bytes(4, "little") + body


AUDIO_DECODERS = {"pcm16": _decode_pcm16, "wav": _decode_wav}


class AudioFeatures:
    """Audio analogue of ImageFeatures: decode -> compact descriptor as
    fixed_size_list<float32, 11> (duration, rms, zero-crossing rate,
    8 log-spaced spectral band energies).  Same actor contract a real
    model would use (state in __init__, batched work in __call__);
    the deterministic 'pcm16' container and real RIFF/WAV PCM both
    decode here — flac/mp4 raise the explicit stub error."""

    DIM = 11

    def __init__(self, n_bands: int = 8):
        self.n_bands = n_bands

    def __call__(self, batch: pa.Table) -> pa.Table:
        bufs = batch.column("bytes").to_pylist()
        fmts = batch.column("fmt").to_pylist()
        feats = np.zeros((len(bufs), self.DIM), np.float32)
        for i, (buf, fmt) in enumerate(zip(bufs, fmts)):
            dec = AUDIO_DECODERS.get(fmt)
            if dec is None:
                if fmt in STUBBED_FORMATS:
                    raise NotImplementedError(
                        f"audio container {fmt!r} needs an audio library not "
                        "present in this environment; 'pcm16' and 'wav' "
                        "decode here")
                raise ValueError(f"unknown audio fmt {fmt!r}")
            rate, s = dec(buf)
            x = s.astype(np.float64) / 32768.0
            n = len(x)
            if n == 0 or rate == 0:
                continue
            feats[i, 0] = n / rate
            feats[i, 1] = np.sqrt(np.mean(x * x))
            feats[i, 2] = np.mean(np.signbit(x[1:]) != np.signbit(x[:-1]))
            spec = np.abs(np.fft.rfft(x)) ** 2
            # log-spaced band starts over [0, len(spec)); <= n_bands bands
            starts = np.unique(np.concatenate(
                [[0], np.geomspace(1, max(len(spec) - 1, 1),
                                   self.n_bands).astype(np.int64)]))[:self.n_bands]
            e = np.add.reduceat(spec, starts)
            total = spec.sum() or 1.0
            feats[i, 3:3 + len(e)] = e / total
        return pa.table({
            "audio_id": batch.column("audio_id"),
            "features": pa.FixedSizeListArray.from_arrays(
                pa.array(feats.ravel(), pa.float32()), self.DIM),
        })


def audio_features(ds, concurrency: int = 4, batch_size: int = 256):
    """audio Dataset (audio_id, bytes, fmt, ...) -> (audio_id, features)."""
    return ds.map_batches(AudioFeatures, batch_format="pyarrow",
                          batch_size=batch_size, concurrency=concurrency,
                          num_cpus=1)


class FrameSampler:
    """Video frame sampling stage — STUB: real decoders are absent, so
    this implements the full Ray-side contract (schema in/out, per-actor
    state, deterministic frame selection) over a deterministic fake
    decoder that treats the payload as concatenated ppm frames."""

    def __init__(self, every_n: int = 10):
        self.every_n = every_n

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_id, out_frame_no, out_bytes = [], [], []
        for vid, buf, fmt in zip(batch.column("video_id").to_pylist(),
                                 batch.column("bytes").to_pylist(),
                                 batch.column("fmt").to_pylist()):
            if fmt != "ppmcat":
                raise NotImplementedError(
                    f"container {fmt!r} needs a video library; only the "
                    "deterministic 'ppmcat' fake container is decodable here")
            frames = _split_ppmcat(buf)
            for i in range(0, len(frames), self.every_n):
                out_id.append(vid)
                out_frame_no.append(i)
                out_bytes.append(frames[i])
        return pa.table({
            "video_id": pa.array(out_id, pa.string()),
            "frame_no": pa.array(out_frame_no, pa.int64()),
            "bytes": pa.array(out_bytes, pa.binary()),
        })


def _split_ppmcat(buf: bytes) -> list[bytes]:
    """Split concatenated P5/P6 streams (the fake video container)."""
    frames = []
    pos = 0
    while pos < len(buf):
        nxt5 = buf.find(b"P5\n", pos + 1)
        nxt6 = buf.find(b"P6\n", pos + 1)
        cands = [c for c in (nxt5, nxt6) if c != -1]
        end = min(cands) if cands else len(buf)
        frames.append(buf[pos:end])
        pos = end
    return frames


def decode_features(ds, concurrency: int = 4, batch_size: int = 256):
    """images Dataset -> (image_id, features) via the ImageFeatures pool."""
    return ds.map_batches(ImageFeatures, batch_format="pyarrow",
                          batch_size=batch_size, concurrency=concurrency, num_cpus=1)


def resize_images(ds, out_w: int, out_h: int, concurrency: int = 4,
                  batch_size: int = 256):
    return ds.map_batches(ImageResize, fn_constructor_kwargs={"out_w": out_w, "out_h": out_h},
                          batch_format="pyarrow", batch_size=batch_size,
                          concurrency=concurrency, num_cpus=1)


def sample_frames(ds, every_n: int = 10, concurrency: int = 2, batch_size: int = 16):
    return ds.map_batches(FrameSampler, fn_constructor_kwargs={"every_n": every_n},
                          batch_format="pyarrow", batch_size=batch_size,
                          concurrency=concurrency, num_cpus=1)


class ImagePatches:
    """Flat-map: one image row -> grid x grid patch-descriptor rows
    (the patch-embedding stage of a visual-search pipeline).  Each
    patch emits (image_id, patch_id, descriptor fixed_size_list<f32,8>:
    mean, std, gx, gy, 4-bin histogram).  Output multiplies row count
    by grid^2 — downstream batch sizes should divide by that."""

    DIM = 8

    def __init__(self, grid: int = 4):
        self.grid = grid

    def __call__(self, batch: pa.Table) -> pa.Table:
        g = self.grid
        bufs = batch.column("bytes").to_pylist()
        fmts = batch.column("fmt").to_pylist()
        ids = batch.column("image_id").to_pylist()
        out_id, out_pid = [], []
        feats = np.empty((len(bufs) * g * g, self.DIM), np.float32)
        r = 0
        for img_id, buf, fmt in zip(ids, bufs, fmts):
            pix = _decode_or_raise(buf, fmt).astype(np.float64)
            if pix.ndim == 3:
                pix = pix.mean(axis=2)
            h, w = pix.shape
            ys = np.linspace(0, h, g + 1).astype(int)
            xs = np.linspace(0, w, g + 1).astype(int)
            for py in range(g):
                for px in range(g):
                    p = pix[ys[py]:ys[py + 1], xs[px]:xs[px + 1]]
                    if p.size == 0:
                        # image smaller than the grid: empty slice ->
                        # zero descriptor, never NaN (NaN would poison
                        # downstream cosine kNN silently)
                        feats[r] = 0.0
                        out_id.append(img_id)
                        out_pid.append(py * g + px)
                        r += 1
                        continue
                    hist, _ = np.histogram(p, bins=4, range=(0, 256))
                    feats[r, 0] = p.mean()
                    feats[r, 1] = p.std()
                    feats[r, 2] = (np.abs(np.diff(p, axis=1)).mean()
                                   if p.shape[1] > 1 else 0.0)
                    feats[r, 3] = (np.abs(np.diff(p, axis=0)).mean()
                                   if p.shape[0] > 1 else 0.0)
                    feats[r, 4:8] = hist / p.size
                    out_id.append(img_id)
                    out_pid.append(py * g + px)
                    r += 1
        return pa.table({
            "image_id": pa.array(out_id, pa.string()),
            "patch_id": pa.array(np.asarray(out_pid, np.int64), pa.int64()),
            "patch_key": pa.array([f"{i}#{p}" for i, p in zip(out_id, out_pid)],
                                  pa.string()),
            "descriptor": pa.FixedSizeListArray.from_arrays(
                pa.array(feats[:r].ravel(), pa.float32()), self.DIM),
        })


def image_patches(ds, grid: int = 4, concurrency: int = 4,
                  batch_size: int = 64):
    """Actor-pool patch extraction (decode state per actor; small
    batches because output rows = input rows x grid^2)."""
    return ds.map_batches(ImagePatches, fn_constructor_kwargs={"grid": grid},
                          batch_format="pyarrow", batch_size=batch_size,
                          concurrency=concurrency, num_cpus=1)


def video_neardup_pairs(ds, every_n: int = 10, max_frame_hamming: int = 6,
                        concurrency: int = 2):
    """Temporally-aligned video near-duplicate pairs.

    Composition of the engine's existing stages: frame sampling
    (``sample_frames``, every ``every_n``-th frame), per-frame phash
    (batched kernel), then pair generation on the FIRST sampled
    frame's phash through ``dedup.hamming_pairs`` — pigeonhole banding
    is exact for Hamming <= ``max_frame_hamming``, and two temporally
    aligned near-dup videos must in particular match on frame 0, so
    candidate generation misses nothing under the aligned-near-dup
    definition.  Verification then requires the SAME sampled-frame
    count and per-frame Hamming <= ``max_frame_hamming`` on EVERY
    aligned frame.

    -> Dataset (id_a, id_b, n_frames, max_hamming): one row per
    verified pair (id_a < id_b), with the worst aligned-frame Hamming
    observed.

    Scale shape: only (video_id, frame phash) rows shuffle — the frame
    bytes never leave the sampling stage; signatures are bounded
    per-video groups; candidate pairs join back to the two signature
    sides by id (hash join), so the verify stage's input is linear in
    the candidate count.
    """
    from .. import phash as phashmod
    from .dedup import hamming_pairs

    def add_phash(b: pa.Table) -> pa.Table:
        # gray-reduce color (P6) frames and batch the phash kernel per
        # frame SHAPE — mixed-resolution batches cannot np.stack (the
        # same shape-grouping the decode stage uses)
        grays = []
        for x in b.column("bytes").to_pylist():
            g = codecs.ppm_decode(x).astype(np.float64)
            if g.ndim == 3:
                g = g.mean(axis=2)
            grays.append(g)
        ph = np.empty(len(grays), np.int64)
        shapes = np.asarray([g.shape for g in grays], np.int64) \
            if grays else np.empty((0, 2), np.int64)
        for shp in {tuple(s) for s in shapes}:
            sel = np.flatnonzero((shapes == shp).all(axis=1))
            ph[sel] = phashmod.phash64_batch(
                np.stack([grays[i] for i in sel]))
        return pa.table({
            "video_id": b.column("video_id"),
            "frame_no": b.column("frame_no"),
            "fph": pa.array(ph, pa.int64()),
        })

    frames = sample_frames(ds, every_n=every_n, concurrency=concurrency
                           ).map_batches(add_phash, batch_format="pyarrow")

    def signature(grp: pa.Table) -> pa.Table:
        order = np.argsort(grp.column("frame_no").to_numpy(), kind="stable")
        ph = grp.column("fph").to_numpy()[order]
        # the signature rides through the candidate joins as raw
        # little-endian int64 bytes: Acero hash joins reject list<>
        # payload columns, and a binary scalar also skips the
        # list-builder overhead
        return pa.table({
            "video_id": grp.column("video_id").slice(0, 1),
            "sig": pa.array([ph.astype("<i8").tobytes()], pa.binary()),
            "f0": pa.array([int(ph[0])], pa.int64()),
        })

    import ray as _ray

    sigs = frames.groupby("video_id").map_groups(
        signature, batch_format="pyarrow").materialize()
    # each Join operator holds num_partitions actors — two joins plus
    # the sampler pool deadlock a small cluster unless the partition
    # count is clamped to the CPUs actually available, and the joins
    # run in SEPARATE executions (the barriers are cheap: candidate
    # pairs are near-dup-bounded, never corpus-bounded)
    npart = max(2, min(8, int(_ray.cluster_resources().get("CPU", 8)) // 2))
    cand = (hamming_pairs(sigs.select_columns(["video_id", "f0"]),
                          hash_col="f0", id_col="video_id",
                          max_hamming=max_frame_hamming)
            .select_columns(["id_a", "id_b"]))
    j = cand.join(sigs.select_columns(["video_id", "sig"]),
                  join_type="inner", num_partitions=npart,
                  on=("id_a",), right_on=("video_id",))
    j = j.map_batches(lambda b: b.rename_columns(
        ["id_a", "id_b", "sig_a"]), batch_format="pyarrow").materialize()
    j = j.join(sigs.select_columns(["video_id", "sig"]),
               join_type="inner", num_partitions=npart,
               on=("id_b",), right_on=("video_id",))

    def verify(b: pa.Table) -> pa.Table:
        names = b.schema.names
        sig_b_col = names[-1]          # the second join's sig column
        out_a, out_b, out_n, out_h = [], [], [], []
        for ia, ib, sa, sb in zip(b.column("id_a").to_pylist(),
                                  b.column("id_b").to_pylist(),
                                  b.column("sig_a").to_pylist(),
                                  b.column(sig_b_col).to_pylist()):
            if len(sa) != len(sb):
                continue
            sa = np.frombuffer(sa, "<i8")
            sb = np.frombuffer(sb, "<i8")
            hs = phashmod.hamming(np.asarray(sa, np.int64),
                                  np.asarray(sb, np.int64))
            hmax = int(hs.max()) if len(hs) else 0
            if hmax <= max_frame_hamming:
                out_a.append(ia)
                out_b.append(ib)
                out_n.append(int(len(sa)))
                out_h.append(hmax)
        return pa.table({
            "id_a": pa.array(out_a, pa.string()),
            "id_b": pa.array(out_b, pa.string()),
            "n_frames": pa.array(out_n, pa.int64()),
            "max_hamming": pa.array(out_h, pa.int64()),
        })

    return j.map_batches(verify, batch_format="pyarrow")
