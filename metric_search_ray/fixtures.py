"""Deterministic synthetic fixtures (FIXTURES.md F1-F3), no external data.

Every row is a pure function of (seed, row index), so any shard of the
table can be generated independently on any worker — that is what makes
fixture generation itself a Ray `map_batches` pipeline at bench scale
and keeps N-vs-4N runs byte-identical.

F1 image table — the exact BASELINE.json input_hint schema:
  (image_id:string, bytes:binary, w:int32, h:int32, fmt:string,
   caption:string, phash:int64)
~80% rows fmt='ppm' (lossless), ~20% fmt='qdct' (lossy, PSNR>=40 dB by
construction).  Every DUP_EVERY-th row is a planted near-duplicate of
its predecessor (small noise) for Hamming/SSIM tests.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from . import codecs, phash

VOCAB = (
    "ocean city skyline sunset mountain river bridge forest night aerial "
    "street市场 café straße 写真 plaza harbor desert meadow canyon glacier "
    "lake tower museum garden temple market rooftop valley coast island"
).split()

DUP_EVERY = 50
SIZES = (16, 32, 64)


def _pixels_for(i: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(np.random.SeedSequence([seed, int(i)]))
    s = int(SIZES[i % len(SIZES)])
    yy, xx = np.mgrid[0:s, 0:s].astype(np.float64)
    f1, f2 = rng.uniform(0.05, 0.4, 2)
    ph1, ph2 = rng.uniform(0, 2 * np.pi, 2)
    base = (
        127 + 60 * np.sin(f1 * xx + ph1) + 50 * np.cos(f2 * yy + ph2)
        + rng.uniform(-30, 30) * (xx + yy) / (2 * s)
    )
    noise = rng.normal(0, 6, (s, s))
    return np.clip(base + noise, 0, 255).astype(np.uint8)


def row_of(i: int, seed: int = 42) -> dict:
    """One F1 row as plain Python values (pure function of (seed, i))."""
    if i % DUP_EVERY == 0 and i > 0:
        # planted near-duplicate of row i-1 (same size, tiny noise)
        pix = _pixels_for(i - 1, seed)
        rng = np.random.default_rng(np.random.SeedSequence([seed, int(i), 7]))
        pix = np.clip(pix.astype(np.int16) + rng.integers(-2, 3, pix.shape), 0, 255).astype(np.uint8)
    else:
        pix = _pixels_for(i, seed)
    fmt = "qdct" if (i % 5 == 3) else "ppm"
    buf = codecs.encode(pix, fmt)
    if fmt == "qdct":
        # the table's phash describes the STORED (lossy) image, so the
        # validate stage's recompute check is exact for every row
        pix = codecs.decode(buf, fmt)
    rng_c = np.random.default_rng(np.random.SeedSequence([seed, int(i), 13]))
    n_words = int(rng_c.integers(3, 21))
    caption = " ".join(VOCAB[j] for j in rng_c.integers(0, len(VOCAB), n_words))
    return {
        "image_id": f"img-{i:08d}",
        "bytes": buf,
        "w": pix.shape[1],
        "h": pix.shape[0],
        "fmt": fmt,
        "caption": caption,
        "phash": phash.phash64(pix),
    }


def image_batch(indices: np.ndarray, seed: int = 42) -> pa.Table:
    rows = [row_of(int(i), seed) for i in indices]
    return pa.table({
        "image_id": pa.array([r["image_id"] for r in rows], pa.string()),
        "bytes": pa.array([r["bytes"] for r in rows], pa.binary()),
        "w": pa.array([r["w"] for r in rows], pa.int32()),
        "h": pa.array([r["h"] for r in rows], pa.int32()),
        "fmt": pa.array([r["fmt"] for r in rows], pa.string()),
        "caption": pa.array([r["caption"] for r in rows], pa.string()),
        "phash": pa.array([r["phash"] for r in rows], pa.int64()),
    })


def image_table(n: int, seed: int = 42) -> pa.Table:
    return image_batch(np.arange(n), seed)


# ---------------------------------------------------------------- F2 polygons


def polygon_layer(n_rect: int = 30, n_convex: int = 15, n_star: int = 5,
                  seed: int = 42) -> dict:
    """Polygon layer: axis-aligned rectangles (SQL-oracle-expressible),
    seeded convex polygons, concave stars, and hot-spot covers.

    Returns dict of lists: polygon_id, ring ((k,2) lon/lat arrays),
    bbox, props, kind.
    """
    from .geocode import HOT_CENTERS

    rng = np.random.default_rng(seed)
    ids, rings, bboxes, props, kinds = [], [], [], [], []

    def add(pid, ring, kind):
        from .geom import ring_bbox
        ids.append(pid)
        rings.append(np.asarray(ring, np.float64))
        bboxes.append(ring_bbox(ring))
        props.append('{"kind": "%s"}' % kind)
        kinds.append(kind)

    k = 0
    # hot-spot rectangles (guarantee join hits on the skewed cities)
    for (clat_u, clon_u) in HOT_CENTERS:
        clat, clon = clat_u / 1e6, clon_u / 1e6
        hw = float(rng.uniform(0.5, 2.0))
        hh = float(rng.uniform(0.5, 2.0))
        ring = [[clon - hw, clat - hh], [clon + hw, clat - hh],
                [clon + hw, clat + hh], [clon - hw, clat + hh]]
        add(f"poly-{k:04d}", ring, "rect")
        k += 1
    for _ in range(n_rect - len(HOT_CENTERS)):
        clon = float(rng.uniform(-170, 170))
        clat = float(rng.uniform(-80, 80))
        hw = float(rng.uniform(1, 12))
        hh = float(rng.uniform(1, 12))
        ring = [[clon - hw, clat - hh], [clon + hw, clat - hh],
                [clon + hw, clat + hh], [clon - hw, clat + hh]]
        add(f"poly-{k:04d}", ring, "rect")
        k += 1
    for _ in range(n_convex):
        clon = float(rng.uniform(-160, 160))
        clat = float(rng.uniform(-75, 75))
        nv = int(rng.integers(5, 12))
        ang = np.sort(rng.uniform(0, 2 * np.pi, nv))
        rad = float(rng.uniform(2, 10))
        ring = np.stack([clon + rad * np.cos(ang), clat + rad * np.sin(ang)], axis=1)
        add(f"poly-{k:04d}", ring, "convex")
        k += 1
    for _ in range(n_star):
        clon = float(rng.uniform(-150, 150))
        clat = float(rng.uniform(-70, 70))
        nv = int(rng.integers(5, 9))
        ang = np.linspace(0, 2 * np.pi, 2 * nv, endpoint=False)
        rad = np.where(np.arange(2 * nv) % 2 == 0, rng.uniform(6, 12), rng.uniform(2, 4))
        ring = np.stack([clon + rad * np.cos(ang), clat + rad * np.sin(ang)], axis=1)
        add(f"poly-{k:04d}", ring, "star")
        k += 1
    # one degenerate-thin sliver
    add(f"poly-{k:04d}", [[-10.0, 0.0], [10.0, 0.001], [10.0, 0.002], [-10.0, 0.0015]], "sliver")
    return {"polygon_id": ids, "ring": rings, "bbox": bboxes, "props": props, "kind": kinds}


# ---------------------------------------------------------------- F3 queries


def audio_row_of(i: int, seed: int = 42) -> dict:
    """One F4 audio row (audio_id, bytes 'pcm16', sample_rate,
    n_samples) — pure function of (seed, i): a 2-sine mix + noise at
    8 kHz, 0.25-1.0 s, quantized to s16le inside the deterministic
    pcm16 container (multimodal._decode_pcm16)."""
    from .pipelines.multimodal import encode_pcm16

    rng = np.random.default_rng(np.random.SeedSequence([seed, int(i), 21]))
    rate = 8000
    n = int(rng.integers(rate // 4, rate + 1))
    t = np.arange(n) / rate
    f1, f2 = rng.uniform(60, 1200, 2)
    x = (0.5 * np.sin(2 * np.pi * f1 * t)
         + 0.3 * np.sin(2 * np.pi * f2 * t)
         + rng.normal(0, 0.05, n))
    s = np.clip(np.rint(x * 12000), -32768, 32767).astype(np.int16)
    return {"audio_id": f"aud-{i:08d}", "bytes": encode_pcm16(rate, s),
            "fmt": "pcm16", "sample_rate": rate, "n_samples": n}


def audio_batch(indices: np.ndarray, seed: int = 42) -> pa.Table:
    rows = [audio_row_of(int(i), seed) for i in indices]
    return pa.table({
        "audio_id": pa.array([r["audio_id"] for r in rows], pa.string()),
        "bytes": pa.array([r["bytes"] for r in rows], pa.binary()),
        "fmt": pa.array([r["fmt"] for r in rows], pa.string()),
        "sample_rate": pa.array([r["sample_rate"] for r in rows], pa.int32()),
        "n_samples": pa.array([r["n_samples"] for r in rows], pa.int32()),
    })


VIDEO_FRAMES = 24


def video_row_of(i: int, seed: int = 42) -> dict:
    """One F5 video row (video_id, bytes 'ppmcat', fps, n_frames) —
    VIDEO_FRAMES ppm frames, frame f a pure function of (seed, i, f)
    (the deterministic fake container multimodal._split_ppmcat
    splits)."""
    frames = []
    for f in range(VIDEO_FRAMES):
        rng = np.random.default_rng(np.random.SeedSequence(
            [seed, int(i), 31, f]))
        s = 16
        yy, xx = np.mgrid[0:s, 0:s].astype(np.float64)
        ph = rng.uniform(0, 2 * np.pi)
        pix = np.clip(127 + 90 * np.sin(0.3 * xx + 0.2 * f + ph)
                      + rng.normal(0, 4, (s, s)), 0, 255).astype(np.uint8)
        frames.append(codecs.ppm_encode(pix))
    return {"video_id": f"vid-{i:08d}", "bytes": b"".join(frames),
            "fmt": "ppmcat", "fps": 12, "n_frames": VIDEO_FRAMES}


def video_batch(indices: np.ndarray, seed: int = 42) -> pa.Table:
    rows = [video_row_of(int(i), seed) for i in indices]
    return pa.table({
        "video_id": pa.array([r["video_id"] for r in rows], pa.string()),
        "bytes": pa.array([r["bytes"] for r in rows], pa.binary()),
        "fmt": pa.array([r["fmt"] for r in rows], pa.string()),
        "fps": pa.array([r["fps"] for r in rows], pa.int32()),
        "n_frames": pa.array([r["n_frames"] for r in rows], pa.int32()),
    })


def knn_queries(n: int = 200, seed: int = 42) -> dict:
    """Geo kNN query mixture: uniform, cell-boundary, hot-spot, remote."""
    from .geocode import HOT_CENTERS

    rng = np.random.default_rng(seed + 1)
    lat = np.empty(n)
    lon = np.empty(n)
    kind = rng.integers(0, 4, n)
    for i in range(n):
        if kind[i] == 0:
            lat[i] = rng.uniform(-85, 85)
            lon[i] = rng.uniform(-180, 180)
        elif kind[i] == 1:  # exactly on a res-6 cell boundary (ring-protocol stress)
            step_lon = 360.0 / 64
            step_lat = 180.0 / 64
            lon[i] = -180 + step_lon * rng.integers(1, 64)
            lat[i] = -90 + step_lat * rng.integers(1, 64)
        elif kind[i] == 2:
            c = HOT_CENTERS[int(rng.integers(0, len(HOT_CENTERS)))]
            lat[i] = c[0] / 1e6 + rng.uniform(-1, 1)
            lon[i] = c[1] / 1e6 + rng.uniform(-1, 1)
        else:  # far from everything
            lat[i] = rng.uniform(-89.9, -88)
            lon[i] = rng.uniform(-180, 180)
    return {
        "query_id": [f"q-{i:05d}" for i in range(n)],
        "lat": lat,
        "lon": lon,
        "k": rng.choice([1, 5, 10], n).astype(np.int32),
    }
