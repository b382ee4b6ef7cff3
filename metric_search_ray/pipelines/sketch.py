"""Sketch operators: HyperLogLog approximate distinct counting.

The scale path complementing ``stats.distinct_count``: the exact
operator shuffles every distinct (key, value) pair; HLL ships ONE
fixed-size register array (2^p bytes, default 4 KiB) per block —
distinct counting over 100 TB with a driver combine bounded by block
count, no shuffle at all.  The sketch is a semilattice (elementwise
register max), so partials merge associatively in any order — the same
property the engine's top_tokens / tile_counts combines rely on.

Deterministic by construction: a fixed splitmix64 hash (no seeds, no
randomness), so the estimate is reproducible run-to-run and
test-assertable.  Standard-error ~ 1.04/sqrt(2^p) (~1.6% at p=12).

Hashing is fully vectorized: integer columns hash directly through
splitmix64; strings go through the same flattened-codepoint polynomial
scheme the dedup/text kernels use (one numpy pass over the
concatenated corpus, no per-row Python hashing), then splitmix64
finalization for bit diffusion.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.types as pat

_U = np.uint64


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (public-domain constant set)."""
    with np.errstate(over="ignore"):
        z = (x.astype(_U) + _U(0x9E3779B97F4A7C15))
        z = (z ^ (z >> _U(30))) * _U(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> _U(27))) * _U(0x94D049BB133111EB)
        return z ^ (z >> _U(31))


def _poly_hash_strings(arr: pa.Array) -> np.ndarray:
    """One uint64 per string: FNV-style polynomial via one vectorized
    gather per CHARACTER POSITION — O(max_len) numpy passes, right for
    the short keys distinct-counting hashes (ids, users, terms).  For
    LONG documents use text.fingerprint (per-doc vectorized) as the
    hash input instead."""
    joined = "".join(s if s is not None else "" for s in arr.to_pylist())
    data = np.frombuffer(joined.encode("utf-32-le"), np.uint32).astype(_U)
    lens = np.asarray([len(s) if s is not None else 0 for s in arr.to_pylist()],
                      np.int64)
    out = np.zeros(len(lens), _U)
    if data.size == 0:
        return out
    B = _U(1099511628211)
    starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
    # Horner per string without a per-string Python loop: iterate over
    # CHARACTER POSITIONS (bounded by max string length), each step one
    # vectorized gather over the strings still long enough
    max_len = int(lens.max())
    with np.errstate(over="ignore"):
        for j in range(max_len):
            live = lens > j
            idx = starts[live] + j
            out[live] = out[live] * B + data[idx]
    return out


def _hash_column(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    t = arr.type
    if pat.is_integer(t):
        return splitmix64(arr.to_numpy(zero_copy_only=False).astype(_U))
    if pat.is_string(t) or pat.is_large_string(t):
        return splitmix64(_poly_hash_strings(arr))
    raise TypeError(f"hll over unsupported column type {t}")


def _clz_plus_one(w: np.ndarray, width: int) -> np.ndarray:
    """rho(w) = leading zeros of the width-bit value w, plus 1 (exact:
    6 vectorized compare/shift passes — no float log)."""
    bl = np.zeros(len(w), np.int64)
    v = w.copy()
    for s in (32, 16, 8, 4, 2, 1):
        m = v >= (_U(1) << _U(s))
        bl[m] += s
        v = np.where(m, v >> _U(s), v)
    bl += (v > 0).astype(np.int64)
    return width - bl + 1


def registers_of(h: np.ndarray, p: int) -> np.ndarray:
    """HLL register array (uint8, len 2^p) for a batch of 64-bit hashes."""
    m = 1 << p
    reg = np.zeros(m, np.uint8)
    if len(h) == 0:
        return reg
    idx = (h >> _U(64 - p)).astype(np.int64)
    w = h & ((_U(1) << _U(64 - p)) - _U(1))      # low 64-p bits
    rho = _clz_plus_one(w, 64 - p).astype(np.uint8)
    np.maximum.at(reg, idx, rho)
    return reg


def estimate(reg: np.ndarray) -> float:
    """Standard HLL estimator with small-range linear counting."""
    m = len(reg)
    alpha = (0.673 if m == 16 else 0.697 if m == 32 else 0.709 if m == 64
             else 0.7213 / (1 + 1.079 / m))
    raw = alpha * m * m / np.sum(np.exp2(-reg.astype(np.float64)))
    zeros = int(np.count_nonzero(reg == 0))
    if raw <= 2.5 * m and zeros:
        return m * np.log(m / zeros)
    return float(raw)


def hll_partials(ds, col: str, p: int = 12):
    """Dataset of one row per input block: {\"registers\": fixed 2^p bytes}."""

    def block_sketch(batch: pa.Table) -> pa.Table:
        reg = registers_of(_hash_column(batch.column(col)), p)
        return pa.table({"registers": pa.array([reg.tobytes()], pa.binary())})

    return ds.map_batches(block_sketch, batch_format="pyarrow")


def hll_distinct(ds, col: str, p: int = 12) -> float:
    """Approximate COUNT(DISTINCT col).  Driver combine is an
    elementwise max over #blocks register rows — bounded by block
    count, never by cardinality."""
    import ray

    parts = [np.frombuffer(t.column("registers")[i].as_py(), np.uint8)
             for t in ray.get(hll_partials(ds, col, p).to_arrow_refs())
             for i in range(t.num_rows)]
    if not parts:
        return 0.0
    return estimate(np.maximum.reduce(parts))
