"""Bloom-filter semi/anti join pre-filtering.

The classic distributed-join optimization: when the filtering side's
key set is too large to broadcast exactly but its BLOOM FILTER fits
(8-16 bits/key), build the filter distributed (per-block bit-array
partials OR-merged — a semilattice, same combine shape as the HLL
sketch), ``ray.put`` it once, and drop non-matching probe rows
map-side BEFORE the exact hash join pays to shuffle them.

Exactness: a Bloom filter has false positives but NO false negatives,
so ``bloom_semi_join`` composes the filter with an exact join on the
survivors — the result is bit-identical to the plain join while the
shuffle carries only (true matches + fp_rate * non-matches).  With the
default 16 bits/key and 4 probes the false-positive rate is ~0.24%.

Hashing: fixed splitmix64 double-hash (h1 + i*h2 scheme) — fully
vectorized, deterministic across runs and nodes.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.types as pat

from .sketch import _hash_column, splitmix64

_U = np.uint64


def _probe_positions(h: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """(len(h), k) bit positions via the standard double-hash scheme."""
    h1 = h
    h2 = splitmix64(h) | _U(1)            # odd => full-period stepping
    pos = np.empty((len(h), k), np.int64)
    acc = h1.copy()
    for i in range(k):
        pos[:, i] = (acc % _U(m_bits)).astype(np.int64)
        acc = acc + h2
    return pos


def build_bloom(ds, col: str, m_bits: int, k: int = 4) -> np.ndarray:
    """Distributed Bloom filter of a column: uint8 bit array of
    ceil(m_bits/8) bytes.  Per-block partials OR-merge on the driver —
    bounded by filter size x #blocks, independent of row count."""
    import ray

    def block_bloom(batch: pa.Table) -> pa.Table:
        bits = np.zeros((m_bits + 7) // 8, np.uint8)
        if batch.num_rows:
            pos = _probe_positions(_hash_column(batch.column(col)), m_bits, k)
            flat = pos.ravel()
            np.bitwise_or.at(bits, flat >> 3,
                             np.left_shift(np.uint8(1), (flat & 7).astype(np.uint8)))
        return pa.table({"bits": pa.array([bits.tobytes()], pa.binary())})

    parts = [np.frombuffer(t.column("bits")[i].as_py(), np.uint8)
             for t in ray.get(ds.map_batches(block_bloom, batch_format="pyarrow")
                              .to_arrow_refs())
             for i in range(t.num_rows)]
    if not parts:
        return np.zeros((m_bits + 7) // 8, np.uint8)
    return np.bitwise_or.reduce(parts)


def bloom_filter_probe(ds, col: str, bits: np.ndarray, k: int = 4,
                       negate: bool = False):
    """Map-side membership prefilter: keep rows whose key MAY be in the
    filter (or, ``negate``, rows that definitely are NOT)."""
    import ray

    m_bits = len(bits) * 8
    bits_ref = ray.put(bits)

    def probe(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        b = ray.get(bits_ref)
        pos = _probe_positions(_hash_column(batch.column(col)), m_bits, k)
        hit = np.ones(batch.num_rows, bool)
        for i in range(pos.shape[1]):
            p = pos[:, i]
            hit &= (b[p >> 3] & np.left_shift(np.uint8(1),
                                              (p & 7).astype(np.uint8))) != 0
        return batch.filter(pa.array(~hit if negate else hit))

    return ds.map_batches(probe, batch_format="pyarrow")


def bloom_semi_join(probe_ds, keys_ds, probe_col: str, key_col: str,
                    bits_per_key: int = 16, k: int = 4,
                    num_partitions: int = 8, n_keys_hint: int | None = None):
    """Exact distributed semi join with a Bloom pre-filter: result ==
    ``probe_ds.join(keys_ds, 'left_semi')``, but only Bloom survivors
    enter the hash-join shuffle.  ``n_keys_hint`` sizes the filter
    (else one count() pass over the key side)."""
    n_keys = n_keys_hint if n_keys_hint is not None else keys_ds.count()
    m_bits = max(64, int(n_keys * bits_per_key))
    bits = build_bloom(keys_ds, key_col, m_bits, k)
    pref = bloom_filter_probe(probe_ds, probe_col, bits, k)
    # exact join on survivors: repartition first so no empty
    # first-submitted block skips the hash-shuffle schema broadcast
    pref = pref.repartition(num_partitions)
    return pref.join(keys_ds, join_type="left_semi",
                     num_partitions=num_partitions,
                     on=(probe_col,), right_on=(key_col,))
