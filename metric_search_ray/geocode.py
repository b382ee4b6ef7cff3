"""Deterministic geotagging: record key -> (lat_u, lon_u) microdegrees.

The target table schema (image_id, bytes, w, h, fmt, caption, phash) has
no lat/lon columns, but the engine's north star says images are
geotagged.  In a real deployment this stage would read EXIF; here it is
a pluggable, documented hash->location mapping so every run (and the SQL
oracle) derives identical coordinates.

Integer-only arithmetic (31-bit LCG, products < 2^63) so DuckDB SQL can
reproduce the mapping bit-exactly — see __ray_entry__.oracle_sql().

A hot-spot mixture (HOT_PCT percent of rows land in HOT_CENTERS
"cities", a 2x2-degree square each) deliberately creates partition skew
for the salting tests, mirroring the reference's degenerate-tree warning
(reference: README.md:239-241 — unbalanced data is the worst case there;
hot cells are the distributed analogue).
"""

from __future__ import annotations

import zlib

import numpy as np

LCG_A = 1103515245
LCG_C = 12345
LCG_M = 2**31

# (lat_u, lon_u) city centers for the skew mixture
HOT_CENTERS = (
    (40_700_000, -74_000_000),   # New York
    (48_850_000, 2_350_000),     # Paris
    (35_680_000, 139_690_000),   # Tokyo
)
HOT_PCT = 30          # percent of rows in hot spots
HOT_HALF_U = 1_000_000  # ±1 degree square around center


def lcg_next(x: np.ndarray) -> np.ndarray:
    return (LCG_A * (np.asarray(x, np.int64) % LCG_M) + LCG_C) % LCG_M


def geocode_from_key(key: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """int64 keys -> (lat_u, lon_u).  Pure integer math, SQL-reproducible."""
    s1 = lcg_next(key)
    s2 = lcg_next(s1)
    s3 = lcg_next(s2)
    hot = (s1 % 100) < HOT_PCT
    city = (s1 % len(HOT_CENTERS)).astype(np.int64)
    clat = np.asarray([c[0] for c in HOT_CENTERS], np.int64)[city]
    clon = np.asarray([c[1] for c in HOT_CENTERS], np.int64)[city]
    hot_lat = clat + (s2 % (2 * HOT_HALF_U + 1)) - HOT_HALF_U
    hot_lon = clon + (s3 % (2 * HOT_HALF_U + 1)) - HOT_HALF_U
    uni_lat = (s2 * 180_000_000) // LCG_M - 90_000_000
    uni_lon = (s3 * 360_000_000) // LCG_M - 180_000_000
    lat_u = np.where(hot, hot_lat, uni_lat)
    lon_u = np.where(hot, hot_lon, uni_lon)
    return lat_u.astype(np.int64), lon_u.astype(np.int64)


def key_of_image_id(image_id: np.ndarray) -> np.ndarray:
    """string image ids -> int64 keys.

    Fast path: ids of the fixture form ``img-{i:08d}`` parse the integer
    suffix (vectorized).  Fallback: crc32 of the utf-8 bytes (deterministic
    across processes, unlike Python's salted hash()).
    """
    ids = np.asarray(image_id)
    s = ids.astype(str)
    try:
        if len(s) > 0 and bool(np.all(np.char.isdigit(s))):
            return s.astype(np.int64)  # pure-numeric ids (e.g. str(o_orderkey))
        suffix = np.char.partition(s, "-")[:, 2]
        if bool(np.all(np.char.isdigit(suffix))) and len(s) > 0:
            return suffix.astype(np.int64)
    except (ValueError, IndexError):
        pass
    return np.asarray([zlib.crc32(x.encode("utf-8")) for x in s], np.int64)


def geocode_image_ids(image_id: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    return geocode_from_key(key_of_image_id(image_id))
