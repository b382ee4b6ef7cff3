"""Geotag + cell/tile assignment stages — stateless, zero-copy Arrow.

Vectorized ``map_batches`` functions (plain functions -> Ray tasks, no
actor state needed).  All arithmetic is integer-exact so the DuckDB
oracle reproduces the results bit-for-bit (see cell.py / geocode.py).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .. import cell, geocode


def geotag(batch: pa.Table, id_column: str = "image_id") -> pa.Table:
    """Derive (lat_u, lon_u) microdegrees + float degrees from the id."""
    lat_u, lon_u = geocode.geocode_image_ids(batch.column(id_column))
    return (batch.append_column("lat_u", pa.array(lat_u, pa.int64()))
                 .append_column("lon_u", pa.array(lon_u, pa.int64()))
                 .append_column("lat", pa.array(lat_u / 1e6, pa.float64()))
                 .append_column("lon", pa.array(lon_u / 1e6, pa.float64())))


def geotag_from_key(batch: pa.Table, key_column: str) -> pa.Table:
    lat_u, lon_u = geocode.geocode_from_key(batch.column(key_column).to_numpy())
    return (batch.append_column("lat_u", pa.array(lat_u, pa.int64()))
                 .append_column("lon_u", pa.array(lon_u, pa.int64()))
                 .append_column("lat", pa.array(lat_u / 1e6, pa.float64()))
                 .append_column("lon", pa.array(lon_u / 1e6, pa.float64())))


def assign_cell(batch: pa.Table, res: int, out: str = "cell") -> pa.Table:
    c = cell.cell_of(batch.column("lat_u").to_numpy(), batch.column("lon_u").to_numpy(), res)
    return batch.append_column(out, pa.array(c, pa.int64()))


def assign_tile(batch: pa.Table, res: int, out: str = "tile_id") -> pa.Table:
    t = cell.tile_of(batch.column("lat_u").to_numpy(), batch.column("lon_u").to_numpy(), res)
    return batch.append_column(out, pa.array(t, pa.int64()))


def assign_salt(batch: pa.Table, salt_of_cell: dict[int, int],
                id_column: str = "image_id") -> pa.Table:
    """Skew salting: hot cells split into k sub-partitions by a hash of
    the record id.  ``salt_of_cell`` maps cell -> k (default 1).

    The salt hash is TWO LCG steps past the key, not one: s1 % 3 is the
    hot-spot city selector in the geocoder, so within a hot cell s1 is
    conditioned mod 3 and ``s1 % k`` would use only k/gcd(k,3) salts
    (observed: 3x partition skew).  s2 is unconstrained within a cell.
    """
    cells = batch.column("cell").to_numpy()
    ks = np.asarray([salt_of_cell.get(int(c), 1) for c in cells], np.int64)
    key = geocode.key_of_image_id(batch.column(id_column))
    salt_hash = geocode.lcg_next(geocode.lcg_next(key) + 9176)
    salt = np.where(ks > 1, salt_hash % ks, 0)
    return batch.append_column("salt", pa.array(salt.astype(np.int64), pa.int64()))
