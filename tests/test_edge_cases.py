"""Empty-input and boundary behavior of driver-facing pipelines."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from metric_search_ray.pipelines import dedup, windows


def _empty_docs():
    return rd.from_arrow(pa.table({"doc_id": pa.array([], pa.int64()),
                                   "text": pa.array([], pa.string())}))


def test_hamming_pairs_empty(ray_session):
    ds = rd.from_arrow(pa.table({"image_id": pa.array([], pa.string()),
                                 "phash": pa.array([], pa.int64())}))
    out = dedup.hamming_pairs(ds, max_hamming=2).to_pandas()
    assert len(out) == 0


def test_hamming_pairs_single_row(ray_session):
    ds = rd.from_arrow(pa.table({"image_id": pa.array(["a"]),
                                 "phash": pa.array([42], pa.int64())}))
    out = dedup.hamming_pairs(ds, max_hamming=2).to_pandas()
    assert len(out) == 0


def test_exact_dedup_empty(ray_session):
    out = dedup.exact_dedup(_empty_docs()).to_pandas()
    assert len(out) == 0


def test_sessions_empty(ray_session):
    ds = rd.from_arrow(pa.table({
        "user_id": pa.array([], pa.int64()),
        "ts": pa.array([], pa.timestamp("us")),
        "value": pa.array([], pa.float64()),
    }))
    assert windows.sessions(ds, "user_id", "ts", 3600, "value").count() == 0

