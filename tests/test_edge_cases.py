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



def test_merge_block_boundary_ties_exact():
    """_merge_block: planted value ties at the k-th distance must be
    cut on (dist, image_id) regardless of pre-cut order (the two-pivot
    partition + eq-only tie decode path)."""
    import numpy as np
    import pyarrow.parquet as pq
    from metric_search_ray.pipelines.knn import KnnActor

    actor = KnnActor.__new__(KnnActor)   # merge needs no index state
    kmax = 3
    nq = 4
    best_d = np.full((nq, kmax), np.inf)
    best_code = np.full((nq, kmax), -1, np.int64)
    kth = np.full(nq, np.inf)
    # partition 0: ids chosen so ties resolve by id order
    ids0 = np.asarray(["m", "a", "z", "b", "q", "c"], dtype=np.str_)
    parts = [ids0]
    # every query: distances [5, 1, 5, 5, 0.5, 5] -> k=3 keeps 0.5, 1,
    # then ONE of the four 5.0s -> smallest id among (m, z, b, c) = "b"
    d = np.tile(np.asarray([5.0, 1.0, 5.0, 5.0, 0.5, 5.0]), (nq, 1))
    codes = (np.int64(0) << np.int64(32)) | np.arange(6, dtype=np.int64)
    actor._merge_block(best_d, best_code, kth, np.arange(nq), d, codes,
                       parts, kmax)
    got = actor._decode_codes(best_code.ravel(), parts).reshape(nq, kmax)
    for r in range(nq):
        assert sorted(got[r]) == ["a", "b", "q"], got[r]
        assert np.isclose(kth[r], 5.0)


def test_scan_partition_csr_matches_full_scan():
    """The sub-cell CSR scan path must produce the same per-query best
    lists as the plain full-matrix merge on a hot (large) partition."""
    import numpy as np
    from metric_search_ray.metrics import planar_dist_outer
    from metric_search_ray.pipelines.knn import KnnActor, _augment_subcells

    rng = np.random.default_rng(5)
    n = 24_000            # above the CSR gate (4096)
    lat = rng.uniform(40.0, 50.0, n)
    lon = rng.uniform(10.0, 20.0, n)
    ids = np.char.add("hot-", np.arange(n).astype(np.str_)).astype(np.str_)
    arrs = _augment_subcells(lat, lon, ids, res_base=4)
    assert len(arrs) == 5, "partition should get a CSR at this size"
    nq, kmax = 50, 7
    qlat = rng.uniform(40.0, 50.0, nq)
    qlon = rng.uniform(10.0, 20.0, nq)
    actor = KnnActor.__new__(KnnActor)

    def run_csr():
        best_d = np.full((nq, kmax), np.inf)
        best_code = np.full((nq, kmax), -1, np.int64)
        kth = np.full(nq, np.inf)
        parts = [arrs[2]]
        actor._scan_partition_csr(arrs, 0, np.arange(nq), qlat, qlon,
                                  best_d, best_code, kth, parts, kmax)
        return best_d, actor._decode_codes(best_code.ravel(),
                                           parts).reshape(nq, kmax)

    def run_full():
        best_d = np.full((nq, kmax), np.inf)
        best_code = np.full((nq, kmax), -1, np.int64)
        kth = np.full(nq, np.inf)
        parts = [arrs[2]]
        d = planar_dist_outer(arrs[0], arrs[1], qlat, qlon)
        codes = (np.int64(0) << np.int64(32)) | np.arange(n, dtype=np.int64)
        actor._merge_block(best_d, best_code, kth, np.arange(nq), d,
                           codes, parts, kmax)
        return best_d, actor._decode_codes(best_code.ravel(),
                                           parts).reshape(nq, kmax)

    dc, ic = run_csr()
    df_, if_ = run_full()
    for r in range(nq):
        oc = np.lexsort((ic[r].astype(str), dc[r]))
        of = np.lexsort((if_[r].astype(str), df_[r]))
        np.testing.assert_allclose(dc[r][oc], df_[r][of], rtol=0, atol=0)
        assert list(ic[r][oc]) == list(if_[r][of])


def test_key_of_image_id_is_per_row_pure():
    """A row's key must not depend on its batch neighbors: mixed-format
    batches take the same per-row rule as single-row calls (batch-level
    all-or-nothing made an id's geotag depend on Ray's batching)."""
    import zlib

    from metric_search_ray import geocode

    mixed = np.asarray(["12345", "img-00000007", "weird id",
                        str(12345 + 2**31), "a-b-77"], np.str_)
    batch = geocode.key_of_image_id(mixed)
    singles = np.concatenate(
        [geocode.key_of_image_id(mixed[i:i + 1]) for i in range(len(mixed))])
    assert (batch == singles).all()
    assert batch[0] == 12345
    assert batch[1] == 7
    assert batch[2] == zlib.crc32(b"weird id")
    assert batch[3] == 12345 + 2**31
    # suffix after the FIRST dash is NOT all digits ("b-77") -> crc32
    assert batch[4] == zlib.crc32(b"a-b-77")
