"""SSIM verification of near-duplicate candidate pairs.

Second stage of the image near-dup pipeline: Hamming-phash banding
(dedup.hamming_pairs) proposes candidates; this stage decodes both
images of every pair and scores the reference's SSIM structural
dissimilarity (n-api/metric_distance/details/SSIM.cpp — ported in
metrics.SSIM).  Image bytes reach the pairs via two hash joins on
image_id (binary payloads join fine; list types do not), so pixels
move only for candidate pairs — never a full cross join.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .. import codecs
from ..metrics import SSIM
from .dedup import _rename_first_present


class _SsimScore:
    def __init__(self, max_side: int = 64):
        self.ssim = SSIM()
        self.max_side = max_side

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = []
        for ba, fa, bb, fb in zip(batch.column("bytes_a").to_pylist(),
                                  batch.column("fmt_a").to_pylist(),
                                  batch.column("bytes_b").to_pylist(),
                                  batch.column("fmt_b").to_pylist()):
            pa_img = codecs.decode(ba, fa).astype(np.float64)
            pb_img = codecs.decode(bb, fb).astype(np.float64)
            if pa_img.shape != pb_img.shape or min(pa_img.shape[:2]) < 11:
                out.append(float("nan"))
                continue
            out.append(self.ssim(pa_img, pb_img))
        return (batch.select(["id_a", "id_b"])
                .append_column("ssim_dist", pa.array(out, pa.float64())))


def broadcast_images(images_ds, id_col: str = "image_id"):
    """Collect + ``ray.put`` the candidate images as an Arrow table for
    the broadcast SSIM path.  Arrow objects come out of the object
    store ZERO-COPY — a pickled dict of bytes would deserialize its
    full payload once per worker process (anti-scales with the pool)."""
    import pyarrow as _pa

    import ray

    tbls = []
    for b in images_ds.select_columns([id_col, "bytes", "fmt"]).iter_batches(
            batch_format="pyarrow", batch_size=None):
        tbls.append(b)
    tbl = _pa.concat_tables(tbls) if tbls else _pa.table(
        {id_col: _pa.array([], _pa.string()), "bytes": _pa.array([], _pa.binary()),
         "fmt": _pa.array([], _pa.string())})
    return ray.put(tbl)


def ssim_verify_pairs_broadcast(images_ds, pairs_ds, id_col: str = "image_id",
                                batch_size: int = 256, images_ref=None):
    """Broadcast-side variant: the candidate images are ``ray.put`` once
    as an id -> (bytes, fmt) dict and looked up per pair inside tasks.
    Right when the candidate image set fits in the object store (the
    usual case — candidates are a tiny fraction of the corpus); use
    ``ssim_verify_pairs`` (hash joins) when it does not.
    """
    ref = images_ref if images_ref is not None else broadcast_images(images_ds, id_col)

    def score(batch: pa.Table) -> pa.Table:
        # task mode (scales with the worker pool); the broadcast table is
        # zero-copy, only the id->row index is built once per worker
        tbl, index = _bcast_get(ref, id_col)
        bcol = tbl.column("bytes")
        fcol = tbl.column("fmt")
        ssim = SSIM()
        out = []
        for ia, ib in zip(batch.column("id_a").to_pylist(),
                          batch.column("id_b").to_pylist()):
            ra = index.get(ia)
            rb = index.get(ib)
            if ra is None or rb is None:
                out.append(float("nan"))
                continue
            A = codecs.decode(bcol[ra].as_py(), fcol[ra].as_py()).astype(np.float64)
            B = codecs.decode(bcol[rb].as_py(), fcol[rb].as_py()).astype(np.float64)
            if A.shape != B.shape or min(A.shape[:2]) < 11:
                out.append(float("nan"))
                continue
            out.append(ssim(A, B))
        return (batch.select(["id_a", "id_b"])
                .append_column("ssim_dist", pa.array(out, pa.float64())))

    import ray as _ray
    width = max(2 * int(_ray.cluster_resources().get("CPU", 8)), 8)
    return (pairs_ds.repartition(width)   # limit()/groupby can leave few blocks
            .map_batches(score, batch_format="pyarrow", batch_size=batch_size))


_BCAST_CACHE: dict = {}


def _bcast_get(ref, id_col: str):
    """Per-process cache: (zero-copy Arrow table, id -> row index)."""
    import ray
    key = ref.hex()
    if key not in _BCAST_CACHE:
        _BCAST_CACHE.clear()  # keep at most one broadcast set per worker
        tbl = ray.get(ref)
        index = {v: i for i, v in enumerate(tbl.column(id_col).to_pylist())}
        _BCAST_CACHE[key] = (tbl, index)
    return _BCAST_CACHE[key]


def ssim_verify_pairs(images_ds, pairs_ds, id_col: str = "image_id",
                      num_partitions: int = 8, concurrency: int = 4):
    """(id_a, id_b) pairs -> (id_a, id_b, ssim_dist).

    NaN for shape-mismatched pairs (SSIM is defined per equal-shape
    images in the reference).
    """
    # materialize the candidate pairs: when pairs_ds itself ends in a
    # join (hamming banding), executing it lazily would put 3+ join
    # operators in one plan — their aggregator actor pools starve each
    # other on small CPU counts (same decoupling as dedup's verify)
    pairs_ds = pairs_ds.materialize()
    imgs = images_ds.select_columns([id_col, "bytes", "fmt"])
    j1 = pairs_ds.join(imgs, join_type="inner", num_partitions=num_partitions,
                       on=("id_a",), right_on=(id_col,), right_suffix="_a")
    j1 = _rename_first_present(j1, ["bytes_a", "bytes"], "bytes_a")
    j1 = _rename_first_present(j1, ["fmt_a", "fmt"], "fmt_a")
    j2 = j1.join(imgs, join_type="inner", num_partitions=num_partitions,
                 on=("id_b",), right_on=(id_col,), right_suffix="_b")
    j2 = _rename_first_present(j2, ["bytes_b", "bytes"], "bytes_b")
    j2 = _rename_first_present(j2, ["fmt_b", "fmt"], "fmt_b")
    return j2.map_batches(_SsimScore(), batch_format="pyarrow", batch_size=256)
