"""SSIM verification of near-duplicate candidate pairs.

Second stage of the image near-dup pipeline: Hamming-phash banding
(dedup.hamming_pairs) proposes candidates; this stage decodes both
images of every pair and scores the reference's SSIM structural
dissimilarity (n-api/metric_distance/details/SSIM.cpp — ported in
metrics.SSIM).

Delivery of image bytes to the pairs has two paths with one auto
facade (``ssim_verify``):

- **broadcast** (``ssim_verify_pairs_broadcast``): the candidate image
  table is ``ray.put`` once (zero-copy Arrow) and looked up per pair
  inside tasks.  Right when the candidate set fits in the object
  store — the usual case, candidates are a tiny fraction of the corpus.
- **hash join** (``ssim_verify_pairs``): two joins on image_id move
  pixels only for candidate pairs — never a full cross join.  Right
  when the candidate set is too large to broadcast.

Scoring is shared: every path decodes each distinct image ONCE per
process (LRU keyed by image id — a hub image in m candidate pairs
used to be decoded m times), groups pairs by shape, and scores each
group through the batched separable-window SSIM kernel
(``SSIM.batch_pairs``) instead of one python call per pair.
"""

from __future__ import annotations

import collections

import numpy as np
import pyarrow as pa

from .. import codecs
from ..metrics import SSIM
from .dedup import _rename_first_present

# Per-process decoded-image LRU: image_id -> (full decoded shape,
# grayscale float64 pixels).  Ray reuses worker processes across tasks,
# so hub images decode once per worker, not once per pair.
_PIX_CACHE: "collections.OrderedDict[str, tuple]" = collections.OrderedDict()
_PIX_CACHE_CAP = 4096


def _decode_gray_cached(img_id, buf, fmt):
    """Decode once per process; store grayscale float64 (what SSIM
    consumes) plus the original decoded shape (the pair gate compares
    FULL shapes — a color 64x64x3 vs a gray 64x64 image is a mismatch
    even though both gray to 64x64)."""
    hit = _PIX_CACHE.get(img_id)
    if hit is not None:
        _PIX_CACHE.move_to_end(img_id)
        return hit
    pix = codecs.decode(buf, fmt)
    shape = pix.shape
    gray = np.asarray(pix, np.float64)
    if gray.ndim == 3:
        gray = gray.mean(axis=2)
    _PIX_CACHE[img_id] = (shape, gray)
    if len(_PIX_CACHE) > _PIX_CACHE_CAP:
        _PIX_CACHE.popitem(last=False)
    return _PIX_CACHE[img_id]


def _score_batch(ids_a, ids_b, lookup, ssim: SSIM) -> np.ndarray:
    """Score pairs given ``lookup(img_id) -> (shape, gray) | None``.

    NaN for missing images, shape-mismatched pairs, and images smaller
    than the 11x11 SSIM window (reference contract).  Same-shape pairs
    are stacked and scored in one vectorized kernel call per shape
    group.
    """
    n = len(ids_a)
    out = np.full(n, np.nan, np.float64)
    groups: dict = collections.defaultdict(list)
    pix: list = [None] * n
    for i, (ia, ib) in enumerate(zip(ids_a, ids_b)):
        ra = lookup(ia)
        rb = lookup(ib)
        if ra is None or rb is None:
            continue
        sa, ga = ra
        sb, gb = rb
        if sa != sb or min(sa[0], sa[1]) < 11:
            continue
        pix[i] = (ga, gb)
        groups[ga.shape].append(i)
    for shape, idx_list in groups.items():
        A = np.stack([pix[i][0] for i in idx_list])
        B = np.stack([pix[i][1] for i in idx_list])
        out[np.asarray(idx_list, np.int64)] = ssim.batch_pairs(A, B)
    return out


class _SsimScore:
    """Join-path scorer: rows carry (id_a, bytes_a, fmt_a, id_b, ...)."""

    def __init__(self):
        self.ssim = SSIM()

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids_a = batch.column("id_a").to_pylist()
        ids_b = batch.column("id_b").to_pylist()
        bytes_a = batch.column("bytes_a").to_pylist()
        fmt_a = batch.column("fmt_a").to_pylist()
        bytes_b = batch.column("bytes_b").to_pylist()
        fmt_b = batch.column("fmt_b").to_pylist()
        by_id: dict = {}
        for ia, ba, fa, ib, bb, fb in zip(ids_a, bytes_a, fmt_a,
                                          ids_b, bytes_b, fmt_b):
            if ia not in by_id:
                by_id[ia] = (ba, fa)
            if ib not in by_id:
                by_id[ib] = (bb, fb)

        def lookup(img_id):
            buf_fmt = by_id.get(img_id)
            if buf_fmt is None:
                return None
            # key qualified by the payload hash: unlike the broadcast
            # path (cache cleared per broadcast set), join batches may
            # interleave different image sets in one worker process
            return _decode_gray_cached((img_id, hash(buf_fmt[0])),
                                       buf_fmt[0], buf_fmt[1])

        out = _score_batch(ids_a, ids_b, lookup, self.ssim)
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
    as a zero-copy Arrow table and looked up per pair inside tasks.
    Right when the candidate image set fits in the object store (the
    usual case — candidates are a tiny fraction of the corpus); use
    ``ssim_verify_pairs`` (hash joins) when it does not, or
    ``ssim_verify`` to pick automatically.
    """
    ref = images_ref if images_ref is not None else broadcast_images(images_ds, id_col)

    def score(batch: pa.Table) -> pa.Table:
        # task mode (scales with the worker pool); the broadcast table is
        # zero-copy, only the id->row index is built once per worker
        tbl, index = _bcast_get(ref, id_col)
        bcol = tbl.column("bytes")
        fcol = tbl.column("fmt")
        ssim = SSIM()

        def lookup(img_id):
            hit = _PIX_CACHE.get(img_id)
            if hit is not None:
                _PIX_CACHE.move_to_end(img_id)
                return hit
            r = index.get(img_id)
            if r is None:
                return None
            return _decode_gray_cached(img_id, bcol[r].as_py(), fcol[r].as_py())

        out = _score_batch(batch.column("id_a").to_pylist(),
                           batch.column("id_b").to_pylist(), lookup, ssim)
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
        _PIX_CACHE.clear()    # decoded pixels belong to the old set
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


def ssim_verify(images_ds, pairs_ds, id_col: str = "image_id",
                broadcast_limit_bytes: int | None = None, **kwargs):
    """Auto-select the image-delivery path by candidate-set size.

    Materializes the (id, bytes, fmt) projection of the candidate set
    (exact size from block metadata, no driver collect), then:

    - fits under ``broadcast_limit_bytes`` (default: 1/4 of the
      cluster's object-store memory, capped at 2 GiB) -> broadcast
      path — one ``ray.put``, zero-copy lookups;
    - larger -> hash-join path — pixels move through the shuffle only
      for candidate pairs, nothing is ever collected on the driver.
    """
    if broadcast_limit_bytes is None:
        import ray as _ray
        store = _ray.cluster_resources().get("object_store_memory", 2 << 30)
        broadcast_limit_bytes = min(int(store) // 4, 2 << 30)
    imgs = images_ds.select_columns([id_col, "bytes", "fmt"]).materialize()
    if imgs.size_bytes() <= broadcast_limit_bytes:
        return ssim_verify_pairs_broadcast(imgs, pairs_ds, id_col=id_col)
    return ssim_verify_pairs(imgs, pairs_ds, id_col=id_col, **kwargs)
