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


def stage_decoded_gray(images_ds, id_col: str = "image_id"):
    """Decode the candidate set ONCE, cluster-wide, into plasma-resident
    grayscale blocks; returns a handle ObjectRef wrapping
    ``{image_id: (block_ref, row)}``.

    The per-worker decoded-pixel LRU (``_PIX_CACHE``) cannot hold a
    large candidate set (36k 64x64 float64 images = 1.2 GB per worker
    heap), so every worker re-decodes most images it sees — duplicated
    decode work proportional to the worker count, exactly what the
    scaling bar punishes.  Staging decodes each image exactly once in
    a distributed wave and parks the pixels in the object store, where
    every worker on a node shares ONE zero-copy mapping (plasma is
    shared memory) — per-node cost, not per-worker.  Scale note: the
    decoded candidate set must fit a node's object store; beyond that
    use the hash-join path (``ssim_verify_pairs``)."""
    import ray as _ray

    def dec(batch: pa.Table) -> pa.Table:
        bufs = batch.column("bytes").to_pylist()
        fmts = batch.column("fmt").to_pylist()
        h, w, c, px = [], [], [], []
        for buf, fmt in zip(bufs, fmts):
            pix = codecs.decode(buf, fmt)
            shape = pix.shape
            gray = np.asarray(pix, np.float64)
            if gray.ndim == 3:
                gray = gray.mean(axis=2)
            h.append(shape[0])
            w.append(shape[1])
            c.append(shape[2] if len(shape) == 3 else 0)
            px.append(gray.tobytes())
        return pa.table({
            id_col: batch.column(id_col),
            "h": pa.array(h, pa.int32()), "w": pa.array(w, pa.int32()),
            "c": pa.array(c, pa.int32()),
            "gray": pa.array(px, pa.large_binary())})

    mat = (images_ds.select_columns([id_col, "bytes", "fmt"])
           .map_batches(dec, batch_format="pyarrow").materialize())
    refs = [br for bundle in mat.iter_internal_ref_bundles()
            for br in bundle.block_refs]
    meta_of = _ray.remote(
        lambda t, col=id_col: (
            (t.column(col).to_numpy(zero_copy_only=False).astype(np.str_),
             t.column("h").to_numpy(), t.column("w").to_numpy(),
             t.column("c").to_numpy())
            if col in t.schema.names else
            (np.empty(0, np.str_), np.empty(0, np.int32),
             np.empty(0, np.int32), np.empty(0, np.int32))))
    metas = _ray.get([meta_of.remote(r) for r in refs])
    # COMPACT handle: sorted id array + parallel index/shape arrays +
    # one ref per BLOCK.  (A {id: (ref, row)} dict holds one ObjectRef
    # PER IMAGE — deserializing it re-registers tens of thousands of
    # refs in every worker process, which measured 2-3x the entire
    # scoring compute.)
    ids = np.concatenate([m[0] for m in metas]) if metas else np.empty(0, np.str_)
    block = np.concatenate([np.full(len(m[0]), bi, np.int32)
                            for bi, m in enumerate(metas)]) \
        if metas else np.empty(0, np.int32)
    row = np.concatenate([np.arange(len(m[0]), dtype=np.int32)
                          for m in metas]) if metas else np.empty(0, np.int32)
    hh = np.concatenate([m[1] for m in metas]) if metas else np.empty(0, np.int32)
    ww = np.concatenate([m[2] for m in metas]) if metas else np.empty(0, np.int32)
    cc = np.concatenate([m[3] for m in metas]) if metas else np.empty(0, np.int32)
    order = np.argsort(ids, kind="stable")
    return _ray.put({"ids": ids[order], "block": block[order],
                     "row": row[order], "h": hh[order], "w": ww[order],
                     "c": cc[order], "refs": refs})


_DEC_BLOCK_CACHE: dict = {}


def _decoded_block(ref):
    """Per-process zero-copy view of one staged decoded block:
    (h, w, c int arrays, value offsets, flat float64 pixel view)."""
    key = ref.hex()
    got = _DEC_BLOCK_CACHE.get(key)
    if got is None:
        import ray as _ray
        tbl = _ray.get(ref)
        arr = tbl.column("gray").combine_chunks()
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.chunk(0)
        offs = np.frombuffer(arr.buffers()[1], np.int64,
                             count=len(arr) + 1, offset=arr.offset * 8)
        data = np.frombuffer(arr.buffers()[2], np.uint8)
        if len(_DEC_BLOCK_CACHE) > 512:
            _DEC_BLOCK_CACHE.clear()
        got = _DEC_BLOCK_CACHE[key] = (
            tbl.column("h").to_numpy(), tbl.column("w").to_numpy(),
            tbl.column("c").to_numpy(), offs, data)
    return got


def ssim_verify_pairs_staged(pairs_ds, decoded_ref, batch_size: int = 256):
    """Score pairs against a ``stage_decoded_gray`` handle: tasks
    resolve only the blocks their ids touch, zero-copy, no decoding.

    Pairs arrive bucket-ordered from the banding join, so score-able
    same-shape pairs CLUSTER: contiguous row chunks then spread 15x in
    task cost (measured 133ms-2.08s at 8 cpus) — a straggler tail.
    Small pair tables (the normal case — pairs are a sampled/verified
    candidate stream) are therefore scrambled ON THE DRIVER with a
    fixed pseudorandom permutation and split into equal chunks, so
    every task samples the same cost mix; large streams fall back to
    the distributed repartition."""
    import ray as _ray

    def score(batch: pa.Table) -> pa.Table:
        H = _bcast_get_raw(decoded_ref)
        ids_sorted = H["ids"]
        ssim = SSIM()
        n = batch.num_rows
        out = np.full(n, np.nan, np.float64)
        ia = batch.column("id_a").to_numpy(zero_copy_only=False).astype(np.str_)
        ib = batch.column("id_b").to_numpy(zero_copy_only=False).astype(np.str_)
        # vectorized prefilter: resolve ids + shape gates without any
        # per-pair python — most candidate pairs short-circuit to NaN
        # (missing image / shape mismatch / sub-window image)
        pa_ = np.searchsorted(ids_sorted, ia)
        pb_ = np.searchsorted(ids_sorted, ib)
        np.clip(pa_, 0, max(len(ids_sorted) - 1, 0), out=pa_)
        np.clip(pb_, 0, max(len(ids_sorted) - 1, 0), out=pb_)
        if len(ids_sorted) == 0:
            ok = np.zeros(n, bool)
        else:
            ok = (ids_sorted[pa_] == ia) & (ids_sorted[pb_] == ib)
            ok &= ((H["h"][pa_] == H["h"][pb_]) & (H["w"][pa_] == H["w"][pb_])
                   & (H["c"][pa_] == H["c"][pb_])
                   & (np.minimum(H["h"][pa_], H["w"][pa_]) >= 11))
        sel = np.flatnonzero(ok)
        if len(sel):
            # group scoreable pairs by shape; gather pixel rows from the
            # plasma-resident blocks (zero-copy views)
            hs, ws = H["h"][pa_[sel]], H["w"][pa_[sel]]
            shape_key = hs.astype(np.int64) * (1 << 20) + ws
            for key in np.unique(shape_key):
                grp = sel[shape_key == key]
                h0, w0 = int(H["h"][pa_[grp[0]]]), int(H["w"][pa_[grp[0]]])

                def gather(pos):
                    out_px = np.empty((len(pos), h0, w0), np.float64)
                    blk = H["block"][pos]
                    rw = H["row"][pos]
                    for j, (b_, r_) in enumerate(zip(blk, rw)):
                        _h, _w, _c, offs, data = _decoded_block(H["refs"][b_])
                        out_px[j] = data[offs[r_]:offs[r_ + 1]].view(
                            np.float64).reshape(h0, w0)
                    return out_px

                out[grp] = ssim.batch_pairs(gather(pa_[grp]), gather(pb_[grp]))
        return (batch.select(["id_a", "id_b"])
                .append_column("ssim_dist", pa.array(out, pa.float64())))

    # 6 tasks/CPU: scoring cost varies with the shape mix of a chunk
    # (mismatched pairs short-circuit to NaN), so 2 coarse waves left a
    # straggler tail at the scaling ladder's high level
    width = max(6 * int(_ray.cluster_resources().get("CPU", 8)), 8)
    ptab = pairs_ds if isinstance(pairs_ds, pa.Table) else None
    if ptab is None:
        mat = pairs_ds.materialize()
        if mat.count() <= 2_000_000:
            ptab = pa.concat_tables(
                _ray.get(mat.to_arrow_refs())).combine_chunks()
        else:
            pairs_ds = mat
    if ptab is not None and ptab.num_rows:
        import ray.data as _rd
        n = ptab.num_rows
        # fixed content-independent pseudorandom permutation
        perm = np.argsort((np.arange(n, dtype=np.uint64)
                           * np.uint64(2654435761)) & np.uint64(0xFFFFFFFF),
                          kind="stable")
        srt = ptab.take(pa.array(perm))
        width = min(width, n)
        bounds = np.linspace(0, n, width + 1).astype(np.int64)
        scrambled = _rd.from_arrow(
            [srt.slice(int(a), int(b - a))
             for a, b in zip(bounds[:-1], bounds[1:]) if b > a])
        return scrambled.map_batches(score, batch_format="pyarrow",
                                     batch_size=batch_size)
    if ptab is not None:   # empty
        import ray.data as _rd
        pairs_ds = _rd.from_arrow(ptab)
    return (pairs_ds.repartition(width)
            .map_batches(score, batch_format="pyarrow", batch_size=batch_size))


_BCAST_CACHE: dict = {}


def _bcast_get_raw(ref):
    """Per-process cache of one small broadcast object (e.g. the staged
    decoded-image mapping)."""
    import ray
    key = ("raw", ref.hex())
    if key not in _BCAST_CACHE:
        _BCAST_CACHE.clear()
        _BCAST_CACHE[key] = ray.get(ref)
    return _BCAST_CACHE[key]


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
    # staged pixels are float64 grayscale: h*w*8 bytes per image
    # REGARDLESS of the encoded size (compressed formats expand 30-80x,
    # so a fixed multiplier on encoded bytes badly under-estimates).
    # When the table carries (w, h), project them along and sum the
    # true decoded footprint from the materialized set; otherwise fall
    # back to 8x encoded bytes (the uncompressed-fixture ratio).
    try:
        names = set(images_ds.schema().names)
    except Exception:
        names = set()
    have_wh = {"w", "h"} <= names
    proj = [id_col, "bytes", "fmt"] + (["w", "h"] if have_wh else [])
    imgs = images_ds.select_columns(proj).materialize()
    if have_wh:
        def _px(b: pa.Table) -> pa.Table:
            w = b.column("w").to_numpy().astype(np.int64)
            h = b.column("h").to_numpy().astype(np.int64)
            return pa.table({"px": pa.array([int((w * h).sum())], pa.int64())})
        tot_px = imgs.map_batches(_px, batch_format="pyarrow",
                                  zero_copy_batch=True).sum("px") or 0
        decoded_est = int(tot_px) * 8
    else:
        decoded_est = imgs.size_bytes() * 8
    if decoded_est <= broadcast_limit_bytes:
        # staged decode-once (plasma-shared pixels) — strictly better
        # than the byte-broadcast path, which re-decoded each image
        # once per worker whenever the set overflowed the decode LRU
        return ssim_verify_pairs_staged(
            pairs_ds, stage_decoded_gray(imgs, id_col=id_col))
    return ssim_verify_pairs(imgs, pairs_ds, id_col=id_col, **kwargs)
