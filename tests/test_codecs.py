import numpy as np

from metric_search_ray import codecs


def _img(seed, shape):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, shape).astype(np.uint8)


def test_ppm_roundtrip_gray_and_rgb():
    for shape in [(16, 16), (32, 64), (17, 23), (16, 16, 3), (33, 31, 3)]:
        pix = _img(1, shape)
        buf = codecs.ppm_encode(pix)
        out = codecs.ppm_decode(buf)
        assert out.shape == pix.shape
        assert np.array_equal(out, pix)
        assert codecs.psnr(pix, out) == float("inf")


def test_qdct_psnr_gate():
    """Calibration: the lossy codec must clear the 40 dB gate by construction."""
    for shape in [(16, 16), (64, 64), (33, 31), (32, 32, 3)]:
        pix = _img(2, shape)
        out = codecs.qdct_decode(codecs.qdct_encode(pix))
        assert out.shape == pix.shape
        assert codecs.psnr(pix, out) >= 40.0


def test_qdct_smooth_image_near_lossless():
    yy, xx = np.mgrid[0:32, 0:32]
    pix = ((xx + yy) * 2).astype(np.uint8)
    out = codecs.qdct_decode(codecs.qdct_encode(pix))
    assert codecs.psnr(pix, out) >= 45.0


def test_dispatch():
    pix = _img(3, (16, 16))
    for fmt in ("ppm", "qdct"):
        out = codecs.decode(codecs.encode(pix, fmt), fmt)
        assert out.shape == pix.shape


def test_image_patches_grid_and_self_knn(ray_session, tiny_images):
    import pyarrow.parquet as pq
    import ray.data as rd

    from metric_search_ray.pipelines import multimodal, similarity

    ds = rd.read_parquet(tiny_images)
    sub = ds.map_batches(
        lambda b: b.slice(0, min(50, b.num_rows)), batch_format="pyarrow")
    patches = multimodal.image_patches(sub, grid=4, concurrency=2)
    pdf = patches.to_pandas()
    n_imgs = pdf["image_id"].nunique()
    assert len(pdf) == n_imgs * 16
    assert sorted(pdf[pdf.image_id == pdf.image_id.iloc[0]]["patch_id"]) == list(range(16))
    # self-similarity: a query patch's top hit is itself (cosine 1)
    q = pdf.iloc[0]
    qvec = np.asarray(q["descriptor"], np.float64)
    out = similarity.knn_cosine(patches, [q["patch_key"]], qvec[None, :], k=3,
                                vec_col="descriptor", id_col="patch_key"
                                ).to_pandas().sort_values("rank")
    assert out.iloc[0]["patch_key"] == q["patch_key"]
    assert out.iloc[0]["similarity"] > 0.999999
