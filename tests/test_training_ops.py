"""Dedup / text / similarity / multimodal operator tests with oracles."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from metric_search_ray.pipelines import dedup, multimodal, similarity, text


@pytest.fixture(scope="module")
def docs_ds(ray_session):
    """Synthetic documents WITH planted duplicates and near-duplicates."""
    rng = np.random.default_rng(11)
    vocab = "alpha beta gamma delta epsilon zeta eta theta iota kappa".split()
    texts, ids = [], []
    base_texts = [" ".join(rng.choice(vocab, 30)) for _ in range(40)]
    i = 0
    for t in base_texts:
        texts.append(t)
        ids.append(i)
        i += 1
    # exact duplicates of the first 5
    for j in range(5):
        texts.append(base_texts[j])
        ids.append(i)
        i += 1
    # near-duplicates of the next 5 (one word changed)
    for j in range(5, 10):
        words = base_texts[j].split()
        words[3] = "OMEGA"
        texts.append(" ".join(words))
        ids.append(i)
        i += 1
    tbl = pa.table({"doc_id": pa.array(ids, pa.int64()),
                    "text": pa.array(texts, pa.string())})
    return rd.from_arrow(tbl), texts, ids


def test_exact_dedup(docs_ds):
    ds, texts, ids = docs_ds
    out = dedup.exact_dedup(ds).to_pandas()
    assert len(out) == 45  # 50 rows - 5 exact dups
    # keeper is the min doc_id per text
    expect = pd.DataFrame({"doc_id": ids, "text": texts}).groupby("text")["doc_id"].min()
    assert sorted(out["doc_id"]) == sorted(expect.tolist())


def test_minhash_near_dup_pairs(docs_ds):
    ds, texts, ids = docs_ds
    out = dedup.minhash_dedup_pairs(ds, threshold=0.5).to_pandas()
    pairs = set(map(tuple, out[["id_a", "id_b"]].to_numpy()))
    # all 5 exact-dup pairs must be found (jaccard 1.0)
    for j in range(5):
        assert (j, 40 + j) in pairs
    # near-dups (1 word changed out of 30) should also surface
    found_near = sum((j, 45 + (j - 5)) in pairs for j in range(5, 10))
    assert found_near >= 4
    # verified jaccard counts are exact integers
    for _, row in out.iterrows():
        ni, nu = dedup.jaccard_counts(texts[int(row["id_a"])], texts[int(row["id_b"])])
        assert (int(row["n_inter"]), int(row["n_union"])) == (ni, nu)


def test_ngram_jaccard_pairs_exact(docs_ds):
    """Inverted-index Jaccard vs a brute-force python oracle (df-capped
    universe, threshold filter, integer counts)."""
    ds, texts, ids = docs_ds
    cap, thr = 30, 0.5
    out = dedup.ngram_jaccard_pairs(ds, threshold=thr, df_cap=cap).to_pandas()
    # brute-force oracle over the capped shingle universe
    import collections
    sets = [set(dedup._shingle_hashes(t, 5).tolist()) for t in texts]
    df = collections.Counter()
    for s in sets:
        df.update(s)
    keep = {h for h, c in df.items() if c <= cap}
    capped = [s & keep for s in sets]
    expect = {}
    for a in range(len(texts)):
        for b in range(a + 1, len(texts)):
            ni = len(capped[a] & capped[b])
            nu = len(capped[a]) + len(capped[b]) - ni
            if nu and ni >= thr * nu:
                expect[(ids[a], ids[b])] = (ni, nu)
    got = {(r.id_a, r.id_b): (r.n_inter, r.n_union)
           for r in out.itertuples()}
    assert got == expect
    # the 5 exact-dup pairs are present with jaccard 1
    for j in range(5):
        assert got[(j, 40 + j)][0] == got[(j, 40 + j)][1]


def test_sort_block_aggregate_matches_ray_groupby(ray_session):
    """fastagg == Ray's own grouped aggregate, including keys split
    across sorted blocks (many repartitioned input blocks force edge
    healing to run)."""
    from ray.data.aggregate import Count, Max, Min, Sum

    from metric_search_ray.pipelines.fastagg import sort_block_aggregate

    rng = np.random.default_rng(7)
    n = 20_000
    tbl = pa.table({
        "k1": pa.array(rng.integers(0, 40, n).astype(str)),  # hot keys
        "k2": pa.array(rng.integers(0, 5, n), pa.int64()),
        "v": pa.array(rng.integers(-100, 100, n), pa.int64()),
    })
    ds = rd.from_arrow(tbl).repartition(16)
    got = sort_block_aggregate(
        ds, ["k1", "k2"],
        {"n": (None, "count"), "s": ("v", "sum"),
         "lo": ("v", "min"), "hi": ("v", "max")}).to_pandas()
    exp = (rd.from_arrow(tbl).groupby(["k1", "k2"])
           .aggregate(Count(alias_name="n"), Sum("v", alias_name="s"),
                      Min("v", alias_name="lo"), Max("v", alias_name="hi"))
           .to_pandas())
    key = ["k1", "k2"]
    got = got.sort_values(key).reset_index(drop=True)
    exp = exp.sort_values(key).reset_index(drop=True)[got.columns]
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_simhash_pairs(docs_ds):
    ds, texts, ids = docs_ds
    out = dedup.simhash_pairs(ds, max_hamming=3).to_pandas()
    pairs = set(map(tuple, out[["id_a", "id_b"]].to_numpy()))
    for j in range(5):
        assert (j, 40 + j) in pairs  # identical text -> hamming 0
    # oracle: brute-force simhash hamming over all pairs
    from metric_search_ray.phash import hamming
    sh = np.asarray([dedup.simhash64(t) for t in texts], np.int64)
    for a in range(len(texts)):
        hs = hamming(np.full(len(texts) - a - 1, sh[a], np.int64), sh[a + 1:])
        for off in np.flatnonzero(hs <= 3):
            assert (a, a + 1 + off) in pairs  # banding misses nothing


def test_hamming_pairs_exact_recall(ray_session):
    rng = np.random.default_rng(5)
    base = rng.integers(-2**62, 2**62, 30, dtype=np.int64)
    # plant pairs at known hamming distances
    rows = list(base)
    rows.append(base[0] ^ 0b111)      # hamming 3 from base[0]
    rows.append(base[1] ^ (1 << 40))  # hamming 1 from base[1]
    rows.append(base[2] ^ 0b11111)    # hamming 5 -> must NOT appear at t=3
    ids = [f"h-{i:03d}" for i in range(len(rows))]
    ds = rd.from_arrow(pa.table({"image_id": pa.array(ids),
                                 "phash": pa.array(rows, pa.int64())}))
    out = dedup.hamming_pairs(ds, max_hamming=3).to_pandas()
    pairs = set(map(tuple, out[["id_a", "id_b"]].to_numpy()))
    assert ("h-000", "h-030") in pairs
    assert ("h-001", "h-031") in pairs
    assert ("h-002", "h-032") not in pairs
    # full brute-force oracle
    from metric_search_ray.phash import hamming_matrix
    hm = hamming_matrix(np.asarray(rows), np.asarray(rows))
    expect = {(ids[i], ids[j]) for i in range(len(rows)) for j in range(i + 1, len(rows))
              if hm[i, j] <= 3}
    assert pairs == expect


def test_text_ops(ray_session):
    tbl = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["the quick brown fox", "a b c, d!", ""], pa.string()),
    })
    ds = rd.from_arrow(tbl)
    tc = text.token_count(ds).to_pandas().set_index("doc_id")["n_tokens"]
    assert tc[1] == 4 and tc[2] == 4 and tc[3] == 0
    q = text.quality_score(ds).to_pandas().set_index("doc_id")
    assert q.loc[1, "n_words"] == 4
    assert q.loc[1, "stopword_ratio"] == pytest.approx(0.25)
    assert q.loc[2, "punct_ratio"] == pytest.approx(2 / 9)
    fpm = text.fingerprint_mod(ds).to_pandas().set_index("doc_id")["fp31"]
    # Horner oracle in plain Python ints
    def horner(t, p=(1 << 31) - 1):
        acc = 0
        for ch in t:
            acc = (acc * 257 + ord(ch)) % p
        return acc
    assert fpm[1] == horner("the quick brown fox")
    assert fpm[3] == 0
    fp = text.fingerprint(ds).to_pandas()
    fp2 = text.fingerprint(ds).to_pandas()
    pd.testing.assert_frame_equal(fp.sort_values("doc_id").reset_index(drop=True),
                                  fp2.sort_values("doc_id").reset_index(drop=True))
    bpe = text.bpe_ish_token_count(ds).to_pandas().set_index("doc_id")["n_bpe_tokens"]
    assert bpe[2] == 6  # a b c , d !
    li = text.lang_id(ds).to_pandas().set_index("doc_id")
    assert li.loc[1, "lang_pred"] == "en"
    tt = text.top_tokens(rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["b a a", "a b c", "c a"], pa.string())})), k=2)
    assert tt["token"].tolist() == ["a", "b"]   # a:4, then b:2 beats c:2 by name
    assert tt["n"].tolist() == [4, 2]


@pytest.fixture(scope="module")
def embeddings_ds(ray_session):
    rng = np.random.default_rng(9)
    x = rng.normal(size=(200, 16)).astype(np.float32)
    x[50] = x[10] + rng.normal(0, 0.01, 16)  # planted near-dup
    tbl = pa.table({
        "vec_id": pa.array(np.arange(200), pa.int64()),
        "embedding": pa.array(list(x), pa.list_(pa.float32(), 16)),
    })
    return rd.from_arrow(tbl), x


def test_knn_cosine_exact(embeddings_ds):
    ds, x = embeddings_ds
    qidx = [0, 10, 100]
    out = similarity.knn_cosine(ds, qidx, x[qidx], k=5).to_pandas()
    xn = x / np.linalg.norm(x, axis=1, keepdims=True)
    for qi in qidx:
        got = out[out["query_id"] == qi].sort_values("rank")
        sims = xn @ xn[qi]
        order = np.lexsort((np.arange(200), -sims))[:5]
        assert list(got["vec_id"]) == list(order)
        np.testing.assert_allclose(got["similarity"].to_numpy(), sims[order], rtol=1e-6)


def test_knn_ivf_recall(embeddings_ds):
    ds, x = embeddings_ds
    cent = similarity.train_ivf_centroids(ds, n_lists=8, sample_rows=200)
    qidx = [3, 77]
    exact = similarity.knn_cosine(ds, qidx, x[qidx], k=10).to_pandas()
    approx = similarity.knn_ivf(ds, qidx, x[qidx], cent, k=10, nprobe=4).to_pandas()
    for qi in qidx:
        e = set(exact[exact["query_id"] == qi]["vec_id"])
        a = set(approx[approx["query_id"] == qi]["vec_id"])
        assert len(e & a) / len(e) >= 0.6  # recall floor with 4/8 lists probed


def test_embedding_dedup_finds_planted_pair(embeddings_ds):
    ds, x = embeddings_ds
    out = dedup.embedding_dedup_pairs(ds, cos_threshold=0.99,
                                      max_hamming=16).to_pandas()
    pairs = set(map(tuple, out[["id_a", "id_b"]].to_numpy()))
    assert (10, 50) in pairs


def test_multimodal_stages(ray_session, tiny_images):
    from metric_search_ray import codecs
    ds = rd.read_parquet(tiny_images).limit(60)
    feats = multimodal.decode_features(ds, concurrency=2).to_pandas()
    assert len(feats) == 60
    assert len(feats["features"].iloc[0]) == multimodal.ImageFeatures.DIM
    rez = multimodal.resize_images(ds, 8, 8, concurrency=2).to_pandas()
    pix = codecs.decode(rez["bytes"].iloc[0], rez["fmt"].iloc[0])
    assert pix.shape[:2] == (8, 8)
    # frame sampler on the fake ppmcat container
    rng = np.random.default_rng(0)
    frames = [codecs.ppm_encode(rng.integers(0, 255, (4, 4)).astype(np.uint8))
              for _ in range(25)]
    vds = rd.from_arrow(pa.table({
        "video_id": pa.array(["v0"], pa.string()),
        "bytes": pa.array([b"".join(frames)], pa.binary()),
        "fmt": pa.array(["ppmcat"], pa.string()),
    }))
    out = multimodal.sample_frames(vds, every_n=10).to_pandas()
    assert list(out["frame_no"]) == [0, 10, 20]
    assert out["bytes"].iloc[0] == frames[0]
    # stub boundary: unknown container raises NotImplementedError
    bad = rd.from_arrow(pa.table({
        "video_id": pa.array(["v1"], pa.string()),
        "bytes": pa.array([b"xx"], pa.binary()),
        "fmt": pa.array(["mp4"], pa.string()),
    }))
    with pytest.raises(Exception):
        multimodal.sample_frames(bad).to_pandas()


def test_ivf_persisted_index(ray_session, tmp_path):
    """build_ivf_index + knn_ivf_index must match in-memory knn_ivf with
    the same centroids; a rebuild resumes every list file."""
    import ray.data as rd
    from metric_search_ray.pipelines import similarity

    rng = np.random.default_rng(5)
    n, d = 400, 16
    x = rng.normal(size=(n, d))
    tbl = pa.table({"vec_id": pa.array(np.arange(n), pa.int64()),
                    "embedding": pa.array(list(x), pa.list_(pa.float64(), d))})
    ds = rd.from_arrow(tbl)
    cent = similarity.seed_centroids(ds, n_lists=8)
    q = x[:3]
    mem = similarity.knn_ivf(ds, [0, 1, 2], q, cent, k=5, nprobe=3).to_pandas()
    ck = str(tmp_path / "ivf")
    m1 = similarity.build_ivf_index(ds, ck, cent)
    assert not m1.to_pandas()["resumed"].any()
    idx = similarity.knn_ivf_index(ck, [0, 1, 2], q, k=5, nprobe=3).to_pandas()
    key = ["query_id", "rank"]
    mem_s = mem.sort_values(key).reset_index(drop=True)
    idx_s = idx.sort_values(key).reset_index(drop=True)
    assert mem_s["vec_id"].tolist() == idx_s["vec_id"].tolist()
    np.testing.assert_allclose(mem_s["similarity"], idx_s["similarity"], atol=1e-12)
    # resume: every list file skipped on rebuild
    m2 = similarity.build_ivf_index(ds, ck, cent)
    assert m2.to_pandas()["resumed"].all()


def test_sessions_scalable_matches_sessions_hot_key(ray_session):
    """Hot key (one user = 50% of events) — the skew-hardened two-phase
    sessionizer must produce exactly the plain sessionizer's output."""
    import pandas as pd
    import ray.data as rd
    from metric_search_ray.pipelines import windows

    rng = np.random.default_rng(11)
    n = 4000
    user = np.where(rng.random(n) < 0.5, 7, rng.integers(0, 50, n))
    base = np.datetime64("2025-01-01", "s").astype(np.int64)
    ts = base + np.sort(rng.integers(0, 90 * 86400, n))
    df = pd.DataFrame({
        "user_id": user.astype(np.int64),
        "ts": ts.astype("datetime64[s]"),
        "value": rng.normal(size=n),
    })
    ds = rd.from_pandas(df)
    cols = ["user_id", "session_start", "session_end", "n"]
    a = windows.sessions(ds, "user_id", "ts", 3600, "value").to_pandas()
    b = windows.sessions_scalable(ds, "user_id", "ts", 3600, "value",
                                  bucket_s=86400).to_pandas()
    a = a.sort_values(cols).reset_index(drop=True)
    b = b.sort_values(cols).reset_index(drop=True)
    assert a[cols].equals(b[cols])
    np.testing.assert_allclose(a["sum_value"], b["sum_value"], atol=1e-9)


def test_audio_features(ray_session):
    """pcm16 decode + descriptor: a pure tone's energy concentrates in
    one spectral band; the wav stub raises the explicit boundary."""
    rate = 8000
    t = np.arange(rate) / rate
    rows = []
    for i, freq in enumerate([200.0, 1800.0]):
        s = (np.sin(2 * np.pi * freq * t) * 20000).astype(np.int16)
        rows.append({"audio_id": f"a-{i}", "fmt": "pcm16",
                     "bytes": multimodal.encode_pcm16(rate, s)})
    tbl = pa.table({"audio_id": pa.array([r["audio_id"] for r in rows]),
                    "bytes": pa.array([r["bytes"] for r in rows], pa.binary()),
                    "fmt": pa.array([r["fmt"] for r in rows])})
    out = multimodal.audio_features(rd.from_arrow(tbl), concurrency=2).to_pandas()
    assert len(out) == 2
    f0 = np.asarray(out.set_index("audio_id").loc["a-0", "features"])
    f1 = np.asarray(out.set_index("audio_id").loc["a-1", "features"])
    assert f0[0] == pytest.approx(1.0)              # duration 1s
    assert f0[1] == pytest.approx(20000 / 32768 / np.sqrt(2), rel=1e-3)  # rms
    # higher tone crosses zero more often and peaks in a later band
    assert f1[2] > f0[2]
    assert np.argmax(f1[3:]) > np.argmax(f0[3:])
    assert f0[3:].sum() == pytest.approx(1.0, abs=1e-3)
    # wav decodes for real now (round 3): malformed wav is a loud
    # parse error, and the stub boundary moved to flac
    bad = pa.table({"audio_id": pa.array(["b"]),
                    "bytes": pa.array([b"RIFF"], pa.binary()),
                    "fmt": pa.array(["wav"])})
    with pytest.raises(Exception, match="RIFF/WAVE"):
        multimodal.audio_features(rd.from_arrow(bad), concurrency=2).materialize()
    stub = pa.table({"audio_id": pa.array(["c"]),
                     "bytes": pa.array([b"fLaC...."], pa.binary()),
                     "fmt": pa.array(["flac"])})
    with pytest.raises(Exception, match="audio library|NotImplemented"):
        multimodal.audio_features(rd.from_arrow(stub), concurrency=2).materialize()


def test_contamination_check_planted(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from metric_search_ray.pipelines import text as textops
    bench = rd.from_arrow(pa.table({
        "doc_id": pa.array([100], pa.int64()),
        "text": pa.array(["the quick brown fox jumps over the lazy dog"])}))
    train = rd.from_arrow(pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array([
            "totally clean document with no overlap at all here",
            "contains the quick brown fox jumps segment verbatim",
            "xy"])}))                        # < n tokens -> 0 grams
    out = (textops.contamination_check(train, bench, n=4).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert out["n_contaminated"].tolist()[0] == 0
    assert out["n_contaminated"].tolist()[1] == 2   # two 4-grams overlap
    assert out["n_ngrams"].tolist()[2] == 0


def test_embedding_dedup_n_planes_honored(ray_session):
    """n_planes must actually change the signature (review finding: it
    was hardcoded to 64); >64 raises; results stay exact-precision at
    any plane count (the verify stage computes true cosine)."""
    import pyarrow as pa
    import ray.data as rd
    from metric_search_ray.pipelines import dedup

    rng = np.random.default_rng(5)
    base = rng.normal(size=(40, 16))
    # plant 5 near-dup pairs
    dup = base[:5] + rng.normal(scale=1e-3, size=(5, 16))
    x = np.vstack([base, dup])
    t = pa.table({"vec_id": pa.array(np.arange(len(x), dtype=np.int64)),
                  "embedding": pa.array(list(x.astype(np.float64)))})
    ds = rd.from_arrow(t)
    got = dedup.embedding_dedup_pairs(
        ds, cos_threshold=0.99, n_planes=32, max_hamming=8).to_pandas()
    pairs = {tuple(sorted(p)) for p in
             zip(got["id_a"].astype(int), got["id_b"].astype(int))}
    assert {(i, 40 + i) for i in range(5)} <= pairs
    # exact precision: every reported pair really is above threshold
    for a, b in pairs:
        cos = float(x[a] @ x[b] / (np.linalg.norm(x[a]) * np.linalg.norm(x[b])))
        assert cos >= 0.99
    with pytest.raises(ValueError):
        dedup.embedding_dedup_pairs(ds, n_planes=128)


def test_bigram_lm_score_census_cap(ray_session):
    """max_bigrams: capped run (a) returns a row per scoreable doc,
    (b) never scores ABOVE the exact path (unseen bigrams smooth to
    count 0), (c) equals the exact path when the cap exceeds the
    census."""
    import pyarrow as pa
    import ray.data as rd
    from metric_search_ray.pipelines import text as textops

    rng = np.random.default_rng(9)
    # open-vocab-ish corpus: 300 docs with mostly-unique tokens + a few
    # heavy-hitter bigrams
    docs = []
    for i in range(300):
        toks = [f"tok{rng.integers(0, 5000)}" for _ in range(20)]
        if i % 3 == 0:
            toks[:2] = ["the", "cat"]
        docs.append(" ".join(toks))
    t = pa.table({"doc_id": pa.array(np.arange(300, dtype=np.int64)),
                  "text": pa.array(docs)})
    ds = rd.from_arrow(t)
    exact = textops.bigram_lm_score(ds).to_pandas().set_index("doc_id")
    capped = textops.bigram_lm_score(ds, max_bigrams=50).to_pandas(
        ).set_index("doc_id")
    big = textops.bigram_lm_score(ds, max_bigrams=10**6).to_pandas(
        ).set_index("doc_id")
    assert len(capped) == len(exact) == 300
    j = exact.join(capped, rsuffix="_c")
    assert (j["score_u_c"] <= j["score_u"]).all()
    pd.testing.assert_frame_equal(exact.sort_index(), big.sort_index())


def test_audio_video_fixtures_and_stages(ray_session):
    """Audio/video fixture determinism + the sampling/descriptor stages
    (serial kernel == actor-pool stage)."""
    import pyarrow as pa
    import ray.data as rd

    from metric_search_ray import codecs, fixtures, phash
    from metric_search_ray.pipelines import multimodal

    a1, a2 = fixtures.audio_row_of(7), fixtures.audio_row_of(7)
    assert a1["bytes"] == a2["bytes"]
    v1, v2 = fixtures.video_row_of(3), fixtures.video_row_of(3)
    assert v1["bytes"] == v2["bytes"]

    at = fixtures.audio_batch(np.arange(40))
    feats = multimodal.audio_features(rd.from_arrow(at), concurrency=2
                                      ).to_pandas().sort_values("audio_id")
    serial = multimodal.AudioFeatures()(at)
    m_d = np.stack(feats["features"].to_numpy())
    m_s = np.stack(serial.column("features").to_numpy(zero_copy_only=False))
    np.testing.assert_array_equal(m_d, m_s)

    vt = fixtures.video_batch(np.arange(10))
    frames = multimodal.sample_frames(rd.from_arrow(vt), every_n=10,
                                      concurrency=2).to_pandas()
    # 24 frames sampled every 10th -> 0, 10, 20 per video
    assert len(frames) == 30
    assert sorted(frames["frame_no"].unique()) == [0, 10, 20]
    pix = codecs.ppm_decode(frames["bytes"].iloc[0])
    assert pix.shape == (16, 16)
    # frame phash kernel consistency
    ph = phash.phash64_batch(pix[None].astype(np.float64))
    assert int(ph[0]) == phash.phash64(pix)


def test_chunk_documents_semantics(ray_session):
    import numpy as np
    import pyarrow as pa
    import pytest
    import ray.data as rd

    from metric_search_ray.pipelines import text as textops

    docs = pa.table({"doc_id": [1, 2, 3, 4],
                     "text": ["a b c d e f g h i j", "", "  x  ",
                              " ".join(f"t{i}" for i in range(100))]})
    out = (textops.chunk_documents(rd.from_arrow(docs), 4, 1)
           .to_pandas().sort_values(["doc_id", "start_tok"])
           .reset_index(drop=True))
    d1 = out[out["doc_id"] == 1]
    assert list(d1["start_tok"]) == [0, 3, 6]
    assert list(d1["chunk_text"]) == ["a b c d", "d e f g", "g h i j"]
    # consecutive chunks share exactly `overlap` tokens
    assert d1["chunk_text"].iloc[0].split()[-1] == \
        d1["chunk_text"].iloc[1].split()[0]
    # empty doc -> one empty chunk; whitespace-only -> its one token
    assert list(out[out["doc_id"] == 2]["chunk_text"]) == [""]
    assert list(out[out["doc_id"] == 3]["chunk_text"]) == ["x"]
    # every token covered exactly: reconstruct doc 4 from stride spans
    d4 = out[out["doc_id"] == 4]
    toks = []
    for _, r in d4.iterrows():
        chunk = r["chunk_text"].split()
        toks.extend(chunk if r["start_tok"] == 0 else chunk[1:])
    assert toks == [f"t{i}" for i in range(100)]
    with pytest.raises(ValueError, match="max_tokens"):
        textops.chunk_documents(rd.from_arrow(docs), 4, 4)


def test_duplicate_ngram_stats(ray_session):
    """Hand-computed fixture + brute-force parity: n-gram occurrences
    with corpus-wide count >= 2 (within-doc repeats included)."""
    docs = {
        1: "a b c d e",            # 3-grams: abc bcd cde
        2: "x a b c y",            # 'a b c' shared with doc 1
        3: "p q p q p q",          # every 3-gram repeats in-doc
        4: "lone words here only",
        5: "",
    }
    tbl = pa.table({"doc_id": pa.array(list(docs), pa.int64()),
                    "text": pa.array(list(docs.values()), pa.string())})
    out = dedup.duplicate_ngram_stats(
        rd.from_arrow(tbl).repartition(3), n=3).to_pandas()
    got = {int(r.doc_id): (int(r.n_ngrams), int(r.n_dup))
           for r in out.itertuples()}
    assert got == {1: (3, 1), 2: (3, 1), 3: (4, 4), 4: (2, 0), 5: (0, 0)}


def test_duplicate_ngram_stats_brute_parity(ray_session, docs_ds):
    from collections import Counter

    ds, texts, ids = docs_ds
    out = dedup.duplicate_ngram_stats(ds, n=4).to_pandas()
    cnt = Counter()
    grams_of = {}
    for did, txt in zip(ids, texts):
        toks = txt.split()
        gs = [" ".join(toks[i:i + 4]) for i in range(max(len(toks) - 3, 0))]
        grams_of[int(did)] = gs
        cnt.update(gs)
    got = {int(r.doc_id): (int(r.n_ngrams), int(r.n_dup))
           for r in out.itertuples()}
    for did, gs in grams_of.items():
        assert got[did] == (len(gs), sum(1 for g in gs if cnt[g] >= 2)), did
    # planted exact duplicates guarantee nonzero signal
    assert sum(nd for _, nd in got.values()) > 0


def test_remove_duplicate_spans(ray_session):
    """Keeper = globally smallest (doc_id, pos); overlapping spans
    union; scrubbed text drops exactly the covered tokens."""
    docs = {
        1: "a b c d e",
        2: "x a b c y",        # 'a b c' keeper lives in doc 1
        3: "p q r p q r",      # in-doc repeat: second occurrence cut
        4: "solo text here",
        5: "",
    }
    tbl = pa.table({"doc_id": pa.array(list(docs), pa.int64()),
                    "text": pa.array(list(docs.values()), pa.string())})
    out = dedup.remove_duplicate_spans(
        rd.from_arrow(tbl).repartition(3), n=3).to_pandas()
    got = {int(r.doc_id): (r.text, int(r.n_tokens), int(r.n_removed))
           for r in out.itertuples()}
    assert got == {1: ("a b c d e", 5, 0), 2: ("x y", 5, 3),
                   3: ("p q r", 6, 3), 4: ("solo text here", 3, 0),
                   5: ("", 0, 0)}


def test_remove_duplicate_spans_serial_replay(ray_session, docs_ds):
    from collections import defaultdict

    ds, texts, ids = docs_ds
    n = 4
    out = dedup.remove_duplicate_spans(ds, n=n).to_pandas(
        ).set_index("doc_id")
    occ = defaultdict(list)
    toks_of = {}
    for did, txt in zip(ids, texts):
        toks = txt.split()
        toks_of[int(did)] = toks
        for i in range(max(len(toks) - n + 1, 0)):
            occ[" ".join(toks[i:i + n])].append((int(did), i))
    rem = defaultdict(list)
    for lst in occ.values():
        if len(lst) >= 2:
            for did, p in sorted(lst)[1:]:
                rem[did].append(p)
    removed_total = 0
    for did, toks in toks_of.items():
        cov = np.zeros(len(toks), bool)
        for p in rem.get(did, []):
            cov[p:p + n] = True
        kept = " ".join(t for t, c in zip(toks, cov) if not c)
        r = out.loc[did]
        assert (r["text"], r["n_tokens"], r["n_removed"]) == \
            (kept, len(toks), int(cov.sum())), did
        removed_total += int(cov.sum())
    assert removed_total > 0          # planted duplicates guarantee cuts


def test_video_neardup_pairs_planted(ray_session):
    """Exact-dup video (hamming 0), pixel-tweaked near-dup, and a
    shorter video that must NOT pair (aligned-length requirement)."""
    from metric_search_ray import codecs, fixtures
    from metric_search_ray.pipelines.multimodal import (
        _split_ppmcat, video_neardup_pairs)

    rows = [fixtures.video_row_of(i) for i in range(6)]
    dup = dict(rows[0])
    dup["video_id"] = "vid-dup00000"
    frames = _split_ppmcat(rows[1]["bytes"])
    nd_frames = []
    for fb in frames:
        pix = codecs.ppm_decode(fb).copy()
        pix[0, 0] = 255 - pix[0, 0]
        nd_frames.append(codecs.ppm_encode(pix))
    nd = {"video_id": "vid-near0001", "bytes": b"".join(nd_frames),
          "fmt": "ppmcat", "fps": 12, "n_frames": rows[1]["n_frames"]}
    short = {"video_id": "vid-short002", "bytes": b"".join(frames[:10]),
             "fmt": "ppmcat", "fps": 12, "n_frames": 10}
    allr = rows + [dup, nd, short]
    tbl = pa.table({k: pa.array(
        [r[k] for r in allr],
        pa.binary() if k == "bytes" else
        (pa.int32() if k in ("fps", "n_frames") else pa.string()))
        for k in ("video_id", "bytes", "fmt", "fps", "n_frames")})
    out = multimodal.video_neardup_pairs(
        rd.from_arrow(tbl).repartition(3), every_n=5,
        max_frame_hamming=6).to_pandas()
    pairs = set(map(tuple, out[["id_a", "id_b"]].to_numpy()))
    assert ("vid-00000000", "vid-dup00000") in pairs
    assert any("vid-near0001" in p and "vid-00000001" in p for p in pairs)
    assert not any("vid-short002" in a or "vid-short002" in b
                   for a, b in pairs)
    exact = out[(out.id_a == "vid-00000000") & (out.id_b == "vid-dup00000")]
    assert int(exact["max_hamming"].iloc[0]) == 0


def test_dup_ngram_ops_randomized_corpus(ray_session):
    """Randomized tiny-vocab corpus (heavy collisions, empty docs,
    docs shorter than n) — census AND scrub vs a brute-force replay."""
    from collections import Counter, defaultdict

    rng = np.random.default_rng(123)
    vocab = list("abcde")
    texts = [" ".join(rng.choice(vocab, rng.integers(0, 12)))
             for _ in range(60)]
    ids = list(range(60))
    n = 2
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(texts, pa.string())})).repartition(7)

    cnt = Counter()
    occ = defaultdict(list)
    toks_of = {}
    for did, txt in zip(ids, texts):
        toks = txt.split()
        toks_of[did] = toks
        for i in range(max(len(toks) - n + 1, 0)):
            g = " ".join(toks[i:i + n])
            cnt[g] += 1
            occ[g].append((did, i))

    stats = dedup.duplicate_ngram_stats(ds, n=n).to_pandas(
        ).set_index("doc_id")
    for did, toks in toks_of.items():
        gs = [" ".join(toks[i:i + n])
              for i in range(max(len(toks) - n + 1, 0))]
        assert stats.loc[did, "n_ngrams"] == len(gs)
        assert stats.loc[did, "n_dup"] == sum(
            1 for g in gs if cnt[g] >= 2), did

    rem = defaultdict(list)
    for lst in occ.values():
        if len(lst) >= 2:
            for did, p in sorted(lst)[1:]:
                rem[did].append(p)
    scrub = dedup.remove_duplicate_spans(ds, n=n).to_pandas(
        ).set_index("doc_id")
    for did, toks in toks_of.items():
        cov = np.zeros(len(toks), bool)
        for p in rem.get(did, []):
            cov[p:p + n] = True
        kept = " ".join(t for t, c in zip(toks, cov) if not c)
        assert scrub.loc[did, "text"] == kept, did
        assert scrub.loc[did, "n_removed"] == int(cov.sum())


def test_video_neardup_color_and_mixed_shapes(ray_session):
    """Color (P6) frames and mixed frame resolutions must not crash the
    per-frame phash stage (gray-reduce + per-shape batching)."""
    from metric_search_ray import codecs
    from metric_search_ray.pipelines.multimodal import video_neardup_pairs

    rng = np.random.default_rng(3)

    def vid(vid_id, size, color, nframes=10):
        frames = []
        for f in range(nframes):
            shape = (size, size, 3) if color else (size, size)
            frames.append(codecs.ppm_encode(
                rng.integers(0, 256, shape).astype(np.uint8)))
        return {"video_id": vid_id, "bytes": b"".join(frames),
                "fmt": "ppmcat", "fps": 12, "n_frames": nframes}

    rows = [vid("v-color-a", 16, True), vid("v-color-b", 16, True),
            vid("v-gray-c", 16, False), vid("v-big-d", 24, False)]
    # plant one exact color duplicate
    dup = dict(rows[0])
    dup["video_id"] = "v-color-dup"
    rows.append(dup)
    tbl = pa.table({k: pa.array(
        [r[k] for r in rows],
        pa.binary() if k == "bytes" else
        (pa.int32() if k in ("fps", "n_frames") else pa.string()))
        for k in ("video_id", "bytes", "fmt", "fps", "n_frames")})
    out = video_neardup_pairs(rd.from_arrow(tbl), every_n=3,
                              max_frame_hamming=4).to_pandas()
    pairs = set(map(tuple, out[["id_a", "id_b"]].to_numpy()))
    assert ("v-color-a", "v-color-dup") in pairs
