"""Training-data operator gates not expressible as SQL oracles:
ANN recall vs brute force, LSH recall vs exact Jaccard, image feature
correctness vs the codec, and multimodal stub behavior."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etlpy_spark.operators import dedup as dd
from etlpy_spark.operators import multimodal as mm
from etlpy_spark.operators import similarity as sim

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")


@pytest.fixture(scope="module")
def embeddings(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def test_minhash_lsh_matches_exact(spark, docs):
    near = docs.unionByName(
        docs.select((F.col("doc_id") + 10_000).alias("doc_id"),
                    F.concat("text", F.lit(" zzz")).alias("text"))
    )
    exact = {(r.id_a, r.id_b) for r in dd.ngram_jaccard_pairs(near, threshold=0.6).collect()}
    lsh = {(r.id_a, r.id_b) for r in dd.minhash_lsh_pairs(near, threshold=0.6).collect()}
    assert lsh == exact  # verification removes FPs; banding recall ≈ 1 here
    assert len(exact) >= docs.count()  # every (doc, doc+zzz) pair found


def test_ann_ivf_recall(spark, embeddings):
    qv = list(embeddings.filter(F.col("vec_id") == 0).head()["embedding"])
    exact = [r.vec_id for r in sim.brute_force_topk(embeddings, qv, k=10).orderBy("rank").collect()]
    approx = [r.vec_id for r in sim.ivf_topk(embeddings, qv, k=10, n_cells=8, nprobe=4).orderBy("rank").collect()]
    recall = len(set(exact) & set(approx)) / 10
    assert exact[0] == 0  # the query vector itself is its own 1-NN
    assert recall >= 0.7  # nprobe=4/8 cells: generous bound, deterministic
    # the vectorized (Arrow numpy kernel) scoring path must rank identically
    vec = [
        r.vec_id
        for r in sim.brute_force_topk(embeddings, qv, k=10, vectorized=True)
        .orderBy("rank")
        .collect()
    ]
    assert vec == exact

def test_ivf_index_build_query(spark, embeddings, tmp_path):
    """The persisted IVF index must answer bit-identically to the fused
    one-shot path (same quantizer sample, same assignment/cosine kernels),
    and a query must touch ONLY its nprobe probed cells' files — the scan
    assertion that makes a 100 TB query workload O(corpus/cells x nprobe)
    instead of O(corpus) per query."""
    qv = list(embeddings.filter(F.col("vec_id") == 0).head()["embedding"])
    fused = sim.ivf_topk(
        embeddings, qv, k=10, n_cells=8, nprobe=4
    ).orderBy("rank").collect()

    idx = sim.build_ivf_index(embeddings, str(tmp_path / "ivf"), n_cells=8)
    got = sim.query_ivf(spark, idx, qv, k=10, nprobe=4).orderBy("rank").collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in fused]

    # reload from disk → same handle, same answer
    idx2 = sim.load_ivf_index(str(tmp_path / "ivf"))
    got2 = sim.query_ivf(spark, idx2, qv, k=10, nprobe=4).orderBy("rank").collect()
    assert [tuple(r) for r in got2] == [tuple(r) for r in fused]

    # scan assertion: the reader lists ≤ nprobe cell partitions, nothing else
    cells = sim.probe_cells(idx, qv, nprobe=4)
    assert len(cells) <= 4
    pruned = spark.read.option("basePath", idx.data_dir).parquet(
        *[idx.cell_dir(c) for c in cells]
    )
    touched = {f.split("/cell=")[1].split("/")[0] for f in pruned.inputFiles()}
    assert touched <= {str(c) for c in cells}
    # and the index actually has more cells than the query touches
    import os

    all_cells = {d for d in os.listdir(idx.data_dir) if d.startswith("cell=")}
    assert len(all_cells) > len(cells)


def test_simhash_hamming_locality(spark, docs):
    near = docs.unionByName(
        docs.select((F.col("doc_id") + 10_000).alias("doc_id"),
                    F.concat("text", F.lit(" zzz")).alias("text"))
    )
    sh = {r.id: r.simhash for r in dd.simhash_bits(near).collect()}

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    ids = sorted(i for i in sh if i < 10_000)[:50]
    near_d = [ham(sh[i], sh[i + 10_000]) for i in ids]
    far_d = [ham(sh[ids[i]], sh[ids[i + 1]]) for i in range(len(ids) - 1)]
    assert sum(near_d) / len(near_d) < 6
    assert sum(far_d) / len(far_d) > 12


def test_image_features_match_codec(spark):
    from etlpy_spark.functions.imagecodec import image_spec, phash64, render_pixels

    imgs = mm.synthetic_images_df(spark, n=24, parallelism=4)
    rows = {r.image_id: r for r in mm.decode_image_features(imgs).collect()}
    assert len(rows) == 24
    for iid, r in rows.items():
        w, h, fmt = image_spec(iid)
        assert (r.w, r.h, r.fmt) == (w, h, fmt)
        assert r.phash == phash64(render_pixels(iid))


def test_image_resize_shape_and_content(spark):
    from etlpy_spark.functions.imagecodec import decode

    imgs = mm.synthetic_images_df(spark, n=8, parallelism=2)
    thumbs = mm.resize_images(imgs, size=16).collect()
    assert len(thumbs) == 8
    for t in thumbs:
        px = decode(bytes(t.bytes))
        assert px.shape == (16, 16, 3)


def test_audio_compressed_raises_wav_decodes(spark):
    import numpy as np

    from etlpy_spark.functions.mediacodec import encode_wav

    # headerless blob: still raises unless the PCM interpretation is opted in
    df = spark.createDataFrame([("c0", b"\x01\x02\x03\x04")], "clip_id string, bytes binary")
    with pytest.raises(Exception, match="NotImplementedError|codec"):
        mm.decode_audio_features(df).collect()
    rows = mm.decode_audio_features(df, _fake=True).collect()
    assert rows[0].n_samples == 2 and rows[0].sample_rate == 16000

    # real WAV: stereo int16 at 22050 Hz decodes natively
    pcm = (np.sin(np.arange(800) / 7.0) * 20000).astype("<i2")
    wav = encode_wav(np.stack([pcm, -pcm], axis=1), 22050)
    df2 = spark.createDataFrame([("c1", wav)], "clip_id string, bytes binary")
    r = mm.decode_audio_features(df2).collect()[0]
    assert (r.n_samples, r.sample_rate, r.n_channels) == (800, 22050, 2)
    assert r.duration_s == pytest.approx(800 / 22050, abs=1e-6)
    assert 0.3 < r.rms < 0.6  # ~0.43 for a 20000/32768-amplitude sine


def test_video_sampling_rawcat_and_y4m(spark):
    from etlpy_spark.functions.imagecodec import decode, encode_raw, psnr, render_pixels
    from etlpy_spark.functions.mediacodec import encode_y4m

    import numpy as np

    base = render_pixels("img-000000000000")
    src = [np.roll(base, 3 * j, axis=1) for j in range(12)]
    rawcat = b"".join(encode_raw(px) for px in src)
    y4m = encode_y4m(src, colorspace="C444")
    df = spark.createDataFrame(
        [("v-raw", rawcat), ("v-y4m", y4m), ("v-bad", b"\x00\x01\x02")],
        "video_id string, bytes binary",
    )
    # unknown container still raises
    with pytest.raises(Exception, match="NotImplementedError|ffmpeg"):
        mm.sample_video_frames(df, every_n=5).collect()
    rows = mm.sample_video_frames(df.filter("video_id != 'v-bad'"), every_n=5).collect()
    by_vid = {}
    for r in rows:
        by_vid.setdefault(r.video_id, {})[r.frame_idx] = bytes(r.bytes)
    assert sorted(by_vid["v-raw"]) == [0, 5, 10]
    assert sorted(by_vid["v-y4m"]) == [0, 5, 10]
    for idx in (0, 5, 10):
        assert decode(by_vid["v-raw"][idx]).tobytes() == src[idx].tobytes()
        # YUV444 round-trip is lossy only by integer rounding: PSNR >= 40 dB
        # (the north rule's lossy-format invariant)
        assert psnr(decode(by_vid["v-y4m"][idx]), src[idx]) >= 40.0


def test_exact_dedup_keep_first(spark):
    df = spark.createDataFrame(
        [(1, "aa"), (2, "bb"), (3, "aa"), (4, "aa")], "doc_id long, text string"
    )
    kept = sorted(r.doc_id for r in dd.exact_dedup(df).collect())
    assert kept == [1, 2]


def test_embedding_near_dup_boundary_straddlers(spark):
    """Near-dup pairs whose element sums sit at a sign boundary — the r1
    prefix-sum sign blocking missed these deterministically; hyperplane-LSH
    banding must recover every pair the exact operator finds."""
    import numpy as np

    from etlpy_spark.operators import dedup as dd

    rng = np.random.RandomState(3)
    rows = []
    for i in range(40):
        # base vector with ~zero mean (every quarter-sum hovers near 0)
        v = rng.normal(0, 1.0, 64)
        v -= v.mean()
        # near-copy: tiny perturbation that can flip quarter-sum signs
        w = v + rng.normal(0, 0.01, 64)
        rows.append((i, [float(x) for x in v]))
        rows.append((i + 1000, [float(x) for x in w]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    got = {
        (r.id_a, r.id_b)
        for r in dd.embedding_near_dup_pairs(df, threshold=0.99).collect()
    }
    # exact reference: brute-force all pairs
    V = {i: np.asarray(v, dtype=np.float64) for i, v in rows}
    expect = set()
    ks = sorted(V)
    for ai in range(len(ks)):
        for bi in range(ai + 1, len(ks)):
            a, b = ks[ai], ks[bi]
            c = V[a] @ V[b] / (np.linalg.norm(V[a]) * np.linalg.norm(V[b]))
            if c >= 0.99:
                expect.add((a, b))
    assert expect, "fixture must contain near-dup pairs"
    assert got == expect


def test_phash_near_dup_pairs(spark):
    """Banded-Hamming pHash near-dup: output must equal the brute-force
    O(n²) answer (pigeonhole banding is exact for the radius)."""
    import itertools
    import random

    from etlpy_spark.operators.multimodal import phash_near_dup_pairs

    rng = random.Random(7)
    base = [rng.getrandbits(63) for _ in range(40)]
    rows = []
    for i, h in enumerate(base):
        rows.append((f"img{i:03d}", h))
        if i % 4 == 0:  # a near-copy within radius 3
            flipped = h ^ (1 << rng.randrange(63)) ^ (1 << rng.randrange(63))
            rows.append((f"img{i:03d}-nd", flipped))
    expected = set()
    for (ia, ha), (ib, hb) in itertools.combinations(rows, 2):
        if bin(ha ^ hb).count("1") <= 3:
            expected.add(tuple(sorted((ia, ib))))
    df = spark.createDataFrame(rows, "image_id string, phash long")
    got = {
        (r.id_a, r.id_b)
        for r in phash_near_dup_pairs(df, max_hamming=3).collect()
    }
    assert got == expected and len(expected) >= 10
    # uncapped expansion must agree (every bucket here is under the cap)
    got_uncapped = {
        (r.id_a, r.id_b)
        for r in phash_near_dup_pairs(df, max_hamming=3, max_bucket=None).collect()
    }
    assert got_uncapped == expected


def test_phash_mega_bucket_star_path(spark):
    """Placeholder-image flood: thousands of rows sharing ONE pHash land in
    the same bucket in every band — with a tiny cap the miner must emit
    hub-star pairs only (bounded state), all at hamming 0."""
    from etlpy_spark.operators.multimodal import phash_near_dup_pairs

    rows = [(f"ph{i:04d}", 0x1234_5678_9ABC_DEF0) for i in range(50)]
    rows += [("solo", 0x0FED_CBA9_8765_4321)]
    df = spark.createDataFrame(rows, "image_id string, phash long")
    got = phash_near_dup_pairs(df, max_hamming=3, max_bucket=4).collect()
    assert got and all(r.id_a == "ph0000" and r.hamming == 0 for r in got)
    assert {r.id_b for r in got} == {f"ph{i:04d}" for i in range(1, 50)}


def test_embedding_mega_bucket_star_path(spark):
    """Identical embeddings collide in every hyperplane band; with a tiny
    cap the miner emits exact-verified star pairs to the min id."""
    from etlpy_spark.operators import dedup as dd

    vec = [float((i * 37 % 19) - 9) for i in range(32)]
    rows = [(i, vec) for i in range(40)]
    rows.append((999, [float(-x) for x in vec]))  # antipode: never a pair
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = dd.embedding_near_dup_pairs(df, threshold=0.95, max_bucket=3).collect()
    assert got and all(r.id_a == 0 and r.cos == 1.0 for r in got)
    assert {r.id_b for r in got} == set(range(1, 40))


def test_repetition_metrics_differential(spark):
    """Gopher repetition signals vs an independent pure-Python replica on
    crafted docs: a clean doc, a line-spam doc, a 2-gram chant, a
    duplicated-3-gram doc, an empty doc, and a one-word doc."""
    from etlpy_spark.operators.text import repetition_metrics

    docs = [
        (1, "alpha beta gamma delta epsilon zeta\neta theta iota kappa"),
        (2, "buy now\nbuy now\nbuy now\nlimited offer\nbuy now"),
        (3, "ho ho ho ho ho ho ho ho"),
        (4, "one two three four one two three nine one two three"),
        (5, ""),
        (6, "word"),
        (7, "  spaced   out\n\n  spaced   out  \nsolo  "),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r.doc_id: r.asDict()
        for r in repetition_metrics(df, top_n=2, dup_n=3).collect()
    }

    def replica(text, top_n=2, dup_n=3):
        from collections import Counter

        nchars = len(text)
        lines = [l.strip() for l in text.split("\n")]
        lines = [l for l in lines if l]
        lc = Counter(lines)
        nl, ndl = len(lines), len(lc)
        lch = sum(c * len(l) for l, c in lc.items())
        dlch = sum((c - 1) * len(l) for l, c in lc.items())
        # Spark split(trim(x), '\s+') on ''/whitespace gives [''] (size 1)
        words = text.strip().split() or [""]
        def grams(n):
            return Counter(
                " ".join(words[i : i + n]) for i in range(len(words) - n + 1)
            )
        g_top, g_dup = grams(top_n), grams(dup_n)
        topch = max((c * len(g) for g, c in g_top.items()), default=None)
        dupch = sum(c * len(g) for g, c in g_dup.items() if c > 1) if g_dup else None
        out = dict(
            n_lines=nl,
            dup_line_frac=round((nl - ndl) / nl, 4) if nl else 0.0,
            dup_line_char_frac=round(dlch / lch, 4) if lch else 0.0,
            top_ngram_char_frac=round(min(topch / nchars, 1.0), 4)
            if topch is not None and nchars
            else 0.0,
            dup_ngram_char_frac=round(min(dupch / nchars, 1.0), 4)
            if dupch is not None and nchars
            else 0.0,
        )
        return out

    for doc_id, text in docs:
        exp = replica(text)
        act = {k: v for k, v in got[doc_id].items() if k != "doc_id"}
        for k in exp:
            assert act[k] == pytest.approx(exp[k], abs=1e-9), (doc_id, k, act, exp)
    # sanity on the signal itself: spam docs score far above the clean doc
    assert got[2]["dup_line_frac"] > 0.5 > got[1]["dup_line_frac"]
    assert got[3]["top_ngram_char_frac"] > 0.3 > got[1]["top_ngram_char_frac"]
    assert got[4]["dup_ngram_char_frac"] > 0.5 > got[1]["dup_ngram_char_frac"]

def test_gopher_full_rules_differential(spark):
    """FULL Gopher A1.1 rule set (top-n for n in {2,3,4}, dup-n for n in
    {5..10}) vs an independent pure-Python replica that mirrors frac4's
    exact integer half-up rounding — equality is EXACT (==), no tolerance,
    since both sides derive the double from the same basis-point integer."""
    from etlpy_spark.operators.text import repetition_metrics

    top_ns, dup_ns = (2, 3, 4), (5, 6, 7, 8, 9, 10)
    chant = " ".join(["spam ham"] * 30)                      # 2-gram flood
    six = "one two three four five six " * 12                # 6-gram dups
    docs = [
        (1, "alpha beta gamma delta epsilon zeta\neta theta iota kappa"),
        (2, chant + "\n" + chant),
        (3, six.strip()),
        (4, ""),
        (5, "just seven distinct words here now ok"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r.doc_id: r.asDict()
        for r in repetition_metrics(df, top_ns=top_ns, dup_ns=dup_ns).collect()
    }

    def frac4_py(p, q, cap=False):
        if p is None or q is None or q == 0:
            return 0.0
        bp = (p * 20000 + q) // (2 * q)
        if cap:
            bp = min(bp, 10000)
        return bp / 10000.0

    def replica(text):
        from collections import Counter

        nchars = max(len(text), 1)
        lines = [l.strip() for l in text.split("\n")]
        lines = [l for l in lines if l]
        lc = Counter(lines)
        nl, ndl = len(lines), len(lc)
        lch = sum(c * len(l) for l, c in lc.items())
        dlch = sum((c - 1) * len(l) for l, c in lc.items())
        words = text.strip().split() or [""]

        def grams(n):
            return Counter(
                " ".join(words[i : i + n]) for i in range(len(words) - n + 1)
            )

        out = dict(
            n_lines=nl,
            dup_line_frac=frac4_py(nl - ndl, nl) if nl else 0.0,
            dup_line_char_frac=frac4_py(dlch, lch) if lch else 0.0,
        )
        for n in top_ns:
            g = grams(n)
            topch = max((c * len(s) for s, c in g.items()), default=0)
            out[f"top_{n}gram_char_frac"] = frac4_py(topch, nchars, cap=True)
        for n in dup_ns:
            g = grams(n)
            dupch = sum(c * len(s) for s, c in g.items() if c > 1)
            out[f"dup_{n}gram_char_frac"] = frac4_py(dupch, nchars, cap=True)
        return out

    for doc_id, text in docs:
        exp = replica(text)
        act = {k: v for k, v in got[doc_id].items() if k != "doc_id"}
        assert act == exp, (doc_id, act, exp)
    # the signals separate: the chant floods top-2, the six-gram doc dups 6-grams
    assert got[2]["top_2gram_char_frac"] > 0.5 > got[1]["top_2gram_char_frac"]
    assert got[3]["dup_6gram_char_frac"] > 0.5 > got[1]["dup_6gram_char_frac"]
    assert got[2]["dup_line_frac"] == 0.5


def test_pq_index_parity_recall_and_bytes(spark, embeddings, tmp_path):
    """Product quantization: (a) the distributed encode/ADC path answers
    bit-identically to a serial numpy replica over the same codebook —
    the shared-kernel rule; (b) prune-then-rerank recall@10 clears a
    calibrated floor on the fixture embeddings (near-random vectors, the
    hardest PQ regime — pure-ADC fine ranking is honestly weak there and
    the rerank path is the production contract); (c) a code row is m
    bytes, the 100 TB rationale (64-dim float64 array -> 8 bytes)."""
    import numpy as np

    qv = list(embeddings.filter(F.col("vec_id") == 0).head()["embedding"])
    idx = sim.build_pq_index(embeddings, str(tmp_path / "pq"), m=8, ks=64)
    got = sim.query_pq(spark, idx, qv, k=10).orderBy("rank").collect()

    # (a) serial replica: same codebook, same kernels, full corpus
    rows = embeddings.select("vec_id", "embedding").collect()
    ids = np.array([r.vec_id for r in rows])
    V = np.array([r.embedding for r in rows], dtype=np.float64)
    codes = sim._pq_assign_math(V, idx.codebook)
    adc = sim._pq_adc_math(codes, sim._pq_lut(np.asarray(qv), idx.codebook))
    order = np.lexsort((ids, adc))[:10]
    expect = [(int(ids[i]), float(np.round(adc[i], 6))) for i in order]
    assert [(r.vec_id, r.adc) for r in got] == expect
    assert [r.rank for r in got] == list(range(1, 11))
    assert got[0].vec_id == 0  # the query vector is its own nearest code

    # reload from disk -> same answer
    idx2 = sim.load_pq_index(str(tmp_path / "pq"))
    got2 = sim.query_pq(spark, idx2, qv, k=10).orderBy("rank").collect()
    assert [tuple(r) for r in got2] == [tuple(r) for r in got]

    # (b) prune-then-rerank: ADC top-100 candidates, exact-L2 rerank.
    # Recall@10 vs exact L2, averaged over 3 queries (measured 0.8-1.0
    # per query on this fixture; 0.7 avg is the regression floor)
    recalls = []
    for qid in (0, 123, 321):
        q = V[ids == qid][0]
        exact10 = set(ids[np.lexsort((ids, ((V - q) ** 2).sum(1)))[:10]].tolist())
        rr = sim.query_pq(spark, idx, list(q), k=10, rerank=100,
                          vectors=embeddings).collect()
        assert len(rr) == 10
        got_ids = {r.vec_id for r in rr}
        recalls.append(len(exact10 & got_ids) / 10)
        # rerank scores are EXACT squared L2 for the returned rows
        for r in rr:
            d = float(np.round(((V[ids == r.vec_id][0] - q) ** 2).sum(), 6))
            assert r.dist == d
    assert sum(recalls) / len(recalls) >= 0.7, recalls

    # (c) compression: every persisted code is exactly m bytes
    code_lens = {len(bytes(r.code)) for r in
                 spark.read.parquet(idx.codes_dir).select("code").collect()}
    assert code_lens == {8}


def test_pq_validation_and_batch_invariance(spark, embeddings):
    import numpy as np
    import pytest as _pt

    with _pt.raises(ValueError, match="not divisible"):
        sim.train_pq(embeddings, m=7)
    with _pt.raises(ValueError, match="ks must be"):
        sim.train_pq(embeddings, m=8, ks=512)
    # batch-size invariance: encoding in one batch == row-at-a-time
    cb = sim.train_pq(embeddings, m=8, ks=32, sample=128)
    rows = embeddings.orderBy("vec_id").limit(40).collect()
    V = np.array([r.embedding for r in rows], dtype=np.float64)
    whole = sim._pq_assign_math(V, cb)
    single = np.vstack([sim._pq_assign_math(V[i : i + 1], cb) for i in range(len(V))])
    assert (whole == single).all()


def test_ivfpq_index_parity_pruning_and_rerank(spark, embeddings, tmp_path):
    """IVF×PQ composition: (a) query touches ONLY probed cell dirs; (b)
    ADC ranking is bit-identical to a serial replica over the persisted
    meta (residual identity: lut = _pq_lut(q - centroid[cell])); (c)
    rerank recall@10 clears the calibrated floor; (d) codes stay m bytes."""
    import os

    import numpy as np

    qv = list(embeddings.filter(F.col("vec_id") == 0).head()["embedding"])
    idx = sim.build_ivfpq_index(embeddings, str(tmp_path / "ivfpq"),
                                n_cells=8, m=8, ks=64)
    got = sim.query_ivfpq(spark, idx, qv, k=10, nprobe=4).orderBy("rank").collect()

    # (a) file-listing pruning
    qd = ((idx.centroids - np.asarray(qv)) ** 2).sum(1)
    cells = sorted(np.argsort(qd, kind="stable")[:4].tolist())
    dirs = [idx.cell_dir(c) for c in cells if os.path.isdir(idx.cell_dir(c))]
    pruned = spark.read.option("basePath", idx.codes_dir).parquet(*dirs)
    touched = {f.split("/cell=")[1].split("/")[0] for f in pruned.inputFiles()}
    assert touched <= {str(c) for c in cells}

    # (b) serial replica over the probed cells only
    rows = embeddings.select("vec_id", "embedding").collect()
    ids = np.array([r.vec_id for r in rows])
    V = np.array([r.embedding for r in rows], dtype=np.float64)
    cell_of = sim._assign_math(V, idx.centroids)
    mask = np.isin(cell_of, cells)
    codes = sim._pq_assign_math(V[mask] - idx.centroids[cell_of[mask]],
                                idx.codebook)
    luts = sim._ivfpq_luts(qv, idx.centroids, idx.codebook, cells)
    adc = np.empty(mask.sum())
    for i, c in enumerate(cell_of[mask]):
        adc[i] = sim._pq_adc_math(codes[i : i + 1], luts[int(c)])[0]
    sub_ids = ids[mask]
    order = np.lexsort((sub_ids, adc))[:10]
    expect = [(int(sub_ids[i]), float(np.round(adc[i], 6))) for i in order]
    assert [(r.vec_id, r.adc) for r in got] == expect

    # reload from disk -> same answer
    idx2 = sim.load_ivfpq_index(str(tmp_path / "ivfpq"))
    got2 = sim.query_ivfpq(spark, idx2, qv, k=10, nprobe=4).orderBy("rank").collect()
    assert [tuple(r) for r in got2] == [tuple(r) for r in got]

    # (c) prune-then-rerank (nprobe=8 = all cells, R=100): recall vs
    # exact L2 (floor calibrated like the flat-PQ gate)
    exact10 = set(ids[np.lexsort((ids, ((V - np.asarray(qv)) ** 2).sum(1)))[:10]].tolist())
    rr = sim.query_ivfpq(spark, idx, qv, k=10, nprobe=8, rerank=100,
                         vectors=embeddings).collect()
    assert len(rr) == 10 and {r.vec_id for r in rr} & exact10
    recall = len(exact10 & {r.vec_id for r in rr}) / 10
    assert recall >= 0.7, recall

    # (d) m-byte codes
    lens = {len(bytes(r.code)) for r in
            spark.read.parquet(idx.codes_dir).select("code").collect()}
    assert lens == {8}


def test_c4_clean_differential_and_rules(spark, docs):
    """C4 heuristics: crafted pages exercise every rule, then the Column
    path must agree with the serial replica over the real documents
    table AND the crafted set (the shared-semantics differential)."""
    from etlpy_spark.operators.text import c4_clean, c4_clean_py

    good = "\n".join(f"This is a perfectly fine sentence number {i}." for i in range(4))
    crafted = [
        (0, good),                                           # keeps all 4 lines
        (1, good.replace("number 2.", "number 2")),          # line 2: no terminal punct
        (2, "Too short.\nAlso tiny.\nStill small."),         # <5 words per line
        (3, good + "\nPlease enable JavaScript to continue now."),
        (4, good + "\nlorem ipsum dolor sit amet."),         # page gate
        (5, good + "\nfunction f() { return 1; }"),          # code brace
        (6, 'He said “this ends in a curly quote”\n' * 3 + good),
        (7, ""),                                             # empty page
    ]
    df = spark.createDataFrame(crafted, "doc_id long, text string")
    rows = {r.doc_id: r for r in c4_clean(df).collect()}
    for i, text in crafted:
        exp_text, exp_kept, exp_keep = c4_clean_py(text)
        assert rows[i].c4_text == exp_text, i
        assert rows[i].c4_lines_kept == exp_kept, i
        assert rows[i].c4_keep == exp_keep, i
    assert rows[0].c4_keep and rows[0].c4_lines_kept == 4
    assert rows[1].c4_lines_kept == 3
    assert rows[2].c4_lines_kept == 0 and not rows[2].c4_keep
    assert rows[3].c4_lines_kept == 4      # javascript line dropped
    assert not rows[4].c4_keep and not rows[5].c4_keep
    assert rows[6].c4_lines_kept == 7      # curly close-quote is terminal
    assert not rows[7].c4_keep

    # differential over the real fixture corpus
    got = c4_clean(docs).select("doc_id", "text", "c4_text",
                                "c4_lines_kept", "c4_keep").collect()
    assert len(got) > 100
    for r in got:
        exp_text, exp_kept, exp_keep = c4_clean_py(r.text)
        assert (r.c4_text, r.c4_lines_kept, r.c4_keep) == (exp_text, exp_kept, exp_keep)
