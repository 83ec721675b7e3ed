"""Driver harness part 2: large-scale training-data operators
(dedup / similarity / text analysis / multimodal) over the documents,
embeddings and synthetic-image tables.

Round 2: every entry has an oracle. SQL-expressible ops get DuckDB SQL;
the procedural ops (IVF quantizer, pHash, frame sampling) get VALUES
lists computed at oracle-build time by a deterministic serial replica —
the same pattern the crawl-parity oracles use."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etlpy_spark.operators import dedup as dd
from etlpy_spark.operators import multimodal as mm
from etlpy_spark.operators import similarity as sim
from etlpy_spark.operators import text as tx

OFFSET = 100_000

# the driver compares at sf=0.01; procedural (VALUES/serial-replica)
# oracles replicate over the same table the Spark side reads there.
# ETLPY_ORACLE_SF_DIR lets a local harness re-point them when verifying
# at a different scale factor (tools/verify_queries.py sets it).
_DRIVER_SF_DIR = os.environ.get("ETLPY_ORACLE_SF_DIR", "/root/testdata/sf0.01")


def _t(spark, sf_dir, name) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _docs_with_exact_copies(spark, sf_dir) -> DataFrame:
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    copies = d.select((F.col("doc_id") + OFFSET).alias("doc_id"), "text")
    return d.unionByName(copies)


def _docs_with_near_copies(spark, sf_dir) -> DataFrame:
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    copies = d.select(
        (F.col("doc_id") + OFFSET).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zzz")).alias("text"),
    )
    return d.unionByName(copies)


# ---------------------------------------------------------------------------
# queries


def q_exact_dedup(spark, sf_dir):
    return dd.exact_dedup(_docs_with_exact_copies(spark, sf_dir)).select("doc_id")


def q_minhash_lsh_pairs(spark, sf_dir):
    return dd.minhash_lsh_pairs(
        _docs_with_near_copies(spark, sf_dir), k=64, bands=32, n=3, threshold=0.6
    )


def q_ngram_jaccard_pairs(spark, sf_dir):
    return dd.ngram_jaccard_pairs(
        _docs_with_near_copies(spark, sf_dir), n=3, threshold=0.6
    )


def q_simhash(spark, sf_dir):
    return dd.simhash_bits(_t(spark, sf_dir, "documents"))


def q_embedding_near_dup(spark, sf_dir):
    e = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    copies = e.select((F.col("vec_id") + OFFSET).alias("vec_id"), "embedding")
    both = e.unionByName(copies)
    return dd.embedding_near_dup_pairs(both, threshold=0.99).select("id_a", "id_b")


def q_ann_bruteforce(spark, sf_dir):
    e = _t(spark, sf_dir, "embeddings")
    qv = e.filter(F.col("vec_id") == 0).select("embedding").head()[0]
    return sim.brute_force_topk(e, list(qv), k=10)


def q_ann_ivf(spark, sf_dir):
    e = _t(spark, sf_dir, "embeddings")
    qv = e.filter(F.col("vec_id") == 0).select("embedding").head()[0]
    return sim.ivf_topk(e, list(qv), k=10).select("vec_id", "rank")


GOPHER_TOP_NS = (2, 3, 4)
GOPHER_DUP_NS = (5, 6, 7, 8, 9, 10)


def q_text_suite(spark, sf_dir):
    """lang-id + quality score + token counts + rolling-hash fingerprint in
    one pure-Column projection pass over documents, joined with the FULL
    Gopher A1.1 repetition rule set (Rae et al. 2021: dup-line fractions,
    top-n-gram char fractions for n∈{2,3,4}, dup-n-gram char fractions for
    n∈{5..10} — one explode + map-side-combinable aggregate branch per n).
    Zero Python eval nodes anywhere in the plan; every fraction is an
    exact-integer half-up 4-dp double (frac4), bit-identical to the oracle
    by construction."""
    d = _t(spark, sf_dir, "documents")
    feats = d.select(
        "doc_id",
        tx.lang_id("text").alias("lang_pred"),
        tx.quality_score("text").alias("quality"),
        tx.token_count("text").alias("n_tokens"),
        tx.whitespace_token_count("text").alias("n_ws_tokens"),
        tx.fingerprint("text").alias("fp"),
    )
    rep = tx.repetition_metrics(d, top_ns=GOPHER_TOP_NS, dup_ns=GOPHER_DUP_NS)
    return feats.join(rep, "doc_id")


def q_image_pipeline(spark, sf_dir):
    """decode → features (w/h/fmt/pHash) on originals, plus resize(16) →
    re-decode on thumbnails — the full image column pipeline, mapInPandas
    with numpy kernels. Round 5 widens the originals stage with the
    curation-gate quality signals (aHash/dHash/wHash, Laplacian blur
    variance, luma entropy, colourfulness, border uniformity, edge
    density — functions/imagequality.py), putting the whole quality suite
    under the driver hash; thumbnails carry NULL quality columns (the
    gate runs on originals before resize in a real pipeline)."""
    imgs = mm.synthetic_images_df(spark, n=200)
    qcols = ("ahash", "dhash", "whash", "blur_var", "entropy",
             "colorfulness", "border_uniformity", "edge_density")
    orig = (
        mm.decode_image_features(imgs)
        .select("image_id", F.lit("orig").alias("stage"), "w", "h", "fmt", "phash")
        .join(mm.image_quality_features(imgs), "image_id")
    )
    # the curation decision itself (quality_gate's predicate) under the
    # hash: the oracle recomputes it in SQL over the same signal columns
    orig = orig.withColumn("kept", mm.quality_gate_predicate().cast("long"))
    thumbs = mm.resize_images(imgs, size=16)
    thumb = mm.decode_image_features(thumbs).select(
        "image_id", F.lit("thumb").alias("stage"), "w", "h", "fmt", "phash",
        *[F.lit(None).cast("long" if c in ("ahash", "dhash", "whash") else "double").alias(c)
          for c in qcols],
        F.lit(None).cast("long").alias("kept"),
    )
    return orig.unionByName(thumb)


def q_phash_near_dup(spark, sf_dir):
    """Image near-duplicate pairs by pHash Hamming distance (banded with a
    pigeonhole-exact radius guarantee, never all-pairs). The corpus is the
    synthetic image table plus one bit-flipped variant per image (a
    deterministic Column-expr XOR), so every (img, v-img) pair sits at
    Hamming distance 1; the oracle is a brute-force serial replica."""
    imgs = mm.synthetic_images_df(spark, n=120)
    feats = mm.decode_image_features(imgs).select("image_id", "phash")
    # flip bit (i % 60) of image i's phash (DataFrame-API shiftleft only
    # takes a literal shift, so the column-shift goes through expr)
    mask = F.expr(
        "shiftleft(CAST(1 AS BIGINT), "
        "pmod(CAST(regexp_extract(image_id, '(\\\\d+)$', 1) AS INT), 60))"
    )
    variants = feats.select(
        F.concat(F.lit("v-"), F.col("image_id")).alias("image_id"),
        F.col("phash").bitwiseXOR(mask).alias("phash"),
    )
    both = feats.unionByName(variants)
    return mm.phash_near_dup_pairs(both, max_hamming=3)


def _media_video_frames(i: int):
    """Video i = 10 deterministic frames: one procedural base image
    (FIXTURES.md F1) panned by np.roll per frame (a video's frames must
    share one geometry; render_pixels sizes vary per image id)."""
    import numpy as np

    from etlpy_spark.functions.imagecodec import render_pixels

    base = render_pixels(f"img-{i:012d}")
    return [np.roll(base, 3 * j, axis=1) for j in range(10)]


def _media_webp_anim_blob(i: int) -> bytes:
    """Animated-WebP video i: frame 0 covers the canvas, later frames mix
    full-canvas keyframes, subrect overwrites at varying even offsets, one
    semi-transparent alpha-blended delta, and periodic dispose-to-background
    — every composite path of iter_webp_frames sits under the driver hash."""
    import numpy as np

    from etlpy_spark.functions.webpcodec import encode_webp_anim

    frames = _media_video_frames(i)
    h, w = frames[0].shape[:2]
    sh, sw = min(12, h), min(16, w)
    fr, offs, blend, disp = [frames[0]], [(0, 0)], [False], [False]
    for j in range(1, 10):
        if j % 3 == 0:
            fr.append(frames[j])
            offs.append((0, 0))
            blend.append(False)
        else:
            x = (6 * j) % max(1, w - sw + 1)
            y = (2 * j) % max(1, h - sh + 1)
            x -= x % 2
            y -= y % 2
            sub = frames[j][y : y + sh, x : x + sw]
            if j % 5 == 2:  # ARGB delta, alpha-blended onto the canvas
                argb = np.empty(sub.shape[:2] + (4,), dtype=np.uint8)
                argb[:, :, 0] = 128 + 7 * j
                argb[:, :, 1:] = sub
                sub = argb
                blend.append(True)
            else:
                blend.append(False)
            fr.append(sub)
            offs.append((x, y))
        disp.append(j % 4 == 0)
    return encode_webp_anim(fr, offsets=offs, blend=blend, dispose=disp,
                            bg=(20, 30, 40, 255), durations=[50] * 10)


def _media_wav_pcm(i: int):
    """Clip i = seeded sine+noise int16 PCM; rate and channel count vary
    per clip so the WAV parser's header fields are all load-bearing."""
    import numpy as np

    rate = (8000, 16000, 22050, 44100)[i % 4]
    n = 1000 + 400 * i
    t = np.arange(n, dtype=np.float64)
    sig = 0.5 * np.sin(2 * np.pi * 220.0 * (i + 1) * t / rate)
    sig += 0.05 * np.random.default_rng(1234 + i).standard_normal(n)
    pcm = np.clip(np.rint(sig * 32767), -32768, 32767).astype("<i2")
    return (np.stack([pcm, -pcm], axis=1) if i % 2 else pcm[:, None]), rate


def _media_wav_blob(i: int) -> bytes:
    """Audio fixture i, shared by the Spark generator and the serial
    oracle. Clips 0..3: integer-PCM WAV (format 1, varying rate/channels);
    clip 4: the same waveform as IEEE float32 inside a
    WAVE_FORMAT_EXTENSIBLE header; clip 5: G.711 u-law (format 7); clip 6:
    FLAC (from-scratch lossless codec, mid/side stereo) — the real-web
    variants the audio path gained in round 4."""
    from etlpy_spark.functions.mediacodec import encode_wav

    pcm, rate = _media_wav_pcm(i % 4)
    if i < 4:
        return encode_wav(pcm, rate)
    if i == 4:
        return encode_wav((pcm.astype("float32") / 32768.0), rate, extensible=True)
    if i == 5:
        return encode_wav(pcm, rate, law="mu")
    from etlpy_spark.functions.flaccodec import encode_flac

    stereo, rate = _media_wav_pcm(1)  # clip 1 is the stereo waveform
    return encode_flac(stereo, rate, stereo_mode="mid_side", partition_order=2)


def _media_jpeg_row(i: int):
    """One JPEG suite row, shared by the Spark UDF and the serial oracle
    (same kernel both sides → bit-exact parity): encode fixture image i
    with the from-scratch T.81 codec (quality varies; odd i adds the
    restart markers real encoders emit), decode, score PSNR vs the
    ORIGINAL pixels."""
    import numpy as np

    from etlpy_spark.functions.imagecodec import phash64, psnr, render_pixels
    from etlpy_spark.functions.jpegcodec import decode_jpeg, encode_jpeg

    iid = f"jimg-{i:04d}"
    quality = (80, 92, 96)[i % 3]
    px = render_pixels(iid, 42, 1)
    # rows 6-7 encode 4:2:0 so the subsampled-chroma decode path (libjpeg
    # fancy-upsampling integer math, round-5 session 2) sits under the
    # driver hash alongside the 4:4:4 rows
    sub = "420" if i >= 6 else "444"
    blob = encode_jpeg(px, quality=quality, restart_interval=8 if i % 2 else 0,
                       subsampling=sub)
    dec = decode_jpeg(blob)
    return (iid, quality, phash64(dec), len(blob),
            float(np.round(psnr(px, dec), 4)))


def _media_webp_row(i: int):
    """One WebP suite row, shared by the Spark UDF and the serial oracle:
    encode fixture image i with the from-scratch VP8L codec (mode cycles
    through the encoder's transform combinations so the decoder's
    predictor/palette/LZ77 paths all sit under the driver hash), decode,
    verify losslessness, report phash + stream size + mean luminance."""
    import numpy as np

    from etlpy_spark.functions.imagecodec import phash64, render_pixels
    from etlpy_spark.functions.webpcodec import decode_webp, encode_webp

    iid = f"wimg-{i:04d}"
    px = render_pixels(iid, 42, 1)
    mode = i % 4
    kw = (dict(), dict(subtract_green=False), dict(rle=True),
          dict(predictor_bits=3))[mode]
    blob = encode_webp(px, **kw)
    dec = decode_webp(blob)
    if not np.array_equal(dec, px):
        raise ValueError(f"VP8L round-trip mismatch for {iid}")
    return (iid, mode, phash64(dec), len(blob),
            float(np.round(dec.astype(np.float64).mean(), 4)))


def _media_video_stub_blob(i: int) -> bytes:
    """Deterministic MP4/WebM triage fixtures (functions/videometa.py
    builders): codec fourccs/IDs, dims, durations and timescales vary so
    the moov and EBML walks are each exercised under the driver hash."""
    from etlpy_spark.functions.videometa import (
        encode_mp4_video_stub,
        encode_webm_stub,
    )

    if i == 0:
        return encode_mp4_video_stub(b"avc1", 640, 360, 120, 12800, 64000)
    if i == 1:
        return encode_mp4_video_stub(b"hev1", 1920, 1080, 250, 90000, 900000)
    if i == 2:
        return encode_webm_stub("V_VP9", 1280, 720, 4000.0)
    if i == 3:
        return encode_webm_stub("V_AV1", 854, 480, 125.0, timescale=8_000_000)
    if i == 4:
        return encode_mp4_video_stub(b"av01", 320, 240, 48, 600, 1200)
    return encode_webm_stub("V_VP8", 640, 480, 12345.0,
                            audio=("A_VORBIS", 44100, 2))


def _media_compressed_audio_blob(i: int) -> bytes:
    """Deterministic compressed-audio fixtures for the triage rows."""
    from etlpy_spark.functions.audiometa import (make_adts, make_mp4_audio,
                                                 make_mpeg_audio, make_ogg)

    return (
        lambda: make_mpeg_audio(40, layer=3, bitrate=128, rate=44100, channels=2),
        lambda: make_mpeg_audio(24, layer=3, version="2", bitrate=64,
                                rate=22050, channels=1),
        lambda: make_mpeg_audio(30, layer=2, bitrate=192, rate=48000, channels=2),
        lambda: make_ogg("vorbis", 7, rate=44100, channels=2, samples_per_page=4096),
        lambda: make_ogg("opus", 5, rate=16000, channels=1, samples_per_page=960),
        lambda: make_adts(20, rate=44100, channels=2),
        lambda: make_mp4_audio(16, codec="aac", rate=44100, channels=2),
        lambda: make_mp4_audio(12, codec="opus", rate=48000, channels=1,
                               frame_samples=960, mdhd_version=1,
                               with_video_track=True),
    )[i]()


def q_media_decode_suite(spark, sf_dir):
    """Real A/V container decode, distributed: 6 YUV4MPEG2 videos, 3
    AVI/MJPEG videos (each frame an independent baseline JPEG through the
    from-scratch T.81 codec) and 3 animated GIFs (from-scratch LZW,
    functions/gifcodec.py) are demuxed — every-4th-frame sampling seeks
    over skipped Y4M/MJPEG frames and skips LZW for GIF frames no sampled
    frame depends on — and each sampled frame is pHashed; 7 audio clips
    (integer-PCM WAV at varying rate/channels, IEEE float32 inside a
    WAVE_FORMAT_EXTENSIBLE header, G.711 u-law, and a mid/side FLAC
    through the from-scratch Rice/fixed-predictor codec) are decoded for
    real; 8 fixture images go through the from-scratch baseline JPEG
    codec (functions/jpegcodec.py — varying quality, with and without
    restart markers) and the decoded pixels are PSNR-scored against the
    originals (the north rule's lossy invariant). Output rows:
    video/avi/gif → (vid, kind, k=frame_idx, m1=phash, m2=w*h,
    v=mean_lum); audio → (clip, 'audio', k=n_channels, m1=n_samples,
    m2=zero_crossings, v=rms); jpeg → (img, 'jpeg', k=quality,
    m1=phash(decoded), m2=encoded_bytes, v=psnr). Round 5 adds: 6 WebP
    rows (from-scratch VP8L codec, functions/webpcodec.py — encoder modes
    cycle subtract-green/palette-free/RLE/predictor so the decoder's
    transform paths sit under the hash; losslessness asserted in-kernel)
    3 animated-WebP videos (kind 'wanim': VP8X+ANIM+ANMF composited per
    the container spec's blend/dispose rules with dependency-chain frame
    sampling — subrect overwrites, an alpha-blended delta, and
    dispose-to-background all under the hash),
    and 8 compressed-audio triage rows (kind 'ameta': MP3 CBR + MPEG-2
    LIII + MP2 frame walks, Ogg Vorbis/Opus ident+granule, ADTS AAC, and
    two ISO-BMFF moov walks — AAC-in-M4A plus Opus-in-MP4 behind a video
    trak with a v1 mdhd — functions/audiometa.py via the distributed
    audio_metadata operator; k=channels, m1=samples, m2=frames,
    v=duration), and 6 video-triage rows (kind 'vmeta': MP4 moov walks
    for avc1/hev1/av01 and WebM EBML walks for VP9/AV1/VP8 — incl. a
    custom TimestampScale and a Vorbis audio track — via the distributed
    video_triage operator, functions/videometa.py; container+codec are
    pinned through the media_id; k=width, m1=height, m2=frames,
    v=duration). Oracle = serial numpy replica (computed VALUES), the
    image_pipeline pattern."""
    import pandas as pd

    def gen_vids(batches):
        from etlpy_spark.functions.gifcodec import encode_gif
        from etlpy_spark.functions.mediacodec import encode_avi_mjpeg, encode_y4m

        for pdf in batches:
            ids, blobs = [], []
            for raw in pdf["id"]:
                i = int(raw)
                if i < 6:
                    ids.append(f"vid-{i:04d}")
                    blobs.append(
                        encode_y4m(_media_video_frames(i), colorspace="C444")
                    )
                elif i < 9:
                    ids.append(f"avi-{i - 6:04d}")
                    blobs.append(
                        encode_avi_mjpeg(_media_video_frames(i - 6), fps=10, quality=96)
                    )
                elif i < 12:
                    ids.append(f"gif-{i - 9:04d}")
                    blobs.append(encode_gif(_media_video_frames(i - 9)))
                else:
                    ids.append(f"wanim-{i - 12:04d}")
                    blobs.append(_media_webp_anim_blob(i - 12))
            yield pd.DataFrame({"video_id": ids, "bytes": blobs})

    def gen_clips(batches):
        for pdf in batches:
            yield pd.DataFrame({
                "clip_id": [f"clip-{int(i):04d}" for i in pdf["id"]],
                "bytes": [_media_wav_blob(int(i)) for i in pdf["id"]],
            })

    vids = spark.range(0, 15, 1, 3).mapInPandas(gen_vids, schema="video_id string, bytes binary")
    frames = mm.sample_video_frames(vids, every_n=4)
    vfeats = mm.decode_image_features(
        frames.select(
            F.concat_ws("#", "video_id", "frame_idx").alias("image_id"), "bytes"
        )
    )
    _mid = F.split("image_id", "#")[0]
    _pref = F.split(_mid, "-")[0]
    vrows = vfeats.select(
        _mid.alias("media_id"),
        F.when(_pref == "vid", F.lit("video")).otherwise(_pref).alias("kind"),
        F.split("image_id", "#")[1].cast("int").alias("k"),
        F.col("phash").alias("m1"),
        (F.col("w").cast("long") * F.col("h")).alias("m2"),
        F.col("mean_lum").alias("v"),
    )
    clips = spark.range(0, 7, 1, 2).mapInPandas(gen_clips, schema="clip_id string, bytes binary")
    afeats = mm.decode_audio_features(clips)
    arows = afeats.select(
        F.col("clip_id").alias("media_id"),
        F.lit("audio").alias("kind"),
        F.col("n_channels").alias("k"),
        F.col("n_samples").alias("m1"),
        F.col("zero_crossings").alias("m2"),
        F.col("rms").alias("v"),
    )

    def gen_jpeg(batches):
        for pdf in batches:
            out = {k: [] for k in ("media_id", "kind", "k", "m1", "m2", "v")}
            for i in pdf["id"]:
                iid, kq, m1, m2, v = _media_jpeg_row(int(i))
                out["media_id"].append(iid)
                out["kind"].append("jpeg")
                out["k"].append(kq)
                out["m1"].append(m1)
                out["m2"].append(m2)
                out["v"].append(v)
            yield pd.DataFrame(out)

    jrows = spark.range(0, 8, 1, 2).mapInPandas(
        gen_jpeg, schema="media_id string, kind string, k int, m1 long, m2 long, v double"
    )

    def gen_webp(batches):
        for pdf in batches:
            out = {k: [] for k in ("media_id", "kind", "k", "m1", "m2", "v")}
            for i in pdf["id"]:
                iid, mode, m1, m2, v = _media_webp_row(int(i))
                out["media_id"].append(iid)
                out["kind"].append("webp")
                out["k"].append(mode)
                out["m1"].append(m1)
                out["m2"].append(m2)
                out["v"].append(v)
            yield pd.DataFrame(out)

    wrows = spark.range(0, 6, 1, 2).mapInPandas(
        gen_webp, schema="media_id string, kind string, k int, m1 long, m2 long, v double"
    )

    def gen_ablobs(batches):
        for pdf in batches:
            yield pd.DataFrame({
                "clip_id": [f"cmp-{int(i):04d}" for i in pdf["id"]],
                "bytes": [_media_compressed_audio_blob(int(i)) for i in pdf["id"]],
            })

    ablobs = spark.range(0, 8, 1, 2).mapInPandas(
        gen_ablobs, schema="clip_id string, bytes binary"
    )
    trows = mm.audio_metadata(ablobs).select(
        F.col("clip_id").alias("media_id"),
        F.lit("ameta").alias("kind"),
        F.col("n_channels").alias("k"),
        F.col("n_samples").alias("m1"),
        F.col("n_frames").alias("m2"),
        F.col("duration_s").alias("v"),
    )

    def gen_vstubs(batches):
        for pdf in batches:
            yield pd.DataFrame({
                "video_id": [f"{int(i):04d}" for i in pdf["id"]],
                "bytes": [_media_video_stub_blob(int(i)) for i in pdf["id"]],
            })

    vstubs = spark.range(0, 6, 1, 2).mapInPandas(
        gen_vstubs, schema="video_id string, bytes binary"
    )
    # video triage (kind 'vmeta'): MP4 moov + WebM EBML walks,
    # container/codec pinned through the media_id string
    vmrows = mm.video_triage(vstubs).select(
        F.concat_ws("-", F.lit("vmt"), "video_id", "container", "codec")
        .alias("media_id"),
        F.lit("vmeta").alias("kind"),
        F.col("width").alias("k"),
        F.col("height").cast("long").alias("m1"),
        F.col("n_frames").alias("m2"),
        F.col("duration_s").alias("v"),
    )
    return (vrows.unionByName(arows).unionByName(jrows)
            .unionByName(wrows).unionByName(trows).unionByName(vmrows))


# ---------------------------------------------------------------------------
# oracle SQL


def _shingle_cte(src: str, n: int = 3) -> str:
    parts = " || ' ' || ".join(f"w[i+{j}]" for j in range(n))
    return f"""
        words AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w FROM {src}),
        sh AS (
          SELECT doc_id, list_distinct(list({parts})) AS s
          FROM words, unnest(generate_series(1, len(w)-{n - 1})) t(i)
          GROUP BY doc_id
        )
    """


_NEAR_SRC = f"""
        src AS (
          SELECT doc_id, text FROM documents
          UNION ALL SELECT doc_id + {OFFSET}, text || ' zzz' FROM documents
        )
"""


def _jaccard_sql(n: int, threshold: float) -> str:
    return f"""
        WITH {_NEAR_SRC}, {_shingle_cte('src', n)}
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               ROUND(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                     / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))), 6) AS jaccard
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
              / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= {threshold}
    """


def _simhash_sql(bits: int = 64) -> str:
    sums = ",\n".join(
        f"SUM(CASE WHEN (h >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS b{i}" for i in range(bits)
    )
    acc = " + ".join(
        f"CASE WHEN b{i} > 0 THEN {1 << i}::BIGINT ELSE 0 END" for i in range(bits - 1)
    )
    return f"""
        WITH toks AS (
          SELECT doc_id AS id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
          FROM documents
        ), hashed AS (
          SELECT id, ('0x' || substr(md5(tok), 1, 15))::BIGINT AS h FROM toks
        ), sums AS (
          SELECT id, {sums} FROM hashed GROUP BY id
        )
        SELECT id, ({acc}) AS simhash FROM sums
    """


_LANGS = {
    "en": ["the", "a", "and", "of", "to", "in", "is"],
    "fr": ["le", "la", "et", "de", "un", "une", "est"],
    "es": ["el", "la", "y", "de", "un", "una", "es"],
    "de": ["der", "die", "und", "das", "ein", "ist", "zu"],
}


def _lang_sql() -> str:
    score = {
        lang: (
            f"CAST(len(list_filter(ws, x -> list_contains({words!r}, lower(x)))) AS DOUBLE)"
            f" / greatest(len(ws), 1)"
        )
        for lang, words in _LANGS.items()
    }
    best = f"greatest({', '.join(score.values())})"
    case = " ".join(
        f"WHEN {score[lang]} = best THEN '{lang}'" for lang in _LANGS
    )
    return f"""
        WITH t AS (
          SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS ws FROM documents
        ), s AS (SELECT doc_id, ws, {best} AS best FROM t)
        SELECT doc_id, CASE WHEN best = 0 THEN 'und' {case} ELSE 'und' END AS lang_pred
        FROM s
    """


def _frac4_sql(p: str, q: str, cap: bool = False) -> str:
    """SQL twin of operators.text.frac4: half-up 4-dp fraction p/q rounded
    in INTEGER space (basis points), then one IEEE division by 10000.0 —
    the result double is bit-identical to Spark's by construction
    (ROUND(double) is engine-dependent at one-ulp boundaries: the round-3
    text_suite hash miss)."""
    bp = f"COALESCE((({p})*20000 + ({q})) // (({q})*2), 0)"
    if cap:
        bp = f"LEAST({bp}, 10000)"
    return f"(CAST({bp} AS DOUBLE) / 10000.0)"


def _quality_sql() -> str:
    en = _LANGS["en"]
    p = "10*n_alpha + bonus*nc"
    return f"""
        WITH t AS (
          SELECT doc_id,
                 regexp_split_to_array(trim(text), '\\s+') AS ws,
                 greatest(length(text), 1) AS nc,
                 length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS n_alpha
          FROM documents
        ), s AS (
          SELECT doc_id, nc, n_alpha,
                 CASE WHEN len(ws) BETWEEN 20 AND 1000 THEN 10 ELSE 5 END
               + CASE WHEN 50 * len(list_filter(ws, x -> list_contains({en!r}, lower(x))))
                           > greatest(len(ws), 1) THEN 10 ELSE 6 END AS bonus
          FROM t
        )
        SELECT doc_id, {_frac4_sql(p, "30*nc")} AS quality
        FROM s
    """


_TOKENS_SQL = r"""
        SELECT doc_id,
               len(regexp_extract_all(text, '[a-zA-Z0-9_]+|[^a-zA-Z0-9_\s]')) AS n_tokens,
               len(regexp_split_to_array(trim(text), '\s+')) AS n_ws_tokens
        FROM documents
"""

_FINGERPRINT_SQL = """
        WITH t AS (
          SELECT doc_id,
                 list_transform(regexp_split_to_array(trim(text), '\\s+'),
                                w -> ('0x' || substr(md5(w), 1, 8))::BIGINT) AS hs
          FROM documents
        )
        SELECT doc_id,
               list_reduce(list_prepend(0::BIGINT, hs),
                           (acc, x) -> (acc * 31 + x) % 2147483647) AS fp
        FROM t
"""


def _repetition_sql(
    top_ns: tuple[int, ...] = (2,),
    dup_ns: tuple[int, ...] = (3,),
    legacy: bool = True,
) -> str:
    """DuckDB twin of operators.text.repetition_metrics, parameterized over
    the Gopher n-gram lists; one CTE per n, fractions via _frac4_sql."""

    def gram_cte(tag: str, n: int, dup_only: bool) -> str:
        g = " || ' ' || ".join(f"w[i+{j}]" for j in range(n))
        body = (
            "sum(CASE WHEN cnt > 1 THEN cnt * length(g) ELSE 0 END) AS v"
            if dup_only
            else "max(cnt * length(g)) AS v"
        )
        return f"""
    {tag} AS (
      SELECT doc_id, {body}
      FROM (
        SELECT doc_id, g, count(*) AS cnt
        FROM (SELECT doc_id, {g} AS g
              FROM rep_words, unnest(generate_series(1, len(w) - {n - 1})) t(i))
        GROUP BY 1, 2)
      GROUP BY 1
    )"""

    ctes = [
        r"""
    rep_lines AS (
      SELECT doc_id, trim(l) AS line
      FROM documents, unnest(string_split(text, chr(10))) AS u(l)
      WHERE length(trim(l)) > 0
    ),
    rep_lagg AS (
      SELECT doc_id, sum(cnt) AS nl, count(*) AS ndl,
             sum(cnt * length(line)) AS lch,
             sum((cnt - 1) * length(line)) AS dlch
      FROM (SELECT doc_id, line, count(*) AS cnt FROM rep_lines GROUP BY 1, 2)
      GROUP BY 1
    ),
    rep_words AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
      FROM documents
    )"""
    ]
    cols = [
        # explicit BIGINT: DuckDB sum() yields HUGEINT, which pandas/driver
        # canonicalization turns into float64 ("1.0" vs Spark's "1" — a
        # hash mismatch with values numerically equal)
        "CAST(COALESCE(nl, 0) AS BIGINT) AS n_lines",
        _frac4_sql("nl - ndl", "nl") + " AS dup_line_frac",
        _frac4_sql("dlch", "lch") + " AS dup_line_char_frac",
    ]
    joins = ["LEFT JOIN rep_lagg USING (doc_id)"]
    nch = "GREATEST(length(d.text), 1)"
    for n in top_ns:
        tag = f"rep_t{n}"
        name = "top_ngram_char_frac" if legacy else f"top_{n}gram_char_frac"
        ctes.append(gram_cte(tag, n, dup_only=False))
        cols.append(
            _frac4_sql(f"COALESCE({tag}.v, 0)", nch, cap=True) + f" AS {name}"
        )
        joins.append(f"LEFT JOIN {tag} USING (doc_id)")
    for n in dup_ns:
        tag = f"rep_d{n}"
        name = "dup_ngram_char_frac" if legacy else f"dup_{n}gram_char_frac"
        ctes.append(gram_cte(tag, n, dup_only=True))
        cols.append(
            _frac4_sql(f"COALESCE({tag}.v, 0)", nch, cap=True) + f" AS {name}"
        )
        joins.append(f"LEFT JOIN {tag} USING (doc_id)")
    return (
        "WITH" + ",".join(ctes)
        + "\n    SELECT d.doc_id,\n           "
        + ",\n           ".join(cols)
        + "\n    FROM documents d\n    "
        + "\n    ".join(joins)
    )


_REPETITION_SQL = _repetition_sql(GOPHER_TOP_NS, GOPHER_DUP_NS, legacy=False)


def _text_suite_sql() -> str:
    rep_cols = ", ".join(
        [f"R.top_{n}gram_char_frac" for n in GOPHER_TOP_NS]
        + [f"R.dup_{n}gram_char_frac" for n in GOPHER_DUP_NS]
    )
    return f"""
        SELECT L.doc_id, L.lang_pred, Q.quality, T.n_tokens, T.n_ws_tokens, Fp.fp,
               R.n_lines, R.dup_line_frac, R.dup_line_char_frac,
               {rep_cols}
        FROM ({_lang_sql()}) L
        JOIN ({_quality_sql()}) Q USING (doc_id)
        JOIN ({_TOKENS_SQL}) T USING (doc_id)
        JOIN ({_FINGERPRINT_SQL}) Fp USING (doc_id)
        JOIN ({_REPETITION_SQL}) R USING (doc_id)
    """


# ---------------------------------------------------------------------------
# procedural oracles: serial replicas → VALUES


def _sql_quote(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def _values(rows: list[tuple], cols: str) -> str:
    body = ",".join(
        "(" + ",".join(
            "NULL" if v is None else (_sql_quote(v) if isinstance(v, str) else str(v))
            for v in r
        ) + ")"
        for r in rows
    )
    return f"SELECT * FROM (VALUES {body}) AS t({cols})"


def _load_driver_embeddings() -> list[tuple[int, list[float]]]:
    import pyarrow.parquet as pq

    t = pq.read_table(f"{_DRIVER_SF_DIR}/embeddings.parquet", columns=["vec_id", "embedding"])
    rows = sorted(zip(t["vec_id"].to_pylist(), t["embedding"].to_pylist()))
    return [(int(i), [float(x) for x in v]) for i, v in rows]


def _ann_ivf_oracle(k: int = 10, n_cells: int = 16, nprobe: int = 4, sample: int = 512) -> str:
    """Serial replica of ivf_topk through the SAME numpy kernel
    (similarity._ivf_math — batch-size-invariant reductions, so one
    whole-table call here reproduces the engine's Arrow-batched calls
    bit-for-bit) and the same hash-spread sample order
    (functions/hashing.xxhash64_long ≡ Spark's builtin)."""
    import numpy as np

    from etlpy_spark.functions.hashing import xxhash64_long
    from etlpy_spark.operators.similarity import _ivf_math, _kmeans_lite

    rows = _load_driver_embeddings()
    q = np.asarray(rows[0][1], dtype=np.float64)  # vec_id == 0
    # mirror ivf_topk's hash-spread sample: orderBy(xxhash64(id), id)
    spread = sorted(rows, key=lambda t: (xxhash64_long(t[0]), t[0]))[:sample]
    C = _kmeans_lite([v for _, v in spread], n_cells)
    probe = set(np.argsort(((C - q) ** 2).sum(1))[:nprobe].tolist())

    V = np.asarray([v for _, v in rows], dtype=np.float64)
    cell, cos = _ivf_math(V, C, q)
    scored = [
        (vid, c) for (vid, _), ce, c in zip(rows, cell, cos) if int(ce) in probe
    ]
    scored.sort(key=lambda t: (-t[1], t[0]))
    return _values([(vid, r + 1) for r, (vid, _) in enumerate(scored[:k])], "vec_id, rank")


def _image_pipeline_oracle(n: int = 200, size: int = 16) -> str:
    from etlpy_spark.functions.imagecodec import (
        decode,
        encode_ppm,
        image_bytes,
        phash64,
        resize_area,
        sniff_format,
    )

    from etlpy_spark.functions.imagequality import quality_features

    qkeys = ("ahash", "dhash", "whash", "blur_var", "entropy",
             "colorfulness", "border_uniformity", "edge_density")
    rows = []
    for i in range(n):
        iid = f"img-{i:012d}"
        b = image_bytes(iid)
        px = decode(b)
        h, w, _ = px.shape
        q = quality_features(px)
        rows.append((iid, "orig", w, h, sniff_format(b), phash64(px))
                    + tuple(q[k] for k in qkeys))
        tb = encode_ppm(resize_area(px, size))  # kernel shared with resize_images
        rows.append((iid, "thumb", size, size, sniff_format(tb), phash64(decode(tb)))
                    + (None,) * len(qkeys))
    cols = "image_id, stage, w, h, fmt, phash, " + ", ".join(qkeys)
    inner = _values(rows, cols)
    # the curation decision recomputed in SQL — pins quality_gate's
    # predicate (defaults: min_dim 32, aspect<=8, entropy>=1,
    # blur_var>=4, border_uniformity<=0.999) against the Spark Column
    return (
        f"SELECT *, CASE WHEN stage = 'orig' THEN "
        "CAST(least(w, h) >= 32 AND greatest(w, h) / CAST(least(w, h) AS DOUBLE) <= 8.0 "
        "AND entropy >= 1.0 AND blur_var >= 4.0 AND border_uniformity <= 0.999 AS BIGINT) "
        f"ELSE NULL END AS kept FROM ({inner}) AS t"
    )


def _phash_near_dup_oracle(n: int = 120, max_hamming: int = 3) -> str:
    """Brute-force serial replica of q_phash_near_dup over the same
    deterministic corpus: all O(n²) pairs checked exactly (trivial at
    oracle size; the Spark operator is the one that must never go n²)."""
    from etlpy_spark.functions.imagecodec import decode, image_bytes, phash64

    rows = []
    for i in range(n):
        iid = f"img-{i:012d}"
        ph = phash64(decode(image_bytes(iid)))
        rows.append((iid, ph))
        rows.append((f"v-{iid}", ph ^ (1 << (i % 60))))
    pairs = []
    for a in range(len(rows)):
        for b in range(a + 1, len(rows)):
            (ia, pa), (ib, pb) = rows[a], rows[b]
            d = bin((pa ^ pb) & ((1 << 64) - 1)).count("1")
            if d <= max_hamming:
                x, y = sorted((ia, ib))
                pairs.append((x, y, d))
    return _values(pairs, "id_a, id_b, hamming")


def _media_suite_oracle() -> str:
    """Serial replica of q_media_decode_suite: same numpy codecs, no Spark."""
    import numpy as np

    from etlpy_spark.functions.gifcodec import encode_gif, iter_gif_frames
    from etlpy_spark.functions.imagecodec import phash64
    from etlpy_spark.functions.mediacodec import (
        decode_wav, encode_avi_mjpeg, encode_y4m,
        iter_avi_mjpeg_frames, iter_y4m_frames, wav_float,
    )

    def _frame_row(mid, kind, idx, px):
        return (mid, kind, idx, phash64(px), px.shape[0] * px.shape[1],
                float(np.round(px.astype(np.float64).mean(), 4)))

    rows = []
    for i in range(6):
        blob = encode_y4m(_media_video_frames(i), colorspace="C444")
        for idx, px in iter_y4m_frames(blob, every_n=4):
            rows.append(_frame_row(f"vid-{i:04d}", "video", idx, px))
    for i in range(3):
        blob = encode_avi_mjpeg(_media_video_frames(i), fps=10, quality=96)
        for idx, px in iter_avi_mjpeg_frames(blob, every_n=4):
            rows.append(_frame_row(f"avi-{i:04d}", "avi", idx, px))
    for i in range(3):
        blob = encode_gif(_media_video_frames(i))
        for idx, px, _ in iter_gif_frames(blob, every_n=4):
            rows.append(_frame_row(f"gif-{i:04d}", "gif", idx, px))
    from etlpy_spark.functions.webpcodec import iter_webp_frames

    for i in range(3):
        blob = _media_webp_anim_blob(i)
        for idx, px, _ in iter_webp_frames(blob, every_n=4):
            rows.append(_frame_row(f"wanim-{i:04d}", "wanim", idx, px))
    for i in range(7):
        blob = _media_wav_blob(i)
        if blob[:4] == b"fLaC":
            from etlpy_spark.functions.flaccodec import decode_flac

            samples, _ = decode_flac(blob)
        else:
            samples, _ = decode_wav(blob)
        f = wav_float(samples)
        mono = f.mean(axis=1)
        rows.append((
            f"clip-{i:04d}", "audio", samples.shape[1], samples.shape[0],
            int(np.count_nonzero(np.signbit(mono[1:]) != np.signbit(mono[:-1]))),
            float(np.round(np.sqrt((f**2).mean()), 6)),
        ))
    for i in range(8):
        iid, quality, m1, m2, v = _media_jpeg_row(i)
        rows.append((iid, "jpeg", quality, m1, m2, v))
    for i in range(6):
        iid, mode, m1, m2, v = _media_webp_row(i)
        rows.append((iid, "webp", mode, m1, m2, v))
    from etlpy_spark.functions.audiometa import audio_metadata as _ameta

    for i in range(8):
        m = _ameta(_media_compressed_audio_blob(i))
        rows.append((f"cmp-{i:04d}", "ameta", m["n_channels"], m["n_samples"],
                     m["n_frames"], m["duration_s"]))
    from etlpy_spark.functions.videometa import video_metadata as _vmeta

    for i in range(6):
        m = _vmeta(_media_video_stub_blob(i))
        rows.append((f"vmt-{i:04d}-{m['container']}-{m['codec']}", "vmeta",
                     m["width"], m["height"], m["n_frames"], m["duration_s"]))
    return _values(rows, "media_id, kind, k, m1, m2, v")


def queries():
    return {
        "exact_dedup": q_exact_dedup,
        "minhash_lsh_pairs": q_minhash_lsh_pairs,
        "ngram_jaccard_pairs": q_ngram_jaccard_pairs,
        "simhash": q_simhash,
        "embedding_near_dup": q_embedding_near_dup,
        "ann_bruteforce": q_ann_bruteforce,
        "ann_ivf": q_ann_ivf,
        "text_suite": q_text_suite,
        "image_pipeline": q_image_pipeline,
        "phash_near_dup": q_phash_near_dup,
        "media_decode_suite": q_media_decode_suite,
    }


def oracle_sql():
    return {
        # keep-first (lowest doc_id) per exact text over docs+copies — NOT
        # just "the original ids": the generated documents table itself
        # contains duplicate texts at sf>=0.1, which exact_dedup collapses
        "exact_dedup": f"""
            SELECT doc_id FROM (
                SELECT doc_id,
                       row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
                FROM (
                    SELECT doc_id, text FROM documents
                    UNION ALL
                    SELECT doc_id + {OFFSET}, text FROM documents
                )
            ) WHERE rn = 1
        """,
        "minhash_lsh_pairs": _jaccard_sql(3, 0.6),
        "ngram_jaccard_pairs": _jaccard_sql(3, 0.6),
        "simhash": _simhash_sql(),
        "embedding_near_dup": f"""
            WITH e AS (
              SELECT vec_id, embedding FROM embeddings
              UNION ALL SELECT vec_id + {OFFSET}, embedding FROM embeddings
            )
            SELECT a.vec_id AS id_a, b.vec_id AS id_b
            FROM e a JOIN e b ON a.vec_id < b.vec_id
            WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.99
        """,
        "ann_bruteforce": """
            SELECT vec_id, rank FROM (
              SELECT vec_id,
                     row_number() OVER (
                       ORDER BY list_cosine_similarity(
                         embedding,
                         (SELECT embedding FROM embeddings WHERE vec_id = 0)
                       ) DESC, vec_id) AS rank
              FROM embeddings) WHERE rank <= 10
        """,
        "ann_ivf": _ann_ivf_oracle(),
        "text_suite": _text_suite_sql(),
        "image_pipeline": _image_pipeline_oracle(),
        "phash_near_dup": _phash_near_dup_oracle(),
        "media_decode_suite": _media_suite_oracle(),
    }
