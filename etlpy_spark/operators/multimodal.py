"""Multimodal (image/audio/video) column operators.

Policy (task brief): media rides as opaque ``binary`` columns with typed
metadata; decode / feature-extract / resize / frame-sample run as Arrow-
batched pandas UDFs over ``mapInPandas``. The Spark-side plumbing — schema,
partitioning, UDF signatures, batch shapes — is real and tested; the *image*
path is fully real (our numpy raw/PPM/PNG/JPEG/GIF/BMP codecs + DCT
pHash, functions/imagecodec.py), and so are audio/video for WAV
(PCM/float/G.711), FLAC, YUV4MPEG2, AVI/MJPEG and animated GIF
(functions/{media,flac,gif}codec.py — MJPEG, GIF and FLAC ride our
from-scratch JPEG, LZW and Rice entropy coders). Only perceptual /
inter-frame codecs (MP3/H.264/VP9/...) still need libraries this
container doesn't ship and raise ``NotImplementedError``.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

IMAGE_META_DDL = "image_id string, w int, h int, fmt string, phash long, mean_lum double"
THUMB_DDL = "image_id string, bytes binary, w int, h int, fmt string"


def decode_image_features(df: DataFrame, id_col: str = "image_id",
                          bytes_col: str = "bytes") -> DataFrame:
    """binary → (w, h, fmt, phash, mean luminance); one Arrow batch per
    partition, numpy per image inside (the libjpeg-shaped kernel)."""
    cols = (id_col, bytes_col)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from etlpy_spark.functions.imagecodec import decode, phash64, sniff_format

        for pdf in batches:
            out = {k: [] for k in ("image_id", "w", "h", "fmt", "phash", "mean_lum")}
            for iid, data in zip(pdf[cols[0]], pdf[cols[1]]):
                b = bytes(data)
                px = decode(b)
                out["image_id"].append(iid)
                out["h"].append(px.shape[0])
                out["w"].append(px.shape[1])
                out["fmt"].append(sniff_format(b))
                out["phash"].append(phash64(px))
                out["mean_lum"].append(float(np.round(px.astype(np.float64).mean(), 4)))
            yield pd.DataFrame(out)

    return df.select(*cols).mapInPandas(run, schema=IMAGE_META_DDL)


QUALITY_DDL = (
    "image_id string, ahash long, dhash long, whash long, blur_var double, "
    "entropy double, colorfulness double, border_uniformity double, "
    "edge_density double"
)


def image_quality_features(df: DataFrame, id_col: str = "image_id",
                           bytes_col: str = "bytes") -> DataFrame:
    """binary → the curation-gate signal set (aHash/dHash/wHash perceptual
    hashes, Laplacian-variance blur score, luma entropy, Hasler-Süsstrunk
    colourfulness, border uniformity, edge density — see
    functions/imagequality.py). One Arrow batch per partition, numpy per
    image inside; undecodable bytes raise (compose with decode_or_error
    upstream when the input is untrusted)."""
    cols = (id_col, bytes_col)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from etlpy_spark.functions.imagecodec import decode
        from etlpy_spark.functions.imagequality import quality_features

        keys = ("ahash", "dhash", "whash", "blur_var", "entropy",
                "colorfulness", "border_uniformity", "edge_density")
        for pdf in batches:
            out = {k: [] for k in ("image_id",) + keys}
            for iid, data in zip(pdf[cols[0]], pdf[cols[1]]):
                q = quality_features(decode(bytes(data)))
                out["image_id"].append(iid)
                for k in keys:
                    out[k].append(q[k])
            yield pd.DataFrame(out)

    return df.select(*cols).mapInPandas(run, schema=QUALITY_DDL)


def quality_gate_predicate(min_dim: int = 32, max_aspect: float = 8.0,
                           min_entropy: float = 1.0, min_blur_var: float = 4.0,
                           max_border_uniformity: float = 0.999):
    """The curation decision as a pure Column over already-computed
    feature columns (w, h from decode_image_features; entropy/blur_var/
    border_uniformity from image_quality_features) — usable both as a
    filter (quality_gate) and as a kept/dropped annotation column."""
    aspect = F.greatest(F.col("w"), F.col("h")) / F.least(F.col("w"), F.col("h"))
    return (
        (F.least(F.col("w"), F.col("h")) >= F.lit(min_dim))
        & (aspect <= F.lit(max_aspect))
        & (F.col("entropy") >= F.lit(min_entropy))
        & (F.col("blur_var") >= F.lit(min_blur_var))
        & (F.col("border_uniformity") <= F.lit(max_border_uniformity))
    )


def quality_gate(df: DataFrame, min_dim: int = 32, max_aspect: float = 8.0,
                 min_entropy: float = 1.0, min_blur_var: float = 4.0,
                 max_border_uniformity: float = 0.999) -> DataFrame:
    """Pure-Column curation gate: minimum dimension, maximum aspect
    ratio, minimum information content, minimum sharpness, and a
    solid-border rejector. Catalyst-evaluated — no Python, pushes down
    to the scan."""
    return df.filter(quality_gate_predicate(
        min_dim, max_aspect, min_entropy, min_blur_var, max_border_uniformity))


GPS_DDL = "image_id string, bytes binary, had_gps boolean"


def redact_image_gps(df: DataFrame, id_col: str = "image_id",
                     bytes_col: str = "bytes") -> DataFrame:
    """Geo-privacy pass over an image-bytes column: zero any EXIF GPS
    sub-IFD in place (JPEG APP1 and WebP EXIF chunks; other formats pass
    through untouched — our from-scratch PNG/GIF/BMP emissions carry no
    EXIF). Pixels are bit-identical, every other metadata field
    (orientation included) survives, and a ``had_gps`` column records
    what was removed. Arrow-batched mapInPandas, byte-level — no decode,
    so it costs header-walk time, not codec time."""
    cols = (id_col, bytes_col)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from etlpy_spark.functions.jpegcodec import strip_exif_gps
        from etlpy_spark.functions.webpcodec import strip_webp_gps

        for pdf in batches:
            out = {"image_id": [], "bytes": [], "had_gps": []}
            for iid, data in zip(pdf[cols[0]], pdf[cols[1]]):
                b = bytes(data)
                if b[:2] == b"\xff\xd8":
                    cleaned = strip_exif_gps(b)
                elif b[:4] == b"RIFF" and b[8:12] == b"WEBP":
                    cleaned = strip_webp_gps(b)
                else:
                    cleaned = b
                out["image_id"].append(iid)
                out["bytes"].append(cleaned)
                out["had_gps"].append(cleaned != b)
            yield pd.DataFrame(out)

    return df.select(*cols).mapInPandas(run, schema=GPS_DDL)


def curate_images(images: DataFrame, min_dim: int = 32, max_aspect: float = 8.0,
                  min_entropy: float = 1.0, min_blur_var: float = 4.0,
                  max_border_uniformity: float = 0.999,
                  min_caption_chars: int = 1) -> DataFrame:
    """Crawl images table → curated training set: the end of the
    crawl→corpus loop over the target table shape
    (image_id, bytes, w, h, fmt, caption, phash [, decode_error]).

    Stage order is scale-deliberate: every JVM-expressible gate
    (decode_error IS NULL, caption length, w/h dimension + aspect — all
    plain columns) runs FIRST so Catalyst prunes rows before any image
    bytes reach a Python worker; the Arrow-batched quality kernels then
    run only on survivors, followed by the pure-Column signal gate. The
    compute-heavy UDF stage is explicitly repartitioned to session
    parallelism (user-specified repartitions are AQE-exempt — a
    byte-narrow scan would otherwise coalesce this stage to one task).
    Returns the surviving rows with the quality columns attached."""
    jvm_ok = (F.col("caption").isNotNull()
              & (F.length("caption") >= F.lit(min_caption_chars))
              & (F.least(F.col("w"), F.col("h")) >= F.lit(min_dim))
              & ((F.greatest(F.col("w"), F.col("h"))
                  / F.least(F.col("w"), F.col("h"))) <= F.lit(max_aspect)))
    if "decode_error" in images.columns:
        jvm_ok = F.col("decode_error").isNull() & jvm_ok
    base = images.filter(jvm_ok)
    target = images.sparkSession.sparkContext.defaultParallelism
    survivors = base if base.rdd.getNumPartitions() >= target else base.repartition(target)
    feats = image_quality_features(survivors)
    return quality_gate(
        survivors.join(feats, "image_id"),
        min_dim=min_dim, max_aspect=max_aspect, min_entropy=min_entropy,
        min_blur_var=min_blur_var, max_border_uniformity=max_border_uniformity,
    )


def prepare_image_corpus(images: DataFrame, min_dim: int = 32,
                         max_aspect: float = 8.0, min_entropy: float = 1.0,
                         min_blur_var: float = 4.0,
                         max_border_uniformity: float = 0.999,
                         max_hamming: int = 3,
                         checkpoint_dir: str | None = None) -> DataFrame:
    """The image face of operators/corpus.prepare_corpus: crawl images
    table → training-ready set in one call — quality curation
    (curate_images: JVM gates before bytes reach Python, then the
    Arrow-batched signal kernels), pHash near-duplicate DEDUP (banded
    Hamming pairs → connected components → keep min image_id per
    cluster; never all-pairs), and EXIF GPS redaction (byte-level,
    pixels untouched). Output carries the original columns (bytes =
    redacted) plus the quality signals and had_gps."""
    from etlpy_spark.operators.dedup import dedup_by_pairs

    curated = curate_images(
        images, min_dim=min_dim, max_aspect=max_aspect,
        min_entropy=min_entropy, min_blur_var=min_blur_var,
        max_border_uniformity=max_border_uniformity,
    )
    pairs = phash_near_dup_pairs(
        curated.select("image_id", "phash"), max_hamming=max_hamming)
    unique = dedup_by_pairs(curated, pairs, id_col="image_id",
                            checkpoint_dir=checkpoint_dir)
    redacted = redact_image_gps(unique)
    return (unique.drop("bytes")
            .join(redacted, "image_id"))


def resize_images(df: DataFrame, size: int = 16, id_col: str = "image_id",
                  bytes_col: str = "bytes") -> DataFrame:
    """Area-average (anti-aliased box) resize to size×size, re-encoded as
    PPM thumbnails — imagecodec.resize_area, the kernel the serial oracle
    shares (previously a strided subsample, which aliases high-frequency
    content into thumbnails and pHashes)."""
    cols = (id_col, bytes_col)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from etlpy_spark.functions.imagecodec import decode, encode_ppm, resize_area

        for pdf in batches:
            out = {k: [] for k in ("image_id", "bytes", "w", "h", "fmt")}
            for iid, data in zip(pdf[cols[0]], pdf[cols[1]]):
                small = resize_area(decode(bytes(data)), size)
                out["image_id"].append(iid)
                out["bytes"].append(encode_ppm(small))
                out["w"].append(size)
                out["h"].append(size)
                out["fmt"].append("ppm")
            yield pd.DataFrame(out)

    return df.select(*cols).mapInPandas(run, schema=THUMB_DDL)


def phash_near_dup_pairs(
    df: DataFrame,
    phash_col: str = "phash",
    id_col: str = "image_id",
    max_hamming: int = 3,
    max_bucket: int | None = 4096,
) -> DataFrame:
    """Image near-duplicate pairs by perceptual-hash Hamming distance —
    EXACT for the given radius, no cross join.

    Banding with a pigeonhole guarantee: split the 64-bit pHash into
    (max_hamming+1) equal bands; two hashes within Hamming distance k
    differ in at most k bands, so at least one band matches exactly —
    candidate generation is a groupBy on (band, band_value) posting lists
    (the shuffle key is the 16-bit band value, cost tracks shared content,
    not n²), and candidates verify with the exact JVM-side
    bit_count(xor) — pure Column expressions end to end.

    ``max_bucket`` bounds mega-buckets (a web crawl's solid-color
    thumbnails / placeholder images share ONE pHash by the million):
    over-cap (band, value) buckets emit Hamming-verified star candidates
    to the bucket's min id instead of all-pairs — bounded task memory,
    O(b) rows, connectivity-preserving for identical images (hamming 0
    through the hub); ``None`` restores pair-exhaustive expansion.

    Returns (id_a, id_b, hamming) with id_a < id_b."""
    from etlpy_spark.operators.dedup import _capped_bucket_pairs

    bands = max_hamming + 1
    w = 64 // bands
    mask = (1 << w) - 1
    h = F.col(phash_col).cast("long")
    band_vals = F.array(
        *[F.shiftrightunsigned(h, i * w).bitwiseAND(F.lit(mask)) for i in range(bands)]
    )
    banded = df.select(
        F.struct(F.col(id_col).alias("id"), h.alias("ph")).alias("e"),
        F.posexplode(band_vals).alias("band", "val"),
    )
    x, y = F.col("__x__"), F.col("__y__")
    a = F.when(x["id"] < y["id"], x).otherwise(y)
    b = F.when(x["id"] < y["id"], y).otherwise(x)
    pairs = (
        _capped_bucket_pairs(banded, ("band", "val"), "e", lambda c: c["id"], max_bucket)
        .filter(x["id"] != y["id"])
        .select(
            a["id"].alias("id_a"),
            b["id"].alias("id_b"),
            F.bit_count(a["ph"].bitwiseXOR(b["ph"])).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        # a pair within radius k can share up to (max_hamming+1) bands —
        # dedup after the cheap verify
        .distinct()
    )
    return pairs


# ---------------------------------------------------------------------------
# audio / video — real decode for the uncompressed container formats
# (WAV integer-PCM, YUV4MPEG2; functions/mediacodec.py). Compressed codecs
# (MP3/H.264/...) need libraries this container doesn't ship and raise.

AUDIO_META_DDL = (
    "clip_id string, n_samples long, sample_rate int, n_channels int, "
    "duration_s double, rms double, zero_crossings long"
)
FRAME_DDL = "video_id string, frame_idx int, bytes binary"


def decode_audio_features(df: DataFrame, id_col: str = "clip_id",
                          bytes_col: str = "bytes", _fake: bool = False) -> DataFrame:
    """Audio decode → (n_samples, sample_rate, n_channels, duration_s,
    rms, zero_crossings). WAV (integer PCM / IEEE float / G.711, any
    width/channels — chunk-walking parser in functions/mediacodec.py) and
    FLAC (from-scratch decoder, functions/flaccodec.py) are decoded for
    real; ``_fake=True`` additionally accepts headerless blobs as 16 kHz
    mono int16 PCM (plumbing tests). rms is computed on
    full-scale-normalized samples, so it is comparable across PCM widths;
    zero_crossings counts sign changes of the channel-mean signal."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from etlpy_spark.functions.mediacodec import decode_wav, sniff_media, wav_float

        cols = ("clip_id", "n_samples", "sample_rate", "n_channels",
                "duration_s", "rms", "zero_crossings")
        for pdf in batches:
            out = {k: [] for k in cols}
            for cid, data in zip(pdf[id_col], pdf[bytes_col]):
                b = bytes(data)
                kind = sniff_media(b)
                if kind == "wav":
                    samples, rate = decode_wav(b)
                elif kind == "flac":
                    from etlpy_spark.functions.flaccodec import decode_flac

                    samples, rate = decode_flac(b)
                elif _fake:
                    samples = np.frombuffer(b[: len(b) // 2 * 2], dtype="<i2").reshape(-1, 1)
                    rate = 16000
                else:
                    from etlpy_spark.functions.audiometa import sniff_audio

                    raise NotImplementedError(
                        f"perceptual codec '{sniff_audio(b)}': PCM decode "
                        "needs libraries not in this environment (header "
                        "metadata available via audio_metadata); WAV "
                        "(PCM/float/G.711) and FLAC decode natively"
                    )
                f = wav_float(samples)
                mono = f.mean(axis=1)
                out["clip_id"].append(cid)
                out["n_samples"].append(samples.shape[0])
                out["sample_rate"].append(rate)
                out["n_channels"].append(samples.shape[1])
                out["duration_s"].append(
                    float(np.round(samples.shape[0] / rate, 6)) if rate else 0.0
                )
                out["rms"].append(
                    float(np.round(np.sqrt((f**2).mean()) if f.size else 0.0, 6))
                )
                out["zero_crossings"].append(
                    int(np.count_nonzero(np.signbit(mono[1:]) != np.signbit(mono[:-1])))
                )
            yield pd.DataFrame(out)

    return df.select(id_col, bytes_col).mapInPandas(run, schema=AUDIO_META_DDL)


AUDIO_TRIAGE_DDL = (
    "clip_id string, container string, codec string, sample_rate int, "
    "n_channels int, n_frames long, n_samples long, duration_s double, "
    "bitrate_kbps double, decode_error string"
)


def audio_metadata(df: DataFrame, id_col: str = "clip_id",
                   bytes_col: str = "bytes") -> DataFrame:
    """Header-walk audio triage for EVERY format a crawl meets — including
    the perceptual codecs whose PCM decode is out of from-scratch scope
    (MP3/MP2/MP1 frame walk, Ogg Vorbis/Opus page+ident parse, ADTS AAC;
    functions/audiometa.py). WAV/FLAC rows come from the real decoders.
    Unrecognized/corrupt blobs become a ``decode_error`` row (skip with
    reason — a pure function of the blob), never a task failure. Arrow-
    batched mapInPandas; one pass over the bytes, no shuffle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from etlpy_spark.functions.audiometa import audio_metadata as meta

        cols = ("clip_id", "container", "codec", "sample_rate", "n_channels",
                "n_frames", "n_samples", "duration_s", "bitrate_kbps",
                "decode_error")
        for pdf in batches:
            out = {k: [] for k in cols}
            for cid, data in zip(pdf[id_col], pdf[bytes_col]):
                try:
                    m = meta(bytes(data))
                    err = None
                except Exception as e:  # noqa: BLE001 — a row, not a crash
                    m = {}
                    msg = str(e).splitlines()[0] if str(e) else ""
                    err = f"{type(e).__name__}: {msg}"
                out["clip_id"].append(cid)
                out["container"].append(m.get("container"))
                out["codec"].append(m.get("codec"))
                out["sample_rate"].append(m.get("sample_rate"))
                out["n_channels"].append(m.get("n_channels"))
                out["n_frames"].append(m.get("n_frames"))
                out["n_samples"].append(m.get("n_samples"))
                out["duration_s"].append(m.get("duration_s"))
                out["bitrate_kbps"].append(m.get("bitrate_kbps"))
                out["decode_error"].append(err)
            yield pd.DataFrame(out)

    return df.select(id_col, bytes_col).mapInPandas(run, schema=AUDIO_TRIAGE_DDL)


VIDEO_TRIAGE_DDL = (
    "video_id string, container string, codec string, width int, height int, "
    "n_frames long, duration_s double, fps double, decode_error string"
)


def video_triage(df: DataFrame, id_col: str = "video_id",
                 bytes_col: str = "bytes") -> DataFrame:
    """Header-walk video triage for every container a crawl meets —
    including the inter-frame codecs whose decode is out of scope
    (MP4/MOV moov walk, WebM/Matroska EBML walk; decodable AVI/Y4M
    report through their demuxers; functions/videometa.py): container,
    codec, dimensions, frame count, duration, fps. Enough to size,
    filter, route and cost a video corpus without touching a coded
    frame. Unrecognized/corrupt blobs become a ``decode_error`` row.
    Arrow-batched mapInPandas; one pass, no shuffle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from etlpy_spark.functions.videometa import video_metadata as meta

        cols = ("video_id", "container", "codec", "width", "height",
                "n_frames", "duration_s", "fps", "decode_error")
        for pdf in batches:
            out = {k: [] for k in cols}
            for vid, data in zip(pdf[id_col], pdf[bytes_col]):
                try:
                    m = meta(bytes(data))
                    err = None
                except Exception as e:  # noqa: BLE001 — a row, not a crash
                    m = {}
                    msg = str(e).splitlines()[0] if str(e) else ""
                    err = f"{type(e).__name__}: {msg}"
                out["video_id"].append(vid)
                for k in cols[1:-1]:
                    out[k].append(m.get(k))
                out["decode_error"].append(err)
            yield pd.DataFrame(out)

    return df.select(id_col, bytes_col).mapInPandas(run, schema=VIDEO_TRIAGE_DDL)


def sample_video_frames(df: DataFrame, every_n: int = 10, id_col: str = "video_id",
                        bytes_col: str = "bytes") -> DataFrame:
    """Every-Nth video frame sampling → RAW0 RGB frames (which flow
    straight into decode_image_features / resize_images / pHash).

    Containers are sniffed per row: YUV4MPEG2 streams are demuxed for real
    (functions/mediacodec.py — skipped frames are seeked over in O(1), so
    1-in-N sampling pays decode for only the sampled frames), AVI/MJPEG
    chunks seek the same way and decode through the from-scratch JPEG
    codec, animated GIFs composite per the disposal rules with LZW paid
    only on the sampled frames' dependency chains
    (functions/gifcodec.py), animated WebPs composite per the container
    spec's blend/dispose rules with VP8L decode likewise paid only on
    dependency chains (functions/webpcodec.py), and RAW0 concatenations
    are sliced. Inter-frame-compressed formats (H.264/VP9/...) need
    ffmpeg and raise."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct

        from etlpy_spark.functions.gifcodec import iter_gif_frames
        from etlpy_spark.functions.imagecodec import encode_raw
        from etlpy_spark.functions.webpcodec import iter_webp_frames
        from etlpy_spark.functions.mediacodec import (
            iter_avi_mjpeg_frames,
            iter_y4m_frames,
            sniff_media,
        )

        for pdf in batches:
            out = {k: [] for k in ("video_id", "frame_idx", "bytes")}
            for vid, data in zip(pdf[id_col], pdf[bytes_col]):
                blob = bytes(data)
                kind = sniff_media(blob)
                if kind == "y4m":
                    for idx, px in iter_y4m_frames(blob, every_n=every_n):
                        out["video_id"].append(vid)
                        out["frame_idx"].append(idx)
                        out["bytes"].append(encode_raw(px))
                elif kind == "avi":
                    for idx, px in iter_avi_mjpeg_frames(blob, every_n=every_n):
                        out["video_id"].append(vid)
                        out["frame_idx"].append(idx)
                        out["bytes"].append(encode_raw(px))
                elif kind == "gif":
                    for idx, px, _ in iter_gif_frames(blob, every_n=every_n):
                        out["video_id"].append(vid)
                        out["frame_idx"].append(idx)
                        out["bytes"].append(encode_raw(px))
                elif kind == "webp":
                    for idx, px, _ in iter_webp_frames(blob, every_n=every_n):
                        out["video_id"].append(vid)
                        out["frame_idx"].append(idx)
                        out["bytes"].append(encode_raw(px))
                elif kind == "rawcat":
                    pos, idx = 0, 0
                    while pos + 12 <= len(blob) and blob[pos : pos + 4] == b"RAW0":
                        w, h = struct.unpack(">II", blob[pos + 4 : pos + 12])
                        end = pos + 12 + w * h * 3
                        if idx % every_n == 0:
                            out["video_id"].append(vid)
                            out["frame_idx"].append(idx)
                            out["bytes"].append(blob[pos:end])
                        pos, idx = end, idx + 1
                else:
                    raise NotImplementedError(
                        "inter-frame-compressed video needs ffmpeg, not available "
                        "here; YUV4MPEG2, AVI/MJPEG, animated GIF, animated WebP "
                        "and RAW0-concat streams are demuxed natively"
                    )
            yield pd.DataFrame(out)

    return df.select(id_col, bytes_col).mapInPandas(run, schema=FRAME_DDL)


def synthetic_images_df(spark, n: int = 200, parallelism: int = 8) -> DataFrame:
    """A real binary image table generated executor-side from spark.range —
    used by queries/tests when no crawl output is at hand."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from etlpy_spark.functions.imagecodec import image_bytes

        for pdf in batches:
            ids = [f"img-{int(i):012d}" for i in pdf["id"]]
            yield pd.DataFrame({
                "image_id": ids,
                "bytes": [image_bytes(i) for i in ids],
            })

    return (
        spark.range(0, n, 1, parallelism)
        .mapInPandas(gen, schema="image_id string, bytes binary")
    )
