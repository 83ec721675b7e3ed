"""Multimodal (image/audio/video) column operators.

Policy (task brief): media rides as opaque ``binary`` columns with typed
metadata; decode / feature-extract / resize / frame-sample run as Arrow-
batched pandas UDFs over ``mapInPandas``. The Spark-side plumbing — schema,
partitioning, UDF signatures, batch shapes — is real and tested; the *image*
path is fully real (our numpy raw/PPM/PNG codecs + DCT pHash,
functions/imagecodec.py). Audio decode and video frame-sampling need codec
libraries this container doesn't ship, so those kernels are stubbed behind
``NotImplementedError`` with a deterministic fake for plumbing tests.
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


def resize_images(df: DataFrame, size: int = 16, id_col: str = "image_id",
                  bytes_col: str = "bytes") -> DataFrame:
    """Block-average resize to size×size, re-encoded as PPM thumbnails."""
    cols = (id_col, bytes_col)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from etlpy_spark.functions.imagecodec import decode, encode_ppm

        for pdf in batches:
            out = {k: [] for k in ("image_id", "bytes", "w", "h", "fmt")}
            for iid, data in zip(pdf[cols[0]], pdf[cols[1]]):
                px = decode(bytes(data))
                h, w, _ = px.shape
                yi = (np.arange(size) * h // size).clip(0, h - 1)
                xi = (np.arange(size) * w // size).clip(0, w - 1)
                small = px[np.ix_(yi, xi)]
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

    Returns (id_a, id_b, hamming) with id_a < id_b."""
    from etlpy_spark.operators.dedup import _expand_pairs

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
    posts = (
        banded.groupBy("band", "val")
        .agg(F.collect_list("e").alias("es"))
        .filter(F.size("es") > 1)
    )
    x, y = F.col("__x__"), F.col("__y__")
    a = F.when(x["id"] < y["id"], x).otherwise(y)
    b = F.when(x["id"] < y["id"], y).otherwise(x)
    pairs = (
        _expand_pairs(posts, "es")
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
# stubbed modalities (no audio/video codecs in this container)

AUDIO_META_DDL = "clip_id string, n_samples long, sample_rate int, rms double"
FRAME_DDL = "video_id string, frame_idx int, bytes binary"


def decode_audio_features(df: DataFrame, id_col: str = "clip_id",
                          bytes_col: str = "bytes", _fake: bool = False) -> DataFrame:
    """Audio decode → (n_samples, sample_rate, rms). STUB: real decoding
    needs an audio codec library not present here; ``_fake=True`` runs a
    deterministic fake (bytes interpreted as int16 PCM) to exercise the
    plumbing."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            if not _fake:
                raise NotImplementedError(
                    "audio decode requires a codec library (e.g. soundfile/ffmpeg) "
                    "not available in this environment; pass _fake=True for the "
                    "deterministic PCM interpretation"
                )
            out = {k: [] for k in ("clip_id", "n_samples", "sample_rate", "rms")}
            for cid, data in zip(pdf[id_col], pdf[bytes_col]):
                pcm = np.frombuffer(bytes(data)[: len(bytes(data)) // 2 * 2], dtype="<i2").astype(np.float64)
                out["clip_id"].append(cid)
                out["n_samples"].append(len(pcm))
                out["sample_rate"].append(16000)
                out["rms"].append(float(np.round(np.sqrt((pcm**2).mean() if len(pcm) else 0.0), 4)))
            yield pd.DataFrame(out)

    return df.select(id_col, bytes_col).mapInPandas(run, schema=AUDIO_META_DDL)


def sample_video_frames(df: DataFrame, every_n: int = 10, id_col: str = "video_id",
                        bytes_col: str = "bytes", _fake: bool = False) -> DataFrame:
    """Video frame sampling. STUB: real demuxing needs ffmpeg; the fake
    treats the payload as a concatenation of our raw-format images and
    samples every Nth — same output schema, partitioning and batch shape
    as the real kernel."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct

        for pdf in batches:
            if not _fake:
                raise NotImplementedError(
                    "video frame sampling requires ffmpeg, not available here; "
                    "pass _fake=True for the raw-concat interpretation"
                )
            out = {k: [] for k in ("video_id", "frame_idx", "bytes")}
            for vid, data in zip(pdf[id_col], pdf[bytes_col]):
                blob, pos, idx = bytes(data), 0, 0
                while pos + 12 <= len(blob) and blob[pos : pos + 4] == b"RAW0":
                    w, h = struct.unpack(">II", blob[pos + 4 : pos + 12])
                    end = pos + 12 + w * h * 3
                    if idx % every_n == 0:
                        out["video_id"].append(vid)
                        out["frame_idx"].append(idx)
                        out["bytes"].append(blob[pos:end])
                    pos, idx = end, idx + 1
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
