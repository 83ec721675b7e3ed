"""Image codec + perceptual hashing, numpy-only (no PIL in the environment).

The reference downloads image files and classifies jpg/png/gif by magic
bytes (reference spider.py:73-78 GetImage, spider.py:303-314
GetImageFormat). Our image table stores decoded-verifiable bytes in three
default formats (FIXTURES.md F1): ``raw`` (private header + RGB), ``ppm``
(P6), and ``png`` (real zlib PNG, 8-bit RGB, filter 0) — all lossless, so
the per-row invariant vs the oracle is exact pixel equality (PSNR=inf).
Two genuinely LOSSY formats exercise the north rule's PSNR branch:
``y4m`` = single-frame YUV4MPEG2 in C444 (BT.601 round-trip rounding loss,
measured ≥ 52 dB on the fixture images — over the ≥ 40 dB gate) and
``jpg`` = real baseline JFIF (from-scratch T.81 codec, functions/
jpegcodec.py; quality 96 measures ≥ 42 dB worst-case on the fixtures, so
the gate runs against genuine quantized-DCT loss in the format a real
image crawl overwhelmingly sees — reference spider.py:303-314 sniffs jpg
first). Both are opt-in via ``force_fmt`` so the recorded bench/scaling
workloads keep their historical format mix.

Everything operates on numpy arrays and is called from Arrow-batched pandas
UDFs — zero per-row Python at the plan level; per-image numpy is the decode
kernel itself (the same shape a real pipeline has around libjpeg).
"""

from __future__ import annotations

import hashlib
import struct
import zlib

import numpy as np

FORMATS = ("raw", "ppm", "png")


# ---------------------------------------------------------------------------
# deterministic procedural image (FIXTURES.md F1)


def _h64(s: str, seed: int) -> int:
    return int.from_bytes(hashlib.md5(f"{seed}|{s}".encode()).digest()[:8], "big")


def image_spec(
    image_id: str, seed: int = 42, dim_scale: int = 1, force_fmt: str = ""
) -> tuple[int, int, str]:
    """(w, h, fmt) for an image id — pure function of (id, seed, dim_scale).

    ``dim_scale`` multiplies both dimensions (1 → ≤128px sandbox fixtures;
    4 → ≤512px, the realistic web-image size the scaling benchmark uses so
    decode+phash carry real CPU weight). ``force_fmt`` pins the container
    format (the scaling benchmark uses 'png' so codec work — deflate /
    inflate / unfilter — dominates, the compute-bound shape of a real
    image crawl)."""
    h = _h64("spec|" + image_id, seed)
    sizes = (32, 64, 128)
    w = sizes[h % 3] * dim_scale
    hh = sizes[(h >> 8) % 3] * dim_scale
    fmt = force_fmt or FORMATS[(h >> 16) % 3]
    return w, hh, fmt


def render_pixels(image_id: str, seed: int = 42, dim_scale: int = 1) -> np.ndarray:
    """Deterministic gradient + per-id sine pattern, uint8 HxWx3.

    The sine field is separable (sin(f(x))·cos(g(y))), so it is built from
    two 1-D vectors + one outer product — bit-identical values to the naive
    2-D formula with a fraction of the memory traffic (this runs inside the
    fetch UDF for every crawled image; DRAM bandwidth, not FLOPs, is the
    multi-core ceiling)."""
    w, h, _ = image_spec(image_id, seed, dim_scale)
    ph = _h64("px|" + image_id, seed)
    xs = np.arange(w, dtype=np.int64)
    ys = np.arange(h, dtype=np.int64)
    base = (np.add.outer(ys * 5, xs * 3) + (ph % 251)) % 256
    sin_x = np.sin((xs + (ph >> 8) % 97) / 7.0)
    cos_y = np.cos((ys + (ph >> 16) % 89) / 5.0)
    wave = 127 * (1 + np.outer(cos_y, sin_x))
    px = np.empty((h, w, 3), dtype=np.uint8)
    px[:, :, 0] = base.astype(np.uint8)
    px[:, :, 1] = wave.astype(np.uint8)
    px[:, :, 2] = ((base + wave) / 2).astype(np.uint8)
    return px


def caption_for(image_id: str, seed: int = 42) -> str:
    adjectives = ["quiet", "bright", "rusty", "amber", "jade", "silver", "crimson", "pale"]
    nouns = ["harbor", "lantern", "valley", "rooftop", "market", "garden", "bridge", "archway"]
    places = ["dawn", "dusk", "noon", "midnight", "springtime", "harvest", "first-snow", "monsoon"]
    h = _h64("cap|" + image_id, seed)
    seq = int(image_id.split("-")[-1])
    return f"{adjectives[h % 8]} {nouns[(h >> 3) % 8]} at {places[(h >> 6) % 8]} #{seq}"


# ---------------------------------------------------------------------------
# encoders / decoders


def encode_raw(px: np.ndarray) -> bytes:
    h, w, _ = px.shape
    return b"RAW0" + struct.pack(">II", w, h) + px.tobytes()


def decode_raw(data: bytes) -> np.ndarray:
    assert data[:4] == b"RAW0"
    w, h = struct.unpack(">II", data[4:12])
    return np.frombuffer(data[12:], dtype=np.uint8).reshape(h, w, 3)


def encode_ppm(px: np.ndarray) -> bytes:
    h, w, _ = px.shape
    return f"P6\n{w} {h}\n255\n".encode() + px.tobytes()


def decode_ppm(data: bytes) -> np.ndarray:
    assert data[:2] == b"P6"
    parts = data.split(b"\n", 3)
    w, h = (int(v) for v in parts[1].split())
    return np.frombuffer(parts[3], dtype=np.uint8).reshape(h, w, 3)


def _png_chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(px: np.ndarray) -> bytes:
    """Minimal real PNG: 8-bit RGB, no interlace, filter 0 per scanline."""
    h, w, _ = px.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    # one (h, stride) array instead of h per-scanline joins — the Python
    # loop overhead was ~20% of encode for 512px images
    rows = np.zeros((h, w * 3 + 1), dtype=np.uint8)
    rows[:, 1:] = px.reshape(h, w * 3)
    raw = rows.tobytes()
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw, 6))
        + _png_chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> np.ndarray:
    """Full PNG decode (functions/pngcodec.py): every color type, bit
    depths 1..16, all five filters, Adam7, tRNS — real-web coverage; the
    writer above stays the byte-stable minimal RGB8/filter-0 form."""
    from etlpy_spark.functions.pngcodec import decode_png as _dec

    return _dec(data)


def encode_y4m_image(px: np.ndarray) -> bytes:
    """The suite's lossy image container: one-frame YUV4MPEG2, C444.
    RGB→BT.601→RGB integer rounding is the (only) loss — measured
    PSNR ≥ 52 dB on the fixture images, so the north rule's ≥ 40 dB
    lossy-format invariant holds against the *original* pixels, not just
    against an identical decoder. (C420 chroma subsampling measures
    ~27 dB on these high-chroma-frequency procedural images, under the
    gate — video streams may use it; the image table does not.)"""
    from etlpy_spark.functions.mediacodec import encode_y4m

    return encode_y4m([px], colorspace="C444")


def decode_y4m_image(data: bytes) -> np.ndarray:
    from etlpy_spark.functions.mediacodec import iter_y4m_frames

    for _, px in iter_y4m_frames(data, every_n=1):
        return px
    raise ValueError("Y4M stream contains no frames")


def encode_jpg_image(px: np.ndarray) -> bytes:
    """Real baseline JPEG (functions/jpegcodec.py — from-scratch T.81).
    Quality 96 keeps the worst fixture image ≥ 42 dB (q92 measures 37.6
    on the highest-frequency one, UNDER the 40 dB gate — the procedural
    sine patterns are hostile to DCT quantization), with the restart
    markers real encoders emit."""
    from etlpy_spark.functions.jpegcodec import encode_jpeg

    return encode_jpeg(px, quality=96, restart_interval=64)


def encode_jpgp_image(px: np.ndarray) -> bytes:
    """Real PROGRESSIVE JPEG (SOF2, spectral selection + successive
    approximation, per-scan optimal Huffman tables) — the encoding a large
    share of real web images use. Same quantized coefficients as the
    baseline path, so the same quality/PSNR behavior."""
    from etlpy_spark.functions.jpegcodec import encode_jpeg

    return encode_jpeg(px, quality=96, progressive=True)


def decode_jpg_image(data: bytes) -> np.ndarray:
    """From-scratch JPEG decode, honoring the EXIF orientation tag when an
    APP1 segment carries one (phones store sensor-native pixels; ignoring
    tag 274 feeds sideways images to every downstream operator)."""
    from etlpy_spark.functions.jpegcodec import (
        apply_orientation, decode_jpeg, exif_orientation,
    )

    px = decode_jpeg(data)
    o = exif_orientation(data)
    return apply_orientation(px, o) if o != 1 else px


def encode_gif_image(px: np.ndarray) -> bytes:
    """Real single-frame GIF89a (functions/gifcodec.py — from-scratch LZW +
    palette). ≤256 unique colors round-trips bitwise; true-color sources pay
    the deterministic cube quantization (~25 dB on the procedural fixtures —
    a palette-format property, so gif is decode-supported on the crawl path
    but NOT one of the PSNR≥40 lossy table formats)."""
    from etlpy_spark.functions.gifcodec import encode_gif_image as _enc

    return _enc(px)


def decode_gif_image(data: bytes) -> np.ndarray:
    from etlpy_spark.functions.gifcodec import decode_gif_image as _dec

    return _dec(data)


def encode_bmp_image(px: np.ndarray) -> bytes:
    """Plain 24-bit BMP (functions/bmpcodec.py — decode side covers the
    real-web variants: palette/16/32-bit, bitfields, RLE8, top-down).
    Lossless, like raw/ppm/png."""
    from etlpy_spark.functions.bmpcodec import encode_bmp as _enc

    return _enc(px)


def decode_bmp_image(data: bytes) -> np.ndarray:
    from etlpy_spark.functions.bmpcodec import decode_bmp as _dec

    return _dec(data)


def encode_tiff_image(px: np.ndarray) -> bytes:
    """LZW-compressed RGB TIFF (functions/tiffcodec.py — the decode side
    covers baseline TIFF 6.0: strips, PackBits/LZW, palette/gray/bilevel,
    predictor 2, both byte orders). Lossless."""
    from etlpy_spark.functions.tiffcodec import encode_tiff_ex

    return encode_tiff_ex(px, compression=5, predictor=2)


def decode_tiff_image(data: bytes) -> np.ndarray:
    from etlpy_spark.functions.tiffcodec import decode_tiff as _dec

    return _dec(data)


def encode_webp_image(px: np.ndarray) -> bytes:
    """Lossless WebP (RIFF/VP8L, functions/webpcodec.py — subtract-green +
    canonical Huffman; the decode side covers the full VP8L feature set:
    all 4 transforms, color cache, meta-Huffman, LZ77 plane codes).
    Lossless, like raw/ppm/png."""
    from etlpy_spark.functions.webpcodec import encode_webp as _enc

    return _enc(px)


def decode_webp_image(data: bytes) -> np.ndarray:
    """Decode + display orientation: a VP8X container may carry an EXIF
    chunk whose tag 274 phones set on sensor-native pixels — honored here
    exactly like the JPEG path (the pure codec stays transform-free)."""
    from etlpy_spark.functions.jpegcodec import apply_orientation
    from etlpy_spark.functions.webpcodec import decode_webp as _dec
    from etlpy_spark.functions.webpcodec import webp_exif_orientation

    px = _dec(data)
    o = webp_exif_orientation(data)
    return apply_orientation(px, o) if o != 1 else px


_ENC = {"raw": encode_raw, "ppm": encode_ppm, "png": encode_png,
        "y4m": encode_y4m_image, "jpg": encode_jpg_image,
        "jpgp": encode_jpgp_image, "gif": encode_gif_image,
        "bmp": encode_bmp_image, "tiff": encode_tiff_image,
        "webp": encode_webp_image}


def encode(px: np.ndarray, fmt: str) -> bytes:
    return _ENC[fmt](px)


def decode(data: bytes) -> np.ndarray:
    """Sniff by magic (mirrors reference spider.py:303-314 GetImageFormat)."""
    if data[:4] == b"RAW0":
        return decode_raw(data)
    if data[:2] == b"P6":
        return decode_ppm(data)
    if data[:8] == b"\x89PNG\r\n\x1a\n":
        return decode_png(data)
    if data[:9] == b"YUV4MPEG2":
        return decode_y4m_image(data)
    if data[:2] == b"\xff\xd8":
        return decode_jpg_image(data)
    if data[:6] in (b"GIF87a", b"GIF89a"):
        return decode_gif_image(data)
    if data[:2] == b"BM":
        return decode_bmp_image(data)
    if data[:4] in (b"II*\x00", b"MM\x00*"):
        return decode_tiff_image(data)
    if data[:4] == b"\x00\x00\x01\x00":  # ICO (favicon container)
        from etlpy_spark.functions.bmpcodec import decode_ico

        return decode_ico(data)
    if data[:4] == b"RIFF" and data[8:12] == b"WEBP":
        return decode_webp_image(data)
    fmt = sniff_format(data)
    if fmt in ("avif", "heic", "jxl"):
        # next-gen codecs (AV1/HEVC intra, modular JXL) are out of
        # from-scratch scope; when the container ships libheif (dav1d /
        # de265 plugins) AVIF and HEIC decode through it — otherwise
        # refuse with the TYPE so the crawl's decode_error/fmt columns
        # say what share of corpus each costs
        if fmt in ("avif", "heic"):
            from etlpy_spark.functions import nativecodecs

            if nativecodecs.heif_available():
                try:
                    return nativecodecs.decode_heif_native(data)
                except ValueError as e:
                    # keep the sniffed TYPE leading the reason so triage
                    # columns still say which format the corpus lost
                    raise ValueError(f"{fmt}: {e}") from None
        raise ValueError(f"{fmt}: next-gen image codec, decode not implemented here")
    raise ValueError("unknown image format")


def decode_or_error(data: bytes) -> tuple[np.ndarray | None, str | None]:
    """Skip-with-reason decode for the crawl path: a real web crawl meets
    codecs this engine honestly refuses (arithmetic-coded JPEG, compressed
    video containers) plus truncated/malformed garbage — those must become
    a ``decode_error`` column on the image row, never a task failure that
    aborts the round. Returns ``(pixels, None)`` or ``(None, reason)``;
    the reason string is a pure function of the blob (exception type +
    first line), so the serial oracle reproduces it exactly."""
    try:
        return decode(data), None
    except Exception as e:  # noqa: BLE001 — any decode failure is a row, not a crash
        msg = str(e).splitlines()[0] if str(e) else ""
        return None, f"{type(e).__name__}: {msg}"


def sniff_format(data: bytes) -> str:
    if data[:4] == b"RAW0":
        return "raw"
    if data[:2] == b"P6":
        return "ppm"
    if data[:8] == b"\x89PNG\r\n\x1a\n":
        return "png"
    if data[:9] == b"YUV4MPEG2":
        return "y4m"
    if data[:2] == b"\xff\xd8":
        return "jpg"
    if data[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
    if data[:2] == b"BM":
        return "bmp"
    if data[:4] in (b"II*\x00", b"MM\x00*"):
        return "tiff"
    if data[:4] == b"\x00\x00\x01\x00":
        return "ico"
    if data[:4] == b"RIFF" and data[8:12] == b"WEBP":
        return "webp"
    # next-gen formats a real crawl sees at growing share: typed triage so
    # a decode_error row says WHAT was lost, not just "unknown". JPEG XL is
    # a bare codestream (FF 0A) or an ISO-BMFF container with a JXL box;
    # AVIF/HEIC are ISO-BMFF ftyp brands (major brand, then the compatible
    # list — 'mif1'-major files usually carry the real brand there).
    if data[:2] == b"\xff\x0a" or data[:12] == b"\x00\x00\x00\x0cJXL \r\n\x87\n":
        return "jxl"
    if len(data) >= 12 and data[4:8] == b"ftyp":
        size = int.from_bytes(data[:4], "big")
        brands = [data[8:12]] + [
            data[i : i + 4] for i in range(16, min(size, len(data) - 3), 4)
        ]
        if any(b in (b"avif", b"avis") for b in brands):
            return "avif"
        if any(b in (b"heic", b"heix", b"hevc", b"hevx", b"heim", b"heis") for b in brands):
            return "heic"
    return "unknown"


def image_bytes(image_id: str, seed: int = 42, dim_scale: int = 1, force_fmt: str = "") -> bytes:
    _, _, fmt = image_spec(image_id, seed, dim_scale, force_fmt)
    return encode(render_pixels(image_id, seed, dim_scale), fmt)


# ---------------------------------------------------------------------------
# perceptual hash (64-bit DCT pHash) + PSNR


def resize_area(px: np.ndarray, size: int = 16) -> np.ndarray:
    """True area-average (anti-aliased box) resize to size×size: rows and
    columns partition into ``size`` contiguous bins (one reduceat per
    axis), each output pixel is the mean of its bin. Dimensions smaller
    than ``size`` fall back to nearest-neighbor sampling on that axis
    (empty bins have no area to average). The shared kernel for
    resize_images and its serial oracle."""
    h, w, _ = px.shape

    def _axis(px64: np.ndarray, n: int, axis: int) -> np.ndarray:
        if n < size:  # upsample: nearest
            idx = (np.arange(size) * n // size).clip(0, n - 1)
            return np.take(px64, idx, axis=axis)
        bounds = (np.arange(size) * n) // size
        counts = np.diff(np.append(bounds, n))
        shape = [1, 1, 1]
        shape[axis] = size
        return np.add.reduceat(px64, bounds, axis=axis) / counts.reshape(shape)

    out = _axis(_axis(px.astype(np.float64), h, 0), w, 1)
    return np.clip(np.rint(out), 0, 255).astype(np.uint8)


def _resize_gray(px: np.ndarray, size: int = 32) -> np.ndarray:
    # subsample FIRST, then grayscale the 32x32 sample — bit-identical to
    # gray-then-subsample (same pixels, same dot product) at ~1/(h*w/size²)
    # of the work; the full-image float64 gray pass dominated phash cost
    h, w, _ = px.shape
    yi = (np.arange(size) * h // size).clip(0, h - 1)
    xi = (np.arange(size) * w // size).clip(0, w - 1)
    sub = px[np.ix_(yi, xi)].astype(np.float64)
    return sub @ np.array([0.299, 0.587, 0.114])


_DCT32 = None


def _dct_matrix(n: int = 32) -> np.ndarray:
    global _DCT32
    if _DCT32 is None:
        k = np.arange(n)
        _DCT32 = np.cos(np.pi * (2 * k[None, :] + 1) * k[:, None] / (2 * n)) * np.sqrt(2 / n)
        _DCT32[0] /= np.sqrt(2)
    return _DCT32


def phash64(px: np.ndarray) -> int:
    """64-bit DCT perceptual hash as a signed int64 (Spark LongType)."""
    small = _resize_gray(px, 32)
    d = _dct_matrix(32)
    coef = d @ small @ d.T
    low = coef[:8, :8].flatten()
    med = np.median(low[1:])  # exclude DC term from the median
    bits = 0
    for i, v in enumerate(low):
        if i == 0:
            continue
        if v > med:
            bits |= 1 << (63 - i)
    return bits - (1 << 64) if bits >= (1 << 63) else bits


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0**2 / mse)


def ssim(a: np.ndarray, b: np.ndarray, window: int = 8) -> float:
    """Mean structural similarity (Wang et al. 2004) on the luma plane,
    uniform ``window``×``window`` moments via integral images (one cumsum
    per moment — no per-window loop). PSNR misses structural artifacts
    (blocking, ringing, banding) that SSIM is sensitive to, so codec
    gates can use both. Returns 1.0 for identical images; range
    (-1, 1]."""
    if a.shape != b.shape:
        raise ValueError("SSIM needs same-shape images")
    gray = np.array([0.299, 0.587, 0.114])
    x = (a.astype(np.float64) @ gray) if a.ndim == 3 else a.astype(np.float64)
    y = (b.astype(np.float64) @ gray) if b.ndim == 3 else b.astype(np.float64)
    h, w = x.shape
    win = min(window, h, w)

    def box(m: np.ndarray) -> np.ndarray:
        # win×win window sums from an integral image (valid positions)
        ii = np.zeros((h + 1, w + 1))
        ii[1:, 1:] = m.cumsum(0).cumsum(1)
        return (ii[win:, win:] - ii[:-win, win:] - ii[win:, :-win]
                + ii[:-win, :-win]) / (win * win)

    mx, my = box(x), box(y)
    vx = box(x * x) - mx * mx
    vy = box(y * y) - my * my
    cov = box(x * y) - mx * my
    c1, c2 = (0.01 * 255) ** 2, (0.03 * 255) ** 2
    s = ((2 * mx * my + c1) * (2 * cov + c2)) / (
        (mx * mx + my * my + c1) * (vx + vy + c2)
    )
    return float(s.mean())
