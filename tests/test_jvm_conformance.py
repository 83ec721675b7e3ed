"""Conformance of the from-scratch PNG/GIF/BMP/TIFF/JPEG codecs against a
second independent implementation: the JVM's javax.imageio, already
in-process with Spark (no new libraries, py4j only).

Rationale: self-round-trips cannot catch a codec that is self-consistent
but diverges from the spec — the VP8L plane-code-table bug
(tests/test_nativecodecs.py) proved that class of bug is real in this
codebase's history. Here every lossless from-scratch codec must agree
bit-exactly with ImageIO in BOTH directions (our streams under their
decoder; their encoder's streams under our decoder), and the two JPEG
decoders must agree within the T.81 IDCT tolerance on identical streams.

Pixel transfer trick: BufferedImage.getRGB -> int[] -> ByteBuffer ->
byte[] crosses py4j in one message instead of one call per pixel.
"""

import numpy as np
import pytest

from etlpy_spark.functions.imagecodec import (
    decode,
    encode_bmp_image,
    encode_gif_image,
    encode_jpg_image,
    encode_jpgp_image,
    encode_png,
    encode_tiff_image,
    psnr,
    render_pixels,
)


def _jdecode(spark, blob: bytes) -> np.ndarray:
    """ImageIO.read -> (h, w, 3) uint8 RGB."""
    jvm = spark._jvm
    img = jvm.javax.imageio.ImageIO.read(jvm.java.io.ByteArrayInputStream(bytearray(blob)))
    if img is None:
        raise ValueError("ImageIO could not read stream")
    w, h = img.getWidth(), img.getHeight()
    arr = img.getRGB(0, 0, w, h, None, 0, w)
    bb = jvm.java.nio.ByteBuffer.allocate(w * h * 4)
    bb.asIntBuffer().put(arr)
    pix = np.frombuffer(bytes(bb.array()), dtype=">i4").reshape(h, w)
    return np.stack([(pix >> 16) & 0xFF, (pix >> 8) & 0xFF, pix & 0xFF], -1).astype(np.uint8)


def _jrecode(spark, blob: bytes, fmt: str) -> bytes:
    """Decode with ImageIO, re-encode with ImageIO's own `fmt` writer —
    a foreign-encoder stream carrying the exact same pixels."""
    jvm = spark._jvm
    img = jvm.javax.imageio.ImageIO.read(jvm.java.io.ByteArrayInputStream(bytearray(blob)))
    baos = jvm.java.io.ByteArrayOutputStream()
    if not jvm.javax.imageio.ImageIO.write(img, fmt, baos):
        raise ValueError(f"ImageIO has no {fmt} writer for this image type")
    return bytes(baos.toByteArray())


def _images():
    yield render_pixels("img-000000000001")[:48, :48]
    yield render_pixels("img-000000000007")[:32, :56]
    grad = np.zeros((40, 64, 3), np.uint8)
    grad[..., 0] = np.linspace(0, 255, 64, dtype=np.uint8)[None, :]
    grad[..., 2] = np.linspace(255, 0, 40, dtype=np.uint8)[:, None]
    yield grad


def _palette_image():
    # <= 8 distinct colors: exact through palette formats (GIF)
    base = (np.indices((33, 47)).sum(0) % 8).astype(np.uint8)
    lut = np.array([[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255],
                    [255, 255, 0], [0, 255, 255], [255, 0, 255],
                    [200, 120, 40]], dtype=np.uint8)
    return lut[base]


@pytest.mark.parametrize("fmt,enc", [
    ("png", encode_png),
    ("bmp", encode_bmp_image),
    ("tiff", encode_tiff_image),
])
class TestLosslessBothDirections:
    def test_our_streams_under_imageio(self, spark, fmt, enc):
        for px in _images():
            assert np.array_equal(_jdecode(spark, enc(px)), px), fmt

    def test_imageio_streams_under_our_decoder(self, spark, fmt, enc):
        for px in _images():
            foreign = _jrecode(spark, enc(px), fmt)
            assert np.array_equal(decode(foreign), px), fmt


class TestGif:
    def test_both_directions_on_palette_image(self, spark):
        px = _palette_image()
        blob = encode_gif_image(px)
        assert np.array_equal(_jdecode(spark, blob), px)
        foreign = _jrecode(spark, blob, "gif")
        assert np.array_equal(decode(foreign), px)

    def test_both_directions_across_lzw_width_boundaries(self, spark):
        """A noisy 8-colour 160x160 image forces the GIF LZW code count
        past 511/1023/2047 — the exact seam where the TIFF variant's
        encoder/decoder pair silently desynced from the reference
        implementations while self-round-tripping fine."""
        rng = np.random.default_rng(11)
        base = rng.integers(0, 8, size=(160, 160), dtype=np.uint8).astype(np.uint8)
        lut = np.array([[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255],
                        [255, 255, 0], [0, 255, 255], [255, 0, 255],
                        [128, 128, 128]], dtype=np.uint8)
        px = lut[base]
        blob = encode_gif_image(px)
        assert np.array_equal(_jdecode(spark, blob), px)
        foreign = _jrecode(spark, blob, "gif")
        assert np.array_equal(decode(foreign), px)


class TestJpeg:
    def test_decoders_agree_on_our_streams(self, spark):
        """Baseline and progressive emissions: the two independent
        decoders must agree within T.81 IDCT tolerance (they implement
        different IDCTs; the spec bounds the divergence)."""
        for enc in (encode_jpg_image, encode_jpgp_image):
            for px in _images():
                blob = enc(px)
                a = decode(blob)
                b = _jdecode(spark, blob)
                assert a.shape == b.shape
                assert psnr(a, b) >= 45, enc.__name__

    def test_our_decoder_on_imageio_streams(self, spark):
        for px in _images():
            foreign = _jrecode(spark, encode_png(px), "jpg")
            a = decode(foreign)        # our decoder, their encoder
            b = _jdecode(spark, foreign)
            assert psnr(a, b) >= 45
            assert psnr(a, px) >= 25   # and it's still the same picture
