"""EXIF GPS geo-privacy: extraction, in-place stripping, Spark operator
(functions/jpegcodec.py, functions/webpcodec.py, operators/multimodal.py)."""

import numpy as np
import pytest

from etlpy_spark.functions.imagecodec import decode, render_pixels
from etlpy_spark.functions.jpegcodec import (
    exif_gps,
    exif_orientation,
    insert_exif_gps,
    strip_exif_gps,
)


def _jpeg_with_gps(lat=48.858370, lon=2.294481, alt=None, orientation=1):
    px = render_pixels("img-000000000009")
    from etlpy_spark.functions.imagecodec import encode_jpg_image

    return px, insert_exif_gps(encode_jpg_image(px), lat, lon, alt=alt,
                               orientation=orientation)


class TestExtract:
    def test_reads_coordinates_with_hemispheres(self):
        for lat, lon in [(48.858370, 2.294481), (-33.8568, 151.2153),
                         (35.6595, -139.7005), (-22.9519, -43.2105)]:
            _, blob = _jpeg_with_gps(lat, lon)
            g = exif_gps(blob)
            assert g is not None
            assert abs(g["lat"] - lat) < 1e-4
            assert abs(g["lon"] - lon) < 1e-4

    def test_altitude(self):
        _, blob = _jpeg_with_gps(alt=324.5)
        assert abs(exif_gps(blob)["alt"] - 324.5) < 1e-6

    def test_no_exif_is_none(self):
        from etlpy_spark.functions.imagecodec import encode_jpg_image

        assert exif_gps(encode_jpg_image(render_pixels("img-000000000009"))) is None

    def test_hostile_bytes_never_raise(self):
        for blob in (b"", b"\xff\xd8", b"\xff\xd8\xff\xe1\x00\x04Ex",
                     b"\xff\xd8\xff\xe1\x00\x20Exif\x00\x00II*\x00\xff\xff\xff\xff" + b"\x00" * 16):
            assert exif_gps(blob) is None
            assert isinstance(strip_exif_gps(blob), bytes)


class TestStrip:
    def test_gps_removed_pixels_and_orientation_survive(self):
        px, blob = _jpeg_with_gps(alt=10.0, orientation=6)
        assert exif_gps(blob) is not None
        clean = strip_exif_gps(blob)
        assert len(clean) == len(blob)          # in-place: length preserved
        assert exif_gps(clean) is None
        assert exif_orientation(clean) == 6     # other metadata intact
        assert np.array_equal(decode(clean)[:, :, :],
                              decode(blob)[:, :, :])

    def test_no_readable_coordinate_bytes_remain(self):
        # the D/M/S rationals are out-of-line; stripping must zero them,
        # not merely unlink them
        px, blob = _jpeg_with_gps(lat=12.5, lon=34.25)
        clean = strip_exif_gps(blob)
        diff = [(i, a, b) for i, (a, b) in enumerate(zip(blob, clean)) if a != b]
        assert diff  # something was zeroed
        assert all(b == 0 for _, _, b in diff)  # and zeroed to 0, not moved

    def test_idempotent_and_noop_without_gps(self):
        from etlpy_spark.functions.imagecodec import encode_jpg_image

        plain = encode_jpg_image(render_pixels("img-000000000008"))
        assert strip_exif_gps(plain) == plain
        _, blob = _jpeg_with_gps()
        once = strip_exif_gps(blob)
        assert strip_exif_gps(once) == once

    def test_imageio_still_reads_stripped_jpeg(self, spark):
        px, blob = _jpeg_with_gps()
        clean = strip_exif_gps(blob)
        jvm = spark._jvm
        img = jvm.javax.imageio.ImageIO.read(
            jvm.java.io.ByteArrayInputStream(bytearray(clean)))
        assert img is not None
        assert (img.getWidth(), img.getHeight()) == (px.shape[1], px.shape[0])


class TestWebP:
    def test_webp_exif_chunk_stripped(self):
        from etlpy_spark.functions.jpegcodec import strip_tiff_gps
        from etlpy_spark.functions.webpcodec import (
            encode_webp,
            strip_webp_gps,
        )
        import struct

        px = render_pixels("img-000000000002")
        base = encode_webp(px)
        # graft an EXIF chunk (reuse the JPEG fixture's TIFF payload)
        _, jblob = _jpeg_with_gps(lat=1.25, lon=-3.5)
        from etlpy_spark.functions.jpegcodec import _find_app1_exif

        s, e = _find_app1_exif(jblob)
        tiff = jblob[s:e]
        chunk = b"EXIF" + struct.pack("<I", len(tiff)) + tiff
        if len(tiff) & 1:
            chunk += b"\x00"
        blob = base[:4] + struct.pack(
            "<I", struct.unpack("<I", base[4:8])[0] + len(chunk)
        ) + base[8:] + chunk
        assert strip_tiff_gps(tiff) != tiff  # fixture really carries GPS
        clean = strip_webp_gps(blob)
        assert len(clean) == len(blob)
        assert clean != blob
        # pixels untouched, idempotent
        from etlpy_spark.functions.webpcodec import decode_webp

        assert np.array_equal(decode_webp(clean), decode_webp(blob))
        assert strip_webp_gps(clean) == clean

    def test_noop_without_exif(self):
        from etlpy_spark.functions.webpcodec import encode_webp, strip_webp_gps

        blob = encode_webp(render_pixels("img-000000000004"))
        assert strip_webp_gps(blob) == blob


class TestSparkOperator:
    def test_redact_image_gps(self, spark):
        from etlpy_spark.operators.multimodal import redact_image_gps

        px, gps_blob = _jpeg_with_gps()
        from etlpy_spark.functions.imagecodec import encode_jpg_image, encode_png

        rows = [
            ("with-gps", bytearray(gps_blob)),
            ("plain-jpg", bytearray(encode_jpg_image(px))),
            ("png", bytearray(encode_png(px))),
        ]
        df = spark.createDataFrame(rows, "image_id string, bytes binary")
        got = {r["image_id"]: r for r in redact_image_gps(df).collect()}
        assert got["with-gps"]["had_gps"] is True
        assert exif_gps(bytes(got["with-gps"]["bytes"])) is None
        assert got["plain-jpg"]["had_gps"] is False
        assert bytes(got["plain-jpg"]["bytes"]) == bytes(rows[1][1])
        assert got["png"]["had_gps"] is False
        assert bytes(got["png"]["bytes"]) == bytes(rows[2][1])
