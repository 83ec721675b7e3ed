"""Conformance of the from-scratch codecs against the container's system
codec libraries (functions/nativecodecs.py ctypes bindings), plus the
native decode fallbacks for formats out of from-scratch scope.

These tests caught a real bug on first run: the VP8L short-distance
plane-code table's tail (codes 93+) diverged from the spec list — every
self-round-trip passed (encoder and decoder shared the wrong table) while
real libwebp streams mis-decoded. Conformance against the reference
implementation is the only test shape that can see that class of bug.
"""

import numpy as np
import pytest

from etlpy_spark.functions import nativecodecs as nc
from etlpy_spark.functions.imagecodec import (
    decode,
    decode_or_error,
    psnr,
    render_pixels,
    sniff_format,
)

needs_webp = pytest.mark.skipif(not nc.webp_available(), reason="libwebp absent")
needs_heif = pytest.mark.skipif(not nc.heif_available(), reason="libheif absent")


def _fixture_images():
    for i in range(16):
        yield render_pixels(f"img-{i:012d}")
    grad = np.zeros((64, 80, 3), np.uint8)
    grad[..., 0] = np.linspace(0, 255, 80, dtype=np.uint8)[None, :]
    grad[..., 1] = np.linspace(0, 255, 64, dtype=np.uint8)[:, None]
    yield grad
    pal = (np.indices((48, 48)).sum(0) % 7 * 36).astype(np.uint8)
    yield np.stack([pal, 255 - pal, np.roll(pal, 5, 0)], -1)
    yield np.full((16, 16, 3), 200, np.uint8)  # flat: LZ77-heavy stream


@needs_webp
class TestVP8LConformance:
    def test_libwebp_streams_decode_bit_exactly(self):
        """Real-encoder VP8L streams (predictor + cross-color + color
        cache + meta combinations our own encoder never emits) must
        decode bit-exactly under the from-scratch decoder."""
        from etlpy_spark.functions.webpcodec import decode_webp

        for px in _fixture_images():
            blob = nc.encode_webp_native(px)  # lossless
            assert blob[12:16] == b"VP8L"
            out = decode_webp(blob)
            assert np.array_equal(out, px), px.shape

    def test_our_streams_decode_bit_exactly_under_libwebp(self):
        from etlpy_spark.functions.webpcodec import encode_webp

        for px in _fixture_images():
            out = nc.decode_webp_native(encode_webp(px))
            assert np.array_equal(out, px), px.shape

    def test_plane_code_table_matches_spec_prefix_and_shape(self):
        from etlpy_spark.functions.webpcodec import PLANE_CODES

        assert len(PLANE_CODES) == 120
        assert len(set(PLANE_CODES)) == 120
        # the neighborhood is dy 0..7, dx -7..8 (dy=0 rows need dx>=1)
        for dx, dy in PLANE_CODES:
            assert 0 <= dy <= 7
            assert -7 <= dx <= 8
            if dy == 0:
                assert dx >= 1


@needs_webp
class TestVP8LossyDecode:
    def test_lossy_webp_decodes_through_dispatch(self):
        px = render_pixels("img-000000000002")
        blob = nc.encode_webp_native(px, quality=92.0)
        assert blob[12:16] == b"VP8 "
        assert sniff_format(blob) == "webp"
        out = decode(blob)
        assert out.shape == px.shape
        assert psnr(px, out) > 25  # procedural textures are high-frequency

    def test_decode_or_error_now_succeeds_on_lossy(self):
        px = render_pixels("img-000000000004")
        out, err = decode_or_error(nc.encode_webp_native(px, quality=90.0))
        assert err is None and out is not None

    def test_webp_info_reports_lossy_decodable(self):
        from etlpy_spark.functions.webpcodec import webp_info

        px = render_pixels("img-000000000001")
        info = webp_info(nc.encode_webp_native(px, quality=85.0))
        assert info["kind"] == "vp8"
        assert info["decodable"] is True


@needs_heif
class TestHeifDecode:
    @pytest.mark.parametrize("fmt", ["avif", "heic"])
    def test_roundtrip_through_dispatch(self, fmt):
        px = render_pixels("img-000000000003")[:64, :64]
        blob = nc.encode_heif_native(px, fmt, quality=90)
        assert sniff_format(blob) == fmt
        out = decode(blob)
        assert out.shape == px.shape
        assert psnr(px, out) > 25

    def test_garbage_ftyp_still_typed_error(self):
        # a fake brand box must stay a decode_error row, not a crash
        blob = (b"\x00\x00\x00\x18ftypavif\x00\x00\x00\x00avifmif1"
                + b"\x00" * 32)
        out, err = decode_or_error(blob)
        assert out is None
        assert err is not None and "ValueError" in err


class TestFallbackWithoutLibs:
    def test_vp8_refusal_path_still_reachable(self, monkeypatch):
        """When libwebp is absent the dispatch must keep the honest typed
        refusal (the from-scratch boundary), not crash."""
        if not nc.webp_available():
            pytest.skip("exercised for real on this host")
        px = render_pixels("img-000000000005")
        blob = nc.encode_webp_native(px, quality=80.0)
        monkeypatch.setattr(nc, "webp_available", lambda: False)
        with pytest.raises(ValueError, match="VP8 lossy"):
            from etlpy_spark.functions.webpcodec import decode_webp

            decode_webp(blob)

    def test_heif_refusal_path_still_reachable(self, monkeypatch):
        if not nc.heif_available():
            pytest.skip("exercised for real on this host")
        px = render_pixels("img-000000000006")[:32, :32]
        blob = nc.encode_heif_native(px, "avif")
        monkeypatch.setattr(nc, "heif_available", lambda: False)
        with pytest.raises(ValueError, match="next-gen image codec"):
            decode(blob)


@needs_webp
@pytest.mark.parametrize("seed", range(6))
@pytest.mark.parametrize("kind", ["noise", "lowcolor", "smooth"])
def test_vp8l_conformance_sweep(seed, kind):
    """Randomized bidirectional VP8L conformance: image families chosen to
    steer libwebp toward different transform/cache decisions (noise →
    literals+cache, low-color → palette, smooth → predictor+cross-color)."""
    from etlpy_spark.functions.webpcodec import decode_webp, encode_webp

    rng = np.random.default_rng(1000 + seed)
    h, w = int(rng.integers(4, 90)), int(rng.integers(4, 90))
    if kind == "noise":
        px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8).astype(np.uint8)
    elif kind == "lowcolor":
        lut = rng.integers(0, 256, (5, 3), dtype=np.uint8).astype(np.uint8)
        px = lut[rng.integers(0, 5, (h, w))]
    else:
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
        px = np.stack([
            128 + 100 * np.sin(yy / 11 + seed), 128 + 100 * np.cos(xx / 7),
            (yy * 2 + xx * 3) % 256,
        ], -1).astype(np.uint8)
    theirs = nc.encode_webp_native(px)
    assert np.array_equal(decode_webp(theirs), px), (kind, h, w)
    ours = encode_webp(px)
    assert np.array_equal(nc.decode_webp_native(ours), px), (kind, h, w)
