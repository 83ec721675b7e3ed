from __future__ import annotations

import numpy as np
import pytest

from etlpy_spark.functions import imagecodec as ic


@pytest.mark.parametrize("fmt", ic.FORMATS)
def test_roundtrip_lossless(fmt):
    px = ic.render_pixels("img-000000000042")
    data = ic.encode(px, fmt)
    assert ic.sniff_format(data) == fmt
    out = ic.decode(data)
    assert np.array_equal(px, out)
    assert ic.psnr(px, out) == float("inf")


def test_deterministic():
    a = ic.image_bytes("img-000000000007")
    b = ic.image_bytes("img-000000000007")
    assert a == b
    assert ic.image_bytes("img-000000000008") != a


def test_phash_properties():
    px = ic.render_pixels("img-000000000042")
    h1 = ic.phash64(px)
    assert isinstance(h1, int) and -(1 << 63) <= h1 < (1 << 63)
    # invariant to mild noise (perceptual), sensitive to different content
    noisy = np.clip(px.astype(np.int16) + np.random.default_rng(0).integers(-4, 5, px.shape), 0, 255).astype(np.uint8)
    other = ic.render_pixels("img-000000000999")

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    assert ham(h1, ic.phash64(noisy)) <= 10
    assert ham(h1, ic.phash64(other)) > 10


def test_spec_and_caption_stable():
    w, h, fmt = ic.image_spec("img-000000000001")
    assert w in (32, 64, 128) and h in (32, 64, 128) and fmt in ic.FORMATS
    cap = ic.caption_for("img-000000000001")
    assert cap.endswith("#1") and len(cap.split()) == 5  # "adj noun at place #seq"


def test_ssim_properties_and_codec_gates():
    """SSIM sanity: identity = 1; invariant ranking (structure noise hurts
    more than a small uniform luminance shift at matched PSNR is the
    metric's whole point); the real JPEG codec at q96 keeps SSIM high."""
    import numpy as np

    from etlpy_spark.functions.imagecodec import psnr, render_pixels, ssim
    from etlpy_spark.functions.jpegcodec import decode_jpeg, encode_jpeg

    px = render_pixels("img-000000000030")
    assert ssim(px, px) == 1.0
    rng = np.random.default_rng(9)
    noisy = np.clip(px.astype(int) + rng.integers(-25, 26, px.shape), 0, 255).astype(np.uint8)
    shifted = np.clip(px.astype(int) + 14, 0, 255).astype(np.uint8)  # ~same PSNR
    assert abs(psnr(noisy, px) - psnr(shifted, px)) < 3.0
    assert ssim(shifted, px) > ssim(noisy, px)  # structure beats luminance
    assert 0.0 < ssim(noisy, px) < 1.0
    dec = decode_jpeg(encode_jpeg(px, quality=96))
    assert ssim(dec, px) > 0.95
    with __import__("pytest").raises(ValueError, match="same-shape"):
        ssim(px, px[:-1])


def test_sniff_nextgen_formats_typed_triage():
    """AVIF/HEIC/JXL: typed fmt + typed decode_error, never 'unknown'."""
    import struct

    from etlpy_spark.functions.imagecodec import decode_or_error, sniff_format

    def ftyp(major: bytes, compat: list[bytes]) -> bytes:
        body = major + b"\x00\x00\x00\x00" + b"".join(compat)
        return struct.pack(">I", 8 + len(body)) + b"ftyp" + body + b"\x00" * 32

    cases = {
        "avif": [ftyp(b"avif", [b"mif1"]), ftyp(b"mif1", [b"miaf", b"avif"])],
        "heic": [ftyp(b"heic", []), ftyp(b"mif1", [b"heic"])],
        "jxl": [b"\xff\x0a" + b"\x00" * 16,
                b"\x00\x00\x00\x0cJXL \r\n\x87\n" + b"\x00" * 16],
    }
    for fmt, blobs in cases.items():
        for blob in blobs:
            assert sniff_format(blob) == fmt
            px, err = decode_or_error(blob)
            assert px is None and err is not None and fmt in err
    # an avif brand in the compat list wins over a heic major (dual-brand
    # files decode as AVIF in practice); plain mp4 ftyp stays unknown
    assert sniff_format(ftyp(b"heic", [b"avif"])) == "avif"
    assert sniff_format(ftyp(b"isom", [b"iso2", b"mp41"])) == "unknown"
    _, err = decode_or_error(ftyp(b"isom", [b"mp41"]))
    assert err == "ValueError: unknown image format"
