"""Unit tests for the baseline TIFF codec (functions/tiffcodec.py):
strips, PackBits + TIFF-LZW (early-change rule), predictor 2, palette /
gray / bilevel / RGB photometrics, both byte orders."""

import numpy as np
import pytest

from etlpy_spark.functions.imagecodec import decode, render_pixels, sniff_format
from etlpy_spark.functions.tiffcodec import (
    decode_tiff,
    encode_tiff,
    encode_tiff_ex,
    packbits_decode,
    packbits_encode,
    tiff_lzw_decode,
    tiff_lzw_encode,
)


def test_lzw_early_change_boundaries_and_reset():
    """The early-change width bump fires one code EARLIER than GIF LZW —
    a compressible stream long enough to cross 511/1023/2047 and force a
    table reset pins the rule (regression: a len(table)-based decoder
    bumped one code late and desynced at the first boundary)."""
    rng = np.random.default_rng(17)
    streams = (
        bytes(np.repeat(rng.integers(0, 8, 3000), 5).astype(np.uint8)),
        bytes(20000),  # forces the 12-bit table reset
        rng.integers(0, 256, 5000, dtype=np.uint8).tobytes(),
        b"", b"a", b"ab" * 4000,
    )
    for data in streams:
        assert tiff_lzw_decode(tiff_lzw_encode(data), len(data)) == data


def test_packbits_roundtrip_and_truncation():
    rng = np.random.default_rng(3)
    for data in (b"", b"abc", bytes([7] * 300),
                 rng.integers(0, 256, 999, dtype=np.uint8).tobytes()):
        assert packbits_decode(packbits_encode(data), len(data)) == data
    with pytest.raises(ValueError, match="truncated"):
        packbits_decode(packbits_encode(bytes(100))[:1], 100)


def test_rgb_full_grid():
    px = render_pixels("img-000000000021")
    for comp in (1, 32773, 5):
        for pred in (1, 2):
            for bo in ("II", "MM"):
                blob = encode_tiff_ex(px, compression=comp, predictor=pred,
                                      byte_order=bo, rows_per_strip=37)
                assert np.array_equal(decode_tiff(blob), px), (comp, pred, bo)


def test_gray_bilevel_palette():
    rng = np.random.default_rng(5)
    px = render_pixels("img-000000000022")
    g = px[:, :, 1]
    for photo in (0, 1):  # WhiteIsZero must invert
        blob = encode_tiff_ex(g, photometric=photo, compression=5)
        assert np.array_equal(decode_tiff(blob), np.repeat(g[..., None], 3, axis=2))
    bl = rng.integers(0, 2, size=(23, 37), dtype=np.uint8)  # odd width: row padding
    for photo in (0, 1):
        blob = encode_tiff_ex(bl, photometric=photo, bilevel=True, compression=32773)
        assert np.array_equal(decode_tiff(blob), np.repeat((bl * 255)[..., None], 3, axis=2))
    pal = rng.integers(0, 256, size=(256, 3), dtype=np.uint8)
    idx = rng.integers(0, 256, size=(19, 29), dtype=np.uint8)
    blob = encode_tiff_ex(idx, photometric=3, palette=pal, compression=5, rows_per_strip=4)
    assert np.array_equal(decode_tiff(blob), pal[idx])


def test_imagecodec_dispatch():
    px = render_pixels("img-000000000023")
    from etlpy_spark.functions.imagecodec import encode

    blob = encode(px, "tiff")
    assert sniff_format(blob) == "tiff"
    assert np.array_equal(decode(blob), px)


def test_hostile_inputs_raise_valueerror():
    px = render_pixels("img-000000000024")
    with pytest.raises(ValueError, match="not a TIFF"):
        decode_tiff(b"xx")
    with pytest.raises(ValueError, match="truncated"):
        decode_tiff(b"II*\x00\x08\x00\x00\x00")
    good = encode_tiff(px)
    with pytest.raises(ValueError, match="truncated|strip"):
        decode_tiff(good[: len(good) - 50])
    import struct as _s

    bad = bytearray(encode_tiff_ex(px, compression=5))
    # corrupt the compression tag to an unsupported scheme (JPEG-in-TIFF)
    at = 8 + 2
    while True:
        tag = _s.unpack("<H", bad[at : at + 2])[0]
        if tag == 259:
            bad[at + 8 : at + 10] = _s.pack("<H", 7)
            break
        at += 12
    with pytest.raises(ValueError, match="compression"):
        decode_tiff(bytes(bad))


# ---------------------------------------------------------------------------
# property test — same derandomized settings as the other codec suites

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_SETTINGS = dict(
    max_examples=25, deadline=None,
    suppress_health_check=[HealthCheck.too_slow], derandomize=True,
)


@settings(**_SETTINGS)
@given(
    w=st.integers(1, 40),
    h=st.integers(1, 40),
    comp=st.sampled_from([1, 32773, 5]),
    variant=st.integers(0, 3),
    bo=st.sampled_from(["II", "MM"]),
    strip_rows=st.integers(1, 40),
    seed=st.integers(0, 2**31 - 1),
)
def test_prop_tiff_roundtrip(w, h, comp, variant, bo, strip_rows, seed):
    rng = np.random.default_rng(seed)
    if variant == 0:  # RGB with predictor
        px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        blob = encode_tiff_ex(px, compression=comp, predictor=2,
                              byte_order=bo, rows_per_strip=strip_rows)
        assert np.array_equal(decode_tiff(blob), px)
    elif variant == 1:  # gray (either photometric)
        g = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
        blob = encode_tiff_ex(g, photometric=int(seed) % 2, compression=comp,
                              byte_order=bo, rows_per_strip=strip_rows)
        assert np.array_equal(decode_tiff(blob), np.repeat(g[..., None], 3, axis=2))
    elif variant == 2:  # bilevel
        bl = rng.integers(0, 2, size=(h, w), dtype=np.uint8)
        blob = encode_tiff_ex(bl, photometric=int(seed) % 2, bilevel=True,
                              compression=comp, byte_order=bo,
                              rows_per_strip=strip_rows)
        assert np.array_equal(
            decode_tiff(blob), np.repeat((bl * 255)[..., None], 3, axis=2)
        )
    else:  # palette
        pal = rng.integers(0, 256, size=(256, 3), dtype=np.uint8)
        idx = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
        blob = encode_tiff_ex(idx, photometric=3, palette=pal, compression=comp,
                              byte_order=bo, rows_per_strip=strip_rows)
        assert np.array_equal(decode_tiff(blob), pal[idx])
