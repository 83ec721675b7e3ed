"""Unit tests for the BMP codec (functions/bmpcodec.py): palette/16/24/32
bit depths, BI_BITFIELDS masks, RLE8, top-down rows, stride padding."""

import struct

import numpy as np
import pytest

from etlpy_spark.functions.bmpcodec import decode_bmp, encode_bmp, encode_bmp_ex
from etlpy_spark.functions.imagecodec import decode, render_pixels, sniff_format


def test_24bit_roundtrip_both_row_orders_and_dispatch():
    px = render_pixels("img-000000000009")
    blob = encode_bmp(px)
    assert sniff_format(blob) == "bmp"
    assert np.array_equal(decode_bmp(blob), px)
    assert np.array_equal(decode(blob), px)  # imagecodec dispatch
    assert np.array_equal(decode_bmp(encode_bmp_ex(px, top_down=True)), px)


def test_32bit_bgrx_and_bitfields():
    px = render_pixels("img-000000000010")
    assert np.array_equal(decode_bmp(encode_bmp_ex(px, bpp=32)), px)
    blob = encode_bmp_ex(px, bpp=32, masks=(0xFF0000, 0x00FF00, 0x0000FF))
    assert np.array_equal(decode_bmp(blob), px)


def test_16bit_555_and_565_quantization_bounded():
    px = render_pixels("img-000000000011")
    for masks in (None, (0xF800, 0x07E0, 0x001F)):
        out = decode_bmp(encode_bmp_ex(px, bpp=16, masks=masks))
        assert np.abs(out.astype(int) - px.astype(int)).max() <= 9  # 5-bit step


def test_paletted_depths_with_stride_padding():
    rng = np.random.default_rng(3)
    for bpp in (1, 4, 8):
        n = 1 << bpp
        pal = rng.integers(0, 256, size=(n, 3), dtype=np.uint8)
        idx = rng.integers(0, n, size=(13, 21), dtype=np.uint8)  # odd width
        out = decode_bmp(encode_bmp_ex(idx, bpp=bpp, palette=pal))
        assert np.array_equal(out, pal[idx]), f"bpp {bpp}"


def test_rle8_runs_absolute_mode_and_compression():
    rng = np.random.default_rng(5)
    pal = rng.integers(0, 256, size=(256, 3), dtype=np.uint8)
    # long runs (encoded mode) next to noise (absolute mode)
    idx = np.concatenate(
        [np.full((9, 30), 7, np.uint8), rng.integers(0, 256, (9, 11), dtype=np.uint8)],
        axis=1,
    )
    blob = encode_bmp_ex(idx, bpp=8, palette=pal, rle=True)
    assert np.array_equal(decode_bmp(blob), pal[idx])
    assert len(blob) < len(encode_bmp_ex(idx, bpp=8, palette=pal))  # runs pay off


def test_rle8_delta_escape():
    """Hand-built stream using the 0x00 0x02 delta escape: skipped pixels
    stay at palette entry 0."""
    pal = np.array([(9, 9, 9), (255, 0, 0), (0, 255, 0)], np.uint8)
    # 4x6, bottom-up: row0 = two red, delta right 2 / up 1, three green
    rle = bytes((2, 1, 0, 2, 2, 1, 3, 2, 0, 0, 0, 1))
    tbl = np.zeros((256, 4), np.uint8)
    tbl[:3, :3] = pal[:, ::-1]
    info = struct.pack("<IiihHIIiiII", 40, 6, 4, 1, 8, 1, len(rle), 0, 0, 256, 0)
    off = 14 + 40 + 1024
    blob = struct.pack("<2sIHHI", b"BM", off + len(rle), 0, 0, off) + info + tbl.tobytes() + rle
    out = decode_bmp(blob)
    exp = np.tile(pal[0], (4, 6, 1))
    exp[3, 0:2] = pal[1]  # bottom row (stored first)
    exp[2, 4:6] = pal[2]  # delta lands at x=4, one row up; 3rd pixel clips
    assert np.array_equal(out, exp)


def test_bitmapcoreheader():
    """The 12-byte OS/2 core header: 16-bit dims, 3-byte palette entries."""
    px = render_pixels("img-000000000012")[:10, :7]
    h, w = px.shape[:2]
    stride = ((w * 24 + 31) // 32) * 4
    rows = np.zeros((h, stride), np.uint8)
    rows[:, : w * 3] = px[..., ::-1].reshape(h, w * 3)
    body = rows[::-1].tobytes()
    core = struct.pack("<IHHHH", 12, w, h, 1, 24)
    off = 14 + 12
    blob = struct.pack("<2sIHHI", b"BM", off + len(body), 0, 0, off) + core + body
    assert np.array_equal(decode_bmp(blob), px)


def test_hostile_inputs_raise_valueerror():
    px = render_pixels("img-000000000013")
    with pytest.raises(ValueError, match="not a BMP"):
        decode_bmp(b"nope")
    good = encode_bmp(px)
    with pytest.raises(ValueError, match="truncated"):
        decode_bmp(good[: len(good) // 2])
    bad_bpp = bytearray(good)
    bad_bpp[28:30] = struct.pack("<H", 13)
    with pytest.raises(ValueError, match="bit depth"):
        decode_bmp(bytes(bad_bpp))
    bad_comp = bytearray(good)
    bad_comp[30:34] = struct.pack("<I", 4)  # BI_JPEG
    with pytest.raises(ValueError, match="compression"):
        decode_bmp(bytes(bad_comp))
    with pytest.raises(ValueError, match="range"):
        encode_bmp_ex(np.full((4, 4), 20, np.uint8), bpp=4,
                      palette=np.zeros((16, 3), np.uint8))


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
    variant=st.integers(0, 6),
    top_down=st.booleans(),
    seed=st.integers(0, 2**31 - 1),
)
def test_prop_bmp_roundtrip(w, h, variant, top_down, seed):
    rng = np.random.default_rng(seed)
    if variant <= 2:  # paletted 1/4/8
        bpp = (1, 4, 8)[variant]
        n = 1 << bpp
        pal = rng.integers(0, 256, size=(n, 3), dtype=np.uint8)
        idx = rng.integers(0, n, size=(h, w), dtype=np.uint8)
        blob = encode_bmp_ex(idx, bpp=bpp, palette=pal, top_down=top_down)
        assert np.array_equal(decode_bmp(blob), pal[idx])
    elif variant == 3:  # RLE8 (bottom-up only)
        pal = rng.integers(0, 256, size=(256, 3), dtype=np.uint8)
        idx = rng.integers(0, 4, size=(h, w), dtype=np.uint8) * 63
        blob = encode_bmp_ex(idx, bpp=8, palette=pal, rle=True)
        assert np.array_equal(decode_bmp(blob), pal[idx])
    else:
        px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        if variant == 4:
            blob = encode_bmp_ex(px, bpp=24, top_down=top_down)
            assert np.array_equal(decode_bmp(blob), px)
        elif variant == 5:
            blob = encode_bmp_ex(px, bpp=32, top_down=top_down)
            assert np.array_equal(decode_bmp(blob), px)
        else:  # 16-bit 565
            blob = encode_bmp_ex(px, bpp=16, top_down=top_down,
                                 masks=(0xF800, 0x07E0, 0x001F))
            out = decode_bmp(blob)
            assert np.abs(out.astype(int) - px.astype(int)).max() <= 9


# ---------------------------------------------------------------------------
# ICO — the favicon container (BMP DIBs or PNGs inside)


def test_ico_dib_and_png_entries():
    import struct as _s

    from etlpy_spark.functions.bmpcodec import decode_ico, encode_ico

    px16 = render_pixels("img-000000000040")[:16, :16]
    px32 = render_pixels("img-000000000041")[:32, :32]
    for png in (False, True):
        ico = encode_ico([px16, px32], png=png)
        assert sniff_format(ico) == "ico"
        out = decode_ico(ico)  # largest entry wins
        assert np.array_equal(out, px32), png
        assert np.array_equal(decode(ico), px32)  # imagecodec dispatch
    # width/height byte 0 means 256
    big = np.tile(px32, (8, 8, 1))
    assert np.array_equal(decode_ico(encode_ico([big])), big)


def test_ico_and_mask_transparency():
    import struct as _s

    from etlpy_spark.functions.bmpcodec import decode_ico, encode_ico

    px16 = render_pixels("img-000000000042")[:16, :16]
    ico = bytearray(encode_ico([px16]))
    size, off = _s.unpack("<II", ico[14:22])
    xor = ((16 * 24 + 31) // 32) * 4 * 16
    ico[off + 40 + xor] = 0x80  # top-left bit of the bottom-up first row
    out = decode_ico(bytes(ico))
    assert (out[15, 0] == 255).all()  # masked pixel -> white
    assert np.array_equal(out[0], px16[0])  # rest untouched


def test_ico_hostile_inputs():
    from etlpy_spark.functions.bmpcodec import decode_ico, encode_ico

    with pytest.raises(ValueError, match="not an ICO"):
        decode_ico(b"xx")
    with pytest.raises(ValueError, match="no images"):
        decode_ico(b"\x00\x00\x01\x00\x00\x00")
    with pytest.raises(ValueError, match="1..256"):
        encode_ico([np.zeros((300, 16, 3), np.uint8)])
