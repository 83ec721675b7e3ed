"""Unit tests for the full PNG decoder (functions/pngcodec.py): all five
color types, bit depths 1..16, all five scanline filters, Adam7 interlace,
tRNS transparency. The encoder's vectorized filter math is the independent
inverse of the decoder's sequential reconstruction, so encode→decode
round-trips are differential, not self-referential."""

import struct
import zlib

import numpy as np
import pytest

from etlpy_spark.functions.imagecodec import decode, encode_png, render_pixels
from etlpy_spark.functions.pngcodec import decode_png, encode_png_ex


def _composited(rgb, alpha):
    a = alpha.astype(np.uint32)
    return ((rgb.astype(np.uint32) * a + 255 * (255 - a) + 127) // 255).astype(np.uint8)


def _grey3(g):
    return np.repeat(g[..., None], 3, axis=2)


def test_minimal_writer_compat_and_dispatch():
    px = render_pixels("img-000000000002")
    blob = encode_png(px)  # the byte-stable crawl writer
    assert np.array_equal(decode_png(blob), px)
    assert np.array_equal(decode(blob), px)  # imagecodec dispatch delegates


def test_rgb8_every_filter():
    px = render_pixels("img-000000000005")
    filters = [i % 5 for i in range(px.shape[0])]
    assert np.array_equal(decode_png(encode_png_ex(px, filters=filters)), px)


def test_rgb8_adam7_odd_dims():
    px = render_pixels("img-000000000005")[:37, :29]
    blob = encode_png_ex(px, interlace=True, filters=4)
    assert np.array_equal(decode_png(blob), px)


def test_grey_depths_1_2_4_8():
    rng = np.random.default_rng(3)
    for d in (1, 2, 4, 8):
        g = rng.integers(0, 1 << d, size=(23, 31), dtype=np.uint8)
        out = decode_png(encode_png_ex(g, color_type=0, bit_depth=d, filters=2))
        scaled = (g.astype(np.uint16) * 255 // ((1 << d) - 1)).astype(np.uint8)
        assert np.array_equal(out, _grey3(scaled)), f"depth {d}"


def test_sixteen_bit_narrows_to_high_byte():
    rng = np.random.default_rng(5)
    g16 = rng.integers(0, 65536, size=(9, 13), dtype=np.uint16)
    out = decode_png(encode_png_ex(g16, color_type=0, bit_depth=16, filters=3))
    assert np.array_equal(out, _grey3((g16 >> 8).astype(np.uint8)))
    rgb16 = rng.integers(0, 65536, size=(7, 11, 3), dtype=np.uint16)
    out = decode_png(encode_png_ex(rgb16, color_type=2, bit_depth=16, filters=4))
    assert np.array_equal(out, (rgb16 >> 8).astype(np.uint8))


def test_palette_trns_alpha_interlaced():
    rng = np.random.default_rng(11)
    pal = rng.integers(0, 256, size=(16, 3), dtype=np.uint8)
    idx = rng.integers(0, 16, size=(21, 17), dtype=np.uint8)
    alpha = rng.integers(0, 256, size=16, dtype=np.uint8)
    blob = encode_png_ex(idx, color_type=3, bit_depth=4, palette=pal,
                         trns=alpha, interlace=True)
    out = decode_png(blob)
    assert np.array_equal(out, _composited(pal[idx], alpha[idx][..., None]))


def test_palette_depth_1_packing():
    pal = np.array([(255, 0, 0), (0, 0, 255)], np.uint8)
    idx = (np.add.outer(np.arange(13), np.arange(9)) & 1).astype(np.uint8)
    out = decode_png(encode_png_ex(idx, color_type=3, bit_depth=1, palette=pal))
    assert np.array_equal(out, pal[idx])


def test_alpha_channels_composite_over_white():
    rng = np.random.default_rng(13)
    rgba = rng.integers(0, 256, size=(15, 19, 4), dtype=np.uint8)
    out = decode_png(encode_png_ex(rgba, color_type=6, filters=[4] * 15))
    assert np.array_equal(out, _composited(rgba[..., :3], rgba[..., 3:4]))
    ga = rng.integers(0, 256, size=(8, 11, 2), dtype=np.uint8)
    out = decode_png(encode_png_ex(ga, color_type=4, filters=1))
    assert np.array_equal(out, _composited(_grey3(ga[..., 0]), ga[..., 1:2]))


def test_color_key_transparency():
    px = render_pixels("img-000000000006")
    key = px[0, 0]
    blob = encode_png_ex(px, trns=struct.pack(">HHH", *[int(v) for v in key]))
    exp = px.copy()
    exp[(px == key).all(axis=2)] = 255
    assert np.array_equal(decode_png(blob), exp)
    g = px[:, :, 1]
    blob = encode_png_ex(g, color_type=0, trns=struct.pack(">H", int(g[0, 0])))
    exp = _grey3(g).copy()
    exp[g == g[0, 0]] = 255
    assert np.array_equal(decode_png(blob), exp)


def test_hostile_inputs_raise_valueerror():
    px = render_pixels("img-000000000007")
    good = encode_png_ex(px)
    with pytest.raises(ValueError, match="not a PNG"):
        decode_png(b"nope")
    # IHDR claiming a bigger image than IDAT carries
    big = bytearray(good)
    big[16:20] = struct.pack(">I", px.shape[1] * 4)  # 4x width
    with pytest.raises(ValueError, match="truncated"):
        decode_png(bytes(big))
    # corrupt deflate stream
    idat_at = good.index(b"IDAT")
    bad = good[: idat_at + 8] + b"\x00" * 8 + good[idat_at + 16 :]
    with pytest.raises(ValueError, match="corrupt|truncated"):
        decode_png(bad)
    # palette image without PLTE
    pal_blob = encode_png_ex(
        np.zeros((4, 4), np.uint8), color_type=3,
        palette=np.zeros((2, 3), np.uint8),
    )
    plte_at = pal_blob.index(b"PLTE")
    (plen,) = struct.unpack(">I", pal_blob[plte_at - 4 : plte_at])
    stripped = pal_blob[: plte_at - 4] + pal_blob[plte_at + 8 + plen :]
    with pytest.raises(ValueError, match="PLTE"):
        decode_png(stripped)
    # illegal header combos
    with pytest.raises(ValueError):
        encode_png_ex(np.zeros((4, 4), np.uint8), color_type=3, bit_depth=16,
                      palette=np.zeros((2, 3), np.uint8))
    with pytest.raises(ValueError):
        encode_png_ex(px, color_type=2, bit_depth=4)
    # bad filter byte in the stream
    gidat = good.index(b"IDAT")
    (glen,) = struct.unpack(">I", good[gidat - 4 : gidat])
    corrupt = bytearray(zlib.decompress(good[gidat + 4 : gidat + 4 + glen]))
    corrupt[0] = 9
    body = zlib.compress(bytes(corrupt))
    rebuilt = (
        good[: gidat - 4]
        + struct.pack(">I", len(body)) + b"IDAT" + body
        + struct.pack(">I", zlib.crc32(b"IDAT" + body) & 0xFFFFFFFF)
        + good[good.rindex(b"IEND") - 4 :]
    )
    with pytest.raises(ValueError, match="filter"):
        decode_png(rebuilt)


# ---------------------------------------------------------------------------
# property test — same derandomized settings as the other codec suites

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_SETTINGS = dict(
    max_examples=30, deadline=None,
    suppress_health_check=[HealthCheck.too_slow], derandomize=True,
)


@settings(**_SETTINGS)
@given(
    w=st.integers(1, 40),
    h=st.integers(1, 40),
    ctype=st.sampled_from([0, 2, 3, 4, 6]),
    depth_pick=st.integers(0, 4),
    interlace=st.booleans(),
    filter_seed=st.integers(0, 2**31 - 1),
    seed=st.integers(0, 2**31 - 1),
)
def test_prop_png_roundtrip_all_variants(w, h, ctype, depth_pick, interlace,
                                         filter_seed, seed):
    rng = np.random.default_rng(seed)
    depths = {0: (1, 2, 4, 8, 16), 2: (8, 16), 3: (1, 2, 4, 8),
              4: (8, 16), 6: (8, 16)}[ctype]
    depth = depths[depth_pick % len(depths)]
    ch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[ctype]
    hi = (1 << depth) if depth < 8 else (65536 if depth == 16 else 256)
    dt = np.uint16 if depth == 16 else np.uint8
    shape = (h, w) if ch == 1 else (h, w, ch)
    px = rng.integers(0, hi, size=shape, dtype=dt)
    pal = rng.integers(0, 256, size=(min(hi, 256), 3), dtype=np.uint8) if ctype == 3 else None
    n_rows = sum(
        1
        for x0, y0, dx, dy in
        ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
         (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))
        for _ in range(((h - y0 + dy - 1) // dy) if (w - x0 + dx - 1) // dx > 0 else 0)
    ) if interlace else h
    frng = np.random.default_rng(filter_seed)
    filters = [int(f) for f in frng.integers(0, 5, size=n_rows)]
    blob = encode_png_ex(px, color_type=ctype, bit_depth=depth, palette=pal,
                         interlace=interlace, filters=filters)
    out = decode_png(blob)

    # expected expansion computed directly from the source samples
    if ctype == 3:
        exp = pal[px]
    else:
        s = (px >> 8).astype(np.uint8) if depth == 16 else px
        if ctype == 0:
            g = (s.astype(np.uint16) * 255 // ((1 << depth) - 1)).astype(np.uint8) \
                if depth < 8 else s
            exp = _grey3(g)
        elif ctype == 2:
            exp = s
        elif ctype == 4:
            exp = _composited(_grey3(s[..., 0]), s[..., 1:2])
        else:
            exp = _composited(s[..., :3], s[..., 3:4])
    assert out.shape == (h, w, 3)
    assert np.array_equal(out, exp)
