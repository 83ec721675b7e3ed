"""Unit tests for the from-scratch baseline JPEG codec (functions/jpegcodec.py).

The codec backs the image table's genuinely-lossy ``jpg`` format
(reference spider.py:303-314 sniffs jpg by magic bytes first — it is the
format a real image crawl overwhelmingly sees), so the north rule's
PSNR ≥ 40 dB per-row invariant runs against real quantized-DCT loss.
"""

import numpy as np
import pytest

from etlpy_spark.functions import imagecodec as ic
from etlpy_spark.functions.jpegcodec import decode_jpeg, encode_jpeg, quant_tables


def _psnr(a, b):
    return ic.psnr(a, b)


def test_roundtrip_shapes_and_padding():
    """Non-multiple-of-8 dims must round-trip at the declared size (the
    8x8 block padding is encoder-internal)."""
    rng = np.random.default_rng(7)
    for h, w in [(8, 8), (16, 24), (17, 23), (100, 37), (1, 1), (3, 200)]:
        px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        out = decode_jpeg(encode_jpeg(px, quality=92))
        assert out.shape == px.shape and out.dtype == np.uint8


def test_stuffed_ff_before_rstlike_byte_regression():
    """Regression: RST-marker splitting must happen on the STUFFED stream.
    This exact payload (seed 5, 29x33, q92) produces an entropy segment
    containing FF 00 Dn — a stuffed data 0xFF followed by a 0xD0..0xD7
    data byte; destuffing first exposed it as a phantom RST marker and
    mis-split the scan ('entropy truncated')."""
    rng = np.random.default_rng(5)
    h, w = int(rng.integers(8, 40)), int(rng.integers(8, 40))
    assert (h, w) == (29, 33)
    px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    data = encode_jpeg(px, quality=92)
    raw = data[data.index(b"\xff\xda") :]
    assert any(
        raw[i : i + 2] == b"\xff\x00" and 0xD0 <= raw[i + 2] <= 0xD7
        for i in range(len(raw) - 3)
    ), "fixture no longer triggers the stuffed-FF/RST ambiguity"
    out = decode_jpeg(data)
    assert out.shape == px.shape


def test_fixture_images_clear_40db_at_q96():
    """The image-table wrapper quality (96) must keep EVERY fixture image
    over the north rule's 40 dB lossy gate — q92 measures 37.6 dB on the
    worst one, which is why the wrapper pins 96."""
    worst = float("inf")
    for i in range(40):
        px = ic.render_pixels(f"img-{i}", 42, 1)
        got = decode_jpeg(encode_jpeg(px, quality=96))
        p = _psnr(px, got)
        worst = min(worst, p)
        assert p >= 40.0, (i, p)
    assert worst < float("inf")  # genuinely lossy, not a bit-exact copy


def test_quality_monotone_and_tables():
    qy50, qc50 = quant_tables(50)
    qy90, qc90 = quant_tables(90)
    assert (qy90 <= qy50).all() and (qc90 <= qc50).all() and qy90.min() >= 1
    px = ic.render_pixels("img-3", 42, 1)
    p_lo = _psnr(px, decode_jpeg(encode_jpeg(px, quality=60)))
    p_hi = _psnr(px, decode_jpeg(encode_jpeg(px, quality=95)))
    assert p_hi > p_lo


def test_restart_markers_decode_identically():
    """DRI/RSTn streams (what real encoders emit) must decode to the same
    pixels as the marker-free stream, across RST0..7 wraparound."""
    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, (40, 72, 3), dtype=np.uint8)  # 45 MCUs
    base = decode_jpeg(encode_jpeg(px, quality=88))
    for ri in (1, 2, 7, 16):
        data = encode_jpeg(px, quality=88, restart_interval=ri)
        assert b"\xff\xdd" in data
        assert np.array_equal(decode_jpeg(data), base)


def test_unsupported_streams_rejected_not_misdecoded():
    px = np.zeros((16, 16, 3), dtype=np.uint8)
    data = bytearray(encode_jpeg(px, quality=90))
    sof = data.index(b"\xff\xc0")
    # a baseline scan under an SOF2 header is structurally CORRUPT
    # progressive (Ss=0, Se=63) — must raise, not garbage-decode
    prog = bytes(data[:sof]) + b"\xff\xc2" + bytes(data[sof + 2 :])
    with pytest.raises(ValueError, match="mixes DC and AC"):
        decode_jpeg(prog)
    # genuinely unsupported SOFs (arithmetic-coded SOF9) still reject
    arith = bytes(data[:sof]) + b"\xff\xc9" + bytes(data[sof + 2 :])
    with pytest.raises(NotImplementedError, match="progressive"):
        decode_jpeg(arith)
    # illegal sampling factors (0 or >4) must raise, not wrap/garbage
    sub = bytearray(data)
    sub[sof + 11] = 0x50  # first component h=5, v=0
    with pytest.raises(ValueError, match="sampling"):
        decode_jpeg(bytes(sub))
    # truncated entropy data must raise cleanly (use a noisy payload so
    # the entropy segment is long enough that -200 bytes stays inside it)
    noisy = encode_jpeg(
        np.random.default_rng(0).integers(0, 256, (32, 32, 3), dtype=np.uint8),
        quality=95,
    )
    assert len(noisy) > 400
    with pytest.raises(ValueError):
        decode_jpeg(noisy[: len(noisy) - 200] + b"\xff\xd9")
    with pytest.raises(ValueError):
        decode_jpeg(b"\x89PNG")


def test_420_chroma_subsampling_roundtrip():
    """4:2:0 — the layout real web JPEGs use — must round-trip at the
    declared size for every dim parity (16-multiple, odd, tiny), decode
    identically with and without restart markers (interval counts MCUs,
    not blocks), and degrade only chroma: on grayscale content 4:2:0
    matches 4:4:4; on high-chroma-frequency fixtures it lands ~27 dB
    (which is WHY the image-table wrapper stays 4:4:4 — same story as
    Y4M C420, tests/test_mediacodec.py)."""
    rng = np.random.default_rng(13)
    for h, w in [(16, 16), (17, 23), (100, 37), (1, 1), (3, 200)]:
        px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        out = decode_jpeg(encode_jpeg(px, quality=90, subsampling="420"))
        assert out.shape == px.shape
    px = rng.integers(0, 256, (48, 80, 3), dtype=np.uint8)
    base = decode_jpeg(encode_jpeg(px, quality=85, subsampling="420"))
    for ri in (1, 3, 5):
        data = encode_jpeg(px, quality=85, subsampling="420", restart_interval=ri)
        assert np.array_equal(decode_jpeg(data), base)
    # grayscale content: chroma planes are constant → 420 == 444 quality
    g = ((np.mgrid[0:64, 0:96].sum(axis=0)) * 255 // 160).astype(np.uint8)
    gray = np.stack([g, g, g], axis=-1)
    p444 = _psnr(gray, decode_jpeg(encode_jpeg(gray, quality=92)))
    p420 = _psnr(gray, decode_jpeg(encode_jpeg(gray, quality=92, subsampling="420")))
    assert abs(p444 - p420) < 1.0 and p420 >= 40.0
    # chroma-heavy fixture: 420 must be clearly lossier than 444
    fix = ic.render_pixels("img-3", 42, 1)
    assert _psnr(fix, decode_jpeg(encode_jpeg(fix, quality=92, subsampling="420"))) \
        < _psnr(fix, decode_jpeg(encode_jpeg(fix, quality=92))) - 5.0
    with pytest.raises(ValueError, match="subsampling"):
        encode_jpeg(px, subsampling="422")


def test_imagecodec_integration_sniff_encode_decode():
    """force_fmt='jpg' flows through the image-table codec surface the
    crawl uses: spec → bytes → sniff → decode, PSNR over the gate."""
    for i in range(6):
        iid = f"img-{i:012d}"
        w, h, fmt = ic.image_spec(iid, 42, 1, force_fmt="jpg")
        assert fmt == "jpg"
        data = ic.image_bytes(iid, 42, 1, force_fmt="jpg")
        assert ic.sniff_format(data) == "jpg"
        px = ic.decode(data)
        orig = ic.render_pixels(iid, 42, 1)
        assert px.shape == orig.shape == (h, w, 3)
        p = _psnr(px, orig)
        assert p != float("inf") and p >= 40.0


# ---------------------------------------------------------------------------
# property tests: arbitrary payloads must round-trip structurally (noise is
# the DCT worst case — PSNR is low there by design, but decode must always
# succeed and agree in shape)

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    w=st.integers(1, 48), h=st.integers(1, 48),
    q=st.integers(1, 100), seed=st.integers(0, 2**31),
)
def test_prop_roundtrip_any_payload(w, h, q, seed):
    px = np.random.default_rng(seed).integers(0, 256, (h, w, 3), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(px, quality=q))
    assert out.shape == px.shape and out.dtype == np.uint8


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(ri=st.integers(1, 20), seed=st.integers(0, 2**31))
def test_prop_restart_interval_pixel_exact(ri, seed):
    rng = np.random.default_rng(seed)
    h, w = int(rng.integers(8, 64)), int(rng.integers(8, 64))
    px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    a = decode_jpeg(encode_jpeg(px, quality=85))
    b = decode_jpeg(encode_jpeg(px, quality=85, restart_interval=ri))
    assert np.array_equal(a, b)


def test_grayscale_single_component_roundtrip():
    """1-component (grayscale) streams — the other scan shape real web
    JPEGs use. decode_jpeg replicates the luma plane to HxWx3; restart
    markers behave identically to the 3-component path."""
    rng = np.random.default_rng(4)
    for h, w in [(8, 8), (17, 23), (100, 37), (1, 1)]:
        g = rng.integers(0, 256, (h, w), dtype=np.uint8)
        out = decode_jpeg(encode_jpeg(g, quality=92))
        assert out.shape == (h, w, 3)
        assert np.array_equal(out[..., 0], out[..., 1])
        assert np.array_equal(out[..., 0], out[..., 2])
    yy, xx = np.mgrid[0:64, 0:96]
    g = ((xx + yy) * 255 // 160).astype(np.uint8)
    dec = decode_jpeg(encode_jpeg(g, quality=92))
    assert _psnr(np.stack([g] * 3, -1), dec) >= 40.0
    g2 = rng.integers(0, 256, (40, 72), dtype=np.uint8)
    base = decode_jpeg(encode_jpeg(g2, quality=88))
    for ri in (1, 3, 7):
        data = encode_jpeg(g2, quality=88, restart_interval=ri)
        assert np.array_equal(decode_jpeg(data), base)


def _encode_3scan(px, quality=92):
    """Re-emit a 4:4:4 image as THREE single-component baseline scans
    (one SOS per component — legal per T.81 A.2.2 and produced by some
    encoders). Same tables/coefficients as encode_jpeg(subsampling='444'),
    so a correct decoder must reconstruct identical pixels."""
    import struct

    from etlpy_spark.functions import jpegcodec as jc

    qy, qc = quant_tables(quality)
    ycc = jc._rgb_to_ycbcr(px)
    h, w = px.shape[:2]
    comps = [
        jc._fdct_quant(ycc[..., 0], qy),
        jc._fdct_quant(ycc[..., 1], qc),
        jc._fdct_quant(ycc[..., 2], qc),
    ]
    out = bytearray()
    out += b"\xff\xd8"
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" \
        + struct.pack(">HH", 1, 1) + b"\x00\x00"
    for tid, qt in ((0, qy), (1, qc)):
        out += b"\xff\xdb" + struct.pack(">HB", 67, tid)
        out += bytes(int(v) for v in qt.reshape(64)[jc._ZZ])
    out += b"\xff\xc0" + struct.pack(">HBHHB", 17, 8, h, w, 3)
    for (cid, tq), hv in zip(((1, 0), (2, 1), (3, 1)), (0x11, 0x11, 0x11)):
        out += struct.pack(">BBB", cid, hv, tq)
    for tc_th, bits, vals in (
        (0x00, jc._DC_LUMA_BITS, jc._DC_LUMA_VALS),
        (0x10, jc._AC_LUMA_BITS, jc._AC_LUMA_VALS),
        (0x01, jc._DC_CHROMA_BITS, jc._DC_CHROMA_VALS),
        (0x11, jc._AC_CHROMA_BITS, jc._AC_CHROMA_VALS),
    ):
        out += b"\xff\xc4" + struct.pack(">HB", 19 + len(vals), tc_th)
        out += bytes(bits) + bytes(vals)
    for ci, (cid, tables) in enumerate(((1, 0x00), (2, 0x11), (3, 0x11))):
        out += b"\xff\xda" + struct.pack(">HB", 8, 1)
        out += struct.pack(">BB", cid, tables)
        out += b"\x00\x3f\x00"
        wtr = jc._BitWriter()
        pred = 0
        t = 0 if ci == 0 else 1
        for b in range(comps[ci].shape[0]):
            pred = jc._encode_block(
                wtr, comps[ci][b], pred, jc._ENC_DC[t], jc._ENC_AC[t]
            )
        out += wtr.flush()
    out += b"\xff\xd9"
    return bytes(out)


def test_multi_scan_non_interleaved_decodes_exactly():
    """A legal baseline JPEG with one SOS per component must decode to the
    SAME pixels as the interleaved emission of the same coefficients —
    regression: the decoder used to keep only the LAST scan, silently
    zeroing the other two planes."""
    rng = np.random.default_rng(11)
    for h, w in [(16, 16), (17, 23), (40, 72)]:
        px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        interleaved = decode_jpeg(encode_jpeg(px, quality=92))
        multi = decode_jpeg(_encode_3scan(px, quality=92))
        assert np.array_equal(interleaved, multi)


def test_dht_redefinition_between_scans():
    """A legal multi-scan baseline file may REDEFINE a DHT slot between
    scans; each scan must decode with the tables in effect at ITS SOS —
    regression: tables were resolved from the final parse state, decoding
    earlier scans with later tables (garbage or spurious Huffman errors).
    Here every scan uses slot 0, redefined luma→chroma after scan 1."""
    import struct

    from etlpy_spark.functions import jpegcodec as jc

    rng = np.random.default_rng(13)
    px = rng.integers(0, 256, (24, 24, 3), dtype=np.uint8)
    quality = 92
    qy, qc = quant_tables(quality)
    ycc = jc._rgb_to_ycbcr(px)
    h, w = px.shape[:2]
    comps = [
        jc._fdct_quant(ycc[..., 0], qy),
        jc._fdct_quant(ycc[..., 1], qc),
        jc._fdct_quant(ycc[..., 2], qc),
    ]
    out = bytearray()
    out += b"\xff\xd8"
    for tid, qt in ((0, qy), (1, qc)):
        out += b"\xff\xdb" + struct.pack(">HB", 67, tid)
        out += bytes(int(v) for v in qt.reshape(64)[jc._ZZ])
    out += b"\xff\xc0" + struct.pack(">HBHHB", 17, 8, h, w, 3)
    for cid, tq in ((1, 0), (2, 1), (3, 1)):
        out += struct.pack(">BBB", cid, 0x11, tq)

    def dht(tc_th, bits, vals):
        return (
            b"\xff\xc4" + struct.pack(">HB", 19 + len(vals), tc_th)
            + bytes(bits) + bytes(vals)
        )

    tables = (
        (jc._DC_LUMA_BITS, jc._DC_LUMA_VALS, jc._AC_LUMA_BITS, jc._AC_LUMA_VALS),
        (jc._DC_CHROMA_BITS, jc._DC_CHROMA_VALS, jc._AC_CHROMA_BITS, jc._AC_CHROMA_VALS),
    )
    for ci, cid in enumerate((1, 2, 3)):
        t = 0 if ci == 0 else 1
        if ci < 2:  # define/REdefine slot 0 before scans 1 and 2
            db, dv, ab, av = tables[t]
            out += dht(0x00, db, dv) + dht(0x10, ab, av)
        out += b"\xff\xda" + struct.pack(">HB", 8, 1)
        out += struct.pack(">BB", cid, 0x00)  # every scan: slot 0
        out += b"\x00\x3f\x00"
        wtr = jc._BitWriter()
        pred = 0
        for b in range(comps[ci].shape[0]):
            pred = jc._encode_block(
                wtr, comps[ci][b], pred, jc._ENC_DC[t], jc._ENC_AC[t]
            )
        out += wtr.flush()
    out += b"\xff\xd9"
    got = decode_jpeg(bytes(out))
    exp = decode_jpeg(encode_jpeg(px, quality=quality))
    assert np.array_equal(got, exp)


def test_quality100_adversarial_block_encodes():
    """At quality 100 the quant tables are all 1s; quantized AC magnitudes
    clamp to +-1023 (category <= 10, libjpeg-compatible) so Annex K AC
    encoding can never see category 11 — regression: a bare KeyError.
    Worst-case inputs: every DCT basis function thresholded to {0, 255},
    tiled across the image, plus the clamp bound itself."""
    from etlpy_spark.functions import jpegcodec as jc

    assert int(np.abs(jc._fdct_quant(
        np.where(np.outer(jc._DCT8[0], jc._DCT8[4]) > 0, 255.0, 0.0),
        np.ones((8, 8), dtype=np.int32),
    )).max()) <= 1023
    for u, v in ((0, 4), (4, 0), (4, 4), (7, 7), (0, 1)):
        basis = np.outer(jc._DCT8[u], jc._DCT8[v])
        blk = np.where(basis > 0, 255, 0).astype(np.uint8)
        px = np.stack([np.tile(blk, (3, 3))] * 3, axis=-1)
        out = decode_jpeg(encode_jpeg(px, quality=100))  # must not raise
        assert out.shape == px.shape


def test_progressive_roundtrip_matches_baseline():
    """encode_jpeg(progressive=True) emits the SAME quantized coefficients
    through the SOF2 scan script (spectral selection + one successive-
    approximation level + per-scan optimal Huffman tables), so progressive
    decode must reproduce the baseline decode EXACTLY — color 4:4:4 and
    4:2:0, grayscale, odd sizes."""
    rng = np.random.default_rng(21)
    for h, w in [(8, 8), (16, 16), (17, 23), (40, 72), (64, 96)]:
        px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        base = decode_jpeg(encode_jpeg(px, quality=92))
        prog = decode_jpeg(encode_jpeg(px, quality=92, progressive=True))
        assert np.array_equal(base, prog), (h, w)
    g = rng.integers(0, 256, (24, 40), dtype=np.uint8)
    assert np.array_equal(
        decode_jpeg(encode_jpeg(g, quality=88)),
        decode_jpeg(encode_jpeg(g, quality=88, progressive=True)),
    )
    for h, w in [(32, 32), (34, 50), (17, 33)]:
        px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        assert np.array_equal(
            decode_jpeg(encode_jpeg(px, quality=85, subsampling="420")),
            decode_jpeg(encode_jpeg(px, quality=85, subsampling="420",
                                    progressive=True)),
        ), (h, w, "420")


def test_progressive_eob_runs_refinement_and_extremes():
    """Content shapes that stress each progressive code path: flat images
    (maximal EOB runs), a single spike (sparse AC + ZRL), gradients (many
    small coefficients -> refinement correction bits), and quality
    extremes including 100 (all-1 quant tables)."""
    for h, w in [(64, 64), (72, 88)]:
        px = np.full((h, w, 3), 128, dtype=np.uint8)
        px[h // 2, w // 2] = 255
        assert np.array_equal(
            decode_jpeg(encode_jpeg(px, quality=50, progressive=True)),
            decode_jpeg(encode_jpeg(px, quality=50)),
        )
    yy, xx = np.mgrid[0:48, 0:80]
    g = ((xx * 3 + yy * 5) % 256).astype(np.uint8)
    px = np.stack([g, 255 - g, (g.astype(int) * 7 % 256).astype(np.uint8)], -1)
    assert np.array_equal(
        decode_jpeg(encode_jpeg(px, quality=92, progressive=True)),
        decode_jpeg(encode_jpeg(px, quality=92)),
    )
    rng = np.random.default_rng(33)
    px = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    for q in (15, 75, 100):
        assert np.array_equal(
            decode_jpeg(encode_jpeg(px, quality=q, progressive=True)),
            decode_jpeg(encode_jpeg(px, quality=q)),
        ), q
    with pytest.raises(ValueError, match="restart"):
        encode_jpeg(px, progressive=True, restart_interval=8)


def test_scans_must_cover_all_components():
    """A multi-scan file missing a component's scan is corrupt — reject,
    never return a half-decoded image."""
    rng = np.random.default_rng(12)
    px = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    data = _encode_3scan(px)
    # drop the final scan: truncate at the last SOS marker, keep EOI
    last_sos = data.rfind(b"\xff\xda")
    with pytest.raises(ValueError, match="cover all"):
        decode_jpeg(data[:last_sos] + b"\xff\xd9")


def test_fill_bytes_before_markers_are_skipped():
    """T.81 B.1.1.2 allows 0xFF fill bytes before any marker; they must
    not desync the marker walk (regression: a fill byte before SOF0 made
    the parser read a bogus segment length and skip ~64 KB)."""
    rng = np.random.default_rng(13)
    px = rng.integers(0, 256, (24, 32, 3), dtype=np.uint8)
    data = encode_jpeg(px, quality=90)
    base = decode_jpeg(data)
    sof = data.find(b"\xff\xc0")
    for n_fill in (1, 3):
        padded = data[:sof] + b"\xff" * n_fill + data[sof:]
        assert np.array_equal(decode_jpeg(padded), base)


# ---------------------------------------------------------------------------
# EXIF orientation


def test_exif_orientation_all_eight_both_byte_orders():
    """A spliced APP1 segment must round-trip every orientation value in
    both TIFF byte orders, and the imagecodec dispatch must decode to the
    DISPLAY orientation (the reference transform computed in numpy here)."""
    from etlpy_spark.functions.jpegcodec import (
        apply_orientation, exif_orientation, insert_exif_orientation,
    )

    px = ic.render_pixels("img-5", 42, 1)
    plain = encode_jpeg(px, quality=96)
    base = decode_jpeg(plain)
    assert exif_orientation(plain) == 1
    for bo in ("II", "MM"):
        for o in range(1, 9):
            tagged = insert_exif_orientation(plain, o, byte_order=bo)
            assert exif_orientation(tagged) == o, (bo, o)
            # the pure codec never rotates; the image dispatch does
            assert np.array_equal(decode_jpeg(tagged), base)
            got = ic.decode(tagged)
            exp = apply_orientation(base, o)
            assert got.shape == exp.shape and np.array_equal(got, exp), (bo, o)


def test_exif_orientation_inverse_pairs():
    """Orientations 6 and 8 are inverse rotations; 5 and 7 are the two
    diagonal flips (each self-inverse). Pins the transform directions —
    the classic off-by-one is swapping CW/CCW."""
    from etlpy_spark.functions.jpegcodec import apply_orientation

    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, (5, 9, 3), dtype=np.uint8)
    assert np.array_equal(apply_orientation(apply_orientation(px, 6), 8), px)
    assert np.array_equal(apply_orientation(apply_orientation(px, 5), 5), px)
    assert np.array_equal(apply_orientation(apply_orientation(px, 7), 7), px)
    # 6 = rot90 CW: the top-left pixel lands on the top-right
    assert np.array_equal(apply_orientation(px, 6)[0, -1], px[0, 0])


def test_exif_hostile_segments_never_raise():
    from etlpy_spark.functions.jpegcodec import exif_orientation, insert_exif_orientation

    px = ic.render_pixels("img-6", 42, 1)
    plain = encode_jpeg(px, quality=92)
    tagged = insert_exif_orientation(plain, 6)
    app1 = tagged.index(b"\xff\xe1")
    # truncate inside the TIFF header
    assert exif_orientation(tagged[: app1 + 12] + plain[2:]) == 1
    # corrupt byte-order mark
    bad = bytearray(tagged)
    bad[app1 + 10 : app1 + 12] = b"ZZ"
    assert exif_orientation(bytes(bad)) == 1
    # orientation value out of range -> 1
    assert exif_orientation(insert_exif_orientation(plain, 8).replace(
        b"\x12\x01\x03\x00\x01\x00\x00\x00\x08\x00", 
        b"\x12\x01\x03\x00\x01\x00\x00\x00\x63\x00", 1)) == 1
    assert exif_orientation(b"\x00\x01") == 1
