"""Unit tests for the from-scratch GIF codec (functions/gifcodec.py) and the
AVI/MJPEG muxer/demuxer (functions/mediacodec.py) — the two entropy-coded
media containers added for the crawl path (reference spider.py:303-314 names
gif explicitly in GetImageFormat)."""

import numpy as np
import pytest

import etlpy_spark.functions.gifcodec as gifcodec
from etlpy_spark.functions.gifcodec import (
    GifFrame,
    decode_gif,
    decode_gif_image,
    encode_gif,
    encode_gif_frames,
    encode_gif_image,
    iter_gif_frames,
    lzw_compress,
    lzw_decompress,
    palette_quantize,
)
from etlpy_spark.functions.imagecodec import (
    decode,
    encode,
    psnr,
    render_pixels,
    sniff_format,
)
from etlpy_spark.functions.mediacodec import (
    encode_avi_mjpeg,
    iter_avi_mjpeg_frames,
    sniff_media,
)


def _paletted(h=40, w=56, shift=0, seed=11):
    """An RGB frame with few unique colors (exact-palette GIF path)."""
    rng = np.random.default_rng(seed)
    tiles = rng.integers(0, 6, size=(h // 8 + 1, w // 8 + 1), dtype=np.uint8)
    pal = np.array(
        [(255, 0, 0), (0, 255, 0), (0, 0, 255), (255, 255, 0), (0, 0, 0), (200, 130, 40)],
        dtype=np.uint8,
    )
    px = pal[np.kron(tiles, np.ones((8, 8), dtype=np.uint8))[:h, :w]]
    return np.roll(px, shift, axis=1)


def _smooth_frames(n):
    base = render_pixels("img-000000000000")
    h, w = base.shape[0] & ~1, base.shape[1] & ~1
    return [np.roll(base[:h, :w], 3 * j, axis=1) for j in range(n)]


# ---------------------------------------------------------------------------
# LZW


def test_lzw_roundtrip_all_code_sizes():
    rng = np.random.default_rng(5)
    for mcs in (2, 3, 5, 8):
        seq = rng.integers(0, 1 << mcs, size=3000, dtype=np.uint8)
        assert lzw_decompress(lzw_compress(seq, mcs), mcs) == seq.tobytes()


def test_lzw_kwkwk_first_use_code():
    # "ababab..." makes the decoder hit code == len(table) (the cScSc case)
    seq = np.array([0, 1] * 40, dtype=np.uint8)
    assert lzw_decompress(lzw_compress(seq, 2), 2) == seq.tobytes()


def test_lzw_table_reset_at_4096():
    # low-entropy long run: the 12-bit table fills, forcing the mid-stream
    # CLEAR + rebuild path on both sides
    rng = np.random.default_rng(9)
    seq = np.repeat(rng.integers(0, 4, size=30000, dtype=np.uint8), 3)
    blob = lzw_compress(seq, 2)
    assert lzw_decompress(blob, 2, expect=seq.size) == seq.tobytes()


def test_lzw_truncated_stream_fails_loudly():
    seq = np.arange(256, dtype=np.uint8).repeat(4)
    blob = lzw_compress(seq, 8)
    with pytest.raises(ValueError, match="truncated|ended"):
        lzw_decompress(blob[: len(blob) // 2], 8, expect=seq.size)


# ---------------------------------------------------------------------------
# still images through the imagecodec dispatch


def test_gif_paletted_bitwise_roundtrip():
    px = _paletted()
    blob = encode(px, "gif")
    assert sniff_format(blob) == "gif" and blob[:6] == b"GIF89a"
    assert np.array_equal(decode(blob), px)  # <=256 colors: lossless


def test_gif_truecolor_quantization_deterministic():
    px = render_pixels("img-000000000001")
    b1, b2 = encode_gif_image(px), encode_gif_image(px)
    assert b1 == b2  # cube quantizer is deterministic (oracle re-derives bytes)
    out = decode_gif_image(b1)
    uniq = np.unique(out.reshape(-1, 3), axis=0)
    assert len(uniq) <= 252  # 6x7x6 cube
    assert psnr(out, px) >= 20.0  # palette-format loss, not a codec bug


def test_gif_interlace_roundtrip():
    px = _paletted(h=37, w=23)  # odd dims: the 8/8/4/2 pass math must hold
    blob = encode_gif([px], interlace=True)
    assert np.array_equal(decode_gif_image(blob), px)


def test_gif_rejects_garbage():
    with pytest.raises(ValueError):
        decode_gif_image(b"not a gif")
    with pytest.raises(ValueError):
        decode_gif_image(b"GIF89a" + b"\x00" * 7 + b"\x3b")  # no frames


# ---------------------------------------------------------------------------
# animation: compositing, disposal, transparency, sampling


def test_gif_animation_full_decode_and_delays():
    frames = [_paletted(shift=5 * j) for j in range(6)]
    blob = encode_gif(frames, delays_cs=[3, 4, 5, 6, 7, 8], loop=2)
    out, delays = decode_gif(blob)
    assert delays == [3, 4, 5, 6, 7, 8]
    assert all(np.array_equal(a, b) for a, b in zip(out, frames))


def test_gif_disposal_and_subrect_transparency():
    """Low-level frames exercising placement + all three disposal modes,
    checked against a spec-following reference compositor written here."""
    pal = np.array([(9, 9, 9), (255, 0, 0), (0, 255, 0), (0, 0, 255)], np.uint8)
    w = h = 16
    full = np.ones((h, w), np.uint8)  # all red
    sub = np.full((6, 6), 2, np.uint8)  # green patch
    sub[2:4, 2:4] = 0  # transparent hole (index 0)
    frames = [
        GifFrame(indices=full, disposal=1),
        GifFrame(indices=sub, left=4, top=3, disposal=3, transparent_idx=0),
        GifFrame(indices=sub, left=9, top=9, disposal=2, transparent_idx=0),
        GifFrame(indices=np.full((4, 4), 3, np.uint8), left=0, top=0, disposal=0),
    ]
    blob = encode_gif_frames(w, h, frames, pal, bg_index=0)

    # reference compositor (independent of the codec's internals)
    canvas = np.zeros((h, w, 3), np.uint8)
    canvas[:] = pal[0]
    expect = []
    for fr in frames:
        saved = canvas.copy() if fr.disposal == 3 else None
        fh, fw = fr.indices.shape
        region = canvas[fr.top : fr.top + fh, fr.left : fr.left + fw]
        rgb = pal[fr.indices]
        if fr.transparent_idx is None:
            region[:] = rgb
        else:
            m = fr.indices != fr.transparent_idx
            region[m] = rgb[m]
        expect.append(canvas.copy())
        if fr.disposal == 2:
            canvas[fr.top : fr.top + fh, fr.left : fr.left + fw] = pal[0]
        elif fr.disposal == 3:
            canvas[:] = saved

    out, _ = decode_gif(blob)
    assert len(out) == 4
    for got, exp in zip(out, expect):
        assert np.array_equal(got, exp)


def test_gif_sampling_independent_frames_pay_only_sampled_lzw():
    # full-canvas opaque frames: every frame is an independence point, so
    # 1-in-3 sampling must run LZW on exactly the sampled frames
    frames = [_paletted(shift=3 * j) for j in range(9)]
    blob = encode_gif(frames)
    gifcodec._lzw_decode_calls = 0
    sampled = list(iter_gif_frames(blob, every_n=3))
    assert [i for i, _, _ in sampled] == [0, 3, 6]
    assert gifcodec._lzw_decode_calls == 3
    assert all(np.array_equal(px, frames[i]) for i, px, _ in sampled)


def test_gif_sampling_delta_chain_decodes_dependencies():
    # frame 0 full, frames 1..5 transparent sub-rect deltas: sampling frame 4
    # must decode its whole chain (0..4) and match the full decode
    pal = np.array([(0, 0, 0), (255, 0, 0), (0, 255, 0)], np.uint8)
    frames = [GifFrame(indices=np.ones((16, 16), np.uint8))]
    for j in range(1, 6):
        frames.append(
            GifFrame(
                indices=np.full((3, 3), 2, np.uint8),
                left=2 * j,
                top=j,
                transparent_idx=0,
            )
        )
    blob = encode_gif_frames(16, 16, frames, pal)
    full = [px for _, px, _ in iter_gif_frames(blob)]
    gifcodec._lzw_decode_calls = 0
    sampled = {i: px for i, px, _ in iter_gif_frames(blob, every_n=4)}
    assert sorted(sampled) == [0, 4]
    assert gifcodec._lzw_decode_calls == 5  # chain 0..4, frame 5 skipped
    assert np.array_equal(sampled[0], full[0])
    assert np.array_equal(sampled[4], full[4])


def test_gif_out_of_bounds_frame_is_clipped_not_fatal():
    """A hostile GIF placing a frame past the logical screen must clip
    (browser behavior), not IndexError inside a Spark task."""
    pal = np.array([(0, 0, 0), (255, 0, 0), (0, 255, 0)], np.uint8)
    frames = [
        GifFrame(indices=np.ones((8, 8), np.uint8)),
        GifFrame(indices=np.full((4, 4), 2, np.uint8), left=6, top=6),
        GifFrame(indices=np.full((2, 2), 2, np.uint8), left=20, top=20),
    ]
    out, _ = decode_gif(encode_gif_frames(8, 8, frames, pal))
    assert len(out) == 3
    expect = np.tile(pal[1], (8, 8, 1))
    expect[6:8, 6:8] = pal[2]
    assert np.array_equal(out[1], expect)
    assert np.array_equal(out[2], expect)  # fully off-canvas: no-op


# ---------------------------------------------------------------------------
# property tests — same derandomized settings as the other codec suites

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_SETTINGS = dict(
    max_examples=20, deadline=None,
    suppress_health_check=[HealthCheck.too_slow], derandomize=True,
)


@settings(**_SETTINGS)
@given(
    w=st.integers(3, 40),
    h=st.integers(3, 40),
    n=st.integers(1, 5),
    every_n=st.integers(1, 4),
    n_colors=st.integers(2, 256),
    interlace=st.booleans(),
    seed=st.integers(0, 2**31 - 1),
)
def test_prop_gif_paletted_roundtrip_and_sampling(w, h, n, every_n, n_colors, interlace, seed):
    rng = np.random.default_rng(seed)
    pal = rng.integers(0, 256, size=(n_colors, 3), dtype=np.uint8)
    frames = [pal[rng.integers(0, n_colors, size=(h, w))] for _ in range(n)]
    # frames may repeat colors → unique count can drop below n_colors; the
    # exact-palette path still guarantees bitwise pixels
    blob = encode_gif(frames, interlace=interlace)
    assert sniff_media(blob) == "gif" and sniff_format(blob) == "gif"
    out, _ = decode_gif(blob)
    assert len(out) == n
    for a, b in zip(out, frames):
        assert np.array_equal(a, b)
    sampled = list(iter_gif_frames(blob, every_n=every_n))
    assert [i for i, _, _ in sampled] == list(range(0, n, every_n))
    for i, px, _ in sampled:
        assert np.array_equal(px, frames[i])


@settings(**_SETTINGS)
@given(
    mcs=st.integers(2, 8),
    size=st.integers(0, 2000),
    seed=st.integers(0, 2**31 - 1),
)
def test_prop_lzw_roundtrip(mcs, size, seed):
    rng = np.random.default_rng(seed)
    seq = rng.integers(0, 1 << mcs, size=size, dtype=np.uint8)
    assert lzw_decompress(lzw_compress(seq, mcs), mcs, expect=size) == seq.tobytes()


# ---------------------------------------------------------------------------
# AVI / MJPEG


def test_avi_mjpeg_roundtrip_and_sampling():
    frames = _smooth_frames(6)
    blob = encode_avi_mjpeg(frames, fps=10, quality=96)
    assert sniff_media(blob) == "avi"
    got = list(iter_avi_mjpeg_frames(blob, every_n=2))
    assert [i for i, _ in got] == [0, 2, 4]
    for i, px in got:
        # MJPEG loss is the JPEG codec's; the PSNR>=40 crawl gate holds at q96
        assert psnr(px, frames[i]) >= 40.0


def test_avi_sampling_skips_jpeg_decode(monkeypatch):
    import etlpy_spark.functions.jpegcodec as jpegcodec

    frames = _smooth_frames(8)
    blob = encode_avi_mjpeg(frames, fps=10)
    calls = []
    real = jpegcodec.decode_jpeg
    monkeypatch.setattr(jpegcodec, "decode_jpeg", lambda b: (calls.append(1), real(b))[1])
    got = list(iter_avi_mjpeg_frames(blob, every_n=4))
    assert [i for i, _ in got] == [0, 4]
    assert len(calls) == 2  # skipped frames are seeked over, never decoded


def test_avi_tolerates_junk_chunks():
    import struct

    frames = _smooth_frames(2)
    blob = encode_avi_mjpeg(frames, fps=10)
    # splice a JUNK chunk (odd payload, so the word-align pad matters)
    movi_at = blob.index(b"LIST", 12)
    junk = b"JUNK" + struct.pack("<I", 7) + b"padding" + b"\x00"
    spliced = blob[:movi_at] + junk + blob[movi_at:]
    spliced = spliced[:4] + struct.pack("<I", len(spliced) - 8) + spliced[8:]
    got = list(iter_avi_mjpeg_frames(spliced))
    assert [i for i, _ in got] == [0, 1]
    assert psnr(got[1][1], frames[1]) >= 40.0


def test_avi_rejects_garbage_and_empty():
    with pytest.raises(ValueError, match="RIFF/AVI"):
        list(iter_avi_mjpeg_frames(b"nope"))
    with pytest.raises(ValueError, match="movi"):
        import struct

        body = b"AVI " + b"JUNK" + struct.pack("<I", 0)
        list(iter_avi_mjpeg_frames(b"RIFF" + struct.pack("<I", len(body)) + body))
    with pytest.raises(ValueError, match="frame"):
        encode_avi_mjpeg([])


# ---------------------------------------------------------------------------
# Spark integration: the distributed frame sampler dispatches all four
# container kinds per row (multimodal.sample_video_frames)


def test_video_sampling_avi_and_gif(spark):
    from etlpy_spark.operators import multimodal as mm

    frames = _smooth_frames(8)
    gif_frames = [_paletted(shift=4 * j) for j in range(8)]
    df = spark.createDataFrame(
        [
            ("v-avi", encode_avi_mjpeg(frames, fps=10, quality=96)),
            ("v-gif", encode_gif(gif_frames)),
        ],
        "video_id string, bytes binary",
    )
    rows = mm.sample_video_frames(df, every_n=3).collect()
    by_vid = {}
    for r in rows:
        by_vid.setdefault(r.video_id, {})[r.frame_idx] = bytes(r.bytes)
    assert sorted(by_vid["v-avi"]) == [0, 3, 6]
    assert sorted(by_vid["v-gif"]) == [0, 3, 6]
    for idx in (0, 3, 6):
        assert psnr(decode(by_vid["v-avi"][idx]), frames[idx]) >= 40.0
        # paletted GIF is bitwise through the sampler
        assert np.array_equal(decode(by_vid["v-gif"][idx]), gif_frames[idx])
