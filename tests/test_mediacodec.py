"""Unit tests for the numpy-only WAV / Y4M codecs (functions/mediacodec.py)."""

import numpy as np
import pytest

from etlpy_spark.functions.imagecodec import psnr, render_pixels
from etlpy_spark.functions.mediacodec import (
    decode_wav,
    decode_y4m,
    encode_wav,
    encode_y4m,
    iter_y4m_frames,
    parse_y4m_header,
    sniff_media,
    wav_float,
)


def _pcm16(n=1000, seed=7):
    return (np.random.default_rng(seed).standard_normal(n) * 12000).astype("<i2")


def _frames(n, base_id="img-000000000000"):
    """n same-geometry RGB frames: one procedural base image panned per
    frame (cropped to even dims so 4:2:0 layouts are encodable)."""
    base = render_pixels(base_id)
    h, w = base.shape[0] & ~1, base.shape[1] & ~1
    base = base[:h, :w]
    return [np.roll(base, 3 * j, axis=1) for j in range(n)]


def test_wav_roundtrip_bit_exact_mono_stereo():
    mono = _pcm16()
    s, rate = decode_wav(encode_wav(mono, 16000))
    assert rate == 16000 and s.shape == (1000, 1)
    assert np.array_equal(s[:, 0], mono)

    stereo = np.stack([mono, -mono], axis=1)
    s2, rate2 = decode_wav(encode_wav(stereo, 44100))
    assert rate2 == 44100 and s2.shape == (1000, 2)
    assert np.array_equal(s2, stereo)


def test_wav_widths_8_and_32_bit():
    u8 = (np.arange(501) % 256).astype(np.uint8)
    s, _ = decode_wav(encode_wav(u8, 8000))
    assert s.dtype == np.uint8 and np.array_equal(s[:, 0], u8)
    assert abs(float(wav_float(s).mean())) < 0.05  # offset-binary centered

    i32 = (np.random.default_rng(3).standard_normal(200) * 2**30).astype("<i4")
    s2, _ = decode_wav(encode_wav(i32, 48000))
    assert np.array_equal(s2[:, 0], i32)


def test_wav_chunk_walk_skips_unknown_chunks():
    import struct

    pcm = _pcm16(64)
    wav = bytearray(encode_wav(pcm, 16000))
    # splice a LIST chunk with an ODD payload size between fmt and data:
    # RIFF pads odd chunks to word alignment, which the walker must honor
    data_at = bytes(wav).index(b"data")
    junk = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
    spliced = bytes(wav[:data_at]) + junk + bytes(wav[data_at:])
    spliced = spliced[:4] + struct.pack("<I", len(spliced) - 8) + spliced[8:]
    s, rate = decode_wav(spliced)
    assert rate == 16000 and np.array_equal(s[:, 0], pcm)


def test_wav_rejects_garbage():
    with pytest.raises(ValueError):
        decode_wav(b"not a wav at all")


def test_y4m_header_and_seek_sampling():
    frames = _frames(9)
    blob = encode_y4m(frames, fps=(25, 1), colorspace="C444")
    params, off = parse_y4m_header(blob)
    assert (params["w"], params["h"]) == (frames[0].shape[1], frames[0].shape[0])
    assert params["fps"] == (25, 1) and params["colorspace"] == "C444"
    assert blob[off : off + 5] == b"FRAME"
    sampled = list(iter_y4m_frames(blob, every_n=4))
    assert [i for i, _ in sampled] == [0, 4, 8]


def test_y4m_c444_roundtrip_psnr_40():
    frames = _frames(3)
    out, params = decode_y4m(encode_y4m(frames, colorspace="C444"))
    assert len(out) == 3 and params["colorspace"] == "C444"
    for a, b in zip(out, frames):
        assert psnr(a, b) >= 40.0  # rounding-only loss


def test_y4m_c420_real_subsampling():
    frames = _frames(2)
    blob = encode_y4m(frames, colorspace="C420jpeg")
    params, _ = parse_y4m_header(blob)
    h, w = frames[0].shape[:2]
    assert params["frame_bytes"] == w * h + 2 * (w // 2) * (h // 2)
    out, _ = decode_y4m(blob)
    for a, b in zip(out, frames):
        # luma survives exactly (Y plane is full-res); chroma is box-filtered
        assert psnr(a, b) >= 25.0
    # 4:2:0 stream is smaller than 4:4:4 by the chroma half
    assert len(blob) < len(encode_y4m(frames, colorspace="C444"))


def test_y4m_default_colorspace_is_420():
    # a header with no C token means C420jpeg per spec
    frames = [render_pixels("img-000000000001")]
    blob = encode_y4m(frames, colorspace="C420jpeg")
    stripped = blob.replace(b" C420jpeg", b"", 1)
    params, _ = parse_y4m_header(stripped)
    assert params["colorspace"] == "C420jpeg"
    out, _ = decode_y4m(stripped)
    assert out[0].shape == frames[0].shape


# ---------------------------------------------------------------------------
# property tests (hypothesis): the codecs must hold for ARBITRARY payloads,
# not just the fixtures — same derandomized settings as the combinator suite

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_SETTINGS = dict(
    max_examples=25, deadline=None,
    suppress_health_check=[HealthCheck.too_slow], derandomize=True,
)


@settings(**_SETTINGS)
@given(
    n=st.integers(1, 400),
    ch=st.integers(1, 4),
    bits=st.sampled_from([8, 16, 32]),
    rate=st.sampled_from([8000, 16000, 44100, 48000]),
    seed=st.integers(0, 2**31 - 1),
)
def test_prop_wav_roundtrip_any_shape(n, ch, bits, rate, seed):
    rng = np.random.default_rng(seed)
    if bits == 8:
        pcm = rng.integers(0, 256, size=(n, ch), dtype=np.uint8)
    else:
        info = np.iinfo(f"int{bits}")
        pcm = rng.integers(info.min, info.max + 1, size=(n, ch)).astype(f"<i{bits // 8}")
    blob = encode_wav(pcm, rate)
    assert sniff_media(blob) == "wav"
    s, r = decode_wav(blob)
    assert r == rate and s.shape == (n, ch) and np.array_equal(s, pcm)
    f = wav_float(s)
    assert f.min() >= -1.0 and f.max() < 1.0 + 1e-12


@settings(**_SETTINGS)
@given(
    n_junk=st.integers(1, 4),
    sizes=st.lists(st.integers(0, 9), min_size=4, max_size=4),
    seed=st.integers(0, 2**31 - 1),
)
def test_prop_wav_chunk_walk_arbitrary_junk(n_junk, sizes, seed):
    import struct

    rng = np.random.default_rng(seed)
    pcm = _pcm16(32, seed=seed % 1000)
    wav = encode_wav(pcm, 16000)
    data_at = wav.index(b"data")
    junk = b""
    for j in range(n_junk):
        size = sizes[j % 4]
        cid = bytes(rng.integers(97, 123, size=4, dtype=np.uint8))  # a-z tag
        junk += cid + struct.pack("<I", size) + bytes(size) + (b"\x00" if size & 1 else b"")
    spliced = wav[:data_at] + junk + wav[data_at:]
    spliced = spliced[:4] + struct.pack("<I", len(spliced) - 8) + spliced[8:]
    s, rate = decode_wav(spliced)
    assert rate == 16000 and np.array_equal(s[:, 0], pcm)


@settings(**_SETTINGS)
@given(
    w=st.integers(2, 24).map(lambda v: v * 2),  # even dims: C420-encodable
    h=st.integers(2, 24).map(lambda v: v * 2),
    n=st.integers(1, 6),
    every_n=st.integers(1, 5),
    seed=st.integers(0, 2**31 - 1),
)
def test_prop_y4m_roundtrip_and_sampling(w, h, n, every_n, seed):
    rng = np.random.default_rng(seed)
    frames = [rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8) for _ in range(n)]
    blob = encode_y4m(frames, colorspace="C444")
    assert sniff_media(blob) == "y4m"
    params, _ = parse_y4m_header(blob)
    assert (params["w"], params["h"]) == (w, h)
    sampled = list(iter_y4m_frames(blob, every_n=every_n))
    assert [i for i, _ in sampled] == list(range(0, n, every_n))
    for i, px in sampled:
        # uniform-noise worst case: BT.601 C444 is rounding-only loss
        assert px.shape == (h, w, 3) and psnr(px, frames[i]) >= 40.0
    # C420 stays parseable with the right frame size even on noise
    p420, _ = parse_y4m_header(encode_y4m(frames, colorspace="C420jpeg"))
    assert p420["frame_bytes"] == w * h + 2 * (w // 2) * (h // 2)


def test_sniff_media():
    assert sniff_media(encode_wav(_pcm16(8), 8000)) == "wav"
    assert sniff_media(encode_y4m([render_pixels("img-000000000000")])) == "y4m"
    assert sniff_media(b"RAW0\x00\x00\x00\x01\x00\x00\x00\x01xxx") == "rawcat"
    assert sniff_media(b"\xff\xd8\xff") == "unknown"


def test_wav_rejects_ambiguous_integer_dtypes():
    """uint16/uint32 share itemsizes with the PCM int dtypes; an astype
    would silently corrupt samples — regression: the width-only check
    accepted them. (float32/float64 are now legal: they encode as real
    IEEE-float WAV, format 3 — see the G.711/float tests below.)"""
    from etlpy_spark.functions.mediacodec import encode_wav

    with pytest.raises(ValueError, match="PCM dtype"):
        encode_wav(np.full(100, 40000, dtype=np.uint16), 16000)
    with pytest.raises(ValueError, match="PCM dtype"):
        encode_wav(np.arange(100, dtype=np.uint32), 16000)


# ---------------------------------------------------------------------------
# real-web WAV variants: IEEE float, G.711 u-law/A-law, WAVE_FORMAT_EXTENSIBLE


def test_wav_ieee_float_roundtrip_exact():
    t = np.arange(1000, dtype=np.float64)
    f32 = (np.sin(t / 7.0) * 0.8).astype(np.float32).reshape(-1, 2)
    s, rate = decode_wav(encode_wav(f32, 44100))
    assert rate == 44100 and s.dtype == np.float32 and np.array_equal(s, f32)
    assert np.array_equal(wav_float(s), f32.astype(np.float64))  # no rescale
    f64 = f32.astype(np.float64)
    s, _ = decode_wav(encode_wav(f64, 48000))
    assert s.dtype == np.float64 and np.array_equal(s, f64)


def test_g711_self_consistency_all_codes():
    """compress(expand(code)) == code for every 8-bit code — the canonical
    G.711 correctness pin. u-law's negative zero (0x7F) re-encodes to the
    positive zero 0xFF, the spec's one intentional collision."""
    from etlpy_spark.functions.mediacodec import (
        alaw_compress, alaw_expand, mulaw_compress, mulaw_expand,
    )

    codes = np.arange(256, dtype=np.uint8)
    back = mulaw_compress(mulaw_expand(codes))
    assert ((back == codes) | ((codes == 0x7F) & (back == 0xFF))).all()
    assert np.array_equal(alaw_compress(alaw_expand(codes)), codes)
    # spec spot vectors: linear zero
    assert mulaw_compress(np.array([0], np.int16))[0] == 0xFF
    assert alaw_compress(np.array([0], np.int16))[0] == 0xD5


def test_g711_wav_roundtrip_snr():
    t = np.arange(8000, dtype=np.float64)
    sig = (np.sin(t / 13.0) * 20000).astype(np.int16)
    for law in ("mu", "a"):
        s, rate = decode_wav(encode_wav(sig, 8000, law=law))
        assert rate == 8000 and s.dtype == np.int16
        err = (s[:, 0].astype(np.float64) - sig) ** 2
        snr = 10 * np.log10((sig.astype(np.float64) ** 2).mean() / err.mean())
        assert snr > 35.0  # companded 8-bit: ~37 dB on a full-scale sine


def test_wav_extensible_header_resolves_subformat():
    t = np.arange(2000, dtype=np.float64)
    pcm = (np.sin(t / 9.0) * 12000).astype(np.int16)
    s, rate = decode_wav(encode_wav(pcm, 16000, extensible=True))
    assert rate == 16000 and np.array_equal(s[:, 0], pcm)
    f32 = (np.sin(t / 5.0) * 0.5).astype(np.float32)
    s, _ = decode_wav(encode_wav(f32, 22050, extensible=True))
    assert s.dtype == np.float32 and np.array_equal(s[:, 0], f32)
    s, _ = decode_wav(encode_wav(pcm, 8000, law="a", extensible=True))
    assert s.dtype == np.int16
    # truncated extensible header fails loudly
    import struct as _struct

    blob = bytearray(encode_wav(pcm, 16000, extensible=True))
    fmt_at = bytes(blob).index(b"fmt ")
    blob[fmt_at + 4 : fmt_at + 8] = _struct.pack("<I", 16)  # claim plain size
    with pytest.raises(ValueError):
        decode_wav(bytes(blob))


def test_wav_malformed_header_fields_raise_valueerror():
    """Hostile headers must fail with the documented ValueError, not a
    ZeroDivisionError/struct.error inside a Spark task."""
    from etlpy_spark.functions.mediacodec import decode_wav, encode_wav

    good = bytearray(encode_wav(_pcm16(64), 16000))
    # fmt payload starts at 20: format H @20, channels H @22
    zero_ch = bytes(good[:22]) + b"\x00\x00" + bytes(good[24:])
    with pytest.raises(ValueError, match="channel count"):
        decode_wav(zero_ch)
    # fmt chunk truncated to 4 payload bytes
    import struct as _struct

    short_fmt = (
        bytes(good[:16]) + _struct.pack("<I", 4) + bytes(good[20:24])
    )
    with pytest.raises(ValueError):
        decode_wav(short_fmt)
