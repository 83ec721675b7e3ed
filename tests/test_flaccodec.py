"""Unit tests for the from-scratch FLAC codec (functions/flaccodec.py).
Lossless format: the invariant everywhere is bit-exact decode∘encode
identity, swept across the subframe/decorrelation/residual feature grid."""

import struct

import numpy as np
import pytest

from etlpy_spark.functions.flaccodec import decode_flac, encode_flac
from etlpy_spark.functions.mediacodec import sniff_media, wav_float


def _sine(n=9000, amp=18000, seed=11):
    rng = np.random.default_rng(seed)
    t = np.arange(n, dtype=np.float64)
    return (np.sin(t / 9.0) * amp + rng.standard_normal(n) * 150).astype(np.int16)


def _check(pcm, **kw):
    blob = encode_flac(pcm, 16000, **kw)
    assert sniff_media(blob) == "flac"
    out, rate = decode_flac(blob)
    src = pcm if pcm.ndim == 2 else pcm[:, None]
    assert rate == 16000 and out.shape == src.shape
    assert np.array_equal(out, src.astype(out.dtype))
    return blob


def test_mono_fixed_predictors_roundtrip_and_compress():
    pcm = _sine()
    blob = _check(pcm)
    assert len(blob) < 2 * len(pcm)  # fixed predictors + Rice beat raw PCM
    assert decode_flac(blob)[0].dtype == np.int16  # wav_float-compatible


def test_all_stereo_decorrelations():
    pcm = _sine()
    st = np.stack([pcm, (pcm * 0.7).astype(np.int16)], axis=1)
    for mode in ("independent", "left_side", "right_side", "mid_side", "auto"):
        _check(st, stereo_mode=mode)


def test_subframe_grid():
    pcm = _sine()
    _check(np.full(5000, -123, np.int16))  # constant
    rng = np.random.default_rng(3)
    _check(rng.integers(-32768, 32768, 7000).astype(np.int16),
           force_subframe="verbatim")
    _check(pcm, force_subframe="lpc", lpc_order=5)
    _check(pcm, force_escape=True)  # escape partitions (raw residuals)
    _check(pcm, partition_order=3)
    _check(pcm, partition_order=2, force_subframe="lpc", lpc_order=8)


def test_wasted_bits_and_odd_shapes():
    rng = np.random.default_rng(5)
    _check((rng.integers(-100, 100, 6000).astype(np.int16) << 4))  # wasted bits
    _check(_sine()[:5001])  # final short block
    pcm = _sine(4000)
    _check(np.stack([pcm, (-pcm).astype(np.int16), (pcm // 2).astype(np.int16)], axis=1))
    _check(_sine(50))  # single tiny block


def test_crc_verification_catches_corruption():
    blob = bytearray(encode_flac(_sine(3000), 16000))
    # flip one bit inside the last frame's entropy data
    blob[-40] ^= 0x10
    with pytest.raises(ValueError, match="CRC"):
        decode_flac(bytes(blob))


def test_hostile_inputs_raise_valueerror():
    with pytest.raises(ValueError, match="not a FLAC"):
        decode_flac(b"nope")
    with pytest.raises(ValueError, match="STREAMINFO"):
        decode_flac(b"fLaC" + b"\x81\x00\x00\x01\x00")
    good = encode_flac(_sine(2000), 16000)
    with pytest.raises(ValueError):
        decode_flac(good[: len(good) - 7])  # truncated final frame
    with pytest.raises(ValueError, match="integer"):
        encode_flac(np.zeros(10, np.float32), 16000)


def test_audio_features_flac_matches_wav(spark):
    """The distributed audio operator decodes FLAC natively and its
    features match the identical waveform delivered as WAV (lossless:
    same samples → same rms/crossings)."""
    from etlpy_spark.functions.mediacodec import encode_wav
    from etlpy_spark.operators import multimodal as mm

    pcm = _sine(6000)
    st = np.stack([pcm, -pcm], axis=1)
    df = spark.createDataFrame(
        [("c-wav", encode_wav(st, 16000)),
         ("c-flac", encode_flac(st, 16000, stereo_mode="mid_side"))],
        "clip_id string, bytes binary",
    )
    rows = {r.clip_id: r for r in mm.decode_audio_features(df).collect()}
    a, b = rows["c-wav"], rows["c-flac"]
    assert (a.n_samples, a.sample_rate, a.n_channels) == \
           (b.n_samples, b.sample_rate, b.n_channels) == (6000, 16000, 2)
    assert a.rms == b.rms and a.zero_crossings == b.zero_crossings


# ---------------------------------------------------------------------------
# property test — same derandomized settings as the other codec suites

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_SETTINGS = dict(
    max_examples=20, deadline=None,
    suppress_health_check=[HealthCheck.too_slow], derandomize=True,
)


@settings(**_SETTINGS)
@given(
    n=st.integers(1, 3000),
    ch=st.integers(1, 3),
    block_size=st.sampled_from([192, 576, 1024, 4096]),
    mode_pick=st.integers(0, 4),
    partition_order=st.integers(0, 2),
    escape=st.booleans(),
    seed=st.integers(0, 2**31 - 1),
)
def test_prop_flac_lossless_any_input(n, ch, block_size, mode_pick,
                                      partition_order, escape, seed):
    rng = np.random.default_rng(seed)
    # mix of smooth and noisy content exercises predictor selection
    t = np.arange(n, dtype=np.float64)
    base = np.sin(t / max(rng.integers(2, 50), 1)) * rng.integers(0, 30000)
    pcm = np.stack(
        [(base * (c + 1) / ch + rng.standard_normal(n) * rng.integers(0, 500))
         for c in range(ch)], axis=1,
    ).clip(-32768, 32767).astype(np.int16)
    mode = ("independent", "left_side", "right_side", "mid_side", "auto")[mode_pick]
    if ch != 2:
        mode = "independent" if ch != 2 else mode
    blob = encode_flac(pcm, 8000, block_size=block_size,
                       stereo_mode=mode if ch == 2 else "auto",
                       partition_order=partition_order, force_escape=escape)
    out, rate = decode_flac(blob)
    assert rate == 8000 and np.array_equal(out, pcm)
