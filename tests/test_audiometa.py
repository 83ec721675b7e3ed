"""Tests for compressed-audio metadata (functions/audiometa.py +
operators/multimodal.audio_metadata): synthesized structurally-valid
MP3/MP2/Ogg/ADTS streams with known parameters, sniffing, ID3 skip,
VBR-exact frame walks, the distributed triage operator's skip-with-reason
rows, and the typed decode_audio_features boundary."""

import struct

import numpy as np
import pytest

from etlpy_spark.functions.audiometa import (
    adts_metadata,
    audio_metadata,
    make_adts,
    make_mpeg_audio,
    make_ogg,
    mpeg_audio_metadata,
    ogg_metadata,
    sniff_audio,
)


def test_mp3_cbr_walk_exact():
    blob = make_mpeg_audio(50, layer=3, version="1", bitrate=128,
                           rate=44100, channels=2)
    assert sniff_audio(blob) == "mp3"
    m = mpeg_audio_metadata(blob)
    assert m["codec"] == "mp3"
    assert m["sample_rate"] == 44100
    assert m["n_channels"] == 2
    assert m["n_frames"] == 50
    assert m["n_samples"] == 50 * 1152
    assert m["bitrate_kbps"] == 128.0
    assert abs(m["duration_s"] - 50 * 1152 / 44100) < 1e-6


def test_mp3_vbr_walk_averages_bitrate():
    parts = [make_mpeg_audio(10, bitrate=64), make_mpeg_audio(10, bitrate=192)]
    m = mpeg_audio_metadata(parts[0] + parts[1])
    assert m["n_frames"] == 20
    assert m["bitrate_kbps"] == pytest.approx((64 * 10 + 192 * 10) / 20)


def test_mp2_and_mpeg2_layer3():
    m2 = mpeg_audio_metadata(make_mpeg_audio(8, layer=2, bitrate=192, rate=48000))
    assert m2["codec"] == "mp2" and m2["n_samples"] == 8 * 1152
    lo = mpeg_audio_metadata(
        make_mpeg_audio(8, layer=3, version="2", bitrate=64, rate=22050)
    )
    # MPEG-2 Layer III frames carry 576 samples
    assert lo["n_samples"] == 8 * 576 and lo["sample_rate"] == 22050


def test_id3v2_and_id3v1_are_skipped():
    frames = make_mpeg_audio(12)
    id3v2 = b"ID3\x04\x00\x00" + bytes([0, 0, 0, 20]) + b"\x00" * 20
    id3v1 = b"TAG" + b"\x00" * 125
    m = mpeg_audio_metadata(id3v2 + frames + id3v1)
    assert m["n_frames"] == 12
    assert sniff_audio(id3v2 + frames) == "mp3"


def test_mp3_junk_prefix_resync_and_no_frames_error():
    m = mpeg_audio_metadata(b"\x00\x01garbage" + make_mpeg_audio(5))
    assert m["n_frames"] == 5
    with pytest.raises(ValueError):
        mpeg_audio_metadata(b"\x00" * 64)


def test_ogg_vorbis_and_opus():
    v = make_ogg("vorbis", 6, rate=44100, channels=2, samples_per_page=4096)
    assert sniff_audio(v) == "ogg-vorbis"
    mv = ogg_metadata(v)
    assert mv["codec"] == "vorbis" and mv["sample_rate"] == 44100
    assert mv["n_samples"] == 5 * 4096  # last page granule
    o = make_ogg("opus", 4, rate=16000, channels=1, samples_per_page=960)
    assert sniff_audio(o) == "ogg-opus"
    mo = ogg_metadata(o)
    assert mo["sample_rate"] == 48000  # opus granules are always 48 kHz
    assert mo["n_samples"] == 3 * 960 - 312  # minus preskip
    assert mo["input_sample_rate"] == 16000


def test_adts_walk():
    blob = make_adts(25, rate=44100, channels=2)
    assert sniff_audio(blob) == "aac-adts"
    m = adts_metadata(blob)
    assert m["n_frames"] == 25
    assert m["n_samples"] == 25 * 1024
    assert m["sample_rate"] == 44100 and m["n_channels"] == 2


def test_sniff_distinguishes_adts_from_mp3():
    # ADTS layer bits are 00 where MPEG audio layers are 01/10/11
    assert sniff_audio(make_adts(1)) == "aac-adts"
    assert sniff_audio(make_mpeg_audio(1)) == "mp3"
    assert sniff_audio(make_mpeg_audio(1, layer=2, bitrate=192)) == "mp2"
    assert sniff_audio(b"\x00\x00\x00\x18ftypM4A \x00" * 2) == "mp4"
    assert sniff_audio(b"junkjunkjunk") == "unknown"


def test_audio_metadata_dispatch_wav_flac():
    from etlpy_spark.functions.mediacodec import encode_wav

    t = np.arange(8000, dtype=np.float64)
    pcm = (np.sin(t / 20) * 3000).astype(np.int16).reshape(-1, 2)
    wav = encode_wav(pcm, 16000)
    m = audio_metadata(wav)
    assert m["codec"] == "pcm" and m["n_samples"] == 4000
    assert m["duration_s"] == pytest.approx(0.25)
    with pytest.raises(ValueError):
        audio_metadata(b"not audio at all")


def test_audio_metadata_operator_rows_and_skip_reason(spark):
    from etlpy_spark.functions.mediacodec import encode_wav
    from etlpy_spark.operators.multimodal import audio_metadata as op

    t = np.arange(4000, dtype=np.float64)
    wav = encode_wav((np.sin(t / 9) * 900).astype(np.int16).reshape(-1, 1), 8000)
    rows_in = [
        ("a", bytearray(make_mpeg_audio(30, bitrate=160))),
        ("b", bytearray(make_ogg("opus", 5, samples_per_page=960))),
        ("c", bytearray(make_adts(10))),
        ("d", bytearray(wav)),
        ("e", bytearray(b"\x00garbage-not-audio\x00\x01\x02")),
    ]
    df = spark.createDataFrame(rows_in, "clip_id string, bytes binary")
    got = {r["clip_id"]: r.asDict() for r in op(df).collect()}
    assert got["a"]["codec"] == "mp3" and got["a"]["n_frames"] == 30
    assert got["b"]["codec"] == "opus" and got["b"]["sample_rate"] == 48000
    assert got["c"]["codec"] == "aac" and got["c"]["n_samples"] == 10240
    assert got["d"]["codec"] == "pcm" and got["d"]["duration_s"] == pytest.approx(0.5)
    assert got["e"]["decode_error"] and got["e"]["codec"] is None
    assert all(got[k]["decode_error"] is None for k in "abcd")


def test_decode_audio_features_typed_boundary(spark):
    from etlpy_spark.operators.multimodal import decode_audio_features

    df = spark.createDataFrame(
        [("m", bytearray(make_mpeg_audio(3)))], "clip_id string, bytes binary"
    )
    with pytest.raises(Exception) as ei:
        decode_audio_features(df).collect()
    assert "mp3" in str(ei.value)
