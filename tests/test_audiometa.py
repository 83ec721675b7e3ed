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


# --- ISO BMFF (MP4/M4A) ------------------------------------------------------


def test_mp4_aac_walk_exact():
    from etlpy_spark.functions.audiometa import make_mp4_audio, mp4_metadata

    blob = make_mp4_audio(40, codec="aac", rate=44100, channels=2)
    assert sniff_audio(blob) == "mp4"
    m = mp4_metadata(blob)
    assert m["container"] == "mp4" and m["codec"] == "aac"
    assert m["sample_rate"] == 44100 and m["n_channels"] == 2
    assert m["n_frames"] == 40 and m["n_samples"] == 40 * 1024
    assert m["duration_s"] == pytest.approx(40 * 1024 / 44100, abs=1e-5)
    # dispatch goes through the same walker
    assert audio_metadata(blob) == m


def test_mp4_opus_v1_mdhd_video_track_first():
    from etlpy_spark.functions.audiometa import (make_mp4_audio, mp4_metadata,
                                                 mp4_tracks)

    blob = make_mp4_audio(25, codec="opus", rate=48000, channels=1,
                          frame_samples=960, mdhd_version=1,
                          with_video_track=True)
    m = mp4_metadata(blob)  # picks the soun trak even though vide is first
    assert m["codec"] == "opus" and m["sample_rate"] == 48000
    assert m["n_frames"] == 25 and m["n_samples"] == 25 * 960
    tracks = mp4_tracks(blob)
    assert [t["handler"] for t in tracks] == ["vide", "soun"]
    v = tracks[0]
    assert v["codec"] == "avc1" and (v["width"], v["height"]) == (640, 360)
    assert v["timescale"] == 30000 and v["n_frames"] == 120


def test_mp4_timescale_rescale_and_flac():
    from etlpy_spark.functions.audiometa import make_mp4_audio, mp4_metadata

    # mdhd timescale != sample rate -> the walker rescales to samples
    blob = make_mp4_audio(10, codec="flac", rate=22050, frame_samples=4096,
                          mdhd_timescale=44100)
    m = mp4_metadata(blob)
    assert m["codec"] == "flac" and m["sample_rate"] == 22050
    assert m["n_samples"] == 10 * 4096
    assert m["duration_s"] == pytest.approx(10 * 4096 / 22050, abs=1e-5)


def test_mp4_largesize_and_to_end_boxes():
    from etlpy_spark.functions.audiometa import (_mp4_child, make_mp4_audio,
                                                 mp4_metadata)

    blob = make_mp4_audio(8)
    want = mp4_metadata(blob)
    s, e = _mp4_child(blob, 0, len(blob), b"moov")
    body = blob[s:e]
    head = blob[: s - 8]
    # 64-bit largesize form of the same moov box
    big = head + struct.pack(">I", 1) + b"moov" + struct.pack(">Q", 16 + len(body)) + body
    want.pop("bitrate_kbps")  # a function of total file size, which changes
    got = mp4_metadata(big)
    got.pop("bitrate_kbps")
    assert got == want
    # size==0 (extends to end of file) form
    zero = head + struct.pack(">I", 0) + b"moov" + body
    got0 = mp4_metadata(zero)
    got0.pop("bitrate_kbps")
    assert got0 == want


def test_mp4_hostile_inputs_typed():
    from etlpy_spark.functions.audiometa import make_mp4_audio, mp4_metadata

    blob = make_mp4_audio(6)
    with pytest.raises(ValueError):
        mp4_metadata(blob[:40])  # truncated mid-box
    with pytest.raises(ValueError, match="no moov"):
        mp4_metadata(blob[:24])  # exactly the ftyp box, nothing after
    with pytest.raises(ValueError, match="ftyp"):
        mp4_metadata(b"\x00" * 32)
    # video-only file: strip the soun trak out of a two-track file
    from etlpy_spark.functions.audiometa import _mp4_boxes, _mp4_child

    two = make_mp4_audio(6, with_video_track=True)
    ms, me = _mp4_child(two, 0, len(two), b"moov")
    keep = []
    for fc, s, e in _mp4_boxes(two, ms, me):
        if fc == b"trak":
            mdia = _mp4_child(two, s, e, b"mdia")
            h = _mp4_child(two, *mdia, b"hdlr")
            if two[h[0] + 8 : h[0] + 12] == b"soun":
                continue
        keep.append(two[s - 8 : e])
    body = b"".join(keep)
    vonly = (two[: ms - 8] + struct.pack(">I", 8 + len(body)) + b"moov" + body)
    with pytest.raises(ValueError, match="no audio track"):
        mp4_metadata(vonly)


def test_mp4_operator_row(spark):
    from etlpy_spark.functions.audiometa import make_mp4_audio
    from etlpy_spark.operators.multimodal import audio_metadata as op

    df = spark.createDataFrame(
        [("m4a", bytearray(make_mp4_audio(12, codec="aac", rate=32000)))],
        "clip_id string, bytes binary",
    )
    row = op(df).collect()[0].asDict()
    assert row["decode_error"] is None
    assert row["container"] == "mp4" and row["codec"] == "aac"
    assert row["sample_rate"] == 32000 and row["n_samples"] == 12 * 1024
