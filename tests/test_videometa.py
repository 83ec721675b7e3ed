"""Video container triage (functions/videometa.py + the video_triage
operator): MP4 moov walk, WebM EBML walk, AVI/Y4M branches, hostile
input, Spark operator parity."""

import numpy as np
import pytest

from etlpy_spark.functions.videometa import (
    encode_mp4_video_stub,
    encode_webm_stub,
    mkv_tracks,
    mp4_video_metadata,
    sniff_video,
    video_metadata,
    webm_video_metadata,
)


class TestMp4:
    def test_stub_roundtrip(self):
        blob = encode_mp4_video_stub(codec=b"avc1", width=640, height=360,
                                     n_frames=120, timescale=12800, duration=64000)
        m = mp4_video_metadata(blob)
        assert m == {"container": "mp4", "codec": "avc1", "width": 640,
                     "height": 360, "n_frames": 120, "duration_s": 5.0,
                     "fps": 24.0}

    @pytest.mark.parametrize("codec", [b"avc1", b"hev1", b"vp09", b"av01"])
    def test_codec_fourccs(self, codec):
        m = video_metadata(encode_mp4_video_stub(codec=codec))
        assert m["codec"] == codec.decode()

    def test_audio_only_m4a_raises_typed(self):
        # reuse the audio fixture builder from the compressed-audio triage
        from etlpy_spark.functions.audiometa import mp4_metadata

        blob = encode_mp4_video_stub()
        with pytest.raises(ValueError, match="no audio track"):
            mp4_metadata(blob)  # video-only: audio face refuses
        # and the video face refuses an audio-only file symmetrically —
        # build one by relabeling the handler
        audio_only = blob.replace(b"vide", b"soun")
        with pytest.raises(ValueError, match="no video track"):
            mp4_video_metadata(audio_only)


class TestWebm:
    def test_stub_roundtrip(self):
        blob = encode_webm_stub(codec="V_VP9", width=1280, height=720,
                                duration_ticks=4000.0)
        m = webm_video_metadata(blob)
        assert m["container"] == "webm" and m["codec"] == "V_VP9"
        assert (m["width"], m["height"]) == (1280, 720)
        assert m["duration_s"] == 4.0  # 4000 ticks * 1ms default scale

    def test_audio_track_parsed(self):
        blob = encode_webm_stub(audio=("A_OPUS", 48000, 2))
        info = mkv_tracks(blob)
        kinds = {t["type"] for t in info["tracks"]}
        assert kinds == {"video", "audio"}
        a = next(t for t in info["tracks"] if t["type"] == "audio")
        assert a["codec"] == "A_OPUS" and a["sample_rate"] == 48000
        assert a["n_channels"] == 2

    def test_custom_timescale(self):
        blob = encode_webm_stub(duration_ticks=100.0, timescale=10_000_000)
        assert webm_video_metadata(blob)["duration_s"] == 1.0

    def test_av1_codec_id(self):
        assert webm_video_metadata(encode_webm_stub(codec="V_AV1"))["codec"] == "V_AV1"


class TestDispatchAndDecodables:
    def test_sniffs(self):
        assert sniff_video(encode_mp4_video_stub()) == "mp4"
        assert sniff_video(encode_webm_stub()) == "webm"
        assert sniff_video(b"garbage") == "unknown"

    def test_y4m_branch_counts_frames(self):
        from etlpy_spark.functions.imagecodec import render_pixels
        from etlpy_spark.functions.mediacodec import encode_y4m

        frames = [np.roll(render_pixels("img-000000000001"), j, 1) for j in range(7)]
        blob = encode_y4m(frames, fps=(25, 1), colorspace="C444")
        m = video_metadata(blob)
        assert m["container"] == "y4m" and m["n_frames"] == 7
        assert m["fps"] == 25.0 and m["width"] == frames[0].shape[1]

    def test_avi_branch(self):
        from etlpy_spark.functions.imagecodec import render_pixels
        from etlpy_spark.functions.mediacodec import encode_avi_mjpeg

        frames = [np.roll(render_pixels("img-000000000002"), j, 0) for j in range(5)]
        blob = encode_avi_mjpeg(frames, fps=10, quality=90)
        m = video_metadata(blob)
        assert m["container"] == "avi" and m["codec"] == "mjpeg"
        assert m["n_frames"] == 5 and m["fps"] == 10.0
        assert (m["height"], m["width"]) == frames[0].shape[:2]

    def test_hostile_inputs_raise_typed(self):
        for blob in (b"", b"\x1a\x45\xdf\xa3", b"\x00\x00\x00\x08ftyp",
                     b"\x1a\x45\xdf\xa3\x00"):
            with pytest.raises(ValueError):
                video_metadata(blob)

    def test_truncated_webm_triages_best_effort(self):
        # a partially-downloaded file still names its codec/dims — the
        # tolerant-walk behavior a crawl triage wants (clamped child
        # spans); deep truncation into the header still raises
        m = video_metadata(encode_webm_stub()[:-5])
        assert m["codec"] == "V_VP9"
        with pytest.raises(ValueError):
            video_metadata(encode_webm_stub()[:10])


class TestSparkOperator:
    def test_triage_rows(self, spark):
        from etlpy_spark.operators.multimodal import video_triage

        rows = [
            ("mp4", bytearray(encode_mp4_video_stub())),
            ("webm", bytearray(encode_webm_stub())),
            ("junk", bytearray(b"\x00not video")),
        ]
        df = spark.createDataFrame(rows, "video_id string, bytes binary")
        got = {r["video_id"]: r.asDict() for r in video_triage(df).collect()}
        assert got["mp4"]["codec"] == "avc1" and got["mp4"]["decode_error"] is None
        assert got["webm"]["codec"] == "V_VP9" and got["webm"]["width"] == 1280
        assert got["junk"]["decode_error"].startswith("ValueError")
        # serial parity on the non-error rows
        for key, blob in rows[:2]:
            m = video_metadata(bytes(blob))
            for k, v in m.items():
                assert got[key][k] == v, (key, k)
