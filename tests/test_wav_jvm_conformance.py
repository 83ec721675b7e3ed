"""WAV codec conformance against a second implementation: the JVM's
javax.sound.sampled (in-process with Spark, no new libraries) — the same
rationale as tests/test_jvm_conformance.py for images: self-round-trips
cannot catch a consistently-wrong convention, an independent reference
reader can."""

import numpy as np
import pytest

from etlpy_spark.functions.mediacodec import decode_wav, encode_wav


def _jread(spark, blob: bytes):
    """AudioSystem read -> (format dict, raw frame bytes in the stream's
    native encoding)."""
    jvm = spark._jvm
    ais = jvm.javax.sound.sampled.AudioSystem.getAudioInputStream(
        jvm.java.io.ByteArrayInputStream(bytearray(blob)))
    f = ais.getFormat()
    meta = {
        "rate": int(f.getSampleRate()),
        "channels": int(f.getChannels()),
        "bits": int(f.getSampleSizeInBits()),
        "encoding": str(f.getEncoding().toString()),
        "big_endian": bool(f.isBigEndian()),
    }
    return meta, bytes(ais.readAllBytes())


def _jread_as_pcm16(spark, blob: bytes) -> np.ndarray:
    """AudioSystem read + convert to 16-bit signed little-endian PCM —
    the JVM's own G.711 expansion, our decoder's reference."""
    jvm = spark._jvm
    ais = jvm.javax.sound.sampled.AudioSystem.getAudioInputStream(
        jvm.java.io.ByteArrayInputStream(bytearray(blob)))
    src = ais.getFormat()
    enc = jvm.javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
    target = jvm.javax.sound.sampled.AudioFormat(
        enc, src.getSampleRate(), 16, src.getChannels(),
        2 * src.getChannels(), src.getSampleRate(), False)
    conv = jvm.javax.sound.sampled.AudioSystem.getAudioInputStream(target, ais)
    raw = bytes(conv.readAllBytes())
    return np.frombuffer(raw, dtype="<i2").reshape(-1, int(src.getChannels()))


def _sine(n=800, ch=2, scale=9000):
    t = np.arange(n, dtype=np.float64)
    a = np.sin(t * 0.071) * scale
    b = np.sin(t * 0.0173 + 1.0) * scale
    return np.stack([a, b][:ch], axis=1)


class TestPcmConformance:
    def test_int16_frames_bit_exact(self, spark):
        pcm = np.round(_sine()).astype(np.int16)
        blob = encode_wav(pcm, sample_rate=8000)
        meta, frames = _jread(spark, blob)
        assert meta == {"rate": 8000, "channels": 2, "bits": 16,
                        "encoding": "PCM_SIGNED", "big_endian": False}
        assert frames == pcm.astype("<i2").tobytes()
        mine, rate = decode_wav(blob)
        assert rate == 8000 and np.array_equal(mine, pcm)

    def test_uint8_frames_bit_exact(self, spark):
        pcm = (np.round(_sine(scale=100)) + 128).astype(np.uint8)
        blob = encode_wav(pcm, sample_rate=16000)
        meta, frames = _jread(spark, blob)
        assert meta["bits"] == 8 and meta["encoding"] == "PCM_UNSIGNED"
        assert frames == pcm.tobytes()

    def test_float32_frames_bit_exact(self, spark):
        pcm = (_sine(scale=0.7)).astype(np.float32)
        blob = encode_wav(pcm, sample_rate=44100)
        meta, frames = _jread(spark, blob)
        assert meta["encoding"] == "PCM_FLOAT" and meta["bits"] == 32
        assert frames == pcm.astype("<f4").tobytes()


class TestG711Conformance:
    @pytest.mark.parametrize("law", ["mu", "a"])
    def test_expansion_matches_jvm(self, spark, law):
        """Our G.711 expansion to 16-bit must match the JVM's converter
        sample-for-sample (the round-4 note about the baked-in >>3 is
        exactly the class of convention this cross-checks)."""
        pcm = np.round(_sine(scale=20000)).astype(np.int16)
        blob = encode_wav(pcm, sample_rate=8000, law=law)
        meta, _ = _jread(spark, blob)
        assert meta["encoding"] == ("ULAW" if law == "mu" else "ALAW")
        theirs = _jread_as_pcm16(spark, blob)
        mine, rate = decode_wav(blob)
        assert rate == 8000
        assert mine.dtype == np.int16 and mine.shape == theirs.shape
        assert np.array_equal(mine, theirs)
