"""Compressed-audio metadata extraction (MP3/MP2/MP1, Ogg Vorbis/Opus,
ADTS AAC) — no PCM decode, no external libraries.

Scraped web audio is overwhelmingly perceptual-codec compressed; full PCM
decode of MP3 Layer III / Vorbis needs tables and filterbanks beyond
from-scratch scope here (the documented boundary — decode_audio_features
raises a typed reason). But a 100 TB crawl's triage needs don't require
PCM: duration, sample rate, channels, frame count and bitrate come from
FRAME HEADERS, which these formats expose losslessly:

- MPEG audio (MP1/MP2/MP3): 4-byte frame headers every frame; walking them
  gives exact frame/sample counts (VBR-correct — no Xing estimate needed),
  after skipping ID3v2 (syncsafe size) and ID3v1 tags.
- Ogg: page-level 'OggS' capture structure; the first packet identifies the
  codec ('\\x01vorbis' / 'OpusHead' headers carry channels + rate), the
  last page's granule position gives the total sample count.
- ADTS AAC: 7/9-byte headers with an explicit 13-bit frame length; 1024
  samples per frame.
- ISO BMFF (MP4/M4A/MOV): a length-prefixed box tree; the moov walk reads
  codec fourcc, sample rate/channels (stsd), frame count (stsz) and
  duration (mdhd) for every track — audio and video — without touching a
  codec payload byte.

Everything here is a pure function of the blob (exception text included),
so the Spark path and any serial oracle agree bit-for-bit.
"""

from __future__ import annotations

import struct

# MPEG audio tables (ISO/IEC 11172-3 / 13818-3, public)
_MPEG_BITRATES = {
    # (version_group, layer): kbps by index 1..14 (0=free, 15=bad)
    ("1", 1): (0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448),
    ("1", 2): (0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384),
    ("1", 3): (0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320),
    ("2", 1): (0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256),
    ("2", 2): (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
    ("2", 3): (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
}
_MPEG_RATES = {
    "1": (44100, 48000, 32000),
    "2": (22050, 24000, 16000),
    "2.5": (11025, 12000, 8000),
}
_VERSION_BITS = {0: "2.5", 2: "2", 3: "1"}  # 1 = reserved
_LAYER_BITS = {1: 3, 2: 2, 3: 1}  # header bits -> layer number


def _id3v2_size(data: bytes) -> int:
    """Bytes to skip for a leading ID3v2 tag (syncsafe 28-bit size)."""
    if data[:3] != b"ID3" or len(data) < 10:
        return 0
    sz = ((data[6] & 0x7F) << 21) | ((data[7] & 0x7F) << 14) | \
         ((data[8] & 0x7F) << 7) | (data[9] & 0x7F)
    footer = 10 if (data[5] & 0x10) else 0
    return 10 + sz + footer


def _parse_mpeg_header(b0: int, b1: int, b2: int, b3: int):
    """4 header bytes -> (version, layer, bitrate_kbps, sample_rate,
    padding, channels, samples_per_frame, frame_bytes) or None."""
    if b0 != 0xFF or (b1 & 0xE0) != 0xE0:
        return None
    vb = (b1 >> 3) & 3
    lb = (b1 >> 1) & 3
    if vb == 1 or lb == 0:
        return None  # reserved version / layer 00 (= ADTS, not MPEG audio)
    version = _VERSION_BITS[vb]
    layer = _LAYER_BITS[lb]
    br_idx = (b2 >> 4) & 0xF
    sr_idx = (b2 >> 2) & 3
    if br_idx in (0, 15) or sr_idx == 3:
        return None  # free-format unsupported; invalid rate
    vgroup = "1" if version == "1" else "2"
    bitrate = _MPEG_BITRATES[(vgroup, layer)][br_idx]
    rate = _MPEG_RATES[version][sr_idx]
    padding = (b2 >> 1) & 1
    channels = 1 if ((b3 >> 6) & 3) == 3 else 2
    if layer == 1:
        spf = 384
        frame = (12 * bitrate * 1000 // rate + padding) * 4
    elif layer == 2:
        spf = 1152
        frame = 144 * bitrate * 1000 // rate + padding
    else:  # layer III
        spf = 1152 if version == "1" else 576
        frame = (spf // 8) * bitrate * 1000 // rate + padding
    return version, layer, bitrate, rate, padding, channels, spf, frame


def mpeg_audio_metadata(data: bytes) -> dict:
    """Walk every MPEG-audio frame; exact even for VBR streams."""
    pos = _id3v2_size(data)
    end = len(data)
    if end >= 128 and data[-128:-125] == b"TAG":  # ID3v1 trailer
        end -= 128
    # resync to the first valid header (streams often carry junk prefixes)
    first = None
    while pos + 4 <= end:
        hdr = _parse_mpeg_header(data[pos], data[pos + 1], data[pos + 2], data[pos + 3])
        if hdr is not None:
            first = hdr
            break
        pos += 1
    if first is None:
        raise ValueError("MPEG audio: no valid frame header found")
    version, layer, _, rate, _, channels, spf, _ = first
    n_frames = 0
    n_samples = 0
    kbps_sum = 0
    while pos + 4 <= end:
        hdr = _parse_mpeg_header(data[pos], data[pos + 1], data[pos + 2], data[pos + 3])
        if hdr is None or hdr[3] != rate or hdr[1] != layer:
            break  # stream ended or desynced; report what was walked
        n_frames += 1
        n_samples += hdr[6]
        kbps_sum += hdr[2]
        pos += hdr[7]
    return {
        "container": "mpeg-audio",
        "codec": {1: "mp1", 2: "mp2", 3: "mp3"}[layer],
        "sample_rate": rate,
        "n_channels": channels,
        "n_frames": n_frames,
        "n_samples": n_samples,
        "duration_s": round(n_samples / rate, 6),
        "bitrate_kbps": round(kbps_sum / n_frames, 3) if n_frames else 0.0,
    }


# --- Ogg ------------------------------------------------------------------


def _ogg_pages(data: bytes):
    pos = 0
    while pos + 27 <= len(data):
        if data[pos : pos + 4] != b"OggS":
            raise ValueError("Ogg: lost page sync")
        nseg = data[pos + 26]
        if pos + 27 + nseg > len(data):
            break
        lacing = data[pos + 27 : pos + 27 + nseg]
        body_len = sum(lacing)
        body_start = pos + 27 + nseg
        if body_start + body_len > len(data):
            break
        granule = struct.unpack("<q", data[pos + 6 : pos + 14])[0]
        yield granule, data[body_start : body_start + body_len]
        pos = body_start + body_len


def ogg_metadata(data: bytes) -> dict:
    if data[:4] != b"OggS":
        raise ValueError("Ogg: bad capture pattern")
    pages = list(_ogg_pages(data))
    if not pages:
        raise ValueError("Ogg: no complete pages")
    first = pages[0][1]
    last_granule = max(g for g, _ in pages if g >= 0)
    if first[:7] == b"\x01vorbis":
        if len(first) < 16:
            raise ValueError("Ogg: truncated vorbis ident header")
        channels = first[11]
        rate = struct.unpack("<I", first[12:16])[0]
        return {
            "container": "ogg",
            "codec": "vorbis",
            "sample_rate": rate,
            "n_channels": channels,
            "n_frames": len(pages),
            "n_samples": last_granule,
            "duration_s": round(last_granule / rate, 6) if rate else 0.0,
            "bitrate_kbps": round(len(data) * 8 / 1000 / (last_granule / rate), 3)
            if rate and last_granule else 0.0,
        }
    if first[:8] == b"OpusHead":
        if len(first) < 19:
            raise ValueError("Ogg: truncated OpusHead")
        channels = first[9]
        preskip = struct.unpack("<H", first[10:12])[0]
        input_rate = struct.unpack("<I", first[12:16])[0]
        n = max(0, last_granule - preskip)  # granule is ALWAYS 48 kHz for opus
        return {
            "container": "ogg",
            "codec": "opus",
            "sample_rate": 48000,
            "n_channels": channels,
            "n_frames": len(pages),
            "n_samples": n,
            "duration_s": round(n / 48000, 6),
            "bitrate_kbps": round(len(data) * 8 / 1000 / (n / 48000), 3) if n else 0.0,
            "input_sample_rate": input_rate,
        }
    raise ValueError("Ogg: unrecognized codec ident packet")


# --- ADTS AAC ---------------------------------------------------------------

_AAC_RATES = (96000, 88200, 64000, 48000, 44100, 32000, 24000, 22050,
              16000, 12000, 11025, 8000, 7350)


def adts_metadata(data: bytes) -> dict:
    pos = 0
    n_frames = 0
    rate = None
    channels = None
    while pos + 7 <= len(data):
        if data[pos] != 0xFF or (data[pos + 1] & 0xF6) != 0xF0:
            break  # sync lost / stream end (layer bits must be 00)
        sr_idx = (data[pos + 2] >> 2) & 0xF
        if sr_idx >= len(_AAC_RATES):
            break
        ch = ((data[pos + 2] & 1) << 2) | (data[pos + 3] >> 6)
        frame_len = ((data[pos + 3] & 3) << 11) | (data[pos + 4] << 3) | (data[pos + 5] >> 5)
        if frame_len < 7 or pos + frame_len > len(data):
            break
        if rate is None:
            rate, channels = _AAC_RATES[sr_idx], ch
        n_frames += 1
        pos += frame_len
    if not n_frames:
        raise ValueError("ADTS: no valid frames")
    n_samples = n_frames * 1024
    return {
        "container": "adts",
        "codec": "aac",
        "sample_rate": rate,
        "n_channels": channels,
        "n_frames": n_frames,
        "n_samples": n_samples,
        "duration_s": round(n_samples / rate, 6),
        "bitrate_kbps": round(len(data) * 8 / 1000 / (n_samples / rate), 3),
    }


# --- ISO BMFF (MP4 / M4A / MOV) ---------------------------------------------
#
# The moov box walk: a plain length-prefixed tree (ISO/IEC 14496-12,
# public). No codec payload is touched — track metadata (codec fourcc,
# sample rate, channels, frame count, duration, and video dims) lives
# entirely in sample-table / header boxes, so triage of the web's
# dominant A/V container needs no DSP at all.


def _mp4_boxes(data: bytes, start: int, end: int):
    """Iterate (fourcc, body_start, body_end) over sibling boxes."""
    pos = start
    while pos + 8 <= end:
        (size,) = struct.unpack(">I", data[pos : pos + 4])
        fourcc = data[pos + 4 : pos + 8]
        hdr = 8
        if size == 1:
            if pos + 16 > end:
                raise ValueError("mp4: truncated 64-bit box size")
            (size,) = struct.unpack(">Q", data[pos + 8 : pos + 16])
            hdr = 16
        elif size == 0:  # box extends to the end of the enclosing scope
            size = end - pos
        if size < hdr or pos + size > end:
            raise ValueError("mp4: box overruns its container")
        yield fourcc, pos + hdr, pos + size
        pos += size


def _mp4_child(data: bytes, start: int, end: int, fourcc: bytes):
    for fc, s, e in _mp4_boxes(data, start, end):
        if fc == fourcc:
            return s, e
    return None


def _mp4_track_info(data: bytes, s: int, e: int) -> dict:
    """One trak box -> handler/codec/timescale/duration (+ audio or video
    specifics)."""
    info: dict = {"handler": None, "codec": None, "timescale": None,
                  "duration": None, "sample_rate": None, "n_channels": None,
                  "n_frames": None, "width": None, "height": None}
    mdia = _mp4_child(data, s, e, b"mdia")
    if mdia is None:
        raise ValueError("mp4: trak without mdia")
    mdhd = _mp4_child(data, *mdia, b"mdhd")
    if mdhd is None:
        raise ValueError("mp4: trak without mdhd")
    ms, me = mdhd
    ver = data[ms]
    if ver == 1:
        if me - ms < 32:
            raise ValueError("mp4: truncated mdhd v1")
        info["timescale"] = struct.unpack(">I", data[ms + 20 : ms + 24])[0]
        info["duration"] = struct.unpack(">Q", data[ms + 24 : ms + 32])[0]
    else:
        if me - ms < 20:
            raise ValueError("mp4: truncated mdhd")
        info["timescale"] = struct.unpack(">I", data[ms + 12 : ms + 16])[0]
        info["duration"] = struct.unpack(">I", data[ms + 16 : ms + 20])[0]
    hdlr = _mp4_child(data, *mdia, b"hdlr")
    if hdlr is not None:
        hs, he = hdlr
        if he - hs >= 12:
            info["handler"] = data[hs + 8 : hs + 12].decode("ascii", "replace")
    minf = _mp4_child(data, *mdia, b"minf")
    stbl = _mp4_child(data, *minf, b"stbl") if minf else None
    if stbl is None:
        return info
    stsd = _mp4_child(data, *stbl, b"stsd")
    if stsd is not None:
        ss, se = stsd
        if se - ss >= 8 and struct.unpack(">I", data[ss + 4 : ss + 8])[0] >= 1:
            # first sample entry: a box whose fourcc names the codec
            for fc, es, ee in _mp4_boxes(data, ss + 8, se):
                info["codec"] = fc.decode("ascii", "replace").strip()
                if info["handler"] == "soun" and ee - es >= 28:
                    # AudioSampleEntry: 6 reserved + 2 dref index, then
                    # 2+2+4 version/revision/vendor, channelcount(2),
                    # samplesize(2), 2+2, samplerate as 16.16 fixed
                    info["n_channels"] = struct.unpack(
                        ">H", data[es + 16 : es + 18])[0]
                    info["sample_rate"] = struct.unpack(
                        ">I", data[es + 24 : es + 28])[0] >> 16
                elif info["handler"] == "vide" and ee - es >= 36:
                    # VisualSampleEntry: ... width(2) height(2) at +24/+26
                    info["width"] = struct.unpack(">H", data[es + 24 : es + 26])[0]
                    info["height"] = struct.unpack(">H", data[es + 26 : es + 28])[0]
                break
    stsz = _mp4_child(data, *stbl, b"stsz")
    if stsz is not None:
        zs, ze = stsz
        if ze - zs >= 12:
            info["n_frames"] = struct.unpack(">I", data[zs + 8 : zs + 12])[0]
    return info


def mp4_tracks(data: bytes) -> list:
    """All trak boxes of an ISO-BMFF file as metadata dicts (audio AND
    video — the crawl triage view of an MP4/M4A/MOV blob)."""
    if len(data) < 12 or data[4:8] != b"ftyp":
        raise ValueError("mp4: missing ftyp")
    moov = _mp4_child(data, 0, len(data), b"moov")
    if moov is None:
        raise ValueError("mp4: no moov box (streaming-only fragment?)")
    tracks = []
    for fc, s, e in _mp4_boxes(data, *moov):
        if fc == b"trak":
            tracks.append(_mp4_track_info(data, s, e))
    if not tracks:
        raise ValueError("mp4: moov contains no trak")
    return tracks


_MP4_CODEC_NAMES = {"mp4a": "aac", "Opus": "opus", "fLaC": "flac",
                    "alac": "alac", "ac-3": "ac3", "ec-3": "eac3",
                    "sowt": "pcm", "twos": "pcm", "lpcm": "pcm"}


def mp4_metadata(data: bytes) -> dict:
    """First audio track of an MP4/M4A -> the audio_metadata() row shape.
    For audio tracks the mdhd timescale is conventionally the sample rate,
    so mdhd duration IS the sample count; when they differ, rescale."""
    tracks = mp4_tracks(data)
    t = next((t for t in tracks if t["handler"] == "soun"), None)
    if t is None:
        kinds = ",".join(sorted({t["handler"] or "?" for t in tracks}))
        raise ValueError(f"mp4: no audio track (handlers: {kinds})")
    rate = t["sample_rate"] or t["timescale"]
    ts, dur = t["timescale"], t["duration"]
    if not ts or not rate:
        raise ValueError("mp4: audio track without timescale/sample rate")
    n_samples = dur if ts == rate else round(dur / ts * rate)
    dur_s = round(dur / ts, 6)
    return {
        "container": "mp4",
        "codec": _MP4_CODEC_NAMES.get(t["codec"], t["codec"]),
        "sample_rate": rate,
        "n_channels": t["n_channels"],
        "n_frames": t["n_frames"],
        "n_samples": n_samples,
        "duration_s": dur_s,
        "bitrate_kbps": round(len(data) * 8 / 1000 / dur_s, 3) if dur_s else 0.0,
    }


# --- dispatch ---------------------------------------------------------------


def sniff_audio(data: bytes) -> str:
    """Container/codec sniff by magic; 'unknown' when nothing matches."""
    if len(data) < 4:
        return "unknown"
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        return "wav"
    if data[:4] == b"fLaC":
        return "flac"
    if data[:4] == b"OggS":
        try:
            first = next(_ogg_pages(data))[1]
        except (ValueError, StopIteration):
            return "ogg"
        if first[:7] == b"\x01vorbis":
            return "ogg-vorbis"
        if first[:8] == b"OpusHead":
            return "ogg-opus"
        return "ogg"
    if data[4:8] == b"ftyp":
        return "mp4"
    if data[:3] == b"ID3":
        return "mp3"
    if data[0] == 0xFF and (data[1] & 0xE0) == 0xE0:
        if ((data[1] >> 1) & 3) == 0:
            return "aac-adts"
        lb = _LAYER_BITS.get((data[1] >> 1) & 3)
        return {1: "mp1", 2: "mp2", 3: "mp3"}.get(lb, "unknown")
    return "unknown"


def audio_metadata(data: bytes) -> dict:
    """Header-walk metadata for any recognized audio blob. WAV/FLAC go
    through the real decoders (they are cheap and exact); compressed
    formats through the frame/page walkers above. Raises ValueError on
    unrecognized blobs (the decode_error path)."""
    kind = sniff_audio(data)
    if kind == "wav":
        from etlpy_spark.functions.mediacodec import decode_wav

        samples, rate = decode_wav(data)
        return {
            "container": "riff", "codec": "pcm", "sample_rate": rate,
            "n_channels": samples.shape[1], "n_frames": samples.shape[0],
            "n_samples": samples.shape[0],
            "duration_s": round(samples.shape[0] / rate, 6) if rate else 0.0,
            "bitrate_kbps": round(len(data) * 8 / 1000
                                  / (samples.shape[0] / rate), 3)
            if rate and samples.shape[0] else 0.0,
        }
    if kind == "flac":
        from etlpy_spark.functions.flaccodec import decode_flac

        samples, rate = decode_flac(data)
        return {
            "container": "flac", "codec": "flac", "sample_rate": rate,
            "n_channels": samples.shape[1], "n_frames": samples.shape[0],
            "n_samples": samples.shape[0],
            "duration_s": round(samples.shape[0] / rate, 6) if rate else 0.0,
            "bitrate_kbps": round(len(data) * 8 / 1000
                                  / (samples.shape[0] / rate), 3)
            if rate and samples.shape[0] else 0.0,
        }
    if kind in ("mp1", "mp2", "mp3"):
        return mpeg_audio_metadata(data)
    if kind in ("ogg", "ogg-vorbis", "ogg-opus"):
        return ogg_metadata(data)
    if kind == "aac-adts":
        return adts_metadata(data)
    if kind == "mp4":
        return mp4_metadata(data)
    raise ValueError("unrecognized audio container")


# --- deterministic synthetic streams (tests/fixtures) -----------------------


def make_mpeg_audio(n_frames: int, *, layer: int = 3, version: str = "1",
                    bitrate: int = 128, rate: int = 44100,
                    channels: int = 2, seed: int = 7) -> bytes:
    """A structurally valid MPEG-audio stream: real frame headers with the
    requested parameters, deterministic pseudo-random payload (no PCM
    meaning — metadata walkers never look at payload bits)."""
    vb = {"1": 3, "2": 2, "2.5": 0}[version]
    lb = {1: 3, 2: 2, 3: 1}[layer]
    vgroup = "1" if version == "1" else "2"
    br_idx = _MPEG_BITRATES[(vgroup, layer)].index(bitrate)
    sr_idx = _MPEG_RATES[version].index(rate)
    mode = 3 if channels == 1 else 0
    out = bytearray()
    state = seed & 0xFFFFFFFF
    for i in range(n_frames):
        padding = 0
        b1 = 0xE0 | (vb << 3) | (lb << 1) | 1  # no CRC
        b2 = (br_idx << 4) | (sr_idx << 2) | (padding << 1)
        b3 = mode << 6
        hdr = _parse_mpeg_header(0xFF, b1, b2, b3)
        frame_len = hdr[7]
        out += bytes((0xFF, b1, b2, b3))
        for _ in range(frame_len - 4):
            state = (state * 1103515245 + 12345) & 0xFFFFFFFF
            out.append((state >> 16) & 0xFF)
    return bytes(out)


def make_ogg(codec: str, n_pages: int, *, rate: int = 44100, channels: int = 2,
             samples_per_page: int = 4096, seed: int = 3) -> bytes:
    """Structurally valid Ogg stream: ident-header first page + data pages
    with monotone granule positions."""
    def page(granule: int, body: bytes, header_type: int, seq: int) -> bytes:
        lacing = []
        rem = len(body)
        while rem >= 255:
            lacing.append(255)
            rem -= 255
        lacing.append(rem)
        hdr = (b"OggS" + bytes([0, header_type]) + struct.pack("<q", granule)
               + struct.pack("<I", 0xDEAD) + struct.pack("<I", seq)
               + struct.pack("<I", 0) + bytes([len(lacing)]) + bytes(lacing))
        return hdr + body

    if codec == "vorbis":
        ident = (b"\x01vorbis" + struct.pack("<I", 0) + bytes([channels])
                 + struct.pack("<I", rate) + b"\x00" * 16 + b"\x01")
        gran_per_page = samples_per_page
    elif codec == "opus":
        ident = (b"OpusHead" + bytes([1, channels]) + struct.pack("<H", 312)
                 + struct.pack("<I", rate) + struct.pack("<h", 0) + b"\x00")
        gran_per_page = samples_per_page  # 48 kHz granules
    else:
        raise ValueError(codec)
    out = page(0, ident, 2, 0)  # BOS
    state = seed & 0xFFFFFFFF
    for i in range(1, n_pages):
        body = bytearray()
        for _ in range(100):
            state = (state * 1103515245 + 12345) & 0xFFFFFFFF
            body.append((state >> 16) & 0xFF)
        htype = 4 if i == n_pages - 1 else 0  # EOS on the last page
        out += page(i * gran_per_page, bytes(body), htype, i)
    return out


def make_adts(n_frames: int, *, rate: int = 44100, channels: int = 2,
              frame_payload: int = 200, seed: int = 11) -> bytes:
    sr_idx = _AAC_RATES.index(rate)
    out = bytearray()
    state = seed & 0xFFFFFFFF
    for _ in range(n_frames):
        frame_len = 7 + frame_payload
        b = bytearray(7)
        b[0] = 0xFF
        b[1] = 0xF1  # MPEG-4, layer 00, no CRC
        b[2] = (1 << 6) | (sr_idx << 2) | ((channels >> 2) & 1)
        b[3] = ((channels & 3) << 6) | ((frame_len >> 11) & 3)
        b[4] = (frame_len >> 3) & 0xFF
        b[5] = ((frame_len & 7) << 5) | 0x1F
        b[6] = 0xFC
        out += b
        for _ in range(frame_payload):
            state = (state * 1103515245 + 12345) & 0xFFFFFFFF
            out.append((state >> 16) & 0xFF)
    return bytes(out)


def _mp4_box(fourcc: bytes, *payload: bytes) -> bytes:
    body = b"".join(payload)
    return struct.pack(">I", 8 + len(body)) + fourcc + body


def make_mp4_audio(n_frames: int, *, codec: str = "aac", rate: int = 44100,
                   channels: int = 2, frame_samples: int = 1024,
                   frame_payload: int = 200, mdhd_version: int = 0,
                   mdhd_timescale: int = 0, with_video_track: bool = False,
                   seed: int = 5) -> bytes:
    """A structurally valid M4A/MP4: ftyp + mdat (pseudo-random payload the
    walker never reads) + moov with a full audio sample table. Optionally a
    leading video trak (avc1 640x360) so no-audio-first ordering and the
    video triage path are testable."""
    fourcc = {"aac": b"mp4a", "opus": b"Opus", "flac": b"fLaC"}[codec]
    n_samples = n_frames * frame_samples
    state = seed & 0xFFFFFFFF
    payload = bytearray()
    for _ in range(n_frames * frame_payload):
        state = (state * 1103515245 + 12345) & 0xFFFFFFFF
        payload.append((state >> 16) & 0xFF)
    ftyp = _mp4_box(b"ftyp", b"M4A ", struct.pack(">I", 0), b"isomM4A ")
    mdat = _mp4_box(b"mdat", bytes(payload))
    matrix = struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)

    def full(ver: int = 0, flags: int = 0) -> bytes:
        return struct.pack(">I", (ver << 24) | flags)

    # audio mdhd timescale is conventionally the sample rate; an explicit
    # mdhd_timescale exercises the walker's rescale branch
    ts = mdhd_timescale or rate
    dur = n_samples if ts == rate else round(n_samples / rate * ts)
    if mdhd_version == 1:
        mdhd = _mp4_box(b"mdhd", full(1), struct.pack(">QQIQ", 0, 0, ts, dur),
                        struct.pack(">HH", 0x55C4, 0))
    else:
        mdhd = _mp4_box(b"mdhd", full(), struct.pack(">IIII", 0, 0, ts, dur),
                        struct.pack(">HH", 0x55C4, 0))
    hdlr = _mp4_box(b"hdlr", full(), b"\x00" * 4, b"soun", b"\x00" * 12,
                    b"SoundHandler\x00")
    entry_extra = b""
    if codec == "opus":
        entry_extra = _mp4_box(b"dOps", bytes([0, channels]),
                               struct.pack(">H", 312), struct.pack(">I", rate),
                               struct.pack(">h", 0), b"\x00")
    elif codec == "aac":
        entry_extra = _mp4_box(b"esds", full(), b"\x03\x19\x00\x01\x00")
    sample_entry = _mp4_box(
        fourcc, b"\x00" * 6, struct.pack(">H", 1),
        struct.pack(">HHI", 0, 0, 0), struct.pack(">HH", channels, 16),
        struct.pack(">HH", 0, 0), struct.pack(">I", rate << 16), entry_extra)
    stsd = _mp4_box(b"stsd", full(), struct.pack(">I", 1), sample_entry)
    stts = _mp4_box(b"stts", full(), struct.pack(">III", 1, n_frames,
                                                 frame_samples))
    stsc = _mp4_box(b"stsc", full(), struct.pack(">IIII", 1, 1, n_frames, 1))
    stsz = _mp4_box(b"stsz", full(), struct.pack(">II", 0, n_frames),
                    struct.pack(f">{n_frames}I",
                                *([frame_payload] * n_frames)))
    stco = _mp4_box(b"stco", full(), struct.pack(">II", 1, len(ftyp) + 8))
    stbl = _mp4_box(b"stbl", stsd, stts, stsc, stsz, stco)
    dref = _mp4_box(b"dref", full(), struct.pack(">I", 1),
                    _mp4_box(b"url ", full(0, 1)))
    minf = _mp4_box(b"minf", _mp4_box(b"smhd", full(), struct.pack(">HH", 0, 0)),
                    _mp4_box(b"dinf", dref), stbl)
    mdia = _mp4_box(b"mdia", mdhd, hdlr, minf)
    tkhd = _mp4_box(b"tkhd", full(0, 7), struct.pack(">IIIII", 0, 0, 1, 0,
                                                     n_samples),
                    b"\x00" * 8, struct.pack(">HHHH", 0, 0, 0x0100, 0),
                    matrix, struct.pack(">II", 0, 0))
    trak = _mp4_box(b"trak", tkhd, mdia)
    traks = [trak]
    if with_video_track:
        vmdhd = _mp4_box(b"mdhd", full(),
                         struct.pack(">IIII", 0, 0, 30000, 30000 * 4),
                         struct.pack(">HH", 0x55C4, 0))
        vhdlr = _mp4_box(b"hdlr", full(), b"\x00" * 4, b"vide", b"\x00" * 12,
                         b"VideoHandler\x00")
        ventry = _mp4_box(b"avc1", b"\x00" * 6, struct.pack(">H", 1),
                          b"\x00" * 16, struct.pack(">HH", 640, 360),
                          b"\x00" * 50)
        vstsd = _mp4_box(b"stsd", full(), struct.pack(">I", 1), ventry)
        vstsz = _mp4_box(b"stsz", full(), struct.pack(">II", 120, 120))
        vstbl = _mp4_box(b"stbl", vstsd, vstsz)
        vminf = _mp4_box(b"minf", _mp4_box(b"dinf", dref), vstbl)
        vmdia = _mp4_box(b"mdia", vmdhd, vhdlr, vminf)
        vtkhd = _mp4_box(b"tkhd", full(0, 7),
                         struct.pack(">IIIII", 0, 0, 2, 0, 240), b"\x00" * 8,
                         struct.pack(">HHHH", 0, 0, 0, 0), matrix,
                         struct.pack(">II", 640 << 16, 360 << 16))
        traks.insert(0, _mp4_box(b"trak", vtkhd, vmdia))
    mvhd = _mp4_box(b"mvhd", full(),
                    struct.pack(">IIII", 0, 0, 600,
                                round(n_samples / rate * 600)),
                    struct.pack(">IHH", 0x10000, 0x0100, 0), b"\x00" * 8,
                    matrix, b"\x00" * 24, struct.pack(">I", 3))
    moov = _mp4_box(b"moov", mvhd, *traks)
    return ftyp + mdat + moov
