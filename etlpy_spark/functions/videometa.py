"""Video container triage metadata, numpy-free stdlib only.

Real web video is MP4/H.264 and WebM/VP9-AV1 — inter-frame codecs this
engine does not decode from scratch (documented boundary). What the
corpus path needs from those blobs is exact TRIAGE: container, codec,
dimensions, duration, frame count — enough to size, filter, route and
cost a video corpus without touching a single coded frame. This module
provides it:

- ``mp4_video_metadata``: first video track of an ISO-BMFF file (reuses
  the moov walk in functions/audiometa.py — tkhd-independent: codec
  fourcc + dimensions from the stsd VisualSampleEntry, frame count from
  stsz, duration from mdhd).
- ``mkv_tracks`` / ``webm_video_metadata``: a from-scratch EBML walk
  (Matroska/WebM: varint IDs and sizes, Segment → Info for
  TimestampScale/Duration, Tracks → TrackEntry for
  TrackType/CodecID/PixelWidth/PixelHeight/audio fields).
- ``video_metadata``: sniff + dispatch → one typed row shape; raises
  ValueError with the sniffed type on undecodable/malformed input (the
  decode_error convention).
- ``encode_mp4_video_stub`` / ``encode_webm_stub``: minimal VALID
  fixture builders so triage tests are differential (the house pattern:
  the encoder emits what the walker accepts).
"""

from __future__ import annotations

import struct

# ---------------------------------------------------------------------------
# ISO-BMFF (MP4/MOV) video face of the audiometa moov walk


def mp4_video_metadata(data: bytes) -> dict:
    """First video track of an MP4/MOV → triage row. Raises ValueError
    when there is no video track (audio-only M4A etc.)."""
    from etlpy_spark.functions.audiometa import mp4_tracks

    tracks = mp4_tracks(data)
    t = next((t for t in tracks if t["handler"] == "vide"), None)
    if t is None:
        kinds = ",".join(sorted({t["handler"] or "?" for t in tracks}))
        raise ValueError(f"mp4: no video track (handlers: {kinds})")
    ts, dur = t["timescale"], t["duration"]
    dur_s = round(dur / ts, 6) if ts else 0.0
    n = t["n_frames"] or 0
    return {
        "container": "mp4",
        "codec": t["codec"],
        "width": t["width"],
        "height": t["height"],
        "n_frames": n,
        "duration_s": dur_s,
        "fps": round(n / dur_s, 3) if dur_s else 0.0,
    }


# ---------------------------------------------------------------------------
# EBML / Matroska / WebM

_ID_EBML = 0x1A45DFA3
_ID_DOCTYPE = 0x4282
_ID_SEGMENT = 0x18538067
_ID_INFO = 0x1549A966
_ID_TIMESCALE = 0x2AD7B1
_ID_DURATION = 0x4489
_ID_TRACKS = 0x1654AE6B
_ID_TRACKENTRY = 0xAE
_ID_TRACKTYPE = 0x83
_ID_CODECID = 0x86
_ID_VIDEO = 0xE0
_ID_PIXELWIDTH = 0xB0
_ID_PIXELHEIGHT = 0xBA
_ID_AUDIO = 0xE1
_ID_SAMPLINGFREQ = 0xB5
_ID_CHANNELS = 0x9F


def _vint(data: bytes, pos: int, strip_marker: bool):
    """EBML variable-length integer at ``pos`` → (value, next_pos). IDs
    keep the length-marker bit (the conventional ID numbering); sizes
    strip it. An all-ones size means 'unknown' → None."""
    if pos >= len(data):
        raise ValueError("ebml: truncated varint")
    b0 = data[pos]
    if b0 == 0:
        raise ValueError("ebml: invalid varint lead byte")
    length = 9 - b0.bit_length()
    if pos + length > len(data):
        raise ValueError("ebml: truncated varint body")
    raw = int.from_bytes(data[pos : pos + length], "big")
    if strip_marker:
        val = raw & ((1 << (7 * length)) - 1)
        if val == (1 << (7 * length)) - 1:
            return None, pos + length  # unknown size
        return val, pos + length
    return raw, pos + length


def _ebml_children(data: bytes, start: int, end: int):
    """Yield (id, payload_start, payload_end) for each child element."""
    pos = start
    while pos < end:
        eid, pos = _vint(data, pos, strip_marker=False)
        size, pos = _vint(data, pos, strip_marker=True)
        pend = end if size is None else min(pos + size, end)
        yield eid, pos, pend
        pos = pend


def _uint(data: bytes, s: int, e: int) -> int:
    return int.from_bytes(data[s:e], "big")


def _float(data: bytes, s: int, e: int) -> float:
    n = e - s
    if n == 4:
        return struct.unpack(">f", data[s:e])[0]
    if n == 8:
        return struct.unpack(">d", data[s:e])[0]
    raise ValueError("ebml: bad float width")


def mkv_tracks(data: bytes) -> dict:
    """EBML walk → {'doctype', 'duration_s', 'tracks': [...]}, each track
    {'type': 'video'|'audio'|other-int, 'codec', 'width', 'height',
    'sample_rate', 'n_channels'}."""
    if len(data) < 4 or data[:4] != b"\x1a\x45\xdf\xa3":
        raise ValueError("ebml: missing header")
    doctype = None
    duration = None
    timescale = 1_000_000  # ns per tick, Matroska default
    tracks: list[dict] = []
    for eid, s, e in _ebml_children(data, 0, len(data)):
        if eid == _ID_EBML:
            for cid, cs, ce in _ebml_children(data, s, e):
                if cid == _ID_DOCTYPE:
                    doctype = data[cs:ce].split(b"\x00")[0].decode("ascii", "replace")
        elif eid == _ID_SEGMENT:
            for cid, cs, ce in _ebml_children(data, s, e):
                if cid == _ID_INFO:
                    for iid, i_s, i_e in _ebml_children(data, cs, ce):
                        if iid == _ID_TIMESCALE:
                            timescale = _uint(data, i_s, i_e)
                        elif iid == _ID_DURATION:
                            duration = _float(data, i_s, i_e)
                elif cid == _ID_TRACKS:
                    for tid, ts_, te in _ebml_children(data, cs, ce):
                        if tid != _ID_TRACKENTRY:
                            continue
                        t = {"type": None, "codec": None, "width": None,
                             "height": None, "sample_rate": None,
                             "n_channels": None}
                        for fid, fs, fe in _ebml_children(data, ts_, te):
                            if fid == _ID_TRACKTYPE:
                                v = _uint(data, fs, fe)
                                t["type"] = {1: "video", 2: "audio"}.get(v, v)
                            elif fid == _ID_CODECID:
                                t["codec"] = data[fs:fe].split(b"\x00")[0].decode(
                                    "ascii", "replace")
                            elif fid == _ID_VIDEO:
                                for vid, vs, ve in _ebml_children(data, fs, fe):
                                    if vid == _ID_PIXELWIDTH:
                                        t["width"] = _uint(data, vs, ve)
                                    elif vid == _ID_PIXELHEIGHT:
                                        t["height"] = _uint(data, vs, ve)
                            elif fid == _ID_AUDIO:
                                for aid, as_, ae in _ebml_children(data, fs, fe):
                                    if aid == _ID_SAMPLINGFREQ:
                                        t["sample_rate"] = int(_float(data, as_, ae))
                                    elif aid == _ID_CHANNELS:
                                        t["n_channels"] = _uint(data, as_, ae)
                        tracks.append(t)
    if not tracks:
        raise ValueError("ebml: no track entries")
    dur_s = round(duration * timescale / 1e9, 6) if duration is not None else None
    return {"doctype": doctype or "matroska", "duration_s": dur_s, "tracks": tracks}


def webm_video_metadata(data: bytes) -> dict:
    info = mkv_tracks(data)
    t = next((t for t in info["tracks"] if t["type"] == "video"), None)
    if t is None:
        kinds = ",".join(sorted(str(t["type"]) for t in info["tracks"]))
        raise ValueError(f"webm: no video track (types: {kinds})")
    return {
        "container": info["doctype"],
        "codec": t["codec"],
        "width": t["width"],
        "height": t["height"],
        "n_frames": 0,  # Matroska has no up-front frame count box
        "duration_s": info["duration_s"] or 0.0,
        "fps": 0.0,
    }


# ---------------------------------------------------------------------------
# dispatch


def sniff_video(data: bytes) -> str:
    if len(data) >= 12 and data[4:8] == b"ftyp":
        return "mp4"
    if data[:4] == b"\x1a\x45\xdf\xa3":
        return "webm"
    if data[:4] == b"RIFF" and data[8:12] == b"AVI ":
        return "avi"
    if data[:9] == b"YUV4MPEG2":
        return "y4m"
    return "unknown"


def video_metadata(data: bytes) -> dict:
    """Typed triage for a video blob: container/codec/dims/duration.
    MP4 and WebM walk their metadata trees; AVI and Y4M (decodable here)
    report through their demuxers; anything else raises typed."""
    kind = sniff_video(data)
    if kind == "mp4":
        return mp4_video_metadata(data)
    if kind == "webm":
        return webm_video_metadata(data)
    if kind == "avi":
        # MainAVIHeader ('avih') inside LIST hdrl: µs/frame at +0,
        # total frames at +16, width/height at +32/+36
        at = data.find(b"avih")
        if at < 0 or at + 48 > len(data):
            raise ValueError("avi: no avih header")
        us_pf, n = struct.unpack("<II", data[at + 8 : at + 16])[0], \
            struct.unpack("<I", data[at + 24 : at + 28])[0]
        w, h = struct.unpack("<II", data[at + 40 : at + 48])
        fps = round(1e6 / us_pf, 3) if us_pf else 0.0
        return {"container": "avi", "codec": "mjpeg", "width": w, "height": h,
                "n_frames": n, "duration_s": round(n / fps, 6) if fps else 0.0,
                "fps": fps}
    if kind == "y4m":
        from etlpy_spark.functions.mediacodec import parse_y4m_header

        hdr, pos = parse_y4m_header(data)
        # walk frame markers (never substring-count: raw plane bytes can
        # contain the ASCII string FRAME)
        n = 0
        while pos < len(data):
            nl = data.find(b"\n", pos)
            if nl < 0 or not data[pos:nl].startswith(b"FRAME"):
                break
            pos = nl + 1 + hdr["frame_bytes"]
            n += 1
        num, den = hdr.get("fps", (30, 1))
        fps = round(num / den, 3) if den else 0.0
        return {"container": "y4m", "codec": "raw", "width": hdr["w"],
                "height": hdr["h"], "n_frames": n,
                "duration_s": round(n / fps, 6) if fps else 0.0, "fps": fps}
    raise ValueError("unknown video container")


# ---------------------------------------------------------------------------
# fixture builders (tests are differential: walker accepts what these emit)


def encode_mp4_video_stub(codec: bytes = b"avc1", width: int = 640,
                          height: int = 360, n_frames: int = 120,
                          timescale: int = 12800, duration: int = 64000) -> bytes:
    """Minimal VALID ISO-BMFF: ftyp + moov(trak(mdia(mdhd,hdlr,minf(
    stbl(stsd(VisualSampleEntry),stsz))))) + empty mdat. Coded frames are
    absent — triage never reads them."""

    def box(fourcc: bytes, payload: bytes) -> bytes:
        return struct.pack(">I", len(payload) + 8) + fourcc + payload

    entry = (b"\x00" * 6 + struct.pack(">H", 1)          # reserved + dref
             + b"\x00" * 16                               # pre-defined
             + struct.pack(">HH", width, height)
             + struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi
             + b"\x00" * 4 + struct.pack(">H", 1)          # frame count
             + b"\x00" * 32                                # compressor name
             + struct.pack(">Hh", 24, -1))                 # depth, color table
    stsd = box(b"stsd", struct.pack(">II", 0, 1) + box(codec, entry))
    stsz = box(b"stsz", struct.pack(">III", 0, 0, n_frames))
    stbl = box(b"stbl", stsd + stsz)
    minf = box(b"minf", stbl)
    hdlr = box(b"hdlr", struct.pack(">II", 0, 0) + b"vide" + b"\x00" * 12 + b"v\x00")
    mdhd = box(b"mdhd", struct.pack(">IIIII", 0, 0, 0, timescale, duration)
               + struct.pack(">HH", 0x55C4, 0))
    mdia = box(b"mdia", mdhd + hdlr + minf)
    trak = box(b"trak", mdia)
    moov = box(b"moov", trak)
    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2mp41")
    return ftyp + moov + box(b"mdat", b"")


def _enc_vint_id(eid: int) -> bytes:
    n = (eid.bit_length() + 7) // 8
    return eid.to_bytes(n, "big")


def _enc_vint_size(val: int) -> bytes:
    for length in range(1, 9):
        if val < (1 << (7 * length)) - 1:
            return (val | (1 << (7 * length))).to_bytes(length, "big")
    raise ValueError("ebml: size too large")


def _el(eid: int, payload: bytes) -> bytes:
    return _enc_vint_id(eid) + _enc_vint_size(len(payload)) + payload


def encode_webm_stub(codec: str = "V_VP9", width: int = 1280, height: int = 720,
                     duration_ticks: float = 4000.0,
                     timescale: int = 1_000_000,
                     audio: tuple | None = None) -> bytes:
    """Minimal VALID WebM: EBML header (DocType webm) + Segment(Info +
    Tracks). ``audio=(codec, rate, channels)`` adds an audio track."""
    header = _el(_ID_EBML, _el(_ID_DOCTYPE, b"webm"))
    info = _el(_ID_INFO,
               _el(_ID_TIMESCALE, timescale.to_bytes(4, "big"))
               + _el(_ID_DURATION, struct.pack(">d", duration_ticks)))
    video_t = _el(_ID_TRACKENTRY,
                  _el(_ID_TRACKTYPE, b"\x01")
                  + _el(_ID_CODECID, codec.encode("ascii"))
                  + _el(_ID_VIDEO,
                        _el(_ID_PIXELWIDTH, width.to_bytes(2, "big"))
                        + _el(_ID_PIXELHEIGHT, height.to_bytes(2, "big"))))
    tracks = video_t
    if audio is not None:
        acodec, rate, ch = audio
        tracks += _el(_ID_TRACKENTRY,
                      _el(_ID_TRACKTYPE, b"\x02")
                      + _el(_ID_CODECID, acodec.encode("ascii"))
                      + _el(_ID_AUDIO,
                            _el(_ID_SAMPLINGFREQ, struct.pack(">f", float(rate)))
                            + _el(_ID_CHANNELS, bytes([ch]))))
    segment = _el(_ID_SEGMENT, info + _el(_ID_TRACKS, tracks))
    return header + segment
