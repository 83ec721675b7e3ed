"""Audio/video container codecs, numpy-only (no codec libraries in the
environment — so the formats are the *uncompressed* real-world ones).

The reference engine sniffs downloaded media by magic bytes and treats the
payload as an opaque blob (reference spider.py:303-314 GetImageFormat); we
go further and actually decode the containers — the entropy-free ones here,
plus AVI/MJPEG (below) riding the from-scratch T.81 JPEG codec and animated
GIF in functions/gifcodec.py:

- **WAV** (RIFF/WAVE, PCM): canonical chunked RIFF parse — ``fmt `` +
  ``data`` chunks, unknown chunks (LIST/fact/cue) skipped with odd-size
  padding, 8/16/32-bit integer PCM, any channel count. Round-trips
  bit-exactly.
- **Y4M** (YUV4MPEG2): the standard raw-video interchange format (what
  ``ffmpeg -f yuv4mpeg2`` emits). Plain-text header, ``FRAME`` markers,
  planar YUV payloads; C444 and C420/C420jpeg/C420mpeg2/C420paldv layouts.
  Color transform is BT.601 full-range (JFIF) both ways. Because frame
  size is fixed per stream, frame *sampling* seeks over skipped frames in
  O(1) — only sampled frames pay the YUV→RGB conversion (the property the
  frame-sample operator relies on at scale).

Compressed formats (MP3/AAC/H.264/...) genuinely need external codec
libraries and still raise ``NotImplementedError`` upstream.

Everything operates on numpy arrays and is called from Arrow-batched
pandas UDFs (operators/multimodal.py) — zero per-row Python at the plan
level.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# WAV (RIFF/WAVE integer PCM)

_WAV_DTYPES = {8: np.uint8, 16: np.dtype("<i2"), 32: np.dtype("<i4")}


# G.711 companding (ITU-T G.711 / the public-domain Sun g711.c formulas),
# vectorized. Telephony and ASR corpora carry these constantly; the
# canonical self-consistency test (compress(expand(code)) == code for all
# 256 codes) pins both directions.


def mulaw_expand(codes: np.ndarray) -> np.ndarray:
    """u-law uint8 → int16."""
    u = (~codes.astype(np.uint8)).astype(np.int32)
    sign = u & 0x80
    e = (u >> 4) & 7
    m = u & 0x0F
    x = (((m << 3) + 0x84) << e) - 0x84
    return np.where(sign != 0, -x, x).astype(np.int16)


def mulaw_compress(pcm: np.ndarray) -> np.ndarray:
    """int16 → u-law uint8 (linear 0 encodes to 0xFF)."""
    x = pcm.astype(np.int32)
    sign = np.where(x < 0, 0x80, 0)
    mag = np.minimum(np.abs(x), 32635) + 0x84
    e = (np.floor(np.log2(mag)).astype(np.int32) - 7)
    m = (mag >> (e + 3)) & 0x0F
    return (~(sign | (e << 4) | m) & 0xFF).astype(np.uint8)


def alaw_expand(codes: np.ndarray) -> np.ndarray:
    """A-law uint8 → int16."""
    a = codes.astype(np.int32) ^ 0x55
    sign = a & 0x80
    seg = (a >> 4) & 7
    # reconstruction is already at 16-bit scale: the encoder's >>3 to the
    # 13-bit domain is baked into these constants (Sun g711.c form)
    t = ((a & 0x0F) << 4) + 8
    t = np.where(seg >= 1, t + 0x100, t)
    t = np.where(seg > 1, t << (seg - 1), t)
    return np.where(sign != 0, t, -t).astype(np.int16)


def alaw_compress(pcm: np.ndarray) -> np.ndarray:
    """int16 → A-law uint8 (linear 0 encodes to 0xD5)."""
    x = pcm.astype(np.int32)
    mask = np.where(x >= 0, 0xD5, 0x55)
    mag = np.minimum(np.where(x >= 0, x, -x - 1) >> 3, 0xFFF)
    # 13-bit magnitude → segment: 0 below 0x20, else floor(log2)-4 (1..7)
    seg = np.where(mag > 0x1F, np.floor(np.log2(np.maximum(mag, 1))).astype(np.int32) - 4, 0)
    m = np.where(seg == 0, (mag >> 1) & 0x0F, (mag >> seg) & 0x0F)
    return (((seg << 4) | m) ^ mask).astype(np.uint8)


_EXT_GUID_TAIL = struct.pack("<HH", 0, 0x10) + b"\x80\x00\x00\xaa\x00\x38\x9b\x71"


def encode_wav(pcm: np.ndarray, sample_rate: int = 16000, law: str | None = None,
               extensible: bool = False) -> bytes:
    """Interleaved WAV. ``pcm``: (n,) or (n, channels) —
    uint8/int16/int32 → integer PCM (format 1); float32/float64 → IEEE
    float (format 3, exact); int16 with ``law='mu'``/``'a'`` → G.711
    companded 8-bit (formats 7/6). ``extensible`` wraps the format in a
    WAVE_FORMAT_EXTENSIBLE header (format 0xFFFE + subformat GUID), the
    layout multi-channel tools emit."""
    if pcm.ndim == 1:
        pcm = pcm[:, None]
    n, ch = pcm.shape
    kind = pcm.dtype.kind
    if law is not None:
        if kind != "i" or pcm.dtype.itemsize != 2:
            raise ValueError("G.711 companding needs int16 input")
        # strict: an unrecognized value must not silently fall through to
        # A-law (u-law tagged/companded as A-law would decode garbled on
        # every conformant reader; caught by the javax.sound cross-check)
        if law in ("mu", "ulaw", "mulaw"):
            codes, fmt_code = mulaw_compress(pcm), 7
        elif law in ("a", "alaw"):
            codes, fmt_code = alaw_compress(pcm), 6
        else:
            raise ValueError(f"unknown G.711 law {law!r}: use 'mu' or 'a'")
        bits = 8
        data = np.ascontiguousarray(codes).tobytes()
    elif kind == "f":
        bits = pcm.dtype.itemsize * 8
        fmt_code = 3
        data = np.ascontiguousarray(pcm.astype(f"<f{bits // 8}", copy=False)).tobytes()
    else:
        bits = pcm.dtype.itemsize * 8
        # width alone is not enough: uint16/uint32 share itemsizes with the
        # integer PCM dtypes and an astype would silently corrupt samples.
        if not ((kind == "u" and bits == 8) or (kind == "i" and bits in (16, 32))):
            raise ValueError(
                f"unsupported PCM dtype {pcm.dtype}: uint8/int16/int32 or "
                "float32/float64 required"
            )
        fmt_code = 1
        data = np.ascontiguousarray(pcm.astype(_WAV_DTYPES[bits], copy=False)).tobytes()
    block = ch * bits // 8
    base = struct.pack("<HHIIHH", 0xFFFE if extensible else fmt_code, ch,
                       sample_rate, sample_rate * block, block, bits)
    if extensible:
        base += struct.pack("<HHI", 22, bits, 0) + struct.pack("<I", fmt_code) + _EXT_GUID_TAIL
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(base)) + base
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """→ (samples shaped (n, channels), sample_rate). Bit-exact inverse of
    ``encode_wav`` for integer PCM and IEEE float; G.711 u-law/A-law data
    expands to int16; WAVE_FORMAT_EXTENSIBLE resolves through its
    subformat GUID. Tolerant chunk walk (skips LIST/fact/... with RIFF's
    odd-size pad byte)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    pos, end = 12, 8 + struct.unpack("<I", data[4:8])[0]
    end = min(end, len(data))
    fmt = raw = None
    while pos + 8 <= end:
        cid, size = data[pos : pos + 4], struct.unpack("<I", data[pos + 4 : pos + 8])[0]
        payload = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            if len(payload) < 16:
                raise ValueError("truncated fmt chunk")
            fmt = payload  # raw bytes: extensible headers carry 24 more
        elif cid == b"data":
            raw = payload
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or raw is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, ch, rate, _, _, bits = struct.unpack("<HHIIHH", fmt[:16])
    if audio_format == 0xFFFE:  # WAVE_FORMAT_EXTENSIBLE: subformat GUID
        if len(fmt) < 26:
            raise ValueError("truncated WAVE_FORMAT_EXTENSIBLE header")
        audio_format = struct.unpack("<H", fmt[24:26])[0]
    if ch < 1:
        raise ValueError(f"bad channel count {ch}")
    if audio_format == 3:  # IEEE float
        if bits not in (32, 64):
            raise ValueError(f"bad IEEE-float width {bits}")
        dt = np.dtype(f"<f{bits // 8}")
    elif audio_format in (6, 7):  # G.711 A-law / u-law
        if bits != 8:
            raise ValueError(f"G.711 is 8-bit, got {bits}")
        dt = np.dtype(np.uint8)
    elif audio_format == 1:
        dt = _WAV_DTYPES.get(bits)
        if dt is None:
            raise ValueError(f"unsupported PCM width {bits}")
        dt = np.dtype(dt)
    else:
        raise ValueError(f"unsupported WAV format {audio_format}")
    width = dt.itemsize
    usable = len(raw) // (width * ch) * (width * ch)
    samples = np.frombuffer(raw[:usable], dtype=dt).reshape(-1, ch)
    if audio_format == 6:
        samples = alaw_expand(samples)
    elif audio_format == 7:
        samples = mulaw_expand(samples)
    return samples, rate


def wav_float(samples: np.ndarray) -> np.ndarray:
    """Normalize integer PCM to [-1, 1) float64 (uint8 is offset-binary);
    IEEE-float samples pass through unscaled."""
    if samples.dtype.kind == "f":
        return samples.astype(np.float64)
    if samples.dtype == np.uint8:
        return (samples.astype(np.float64) - 128.0) / 128.0
    bits = samples.dtype.itemsize * 8
    return samples.astype(np.float64) / float(1 << (bits - 1))


# ---------------------------------------------------------------------------
# Y4M (YUV4MPEG2) — BT.601 full-range (JFIF) both directions

_Y4M_MAGIC = b"YUV4MPEG2"


def _rgb_to_yuv(px: np.ndarray) -> np.ndarray:
    r, g, b = (px[..., i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    u = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    v = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    return np.clip(np.rint(np.stack([y, u, v], axis=-1)), 0, 255).astype(np.uint8)


def _yuv_to_rgb(yuv: np.ndarray) -> np.ndarray:
    y = yuv[..., 0].astype(np.float64)
    u = yuv[..., 1].astype(np.float64) - 128.0
    v = yuv[..., 2].astype(np.float64) - 128.0
    r = y + 1.402 * v
    g = y - 0.344136 * u - 0.714136 * v
    b = y + 1.772 * u
    return np.clip(np.rint(np.stack([r, g, b], axis=-1)), 0, 255).astype(np.uint8)


def _frame_planes(w: int, h: int, colorspace: str) -> tuple[int, int]:
    """→ (chroma_w, chroma_h) for the stream's colorspace token."""
    if colorspace == "C444":
        return w, h
    if colorspace in ("C420", "C420jpeg", "C420mpeg2", "C420paldv"):
        if w % 2 or h % 2:
            raise ValueError("4:2:0 needs even dimensions")
        return w // 2, h // 2
    raise ValueError(f"unsupported colorspace {colorspace}")


def encode_y4m(frames: list[np.ndarray], fps: tuple[int, int] = (30, 1),
               colorspace: str = "C444") -> bytes:
    """Encode RGB uint8 frames (all h×w×3, same shape) as a YUV4MPEG2
    stream. C444 round-trips within ±2 LSB (PSNR ≥ 40 dB); C420* performs
    real 2×2 chroma subsampling (box filter)."""
    if not frames:
        raise ValueError("need at least one frame")
    h, w = frames[0].shape[:2]
    cw, chh = _frame_planes(w, h, colorspace)
    head = f"YUV4MPEG2 W{w} H{h} F{fps[0]}:{fps[1]} Ip A1:1 {colorspace}\n"
    parts = [head.encode("ascii")]
    for px in frames:
        if px.shape[:2] != (h, w):
            raise ValueError("all frames must share one geometry")
        yuv = _rgb_to_yuv(px)
        y = yuv[..., 0]
        if cw == w:
            u, v = yuv[..., 1], yuv[..., 2]
        else:  # 4:2:0 box subsample
            u = np.rint(
                yuv[..., 1].astype(np.float64).reshape(chh, 2, cw, 2).mean(axis=(1, 3))
            ).astype(np.uint8)
            v = np.rint(
                yuv[..., 2].astype(np.float64).reshape(chh, 2, cw, 2).mean(axis=(1, 3))
            ).astype(np.uint8)
        parts.append(b"FRAME\n" + y.tobytes() + u.tobytes() + v.tobytes())
    return b"".join(parts)


def parse_y4m_header(data: bytes) -> tuple[dict, int]:
    """→ (stream params, offset of the first FRAME marker)."""
    if not data.startswith(_Y4M_MAGIC):
        raise ValueError("not a YUV4MPEG2 stream")
    nl = data.index(b"\n")
    params: dict = {"colorspace": "C420jpeg"}  # spec default
    for tok in data[len(_Y4M_MAGIC) : nl].split():
        t = tok.decode("ascii")
        if t[0] == "W":
            params["w"] = int(t[1:])
        elif t[0] == "H":
            params["h"] = int(t[1:])
        elif t[0] == "F":
            n, d = t[1:].split(":")
            params["fps"] = (int(n), int(d))
        elif t[0] == "C":
            params["colorspace"] = t
    if "w" not in params or "h" not in params:
        raise ValueError("Y4M header missing W/H")
    cw, chh = _frame_planes(params["w"], params["h"], params["colorspace"])
    params["frame_bytes"] = params["w"] * params["h"] + 2 * cw * chh
    return params, nl + 1


def iter_y4m_frames(data: bytes, every_n: int = 1):
    """Yield (frame_idx, rgb_frame) for every ``every_n``-th frame.

    Skipped frames are *seeked over* (fixed frame size), so sampling 1-in-N
    costs O(total/N) decode work — the property the distributed
    frame-sample operator relies on.
    """
    params, pos = parse_y4m_header(data)
    w, h, fb = params["w"], params["h"], params["frame_bytes"]
    cw, chh = _frame_planes(w, h, params["colorspace"])
    idx = 0
    while pos < len(data):
        if data[pos : pos + 5] != b"FRAME":
            raise ValueError(f"expected FRAME marker at offset {pos}")
        nl = data.index(b"\n", pos)  # FRAME may carry parameters
        body = nl + 1
        if body + fb > len(data):
            break  # truncated tail frame
        if idx % every_n == 0:
            y = np.frombuffer(data[body : body + w * h], dtype=np.uint8).reshape(h, w)
            u = np.frombuffer(
                data[body + w * h : body + w * h + cw * chh], dtype=np.uint8
            ).reshape(chh, cw)
            v = np.frombuffer(
                data[body + w * h + cw * chh : body + fb], dtype=np.uint8
            ).reshape(chh, cw)
            if cw != w:  # 4:2:0 nearest upsample
                u = u.repeat(2, axis=0).repeat(2, axis=1)
                v = v.repeat(2, axis=0).repeat(2, axis=1)
            yield idx, _yuv_to_rgb(np.stack([y, u, v], axis=-1))
        pos = body + fb
        idx += 1


def decode_y4m(data: bytes) -> tuple[list[np.ndarray], dict]:
    """→ (RGB frames, stream params)."""
    params, _ = parse_y4m_header(data)
    return [f for _, f in iter_y4m_frames(data)], params


# ---------------------------------------------------------------------------
# AVI / MJPEG — the first *compressed* video container the engine demuxes.
# Motion-JPEG stores each frame as an independent baseline/progressive JPEG
# in a '00dc' chunk, so the from-scratch T.81 codec (functions/jpegcodec.py)
# is the only entropy coder needed, frames have no inter-frame dependency,
# and 1-in-N sampling *seeks* over skipped frames via the explicit chunk
# sizes — O(sampled) decode work, the property the distributed frame-sample
# operator relies on. Inter-frame codecs (H.264/VP9/...) genuinely need
# external libraries and still raise upstream.


def encode_avi_mjpeg(frames: list[np.ndarray], fps: int = 30,
                     quality: int = 96) -> bytes:
    """Mux RGB uint8 frames (all h×w×3, same shape) as a canonical
    RIFF/AVI MJPEG file: LIST hdrl (avih + strl/strh/strf with fourcc
    'MJPG'), LIST movi with one '00dc' JPEG chunk per frame (word-aligned),
    and an idx1 keyframe index (offsets relative to the 'movi' fourcc, the
    convention common demuxers expect)."""
    from etlpy_spark.functions.jpegcodec import encode_jpeg

    if not frames:
        raise ValueError("need at least one frame")
    h, w = frames[0].shape[:2]
    blobs = []
    for px in frames:
        if px.shape[:2] != (h, w):
            raise ValueError("all frames must share one geometry")
        blobs.append(encode_jpeg(px, quality=quality))
    max_size = max(len(b) for b in blobs)

    def chunk(cid: bytes, payload: bytes) -> bytes:
        pad = b"\x00" if len(payload) & 1 else b""
        return cid + struct.pack("<I", len(payload)) + payload + pad

    def lst(kind: bytes, payload: bytes) -> bytes:
        return chunk(b"LIST", kind + payload)

    avih = struct.pack(
        "<IIIIIIIIII4I",
        1_000_000 // fps,        # microseconds per frame
        max_size * fps,          # max bytes/sec (upper bound)
        0,                       # padding granularity
        0x10,                    # AVIF_HASINDEX
        len(frames), 0, 1,       # total frames, initial frames, streams
        max_size, w, h,
        0, 0, 0, 0,
    )
    strh = (
        b"vidsMJPG"
        + struct.pack("<IHHIIIIIIiI", 0, 0, 0, 0, 1, fps, 0, len(frames),
                      max_size, -1, 0)
        + struct.pack("<4H", 0, 0, w, h)
    )
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG",
                       w * h * 3, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi_chunks, idx, off = [], [], 4  # offsets relative to the movi fourcc
    for b in blobs:
        c = chunk(b"00dc", b)
        movi_chunks.append(c)
        idx.append(b"00dc" + struct.pack("<III", 0x10, off, len(b)))
        off += len(c)
    movi = lst(b"movi", b"".join(movi_chunks))
    idx1 = chunk(b"idx1", b"".join(idx))
    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


def iter_avi_mjpeg_frames(data: bytes, every_n: int = 1):
    """Yield (frame_idx, rgb_frame) for every ``every_n``-th MJPEG frame.

    Tolerant RIFF walk (skips JUNK/unknown chunks with the odd-size pad,
    recurses only into the movi LIST); skipped frames advance by the chunk
    size — no JPEG decode, no byte scan."""
    from etlpy_spark.functions.jpegcodec import decode_jpeg

    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI stream")
    end = min(8 + struct.unpack("<I", data[4:8])[0], len(data))
    pos, movi = 12, None
    while pos + 8 <= end:
        cid = data[pos : pos + 4]
        size = struct.unpack("<I", data[pos + 4 : pos + 8])[0]
        if cid == b"LIST" and data[pos + 8 : pos + 12] == b"movi":
            movi = (pos + 12, pos + 8 + size)
            break
        pos += 8 + size + (size & 1)
    if movi is None:
        raise ValueError("AVI stream has no movi list")
    pos, mend = movi
    idx = 0
    while pos + 8 <= mend:
        cid = data[pos : pos + 4]
        size = struct.unpack("<I", data[pos + 4 : pos + 8])[0]
        if cid in (b"00dc", b"00db"):
            if idx % every_n == 0:
                yield idx, decode_jpeg(data[pos + 8 : pos + 8 + size])
            idx += 1
        pos += 8 + size + (size & 1)


def sniff_media(data: bytes) -> str:
    """Magic-byte container sniff (the reference's GetImageFormat idea,
    spider.py:303-314, extended to A/V containers)."""
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        return "wav"
    if data[:4] == b"RIFF" and data[8:12] == b"AVI ":
        return "avi"
    if data[:4] == b"RIFF" and data[8:12] == b"WEBP":
        return "webp"
    if data[:9] == _Y4M_MAGIC:
        return "y4m"
    if data[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
    if data[:4] == b"fLaC":
        return "flac"
    if data[:4] == b"RAW0":
        return "rawcat"
    return "unknown"
