"""From-scratch full PNG (ISO 15948) decode + variant encode, numpy + zlib
only (no PIL in the environment).

The minimal writer the engine has always used (imagecodec.encode_png —
8-bit RGB, filter 0) stays byte-stable over there because recorded crawl
workloads hash its output. This module owns real-web DECODE coverage — a
100 TB crawl meets every PNG variant, and until now anything but 8-bit
RGB/filter-0/2 fell to the decode_error path (reference spider.py:303-314
names png in GetImageFormat but never decodes it):

- all five color types: greyscale (0), RGB (2), palette (3),
  grey+alpha (4), RGBA (6)
- bit depths 1/2/4/8/16 (sub-byte depths bit-unpacked; 16-bit narrows to
  the high byte — what browsers rasterize to 8-bit surfaces)
- all five scanline filters (None/Sub/Up/Average/Paeth)
- Adam7 interlace (per-pass stride + filtering, scattered into the canvas)
- tRNS transparency: palette alpha table and grey/RGB color keys; alpha
  composites deterministically over white (the thumbnail convention —
  the crawl pipeline's pixel model is (h, w, 3) uint8). 16-bit color keys
  match on the high byte (the low byte is discarded with the sample).

``encode_png_ex`` can emit every variant the decoder accepts (palette
packing included, so paletted sources can be written at 8× fewer bits);
its per-row filter math is the fully-vectorized inverse of the decoder's
sequential reconstruction, which makes encode→decode a real differential
test rather than one formula checked against itself.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_MAGIC = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
# (x0, y0, dx, dy) per Adam7 pass
_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _png_chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload)) + tag + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def _validate_header(depth: int, ctype: int) -> None:
    if ctype not in _CHANNELS:
        raise ValueError(f"bad PNG color type {ctype}")
    if depth not in (1, 2, 4, 8, 16):
        raise ValueError(f"bad PNG bit depth {depth}")
    if depth < 8 and ctype not in (0, 3):
        raise ValueError(f"bit depth {depth} only valid for grey/palette")
    if depth == 16 and ctype == 3:
        raise ValueError("palette PNG cannot be 16-bit")


# ---------------------------------------------------------------------------
# decode


def _parse_chunks(data: bytes):
    if data[:8] != _MAGIC:
        raise ValueError("not a PNG stream")
    pos, hdr, plte, trns, idat = 8, None, None, None, []
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        if tag == b"IHDR":
            w, h, depth, ctype, comp, filt, inter = struct.unpack(
                ">IIBBBBB", payload[:13]
            )
            if comp != 0 or filt != 0 or inter not in (0, 1):
                raise ValueError("unsupported PNG compression/filter/interlace method")
            _validate_header(depth, ctype)
            hdr = (w, h, depth, ctype, inter)
        elif tag == b"PLTE":
            plte = np.frombuffer(payload, np.uint8)[: 3 * (length // 3)].reshape(-1, 3)
        elif tag == b"tRNS":
            trns = payload
        elif tag == b"IDAT":
            idat.append(payload)
        elif tag == b"IEND":
            break
        pos += 12 + length
    if hdr is None or not idat:
        raise ValueError("PNG stream missing IHDR or IDAT")
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error as e:
        raise ValueError(f"corrupt PNG pixel stream: {e}") from None
    return hdr, plte, trns, raw


def _unfilter(raw: bytes, n_rows: int, stride: int, bpp: int) -> np.ndarray:
    """Reverse per-scanline filtering → (n_rows, stride) uint8.

    Sequential by construction (Sub/Average/Paeth reference reconstructed
    bytes); Sub vectorizes as a wrapping per-lane accumulate, Up as one
    add, Average/Paeth run a per-pixel lane loop."""
    need = n_rows * (stride + 1)
    if len(raw) < need:
        raise ValueError("truncated PNG pixel data")
    arr = np.frombuffer(raw, np.uint8, count=need).reshape(n_rows, stride + 1)
    if not arr[:, 0].any():  # all filter 0: one slice
        return arr[:, 1:]
    out = np.empty((n_rows, stride), np.uint8)
    prev = np.zeros(stride, np.uint8)
    for y in range(n_rows):
        f = int(arr[y, 0])
        body = arr[y, 1:]
        if f == 0:
            line = body.copy()
        elif f == 1:  # Sub: wrapping cumsum per byte lane
            line = np.add.accumulate(
                body.reshape(-1, bpp), axis=0, dtype=np.uint8
            ).reshape(-1)
        elif f == 2:  # Up
            line = body + prev
        elif f in (3, 4):  # Average / Paeth: left-dependent, lane loop
            b16 = body.reshape(-1, bpp).astype(np.int16)
            p16 = prev.reshape(-1, bpp).astype(np.int16)
            o = np.empty_like(b16)
            left = np.zeros(bpp, np.int16)
            upleft = np.zeros(bpp, np.int16)
            for i in range(b16.shape[0]):
                up = p16[i]
                if f == 3:
                    pred = (left + up) >> 1
                else:
                    p = left + up - upleft
                    pa, pb, pc = abs(p - left), abs(p - up), abs(p - upleft)
                    pred = np.where(
                        (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, up, upleft)
                    )
                left = (b16[i] + pred) & 0xFF
                o[i] = left
                upleft = up
            line = o.astype(np.uint8).reshape(-1)
        else:
            raise ValueError(f"bad PNG scanline filter {f}")
        out[y] = line
        prev = line
    return out


def _to_samples(rows: np.ndarray, w: int, channels: int, depth: int) -> np.ndarray:
    """(n_rows, stride) filtered-out bytes → (n_rows, w, channels) uint8
    samples (16-bit keeps the high byte; sub-byte depths keep raw values)."""
    n_rows = rows.shape[0]
    if depth == 8:
        return rows[:, : w * channels].reshape(n_rows, w, channels)
    if depth == 16:
        a = rows[:, : w * channels * 2].reshape(n_rows, w, channels, 2)
        return np.ascontiguousarray(a[..., 0])  # big-endian high byte
    bits = np.unpackbits(rows, axis=1)[:, : w * depth].reshape(n_rows, w, depth)
    weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint8)
    return (bits * weights).sum(axis=2, dtype=np.uint16).astype(np.uint8)[..., None]


def _composite(rgb: np.ndarray, alpha: np.ndarray, bg: int = 255) -> np.ndarray:
    """Alpha-composite over a constant background, round-half-up."""
    a = alpha.astype(np.uint32)
    return (
        (rgb.astype(np.uint32) * a + bg * (255 - a) + 127) // 255
    ).astype(np.uint8)


def _grey_scale(raw: np.ndarray, depth: int) -> np.ndarray:
    if depth >= 8:  # depth 16 already narrowed to its high byte
        return raw
    return (raw.astype(np.uint16) * 255 // ((1 << depth) - 1)).astype(np.uint8)


def _expand(samples, ctype, depth, plte, trns, bg=255):
    if ctype == 3:
        if plte is None:
            raise ValueError("palette PNG without PLTE chunk")
        idx = np.minimum(samples[..., 0], len(plte) - 1)
        rgb = plte[idx]
        if trns is not None:
            alpha = np.full(len(plte), 255, np.uint8)
            tr = np.frombuffer(trns, np.uint8)[: len(plte)]
            alpha[: len(tr)] = tr
            rgb = _composite(rgb, alpha[idx][..., None], bg)
        return rgb
    if ctype in (0, 4):
        raw = samples[..., 0]
        mask = None
        if ctype == 0 and trns is not None and len(trns) >= 2:
            key = struct.unpack(">H", trns[:2])[0]
            mask = raw == ((key >> 8) if depth == 16 else key)
        rgb = np.repeat(_grey_scale(raw, depth)[..., None], 3, axis=2)
        if ctype == 4:
            return _composite(rgb, samples[..., 1:2], bg)
        if mask is not None:
            rgb[mask] = bg
        return rgb
    # ctype 2 / 6
    rgb = samples[..., :3]
    if ctype == 6:
        return _composite(rgb, samples[..., 3:4], bg)
    if trns is not None and len(trns) >= 6:
        keys = struct.unpack(">HHH", trns[:6])
        k8 = [(k >> 8) if depth == 16 else k for k in keys]
        mask = (rgb == np.array(k8, np.uint8)).all(axis=2)
        rgb = rgb.copy()
        rgb[mask] = bg
        return rgb
    return np.ascontiguousarray(rgb)


def decode_png(data: bytes) -> np.ndarray:
    """Any legal PNG → (h, w, 3) uint8 RGB (alpha over white, 16-bit
    narrowed — see module docstring)."""
    (w, h, depth, ctype, inter), plte, trns, raw = _parse_chunks(data)
    ch = _CHANNELS[ctype]
    bpp = max(1, ch * depth // 8)
    if inter == 0:
        stride = (w * ch * depth + 7) // 8
        samples = _to_samples(_unfilter(raw, h, stride, bpp), w, ch, depth)
    else:
        samples = np.zeros((h, w, ch), np.uint8)
        pos = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw == 0 or ph == 0:
                continue
            stride = (pw * ch * depth + 7) // 8
            rows = _unfilter(raw[pos:], ph, stride, bpp)
            pos += ph * (stride + 1)
            samples[y0::dy, x0::dx] = _to_samples(rows, pw, ch, depth)
    return _expand(samples, ctype, depth, plte, trns)


# ---------------------------------------------------------------------------
# variant encoder


def _pack_samples(vals: np.ndarray, depth: int) -> np.ndarray:
    """(rows, w, channels) samples → (rows, stride) bytes for one pass."""
    n_rows, w, ch = vals.shape
    if depth == 8:
        return vals.reshape(n_rows, w * ch).astype(np.uint8)
    if depth == 16:
        v = vals.astype(">u2")
        return v.reshape(n_rows, w * ch).view(np.uint8).reshape(n_rows, w * ch * 2)
    bits = (
        (vals[..., 0][..., None].astype(np.uint8)
         >> np.arange(depth - 1, -1, -1)) & 1
    ).reshape(n_rows, w * depth)
    return np.packbits(bits, axis=1)


def _filter_rows(rows: np.ndarray, bpp: int, filters) -> bytes:
    """Apply per-row filters (vectorized — encode predictions read RAW
    bytes, unlike decode's sequential reconstruction)."""
    n_rows, stride = rows.shape
    if isinstance(filters, int):
        filters = [filters] * n_rows
    if len(filters) != n_rows:
        raise ValueError("need one filter per scanline")
    r16 = rows.astype(np.int16)
    out = bytearray()
    prev = np.zeros(stride, np.int16)
    for y in range(n_rows):
        f = int(filters[y])
        cur = r16[y]
        left = np.zeros(stride, np.int16)
        left[bpp:] = cur[:-bpp]
        if f == 0:
            filt = cur
        elif f == 1:
            filt = cur - left
        elif f == 2:
            filt = cur - prev
        elif f == 3:
            filt = cur - ((left + prev) >> 1)
        elif f == 4:
            upleft = np.zeros(stride, np.int16)
            upleft[bpp:] = prev[:-bpp]
            p = left + prev - upleft
            pa, pb, pc = abs(p - left), abs(p - prev), abs(p - upleft)
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, upleft)
            )
            filt = cur - pred
        else:
            raise ValueError(f"bad PNG scanline filter {f}")
        out.append(f)
        out += (filt & 0xFF).astype(np.uint8).tobytes()
        prev = cur
    return bytes(out)


def encode_png_ex(
    px: np.ndarray,
    color_type: int = 2,
    bit_depth: int = 8,
    palette: np.ndarray | None = None,
    trns: bytes | np.ndarray | None = None,
    interlace: bool = False,
    filters=0,
) -> bytes:
    """PNG writer covering every variant :func:`decode_png` accepts.

    ``px`` by color type — 0: (h,w) grey; 2: (h,w,3) RGB; 3: (h,w) palette
    indices (``palette`` (n,3) required); 4: (h,w,2) grey+alpha;
    6: (h,w,4) RGBA. uint16 input for ``bit_depth=16``. ``filters`` is one
    int or a per-scanline list (interlaced: filters apply per pass row in
    pass order). ``trns`` = raw tRNS payload, or for palette an alpha
    array."""
    _validate_header(bit_depth, color_type)
    ch = _CHANNELS[color_type]
    if px.ndim == 2:
        px = px[..., None]
    if px.shape[2] != ch:
        raise ValueError(f"color type {color_type} needs {ch} channels")
    h, w = px.shape[:2]
    if bit_depth < 8 and int(px.max(initial=0)) >= (1 << bit_depth):
        raise ValueError(f"sample out of range for bit depth {bit_depth}")
    bpp = max(1, ch * bit_depth // 8)

    if isinstance(filters, int):
        row_filters = None  # same everywhere; slice freely
    else:
        row_filters = list(filters)

    def pass_bytes(vals, taken):
        n_rows = vals.shape[0]
        f = filters if row_filters is None else row_filters[taken : taken + n_rows]
        return _filter_rows(_pack_samples(vals, bit_depth), bpp, f), n_rows

    if not interlace:
        raw, _ = pass_bytes(px, 0)
    else:
        parts, taken = [], 0
        for x0, y0, dx, dy in _ADAM7:
            sub = px[y0::dy, x0::dx]
            if sub.shape[0] == 0 or sub.shape[1] == 0:
                continue
            b, n = pass_bytes(sub, taken)
            parts.append(b)
            taken += n
        raw = b"".join(parts)

    ihdr = struct.pack(
        ">IIBBBBB", w, h, bit_depth, color_type, 0, 0, 1 if interlace else 0
    )
    out = _MAGIC + _png_chunk(b"IHDR", ihdr)
    if color_type == 3:
        if palette is None:
            raise ValueError("palette PNG needs a palette")
        out += _png_chunk(b"PLTE", np.asarray(palette, np.uint8).tobytes())
    if trns is not None:
        payload = trns if isinstance(trns, bytes) else np.asarray(trns, np.uint8).tobytes()
        out += _png_chunk(b"tRNS", payload)
    out += _png_chunk(b"IDAT", zlib.compress(raw, 6)) + _png_chunk(b"IEND", b"")
    return out
