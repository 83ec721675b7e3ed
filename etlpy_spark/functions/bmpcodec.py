"""From-scratch BMP (Windows DIB) codec, numpy + stdlib only.

Real crawls meet BMPs constantly (the reference sniffs image formats by
magic bytes, spider.py:303-314, and BMP's ``BM`` is a classic); until this
module they fell to the decode_error path. Decode coverage targets what
the web actually serves:

- **Headers**: BITMAPINFOHEADER (40 bytes) and its V4/V5 extensions
  (52/56/108/124 — the first 40 fields are read, the rest skipped), plus
  the ancient BITMAPCOREHEADER (12).
- **Pixel formats**: 1/4/8-bit paletted, 16-bit (555 default or
  BI_BITFIELDS masks, e.g. 565), 24-bit BGR, 32-bit BGRX/BI_BITFIELDS.
  The 32-bit fourth channel is padding per BI_RGB semantics and is
  ignored (matching common rasterizers).
- **Compression**: BI_RGB, BI_BITFIELDS, and BI_RLE8 (runs, absolute
  mode, end-of-line, end-of-bitmap, and delta escapes — deltas leave the
  skipped pixels at the first palette entry).
- **Row order**: bottom-up (positive height) and top-down (negative).
- 4-byte row stride alignment throughout.

``encode_bmp_ex`` emits every variant the decoder accepts (including an
RLE8 compressor with runs + absolute mode) so the round-trip tests are
differential; ``encode_bmp`` is the plain 24-bit writer.
"""

from __future__ import annotations

import struct

import numpy as np


def _stride(bits_per_row: int) -> int:
    return ((bits_per_row + 31) // 32) * 4


# ---------------------------------------------------------------------------
# decode


def _mask_shift(mask: int) -> tuple[int, int]:
    """→ (right shift, value span) for one BI_BITFIELDS channel mask."""
    if mask == 0:
        return 0, 1
    shift = (mask & -mask).bit_length() - 1
    return shift, (mask >> shift) + 1


def _apply_masks(vals: np.ndarray, masks: tuple[int, int, int]) -> np.ndarray:
    chans = []
    for m in masks:
        shift, span = _mask_shift(m)
        c = ((vals >> shift) & ((m >> shift) if m else 0)).astype(np.uint32)
        # scale to 0..255 (rounding midpoint); span==1 means absent channel
        chans.append(((c * 255 + (span - 1) // 2) // max(span - 1, 1)).astype(np.uint8))
    return np.stack(chans, axis=-1)


def _decode_rle8(raw: bytes, w: int, h: int) -> np.ndarray:
    """BI_RLE8 → (h, w) palette indices, bottom-up row order as stored."""
    idx = np.zeros((h, w), np.uint8)
    pos = x = y = 0
    n = len(raw)
    while pos + 1 < n:
        count, val = raw[pos], raw[pos + 1]
        pos += 2
        if count > 0:  # encoded run
            end = min(x + count, w)
            if y < h:
                idx[y, x:end] = val
            x = end
        elif val == 0:  # end of line
            x, y = 0, y + 1
        elif val == 1:  # end of bitmap
            break
        elif val == 2:  # delta
            if pos + 1 >= n:
                raise ValueError("truncated RLE8 delta")
            x = min(x + raw[pos], w)
            y += raw[pos + 1]
            pos += 2
        else:  # absolute mode: `val` literal pixels, word-aligned
            if pos + val > n:
                raise ValueError("truncated RLE8 absolute run")
            end = min(x + val, w)
            if y < h:
                idx[y, x:end] = np.frombuffer(raw, np.uint8, count=end - x, offset=pos)
            x = end
            pos += val + (val & 1)
    return idx[::-1]  # RLE rows are stored bottom-up


def decode_bmp(data: bytes) -> np.ndarray:
    """Any supported BMP → (h, w, 3) uint8 RGB."""
    if data[:2] != b"BM" or len(data) < 26:
        raise ValueError("not a BMP stream")
    (data_off,) = struct.unpack("<I", data[10:14])
    (hdr_size,) = struct.unpack("<I", data[14:18])
    if hdr_size == 12:  # BITMAPCOREHEADER
        w, h, planes, bpp = struct.unpack("<HHHH", data[18:26])
        comp, pal_entry, top_down = 0, 3, False
        n_colors = 0
        pal_off = 14 + 12
    elif hdr_size >= 40:
        w, h, planes, bpp, comp = struct.unpack("<iihHI", data[18:34])
        (n_colors,) = struct.unpack("<I", data[46:50])
        top_down = h < 0
        h = abs(h)
        pal_entry = 4
        pal_off = 14 + hdr_size
    else:
        raise ValueError(f"unsupported BMP header size {hdr_size}")
    if w <= 0 or h <= 0:
        raise ValueError("bad BMP dimensions")
    if bpp not in (1, 4, 8, 16, 24, 32):
        raise ValueError(f"unsupported BMP bit depth {bpp}")

    masks = None
    if comp == 3:  # BI_BITFIELDS
        if bpp not in (16, 32):
            raise ValueError("BI_BITFIELDS needs 16/32-bit pixels")
        if hdr_size == 40:
            # BITMAPINFOHEADER: three mask DWORDs follow the header.
            if len(data) < pal_off + 12:
                raise ValueError("truncated BMP bitfields masks")
            masks = struct.unpack("<III", data[pal_off : pal_off + 12])
            pal_off += 12
        else:
            # V4/V5 (hdr_size 52/108/124): masks are header-internal fields
            # at header offset 40 → file offset 54; palette stays at
            # 14+hdr_size (r4 advisory).
            if len(data) < 66:
                raise ValueError("truncated BMP V4/V5 bitfields header")
            masks = struct.unpack("<III", data[54:66])
    elif comp == 1:
        if bpp != 8:
            raise ValueError("BI_RLE8 needs 8-bit pixels")
    elif comp != 0:
        raise ValueError(f"unsupported BMP compression {comp}")

    palette = None
    if bpp <= 8:
        count = n_colors or (1 << bpp)
        end = pal_off + count * pal_entry
        if end > len(data):
            raise ValueError("truncated BMP palette")
        tbl = np.frombuffer(data[pal_off:end], np.uint8).reshape(count, pal_entry)
        palette = tbl[:, 2::-1]  # BGR(A) → RGB

    if comp == 1:
        idx = _decode_rle8(data[data_off:], w, h)
        return np.ascontiguousarray(palette[np.minimum(idx, len(palette) - 1)])

    stride = _stride(w * bpp)
    need = stride * h
    raw = data[data_off : data_off + need]
    if len(raw) < need:
        raise ValueError("truncated BMP pixel data")
    rows = np.frombuffer(raw, np.uint8).reshape(h, stride)
    if not top_down:
        rows = rows[::-1]

    if bpp <= 8:
        bits = np.unpackbits(rows, axis=1)[:, : w * bpp].reshape(h, w, bpp)
        weights = (1 << np.arange(bpp - 1, -1, -1)).astype(np.uint8)
        idx = (bits * weights).sum(axis=2, dtype=np.uint16).astype(np.uint8)
        return np.ascontiguousarray(palette[np.minimum(idx, len(palette) - 1)])
    if bpp == 16:
        vals = rows[:, : w * 2].reshape(h, w, 2).astype(np.uint32)
        vals = vals[..., 0] | (vals[..., 1] << 8)
        return _apply_masks(vals, masks or (0x7C00, 0x03E0, 0x001F))
    if bpp == 24:
        bgr = rows[:, : w * 3].reshape(h, w, 3)
        return np.ascontiguousarray(bgr[..., ::-1])
    # 32-bit
    if masks is not None:
        vals = rows[:, : w * 4].reshape(h, w, 4).astype(np.uint32)
        vals = vals[..., 0] | (vals[..., 1] << 8) | (vals[..., 2] << 16) | (vals[..., 3] << 24)
        return _apply_masks(vals, masks)
    bgrx = rows[:, : w * 4].reshape(h, w, 4)
    return np.ascontiguousarray(bgrx[..., 2::-1])


# ---------------------------------------------------------------------------
# encode


def _rle8_compress(idx: np.ndarray) -> bytes:
    """BI_RLE8 writer: encoded runs for repeats, absolute mode for mixed
    spans, EOL after each row, EOF at the end."""
    out = bytearray()
    h, w = idx.shape
    for y in range(h - 1, -1, -1):  # stored bottom-up
        row = idx[y]
        x = 0
        while x < w:
            run = 1
            while x + run < w and run < 255 and row[x + run] == row[x]:
                run += 1
            if run >= 3 or x + run >= w:
                out += bytes((run, int(row[x])))
                x += run
            else:
                # gather a literal span until a 3-run starts
                start = x
                while (
                    x < w and x - start < 255
                    and not (x + 2 < w and row[x] == row[x + 1] == row[x + 2])
                ):
                    x += 1
                span = row[start:x]
                if len(span) < 3:  # absolute mode needs >=3; emit singles
                    for v in span:
                        out += bytes((1, int(v)))
                else:
                    out += bytes((0, len(span))) + span.tobytes()
                    if len(span) & 1:
                        out += b"\x00"
        out += b"\x00\x00"  # end of line
    out += b"\x00\x01"  # end of bitmap
    return bytes(out)


def encode_bmp_ex(
    px: np.ndarray,
    bpp: int = 24,
    palette: np.ndarray | None = None,
    rle: bool = False,
    top_down: bool = False,
    masks: tuple[int, int, int] | None = None,
) -> bytes:
    """BMP writer for every variant :func:`decode_bmp` accepts. ``px`` is
    (h, w, 3) RGB for bpp 16/24/32, or (h, w) palette indices with
    ``palette`` (n, 3) for bpp 1/4/8. ``masks`` switches 16/32-bit output
    to BI_BITFIELDS; ``rle`` enables BI_RLE8 (bpp 8 only)."""
    if bpp in (1, 4, 8):
        if palette is None or px.ndim != 2:
            raise ValueError("paletted BMP needs (h,w) indices + palette")
        h, w = px.shape
        if int(px.max(initial=0)) >= (1 << bpp):
            raise ValueError(f"index out of range for {bpp}-bit BMP")
    else:
        if px.ndim != 3 or px.shape[2] != 3:
            raise ValueError("16/24/32-bit BMP needs (h,w,3) RGB")
        h, w = px.shape[:2]
    if rle and (bpp != 8 or top_down):
        raise ValueError("RLE BMP is 8-bit bottom-up only")

    comp = 1 if rle else (3 if masks is not None else 0)
    pal_bytes = b""
    if bpp <= 8:
        tbl = np.zeros((1 << bpp, 4), np.uint8)
        tbl[: len(palette), :3] = np.asarray(palette, np.uint8)[:, ::-1]  # RGB→BGR
        pal_bytes = tbl.tobytes()
    mask_bytes = struct.pack("<III", *masks) if masks is not None else b""

    if rle:
        body = _rle8_compress(px.astype(np.uint8))
    else:
        stride = _stride(w * bpp)
        rows = np.zeros((h, stride), np.uint8)
        if bpp <= 8:
            bits = (
                (px[..., None].astype(np.uint8) >> np.arange(bpp - 1, -1, -1)) & 1
            ).reshape(h, w * bpp)
            packed = np.packbits(bits, axis=1)
            rows[:, : packed.shape[1]] = packed
        elif bpp == 16:
            m = masks or (0x7C00, 0x03E0, 0x001F)
            vals = np.zeros((h, w), np.uint32)
            for c in range(3):
                shift, span = _mask_shift(m[c])
                vals |= ((px[..., c].astype(np.uint32) * (span - 1) + 127) // 255) << shift
            rows[:, : w * 2] = (
                np.stack([vals & 0xFF, (vals >> 8) & 0xFF], axis=-1)
                .astype(np.uint8).reshape(h, w * 2)
            )
        elif bpp == 24:
            rows[:, : w * 3] = px[..., ::-1].reshape(h, w * 3)
        else:
            quad = np.zeros((h, w, 4), np.uint8)
            quad[..., :3] = px[..., ::-1]
            rows[:, : w * 4] = quad.reshape(h, w * 4)
        if not top_down:
            rows = rows[::-1]
        body = rows.tobytes()

    hdr_h = -h if top_down else h
    info = struct.pack(
        "<IiihHIIiiII", 40, w, hdr_h, 1, bpp, comp, len(body), 2835, 2835,
        (1 << bpp) if bpp <= 8 else 0, 0,
    )
    data_off = 14 + 40 + len(mask_bytes) + len(pal_bytes)
    file_hdr = struct.pack("<2sIHHI", b"BM", data_off + len(body), 0, 0, data_off)
    return file_hdr + info + mask_bytes + pal_bytes + body


def encode_bmp(px: np.ndarray) -> bytes:
    """Plain 24-bit bottom-up BMP."""
    return encode_bmp_ex(px, bpp=24)


# ---------------------------------------------------------------------------
# ICO — the favicon container every crawl meets at /favicon.ico. Each entry
# is either a PNG (modern) or a headerless BMP "DIB" whose height field
# counts BOTH the XOR image and the 1-bit AND transparency mask.


def encode_ico(images: list[np.ndarray], png: bool = False) -> bytes:
    """Mux RGB frames as an ICO: PNG entries (``png=True``, the modern
    form) or 24-bit DIB entries with an all-opaque AND mask."""
    if not images:
        raise ValueError("need at least one image")
    blobs = []
    for px in images:
        h, w = px.shape[:2]
        if not (1 <= w <= 256 and 1 <= h <= 256):
            raise ValueError("ICO images are 1..256 px per side")
        if png:
            from etlpy_spark.functions.pngcodec import encode_png_ex

            blobs.append(encode_png_ex(px))
        else:
            bmp = encode_bmp_ex(px, bpp=24)
            (off,) = struct.unpack("<I", bmp[10:14])
            dib = bytearray(bmp[14:])
            dib[8:12] = struct.pack("<i", 2 * h)  # height counts the AND mask
            and_stride = ((w + 31) // 32) * 4
            blobs.append(bytes(dib[: off - 14]) + bytes(dib[off - 14 :])
                         + b"\x00" * (and_stride * h))
    out = struct.pack("<HHH", 0, 1, len(images))
    data_at = 6 + 16 * len(images)
    for px, blob in zip(images, blobs):
        h, w = px.shape[:2]
        out += struct.pack(
            "<BBBBHHII", w & 0xFF, h & 0xFF, 0, 0, 1, 32 if png else 24,
            len(blob), data_at,
        )
        data_at += len(blob)
    return out + b"".join(blobs)


def decode_ico(data: bytes) -> np.ndarray:
    """Largest image of an ICO → (h, w, 3) uint8 RGB. PNG entries route
    through the full PNG decoder; DIB entries synthesize a BMP file
    header (height halved back) and apply the AND mask over white."""
    if len(data) < 6 or data[:4] != b"\x00\x00\x01\x00":
        raise ValueError("not an ICO stream")
    (count,) = struct.unpack("<H", data[4:6])
    if count == 0:
        raise ValueError("ICO stream has no images")
    best = None
    for i in range(count):
        at = 6 + 16 * i
        w, h = data[at] or 256, data[at + 1] or 256
        size, off = struct.unpack("<II", data[at + 8 : at + 16])
        if best is None or w * h > best[0] * best[1]:
            best = (w, h, data[off : off + size])
    w, h, blob = best
    if blob[:8] == b"\x89PNG\r\n\x1a\n":
        from etlpy_spark.functions.pngcodec import decode_png

        return decode_png(blob)
    if len(blob) < 40:
        raise ValueError("truncated ICO DIB")
    (hdr_size,) = struct.unpack("<I", blob[:4])
    dib = bytearray(blob)
    dib[8:12] = struct.pack("<i", h)  # un-double the height
    _, _, _, bpp, comp = struct.unpack("<iihHI", bytes(dib[4:20]))
    (n_colors,) = struct.unpack("<I", bytes(dib[32:36]))
    pal = (n_colors or (1 << bpp)) * 4 if bpp <= 8 else 0
    masks = 12 if comp == 3 else 0
    data_off = 14 + hdr_size + masks + pal
    bmp = struct.pack("<2sIHHI", b"BM", data_off + len(dib), 0, 0, data_off) + bytes(dib)
    px = decode_bmp(bmp)
    if bpp < 32:  # AND mask: 1 = transparent, composited over white
        xor_bytes = _stride(w * bpp) * h
        and_stride = ((w + 31) // 32) * 4
        mask_at = data_off - 14 + xor_bytes
        mask_raw = bytes(dib[mask_at : mask_at + and_stride * h])
        if len(mask_raw) == and_stride * h:
            rows = np.frombuffer(mask_raw, np.uint8).reshape(h, and_stride)
            bits = np.unpackbits(rows, axis=1)[:, :w].astype(bool)[::-1]
            px = px.copy()
            px[bits] = 255
    return px
