"""From-scratch baseline TIFF 6.0 codec, numpy + stdlib only.

Scanned-document and scientific corpora ship TIFF (it is the archival
scan format the way FLAC is the archival audio format); until this module
TIFF blobs fell to the decode_error path. Decode coverage targets the
baseline spec plus the two compressors real scans use:

- both byte orders (II little / MM big), IFD walk with inline vs offset
  values handled per type
- strips (StripOffsets/StripByteCounts/RowsPerStrip), chunky planar
  config
- photometric 0/1 (bilevel+gray, WhiteIsZero inverted), 2 (RGB), 3
  (palette via the 16-bit ColorMap)
- 1-bit bilevel and 8-bit samples
- Compression 1 (none), 32773 (PackBits), 5 (TIFF-variant LZW — MSB-first
  packing and the *early-change* width bump when the decoder's table
  reaches 2^w−1 entries, one code earlier than the GIF LZW in
  gifcodec.py; conformance against real libtiff/Java streams pinned by
  tests/test_jvm_conformance.py)
- Predictor 2 (horizontal differencing) for gray/RGB

``encode_tiff_ex`` emits every accepted variant (including a PackBits and
a TIFF-LZW compressor and the predictor), so round-trip tests are
differential; the EXIF orientation walk in jpegcodec.py shares this IFD
layout but is independent code for a hostile-input surface.
"""

from __future__ import annotations

import struct

import numpy as np

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}


# ---------------------------------------------------------------------------
# PackBits


def packbits_encode(row: bytes) -> bytes:
    out = bytearray()
    i, n = 0, len(row)
    while i < n:
        run = 1
        while i + run < n and run < 128 and row[i + run] == row[i]:
            run += 1
        if run >= 2:
            out += bytes((257 - run, row[i]))
            i += run
        else:
            start = i
            while (
                i < n and i - start < 128
                and not (i + 1 < n and row[i] == row[i + 1])
            ):
                i += 1
            out += bytes((i - start - 1,)) + row[start:i]
    return bytes(out)


def packbits_decode(data: bytes, expect: int) -> bytes:
    out = bytearray()
    i, n = 0, len(data)
    while i < n and len(out) < expect:
        b = data[i]
        i += 1
        if b < 128:  # literal run of b+1
            out += data[i : i + b + 1]
            i += b + 1
        elif b > 128:  # repeat next byte 257-b times
            if i >= n:
                raise ValueError("truncated PackBits strip")
            out += bytes([data[i]]) * (257 - b)
            i += 1
        # 128 = noop
    if len(out) < expect:
        raise ValueError("truncated PackBits strip")
    return bytes(out[:expect])


# ---------------------------------------------------------------------------
# TIFF LZW (MSB-first, early change — NOT the GIF variant)

_CLEAR, _EOI = 256, 257


def tiff_lzw_encode(data: bytes) -> bytes:
    out = bytearray()
    acc = n = 0

    def put(code: int, width: int) -> None:
        nonlocal acc, n
        acc = (acc << width) | code
        n += width
        while n >= 8:
            n -= 8
            out.append((acc >> n) & 0xFF)

    width = 9
    table: dict[bytes, int] = {}
    next_code = 258
    put(_CLEAR, width)
    cur = b""
    for byte in data:
        if not cur:
            cur = bytes([byte])
            continue
        key = cur + bytes([byte])
        if key in table:
            cur = key
            continue
        put(table[cur] if len(cur) > 1 else cur[0], width)
        table[key] = next_code
        next_code += 1
        # Width bump aligned with the REFERENCE decoders (libtiff, Java
        # TIFFLZWDecompressor), which count ACTUAL table entries and
        # switch at 2^w - 1 entries ("early change"): the decoder's
        # first post-clear read appends nothing, so its entry count
        # lags this counter by one — the encoder must therefore bump at
        # next_code == 2^w for the stream's width changes to land on
        # the same code boundary. An earlier revision bumped at
        # 2^w - 1 here AND mirrored that in the decoder: every
        # self-round-trip passed while real LZW TIFFs desynced at code
        # 511 (caught by tests/test_jvm_conformance.py).
        if next_code == (1 << width):
            if width < 12:
                width += 1
            else:
                put(_CLEAR, width)
                table.clear()
                next_code = 258
                width = 9
        cur = bytes([byte])
    if cur:
        put(table[cur] if len(cur) > 1 else cur[0], width)
    put(_EOI, width)
    if n:
        out.append((acc << (8 - n)) & 0xFF)
    return bytes(out)


def tiff_lzw_decode(data: bytes, expect: int) -> bytes:
    out = bytearray()
    pos = acc = nbits = 0
    width = 9
    table: list[bytes] = []
    prev = b""

    def reset() -> None:
        nonlocal table, width, prev
        table = [bytes([i]) for i in range(256)] + [b"", b""]
        width = 9
        prev = b""

    reset()
    n = len(data)
    while len(out) < expect:
        while nbits < width:
            if pos >= n:
                raise ValueError("truncated TIFF LZW strip")
            acc = (acc << 8) | data[pos]
            pos += 1
            nbits += 8
        code = (acc >> (nbits - width)) & ((1 << width) - 1)
        nbits -= width
        if code == _CLEAR:
            reset()
            continue
        if code == _EOI:
            break
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev:
            entry = prev + prev[:1]
        else:
            raise ValueError(f"invalid TIFF LZW code {code}")
        if prev:
            table.append(prev + entry[:1])
            # early change, reference-decoder semantics: switch width
            # when the ACTUAL entry count reaches 2^w - 1 (libtiff and
            # Java bump here; the encoder above is one insert ahead and
            # bumps at 2^w — same stream position)
            if len(table) == (1 << width) - 1 and width < 12:
                width += 1
        out += entry
        prev = entry
    if len(out) < expect:
        raise ValueError("TIFF LZW strip ended early")
    return bytes(out[:expect])


# ---------------------------------------------------------------------------
# decode


def _read_entry_values(data: bytes, bo: str, typ: int, count: int, field: bytes):
    size = _TYPE_SIZES.get(typ)
    if size is None:
        return None
    total = size * count
    raw = field[:total] if total <= 4 else data[
        struct.unpack(bo + "I", field)[0] : struct.unpack(bo + "I", field)[0] + total
    ]
    if len(raw) < total:
        raise ValueError("truncated TIFF IFD value")
    if typ == 3:
        return list(struct.unpack(bo + "H" * count, raw))
    if typ == 4:
        return list(struct.unpack(bo + "I" * count, raw))
    if typ in (1, 2):
        return list(raw)
    return None


def decode_tiff(data: bytes) -> np.ndarray:
    """First IFD of a baseline TIFF → (h, w, 3) uint8 RGB."""
    if data[:4] == b"II*\x00":
        bo = "<"
    elif data[:4] == b"MM\x00*":
        bo = ">"
    else:
        raise ValueError("not a TIFF stream")
    (ifd_off,) = struct.unpack(bo + "I", data[4:8])
    if ifd_off + 2 > len(data):
        raise ValueError("truncated TIFF IFD")
    (n_entries,) = struct.unpack(bo + "H", data[ifd_off : ifd_off + 2])
    tags: dict[int, list] = {}
    for i in range(n_entries):
        at = ifd_off + 2 + 12 * i
        tag, typ, count = struct.unpack(bo + "HHI", data[at : at + 8])
        vals = _read_entry_values(data, bo, typ, count, data[at + 8 : at + 12])
        if vals is not None:
            tags[tag] = vals

    def one(tag: int, default=None):
        v = tags.get(tag)
        if v is None:
            if default is None:
                raise ValueError(f"TIFF missing required tag {tag}")
            return default
        return v[0]

    w, h = one(256), one(257)
    spp = one(277, 1)
    bits = tags.get(258, [8] * spp)
    comp = one(259, 1)
    photometric = one(262)
    predictor = one(317, 1)
    if one(284, 1) != 1:
        raise ValueError("planar TIFF not supported (chunky only)")
    if len(set(bits)) != 1 or bits[0] not in (1, 8):
        raise ValueError(f"unsupported TIFF bit depths {bits}")
    bps = bits[0]
    if bps == 1 and (spp != 1 or photometric not in (0, 1)):
        raise ValueError("1-bit TIFF must be bilevel")

    offsets = tags.get(273)
    counts = tags.get(279)
    if not offsets or not counts or len(offsets) != len(counts):
        raise ValueError("TIFF missing strip layout")
    rows_per_strip = one(278, h)
    stride = (w * spp * bps + 7) // 8

    strips = []
    row0 = 0
    for off, cnt in zip(offsets, counts):
        n_rows = min(rows_per_strip, h - row0)
        expect = stride * n_rows
        raw = data[off : off + cnt]
        if comp == 1:
            if len(raw) < expect:
                raise ValueError("truncated TIFF strip")
            strips.append(raw[:expect])
        elif comp == 32773:
            strips.append(packbits_decode(raw, expect))
        elif comp == 5:
            strips.append(tiff_lzw_decode(raw, expect))
        else:
            raise ValueError(f"unsupported TIFF compression {comp}")
        row0 += n_rows
    rows = np.frombuffer(b"".join(strips), np.uint8).reshape(h, stride)

    if bps == 1:
        px = np.unpackbits(rows, axis=1)[:, :w].astype(np.uint8) * 255
        if photometric == 0:  # WhiteIsZero
            px = 255 - px
        return np.repeat(px[..., None], 3, axis=2)

    samples = rows[:, : w * spp].reshape(h, w, spp)
    if predictor == 2:  # horizontal differencing per sample lane
        samples = np.cumsum(samples, axis=1, dtype=np.uint8)
    elif predictor != 1:
        raise ValueError(f"unsupported TIFF predictor {predictor}")

    if photometric == 2:
        if spp < 3:
            raise ValueError("RGB TIFF needs 3 samples per pixel")
        return np.ascontiguousarray(samples[..., :3])
    if photometric == 3:
        cmap = tags.get(320)
        if not cmap or len(cmap) < 3 * 256:
            raise ValueError("palette TIFF missing ColorMap")
        lut = (np.array(cmap[: 3 * 256], np.uint32).reshape(3, 256).T >> 8).astype(np.uint8)
        return lut[samples[..., 0]]
    if photometric in (0, 1):
        g = samples[..., 0]
        if photometric == 0:
            g = 255 - g
        return np.repeat(g[..., None], 3, axis=2)
    raise ValueError(f"unsupported TIFF photometric {photometric}")


# ---------------------------------------------------------------------------
# encode


def encode_tiff_ex(
    px: np.ndarray,
    photometric: int = 2,
    compression: int = 1,
    predictor: int = 1,
    rows_per_strip: int = 0,
    byte_order: str = "II",
    palette: np.ndarray | None = None,
    bilevel: bool = False,
) -> bytes:
    """TIFF writer for every variant :func:`decode_tiff` accepts. ``px``:
    (h,w,3) RGB for photometric 2; (h,w) gray for 0/1 (``bilevel=True``
    packs 1-bit); (h,w) indices + ``palette`` (256,3) for photometric 3."""
    bo = "<" if byte_order == "II" else ">"
    if photometric == 2:
        h, w = px.shape[:2]
        spp, bps = 3, 8
        samples = px
    elif photometric == 3:
        if palette is None or px.ndim != 2:
            raise ValueError("palette TIFF needs indices + palette")
        h, w = px.shape
        spp, bps = 1, 8
        samples = px[..., None]
    else:
        h, w = px.shape
        spp = 1
        bps = 1 if bilevel else 8
        g = px
        if photometric == 0:
            g = (255 - g) if not bilevel else (1 - g)
        samples = g[..., None]
    rows_per_strip = rows_per_strip or h
    stride = (w * spp * bps + 7) // 8

    if bps == 1:
        raw_rows = np.packbits(samples[..., 0].astype(np.uint8) & 1, axis=1)
        pad = np.zeros((h, stride - raw_rows.shape[1]), np.uint8)
        raw_rows = np.concatenate([raw_rows, pad], axis=1)
    else:
        enc = samples
        if predictor == 2:
            enc = np.diff(samples.astype(np.int16), axis=1,
                          prepend=np.zeros((h, 1, spp), np.int16)).astype(np.uint8)
        raw_rows = enc.reshape(h, w * spp)
        if stride > raw_rows.shape[1]:
            raw_rows = np.concatenate(
                [raw_rows, np.zeros((h, stride - raw_rows.shape[1]), np.uint8)], axis=1
            )

    strips, counts = [], []
    for r0 in range(0, h, rows_per_strip):
        chunk = raw_rows[r0 : r0 + rows_per_strip].tobytes()
        if compression == 32773:
            chunk = packbits_encode(chunk)
        elif compression == 5:
            chunk = tiff_lzw_encode(chunk)
        elif compression != 1:
            raise ValueError(f"unsupported compression {compression}")
        strips.append(chunk)
        counts.append(len(chunk))

    entries = []  # (tag, type, count, values)
    entries.append((256, 4, 1, [w]))
    entries.append((257, 4, 1, [h]))
    entries.append((258, 3, spp, [bps] * spp))
    entries.append((259, 3, 1, [compression]))
    entries.append((262, 3, 1, [photometric]))
    entries.append((277, 3, 1, [spp]))
    entries.append((278, 4, 1, [rows_per_strip]))
    if predictor != 1:
        entries.append((317, 3, 1, [predictor]))
    cmap_vals = None
    if photometric == 3:
        lut = np.zeros((256, 3), np.uint16)
        lut[: len(palette)] = np.asarray(palette, np.uint16) << 8
        cmap_vals = list(lut.T.reshape(-1))
        entries.append((320, 3, len(cmap_vals), cmap_vals))
    entries.append((273, 4, len(strips), None))  # offsets patched below
    entries.append((279, 4, len(counts), counts))
    entries.sort(key=lambda e: e[0])

    # layout: header(8) + IFD + overflow values + strip data
    ifd_off = 8
    ifd_size = 2 + 12 * len(entries) + 4
    overflow_at = ifd_off + ifd_size
    overflow = bytearray()

    def value_field(typ, count, vals):
        size = _TYPE_SIZES[typ] * count
        packed = struct.pack(bo + ("H" if typ == 3 else "I") * count, *vals)
        if size <= 4:
            return packed + b"\x00" * (4 - size)
        off = overflow_at + len(overflow)
        overflow.extend(packed)
        return struct.pack(bo + "I", off)

    # first pass to size the overflow area (strip offsets need data start)
    sizes = sum(
        _TYPE_SIZES[t] * c for _, t, c, v in entries
        if _TYPE_SIZES[t] * c > 4
    )
    data_start = overflow_at + sizes
    strip_offsets = []
    at = data_start
    for c in counts:
        strip_offsets.append(at)
        at += c

    ifd = struct.pack(bo + "H", len(entries))
    for tag, typ, count, vals in entries:
        if tag == 273:
            vals = strip_offsets
        ifd += struct.pack(bo + "HHI", tag, typ, count) + value_field(typ, count, vals)
    ifd += struct.pack(bo + "I", 0)  # no next IFD

    head = (b"II*\x00" if bo == "<" else b"MM\x00*") + struct.pack(bo + "I", ifd_off)
    return head + ifd + bytes(overflow) + b"".join(strips)


def encode_tiff(px: np.ndarray) -> bytes:
    """Plain uncompressed RGB TIFF."""
    return encode_tiff_ex(px)
