"""Baseline JFIF/JPEG codec, numpy-only (no libjpeg/PIL in the environment).

The reference crawler downloads real web images and sniffs jpg/png/gif by
magic bytes (reference spider.py:303-314 GetImageFormat); jpg is the format
an actual image crawl overwhelmingly sees, and the north rule's per-row
invariant is "decoded-pixel allclose, PSNR>=40 dB for lossy formats". The
y4m path exercises that branch with chroma-rounding loss only; this module
adds the real thing: a from-scratch baseline sequential DCT JPEG
(ITU-T T.81) encoder + decoder so the PSNR gate runs against genuine
quantized-DCT loss in the file format the rule is about.

Scope (honest limits, all checked with clear errors):
  * encoder: baseline sequential (SOF0) or PROGRESSIVE (SOF2 — spectral
    selection + one successive-approximation level, per-scan optimal
    Huffman tables), 8-bit, single-component grayscale (HxW input) or
    YCbCr 4:4:4 (default -- no subsampling, so a quality>=96 encode stays
    over the 40 dB gate on the sharp synthetic fixtures) or 4:2:0 (2x2
    box-averaged chroma, the layout web JPEGs overwhelmingly use),
    standard Annex K quantization tables scaled by the libjpeg quality
    formula, standard Annex K Huffman tables for baseline, JFIF APP0
    header, optional DRI/RSTn restart markers (baseline only).
  * decoder: baseline/extended sequential (SOF0/1) AND progressive
    (SOF2: DC/AC first + refinement scans, EOB runs, successive
    approximation, restart markers), 8-bit, 1- or 3-component, ARBITRARY
    sampling factors 1..4 (4:2:0 / 4:2:2 / 4:4:0 / 4:1:1 all decode;
    chroma is upsampled nearest-neighbor). Lossless/hierarchical SOFs,
    arithmetic coding, and 16-bit quant tables are rejected rather than
    mis-decoded.

All the block math (DCT, quantize, zigzag, color transform) is vectorized
numpy over every 8x8 block at once; only the entropy coding loop is
per-symbol Python, which is the correct trade at test scale and is isolated
behind encode_jpeg/decode_jpeg so a libjpeg drop-in keeps the same surface.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# constant tables (ITU-T T.81 Annex K)

# K.1 -- luminance / chrominance quantization tables, natural (row) order
_QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32).reshape(8, 8)

_QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32).reshape(8, 8)

# zigzag scan: _ZIGZAG[k] = flat (row-major) index of the k-th zigzag coeff
_ZZ = np.array([
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)
_UNZZ = np.argsort(_ZZ)  # natural index -> zigzag position

# K.3 -- standard Huffman tables: (BITS[1..16], HUFFVAL)
_DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUMA_VALS = list(range(12))
_DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_CHROMA_VALS = list(range(12))
_AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
_AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) by the canonical construction (T.81 C.2)."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


_ENC_DC = (_canonical_codes(_DC_LUMA_BITS, _DC_LUMA_VALS),
           _canonical_codes(_DC_CHROMA_BITS, _DC_CHROMA_VALS))
_ENC_AC = (_canonical_codes(_AC_LUMA_BITS, _AC_LUMA_VALS),
           _canonical_codes(_AC_CHROMA_BITS, _AC_CHROMA_VALS))


def _dct_matrix() -> np.ndarray:
    k = np.arange(8)
    m = np.cos(np.pi * (2 * k[None, :] + 1) * k[:, None] / 16.0) * 0.5
    m[0] /= np.sqrt(2.0)
    return m


_DCT8 = _dct_matrix()


def quant_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """Annex K tables scaled by the libjpeg quality formula (1..100)."""
    q = min(100, max(1, int(quality)))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    out = []
    for t in (_QUANT_LUMA, _QUANT_CHROMA):
        s = (t * scale + 50) // 100
        out.append(np.clip(s, 1, 255).astype(np.int32))
    return out[0], out[1]


# ---------------------------------------------------------------------------
# block helpers (vectorized over all blocks of a component)


def _to_blocks(plane: np.ndarray) -> tuple[np.ndarray, int, int]:
    """(h, w) float plane -> (n_blocks, 8, 8), edge-replicated to 8k x 8k."""
    h, w = plane.shape
    ph, pw = -h % 8, -w % 8
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    hh, ww = plane.shape
    by, bx = hh // 8, ww // 8
    blocks = plane.reshape(by, 8, bx, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    return blocks, by, bx


def _from_blocks(blocks: np.ndarray, by: int, bx: int, h: int, w: int) -> np.ndarray:
    plane = blocks.reshape(by, bx, 8, 8).transpose(0, 2, 1, 3).reshape(by * 8, bx * 8)
    return plane[:h, :w]


def _fdct_quant(plane: np.ndarray, qt: np.ndarray) -> np.ndarray:
    """plane -> (n_blocks, 64) int32 quantized coefficients in ZIGZAG order.

    Coefficients clamp to ±1023 (category ≤ 10, libjpeg-compatible): at
    quality 100 the quant table is all 1s and an adversarial block can
    quantize to ±1024 = category 11, which the Annex K AC tables cannot
    encode (only 1..10) — unclamped that was a bare KeyError."""
    blocks, _, _ = _to_blocks(plane.astype(np.float64) - 128.0)
    coef = np.einsum("ij,njk,lk->nil", _DCT8, blocks, _DCT8, optimize=True)
    q = np.clip(np.round(coef / qt), -1023, 1023).astype(np.int32)
    return q.reshape(-1, 64)[:, _ZZ]


def _dequant_idct(zz: np.ndarray, qt: np.ndarray, by: int, bx: int,
                  h: int, w: int) -> np.ndarray:
    coef = np.zeros((zz.shape[0], 64), dtype=np.float64)
    coef[:, _ZZ] = zz * qt.reshape(64)[_ZZ]
    blocks = coef.reshape(-1, 8, 8)
    px = np.einsum("ji,njk,kl->nil", _DCT8, blocks, _DCT8, optimize=True) + 128.0
    return _from_blocks(px, by, bx, h, w)


def _rgb_to_ycbcr(px: np.ndarray) -> np.ndarray:
    r, g, b = (px[..., i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(y: np.ndarray, cb: np.ndarray, cr: np.ndarray) -> np.ndarray:
    # same BT.601 full-range inverse as the y4m path -- one copy of the
    # constants (the forward transform here stays float, pre-DCT, so it is
    # NOT shared with mediacodec's uint8-rounding _rgb_to_yuv)
    from etlpy_spark.functions.mediacodec import _yuv_to_rgb

    return _yuv_to_rgb(np.stack([y, cb, cr], axis=-1))


# ---------------------------------------------------------------------------
# entropy coding


class _BitWriter:
    __slots__ = ("buf", "acc", "nbits")

    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:  # byte stuffing (T.81 F.1.2.3)
                self.buf.append(0x00)
        self.acc &= (1 << self.nbits) - 1

    def pad_to_byte(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)  # pad with 1-bits

    def put_marker(self, byte: int) -> None:
        """Raw marker bytes (RSTn) — bypass stuffing, must be byte-aligned."""
        self.pad_to_byte()
        self.buf += bytes((0xFF, byte))

    def flush(self) -> bytes:
        self.pad_to_byte()
        return bytes(self.buf)


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _encode_block(w: _BitWriter, zz: np.ndarray, pred: int,
                  dc_codes: dict, ac_codes: dict) -> int:
    dc = int(zz[0])
    diff = dc - pred
    cat = _category(diff)
    code, ln = dc_codes[cat]
    w.put(code, ln)
    if cat:
        w.put(diff if diff >= 0 else diff + (1 << cat) - 1, cat)
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for k in range(1, 64):
        v = int(zz[k])
        if k > last_nz:
            code, ln = ac_codes[0x00]  # EOB
            w.put(code, ln)
            break
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]  # ZRL
            w.put(code, ln)
            run -= 16
        cat = _category(v)
        code, ln = ac_codes[(run << 4) | cat]
        w.put(code, ln)
        w.put(v if v >= 0 else v + (1 << cat) - 1, cat)
        run = 0
    return dc


class _HuffTable:
    """Decode table: one 8-bit first-level LUT (covers nearly every symbol
    of the Annex K tables) + a (length, code) dict for 9..16-bit codes."""

    __slots__ = ("lut", "long")

    def __init__(self, bits: list[int], vals: list[int]) -> None:
        self.lut: list[tuple[int, int] | None] = [None] * 256
        self.long: dict[tuple[int, int], int] = {}
        for sym, (code, ln) in _canonical_codes(bits, vals).items():
            if ln <= 8:
                base = code << (8 - ln)
                for i in range(1 << (8 - ln)):
                    self.lut[base + i] = (sym, ln)
            else:
                self.long[(ln, code)] = sym


class _BitReader:
    """MSB-first bit reader over a destuffed entropy segment.

    Peeks go through a 4-byte window (data is 1-padded so a peek near the
    end never walks off); value-bit reads must stay inside the real data,
    while symbol skips tolerate the encoder's <=7 pad bits."""

    __slots__ = ("data", "bitlen", "pos")

    def __init__(self, data: bytes) -> None:
        self.data = data + b"\xff\xff\xff\xff"
        self.bitlen = 8 * len(data)
        self.pos = 0

    def _peek(self, n: int) -> int:
        byte, off = self.pos >> 3, self.pos & 7
        chunk = int.from_bytes(self.data[byte:byte + 4], "big")
        return (chunk >> (32 - off - n)) & ((1 << n) - 1)

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        if self.pos + n > self.bitlen:
            raise ValueError("jpeg: entropy data truncated")
        v = self._peek(n)
        self.pos += n
        return v

    def read_symbol(self, table: _HuffTable) -> int:
        hit = table.lut[self._peek(8)]
        if hit is not None:
            sym, ln = hit
            self.pos += ln
            if self.pos > self.bitlen + 7:
                raise ValueError("jpeg: entropy data truncated")
            return sym
        long = table.long
        for ln in range(9, 17):
            sym = long.get((ln, self._peek(ln)))
            if sym is not None:
                self.pos += ln
                if self.pos > self.bitlen + 7:
                    raise ValueError("jpeg: entropy data truncated")
                return sym
        raise ValueError("jpeg: invalid Huffman code")


def _extend(bits: int, cat: int) -> int:
    if cat == 0:
        return 0
    return bits if bits >= (1 << (cat - 1)) else bits - (1 << cat) + 1


# ---------------------------------------------------------------------------
# encoder


def _encode_gray(px: np.ndarray, qy: np.ndarray,
                 restart_interval: int, progressive: bool = False) -> bytes:
    """Single-component (grayscale) JFIF — the other scan shape real web
    JPEGs use; decode_jpeg replicates it to HxWx3."""
    h, w = px.shape
    blocks = _fdct_quant(px.astype(np.float64), qy)
    out = bytearray()
    out += b"\xff\xd8"
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" \
        + struct.pack(">HH", 1, 1) + b"\x00\x00"
    out += b"\xff\xdb" + struct.pack(">HB", 67, 0)
    out += bytes(int(v) for v in qy.reshape(64)[_ZZ])
    out += (b"\xff\xc2" if progressive else b"\xff\xc0")
    out += struct.pack(">HBHHB", 11, 8, h, w, 1)
    out += struct.pack(">BBB", 1, 0x11, 0)
    if progressive:
        bw = (w + 7) // 8
        _emit_progressive_scans(
            out, [blocks], [1], [(bw, (h + 7) // 8, bw)],
            [(0, b) for b in range(blocks.shape[0])],
        )
        out += b"\xff\xd9"
        return bytes(out)
    for tc_th, bits, vals in (
        (0x00, _DC_LUMA_BITS, _DC_LUMA_VALS),
        (0x10, _AC_LUMA_BITS, _AC_LUMA_VALS),
    ):
        out += b"\xff\xc4" + struct.pack(">HB", 19 + len(vals), tc_th)
        out += bytes(bits) + bytes(vals)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    out += b"\xff\xda" + struct.pack(">HB", 8, 1)
    out += struct.pack(">BB", 1, 0x00)
    out += b"\x00\x3f\x00"
    wtr = _BitWriter()
    pred, rst = 0, 0
    for b in range(blocks.shape[0]):
        if restart_interval and b and b % restart_interval == 0:
            wtr.put_marker(0xD0 + rst)
            rst = (rst + 1) & 7
            pred = 0
        pred = _encode_block(wtr, blocks[b], pred, _ENC_DC[0], _ENC_AC[0])
    out += wtr.flush()
    out += b"\xff\xd9"
    return bytes(out)


def encode_jpeg(px: np.ndarray, quality: int = 92,
                restart_interval: int = 0,
                subsampling: str = "444",
                progressive: bool = False) -> bytes:
    """uint8 HxWx3 RGB (or HxW grayscale) -> JFIF bytes.

    ``restart_interval`` > 0 emits a DRI segment and RSTn markers every
    that many MCUs (what real encoders do for error resilience); 0 omits
    them. ``subsampling`` is ``'444'`` (default — the only mode that can
    hold a PSNR >= 40 dB gate on high-chroma-frequency content) or
    ``'420'`` (2x2 box-averaged chroma in 16x16 MCUs — what web JPEGs
    overwhelmingly use; expect ~27 dB on the procedural fixtures, same
    as Y4M C420). ``progressive`` emits SOF2 with the classic
    spectral-selection + successive-approximation scan script and
    per-scan optimal Huffman tables; the quantized coefficients are
    identical to the baseline emission, so both decode to the SAME
    pixels."""
    gray = px.ndim == 2
    if not gray and (px.ndim != 3 or px.shape[2] != 3):
        raise ValueError("encode_jpeg expects uint8 HxWx3 RGB or HxW gray")
    if px.dtype != np.uint8:
        raise ValueError("encode_jpeg expects uint8 pixels")
    if subsampling not in ("444", "420"):
        raise ValueError("subsampling must be '444' or '420'")
    if progressive and restart_interval:
        raise ValueError("jpeg: restart markers unsupported with progressive")
    h, w = px.shape[:2]
    if h > 0xFFFF or w > 0xFFFF:
        raise ValueError("jpeg: dimension > 65535")
    qy, qc = quant_tables(quality)
    if gray:
        return _encode_gray(px, qy, restart_interval, progressive)
    ycc = _rgb_to_ycbcr(px)
    if subsampling == "420":
        # pad planes to 16-multiples so the chroma planes land exactly on
        # 8-multiples and chroma raster-block order == MCU order
        ph, pw = -h % 16, -w % 16
        if ph or pw:
            ycc = np.pad(ycc, ((0, ph), (0, pw), (0, 0)), mode="edge")
        cb = ycc[..., 1].reshape(ycc.shape[0] // 2, 2, ycc.shape[1] // 2, 2)
        cr = ycc[..., 2].reshape(ycc.shape[0] // 2, 2, ycc.shape[1] // 2, 2)
        comps = [
            _fdct_quant(ycc[..., 0], qy),
            _fdct_quant(cb.mean(axis=(1, 3)), qc),
            _fdct_quant(cr.mean(axis=(1, 3)), qc),
        ]
        samp = (0x22, 0x11, 0x11)
        mcux, mcuy = ycc.shape[1] // 16, ycc.shape[0] // 16
    else:
        comps = [
            _fdct_quant(ycc[..., 0], qy),
            _fdct_quant(ycc[..., 1], qc),
            _fdct_quant(ycc[..., 2], qc),
        ]
        samp = (0x11, 0x11, 0x11)
        mcux, mcuy = (w + 7) // 8, (h + 7) // 8

    out = bytearray()
    out += b"\xff\xd8"  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" \
        + struct.pack(">HH", 1, 1) + b"\x00\x00"
    for tid, qt in ((0, qy), (1, qc)):
        out += b"\xff\xdb" + struct.pack(">HB", 67, tid)
        out += bytes(int(v) for v in qt.reshape(64)[_ZZ])  # zigzag order
    out += (b"\xff\xc2" if progressive else b"\xff\xc0")
    out += struct.pack(">HBHHB", 17, 8, h, w, 3)
    for (cid, tq), hv in zip(((1, 0), (2, 1), (3, 1)), samp):
        out += struct.pack(">BBB", cid, hv, tq)

    if progressive:
        lbx = 2 * mcux if subsampling == "420" else mcux
        if subsampling == "420":
            dims = [
                ((w + 7) // 8, (h + 7) // 8, lbx),
                (((w + 1) // 2 + 7) // 8, ((h + 1) // 2 + 7) // 8, mcux),
                (((w + 1) // 2 + 7) // 8, ((h + 1) // 2 + 7) // 8, mcux),
            ]
            dc_walk = []
            for m in range(mcux * mcuy):
                my, mx = divmod(m, mcux)
                for r in (0, 1):
                    for c in (0, 1):
                        dc_walk.append((0, (2 * my + r) * lbx + (2 * mx + c)))
                dc_walk.append((1, m))
                dc_walk.append((2, m))
        else:
            dims = [((w + 7) // 8, (h + 7) // 8, mcux)] * 3
            dc_walk = [(ci, m) for m in range(mcux * mcuy) for ci in range(3)]
        _emit_progressive_scans(out, comps, [1, 2, 3], dims, dc_walk)
        out += b"\xff\xd9"
        return bytes(out)

    for tc_th, bits, vals in (
        (0x00, _DC_LUMA_BITS, _DC_LUMA_VALS),
        (0x10, _AC_LUMA_BITS, _AC_LUMA_VALS),
        (0x01, _DC_CHROMA_BITS, _DC_CHROMA_VALS),
        (0x11, _AC_CHROMA_BITS, _AC_CHROMA_VALS),
    ):
        out += b"\xff\xc4" + struct.pack(">HB", 19 + len(vals), tc_th)
        out += bytes(bits) + bytes(vals)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    out += b"\xff\xda" + struct.pack(">HB", 12, 3)
    for cid, tables in ((1, 0x00), (2, 0x11), (3, 0x11)):
        out += struct.pack(">BB", cid, tables)
    out += b"\x00\x3f\x00"  # Ss=0 Se=63 AhAl=0

    wtr = _BitWriter()
    preds = [0, 0, 0]
    rst = 0
    lbx = 2 * mcux if subsampling == "420" else mcux  # luma blocks per row
    for m in range(mcux * mcuy):
        if restart_interval and m and m % restart_interval == 0:
            wtr.put_marker(0xD0 + rst)
            rst = (rst + 1) & 7
            preds = [0, 0, 0]
        if subsampling == "420":
            my, mx = divmod(m, mcux)
            for r in (0, 1):  # 2x2 luma blocks, raster order within the MCU
                for c in (0, 1):
                    b = (2 * my + r) * lbx + (2 * mx + c)
                    preds[0] = _encode_block(wtr, comps[0][b], preds[0],
                                             _ENC_DC[0], _ENC_AC[0])
            for ci in (1, 2):
                preds[ci] = _encode_block(wtr, comps[ci][m], preds[ci],
                                          _ENC_DC[1], _ENC_AC[1])
        else:  # 4:4:4 — interleaved MCU order == raster block order
            for ci in range(3):
                t = 0 if ci == 0 else 1
                preds[ci] = _encode_block(wtr, comps[ci][m], preds[ci],
                                          _ENC_DC[t], _ENC_AC[t])
    out += wtr.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# progressive (SOF2) encoder. Unlike baseline, progressive scans use
# symbols (EOB-run categories r<<4 for r in 1..14) that the Annex K fixed
# tables do not define, so every Huffman-coded scan is two-pass: count the
# symbols, build an optimal length-limited table (T.81 K.2: pseudo-symbol
# reserves the all-ones code, BITS adjustment caps lengths at 16), emit a
# per-scan DHT, then write the scan — which also exercises the decoder's
# per-scan DHT snapshot on every progressive file.


def _gen_huff(freq_in: dict[int, int]) -> tuple[list[int], list[int]]:
    """symbol→count → (BITS[16], HUFFVAL) — the standard optimal JPEG
    table construction (T.81 K.2 flow)."""
    freq = [0] * 257
    for s, c in freq_in.items():
        freq[s] = c
    freq[256] = 1  # reserved slot: no real symbol may get the all-ones code
    others = [-1] * 257
    codesize = [0] * 257
    while True:
        c1, v = -1, 1 << 60
        for i in range(257):
            if 0 < freq[i] <= v:
                v, c1 = freq[i], i
        c2, v = -1, 1 << 60
        for i in range(257):
            if 0 < freq[i] <= v and i != c1:
                v, c2 = freq[i], i
        if c2 < 0:
            break
        freq[c1] += freq[c2]
        freq[c2] = 0
        codesize[c1] += 1
        while others[c1] >= 0:
            c1 = others[c1]
            codesize[c1] += 1
        others[c1] = c2
        codesize[c2] += 1
        while others[c2] >= 0:
            c2 = others[c2]
            codesize[c2] += 1
    bits = [0] * 33
    for i in range(257):
        if codesize[i]:
            bits[codesize[i]] += 1
    i = 32
    while i > 16:  # length-limit to 16 bits (K.2 Adjust_BITS)
        while bits[i] > 0:
            j = i - 2
            while bits[j] == 0:
                j -= 1
            bits[i] -= 2
            bits[i - 1] += 1
            bits[j + 1] += 2
            bits[j] -= 1
        i -= 1
    while bits[i] == 0:
        i -= 1
    bits[i] -= 1  # drop the reserved all-ones slot (sorts last: max length, max symbol)
    vals = [s for s in sorted(range(256), key=lambda s: (codesize[s], s))
            if codesize[s]]
    return bits[1:17], vals


class _ScanSink:
    """Counting emitter — pass 1 of a two-pass progressive scan encode."""

    def __init__(self) -> None:
        self.freq: dict[int, int] = {}

    def symbol(self, s: int) -> None:
        self.freq[s] = self.freq.get(s, 0) + 1

    def bits(self, v: int, n: int) -> None:
        pass


class _ScanWriter:
    """Huffman-writing emitter — pass 2."""

    def __init__(self, codes: dict[int, tuple[int, int]]) -> None:
        self.w = _BitWriter()
        self.codes = codes

    def symbol(self, s: int) -> None:
        code, ln = self.codes[s]
        self.w.put(code, ln)

    def bits(self, v: int, n: int) -> None:
        if n:
            self.w.put(v, n)


def _enc_dc_scan(em, walk, comps, ah: int, al: int) -> None:
    if ah:  # refinement: one raw bit (bit Al of the DC value) per block
        for ci, b in walk:
            em.bits((int(comps[ci][b][0]) >> al) & 1, 1)
        return
    preds: dict[int, int] = {}
    for ci, b in walk:
        v = int(comps[ci][b][0]) >> al  # arithmetic shift, like the decoder's << Al inverse
        d = v - preds.get(ci, 0)
        preds[ci] = v
        cat = _category(d)
        em.symbol(cat)
        em.bits(d if d >= 0 else d + (1 << cat) - 1, cat)


def _enc_ac_first(em, blocks, idxs, ss: int, se: int, al: int) -> None:
    eobrun = 0

    def flush() -> None:
        nonlocal eobrun
        if eobrun:
            nb = eobrun.bit_length() - 1
            em.symbol(nb << 4)
            em.bits(eobrun - (1 << nb), nb)
            eobrun = 0

    for b in idxs:
        band = [int(v) for v in blocks[b][ss:se + 1]]
        # point transform is a MAGNITUDE shift (T.81 G.1.2.1), not arithmetic
        t = [(abs(v) >> al) * (1 if v >= 0 else -1) for v in band]
        nz = [i for i, v in enumerate(t) if v]
        if not nz:
            eobrun += 1
            if eobrun == 0x7FFF:
                flush()
            continue
        flush()
        r = 0
        for i in range(nz[-1] + 1):
            v = t[i]
            if v == 0:
                r += 1
                continue
            while r > 15:
                em.symbol(0xF0)
                r -= 16
            cat = _category(v)
            em.symbol((r << 4) | cat)
            em.bits(v if v >= 0 else v + (1 << cat) - 1, cat)
            r = 0
        if nz[-1] < se - ss:
            eobrun += 1
            if eobrun == 0x7FFF:
                flush()
    flush()


def _enc_ac_refine(em, blocks, idxs, ss: int, se: int, al: int) -> None:
    eobrun = 0
    pend: list[int] = []  # correction bits buffered across EOB-run blocks

    def flush() -> None:
        nonlocal eobrun, pend
        if eobrun:
            nb = eobrun.bit_length() - 1
            em.symbol(nb << 4)
            em.bits(eobrun - (1 << nb), nb)
            eobrun = 0
        for bit in pend:
            em.bits(bit, 1)
        pend = []

    for b in idxs:
        band = [int(v) for v in blocks[b][ss:se + 1]]
        t = [abs(v) >> al for v in band]
        eobpos = -1  # last newly-significant position bounds symbol emission
        for i, v in enumerate(t):
            if v == 1:
                eobpos = i
        r = 0
        br: list[int] = []  # correction bits of the current block
        for i, v in enumerate(t):
            if v == 0:
                r += 1
                continue
            while r > 15 and i <= eobpos:
                flush()
                em.symbol(0xF0)
                for bit in br:
                    em.bits(bit, 1)
                br = []
                r -= 16
            if v > 1:  # previously-significant: one correction bit
                br.append(v & 1)
                continue
            flush()
            em.symbol((r << 4) | 1)
            em.bits(1 if band[i] >= 0 else 0, 1)
            for bit in br:
                em.bits(bit, 1)
            br = []
            r = 0
        if r > 0 or br:
            eobrun += 1
            pend.extend(br)
            if eobrun == 0x7FFF:
                flush()
    flush()


def _emit_prog_scan(out: bytearray, sel: list[tuple[int, int]], ss: int,
                    se: int, ah: int, al: int, table_class: int,
                    encode_fn) -> None:
    """Two-pass scan emission: count → per-scan DHT → SOS → write."""
    sink = _ScanSink()
    encode_fn(sink)
    codes: dict[int, tuple[int, int]] = {}
    if sink.freq:
        bits, vals = _gen_huff(sink.freq)
        out += b"\xff\xc4" + struct.pack(">HB", 19 + len(vals), table_class)
        out += bytes(bits) + bytes(vals)
        codes = _canonical_codes(bits, vals)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * len(sel), len(sel))
    for cid, tsel in sel:
        out += struct.pack(">BB", cid, tsel)
    out += struct.pack(">BBB", ss, se, (ah << 4) | al)
    wtr = _ScanWriter(codes)
    encode_fn(wtr)
    out += wtr.w.flush()


def _emit_progressive_scans(out: bytearray, comps, cids, dims,
                            dc_walk) -> None:
    """The classic web-encoder progression: interleaved DC first scan at
    Al=1; per-component AC spectral-selection first scans at Al=1 (luma
    split 1-5 / 6-63); per-component AC refinement to Al=0; DC refinement.
    ``dims`` per component: (bw, bh, stride) of its real (unpadded-to-MCU)
    block grid — single-component scans never visit interleave pad blocks."""
    def idxs(ci: int) -> list[int]:
        bw, bh, stride = dims[ci]
        return [row * stride + col for row in range(bh) for col in range(bw)]

    dc_sel = [(cid, 0x00) for cid in cids]
    _emit_prog_scan(out, dc_sel, 0, 0, 0, 1, 0x00,
                    lambda em: _enc_dc_scan(em, dc_walk, comps, 0, 1))
    ac_bands = {0: [(1, 5), (6, 63)]}  # luma split like real encoders
    for ci in range(len(comps)):
        for ss, se in ac_bands.get(ci, [(1, 63)]):
            _emit_prog_scan(
                out, [(cids[ci], 0x00)], ss, se, 0, 1, 0x10,
                lambda em, ci=ci, ss=ss, se=se: _enc_ac_first(
                    em, comps[ci], idxs(ci), ss, se, 1),
            )
    for ci in range(len(comps)):
        _emit_prog_scan(
            out, [(cids[ci], 0x00)], 1, 63, 1, 0, 0x10,
            lambda em, ci=ci: _enc_ac_refine(em, comps[ci], idxs(ci), 1, 63, 0),
        )
    _emit_prog_scan(out, dc_sel, 0, 0, 1, 0, 0x00,
                    lambda em: _enc_dc_scan(em, dc_walk, comps, 1, 0))


# ---------------------------------------------------------------------------
# progressive (SOF2) scan decode — ITU-T T.81 G.2. Coefficients accumulate
# across scans in the shared per-component arrays: DC scans carry the DC
# coefficient at successive-approximation precision Al (first scan = Huffman
# diffs of DC>>Al, refinements = one raw bit each); AC scans are
# single-component by spec, carry a spectral band [Ss, Se] with EOB-run
# coding, and refinements add one magnitude bit per already-nonzero
# coefficient while inserting newly-significant ±1<<Al ones.


def _dc_unit_prog(rdr: _BitReader, zz: np.ndarray, pred: int,
                  dtab: _HuffTable | None, ah: int, al: int) -> int:
    if ah == 0:
        if dtab is None:
            raise ValueError("jpeg: scan references undefined Huffman table")
        s = rdr.read_symbol(dtab)
        pred += _extend(rdr.read(s), s)
        zz[0] = pred << al
        return pred
    if rdr.read(1):
        zz[0] = int(zz[0]) | (1 << al)
    return pred


def _ac_first_unit(rdr: _BitReader, zz: np.ndarray, ss: int, se: int,
                   al: int, atab: _HuffTable | None, eobrun: int) -> int:
    if eobrun > 0:
        return eobrun - 1
    if atab is None:
        raise ValueError("jpeg: scan references undefined Huffman table")
    k = ss
    while k <= se:
        rs = rdr.read_symbol(atab)
        r, s = rs >> 4, rs & 0x0F
        if s:
            k += r
            if k > se:
                raise ValueError("jpeg: AC index overflow")
            zz[k] = _extend(rdr.read(s), s) << al
            k += 1
        elif r != 15:
            eobrun = (1 << r) - 1
            if r:
                eobrun += rdr.read(r)
            break
        else:
            k += 16
    return eobrun


def _ac_refine_unit(rdr: _BitReader, zz: np.ndarray, ss: int, se: int,
                    al: int, atab: _HuffTable | None, eobrun: int) -> int:
    p1, m1 = 1 << al, -1 << al
    k = ss
    if eobrun == 0:
        if atab is None:
            raise ValueError("jpeg: scan references undefined Huffman table")
        while k <= se:
            rs = rdr.read_symbol(atab)
            r, s = rs >> 4, rs & 0x0F
            val = 0
            if s:
                if s != 1:
                    raise ValueError("jpeg: invalid refinement magnitude")
                val = p1 if rdr.read(1) else m1
            elif r != 15:
                eobrun = 1 << r
                if r:
                    eobrun += rdr.read(r)
                break
            # advance past r zero-history coefficients, correcting the
            # nonzero-history ones passed on the way (their bits are
            # interleaved into the stream in walk order)
            while k <= se:
                c = int(zz[k])
                if c != 0:
                    if rdr.read(1) and (c & p1) == 0:
                        zz[k] = c + (p1 if c > 0 else m1)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val and k <= se:
                zz[k] = val
            k += 1
    if eobrun > 0:
        # block is inside an EOB run: only correction bits for the
        # remaining nonzero-history coefficients
        while k <= se:
            c = int(zz[k])
            if c != 0:
                if rdr.read(1) and (c & p1) == 0:
                    zz[k] = c + (p1 if c > 0 else m1)
            k += 1
        eobrun -= 1
    return eobrun


def _decode_progressive_scan(scan_comps, dcmap, acmap, raw, band, geom,
                             coefs, mcux, n_mcus, comp_units, split_restarts,
                             restart_interval) -> None:
    ss, se, ah, al = band
    order = [cid for cid, _, _ in scan_comps]
    if ss == 0:
        if se != 0:
            raise ValueError("jpeg: progressive scan mixes DC and AC")
        interleaved = len(order) > 1
        if interleaved and len(order) != len(geom):
            raise NotImplementedError("jpeg: partially interleaved scan")
        if interleaved:
            units, bw = n_mcus, 0
        else:
            bw, units = comp_units(order[0])
        unit = 0
        for part in split_restarts(raw):
            rdr = _BitReader(part)
            preds = {cid: 0 for cid in order}
            limit = (min(unit + restart_interval, units)
                     if restart_interval else units)
            while unit < limit:
                if interleaved:
                    my, mx = divmod(unit, mcux)
                    for cid in order:
                        sh, sv, cbx, _ = geom[cid]
                        carr = coefs[cid]
                        for r in range(sv):
                            row = (my * sv + r) * cbx + mx * sh
                            for c in range(sh):
                                preds[cid] = _dc_unit_prog(
                                    rdr, carr[row + c], preds[cid],
                                    dcmap[cid], ah, al,
                                )
                else:
                    cid0 = order[0]
                    cbx = geom[cid0][2]
                    bry, brx = divmod(unit, bw)
                    preds[cid0] = _dc_unit_prog(
                        rdr, coefs[cid0][bry * cbx + brx], preds[cid0],
                        dcmap[cid0], ah, al,
                    )
                unit += 1
        return
    if len(order) != 1:
        raise ValueError("jpeg: progressive AC scan must be single-component")
    if not (1 <= ss <= se <= 63):
        raise ValueError("jpeg: bad progressive spectral band")
    cid0 = order[0]
    atab = acmap[cid0]
    cbx = geom[cid0][2]
    carr = coefs[cid0]
    bw, units = comp_units(cid0)
    unit = 0
    for part in split_restarts(raw):
        rdr = _BitReader(part)
        eobrun = 0
        limit = (min(unit + restart_interval, units)
                 if restart_interval else units)
        while unit < limit:
            bry, brx = divmod(unit, bw)
            zz = carr[bry * cbx + brx]
            if ah == 0:
                eobrun = _ac_first_unit(rdr, zz, ss, se, al, atab, eobrun)
            else:
                eobrun = _ac_refine_unit(rdr, zz, ss, se, al, atab, eobrun)
            unit += 1


# ---------------------------------------------------------------------------
# decoder


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline JFIF bytes -> uint8 HxWx3 RGB (or HxWx3 gray replicated)."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("jpeg: missing SOI")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[int, _HuffTable] = {}
    sof = None
    progressive = False
    restart_interval = 0
    scans: list[tuple[list, dict, dict, bytes, tuple]] = []
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError("jpeg: bad marker sync")
        # T.81 B.1.1.2: any marker may be preceded by 0xFF fill bytes
        while pos + 1 < len(data) and data[pos + 1] == 0xFF:
            pos += 1
        if pos + 1 >= len(data):
            break
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # parameterless
        (seglen,) = struct.unpack_from(">H", data, pos)
        seg = data[pos + 2:pos + seglen]
        pos += seglen
        if marker == 0xDB:  # DQT
            off = 0
            while off < len(seg):
                pq, tq = seg[off] >> 4, seg[off] & 0x0F
                if pq != 0:
                    raise NotImplementedError("jpeg: 16-bit quant tables")
                t = np.zeros(64, dtype=np.int32)
                t[_ZZ] = np.frombuffer(seg[off + 1:off + 65], dtype=np.uint8)
                qtabs[tq] = t.reshape(8, 8)
                off += 65
        elif marker == 0xC4:  # DHT
            off = 0
            while off < len(seg):
                tc_th = seg[off]
                bits = list(seg[off + 1:off + 17])
                n = sum(bits)
                vals = list(seg[off + 17:off + 17 + n])
                htabs[tc_th] = _HuffTable(bits, vals)
                off += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 (sequential) / SOF2 (progressive)
            prec, hh, ww, nc = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise NotImplementedError("jpeg: precision != 8")
            comps = []
            for i in range(nc):
                cid, hv, tq = struct.unpack_from(">BBB", seg, 6 + 3 * i)
                sh, sv = hv >> 4, hv & 0x0F
                if not (1 <= sh <= 4 and 1 <= sv <= 4):
                    raise ValueError(f"jpeg: illegal sampling factors {sh}x{sv}")
                comps.append((cid, sh, sv, tq))
            sof = (hh, ww, comps)
            progressive = marker == 0xC2
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "jpeg: only baseline/extended sequential (SOF0/1) and progressive (SOF2)"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            scan_comps = []
            for i in range(ns):
                cid, tables = struct.unpack_from(">BB", seg, 1 + 2 * i)
                scan_comps.append((cid, tables >> 4, tables & 0x0F))
            ss, se, ahal = seg[1 + 2 * ns], seg[2 + 2 * ns], seg[3 + 2 * ns]
            band = (ss, se, ahal >> 4, ahal & 0x0F)
            # entropy data runs from pos to the next non-RST marker
            end = pos
            while end < len(data) - 1:
                if data[end] == 0xFF and data[end + 1] != 0x00 \
                        and not (0xD0 <= data[end + 1] <= 0xD7):
                    break
                end += 1
            # snapshot the referenced Huffman tables NOW: a legal file may
            # redefine a DHT slot between scans, so resolving table ids
            # from the final htabs state after the whole parse would
            # decode earlier scans with later tables. Lazily validated:
            # progressive AC scans don't use a DC table (and refinement DC
            # scans use no table at all), so absence only errors at use.
            dcmap = {cid: htabs.get(0x00 | td) for cid, td, _ in scan_comps}
            acmap = {cid: htabs.get(0x10 | ta) for cid, _, ta in scan_comps}
            scans.append((scan_comps, dcmap, acmap, data[pos:end], band))
            pos = end
        # APPn/COM/others: skipped via seglen
    if sof is None or not scans:
        raise ValueError("jpeg: missing SOF/SOS")

    hh, ww, comps = sof

    def split_restarts(raw: bytes) -> list[bytes]:
        # split on RSTn FIRST (in the stuffed stream a data 0xFF is always
        # followed by 0x00, so FF Dn is unambiguously a marker), THEN
        # destuff each part -- destuffing first can expose a data 0xFF next
        # to a data 0xD0..0xD7 byte and mis-split the scan.
        parts = []
        i = 0
        start = 0
        while i < len(raw) - 1:
            if raw[i] == 0xFF and 0xD0 <= raw[i + 1] <= 0xD7:
                parts.append(raw[start:i].replace(b"\xff\x00", b"\xff"))
                start = i + 2
                i += 2
            else:
                i += 1
        parts.append(raw[start:].replace(b"\xff\x00", b"\xff"))
        return parts

    # MCU geometry (T.81 A.2.3): an interleaved MCU carries sh x sv blocks
    # per component; a component's own plane is ceil(dim * s / smax).
    hmax = max(sh for _, sh, _, _ in comps)
    vmax = max(sv for _, _, sv, _ in comps)
    mcux = (ww + 8 * hmax - 1) // (8 * hmax)
    mcuy = (hh + 8 * vmax - 1) // (8 * vmax)
    n_mcus = mcux * mcuy
    geom = {cid: (sh, sv, mcux * sh, mcuy * sv) for cid, sh, sv, _ in comps}
    coefs = {
        cid: np.zeros((mcuy * sv * mcux * sh, 64), dtype=np.int32)
        for cid, sh, sv, _ in comps
    }

    def read_block(rdr: _BitReader, zz: np.ndarray, pred: int,
                   dtab: _HuffTable, atab: _HuffTable) -> int:
        sym = rdr.read_symbol(dtab)
        pred += _extend(rdr.read(sym), sym)
        zz[0] = pred
        k = 1
        while k < 64:
            rs = rdr.read_symbol(atab)
            if rs == 0x00:  # EOB
                break
            if rs == 0xF0:  # ZRL
                k += 16
                continue
            k += rs >> 4
            if k > 63:
                raise ValueError("jpeg: AC index overflow")
            zz[k] = _extend(rdr.read(rs & 0x0F), rs & 0x0F)
            k += 1
        return pred

    def comp_units(cid: int) -> tuple[int, int]:
        """(blocks-per-row, block count) of a SINGLE-COMPONENT scan's walk:
        data units cover the component's own plane in raster order."""
        sh, sv, _, _ = geom[cid]
        cw = (ww * sh + hmax - 1) // hmax
        chh = (hh * sv + vmax - 1) // vmax
        bw = (cw + 7) // 8
        return bw, bw * ((chh + 7) // 8)

    # Decode every scan. Baseline allows the frame's components to arrive
    # either interleaved in one scan or as one single-component scan each
    # (T.81 A.2); a single-component scan is never interleaved -- its data
    # units walk the COMPONENT's own block grid in raster order, one block
    # per MCU (so DRI counts blocks there). DC prediction resets per scan.
    for scan_comps, dcmap, acmap, raw, band in scans:
        order = [cid for cid, _, _ in scan_comps]
        if any(cid not in geom for cid in order):
            raise ValueError("jpeg: scan references unknown component")
        if progressive:
            _decode_progressive_scan(
                scan_comps, dcmap, acmap, raw, band, geom, coefs,
                mcux, n_mcus, comp_units, split_restarts, restart_interval,
            )
            continue
        if len(order) == 1:
            cid0 = order[0]
            cbx = geom[cid0][2]
            bw, units = comp_units(cid0)
        elif len(order) == len(comps):
            units = n_mcus
        else:
            # partially-interleaved scans change the MCU geometry
            # (T.81 A.2.3 over a component subset) -- reject, don't guess
            raise NotImplementedError("jpeg: partially interleaved scan")
        if any(dcmap[c] is None or acmap[c] is None for c in order):
            raise ValueError("jpeg: scan references undefined Huffman table")
        unit = 0
        for part in split_restarts(raw):
            rdr = _BitReader(part)
            preds = {cid: 0 for cid in order}
            limit = (min(unit + restart_interval, units)
                     if restart_interval else units)
            while unit < limit:
                if len(order) == 1:
                    bry, brx = divmod(unit, bw)
                    preds[cid0] = read_block(
                        rdr, coefs[cid0][bry * cbx + brx], preds[cid0],
                        dcmap[cid0], acmap[cid0],
                    )
                else:
                    my, mx = divmod(unit, mcux)
                    for cid in order:
                        sh, sv, cbx2, _ = geom[cid]
                        carr = coefs[cid]
                        for r in range(sv):
                            row = (my * sv + r) * cbx2 + mx * sh
                            for c in range(sh):
                                preds[cid] = read_block(
                                    rdr, carr[row + c], preds[cid],
                                    dcmap[cid], acmap[cid],
                                )
                unit += 1
    decoded = {cid for sc, _, _, _, _ in scans for cid, _, _ in sc}
    if decoded != set(geom):
        raise ValueError("jpeg: scans do not cover all frame components")

    planes = []
    for cid, sh, sv, tq in comps:
        cbx, cby = geom[cid][2], geom[cid][3]
        cw = (ww * sh + hmax - 1) // hmax
        ch = (hh * sv + vmax - 1) // vmax
        plane = _dequant_idct(coefs[cid], qtabs[tq], cby, cbx, ch, cw)
        if sh != hmax or sv != vmax:
            plane = _upsample_chroma(plane, sh, sv, hmax, vmax, hh, ww)
        planes.append(plane)
    if len(planes) == 1:
        y = np.clip(planes[0].round(), 0, 255).astype(np.uint8)
        return np.repeat(y[..., None], 3, axis=2)
    return _ycbcr_to_rgb(planes[0], planes[1], planes[2])


def _fancy_up_h(p: np.ndarray) -> np.ndarray:
    """libjpeg h2v1 fancy (triangular) horizontal 2x upsample, exact
    integer math: out[2i] = (3*in[i] + in[i-1] + 1) >> 2,
    out[2i+1] = (3*in[i] + in[i+1] + 2) >> 2, outermost samples
    replicated verbatim. ``p`` is int32 sample rows."""
    h, w = p.shape
    left = np.concatenate([p[:, :1], p[:, :-1]], axis=1)
    right = np.concatenate([p[:, 1:], p[:, -1:]], axis=1)
    out = np.empty((h, 2 * w), dtype=np.int32)
    out[:, 0::2] = (3 * p + left + 1) >> 2
    out[:, 1::2] = (3 * p + right + 2) >> 2
    out[:, 0] = p[:, 0]
    out[:, -1] = p[:, -1]
    return out


def _upsample_chroma(plane: np.ndarray, sh: int, sv: int, hmax: int,
                     vmax: int, hh: int, ww: int) -> np.ndarray:
    """Chroma upsampling to full resolution. For the factor-2 cases real
    web JPEGs use (4:2:0 h2v2, 4:2:2 h2v1) this is libjpeg's "fancy"
    triangular filter with its exact integer rounding — the de-facto
    reference decode (IJG libjpeg, and the JDK/libjpeg-turbo family);
    nearest-neighbour replication (the other spec-legal choice) diverges
    from those decoders by ~30 dB at chroma edges
    (tests/test_jvm_conformance.py pins the agreement). Non-2x factors
    fall back to nearest-neighbour."""
    p = np.clip(plane.round(), 0, 255).astype(np.int32)
    fh, fv = hmax // max(sh, 1), vmax // max(sv, 1)
    if fh == 2 and fv == 1 and hmax == sh * 2 and vmax == sv:
        up = _fancy_up_h(p)
    elif fh == 2 and fv == 2 and hmax == sh * 2 and vmax == sv * 2:
        h, w = p.shape
        above = np.concatenate([p[:1], p[:-1]], axis=0)
        below = np.concatenate([p[1:], p[-1:]], axis=0)
        # vertical 3:1 column sums (4x scale), one pair of output rows
        # per input row: top uses the row above as the far row, bottom
        # the row below
        top = 3 * p + above
        bot = 3 * p + below
        up = np.empty((2 * h, 2 * w), dtype=np.int32)
        for k, colsum in ((0, top), (1, bot)):
            left = np.concatenate([colsum[:, :1], colsum[:, :-1]], axis=1)
            right = np.concatenate([colsum[:, 1:], colsum[:, -1:]], axis=1)
            rows = np.empty((h, 2 * w), dtype=np.int32)
            rows[:, 0::2] = (3 * colsum + left + 8) >> 4
            rows[:, 1::2] = (3 * colsum + right + 7) >> 4
            rows[:, 0] = (4 * colsum[:, 0] + 8) >> 4
            rows[:, -1] = (4 * colsum[:, -1] + 7) >> 4
            up[k::2] = rows
    else:
        yi = (np.arange(hh) * sv) // vmax
        xi = (np.arange(ww) * sh) // hmax
        return plane[yi][:, xi]
    return up[:hh, :ww].astype(np.float64)


# ---------------------------------------------------------------------------
# EXIF orientation (the one Exif field a pixel pipeline must honor: phones
# store sensor-native pixels and record the display transform in APP1;
# ignoring it feeds sideways images to every downstream operator)


def exif_orientation(data: bytes) -> int:
    """Orientation tag (1..8) from a JPEG's APP1 Exif segment, or 1 when
    absent/unparseable (never raises on hostile segments): walks JPEG
    markers to APP1 ``Exif\\0\\0``, then the TIFF header (II/MM byte
    order) and IFD0 entries for tag 0x0112."""
    if data[:2] != b"\xff\xd8":
        return 1
    pos = 2
    try:
        while pos + 4 <= len(data):
            if data[pos] != 0xFF:
                return 1
            marker = data[pos + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                pos += 2
                continue
            if marker in (0xDA, 0xD9):  # entropy data / EOI: no APP1 found
                return 1
            (size,) = struct.unpack_from(">H", data, pos + 2)
            seg = data[pos + 4 : pos + 2 + size]
            pos += 2 + size
            if marker != 0xE1 or seg[:6] != b"Exif\x00\x00":
                continue
            return tiff_orientation(seg[6:])
    except (struct.error, IndexError):
        return 1
    return 1


def tiff_orientation(tiff: bytes) -> int:
    """Orientation tag (1..8) from a bare TIFF-format Exif blob (the
    payload both JPEG's APP1 segment and WebP's EXIF chunk carry), or 1
    when absent/unparseable — never raises on hostile input."""
    try:
        if tiff[:2] == b"II":
            bo = "<"
        elif tiff[:2] == b"MM":
            bo = ">"
        else:
            return 1
        (ifd_off,) = struct.unpack_from(bo + "I", tiff, 4)
        (n_entries,) = struct.unpack_from(bo + "H", tiff, ifd_off)
        for i in range(n_entries):
            at = ifd_off + 2 + 12 * i
            tag, typ, _cnt = struct.unpack_from(bo + "HHI", tiff, at)
            if tag == 0x0112 and typ == 3:  # SHORT
                (val,) = struct.unpack_from(bo + "H", tiff, at + 8)
                return val if 1 <= val <= 8 else 1
        return 1
    except (struct.error, IndexError):
        return 1


def apply_orientation(px: np.ndarray, orientation: int) -> np.ndarray:
    """Transform stored pixels to display orientation (EXIF tag 274
    semantics: 2 mirror-h, 3 rot180, 4 mirror-v, 5 transpose, 6 rot90 CW,
    7 transverse, 8 rot90 CCW)."""
    if orientation == 2:
        px = px[:, ::-1]
    elif orientation == 3:
        px = px[::-1, ::-1]
    elif orientation == 4:
        px = px[::-1]
    elif orientation == 5:
        px = px.transpose(1, 0, 2)
    elif orientation == 6:
        px = np.rot90(px, k=-1)
    elif orientation == 7:
        # anti-diagonal transpose (transverse); NOT rot90(k=-1)[:, ::-1],
        # which algebraically collapses to orientation 5's main-diagonal
        # transpose (r4 advisory).
        px = px.transpose(1, 0, 2)[::-1, ::-1]
    elif orientation == 8:
        px = np.rot90(px, k=1)
    return np.ascontiguousarray(px)


def insert_exif_orientation(jpeg: bytes, orientation: int,
                            byte_order: str = "II") -> bytes:
    """Splice a minimal APP1 Exif segment (one-entry IFD0 carrying tag
    0x0112) right after SOI — how the tests build oriented files, and a
    way to stamp orientation onto any emitted JPEG."""
    if jpeg[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG stream")
    if not 1 <= orientation <= 8:
        raise ValueError(f"bad orientation {orientation}")
    bo = "<" if byte_order == "II" else ">"
    tiff = (
        byte_order.encode("ascii")
        + struct.pack(bo + "HI", 42, 8)                 # magic + IFD0 offset
        + struct.pack(bo + "H", 1)                      # one entry
        + struct.pack(bo + "HHI", 0x0112, 3, 1)         # tag SHORT count=1
        + struct.pack(bo + "H", orientation) + b"\x00\x00"
        + struct.pack(bo + "I", 0)                      # no next IFD
    )
    payload = b"Exif\x00\x00" + tiff
    seg = b"\xff\xe1" + struct.pack(">H", len(payload) + 2) + payload
    return jpeg[:2] + seg + jpeg[2:]


# ---------------------------------------------------------------------------
# EXIF GPS (geo-privacy): a crawled photo's APP1 routinely carries the
# camera's GPS sub-IFD — coordinates a training corpus must not retain.
# Extraction feeds a has_gps triage column; stripping zeroes the GPS IFD
# and its out-of-line values IN PLACE (structure and length untouched, so
# every other offset in the file stays valid and the pixels are
# bit-identical).


def _find_app1_exif(data: bytes):
    """-> (tiff_start, tiff_end) offsets of the APP1 Exif TIFF blob inside
    a JPEG, or None. Never raises on hostile bytes."""
    if data[:2] != b"\xff\xd8":
        return None
    pos = 2
    try:
        while pos + 4 <= len(data):
            if data[pos] != 0xFF:
                return None
            marker = data[pos + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                pos += 2
                continue
            if marker in (0xDA, 0xD9):
                return None
            (size,) = struct.unpack_from(">H", data, pos + 2)
            if marker == 0xE1 and data[pos + 4 : pos + 10] == b"Exif\x00\x00":
                return pos + 10, pos + 2 + size
            pos += 2 + size
    except (struct.error, IndexError):
        return None
    return None


def _gps_ifd_offset(tiff: bytes):
    """-> (byte_order, gps_ifd_offset) for a bare TIFF Exif blob, or
    None when there is no GPS sub-IFD pointer (tag 0x8825)."""
    try:
        if tiff[:2] == b"II":
            bo = "<"
        elif tiff[:2] == b"MM":
            bo = ">"
        else:
            return None
        (ifd_off,) = struct.unpack_from(bo + "I", tiff, 4)
        (n_entries,) = struct.unpack_from(bo + "H", tiff, ifd_off)
        for i in range(n_entries):
            at = ifd_off + 2 + 12 * i
            tag, typ, _cnt = struct.unpack_from(bo + "HHI", tiff, at)
            if tag == 0x8825 and typ in (4, 9):  # LONG pointer
                (off,) = struct.unpack_from(bo + "I", tiff, at + 8)
                if off + 2 <= len(tiff):
                    return bo, off
        return None
    except (struct.error, IndexError):
        return None


_TIFF_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 7: 1, 9: 4, 10: 8}


def _gps_entries(tiff: bytes, bo: str, off: int):
    """Yield (tag, typ, cnt, entry_at, value_at, value_len) for each GPS
    IFD entry; value_at points at the inline field or the out-of-line
    region."""
    (n,) = struct.unpack_from(bo + "H", tiff, off)
    # cap well above the GPS spec's ~32 tags: a hostile count must not
    # leave later entries' out-of-line values unstripped, only bound work
    for i in range(min(n, 256)):
        at = off + 2 + 12 * i
        tag, typ, cnt = struct.unpack_from(bo + "HHI", tiff, at)
        size = _TIFF_TYPE_SIZES.get(typ, 1) * cnt
        if size <= 4:
            yield tag, typ, cnt, at, at + 8, size
        else:
            (voff,) = struct.unpack_from(bo + "I", tiff, at + 8)
            if voff + size <= len(tiff):
                yield tag, typ, cnt, at, voff, size


def _rationals(tiff: bytes, bo: str, at: int, cnt: int):
    out = []
    for i in range(cnt):
        num, den = struct.unpack_from(bo + "II", tiff, at + 8 * i)
        out.append(num / den if den else 0.0)
    return out


def exif_gps(data: bytes):
    """GPS coordinates from a JPEG's APP1 Exif, as
    ``{'lat': signed_degrees, 'lon': signed_degrees}`` (plus ``'alt'``
    when present), or None. Never raises on hostile input."""
    span = _find_app1_exif(data)
    if span is None:
        return None
    tiff = bytes(data[span[0] : span[1]])
    loc = _gps_ifd_offset(tiff)
    if loc is None:
        return None
    bo, off = loc
    vals: dict = {}
    try:
        for tag, typ, cnt, _at, vat, _size in _gps_entries(tiff, bo, off):
            if tag in (1, 3) and typ == 2:  # N/S / E/W refs, ASCII
                vals[tag] = tiff[vat : vat + 1].decode("ascii", "replace")
            elif tag in (2, 4) and typ == 5 and cnt == 3:  # D/M/S rationals
                d, m, s = _rationals(tiff, bo, vat, 3)
                vals[tag] = d + m / 60.0 + s / 3600.0
            elif tag == 6 and typ == 5 and cnt >= 1:  # altitude
                vals[tag] = _rationals(tiff, bo, vat, 1)[0]
    except (struct.error, IndexError):
        return None
    if 2 not in vals or 4 not in vals:
        return None
    lat = vals[2] * (-1.0 if vals.get(1, "N").upper() == "S" else 1.0)
    lon = vals[4] * (-1.0 if vals.get(3, "E").upper() == "W" else 1.0)
    out = {"lat": lat, "lon": lon}
    if 6 in vals:
        out["alt"] = vals[6]
    return out


def strip_tiff_gps(tiff: bytes) -> bytes:
    """Zero a bare TIFF Exif blob's GPS sub-IFD in place: every entry
    (tags, types, pointers), each out-of-line value region, and the
    entry count itself — no readable GPS data remains, every other
    offset stays valid, length unchanged. No-op when there is no GPS
    IFD."""
    loc = _gps_ifd_offset(tiff)
    if loc is None:
        return tiff
    bo, off = loc
    buf = bytearray(tiff)
    try:
        for _tag, _typ, _cnt, at, vat, size in list(_gps_entries(tiff, bo, off)):
            buf[at : at + 12] = b"\x00" * 12
            if vat != at + 8:  # out-of-line value region
                buf[vat : vat + size] = b"\x00" * size
        buf[off : off + 2] = b"\x00\x00"  # entry count -> 0
    except (struct.error, IndexError):
        pass
    return bytes(buf)


def strip_exif_gps(data: bytes) -> bytes:
    """JPEG bytes → same JPEG with any APP1 GPS sub-IFD zeroed in place
    (pixels, markers, orientation and all other metadata untouched;
    idempotent; returns the input unchanged when there is no Exif or no
    GPS)."""
    span = _find_app1_exif(data)
    if span is None:
        return data
    tiff = bytes(data[span[0] : span[1]])
    cleaned = strip_tiff_gps(tiff)
    if cleaned == tiff:
        return data
    return data[: span[0]] + cleaned + data[span[1] :]


def insert_exif_gps(jpeg: bytes, lat: float, lon: float,
                    alt: float | None = None, orientation: int = 1) -> bytes:
    """Splice an APP1 Exif segment carrying IFD0 (orientation + GPS
    pointer) and a GPS sub-IFD with out-of-line D/M/S rationals — the
    test-fixture builder for the geo-privacy path."""
    if jpeg[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG stream")
    bo = "<"

    def rat(x: float, den: int = 10000) -> bytes:
        return struct.pack(bo + "II", int(round(abs(x) * den)), den)

    def dms(deg: float) -> bytes:
        a = abs(deg)
        d = int(a)
        m = int((a - d) * 60)
        s = (a - d - m / 60.0) * 3600.0
        return struct.pack(bo + "II", d, 1) + struct.pack(bo + "II", m, 1) + rat(s)

    # layout: header(8) IFD0(2+2*12+4) GPSIFD(2+n*12+4) values...
    ifd0_off = 8
    n0 = 2
    gps_off = ifd0_off + 2 + n0 * 12 + 4
    ngps = 5 if alt is not None else 4
    val_off = gps_off + 2 + ngps * 12 + 4
    lat_off = val_off
    lon_off = lat_off + 24
    alt_off = lon_off + 24
    ifd0 = struct.pack(bo + "H", n0)
    ifd0 += struct.pack(bo + "HHI", 0x0112, 3, 1) + struct.pack(bo + "H", orientation) + b"\x00\x00"
    ifd0 += struct.pack(bo + "HHII", 0x8825, 4, 1, gps_off)
    ifd0 += struct.pack(bo + "I", 0)
    gps = struct.pack(bo + "H", ngps)
    gps += struct.pack(bo + "HHI", 1, 2, 2) + (b"N\x00\x00\x00" if lat >= 0 else b"S\x00\x00\x00")
    gps += struct.pack(bo + "HHII", 2, 5, 3, lat_off)
    gps += struct.pack(bo + "HHI", 3, 2, 2) + (b"E\x00\x00\x00" if lon >= 0 else b"W\x00\x00\x00")
    gps += struct.pack(bo + "HHII", 4, 5, 3, lon_off)
    if alt is not None:
        gps += struct.pack(bo + "HHII", 6, 5, 1, alt_off)
    gps += struct.pack(bo + "I", 0)
    values = dms(lat) + dms(lon) + (rat(alt, 100) if alt is not None else b"")
    tiff = b"II" + struct.pack(bo + "HI", 42, ifd0_off) + ifd0 + gps + values
    payload = b"Exif\x00\x00" + tiff
    seg = b"\xff\xe1" + struct.pack(">H", len(payload) + 2) + payload
    return jpeg[:2] + seg + jpeg[2:]
