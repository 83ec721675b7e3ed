"""From-scratch WebP lossless (RIFF/VP8L) decode + encode, numpy only.

WebP is the single most common real-web image format this engine could not
decode until now (reference spider.py:303-314 GetImageFormat sniffs formats
by magic; a real crawl sees WebP at double-digit share) — anything RIFF fell
to the crawl path's ``decode_error`` column. This module implements the
public "WebP Lossless Bitstream Specification" (VP8L) from scratch:

decode side (full VP8L):
- RIFF container (plain ``VP8L`` and extended ``VP8X`` layouts)
- LSB-first bitstream, canonical (DEFLATE-convention) Huffman codes read
  bit-by-bit, both the "simple" (1-2 symbol) and "normal" (code-length-coded)
  serializations, including zero-bit single-symbol codes
- all four transforms: predictor (all 14 modes with the spec's edge rules),
  cross-color, subtract-green, color-indexing (with sub-byte pixel bundling)
- LZ77 backward references with the 120-entry 2D distance mapping, color
  cache (hash 0x1e35a7bd), and meta-Huffman (per-tile code groups)
- animation (VP8X+ANIM+ANMF): iter_webp_frames composites frames per the
  container spec's blend/dispose rules with GIF-style dependency-chain
  sampling (VP8L paid only for frames a sampled frame depends on), and
  encode_webp_anim emits every layout the decoder accepts (subrect
  frames, both blend modes, dispose-to-background, alpha) for
  differential round-trips
- EXIF orientation from a VP8X container's EXIF chunk (webp_exif_orientation)

encode side (valid VP8L, used for differential round-trips and fixtures):
- literals + canonical Huffman (package-merge length-limited), zero-run RLE
  of code lengths via symbols 17/18, simple codes for ≤2-symbol alphabets
- optional subtract-green transform, optional color-indexing (palette with
  bundling) when ≤256 distinct colors, optional per-block predictor
  transform, optional run-length LZ77 (distance=1 copies) exercising both
  the plane-code and direct-distance branches

Lossy VP8 (RFC 6386 intra) is a documented boundary: a faithful decoder
needs the RFC's large constant probability/dequant tables, and reproducing
those unverified would yield a codec that is self-consistent but not VP8 —
so ``decode_webp`` refuses honestly with the frame dimensions in the error,
and ``webp_info`` triages any WebP (kind, canvas, decodability) without
pixel decode. Everything is numpy/stdlib; called per-image inside
Arrow-batched pandas UDFs (the multimodal decode path), zero per-row Python
at plan level.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# bit I/O (LSB-first within bytes, like DEFLATE)


class BitReader:
    __slots__ = ("data", "bitpos", "nbits")

    def __init__(self, data: bytes):
        self.data = data
        self.bitpos = 0
        self.nbits = 8 * len(data)

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        p = self.bitpos
        if p + n > self.nbits:
            raise ValueError("VP8L: bitstream truncated")
        self.bitpos = p + n
        byte0 = p >> 3
        # read up to 8 bytes covering the span
        span = self.data[byte0 : byte0 + ((p % 8 + n + 7) >> 3)]
        v = int.from_bytes(span, "little")
        return (v >> (p & 7)) & ((1 << n) - 1)

    def read_bit(self) -> int:
        p = self.bitpos
        if p >= self.nbits:
            raise ValueError("VP8L: bitstream truncated")
        self.bitpos = p + 1
        return (self.data[p >> 3] >> (p & 7)) & 1


class BitWriter:
    __slots__ = ("buf", "acc", "n")

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, nbits: int) -> None:
        """Write nbits of value, LSB first (field convention)."""
        self.acc |= (value & ((1 << nbits) - 1)) << self.n
        self.n += nbits
        while self.n >= 8:
            self.buf.append(self.acc & 0xFF)
            self.acc >>= 8
            self.n -= 8

    def write_code(self, code: int, nbits: int) -> None:
        """Write a Huffman code MSB-first (code convention, like DEFLATE)."""
        for i in range(nbits - 1, -1, -1):
            self.write((code >> i) & 1, 1)

    def getvalue(self) -> bytes:
        out = bytearray(self.buf)
        if self.n:
            out.append(self.acc & 0xFF)
        return bytes(out)


# ---------------------------------------------------------------------------
# canonical Huffman


class HuffmanCode:
    """Canonical Huffman decoder built from per-symbol code lengths.

    DEFLATE-convention canonical assignment (codes ordered by (length,
    symbol)); codes are read MSB-first, one bit at a time. A code with a
    single used symbol costs zero bits to read (``only``)."""

    __slots__ = ("table", "only", "max_len")

    def __init__(self, lengths):
        nz = [(l, s) for s, l in enumerate(lengths) if l > 0]
        if not nz:
            raise ValueError("VP8L: empty huffman code")
        if len(nz) == 1:
            self.only = nz[0][1]
            self.table = None
            self.max_len = 0
            return
        self.only = None
        max_len = max(l for l, _ in nz)
        bl_count = [0] * (max_len + 1)
        for l, _ in nz:
            bl_count[l] += 1
        code = 0
        next_code = [0] * (max_len + 2)
        for l in range(1, max_len + 1):
            code = (code + bl_count[l - 1]) << 1
            next_code[l] = code
        # Kraft check: a complete code is required by the spec
        total = sum(1 << (max_len - l) for l, _ in nz)
        if total != (1 << max_len):
            raise ValueError("VP8L: invalid (incomplete/oversubscribed) huffman code")
        table = {}
        for l, s in sorted(nz):
            table[(l, next_code[l])] = s
            next_code[l] += 1
        self.table = table
        self.max_len = max_len

    @classmethod
    def single(cls, sym: int) -> "HuffmanCode":
        obj = cls.__new__(cls)
        obj.only = sym
        obj.table = None
        obj.max_len = 0
        return obj

    @classmethod
    def simple_pair(cls, sym0: int, sym1: int) -> "HuffmanCode":
        obj = cls.__new__(cls)
        obj.only = None
        obj.table = {(1, 0): sym0, (1, 1): sym1}
        obj.max_len = 1
        return obj

    def read(self, br: BitReader) -> int:
        if self.only is not None:
            return self.only
        code = 0
        table = self.table
        for l in range(1, self.max_len + 1):
            code = (code << 1) | br.read_bit()
            s = table.get((l, code))
            if s is not None:
                return s
        raise ValueError("VP8L: bad huffman code in stream")


def canonical_codes(lengths):
    """(code, length) per symbol for writing, DEFLATE canonical order."""
    nz = [(l, s) for s, l in enumerate(lengths) if l > 0]
    max_len = max(l for l, _ in nz)
    bl_count = [0] * (max_len + 1)
    for l, _ in nz:
        bl_count[l] += 1
    code = 0
    next_code = [0] * (max_len + 1)
    for l in range(1, max_len + 1):
        code = (code + bl_count[l - 1]) << 1
        next_code[l] = code
    out = {}
    for l, s in sorted(nz):
        out[s] = (next_code[l], l)
        next_code[l] += 1
    return out


def limited_huffman_lengths(freqs, limit: int):
    """Length-limited Huffman code lengths via package-merge.

    Deterministic, optimal under the limit; symbols with zero frequency get
    length 0. Returns a list of lengths (same size as freqs)."""
    syms = [s for s, f in enumerate(freqs) if f > 0]
    n = len(syms)
    lengths = [0] * len(freqs)
    if n == 0:
        return lengths
    if n == 1:
        lengths[syms[0]] = 1
        return lengths
    if n > (1 << limit):
        raise ValueError("huffman limit too small for alphabet")
    # package-merge: items are (weight, {sym: count}) — merge counts cheaply
    # by representing each package as (weight, tuple of leaf symbols)
    leaves = sorted((freqs[s], s) for s in syms)
    packages = []  # previous level
    counts = {s: 0 for s in syms}
    for _level in range(limit):
        merged = [(w, (s,)) for w, s in leaves]
        it = iter(packages)
        pair = []
        for i in range(0, len(packages) - 1, 2):
            a, b = packages[i], packages[i + 1]
            pair.append((a[0] + b[0], a[1] + b[1]))
        merged.extend(pair)
        merged.sort(key=lambda t: (t[0], t[1]))
        packages = merged
    # take the first 2n-2 packages; each leaf occurrence adds 1 to its length
    for w, symtuple in packages[: 2 * n - 2]:
        for s in symtuple:
            counts[s] += 1
    for s, c in counts.items():
        lengths[s] = c
    return lengths


# ---------------------------------------------------------------------------
# VP8L constants

_CL_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)

# transform types
_T_PREDICTOR, _T_COLOR, _T_SUBTRACT_GREEN, _T_COLOR_INDEXING = 0, 1, 2, 3


# The 120-entry short-distance (dx, dy) table, spelled out from the
# published spec list (the neighborhood is dy 0..7, dx -7..8). An earlier
# revision GENERATED this by a nearest-first rule (Euclidean distance,
# dy-then-sign tiebreak) which reproduces the spec's first 96 entries but
# diverges over the tail ties (and wrongly admitted dy=8 candidates) —
# found by the libwebp conformance suite (tests/test_nativecodecs.py):
# real encoder streams using code 97+ mis-decoded. Codes 1..120 index this
# table; dist = dy*xsize + dx (min 1); codes >120 are direct distances.
PLANE_CODES = (
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0),
    (1, 2), (-1, 2), (2, 1), (-2, 1), (2, 2), (-2, 2),
    (0, 3), (3, 0), (1, 3), (-1, 3), (3, 1), (-3, 1),
    (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3),
    (2, 4), (-2, 4), (4, 2), (-4, 2), (0, 5), (3, 4),
    (-3, 4), (4, 3), (-4, 3), (5, 0), (1, 5), (-1, 5),
    (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3),
    (0, 6), (6, 0), (1, 6), (-1, 6), (6, 1), (-6, 1),
    (2, 6), (-2, 6), (6, 2), (-6, 2), (4, 5), (-4, 5),
    (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5),
    (7, 1), (-7, 1), (4, 6), (-4, 6), (6, 4), (-6, 4),
    (2, 7), (-2, 7), (7, 2), (-7, 2), (3, 7), (-3, 7),
    (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1),
    (8, 2), (6, 6), (-6, 6), (8, 3), (5, 7), (-5, 7),
    (7, 5), (-7, 5), (8, 4), (6, 7), (-6, 7), (7, 6),
    (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7),
)


def _prefix_decode(br: BitReader, sym: int) -> int:
    """LZ77 length/distance prefix decoding (symbol -> value >= 1)."""
    if sym < 4:
        return sym + 1
    extra = (sym - 2) >> 1
    offset = (2 + (sym & 1)) << extra
    return offset + br.read(extra) + 1


def _prefix_encode(value: int):
    """Inverse of _prefix_decode: value >= 1 -> (symbol, extra_bits, nbits)."""
    if value <= 4:
        return value - 1, 0, 0
    for sym in range(4, 40):
        extra = (sym - 2) >> 1
        offset = (2 + (sym & 1)) << extra
        if offset + 1 <= value <= offset + (1 << extra):
            return sym, value - offset - 1, extra
    raise ValueError("prefix value out of range")


# ---------------------------------------------------------------------------
# huffman (de)serialization


def _read_huffman_code(br: BitReader, alphabet_size: int) -> HuffmanCode:
    if br.read_bit():  # simple code
        num_symbols = br.read_bit() + 1
        if br.read_bit():
            sym0 = br.read(8)
        else:
            sym0 = br.read(1)
        if num_symbols == 2:
            sym1 = br.read(8)
            if sym0 >= alphabet_size or sym1 >= alphabet_size:
                raise ValueError("VP8L: simple code symbol out of range")
            # spec: the FIRST-read symbol takes code 0 (not canonical order)
            return HuffmanCode.simple_pair(sym0, sym1)
        if sym0 >= alphabet_size:
            raise ValueError("VP8L: simple code symbol out of range")
        return HuffmanCode.single(sym0)
    # normal code: code lengths are themselves huffman coded
    num_cl = 4 + br.read(4)
    cl_lengths = [0] * 19
    for i in range(num_cl):
        cl_lengths[_CL_ORDER[i]] = br.read(3)
    cl_code = HuffmanCode(cl_lengths)
    if br.read_bit():  # explicit max symbol count
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet_size
    lengths = []
    prev = 8
    while len(lengths) < alphabet_size:
        if max_symbol <= 0:
            break
        max_symbol -= 1
        s = cl_code.read(br)
        if s < 16:
            lengths.append(s)
            if s:
                prev = s
        elif s == 16:
            lengths.extend([prev] * (3 + br.read(2)))
        elif s == 17:
            lengths.extend([0] * (3 + br.read(3)))
        else:  # 18
            lengths.extend([0] * (11 + br.read(7)))
    del lengths[alphabet_size:]
    lengths.extend([0] * (alphabet_size - len(lengths)))
    return HuffmanCode(lengths)


def _write_huffman_code(bw: BitWriter, lengths) -> None:
    nz = [(s, l) for s, l in enumerate(lengths) if l > 0]
    if 1 <= len(nz) <= 2 and all(s < 256 for s, _ in nz):
        bw.write(1, 1)  # simple
        bw.write(len(nz) - 1, 1)
        sym0 = nz[0][0]
        if sym0 <= 1:
            bw.write(0, 1)
            bw.write(sym0, 1)
        else:
            bw.write(1, 1)
            bw.write(sym0, 8)
        if len(nz) == 2:
            bw.write(nz[1][0], 8)
        return
    bw.write(0, 1)  # normal
    # RLE the length sequence: literals 0-15, zero runs via 17/18
    seq = []  # (cl_symbol, extra_value, extra_bits)
    lens = list(lengths)  # full alphabet; trailing zeros emitted as runs too

    def _zero_run(run: int) -> None:
        while run >= 11:
            r = min(run, 138)
            seq.append((18, r - 11, 7))
            run -= r
        while run >= 3:
            r = min(run, 10)
            seq.append((17, r - 3, 3))
            run -= r
        for _ in range(run):
            seq.append((0, 0, 0))

    i = 0
    while i < len(lens):
        if lens[i] == 0:
            run = 1
            while i + run < len(lens) and lens[i + run] == 0:
                run += 1
            _zero_run(run)
            i += run
        else:
            seq.append((lens[i], 0, 0))
            i += 1
    cl_freq = [0] * 19
    for s, _, _ in seq:
        cl_freq[s] += 1
    cl_lengths = limited_huffman_lengths(cl_freq, 7)
    # num_code_lengths: smallest prefix of _CL_ORDER covering all nonzero
    num_cl = 4
    for i, sym in enumerate(_CL_ORDER):
        if cl_lengths[sym] > 0:
            num_cl = max(num_cl, i + 1)
    bw.write(num_cl - 4, 4)
    for i in range(num_cl):
        bw.write(cl_lengths[_CL_ORDER[i]], 3)
    bw.write(0, 1)  # no explicit max_symbol: lengths run to the alphabet end
    cl_codes = canonical_codes(cl_lengths)
    cl_single = sum(1 for l in cl_lengths if l) == 1
    for s, extra, ebits in seq:
        if not cl_single:
            code, n = cl_codes[s]
            bw.write_code(code, n)
        if ebits:
            bw.write(extra, ebits)


# ---------------------------------------------------------------------------
# decoder


def _decode_image_stream(br: BitReader, w: int, h: int, level0: bool):
    """Decode one entropy-coded image; returns (h, w, 4) uint8 ARGB."""
    transforms = []  # (type, xsize_at_read, payload)
    cur_w = w
    if level0:
        seen = set()
        while br.read_bit():
            t = br.read(2)
            if t in seen:
                raise ValueError("VP8L: duplicate transform")
            seen.add(t)
            if t == _T_PREDICTOR or t == _T_COLOR:
                size_bits = br.read(3) + 2
                bw_ = (cur_w + (1 << size_bits) - 1) >> size_bits
                bh_ = (h + (1 << size_bits) - 1) >> size_bits
                sub = _decode_image_stream(br, bw_, bh_, False)
                transforms.append((t, cur_w, (size_bits, sub)))
            elif t == _T_SUBTRACT_GREEN:
                transforms.append((t, cur_w, None))
            else:  # color indexing
                n_colors = br.read(8) + 1
                pal_img = _decode_image_stream(br, n_colors, 1, False)
                pal = np.cumsum(pal_img[0].astype(np.int64), axis=0).astype(np.uint8)
                if n_colors <= 2:
                    bundle_bits = 3
                elif n_colors <= 4:
                    bundle_bits = 2
                elif n_colors <= 16:
                    bundle_bits = 1
                else:
                    bundle_bits = 0
                transforms.append((t, cur_w, (bundle_bits, pal)))
                cur_w = (cur_w + (1 << bundle_bits) - 1) >> bundle_bits

    cache_bits = br.read(4) if br.read_bit() else 0
    if cache_bits > 11:
        raise ValueError("VP8L: color cache too large")
    cache_size = (1 << cache_bits) if cache_bits else 0
    cache = np.zeros(cache_size, dtype=np.uint32) if cache_size else None

    meta_idx = None
    hbits = 0
    n_groups = 1
    if level0 and br.read_bit():
        hbits = br.read(3) + 2
        ew = (cur_w + (1 << hbits) - 1) >> hbits
        eh = (h + (1 << hbits) - 1) >> hbits
        meta_img = _decode_image_stream(br, ew, eh, False)
        meta_idx = (meta_img[:, :, 1].astype(np.int32) << 8) | meta_img[:, :, 2]
        n_groups = int(meta_idx.max()) + 1

    green_size = 256 + 24 + cache_size
    groups = []
    for _ in range(n_groups):
        groups.append((
            _read_huffman_code(br, green_size),
            _read_huffman_code(br, 256),
            _read_huffman_code(br, 256),
            _read_huffman_code(br, 256),
            _read_huffman_code(br, 40),
        ))

    n_px = cur_w * h
    # flat uint32 ARGB for fast LZ77 copies + cache hashing
    px = np.zeros(n_px, dtype=np.uint32)
    i = 0
    g = groups[0]
    gc, rc, bc, ac, dc = g
    while i < n_px:
        if meta_idx is not None:
            y, x = divmod(i, cur_w)
            gi = int(meta_idx[y >> hbits, x >> hbits])
            gc, rc, bc, ac, dc = groups[gi]
        s = gc.read(br)
        if s < 256:
            green = s
            red = rc.read(br)
            blue = bc.read(br)
            alpha = ac.read(br)
            v = (alpha << 24) | (red << 16) | (green << 8) | blue
            px[i] = v
            if cache is not None:
                cache[(0x1E35A7BD * v & 0xFFFFFFFF) >> (32 - cache_bits)] = v
            i += 1
        elif s < 280:
            length = _prefix_decode(br, s - 256)
            dsym = dc.read(br)
            dist_code = _prefix_decode(br, dsym)
            if dist_code > 120:
                dist = dist_code - 120
            else:
                dx, dy = PLANE_CODES[dist_code - 1]
                dist = dy * cur_w + dx
                if dist < 1:
                    dist = 1
            if dist > i or i + length > n_px:
                raise ValueError("VP8L: LZ77 reference out of range")
            if cache is None and dist >= length:
                px[i : i + length] = px[i - dist : i - dist + length]
                i += length
            else:
                for _k in range(length):
                    v = px[i - dist]
                    px[i] = v
                    if cache is not None:
                        cache[(0x1E35A7BD * int(v) & 0xFFFFFFFF) >> (32 - cache_bits)] = v
                    i += 1
        else:
            if cache is None:
                raise ValueError("VP8L: cache reference without color cache")
            v = cache[s - 280]
            px[i] = v
            i += 1

    argb = np.empty((h, cur_w, 4), dtype=np.uint8)
    argb[:, :, 0] = (px >> 24).reshape(h, cur_w)
    argb[:, :, 1] = ((px >> 16) & 0xFF).reshape(h, cur_w)
    argb[:, :, 2] = ((px >> 8) & 0xFF).reshape(h, cur_w)
    argb[:, :, 3] = (px & 0xFF).reshape(h, cur_w)

    for t, xsize, payload in reversed(transforms):
        if t == _T_SUBTRACT_GREEN:
            g_ = argb[:, :, 2].astype(np.int32)
            argb[:, :, 1] = ((argb[:, :, 1] + g_) & 0xFF).astype(np.uint8)
            argb[:, :, 3] = ((argb[:, :, 3] + g_) & 0xFF).astype(np.uint8)
        elif t == _T_COLOR_INDEXING:
            bundle_bits, pal = payload
            if bundle_bits:
                ppu = 1 << bundle_bits
                bits_per = 8 >> bundle_bits
                mask = (1 << bits_per) - 1
                packed = argb[:, :, 2]  # green channel holds bundled indices
                idx = np.zeros((h, xsize), dtype=np.int32)
                for sub in range(ppu):
                    cols = np.arange(sub, xsize, ppu)
                    idx[:, cols] = (packed[:, cols // ppu] >> (sub * bits_per)) & mask
            else:
                idx = argb[:, :, 2].astype(np.int32)
            n_colors = pal.shape[0]
            out = np.zeros((h, xsize, 4), dtype=np.uint8)
            ok = idx < n_colors
            safe = np.clip(idx, 0, n_colors - 1)
            looked = pal[safe]  # (h, xsize, 4) ARGB
            out[ok] = looked[ok]
            argb = out
        elif t == _T_PREDICTOR:
            size_bits, sub = payload
            argb = _inverse_predictor(argb, sub, size_bits)
        else:  # color transform
            size_bits, sub = payload
            argb = _inverse_color_transform(argb, sub, size_bits)
    return argb


def _avg2(a: int, b: int) -> int:
    return (a + b) >> 1


def _inverse_predictor(res: np.ndarray, sub: np.ndarray, size_bits: int) -> np.ndarray:
    """Sequential inverse of the predictor transform (modes 0-13).

    Residuals were stored mod 256; prediction of each pixel depends on
    already-reconstructed neighbors, so this is an inherently sequential
    scan (the same data-dependence real decoders have)."""
    h, w, _ = res.shape
    modes = sub[:, :, 2]  # green channel of the transform image
    out = res.astype(np.int32).copy()

    def pget(y, x):
        return out[y, x]

    for y in range(h):
        for x in range(w):
            if x == 0 and y == 0:
                pred = (255, 0, 0, 0)
            elif y == 0:
                pred = tuple(out[0, x - 1])
            elif x == 0:
                pred = tuple(out[y - 1, 0])
            else:
                mode = int(modes[y >> size_bits, x >> size_bits])
                L = out[y, x - 1]
                T = out[y - 1, x]
                TL = out[y - 1, x - 1]
                TR = out[y - 1, x + 1] if x + 1 < w else out[y, 0]
                if mode == 0:
                    pred = (255, 0, 0, 0)
                elif mode == 1:
                    pred = L
                elif mode == 2:
                    pred = T
                elif mode == 3:
                    pred = TR
                elif mode == 4:
                    pred = TL
                elif mode == 5:
                    pred = tuple(_avg2(_avg2(int(L[c]), int(TR[c])), int(T[c])) for c in range(4))
                elif mode == 6:
                    pred = tuple(_avg2(int(L[c]), int(TL[c])) for c in range(4))
                elif mode == 7:
                    pred = tuple(_avg2(int(L[c]), int(T[c])) for c in range(4))
                elif mode == 8:
                    pred = tuple(_avg2(int(TL[c]), int(T[c])) for c in range(4))
                elif mode == 9:
                    pred = tuple(_avg2(int(T[c]), int(TR[c])) for c in range(4))
                elif mode == 10:
                    pred = tuple(
                        _avg2(_avg2(int(L[c]), int(TL[c])), _avg2(int(T[c]), int(TR[c])))
                        for c in range(4)
                    )
                elif mode == 11:
                    # Select: pick T or L, whichever is closer to L+T-TL
                    dT = sum(abs(int(L[c]) - int(TL[c])) for c in range(4))
                    dL = sum(abs(int(T[c]) - int(TL[c])) for c in range(4))
                    pred = T if dT <= dL else L
                elif mode == 12:
                    pred = tuple(
                        min(255, max(0, int(L[c]) + int(T[c]) - int(TL[c]))) for c in range(4)
                    )
                elif mode == 13:
                    pred = []
                    for c in range(4):
                        ave = _avg2(int(L[c]), int(T[c]))
                        d = ave - int(TL[c])
                        half = d // 2 if d >= 0 else -((-d) // 2)  # trunc toward 0
                        pred.append(min(255, max(0, ave + half)))
                    pred = tuple(pred)
                else:
                    raise ValueError("VP8L: bad predictor mode")
            for c in range(4):
                out[y, x, c] = (out[y, x, c] + int(pred[c])) & 0xFF
    return out.astype(np.uint8)


def _ct_delta(t: np.ndarray, c: np.ndarray) -> np.ndarray:
    """ColorTransformDelta: (int8(t) * int8(c)) >> 5, arithmetic shift."""
    return (t.astype(np.int8).astype(np.int32) * c.astype(np.int8).astype(np.int32)) >> 5


def _inverse_color_transform(argb: np.ndarray, sub: np.ndarray, size_bits: int) -> np.ndarray:
    h, w, _ = argb.shape
    by = np.arange(h) >> size_bits
    bx = np.arange(w) >> size_bits
    # transform element channels: g2r=blue, g2b=green, r2b=red
    g2r = sub[np.ix_(by, bx)][:, :, 3]
    g2b = sub[np.ix_(by, bx)][:, :, 2]
    r2b = sub[np.ix_(by, bx)][:, :, 1]
    out = argb.copy()
    green = argb[:, :, 2]
    red = (argb[:, :, 1].astype(np.int32) + _ct_delta(g2r, green)) & 0xFF
    blue = argb[:, :, 3].astype(np.int32) + _ct_delta(g2b, green)
    blue = (blue + _ct_delta(r2b, red.astype(np.uint8))) & 0xFF
    out[:, :, 1] = red.astype(np.uint8)
    out[:, :, 3] = blue.astype(np.uint8)
    return out


def decode_vp8l(payload: bytes) -> np.ndarray:
    """VP8L chunk payload -> (h, w, 4) uint8 ARGB."""
    br = BitReader(payload)
    if br.read(8) != 0x2F:
        raise ValueError("VP8L: bad signature")
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read(1)  # alpha hint
    if br.read(3) != 0:
        raise ValueError("VP8L: unsupported version")
    return _decode_image_stream(br, w, h, True)


# ---------------------------------------------------------------------------
# encoder


def _encode_image_stream(
    bw: BitWriter,
    argb: np.ndarray,
    level0: bool,
    *,
    subtract_green: bool = False,
    use_palette: bool = False,
    predictor_bits: int = 0,
    rle: bool = False,
) -> None:
    h, w, _ = argb.shape
    data = argb.astype(np.int32)

    if level0:
        if predictor_bits:
            data, modes = _forward_predictor(data, predictor_bits)
            bw.write(1, 1)
            bw.write(_T_PREDICTOR, 2)
            bw.write(predictor_bits - 2, 3)
            _encode_image_stream(bw, modes, False)
        if subtract_green:
            bw.write(1, 1)
            bw.write(_T_SUBTRACT_GREEN, 2)
            g = data[:, :, 2]
            data[:, :, 1] = (data[:, :, 1] - g) & 0xFF
            data[:, :, 3] = (data[:, :, 3] - g) & 0xFF
        if use_palette:
            flat = (
                (data[:, :, 0].astype(np.uint32) << 24)
                | (data[:, :, 1].astype(np.uint32) << 16)
                | (data[:, :, 2].astype(np.uint32) << 8)
                | data[:, :, 3].astype(np.uint32)
            )
            colors, inv = np.unique(flat, return_inverse=True)
            n_colors = len(colors)
            if n_colors > 256:
                raise ValueError("palette mode needs <=256 distinct colors")
            bw.write(1, 1)
            bw.write(_T_COLOR_INDEXING, 2)
            bw.write(n_colors - 1, 8)
            pal = np.zeros((1, n_colors, 4), dtype=np.int32)
            pal[0, :, 0] = colors >> 24
            pal[0, :, 1] = (colors >> 16) & 0xFF
            pal[0, :, 2] = (colors >> 8) & 0xFF
            pal[0, :, 3] = colors & 0xFF
            dpal = pal.copy()
            dpal[0, 1:] = (pal[0, 1:] - pal[0, :-1]) & 0xFF
            _encode_image_stream(bw, dpal, False)
            idx = inv.reshape(h, w).astype(np.int32)
            if n_colors <= 2:
                bundle_bits = 3
            elif n_colors <= 4:
                bundle_bits = 2
            elif n_colors <= 16:
                bundle_bits = 1
            else:
                bundle_bits = 0
            if bundle_bits:
                ppu = 1 << bundle_bits
                bits_per = 8 >> bundle_bits
                new_w = (w + ppu - 1) // ppu
                packed = np.zeros((h, new_w), dtype=np.int32)
                for sub in range(ppu):
                    cols = np.arange(sub, w, ppu)
                    packed[:, : len(cols)] |= idx[:, cols] << (sub * bits_per)
                w = new_w
            else:
                packed = idx
            data = np.zeros((h, w, 4), dtype=np.int32)
            data[:, :, 0] = 255
            data[:, :, 2] = packed
        bw.write(0, 1)  # end of transforms

    bw.write(0, 1)  # no color cache
    if level0:
        bw.write(0, 1)  # no meta huffman

    a = data[:, :, 0].ravel()
    r = data[:, :, 1].ravel()
    g = data[:, :, 2].ravel()
    b = data[:, :, 3].ravel()
    n = a.size

    # optional run-length LZ77: runs of identical ARGB become dist-1 copies
    tokens = []  # ('lit', i) | ('copy', length, dist)
    if rle and n:
        flat = (
            (a.astype(np.uint32) << 24)
            | (r.astype(np.uint32) << 16)
            | (g.astype(np.uint32) << 8)
            | b.astype(np.uint32)
        )
        i = 0
        while i < n:
            tokens.append(("lit", i))
            i += 1
            run = 0
            while i + run < n and flat[i + run] == flat[i - 1]:
                run += 1
            while run >= 3:  # short copies cost more than literals
                ln = min(run, 4096)
                tokens.append(("copy", ln, 1))
                i += ln
                run -= ln
            # leftover short run emitted as literals by the outer loop
    else:
        tokens = [("lit", i) for i in range(n)]

    # reverse plane-code map for short distances
    rev_plane = {}
    for ci, (dx, dy) in enumerate(PLANE_CODES):
        d = dy * w + dx
        if d >= 1 and d not in rev_plane:
            rev_plane[d] = ci + 1

    gfreq = [0] * 280
    rfreq = [0] * 256
    bfreq = [0] * 256
    afreq = [0] * 256
    dfreq = [0] * 40
    copies = []
    for tok in tokens:
        if tok[0] == "lit":
            i = tok[1]
            gfreq[g[i]] += 1
            rfreq[r[i]] += 1
            bfreq[b[i]] += 1
            afreq[a[i]] += 1
        else:
            _, ln, dist = tok
            lsym, _, _ = _prefix_encode(ln)
            gfreq[256 + lsym] += 1
            dist_code = rev_plane.get(dist, dist + 120)
            dsym, _, _ = _prefix_encode(dist_code)
            dfreq[dsym] += 1
            copies.append((ln, dist))
    if not any(dfreq):
        dfreq[0] = 1  # unused code still must be present

    glen = limited_huffman_lengths(gfreq, 15)
    rlen = limited_huffman_lengths(rfreq, 15)
    blen = limited_huffman_lengths(bfreq, 15)
    alen = limited_huffman_lengths(afreq, 15)
    dlen = limited_huffman_lengths(dfreq, 15)
    for lens in (glen, rlen, blen, alen, dlen):
        _write_huffman_code(bw, lens)
    def _emit_table(lens):
        """sym -> (code, nbits); a single-symbol code reads as zero bits."""
        if sum(1 for l in lens if l) == 1:
            return {s: (0, 0) for s, l in enumerate(lens) if l}
        return canonical_codes(lens)

    gcodes = _emit_table(glen)
    rcodes = _emit_table(rlen)
    bcodes = _emit_table(blen)
    acodes = _emit_table(alen)
    dcodes = _emit_table(dlen)

    def _emit(codes, sym):
        code, nb = codes[sym]
        if nb:
            bw.write_code(code, nb)

    for tok in tokens:
        if tok[0] == "lit":
            i = tok[1]
            _emit(gcodes, int(g[i]))
            _emit(rcodes, int(r[i]))
            _emit(bcodes, int(b[i]))
            _emit(acodes, int(a[i]))
        else:
            _, ln, dist = tok
            lsym, extra, ebits = _prefix_encode(ln)
            _emit(gcodes, 256 + lsym)
            if ebits:
                bw.write(extra, ebits)
            dist_code = rev_plane.get(dist, dist + 120)
            dsym, dextra, debits = _prefix_encode(dist_code)
            _emit(dcodes, dsym)
            if debits:
                bw.write(dextra, debits)


def _forward_predictor(data: np.ndarray, size_bits: int):
    """Forward predictor transform: per-block best of modes {1,2,7,12}.

    Returns (residuals mod 256, modes image). The inverse is the decoder's
    sequential scan; the forward side can compute all candidate predictions
    from the ORIGINAL pixels vectorized (prediction inputs are original
    values — the decoder reconstructs them exactly)."""
    h, w, _ = data.shape
    bs = 1 << size_bits
    bh = (h + bs - 1) >> size_bits
    bw_ = (w + bs - 1) >> size_bits
    px = data.astype(np.int32)

    # candidate predictions for every pixel (interior rule; edges overridden)
    L = np.zeros_like(px)
    L[:, 1:] = px[:, :-1]
    T = np.zeros_like(px)
    T[1:, :] = px[:-1, :]
    TL = np.zeros_like(px)
    TL[1:, 1:] = px[:-1, :-1]
    preds = {
        1: L,
        2: T,
        7: (L + T) >> 1,
        12: np.clip(L + T - TL, 0, 255),
    }
    modes = np.zeros((bh, bw_, 4), dtype=np.int32)
    modes[:, :, 0] = 255
    res = np.zeros_like(px)
    for by in range(bh):
        for bx in range(bw_):
            ys = slice(by * bs, min((by + 1) * bs, h))
            xs = slice(bx * bs, min((bx + 1) * bs, w))
            best_mode, best_cost = 1, None
            for m, p in preds.items():
                d = (px[ys, xs] - p[ys, xs]) & 0xFF
                cost = np.minimum(d, 256 - d).sum()  # wrap-aware magnitude
                if best_cost is None or cost < best_cost:
                    best_cost, best_mode = cost, m
            modes[by, bx, 2] = best_mode
            res[ys, xs] = (px[ys, xs] - preds[best_mode][ys, xs]) & 0xFF
    # edge overrides (same rules as the decoder)
    res[0, 0] = (px[0, 0] - np.array([255, 0, 0, 0])) & 0xFF
    if w > 1:
        res[0, 1:] = (px[0, 1:] - px[0, :-1]) & 0xFF
    if h > 1:
        res[1:, 0] = (px[1:, 0] - px[:-1, 0]) & 0xFF
    return res, modes


def encode_vp8l(
    argb: np.ndarray,
    *,
    subtract_green: bool = True,
    use_palette: bool = False,
    predictor_bits: int = 0,
    rle: bool = False,
) -> bytes:
    """(h, w, 4) uint8 ARGB -> VP8L chunk payload (lossless)."""
    h, w, _ = argb.shape
    if not (1 <= w <= 16384 and 1 <= h <= 16384):
        raise ValueError("VP8L: dimensions out of range")
    if use_palette and (subtract_green or predictor_bits):
        raise ValueError("palette mode excludes other pixel transforms here")
    bw = BitWriter()
    bw.write(0x2F, 8)
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(1 if (argb[:, :, 0] != 255).any() else 0, 1)
    bw.write(0, 3)  # version
    _encode_image_stream(
        bw,
        argb,
        True,
        subtract_green=subtract_green,
        use_palette=use_palette,
        predictor_bits=predictor_bits,
        rle=rle,
    )
    return bw.getvalue()


def vp8_frame_dims(payload: bytes) -> tuple[int, int]:
    """Width/height from a VP8 keyframe's UNCOMPRESSED header (RFC 6386
    §9.1): 3-byte frame tag, 3-byte start code 9D 01 2A, then 14-bit
    width/height with 2-bit upscale fields. No entropy decode needed."""
    if len(payload) < 10:
        raise ValueError("VP8: truncated frame header")
    tag = payload[0] | (payload[1] << 8) | (payload[2] << 16)
    if tag & 1:
        raise ValueError("VP8: not a keyframe")
    if payload[3:6] != b"\x9d\x01\x2a":
        raise ValueError("VP8: bad keyframe start code")
    w = (payload[6] | (payload[7] << 8)) & 0x3FFF
    h = (payload[8] | (payload[9] << 8)) & 0x3FFF
    return w, h


def _decode_vp8_lossy(payload: bytes) -> np.ndarray:
    """Documented boundary: full VP8 intra decode needs RFC 6386's large
    constant tables (default coefficient probabilities, kf b-mode trees,
    dequant lookups) — reproducing them unverified would yield a codec
    that is self-consistent but not VP8, so this engine refuses honestly
    (like inter-frame video) while still reporting frame dimensions for
    triage (webp_info)."""
    w, h = vp8_frame_dims(payload)
    raise ValueError(
        f"VP8 lossy (keyframe {w}x{h}): intra PCM decode not implemented "
        "from scratch; lossless VP8L decodes natively"
    )


def webp_info(data: bytes) -> dict:
    """Container triage without pixel decode: kind ('vp8l'/'vp8'/'anim'/
    'vp8x' wrapped variants), canvas width/height, and whether this
    engine can decode the pixels. Animations additionally report
    n_frames; they are decodable when every frame is VP8L-lossless."""
    canvas = None
    anmf = []
    for tag, payload in _riff_chunks(data):
        if tag == b"ANMF":
            anmf.append(_parse_anmf(payload))
            continue
        if anmf:
            continue  # an animation's still chunks (EXIF/XMP) follow frames
        if tag == b"VP8X" and len(payload) >= 10:
            w = 1 + int.from_bytes(payload[4:7], "little")
            h = 1 + int.from_bytes(payload[7:10], "little")
            canvas = (w, h)
        elif tag == b"VP8L":
            br = BitReader(payload)
            if br.read(8) != 0x2F:
                raise ValueError("VP8L: bad signature")
            w = br.read(14) + 1
            h = br.read(14) + 1
            return {"kind": "vp8l", "w": w, "h": h, "decodable": True,
                    "canvas": canvas or (w, h)}
        elif tag == b"VP8 ":
            from etlpy_spark.functions import nativecodecs

            w, h = vp8_frame_dims(payload)
            return {"kind": "vp8", "w": w, "h": h,
                    "decodable": nativecodecs.webp_available(),
                    "canvas": canvas or (w, h)}
    if anmf:
        if canvas is None:
            raise ValueError("WebP: ANMF frames without a VP8X canvas")
        return {"kind": "anim", "w": canvas[0], "h": canvas[1],
                "decodable": not any(f.lossy for f in anmf),
                "canvas": canvas, "n_frames": len(anmf)}
    if canvas:
        return {"kind": "vp8x", "w": canvas[0], "h": canvas[1],
                "decodable": False, "canvas": canvas}
    raise ValueError("WebP: no image chunk found")


# ---------------------------------------------------------------------------
# RIFF container


def _riff_chunks(data: bytes):
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise ValueError("not a WebP file")
    pos = 12
    end = min(len(data), 8 + struct.unpack("<I", data[4:8])[0])
    while pos + 8 <= end:
        tag = data[pos : pos + 4]
        size = struct.unpack("<I", data[pos + 4 : pos + 8])[0]
        payload = data[pos + 8 : pos + 8 + size]
        if len(payload) < size:
            raise ValueError("WebP: truncated chunk " + tag.decode("ascii", "replace"))
        yield tag, payload
        pos += 8 + size + (size & 1)


def strip_webp_gps(data: bytes) -> bytes:
    """VP8X EXIF chunk geo-privacy: zero any GPS sub-IFD inside a WebP's
    EXIF chunk in place (same length, all other chunks untouched) — the
    WebP face of jpegcodec.strip_exif_gps. Returns the input unchanged
    when there is no EXIF chunk or no GPS."""
    from etlpy_spark.functions.jpegcodec import strip_tiff_gps

    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        return data
    pos = 12
    end = min(len(data), 8 + struct.unpack("<I", data[4:8])[0])
    while pos + 8 <= end:
        tag = data[pos : pos + 4]
        size = struct.unpack("<I", data[pos + 4 : pos + 8])[0]
        if tag == b"EXIF" and pos + 8 + size <= len(data):
            payload = bytes(data[pos + 8 : pos + 8 + size])
            cleaned = strip_tiff_gps(payload)
            if cleaned != payload:
                return data[: pos + 8] + cleaned + data[pos + 8 + size :]
            return data
        pos += 8 + size + (size & 1)
    return data


def mux_webp(tag: bytes, payload: bytes) -> bytes:
    body = tag + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        body += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WEBP" + body


def mux_webp_ex(chunks: list[tuple[bytes, bytes]]) -> bytes:
    """Multi-chunk RIFF container (VP8X files: VP8X + image + EXIF/...)."""
    body = b""
    for tag, payload in chunks:
        body += tag + struct.pack("<I", len(payload)) + payload
        if len(payload) & 1:
            body += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WEBP" + body


def vp8x_header(w: int, h: int, exif: bool = False, alpha: bool = False,
                anim: bool = False) -> bytes:
    """VP8X chunk payload: flag byte (…ICC|Alpha|EXIF|XMP|Anim…), 3
    reserved bytes, then canvas (w-1, h-1) as 24-bit little-endian."""
    flags = (0x10 if alpha else 0) | (0x08 if exif else 0) | (0x02 if anim else 0)
    return bytes([flags, 0, 0, 0]) + (w - 1).to_bytes(3, "little") + \
        (h - 1).to_bytes(3, "little")


def webp_exif_orientation(data: bytes) -> int:
    """Orientation tag (1..8) from a WebP's EXIF chunk, or 1 when absent
    or unparseable (never raises on hostile chunks). The chunk payload is
    TIFF-format Exif data; some muxers prefix it with JPEG-APP1-style
    ``Exif\\0\\0``, so both layouts are accepted."""
    from etlpy_spark.functions.jpegcodec import tiff_orientation

    try:
        for tag, payload in _riff_chunks(data):
            if tag == b"EXIF":
                if payload[:6] == b"Exif\x00\x00":
                    payload = payload[6:]
                return tiff_orientation(payload)
    except ValueError:
        return 1
    return 1


def encode_webp(px: np.ndarray, **kwargs) -> bytes:
    """(h, w, 3) uint8 RGB -> lossless WebP bytes (VP8L)."""
    h, w, _ = px.shape
    argb = np.empty((h, w, 4), dtype=np.uint8)
    argb[:, :, 0] = 255
    argb[:, :, 1:] = px
    return mux_webp(b"VP8L", encode_vp8l(argb, **kwargs))


def decode_webp(data: bytes) -> np.ndarray:
    """WebP bytes -> (h, w, 3) uint8 RGB (alpha composited over white,
    the house thumbnail convention shared with the PNG decoder). An
    animated WebP decodes to its first composited frame (the still-image
    view, same convention as decode_gif_image)."""
    argb = None
    for tag, payload in _riff_chunks(data):
        if tag == b"VP8L":
            argb = decode_vp8l(payload)
            break
        if tag == b"VP8 ":
            from etlpy_spark.functions import nativecodecs

            if nativecodecs.webp_available():
                # system libwebp closes the VP8-lossy gap when present
                # (container rule: baked-in lib, import-try gated)
                return nativecodecs.decode_webp_native(data)
            return _decode_vp8_lossy(payload)
        if tag == b"VP8X":
            continue  # flags + canvas size; pixel chunks follow
        # ALPH/EXIF/XMP/ICCP/ANIM ignored; ANMF -> first composited frame
        if tag == b"ANMF":
            for _idx, rgb, _dur in iter_webp_frames(data):
                return rgb
    if argb is None:
        raise ValueError("WebP: no decodable image chunk (VP8L/VP8)")
    rgb = argb[:, :, 1:].astype(np.float64)
    alpha = argb[:, :, 0].astype(np.float64) / 255.0
    if (argb[:, :, 0] != 255).any():
        rgb = rgb * alpha[:, :, None] + 255.0 * (1.0 - alpha[:, :, None])
    return np.clip(np.rint(rgb), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# animation (VP8X + ANIM + ANMF) — the WebP container spec's animation
# layout, decoded with the same dependency-chain frame sampling the GIF
# path uses (functions/gifcodec.py iter_gif_frames): structure is parsed
# in one chunk walk, and a skipped frame pays VP8L decode + compositing
# only when a later *sampled* frame depends on it.


class _AnimFrame:
    __slots__ = ("x", "y", "fw", "fh", "duration_ms", "blend", "dispose",
                 "payload", "lossy")

    def __init__(self, x, y, fw, fh, duration_ms, blend, dispose, payload, lossy):
        self.x, self.y, self.fw, self.fh = x, y, fw, fh
        self.duration_ms = duration_ms
        self.blend = blend          # True = alpha-blend onto canvas (flag bit clear)
        self.dispose = dispose      # True = fill frame rect with bg after display
        self.payload = payload      # VP8L (or VP8) chunk payload
        self.lossy = lossy


def _parse_anmf(payload: bytes) -> _AnimFrame:
    """One ANMF chunk payload -> frame geometry/flags + its image payload.

    Header (16 bytes): x/2, y/2, w-1, h-1, duration — each 24-bit LE —
    then a flags byte (bit0 = disposal: 1 dispose-to-background; bit1 =
    blending: 1 means do NOT blend). The frame data that follows is its
    own chunk sequence (optional ALPH, then VP8/VP8L)."""
    if len(payload) < 16:
        raise ValueError("WebP: truncated ANMF header")
    x = 2 * int.from_bytes(payload[0:3], "little")
    y = 2 * int.from_bytes(payload[3:6], "little")
    fw = 1 + int.from_bytes(payload[6:9], "little")
    fh = 1 + int.from_bytes(payload[9:12], "little")
    dur = int.from_bytes(payload[12:15], "little")
    flags = payload[15]
    blend = not (flags & 0x02)
    dispose = bool(flags & 0x01)
    pos, img, lossy = 16, None, False
    while pos + 8 <= len(payload):
        tag = payload[pos : pos + 4]
        size = struct.unpack("<I", payload[pos + 4 : pos + 8])[0]
        sub = payload[pos + 8 : pos + 8 + size]
        if len(sub) < size:
            raise ValueError("WebP: truncated chunk inside ANMF")
        if tag in (b"VP8L", b"VP8 "):
            img, lossy = sub, tag == b"VP8 "
            break
        pos += 8 + size + (size & 1)  # skip ALPH/unknown
    if img is None:
        raise ValueError("WebP: ANMF frame carries no VP8L/VP8 chunk")
    return _AnimFrame(x, y, fw, fh, dur, blend, dispose, img, lossy)


def _parse_webp_anim(data: bytes):
    """-> (canvas_w, canvas_h, bg_rgba, loop_count, [_AnimFrame...]) or
    None when the file carries no ANMF chunks (still image)."""
    canvas = None
    bg = np.array([255, 255, 255, 255], dtype=np.uint8)
    loop = 0
    frames = []
    for tag, payload in _riff_chunks(data):
        if tag == b"VP8X" and len(payload) >= 10:
            canvas = (1 + int.from_bytes(payload[4:7], "little"),
                      1 + int.from_bytes(payload[7:10], "little"))
        elif tag == b"ANIM" and len(payload) >= 6:
            b_, g_, r_, a_ = payload[0], payload[1], payload[2], payload[3]
            bg = np.array([r_, g_, b_, a_], dtype=np.uint8)  # stored BGRA
            loop = struct.unpack("<H", payload[4:6])[0]
        elif tag == b"ANMF":
            frames.append(_parse_anmf(payload))
    if not frames:
        return None
    if canvas is None:
        raise ValueError("WebP: ANMF frames without a VP8X canvas")
    cw, ch = canvas
    for f in frames:
        if f.x + f.fw > cw or f.y + f.fh > ch:
            raise ValueError("WebP: animation frame rect exceeds the canvas")
    return cw, ch, bg, loop, frames


def _frame_argb(f: _AnimFrame) -> np.ndarray:
    if f.lossy:
        return _vp8_refuse(f.payload)
    argb = decode_vp8l(f.payload)
    if argb.shape[:2] != (f.fh, f.fw):
        raise ValueError("WebP: ANMF geometry disagrees with its VP8L header")
    return argb


def _vp8_refuse(payload: bytes):
    _decode_vp8_lossy(payload)  # raises with dims; keep one message source
    raise AssertionError("unreachable")


def _blend_over(dst: np.ndarray, src_argb: np.ndarray) -> None:
    """Straight-alpha source-over compositing into an RGBA uint8 canvas
    region, in place. One rint per composite — deterministic, shared by
    the Spark path and the serial oracle."""
    sa = src_argb[:, :, 0].astype(np.float64) / 255.0
    da = dst[:, :, 3].astype(np.float64) / 255.0
    oa = sa + da * (1.0 - sa)
    safe = np.maximum(oa, 1e-12)
    src_rgb = src_argb[:, :, 1:].astype(np.float64)
    dst_rgb = dst[:, :, :3].astype(np.float64)
    out = (src_rgb * sa[:, :, None] + dst_rgb * (da * (1.0 - sa))[:, :, None]) / safe[:, :, None]
    dst[:, :, :3] = np.clip(np.rint(out), 0, 255).astype(np.uint8)
    dst[:, :, 3] = np.clip(np.rint(oa * 255.0), 0, 255).astype(np.uint8)


def iter_webp_frames(data: bytes, every_n: int = 1):
    """Yield ``(frame_idx, rgb_canvas, duration_ms)`` for every
    ``every_n``-th animation frame, composited per the container spec's
    blend/dispose rules (canvas initialized to the ANIM background color;
    alpha rendered over white at yield — the house thumbnail convention).

    Dependency-chain sampling mirrors iter_gif_frames: walking back from
    each sampled frame, the chain stops at a frame that fully covers the
    canvas without blending (the canvas is determined by that frame
    alone), or below a predecessor that fully covers the canvas and
    disposes to background (the canvas state is pure background there).
    VP8L decode is paid only for needed frames. A still WebP yields one
    frame (idx 0, duration 0)."""
    parsed = _parse_webp_anim(data)
    if parsed is None:
        if 0 % max(every_n, 1) == 0:
            yield 0, decode_webp(data), 0
        return
    cw, ch, bg, _loop, frames = parsed

    def full_cover(f):
        return f.x == 0 and f.y == 0 and f.fw == cw and f.fh == ch

    needed = [False] * len(frames)
    for i in range(0, len(frames), every_n):
        j = i
        while j >= 0 and not needed[j]:
            needed[j] = True
            f = frames[j]
            if full_cover(f) and not f.blend:
                break
            if j > 0 and frames[j - 1].dispose and full_cover(frames[j - 1]):
                break
            j -= 1

    canvas = np.empty((ch, cw, 4), dtype=np.uint8)
    canvas[:] = bg
    for i, f in enumerate(frames):
        if needed[i]:
            region = canvas[f.y : f.y + f.fh, f.x : f.x + f.fw]
            argb = _frame_argb(f)
            if f.blend:
                _blend_over(region, argb)
            else:
                region[:, :, :3] = argb[:, :, 1:]
                region[:, :, 3] = argb[:, :, 0]
            if i % every_n == 0:
                a = canvas[:, :, 3].astype(np.float64) / 255.0
                rgb = canvas[:, :, :3].astype(np.float64)
                rgb = rgb * a[:, :, None] + 255.0 * (1.0 - a[:, :, None])
                yield i, np.clip(np.rint(rgb), 0, 255).astype(np.uint8), f.duration_ms
        if f.dispose:
            canvas[f.y : f.y + f.fh, f.x : f.x + f.fw] = bg


def encode_webp_anim(
    frames,
    *,
    offsets=None,
    durations=None,
    blend=None,
    dispose=None,
    canvas=None,
    bg=(255, 255, 255, 255),
    loop: int = 0,
) -> bytes:
    """Animated WebP from ARGB/(RGB treated opaque) uint8 frames, each a
    VP8L-lossless ANMF chunk. ``offsets`` are per-frame canvas positions
    (even x/y — the container stores x/2,y/2); ``blend``/``dispose`` are
    per-frame flag lists; ``bg`` is RGBA. Used for differential fixtures:
    everything the decoder accepts, this can emit."""
    n = len(frames)
    if n == 0:
        raise ValueError("animation needs at least one frame")
    offsets = offsets or [(0, 0)] * n
    durations = durations or [40] * n
    blend = [False] * n if blend is None else list(blend)
    dispose = [False] * n if dispose is None else list(dispose)
    argbs = []
    for px in frames:
        if px.shape[2] == 3:
            a = np.empty(px.shape[:2] + (4,), dtype=np.uint8)
            a[:, :, 0] = 255
            a[:, :, 1:] = px
            argbs.append(a)
        else:
            argbs.append(px)
    if canvas is None:
        cw = max(x + f.shape[1] for (x, _), f in zip(offsets, argbs))
        ch = max(y + f.shape[0] for (_, y), f in zip(offsets, argbs))
    else:
        cw, ch = canvas
    has_alpha = any((f[:, :, 0] != 255).any() for f in argbs)
    chunks = [(b"VP8X", vp8x_header(cw, ch, alpha=has_alpha, anim=True))]
    r, g, b_, a_ = bg
    chunks.append((b"ANIM", bytes([b_, g, r, a_]) + struct.pack("<H", loop)))
    for (x, y), f, dur, bl, dp in zip(offsets, argbs, durations, blend, dispose):
        if x % 2 or y % 2:
            raise ValueError("ANMF offsets must be even (stored as x/2, y/2)")
        fh, fw = f.shape[:2]
        if x + fw > cw or y + fh > ch:
            raise ValueError("frame rect exceeds the canvas")
        payload = bytes(
            (x // 2).to_bytes(3, "little")
            + (y // 2).to_bytes(3, "little")
            + (fw - 1).to_bytes(3, "little")
            + (fh - 1).to_bytes(3, "little")
            + dur.to_bytes(3, "little")
            + bytes([(0 if bl else 0x02) | (0x01 if dp else 0)])
        )
        sub = encode_vp8l(f)
        payload += b"VP8L" + struct.pack("<I", len(sub)) + sub
        if len(sub) & 1:
            payload += b"\x00"
        chunks.append((b"ANMF", payload))
    return mux_webp_ex(chunks)
