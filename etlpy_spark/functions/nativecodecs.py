"""Optional ctypes bindings to the container's system image codecs.

The engine's image codecs are from-scratch numpy (functions/*codec.py);
their lossy/next-gen boundary was: VP8-lossy WebP, AVIF (AV1 intra) and
HEIC (HEVC intra) fall to typed ``decode_error`` rows because faithful
from-scratch decoders need the specs' large constant probability tables.
This container, however, ships the reference C implementations
(`libwebp.so.7`, `libheif.so.1` with dav1d/de265 decode plugins) — so we
bind them here with plain ``ctypes`` (no pip/apt, import-try gated per
the environment rule) and use them two ways:

1. **Coverage**: ``decode_webp_native`` / ``decode_heif_native`` close
   the VP8-lossy / AVIF / HEIC gaps in ``imagecodec.decode`` when the
   libraries are present; when absent the dispatch keeps its honest
   typed refusal (the fallback path is unchanged and still tested).
2. **Conformance**: the from-scratch VP8L codec is verified against the
   reference implementation in both directions
   (tests/test_nativecodecs.py): our encoder's streams must decode
   bit-exactly under libwebp, and libwebp-encoded lossless streams
   (which exercise transform/cache/meta-Huffman combinations our own
   encoder never emits) must decode bit-exactly under our decoder —
   upgrading "self-consistent" to "matches the reference codec".

Everything stays per-image inside Arrow-batched pandas UDFs; these
bindings add no per-row Python at plan level. Encoder entry points
(``encode_webp_native``, ``encode_heif_native``) exist for test-fixture
generation only — production encodes stay from-scratch.
"""

from __future__ import annotations

import ctypes
from ctypes import (
    POINTER,
    byref,
    c_char_p,
    c_float,
    c_int,
    c_size_t,
    c_ubyte,
    c_void_p,
)

import numpy as np

# ---------------------------------------------------------------------------
# library loading (memoized; never raises at import)

_LIBS: dict[str, ctypes.CDLL | None] = {}


def _load(key: str, sonames: tuple[str, ...]) -> ctypes.CDLL | None:
    if key not in _LIBS:
        lib = None
        for so in sonames:
            try:
                lib = ctypes.CDLL(so)
                break
            except OSError:
                continue
        _LIBS[key] = lib
    return _LIBS[key]


def _webp() -> ctypes.CDLL | None:
    lib = _load("webp", ("libwebp.so.7", "libwebp.so"))
    if lib is not None and not getattr(lib, "_sig_done", False):
        lib.WebPGetInfo.restype = c_int
        lib.WebPGetInfo.argtypes = [c_char_p, c_size_t, POINTER(c_int), POINTER(c_int)]
        lib.WebPDecodeRGBA.restype = POINTER(c_ubyte)
        lib.WebPDecodeRGBA.argtypes = [c_char_p, c_size_t, POINTER(c_int), POINTER(c_int)]
        lib.WebPFree.restype = None
        lib.WebPFree.argtypes = [c_void_p]
        lib.WebPEncodeRGB.restype = c_size_t
        lib.WebPEncodeRGB.argtypes = [c_char_p, c_int, c_int, c_int, c_float,
                                      POINTER(POINTER(c_ubyte))]
        lib.WebPEncodeLosslessRGB.restype = c_size_t
        lib.WebPEncodeLosslessRGB.argtypes = [c_char_p, c_int, c_int, c_int,
                                              POINTER(POINTER(c_ubyte))]
        lib._sig_done = True
    return lib


class _HeifError(ctypes.Structure):
    _fields_ = [("code", c_int), ("subcode", c_int), ("message", c_char_p)]


def _heif() -> ctypes.CDLL | None:
    lib = _load("heif", ("libheif.so.1", "libheif.so"))
    if lib is not None and not getattr(lib, "_sig_done", False):
        E = _HeifError
        lib.heif_context_alloc.restype = c_void_p
        lib.heif_context_free.argtypes = [c_void_p]
        lib.heif_context_read_from_memory_without_copy.restype = E
        lib.heif_context_read_from_memory_without_copy.argtypes = [
            c_void_p, c_char_p, c_size_t, c_void_p]
        lib.heif_context_get_primary_image_handle.restype = E
        lib.heif_context_get_primary_image_handle.argtypes = [c_void_p, POINTER(c_void_p)]
        lib.heif_image_handle_release.argtypes = [c_void_p]
        lib.heif_decode_image.restype = E
        lib.heif_decode_image.argtypes = [c_void_p, POINTER(c_void_p), c_int, c_int, c_void_p]
        lib.heif_image_release.argtypes = [c_void_p]
        lib.heif_image_handle_get_width.restype = c_int
        lib.heif_image_handle_get_width.argtypes = [c_void_p]
        lib.heif_image_handle_get_height.restype = c_int
        lib.heif_image_handle_get_height.argtypes = [c_void_p]
        lib.heif_image_get_plane_readonly.restype = POINTER(c_ubyte)
        lib.heif_image_get_plane_readonly.argtypes = [c_void_p, c_int, POINTER(c_int)]
        # encode side (test fixtures only)
        lib.heif_context_get_encoder_for_format.restype = E
        lib.heif_context_get_encoder_for_format.argtypes = [c_void_p, c_int, POINTER(c_void_p)]
        lib.heif_encoder_release.argtypes = [c_void_p]
        lib.heif_encoder_set_lossy_quality.restype = E
        lib.heif_encoder_set_lossy_quality.argtypes = [c_void_p, c_int]
        lib.heif_encoder_set_parameter_integer.restype = E
        lib.heif_encoder_set_parameter_integer.argtypes = [c_void_p, c_char_p, c_int]
        lib.heif_image_create.restype = E
        lib.heif_image_create.argtypes = [c_int, c_int, c_int, c_int, POINTER(c_void_p)]
        lib.heif_image_add_plane.restype = E
        lib.heif_image_add_plane.argtypes = [c_void_p, c_int, c_int, c_int, c_int]
        lib.heif_image_get_plane.restype = POINTER(c_ubyte)
        lib.heif_image_get_plane.argtypes = [c_void_p, c_int, POINTER(c_int)]
        lib.heif_context_encode_image.restype = E
        lib.heif_context_encode_image.argtypes = [c_void_p, c_void_p, c_void_p, c_void_p,
                                                  POINTER(c_void_p)]
        lib.heif_context_write_to_file.restype = E
        lib.heif_context_write_to_file.argtypes = [c_void_p, c_char_p]
        lib._sig_done = True
    return lib


def webp_available() -> bool:
    return _webp() is not None


def heif_available() -> bool:
    return _heif() is not None


# libheif enum values (stable public ABI, libheif/heif.h)
_HEIF_COLORSPACE_RGB = 1
_HEIF_CHROMA_INTERLEAVED_RGBA = 11
_HEIF_CHANNEL_INTERLEAVED = 10
_HEIF_COMPRESSION_HEVC = 1
_HEIF_COMPRESSION_AV1 = 4


def _over_white(rgba: np.ndarray) -> np.ndarray:
    """(h, w, 4) RGBA -> (h, w, 3) RGB composited over white — the house
    convention shared with the PNG and VP8L decode paths."""
    rgb = rgba[:, :, :3].astype(np.float64)
    a = rgba[:, :, 3]
    if (a != 255).any():
        af = a.astype(np.float64)[:, :, None] / 255.0
        rgb = rgb * af + 255.0 * (1.0 - af)
    return np.clip(np.rint(rgb), 0, 255).astype(np.uint8)


def decode_webp_native(data: bytes) -> np.ndarray:
    """WebP bytes -> (h, w, 3) uint8 RGB via libwebp (any still layout:
    VP8 lossy, VP8L, VP8X-wrapped, with or without ALPH)."""
    lib = _webp()
    if lib is None:
        raise ValueError("libwebp not available")
    w, h = c_int(), c_int()
    buf = lib.WebPDecodeRGBA(data, len(data), byref(w), byref(h))
    if not buf:
        raise ValueError("libwebp: decode failed")
    try:
        flat = np.ctypeslib.as_array(buf, shape=(h.value * w.value * 4,))
        rgba = flat.reshape(h.value, w.value, 4).copy()
    finally:
        lib.WebPFree(buf)
    return _over_white(rgba)


def encode_webp_native(px: np.ndarray, quality: float | None = None) -> bytes:
    """(h, w, 3) uint8 RGB -> WebP bytes via libwebp. ``quality=None``
    emits VP8L lossless (conformance-fixture generator for the
    from-scratch decoder); a float emits VP8 lossy at that quality."""
    lib = _webp()
    if lib is None:
        raise ValueError("libwebp not available")
    h, w, _ = px.shape
    rgb = np.ascontiguousarray(px, dtype=np.uint8).tobytes()
    out = POINTER(c_ubyte)()
    if quality is None:
        size = lib.WebPEncodeLosslessRGB(rgb, w, h, w * 3, byref(out))
    else:
        size = lib.WebPEncodeRGB(rgb, w, h, w * 3, c_float(quality), byref(out))
    if size == 0 or not out:
        raise ValueError("libwebp: encode failed")
    try:
        return bytes(bytearray(np.ctypeslib.as_array(out, shape=(size,))))
    finally:
        lib.WebPFree(out)


def _check(err: _HeifError, what: str) -> None:
    if err.code != 0:
        msg = (err.message or b"").decode("utf-8", "replace")
        raise ValueError(f"libheif: {what}: {msg} (code {err.code})")


def decode_heif_native(data: bytes) -> np.ndarray:
    """AVIF/HEIC bytes -> (h, w, 3) uint8 RGB via libheif (dav1d / de265
    decode plugins). Alpha composited over white like every other decode
    path."""
    lib = _heif()
    if lib is None:
        raise ValueError("libheif not available")
    ctx = lib.heif_context_alloc()
    if not ctx:
        raise ValueError("libheif: context alloc failed")
    handle, img = c_void_p(), c_void_p()
    try:
        # _without_copy: `data` (a Python bytes we hold) must outlive ctx
        _check(lib.heif_context_read_from_memory_without_copy(
            ctx, data, len(data), None), "read")
        _check(lib.heif_context_get_primary_image_handle(ctx, byref(handle)),
               "primary handle")
        w = lib.heif_image_handle_get_width(handle)
        h = lib.heif_image_handle_get_height(handle)
        _check(lib.heif_decode_image(handle, byref(img), _HEIF_COLORSPACE_RGB,
                                     _HEIF_CHROMA_INTERLEAVED_RGBA, None), "decode")
        stride = c_int()
        plane = lib.heif_image_get_plane_readonly(
            img, _HEIF_CHANNEL_INTERLEAVED, byref(stride))
        if not plane:
            raise ValueError("libheif: no interleaved plane")
        flat = np.ctypeslib.as_array(plane, shape=(h * stride.value,))
        rgba = flat.reshape(h, stride.value)[:, : w * 4].reshape(h, w, 4).copy()
    finally:
        if img:
            lib.heif_image_release(img)
        if handle:
            lib.heif_image_handle_release(handle)
        lib.heif_context_free(ctx)
    return _over_white(rgba)


def encode_heif_native(px: np.ndarray, fmt: str = "avif", quality: int = 80) -> bytes:
    """(h, w, 3) uint8 RGB -> AVIF (aom) or HEIC (x265) bytes via
    libheif — test-fixture generation only (production encodes stay
    from-scratch). Writes through a temp file: heif_context_write's
    streaming writer is a callback struct, the file path API is the
    stable one."""
    import os
    import tempfile

    lib = _heif()
    if lib is None:
        raise ValueError("libheif not available")
    comp = _HEIF_COMPRESSION_AV1 if fmt == "avif" else _HEIF_COMPRESSION_HEVC
    h, w, _ = px.shape
    ctx = lib.heif_context_alloc()
    enc, img = c_void_p(), c_void_p()
    try:
        _check(lib.heif_context_get_encoder_for_format(ctx, comp, byref(enc)),
               "get encoder")
        _check(lib.heif_encoder_set_lossy_quality(enc, quality), "quality")
        if fmt == "avif":  # default aom speed is minutes-per-image slow
            lib.heif_encoder_set_parameter_integer(enc, b"speed", 9)
        _check(lib.heif_image_create(w, h, _HEIF_COLORSPACE_RGB,
                                     _HEIF_CHROMA_INTERLEAVED_RGBA, byref(img)),
               "image create")
        _check(lib.heif_image_add_plane(img, _HEIF_CHANNEL_INTERLEAVED, w, h, 8),
               "add plane")
        stride = c_int()
        plane = lib.heif_image_get_plane(img, _HEIF_CHANNEL_INTERLEAVED, byref(stride))
        if not plane:
            raise ValueError("libheif: no encode plane")
        rgba = np.dstack([px, np.full((h, w), 255, dtype=np.uint8)])
        dst = np.ctypeslib.as_array(plane, shape=(h * stride.value,)).reshape(h, stride.value)
        dst[:, : w * 4] = rgba.reshape(h, w * 4)
        _check(lib.heif_context_encode_image(ctx, img, enc, None, None), "encode")
        fd, path = tempfile.mkstemp(suffix=f".{fmt}")
        os.close(fd)
        try:
            _check(lib.heif_context_write_to_file(ctx, path.encode()), "write")
            with open(path, "rb") as f:
                return f.read()
        finally:
            os.unlink(path)
    finally:
        if img:
            lib.heif_image_release(img)
        if enc:
            lib.heif_encoder_release(enc)
        lib.heif_context_free(ctx)
