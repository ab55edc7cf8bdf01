"""dlopen-guarded ctypes adapters over SYSTEM codec libraries.

Two roles, mirroring the import-guarded OCR-engine adapters
(`ocr_kernel.py`): (a) the production decode path for the one image
format whose from-scratch decode is out of scope in this build — lossy
WebP (VP8, RFC 6386 intra frames; reference loads these via PIL,
`cli/utils.py:98-117`) — and (b) spec-INTEROP oracles that validate the
from-scratch codecs in `stages/multimodal.py` against real third-party
implementations (libwebp for VP8L, libpng for PNG), upgrading those
codecs' evidence from round-trip-only to cross-implementation equality.

No Python imaging package is required: the adapters bind the plain-C
flat APIs (`WebPDecodeRGB`/`WebPEncodeRGB`, libpng's simplified
`png_image` API, both stable public ABIs) with ctypes. Every entry
point degrades to ``None`` / ``NotImplementedError`` when the shared
library is absent, so nothing here is load-bearing for correctness
gates — only for the decode path of lossy-VP8 payloads and for the
interop test tier (skipped cleanly when the libs are missing).
"""
from __future__ import annotations

import ctypes
import ctypes.util
from typing import Optional, Tuple

import numpy as np

__all__ = [
    "libwebp_available", "libpng_available",
    "webp_decode_rgb", "webp_decode_rgba",
    "webp_encode_rgb", "webp_encode_lossless_rgb",
    "png_read_rgb", "png_write_rgb",
]


# ---------------------------------------------------------------- libwebp

_WEBP_SONAMES = ("libwebp.so.7", "libwebp.so.6", "libwebp.so",
                 "libwebp.7.dylib", "libwebp.dylib")
_webp_lib: Optional[ctypes.CDLL] = None
_webp_tried = False


def _libwebp() -> Optional[ctypes.CDLL]:
    """dlopen libwebp once; None if absent (callers raise/skip)."""
    global _webp_lib, _webp_tried
    if _webp_tried:
        return _webp_lib
    _webp_tried = True
    names = list(_WEBP_SONAMES)
    found = ctypes.util.find_library("webp")
    if found:
        names.insert(0, found)
    for name in names:
        try:
            lib = ctypes.CDLL(name)
        except OSError:
            continue
        try:
            lib.WebPGetInfo.restype = ctypes.c_int
            lib.WebPGetInfo.argtypes = [
                ctypes.c_char_p, ctypes.c_size_t,
                ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
            for fn in ("WebPDecodeRGB", "WebPDecodeRGBA"):
                f = getattr(lib, fn)
                f.restype = ctypes.POINTER(ctypes.c_uint8)
                f.argtypes = [ctypes.c_char_p, ctypes.c_size_t,
                              ctypes.POINTER(ctypes.c_int),
                              ctypes.POINTER(ctypes.c_int)]
            lib.WebPEncodeRGB.restype = ctypes.c_size_t
            lib.WebPEncodeRGB.argtypes = [
                ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_float,
                ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8))]
            lib.WebPEncodeLosslessRGB.restype = ctypes.c_size_t
            lib.WebPEncodeLosslessRGB.argtypes = [
                ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8))]
            lib.WebPFree.restype = None
            lib.WebPFree.argtypes = [ctypes.c_void_p]
        except AttributeError:
            continue
        _webp_lib = lib
        break
    return _webp_lib


def libwebp_available() -> bool:
    return _libwebp() is not None


def _webp_decode_channels(data: bytes, nch: int) -> np.ndarray:
    lib = _libwebp()
    if lib is None:
        raise NotImplementedError(
            "lossy WebP (VP8) decode needs the system libwebp shared "
            "library, which was not found (tried "
            f"{', '.join(_WEBP_SONAMES)})")
    w = ctypes.c_int(0)
    h = ctypes.c_int(0)
    fn = lib.WebPDecodeRGB if nch == 3 else lib.WebPDecodeRGBA
    ptr = fn(data, len(data), ctypes.byref(w), ctypes.byref(h))
    if not ptr:
        raise ValueError("libwebp failed to decode WebP payload")
    try:
        n = w.value * h.value * nch
        arr = np.ctypeslib.as_array(ptr, shape=(n,)).copy()
    finally:
        lib.WebPFree(ctypes.cast(ptr, ctypes.c_void_p))
    return arr.reshape(h.value, w.value, nch)


def webp_decode_rgb(data: bytes) -> np.ndarray:
    """Full WebP container -> (H, W, 3) uint8 RGB via system libwebp
    (lossy VP8 and VP8L alike; any ALPH chunk is composited away by the
    library). Raises NotImplementedError when libwebp is absent."""
    return _webp_decode_channels(bytes(data), 3)


def webp_decode_rgba(data: bytes) -> np.ndarray:
    """WebP container -> (H, W, 4) uint8 RGBA via system libwebp."""
    return _webp_decode_channels(bytes(data), 4)


def _webp_encode(img: np.ndarray, lossless: bool,
                 quality: float) -> bytes:
    lib = _libwebp()
    if lib is None:
        raise NotImplementedError("system libwebp not found")
    if img.ndim != 3 or img.shape[2] != 3 or img.dtype != np.uint8:
        raise ValueError("expected (H, W, 3) uint8 RGB")
    h, w = img.shape[:2]
    buf = np.ascontiguousarray(img).tobytes()
    out = ctypes.POINTER(ctypes.c_uint8)()
    if lossless:
        size = lib.WebPEncodeLosslessRGB(buf, w, h, w * 3,
                                         ctypes.byref(out))
    else:
        size = lib.WebPEncodeRGB(buf, w, h, w * 3,
                                 ctypes.c_float(quality),
                                 ctypes.byref(out))
    if size == 0 or not out:
        raise ValueError("libwebp failed to encode")
    try:
        data = ctypes.string_at(out, size)
    finally:
        lib.WebPFree(ctypes.cast(out, ctypes.c_void_p))
    return data


def webp_encode_rgb(img: np.ndarray, quality: float = 90.0) -> bytes:
    """RGB -> lossy WebP (VP8) bytes via system libwebp — the only way
    to mint REAL VP8 bitstreams in this sandbox, used by the fixture
    tests for the lossy decode path."""
    return _webp_encode(img, lossless=False, quality=quality)


def webp_encode_lossless_rgb(img: np.ndarray) -> bytes:
    """RGB -> lossless WebP (VP8L) bytes via system libwebp — the
    interop oracle for the from-scratch VP8L decoder."""
    return _webp_encode(img, lossless=True, quality=100.0)


# ----------------------------------------------------------------- libpng
# libpng >= 1.6 "simplified API" (png.h, public stable ABI): a small
# POD control struct + begin_read/finish_read/write_to_memory. Format
# codes: PNG_FORMAT_FLAG_ALPHA=1, _COLOR=2 => GRAY=0, RGB=2, RGBA=3.

_PNG_SONAMES = ("libpng16.so.16", "libpng16.so", "libpng.so",
                "libpng16.16.dylib", "libpng.dylib")
_PNG_IMAGE_VERSION = 1
_PNG_FORMAT_RGB = 2

_png_lib: Optional[ctypes.CDLL] = None
_png_tried = False


class _PngImage(ctypes.Structure):
    _fields_ = [
        ("opaque", ctypes.c_void_p),
        ("version", ctypes.c_uint32),
        ("width", ctypes.c_uint32),
        ("height", ctypes.c_uint32),
        ("format", ctypes.c_uint32),
        ("flags", ctypes.c_uint32),
        ("colormap_entries", ctypes.c_uint32),
        ("warning_or_error", ctypes.c_uint32),
        ("message", ctypes.c_char * 64),
    ]


def _libpng() -> Optional[ctypes.CDLL]:
    global _png_lib, _png_tried
    if _png_tried:
        return _png_lib
    _png_tried = True
    names = list(_PNG_SONAMES)
    found = ctypes.util.find_library("png16") or \
        ctypes.util.find_library("png")
    if found:
        names.insert(0, found)
    for name in names:
        try:
            lib = ctypes.CDLL(name)
        except OSError:
            continue
        try:
            lib.png_image_begin_read_from_memory.restype = ctypes.c_int
            lib.png_image_begin_read_from_memory.argtypes = [
                ctypes.POINTER(_PngImage), ctypes.c_char_p,
                ctypes.c_size_t]
            lib.png_image_finish_read.restype = ctypes.c_int
            lib.png_image_finish_read.argtypes = [
                ctypes.POINTER(_PngImage), ctypes.c_void_p,
                ctypes.c_void_p, ctypes.c_int32, ctypes.c_void_p]
            lib.png_image_write_to_memory.restype = ctypes.c_int
            lib.png_image_write_to_memory.argtypes = [
                ctypes.POINTER(_PngImage), ctypes.c_void_p,
                ctypes.POINTER(ctypes.c_size_t), ctypes.c_int,
                ctypes.c_void_p, ctypes.c_int32, ctypes.c_void_p]
            lib.png_image_free.restype = None
            lib.png_image_free.argtypes = [ctypes.POINTER(_PngImage)]
        except AttributeError:
            continue
        _png_lib = lib
        break
    return _png_lib


def libpng_available() -> bool:
    return _libpng() is not None


def png_read_rgb(data: bytes) -> np.ndarray:
    """PNG bytes -> (H, W, 3) uint8 RGB via the REAL libpng (simplified
    API; any depth/color-type/interlace is converted to 8-bit RGB by the
    library) — the interop oracle for the from-scratch PNG codec."""
    lib = _libpng()
    if lib is None:
        raise NotImplementedError("system libpng not found")
    img = _PngImage()
    img.version = _PNG_IMAGE_VERSION
    data = bytes(data)
    if not lib.png_image_begin_read_from_memory(
            ctypes.byref(img), data, len(data)):
        raise ValueError(
            f"libpng read failed: {img.message.decode(errors='replace')}")
    img.format = _PNG_FORMAT_RGB
    h, w = img.height, img.width
    buf = np.empty((h, w, 3), np.uint8)
    ok = lib.png_image_finish_read(
        ctypes.byref(img), None,
        buf.ctypes.data_as(ctypes.c_void_p), w * 3, None)
    lib.png_image_free(ctypes.byref(img))
    if not ok:
        raise ValueError(
            f"libpng decode failed: {img.message.decode(errors='replace')}")
    return buf


def png_write_rgb(img_arr: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB -> PNG bytes via the REAL libpng — mints
    genuine third-party PNG files for the from-scratch decoder tests."""
    lib = _libpng()
    if lib is None:
        raise NotImplementedError("system libpng not found")
    if img_arr.ndim != 3 or img_arr.shape[2] != 3 or \
            img_arr.dtype != np.uint8:
        raise ValueError("expected (H, W, 3) uint8 RGB")
    h, w = img_arr.shape[:2]
    src = np.ascontiguousarray(img_arr)
    img = _PngImage()
    img.version = _PNG_IMAGE_VERSION
    img.width = w
    img.height = h
    img.format = _PNG_FORMAT_RGB
    size = ctypes.c_size_t(0)
    # two-call protocol: NULL memory => required size in `size`
    lib.png_image_write_to_memory(
        ctypes.byref(img), None, ctypes.byref(size), 0,
        src.ctypes.data_as(ctypes.c_void_p), w * 3, None)
    if size.value == 0:
        raise ValueError(
            f"libpng size probe failed: "
            f"{img.message.decode(errors='replace')}")
    out = ctypes.create_string_buffer(size.value)
    ok = lib.png_image_write_to_memory(
        ctypes.byref(img), out, ctypes.byref(size), 0,
        src.ctypes.data_as(ctypes.c_void_p), w * 3, None)
    lib.png_image_free(ctypes.byref(img))
    if not ok:
        raise ValueError(
            f"libpng encode failed: {img.message.decode(errors='replace')}")
    return out.raw[:size.value]
