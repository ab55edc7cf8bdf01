"""dlopen-guarded ctypes adapters over SYSTEM codec libraries.

Two roles, mirroring the import-guarded OCR-engine adapters
(`ocr_kernel.py`): (a) the production decode path for the one image
format whose from-scratch decode is out of scope in this build — lossy
WebP (VP8, RFC 6386 intra frames; reference loads these via PIL,
`cli/utils.py:98-117`) — and (b) spec-INTEROP oracles that validate the
from-scratch codecs in `stages/multimodal.py` against real third-party
implementations (libwebp for VP8L, libpng for PNG, giflib for GIF),
upgrading those codecs' evidence from round-trip-only to
cross-implementation equality.

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
from typing import List, Optional

import numpy as np

__all__ = [
    "libwebp_available", "libpng_available", "libgif_available",
    "libtiff_available",
    "webp_decode_rgb", "webp_decode_rgba",
    "webp_encode_rgb", "webp_encode_lossless_rgb",
    "png_read_rgb", "png_write_rgb",
    "gif_decode_rgb", "gif_encode_rgb",
    "tiff_decode_rgb", "tiff_encode_rgb", "TIFF_COMPRESSIONS",
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


# ----------------------------------------------------------------- libgif
# giflib 5.x (libgif.so.7): callback-driven open + DGifSlurp/EGifPut*.
# Struct layouts are the public gif_lib.h ABI (stable across 5.1/5.2).

_GIF_SONAMES = ("libgif.so.7", "libgif.so", "libgif.7.dylib",
                "libgif.dylib")
_gif_lib: Optional[ctypes.CDLL] = None
_gif_tried = False

_GifWord = ctypes.c_int


class _GifColorType(ctypes.Structure):
    _fields_ = [("Red", ctypes.c_ubyte), ("Green", ctypes.c_ubyte),
                ("Blue", ctypes.c_ubyte)]


class _ColorMapObject(ctypes.Structure):
    _fields_ = [("ColorCount", ctypes.c_int),
                ("BitsPerPixel", ctypes.c_int),
                ("SortFlag", ctypes.c_bool),
                ("Colors", ctypes.POINTER(_GifColorType))]


class _GifImageDesc(ctypes.Structure):
    _fields_ = [("Left", _GifWord), ("Top", _GifWord),
                ("Width", _GifWord), ("Height", _GifWord),
                ("Interlace", ctypes.c_bool),
                ("ColorMap", ctypes.POINTER(_ColorMapObject))]


class _ExtensionBlock(ctypes.Structure):
    _fields_ = [("ByteCount", ctypes.c_int),
                ("Bytes", ctypes.POINTER(ctypes.c_ubyte)),
                ("Function", ctypes.c_int)]


class _SavedImage(ctypes.Structure):
    _fields_ = [("ImageDesc", _GifImageDesc),
                ("RasterBits", ctypes.POINTER(ctypes.c_ubyte)),
                ("ExtensionBlockCount", ctypes.c_int),
                ("ExtensionBlocks", ctypes.POINTER(_ExtensionBlock))]


class _GifFileType(ctypes.Structure):
    _fields_ = [("SWidth", _GifWord), ("SHeight", _GifWord),
                ("SColorResolution", _GifWord),
                ("SBackGroundColor", _GifWord),
                ("AspectByte", ctypes.c_ubyte),
                ("SColorMap", ctypes.POINTER(_ColorMapObject)),
                ("ImageCount", ctypes.c_int),
                ("Image", _GifImageDesc),
                ("SavedImages", ctypes.POINTER(_SavedImage)),
                ("ExtensionBlockCount", ctypes.c_int),
                ("ExtensionBlocks", ctypes.POINTER(_ExtensionBlock)),
                ("Error", ctypes.c_int),
                ("UserData", ctypes.c_void_p),
                ("Private", ctypes.c_void_p)]


_GIF_INFUNC = ctypes.CFUNCTYPE(ctypes.c_int, ctypes.POINTER(_GifFileType),
                               ctypes.POINTER(ctypes.c_ubyte), ctypes.c_int)
_GIF_OUTFUNC = _GIF_INFUNC


def _libgif() -> Optional[ctypes.CDLL]:
    global _gif_lib, _gif_tried
    if _gif_tried:
        return _gif_lib
    _gif_tried = True
    names = list(_GIF_SONAMES)
    found = ctypes.util.find_library("gif")
    if found:
        names.insert(0, found)
    for name in names:
        try:
            lib = ctypes.CDLL(name)
        except OSError:
            continue
        try:
            lib.DGifOpen.restype = ctypes.POINTER(_GifFileType)
            lib.DGifOpen.argtypes = [ctypes.c_void_p, _GIF_INFUNC,
                                     ctypes.POINTER(ctypes.c_int)]
            lib.DGifSlurp.restype = ctypes.c_int
            lib.DGifSlurp.argtypes = [ctypes.POINTER(_GifFileType)]
            lib.DGifCloseFile.restype = ctypes.c_int
            lib.DGifCloseFile.argtypes = [ctypes.POINTER(_GifFileType),
                                          ctypes.POINTER(ctypes.c_int)]
            lib.EGifOpen.restype = ctypes.POINTER(_GifFileType)
            lib.EGifOpen.argtypes = [ctypes.c_void_p, _GIF_OUTFUNC,
                                     ctypes.POINTER(ctypes.c_int)]
            lib.EGifCloseFile.restype = ctypes.c_int
            lib.EGifCloseFile.argtypes = [ctypes.POINTER(_GifFileType),
                                          ctypes.POINTER(ctypes.c_int)]
            lib.EGifPutScreenDesc.restype = ctypes.c_int
            lib.EGifPutScreenDesc.argtypes = [
                ctypes.POINTER(_GifFileType), ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(_ColorMapObject)]
            lib.EGifPutImageDesc.restype = ctypes.c_int
            lib.EGifPutImageDesc.argtypes = [
                ctypes.POINTER(_GifFileType), ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_int, ctypes.c_bool,
                ctypes.POINTER(_ColorMapObject)]
            lib.EGifPutLine.restype = ctypes.c_int
            lib.EGifPutLine.argtypes = [ctypes.POINTER(_GifFileType),
                                        ctypes.POINTER(ctypes.c_ubyte),
                                        ctypes.c_int]
            lib.GifMakeMapObject.restype = ctypes.POINTER(_ColorMapObject)
            lib.GifMakeMapObject.argtypes = [
                ctypes.c_int, ctypes.POINTER(_GifColorType)]
            lib.GifFreeMapObject.restype = None
            lib.GifFreeMapObject.argtypes = [
                ctypes.POINTER(_ColorMapObject)]
        except AttributeError:
            continue
        _gif_lib = lib
        break
    return _gif_lib


def libgif_available() -> bool:
    return _libgif() is not None


def gif_decode_rgb(data: bytes) -> np.ndarray:
    """GIF bytes -> (H, W, 3) uint8 RGB of the FIRST frame via the real
    giflib (DGifSlurp through a memory read callback) — the interop
    oracle for the from-scratch GIF codec."""
    lib = _libgif()
    if lib is None:
        raise NotImplementedError("system libgif not found")
    data = bytes(data)
    state = {"pos": 0}

    def read_cb(_gf, buf, count):
        p = state["pos"]
        chunk = data[p:p + count]
        ctypes.memmove(buf, chunk, len(chunk))
        state["pos"] = p + len(chunk)
        return len(chunk)

    cb = _GIF_INFUNC(read_cb)
    err = ctypes.c_int(0)
    gf = lib.DGifOpen(None, cb, ctypes.byref(err))
    if not gf:
        raise ValueError(f"giflib open failed (err={err.value})")
    if lib.DGifSlurp(gf) != 1:
        e = gf.contents.Error
        lib.DGifCloseFile(gf, ctypes.byref(err))
        raise ValueError(f"giflib slurp failed (err={e})")
    try:
        g = gf.contents
        if g.ImageCount < 1:
            raise ValueError("gif has no images")
        img = g.SavedImages[0]
        d = img.ImageDesc
        cm = d.ColorMap if d.ColorMap else g.SColorMap
        if not cm:
            raise ValueError("gif has no colormap")
        ncol = cm.contents.ColorCount
        pal = np.array(
            [(cm.contents.Colors[i].Red, cm.contents.Colors[i].Green,
              cm.contents.Colors[i].Blue) for i in range(ncol)],
            np.uint8)
        w, h = d.Width, d.Height
        interlace = bool(d.Interlace)
        idx = np.ctypeslib.as_array(img.RasterBits, shape=(w * h,)).copy()
    finally:
        lib.DGifCloseFile(gf, ctypes.byref(err))
    idx = idx.reshape(h, w)
    if interlace:
        # giflib's slurp stores rows in FILE order; re-interleave the
        # four GIF passes (8/8/4/2) back to display order
        out_rows = np.empty(h, np.int64)
        file_row = 0
        for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)):
            for y in range(start, h, step):
                out_rows[y] = file_row
                file_row += 1
        idx = idx[out_rows]
    return pal[np.minimum(idx, ncol - 1)]


def gif_encode_rgb(img: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB (<= 256 distinct colors) -> GIF bytes via the
    real giflib — mints genuine third-party GIF files for the
    from-scratch decoder tests."""
    lib = _libgif()
    if lib is None:
        raise NotImplementedError("system libgif not found")
    if img.ndim != 3 or img.shape[2] != 3 or img.dtype != np.uint8:
        raise ValueError("expected (H, W, 3) uint8 RGB")
    h, w = img.shape[:2]
    flat = img.reshape(-1, 3)
    pal, inv = np.unique(flat, axis=0, return_inverse=True)
    if len(pal) > 256:
        raise ValueError("more than 256 distinct colors")
    ncol = 2
    while ncol < len(pal):
        ncol *= 2
    colors = (_GifColorType * ncol)()
    for i, (r, g, b) in enumerate(pal):
        colors[i] = _GifColorType(int(r), int(g), int(b))
    cmap = lib.GifMakeMapObject(ncol, colors)
    if not cmap:
        raise ValueError("GifMakeMapObject failed")
    chunks: List[bytes] = []

    def write_cb(_gf, buf, count):
        chunks.append(ctypes.string_at(buf, count))
        return count

    cb = _GIF_OUTFUNC(write_cb)
    err = ctypes.c_int(0)
    gf = lib.EGifOpen(None, cb, ctypes.byref(err))
    if not gf:
        lib.GifFreeMapObject(cmap)
        raise ValueError(f"giflib EGifOpen failed (err={err.value})")
    try:
        if lib.EGifPutScreenDesc(gf, w, h, 8, 0, cmap) != 1 or \
                lib.EGifPutImageDesc(gf, 0, 0, w, h, False, None) != 1:
            raise ValueError("giflib header write failed")
        rows = inv.astype(np.uint8).reshape(h, w)
        for y in range(h):
            row = np.ascontiguousarray(rows[y])
            if lib.EGifPutLine(
                    gf, row.ctypes.data_as(
                        ctypes.POINTER(ctypes.c_ubyte)), w) != 1:
                raise ValueError(f"giflib row write failed at y={y}")
    finally:
        lib.EGifCloseFile(gf, ctypes.byref(err))
        lib.GifFreeMapObject(cmap)
    return b"".join(chunks)


# ---------------------------------------------------------------- libtiff
# libtiff 4.x (libtiff.so.6): TIFFClientOpen over memory callbacks +
# TIFFReadRGBAImageOriented / TIFFWriteEncodedStrip. Interop oracle for
# the from-scratch TIFF decoder (incl. the TIFF-LZW early-change path
# and predictor=2 horizontal differencing). NOTE: the encode side must
# use TIFFWriteEncodedStrip — on this libtiff the scanline write path
# records the PREDICTOR tag without applying the differencing.

_TIFF_SONAMES = ("libtiff.so.6", "libtiff.so.5", "libtiff.so",
                 "libtiff.6.dylib", "libtiff.dylib")
_tiff_lib: Optional[ctypes.CDLL] = None
_tiff_tried = False

_T_READ = ctypes.CFUNCTYPE(ctypes.c_ssize_t, ctypes.c_void_p,
                           ctypes.c_void_p, ctypes.c_ssize_t)
_T_SEEK = ctypes.CFUNCTYPE(ctypes.c_uint64, ctypes.c_void_p,
                           ctypes.c_uint64, ctypes.c_int)
_T_CLOSE = ctypes.CFUNCTYPE(ctypes.c_int, ctypes.c_void_p)
_T_SIZE = ctypes.CFUNCTYPE(ctypes.c_uint64, ctypes.c_void_p)
_T_MAP = ctypes.CFUNCTYPE(ctypes.c_int, ctypes.c_void_p,
                          ctypes.POINTER(ctypes.c_void_p),
                          ctypes.POINTER(ctypes.c_uint64))
_T_UNMAP = ctypes.CFUNCTYPE(None, ctypes.c_void_p, ctypes.c_void_p,
                            ctypes.c_uint64)

TIFF_COMPRESSIONS = {"none": 1, "lzw": 5, "deflate": 8, "packbits": 32773}


def _libtiff() -> Optional[ctypes.CDLL]:
    global _tiff_lib, _tiff_tried
    if _tiff_tried:
        return _tiff_lib
    _tiff_tried = True
    names = list(_TIFF_SONAMES)
    found = ctypes.util.find_library("tiff")
    if found:
        names.insert(0, found)
    for name in names:
        try:
            lib = ctypes.CDLL(name)
        except OSError:
            continue
        try:
            lib.TIFFClientOpen.restype = ctypes.c_void_p
            lib.TIFFClose.argtypes = [ctypes.c_void_p]
            lib.TIFFClose.restype = None
            lib.TIFFWriteEncodedStrip.restype = ctypes.c_ssize_t
            lib.TIFFWriteEncodedStrip.argtypes = [
                ctypes.c_void_p, ctypes.c_uint32, ctypes.c_void_p,
                ctypes.c_ssize_t]
            lib.TIFFReadRGBAImageOriented.restype = ctypes.c_int
            lib.TIFFReadRGBAImageOriented.argtypes = [
                ctypes.c_void_p, ctypes.c_uint32, ctypes.c_uint32,
                ctypes.POINTER(ctypes.c_uint32), ctypes.c_int,
                ctypes.c_int]
            # TIFFSetField/TIFFGetField are varargs: leave argtypes
            # unset and wrap every pointer in c_void_p at the call site
            lib.TIFFSetField.restype = ctypes.c_int
            lib.TIFFGetField.restype = ctypes.c_int
        except AttributeError:
            continue
        _tiff_lib = lib
        break
    return _tiff_lib


def libtiff_available() -> bool:
    return _libtiff() is not None


class _TiffMemFile:
    """In-memory byte store exposed through TIFFClientOpen callbacks
    (read/write/seek/size; mmap declined). Keeps the CFUNCTYPE objects
    alive for the lifetime of the open file."""

    def __init__(self, data: bytes = b""):
        self.buf = bytearray(data)
        self.pos = 0

        def _read(_h, p, n):
            chunk = bytes(self.buf[self.pos:self.pos + n])
            ctypes.memmove(p, chunk, len(chunk))
            self.pos += len(chunk)
            return len(chunk)

        def _write(_h, p, n):
            data = ctypes.string_at(p, n)
            end = self.pos + n
            if end > len(self.buf):
                self.buf.extend(b"\x00" * (end - len(self.buf)))
            self.buf[self.pos:end] = data
            self.pos = end
            return n

        def _seek(_h, off, whence):
            if whence == 0:
                self.pos = off
            elif whence == 1:
                self.pos += off
            else:
                self.pos = len(self.buf) + off
            return self.pos

        self.cbs = (_T_READ(_read), _T_READ(_write), _T_SEEK(_seek),
                    _T_CLOSE(lambda _h: 0),
                    _T_SIZE(lambda _h: len(self.buf)),
                    _T_MAP(lambda _h, _p, _s: 0),
                    _T_UNMAP(lambda _h, _p, _s: None))


def tiff_encode_rgb(img: np.ndarray, compression: str = "lzw",
                    predictor: int = 1,
                    rows_per_strip: int = 16) -> bytes:
    """(H, W, 3) uint8 RGB -> TIFF bytes via the REAL libtiff — mints
    genuine third-party TIFF files (LZW / Deflate / PackBits / none,
    optional horizontal-differencing predictor, multi-strip) for the
    from-scratch decoder tests."""
    lib = _libtiff()
    if lib is None:
        raise NotImplementedError("system libtiff not found")
    if img.ndim != 3 or img.shape[2] != 3 or img.dtype != np.uint8:
        raise ValueError("expected (H, W, 3) uint8 RGB")
    comp = TIFF_COMPRESSIONS.get(compression)
    if comp is None:
        raise ValueError(f"compression must be one of "
                         f"{sorted(TIFF_COMPRESSIONS)}")
    if predictor != 1 and compression not in ("lzw", "deflate"):
        raise ValueError("TIFF predictor is an LZW/Deflate codec "
                         "pseudo-tag; not valid for "
                         f"{compression!r}")
    h, w = img.shape[:2]
    mf = _TiffMemFile()
    tif = lib.TIFFClientOpen(b"mem", b"w", None, *mf.cbs)
    if not tif:
        raise ValueError("libtiff open-for-write failed")
    try:
        fields = [(256, ctypes.c_uint32(w)), (257, ctypes.c_uint32(h)),
                  (258, ctypes.c_int(8)), (277, ctypes.c_int(3)),
                  (262, ctypes.c_int(2)), (284, ctypes.c_int(1)),
                  (259, ctypes.c_int(comp)),
                  (278, ctypes.c_uint32(rows_per_strip))]
        if predictor != 1:
            fields.append((317, ctypes.c_int(predictor)))
        for tag, val in fields:
            if lib.TIFFSetField(ctypes.c_void_p(tif), ctypes.c_uint32(tag),
                                val) != 1:
                raise ValueError(f"libtiff TIFFSetField({tag}) failed")
        strip = 0
        for y0 in range(0, h, rows_per_strip):
            rows = np.ascontiguousarray(img[y0:y0 + rows_per_strip])
            n = lib.TIFFWriteEncodedStrip(
                tif, strip, rows.ctypes.data_as(ctypes.c_void_p),
                rows.size)
            if n <= 0:
                raise ValueError(f"libtiff strip write failed at {strip}")
            strip += 1
    finally:
        lib.TIFFClose(tif)
    return bytes(mf.buf)


def tiff_decode_rgb(data: bytes) -> np.ndarray:
    """TIFF bytes -> (H, W, 3) uint8 RGB via the REAL libtiff
    (TIFFReadRGBAImageOriented, top-left orientation) — the interop
    oracle for the from-scratch TIFF encoder."""
    lib = _libtiff()
    if lib is None:
        raise NotImplementedError("system libtiff not found")
    mf = _TiffMemFile(bytes(data))
    tif = lib.TIFFClientOpen(b"mem", b"r", None, *mf.cbs)
    if not tif:
        raise ValueError("libtiff failed to open TIFF payload")
    try:
        w = ctypes.c_uint32(0)
        h = ctypes.c_uint32(0)
        lib.TIFFGetField(ctypes.c_void_p(tif), ctypes.c_uint32(256),
                         ctypes.byref(w))
        lib.TIFFGetField(ctypes.c_void_p(tif), ctypes.c_uint32(257),
                         ctypes.byref(h))
        if not w.value or not h.value:
            raise ValueError("libtiff reported zero dimensions")
        raster = (ctypes.c_uint32 * (w.value * h.value))()
        if lib.TIFFReadRGBAImageOriented(tif, w, h, raster, 1, 0) != 1:
            raise ValueError("libtiff RGBA decode failed")
    finally:
        lib.TIFFClose(tif)
    a = np.ctypeslib.as_array(raster).reshape(h.value, w.value)
    return np.stack([a & 0xFF, (a >> 8) & 0xFF, (a >> 16) & 0xFF],
                    axis=2).astype(np.uint8)
