"""Multimodal column stages: image/audio/video as opaque binary + metadata.

Schema convention (the engine-level contract):

    media(asset_id: string, kind: string,          # "image"|"audio"|"video"
          payload: binary,                          # encoded bytes, opaque
          meta: struct<format: string, width: int32, height: int32,
                       sample_rate: int32, n_frames: int32>)

Every stage is an actor-pool ``map_batches`` class (codec/model state loads
once per actor in ``__init__``) with SMALL batch sizes — a batch of decoded
frames is orders of magnitude bigger than its encoded payload, so
``batch_size`` bounds worker heap, and the decoded representation never
outlives the fused stage (decode -> feature -> drop pixels in one __call__).

The codec boundary is a ``Codec`` protocol with three implementations:
``RawCodec`` is a WORKING pure-numpy decoder for uncompressed containers
(24-bit BMP, 16-bit PCM WAV, raw rgb24 video) — real bytes decode for real,
no external libraries; ``RealCodec`` is the documented stub seam for
compressed formats (png/jpeg/mp4 need PIL/ffmpeg, absent in this container);
``AutoCodec`` routes by ``meta.format`` (raw formats decode, the rest
surface in-band errors); ``FakeCodec`` provides a deterministic seeded
decode for plumbing tests and synthetic benchmarks.
"""

from __future__ import annotations

import hashlib
from typing import Any, Dict, List, Optional

import numpy as np
import pyarrow as pa

MEDIA_META = pa.struct([
    ("format", pa.string()),
    ("width", pa.int32()),
    ("height", pa.int32()),
    ("sample_rate", pa.int32()),
    ("n_frames", pa.int32()),
])
MEDIA_SCHEMA = pa.schema([
    ("asset_id", pa.string()),
    ("kind", pa.string()),
    ("payload", pa.large_binary()),
    ("meta", MEDIA_META),
])


class Codec:
    """Decode boundary. Implementations must be deterministic per payload."""

    def decode_image(self, payload: bytes, meta: Dict[str, Any]) -> np.ndarray:
        raise NotImplementedError

    def decode_audio(self, payload: bytes, meta: Dict[str, Any]) -> np.ndarray:
        raise NotImplementedError

    def decode_video_frames(self, payload: bytes, meta: Dict[str, Any],
                            stride: int) -> List[np.ndarray]:
        raise NotImplementedError


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_decode(b: bytes) -> np.ndarray:
    """Pure numpy+zlib PNG decoder (PNG spec, RFC 2083): 8-bit depth,
    non-interlaced, color types gray/RGB/palette/gray-alpha/RGBA, all five
    scanline filters. Output (H, W, 3) uint8 RGB (alpha dropped). Filters
    Sub is a per-channel-lane cumulative sum; Average/Paeth carry a left
    dependency, so those rows run a per-pixel loop vectorized over channel
    lanes (rare rows pay O(W) python steps; None/Up rows stay whole-row)."""
    import struct
    import zlib

    if bytes(b[:8]) != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos = 8
    ihdr = None
    idat: List[bytes] = []
    plte = None
    while pos + 8 <= len(b):
        ln = int.from_bytes(b[pos:pos + 4], "big")
        typ = bytes(b[pos + 4:pos + 8])
        body = bytes(b[pos + 8:pos + 8 + ln])
        if typ == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif typ == b"IDAT":
            idat.append(body)
        elif typ == b"PLTE":
            plte = np.frombuffer(body, np.uint8).reshape(-1, 3)
        elif typ == b"IEND":
            break
        pos += 12 + ln  # len + type + body + crc
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, ctype, _comp, _filt, interlace = ihdr
    if depth not in (1, 2, 4, 8, 16):
        raise ValueError(f"invalid PNG bit depth {depth}")
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(ctype)
    if channels is None:
        raise ValueError(f"unknown PNG color type {ctype}")
    if depth < 8 and ctype not in (0, 3):
        raise ValueError(f"PNG depth {depth} only valid for gray/palette")
    data = np.frombuffer(zlib.decompress(b"".join(idat)), np.uint8)
    # filtering operates on BYTES with the spec's byte-granular bpp
    bpp = max(1, channels * depth // 8)

    def unfilter(rows: np.ndarray, ph: int, pstride: int) -> np.ndarray:
        ftypes = rows[:, 0]
        out = np.zeros((ph, pstride), np.int64)
        prev = np.zeros(pstride, np.int64)
        n_units = pstride // bpp
        for y in range(ph):
            f = int(ftypes[y])
            row = rows[y, 1:].astype(np.int64)
            if f == 0:
                rec = row
            elif f == 1:  # Sub: cumulative sum per byte lane, mod 256
                lanes = row.reshape(n_units, bpp)
                rec = np.cumsum(lanes, axis=0, dtype=np.int64) \
                    .reshape(pstride) & 255
            elif f == 2:  # Up
                rec = (row + prev) & 255
            elif f in (3, 4):  # Average / Paeth: left dep -> pixel loop
                rec = np.zeros(pstride, np.int64)
                lanes = row.reshape(n_units, bpp)
                up = prev.reshape(n_units, bpp)
                recl = rec.reshape(n_units, bpp)
                left = np.zeros(bpp, np.int64)
                ul = np.zeros(bpp, np.int64)
                for x in range(n_units):
                    if f == 3:
                        recl[x] = (lanes[x] + (left + up[x]) // 2) & 255
                    else:
                        p = left + up[x] - ul
                        pa_ = np.abs(p - left)
                        pb_ = np.abs(p - up[x])
                        pc_ = np.abs(p - ul)
                        pred = np.where((pa_ <= pb_) & (pa_ <= pc_), left,
                                        np.where(pb_ <= pc_, up[x], ul))
                        recl[x] = (lanes[x] + pred) & 255
                    left = recl[x]
                    ul = up[x]
                rec = recl.reshape(pstride)
            else:
                raise ValueError(f"unknown PNG filter type {f}")
            out[y] = rec
            prev = rec
        return out

    def unpack(rec: np.ndarray, ph: int, pw: int) -> np.ndarray:
        """(ph, pstride) filtered bytes -> (ph, pw*channels) 8-bit
        samples (16-bit truncates to the high byte; sub-byte depths
        unpack MSB-first; gray sub-byte scales to full range, palette
        indices stay raw)."""
        if depth == 8:
            return rec[:, :pw * channels]
        if depth == 16:
            return rec[:, 0::2][:, :pw * channels]
        bits = np.unpackbits(rec.astype(np.uint8), axis=1)
        if depth == 1:
            v = bits[:, :pw]
        elif depth == 2:
            v = (2 * bits[:, 0::2] + bits[:, 1::2])[:, :pw]
        else:  # 4
            v = (8 * bits[:, 0::4] + 4 * bits[:, 1::4]
                 + 2 * bits[:, 2::4] + bits[:, 3::4])[:, :pw]
        if ctype == 0:  # gray: scale to 8-bit full range
            v = v * {1: 255, 2: 85, 4: 17}[depth]
        return v

    def pstride_of(pw: int) -> int:
        return -(-pw * channels * depth // 8)

    if interlace == 0:
        stride = pstride_of(w)
        if len(data) != h * (stride + 1):
            raise ValueError("PNG scanline data size mismatch")
        samples = unpack(unfilter(data.reshape(h, stride + 1), h, stride),
                         h, w)
    elif interlace == 1:  # Adam7: 7 independent sub-images
        img = np.zeros((h, w, channels), np.int64)
        pos = 0
        for x0, y0, dx, dy in ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8),
                               (2, 0, 4, 4), (0, 2, 2, 4), (1, 0, 2, 2),
                               (0, 1, 1, 2)):
            pw = -(-(w - x0) // dx) if w > x0 else 0
            ph = -(-(h - y0) // dy) if h > y0 else 0
            if pw == 0 or ph == 0:
                continue
            pstride = pstride_of(pw)
            take = ph * (pstride + 1)
            chunk = data[pos:pos + take]
            if len(chunk) != take:
                raise ValueError("PNG Adam7 pass data truncated")
            pos += take
            s = unpack(unfilter(chunk.reshape(ph, pstride + 1),
                                ph, pstride), ph, pw)
            img[y0::dy, x0::dx] = s.reshape(ph, pw, channels)
        samples = img.reshape(h, w * channels)
    else:
        raise ValueError(f"unknown PNG interlace method {interlace}")
    pix = samples.astype(np.uint8).reshape(h, w, channels)
    if ctype == 0:
        return np.repeat(pix, 3, axis=2)
    if ctype == 2:
        return pix
    if ctype == 3:
        if plte is None:
            raise ValueError("palette PNG missing PLTE")
        return plte[pix[:, :, 0]]
    if ctype == 4:
        return np.repeat(pix[:, :, :1], 3, axis=2)
    return pix[:, :, :3].copy()  # RGBA -> RGB


def encode_png(img: np.ndarray, filter_type: int = 0) -> bytes:
    """Minimal PNG encoder (round-trip counterpart of _png_decode): 8-bit
    RGB, one filter type for every scanline (0/1/2 supported — enough to
    exercise the decoder's filter reconstruction in tests)."""
    import struct
    import zlib

    h, w = img.shape[:2]
    rgb = img.astype(np.int64)
    lines = []
    prev = np.zeros((w, 3), np.int64)
    for y in range(h):
        row = rgb[y]
        if filter_type == 0:
            filt = row
        elif filter_type == 1:  # Sub
            filt = (row - np.vstack([np.zeros((1, 3), np.int64), row[:-1]])) & 255
        elif filter_type == 2:  # Up
            filt = (row - prev) & 255
        else:
            raise ValueError("encode_png supports filter types 0/1/2")
        lines.append(bytes([filter_type]) + filt.astype(np.uint8).tobytes())
        prev = row
    payload = zlib.compress(b"".join(lines))

    def chunk(typ: bytes, body: bytes) -> bytes:
        crc = zlib.crc32(typ + body) & 0xFFFFFFFF
        return len(body).to_bytes(4, "big") + typ + body + crc.to_bytes(4, "big")

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (_PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", payload)
            + chunk(b"IEND", b""))


# --- baseline JPEG (pure numpy + stdlib): ITU-T T.81 sequential DCT ---

def _zigzag_order() -> np.ndarray:
    """The 64-entry zigzag scan as (row, col) pairs, generated from the
    anti-diagonal walk (even diagonals reversed) instead of a hardcoded
    table."""
    order = []
    for s in range(15):
        cells = [(y, s - y) for y in range(8) if 0 <= s - y < 8]
        if s % 2 == 0:
            cells = cells[::-1]
        order.extend(cells)
    return np.array(order, dtype=np.int64)


_ZZ = _zigzag_order()
_ZZ_FLAT = _ZZ[:, 0] * 8 + _ZZ[:, 1]  # zigzag index -> raster index


def _dct_basis() -> np.ndarray:
    """Orthonormal 8-point DCT-II basis C: forward F = C f C^T, inverse
    f = C^T F C — numerically identical to T.81's FDCT/IDCT scaling."""
    x = np.arange(8)
    u = x[:, None]
    c = np.cos((2 * x[None, :] + 1) * u * np.pi / 16)
    c[0] *= np.sqrt(1 / 8) / np.sqrt(2 / 8)
    return c * np.sqrt(2 / 8)


_DCT_C = _dct_basis()


def _huff_canonical(counts: List[int], symbols: List[int]) -> Dict:
    """Canonical Huffman (T.81 Annex C): {(length, code): symbol}."""
    table = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(counts[ln - 1]):
            table[(ln, code)] = symbols[k]
            code += 1
            k += 1
        code <<= 1
    return table


class _BitReader:
    """MSB-first bit reader over one entropy-coded segment (stuffing
    already removed)."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.bit = 0

    def read_bit(self) -> int:
        if self.pos >= len(self.data):
            return 0  # T.81: pad with 1s at EOI; 0 keeps EXTEND harmless
        b = (self.data[self.pos] >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1
        return b

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def read_huff(self, table: Dict) -> int:
        code = 0
        for ln in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG Huffman code")


def _extend(v: int, t: int) -> int:
    """T.81 EXTEND: map the t-bit magnitude to its signed value."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def _jpeg_assemble_rgb(planes: List[np.ndarray], samps: List[tuple],
                       hmax: int, vmax: int, h: int, w: int) -> np.ndarray:
    """Shared tail of BOTH JPEG decoders (baseline + progressive):
    chroma upsample, crop to (h, w), grayscale replicate or BT.601
    YCbCr->RGB. One copy so the pixel-identity contract between the two
    paths holds by construction."""
    full = []
    for p, (hi, vi) in zip(planes, samps):
        p = np.repeat(np.repeat(p, vmax // vi, axis=0), hmax // hi, axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        g = full[0].astype(np.uint8)
        return np.repeat(g[:, :, None], 3, axis=2)
    y, cb, cr = (f.astype(np.float64) for f in full[:3])
    r = y + 1.402 * (cr - 128)
    g = y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128)
    bl = y + 1.772 * (cb - 128)
    rgb = np.stack([r, g, bl], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def _jpeg_decode(b: bytes) -> np.ndarray:
    """Pure numpy+stdlib baseline JPEG decoder (ITU-T T.81 sequential DCT,
    Huffman, 8-bit): JFIF/EXIF wrappers, 1- or 3-component scans, any
    h/v subsampling (4:4:4, 4:2:2, 4:2:0, ...), 8/16-bit quant tables,
    restart markers. Output (H, W, 3) uint8 RGB (grayscale replicated),
    matching the reference's load-as-RGB convention (cli/utils.py:98-117).
    Progressive/arithmetic modes raise (in-band error upstream)."""
    b = bytes(b)
    if b[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    qt: Dict[int, np.ndarray] = {}
    huff: Dict = {}
    sof = None
    dri = 0
    scan = None
    while pos < len(b) - 1:
        if b[pos] != 0xFF:
            pos += 1
            continue
        marker = b[pos + 1]
        pos += 2
        if marker in (0x01, 0xD8) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:
            break
        ln = int.from_bytes(b[pos:pos + 2], "big")
        body = b[pos + 2:pos + ln]
        pos += ln
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 15
                i += 1
                if pq == 0:
                    tbl = np.frombuffer(body[i:i + 64], np.uint8)
                    i += 64
                else:
                    tbl = np.frombuffer(body[i:i + 128], ">u2")
                    i += 128
                qt[tq] = tbl.astype(np.int64)
        elif marker in (0xC0, 0xC1):  # baseline / extended sequential
            h = int.from_bytes(body[1:3], "big")
            w = int.from_bytes(body[3:5], "big")
            nc = body[5]
            comps = []
            for c in range(nc):
                cid = body[6 + 3 * c]
                samp = body[7 + 3 * c]
                comps.append((cid, samp >> 4, samp & 15, body[8 + 3 * c]))
            sof = (h, w, comps)
        elif marker == 0xC2:  # progressive DCT: dedicated multi-scan path
            return _jpeg_decode_progressive(b)
        elif marker in (0xC6, 0xCA, 0xCE):
            raise ValueError("hierarchical/lossless JPEG not supported")
        elif marker in (0xC9, 0xCB, 0xCD, 0xCF):
            raise ValueError("arithmetic-coded JPEG not supported")
        elif marker == 0xC4:  # DHT (possibly several tables per segment)
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 15
                i += 1
                counts = list(body[i:i + 16])
                i += 16
                n = sum(counts)
                huff[(tc, th)] = _huff_canonical(counts, list(body[i:i + n]))
                i += n
        elif marker == 0xDD:
            dri = int.from_bytes(body[:2], "big")
        elif marker == 0xDA:  # SOS: selectors, then the entropy stream
            ns = body[0]
            sel = [(body[1 + 2 * c], body[2 + 2 * c] >> 4,
                    body[2 + 2 * c] & 15) for c in range(ns)]
            segs: List[bytes] = []
            cur = bytearray()
            i = pos
            while i < len(b):
                if b[i] == 0xFF and i + 1 < len(b):
                    nxt = b[i + 1]
                    if nxt == 0x00:
                        cur.append(0xFF)
                        i += 2
                        continue
                    if 0xD0 <= nxt <= 0xD7:  # restart marker
                        segs.append(bytes(cur))
                        cur = bytearray()
                        i += 2
                        continue
                    break
                cur.append(b[i])
                i += 1
            segs.append(bytes(cur))
            pos = i
            scan = (sel, segs)
            break  # single-scan baseline: decode after the loop
    if sof is None or scan is None:
        raise ValueError("JPEG missing SOF/SOS")
    h, w, comps = sof
    sel, segs = scan
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    by_id = {c[0]: c for c in comps}
    planes = {}
    for cid, hi, vi, _tq in comps:
        planes[cid] = np.zeros((mcuy * vi * 8, mcux * hi * 8), np.int64)
    tables = []
    for cs, td, ta in sel:
        _, hi, vi, tq = by_id[cs]
        tables.append((cs, hi, vi, qt[tq], huff[(0, td)], huff[(1, ta)]))

    seg_idx = 0
    reader = _BitReader(segs[0])
    pred = {cs: 0 for cs, *_ in tables}
    n_mcus = mcux * mcuy
    for m in range(n_mcus):
        if dri and m and m % dri == 0:  # restart: next segment, reset DC
            seg_idx += 1
            reader = _BitReader(segs[seg_idx])
            pred = {cs: 0 for cs, *_ in tables}
        my, mx = divmod(m, mcux)
        for cs, hi, vi, q, hdc, hac in tables:
            for v in range(vi):
                for hh in range(hi):
                    zz = np.zeros(64, np.int64)
                    t = reader.read_huff(hdc)
                    diff = _extend(reader.read_bits(t), t)
                    pred[cs] += diff
                    zz[0] = pred[cs]
                    k = 1
                    while k < 64:
                        rs = reader.read_huff(hac)
                        r, s = rs >> 4, rs & 15
                        if s == 0:
                            if r == 15:  # ZRL
                                k += 16
                                continue
                            break  # EOB
                        k += r
                        if k > 63:
                            raise ValueError("JPEG AC index overflow")
                        zz[k] = _extend(reader.read_bits(s), s)
                        k += 1
                    block = np.zeros(64, np.float64)
                    block[_ZZ_FLAT] = zz * q
                    f = _DCT_C.T @ block.reshape(8, 8) @ _DCT_C
                    y0 = (my * vi + v) * 8
                    x0 = (mx * hi + hh) * 8
                    planes[cs][y0:y0 + 8, x0:x0 + 8] = \
                        np.clip(np.round(f) + 128, 0, 255).astype(np.int64)

    return _jpeg_assemble_rgb([planes[cid] for cid, *_ in comps],
                              [(hi, vi) for _cid, hi, vi, _tq in comps],
                              hmax, vmax, h, w)


def _jpeg_entropy_segments(b: bytes, pos: int):
    """Collect one scan's entropy-coded data starting at ``pos``: returns
    (segments, new_pos). Segments split at restart markers (RSTn);
    stuffed 0xFF00 bytes are unstuffed; stops at any other marker."""
    segs: List[bytes] = []
    cur = bytearray()
    i = pos
    while i < len(b):
        if b[i] == 0xFF and i + 1 < len(b):
            nxt = b[i + 1]
            if nxt == 0x00:
                cur.append(0xFF)
                i += 2
                continue
            if 0xD0 <= nxt <= 0xD7:
                segs.append(bytes(cur))
                cur = bytearray()
                i += 2
                continue
            break
        cur.append(b[i])
        i += 1
    segs.append(bytes(cur))
    return segs, i


def _jpeg_decode_progressive(b: bytes) -> np.ndarray:
    """Progressive JPEG decoder (ITU-T T.81 Annex G, successive
    approximation + spectral selection — the jdphuff.c semantics): DC
    first/refinement scans (interleaved or not), per-component AC
    first/refinement scans with EOB-run coding, ZRL, restart markers,
    tables redefinable between scans. Coefficients accumulate across
    scans in zigzag order; dequant + IDCT + upsample + color-convert run
    once at the end (identical math to the baseline path, so a
    progressive encoding of the same quantized coefficients decodes
    pixel-identically — gated in tests/test_multimodal.py, plus a real
    libjpeg-encoded progressive fixture)."""
    b = bytes(b)
    pos = 2
    qt: Dict[int, np.ndarray] = {}
    huff: Dict = {}
    sof = None
    dri = 0
    coefs: Dict[int, np.ndarray] = {}   # cid -> (grid_by, grid_bx, 64) zz
    truedim: Dict[int, tuple] = {}      # cid -> (by, bx) true block dims
    hmax = vmax = mcux = mcuy = 0
    while pos < len(b) - 1:
        if b[pos] != 0xFF:
            pos += 1
            continue
        marker = b[pos + 1]
        pos += 2
        if marker in (0x01, 0xD8) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:
            break
        ln = int.from_bytes(b[pos:pos + 2], "big")
        body = b[pos + 2:pos + ln]
        pos += ln
        if marker == 0xDB:
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 15
                i += 1
                if pq == 0:
                    tbl = np.frombuffer(body[i:i + 64], np.uint8)
                    i += 64
                else:
                    tbl = np.frombuffer(body[i:i + 128], ">u2")
                    i += 128
                qt[tq] = tbl.astype(np.int64)
        elif marker == 0xC4:
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 15
                i += 1
                counts = list(body[i:i + 16])
                i += 16
                n = sum(counts)
                huff[(tc, th)] = _huff_canonical(counts, list(body[i:i + n]))
                i += n
        elif marker == 0xC2:
            h = int.from_bytes(body[1:3], "big")
            w = int.from_bytes(body[3:5], "big")
            nc = body[5]
            comps = []
            for c in range(nc):
                cid = body[6 + 3 * c]
                samp = body[7 + 3 * c]
                comps.append((cid, samp >> 4, samp & 15, body[8 + 3 * c]))
            sof = (h, w, comps)
            hmax = max(c[1] for c in comps)
            vmax = max(c[2] for c in comps)
            mcux = -(-w // (8 * hmax))
            mcuy = -(-h // (8 * vmax))
            for cid, hi, vi, _tq in comps:
                coefs[cid] = np.zeros((mcuy * vi, mcux * hi, 64), np.int64)
                cw = -(-w * hi // hmax)
                ch = -(-h * vi // vmax)
                truedim[cid] = (-(-ch // 8), -(-cw // 8))
        elif marker == 0xDD:
            dri = int.from_bytes(body[:2], "big")
        elif marker == 0xDA:
            if sof is None:
                raise ValueError("JPEG SOS before SOF")
            ns = body[0]
            sel = [(body[1 + 2 * c], body[2 + 2 * c] >> 4,
                    body[2 + 2 * c] & 15) for c in range(ns)]
            ss = body[1 + 2 * ns]
            se = body[2 + 2 * ns]
            ah = body[3 + 2 * ns] >> 4
            al = body[3 + 2 * ns] & 15
            segs, pos = _jpeg_entropy_segments(b, pos)
            _jpeg_progressive_scan(sof, sel, ss, se, ah, al, segs, dri,
                                   huff, coefs, truedim, mcux, mcuy)
    if sof is None:
        raise ValueError("progressive JPEG missing SOF2")
    h, w, comps = sof

    # dequant + IDCT once, after all scans
    planes = []
    for cid, hi, vi, tq in comps:
        arr = coefs[cid]
        gy, gx, _ = arr.shape
        q = qt[tq]
        plane = np.zeros((gy * 8, gx * 8), np.int64)
        deq = arr * q  # zigzag order
        for by in range(gy):
            for bx in range(gx):
                block = np.zeros(64, np.float64)
                block[_ZZ_FLAT] = deq[by, bx]
                f = _DCT_C.T @ block.reshape(8, 8) @ _DCT_C
                plane[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] = \
                    np.clip(np.round(f) + 128, 0, 255).astype(np.int64)
        planes.append(plane)
    return _jpeg_assemble_rgb(planes,
                              [(hi, vi) for _cid, hi, vi, _tq in comps],
                              hmax, vmax, h, w)


def _jpeg_progressive_scan(sof, sel, ss, se, ah, al, segs, dri, huff,
                           coefs, truedim, mcux, mcuy) -> None:
    """Decode one progressive scan into the coefficient store.

    DC scans (ss == 0) may be interleaved (MCU order over the padded
    grid); AC scans are single-component, raster order over the TRUE
    block dims (T.81 G: non-interleaved scans cover ceil(cw/8) x
    ceil(ch/8) blocks, not the MCU-padded grid). Restart intervals reset
    the bit reader, DC predictors and the EOB run."""
    h, w, comps = sof
    by_id = {c[0]: c for c in comps}

    if ss == 0:  # ---- DC scan ----
        tables = {}
        for cs, td, _ta in sel:
            tables[cs] = huff.get((0, td))
        seg_idx = 0
        reader = _BitReader(segs[0])
        pred = {cs: 0 for cs, *_ in sel}
        if len(sel) > 1:
            units = mcux * mcuy
        else:
            cs0 = sel[0][0]
            tby, tbx = truedim[cs0]
            units = tby * tbx
        for m in range(units):
            if dri and m and m % dri == 0:
                seg_idx += 1
                reader = _BitReader(segs[seg_idx])
                pred = {cs: 0 for cs, *_ in sel}
            for cs, _td, _ta in sel:
                _, hi, vi, _tq = by_id[cs]
                arr = coefs[cs]
                if len(sel) > 1:
                    my, mx = divmod(m, mcux)
                    blocks = [((my * vi + v), (mx * hi + hh))
                              for v in range(vi) for hh in range(hi)]
                else:
                    tby, tbx = truedim[cs]
                    blocks = [divmod(m, tbx)]
                for yy, xx in blocks:
                    if ah == 0:
                        t = reader.read_huff(tables[cs])
                        diff = _extend(reader.read_bits(t), t)
                        pred[cs] += diff
                        arr[yy, xx, 0] = pred[cs] << al
                    else:
                        if reader.read_bit():
                            arr[yy, xx, 0] |= (1 << al)
        return

    # ---- AC scan: exactly one component ----
    if len(sel) != 1:
        raise ValueError("progressive AC scan must be single-component")
    cs, _td, ta = sel[0]
    hac = huff[(1, ta)]
    arr = coefs[cs]
    tby, tbx = truedim[cs]
    p1 = 1 << al
    m1 = -p1
    seg_idx = 0
    reader = _BitReader(segs[0])
    eobrun = 0
    for m in range(tby * tbx):
        if dri and m and m % dri == 0:
            seg_idx += 1
            reader = _BitReader(segs[seg_idx])
            eobrun = 0
        yy, xx = divmod(m, tbx)
        zz = arr[yy, xx]
        if ah == 0:  # ---- first AC scan ----
            if eobrun > 0:
                eobrun -= 1
                continue
            k = ss
            while k <= se:
                rs = reader.read_huff(hac)
                r, s = rs >> 4, rs & 15
                if s == 0:
                    if r == 15:  # ZRL
                        k += 16
                        continue
                    if r:  # EOBn: run includes this block
                        eobrun = (1 << r) + reader.read_bits(r) - 1
                    break
                k += r
                if k > se:
                    raise ValueError("JPEG AC index overflow")
                zz[k] = _extend(reader.read_bits(s), s) << al
                k += 1
        else:  # ---- AC refinement scan (jdphuff semantics) ----
            k = ss
            if eobrun == 0:
                while k <= se:
                    rs = reader.read_huff(hac)
                    r, s = rs >> 4, rs & 15
                    newval = 0
                    if s:
                        if s != 1:
                            raise ValueError(
                                "bad refinement magnitude in AC scan")
                        newval = p1 if reader.read_bit() else m1
                    elif r != 15:
                        eobrun = 1 << r
                        if r:
                            eobrun += reader.read_bits(r)
                        break
                    # advance over nonzero-history coefs (correction
                    # bits) and r zero-history coefs
                    while k <= se:
                        if zz[k] != 0:
                            if reader.read_bit() and not (zz[k] & p1):
                                zz[k] += p1 if zz[k] >= 0 else m1
                        else:
                            if r == 0:
                                break
                            r -= 1
                        k += 1
                    if newval and k <= se:
                        zz[k] = newval
                    k += 1
            if eobrun > 0:
                # every run-member block still consumes correction bits
                # for its already-nonzero coefficients
                while k <= se:
                    if zz[k] != 0:
                        if reader.read_bit() and not (zz[k] & p1):
                            zz[k] += p1 if zz[k] >= 0 else m1
                    k += 1
                eobrun -= 1


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.nbits = 0

    def flush(self) -> bytes:
        if self.nbits:
            self.acc = (self.acc << (8 - self.nbits)) | ((1 << (8 - self.nbits)) - 1)
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
            self.acc = 0
            self.nbits = 0
        return bytes(self.out)


def _mag_cat(v: int) -> int:
    """Magnitude category (bit length of |v|)."""
    return int(abs(v)).bit_length()


def encode_jpeg(img: np.ndarray, quant: int = 1,
                subsample: bool = False) -> bytes:
    """Minimal baseline JPEG encoder (round-trip counterpart of
    _jpeg_decode, same pattern as encode_png): 8-bit luma-only (2-D input)
    or YCbCr 4:4:4 / 4:2:0 (subsample=True), flat quant tables
    (``quant`` for every coefficient), simple self-generated canonical
    Huffman tables written into the file. Test scaffolding, not a
    production encoder."""
    gray = img.ndim == 2
    h, w = img.shape[:2]

    # fixed canonical tables: DC symbols 0..11 at length 4 (12 codes),
    # AC symbols (all 162 run/size pairs) at length 9 — prefix-free by
    # construction, never the all-ones reserved code
    dc_counts = [0, 0, 0, 12] + [0] * 12
    dc_syms = list(range(12))
    ac_syms = [0x00, 0xF0] + [(r << 4) | s
                              for r in range(16) for s in range(1, 11)]
    ac_counts = [0] * 8 + [len(ac_syms)] + [0] * 7
    dc_table = {}
    for (ln, code), sym in _huff_canonical(dc_counts, dc_syms).items():
        dc_table[sym] = (code, ln)
    ac_table = {}
    for (ln, code), sym in _huff_canonical(ac_counts, ac_syms).items():
        ac_table[sym] = (code, ln)

    if gray:
        planes = [img.astype(np.float64)]
        samps = [(1, 1)]
    else:
        rgb = img.astype(np.float64)
        r, g, bch = rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * bch
        cb = -0.168736 * r - 0.331264 * g + 0.5 * bch + 128
        cr = 0.5 * r - 0.418688 * g - 0.081312 * bch + 128
        if subsample:
            def ds2(p):
                hh = (p.shape[0] + 1) // 2 * 2
                ww = (p.shape[1] + 1) // 2 * 2
                q = np.zeros((hh, ww))
                q[:p.shape[0], :p.shape[1]] = p
                if p.shape[0] < hh:
                    q[p.shape[0]:, :p.shape[1]] = p[-1:]
                if p.shape[1] < ww:
                    q[:, p.shape[1]:] = q[:, p.shape[1] - 1:p.shape[1]]
                return (q[0::2, 0::2] + q[1::2, 0::2] + q[0::2, 1::2]
                        + q[1::2, 1::2]) / 4
            planes = [y, ds2(cb), ds2(cr)]
            samps = [(2, 2), (1, 1), (1, 1)]
        else:
            planes = [y, cb, cr]
            samps = [(1, 1), (1, 1), (1, 1)]

    hmax = max(s[0] for s in samps)
    vmax = max(s[1] for s in samps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    padded = []
    for p, (hi, vi) in zip(planes, samps):
        ph, pw = mcuy * vi * 8, mcux * hi * 8
        q = np.zeros((ph, pw))
        ch, cw = p.shape
        q[:ch, :cw] = p
        if ch < ph:
            q[ch:, :cw] = p[-1:, :]
        if cw < pw:
            q[:, cw:] = q[:, cw - 1:cw]
        padded.append(q)

    wtr = _BitWriter()
    pred = [0] * len(planes)
    for m in range(mcux * mcuy):
        my, mx = divmod(m, mcux)
        for ci, (p, (hi, vi)) in enumerate(zip(padded, samps)):
            for v in range(vi):
                for hh in range(hi):
                    y0 = (my * vi + v) * 8
                    x0 = (mx * hi + hh) * 8
                    blk = p[y0:y0 + 8, x0:x0 + 8] - 128.0
                    coef = _DCT_C @ blk @ _DCT_C.T
                    qz = np.round(coef / quant).astype(np.int64)
                    zz = qz.reshape(-1)[_ZZ_FLAT]
                    diff = int(zz[0]) - pred[ci]
                    pred[ci] = int(zz[0])
                    t = _mag_cat(diff)
                    code, ln = dc_table[t]
                    wtr.write(code, ln)
                    if t:
                        wtr.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
                    run = 0
                    for k in range(1, 64):
                        val = int(zz[k])
                        if val == 0:
                            run += 1
                            continue
                        while run > 15:
                            code, ln = ac_table[0xF0]
                            wtr.write(code, ln)
                            run -= 16
                        s = _mag_cat(val)
                        code, ln = ac_table[(run << 4) | s]
                        wtr.write(code, ln)
                        wtr.write(val if val >= 0 else val + (1 << s) - 1, s)
                        run = 0
                    if run:
                        code, ln = ac_table[0x00]
                        wtr.write(code, ln)
    entropy = wtr.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body

    qtbl = np.full(64, quant, np.int64)
    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, bytes([0x00]) + bytes(int(x) for x in qtbl))
    nc = len(planes)
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([nc])
    for ci, (hi, vi) in enumerate(samps):
        sof += bytes([ci + 1, (hi << 4) | vi, 0])
    out += seg(0xC0, sof)
    out += seg(0xC4, bytes([0x00]) + bytes(dc_counts) + bytes(dc_syms))
    out += seg(0xC4, bytes([0x10]) + bytes(ac_counts) + bytes(ac_syms))
    sos = bytes([nc])
    for ci in range(nc):
        sos += bytes([ci + 1, 0x00])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    out += entropy
    out += b"\xff\xd9"
    return bytes(out)


def encode_jpeg_progressive(img: np.ndarray, quant: int = 1,
                            subsample: bool = False) -> bytes:
    """Progressive JPEG encoder (T.81 Annex G, jcphuff.c semantics —
    round-trip counterpart of _jpeg_decode_progressive). Same DCT/quant
    math as encode_jpeg, so decoding its output must be PIXEL-IDENTICAL
    to the baseline round trip of the same image. Scan script: DC first
    (interleaved, Al=1) -> AC first per component (Ss=1..63, Al=1, with
    EOB-run accumulation + ZRL) -> DC refinement -> AC refinement per
    component (buffered correction bits, the full jcphuff protocol).
    Test scaffolding, not a production encoder."""
    gray = img.ndim == 2
    h, w = img.shape[:2]

    dc_counts = [0, 0, 0, 12] + [0] * 12
    dc_syms = list(range(12))
    # progressive AC alphabet: EOBn (r<15, s=0), ZRL, and all (r, 1..10)
    ac_syms = [(r << 4) | s for r in range(16) for s in range(11)]
    ac_counts = [0] * 8 + [len(ac_syms)] + [0] * 7
    dc_table = {}
    for (ln, code), sym in _huff_canonical(dc_counts, dc_syms).items():
        dc_table[sym] = (code, ln)
    ac_table = {}
    for (ln, code), sym in _huff_canonical(ac_counts, ac_syms).items():
        ac_table[sym] = (code, ln)

    if gray:
        planes = [img.astype(np.float64)]
        samps = [(1, 1)]
    else:
        rgb = img.astype(np.float64)
        r, g, bch = rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * bch
        cb = -0.168736 * r - 0.331264 * g + 0.5 * bch + 128
        cr = 0.5 * r - 0.418688 * g - 0.081312 * bch + 128
        if subsample:
            def ds2(p):
                hh = (p.shape[0] + 1) // 2 * 2
                ww = (p.shape[1] + 1) // 2 * 2
                q = np.zeros((hh, ww))
                q[:p.shape[0], :p.shape[1]] = p
                if p.shape[0] < hh:
                    q[p.shape[0]:, :p.shape[1]] = p[-1:]
                if p.shape[1] < ww:
                    q[:, p.shape[1]:] = q[:, p.shape[1] - 1:p.shape[1]]
                return (q[0::2, 0::2] + q[1::2, 0::2] + q[0::2, 1::2]
                        + q[1::2, 1::2]) / 4
            planes = [y, ds2(cb), ds2(cr)]
            samps = [(2, 2), (1, 1), (1, 1)]
        else:
            planes = [y, cb, cr]
            samps = [(1, 1), (1, 1), (1, 1)]

    hmax = max(s[0] for s in samps)
    vmax = max(s[1] for s in samps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    coefs = []       # per comp: (grid_by, grid_bx, 64) zigzag int64
    truedims = []
    for p, (hi, vi) in zip(planes, samps):
        ph, pw = mcuy * vi * 8, mcux * hi * 8
        q = np.zeros((ph, pw))
        ch, cw = p.shape
        q[:ch, :cw] = p
        if ch < ph:
            q[ch:, :cw] = p[-1:, :]
        if cw < pw:
            q[:, cw:] = q[:, cw - 1:cw]
        gy, gx = ph // 8, pw // 8
        arr = np.zeros((gy, gx, 64), np.int64)
        for by in range(gy):
            for bx in range(gx):
                blk = q[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] - 128.0
                c = _DCT_C @ blk @ _DCT_C.T
                arr[by, bx] = np.round(c / quant).astype(np.int64) \
                    .reshape(-1)[_ZZ_FLAT]
        coefs.append(arr)
        truedims.append((-(-ch // 8), -(-cw // 8)))

    def wsym(wtr, tbl, sym):
        code, ln = tbl[sym]
        wtr.write(code, ln)

    def scan_dc_first(al: int) -> bytes:
        wtr = _BitWriter()
        pred = [0] * len(planes)
        for m in range(mcux * mcuy):
            my, mx = divmod(m, mcux)
            for ci, (hi, vi) in enumerate(samps):
                for v in range(vi):
                    for hh in range(hi):
                        val = int(coefs[ci][my * vi + v, mx * hi + hh, 0]) \
                            >> al
                        diff = val - pred[ci]
                        pred[ci] = val
                        t = _mag_cat(diff)
                        wsym(wtr, dc_table, t)
                        if t:
                            wtr.write(diff if diff >= 0
                                      else diff + (1 << t) - 1, t)
        return wtr.flush()

    def scan_dc_refine(al: int) -> bytes:
        wtr = _BitWriter()
        for m in range(mcux * mcuy):
            my, mx = divmod(m, mcux)
            for ci, (hi, vi) in enumerate(samps):
                for v in range(vi):
                    for hh in range(hi):
                        wtr.write((int(coefs[ci][my * vi + v,
                                                 mx * hi + hh, 0])
                                   >> al) & 1, 1)
        return wtr.flush()

    def scan_ac_first(ci: int, al: int) -> bytes:
        wtr = _BitWriter()
        eobrun = 0

        def flush_eob():
            nonlocal eobrun
            if eobrun:
                nbits = eobrun.bit_length() - 1
                wsym(wtr, ac_table, nbits << 4)
                if nbits:
                    wtr.write(eobrun & ((1 << nbits) - 1), nbits)
                eobrun = 0

        tby, tbx = truedims[ci]
        for m in range(tby * tbx):
            yy, xx = divmod(m, tbx)
            zz = coefs[ci][yy, xx]
            run = 0
            for k in range(1, 64):
                val = int(zz[k])
                a = abs(val) >> al
                if a == 0:
                    run += 1
                    continue
                flush_eob()
                while run > 15:
                    wsym(wtr, ac_table, 0xF0)
                    run -= 16
                s = a.bit_length()
                vpt = a if val > 0 else -a
                wsym(wtr, ac_table, (run << 4) | s)
                wtr.write(vpt if vpt >= 0 else vpt + (1 << s) - 1, s)
                run = 0
            if run > 0:
                eobrun += 1
                if eobrun == 0x7FFF:
                    flush_eob()
        flush_eob()
        return wtr.flush()

    def scan_ac_refine(ci: int, al: int) -> bytes:
        wtr = _BitWriter()
        eobrun = 0
        gbuf: List[int] = []

        def flush_eob():
            nonlocal eobrun, gbuf
            if eobrun:
                nbits = eobrun.bit_length() - 1
                wsym(wtr, ac_table, nbits << 4)
                if nbits:
                    wtr.write(eobrun & ((1 << nbits) - 1), nbits)
                eobrun = 0
                for bit in gbuf:
                    wtr.write(bit, 1)
                gbuf = []

        p1 = 1 << al
        tby, tbx = truedims[ci]
        for m in range(tby * tbx):
            yy, xx = divmod(m, tbx)
            zz = coefs[ci][yy, xx]
            absv = [abs(int(zz[k])) >> al for k in range(64)]
            eobpos = 0
            for k in range(1, 64):
                if absv[k] == 1:
                    eobpos = k
            run = 0
            br: List[int] = []
            for k in range(1, 64):
                t = absv[k]
                if t == 0:
                    run += 1
                    continue
                while run > 15 and k <= eobpos:
                    flush_eob()
                    wsym(wtr, ac_table, 0xF0)
                    run -= 16
                    for bit in br:
                        wtr.write(bit, 1)
                    br = []
                if t > 1:
                    br.append(t & 1)
                    continue
                flush_eob()
                wsym(wtr, ac_table, (run << 4) | 1)
                wtr.write(1 if int(zz[k]) > 0 else 0, 1)
                for bit in br:
                    wtr.write(bit, 1)
                br = []
                run = 0
            if run > 0 or br:
                eobrun += 1
                gbuf.extend(br)
                if eobrun == 0x7FFF:
                    flush_eob()
        flush_eob()
        return wtr.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") \
            + body

    def sos(selectors: List[tuple], ss_: int, se_: int, ah_: int,
            al_: int) -> bytes:
        body = bytes([len(selectors)])
        for cid, td, ta in selectors:
            body += bytes([cid, (td << 4) | ta])
        body += bytes([ss_, se_, (ah_ << 4) | al_])
        return seg(0xDA, body)

    qtbl = np.full(64, quant, np.int64)
    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, bytes([0x00]) + bytes(int(x) for x in qtbl))
    nc = len(planes)
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") \
        + bytes([nc])
    for ci, (hi, vi) in enumerate(samps):
        sof += bytes([ci + 1, (hi << 4) | vi, 0])
    out += seg(0xC2, sof)
    out += seg(0xC4, bytes([0x00]) + bytes(dc_counts) + bytes(dc_syms))
    out += seg(0xC4, bytes([0x10]) + bytes(ac_counts) + bytes(ac_syms))
    allsel = [(ci + 1, 0, 0) for ci in range(nc)]
    out += sos(allsel, 0, 0, 0, 1) + scan_dc_first(1)
    for ci in range(nc):
        out += sos([(ci + 1, 0, 0)], 1, 63, 0, 1) + scan_ac_first(ci, 1)
    out += sos(allsel, 0, 0, 1, 0) + scan_dc_refine(0)
    for ci in range(nc):
        out += sos([(ci + 1, 0, 0)], 1, 63, 1, 0) + scan_ac_refine(ci, 0)
    out += b"\xff\xd9"
    return bytes(out)


_JPEG_SIG = b"\xff\xd8"


# --- baseline TIFF (pure numpy + stdlib): TIFF 6.0 grayscale/RGB strips ---

def _tiff_lzw_decode(data: bytes) -> bytes:
    """TIFF-flavor LZW (TIFF 6.0 §13): MSB-first codes starting at 9
    bits, ClearCode 256 / EOI 257, and the TIFF "early change" — the
    code width bumps one entry EARLIER than GIF's LZW (when the table
    reaches 511/1023/2047 entries), which is why the GIF decoder above
    cannot be reused. Interop-validated against real libtiff-minted
    strips in tests/test_syscodecs.py."""
    CLEAR, EOI = 256, 257
    nbits = len(data) * 8
    bitpos = 0
    padded = data + b"\x00\x00\x00"

    def read(width: int) -> int:
        nonlocal bitpos
        if bitpos + width > nbits:
            return EOI
        byte0 = bitpos >> 3
        v = int.from_bytes(padded[byte0:byte0 + 4], "big")
        v = (v >> (32 - (bitpos & 7) - width)) & ((1 << width) - 1)
        bitpos += width
        return v

    base = [bytes([i]) for i in range(256)] + [b"", b""]
    table = list(base)
    width = 9
    prev = None
    out = bytearray()
    while True:
        code = read(width)
        if code == EOI:
            break
        if code == CLEAR:
            table = list(base)
            width = 9
            prev = None
            continue
        if prev is None:
            if code >= 256:
                raise ValueError("corrupt TIFF LZW stream (bad first code)")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("corrupt TIFF LZW stream (code gap)")
        out += entry
        prev = entry
        # early change: bump when the NEXT entry would hit 2^width
        if len(table) + 1 >= (1 << width) and width < 12:
            width += 1
    return bytes(out)


def _tiff_decode(b: bytes) -> np.ndarray:
    """TIFF 6.0 baseline subset: II/MM byte order, first IFD, 8-bit
    grayscale, RGB or RGBA (ExtraSamples alpha dropped, matching the
    reference's RGBA->RGB load at cli/utils.py:110-114), chunky planar
    config, strip layout, Compression = none (1), Deflate (8/32946) or
    PackBits (32773), horizontal-differencing predictor (tag 317).
    Output (H, W, 3) uint8 RGB (grayscale replicated). Unsupported
    variants raise (in-band error upstream). RGBA leg validated against a
    real libtiff-encoded file (CPython test corpus) in
    tests/test_multimodal.py."""
    b = bytes(b)
    if b[:4] == b"II*\x00":
        end = "little"
    elif b[:4] == b"MM\x00*":
        end = "big"
    else:
        raise ValueError("not a TIFF payload")

    def u(data: bytes) -> int:
        return int.from_bytes(data, end)

    ifd_off = u(b[4:8])
    n_entries = u(b[ifd_off:ifd_off + 2])
    tags: Dict[int, List[int]] = {}
    type_size = {1: 1, 3: 2, 4: 4}
    for i in range(n_entries):
        e = ifd_off + 2 + 12 * i
        tag = u(b[e:e + 2])
        typ = u(b[e + 2:e + 4])
        cnt = u(b[e + 4:e + 8])
        if typ not in type_size:
            continue  # RATIONAL etc. — not needed by the baseline subset
        sz = type_size[typ]
        total = sz * cnt
        valb = b[e + 8:e + 12] if total <= 4 else None
        off = u(b[e + 8:e + 12]) if total > 4 else None
        raw = valb if valb is not None else b[off:off + total]
        tags[tag] = [u(raw[j * sz:(j + 1) * sz]) for j in range(cnt)]
    try:
        w = tags[256][0]
        h = tags[257][0]
        strip_offs = tags[273]
        strip_counts = tags[279]
    except KeyError as e:
        raise ValueError(f"TIFF missing required tag {e}")
    spp = tags.get(277, [1])[0]
    bps = tags.get(258, [8])
    comp = tags.get(259, [1])[0]
    planar = tags.get(284, [1])[0]
    rows_per_strip = tags.get(278, [h])[0]
    if any(x != 8 for x in bps) or spp not in (1, 3, 4) or planar != 1:
        raise ValueError(
            "TIFF decoder supports 8-bit gray/RGB/RGBA chunky only")
    photometric = tags.get(262, [1])[0]
    if spp == 4 and photometric != 2:
        # 4 samples that are NOT RGB+alpha (e.g. Separated/CMYK,
        # photometric 5) must raise, not silently drop the K channel
        raise ValueError(
            f"TIFF spp=4 with photometric {photometric} not supported "
            "(RGB + ExtraSamples alpha only)")
    if comp not in (1, 5, 8, 32773, 32946):
        raise ValueError(f"TIFF compression {comp} not supported "
                         "(none/LZW/PackBits/Deflate only)")
    predictor = tags.get(317, [1])[0]
    if predictor not in (1, 2):
        raise ValueError(f"TIFF predictor {predictor} not supported")

    def unpackbits(data: bytes) -> bytes:
        out = bytearray()
        i = 0
        while i < len(data):
            n = data[i]
            i += 1
            if n < 128:
                out += data[i:i + n + 1]
                i += n + 1
            elif n > 128:
                out += data[i:i + 1] * (257 - n)
                i += 1
            # n == 128: no-op
        return bytes(out)

    pix = bytearray()
    for off, cnt in zip(strip_offs, strip_counts):
        chunk = b[off:off + cnt]
        if comp == 32773:
            pix += unpackbits(chunk)
        elif comp == 5:
            pix += _tiff_lzw_decode(bytes(chunk))
        elif comp in (8, 32946):  # Adobe/legacy Deflate
            import zlib

            pix += zlib.decompress(bytes(chunk))
        else:
            pix += chunk
    need = h * w * spp
    if len(pix) < need:
        raise ValueError("TIFF strip data truncated")
    arr = np.frombuffer(bytes(pix[:need]), np.uint8).reshape(h, w, spp)
    if predictor == 2:  # horizontal differencing: undo per row/channel
        arr = (np.cumsum(arr.astype(np.int64), axis=1)
               & 0xFF).astype(np.uint8)
    if spp == 1:
        return np.repeat(arr, 3, axis=2)
    if spp == 4:
        return arr[:, :, :3].copy()  # drop ExtraSamples alpha
    return arr.copy()


def _tiff_lzw_encode(raw: bytes) -> bytes:
    """TIFF-flavor LZW encoder (mirror of _tiff_lzw_decode): MSB-first
    codes, 9-bit start, early-change width bumps, CLEAR at table-full.
    Greedy longest-match via a dict keyed on (prefix_code, next_byte).
    Interop: output decodes through real libtiff
    (tests/test_syscodecs.py)."""
    CLEAR, EOI = 256, 257
    bits: List[int] = []  # (value, width) flattened as pairs

    def put(code: int, width: int) -> None:
        bits.append((code, width))

    table = {}
    next_code = 258
    width = 9
    put(CLEAR, width)
    prev = -1
    for byte in raw:
        key = (prev, byte)
        cur = table.get(key) if prev >= 0 else byte
        if prev < 0:
            prev = byte
            continue
        if cur is not None:
            prev = cur
            continue
        put(prev, width)
        table[key] = next_code
        next_code += 1
        # width bump in LOCKSTEP with the decoder's early-change rule:
        # the decoder (one learned entry behind) switches when its table
        # hits 2^width - 1 entries, which is the moment the encoder's
        # next_code reaches 2^width
        if next_code == (1 << width) and width < 12:
            width += 1
        if next_code == 4094:  # table nearly full: reset (spec practice)
            put(CLEAR, width)
            table.clear()
            next_code = 258
            width = 9
        prev = byte
    if prev >= 0:
        put(prev, width)
    put(EOI, width)
    out = bytearray()
    acc = 0
    nacc = 0
    for code, w_ in bits:
        acc = (acc << w_) | code
        nacc += w_
        while nacc >= 8:
            out.append((acc >> (nacc - 8)) & 0xFF)
            nacc -= 8
            acc &= (1 << nacc) - 1  # keep acc small (bounded bigint)
    if nacc:
        out.append((acc << (8 - nacc)) & 0xFF)
    return bytes(out)


def encode_tiff(img: np.ndarray, packbits: bool = False,
                lzw: bool = False) -> bytes:
    """Minimal TIFF 6.0 encoder (round-trip counterpart of _tiff_decode):
    little-endian, one strip, 8-bit gray (2-D input) or RGB, optional
    PackBits or LZW. Test scaffolding."""
    gray = img.ndim == 2
    h, w = img.shape[:2]
    spp = 1 if gray else 3
    raw = img.astype(np.uint8).tobytes()
    if lzw:
        data = _tiff_lzw_encode(raw)
        comp = 5
    elif packbits:
        out = bytearray()
        i = 0
        while i < len(raw):
            # literal runs capped at 128; simple encoder: find repeat runs
            j = i
            while j + 1 < len(raw) and raw[j] == raw[j + 1] \
                    and j - i < 127:
                j += 1
            if j > i:  # repeat run of length j-i+1
                out.append(257 - (j - i + 1))
                out.append(raw[i])
                i = j + 1
            else:
                k = i
                while k < len(raw) and k - i < 128 \
                        and not (k + 1 < len(raw) and raw[k] == raw[k + 1]):
                    k += 1
                out.append(k - i - 1)
                out += raw[i:k]
                i = k
        data = bytes(out)
        comp = 32773
    else:
        data = raw
        comp = 1

    entries = []  # (tag, type, count, value_or_offset_bytes)

    def short(v):
        return v.to_bytes(2, "little") + b"\x00\x00"

    def long_(v):
        return v.to_bytes(4, "little")

    # layout: header(8) + entry count(2) + 12*n + next(4) + [bps values] + data
    n = 9
    ifd_size = 2 + 12 * n + 4
    bps_off = 8 + ifd_size
    extra = 6 if not gray else 0  # 3 SHORTs for RGB BitsPerSample
    data_off = bps_off + extra
    entries.append((256, 3, 1, short(w)))
    entries.append((257, 3, 1, short(h)))
    if gray:
        entries.append((258, 3, 1, short(8)))
    else:
        entries.append((258, 3, 3, long_(bps_off)))
    entries.append((259, 3, 1, short(comp)))
    entries.append((262, 3, 1, short(1 if gray else 2)))
    entries.append((273, 4, 1, long_(data_off)))
    entries.append((277, 3, 1, short(spp)))
    entries.append((278, 3, 1, short(h)))
    entries.append((279, 4, 1, long_(len(data))))
    out = bytearray(b"II*\x00" + (8).to_bytes(4, "little"))
    out += len(entries).to_bytes(2, "little")
    for tag, typ, cnt, val in sorted(entries):
        out += tag.to_bytes(2, "little") + typ.to_bytes(2, "little") \
            + cnt.to_bytes(4, "little") + val
    out += b"\x00\x00\x00\x00"  # no next IFD
    if not gray:
        out += (8).to_bytes(2, "little") * 3
    out += data
    return bytes(out)


# --- GIF87a/89a (pure python LZW): single frame, no interlace ---

def _gif_lzw_decode(data: bytes, min_code_size: int, n_pixels: int
                    ) -> bytes:
    """GIF LZW decompression (variable code width, clear/EOI codes)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    table: List[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    width = min_code_size + 1
    acc = 0
    nbits = 0
    prev: Optional[bytes] = None
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                table = [bytes([i]) for i in range(clear)] + [b"", b""]
                width = min_code_size + 1
                prev = None
                continue
            if code == eoi:
                return bytes(out)
            if prev is None:
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):
                entry = prev + prev[:1]
                table.append(entry)
            else:
                raise ValueError("corrupt GIF LZW stream")
            out += entry
            prev = entry
            if len(table) == (1 << width) and width < 12:
                width += 1
            if len(out) >= n_pixels:
                return bytes(out)
    return bytes(out)


def _gif_decode(b: bytes) -> np.ndarray:
    """GIF87a/89a decoder: global/local color table, LZW image data, first
    frame, interlaced or not (the 8/8/4/2 four-pass row order). Output
    (H, W, 3) uint8 RGB."""
    b = bytes(b)
    if b[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    flags = b[10]
    gct_size = 2 << (flags & 7) if flags & 0x80 else 0
    pos = 13
    gct = np.frombuffer(b[pos:pos + 3 * gct_size], np.uint8) \
        .reshape(-1, 3) if gct_size else None
    pos += 3 * gct_size
    while pos < len(b):
        block = b[pos]
        if block == 0x21:  # extension: label + sub-blocks
            pos += 2
            while b[pos] != 0:
                pos += 1 + b[pos]
            pos += 1
        elif block == 0x2C:  # image descriptor
            w = int.from_bytes(b[pos + 5:pos + 7], "little")
            h = int.from_bytes(b[pos + 7:pos + 9], "little")
            iflags = b[pos + 9]
            pos += 10
            pal = gct
            if iflags & 0x80:
                lct_size = 2 << (iflags & 7)
                pal = np.frombuffer(b[pos:pos + 3 * lct_size], np.uint8) \
                    .reshape(-1, 3)
                pos += 3 * lct_size
            if pal is None:
                raise ValueError("GIF frame has no color table")
            min_code = b[pos]
            pos += 1
            data = bytearray()
            while b[pos] != 0:
                n = b[pos]
                data += b[pos + 1:pos + 1 + n]
                pos += 1 + n
            pos += 1
            idx = np.frombuffer(
                _gif_lzw_decode(bytes(data), min_code, w * h), np.uint8)
            if len(idx) < w * h:
                raise ValueError("GIF pixel data truncated")
            grid = idx[:w * h].astype(np.int64).reshape(h, w)
            if iflags & 0x40:  # interlaced: rows stored in the 4 passes
                order = np.concatenate([np.arange(0, h, 8),
                                        np.arange(4, h, 8),
                                        np.arange(2, h, 4),
                                        np.arange(1, h, 2)])
                deint = np.empty_like(grid)
                deint[order] = grid
                grid = deint
            return pal[grid].copy()
        elif block == 0x3B:  # trailer
            break
        else:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
    raise ValueError("GIF has no image frame")


def _gif_lzw_encode(indices: np.ndarray, min_code: int) -> bytes:
    """GIF-flavor LZW compression of a palette-index stream (LSB-first
    packing, clear/EOI codes, width grows AFTER next_code passes
    2^width — one later than TIFF's early change). Shared by the still
    and animated encoders."""
    clear = 1 << min_code
    eoi = clear + 1
    codes: List[int] = [clear]
    table: Dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    width = min_code + 1
    widths: List[int] = [width]
    cur = b""
    for v in indices.astype(np.uint8).tobytes():
        nxt = cur + bytes([v])
        if nxt in table:
            cur = nxt
            continue
        codes.append(table[cur])
        widths.append(width)
        table[nxt] = next_code
        next_code += 1
        if next_code > (1 << width) and width < 12:
            width += 1
        if next_code == 4096:  # table full: emit clear, reset
            codes.append(clear)
            widths.append(width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code + 1
        cur = bytes([v])
    if cur:
        codes.append(table[cur])
        widths.append(width)
    codes.append(eoi)
    widths.append(width)
    acc = 0
    nbits = 0
    packed = bytearray()
    for c, cw in zip(codes, widths):
        acc |= c << nbits
        nbits += cw
        while nbits >= 8:
            packed.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        packed.append(acc & 0xFF)
    return bytes(packed)


def _gif_decode_frames(b: bytes) -> List[np.ndarray]:
    """FULL animated-GIF decode (GIF89a animation model): every frame
    composited onto the logical screen with graphics-control semantics —
    transparency index (transparent pixels leave the canvas as-is),
    disposal 0/1 (leave), 2 (restore region to background), 3 (restore
    to previous canvas), sub-rectangle frames, per-frame local palettes
    and per-frame interlace. Returns a list of (H, W, 3) uint8 RGB
    canvases, one per frame. ``_gif_decode`` above stays the
    still-image (first raster) path; this is the video-container path
    RealCodec.decode_video_frames routes GIF payloads through."""
    b = bytes(b)
    if b[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    sw = int.from_bytes(b[6:8], "little")
    sh = int.from_bytes(b[8:10], "little")
    flags = b[10]
    bg_index = b[11]
    gct_size = 2 << (flags & 7) if flags & 0x80 else 0
    pos = 13
    gct = np.frombuffer(b[pos:pos + 3 * gct_size], np.uint8) \
        .reshape(-1, 3) if gct_size else None
    pos += 3 * gct_size
    bg_rgb = gct[bg_index] if gct is not None and bg_index < len(gct) \
        else np.zeros(3, np.uint8)
    canvas = np.broadcast_to(bg_rgb, (sh, sw, 3)).astype(np.uint8).copy()
    frames: List[np.ndarray] = []
    disposal = 0
    transparent = -1
    while pos < len(b):
        block = b[pos]
        if block == 0x21:
            label = b[pos + 1]
            pos += 2
            if label == 0xF9 and b[pos] >= 4:  # graphics control
                packed = b[pos + 1]
                disposal = (packed >> 2) & 7
                transparent = b[pos + 4] if packed & 1 else -1
            while b[pos] != 0:
                pos += 1 + b[pos]
            pos += 1
        elif block == 0x2C:
            fx = int.from_bytes(b[pos + 1:pos + 3], "little")
            fy = int.from_bytes(b[pos + 3:pos + 5], "little")
            w = int.from_bytes(b[pos + 5:pos + 7], "little")
            h = int.from_bytes(b[pos + 7:pos + 9], "little")
            iflags = b[pos + 9]
            pos += 10
            pal = gct
            if iflags & 0x80:
                lct_size = 2 << (iflags & 7)
                pal = np.frombuffer(b[pos:pos + 3 * lct_size], np.uint8) \
                    .reshape(-1, 3)
                pos += 3 * lct_size
            if pal is None:
                raise ValueError("GIF frame has no color table")
            min_code = b[pos]
            pos += 1
            data = bytearray()
            while b[pos] != 0:
                n = b[pos]
                data += b[pos + 1:pos + 1 + n]
                pos += 1 + n
            pos += 1
            idx = np.frombuffer(
                _gif_lzw_decode(bytes(data), min_code, w * h), np.uint8)
            if len(idx) < w * h:
                raise ValueError("GIF pixel data truncated")
            grid = idx[:w * h].astype(np.int64).reshape(h, w)
            if iflags & 0x40:
                order = np.concatenate([np.arange(0, h, 8),
                                        np.arange(4, h, 8),
                                        np.arange(2, h, 4),
                                        np.arange(1, h, 2)])
                deint = np.empty_like(grid)
                deint[order] = grid
                grid = deint
            if fx + w > sw or fy + h > sh:
                raise ValueError("GIF frame exceeds logical screen")
            prev = canvas.copy() if disposal == 3 else None
            region = canvas[fy:fy + h, fx:fx + w]
            if transparent >= 0:
                opaque = grid != transparent
                region[opaque] = pal[grid[opaque]]
            else:
                region[:] = pal[grid]
            frames.append(canvas.copy())
            if disposal == 2:
                canvas[fy:fy + h, fx:fx + w] = bg_rgb
            elif disposal == 3:
                canvas = prev
            disposal = 0
            transparent = -1
        elif block == 0x3B:
            break
        else:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
    if not frames:
        raise ValueError("GIF has no image frame")
    return frames


def encode_gif_anim(frames: List[np.ndarray],
                    disposals: Optional[List[int]] = None,
                    transparent_masks: Optional[List] = None,
                    offsets: Optional[List] = None,
                    screen: Optional[tuple] = None) -> bytes:
    """Minimal ANIMATED GIF encoder (test scaffolding for the frame
    decoder): one shared global palette built from every frame's colors
    plus a reserved transparent slot; per-frame graphics-control
    extension (disposal + transparency), sub-rectangle placement via
    ``offsets``, full LZW coding. Frames may be smaller than the
    logical ``screen``; masked-True pixels are written as the
    transparent index."""
    if not frames:
        raise ValueError("no frames")
    disposals = disposals or [1] * len(frames)
    offsets = offsets or [(0, 0)] * len(frames)
    sh, sw = screen or frames[0].shape[:2]
    allpx = np.concatenate([f.reshape(-1, 3) for f in frames])
    pal, _ = np.unique(allpx, axis=0, return_inverse=True)
    if len(pal) > 255:
        raise ValueError("more than 255 distinct colors (one slot is "
                         "reserved for transparency)")
    trans_idx = len(pal)
    ncol = 2
    while ncol < trans_idx + 1:
        ncol *= 2
    depth = max(1, (ncol - 1).bit_length())
    out = bytearray()
    out += b"GIF89a"
    out += sw.to_bytes(2, "little") + sh.to_bytes(2, "little")
    out += bytes([0x80 | (depth - 1), 0, 0])
    table = np.zeros((ncol, 3), np.uint8)
    table[:len(pal)] = pal
    out += table.tobytes()
    lut = {tuple(c): i for i, c in enumerate(pal)}
    for k, frame in enumerate(frames):
        fh, fw = frame.shape[:2]
        fy, fx = offsets[k]
        mask = None if transparent_masks is None else transparent_masks[k]
        packed = (disposals[k] & 7) << 2
        if mask is not None:
            packed |= 1
        out += bytes([0x21, 0xF9, 4, packed, 0, 0,
                      trans_idx if mask is not None else 0, 0])
        out += bytes([0x2C])
        out += fx.to_bytes(2, "little") + fy.to_bytes(2, "little")
        out += fw.to_bytes(2, "little") + fh.to_bytes(2, "little")
        out += bytes([0])  # no local table, not interlaced
        idx = np.array([lut[tuple(p)] for p in frame.reshape(-1, 3)],
                       np.int64)
        if mask is not None:
            idx[np.asarray(mask).reshape(-1)] = trans_idx
        min_code = max(2, depth)
        out += bytes([min_code])
        lzw = _gif_lzw_encode(idx, min_code)
        i = 0
        while i < len(lzw):
            n = min(255, len(lzw) - i)
            out += bytes([n]) + lzw[i:i + n]
            i += n
        out += bytes([0])
    out += bytes([0x3B])
    return bytes(out)


def encode_gif(img: np.ndarray) -> bytes:
    """Minimal GIF89a encoder (round-trip counterpart of _gif_decode):
    single non-interlaced frame, global color table built from the image's
    unique colors (must be <= 256), real LZW compression."""
    h, w = img.shape[:2]
    flat = img.astype(np.uint8).reshape(-1, 3)
    colors, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(colors) > 256:
        raise ValueError("encode_gif supports <= 256 unique colors")
    bits = max(1, int(len(colors) - 1).bit_length())
    table_size = 1 << bits
    pal = np.zeros((table_size, 3), np.uint8)
    pal[:len(colors)] = colors
    min_code = max(2, bits)
    packed = bytearray(_gif_lzw_encode(inverse.astype(np.int64), min_code))

    out = bytearray(b"GIF89a")
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out += bytes([0x80 | (bits - 1), 0, 0])  # GCT present, size 2^bits
    out += pal.tobytes()
    out += b"\x2C" + b"\x00" * 4 + w.to_bytes(2, "little") \
        + h.to_bytes(2, "little") + b"\x00"
    out += bytes([min_code])
    for i in range(0, len(packed), 255):
        chunk = packed[i:i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3B"
    return bytes(out)


# --- WebP lossless (VP8L) ----------------------------------------------
# Public spec: "WebP Lossless Bitstream Specification" (RFC 9649 §3 /
# developers.google.com/speed/webp/docs/webp_lossless_bitstream_specification).
# Decoder covers the general stream: simple + normal prefix codes
# (code-length codes, 16/17/18 repeats, max_symbol, degenerate
# single-symbol 0-bit codes), color cache, meta prefix codes, LZ77
# back-references, and all four transforms (predictor, color,
# subtract-green, color-indexing incl. sub-byte pixel packing). The one
# deliberate gap: short-distance-map back-refs (dist_code <= 120) raise —
# the 120-entry neighbor table is a verbatim spec constant this
# from-scratch build does not reproduce from memory; plain distances
# (dist_code > 120) are fully supported and the in-repo encoder emits no
# back-refs at all.

_VP8L_CODE_LENGTH_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 16,
                           6, 7, 8, 9, 10, 11, 12, 13, 14, 15]


class _LsbReader:
    """LSB-first bit reader (VP8L convention)."""

    def __init__(self, data: bytes):
        self.data = data
        self.bitpos = 0

    def read(self, n: int) -> int:
        v = 0
        for i in range(n):
            p = self.bitpos + i
            byte = self.data[p >> 3] if (p >> 3) < len(self.data) else 0
            v |= ((byte >> (p & 7)) & 1) << i
        self.bitpos += n
        return v

    def read_code(self, table) -> int:
        if "single" in table:
            return table["single"]
        code = 0
        for ln in range(1, 16):
            p = self.bitpos
            byte = self.data[p >> 3] if (p >> 3) < len(self.data) else 0
            self.bitpos += 1
            code = (code << 1) | ((byte >> (p & 7)) & 1)
            sym = table.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("invalid VP8L prefix code")


def _vp8l_table(lengths: List[int]):
    """Canonical prefix decode table from code lengths (DEFLATE
    convention): {(len, code): sym}; a single used symbol degenerates to a
    0-bit code {'single': sym}."""
    nz = [(ln, s) for s, ln in enumerate(lengths) if ln > 0]
    if not nz:
        raise ValueError("empty VP8L prefix code")
    if len(nz) == 1:
        return {"single": nz[0][1]}
    bl_count: Dict[int, int] = {}
    for ln, _ in nz:
        bl_count[ln] = bl_count.get(ln, 0) + 1
    code = 0
    next_code = {}
    for ln in range(1, max(bl_count) + 1):
        code = (code + bl_count.get(ln - 1, 0)) << 1
        next_code[ln] = code
    table = {}
    for ln, s in sorted(nz):
        table[(ln, next_code[ln])] = s
        next_code[ln] += 1
    return table


def _vp8l_read_prefix_code(br: _LsbReader, alphabet: int):
    """One prefix code: simple (1-2 symbols) or normal (code-length coded)."""
    if br.read(1):  # simple
        num_symbols = br.read(1) + 1
        first_8bit = br.read(1)
        sym0 = br.read(8 if first_8bit else 1)
        if num_symbols == 2:
            sym1 = br.read(8)
            lengths = [0] * alphabet
            lengths[sym0] = 1
            lengths[sym1] = 1
            return _vp8l_table(lengths)
        return {"single": sym0}
    num_code_lengths = 4 + br.read(4)
    cl_lengths = [0] * 19
    for i in range(num_code_lengths):
        cl_lengths[_VP8L_CODE_LENGTH_ORDER[i]] = br.read(3)
    cl_table = _vp8l_table(cl_lengths)
    max_symbol = alphabet
    if br.read(1):  # use length / max_symbol
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    lengths = [0] * alphabet
    prev_len = 8
    sym = 0
    while sym < alphabet:
        if max_symbol <= 0:
            break
        max_symbol -= 1
        cl = br.read_code(cl_table)
        if cl < 16:
            lengths[sym] = cl
            sym += 1
            if cl != 0:
                prev_len = cl
        elif cl == 16:
            n = 3 + br.read(2)
            for _ in range(n):
                if sym >= alphabet:
                    break
                lengths[sym] = prev_len
                sym += 1
        elif cl == 17:
            sym += 3 + br.read(3)
        else:  # 18
            sym += 11 + br.read(7)
    return _vp8l_table(lengths)


def _vp8l_copy_val(sym: int, br: _LsbReader) -> int:
    if sym < 4:
        return sym + 1
    extra = (sym - 2) >> 1
    offset = (2 + (sym & 1)) << extra
    return offset + br.read(extra) + 1


def _vp8l_sub(size: int, bits: int) -> int:
    return (size + (1 << bits) - 1) >> bits


def _vp8l_dist_map() -> list:
    """The spec's 120-entry short-distance neighbor map (WebP lossless
    bitstream spec, 'Decoding of Distances'): dist_codes 1..120 address
    nearby PIXELS rather than scan-line distances. The map is generated,
    not transcribed: all (dx, dy) with dy in 0..7, dx in -7..8 (dy == 0
    restricted to dx >= 1), enumerated by increasing squared distance,
    larger dy first within a tie, positive dx before its negative."""
    cand = [(dx, dy) for dy in range(8) for dx in range(-7, 9)
            if dy > 0 or dx >= 1]
    cand.sort(key=lambda p: (p[0] * p[0] + p[1] * p[1], -p[1], p[0] < 0))
    return cand


_VP8L_DIST_MAP = _vp8l_dist_map()


def _vp8l_decode_image(br: _LsbReader, w: int, h: int,
                       is_level0: bool) -> np.ndarray:
    """DecodeImageStream: returns (h*w,) uint32 ARGB pixels."""
    transforms = []
    xsize = w
    if is_level0:
        seen = set()
        while br.read(1):
            ttype = br.read(2)
            if ttype in seen:
                raise ValueError("duplicate VP8L transform")
            seen.add(ttype)
            if ttype == 0:  # predictor
                bits = br.read(3) + 2
                img = _vp8l_decode_image(
                    br, _vp8l_sub(xsize, bits), _vp8l_sub(h, bits), False)
                transforms.append(("predictor", bits, img))
            elif ttype == 1:  # color
                bits = br.read(3) + 2
                img = _vp8l_decode_image(
                    br, _vp8l_sub(xsize, bits), _vp8l_sub(h, bits), False)
                transforms.append(("color", bits, img))
            elif ttype == 2:
                transforms.append(("subtract_green",))
            else:  # color indexing
                n_colors = br.read(8) + 1
                pal = _vp8l_decode_image(br, n_colors, 1, False)
                # palette pixels are component-wise delta-coded
                pal = _vp8l_palette_cumsum(pal)
                if n_colors <= 2:
                    wbits = 3
                elif n_colors <= 4:
                    wbits = 2
                elif n_colors <= 16:
                    wbits = 1
                else:
                    wbits = 0
                transforms.append(("palette", wbits, pal, xsize))
                xsize = _vp8l_sub(xsize, wbits)

    cache_bits = 0
    if br.read(1):
        cache_bits = br.read(4)
        if not (1 <= cache_bits <= 11):
            raise ValueError("invalid VP8L color-cache size")
    cache_size = (1 << cache_bits) if cache_bits else 0

    meta = None
    meta_bits = 0
    n_groups = 1
    if is_level0 and br.read(1):
        meta_bits = br.read(3) + 2
        mw, mh = _vp8l_sub(xsize, meta_bits), _vp8l_sub(h, meta_bits)
        meta_img = _vp8l_decode_image(br, mw, mh, False)
        meta = ((meta_img >> 8) & 0xFFFF).astype(np.int64)  # red<<8|green
        n_groups = int(meta.max()) + 1 if len(meta) else 1
        meta_w = mw
    groups = []
    for _ in range(n_groups):
        alph = [256 + 24 + cache_size, 256, 256, 256, 40]
        groups.append([_vp8l_read_prefix_code(br, a) for a in alph])

    out = np.zeros(xsize * h, dtype=np.uint32)
    cache = [0] * cache_size
    pos = 0
    total = xsize * h
    g = groups[0]
    while pos < total:
        x = pos % xsize
        y = pos // xsize
        if meta is not None:
            gi = int(meta[(y >> meta_bits) * meta_w + (x >> meta_bits)])
            g = groups[gi]
        elif n_groups == 1:
            g = groups[0]
        s = br.read_code(g[0])
        if s < 256:
            red = br.read_code(g[1])
            blue = br.read_code(g[2])
            alpha = br.read_code(g[3])
            px = (alpha << 24) | (red << 16) | (s << 8) | blue
            out[pos] = px
            if cache_size:
                cache[(0x1E35A7BD * px) % (1 << 32) >> (32 - cache_bits)] \
                    = px
            pos += 1
        elif s < 256 + 24:
            length = _vp8l_copy_val(s - 256, br)
            dist_sym = br.read_code(g[4])
            dist_code = _vp8l_copy_val(dist_sym, br)
            if dist_code > 120:
                dist = dist_code - 120
            else:
                ddx, ddy = _VP8L_DIST_MAP[dist_code - 1]
                dist = ddy * xsize + ddx
                if dist < 1:
                    dist = 1
            if dist > pos:
                raise ValueError("VP8L back-ref beyond start")
            for _ in range(length):
                px = int(out[pos - dist])
                out[pos] = px
                if cache_size:
                    cache[(0x1E35A7BD * px) % (1 << 32)
                          >> (32 - cache_bits)] = px
                pos += 1
                if pos >= total:
                    break
        else:
            out[pos] = cache[s - 256 - 24]
            pos += 1

    if not is_level0:
        return out

    argb = out
    width = xsize
    for t in reversed(transforms):
        if t[0] == "palette":
            _, wbits, pal, full_w = t
            if wbits > 0:
                idx = ((argb >> 8) & 0xFF).reshape(h, width)
                per = 1 << wbits        # indices packed per green byte
                ibits = 8 >> wbits      # bits per index
                cols = []
                for k in range(per):
                    cols.append((idx >> (k * ibits)) & ((1 << ibits) - 1))
                wide = np.stack(cols, axis=2).reshape(h, width * per)
                wide = wide[:, :full_w]
                flat = wide.reshape(-1).astype(np.int64)
            else:
                flat = ((argb >> 8) & 0xFF).astype(np.int64)
                full_w = width
            safe = np.clip(flat, 0, len(pal) - 1)
            px = pal[safe]
            px = np.where(flat < len(pal), px, np.uint32(0))
            argb = px.astype(np.uint32)
            width = full_w
        elif t[0] == "subtract_green":
            gch = (argb >> 8) & 0xFF
            r = (((argb >> 16) & 0xFF) + gch) & 0xFF
            b = ((argb & 0xFF) + gch) & 0xFF
            argb = (argb & np.uint32(0xFF00FF00)) | (r << 16) | b
        elif t[0] == "color":
            _, bits, timg = t
            tw = _vp8l_sub(width, bits)
            a = argb.reshape(h, width)
            ys, xs = np.mgrid[0:h, 0:width]
            te = timg[(ys >> bits) * tw + (xs >> bits)]
            g2r = ((te & 0xFF).astype(np.int64) ^ 0x80) - 0x80
            g2b = (((te >> 8) & 0xFF).astype(np.int64) ^ 0x80) - 0x80
            r2b = (((te >> 16) & 0xFF).astype(np.int64) ^ 0x80) - 0x80
            gs = (((a >> 8) & 0xFF).astype(np.int64) ^ 0x80) - 0x80
            r = ((a >> 16) & 0xFF).astype(np.int64)
            r = (r + ((g2r * gs) >> 5)) & 0xFF
            rs = (r ^ 0x80) - 0x80
            b = (a & 0xFF).astype(np.int64)
            b = (b + ((g2b * gs) >> 5) + ((r2b * rs) >> 5)) & 0xFF
            res = (a & np.uint32(0xFF00FF00)) | \
                (r.astype(np.uint32) << 16) | b.astype(np.uint32)
            argb = res.reshape(-1)
        elif t[0] == "predictor":
            _, bits, pimg = t
            argb = _vp8l_unpredict(argb, h, width, bits, pimg)
    return argb


def _vp8l_palette_cumsum(pal: np.ndarray) -> np.ndarray:
    """Palette entries are stored component-delta-coded (each channel adds
    the previous entry's channel, mod 256)."""
    comps = np.stack([(pal >> s) & 0xFF for s in (24, 16, 8, 0)], axis=1)
    acc = np.cumsum(comps.astype(np.int64), axis=0) & 0xFF
    return ((acc[:, 0] << 24) | (acc[:, 1] << 16) |
            (acc[:, 2] << 8) | acc[:, 3]).astype(np.uint32)


def _vp8l_avg2(a: int, b: int) -> int:
    return (((a ^ b) & 0xFEFEFEFE) >> 1) + (a & b)


def _vp8l_add_px(a: int, b: int) -> int:
    s = 0
    for sh in (0, 8, 16, 24):
        s |= ((((a >> sh) & 0xFF) + ((b >> sh) & 0xFF)) & 0xFF) << sh
    return s


def _vp8l_unpredict(argb: np.ndarray, h: int, w: int, bits: int,
                    pimg: np.ndarray) -> np.ndarray:
    """Inverse predictor transform (14 modes) — inherently sequential in
    the scan order (each pixel depends on reconstructed neighbors); kept
    as a plain loop, acceptable for the page-image sizes this store holds."""
    tw = _vp8l_sub(w, bits)
    out = argb.astype(np.int64).reshape(h, w)

    def clamp_add_sub_full(c, l, tl):
        v = 0
        for sh in (0, 8, 16, 24):
            x = ((c >> sh) & 0xFF) + ((l >> sh) & 0xFF) - ((tl >> sh) & 0xFF)
            v |= max(0, min(255, x)) << sh
        return v

    def select(l, t, tl):
        p_alpha = ((l >> 24) & 0xFF) + ((t >> 24) & 0xFF) - ((tl >> 24) & 0xFF)
        p_red = ((l >> 16) & 0xFF) + ((t >> 16) & 0xFF) - ((tl >> 16) & 0xFF)
        p_green = ((l >> 8) & 0xFF) + ((t >> 8) & 0xFF) - ((tl >> 8) & 0xFF)
        p_blue = (l & 0xFF) + (t & 0xFF) - (tl & 0xFF)
        pl = abs(p_alpha - ((l >> 24) & 0xFF)) + abs(p_red - ((l >> 16) & 0xFF)) \
            + abs(p_green - ((l >> 8) & 0xFF)) + abs(p_blue - (l & 0xFF))
        pt = abs(p_alpha - ((t >> 24) & 0xFF)) + abs(p_red - ((t >> 16) & 0xFF)) \
            + abs(p_green - ((t >> 8) & 0xFF)) + abs(p_blue - (t & 0xFF))
        return l if pl < pt else t

    for y in range(h):
        for x in range(w):
            if x == 0 and y == 0:
                pred = 0xFF000000
            elif y == 0:
                pred = int(out[0, x - 1])
            elif x == 0:
                pred = int(out[y - 1, 0])
            else:
                mode = int((pimg[(y >> bits) * tw + (x >> bits)] >> 8) & 0xFF)
                L = int(out[y, x - 1])
                T = int(out[y - 1, x])
                TL = int(out[y - 1, x - 1])
                # libwebp quirk: TR at the last column wraps to the
                # CURRENT row's first (already reconstructed) pixel
                TR = int(out[y - 1, x + 1]) if x + 1 < w else int(out[y, 0])
                if mode == 0:
                    pred = 0xFF000000
                elif mode == 1:
                    pred = L
                elif mode == 2:
                    pred = T
                elif mode == 3:
                    pred = TR
                elif mode == 4:
                    pred = TL
                elif mode == 5:
                    pred = _vp8l_avg2(_vp8l_avg2(L, TR), T)
                elif mode == 6:
                    pred = _vp8l_avg2(L, TL)
                elif mode == 7:
                    pred = _vp8l_avg2(L, T)
                elif mode == 8:
                    pred = _vp8l_avg2(TL, T)
                elif mode == 9:
                    pred = _vp8l_avg2(T, TR)
                elif mode == 10:
                    pred = _vp8l_avg2(_vp8l_avg2(L, TL), _vp8l_avg2(T, TR))
                elif mode == 11:
                    pred = select(L, T, TL)
                elif mode == 12:
                    pred = clamp_add_sub_full(L, T, TL)
                else:
                    pred = clamp_add_sub_half_13(L, T, TL)
            out[y, x] = _vp8l_add_px(int(out[y, x]), pred)
    return out.reshape(-1).astype(np.uint32)


def clamp_add_sub_half_13(L: int, T: int, TL: int) -> int:
    """Predictor 13: ClampAddSubtractHalf(Average2(L, T), TL)."""
    ave = _vp8l_avg2(L, T)
    v = 0
    for sh in (0, 8, 16, 24):
        a = (ave >> sh) & 0xFF
        x = a + (a - ((TL >> sh) & 0xFF)) // 2
        v |= max(0, min(255, x)) << sh
    return v


def _webp_decode(b: bytes) -> np.ndarray:
    """WebP container -> RGB array. Lossless (VP8L) decodes on the
    from-scratch path below; lossy VP8 (the full RFC 6386 intra decoder)
    routes through the system libwebp via the dlopen-guarded ctypes
    adapter (stages/syscodecs.py) — same pattern as the import-guarded
    OCR-engine adapters — and raises NotImplementedError only when that
    shared library is absent."""
    if b[:4] != b"RIFF" or b[8:12] != b"WEBP":
        raise ValueError("not a WebP file")
    pos = 12
    payload = None
    while pos + 8 <= len(b):
        cid = b[pos:pos + 4]
        size = int.from_bytes(b[pos + 4:pos + 8], "little")
        if cid == b"VP8L":
            payload = b[pos + 8:pos + 8 + size]
            break
        if cid == b"VP8 ":
            from . import syscodecs
            return syscodecs.webp_decode_rgb(bytes(b))
        pos += 8 + size + (size & 1)
    if payload is None:
        raise ValueError("no VP8L chunk in WebP file")
    if payload[0] != 0x2F:
        raise ValueError("bad VP8L signature")
    br = _LsbReader(payload[1:])
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read(1)  # alpha hint
    if br.read(3) != 0:
        raise ValueError("unknown VP8L version")
    argb = _vp8l_decode_image(br, w, h, True).reshape(h, w)
    rgb = np.stack([(argb >> 16) & 0xFF, (argb >> 8) & 0xFF,
                    argb & 0xFF], axis=2).astype(np.uint8)
    return rgb


class _LsbWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, value: int, n: int) -> None:  # LSB-first
        for i in range(n):
            self.acc |= ((value >> i) & 1) << self.nbits
            self.nbits += 1
            if self.nbits == 8:
                self.buf.append(self.acc)
                self.acc = 0
                self.nbits = 0

    def put_code(self, code: int, n: int) -> None:  # prefix code MSB-first
        for i in range(n - 1, -1, -1):
            self.put((code >> i) & 1, 1)

    def getvalue(self) -> bytes:
        if self.nbits:
            self.buf.append(self.acc)
            self.acc = 0
            self.nbits = 0
        return bytes(self.buf)


def _put_two_len_code(bw: "_LsbWriter", sym_a: int, sym_b: int) -> None:
    """Normal prefix code whose code-length code holds the two length
    symbols sym_a (code 0) and sym_b (code 1), each at length 1."""
    order = _VP8L_CODE_LENGTH_ORDER
    n = max(order.index(sym_a), order.index(sym_b)) + 1
    bw.put(0, 1)            # normal (not simple)
    bw.put(n - 4, 4)        # num_code_lengths
    for i in range(n):
        bw.put(1 if order[i] in (sym_a, sym_b) else 0, 3)
    bw.put(0, 1)            # no max_symbol


def _put_single_len_code(bw: "_LsbWriter", sym: int) -> None:
    order = _VP8L_CODE_LENGTH_ORDER
    n = order.index(sym) + 1
    bw.put(0, 1)
    bw.put(n - 4, 4)
    for i in range(n):
        bw.put(1 if order[i] == sym else 0, 3)
    bw.put(0, 1)


def _put_literal_codes(bw: "_LsbWriter", cache_size: int) -> None:
    """One prefix-code group with FIXED Kraft-complete code lengths:
    green 256+24+cache split two-level (x @8 + rest @9 with
    x = 512 - alphabet), uniform-8 red/blue/alpha via degenerate
    single-symbol code-length codes, distance 24 @5 + 16 @6."""
    galph = 280 + cache_size
    n8 = 512 - galph
    _put_two_len_code(bw, 8, 9)
    for s in range(galph):
        bw.put(0 if s < n8 else 1, 1)
    for _ in range(3):
        _put_single_len_code(bw, 8)
    _put_two_len_code(bw, 5, 6)
    for s in range(40):
        bw.put(0 if s < 24 else 1, 1)


def _green_code(sym: int, cache_size: int):
    """Canonical (code, nbits) for the fixed green layout above."""
    galph = 280 + cache_size
    n8 = 512 - galph
    if sym < n8:
        return sym, 8
    return 2 * n8 + (sym - n8), 9


def _vp8l_len_sym(length: int):
    """Inverse of _vp8l_copy_val for encoder-sized lengths:
    (sym, extra_bits, extra_value)."""
    if length <= 4:
        return length - 1, 0, 0
    for sym in range(4, 24):
        extra = (sym - 2) >> 1
        offset = (2 + (sym & 1)) << extra
        if offset + 1 <= length <= offset + (1 << extra):
            return sym, extra, length - offset - 1
    raise ValueError("length too large for this encoder")


def _put_pixels(bw: "_LsbWriter", argb_flat: np.ndarray, cache_bits: int,
                rle: bool) -> None:
    """Emit an ARGB pixel stream as literals, optionally folding runs of
    the previous pixel into dist=1 back-refs (rle) and emitting
    color-cache hits (cache_bits > 0) — each option exercises the
    corresponding decoder path."""
    cache_size = (1 << cache_bits) if cache_bits else 0
    cache = [None] * cache_size

    def cache_key(px: int) -> int:
        return (0x1E35A7BD * px) % (1 << 32) >> (32 - cache_bits)

    i = 0
    n = len(argb_flat)
    while i < n:
        px = int(argb_flat[i])
        if rle and i > 0 and px == int(argb_flat[i - 1]):
            run = 1
            while i + run < n and int(argb_flat[i + run]) == px:
                run += 1
            rem = run
            while rem:
                seg = min(rem, 24)
                sym, extra_bits, extra = _vp8l_len_sym(seg)
                c, nn = _green_code(256 + sym, cache_size)
                bw.put_code(c, nn)
                if extra_bits:
                    bw.put(extra, extra_bits)
                # dist_code 121 -> dist 1: copy_val(13) + 5 extra bits = 24
                bw.put_code(13, 5)
                bw.put(24, 5)
                rem -= seg
            if cache_size:
                cache[cache_key(px)] = px
            i += run
            continue
        if cache_size:
            key = cache_key(px)
            if cache[key] == px:
                c, nn = _green_code(280 + key, cache_size)
                bw.put_code(c, nn)
                i += 1
                continue
            cache[key] = px
        c, nn = _green_code((px >> 8) & 0xFF, cache_size)
        bw.put_code(c, nn)
        bw.put_code((px >> 16) & 0xFF, 8)
        bw.put_code(px & 0xFF, 8)
        bw.put_code((px >> 24) & 0xFF, 8)
        i += 1


def encode_webp_lossless(img: np.ndarray, subtract_green: bool = False,
                         cache_bits: int = 0, rle: bool = False,
                         meta: bool = False) -> bytes:
    """Minimal VP8L encoder (round-trip counterpart of _webp_decode, same
    pattern as encode_jpeg): one prefix-code group with fixed
    Kraft-complete code lengths; optional subtract-green transform, color
    cache, dist=1 run-length back-refs and a single-group meta prefix
    image — each flag exists to exercise the matching decoder path in
    round-trip tests. Test scaffolding, not a production encoder."""
    if img.ndim == 2:
        img = np.stack([img] * 3, axis=2)
    h, w = img.shape[:2]
    rgb = img.astype(np.int64)
    r, gch, b = rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2]
    if subtract_green:
        r = (r - gch) & 0xFF
        b = (b - gch) & 0xFF
    argb = ((np.int64(255) << 24) | (r << 16) | (gch << 8) | b) \
        .astype(np.uint32).reshape(-1)

    bw = _LsbWriter()
    bw.put(w - 1, 14)
    bw.put(h - 1, 14)
    bw.put(0, 1)   # no alpha
    bw.put(0, 3)   # version
    if subtract_green:
        bw.put(1, 1)
        bw.put(2, 2)   # transform type: subtract green (no payload)
    bw.put(0, 1)   # no more transforms
    if cache_bits:
        bw.put(1, 1)
        bw.put(cache_bits, 4)
    else:
        bw.put(0, 1)
    if meta:
        # meta prefix image: constant group 0 at 4x4 blocks (one group)
        bw.put(1, 1)
        bw.put(0, 3)   # huffman_subsample_bits = 2
        mw, mh = _vp8l_sub(w, 2), _vp8l_sub(h, 2)
        bw.put(0, 1)   # sub-image: no color cache
        _put_literal_codes(bw, 0)
        _put_pixels(bw, np.zeros(mw * mh, np.uint32), 0, False)
    else:
        bw.put(0, 1)
    _put_literal_codes(bw, (1 << cache_bits) if cache_bits else 0)
    _put_pixels(bw, argb, cache_bits, rle)

    payload = b"\x2f" + bw.getvalue()
    chunk = b"VP8L" + len(payload).to_bytes(4, "little") + payload
    if len(payload) & 1:
        chunk += b"\x00"
    riff = b"WEBP" + chunk
    return b"RIFF" + len(riff).to_bytes(4, "little") + riff


class RealCodec(Codec):
    """Production codec seam. PNG (all spec depths 1-16, Adam7), JPEG
    (sequential AND progressive), TIFF (8-bit strips,
    none/LZW/PackBits/Deflate, predictor, RGBA), GIF (LZW, interlaced) and
    lossless WebP (VP8L, incl. the short-distance neighbor map) decode
    FOR REAL (pure numpy + stdlib) — the reference's PIL image surface
    (cli/utils.py:98-117). Lossy-VP8 WebP decodes through the system
    libwebp via the dlopen-guarded ctypes adapter in
    stages/syscodecs.py (present in this container; validated on a real
    libwebp-minted fixture), raising NotImplementedError only when that
    library is absent. mp3/mp4 still need soundfile / pyav, absent in
    this container — wire them here and nothing else changes."""

    def decode_image(self, payload, meta):
        head = bytes(payload[:8])
        if head == _PNG_SIG:
            return _png_decode(payload)
        if head[:2] == _JPEG_SIG:
            return _jpeg_decode(payload)
        if head[:4] in (b"II*\x00", b"MM\x00*"):
            return _tiff_decode(payload)
        if head[:6] in (b"GIF87a", b"GIF89a"):
            return _gif_decode(payload)
        if head[:4] == b"RIFF" and bytes(payload[8:12]) == b"WEBP":
            return _webp_decode(bytes(payload))
        if head[:2] == b"P6":
            return _ppm_decode(payload)
        if head[:4] == _QOI_MAGIC:
            return _qoi_decode(payload)
        raise NotImplementedError(
            "only PNG/JPEG/TIFF/GIF/WebP/PPM/QOI decode in this build "
            "(WebP-lossy "
            "additionally requires the system libwebp shared library)")

    def decode_audio(self, payload, meta):
        raise NotImplementedError("audio codec not available in this build")

    def decode_video_frames(self, payload, meta, stride):
        # animated GIF is a real video container this build decodes in
        # full (frame compositing, disposal, transparency —
        # _gif_decode_frames); mp4/webm still need pyav, absent here
        head = bytes(payload[:6])
        if head in (b"GIF87a", b"GIF89a"):
            frames = _gif_decode_frames(bytes(payload))
            return frames[::max(1, int(stride))]
        raise NotImplementedError(
            "only animated GIF video decode in this build (mp4/webm "
            "need external codec libraries)")


class RawCodec(Codec):
    """WORKING pure-numpy codec for uncompressed containers — no external
    libraries: BMP (8-bit palette, 24-bit, 32-bit incl. BI_BITFIELDS),
    WAV (PCM 8/16/24/32-bit + IEEE float 32/64, RIFF), and raw
    interleaved rgb24 video (meta declares the frame shape).
    Compressed formats (png/jpeg/mp3/mp4) still need RealCodec's external
    libs; route by ``meta.format`` (see AutoCodec).

    Format references are public: BMP file structure (Windows
    BITMAPFILEHEADER/BITMAPINFOHEADER), RIFF/WAVE PCM chunks.
    """

    def decode_image(self, payload, meta):
        b = bytes(payload)
        if b[:2] != b"BM":
            raise ValueError("RawCodec: not a BMP payload")
        pix_off = int.from_bytes(b[10:14], "little")
        w = int.from_bytes(b[18:22], "little", signed=True)
        h = int.from_bytes(b[22:26], "little", signed=True)
        bpp = int.from_bytes(b[28:30], "little")
        comp = int.from_bytes(b[30:34], "little")
        # 24bpp BI_RGB, 32bpp BI_RGB (BGRX) and 32bpp BI_BITFIELDS with
        # byte-aligned masks (the layout real encoders emit for BGRA; the
        # masks follow the info header, V4/V5 headers included) — the
        # 32bpp/bitfields leg is validated against a real BITMAPV5HEADER
        # file from the CPython test corpus in tests/test_multimodal.py
        if bpp == 8 and comp == 0:
            # palettized: BGRA quads follow the info header
            hdr = int.from_bytes(b[14:18], "little")
            n_colors = int.from_bytes(b[46:50], "little") or 256
            poff = 14 + hdr
            quads = np.frombuffer(b, np.uint8, count=4 * n_colors,
                                  offset=poff).reshape(-1, 4)
            pal = quads[:, [2, 1, 0]]  # BGRx -> RGB
            bottom_up = h > 0
            h = abs(h)
            row = ((w + 3) // 4) * 4
            idx = np.frombuffer(b, np.uint8, count=row * h,
                                offset=pix_off).reshape(h, row)[:, :w]
            if bottom_up:
                idx = idx[::-1]
            return pal[idx.astype(np.int64)].copy()
        if bpp == 24 and comp == 0:
            nch, order = 3, (2, 1, 0)  # BGR
        elif bpp == 32 and comp in (0, 3):
            nch = 4
            if comp == 3:
                # masks sit at file offset 54 for BOTH header layouts:
                # after a 40-byte BITMAPINFOHEADER, or as the bV4/bV5
                # mask fields of the larger headers
                masks = [int.from_bytes(b[54 + 4 * i:58 + 4 * i], "little")
                         for i in range(3)]
                byte_of = {0xFF: 0, 0xFF00: 1, 0xFF0000: 2, 0xFF000000: 3}
                if any(m not in byte_of for m in masks):
                    raise ValueError(
                        f"RawCodec: non-byte-aligned BMP bitfields {masks}")
                order = tuple(byte_of[m] for m in masks)  # (R, G, B) bytes
            else:
                order = (2, 1, 0)  # BGRX
        else:
            raise ValueError(
                f"RawCodec: only 8/24/32-bit uncompressed BMP "
                f"(got {bpp}bpp comp={comp})")
        bottom_up = h > 0
        h = abs(h)
        row = ((w * nch + 3) // 4) * 4
        data = np.frombuffer(b, dtype=np.uint8, count=row * h, offset=pix_off)
        img = data.reshape(h, row)[:, : w * nch].reshape(h, w, nch)
        if bottom_up:
            img = img[::-1]
        return img[:, :, list(order)].copy()

    def decode_audio(self, payload, meta):
        b = bytes(payload)
        if b[:4] == b".snd":
            return _au_decode(b)
        if b[:4] == b"FORM" and b[8:12] in (b"AIFF", b"AIFC"):
            return _aiff_decode(b)
        if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
            raise ValueError("RawCodec: not a RIFF/WAVE/AU/AIFF payload")
        pos = 12
        fmt = None
        data = None
        while pos + 8 <= len(b):
            cid = b[pos:pos + 4]
            size = int.from_bytes(b[pos + 4:pos + 8], "little")
            body = b[pos + 8:pos + 8 + size]
            if cid == b"fmt ":
                fmt = {
                    "audio_format": int.from_bytes(body[0:2], "little"),
                    "channels": int.from_bytes(body[2:4], "little"),
                    "sample_rate": int.from_bytes(body[4:8], "little"),
                    "bits": int.from_bytes(body[14:16], "little"),
                    "sub_format": int.from_bytes(body[24:26], "little")
                    if len(body) >= 26 else 0,
                }
            elif cid == b"data":
                data = body
            pos += 8 + size + (size & 1)  # chunks are word-aligned
        if fmt is None or data is None:
            raise ValueError("RawCodec: missing fmt/data chunk")
        af, bits = fmt["audio_format"], fmt["bits"]
        if af == 0xFFFE:  # WAVE_FORMAT_EXTENSIBLE: real code leads the
            af = fmt["sub_format"]  # SubFormat GUID
        if af == 1 and bits == 16:
            samples = np.frombuffer(data, dtype="<i2") \
                .astype(np.float32) / 32768.0
        elif af == 1 and bits == 8:  # 8-bit PCM is UNSIGNED per RIFF
            samples = (np.frombuffer(data, dtype=np.uint8)
                       .astype(np.float32) - 128.0) / 128.0
        elif af == 1 and bits == 24:
            raw = np.frombuffer(data, dtype=np.uint8)
            raw = raw[:len(raw) - len(raw) % 3].reshape(-1, 3)
            v = (raw[:, 0].astype(np.int32)
                 | (raw[:, 1].astype(np.int32) << 8)
                 | (raw[:, 2].astype(np.int32) << 16))
            v = np.where(v >= 1 << 23, v - (1 << 24), v)
            samples = v.astype(np.float32) / float(1 << 23)
        elif af == 1 and bits == 32:
            samples = np.frombuffer(data, dtype="<i4") \
                .astype(np.float32) / float(1 << 31)
        elif af == 3 and bits == 32:  # IEEE float
            samples = np.frombuffer(data, dtype="<f4").astype(np.float32)
        elif af == 3 and bits == 64:
            samples = np.frombuffer(data, dtype="<f8").astype(np.float32)
        else:
            raise ValueError(
                f"RawCodec: unsupported WAV (format {af}, {bits}-bit); "
                "PCM 8/16/24/32 and IEEE float 32/64 only")
        ch = fmt["channels"]
        if ch > 1:
            samples = samples[: len(samples) - len(samples) % ch]
            samples = samples.reshape(-1, ch).mean(axis=1)  # downmix to mono
        return samples

    def decode_video_frames(self, payload, meta, stride):
        h, w = int(meta["height"]), int(meta["width"])
        frame_bytes = h * w * 3
        b = bytes(payload)
        total = len(b) // frame_bytes
        frames = []
        for i in range(0, total, stride):
            frames.append(np.frombuffer(
                b, dtype=np.uint8, count=frame_bytes, offset=i * frame_bytes
            ).reshape(h, w, 3).copy())
        return frames


def encode_bmp(img: np.ndarray) -> bytes:
    """24-bit uncompressed BMP encoder (test/round-trip counterpart of
    RawCodec.decode_image). img: (H, W, 3) uint8 RGB."""
    h, w = img.shape[:2]
    row = ((w * 3 + 3) // 4) * 4
    pix = np.zeros((h, row), dtype=np.uint8)
    pix[:, : w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up BGR
    data = pix.tobytes()
    off = 14 + 40
    header = (b"BM" + (off + len(data)).to_bytes(4, "little") + b"\0\0\0\0"
              + off.to_bytes(4, "little"))
    info = ((40).to_bytes(4, "little") + w.to_bytes(4, "little", signed=True)
            + h.to_bytes(4, "little", signed=True) + (1).to_bytes(2, "little")
            + (24).to_bytes(2, "little") + (0).to_bytes(4, "little")
            + len(data).to_bytes(4, "little") + (2835).to_bytes(4, "little") * 2
            + (0).to_bytes(4, "little") * 2)
    return header + info + data


def encode_wav_pcm16(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """16-bit mono PCM WAV encoder (round-trip counterpart)."""
    pcm = np.clip(np.asarray(samples, dtype=np.float64) * 32768.0,
                  -32768, 32767).astype("<i2").tobytes()
    fmt = ((1).to_bytes(2, "little") + (1).to_bytes(2, "little")
           + sample_rate.to_bytes(4, "little")
           + (sample_rate * 2).to_bytes(4, "little")
           + (2).to_bytes(2, "little") + (16).to_bytes(2, "little"))
    body = (b"WAVE" + b"fmt " + len(fmt).to_bytes(4, "little") + fmt
            + b"data" + len(pcm).to_bytes(4, "little") + pcm)
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def _ulaw_expand(x: np.ndarray) -> np.ndarray:
    """G.711 mu-law byte -> 16-bit-range linear (ITU-T G.711 decode)."""
    x = (~x.astype(np.int64)) & 0xFF
    sign = x & 0x80
    exp = (x >> 4) & 7
    mant = x & 0xF
    v = (((mant << 3) + 0x84) << exp) - 0x84
    return np.where(sign, -v, v)


def _alaw_expand(x: np.ndarray) -> np.ndarray:
    """G.711 A-law byte -> 16-bit-range linear."""
    x = x.astype(np.int64) ^ 0x55
    sign = x & 0x80
    exp = (x >> 4) & 7
    mant = x & 0xF
    v = np.where(exp == 0, (mant << 4) + 8,
                 ((mant << 4) + 0x108) << np.maximum(exp - 1, 0))
    # G.711 A-law: the (xored) sign bit SET means positive
    return np.where(sign, v, -v)


def _pcm_be(data: bytes, bits: int) -> np.ndarray:
    """Big-endian signed PCM -> float32 in [-1, 1) (AU/AIFF payloads)."""
    if bits == 8:  # AU/AIFF 8-bit PCM is SIGNED (unlike RIFF)
        return np.frombuffer(data, np.int8).astype(np.float32) / 128.0
    if bits == 16:
        return np.frombuffer(data, ">i2").astype(np.float32) / 32768.0
    if bits == 24:
        raw = np.frombuffer(data, np.uint8)
        raw = raw[:len(raw) - len(raw) % 3].reshape(-1, 3)
        v = ((raw[:, 0].astype(np.int32) << 16)
             | (raw[:, 1].astype(np.int32) << 8)
             | raw[:, 2].astype(np.int32))
        v = np.where(v >= 1 << 23, v - (1 << 24), v)
        return v.astype(np.float32) / float(1 << 23)
    if bits == 32:
        return np.frombuffer(data, ">i4").astype(np.float32) / float(1 << 31)
    raise ValueError(f"unsupported big-endian PCM width {bits}")


def _au_decode(b: bytes) -> np.ndarray:
    """Sun/NeXT .au (the .snd header): big-endian PCM 8/16/24/32,
    float 32/64, G.711 mu-law/A-law. Mono downmix like the WAV path.
    Validated against CPython's real pluck-pcm*.au fixtures (same
    recording as the WAV twins)."""
    off = int.from_bytes(b[4:8], "big")
    enc = int.from_bytes(b[12:16], "big")
    channels = int.from_bytes(b[20:24], "big")
    data = b[off:]
    if enc == 1:
        s = _ulaw_expand(np.frombuffer(data, np.uint8)) \
            .astype(np.float32) / 32768.0
    elif enc in (2, 3, 4, 5):
        s = _pcm_be(data, {2: 8, 3: 16, 4: 24, 5: 32}[enc])
    elif enc == 6:
        s = np.frombuffer(data, ">f4").astype(np.float32)
    elif enc == 7:
        s = np.frombuffer(data, ">f8").astype(np.float32)
    elif enc == 27:
        s = _alaw_expand(np.frombuffer(data, np.uint8)) \
            .astype(np.float32) / 32768.0
    else:
        raise ValueError(f"AU encoding {enc} not supported")
    if channels > 1:
        s = s[:len(s) - len(s) % channels].reshape(-1, channels).mean(axis=1)
    return s


def _aiff_decode(b: bytes) -> np.ndarray:
    """AIFF / AIFC (IFF FORM container): COMM + SSND chunks, big-endian
    PCM 8/16/24/32; AIFC compression types 'NONE', 'ulaw', 'alaw'.
    Validated against CPython's real pluck fixtures."""
    is_aifc = b[8:12] == b"AIFC"
    pos = 12
    comm = ssnd = None
    while pos + 8 <= len(b):
        cid = b[pos:pos + 4]
        size = int.from_bytes(b[pos + 4:pos + 8], "big")
        body = b[pos + 8:pos + 8 + size]
        if cid == b"COMM":
            comm = body
        elif cid == b"SSND":
            ssnd = body
        pos += 8 + size + (size & 1)
    if comm is None or ssnd is None:
        raise ValueError("AIFF missing COMM/SSND chunk")
    channels = int.from_bytes(comm[0:2], "big")
    bits = int.from_bytes(comm[6:8], "big")
    ctype = comm[18:22] if is_aifc and len(comm) >= 22 else b"NONE"
    off = int.from_bytes(ssnd[0:4], "big")
    data = ssnd[8 + off:]
    if ctype in (b"NONE", b"none"):
        s = _pcm_be(data, bits)
    elif ctype in (b"ulaw", b"ULAW"):
        s = _ulaw_expand(np.frombuffer(data, np.uint8)) \
            .astype(np.float32) / 32768.0
    elif ctype in (b"alaw", b"ALAW"):
        s = _alaw_expand(np.frombuffer(data, np.uint8)) \
            .astype(np.float32) / 32768.0
    else:
        raise ValueError(f"AIFC compression {ctype!r} not supported")
    if channels > 1:
        s = s[:len(s) - len(s) % channels].reshape(-1, channels).mean(axis=1)
    return s


class AutoCodec(Codec):
    """Per-format dispatch: uncompressed containers decode for real via
    RawCodec; anything else goes to the fallback (RealCodec by default, so
    unsupported compressed formats surface as in-band errors rather than
    fake data)."""

    RAW_FORMATS = {"bmp", "wav", "rgb24"}

    def __init__(self, fallback: Optional[Codec] = None):
        self.raw = RawCodec()
        self.fallback = fallback or RealCodec()

    def _route(self, meta) -> Codec:
        fmt = ((meta or {}).get("format") or "").lower()
        return self.raw if fmt in self.RAW_FORMATS else self.fallback

    def decode_image(self, payload, meta):
        return self._route(meta).decode_image(payload, meta)

    def decode_audio(self, payload, meta):
        return self._route(meta).decode_audio(payload, meta)

    def decode_video_frames(self, payload, meta, stride):
        return self._route(meta).decode_video_frames(payload, meta, stride)


class FakeCodec(Codec):
    """Deterministic stand-in: expands payload bytes into typed arrays via a
    seeded PRNG keyed on the payload hash — stable across processes/runs."""

    def _rng(self, payload: bytes):
        seed = int.from_bytes(hashlib.blake2b(payload, digest_size=8).digest(), "little")
        return np.random.default_rng(seed)

    def decode_image(self, payload, meta):
        h, w = int(meta["height"]), int(meta["width"])
        return self._rng(payload).integers(0, 256, size=(h, w, 3), dtype=np.uint8)

    def decode_audio(self, payload, meta):
        n = int(meta["sample_rate"])  # 1 second of samples
        return (self._rng(payload).standard_normal(n) * 0.1).astype(np.float32)

    def decode_video_frames(self, payload, meta, stride):
        h, w = int(meta["height"]), int(meta["width"])
        total = int(meta["n_frames"])
        rng = self._rng(payload)
        frames = []
        for i in range(0, total, stride):
            frames.append(rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8))
        return frames


def _resize_nn(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Deterministic nearest-neighbor resize (pure numpy index math)."""
    h, w = img.shape[:2]
    ys = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    xs = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return img[ys][:, xs]


class ImageFeatureStage:
    """Decode -> resize -> feature-extract for image rows; actor pool.

    Output: (asset_id, width, height, mean_luma_milli, feat: list<float>)
    where feat is a 64-bin luma histogram (the deterministic stand-in for an
    embedding model — swap the histogram for a model forward pass; the actor
    shape is identical). Decoded pixels never leave __call__.
    """

    def __init__(self, codec: Optional[Codec] = None, resize_to: int = 64):
        self.codec = codec or FakeCodec()
        self.resize_to = resize_to

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, ws, hs, lumas, feats, errors = [], [], [], [], [], []
        metas = batch["meta"].to_pylist()
        payloads = batch["payload"].to_pylist()
        for i in range(batch.num_rows):
            ids.append(batch["asset_id"][i].as_py())
            try:
                img = self.codec.decode_image(payloads[i], metas[i])
                h, w = img.shape[:2]
                small = _resize_nn(img, self.resize_to, self.resize_to)
                luma = (small.astype(np.uint32).sum(axis=2) // 3).astype(np.uint8)
                hist = np.bincount((luma // 4).ravel(), minlength=64).astype(np.float64)
                hist /= hist.sum()
                ws.append(w); hs.append(h)
                lumas.append(int(round(float(luma.mean()) * 1000)))
                feats.append([float(x) for x in hist])
                errors.append(None)
            except Exception as e:  # in-band error channel (M31)
                ws.append(0); hs.append(0); lumas.append(0); feats.append([])
                errors.append(str(e))
        return pa.table({
            "asset_id": pa.array(ids, pa.string()),
            "width": pa.array(ws, pa.int32()),
            "height": pa.array(hs, pa.int32()),
            "mean_luma_milli": pa.array(lumas, pa.int64()),
            "feat": pa.array(feats, pa.list_(pa.float64())),
            "error": pa.array(errors, pa.string()),
        })


class AudioFeatureStage:
    """Decode -> frame -> energy features for audio rows; actor pool.
    Output: (asset_id, n_samples, rms_milli, n_frames_out)."""

    def __init__(self, codec: Optional[Codec] = None, frame: int = 1024):
        self.codec = codec or FakeCodec()
        self.frame = frame

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, ns, rms, nf, errors = [], [], [], [], []
        metas = batch["meta"].to_pylist()
        payloads = batch["payload"].to_pylist()
        for i in range(batch.num_rows):
            ids.append(batch["asset_id"][i].as_py())
            try:
                wav = self.codec.decode_audio(payloads[i], metas[i])
                n = len(wav)
                frames = n // self.frame
                r = float(np.sqrt(np.mean(wav[: frames * self.frame] ** 2))) if frames else 0.0
                ns.append(n); rms.append(int(round(r * 1000))); nf.append(frames)
                errors.append(None)
            except Exception as e:  # in-band error channel (M31)
                ns.append(0); rms.append(0); nf.append(0)
                errors.append(str(e))
        return pa.table({
            "asset_id": pa.array(ids, pa.string()),
            "n_samples": pa.array(ns, pa.int64()),
            "rms_milli": pa.array(rms, pa.int64()),
            "n_frames_out": pa.array(nf, pa.int64()),
            "error": pa.array(errors, pa.string()),
        })


class ImageEdgeStage:
    """Decode -> grayscale -> Sobel gradient magnitude; actor pool. Real
    CV in pure numpy (two separable 3x3 convolutions as shifted sums).
    Output: (asset_id, mean_grad_milli, edge_frac_milli) — edge pixels =
    |grad| > 128 on the uint8 luma scale."""

    def __init__(self, codec: Optional[Codec] = None):
        self.codec = codec or FakeCodec()

    @staticmethod
    def _sobel_mag(luma: np.ndarray) -> np.ndarray:
        p = np.pad(luma.astype(np.float64), 1, mode="edge")
        gx = (p[:-2, 2:] + 2 * p[1:-1, 2:] + p[2:, 2:]
              - p[:-2, :-2] - 2 * p[1:-1, :-2] - p[2:, :-2])
        gy = (p[2:, :-2] + 2 * p[2:, 1:-1] + p[2:, 2:]
              - p[:-2, :-2] - 2 * p[:-2, 1:-1] - p[:-2, 2:])
        return np.hypot(gx, gy)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, mg, ef, errors = [], [], [], []
        metas = batch["meta"].to_pylist()
        payloads = batch["payload"].to_pylist()
        for i in range(batch.num_rows):
            ids.append(batch["asset_id"][i].as_py())
            try:
                img = self.codec.decode_image(payloads[i], metas[i])
                luma = (img.astype(np.uint32).sum(axis=2) // 3)
                g = self._sobel_mag(luma)
                mg.append(int(round(float(g.mean()) * 1000)))
                ef.append(int(round(float((g > 128).mean()) * 1000)))
                errors.append(None)
            except Exception as e:  # in-band error channel (M31)
                mg.append(0); ef.append(0)
                errors.append(str(e))
        return pa.table({
            "asset_id": pa.array(ids, pa.string()),
            "mean_grad_milli": pa.array(mg, pa.int64()),
            "edge_frac_milli": pa.array(ef, pa.int64()),
            "error": pa.array(errors, pa.string()),
        })


class VideoMotionStage:
    """Decode sampled frames -> mean absolute luma difference between
    consecutive sampled frames (motion energy); actor pool. Output:
    (asset_id, n_frames_sampled, motion_milli)."""

    def __init__(self, codec: Optional[Codec] = None, stride: int = 10):
        self.codec = codec or FakeCodec()
        self.stride = stride

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, nf, mo, errors = [], [], [], []
        metas = batch["meta"].to_pylist()
        payloads = batch["payload"].to_pylist()
        for i in range(batch.num_rows):
            ids.append(batch["asset_id"][i].as_py())
            try:
                frames = self.codec.decode_video_frames(
                    payloads[i], metas[i], self.stride)
                lumas = [f.astype(np.int64).sum(axis=2) // 3
                         for f in frames]
                if len(lumas) < 2:
                    nf.append(len(lumas)); mo.append(0)
                    errors.append(None)
                    continue
                diffs = [float(np.abs(b - a).mean())
                         for a, b in zip(lumas, lumas[1:])]
                nf.append(len(lumas))
                mo.append(int(round(1000 * sum(diffs) / len(diffs))))
                errors.append(None)
            except Exception as e:  # in-band error channel (M31)
                nf.append(0); mo.append(0)
                errors.append(str(e))
        return pa.table({
            "asset_id": pa.array(ids, pa.string()),
            "n_frames_sampled": pa.array(nf, pa.int64()),
            "motion_milli": pa.array(mo, pa.int64()),
            "error": pa.array(errors, pa.string()),
        })


class AudioSpectralStage:
    """Decode -> Hann-windowed frame matrix -> rfft power spectrum ->
    dominant frequency bin + spectral centroid (milli-bins); actor pool.
    Real DSP in pure numpy: one vectorized rfft over the (n_frames, frame)
    matrix per asset, no per-sample Python. Output:
    (asset_id, n_frames, dom_bin, centroid_millibin)."""

    def __init__(self, codec: Optional[Codec] = None, frame: int = 1024):
        self.codec = codec or FakeCodec()
        self.frame = frame
        # Hann window computed ONCE per actor (stateful-stage rule)
        self.window = np.hanning(frame)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, nf, dom, cen, errors = [], [], [], [], []
        metas = batch["meta"].to_pylist()
        payloads = batch["payload"].to_pylist()
        for i in range(batch.num_rows):
            ids.append(batch["asset_id"][i].as_py())
            try:
                wav = np.asarray(
                    self.codec.decode_audio(payloads[i], metas[i]),
                    dtype=np.float64)
                frames = len(wav) // self.frame
                if frames == 0:
                    nf.append(0); dom.append(0); cen.append(0)
                    errors.append(None)
                    continue
                m = wav[: frames * self.frame] \
                    .reshape(frames, self.frame) * self.window
                spec = np.abs(np.fft.rfft(m, axis=1)) ** 2
                power = spec.sum(axis=0)
                p = power[1:]  # skip DC
                d = int(np.argmax(p)) + 1
                tot = p.sum()
                c = int(round(1000.0 * float(
                    (np.arange(1, len(power)) * p).sum() / tot))) \
                    if tot > 0 else 0
                nf.append(frames); dom.append(d); cen.append(c)
                errors.append(None)
            except Exception as e:  # in-band error channel (M31)
                nf.append(0); dom.append(0); cen.append(0)
                errors.append(str(e))
        return pa.table({
            "asset_id": pa.array(ids, pa.string()),
            "n_frames": pa.array(nf, pa.int64()),
            "dom_bin": pa.array(dom, pa.int64()),
            "centroid_millibin": pa.array(cen, pa.int64()),
            "error": pa.array(errors, pa.string()),
        })


class VideoFrameSampleStage:
    """Decode every ``stride``-th frame -> per-frame luma; actor pool.
    Output one row PER SAMPLED FRAME (flat_map shape):
    (asset_id, frame_idx, mean_luma_milli)."""

    def __init__(self, codec: Optional[Codec] = None, stride: int = 10):
        self.codec = codec or FakeCodec()
        self.stride = stride

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, idxs, lumas = [], [], []
        metas = batch["meta"].to_pylist()
        payloads = batch["payload"].to_pylist()
        for i in range(batch.num_rows):
            aid = batch["asset_id"][i].as_py()
            try:
                frames = self.codec.decode_video_frames(payloads[i], metas[i], self.stride)
            except Exception:  # in-band: a bad asset contributes no frames
                continue
            for k, f in enumerate(frames):
                ids.append(aid)
                idxs.append(k * self.stride)
                luma = f.astype(np.uint32).sum(axis=2) // 3
                lumas.append(int(round(float(luma.mean()) * 1000)))
        return pa.table({
            "asset_id": pa.array(ids, pa.string()),
            "frame_idx": pa.array(idxs, pa.int64()),
            "mean_luma_milli": pa.array(lumas, pa.int64()),
        })


def _ppm_decode(b: bytes) -> np.ndarray:
    """Binary PPM (netpbm P6): ASCII header (magic, whitespace/comment
    separated width height maxval) then raw RGB bytes. 8-bit maxval."""
    b = bytes(b)
    if b[:2] != b"P6":
        raise ValueError("not a binary PPM payload")
    pos = 2
    fields = []
    while len(fields) < 3:
        while pos < len(b) and b[pos:pos + 1].isspace():
            pos += 1
        if b[pos:pos + 1] == b"#":  # comment to end of line
            while pos < len(b) and b[pos] not in (10, 13):
                pos += 1
            continue
        start = pos
        while pos < len(b) and not b[pos:pos + 1].isspace():
            pos += 1
        fields.append(int(b[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError("PPM maxval != 255 not supported")
    need = w * h * 3
    if len(b) - pos < need:
        raise ValueError("PPM pixel data truncated")
    return np.frombuffer(b, np.uint8, need, pos).reshape(h, w, 3).copy()


def encode_ppm(img: np.ndarray) -> bytes:
    """Binary PPM (P6) encoder."""
    h, w = img.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + \
        np.ascontiguousarray(img.astype(np.uint8)).tobytes()


_QOI_MAGIC = b"qoif"


def _qoi_decode(b: bytes) -> np.ndarray:
    """QOI decoder (qoiformat.org spec, public domain spec): RGB/RGBA
    ops (INDEX/DIFF/LUMA/RUN/RGB/RGBA), 64-slot running index with the
    (3r+5g+7b+11a) % 64 hash. Output (H, W, 3) uint8 (alpha dropped)."""
    b = bytes(b)
    if b[:4] != _QOI_MAGIC:
        raise ValueError("not a QOI payload")
    w = int.from_bytes(b[4:8], "big")
    h = int.from_bytes(b[8:12], "big")
    channels = b[12]
    if channels not in (3, 4) or b[13] not in (0, 1):
        raise ValueError("bad QOI header")
    out = np.empty((h * w, 4), np.uint8)
    index = np.zeros((64, 4), np.uint8)
    r, g, bl, a = 0, 0, 0, 255
    pos = 14
    i = 0
    n = h * w
    while i < n:
        byte = b[pos]
        pos += 1
        if byte == 0xFE:  # QOI_OP_RGB
            r, g, bl = b[pos], b[pos + 1], b[pos + 2]
            pos += 3
        elif byte == 0xFF:  # QOI_OP_RGBA
            r, g, bl, a = b[pos], b[pos + 1], b[pos + 2], b[pos + 3]
            pos += 4
        else:
            tag = byte >> 6
            if tag == 0:  # INDEX
                r, g, bl, a = index[byte & 0x3F]
            elif tag == 1:  # DIFF
                r = (r + ((byte >> 4) & 3) - 2) & 0xFF
                g = (g + ((byte >> 2) & 3) - 2) & 0xFF
                bl = (bl + (byte & 3) - 2) & 0xFF
            elif tag == 2:  # LUMA
                dg = (byte & 0x3F) - 32
                b2 = b[pos]
                pos += 1
                r = (r + dg - 8 + ((b2 >> 4) & 0x0F)) & 0xFF
                g = (g + dg) & 0xFF
                bl = (bl + dg - 8 + (b2 & 0x0F)) & 0xFF
            else:  # RUN
                run = (byte & 0x3F) + 1
                out[i:i + run] = (r, g, bl, a)
                i += run
                continue
        index[(3 * r + 5 * g + 7 * bl + 11 * a) % 64] = (r, g, bl, a)
        out[i] = (r, g, bl, a)
        i += 1
    if b[pos:pos + 8] != b"\x00" * 7 + b"\x01":
        raise ValueError("bad QOI end marker")
    return out.reshape(h, w, 4)[:, :, :3].copy()


def encode_qoi(img: np.ndarray) -> bytes:
    """QOI encoder (RGB, full op set: RUN / INDEX / DIFF / LUMA / RGB) —
    round-trip counterpart of _qoi_decode."""
    h, w = img.shape[:2]
    px = img.astype(np.int64).reshape(-1, 3)
    out = bytearray()
    out += _QOI_MAGIC
    out += w.to_bytes(4, "big") + h.to_bytes(4, "big")
    out += bytes([3, 0])  # RGB, sRGB
    index = np.zeros((64, 4), np.int64)
    pr, pg, pb, pa_ = 0, 0, 0, 255
    run = 0
    for r, g, bl in px:
        if (r, g, bl) == (pr, pg, pb):
            run += 1
            if run == 62:
                out.append(0xC0 | (run - 1))
                run = 0
            continue
        if run:
            out.append(0xC0 | (run - 1))
            run = 0
        hidx = (3 * r + 5 * g + 7 * bl + 11 * 255) % 64
        if tuple(index[hidx]) == (r, g, bl, 255):
            out.append(int(hidx))
        else:
            index[hidx] = (r, g, bl, 255)
            dr = (r - pr + 2) & 0xFF
            dg = (g - pg + 2) & 0xFF
            db = (bl - pb + 2) & 0xFF
            if dr < 4 and dg < 4 and db < 4:
                out.append(0x40 | (dr << 4) | (dg << 2) | db)
            else:
                vg = (g - pg) & 0xFF
                vg_s = vg - 256 if vg > 127 else vg
                vr = ((r - pr) & 0xFF)
                vr_s = vr - 256 if vr > 127 else vr
                vb = ((bl - pb) & 0xFF)
                vb_s = vb - 256 if vb > 127 else vb
                if -32 <= vg_s < 32 and -8 <= vr_s - vg_s < 8 and \
                        -8 <= vb_s - vg_s < 8:
                    out.append(0x80 | (vg_s + 32))
                    out.append(((vr_s - vg_s + 8) << 4) |
                               (vb_s - vg_s + 8))
                else:
                    out += bytes([0xFE, r, g, bl])
        pr, pg, pb = int(r), int(g), int(bl)
    if run:
        out.append(0xC0 | (run - 1))
    out += b"\x00" * 7 + b"\x01"
    return bytes(out)


def synth_gif_anim_table(n_assets: int = 24, seed: int = 7) -> pa.Table:
    """Deterministic ANIMATED-GIF assets for the gif_framesample gate:
    real encode_gif_anim payloads with varying frame counts, sizes,
    sub-rectangle placement, transparency and disposal modes — the
    decode side must composite identically distributed and
    single-process."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n_assets):
        h = int(rng.integers(8, 17))
        w = int(rng.integers(8, 17))
        n_frames = int(rng.integers(2, 7))
        base = (rng.integers(0, 4, (h, w, 3)) * 60).astype(np.uint8)
        frames = [base]
        disposals = [1]
        masks = [None]
        offsets = [(0, 0)]
        for _ in range(n_frames - 1):
            fh = int(rng.integers(2, h + 1))
            fw = int(rng.integers(2, w + 1))
            fy = int(rng.integers(0, h - fh + 1))
            fx = int(rng.integers(0, w - fw + 1))
            patch = (rng.integers(0, 4, (fh, fw, 3)) * 60).astype(np.uint8)
            frames.append(patch)
            disposals.append(int(rng.integers(1, 4)))
            if rng.integers(0, 2):
                m = rng.integers(0, 2, (fh, fw)).astype(bool)
                masks.append(m)
            else:
                masks.append(None)
            offsets.append((fy, fx))
        payload = encode_gif_anim(frames, disposals=disposals,
                                  transparent_masks=masks,
                                  offsets=offsets, screen=(h, w))
        rows.append({
            "asset_id": f"gif-{i:04d}", "kind": "video",
            "payload": payload,
            "meta": {"format": "gif", "width": w, "height": h,
                     "sample_rate": 0, "n_frames": n_frames}})
    return pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA)


def synth_media_table(n_assets: int = 30, seed: int = 5) -> pa.Table:
    """Deterministic media table for tests/benchmarks (payload = seeded
    bytes; meta declares the decoded shape the FakeCodec will produce)."""
    rng = np.random.default_rng(seed)
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n_assets):
        kind = kinds[i % 3]
        payload = rng.integers(0, 256, size=int(rng.integers(64, 256)),
                               dtype=np.uint8).tobytes()
        rows.append({
            "asset_id": f"asset-{i:05d}",
            "kind": kind,
            "payload": payload,
            "meta": {
                "format": {"image": "png", "audio": "wav", "video": "mp4"}[kind],
                "width": int(rng.integers(32, 129)),
                "height": int(rng.integers(32, 129)),
                "sample_rate": 16000,
                "n_frames": int(rng.integers(30, 121)),
            },
        })
    return pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA)


CODEC_MATRIX_FORMATS = ("png", "png_f2", "bmp", "tiff", "tiff_pb",
                        "tiff_lzw", "ppm", "qoi", "gif",
                        "webp", "webp_sg", "jpeg", "jpeg_prog")


def pixel_digest(img: np.ndarray) -> str:
    """Stable digest of decoded pixels (shape + bytes) — the pure kernel
    both the distributed codec-matrix stage and its codec-free oracle
    replay share."""
    a = np.ascontiguousarray(img.astype(np.uint8))
    return hashlib.blake2b(
        str(a.shape).encode() + a.tobytes(), digest_size=12).hexdigest()


def codec_matrix_images(n_assets: int = 32, seed: int = 9):
    """Deterministic source images for the cross-format codec matrix:
    seeded 16-color palette images (GIF's <=256-color constraint). The
    lossless formats' expected pixel digest is format-independent and
    computable WITHOUT any codec; the two JPEG variants share quantized
    coefficients by construction (same DCT/quant math in both encoders),
    so their decodes are pixel-identical to EACH OTHER — the oracle twin
    decodes the BASELINE bytes while the distributed stage decodes the
    payload it carries (progressive for 'jpeg_prog'), gating the two
    scan machineries against each other. Yields (asset_id, fmt, img)."""
    rng = np.random.default_rng(seed)
    pal = rng.integers(0, 256, (16, 3), dtype=np.uint8)
    out = []
    for i in range(n_assets):
        fmt = CODEC_MATRIX_FORMATS[i % len(CODEC_MATRIX_FORMATS)]
        h = int(rng.integers(9, 33))
        w = int(rng.integers(9, 33))
        img = pal[rng.integers(0, 16, (h, w))]
        out.append((f"cm-{i:05d}-{fmt}", fmt, img))
    return out


def synth_codec_matrix_table(n_assets: int = 32, seed: int = 9) -> pa.Table:
    """REAL encoded payloads cycling through every lossless image format
    this build decodes — PNG (two filter modes), BMP, TIFF (none +
    PackBits), GIF (LZW), WebP-VP8L (plain + subtract-green). The decode
    stage must reproduce the SOURCE pixels bit-exactly for every row."""
    enc = {
        "png": lambda im: encode_png(im, filter_type=0),
        "png_f2": lambda im: encode_png(im, filter_type=2),
        "bmp": encode_bmp,
        "tiff": lambda im: encode_tiff(im, packbits=False),
        "tiff_pb": lambda im: encode_tiff(im, packbits=True),
        "tiff_lzw": lambda im: encode_tiff(im, lzw=True),
        "ppm": encode_ppm,
        "qoi": encode_qoi,
        "gif": encode_gif,
        "webp": lambda im: encode_webp_lossless(im, subtract_green=False),
        "webp_sg": lambda im: encode_webp_lossless(im, subtract_green=True),
        "jpeg": lambda im: encode_jpeg(im, quant=2, subsample=True),
        "jpeg_prog": lambda im: encode_jpeg_progressive(im, quant=2,
                                                        subsample=True),
    }
    container = {"png": "png", "png_f2": "png", "bmp": "bmp",
                 "tiff": "tiff", "tiff_pb": "tiff", "tiff_lzw": "tiff",
                 "ppm": "ppm", "qoi": "qoi",
                 "gif": "gif",
                 "webp": "webp", "webp_sg": "webp", "jpeg": "jpeg",
                 "jpeg_prog": "jpeg"}
    rows = []
    for aid, fmt, img in codec_matrix_images(n_assets, seed):
        rows.append({
            "asset_id": aid,
            "kind": "image",
            "payload": enc[fmt](img),
            "meta": {"format": container[fmt],
                     "width": img.shape[1], "height": img.shape[0],
                     "sample_rate": 0, "n_frames": 0},
        })
    return pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA)


class ImageDecodeDigestStage:
    """Actor-pool decode -> pixel digest over REAL encoded payloads (the
    cross-format codec matrix): AutoCodec routes BMP to RawCodec and
    everything else to RealCodec's signature sniffing — the same seam
    production media flows through. Output (asset_id, width, height,
    mean_luma_milli, pix_digest); the oracle replay computes the same
    digests from the SOURCE pixel arrays, codec-free, so a hash match
    proves every decoder reproduced its input exactly through the
    distributed stage."""

    def __init__(self, codec: Optional[Codec] = None):
        self.codec = codec or AutoCodec()

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, ws, hs, lum, digs = [], [], [], [], []
        metas = batch["meta"].to_pylist()
        payloads = batch["payload"].to_pylist()
        for i in range(batch.num_rows):
            img = self.codec.decode_image(payloads[i], metas[i])
            ids.append(batch["asset_id"][i].as_py())
            hs.append(img.shape[0])
            ws.append(img.shape[1])
            lum.append(int(round(float(img.mean()) * 1000)))
            digs.append(pixel_digest(img))
        return pa.table({
            "asset_id": pa.array(ids, pa.string()),
            "width": pa.array(ws, pa.int64()),
            "height": pa.array(hs, pa.int64()),
            "mean_luma_milli": pa.array(lum, pa.int64()),
            "pix_digest": pa.array(digs, pa.string()),
        })


class AudioMFCCStage:
    """Decode -> Hann-framed rfft power -> MEL filterbank -> log ->
    DCT-II -> mean MFCC vector per asset (the classic speech/audio-ML
    front end: Davis & Mermelstein 1980). Pure vectorized numpy; the
    mel filterbank and DCT basis build ONCE per (sample_rate) per actor
    (stateful-stage rule). Output one row per asset:
    (asset_id, n_frames, mfcc_0..mfcc_7 as milli-quantized ints) —
    deterministic, so the single-process oracle-dump twin (same class)
    hashes bit-equal."""

    N_MELS = 20
    N_CEPS = 8

    def __init__(self, codec: Optional[Codec] = None, frame: int = 1024):
        self.codec = codec or FakeCodec()
        self.frame = frame
        self.window = np.hanning(frame)
        self._banks: Dict[int, np.ndarray] = {}
        # DCT-II basis rows k=0..N_CEPS-1 over N_MELS mel energies
        n = np.arange(self.N_MELS)
        k = np.arange(self.N_CEPS)[:, None]
        self.dct = np.cos(np.pi * k * (2 * n + 1) / (2 * self.N_MELS))

    def _mel_bank(self, sr: int) -> np.ndarray:
        bank = self._banks.get(sr)
        if bank is not None:
            return bank
        n_bins = self.frame // 2 + 1
        mel = lambda f: 2595.0 * np.log10(1.0 + f / 700.0)
        imel = lambda m: 700.0 * (10.0 ** (m / 2595.0) - 1.0)
        pts = imel(np.linspace(mel(0.0), mel(sr / 2.0), self.N_MELS + 2))
        bins = np.floor((self.frame + 1) * pts / sr).astype(np.int64)
        bank = np.zeros((self.N_MELS, n_bins))
        for m in range(1, self.N_MELS + 1):
            lo, ce, hi = bins[m - 1], bins[m], bins[m + 1]
            for b in range(lo, ce):
                if ce > lo:
                    bank[m - 1, b] = (b - lo) / (ce - lo)
            for b in range(ce, hi):
                if hi > ce:
                    bank[m - 1, b] = (hi - b) / (hi - ce)
        self._banks[sr] = bank
        return bank

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, nf, errors = [], [], []
        ceps_cols = [[] for _ in range(self.N_CEPS)]
        metas = batch["meta"].to_pylist()
        payloads = batch["payload"].to_pylist()
        for i in range(batch.num_rows):
            ids.append(batch["asset_id"][i].as_py())
            try:
                meta = metas[i]
                wav = np.asarray(
                    self.codec.decode_audio(payloads[i], meta),
                    dtype=np.float64)
                sr = int(meta.get("sample_rate") or 16000)
                frames = len(wav) // self.frame
                if frames == 0:
                    nf.append(0)
                    for c in ceps_cols:
                        c.append(0)
                    errors.append(None)
                    continue
                m = wav[: frames * self.frame] \
                    .reshape(frames, self.frame) * self.window
                power = np.abs(np.fft.rfft(m, axis=1)) ** 2
                mels = power @ self._mel_bank(sr).T  # (frames, N_MELS)
                logm = np.log(np.maximum(mels, 1e-10))
                mfcc = (self.dct @ logm.mean(axis=0))  # (N_CEPS,)
                nf.append(frames)
                for j, c in enumerate(ceps_cols):
                    c.append(int(round(1000.0 * float(mfcc[j]))))
                errors.append(None)
            except Exception as e:  # in-band error channel (M31)
                nf.append(0)
                for c in ceps_cols:
                    c.append(0)
                errors.append(str(e))
        cols = {"asset_id": pa.array(ids, pa.string()),
                "n_frames": pa.array(nf, pa.int64())}
        for j, c in enumerate(ceps_cols):
            cols[f"mfcc_{j}"] = pa.array(c, pa.int64())
        cols["error"] = pa.array(errors, pa.string())
        return pa.table(cols)


def build_media_pipeline(ds, kind: str, codec: Optional[Codec] = None,
                         batch_size: int = 8, concurrency=(1, 4)):
    """Route a media Dataset through the stage for ``kind``. Small batches:
    decoded frames dominate memory, not the encoded payload."""
    stage = {"image": ImageFeatureStage, "audio": AudioFeatureStage,
             "audio_spectral": AudioSpectralStage,
             "audio_mfcc": AudioMFCCStage,
             "image_edges": ImageEdgeStage,
             "video_motion": VideoMotionStage,
             "video": VideoFrameSampleStage}[kind]
    kwargs = {"codec": codec} if codec is not None else {}
    kind = {"audio_spectral": "audio", "audio_mfcc": "audio",
            "image_edges": "image",
            "video_motion": "video"}.get(kind, kind)
    return ds.filter(expr=f"kind == '{kind}'").map_batches(
        stage, fn_constructor_kwargs=kwargs, batch_format="pyarrow",
        batch_size=batch_size, concurrency=concurrency,
    )


class ImageAHashStage:
    """Decode -> 8x8 block-mean grayscale -> 64-bit average-hash (aHash);
    actor pool (codec state loads once per actor). Output one signature row
    per image: (asset_id, doc_id: numeric id parsed from asset_id,
    simhash: uint64) — named to plug straight into
    functions.dedup.hamming_sig_pairs for banded near-dup pairing. Decoded
    pixels never leave __call__; failed decodes are dropped with an in-band
    count (a missing signature can only MISS a dup, never corrupt one)."""

    def __init__(self, codec: Optional[Codec] = None):
        self.codec = codec or FakeCodec()

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, nums, sigs = [], [], []
        metas = batch["meta"].to_pylist()
        payloads = batch["payload"].to_pylist()
        for i in range(batch.num_rows):
            aid = batch["asset_id"][i].as_py()
            try:
                img = self.codec.decode_image(payloads[i], metas[i])
                luma = (img.astype(np.uint32).sum(axis=2) // 3).astype(np.uint8)
                small = _resize_nn(luma[..., None], 8, 8)[..., 0]
                bits = (small.astype(np.int64)
                        > int(small.astype(np.int64).mean())).ravel()
                sig = np.uint64(0)
                for b in np.flatnonzero(bits):
                    sig |= np.uint64(1) << np.uint64(b)
                ids.append(aid)
                nums.append(int("".join(c for c in aid if c.isdigit()) or 0))
                sigs.append(int(sig))
            except Exception:
                continue  # drop: absent signature cannot create a false pair
        return pa.table({
            "asset_id": pa.array(ids, pa.string()),
            "doc_id": pa.array(nums, pa.int64()),
            "simhash": pa.array(sigs, pa.uint64()),
        })


def image_phash_pairs(media_ds, max_hamming: int = 3,
                      codec: Optional[Codec] = None,
                      batch_size: int = 8, concurrency=(1, 4)):
    """Perceptual near-duplicate image pairs: aHash signatures from an
    actor-pool decode stage, then the SAME banded Hamming blocking the text
    simhash path uses (functions.dedup.hamming_sig_pairs) — multimodal
    payloads riding the text-dedup exchange machinery unchanged."""
    from ..functions.dedup import hamming_sig_pairs

    kwargs = {"codec": codec} if codec is not None else {}
    sigs = media_ds.filter(expr="kind == 'image'").map_batches(
        ImageAHashStage, fn_constructor_kwargs=kwargs,
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency)
    return hamming_sig_pairs(sigs.select_columns(["doc_id", "simhash"]),
                             max_hamming=max_hamming)


# --- audio fingerprinting (constellation hashes, Wang 2003 shape) ---

def audio_fingerprint(wav: np.ndarray, frame: int = 512,
                      fan: int = 3) -> np.ndarray:
    """Constellation fingerprint hashes for one clip — the Shazam shape
    (Wang 2003): Hann-windowed rfft power per frame, ONE dominant bin per
    frame (DC skipped), then hashes of the (peak[t], peak[t+d], d)
    landmark pairs for d in 1..fan. Robust to amplitude scaling and
    additive low-level noise because only peak BIN INDICES survive into
    the hash. Pure and shared with the oracle twin; returns the DISTINCT
    hash set (int64)."""
    n = len(wav) // frame
    if n < 2:
        return np.empty(0, np.int64)
    w = np.hanning(frame)
    m = wav[:n * frame].reshape(n, frame).astype(np.float64) * w
    spec = np.abs(np.fft.rfft(m, axis=1)) ** 2
    peaks = (spec[:, 1:].argmax(axis=1) + 1).astype(np.uint64)
    hs = []
    for d in range(1, fan + 1):
        if n <= d:
            break
        h = (peaks[:-d] << np.uint64(24)) \
            ^ (peaks[d:] << np.uint64(4)) ^ np.uint64(d)
        hs.append(h.astype(np.int64))
    if not hs:
        return np.empty(0, np.int64)
    return np.unique(np.concatenate(hs))


class AudioFingerprintStage:
    """Actor-pool stage: decode each audio asset and explode its distinct
    constellation hashes to (asset_id, fh) rows; the matcher then plays
    the usual banded-exchange game on fh. In-band error channel (M31)."""

    def __init__(self, codec: Optional[Codec] = None, frame: int = 512,
                 fan: int = 3):
        self.codec = codec or RawCodec()
        self.frame = frame
        self.fan = fan

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, fhs = [], []
        metas = batch["meta"].to_pylist()
        payloads = batch["payload"].to_pylist()
        for i in range(batch.num_rows):
            aid = batch["asset_id"][i].as_py()
            try:
                wav = np.asarray(
                    self.codec.decode_audio(payloads[i], metas[i]),
                    dtype=np.float64)
                h = audio_fingerprint(wav, self.frame, self.fan)
            except Exception:
                continue  # unmatched assets simply emit no hashes
            ids.extend([aid] * len(h))
            fhs.append(h)
        flat = np.concatenate(fhs) if fhs else np.empty(0, np.int64)
        return pa.table({
            "asset_id": pa.array(ids, pa.string()),
            "fh": pa.array(flat, pa.int64())})


def audio_fingerprint_pairs(ds, min_shared: int = 5,
                            group_cap: int = 16,
                            frame: int = 512, fan: int = 3,
                            codec: Optional[Codec] = None,
                            num_buckets: Optional[int] = None):
    """Near-duplicate audio pairs by shared constellation hashes: decode +
    fingerprint on the actor pool, ONE exchange on bucket(fh) emits
    co-occurring asset pairs per hash (per-hash fan-out capped at
    ``group_cap`` assets — a degenerate hash shared by everything would
    otherwise emit O(n^2); drops are deterministic lexicographic, same
    rule both sides), then a bucketed pair-count sum keeps pairs sharing
    >= min_shared hashes. Output (asset_a, asset_b, shared)."""
    kwargs = {"codec": codec, "frame": frame, "fan": fan} \
        if codec is not None else {"frame": frame, "fan": fan}

    fps = ds.filter(expr="kind == 'audio'").map_batches(
        AudioFingerprintStage, fn_constructor_kwargs=kwargs,
        batch_format="pyarrow", batch_size=8, concurrency=(1, 4))
    return shared_hash_pairs(fps, min_shared=min_shared,
                             group_cap=group_cap, num_buckets=num_buckets)


def shared_hash_pairs(fps, min_shared: int = 5, group_cap: int = 16,
                      num_buckets: Optional[int] = None):
    """Generic landmark matcher over (asset_id, fh) rows — shared by the
    audio-constellation and video-clip paths: ONE exchange on bucket(fh)
    emits co-occurring asset pairs per hash (per-hash fan-out capped at
    group_cap in lexicographic order, same rule as the oracle replay),
    then a bucketed pair-count sum keeps pairs sharing >= min_shared
    hashes. Output (asset_a, asset_b, shared)."""
    from ..sharding import auto_buckets, bucket_of_ints
    from ..functions.agg import bucketed_group_sum_multi

    nb = num_buckets or auto_buckets(None)

    def add_pkey(b: pa.Table) -> pa.Table:
        fh = b["fh"].to_numpy(zero_copy_only=False)
        return b.append_column(
            "pkey", pa.array(bucket_of_ints(fh, nb), pa.int64()))

    def copairs(g: pa.Table) -> pa.Table:
        g = g.combine_chunks()
        fh = g["fh"].to_numpy(zero_copy_only=False)
        aid = np.asarray(g["asset_id"].to_pylist(), dtype=object)
        order = np.lexsort((aid, fh))
        fh, aid = fh[order], aid[order]
        starts = np.flatnonzero(np.r_[True, fh[1:] != fh[:-1]]) \
            if len(fh) else np.empty(0, np.int64)
        ends = np.r_[starts[1:], len(fh)] if len(fh) else starts
        out_a, out_b = [], []
        for s, e in zip(starts, ends):
            members = aid[s:min(e, s + group_cap)]
            for x in range(len(members)):
                for y in range(x + 1, len(members)):
                    out_a.append(members[x])
                    out_b.append(members[y])
        return pa.table({
            "asset_a": pa.array(out_a, pa.string()),
            "asset_b": pa.array(out_b, pa.string()),
            "shared": pa.array(np.ones(len(out_a), np.int64), pa.int64())})

    counted = bucketed_group_sum_multi(
        fps.map_batches(add_pkey, batch_format="pyarrow")
        .groupby("pkey").map_groups(copairs, batch_format="pyarrow"),
        ["asset_a", "asset_b"], ["shared"])
    return counted.filter(expr=f"shared >= {int(min_shared)}")


def synth_audio_neardup_table(n_assets: int = 30,
                              seed: int = 7) -> pa.Table:
    """Deterministic REAL-WAV media table with planted NEAR-duplicates:
    each base asset is a 16-segment sine melody encoded as PCM16 WAV; every 4th
    asset replays the previous asset's sines at 0.8x amplitude with
    additive noise (sigma 0.005) — different bytes, same spectral
    landmarks, so only the fingerprint path (not payload equality) can
    pair them. Shared by the Ray query and its oracle dump."""
    rng = np.random.default_rng(seed)
    rows = []
    seg = 512
    n_seg = 16
    n_samp = seg * n_seg
    ts = np.arange(seg, dtype=np.float64)
    prev = None
    for i in range(n_assets):
        if i % 4 == 3 and prev is not None:
            sig = prev * 0.8 + rng.normal(0, 0.005, size=n_samp)
        else:
            # a "melody": each 512-sample segment has its own dominant
            # tone, so the per-frame peak track varies and the
            # constellation is rich (a constant spectrum would collapse
            # to fan-out many identical landmarks)
            melody = rng.integers(5, 200, size=n_seg)
            sig = np.concatenate([
                0.4 * np.sin(2 * np.pi * int(f) * ts / seg)
                for f in melody])
            prev = sig
        payload = encode_wav_pcm16(np.clip(sig, -1, 1), 16000)
        rows.append({
            "asset_id": f"clip-{i:05d}",
            "kind": "audio",
            "payload": payload,
            "meta": {"format": "wav", "width": 0, "height": 0,
                     "sample_rate": 16000, "n_frames": 0},
        })
    return pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA)


# --- video clip-containment detection (per-frame aHash landmarks) ---

def video_frame_sigs(frames) -> np.ndarray:
    """Per-frame 64-bit aHash landmark set for one video (the same
    block-mean aHash ImageAHashStage uses, applied frame-wise). A clip
    cut from a longer video shares byte-identical frames, so its
    landmark set is a subset of the source's. Pure, shared with the
    oracle twin; returns DISTINCT int64 hashes."""
    sigs = []
    for f in frames:
        luma = (f.astype(np.uint32).sum(axis=2) // 3).astype(np.uint8)
        small = _resize_nn(luma[..., None], 8, 8)[..., 0]
        bits = (small.astype(np.int64)
                > int(small.astype(np.int64).mean())).ravel()
        sig = np.uint64(0)
        for b in np.flatnonzero(bits):
            sig |= np.uint64(1) << np.uint64(b)
        sigs.append(np.int64(sig.astype(np.int64)))
    if not sigs:
        return np.empty(0, np.int64)
    return np.unique(np.asarray(sigs, dtype=np.int64))


class VideoFrameSigStage:
    """Actor-pool stage: decode EVERY frame (stride 1 — containment needs
    the full track) and explode the distinct frame-hash landmarks to
    (asset_id, fh) rows for shared_hash_pairs."""

    def __init__(self, codec: Optional[Codec] = None):
        self.codec = codec or RawCodec()

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, fhs = [], []
        metas = batch["meta"].to_pylist()
        payloads = batch["payload"].to_pylist()
        for i in range(batch.num_rows):
            aid = batch["asset_id"][i].as_py()
            try:
                frames = self.codec.decode_video_frames(
                    payloads[i], metas[i], 1)
                h = video_frame_sigs(frames)
            except Exception:
                continue
            ids.extend([aid] * len(h))
            fhs.append(h)
        flat = np.concatenate(fhs) if fhs else np.empty(0, np.int64)
        return pa.table({
            "asset_id": pa.array(ids, pa.string()),
            "fh": pa.array(flat, pa.int64())})


def video_clip_pairs(ds, min_shared: int = 5, group_cap: int = 16,
                     codec: Optional[Codec] = None,
                     num_buckets: Optional[int] = None):
    """Clip-containment pairs: videos sharing >= min_shared distinct
    frame aHashes (a cut/trim of a source video re-uses its frames
    byte-for-byte; re-encoded near-dups would need Hamming-tolerant
    matching — image_phash_pairs' banded exchange is the template)."""
    kwargs = {"codec": codec} if codec is not None else {}
    fps = ds.filter(expr="kind == 'video'").map_batches(
        VideoFrameSigStage, fn_constructor_kwargs=kwargs,
        batch_format="pyarrow", batch_size=8, concurrency=(1, 4))
    return shared_hash_pairs(fps, min_shared=min_shared,
                             group_cap=group_cap, num_buckets=num_buckets)


def synth_video_clip_table(n_assets: int = 30, seed: int = 9) -> pa.Table:
    """Deterministic raw-rgb24 video table with planted CLIPS: every 4th
    asset is frames [4, 12) of the previous asset (byte-identical
    sub-range, different asset) — the containment case only frame-level
    landmarks can pair. 16 frames of 32x32 structured noise per base."""
    rng = np.random.default_rng(seed)
    rows = []
    h = w = 32
    prev = None
    for i in range(n_assets):
        if i % 4 == 3 and prev is not None:
            frames = prev[4 * h * w * 3:12 * h * w * 3]
        else:
            # per-frame random block pattern (distinct aHash per frame)
            fr = []
            for _ in range(16):
                base = rng.integers(0, 256, size=(4, 4, 3), dtype=np.uint8)
                fr.append(np.repeat(np.repeat(base, 8, 0), 8, 1))
            frames = np.concatenate([f.ravel() for f in fr]) \
                .astype(np.uint8).tobytes()
            prev = frames
        rows.append({
            "asset_id": f"vid-{i:05d}",
            "kind": "video",
            "payload": frames,
            "meta": {"format": "rgb24", "width": w, "height": h,
                     "sample_rate": 0, "n_frames": len(frames)
                     // (h * w * 3)},
        })
    return pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA)
