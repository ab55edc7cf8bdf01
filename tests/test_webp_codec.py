"""WebP lossless (VP8L) codec: encoder/decoder round-trips for every
decoder path, plus hand-crafted bitstreams for the paths the minimal
encoder does not emit (palette, predictor, color transform, simple codes,
code-length repeats, max_symbol)."""

import numpy as np
import pytest

from documentprocessor_ray.stages.multimodal import (
    _LsbWriter, _put_literal_codes, _put_pixels, _vp8l_sub, _webp_decode,
    encode_webp_lossless)


def _wrap(payload: bytes) -> bytes:
    chunk = b"VP8L" + len(payload).to_bytes(4, "little") + payload
    if len(payload) & 1:
        chunk += b"\x00"
    riff = b"WEBP" + chunk
    return b"RIFF" + len(riff).to_bytes(4, "little") + riff


def _header(bw: _LsbWriter, w: int, h: int) -> None:
    bw.put(w - 1, 14)
    bw.put(h - 1, 14)
    bw.put(0, 1)
    bw.put(0, 3)


def _argb(rgb: np.ndarray) -> np.ndarray:
    r = rgb[:, :, 0].astype(np.int64)
    g = rgb[:, :, 1].astype(np.int64)
    b = rgb[:, :, 2].astype(np.int64)
    return ((np.int64(255) << 24) | (r << 16) | (g << 8) | b) \
        .astype(np.uint32).reshape(-1)


class TestRoundTrip:
    def test_plain_and_feature_flags(self):
        rng = np.random.default_rng(11)
        img = rng.integers(0, 256, (14, 11, 3), dtype=np.uint8)
        for kw in ({}, {"subtract_green": True}, {"cache_bits": 5},
                   {"rle": True}, {"meta": True},
                   {"subtract_green": True, "cache_bits": 4, "rle": True,
                    "meta": True}):
            out = _webp_decode(encode_webp_lossless(img, **kw))
            assert (out == img).all(), kw

    def test_runs_and_gray(self):
        img = np.zeros((9, 31, 3), np.uint8)
        img[3:6] = 200
        img[:, 5] = 17
        out = _webp_decode(encode_webp_lossless(img, rle=True,
                                                cache_bits=3))
        assert (out == img).all()
        g = np.arange(49, dtype=np.uint8).reshape(7, 7)
        out = _webp_decode(encode_webp_lossless(g))
        assert (out == np.stack([g] * 3, axis=2)).all()

    def test_odd_sizes(self):
        rng = np.random.default_rng(3)
        for shape in ((1, 1, 3), (1, 17, 3), (23, 1, 3), (5, 64, 3)):
            img = rng.integers(0, 256, shape, dtype=np.uint8)
            assert (_webp_decode(encode_webp_lossless(img)) == img).all()


class TestHandCraftedStreams:
    def test_simple_codes(self):
        """green = simple 2-symbol code, r/b/a/dist = simple 1-symbol
        codes: a 2x1 image of two solid colors."""
        bw = _LsbWriter()
        _header(bw, 2, 1)
        bw.put(0, 1)  # no transforms
        bw.put(0, 1)  # no cache
        bw.put(0, 1)  # no meta
        # green: simple, 2 symbols, first as 8 bits: 40 and 200
        bw.put(1, 1)
        bw.put(1, 1)
        bw.put(1, 1)
        bw.put(40, 8)
        bw.put(200, 8)
        # red, blue, alpha: simple single-symbol (8-bit) codes
        for val in (10, 20, 255):
            bw.put(1, 1)
            bw.put(0, 1)
            bw.put(1, 1)
            bw.put(val, 8)
        # distance: simple single-symbol code (1-bit symbol 0)
        bw.put(1, 1)
        bw.put(0, 1)
        bw.put(0, 1)
        bw.put(0, 1)
        # pixels: green 40 (code 0) then green 200 (code 1); r/b/a free
        bw.put(0, 1)
        bw.put(1, 1)
        out = _webp_decode(_wrap(b"\x2f" + bw.getvalue()))
        assert out.shape == (1, 2, 3)
        assert out[0, 0].tolist() == [10, 40, 20]
        assert out[0, 1].tolist() == [10, 200, 20]

    def test_code_length_repeats_and_max_symbol(self):
        """green lengths via 16-repeats and 18 zero-runs under a
        max_symbol cap; uniform-8 literal code over 256 symbols."""
        bw = _LsbWriter()
        _header(bw, 3, 1)
        bw.put(0, 1)
        bw.put(0, 1)
        bw.put(0, 1)
        # green: normal code; code-length code over {8:1, 16:2, 18:2}
        order = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12,
                 13, 14, 15]
        n = order.index(8) + 1  # 12 entries covers 17,18,16 and 8
        bw.put(0, 1)
        bw.put(n - 4, 4)
        lens = {8: 1, 16: 2, 18: 2}
        for i in range(n):
            bw.put(lens.get(order[i], 0), 3)
        # canonical over {8:len1, 16:len2, 18:len2}: 8->0, 16->10, 18->11
        bw.put(1, 1)           # use max_symbol
        bw.put(4, 3)           # length_nbits = 2 + 2*4 = 10
        # max_symbol counts code-length READS: 1 literal + 43 repeats
        bw.put(42, 10)         # max_symbol = 2 + 42 = 44
        bw.put_code(0, 1)      # sym 8: length 8 for symbol 0
        reps = 0
        while reps < 255:
            bw.put_code(0b10, 2)   # 16: repeat previous length
            todo = min(6, 255 - reps)
            bw.put(todo - 3, 2)    # 3 + rb
            reps += todo
        # loop then stops at max_symbol; symbols 256..279 stay length 0
        # r/b/a single-symbol, distance single-symbol
        for val in (1, 2, 255):
            bw.put(1, 1)
            bw.put(0, 1)
            bw.put(1, 1)
            bw.put(val, 8)
        bw.put(1, 1)
        bw.put(0, 1)
        bw.put(0, 1)
        bw.put(0, 1)
        for gv in (0, 7, 255):
            bw.put_code(gv, 8)
        out = _webp_decode(_wrap(b"\x2f" + bw.getvalue()))
        assert out[0, :, 1].tolist() == [0, 7, 255]
        assert (out[0, :, 0] == 1).all() and (out[0, :, 2] == 2).all()

    def test_palette_transform(self):
        """Color-indexing with 3 colors -> 2-bit packed indices."""
        colors = np.array([[250, 10, 30], [0, 128, 255], [77, 77, 77]],
                          np.uint8)
        idx = np.array([[0, 1, 2, 1, 0, 2], [2, 2, 1, 0, 0, 1]], np.int64)
        h, w = idx.shape
        bw = _LsbWriter()
        _header(bw, w, h)
        bw.put(1, 1)
        bw.put(3, 2)           # color indexing
        bw.put(3 - 1, 8)       # n_colors - 1
        # palette sub-image: 3 pixels, component-delta coded
        pal_argb = _argb(colors.reshape(1, 3, 3)).astype(np.int64)
        deltas = [pal_argb[0]]
        for i in (1, 2):
            d = 0
            for sh in (0, 8, 16, 24):
                d |= (((pal_argb[i] >> sh) - (pal_argb[i - 1] >> sh))
                      & 0xFF) << sh
            deltas.append(d)
        bw.put(0, 1)           # sub-image: no cache
        _put_literal_codes(bw, 0)
        _put_pixels(bw, np.array(deltas, np.uint32), 0, False)
        bw.put(0, 1)           # no more transforms
        bw.put(0, 1)           # no cache
        bw.put(0, 1)           # no meta
        # packed image: width sub(6,1)=3, 2 indices per green byte? no:
        # <=4 colors -> wbits=2 -> 4 px/byte, 2 bits each, LSB-first
        pw = _vp8l_sub(w, 2)
        packed = np.zeros((h, pw), np.int64)
        for y in range(h):
            for x in range(w):
                packed[y, x >> 2] |= idx[y, x] << ((x & 3) * 2)
        pix = ((np.int64(255) << 24) | (packed << 8)).astype(np.uint32)
        _put_literal_codes(bw, 0)
        _put_pixels(bw, pix.reshape(-1), 0, False)
        out = _webp_decode(_wrap(b"\x2f" + bw.getvalue()))
        exp = colors[idx]
        assert (out == exp).all()

    def test_predictor_transform(self):
        """Predictor transform, constant mode 2 (= top) at 4x4 blocks."""
        rng = np.random.default_rng(7)
        img = rng.integers(0, 256, (6, 5, 3), dtype=np.uint8)
        h, w = img.shape[:2]
        px = _argb(img).reshape(h, w).astype(np.int64)
        res = np.zeros_like(px)
        for y in range(h):
            for x in range(w):
                if x == 0 and y == 0:
                    pred = 0xFF000000
                elif y == 0:
                    pred = px[0, x - 1]
                elif x == 0:
                    pred = px[y - 1, 0]
                else:
                    pred = px[y - 1, x]  # mode 2: top
                d = 0
                for sh in (0, 8, 16, 24):
                    d |= (((px[y, x] >> sh) - (pred >> sh)) & 0xFF) << sh
                res[y, x] = d
        bw = _LsbWriter()
        _header(bw, w, h)
        bw.put(1, 1)
        bw.put(0, 2)           # predictor
        bw.put(0, 3)           # size_bits = 2 -> 4x4 blocks
        tw, th = _vp8l_sub(w, 2), _vp8l_sub(h, 2)
        mode_img = np.full(tw * th, (255 << 24) | (2 << 8), np.uint32)
        bw.put(0, 1)
        _put_literal_codes(bw, 0)
        _put_pixels(bw, mode_img, 0, False)
        bw.put(0, 1)           # no more transforms
        bw.put(0, 1)
        bw.put(0, 1)
        _put_literal_codes(bw, 0)
        _put_pixels(bw, res.reshape(-1).astype(np.uint32), 0, False)
        out = _webp_decode(_wrap(b"\x2f" + bw.getvalue()))
        assert (out == img).all()

    def test_color_transform(self):
        """Constant color-transform element (g2r=16, g2b=8, r2b=4)."""
        rng = np.random.default_rng(13)
        img = rng.integers(0, 256, (5, 7, 3), dtype=np.uint8)
        h, w = img.shape[:2]

        def s8(v):
            return (int(v) ^ 0x80) - 0x80

        g2r, g2b, r2b = 16, 8, 4
        res = np.zeros((h, w), np.int64)
        for y in range(h):
            for x in range(w):
                r, g, b = map(int, img[y, x])
                rr = (r - ((s8(g2r) * s8(g)) >> 5)) & 0xFF
                bb = (b - ((s8(g2b) * s8(g)) >> 5)
                      - ((s8(r2b) * s8(r)) >> 5)) & 0xFF
                res[y, x] = (255 << 24) | (rr << 16) | (g << 8) | bb
        bw = _LsbWriter()
        _header(bw, w, h)
        bw.put(1, 1)
        bw.put(1, 2)           # color transform
        bw.put(1, 3)           # size_bits = 3 -> 8x8 blocks
        tw, th = _vp8l_sub(w, 3), _vp8l_sub(h, 3)
        te = (255 << 24) | (r2b << 16) | (g2b << 8) | g2r
        bw.put(0, 1)
        _put_literal_codes(bw, 0)
        _put_pixels(bw, np.full(tw * th, te, np.uint32), 0, False)
        bw.put(0, 1)
        bw.put(0, 1)
        bw.put(0, 1)
        _put_literal_codes(bw, 0)
        _put_pixels(bw, res.reshape(-1).astype(np.uint32), 0, False)
        out = _webp_decode(_wrap(b"\x2f" + bw.getvalue()))
        assert (out == img).all()


class TestRealCodecRouting:
    def test_autocodec_routes_webp(self):
        from documentprocessor_ray.stages.multimodal import RealCodec

        rng = np.random.default_rng(2)
        img = rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)
        out = RealCodec().decode_image(
            encode_webp_lossless(img, subtract_green=True), {})
        assert (out == img).all()

    def test_real_vp8x_container_routes_to_lossy_path(self):
        """A REAL libwebp-encoded file (CPython's test corpus: VP8X
        extended container + ALPH chunk + lossy VP8 frame) must route
        through the RIFF walker to the lossy-VP8 path: the system
        libwebp adapter when present (tests/test_syscodecs.py covers
        the decode itself), the honest guard error otherwise."""
        import os

        from documentprocessor_ray.stages import syscodecs as SC

        path = os.path.join(os.path.dirname(__file__), "fixtures",
                            "python_cpython_testdata.webp")
        data = open(path, "rb").read()
        if SC.libwebp_available():
            out = _webp_decode(data)
            assert out.shape == (16, 16, 3) and out.dtype == np.uint8
        else:
            with pytest.raises(NotImplementedError, match="libwebp"):
                _webp_decode(data)

    def test_lossy_vp8_guard_without_library(self, monkeypatch):
        from documentprocessor_ray.stages import syscodecs as SC

        monkeypatch.setattr(SC, "_webp_lib", None)
        monkeypatch.setattr(SC, "_webp_tried", True)
        payload = b"RIFF" + (20).to_bytes(4, "little") + b"WEBP" + \
            b"VP8 " + (4).to_bytes(4, "little") + b"\x00\x00\x00\x00"
        with pytest.raises(NotImplementedError):
            _webp_decode(payload)

    def test_short_distance_map_above_pixel(self):
        """dist_code 1 -> neighbor (0, 1): copy the pixel directly above
        (spec short-distance map, r4 VERDICT codec-gap item)."""
        from documentprocessor_ray.stages.multimodal import _green_code

        bw = _LsbWriter()
        _header(bw, 4, 2)
        bw.put(0, 1)
        bw.put(0, 1)
        bw.put(0, 1)
        _put_literal_codes(bw, 0)
        for gval in (10, 20, 30, 40):
            c, n = _green_code(gval, 0)
            bw.put_code(c, n)
            bw.put_code(5, 8)    # red
            bw.put_code(6, 8)    # blue
            bw.put_code(255, 8)  # alpha
        c, n = _green_code(256 + 3, 0)  # length sym 3 -> length 4
        bw.put_code(c, n)
        bw.put_code(0, 5)  # dist sym 0 -> dist_code 1 -> (0, 1)
        out = _webp_decode(_wrap(b"\x2f" + bw.getvalue()))
        assert out.shape == (2, 4, 3)
        for x, g in enumerate((10, 20, 30, 40)):
            assert out[0, x].tolist() == [5, g, 6]
        assert (out[1] == out[0]).all()

    def test_short_distance_map_prev_pixel(self):
        """dist_code 2 -> neighbor (1, 0): distance 1, i.e. run of the
        previous pixel."""
        from documentprocessor_ray.stages.multimodal import _green_code

        bw = _LsbWriter()
        _header(bw, 4, 1)
        bw.put(0, 1)
        bw.put(0, 1)
        bw.put(0, 1)
        _put_literal_codes(bw, 0)
        c, n = _green_code(7, 0)
        bw.put_code(c, n)
        bw.put_code(1, 8)
        bw.put_code(2, 8)
        bw.put_code(255, 8)
        c, n = _green_code(256 + 2, 0)  # length sym 2 -> length 3
        bw.put_code(c, n)
        bw.put_code(1, 5)  # dist sym 1 -> dist_code 2 -> (1, 0)
        out = _webp_decode(_wrap(b"\x2f" + bw.getvalue()))
        assert out.shape == (1, 4, 3)
        assert (out == np.array([1, 7, 2], np.uint8)).all()

    def test_dist_map_matches_spec_table(self):
        """The generated neighbor map must reproduce the spec's published
        120-entry table: spot-check the documented head and the d=25/26
        tie-break runs, plus the structural invariants."""
        from documentprocessor_ray.stages.multimodal import _VP8L_DIST_MAP

        m = [tuple(p) for p in _VP8L_DIST_MAP]
        assert len(m) == 120 and len(set(m)) == 120
        assert m[:10] == [(0, 1), (1, 0), (1, 1), (-1, 1), (0, 2),
                          (2, 0), (1, 2), (-1, 2), (2, 1), (-2, 1)]
        assert m[34:40] == [(0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3),
                            (5, 0)]
        assert m[40:44] == [(1, 5), (-1, 5), (5, 1), (-5, 1)]
        ds = [dx * dx + dy * dy for dx, dy in m]
        assert ds == sorted(ds)
        assert all(0 <= dy <= 7 and -7 <= dx <= 8 for dx, dy in m)
