"""System-library codec adapters (stages/syscodecs.py) and the
cross-implementation INTEROP tier they unlock:

- lossy VP8 WebP decode (the one format whose from-scratch decoder is
  out of scope) routed through the real libwebp, exercised on a REAL
  libwebp-minted bitstream and on the public CPython test fixture
  (Lib/test/test_email/data/python.webp — a VP8X + ALPH + VP8 file);
- the from-scratch VP8L codec validated BOTH directions against real
  libwebp (our encoder's bytes decoded by libwebp; libwebp's bytes
  decoded by us) — spec interop, not just self round-trip;
- the from-scratch PNG codec validated both directions against real
  libpng (simplified png_image API).

Everything here skips cleanly when the shared libraries are absent, so
the suite stays green in stripped containers; in THIS container both
libraries exist and the tests run live.
"""
import os

import numpy as np
import pytest

from documentprocessor_ray.stages import syscodecs as SC
from documentprocessor_ray.stages.multimodal import (
    RealCodec, _png_decode, _webp_decode, encode_png, encode_webp_lossless)

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                       "python_cpython_testdata.webp")

needs_webp = pytest.mark.skipif(not SC.libwebp_available(),
                                reason="system libwebp not present")
needs_png = pytest.mark.skipif(not SC.libpng_available(),
                               reason="system libpng not present")


def _img(seed: int, h: int, w: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    # smooth-ish content so lossy coding stays near the original
    base = rng.integers(0, 256, (max(h // 8, 1), max(w // 8, 1), 3))
    img = np.kron(base, np.ones((8, 8, 1))).astype(np.int64)[:h, :w]
    img += rng.integers(-6, 7, img.shape)
    return np.clip(img, 0, 255).astype(np.uint8)


@needs_webp
class TestLossyVP8:
    def test_real_vp8_bitstream_decodes(self):
        # mint a genuine lossy VP8 file with the real encoder, decode it
        # through the production seam (RealCodec -> _webp_decode ->
        # syscodecs) and check fidelity against the source image
        img = _img(3, 96, 80)
        data = SC.webp_encode_rgb(img, quality=92.0)
        assert data[12:16] == b"VP8 "  # lossy chunk, not VP8L
        out = RealCodec().decode_image(data, {})
        assert out.shape == img.shape and out.dtype == np.uint8
        mse = float(np.mean((out.astype(np.float64) - img) ** 2))
        psnr = 10 * np.log10(255.0 ** 2 / max(mse, 1e-9))
        assert psnr > 20.0, psnr  # noisy blocky content; q92 lands ~24 dB

    def test_cpython_public_fixture(self):
        # CPython's Lib/test/test_email/data/python.webp: VP8X container
        # with an ALPH chunk and a 16x16 lossy VP8 frame
        data = open(FIXTURE, "rb").read()
        assert b"VP8X" in data[:16] and b"VP8 " in data
        rgb = _webp_decode(data)
        assert rgb.shape == (16, 16, 3) and rgb.dtype == np.uint8
        rgba = SC.webp_decode_rgba(data)
        assert rgba.shape == (16, 16, 4)
        # the Python logo has transparent corners: ALPH plane is real
        assert rgba[..., 3].min() == 0 and rgba[..., 3].max() == 255
        # decode is deterministic
        assert (SC.webp_decode_rgba(data) == rgba).all()

    def test_decode_matches_library_reference(self):
        # the seam returns exactly what the library returns (no channel
        # swizzle / stride bug in the adapter)
        img = _img(11, 40, 56)
        data = SC.webp_encode_rgb(img, quality=75.0)
        assert (_webp_decode(data) == SC.webp_decode_rgb(data)).all()


@needs_webp
class TestVP8LInterop:
    def test_our_encoder_read_by_real_libwebp(self):
        for seed, kw in ((1, {}), (2, {"subtract_green": True}),
                         (3, {"cache_bits": 5, "rle": True})):
            img = _img(seed, 21, 34)
            ours = encode_webp_lossless(img, **kw)
            assert (SC.webp_decode_rgb(ours) == img).all(), kw

    def test_real_libwebp_bytes_read_by_our_decoder(self):
        for seed, (h, w) in ((5, (17, 23)), (6, (64, 48)), (7, (1, 1))):
            img = _img(seed, h, w)
            theirs = SC.webp_encode_lossless_rgb(img)
            assert theirs[12:16] == b"VP8L"
            assert (_webp_decode(theirs) == img).all()

    def test_gradient_and_flat_content(self):
        # content classes that push libwebp into predictor/color-cache
        # paths our round-trip-only tests never minted
        g = np.linspace(0, 255, 48 * 32 * 3) \
            .reshape(48, 32, 3).astype(np.uint8)
        assert (_webp_decode(SC.webp_encode_lossless_rgb(g)) == g).all()
        flat = np.full((33, 19, 3), 77, np.uint8)
        flat[10:20, 5:9] = (1, 2, 3)
        assert (_webp_decode(SC.webp_encode_lossless_rgb(flat))
                == flat).all()


@needs_png
class TestPNGInterop:
    def test_our_encoder_read_by_real_libpng(self):
        for ft in (0, 1, 2):
            img = _img(20 + ft, 29, 31)
            assert (SC.png_read_rgb(encode_png(img, filter_type=ft))
                    == img).all(), ft

    def test_real_libpng_bytes_read_by_our_decoder(self):
        for seed, (h, w) in ((30, (25, 25)), (31, (3, 200)),
                             (32, (128, 2))):
            img = _img(seed, h, w)
            theirs = SC.png_write_rgb(img)
            assert theirs[:8] == b"\x89PNG\r\n\x1a\n"
            assert (_png_decode(theirs) == img).all()

    def test_adversarial_content(self):
        # rows libpng will choose Paeth/Average filters for
        rng = np.random.default_rng(44)
        img = np.cumsum(rng.integers(0, 3, (40, 40, 3)), axis=1) \
            .astype(np.uint8)
        assert (_png_decode(SC.png_write_rgb(img)) == img).all()


class TestGuards:
    def test_absent_library_raises_not_implemented(self, monkeypatch):
        monkeypatch.setattr(SC, "_webp_lib", None)
        monkeypatch.setattr(SC, "_webp_tried", True)
        with pytest.raises(NotImplementedError):
            SC.webp_decode_rgb(b"RIFF\x00\x00\x00\x00WEBPVP8 ")
        assert not SC.libwebp_available()

    def test_vp8_route_guard_message(self, monkeypatch):
        monkeypatch.setattr(SC, "_webp_lib", None)
        monkeypatch.setattr(SC, "_webp_tried", True)
        riff = b"WEBPVP8 " + (8).to_bytes(4, "little") + b"\x00" * 8
        data = b"RIFF" + len(riff).to_bytes(4, "little") + riff
        with pytest.raises(NotImplementedError, match="libwebp"):
            _webp_decode(data)


needs_gif = pytest.mark.skipif(not SC.libgif_available(),
                               reason="system libgif not present")


@needs_gif
class TestGIFInterop:
    def _pal_img(self, seed: int, h: int, w: int,
                 ncolors: int) -> np.ndarray:
        rng = np.random.default_rng(seed)
        pal = rng.integers(0, 256, (ncolors, 3), dtype=np.uint8)
        return pal[rng.integers(0, ncolors, (h, w))]

    def test_our_encoder_read_by_real_giflib(self):
        from documentprocessor_ray.stages.multimodal import encode_gif

        for seed, (h, w, nc) in ((1, (13, 17, 6)), (2, (40, 3, 250)),
                                 (3, (1, 64, 2))):
            img = self._pal_img(seed, h, w, nc)
            assert (SC.gif_decode_rgb(encode_gif(img)) == img).all(), seed

    def test_real_giflib_bytes_read_by_our_decoder(self):
        from documentprocessor_ray.stages.multimodal import _gif_decode

        for seed, (h, w, nc) in ((4, (21, 34, 16)), (5, (7, 7, 255)),
                                 (6, (64, 2, 3))):
            img = self._pal_img(seed, h, w, nc)
            theirs = SC.gif_encode_rgb(img)
            assert theirs[:6] in (b"GIF87a", b"GIF89a")
            assert (_gif_decode(theirs) == img).all(), seed

    def test_too_many_colors_rejected(self):
        rng = np.random.default_rng(9)
        img = rng.integers(0, 256, (30, 30, 3), dtype=np.uint8)
        assert len(np.unique(img.reshape(-1, 3), axis=0)) > 256
        with pytest.raises(ValueError, match="256"):
            SC.gif_encode_rgb(img)

    def test_corrupt_gif_raises(self):
        with pytest.raises(ValueError):
            SC.gif_decode_rgb(b"GIF89a" + b"\x00" * 4)


needs_tiff = pytest.mark.skipif(not SC.libtiff_available(),
                                reason="system libtiff not present")


@needs_tiff
class TestTIFFInterop:
    def test_real_libtiff_bytes_read_by_our_decoder(self):
        """Every (compression, predictor) leg our decoder claims,
        exercised on REAL libtiff-minted multi-strip files — incl. the
        new TIFF-LZW early-change path and predictor=2 differencing."""
        from documentprocessor_ray.stages.multimodal import _tiff_decode

        rng = np.random.default_rng(50)
        img = rng.integers(0, 256, (70, 90, 3), dtype=np.uint8)
        for comp, preds in (("none", (1,)), ("lzw", (1, 2)),
                            ("deflate", (1, 2)), ("packbits", (1,))):
            for pred in preds:
                theirs = SC.tiff_encode_rgb(img, compression=comp,
                                            predictor=pred,
                                            rows_per_strip=16)
                assert (_tiff_decode(theirs) == img).all(), (comp, pred)

    def test_lzw_twelve_bit_codes(self):
        """A big noisy image pushes the LZW table past 2047 entries —
        the 12-bit width and the early-change boundaries all fire."""
        from documentprocessor_ray.stages.multimodal import _tiff_decode

        rng = np.random.default_rng(51)
        img = rng.integers(0, 256, (220, 320, 3), dtype=np.uint8)
        theirs = SC.tiff_encode_rgb(img, compression="lzw",
                                    rows_per_strip=220)
        assert (_tiff_decode(theirs) == img).all()

    def test_our_encoder_read_by_real_libtiff(self):
        from documentprocessor_ray.stages.multimodal import encode_tiff

        rng = np.random.default_rng(52)
        img = rng.integers(0, 256, (33, 47, 3), dtype=np.uint8)
        for pk in (False, True):
            assert (SC.tiff_decode_rgb(encode_tiff(img, packbits=pk))
                    == img).all(), pk

    def test_guards(self):
        rng = np.random.default_rng(53)
        img = rng.integers(0, 256, (4, 4, 3), dtype=np.uint8)
        with pytest.raises(ValueError, match="compression"):
            SC.tiff_encode_rgb(img, compression="jpeg")
        with pytest.raises(ValueError, match="predictor"):
            SC.tiff_encode_rgb(img, compression="packbits", predictor=2)
        with pytest.raises(ValueError):
            SC.tiff_decode_rgb(b"II*\x00" + b"\x00" * 8)


class TestTiffLZWKernel:
    """The pure TIFF-LZW kernel (multimodal._tiff_lzw_decode) without
    libtiff: hand-built streams for clear/rebuild and the KwKwK case."""

    def _emit(self, codes, widths):
        bits = "".join(format(c, f"0{w}b") for c, w in zip(codes, widths))
        bits += "0" * (-len(bits) % 8)
        return bytes(int(bits[i:i + 8], 2) for i in range(0, len(bits), 8))

    def test_simple_stream(self):
        from documentprocessor_ray.stages.multimodal import \
            _tiff_lzw_decode

        # CLEAR, 'A', 'B', <258>='AB', EOI
        data = self._emit([256, 65, 66, 258, 257], [9] * 5)
        assert _tiff_lzw_decode(data) == b"ABAB"

    def test_kwkwk_self_reference(self):
        from documentprocessor_ray.stages.multimodal import \
            _tiff_lzw_decode

        # CLEAR, 'A', <258> (not yet in table -> prev+prev[0]), EOI
        data = self._emit([256, 65, 258, 257], [9] * 4)
        assert _tiff_lzw_decode(data) == b"AAA"

    def test_corrupt_code_gap_raises(self):
        from documentprocessor_ray.stages.multimodal import \
            _tiff_lzw_decode

        data = self._emit([256, 65, 300, 257], [9] * 4)
        with pytest.raises(ValueError, match="corrupt"):
            _tiff_lzw_decode(data)


class TestTiffLZWEncoder:
    def test_roundtrip_and_clear_boundary(self):
        from documentprocessor_ray.stages.multimodal import (
            _tiff_lzw_decode, _tiff_lzw_encode)

        rng = np.random.default_rng(60)
        # random 64 KiB crosses the 4094-entry CLEAR reset repeatedly
        raw = rng.integers(0, 256, 65536, dtype=np.uint8).tobytes()
        assert _tiff_lzw_decode(_tiff_lzw_encode(raw)) == raw
        # highly repetitive data exercises long table-hit chains
        rep = (b"abcabcabd" * 3000)[:20011]
        enc = _tiff_lzw_encode(rep)
        assert _tiff_lzw_decode(enc) == rep
        assert len(enc) < len(rep) // 3  # actually compresses

    @needs_tiff
    def test_libtiff_reads_our_lzw(self):
        from documentprocessor_ray.stages.multimodal import encode_tiff

        rng = np.random.default_rng(61)
        img = rng.integers(0, 256, (90, 130, 3), dtype=np.uint8)
        assert (SC.tiff_decode_rgb(encode_tiff(img, lzw=True))
                == img).all()
