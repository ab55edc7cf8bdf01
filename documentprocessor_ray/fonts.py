"""Deterministic bitmap glyph font (pure numpy, no PIL).

Each printable character maps to a 5x7 binary glyph derived from SHA-256 of
the character — fully deterministic across platforms/processes, which makes
rendered pages and the template-matching OCR kernel exactly reproducible
(the determinism requirement of SURVEY.md section 7.4). The four cell corners
are forced ON so every glyph's ink bounding box equals its layout cell, making
word pixel boxes analytically known.

Glyphs are verified pairwise-distinct at import (hamming distance >= 1; with
35 random bits collisions are ~impossible, but we check).

Rendered geometry (render.py) mirrors the reference integration fixture
(Ocr/tests/test_cli_integration.py:52-68): 400x600 white page, text lines
starting at x=20, y=20, line step 30.
"""

from __future__ import annotations

import hashlib

import numpy as np

GLYPH_W = 5
GLYPH_H = 7
SCALE = 2                      # rendered glyph = 10 x 14 px
CHAR_W = GLYPH_W * SCALE       # 10
CHAR_H = GLYPH_H * SCALE       # 14
CHAR_GAP = 2                   # blank columns between glyphs in a word
CHAR_PITCH = CHAR_W + CHAR_GAP # 12 px advance per char
SPACE_ADVANCE = CHAR_PITCH     # a space advances one pitch with no ink

CHARSET = (
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
    "abcdefghijklmnopqrstuvwxyz"
    "0123456789"
    "$.,/%:-()&!'+#*=@?;\"_<>"
)


def _glyph_for(ch: str) -> np.ndarray:
    digest = hashlib.sha256(("glyph-v1:" + ch).encode("utf-8")).digest()
    bits = np.unpackbits(np.frombuffer(digest, dtype=np.uint8))[: GLYPH_H * GLYPH_W]
    g = bits.reshape(GLYPH_H, GLYPH_W).astype(bool)
    # force corners ON: ink bbox == layout cell for every glyph
    g[0, 0] = g[0, -1] = g[-1, 0] = g[-1, -1] = True
    return g


def _build_font() -> dict:
    font = {}
    for ch in CHARSET:
        font[ch] = _glyph_for(ch)
    # verify distinctness
    items = list(font.items())
    for i in range(len(items)):
        for j in range(i + 1, len(items)):
            if np.array_equal(items[i][1], items[j][1]):
                raise RuntimeError(f"glyph collision: {items[i][0]!r} vs {items[j][0]!r}")
    return font


FONT: dict = _build_font()

# glyph templates as a stacked float array for vectorized template matching:
# TEMPLATES[k] is the upscaled CHAR_H x CHAR_W {0,1} image of CHARS[k]
CHARS: str = CHARSET
TEMPLATES: np.ndarray = np.stack(
    [np.kron(FONT[c], np.ones((SCALE, SCALE))) for c in CHARSET]
).astype(np.float32)


def render_char(ch: str) -> np.ndarray:
    """CHAR_H x CHAR_W uint8 image of one glyph: 0 = ink, 255 = paper."""
    if ch == " " or ch not in FONT:
        return np.full((CHAR_H, CHAR_W), 255, dtype=np.uint8)
    big = np.kron(FONT[ch], np.ones((SCALE, SCALE), dtype=bool))
    img = np.full((CHAR_H, CHAR_W), 255, dtype=np.uint8)
    img[big] = 0
    return img
