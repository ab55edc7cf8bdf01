"""Synthetic receipt-page renderer (pure numpy, deterministic).

Mirrors the reference integration fixture `create_synthetic_receipt`
(Ocr/tests/test_cli_integration.py:52-68): white 400x600 page, black text,
one string per line, drawn at x=20, y starting at 20, stepping 30 per line —
but rendered with the deterministic bitmap font in fonts.py instead of PIL
(PIL is not available in this container, and a hash-derived font gives the
OCR kernel exact, platform-stable templates).

Returns grayscale uint8 (H, W); the pipeline treats pages as single-channel.
Characters outside the page or the charset are skipped (never raises).
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from .fonts import CHAR_H, CHAR_PITCH, CHAR_W, FONT, SCALE

MARGIN_X = 20
MARGIN_Y = 20
LINE_STEP = 30
PAGE_W = 400
PAGE_H = 600


def render_page(
    text_lines: List[str],
    width: int = PAGE_W,
    height: int = PAGE_H,
    noise_seed: Optional[int] = None,
    noise_density: float = 0.0,
) -> np.ndarray:
    img = np.full((height, width), 255, dtype=np.uint8)
    for li, line in enumerate(text_lines):
        y0 = MARGIN_Y + li * LINE_STEP
        if y0 + CHAR_H > height:
            break
        x = MARGIN_X
        for ch in line:
            if x + CHAR_W > width:
                break
            if ch != " " and ch in FONT:
                big = np.kron(FONT[ch], np.ones((SCALE, SCALE), dtype=bool))
                img[y0 : y0 + CHAR_H, x : x + CHAR_W][big] = 0
            x += CHAR_PITCH
    if noise_density > 0.0 and noise_seed is not None:
        rng = np.random.default_rng(noise_seed)
        mask = rng.random(img.shape) < noise_density
        img[mask] = rng.integers(0, 256, size=int(mask.sum()), dtype=np.uint8)
    return img


def expected_words(text_lines: List[str], width: int = PAGE_W, height: int = PAGE_H):
    """Ground-truth words with pixel boxes for a page rendered by render_page.

    Used only by tests (OCR-kernel accuracy); the pipeline/oracle never peeks.
    Box convention matches the OCR kernel: [x0, y0, x1, y1] = inclusive ink
    start to exclusive ink end of the word's glyph cells.
    """
    words = []
    for li, line in enumerate(text_lines):
        y0 = MARGIN_Y + li * LINE_STEP
        if y0 + CHAR_H > height:
            break
        x = MARGIN_X
        current: list = []  # list of (char, x_start)
        for ch in line:
            if x + CHAR_W > width:
                break
            if ch == " " or ch not in FONT:
                if current:
                    words.append(_word_entry(current, y0))
                    current = []
            else:
                current.append((ch, x))
            x += CHAR_PITCH
        if current:
            words.append(_word_entry(current, y0))
    return words


def _word_entry(chars, y0):
    text = "".join(c for c, _ in chars)
    x_start = chars[0][1]
    x_end = chars[-1][1] + CHAR_W
    return {"text": text, "box": [x_start, y0, x_end, y0 + CHAR_H], "confidence": 1.0}
