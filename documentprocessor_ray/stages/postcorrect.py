"""Lexicon language-model post-correction of OCR output — the third piece
of the north-star's stateful OCR kernel state ("CNN weights, glyph lexicon,
LANGUAGE MODEL FOR POST-CORRECTION"): a word-level LM held once per actor
that rescues noise-corrupted recognitions.

Shape: an ENGINE DECORATOR (``kernel_lm`` in the ocr_kernel registry), so
both extraction paths — the Ray span stage (`run_extraction(engine=...)`)
and the single-process oracle (`process_document(kernel=...)`) — pick it up
through the existing engine seam with zero call-site changes, and span
equality stays gated end-to-end under correction.

Correction rule (deterministic, segmentation-preserving): the kernel's
fixed-pitch segmentation means pixel noise corrupts a glyph IN PLACE — word
length never changes — so the correction space is same-length Hamming
substitutions:

  for each recognized word of length >= ``min_len`` with confidence < 1.0
  whose text is NOT in the lexicon: if EXACTLY ONE lexicon word of the
  same length is within Hamming distance ``max_hamming``, rewrite the text
  to it (box and confidence untouched — the confidence still reports what
  the glyph classifier saw); ambiguous (>=2 candidates) or hopeless (0)
  words pass through unchanged. ``min_len`` (default 3) is the classic
  spell-correction guard: a 1-2 char recognition is as likely stray ink as
  a corrupted dictionary word, so rewriting it would INVENT text.

The lexicon defaults to the corpus generator's static render vocabulary
(vendors, item names, template words) — the stand-in for a real system's
dictionary, exactly like fonts.TEMPLATES stands in for CNN weights. Matching
is one vectorized uint8 Hamming pass per word against the by-length code
matrix (built once per actor in __init__).

Scale notes: lexicon state is per-actor constructor state (load once), the
per-word check is O(|lexicon_same_len| * len) numpy, and only imperfect-
confidence words pay it — on clean corpora the stage adds one dict probe
per word.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import numpy as np


def default_lexicon() -> List[str]:
    """The corpus generator's alphabetic render vocabulary (corpus.py
    _VENDORS/_ITEMS + template line tokens), whitespace-tokenized exactly as
    the renderer lays words out."""
    from ..corpus import _ITEMS, _VENDORS

    toks: set = set()
    for vendor in _VENDORS:
        for line in vendor:
            toks.update(line.split())
    for name, _ in _ITEMS:
        toks.update(name.split())
    for line in ("Date:", "Subtotal", "Tax", "8%", "TOTAL", "Thank you!"):
        toks.update(line.split())
    return sorted(toks)


class PostCorrectingEngine:
    """``kernel_lm``: a base engine + lexicon post-correction decorator."""

    def __init__(self, base: Any = "kernel",
                 lexicon: Optional[List[str]] = None,
                 max_hamming: int = 1, min_len: int = 3):
        from ..ocr_kernel import get_engine

        self.base = get_engine(base)
        words = default_lexicon() if lexicon is None else sorted(set(lexicon))
        self.max_hamming = int(max_hamming)
        self.min_len = int(min_len)
        self._lex = set(words)
        self._by_len: Dict[int, tuple] = {}
        buckets: Dict[int, List[str]] = {}
        for w in words:
            code = np.frombuffer(w.encode("utf-8"), np.uint8)
            buckets.setdefault(len(code), []).append(w)
        for ln, ws in buckets.items():
            mat = np.stack([np.frombuffer(w.encode("utf-8"), np.uint8)
                            for w in ws])
            self._by_len[ln] = (mat, ws)

    def _fix(self, text: str) -> Optional[str]:
        code = np.frombuffer(text.encode("utf-8"), np.uint8)
        if len(code) < self.min_len:
            return None
        entry = self._by_len.get(len(code))
        if entry is None:
            return None
        mat, ws = entry
        dist = (mat != code[None, :]).sum(axis=1)
        hit = np.flatnonzero(dist <= self.max_hamming)
        if len(hit) != 1:
            return None  # ambiguous or no candidate: leave as recognized
        return ws[int(hit[0])]

    def detect_and_recognize(self, image: np.ndarray) -> List[Dict[str, Any]]:
        words = self.base.detect_and_recognize(image)
        for wd in words:
            if wd["confidence"] < 1.0 and wd["text"] not in self._lex:
                fixed = self._fix(wd["text"])
                if fixed is not None:
                    wd["text"] = fixed
        return words
