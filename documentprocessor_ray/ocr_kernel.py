"""Deterministic template-matching OCR kernel (pure numpy).

Replaces the reference's PaddleOCR/Tesseract engines (Ocr/src/ocr/ocr_engine.py,
A1-A3 in SURVEY.md section 2.3) with a fully deterministic kernel so that
span-sequence conformance can be byte-exact and N=8 vs N=32 parallelism runs
produce identical output (the scaling benchmark doubles as a determinism test).

Algorithm (classic projection-profile OCR):
1. binarize (ink = pixel < 128)
2. despeckle: drop ink pixels with no ink 8-neighbor (noise robustness)
3. line segmentation: row projection profile -> maximal ink-row bands
4. word segmentation within a band: column projection; a blank gap wider than
   WORD_GAP columns splits words (intra-word char gaps are CHAR_GAP=2 px;
   inter-word gaps are >= 14 px with the fonts.py metrics)
5. char classification: fixed-pitch cells template-matched against the
   deterministic glyph set (argmax pixel agreement); per-char score ->
   word confidence = mean char score
6. emit words in reading order (top band to bottom, left to right) with
   pixel boxes [x0, y0, x1, y1] — same word schema as the reference engines
   (ocr_engine.py:89-97: {'text', 'box', 'confidence'}).

The kernel is stateless math, but the template stack + charset are loaded once
per OCR actor (__init__) in the Ray stage — mirroring the reference's
lazy-singleton engine (receipt_processor.py:50-54).
"""

from __future__ import annotations

from typing import Any, Dict, List

import numpy as np

from .fonts import CHAR_GAP, CHAR_H, CHAR_PITCH, CHAR_W, CHARS, TEMPLATES

WORD_GAP = 6  # blank columns ending a word (strictly greater than)
INK_THRESHOLD = 128


def binarize(img: np.ndarray) -> np.ndarray:
    """uint8 grayscale -> bool ink mask."""
    return img < INK_THRESHOLD


def despeckle(ink: np.ndarray) -> np.ndarray:
    """Remove ink pixels with zero ink 8-neighbors (isolated noise)."""
    p = np.pad(ink, 1, mode="constant")
    neighbors = (
        p[:-2, :-2].astype(np.uint8) + p[:-2, 1:-1] + p[:-2, 2:]
        + p[1:-1, :-2] + p[1:-1, 2:]
        + p[2:, :-2] + p[2:, 1:-1] + p[2:, 2:]
    )
    return ink & (neighbors > 0)


def _runs(mask: np.ndarray) -> List[tuple]:
    """Maximal runs of True in a 1-D bool array as (start, stop) half-open."""
    if not mask.any():
        return []
    m = mask.astype(np.int8)
    diff = np.diff(np.concatenate(([0], m, [0])))
    starts = np.flatnonzero(diff == 1)
    stops = np.flatnonzero(diff == -1)
    return list(zip(starts.tolist(), stops.tolist()))


def detect_words(image: np.ndarray) -> List[Dict[str, Any]]:
    """Full detect+recognize on one grayscale uint8 page. Segmentation
    walks bands/words; classification batches ALL words into one
    page-level matmul (_classify_blocks)."""
    ink = despeckle(binarize(image))
    boxes: List[List[int]] = []
    blocks: List[np.ndarray] = []
    for y0, y1 in _runs(ink.any(axis=1)):
        band = ink[y0:y1]
        col_has_ink = band.any(axis=0)
        ink_runs = _runs(col_has_ink)
        if not ink_runs:
            continue
        # merge char runs into words: gap <= WORD_GAP stays in the word
        word_spans = [[ink_runs[0][0], ink_runs[0][1]]]
        for s, e in ink_runs[1:]:
            if s - word_spans[-1][1] <= WORD_GAP:
                word_spans[-1][1] = e
            else:
                word_spans.append([s, e])
        for x0, x1 in word_spans:
            boxes.append([int(x0), int(y0), int(x1), int(y1)])
            blocks.append(band[:, x0:x1])
    words: List[Dict[str, Any]] = []
    for box, (text, conf) in zip(boxes, _classify_blocks(blocks)):
        if not text.strip():
            continue
        words.append({"text": text, "box": box, "confidence": float(conf)})
    return words


def _cc_components(ink: np.ndarray) -> List[tuple]:
    """8-connected components of a bool ink mask via run-based two-pass
    labeling (union-find over per-row ink runs). Returns component bboxes
    as (y0, y1, x0, x1) half-open, unordered.

    A connected component's row range is contiguous, so each component lies
    wholly inside one row-projection band — the equivalence that makes the
    CC segmentation path word-identical to the projection path (see
    OcrKernelCC)."""
    parent: List[int] = []

    def find(a: int) -> int:
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    def union(a: int, b: int) -> None:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    all_runs: List[tuple] = []  # (y, s, e, run_id)
    prev: List[tuple] = []      # previous row's (s, e, run_id)
    for y in range(ink.shape[0]):
        row_runs = _runs(ink[y])
        cur: List[tuple] = []
        for s, e in row_runs:
            rid = len(parent)
            parent.append(rid)
            # 8-connectivity: touches a prev-row run iff ps <= e and pe >= s
            for ps, pe, pid in prev:
                if ps <= e and pe >= s:
                    union(rid, pid)
            cur.append((s, e, rid))
            all_runs.append((y, s, e, rid))
        prev = cur

    boxes: Dict[int, List[int]] = {}
    for y, s, e, rid in all_runs:
        r = find(rid)
        b = boxes.get(r)
        if b is None:
            boxes[r] = [y, y + 1, s, e]
        else:
            b[1] = y + 1
            if s < b[2]:
                b[2] = s
            if e > b[3]:
                b[3] = e
    return [tuple(b) for b in boxes.values()]


def cc_detect_words(image: np.ndarray) -> List[Dict[str, Any]]:
    """detect_words via connected components instead of projection profiles.

    Provably word-identical to ``detect_words`` on ANY image:
    - components have contiguous row ranges, so the maximal runs of the
      union of component row intervals are exactly the row-projection
      bands;
    - within a band, gap-merging the sorted component column intervals
      (gap <= WORD_GAP over a running max right edge) yields exactly the
      gap-merged column-projection runs;
    - each word is then classified from the same ink slice
      ``ink[band_y0:band_y1, x0:x1]``.
    The equality is pytest-gated on corpus pages AND random noise images.
    """
    ink = despeckle(binarize(image))
    comps = _cc_components(ink)
    if not comps:
        return []
    comps.sort()  # by (y0, y1, x0, x1)

    # bands = maximal runs of the union of component row intervals
    bands: List[List[Any]] = []  # [y0, y1, [comps]]
    for c in comps:
        if bands and c[0] <= bands[-1][1]:
            bands[-1][1] = max(bands[-1][1], c[1])
            bands[-1][2].append(c)
        else:
            bands.append([c[0], c[1], [c]])

    boxes2: List[List[int]] = []
    blocks: List[np.ndarray] = []
    for y0, y1, cs in bands:
        xs = sorted((c[2], c[3]) for c in cs)
        spans = [[xs[0][0], xs[0][1]]]
        for s, e in xs[1:]:
            if s - spans[-1][1] <= WORD_GAP:
                spans[-1][1] = max(spans[-1][1], e)
            else:
                spans.append([s, max(s, e)])
        for x0, x1 in spans:
            boxes2.append([int(x0), int(y0), int(x1), int(y1)])
            blocks.append(ink[y0:y1, x0:x1])
    words: List[Dict[str, Any]] = []
    for box, (text, conf) in zip(boxes2, _classify_blocks(blocks)):
        if not text.strip():
            continue
        words.append({"text": text, "box": box, "confidence": float(conf)})
    return words


# Flattened template stack for the batched matmul classifier: with X a 0/1
# cell vector and T a 0/1 template, the pixel-agreement COUNT is
# |px| - |X|_1 - |T|_1 + 2*X·T (all exact small integers in float32), so one
# BLAS gemm per page replaces a per-word broadcast-compare + mean — same
# values bit-for-bit (agreement = count / |px| evaluated in float64, exactly
# what bool.mean() computed).
_NPX = CHAR_H * CHAR_W
_T_FLAT = np.ascontiguousarray(TEMPLATES.reshape(len(TEMPLATES), _NPX),
                               dtype=np.float32)
_T_SUM = _T_FLAT.sum(axis=1)  # exact: counts <= _NPX


def _classify_blocks(cellblocks: List[np.ndarray]) -> List[tuple]:
    """Classify many word ink blocks in ONE page-level matmul.

    Returns [(text, confidence)] in input order; exactly the per-word
    results of the original broadcast-compare implementation."""
    if not cellblocks:
        return []
    n_chars_per = []
    for cb in cellblocks:
        w = cb.shape[1]
        n_chars_per.append(max(1, int(round((w + CHAR_GAP) / CHAR_PITCH))))
    total = int(np.sum(n_chars_per))
    cells = np.zeros((total, CHAR_H, CHAR_W), dtype=np.float32)
    pos = 0
    for cb, n_chars in zip(cellblocks, n_chars_per):
        for k in range(n_chars):
            xs = k * CHAR_PITCH
            cell = cb[:CHAR_H, xs: xs + CHAR_W]
            cells[pos, : cell.shape[0], : cell.shape[1]] = cell
            pos += 1
    flat = cells.reshape(total, _NPX)
    # agreement counts: exact integers in float32 (products 0/1, sums <= 140)
    eq = (_NPX - flat.sum(axis=1)[:, None] - _T_SUM[None, :]
          + 2.0 * (flat @ _T_FLAT.T))
    best = eq.argmax(axis=1)
    scores = eq[np.arange(total), best].astype(np.float64) / _NPX
    out = []
    pos = 0
    for n_chars in n_chars_per:
        b = best[pos: pos + n_chars]
        out.append(("".join(CHARS[i] for i in b),
                    float(scores[pos: pos + n_chars].mean())))
        pos += n_chars
    return out


def _classify_word(cellblock: np.ndarray) -> tuple:
    """Classify a word's ink block (band_h x word_w) into text + confidence."""
    return _classify_blocks([cellblock])[0]


class OcrKernel:
    """Engine-protocol object (reference OcrEngine ABC, ocr_engine.py:14-28).

    Holds the template stack; constructed once per Ray actor. detect_and_
    recognize matches the reference engine signature.
    """

    def __init__(self):
        self.templates = TEMPLATES
        self.chars = CHARS

    def detect_and_recognize(self, image: np.ndarray) -> List[Dict[str, Any]]:
        if image.ndim == 3:  # RGB -> gray via exact mean (deterministic ints)
            image = (image.astype(np.uint16).sum(axis=2) // image.shape[2]).astype(np.uint8)
        return detect_words(image)


# --- engine registry (A1-A3 factory/fallback; reference ocr_engine.py:200-233) ---
#
# The span stage resolves its engine INSIDE the Ray worker (actor __init__ /
# task-pool cache), so a name registered only in the driver process would not
# exist worker-side. Two supported shapes:
#   - built-in/name: get_engine("kernel") — names registered at module import
#     exist in every worker (module-level dict);
#   - user engine: pass the CLASS itself (build_pipeline(engine=MyEngine)) —
#     cloudpickle ships it to the workers with the stage closure. This is the
#     seam where a real Paddle/Tesseract wrapper drops in (its __init__ loads
#     the model once per actor; detect_and_recognize(image) -> word dicts).

class OcrKernelCC(OcrKernel):
    """The connected-component segmentation variant of the deterministic
    kernel (north-star parity: "connected-component and projection-profile
    line/word segmentation" — the projection path is OcrKernel). Same
    glyph classification, same word schema; word-for-word identical output
    by the equivalence argument on cc_detect_words, so every span-equality
    gate holds under engine="kernel_cc" too."""

    def detect_and_recognize(self, image: np.ndarray) -> List[Dict[str, Any]]:
        if image.ndim == 3:
            image = (image.astype(np.uint16).sum(axis=2)
                     // image.shape[2]).astype(np.uint8)
        return cc_detect_words(image)


class TesseractEngine:
    """A2: pytesseract-backed engine behind the registry seam (reference
    ocr_engine.py:159-233). Import-guarded — this container has no
    tesseract, so construction raises ImportError with the install hint; the
    result adaptation (image_to_data dict -> words, conf<0 skipped,
    conf/100, box [l, t, l+w, t+h]) is oracle/boxes.tesseract_result_to_words
    (M11), unit-tested against a stubbed pytesseract so the adapter logic is
    exercised without the binary. One instance per Ray actor: __init__
    resolves the module once; detect_and_recognize runs per page."""

    def __init__(self, lang: str = "eng", config: str = "--psm 6"):
        try:
            import pytesseract
        except ImportError as e:  # pragma: no cover - absent in container
            raise ImportError(
                "pytesseract not installed. Install with: "
                "pip install pytesseract (plus the tesseract binary)") from e
        self.lang = lang
        self.config = config
        self._pt = pytesseract

    def detect_and_recognize(self, image: np.ndarray) -> List[Dict[str, Any]]:
        from .oracle.boxes import tesseract_result_to_words

        img = image
        try:
            from PIL import Image

            if isinstance(image, np.ndarray):
                img = Image.fromarray(image)
        except ImportError:
            pass  # recent pytesseract accepts ndarrays directly
        data = self._pt.image_to_data(
            img, lang=self.lang, config=self.config,
            output_type=self._pt.Output.DICT)
        return tesseract_result_to_words(data)


class PaddleEngine:
    """A1: PaddleOCR-backed engine (reference ocr_engine.py:31-147).
    Import-guarded like TesseractEngine; the model loads ONCE per actor in
    __init__ (the reference lazy-loads per request — per-actor state is the
    Ray-idiomatic replacement). Result adaptation (4-corner polygon ->
    axis-aligned box, empty-text skip) is oracle/boxes.paddle_result_to_words
    (M10)."""

    def __init__(self, lang: str = "en"):
        try:
            from paddleocr import PaddleOCR
        except ImportError as e:  # pragma: no cover - absent in container
            raise ImportError(
                "PaddleOCR not installed. Install with: "
                "pip install paddleocr paddlepaddle") from e
        self._ocr = PaddleOCR(use_angle_cls=True, lang=lang)

    def detect_and_recognize(self, image: np.ndarray) -> List[Dict[str, Any]]:
        from .oracle.boxes import paddle_result_to_words

        return paddle_result_to_words(self._ocr.ocr(image))


def create_engine(engine_type: str = "paddle", **kwargs):
    """A3 factory/fallback (reference ocr_engine.py:264-286): paddle falls
    back to tesseract when paddleocr is absent; 'kernel' resolves the
    deterministic built-in."""
    engine_type = engine_type.lower()
    if engine_type == "paddle":
        try:
            return PaddleEngine(**kwargs)
        except ImportError:
            import logging

            logging.getLogger(__name__).warning(
                "PaddleOCR not available, falling back to Tesseract")
            return TesseractEngine()
    if engine_type == "tesseract":
        return TesseractEngine(**kwargs)
    if engine_type == "kernel":
        return OcrKernel(**kwargs)
    raise ValueError(f"Unknown OCR engine type: {engine_type}")


def _kernel_lm():
    """Deterministic kernel wrapped with lexicon LM post-correction
    (stages/postcorrect.py) — registered as a factory so the lexicon code
    matrix builds once per worker at get_engine time."""
    from .stages.postcorrect import PostCorrectingEngine

    return PostCorrectingEngine(base="kernel")


_ENGINE_REGISTRY: Dict[str, type] = {
    "kernel": OcrKernel,
    "kernel_cc": OcrKernelCC,
    "kernel_lm": _kernel_lm,
    "tesseract": TesseractEngine,
    "paddle": PaddleEngine,
}


def register_engine(name: str, cls: type) -> None:
    """Add an engine by name (effective in workers only if registration runs
    at import time of a module the workers also import; otherwise pass the
    class object directly to build_pipeline)."""
    _ENGINE_REGISTRY[name] = cls


def get_engine(engine=None):
    """Resolve an engine spec: None -> default kernel; str -> registry name;
    class/callable -> instantiate; instance -> as-is."""
    if engine is None:
        engine = "kernel"
    if isinstance(engine, str):
        if engine not in _ENGINE_REGISTRY:
            raise ValueError(
                f"unknown OCR engine '{engine}'; known: {sorted(_ENGINE_REGISTRY)}")
        return _ENGINE_REGISTRY[engine]()
    if isinstance(engine, type) or callable(engine):
        return engine()
    return engine


def engine_key(engine) -> str:
    """Stable cache key for the per-worker processor cache."""
    if engine is None:
        return "kernel"
    if isinstance(engine, str):
        return engine
    if isinstance(engine, type):
        return f"{engine.__module__}.{engine.__qualname__}"
    return repr(engine)
