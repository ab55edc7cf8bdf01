"""Box normalization and OCR-result adapters (pure).

- normalize_boxes  -> reference Ocr/src/receipt_processor.py:262-299 (M12):
  box * 1000 / dim, int-truncated, clamped to [0, 1000]. The first
  conformance target; golden values in tests/test_oracle_fields.py come from
  the reference's own unit tests (Ocr/tests/test_cli_unit.py:242-260).
- paddle_result_to_words -> Ocr/src/ocr/ocr_engine.py:103-152 (M10)
- tesseract_result_to_words -> Ocr/src/ocr/ocr_engine.py:199-257 (M11)
"""

from __future__ import annotations

from typing import Any, Dict, List

import numpy as np

Word = Dict[str, Any]


def normalize_box(box, image_width: int, image_height: int, scale: int = 1000) -> List[int]:
    nb = [
        int(box[0] * scale / image_width),
        int(box[1] * scale / image_height),
        int(box[2] * scale / image_width),
        int(box[3] * scale / image_height),
    ]
    return [max(0, min(scale, x)) for x in nb]


def normalize_boxes(words: List[Word], image_width: int, image_height: int,
                    scale: int = 1000) -> List[Word]:
    return [
        {
            "text": w["text"],
            "box": normalize_box(w["box"], image_width, image_height, scale),
            "confidence": w["confidence"],
        }
        for w in words
    ]


def normalize_boxes_np(x0, y0, x1, y1, image_width, image_height, scale: int = 1000):
    """Vectorized M12 over numpy arrays (per-image width/height broadcastable).

    Matches int() truncation-toward-zero for the non-negative pixel boxes the
    OCR kernel emits, then clamps to [0, scale].
    """
    def one(v, dim):
        out = np.trunc(np.asarray(v, dtype=np.float64) * scale / dim).astype(np.int32)
        return np.clip(out, 0, scale)

    return one(x0, image_width), one(y0, image_height), one(x1, image_width), one(y1, image_height)


def paddle_result_to_words(result: Any) -> List[Word]:
    """PaddleOCR nested output -> word dicts; 4-corner polygon -> axis-aligned box."""
    if result is None or len(result) == 0:
        return []
    words: List[Word] = []
    for page_result in result:
        if page_result is None:
            continue
        for line in page_result:
            if line is None or len(line) < 2:
                continue
            box_points, text_info = line[0], line[1]
            if isinstance(text_info, tuple) and len(text_info) >= 2:
                text, confidence = str(text_info[0]), float(text_info[1])
            else:
                continue
            if not text.strip():
                continue
            xs = [p[0] for p in box_points]
            ys = [p[1] for p in box_points]
            words.append({
                "text": text,
                "box": [int(min(xs)), int(min(ys)), int(max(xs)), int(max(ys))],
                "confidence": confidence,
            })
    return words


def tesseract_result_to_words(data: Dict[str, List[Any]]) -> List[Word]:
    """Tesseract image_to_data dict -> word dicts; skip conf<0; conf/100.

    pytesseract's Output.DICT has returned ``conf`` as ints, floats, or
    NUMERIC STRINGS ('-1', '96') depending on version; the reference
    compares ``conf < 0`` directly (ocr_engine.py:240) which only works for
    the numeric variants, so the handshake coerces first — numerically
    identical for the inputs the reference handles, and no longer crashes
    on the string-conf versions."""
    words: List[Word] = []
    for i in range(len(data["text"])):
        text = data["text"][i].strip()
        if not text:
            continue
        conf = float(data["conf"][i])
        if conf < 0:
            continue
        words.append({
            "text": text,
            "box": [
                int(data["left"][i]),
                int(data["top"][i]),
                int(data["left"][i] + data["width"][i]),
                int(data["top"][i] + data["height"][i]),
            ],
            "confidence": conf / 100.0,
        })
    return words


def raw_ocr_text(words: List[Word]) -> str:
    """' '.join of word texts in OCR emission order (M13)."""
    return " ".join(w["text"] for w in words)
