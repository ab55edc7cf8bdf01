"""Single-process per-document oracle: the conformance reference.

Applies the full deterministic operator chain to ONE document exactly as the
reference's monolithic path does per job (Ocr/src/receipt_processor.py:120-226):
per media span (page): preprocess -> OCR -> normalize boxes (M12) -> words
accumulated across pages in span-offset order (all_words.extend,
receipt_processor.py:153,196); then heuristic field extraction over the
accumulated words (receipt_processor.py:404-416); text spans take the
normalize path (textnorm.py).

Output invariant (FIXTURES.md F4 / BASELINE.json north_rule):

    spans_out: list<struct<kind, text, media_ref, order>>

- spans processed in ascending input `offset`
- a text span emits ONE output span with normalized text
- a media span emits one output span PER READING-ORDER LINE
  (group_words_into_lines on the normalized words, M23) with the line's
  x-sorted word texts joined by ' '
- `order` is the running index over the whole document

The Ray pipeline (pipelines/extract.py) computes the identical result through
distributed stages; pytest compares per-doc byte equality.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import numpy as np

from ..ocr_kernel import OcrKernel
from ..stages.preprocess import PreprocessConfig, preprocess
from . import fields as F
from .boxes import normalize_boxes, raw_ocr_text
from .textnorm import normalize_text


def ocr_page(image: np.ndarray, kernel: Optional[OcrKernel] = None,
             cfg: PreprocessConfig = PreprocessConfig()) -> Dict[str, Any]:
    """preprocess -> OCR -> normalize for one page; the per-page unit of work."""
    kernel = kernel or OcrKernel()
    pre = preprocess(image, cfg)
    # normalize against the dims the OCR actually saw (resample may rescale)
    h, w = pre.shape[:2]
    words = kernel.detect_and_recognize(pre)
    return {
        "words": words,
        "normalized_words": normalize_boxes(words, w, h),
        "raw_ocr_text": raw_ocr_text(words),
        "image_width": w,
        "image_height": h,
    }


def media_span_lines(normalized_words: List[Dict[str, Any]]) -> List[str]:
    """Reading-order line texts for one page (M23 over normalized words)."""
    return [" ".join(w["text"] for w in line) for line in F.group_words_into_lines(normalized_words)]


def process_document(
    doc_id: str,
    spans: List[Dict[str, Any]],
    load_media,  # Callable[[str], Optional[np.ndarray]]
    kernel: Optional[OcrKernel] = None,
    cfg: PreprocessConfig = PreprocessConfig(),
    load_blob=None,  # Callable[[str], Optional[bytes]] — pdf spans
    html_mode: str = "blocks",  # blocks | dom (north-rule html operators)
    keep_words: bool = False,  # attach the accumulated normalized words
) -> Dict[str, Any]:
    """Full per-document result: spans_out + heuristic fields + status/error."""
    kernel = kernel or OcrKernel()
    result: Dict[str, Any] = {
        "doc_id": doc_id,
        "status": "done",
        "error": None,
        "spans_out": [],
        "n_words": 0,
    }
    all_words: List[Dict[str, Any]] = []
    spans_out: List[Dict[str, Any]] = []
    order = 0
    try:
        for span in sorted(spans, key=lambda s: s["offset"]):
            if span["kind"] == "text":
                spans_out.append({
                    "kind": "text",
                    "text": normalize_text(span["text"]),
                    "media_ref": "",
                    "order": order,
                })
                order += 1
            elif span["kind"] == "html":
                # north rule: interleaved html spans take the boilerplate-
                # strip path (block split + link-density keep) or the DOM
                # heuristics path, and emit ONE main-content span
                if html_mode == "dom":
                    from ..functions.dom import dom_main_text_of as _mt
                else:
                    from ..functions.boilerplate import main_text_of as _mt

                spans_out.append({
                    "kind": "html",
                    "text": _mt(span["text"]),
                    "media_ref": "",
                    "order": order,
                })
                order += 1
            elif span["kind"] == "pdf":
                # north rule: pdf spans take the layout-parse path — one
                # output span per reading-order text run
                from ..functions.pdf import parse_pdf_text

                blob = load_blob(span["media_ref"]) if load_blob else None
                if blob is None:
                    raise FileNotFoundError(
                        f"media not found: {span['media_ref']}")
                runs, _ = parse_pdf_text(blob)
                for r in runs:
                    spans_out.append({
                        "kind": "pdf",
                        "text": r[3],
                        "media_ref": span["media_ref"],
                        "order": order,
                    })
                    order += 1
            elif span["kind"] == "media":
                image = load_media(span["media_ref"])
                if image is None:
                    raise FileNotFoundError(f"media not found: {span['media_ref']}")
                page = ocr_page(image, kernel, cfg)
                all_words.extend(page["normalized_words"])
                for line_text in media_span_lines(page["normalized_words"]):
                    spans_out.append({
                        "kind": "media",
                        "text": line_text,
                        "media_ref": span["media_ref"],
                        "order": order,
                    })
                    order += 1
        result["spans_out"] = spans_out
        result["n_words"] = len(all_words)
        if keep_words:
            result["words"] = all_words
        fields = F.extract_fields_heuristic(all_words) if all_words else {}
        for name in ["vendor_name", "date", "total_amount", "subtotal",
                     "tax_amount", "currency", "merchant_address"]:
            result[name] = fields.get(name)
        result["line_items"] = fields.get("line_items", [])
    except Exception as e:  # semantic failure stays in-band (M31)
        result["status"] = "failed"
        result["error"] = str(e)
        result["spans_out"] = []
        result["line_items"] = []
        if keep_words:
            result["words"] = []
        for name in ["vendor_name", "date", "total_amount", "subtotal",
                     "tax_amount", "currency", "merchant_address"]:
            result[name] = None
    return result
