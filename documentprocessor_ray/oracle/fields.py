"""Pure, deterministic field-extraction operators.

Single-process re-derivation of the reference's heuristic operator chain
(richardforrestbarker/DocumentProcessor). Semantics match, operator by
operator, the cited regions of the reference:

- extract_amount      -> Ocr/src/postprocessing/field_extractor.py:42-60   (M14)
- extract_date_iso    -> Ocr/src/postprocessing/field_extractor.py:62-86   (M15)
- extract_vendor_name -> Ocr/src/postprocessing/field_extractor.py:88-134  (M20)
- extract_total       -> Ocr/src/postprocessing/field_extractor.py:136-174 (M21)
- extract_line_items  -> Ocr/src/postprocessing/field_extractor.py:176-281 (M22)
- group_words_into_lines -> field_extractor.py:283-325                     (M23)
- verify_totals       -> field_extractor.py:327-359                        (M24)
- consolidate_fields  -> field_extractor.py:361-387                        (M25)
- extract_date_heuristic -> Ocr/src/receipt_processor.py:418-447           (M16)
- extract_subtotal_heuristic -> receipt_processor.py:449-472               (M17)
- extract_tax_heuristic -> receipt_processor.py:474-497                    (M18)
- detect_currency     -> receipt_processor.py:499-510                      (M19)
  (canonical variant: receipt_processor.py; the commands.py copies differ
  slightly and are documented as quirks in SURVEY.md section 7.4)

This module is imported BOTH by the Ray Data map_batches/map_groups UDFs and
by the pytest conformance harness, so "equal to reference semantics" holds by
construction. A word is ``{'text': str, 'box': [x0, y0, x1, y1], 'confidence':
float}`` exactly as in the reference.

The code here is a fresh implementation written from the behavioral spec in
SURVEY.md section 2; it is not copied source.
"""

from __future__ import annotations

import re
from datetime import datetime
from decimal import Decimal, InvalidOperation
from typing import Any, Dict, List, Optional

Word = Dict[str, Any]

# --- compiled patterns (module-level: compiled once per process/actor) ---

AMOUNT_RE = re.compile(r"\$?\s*(\d{1,3}(?:,\d{3})*(?:\.\d{2})?)")
DATE_RES = [
    re.compile(r"(\d{1,2}[/-]\d{1,2}[/-]\d{2,4})"),
    re.compile(r"(\d{4}[/-]\d{1,2}[/-]\d{1,2})"),
    re.compile(
        r"((?:Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Oct|Nov|Dec)[a-z]* \d{1,2},? \d{4})",
        re.IGNORECASE,
    ),
]
DATE_FMTS = ["%m/%d/%Y", "%d/%m/%Y", "%Y-%m-%d", "%m-%d-%Y", "%B %d, %Y", "%b %d, %Y"]

PRICE_RE = re.compile(r"^\$?\d{1,3}(?:,\d{3})*(?:\.\d{2})?$")
QTY_RE = re.compile(r"^(\d+)x?$|^x(\d+)$", re.IGNORECASE)

TOTAL_KEYWORDS = ["total", "grand", "amount", "due", "balance"]
SUBTOTAL_KEYWORDS = ["subtotal", "sub total", "sub-total"]
TAX_KEYWORDS = ["tax", "vat", "gst", "hst"]
LINE_SKIP_KEYWORDS = [
    "total", "subtotal", "tax", "change", "cash", "credit",
    "card", "visa", "mastercard", "thank", "receipt", "store",
]


def _box_struct(box: List[int]) -> Dict[str, int]:
    return {"x0": box[0], "y0": box[1], "x1": box[2], "y1": box[3]}


def _union_box(boxes: List[List[int]]) -> Dict[str, int]:
    return {
        "x0": min(b[0] for b in boxes),
        "y0": min(b[1] for b in boxes),
        "x1": max(b[2] for b in boxes),
        "y1": max(b[3] for b in boxes),
    }


def extract_amount(text: str) -> Optional[Decimal]:
    """First money-looking amount in ``text`` as Decimal (commas stripped)."""
    m = AMOUNT_RE.search(text)
    if m:
        try:
            return Decimal(m.group(1).replace(",", ""))
        except InvalidOperation:
            return None
    return None


def extract_date_iso(text: str) -> Optional[str]:
    """First date match normalized to YYYY-MM-DD via the ordered strptime chain."""
    for pattern in DATE_RES:
        m = pattern.search(text)
        if m:
            date_str = m.group(1)
            for fmt in DATE_FMTS:
                try:
                    return datetime.strptime(date_str, fmt).strftime("%Y-%m-%d")
                except ValueError:
                    continue
    return None


def extract_vendor_name(words: List[Word]) -> Optional[Dict[str, Any]]:
    """Top-3 words by y0 (stable sort) joined; avg confidence; union box."""
    if not words:
        return None
    sorted_words = sorted(words, key=lambda w: w["box"][1])
    vendor_words = sorted_words[:3]
    return {
        "value": " ".join(w["text"] for w in vendor_words),
        "confidence": sum(w["confidence"] for w in vendor_words) / len(vendor_words),
        "box": _union_box([w["box"] for w in vendor_words]),
    }


def extract_total(words: List[Word]) -> Optional[Dict[str, Any]]:
    """First keyword word, then scan [i, i+5) for the first amount; value=str(Decimal)."""
    for i, word in enumerate(words):
        text_lower = word["text"].lower()
        if any(kw in text_lower for kw in TOTAL_KEYWORDS):
            for j in range(i, min(i + 5, len(words))):
                amount = extract_amount(words[j]["text"])
                if amount:
                    return {
                        "value": str(amount),
                        "confidence": words[j]["confidence"],
                        "box": _box_struct(words[j]["box"]),
                    }
    return None


def _keyword_window_amount(words: List[Word], keywords: List[str]) -> Optional[Dict[str, Any]]:
    """Shared subtotal/tax scan: keyword in word i -> scan [i-2, i+5) for amount regex."""
    for i, w in enumerate(words):
        if any(kw in w["text"].lower() for kw in keywords):
            for j in range(max(0, i - 2), min(len(words), i + 5)):
                m = AMOUNT_RE.search(words[j]["text"])
                if m:
                    return {
                        "value": m.group(1).replace(",", ""),
                        "confidence": words[j]["confidence"],
                        "box": _box_struct(words[j]["box"]),
                    }
    return None


def extract_subtotal_heuristic(words: List[Word]) -> Optional[Dict[str, Any]]:
    return _keyword_window_amount(words, SUBTOTAL_KEYWORDS)


def extract_tax_heuristic(words: List[Word]) -> Optional[Dict[str, Any]]:
    return _keyword_window_amount(words, TAX_KEYWORDS)


def extract_date_heuristic(words: List[Word]) -> Optional[Dict[str, Any]]:
    """Regex over the joined text; box of the first word containing the match
    (substring test in either direction)."""
    full_text = " ".join(w["text"] for w in words)
    for pattern in DATE_RES:
        m = pattern.search(full_text)
        if m:
            date_str = m.group(1)
            for w in words:
                if date_str in w["text"] or w["text"] in date_str:
                    return {
                        "value": date_str,
                        "confidence": w["confidence"],
                        "box": _box_struct(w["box"]),
                    }
    return None


def detect_currency(words: List[Word]) -> Optional[Dict[str, Any]]:
    """$->USD, EUR symbol->EUR, GBP symbol->GBP; confidence 0.9, no box."""
    full_text = " ".join(w["text"] for w in words)
    if "$" in full_text or "USD" in full_text:
        return {"value": "USD", "confidence": 0.9, "box": None}
    if "€" in full_text or "EUR" in full_text:
        return {"value": "EUR", "confidence": 0.9, "box": None}
    if "£" in full_text or "GBP" in full_text:
        return {"value": "GBP", "confidence": 0.9, "box": None}
    return None


def group_words_into_lines(words: List[Word], y_threshold: int = 20) -> List[List[Word]]:
    """Reading-order line grouping: sort by (y0, x0); new line when |y - line_y0|
    exceeds the threshold; x-sort within line. Defines the ``order`` invariant."""
    if not words:
        return []
    sorted_words = sorted(words, key=lambda w: (w["box"][1], w["box"][0]))
    lines: List[List[Word]] = []
    current_line = [sorted_words[0]]
    current_y = sorted_words[0]["box"][1]
    for word in sorted_words[1:]:
        word_y = word["box"][1]
        if abs(word_y - current_y) <= y_threshold:
            current_line.append(word)
        else:
            lines.append(sorted(current_line, key=lambda w: w["box"][0]))
            current_line = [word]
            current_y = word_y
    if current_line:
        lines.append(sorted(current_line, key=lambda w: w["box"][0]))
    return lines


def extract_line_items(words: List[Word]) -> List[Dict[str, Any]]:
    """Line-item table reconstruction over grouped lines; see module docstring."""
    if not words:
        return []
    line_items: List[Dict[str, Any]] = []
    for line_words in group_words_into_lines(words):
        if len(line_words) < 2:
            continue
        line_text = " ".join(w["text"] for w in line_words).lower()
        if any(kw in line_text for kw in LINE_SKIP_KEYWORDS):
            continue

        description_parts: List[str] = []
        quantity = None
        unit_price = None
        line_total = None
        for w in line_words:
            text = w["text"].strip()
            if PRICE_RE.match(text):
                price_value = float(text.replace("$", "").replace(",", ""))
                if line_total is None:
                    line_total = price_value
                elif unit_price is None:
                    unit_price = line_total
                    line_total = price_value
            else:
                qm = QTY_RE.match(text)
                if qm:
                    quantity = int(qm.group(1) or qm.group(2))
                else:
                    description_parts.append(text)

        if description_parts and (line_total is not None or unit_price is not None):
            if unit_price is None and quantity and line_total:
                unit_price = round(line_total / quantity, 2)
            elif unit_price is None:
                unit_price = line_total
            if line_total is None and quantity and unit_price:
                line_total = round(unit_price * quantity, 2)
            elif line_total is None:
                line_total = unit_price
            line_items.append({
                "description": " ".join(description_parts),
                "quantity": quantity or 1,
                "unit_price": unit_price,
                "line_total": line_total,
                "box": _union_box([w["box"] for w in line_words]),
                "confidence": sum(w["confidence"] for w in line_words) / len(line_words),
            })
    return line_items


def verify_totals(subtotal: Optional[Decimal], tax: Optional[Decimal],
                  total: Optional[Decimal]) -> bool:
    """|subtotal + tax - total| <= 0.02 with Decimal arithmetic."""
    if not all([subtotal, tax, total]):
        return False
    return abs((subtotal + tax) - total) <= Decimal("0.02")


def consolidate_fields(raw_fields: Dict[str, Any], min_confidence: float = 0.5) -> Dict[str, Any]:
    """Drop struct fields whose confidence is below the threshold."""
    out: Dict[str, Any] = {}
    for name, data in raw_fields.items():
        if isinstance(data, dict) and "confidence" in data:
            if data["confidence"] >= min_confidence:
                out[name] = data
    return out


def extract_fields_heuristic(words: List[Word]) -> Dict[str, Any]:
    """Full heuristic fallback bundle (receipt_processor.py:404-416)."""
    return {
        "vendor_name": extract_vendor_name(words),
        "date": extract_date_heuristic(words),
        "total_amount": extract_total(words),
        "subtotal": extract_subtotal_heuristic(words),
        "tax_amount": extract_tax_heuristic(words),
        "currency": detect_currency(words),
        "merchant_address": None,
        "line_items": extract_line_items(words),
    }
