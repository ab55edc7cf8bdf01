"""Model-output parsers: pure, deterministic (reference M27-M29).

- ``parse_tagged_output``  -> Donut CORD-v2 token2json semantics
  (Ocr/src/models/donut.py:211-345, M27): ``<s_field>value</s_field>`` tag
  streams (nested for menu items, ``<sep/>``-separated repeats) to dicts,
  then line_items/amount extraction with ``parse_amount``.
- ``parse_json_output``    -> IDEFICS2 JSON parse
  (Ocr/src/models/idefics2.py:262-396, M28): find the first ``{...}`` block
  in generated text, json.loads, clean amounts; regex fallback for
  vendor (leading capitalized run), date, total when the block is absent
  or invalid.
- ``parse_amount``         -> ``_parse_amount`` (donut.py): strip everything
  but digits and dots, then float; None when nothing remains.
- ``tokenize_with_boxes``  -> M29 (receipt_processor.py:301-332): each
  word's subtokens inherit the parent word's box; returns
  (tokens, boxes, word_indices) aligned lists. The tokenizer is injectable
  (a real BPE drops in); the default splits on non-alphanumeric boundaries.

All parsing is per-document and stateless — in the Ray pipeline these run
inside the scorer stage's ``__call__`` after generation.
"""

from __future__ import annotations

import json
import re
from typing import Any, Callable, Dict, List, Optional, Tuple

_TAG_RE = re.compile(r"<s_([a-z_]+)>(.*?)</s_\1>", re.DOTALL)
_JSON_BLOCK_RE = re.compile(r"\{[\s\S]*\}")
_VENDOR_FALLBACK_RE = re.compile(r"^[A-Z][A-Za-z\s&]+")
_DATE_FALLBACK_RE = re.compile(r"\d{1,2}[/-]\d{1,2}[/-]\d{2,4}")
_TOTAL_FALLBACK_RE = re.compile(r"total[:\s]*\$?(\d+(?:\.\d{2})?)", re.IGNORECASE)
_SUBTOKEN_RE = re.compile(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]")


def parse_amount(value: Any) -> Optional[float]:
    """Strip non-[0-9.] characters and parse; None if nothing parseable."""
    if value is None:
        return None
    s = re.sub(r"[^\d.]", "", str(value))
    if not s or s == ".":
        return None
    try:
        return float(s)
    except ValueError:
        return None


def parse_tagged_output(text: str) -> Dict[str, Any]:
    """CORD-v2-style tag stream -> fields + line_items.

    ``<s_menu>`` contains ``<sep/>``-separated items, each with nested
    ``<s_nm>/<s_cnt>/<s_price>`` tags; ``<s_total>``/``<s_sub_total>`` carry
    amount tags. Unknown tags are kept as raw strings.
    """
    fields: Dict[str, Any] = {}
    line_items: List[Dict[str, Any]] = []
    for m in _TAG_RE.finditer(text or ""):
        key, body = m.group(1), m.group(2).strip()
        if key == "menu":
            for chunk in re.split(r"<sep\s*/>", body):
                inner = {im.group(1): im.group(2).strip()
                         for im in _TAG_RE.finditer(chunk)}
                if not inner:
                    continue
                qty = parse_amount(inner.get("cnt"))
                price = parse_amount(inner.get("price"))
                line_items.append({
                    "description": inner.get("nm", ""),
                    "quantity": int(qty) if qty else 1,
                    "unit_price": price,
                    "line_total": (round(price * (int(qty) if qty else 1), 2)
                                   if price is not None else None),
                })
        elif key in ("total", "sub_total", "tax"):
            inner = {im.group(1): im.group(2).strip()
                     for im in _TAG_RE.finditer(body)}
            raw = inner.get("total_price") or inner.get("subtotal_price") \
                or inner.get("tax_price") or body
            amt = parse_amount(raw)
            name = {"total": "total_amount", "sub_total": "subtotal",
                    "tax": "tax_amount"}[key]
            if amt is not None:
                fields[name] = amt
        else:
            fields[key] = body
    if line_items:
        fields["line_items"] = line_items
    return fields


def parse_json_output(text: str) -> Dict[str, Any]:
    """First {...} block -> fields with cleaned amounts; regex fallback."""
    out: Dict[str, Any] = {}
    m = _JSON_BLOCK_RE.search(text or "")
    if m:
        try:
            raw = json.loads(m.group(0))
            if isinstance(raw, dict):
                for k, v in raw.items():
                    k = str(k).lower()
                    if k in ("total", "total_amount", "subtotal", "tax",
                             "tax_amount", "amount"):
                        amt = parse_amount(v)
                        if amt is not None:
                            out[{"total": "total_amount", "amount": "total_amount",
                                 "tax": "tax_amount"}.get(k, k)] = amt
                    else:
                        out[k] = v
                return out
        except (json.JSONDecodeError, TypeError):
            pass
    # fallback regexes over the raw generation (idefics2.py:364-396)
    vm = _VENDOR_FALLBACK_RE.match((text or "").strip())
    if vm:
        out["vendor_name"] = vm.group(0).strip()
    dm = _DATE_FALLBACK_RE.search(text or "")
    if dm:
        out["date"] = dm.group(0)
    tm = _TOTAL_FALLBACK_RE.search(text or "")
    if tm:
        out["total_amount"] = float(tm.group(1))
    return out


def default_subword_tokenizer(word: str) -> List[str]:
    """Deterministic stand-in for a BPE tokenizer: alpha runs / digit runs /
    single punctuation."""
    return _SUBTOKEN_RE.findall(word) or [word]


def tokenize_with_boxes(
    words: List[Dict[str, Any]],
    tokenizer: Callable[[str], List[str]] = default_subword_tokenizer,
) -> Tuple[List[str], List[List[int]], List[int]]:
    """M29: per word, tokenize; every subtoken inherits the parent word box.
    Returns (tokens, boxes, word_indices), all aligned."""
    tokens: List[str] = []
    boxes: List[List[int]] = []
    word_indices: List[int] = []
    for i, w in enumerate(words):
        for t in tokenizer(w["text"]):
            tokens.append(t)
            boxes.append(list(w["box"]))
            word_indices.append(i)
    return tokens, boxes, word_indices
