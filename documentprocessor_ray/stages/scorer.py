"""Scorer stage: the model-inference path as a Ray actor pool.

Mirrors the reference's model layer with a deterministic stand-in so the
actor-pool code path (heavy state in __init__, batched predict in __call__)
is real and testable without model downloads:

- ``BaseScorer``      -> reference BaseModel ABC (Ocr/src/models/base.py:11-50)
- ``RuleScorer``      -> stand-in for LayoutLMv3 token classification
  (models/layoutlmv3.py:70-129 load, 267-348 predict); emits BIO labels over
  RECEIPT_LABELS and decodes them exactly like M26
  (models/layoutlmv3.py:350-435): group B-/I- runs, join tokens, avg
  confidence, union box; singles keep max-confidence, ITEMs append.
- ``get_scorer``      -> model registry (models/__init__.py:24-37)
- ``merge_fields``    -> model-vs-heuristic merge M30
  (receipt_processor.py:362-416): model entities win; missing vendor/total
  back-filled from heuristics.

The RuleScorer "weights" are a seeded numpy matrix hashed from token text —
load cost is real (built once per actor), predictions are deterministic.
"""

from __future__ import annotations

import re
from typing import Any, Dict, List, Optional

import numpy as np
import pyarrow as pa

from ..oracle import fields as F

# 13 labels, O + B-/I- x 6 entity kinds (reference models/layoutlmv3.py:16-30)
RECEIPT_LABELS = ["O"]
for _kind in ["VENDOR", "DATE", "TOTAL", "SUBTOTAL", "TAX", "ITEM"]:
    RECEIPT_LABELS += [f"B-{_kind}", f"I-{_kind}"]

_DATE_RE = re.compile(r"\d{1,2}[/-]\d{1,2}[/-]\d{2,4}|\d{4}[/-]\d{1,2}[/-]\d{1,2}")
_AMOUNT_RE = re.compile(r"^\$?\d{1,3}(?:,\d{3})*(?:\.\d{2})?$")


class BaseScorer:
    """Model protocol: construct = load weights; predict = per-document."""

    def predict(self, words: List[Dict[str, Any]]) -> Dict[str, Any]:
        raise NotImplementedError


class NullScorer(BaseScorer):
    """No-model path: always returns empty entities (heuristics take over)."""

    def predict(self, words):
        return {}


class RuleScorer(BaseScorer):
    """Deterministic token classifier over RECEIPT_LABELS.

    __init__ builds a (vocab-hash x labels) weight matrix from a fixed seed —
    the stand-in for loading model weights; per-token confidence is a stable
    function of (token, label)."""

    def __init__(self, seed: int = 21):
        rng = np.random.default_rng(seed)
        self.weights = rng.uniform(0.85, 0.99, size=(4096, len(RECEIPT_LABELS)))

    def _conf(self, token: str, label_id: int) -> float:
        h = hash_token(token)
        return float(self.weights[h % 4096, label_id])

    def _label_ids(self, words: List[Dict[str, Any]]) -> List[int]:
        """Rule head: y-order for vendor, regex for date/amounts, keyword
        context for total/subtotal/tax, mid-page amount rows for items."""
        n = len(words)
        ids = [0] * n
        if n == 0:
            return ids
        order = sorted(range(n), key=lambda i: (words[i]["box"][1], words[i]["box"][0]))
        # vendor: the top reading-order line
        top_y = words[order[0]]["box"][1]
        vendor_idx = [i for i in order if abs(words[i]["box"][1] - top_y) <= 20]
        for rank, i in enumerate(vendor_idx[:3]):
            ids[i] = RECEIPT_LABELS.index("B-VENDOR" if rank == 0 else "I-VENDOR")
        # most-specific first: "subtotal" contains "total", so SUBTOTAL must
        # claim its word before the TOTAL rule sees it
        kw_map = [("subtotal", "SUBTOTAL", F.SUBTOTAL_KEYWORDS),
                  ("tax", "TAX", F.TAX_KEYWORDS),
                  ("total", "TOTAL", F.TOTAL_KEYWORDS)]
        for i, w in enumerate(words):
            t = w["text"]
            if ids[i]:
                continue
            if _DATE_RE.search(t):
                ids[i] = RECEIPT_LABELS.index("B-DATE")
                continue
            low = t.lower()
            for _, kind, kws in kw_map:
                if any(k in low for k in kws):
                    # the first amount within the next 4 words gets the kind
                    for j in range(i + 1, min(i + 5, n)):
                        if _AMOUNT_RE.match(words[j]["text"]):
                            if not ids[j]:
                                ids[j] = RECEIPT_LABELS.index(f"B-{kind}")
                            break
                    break
        # items: description+amount lines not claimed above
        idx_of = {id(w): i for i, w in enumerate(words)}
        for line in F.group_words_into_lines(words):
            idxs = [idx_of[id(w)] for w in line]
            if any(ids[i] for i in idxs):
                continue
            if len(line) >= 2 and _AMOUNT_RE.match(line[-1]["text"]):
                ids[idxs[0]] = RECEIPT_LABELS.index("B-ITEM")
                for i in idxs[1:]:
                    ids[i] = RECEIPT_LABELS.index("I-ITEM")
        return ids

    def predict(self, words):
        if not words:
            return {}
        ids = self._label_ids(words)
        confs = [self._conf(w["text"], l) for w, l in zip(words, ids)]
        return decode_bio(words, ids, confs)


def hash_token(token: str) -> int:
    """Stable token hash (FNV-1a 32-bit) — not Python hash() (salted)."""
    h = 2166136261
    for b in token.encode("utf-8"):
        h = ((h ^ b) * 16777619) & 0xFFFFFFFF
    return h


def decode_bio(words: List[Dict[str, Any]], label_ids: List[int],
               confs: List[float]) -> Dict[str, Any]:
    """M26 BIO decode: runs of B-X (I-X)* -> one entity; per entity join
    texts, mean confidence, union box. Singleton kinds keep the
    max-confidence entity; ITEM entities accumulate into a list."""
    entities: Dict[str, Any] = {}
    items: List[Dict[str, Any]] = []
    i = 0
    n = len(words)
    while i < n:
        lab = RECEIPT_LABELS[label_ids[i]]
        if not lab.startswith("B-"):
            i += 1
            continue
        kind = lab[2:]
        j = i + 1
        while j < n and RECEIPT_LABELS[label_ids[j]] == f"I-{kind}":
            j += 1
        group = list(range(i, j))
        ent = {
            "value": " ".join(words[k]["text"] for k in group),
            "confidence": float(np.mean([confs[k] for k in group])),
            "box": {
                "x0": min(words[k]["box"][0] for k in group),
                "y0": min(words[k]["box"][1] for k in group),
                "x1": max(words[k]["box"][2] for k in group),
                "y1": max(words[k]["box"][3] for k in group),
            },
        }
        if kind == "ITEM":
            items.append(ent)
        else:
            key = kind.lower()
            if key not in entities or ent["confidence"] > entities[key]["confidence"]:
                entities[key] = ent
        i = j
    if items:
        entities["items"] = items
    return entities


class _GenScorer(BaseScorer):
    """Base for the generation+parse scorers: predict() GENERATES model
    output text from the page words (the deterministic stand-in for
    model.generate — swap _generate for a real VLM decode) and then DECODES
    it with the pure parsers in functions/parsers.py, exactly the shape the
    reference runs inside its model wrappers (donut.py:211-345,
    idefics2.py:262-396). The parse path therefore executes inside the Ray
    actor pool on every batch, not just in unit tests."""

    GEN_CONFIDENCE = 0.9  # generation models emit no per-token box/conf

    def __init__(self, seed: int = 33):
        self.rule = RuleScorer(seed)  # weight-matrix build = actor-state cost

    def _generate(self, words: List[Dict[str, Any]]) -> str:
        raise NotImplementedError

    def _parse(self, text: str) -> Dict[str, Any]:
        raise NotImplementedError

    def predict(self, words):
        if not words:
            return {}
        fields = self._parse(self._generate(words))
        return self._fields_to_entities(fields)

    def _fields_to_entities(self, fields: Dict[str, Any]) -> Dict[str, Any]:
        def ent(v):
            return {"value": str(v), "confidence": self.GEN_CONFIDENCE,
                    "box": None}

        out: Dict[str, Any] = {}
        mapping = {"vendor": ("vendor", "vendor_name"),
                   "date": ("date",),
                   "total": ("total_amount",),
                   "subtotal": ("subtotal", "sub_total"),
                   "tax": ("tax_amount",)}
        for kind, keys in mapping.items():
            for k in keys:
                if fields.get(k) is not None:
                    out[kind] = ent(fields[k])
                    break
        items = []
        for it in fields.get("line_items", []) or []:
            items.append({
                "value": it.get("description", ""),
                "confidence": self.GEN_CONFIDENCE,
                "box": None,
            })
        if items:
            out["items"] = items
        return out


class TagGenScorer(_GenScorer):
    """Donut CORD-v2 path (M27): emits a <s_field>value</s_field> tag stream
    (menu items <sep/>-separated with nested nm/cnt/price tags) and decodes
    it with parse_tagged_output (reference donut.py:211-345 token2json)."""

    def _generate(self, words):
        ents = self.rule.predict(words)
        parts: List[str] = []
        if "vendor" in ents:
            parts.append(f"<s_vendor>{ents['vendor']['value']}</s_vendor>")
        if "date" in ents:
            parts.append(f"<s_date>{ents['date']['value']}</s_date>")
        for kind, tag, inner in [("total", "total", "total_price"),
                                 ("subtotal", "sub_total", "subtotal_price"),
                                 ("tax", "tax", "tax_price")]:
            if kind in ents:
                parts.append(f"<s_{tag}><s_{inner}>{ents[kind]['value']}"
                             f"</s_{inner}></s_{tag}>")
        items = ents.get("items", [])
        if items:
            chunks = [f"<s_nm>{it['value']}</s_nm><s_cnt>1</s_cnt>"
                      f"<s_price>0.00</s_price>" for it in items]
            parts.append("<s_menu>" + "<sep/>".join(chunks) + "</s_menu>")
        return "".join(parts)

    def _parse(self, text):
        from ..functions.parsers import parse_tagged_output

        return parse_tagged_output(text)


class JsonGenScorer(_GenScorer):
    """IDEFICS2 JSON path (M28): emits a {...} JSON block and decodes it with
    parse_json_output (reference idefics2.py:262-396), exercising the
    brace-block search + amount cleaning + regex-fallback machinery."""

    def _generate(self, words):
        import json as _json

        ents = self.rule.predict(words)
        obj: Dict[str, Any] = {}
        if "vendor" in ents:
            obj["vendor_name"] = ents["vendor"]["value"]
        if "date" in ents:
            obj["date"] = ents["date"]["value"]
        for kind, key in [("total", "total"), ("subtotal", "subtotal"),
                          ("tax", "tax")]:
            if kind in ents:
                obj[key] = ents[kind]["value"]
        if not obj:
            return ""  # exercises the parser's regex-fallback branch
        return "The extracted receipt data is: " + _json.dumps(obj)

    def _parse(self, text):
        from ..functions.parsers import parse_json_output

        return parse_json_output(text)


_REGISTRY = {"rule": RuleScorer, "null": NullScorer,
             "donut": TagGenScorer, "idefics2": JsonGenScorer}


_HF_NAMES = ("layoutlmv3-hf", "donut-hf", "idefics2-hf", "det-vision")


def get_scorer(name: str, **kwargs) -> BaseScorer:
    """Model registry (reference models/__init__.py:24-37). The "-hf" names
    resolve to the import-guarded HuggingFace adapters (stages/hf_scorers.py)
    — registered lazily so this module never imports torch."""
    if name not in _REGISTRY and name in _HF_NAMES:
        from . import hf_scorers  # noqa: F401 — registers the -hf names
    if name not in _REGISTRY:
        raise ValueError(f"unknown scorer '{name}'; known: {sorted(_REGISTRY)}")
    return _REGISTRY[name](**kwargs)


def register_scorer(name: str, cls) -> None:
    """User-extension surface: add-a-model recipe (Ocr/README.md:576-581)."""
    _REGISTRY[name] = cls


def merge_fields(model_entities: Dict[str, Any],
                 heuristics: Dict[str, Any]) -> Dict[str, Any]:
    """M30: model entities if present; back-fill vendor/total from
    heuristics; full heuristic fallback when the model returned nothing."""
    if not model_entities:
        return dict(heuristics)
    out: Dict[str, Any] = {}
    mapping = {"vendor": "vendor_name", "date": "date", "total": "total_amount",
               "subtotal": "subtotal", "tax": "tax_amount"}
    for mkey, fkey in mapping.items():
        out[fkey] = model_entities.get(mkey) or heuristics.get(fkey)
    out["currency"] = heuristics.get("currency")
    out["merchant_address"] = heuristics.get("merchant_address")
    out["line_items"] = heuristics.get("line_items", [])
    out["model_items"] = model_entities.get("items", [])
    return out


class ScorerStage:
    """Actor-pool stage: model loaded once per actor (__init__), documents
    scored per batch. Input rows need (doc_id, words: list<struct>); output
    adds model_* entity columns. Use
    ``map_batches(ScorerStage, fn_constructor_kwargs={'model': 'rule'},
    concurrency=(1, N), batch_size=B, num_cpus=1)`` — swap num_cpus for
    num_gpus=1 when the scorer is a real GPU model (A4-A6)."""

    def __init__(self, model: str = "rule", use_pixels: bool = False,
                 media_dir: Optional[str] = None):
        self.scorer = get_scorer(model)
        self.use_pixels = use_pixels
        self.store = None
        if use_pixels:
            if media_dir is None:
                raise ValueError("use_pixels=True requires media_dir")
            if not hasattr(self.scorer, "predict_image"):
                raise TypeError(
                    f"scorer '{model}' has no predict_image; pixels mode "
                    "needs a vision scorer (donut-hf / idefics2-hf / "
                    "det-vision)")
            from ..corpus import MediaStore

            self.store = MediaStore(media_dir)

    def _predict_pixels(self, spans: List[Dict[str, Any]]) -> Dict[str, Any]:
        """Per-doc vision prediction over the REAL page pixels: load each
        media page referenced by the doc's spans_out (order-preserving
        dedupe — one line span per page line shares the page's ref), run
        ``scorer.predict_image`` per page, consolidate field-wise (first
        page with the field wins, M25's consolidation shape; items
        concatenate across pages)."""
        refs: List[str] = []
        for s in spans or []:
            r = s.get("media_ref")
            if s.get("kind") == "media" and r and r not in refs:
                refs.append(r)
        merged: Dict[str, Any] = {}
        items: List[Any] = []
        for r in refs:
            img = self.store.load(r)
            if img is None:
                continue
            ents = self.scorer.predict_image(img)
            for kind in ["vendor", "date", "total", "subtotal", "tax"]:
                if kind not in merged and ents.get(kind) is not None:
                    merged[kind] = ents[kind]
            items.extend(ents.get("items", []))
        if items:
            merged["items"] = items
        return merged

    def __call__(self, batch: pa.Table) -> pa.Table:
        ent_struct = pa.struct([
            ("value", pa.string()), ("confidence", pa.float64()),
            ("box", pa.struct([("x0", pa.int64()), ("y0", pa.int64()),
                               ("x1", pa.int64()), ("y1", pa.int64())])),
        ])
        out_cols: Dict[str, List[Any]] = {
            k: [] for k in ["model_vendor", "model_date", "model_total",
                            "model_subtotal", "model_tax"]}
        n_items: List[int] = []
        if self.use_pixels:
            for spans in batch["spans_out"].to_pylist():
                ents = self._predict_pixels(spans)
                for kind in ["vendor", "date", "total", "subtotal", "tax"]:
                    out_cols[f"model_{kind}"].append(ents.get(kind))
                n_items.append(len(ents.get("items", [])))
            res = batch
            for name, vals in out_cols.items():
                res = res.append_column(name, pa.array(vals, ent_struct))
            return res.append_column("model_n_items",
                                     pa.array(n_items, pa.int64()))
        for wlist in batch["words"].to_pylist():
            words = [{"text": w["text"],
                      "box": [w["x0"], w["y0"], w["x1"], w["y1"]],
                      "confidence": w["confidence"]} for w in (wlist or [])]
            ents = self.scorer.predict(words)
            for kind in ["vendor", "date", "total", "subtotal", "tax"]:
                out_cols[f"model_{kind}"].append(ents.get(kind))
            n_items.append(len(ents.get("items", [])))
        res = batch
        for name, vals in out_cols.items():
            res = res.append_column(name, pa.array(vals, ent_struct))
        return res.append_column("model_n_items", pa.array(n_items, pa.int64()))
