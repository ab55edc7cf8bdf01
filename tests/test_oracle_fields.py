"""Golden-value conformance for the pure operator chain (M12-M25).

Expected values come from the reference's own unit tests
(Ocr/tests/test_cli_unit.py:223-367) and fixture receipts
(Ocr/tests/conftest.py:37-65).
"""

from decimal import Decimal

from documentprocessor_ray.oracle import fields as F
from documentprocessor_ray.oracle.boxes import (
    normalize_box,
    normalize_boxes,
    paddle_result_to_words,
    raw_ocr_text,
    tesseract_result_to_words,
)


class TestNormalizeBoxes:
    def test_golden_value(self):
        # test_cli_unit.py:242-252: [100,150,200,300] @ 400x600 -> [250,250,500,500]
        assert normalize_box([100, 150, 200, 300], 400, 600) == [250, 250, 500, 500]

    def test_clamping(self):
        # negatives / overflow clamp to [0, 1000] (test_cli_unit.py:254-260)
        assert normalize_box([-10, -5, 500, 700], 400, 600) == [0, 0, 1000, 1000]

    def test_truncation_not_rounding(self):
        assert normalize_box([1, 1, 399, 599], 400, 600) == [2, 1, 997, 998]

    def test_preserves_text_and_conf(self, sample_words):
        out = normalize_boxes(sample_words, 400, 600)
        assert [w["text"] for w in out] == [w["text"] for w in sample_words]
        assert [w["confidence"] for w in out] == [w["confidence"] for w in sample_words]
        assert out[0]["box"] == [250, 83, 750, 166]


class TestScalarExtractors:
    def test_extract_amount(self):
        assert F.extract_amount("$3.99") == Decimal("3.99")
        assert F.extract_amount("1,234.56") == Decimal("1234.56")
        assert F.extract_amount("Total: $ 12.40") == Decimal("12.40")
        assert F.extract_amount("no money here") is None

    def test_extract_date_iso_formats(self):
        # field_extractor.py:62-86 / test_cli_unit.py:357-367
        assert F.extract_date_iso("12/25/2023") == "2023-12-25"
        assert F.extract_date_iso("2023-12-25") == "2023-12-25"
        assert F.extract_date_iso("Jan 15, 2024") == "2024-01-15"
        assert F.extract_date_iso("hello") is None

    def test_date_strptime_order_m_before_d(self):
        # %m/%d/%Y tried before %d/%m/%Y: 01/02/2024 -> January 2nd
        assert F.extract_date_iso("01/02/2024") == "2024-01-02"
        # 25/12/2023 fails %m/%d -> parsed %d/%m
        assert F.extract_date_iso("25/12/2023") == "2023-12-25"


class TestHeuristics:
    def test_vendor_top3(self, sample_words):
        v = F.extract_vendor_name(sample_words)
        assert v["value"] == "GROCERY STORE Date:"
        assert abs(v["confidence"] - (0.98 + 0.96 + 0.95) / 3) < 1e-9
        assert v["box"] == {"x0": 50, "y0": 50, "x1": 300, "y1": 230}

    def test_vendor_empty(self):
        assert F.extract_vendor_name([]) is None

    def test_total(self, sample_words):
        # Reference quirk: "Subtotal" contains the keyword "total", so the
        # first-keyword scan (field_extractor.py:154-172) lands on the
        # subtotal amount; the reference's own test asserts only non-null.
        t = F.extract_total(sample_words)
        assert t["value"] == "6.49"
        assert t["confidence"] == 0.95
        assert t["box"] == {"x0": 300, "y0": 450, "x1": 380, "y1": 480}

    def test_total_without_subtotal_prefix(self, sample_words):
        words = [w for w in sample_words if w["text"] not in ("Subtotal", "$6.49")]
        t = F.extract_total(words)
        assert t["value"] == "7.01"
        assert t["confidence"] == 0.97

    def test_subtotal_and_tax(self, sample_words):
        # Reference quirk: the scan window starts at i-2
        # (receipt_processor.py:458,483), so the PREVIOUS line's amount wins
        # when it sits within two words of the keyword.
        st = F.extract_subtotal_heuristic(sample_words)
        assert st["value"] == "2.50"   # $2.50 is 2 words before "Subtotal"
        tax = F.extract_tax_heuristic(sample_words)
        assert tax["value"] == "6.49"  # $6.49 is 2 words before "Tax"

    def test_subtotal_tax_forward_scan(self):
        words = [
            {"text": "Subtotal", "box": [0, 0, 10, 10], "confidence": 0.9},
            {"text": "$6.49", "box": [20, 0, 30, 10], "confidence": 0.95},
            {"text": "Tax", "box": [0, 20, 10, 30], "confidence": 0.9},
            {"text": "$0.52", "box": [20, 20, 30, 30], "confidence": 0.94},
        ]
        assert F.extract_subtotal_heuristic(words)["value"] == "6.49"
        # tax keyword at i=2: window starts at i-2=0 -> "$6.49" matches first
        assert F.extract_tax_heuristic(words)["value"] == "6.49"

    def test_date_heuristic(self, sample_words):
        d = F.extract_date_heuristic(sample_words)
        assert d["value"] == "01/15/2024"
        assert d["confidence"] == 0.94

    def test_currency_usd(self, sample_words):
        c = F.detect_currency(sample_words)
        assert c == {"value": "USD", "confidence": 0.9, "box": None}

    def test_currency_eur(self):
        words = [{"text": "12,50 EUR", "box": [0, 0, 10, 10], "confidence": 0.9}]
        assert F.detect_currency(words)["value"] == "EUR"

    def test_currency_none(self):
        words = [{"text": "hello", "box": [0, 0, 10, 10], "confidence": 0.9}]
        assert F.detect_currency(words) is None

    def test_empty_words_all_none(self):
        fields = F.extract_fields_heuristic([])
        assert fields["vendor_name"] is None
        assert fields["total_amount"] is None
        assert fields["line_items"] == []


class TestLineGrouping:
    def test_grouping_and_reading_order(self, sample_words):
        lines = F.group_words_into_lines(sample_words)
        texts = [" ".join(w["text"] for w in line) for line in lines]
        assert texts[0] == "GROCERY"
        assert "Milk $3.99" in texts
        assert "Total $7.01" in texts

    def test_x_sort_within_line(self):
        words = [
            {"text": "b", "box": [100, 10, 110, 20], "confidence": 1.0},
            {"text": "a", "box": [10, 12, 20, 22], "confidence": 1.0},
        ]
        lines = F.group_words_into_lines(words)
        assert len(lines) == 1
        assert [w["text"] for w in lines[0]] == ["a", "b"]

    def test_threshold_boundary(self):
        # |dy| <= 20 stays on the line; 21 starts a new one
        w1 = {"text": "x", "box": [0, 0, 5, 5], "confidence": 1.0}
        w2 = {"text": "y", "box": [10, 20, 15, 25], "confidence": 1.0}
        w3 = {"text": "z", "box": [10, 41, 15, 46], "confidence": 1.0}
        assert len(F.group_words_into_lines([w1, w2])) == 1
        assert len(F.group_words_into_lines([w1, w3])) == 2


class TestLineItems:
    def test_line_items(self, sample_words):
        items = F.extract_line_items(sample_words)
        descs = {i["description"] for i in items}
        assert descs == {"Milk", "Bread"}
        milk = next(i for i in items if i["description"] == "Milk")
        assert milk["line_total"] == 3.99
        assert milk["unit_price"] == 3.99
        assert milk["quantity"] == 1

    def test_quantity_and_unit_price_backfill(self):
        words = [
            {"text": "Coffee", "box": [10, 10, 60, 24], "confidence": 0.9},
            {"text": "3x", "box": [70, 10, 90, 24], "confidence": 0.9},
            {"text": "$26.25", "box": [100, 10, 150, 24], "confidence": 0.9},
        ]
        items = F.extract_line_items(words)
        assert len(items) == 1
        assert items[0]["quantity"] == 3
        assert items[0]["line_total"] == 26.25
        assert items[0]["unit_price"] == round(26.25 / 3, 2)

    def test_two_prices_shift(self):
        words = [
            {"text": "Gadget", "box": [10, 10, 60, 24], "confidence": 0.9},
            {"text": "2.00", "box": [70, 10, 100, 24], "confidence": 0.9},
            {"text": "4.00", "box": [110, 10, 140, 24], "confidence": 0.9},
        ]
        items = F.extract_line_items(words)
        assert items[0]["unit_price"] == 2.00
        assert items[0]["line_total"] == 4.00

    def test_skip_keyword_lines(self, sample_words):
        items = F.extract_line_items(sample_words)
        assert all("total" not in i["description"].lower() for i in items)


class TestVerifyConsolidate:
    def test_verify_totals(self):
        assert F.verify_totals(Decimal("6.49"), Decimal("0.52"), Decimal("7.01"))
        assert F.verify_totals(Decimal("6.49"), Decimal("0.52"), Decimal("7.03"))
        assert not F.verify_totals(Decimal("6.49"), Decimal("0.52"), Decimal("7.04"))
        assert not F.verify_totals(None, Decimal("1"), Decimal("1"))

    def test_consolidate(self):
        raw = {"a": {"value": "x", "confidence": 0.9},
               "b": {"value": "y", "confidence": 0.4}}
        out = F.consolidate_fields(raw)
        assert "a" in out and "b" not in out


class TestOcrAdapters:
    def test_paddle_adapter(self):
        # mocked PaddleOCR nested output (Ocr/tests/conftest.py:131-148)
        result = [[
            [[[100, 50], [300, 50], [300, 100], [100, 100]], ("GROCERY", 0.98)],
            [[[100, 100], [250, 100], [250, 150], [100, 150]], ("STORE", 0.96)],
            [[[0, 0], [1, 0], [1, 1], [0, 1]], ("  ", 0.5)],  # blank skipped
        ]]
        words = paddle_result_to_words(result)
        assert len(words) == 2
        assert words[0] == {"text": "GROCERY", "box": [100, 50, 300, 100], "confidence": 0.98}

    def test_tesseract_adapter(self):
        data = {
            "text": ["GROCERY", "", "STORE", "bad"],
            "conf": [98, -1, 96, -1],
            "left": [100, 0, 100, 0],
            "top": [50, 0, 100, 0],
            "width": [200, 0, 150, 0],
            "height": [50, 0, 50, 0],
        }
        words = tesseract_result_to_words(data)
        assert len(words) == 2
        assert words[0]["confidence"] == 0.98
        assert words[1]["box"] == [100, 100, 250, 150]

    def test_raw_ocr_text(self, sample_words):
        assert raw_ocr_text(sample_words).startswith("GROCERY STORE Date: 01/15/2024")
