"""Model-output parsers (M27-M29): exact behavior on canonical strings."""

from __future__ import annotations

from documentprocessor_ray.functions.parsers import (
    default_subword_tokenizer, parse_amount, parse_json_output,
    parse_tagged_output, tokenize_with_boxes,
)


class TestParseAmount:
    def test_strips_currency_and_text(self):
        assert parse_amount("$12.40") == 12.40
        assert parse_amount(" 1,234.50 USD") == 1234.50  # comma stripped
        assert parse_amount("total: 7") == 7.0

    def test_unparseable(self):
        assert parse_amount(None) is None
        assert parse_amount("n/a") is None
        assert parse_amount(".") is None


class TestTaggedOutput:
    def test_cord_style_menu_and_totals(self):
        text = ("<s_menu><s_nm>Milk</s_nm><s_cnt>2</s_cnt><s_price>$3.99</s_price>"
                "<sep/><s_nm>Bread</s_nm><s_price>2.50</s_price></s_menu>"
                "<s_total><s_total_price>10.48</s_total_price></s_total>"
                "<s_sub_total><s_subtotal_price>9.70</s_subtotal_price></s_sub_total>")
        out = parse_tagged_output(text)
        assert out["total_amount"] == 10.48
        assert out["subtotal"] == 9.70
        items = out["line_items"]
        assert len(items) == 2
        assert items[0] == {"description": "Milk", "quantity": 2,
                            "unit_price": 3.99, "line_total": 7.98}
        assert items[1]["quantity"] == 1 and items[1]["unit_price"] == 2.50

    def test_unknown_tags_kept_raw(self):
        out = parse_tagged_output("<s_store_name>ACME</s_store_name>")
        assert out["store_name"] == "ACME"

    def test_empty(self):
        assert parse_tagged_output("") == {}
        assert parse_tagged_output(None) == {}


class TestJsonOutput:
    def test_json_block_extracted(self):
        out = parse_json_output(
            'Sure! {"vendor_name": "ACME", "total": "$12.40", "tax": "0.92"}')
        assert out == {"vendor_name": "ACME", "total_amount": 12.40,
                       "tax_amount": 0.92}

    def test_fallback_regexes(self):
        out = parse_json_output("ACME Corp receipt 01/15/2024 Total: $12.40")
        assert out["vendor_name"].startswith("ACME")
        assert out["date"] == "01/15/2024"
        assert out["total_amount"] == 12.40

    def test_invalid_json_falls_back(self):
        out = parse_json_output("{not json} Total: 5.00")
        assert out["total_amount"] == 5.00


class TestTokenizeWithBoxes:
    def test_subtokens_inherit_parent_box(self):
        words = [{"text": "Milk2%", "box": [1, 2, 3, 4], "confidence": 0.9},
                 {"text": "$3.99", "box": [5, 6, 7, 8], "confidence": 0.9}]
        tokens, boxes, idx = tokenize_with_boxes(words)
        assert tokens == ["Milk", "2", "%", "$", "3", ".", "99"]
        assert boxes[0] == [1, 2, 3, 4] and boxes[2] == [1, 2, 3, 4]
        assert boxes[3] == [5, 6, 7, 8]
        assert idx == [0, 0, 0, 1, 1, 1, 1]

    def test_custom_tokenizer(self):
        tokens, boxes, idx = tokenize_with_boxes(
            [{"text": "ab", "box": [0, 0, 1, 1], "confidence": 1.0}],
            tokenizer=lambda w: list(w))
        assert tokens == ["a", "b"] and idx == [0, 0]

    def test_default_tokenizer_edge(self):
        assert default_subword_tokenizer("") == [""]
        assert default_subword_tokenizer("...") == [".", ".", "."]
