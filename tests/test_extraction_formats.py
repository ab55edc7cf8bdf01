"""Unit tests for the north-rule extraction formats: PDF layout parse
(functions/pdf.py) and DOM-heuristics main content (functions/dom.py).

These cover generality beyond the SQL-gated synthetic construction:
escaping, multi-page, TJ arrays, out-of-order emission for PDF; nested
containers, void/self-closing tags, stray close tags, invisible subtrees
and entity decode for the DOM."""

import zlib

import pyarrow as pa
import pytest

from documentprocessor_ray.functions.pdf import (
    LINES_PER_PAGE, TOKENS_PER_LINE, build_pdf_batch,
    extract_pdf_text_batch, make_pdf, parse_pdf_text)
from documentprocessor_ray.functions.dom import (
    extract_dom_main_batch, parse_dom)


# ------------------------------------------------------------------ PDF

def test_pdf_roundtrip_basic():
    toks = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta",
            "theta", "iota", "kappa"]
    runs, pages = parse_pdf_text(make_pdf(toks))
    assert " ".join(r[3] for r in runs) == " ".join(toks)
    assert pages == 1
    assert len(runs) == 2  # 10 tokens, 8 per line


def test_pdf_empty_doc_is_one_blank_page():
    runs, pages = parse_pdf_text(make_pdf([]))
    assert runs == [] and pages == 1


def test_pdf_string_escaping():
    toks = ["a(b)", "c\\d", "(nested(parens))", ")lead"]
    runs, _ = parse_pdf_text(make_pdf(toks))
    assert " ".join(r[3] for r in runs) == " ".join(toks)


def test_pdf_multipage_and_column_order():
    # 95 lines -> page 1 full (45+45), page 2 has 5 lines in column 0
    toks = [f"t{i:04d}" for i in range(TOKENS_PER_LINE * (LINES_PER_PAGE + 5))]
    runs, pages = parse_pdf_text(make_pdf(toks))
    assert pages == 2
    assert " ".join(r[3] for r in runs) == " ".join(toks)
    # reading order: page-0 column-0 rows descend in y before column 1
    page0 = [r for r in runs if r[0] == 0]
    assert [r[1] for r in page0[:45]] == [72.0] * 45
    assert [r[1] for r in page0[45:]] == [306.0] * 45
    ys = [r[2] for r in page0[:45]]
    assert ys == sorted(ys, reverse=True)


def test_pdf_content_is_genuinely_shuffled_and_flate_compressed():
    toks = [f"w{i}" for i in range(80)]  # 10 lines
    pdf = make_pdf(toks)
    assert b"/FlateDecode" in pdf and pdf.startswith(b"%PDF-1.4")
    # decode the stream and check emission order differs from reading order
    start = pdf.index(b"stream\n") + 7
    end = pdf.index(b"\nendstream")
    cs = zlib.decompress(pdf[start:end]).decode("latin-1")
    first_line_pos = cs.index("(w0 ")
    later_line_pos = cs.index("(w8 ")  # line 1 starts at token 8
    assert later_line_pos < first_line_pos or first_line_pos > 0


def test_pdf_tj_array_lines_reassemble():
    # odd line indexes use two-part TJ arrays; ensure concatenation exact
    toks = [f"x{i}" for i in range(TOKENS_PER_LINE * 4)]
    pdf = make_pdf(toks)
    cs = zlib.decompress(
        pdf[pdf.index(b"stream\n") + 7:pdf.index(b"\nendstream")])
    assert b"] TJ" in cs and b") Tj" in cs
    runs, _ = parse_pdf_text(pdf)
    assert " ".join(r[3] for r in runs) == " ".join(toks)


def test_pdf_batch_stage():
    t = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                  "text": pa.array(["one two three", "   "], pa.string())})
    out = extract_pdf_text_batch(build_pdf_batch(t))
    rows = out.to_pylist()
    assert rows[0]["pdf_text"] == "one two three"
    assert rows[0]["n_lines"] == 1 and rows[0]["n_pages"] == 1
    assert rows[0]["xsum"] == 72 and rows[0]["ysum"] == 720
    assert rows[1]["pdf_text"] == "" and rows[1]["n_pages"] == 1


# ------------------------------------------------------------------ DOM

def _run_dom(html: str) -> dict:
    t = pa.table({"doc_id": pa.array([1], pa.int64()),
                  "html": pa.array([html], pa.string())})
    return extract_dom_main_batch(t).to_pylist()[0]


def test_dom_tree_shape():
    els, texts = parse_dom(
        '<html><body><div><p>hi there</p><br><img src="x"/>tail</div>'
        "</body></html>")
    assert [e.tag for e in els] == ["html", "body", "div", "p", "br", "img"]
    assert texts == ["hi there", "tail"]
    div = els[2]
    assert (div.t_lo, div.t_hi) == (0, 2)


def test_dom_void_and_self_closing_do_not_nest():
    els, texts = parse_dom("<div>a<br>b<hr/>c</div>")
    assert texts == ["a", "b", "c"]
    assert els[0].t_hi == 3  # div closes with all three texts inside


def test_dom_stray_close_ignored_and_eof_closes():
    els, texts = parse_dom("<div>x</span>y<p>z")
    assert texts == ["x", "y", "z"]
    assert els[0].t_hi == 3 and els[1].t_hi == 3


def test_dom_script_style_invisible():
    r = _run_dom("<body><div>real content here that is long enough"
                 "</div><script>var boilerplate = 'junk junk junk';"
                 "</script><style>.x{color:red}</style></body>")
    assert "junk" not in r["main_text"] and "color" not in r["main_text"]
    assert r["main_text"].startswith("real content")


def test_dom_nested_container_beats_outer():
    # inner article holds all the text; outer div adds only link text,
    # so the deeper article must win (tie goes to later document order)
    html = ('<div><a href="#">spam spam spam spam</a>'
            "<article>the actual long form story body text</article></div>")
    r = _run_dom(html)
    assert r["winner_tag"] == "article"
    assert r["main_text"] == "the actual long form story body text"


def test_dom_link_density_taxes_containers():
    # a div whose text is all links scores negative; plain td wins
    html = ('<table><td>modest cell text</td></table>'
            '<div><a href="#">one</a> <a href="#">two</a></div>')
    r = _run_dom(html)
    assert r["winner_tag"] == "td"
    assert r["main_text"] == "modest cell text"


def test_dom_entities_normalized():
    r = _run_dom("<div>fish &amp; chips &lt;now&gt;</div>")
    assert r["main_text"] == 'fish & chips <now>'


def test_dom_empty_html():
    r = _run_dom("")
    assert r["main_text"] == "" and r["n_elements"] == 0
    assert r["n_candidates"] == 0 and r["winner_tag"] == ""


def test_dom_anchor_lengths_attribute_to_all_ancestors():
    els, _ = parse_dom('<body><div><a href="#">x</a></div></body>')
    body, div = els[0], els[1]
    assert len(body.anchors) == 1 and len(div.anchors) == 1
