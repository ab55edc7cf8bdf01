"""PDF layout parse: the north rule's "PDF/layout parse" extraction path.

Reference scope: richardforrestbarker/DocumentProcessor is image-only; the
north rule extends main-content extraction to "HTML boilerplate strip,
PDF/layout parse, DOM heuristics" over interleaved documents. This module
supplies the PDF leg from public format knowledge only (ISO 32000 text
operators; zlib is stdlib):

``build_pdf_batch``   — deterministic generator: real, valid PDF bytes per
                        document (correct xref offsets, FlateDecode content
                        streams) laying the token stream out on a two-column
                        multi-page grid. Lines are EMITTED in a deterministic
                        shuffled order with explicit ``Tm`` coordinates, so
                        extraction cannot succeed by stream order alone.
``extract_pdf_text_batch`` — parser: slices streams by ``/Length``, inflates
                        FlateDecode, tokenizes the content stream (numbers,
                        names, escaped strings, arrays, operators), tracks
                        the text matrix through ``Tm``/``Td``, collects
                        ``Tj``/``TJ`` runs, and reconstructs reading order
                        by (page, column, -y, x).

Layout spec (shared verbatim by the SQL twin in pipelines/analysis.py):
TOKENS_PER_LINE whitespace tokens per line; ROWS_PER_COL rows per column,
2 columns per page (column-major reading order); line i at page
``i // (2*ROWS_PER_COL)``, column ``(i % (2*ROWS_PER_COL)) // ROWS_PER_COL``,
row ``i % ROWS_PER_COL``; x = 72 + 234*col, y = 720 - 14*row. Even global
lines are written with ``Tj``, odd lines as two-part ``TJ`` arrays with a
kerning number between the parts (concatenation restores the line). Hence
extracted text == the document's whitespace-normalized token join, and the
parsed-coordinate sums are closed-form functions of the token count — both
hash-verified against DuckDB.

Stateless and embarrassingly parallel: one doc = one independent PDF; the
stage runs as a plain ``map_batches`` task pool (cheap state: compiled
regexes at module import — see memory: task pool beats actor pool here).
"""

from __future__ import annotations

import re
import zlib
from typing import List, Tuple

import numpy as np
import pyarrow as pa

from . import textstats as T

TOKENS_PER_LINE = 8
ROWS_PER_COL = 45
LINES_PER_PAGE = 2 * ROWS_PER_COL
X0, X1 = 72, 306          # column x origins (306 = 72 + 234)
Y_TOP, LEADING = 720, 14
COL_SPLIT_X = 306         # parsed x >= this => column 1

_ESC = {ord("\\"): "\\\\", ord("("): "\\(", ord(")"): "\\)"}


def _pdf_str(s: str) -> str:
    """Escape a python string into a PDF literal string body."""
    return s.translate(_ESC)


def _line_layout(i: int) -> Tuple[int, int, int]:
    """global line index -> (page, x, y)."""
    page, j = divmod(i, LINES_PER_PAGE)
    col, row = divmod(j, ROWS_PER_COL)
    return page, X0 + 234 * col, Y_TOP - LEADING * row


def _shuffle_key(i: int) -> int:
    """Deterministic emission permutation (Knuth multiplicative hash)."""
    return (i * 2654435761) & 0xFFFFFFFF


def _content_stream(lines: List[Tuple[int, int, str]]) -> bytes:
    """(x, y, text) lines -> one page's content stream (uncompressed)."""
    out = []
    for k, (x, y, s) in enumerate(lines):
        if k % 2 == 0 or " " not in s:
            body = f"({_pdf_str(s)}) Tj"
        else:
            # split at a token boundary; TJ concatenation restores the line
            toks = s.split(" ")
            h = (len(toks) + 1) // 2
            a = " ".join(toks[:h]) + " "
            b = " ".join(toks[h:])
            body = f"[({_pdf_str(a)}) -250 ({_pdf_str(b)})] TJ"
        out.append(f"BT /F1 12 Tf 1 0 0 1 {x} {y} Tm {body} ET")
    return ("\n".join(out) + "\n").encode("latin-1")


def make_pdf(tokens: List[str]) -> bytes:
    """Valid single-font PDF laying `tokens` on the two-column grid.

    Lines are emitted within each page in _shuffle_key order; coordinates
    carry the true layout. Always >= 1 page (an empty doc is a blank page).
    """
    lines: List[Tuple[int, str]] = []
    for i in range(0, len(tokens), TOKENS_PER_LINE):
        lines.append((len(lines), " ".join(tokens[i:i + TOKENS_PER_LINE])))
    n_pages = max(1, -(-len(lines) // LINES_PER_PAGE))

    # object numbering: 1 catalog, 2 pages, 3 font, then per page
    # (page obj, content obj) pairs
    objs: List[bytes] = []
    page_ids, content_ids = [], []
    next_id = 4
    for p in range(n_pages):
        page_ids.append(next_id)
        content_ids.append(next_id + 1)
        next_id += 2

    kids = " ".join(f"{i} 0 R" for i in page_ids)
    objs.append((1, f"<< /Type /Catalog /Pages 2 0 R >>".encode()))
    objs.append((2, (f"<< /Type /Pages /Kids [{kids}] "
                     f"/Count {n_pages} >>").encode()))
    objs.append((3, b"<< /Type /Font /Subtype /Type1 "
                    b"/BaseFont /Helvetica >>"))
    for p in range(n_pages):
        page_lines = []
        for i, s in lines[p * LINES_PER_PAGE:(p + 1) * LINES_PER_PAGE]:
            _, x, y = _line_layout(i)
            page_lines.append((i, x, y, s))
        page_lines.sort(key=lambda t: _shuffle_key(t[0]))
        raw = _content_stream([(x, y, s) for _, x, y, s in page_lines])
        comp = zlib.compress(raw, 6)
        objs.append((page_ids[p],
                     (f"<< /Type /Page /Parent 2 0 R "
                      f"/MediaBox [0 0 612 792] "
                      f"/Contents {content_ids[p]} 0 R "
                      f"/Resources << /Font << /F1 3 0 R >> >> >>").encode()))
        objs.append((content_ids[p],
                     (f"<< /Length {len(comp)} /Filter /FlateDecode >>"
                      ).encode() + b"\nstream\n" + comp + b"\nendstream"))

    # assemble with a correct xref so real PDF readers can open the file
    buf = bytearray(b"%PDF-1.4\n")
    offsets = {}
    for oid, body in sorted(objs):
        offsets[oid] = len(buf)
        buf += f"{oid} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_at = len(buf)
    n_obj = len(objs) + 1
    buf += f"xref\n0 {n_obj}\n".encode()
    buf += b"0000000000 65535 f \n"
    for oid in range(1, n_obj):
        buf += f"{offsets[oid]:010d} 00000 n \n".encode()
    buf += (f"trailer\n<< /Size {n_obj} /Root 1 0 R >>\n"
            f"startxref\n{xref_at}\n%%EOF\n").encode()
    return bytes(buf)


# ---------------------------------------------------------------- parser

_STREAM_DICT_RE = re.compile(
    rb"<<(.*?)>>[ \t\r\n]*stream\r?\n", re.S)
_LENGTH_RE = re.compile(rb"/Length[ \t\r\n]+(\d+)")

# content-stream tokenizer: strings are handled separately (escapes)
_CS_TOKEN_RE = re.compile(
    rb"\(|\[|\]|/[A-Za-z0-9]+|-?\d+(?:\.\d+)?|[A-Za-z'\"*]+")

_OCTAL_RE = re.compile(rb"\\([0-7]{1,3})")
_STR_ESC = {b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\x08",
            b"f": b"\x0c", b"(": b"(", b")": b")", b"\\": b"\\"}


def _read_pdf_string(data: bytes, pos: int) -> Tuple[bytes, int]:
    """Read a PDF literal string starting after '('; returns (bytes, end)."""
    out = bytearray()
    depth = 1
    n = len(data)
    while pos < n:
        c = data[pos:pos + 1]
        if c == b"\\":
            m = _OCTAL_RE.match(data, pos)
            if m:
                out.append(int(m.group(1), 8))
                pos = m.end()
                continue
            e = data[pos + 1:pos + 2]
            out += _STR_ESC.get(e, e)
            pos += 2
            continue
        if c == b"(":
            depth += 1
        elif c == b")":
            depth -= 1
            if depth == 0:
                return bytes(out), pos + 1
        out += c
        pos += 1
    raise ValueError("unterminated PDF string")


def _extract_streams(pdf: bytes) -> List[bytes]:
    """All decoded stream payloads, in file order, sliced by /Length."""
    streams = []
    for m in _STREAM_DICT_RE.finditer(pdf):
        d = m.group(1)
        lm = _LENGTH_RE.search(d)
        if not lm:  # indirect /Length: not produced by our generator
            raise ValueError("stream without inline /Length")
        n = int(lm.group(1))
        raw = pdf[m.end():m.end() + n]
        if b"/FlateDecode" in d:
            raw = zlib.decompress(raw)
        streams.append(raw)
    return streams


def parse_pdf_text(pdf: bytes) -> Tuple[List[Tuple[int, float, float, str]],
                                        int]:
    """-> ([(page, x, y, text_run)], n_pages). Runs in READING order:

    sorted by (page, column(x), -y, x); column = x >= COL_SPLIT_X.
    """
    runs: List[Tuple[int, float, float, str]] = []
    streams = _extract_streams(pdf)
    for page, cs in enumerate(streams):
        x = y = 0.0
        pos, n = 0, len(cs)
        stack: List[object] = []
        while pos < n:
            c = cs[pos:pos + 1]
            if c in b" \t\r\n":
                pos += 1
                continue
            if c == b"(":
                s, pos = _read_pdf_string(cs, pos + 1)
                stack.append(s.decode("latin-1"))
                continue
            m = _CS_TOKEN_RE.match(cs, pos)
            if not m:
                pos += 1
                continue
            tok = m.group(0)
            pos = m.end()
            if tok == b"[":
                stack.append("[")
            elif tok == b"]":
                pass  # array contents stay on the stack until TJ
            elif tok.startswith(b"/"):
                stack.append(tok.decode("latin-1"))
            elif tok[0:1].isdigit() or tok[0:1] == b"-":
                stack.append(float(tok))
            elif tok == b"Tm":
                # a b c d e f Tm — translation is (e, f)
                x, y = float(stack[-2]), float(stack[-1])  # type: ignore
                stack.clear()
            elif tok == b"Td" or tok == b"TD":
                x += float(stack[-2])  # type: ignore
                y += float(stack[-1])  # type: ignore
                stack.clear()
            elif tok == b"Tj":
                runs.append((page, x, y, str(stack[-1])))
                stack.clear()
            elif tok == b"TJ":
                i = len(stack) - 1
                while i >= 0 and stack[i] != "[":
                    i -= 1
                parts = [e for e in stack[i + 1:] if isinstance(e, str)]
                runs.append((page, x, y, "".join(parts)))
                stack.clear()
            else:  # BT, ET, Tf, other operators: consume operands
                stack.clear()
        # runs collected per page in emission order
    runs.sort(key=lambda r: (r[0], r[1] >= COL_SPLIT_X, -r[2], r[1]))
    return runs, max(1, len(streams))


def build_pdf_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """(doc_id, text) -> (doc_id, pdf) with real PDF bytes per document."""
    split, empty = T._tokens_list(batch[text_col].combine_chunks())
    toks_py = split.to_pylist()
    empties = empty.to_pylist()
    pdfs = []
    for toks, e in zip(toks_py, empties):
        pdfs.append(make_pdf([] if e else (toks or [])))
    return pa.table({
        "doc_id": batch["doc_id"],
        "pdf": pa.array(pdfs, pa.binary()),
    })


def extract_pdf_text_batch(batch: pa.Table,
                           pdf_col: str = "pdf") -> pa.Table:
    """(doc_id, pdf) -> (doc_id, pdf_text, n_lines, n_pages, xsum, ysum).

    pdf_text joins the reading-ordered runs with single spaces; xsum/ysum
    are sums of the PARSED run coordinates (verifying positional parsing,
    not just string recovery)."""
    pdfs = batch[pdf_col].to_pylist()
    texts, n_lines, n_pages, xsums, ysums = [], [], [], [], []
    for pdf in pdfs:
        runs, pages = parse_pdf_text(pdf)
        texts.append(" ".join(r[3] for r in runs))
        n_lines.append(len(runs))
        n_pages.append(pages)
        xsums.append(int(sum(r[1] for r in runs)))
        ysums.append(int(sum(r[2] for r in runs)))
    return pa.table({
        "doc_id": batch["doc_id"],
        "pdf_text": pa.array(texts, pa.string()),
        "n_lines": pa.array(n_lines, pa.int64()),
        "n_pages": pa.array(n_pages, pa.int64()),
        "xsum": pa.array(xsums, pa.int64()),
        "ysum": pa.array(ysums, pa.int64()),
    })
