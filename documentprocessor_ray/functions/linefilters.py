"""Line-level corpus filters — the C4 / Gopher / Dolma family.

Web-scale training-data pipelines filter documents LINE by line before any
model sees them: C4 keeps only lines that end in terminal punctuation and
have enough words (Raffel et al. 2020 §2.2), Gopher drops whole documents
whose token/line statistics look like boilerplate (Rae et al. 2021 §A1.1),
and Dolma/CCNet remove individual lines that repeat across many documents
(exact duplicate paragraphs: nav bars, cookie banners, license footers).

All three are expressed here over a ``(doc_id, text)`` table whose text
contains ``\n``-separated lines:

- ``gopher_stats_batch`` — one vectorized Arrow/numpy pass per batch; emits
  INTEGER counts only (ratios stay exact for the hash gate) plus the ANDed
  ``keep`` verdict.
- ``c4_stats_batch`` — per-line terminal-punctuation + min-words filter,
  bad-token document flags (``lorem ipsum``, ``{``), and an md5 of the
  retained lines in original order (the strong gate: the cleaned text
  itself is checked, not just counts).
- ``line_dedup`` — the one CROSS-document operator: a line is dropped from
  every document when it occurs in >= 2 distinct documents. Two bucketed
  shuffles total (group by line to flag, group by doc to reassemble);
  the corpus text moves twice and never lands on the driver.

Scale notes (100 TB): the per-batch passes are embarrassingly parallel.
``line_dedup``'s first shuffle keys on the line string — hot keys are the
duplicated lines themselves, whose groups hold (doc_id, idx) pairs, not
text payload duplicated per occurrence beyond the line's own copies; a
boilerplate line occurring in 10^9 docs would be capped/salted in a real
deployment (same ``group_cap`` discipline as functions/dedup.py) — here the
flag pass only counts distinct doc_ids and re-emits rows, so the group is
O(occurrences) small rows. The reassembly groupby keys on doc_id (never
skewed: one group per document).

The corpus in this sandbox has no newlines, so the paired queries in
pipelines/analysis.py derive a DETERMINISTIC lined text from the token
stream first (``lined_text_batch``) and the DuckDB twins re-derive the same
lines logically — the hash gate then verifies the line parsing and
filtering, not a pass-through. Reference surface being generalized:
DocumentProcessor normalizes per-line OCR text before field scans
(Ocr/src/ocr/receipt_processor.py); these operators are the corpus-scale
counterpart a training-data pipeline needs.
"""

from __future__ import annotations

import hashlib
from typing import List, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

# Gopher's "must contain at least 2 of" stop list (Rae et al. 2021 §A1.1).
STOP8 = ["the", "be", "to", "of", "and", "that", "have", "with"]

_SUFFIX = [" ...", ".", ".", ".", "!", "?", ""]  # index = (doc_id + i) % 7


def lined_text_batch(batch: pa.Table, decorate: bool = True) -> pa.Table:
    """Deterministic lined-text derivation: every 3 whitespace tokens become
    one line. With ``decorate=True`` (the Gopher/C4 corpora) each line gets
    a modulo-scheduled terminal suffix ('.', '!', '?', ' ...' or nothing), a
    '- ' bullet prefix every 11th (doc_id*3+i) slot, and two injected
    bad-content lines ('lorem ipsum dolor' when doc_id % 97 == 0, '{ }'
    when doc_id % 89 == 0). The DuckDB twins re-derive the identical lines
    with list_slice/generate_series + CASE, so every decoration is part of
    the hash gate. Empty/whitespace-only docs yield text ''."""
    texts = pc.replace_substring_regex(
        batch["text"].combine_chunks(), r"^\s+|\s+$", "").to_pylist()
    doc_ids = batch["doc_id"].to_pylist()
    out: List[str] = []
    for did, txt in zip(doc_ids, texts):
        toks = txt.split() if txt else []
        if not toks:
            out.append("")
            continue
        lines = []
        for i in range(0, (len(toks) - 1) // 3 + 1):
            body = " ".join(toks[3 * i:3 * i + 3])
            if decorate:
                pre = "- " if (did * 3 + i) % 11 == 0 else ""
                lines.append(pre + body + _SUFFIX[(did + i) % 7])
            else:
                lines.append(body)
        if decorate:
            if did % 97 == 0:
                lines.append("lorem ipsum dolor")
            if did % 89 == 0:
                lines.append("{ }")
        out.append("\n".join(lines))
    return pa.table({
        "doc_id": pa.array(doc_ids, pa.int64()),
        "text": pa.array(out, pa.string()),
    })


def _segsum(values: np.ndarray, seg_lens: np.ndarray) -> np.ndarray:
    """Exact segment sums with empty segments = 0 (np.add.reduceat returns
    the element AT a repeated offset, so empties must be patched)."""
    if len(seg_lens) == 0:
        return np.zeros(0, np.int64)
    off = np.zeros(len(seg_lens), np.int64)
    np.cumsum(seg_lens[:-1], out=off[1:])
    padded = np.concatenate([values.astype(np.int64), [0]])
    s = np.add.reduceat(padded, off)
    return np.where(seg_lens == 0, 0, s).astype(np.int64)


def _split_lines(text: pa.Array) -> Tuple[pa.Array, np.ndarray]:
    """Per-doc line lists + per-doc line counts ('' text -> 0 lines; the
    spurious [''] from splitting '' is neutralized by the zero count)."""
    lines = pc.split_pattern(text, "\n")
    n = pc.list_value_length(lines).to_numpy(zero_copy_only=False)
    n = np.where(pc.equal(text, "").to_numpy(zero_copy_only=False),
                 0, n).astype(np.int64)
    return lines, n


def gopher_stats_batch(batch: pa.Table) -> pa.Table:
    """Gopher document-filter signals over '\\n'-lined text, one vectorized
    pass — integer counts + the ANDed keep verdict:

      50 <= n_tokens <= 100000            (word-count bounds)
      3*n <= sum_tok_chars <= 10*n        (mean word length in [3, 10])
      10*n_ellipsis <= n_tokens           (symbol-to-word ratio <= 0.1)
      10*n_bullet <= 9*n_lines            (<= 90% bullet-started lines)
      10*n_ellipsis_end <= 3*n_lines      (<= 30% '...'-ended lines)
      5*n_alpha_tok >= 4*n_tokens         (>= 80% words contain a letter)
      n_stop8 >= 2                        (>= 2 of Gopher's 8 stop words)

    Tokens are the RE2 '\\s+' split of each line (lines carry no edge
    whitespace by construction of the derivation); the stop-word match
    strips trailing [.!?]+ before lowercased comparison so the decoration
    suffixes don't hide stop words."""
    text = batch["text"].combine_chunks()
    lines, n_lines = _split_lines(text)
    flat = pc.list_flatten(lines)

    bullet = pc.starts_with(flat, pattern="- ")
    ell_end = pc.ends_with(flat, pattern="...")
    n_ell_line = pc.count_substring(flat, pattern="...")

    tsplit = pc.split_pattern_regex(flat, r"\s+")
    ntl = pc.list_value_length(tsplit).to_numpy(zero_copy_only=False)
    ftok = pc.list_flatten(tsplit)
    tok_chars = pc.utf8_length(ftok).to_numpy(zero_copy_only=False)
    alpha = pc.greater(pc.count_substring_regex(ftok, pattern="[A-Za-z]"),
                       0).to_numpy(zero_copy_only=False)
    stripped = pc.utf8_lower(
        pc.replace_substring_regex(ftok, r"[.!?]+$", ""))
    stop = np.isin(stripped.to_numpy(zero_copy_only=False),
                   np.array(STOP8))

    # line-level flags -> per-doc sums (segment = the doc's line count);
    # spurious lines of empty docs are excluded by n_lines == 0.
    raw_line_cnt = pc.list_value_length(lines).to_numpy(zero_copy_only=False)
    b = _segsum(bullet.to_numpy(zero_copy_only=False), raw_line_cnt)
    e = _segsum(ell_end.to_numpy(zero_copy_only=False), raw_line_cnt)
    ell = _segsum(n_ell_line.to_numpy(zero_copy_only=False), raw_line_cnt)
    # token-level sums: first tokens-per-line -> tokens-per-doc, then reduce
    n_tok_doc = _segsum(ntl, raw_line_cnt)
    chars = _segsum(tok_chars, n_tok_doc)
    alpha_d = _segsum(alpha, n_tok_doc)
    stop_d = _segsum(stop, n_tok_doc)

    empty = n_lines == 0
    for arr in (b, e, ell, n_tok_doc, chars, alpha_d, stop_d):
        arr[empty] = 0

    keep = ((n_tok_doc >= 50) & (n_tok_doc <= 100_000)
            & (chars >= 3 * n_tok_doc) & (chars <= 10 * n_tok_doc)
            & (10 * ell <= n_tok_doc)
            & (10 * b <= 9 * n_lines)
            & (10 * e <= 3 * n_lines)
            & (5 * alpha_d >= 4 * n_tok_doc)
            & (stop_d >= 2))
    return pa.table({
        "doc_id": pc.cast(batch["doc_id"], pa.int64()),
        "n_lines": pa.array(n_lines, pa.int64()),
        "n_tokens": pa.array(n_tok_doc, pa.int64()),
        "sum_tok_chars": pa.array(chars, pa.int64()),
        "n_alpha_tok": pa.array(alpha_d, pa.int64()),
        "n_stop8": pa.array(stop_d, pa.int64()),
        "n_bullet": pa.array(b, pa.int64()),
        "n_ellipsis_end": pa.array(e, pa.int64()),
        "n_ellipsis": pa.array(ell, pa.int64()),
        "keep": pa.array(keep.astype(np.int64), pa.int64()),
    })


def c4_stats_batch(batch: pa.Table, min_words: int = 3,
                   min_kept: int = 3) -> pa.Table:
    """C4 line filtering (Raffel et al. 2020 §2.2) over '\\n'-lined text:
    a line is RETAINED iff it ends in terminal punctuation (., !, ?) and
    has >= min_words whitespace words; the document is kept iff it retains
    >= min_kept lines and contains neither 'lorem ipsum' nor '{'.
    ``clean_md5`` hashes the retained lines joined by '\\n' in original
    order — the gate checks the cleaned text itself."""
    text = batch["text"].combine_chunks()
    lines, n_lines = _split_lines(text)
    flat = pc.list_flatten(lines)
    raw_line_cnt = pc.list_value_length(lines).to_numpy(zero_copy_only=False)

    term = pc.or_(pc.or_(pc.ends_with(flat, pattern="."),
                         pc.ends_with(flat, pattern="!")),
                  pc.ends_with(flat, pattern="?"))
    ntl = pc.list_value_length(
        pc.split_pattern_regex(flat, r"\s+")).to_numpy(zero_copy_only=False)
    kept = (term.to_numpy(zero_copy_only=False) & (ntl >= min_words))
    lorem = pc.match_substring(flat, pattern="lorem ipsum") \
        .to_numpy(zero_copy_only=False)

    n_kept = _segsum(kept, raw_line_cnt)
    has_lorem = (_segsum(lorem, raw_line_cnt) > 0).astype(np.int64)
    has_brace = pc.greater(pc.count_substring(text, pattern="{"), 0) \
        .to_numpy(zero_copy_only=False).astype(np.int64)

    empty = n_lines == 0
    n_kept[empty] = 0
    has_lorem[empty] = 0
    has_brace[empty] = 0

    # md5 of the retained lines, per doc (python md5; the loop is over the
    # FLAGGED lines only, not a re-parse)
    flat_py = flat.to_pylist()
    md5s: List[str] = []
    pos = 0
    for nl, is_empty in zip(raw_line_cnt, empty):
        doc_lines = flat_py[pos:pos + nl]
        doc_keep = kept[pos:pos + nl]
        pos += nl
        if is_empty:
            sel: List[str] = []
        else:
            sel = [l for l, k in zip(doc_lines, doc_keep) if k]
        md5s.append(hashlib.md5("\n".join(sel).encode()).hexdigest())

    keep_doc = ((n_kept >= min_kept) & (has_lorem == 0)
                & (has_brace == 0)).astype(np.int64)
    return pa.table({
        "doc_id": pc.cast(batch["doc_id"], pa.int64()),
        "n_lines": pa.array(n_lines, pa.int64()),
        "n_kept": pa.array(n_kept, pa.int64()),
        "has_lorem": pa.array(has_lorem, pa.int64()),
        "has_brace": pa.array(has_brace, pa.int64()),
        "keep_doc": pa.array(keep_doc, pa.int64()),
        "clean_md5": pa.array(md5s, pa.string()),
    })


def line_dedup(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """Cross-document exact line deduplication (the Dolma/CCNet paragraph
    rule): a line occurring in >= 2 DISTINCT documents is dropped from all
    of them. Input: (doc_id, text) with '\\n' lines. Output per document:
    (doc_id, n_lines, n_dropped, clean_md5) where clean_md5 hashes the
    surviving lines joined by '\\n' in original order (md5('') when none
    survive or the document had no lines).

    Plan: explode to (doc_id, idx, line) rows — empty docs emit ONE marker
    row (idx=-1, line='') so they still produce an output group; real lines
    are never '' (the derivation guarantees >= 1 nonempty token per line).
    Shuffle 1 groups by the line string: each group counts distinct doc_ids
    and re-emits its rows with is_dup. Shuffle 2 groups by doc_id and
    reassembles order + md5. Text bytes cross the wire twice; nothing is
    collected on the driver."""
    def explode(batch: pa.Table) -> pa.Table:
        ids, idxs, out = [], [], []
        for did, txt in zip(batch["doc_id"].to_pylist(),
                            batch["text"].to_pylist()):
            if not txt:
                ids.append(did); idxs.append(-1); out.append("")
                continue
            for i, ln in enumerate(txt.split("\n")):
                ids.append(did); idxs.append(i); out.append(ln)
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "idx": pa.array(idxs, pa.int64()),
            "line": pa.array(out, pa.string())})

    def flag(g: pa.Table) -> pa.Table:
        docs = g["doc_id"].to_numpy(zero_copy_only=False)
        idxs = g["idx"].to_numpy(zero_copy_only=False)
        # marker rows (idx == -1) never count as duplicates
        real = idxs >= 0
        dup = int(len(np.unique(docs[real])) >= 2) if real.any() else 0
        flags = np.where(real, dup, 0).astype(np.int64)
        return pa.table({
            "doc_id": g["doc_id"], "idx": g["idx"], "line": g["line"],
            "is_dup": pa.array(flags, pa.int64())})

    def assemble(g: pa.Table) -> pa.Table:
        idxs = g["idx"].to_numpy(zero_copy_only=False)
        real = idxs >= 0
        order = np.argsort(idxs[real], kind="stable")
        lines = np.asarray(g["line"].to_pylist(), dtype=object)[real][order]
        dups = g["is_dup"].to_numpy(zero_copy_only=False)[real][order]
        survivors = [l for l, d in zip(lines, dups) if not d]
        return pa.table({
            "doc_id": pa.array([int(g["doc_id"][0].as_py())], pa.int64()),
            "n_lines": pa.array([int(real.sum())], pa.int64()),
            "n_dropped": pa.array([int(dups.sum())], pa.int64()),
            "clean_md5": pa.array(
                [hashlib.md5("\n".join(survivors).encode()).hexdigest()],
                pa.string())})

    return ds.map_batches(explode, batch_format="pyarrow") \
        .groupby("line").map_groups(flag, batch_format="pyarrow") \
        .groupby("doc_id").map_groups(assemble, batch_format="pyarrow")
