"""Distributed WordPiece tokenizer training + encoding (Schuster & Nakajima
2012, "Japanese and Korean Voice Search"; the BERT tokenizer) — the third
tokenizer family next to BPE (functions/bpe.py) and unigram-LM
(functions/unigram.py).

WordPiece differs from BPE only in the merge OBJECTIVE: instead of the
highest pair COUNT, each round merges the pair maximizing the likelihood
gain score(a,b) = c(ab) / (c(a) * c(b)). Encoding differs too: greedy
longest-prefix match with '##' continuation pieces and an [UNK] fallback,
not merge replay.

Scale shape (same vocab-level iteration as bpe.py — the corpus is touched
exactly once):
  1. corpus -> WORD VOCAB once (bpe.word_vocab).
  2. per merge round over the vocab Dataset:
       a. ONE map_batches pass emits per-block partials for BOTH the pair
          counts and the symbol (unigram) counts, tagged by a kind column
          -> one groupby-sum exchange carries both;
       b. the symbol-count table is bounded by the symbol inventory
          (alphabet + merges-so-far <= vocab target), so it collects to the
          driver and rides into the argmax as a broadcast dict;
       c. per-block argmax under the EXACT rational order
          c_ab/(c_a*c_b): compared by cross-multiplication in arbitrary-
          precision Python ints — no float ranking anywhere, so the learned
          merge table is bit-identical at any parallelism (count products
          exceed int64 at crawl scale; bigints cost only at the <=block
          candidate rows);
       d. deterministic tiebreak: max score, then max pair count, then
          lexicographically smallest (left, right).
  3. encode: greedy longest-prefix match per word (max_input_chars guard,
     [UNK] on any unmatchable tail) on an actor pool with the finished
     vocab as constructor state — bpe.BpeEncoder's stage shape.

``learn_wordpiece_reference`` / ``wordpiece_encode_reference`` are the
single-process twins (oracle-dump side).
"""

from __future__ import annotations

from collections import Counter
from typing import Dict, List, Optional, Tuple

import numpy as np
import pyarrow as pa

import ray.data

from ..sharding import auto_buckets

UNK = "[UNK]"
MAX_INPUT_CHARS = 64  # words longer than this encode as [UNK] (BERT rule)


def _pair_and_symbol_counts(batch: pa.Table) -> pa.Table:
    """Per-block partials: kind='p' rows are (left, right, c) pair counts,
    kind='s' rows are (left, '', c) symbol counts — one exchange for both."""
    pc_: Counter = Counter()
    sc: Counter = Counter()
    counts = batch["count"].to_numpy(zero_copy_only=False)
    for syms, w in zip(batch["syms"].to_pylist(), counts):
        w = int(w)
        for s in syms:
            sc[s] += w
        for a, b in zip(syms, syms[1:]):
            pc_[(a, b)] += w
    ks = list(pc_.keys())
    return pa.table({
        "kind": pa.array(["p"] * len(ks) + ["s"] * len(sc), pa.string()),
        "left": pa.array([k[0] for k in ks] + list(sc.keys()), pa.string()),
        "right": pa.array([k[1] for k in ks] + [""] * len(sc), pa.string()),
        "c": pa.array([pc_[k] for k in ks] + list(sc.values()), pa.int64())})


def _best_pair(pairs: List[Tuple[str, str, int]],
               sym: Dict[str, int]) -> Optional[Tuple[str, str, int]]:
    """Exact-rational argmax of c_ab/(c_a*c_b) with the deterministic
    tiebreak; Python-int cross-multiplication, no floats."""
    best = None  # (left, right, c_ab, denom)
    for left, right, c in pairs:
        den = sym[left] * sym[right]
        if best is None:
            best = (left, right, c, den)
            continue
        bl, br, bc, bden = best
        lhs = c * bden        # score vs best: c/den ? bc/bden
        rhs = bc * den
        if lhs > rhs or (lhs == rhs and (
                c > bc or (c == bc and (left, right) < (bl, br)))):
            best = (left, right, c, den)
    if best is None:
        return None
    return best[0], best[1], best[2]


def _learn_from_vocab(words: Dict[str, Tuple[List[str], int]],
                      n_merges: int, min_count: int
                      ) -> List[Tuple[str, str, int]]:
    """Greedy WordPiece merge loop over word->(syms, count) (shared by the
    reference and the small-vocab one-task short-circuit)."""
    from .bpe import _merge_row

    merges: List[Tuple[str, str, int]] = []
    for _ in range(n_merges):
        pc_: Counter = Counter()
        sc: Counter = Counter()
        for syms, c in words.values():
            for s in syms:
                sc[s] += c
            for a, b in zip(syms, syms[1:]):
                pc_[(a, b)] += c
        cands = [(l, r, c) for (l, r), c in pc_.items() if c >= min_count]
        win = _best_pair(cands, sc)
        if win is None:
            break
        left, right, c = win
        merges.append((left, right, c))
        for w, (syms, cnt) in words.items():
            words[w] = (_merge_row(syms, left, right), cnt)
    return merges


def learn_wordpiece(docs: "ray.data.Dataset", n_merges: int = 12,
                    text_col: str = "text", min_count: int = 2,
                    small_vocab_rows: Optional[int] = 1_000_000,
                    ) -> List[Tuple[str, str, int]]:
    """Learn ``n_merges`` WordPiece merges; returns [(left, right,
    pair_count)] in merge order, bit-identical at any parallelism."""
    from ray.data.aggregate import Sum

    from .bpe import _merge_row, word_vocab

    vocab = word_vocab(docs, text_col=text_col).materialize()

    if small_vocab_rows and vocab.count() <= small_vocab_rows:
        def one_task(b: pa.Table) -> pa.Table:
            words = {w: (list(w), int(c)) for w, c in
                     zip(b["word"].to_pylist(),
                         b["count"].to_numpy(zero_copy_only=False))}
            ms = _learn_from_vocab(words, n_merges, min_count)
            return pa.table({
                "rank": pa.array(range(len(ms)), pa.int64()),
                "left": pa.array([m[0] for m in ms], pa.string()),
                "right": pa.array([m[1] for m in ms], pa.string()),
                "c": pa.array([m[2] for m in ms], pa.int64())})

        rows = vocab.repartition(1).map_batches(
            one_task, batch_format="pyarrow", batch_size=None).take_all()
        rows.sort(key=lambda r: r["rank"])
        return [(r["left"], r["right"], int(r["c"])) for r in rows]

    def explode(batch: pa.Table) -> pa.Table:
        words = batch["word"].to_pylist()
        return pa.table({
            "syms": pa.array([list(w) for w in words],
                             pa.list_(pa.string())),
            "count": batch["count"]})

    nb = max(2, auto_buckets(None) // 4)
    cur = vocab.map_batches(explode, batch_format="pyarrow") \
        .repartition(nb).materialize()

    merges: List[Tuple[str, str, int]] = []
    for _ in range(n_merges):
        totals = cur.map_batches(_pair_and_symbol_counts,
                                 batch_format="pyarrow") \
            .groupby(["kind", "left", "right"]) \
            .aggregate(Sum("c", alias_name="c")).materialize()
        # symbol table: bounded by the symbol inventory -> driver + closure
        sym = {r["left"]: int(r["c"]) for r in
               totals.filter(expr="kind == 's'").take_all()}

        def block_best(b: pa.Table, sym=sym) -> pa.Table:
            cands = [(l, r, int(c)) for l, r, c in
                     zip(b["left"].to_pylist(), b["right"].to_pylist(),
                         b["c"].to_numpy(zero_copy_only=False))
                     if int(c) >= min_count]
            win = _best_pair(cands, sym)
            if win is None:
                return pa.table({"left": pa.array([], pa.string()),
                                 "right": pa.array([], pa.string()),
                                 "c": pa.array([], pa.int64())})
            return pa.table({"left": pa.array([win[0]], pa.string()),
                             "right": pa.array([win[1]], pa.string()),
                             "c": pa.array([win[2]], pa.int64())})

        top = totals.filter(expr="kind == 'p'") \
            .map_batches(block_best, batch_format="pyarrow",
                         batch_size=None).take_all()
        win = _best_pair([(r["left"], r["right"], int(r["c"]))
                          for r in top], sym)
        if win is None:
            break
        left, right, c = win
        merges.append((left, right, int(c)))

        def apply(batch: pa.Table, left=left, right=right) -> pa.Table:
            new = [_merge_row(s, left, right)
                   for s in batch["syms"].to_pylist()]
            return pa.table({
                "syms": pa.array(new, pa.list_(pa.string())),
                "count": batch["count"]})

        cur = cur.map_batches(apply, batch_format="pyarrow").materialize()
    return merges


def wordpiece_vocab(merges: List[Tuple[str, str, int]],
                    alphabet: List[str]) -> set:
    """Final piece inventory: alphabet + every merge product."""
    v = set(alphabet)
    for left, right, _ in merges:
        v.add(left + right)
    return v


def corpus_alphabet(docs: "ray.data.Dataset",
                    text_col: str = "text") -> List[str]:
    """Distinct characters of the tokenized corpus — the single-char floor
    of the encode vocab (BERT keeps every training character). Computed
    over the word vocab's distinct words: one bounded (char) exchange."""
    from ray.data.aggregate import Count

    from .bpe import word_vocab

    def chars(b: pa.Table) -> pa.Table:
        cs = sorted({ch for w in b["word"].to_pylist() for ch in w})
        return pa.table({"ch": pa.array(cs, pa.string())})

    rows = word_vocab(docs, text_col=text_col) \
        .map_batches(chars, batch_format="pyarrow") \
        .groupby("ch").aggregate(Count(alias_name="n")).take_all()
    return sorted(r["ch"] for r in rows)


def encode_word(word: str, vocab: set,
                max_input_chars: int = MAX_INPUT_CHARS) -> List[str]:
    """BERT-style greedy longest-prefix match: first piece bare, later
    pieces '##'-prefixed in OUTPUT ONLY (the vocab stores raw pieces); any
    unmatchable tail or an over-long word collapses to [UNK]."""
    if len(word) > max_input_chars:
        return [UNK]
    out: List[str] = []
    i, n = 0, len(word)
    while i < n:
        j = n
        piece = None
        while j > i:
            if word[i:j] in vocab:
                piece = word[i:j]
                break
            j -= 1
        if piece is None:
            return [UNK]
        out.append(piece if i == 0 else "##" + piece)
        i = j
    return out


class WordPieceEncoder:
    """Actor-pool stage: finished vocab as constructor state, bounded
    per-actor word cache. Emits (doc_id, n_wp_tokens, n_words, n_unk)."""

    def __init__(self, merges: List[Tuple[str, str, int]],
                 alphabet: List[str]):
        import re
        self.vocab = wordpiece_vocab(merges, alphabet)
        self.cache: Dict[str, Tuple[int, int]] = {}
        self.ws = re.compile(r"[\t\n\f\r ]+")

    def _enc(self, word: str) -> Tuple[int, int]:
        r = self.cache.get(word)
        if r is None:
            pieces = encode_word(word, self.vocab)
            r = (len(pieces), sum(1 for p in pieces if p == UNK))
            if len(self.cache) >= 1 << 20:
                self.cache.clear()
            self.cache[word] = r
        return r

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"]
        n_tok, n_words, n_unk = [], [], []
        for t in batch["text"].to_pylist():
            t = (t or "").strip("\t\n\f\r ").lower()
            ws = self.ws.split(t) if t else []
            n_words.append(len(ws))
            tk = uk = 0
            for w in ws:
                a, b = self._enc(w)
                tk += a
                uk += b
            n_tok.append(tk)
            n_unk.append(uk)
        return pa.table({
            "doc_id": ids,
            "n_wp_tokens": pa.array(n_tok, pa.int64()),
            "n_words": pa.array(n_words, pa.int64()),
            "n_unk": pa.array(n_unk, pa.int64())})


def learn_wordpiece_reference(texts: List[Optional[str]], n_merges: int = 12,
                              min_count: int = 2
                              ) -> List[Tuple[str, str, int]]:
    """Single-process twin of learn_wordpiece (same tokenization as
    bpe.word_vocab, same exact-rational argmax and tiebreaks)."""
    import re
    ws = re.compile(r"[\t\n\f\r ]+")
    vocab: Counter = Counter()
    for t in texts:
        t = (t or "").strip("\t\n\f\r ").lower()
        if t:
            vocab.update(ws.split(t))
    words = {w: (list(w), int(c)) for w, c in vocab.items()}
    return _learn_from_vocab(words, n_merges, min_count)


def corpus_alphabet_reference(texts: List[Optional[str]]) -> List[str]:
    """Single-process twin of corpus_alphabet."""
    import re
    ws = re.compile(r"[\t\n\f\r ]+")
    cs: set = set()
    for t in texts:
        t = (t or "").strip("\t\n\f\r ").lower()
        if t:
            for w in ws.split(t):
                cs.update(w)
    return sorted(cs)


def wordpiece_encode_reference(doc_ids: List, texts: List[Optional[str]],
                               merges: List[Tuple[str, str, int]],
                               alphabet: List[str]) -> List[tuple]:
    """Plain encode pass: [(doc_id, n_wp_tokens, n_words, n_unk)]."""
    import re
    wsre = re.compile(r"[\t\n\f\r ]+")
    vocab = wordpiece_vocab(merges, alphabet)
    out = []
    for did, t in zip(doc_ids, texts):
        t = (t or "").strip("\t\n\f\r ").lower()
        ws = wsre.split(t) if t else []
        tk = uk = 0
        for w in ws:
            pieces = encode_word(w, vocab)
            tk += len(pieces)
            uk += sum(1 for p in pieces if p == UNK)
        out.append((did, tk, len(ws), uk))
    return out
