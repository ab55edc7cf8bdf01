"""Distributed unigram-LM tokenizer training (Kudo 2018, "Subword
Regularization: Improving Neural Network Translation Models with Multiple
Subword Candidates") — the second tokenizer-training family next to BPE
(functions/bpe.py): instead of greedy pair merges, fit a unigram language
model over a seed piece inventory with EM, prune to a target vocabulary,
then Viterbi-encode.

Scale shape (mirrors bpe.py's vocab-level iteration):
  1. corpus -> WORD VOCAB once (functions/bpe.word_vocab): (word, count)
     via combiner-first partials + one small groupby-sum. Every later
     step iterates over |V| vocab rows, never the corpus.
  2. SEED: per-block substring counts (len 2..max_piece_len, weighted by
     word count) -> groupby(piece).sum -> per-block top-K -> exact driver
     top-K with a (count desc, piece asc) tiebreak. Single characters are
     always kept (guarantees every word segments).
  3. EM rounds over the vocab Dataset, piece table BROADCAST (ray.put)
     into each task: per-word forward-backward over the segmentation
     lattice gives posterior piece counts; each word's float expectations
     are QUANTIZED to int64 micro-units (2^20) BEFORE the groupby-sum, so
     the global reduce is exact integer addition — order-independent,
     hence bit-identical at any parallelism (the same quantize-before-
     shuffle discipline as kmeans/bigram_surprisal). The M-step re-scores
     pieces as integer micro-nat log-probs on the driver (piece table is
     <= seed_size rows — small by construction).
  4. PRUNE: keep the ``vocab_size`` pieces with the highest expected
     count (single chars always kept; tiebreak count desc, piece asc),
     then one final EM re-score. This is the count-based simplification
     of SentencePiece's loss-based prune; documented, deterministic.
  5. ENCODE: Viterbi best segmentation per word (max sum of ilogp; ties
     prefer the LONGEST last piece) on an actor pool with the learned
     table as constructor state and a bounded per-actor word cache —
     the same stage shape as bpe.BpeEncoder.

Small-vocab short-circuit (the dedup-clustering lesson, bpe.py:119): below
``small_vocab_rows`` distinct words the whole learn runs in ONE worker
task over the vocab block — still off the driver, bit-identical by
construction (it runs the same per-word kernels).

``learn_unigram_reference`` / ``unigram_encode_reference`` are the
single-process twins (oracle-dump side).

Scale notes (100 TB): the corpus is touched exactly once (word_vocab);
EM cost is |V| x lattice, distributed over vocab blocks; the piece table
(<= seed_size rows) is the only broadcast; all exchanges are (piece,
int64) pairs. No stage materializes the corpus.
"""

from __future__ import annotations

import math
from collections import Counter
from typing import Dict, List, Optional, Tuple

import numpy as np
import pyarrow as pa

import ray
import ray.data

from ..sharding import auto_buckets

MICRO = 1 << 20          # fixed-point scale for counts and log-probs
UNK_ILOGP = -20 * MICRO  # score for a character outside the learned vocab


def _seed_counts_block(batch: pa.Table, max_piece_len: int) -> pa.Table:
    """Weighted substring counts (len 1..max_piece_len) for a vocab block."""
    c: Counter = Counter()
    counts = batch["count"].to_numpy(zero_copy_only=False)
    for w, k in zip(batch["word"].to_pylist(), counts):
        k = int(k)
        n = len(w)
        for i in range(n):
            for j in range(i + 1, min(i + max_piece_len, n) + 1):
                c[w[i:j]] += k
    ks = list(c.keys())
    return pa.table({"piece": pa.array(ks, pa.string()),
                     "c": pa.array([c[k] for k in ks], pa.int64())})


def _top_seed(pieces: List[str], counts: List[int], seed_size: int
              ) -> List[Tuple[str, int]]:
    """Exact top-``seed_size`` multi-char pieces by (count desc, piece asc);
    ALL single chars are appended unconditionally."""
    chars = [(p, int(c)) for p, c in zip(pieces, counts) if len(p) == 1]
    multi = [(p, int(c)) for p, c in zip(pieces, counts) if len(p) > 1]
    multi.sort(key=lambda t: (-t[1], t[0]))
    return sorted(chars) + multi[:seed_size]


def _eqc_word(word: str, ilogp: Dict[str, int], max_len: int
              ) -> Tuple[Dict[str, float], float]:
    """Forward-backward over one word's segmentation lattice.

    Returns (expected count per piece for ONE occurrence of the word,
    log-likelihood in nats). Probabilities come in as integer micro-nats;
    the float work inside a single word is a fixed-order loop, so the
    result is deterministic for given integer inputs.
    """
    n = len(word)
    NEG = -1e30
    alpha = [NEG] * (n + 1)
    alpha[0] = 0.0
    edges: List[Tuple[int, int, str, float]] = []
    for i in range(n):
        if alpha[i] <= NEG / 2:
            continue
        for j in range(i + 1, min(i + max_len, n) + 1):
            p = word[i:j]
            lp = ilogp.get(p)
            if lp is None:
                continue
            lpf = lp / MICRO
            edges.append((i, j, p, lpf))
            s = alpha[i] + lpf
            if alpha[j] <= NEG / 2:
                alpha[j] = s
            else:
                hi, lo = (alpha[j], s) if alpha[j] >= s else (s, alpha[j])
                alpha[j] = hi + math.log1p(math.exp(lo - hi))
    beta = [NEG] * (n + 1)
    beta[n] = 0.0
    for i in range(n - 1, -1, -1):
        for j in range(i + 1, min(i + max_len, n) + 1):
            lp = ilogp.get(word[i:j])
            if lp is None or beta[j] <= NEG / 2:
                continue
            s = lp / MICRO + beta[j]
            if beta[i] <= NEG / 2:
                beta[i] = s
            else:
                hi, lo = (beta[i], s) if beta[i] >= s else (s, beta[i])
                beta[i] = hi + math.log1p(math.exp(lo - hi))
    z = alpha[n]
    out: Dict[str, float] = {}
    if z <= NEG / 2:
        return out, 0.0
    for i, j, p, lpf in edges:
        if alpha[i] <= NEG / 2 or beta[j] <= NEG / 2:
            continue
        e = math.exp(alpha[i] + lpf + beta[j] - z)
        out[p] = out.get(p, 0.0) + e
    return out, z


def _estep_block(batch: pa.Table, ilogp: Dict[str, int], max_len: int
                 ) -> pa.Table:
    """Quantized expected piece counts for one vocab block (combiner)."""
    acc: Dict[str, int] = {}
    counts = batch["count"].to_numpy(zero_copy_only=False)
    for w, k in zip(batch["word"].to_pylist(), counts):
        eqc, _ = _eqc_word(w, ilogp, max_len)
        k = int(k)
        for p, e in eqc.items():
            q = int(math.floor(k * e * MICRO + 0.5))
            if q:
                acc[p] = acc.get(p, 0) + q
    ks = list(acc.keys())
    return pa.table({"piece": pa.array(ks, pa.string()),
                     "q": pa.array([acc[k] for k in ks], pa.int64())})


def _mstep(pieces: List[str], q: List[int],
           keep_chars: List[str]) -> List[Tuple[str, int]]:
    """Integer micro-nat log-probs from quantized counts. Pieces with a
    zero count are dropped unless they are single chars (floored to 1 so
    every word stays segmentable). Deterministic: sorted by piece."""
    tab: Dict[str, int] = {p: int(c) for p, c in zip(pieces, q) if c > 0}
    for ch in keep_chars:
        tab.setdefault(ch, 1)
    total = sum(tab.values())
    out = []
    for p in sorted(tab):
        lp = math.log(tab[p]) - math.log(total)
        out.append((p, int(math.floor(lp * MICRO + 0.5))))
    return out


def _prune(pieces: List[str], q: List[int], vocab_size: int
           ) -> List[str]:
    """Keep top ``vocab_size`` pieces by (count desc, piece asc); single
    chars are always kept (and count toward the budget first)."""
    chars = sorted(p for p in pieces if len(p) == 1)
    multi = sorted(((p, int(c)) for p, c in zip(pieces, q) if len(p) > 1),
                   key=lambda t: (-t[1], t[0]))
    room = max(0, vocab_size - len(chars))
    return chars + [p for p, _ in multi[:room]]


def _learn_from_vocab(words: List[Tuple[str, int]], vocab_size: int,
                      seed_size: int, max_piece_len: int,
                      em_iters: int) -> List[Tuple[str, int]]:
    """Full learn over an in-memory word vocab (shared by the reference and
    the small-vocab one-task short-circuit): seed -> EM -> prune -> EM."""
    seed_c: Counter = Counter()
    for w, k in words:
        n = len(w)
        for i in range(n):
            for j in range(i + 1, min(i + max_piece_len, n) + 1):
                seed_c[w[i:j]] += k
    seed = _top_seed(list(seed_c.keys()), list(seed_c.values()), seed_size)
    chars = [p for p, _ in seed if len(p) == 1]
    total = sum(c for _, c in seed)
    ilogp = {p: int(math.floor((math.log(c) - math.log(total)) * MICRO
                               + 0.5)) for p, c in seed}

    def em_round(cur: Dict[str, int]) -> List[Tuple[str, int]]:
        acc: Dict[str, int] = {}
        for w, k in words:
            eqc, _ = _eqc_word(w, cur, max_piece_len)
            for p, e in eqc.items():
                qv = int(math.floor(k * e * MICRO + 0.5))
                if qv:
                    acc[p] = acc.get(p, 0) + qv
        return _mstep(list(acc.keys()), list(acc.values()), chars), acc

    for _ in range(em_iters):
        scored, _ = em_round(ilogp)
        ilogp = dict(scored)
    _, acc = em_round(ilogp)
    kept = set(_prune(list(acc.keys()), list(acc.values()), vocab_size))
    kept.update(chars)
    ilogp = {p: lp for p, lp in ilogp.items() if p in kept}
    scored, _ = em_round(ilogp)
    return scored


def learn_unigram(docs: "ray.data.Dataset", vocab_size: int = 96,
                  seed_size: int = 512, max_piece_len: int = 5,
                  em_iters: int = 2, text_col: str = "text",
                  small_vocab_rows: Optional[int] = 1_000_000,
                  ) -> List[Tuple[str, int]]:
    """Learn a unigram tokenizer; returns sorted [(piece, ilogp_micronats)].

    Bit-identical at any parallelism: every cross-block reduce sums int64
    quantities quantized inside the producing task.
    """
    from ray.data.aggregate import Sum

    from .bpe import word_vocab

    vocab = word_vocab(docs, text_col=text_col).materialize()

    if small_vocab_rows and vocab.count() <= small_vocab_rows:
        def one_task(b: pa.Table) -> pa.Table:
            words = sorted(zip(b["word"].to_pylist(),
                               (int(c) for c in
                                b["count"].to_numpy(zero_copy_only=False))))
            scored = _learn_from_vocab(words, vocab_size, seed_size,
                                       max_piece_len, em_iters)
            return pa.table({
                "piece": pa.array([p for p, _ in scored], pa.string()),
                "ilogp": pa.array([lp for _, lp in scored], pa.int64())})

        rows = vocab.repartition(1).map_batches(
            one_task, batch_format="pyarrow", batch_size=None).take_all()
        return sorted((r["piece"], int(r["ilogp"])) for r in rows)

    nb = max(2, auto_buckets(None) // 4)
    vocab = vocab.repartition(nb).materialize()

    # ---- seed: substring counts -> exact global top-K
    seeds = vocab.map_batches(
        lambda b: _seed_counts_block(b, max_piece_len),
        batch_format="pyarrow") \
        .groupby("piece").aggregate(Sum("c", alias_name="c"))

    def block_top(b: pa.Table) -> pa.Table:
        top = _top_seed(b["piece"].to_pylist(),
                        list(b["c"].to_numpy(zero_copy_only=False)),
                        seed_size)
        return pa.table({"piece": pa.array([p for p, _ in top], pa.string()),
                         "c": pa.array([c for _, c in top], pa.int64())})

    # per-block partial top-K keeps the driver collect <= nb * seed_size
    parts = seeds.map_batches(block_top, batch_format="pyarrow",
                              batch_size=None).take_all()
    seed = _top_seed([r["piece"] for r in parts],
                     [r["c"] for r in parts], seed_size)
    chars = [p for p, _ in seed if len(p) == 1]
    total = sum(c for _, c in seed)
    ilogp = {p: int(math.floor((math.log(c) - math.log(total)) * MICRO
                               + 0.5)) for p, c in seed}

    def em_exchange(cur: Dict[str, int]) -> Tuple[List[str], List[int]]:
        ref = ray.put(cur)

        def estep(b: pa.Table) -> pa.Table:
            return _estep_block(b, ray.get(ref), max_piece_len)

        tot = vocab.map_batches(estep, batch_format="pyarrow") \
            .groupby("piece").aggregate(Sum("q", alias_name="q")).take_all()
        return ([r["piece"] for r in tot], [int(r["q"]) for r in tot])

    for _ in range(em_iters):
        ps, qs = em_exchange(ilogp)
        ilogp = dict(_mstep(ps, qs, chars))
    ps, qs = em_exchange(ilogp)
    kept = set(_prune(ps, qs, vocab_size))
    kept.update(chars)
    ilogp = {p: lp for p, lp in ilogp.items() if p in kept}
    ps, qs = em_exchange(ilogp)
    return sorted(_mstep(ps, qs, chars))


def viterbi_encode(word: str, ilogp: Dict[str, int],
                   max_len: int) -> Tuple[int, int]:
    """(n_tokens, score_micronats) of the best segmentation — max total
    ilogp; ties prefer the longest final piece at each position (smaller
    predecessor index). Unknown single chars score UNK_ILOGP."""
    n = len(word)
    NEG = -(1 << 62)
    dp = [NEG] * (n + 1)
    dp[0] = 0
    ntk = [0] * (n + 1)
    for j in range(1, n + 1):
        best, bn = NEG, 0
        for i in range(max(0, j - max_len), j):
            if dp[i] <= NEG // 2:
                continue
            lp = ilogp.get(word[i:j])
            if lp is None:
                if j - i == 1:
                    lp = UNK_ILOGP
                else:
                    continue
            s = dp[i] + lp
            # strict > keeps the SMALLEST i (longest piece) on ties
            if s > best:
                best, bn = s, ntk[i] + 1
        dp[j], ntk[j] = best, bn
    return ntk[n], dp[n]


class UnigramEncoder:
    """Actor-pool stage: learned (piece -> ilogp) table as constructor
    state, bounded per-actor word cache. Emits (doc_id, n_unigram_tokens,
    n_words, ilogp_sum)."""

    def __init__(self, scored: List[Tuple[str, int]]):
        import re
        self.ilogp = {p: int(lp) for p, lp in scored}
        self.max_len = max((len(p) for p in self.ilogp), default=1)
        self.cache: Dict[str, Tuple[int, int]] = {}
        self.ws = re.compile(r"[\t\n\f\r ]+")

    def _enc(self, word: str) -> Tuple[int, int]:
        r = self.cache.get(word)
        if r is None:
            r = viterbi_encode(word, self.ilogp, self.max_len)
            if len(self.cache) >= 1 << 20:
                self.cache.clear()
            self.cache[word] = r
        return r

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"]
        n_tok, n_words, scores = [], [], []
        for t in batch["text"].to_pylist():
            t = (t or "").strip("\t\n\f\r ").lower()
            ws = self.ws.split(t) if t else []
            n_words.append(len(ws))
            tk = sc = 0
            for w in ws:
                a, b = self._enc(w)
                tk += a
                sc += b
            n_tok.append(tk)
            scores.append(sc)
        return pa.table({
            "doc_id": ids,
            "n_unigram_tokens": pa.array(n_tok, pa.int64()),
            "n_words": pa.array(n_words, pa.int64()),
            "ilogp_sum": pa.array(scores, pa.int64())})


def learn_unigram_reference(texts: List[Optional[str]], vocab_size: int = 96,
                            seed_size: int = 512, max_piece_len: int = 5,
                            em_iters: int = 2) -> List[Tuple[str, int]]:
    """Single-process twin of learn_unigram (same tokenization as
    bpe.word_vocab, same quantization, same tiebreaks)."""
    import re
    ws = re.compile(r"[\t\n\f\r ]+")
    vocab: Counter = Counter()
    for t in texts:
        t = (t or "").strip("\t\n\f\r ").lower()
        if t:
            vocab.update(ws.split(t))
    words = sorted((w, int(c)) for w, c in vocab.items())
    return _learn_from_vocab(words, vocab_size, seed_size,
                             max_piece_len, em_iters)


def unigram_encode_reference(doc_ids: List, texts: List[Optional[str]],
                             scored: List[Tuple[str, int]]) -> List[tuple]:
    """Plain encode pass: [(doc_id, n_tokens, n_words, ilogp_sum)]."""
    import re
    wsre = re.compile(r"[\t\n\f\r ]+")
    tab = {p: int(lp) for p, lp in scored}
    max_len = max((len(p) for p in tab), default=1)
    out = []
    for did, t in zip(doc_ids, texts):
        t = (t or "").strip("\t\n\f\r ").lower()
        ws = wsre.split(t) if t else []
        tk = sc = 0
        for w in ws:
            a, b = viterbi_encode(w, tab, max_len)
            tk += a
            sc += b
        out.append((did, tk, len(ws), sc))
    return out
