"""Distributed BPE merge learning — the tokenizer-training half of an LLM
data pipeline (Sennrich et al. 2016, "Neural Machine Translation of Rare
Words with Subword Units": greedy highest-count adjacent-pair merges).

Scale shape (the classic trick that makes BPE trainable on a crawl):
  1. corpus -> WORD VOCAB once: (word, count) via combiner-first partial
     counts inside map_batches + one small groupby-sum shuffle. All later
     rounds iterate over the vocab (|V| rows), never the corpus again.
  2. per merge round, over the vocab Dataset:
       a. map_batches: per-block adjacent-pair counts weighted by word
          count -> partial (left, right, c) tables (combiner-first);
       b. groupby(left,right).sum -> exact global pair counts;
       c. per-block argmax + a <=num_blocks-row driver reduce picks the
          winner (max count, then lexicographically smallest pair — the
          deterministic tiebreak that makes the result machine-count
          independent);
       d. map_batches applies the merge (2 broadcast strings in the task
          closure) and the new vocab is materialized for the next round.
  3. counts are exact int64 everywhere, so the learned merge table is
     BIT-IDENTICAL to the single-machine reference at any parallelism.

``learn_bpe_reference`` is that single-machine twin (pytest oracle).
"""

from __future__ import annotations

from collections import Counter
from typing import List, Optional, Tuple

import numpy as np
import pyarrow as pa

import ray.data

from ..sharding import auto_buckets


def word_vocab(docs: "ray.data.Dataset",
               text_col: str = "text") -> "ray.data.Dataset":
    """(word, count) over whitespace-split lowercased text; combiner-first."""
    import re
    ws = re.compile(r"[\t\n\f\r ]+")

    def partial(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for t in batch[text_col].to_pylist():
            t = (t or "").strip("\t\n\f\r ").lower()
            if t:
                c.update(ws.split(t))
        return pa.table({"word": pa.array(list(c.keys()), pa.string()),
                         "count": pa.array(list(c.values()), pa.int64())})

    from ray.data.aggregate import Sum
    return docs.map_batches(partial, batch_format="pyarrow") \
        .groupby("word").aggregate(Sum("count", alias_name="count"))


def _pair_counts_block(batch: pa.Table) -> pa.Table:
    """Adjacent-symbol pair counts for one vocab block (weighted)."""
    c: Counter = Counter()
    counts = batch["count"].to_numpy(zero_copy_only=False)
    for syms, w in zip(batch["syms"].to_pylist(), counts):
        for a, b in zip(syms, syms[1:]):
            c[(a, b)] += int(w)
    ks = list(c.keys())
    return pa.table({
        "left": pa.array([k[0] for k in ks], pa.string()),
        "right": pa.array([k[1] for k in ks], pa.string()),
        "c": pa.array(list(c.values()), pa.int64())})


def _merge_row(syms: List[str], left: str, right: str) -> List[str]:
    out: List[str] = []
    i, n = 0, len(syms)
    while i < n:
        if i + 1 < n and syms[i] == left and syms[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _learn_from_vocab(words: dict, n_merges: int,
                      min_count: int) -> List[Tuple[str, str, int]]:
    """Greedy merge loop over a word->(syms, count) dict (shared by the
    single-machine reference and the small-vocab one-task short-circuit)."""
    merges: List[Tuple[str, str, int]] = []
    for _ in range(n_merges):
        pc: Counter = Counter()
        for syms, c in words.values():
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += c
        if not pc:
            break
        best_c = max(pc.values())
        if best_c < min_count:
            break
        left, right = min(k for k, v in pc.items() if v == best_c)
        merges.append((left, right, best_c))
        for w, (syms, c) in words.items():
            words[w] = (_merge_row(syms, left, right), c)
    return merges


def learn_bpe(docs: "ray.data.Dataset", n_merges: int = 12,
              text_col: str = "text", min_count: int = 2,
              small_vocab_rows: Optional[int] = 1_000_000,
              ) -> List[Tuple[str, str, int]]:
    """Learn ``n_merges`` BPE merges; returns [(left, right, pair_count)]
    in merge order. Stops early when the best pair's count < min_count.

    Small-vocab short-circuit (the dedup-clustering lesson): below
    ``small_vocab_rows`` distinct words the per-round fixed cost of the
    distributed loop (2 exchanges x n_merges) dwarfs the work, so all
    rounds run in ONE worker task over the vocab block — still off the
    driver, bit-identical by construction (it runs the same
    ``_learn_from_vocab`` loop the reference uses)."""
    from ray.data.aggregate import Sum

    # materialize: count() below must be metadata-only, not a re-execution
    # of the vocab groupby (and the merge loop re-reads the same blocks)
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
        totals = cur.map_batches(_pair_counts_block, batch_format="pyarrow") \
            .groupby(["left", "right"]) \
            .aggregate(Sum("c", alias_name="c"))

        def block_max(b: pa.Table) -> pa.Table:
            if b.num_rows == 0:
                return b
            c = b["c"].to_numpy(zero_copy_only=False)
            best = np.flatnonzero(c == c.max())
            # in-block tiebreak: lexicographically smallest (left, right)
            lft = b["left"].to_pylist()
            rgt = b["right"].to_pylist()
            w = min(best, key=lambda i: (lft[i], rgt[i]))
            return b.slice(w, 1)

        top = totals.map_batches(block_max, batch_format="pyarrow",
                                 batch_size=None).take_all()
        if not top:
            break
        best_c = max(r["c"] for r in top)
        cands = [r for r in top if r["c"] == best_c]
        winner = min(cands, key=lambda r: (r["left"], r["right"]))
        if best_c < min_count:
            break
        left, right = winner["left"], winner["right"]
        merges.append((left, right, int(best_c)))

        def apply(batch: pa.Table, left=left, right=right) -> pa.Table:
            new = [_merge_row(s, left, right)
                   for s in batch["syms"].to_pylist()]
            return pa.table({
                "syms": pa.array(new, pa.list_(pa.string())),
                "count": batch["count"]})

        cur = cur.map_batches(apply, batch_format="pyarrow").materialize()
    return merges


def encode_word(word: str, ranks: dict) -> List[str]:
    """Apply learned merges to one word: repeatedly merge the present pair
    with the LOWEST merge rank (the standard greedy BPE apply order)."""
    syms = list(word)
    while len(syms) > 1:
        best_rank, best_i = None, -1
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        syms[best_i:best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


class BpeEncoder:
    """Actor-pool stage: the learned merge table is constructor state
    (loaded once per actor, like model weights), with a per-actor
    word->encoding cache so repeated words cost one dict hit. Emits
    (doc_id, n_bpe_tokens, n_words)."""

    def __init__(self, merges: List[Tuple[str, str, int]]):
        import re
        self.ranks = {(l, r): i for i, (l, r, _) in enumerate(merges)}
        self.cache: dict = {}
        self.ws = re.compile(r"[\t\n\f\r ]+")

    def _n_toks(self, word: str) -> int:
        n = self.cache.get(word)
        if n is None:
            n = len(encode_word(word, self.ranks))
            if len(self.cache) >= 1 << 20:  # bounded actor state
                self.cache.clear()
            self.cache[word] = n
        return n

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"]
        n_bpe, n_words = [], []
        for t in batch["text"].to_pylist():
            t = (t or "").strip("\t\n\f\r ").lower()
            ws = self.ws.split(t) if t else []
            n_words.append(len(ws))
            n_bpe.append(sum(self._n_toks(w) for w in ws))
        return pa.table({
            "doc_id": ids,
            "n_bpe_tokens": pa.array(n_bpe, pa.int64()),
            "n_words": pa.array(n_words, pa.int64())})


def learn_bpe_reference(texts: List[Optional[str]], n_merges: int = 12,
                        min_count: int = 2) -> List[Tuple[str, str, int]]:
    """Single-machine twin of learn_bpe (same tokenization, same tiebreak)."""
    import re
    ws = re.compile(r"[\t\n\f\r ]+")
    vocab: Counter = Counter()
    for t in texts:
        t = (t or "").strip("\t\n\f\r ").lower()
        if t:
            vocab.update(ws.split(t))
    words = {w: (list(w), c) for w, c in vocab.items()}
    return _learn_from_vocab(words, n_merges, min_count)
