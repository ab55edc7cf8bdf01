"""Vectorized text-analysis operators for the training-data path.

Each function is a ``map_batches(fn, batch_format="pyarrow")`` UDF over the
``documents`` table shape ``(doc_id, text, ...)``. All hot-path work is
pyarrow.compute (RE2 kernels, zero-copy) or numpy over flattened token
arrays — no per-row Python in any inner loop. Semantics that have a DuckDB
SQL twin (token_count, quality stats, md5 fingerprint, normalize) are written
so the SQL in ``__ray_entry__.oracle_sql`` is the *same* RE2 regex chain,
making oracle equality hold by construction.

Scale notes (100 TB): every operator here is embarrassingly parallel —
stateless, no shuffle, linear in input bytes; ``read_parquet(columns=[...])``
prunes at the read so only ``doc_id`` + ``text`` leave storage.
"""

from __future__ import annotations

import hashlib
from typing import List, Optional, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# ONE normalize implementation lives in oracle/textnorm.py (RE2 chain);
# re-exported here for the batch UDFs.
from ..oracle.textnorm import normalize_text_arrow  # noqa: F401

_RE_WS = r"\s+"

# Fixed stopword list (shared with the SQL oracle literal list).
STOPWORDS = ["the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
             "for", "on", "with", "as", "at", "by", "be", "this", "that"]


def normalize_batch(batch: pa.Table) -> pa.Table:
    return pa.table({
        "doc_id": batch["doc_id"],
        "norm_text": normalize_text_arrow(batch["text"].combine_chunks()),
    })


def _tokens_list(arr: pa.Array) -> pa.Array:
    """Whitespace tokens per row; '' -> empty list (matches the SQL guard).

    Trim is the same RE2 regex the SQL twin uses ('^\\s+|\\s+$') — NOT
    pc.utf8_trim_whitespace, which strips unicode whitespace (NBSP/NEL/VT)
    that RE2 \\s does not, a latent hash divergence at token boundaries."""
    trimmed = pc.replace_substring_regex(arr, r"^\s+|\s+$", "")
    split = pc.split_pattern_regex(trimmed, _RE_WS)
    empty = pc.equal(trimmed, "")
    # RE2 split of "" yields [""]; null it out to an empty list equivalent by
    # masking counts later — we keep the list but remember emptiness.
    return split, empty


def token_count_batch(batch: pa.Table) -> pa.Table:
    """n_tokens per doc: whitespace-run split of trimmed text (0 for blank)."""
    split, empty = _tokens_list(batch["text"].combine_chunks())
    n = pc.list_value_length(split)
    n = pc.if_else(empty, pa.scalar(0, pa.int32()), pc.cast(n, pa.int32()))
    return pa.table({"doc_id": batch["doc_id"], "n_tokens": pc.cast(n, pa.int64())})


def quality_stats_batch(batch: pa.Table) -> pa.Table:
    """Quality-scoring signals per doc, fully vectorized.

    Integer counts only (n_chars, n_tokens, n_alpha [A-Za-z] chars, n_stop
    stopword tokens) — ratios are left to the consumer so the distributed
    result is hash-exact against the SQL oracle (float rounding modes differ
    between numpy half-even and DuckDB half-away)."""
    text = batch["text"].combine_chunks()
    n_chars = pc.cast(pc.utf8_length(text), pa.int64())
    split, empty = _tokens_list(text)
    n_tokens = pc.if_else(empty, pa.scalar(0, pa.int64()),
                          pc.cast(pc.list_value_length(split), pa.int64()))
    n_alpha = pc.cast(pc.count_substring_regex(text, "[A-Za-z]"), pa.int64())

    # flatten tokens once; numpy segment-sum over the flat array
    flat = pc.list_flatten(split)
    lens = pc.list_value_length(split).to_numpy(zero_copy_only=False).astype(np.int64)
    offsets = np.zeros(len(lens) + 1, dtype=np.int64)
    np.cumsum(lens, out=offsets[1:])
    if len(flat):
        low = pc.utf8_lower(flat)
        is_stop = np.isin(low.to_numpy(zero_copy_only=False), np.array(STOPWORDS))
        stop_counts = np.add.reduceat(
            np.concatenate([is_stop.astype(np.int64), [0]]), offsets[:-1])
        stop_counts = np.where(lens == 0, 0, stop_counts)
    else:
        stop_counts = np.zeros(len(lens), dtype=np.int64)
    n_tok_np = n_tokens.to_numpy(zero_copy_only=False)
    stop_counts = np.where(n_tok_np == 0, 0, stop_counts)
    return pa.table({
        "doc_id": batch["doc_id"],
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "n_alpha": n_alpha,
        "n_stop": pa.array(stop_counts, pa.int64()),
    })


def fingerprint_md5_batch(batch: pa.Table) -> pa.Table:
    """Content fingerprint: md5 hex of the normalized text (SQL twin: md5())."""
    norm = normalize_text_arrow(batch["text"].combine_chunks())
    fps = [hashlib.md5(s.encode("utf-8")).hexdigest() if s is not None else None
           for s in norm.to_pylist()]
    return pa.table({
        "doc_id": batch["doc_id"],
        "fingerprint": pa.array(fps, pa.string()),
    })


# --- rolling-hash / winnowing fingerprint (no SQL twin; rows-only check) ---

_B = np.uint64(1000003)
_MASK = np.uint64((1 << 61) - 1)


_FNV_OFFSET = np.uint64(1469598103934665603)
_FNV_PRIME = np.uint64(1099511628211)


def _token_hashes(tokens: np.ndarray) -> np.ndarray:
    """Stable 64-bit FNV-1a per token, vectorized ACROSS tokens: bytes are
    padded into a (n, maxlen) matrix and the sequential FNV recurrence runs
    over byte POSITIONS (maxlen iterations of whole-column numpy ops), not
    over every byte in Python. uint64 multiply wraps in C, matching the
    masked scalar recurrence bit-for-bit."""
    n = len(tokens)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    bs = [t.encode("utf-8") for t in tokens]
    lens = np.fromiter((len(b) for b in bs), dtype=np.int64, count=n)
    maxlen = int(lens.max()) if n else 0
    arr = np.zeros((n, maxlen), dtype=np.uint8)
    for i, b in enumerate(bs):  # one memcpy per token, not one op per byte
        arr[i, : len(b)] = np.frombuffer(b, dtype=np.uint8)
    h = np.full(n, _FNV_OFFSET, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(maxlen):
            active = lens > j
            h[active] = (h[active] ^ arr[active, j].astype(np.uint64)) * _FNV_PRIME
    return h


def shingle_hashes(token_hashes: np.ndarray, k: int) -> np.ndarray:
    """Polynomial rolling hash of every k-token shingle (vectorized)."""
    n = len(token_hashes)
    if n < k:
        return np.array([], dtype=np.uint64)
    acc = np.zeros(n - k + 1, dtype=np.uint64)
    for j in range(k):  # k is small (e.g. 3..5); inner ops are vectorized
        acc = acc * _B + token_hashes[j: n - k + 1 + j]
    return acc


def winnow_fingerprint_batch(batch: pa.Table, k: int = 4, window: int = 8) -> pa.Table:
    """Winnowing (Schleimer et al. 2003): min shingle hash per sliding window,
    deduplicated — a compact document sketch for plagiarism-style matching."""
    text = normalize_text_arrow(batch["text"].combine_chunks())
    split, _ = _tokens_list(text)
    out_ids, out_fps = [], []
    for doc_id, toks in zip(batch["doc_id"].to_pylist(), split.to_pylist()):
        toks = [t.lower() for t in (toks or []) if t]
        hs = shingle_hashes(_token_hashes(np.array(toks, dtype=object)), k) if toks else np.array([], dtype=np.uint64)
        if len(hs) == 0:
            sketch: List[int] = []
        elif len(hs) <= window:
            sketch = [int(hs.min())]
        else:
            sw = np.lib.stride_tricks.sliding_window_view(hs, window)
            sketch = sorted(set(int(x) for x in sw.min(axis=1)))
        out_ids.append(doc_id)
        out_fps.append(sketch)
    # scalar columns only (a list column breaks value-hash comparison): the
    # sketch is summarized as its size + a stable digest of its elements
    hashes = [hashlib.blake2b(",".join(map(str, s)).encode(), digest_size=8).hexdigest()
              for s in out_fps]
    return pa.table({
        "doc_id": pa.array(out_ids, batch["doc_id"].type),
        "n_sketch": pa.array([len(s) for s in out_fps], pa.int64()),
        "sketch_hash": pa.array(hashes, pa.string()),
    })


# --- language ID: character-trigram cosine against per-language profiles ---

_LANG_PROFILES = {
    "en": "the and ing ion tio ent for ati ter ate her his tha ere con res ver all",
    "es": "de la que el en los del las por con una para est ado cion nte era",
    "fr": "de le la les des une est que dans pour par sur ent ait eur ion",
    "de": "der die und den von sch ein ich das mit ung gen cht ver aus ber",
    "zh": "de shi zai le bu you wo ta men zhe ge shang zhong guo ren hui dui",
}


class LangIdModel:
    """Trigram-profile language scorer; built once per actor (stateful stage).

    The profile table is tiny and lives in actor memory — the broadcast-small-
    side pattern (no shuffle). For real corpora you would load fastText-style
    n-gram weights here; the scoring loop is the same.
    """

    def __init__(self):
        self.langs = sorted(_LANG_PROFILES)
        vocab = {}
        rows = []
        for lang in self.langs:
            grams = _LANG_PROFILES[lang].split()
            row = {}
            for g in grams:
                for i in range(len(g) - 2):
                    tri = g[i:i + 3]
                    vocab.setdefault(tri, len(vocab))
                    row[tri] = row.get(tri, 0) + 1
            rows.append(row)
        self.vocab = vocab
        mat = np.zeros((len(self.langs), len(vocab)), dtype=np.float64)
        for r, row in enumerate(rows):
            for tri, cnt in row.items():
                mat[r, vocab[tri]] = cnt
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        self.profiles = mat / np.where(norms == 0, 1, norms)
        # integer trigram keys for vectorized lookup: ((c0*U)+c1)*U+c2 with
        # U = 0x110000 (max codepoint + 1); fits int64
        U = np.int64(0x110000)
        keys = np.array(
            [((np.int64(ord(t[0])) * U + ord(t[1])) * U + ord(t[2]))
             for t in vocab], dtype=np.int64)
        idxs = np.array([vocab[t] for t in vocab], dtype=np.int64)
        order = np.argsort(keys)
        self._vkeys = keys[order]
        self._vidx = idxs[order]
        self._U = U

    def _vec(self, t: str) -> Optional[np.ndarray]:
        """Vectorized trigram count vector for one doc."""
        if len(t) < 3:
            return None
        codes = np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32).astype(np.int64)
        keys = (codes[:-2] * self._U + codes[1:-1]) * self._U + codes[2:]
        pos = np.searchsorted(self._vkeys, keys)
        pos = np.clip(pos, 0, len(self._vkeys) - 1)
        hit = self._vkeys[pos] == keys
        if not hit.any():
            return None
        vec = np.bincount(self._vidx[pos[hit]], minlength=len(self.vocab)).astype(np.float64)
        return vec

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = pc.utf8_lower(batch["text"].combine_chunks()).to_pylist()
        preds = []
        for t in texts:
            vec = self._vec(t) if t else None
            if vec is None:
                preds.append("und")
                continue
            sims = self.profiles @ (vec / np.linalg.norm(vec))
            preds.append(self.langs[int(np.argmax(sims))])
        return pa.table({
            "doc_id": batch["doc_id"],
            "pred_lang": pa.array(preds, pa.string()),
        })


def inverted_index(ds: "ray.data.Dataset",
                   num_buckets: "int | None" = None) -> "ray.data.Dataset":
    """Search-index build: token -> (df, tf, postings digest).

    Per batch everything is Arrow-vectorized: lower -> RE2 trim/split ->
    ``list_flatten`` + ``list_parent_indices`` explode (no Python row loop)
    -> per-batch ``group_by(token, doc_id)`` count (the combiner — repeated
    tokens inside a batch collapse BEFORE the shuffle). One bucketed
    exchange on crc32(token) co-locates each token's postings; the reducer
    merges counts vectorized and emits per-token df/tf plus an md5 digest
    of the ascending doc-id posting list (a digest, not a list column —
    list cells break the driver's value hash; the digest still pins the
    exact posting order against the SQL twin's ``string_agg ORDER BY``).
    The only per-element Python is the digest join, O(distinct tokens in
    bucket), not O(rows).
    """
    import hashlib

    import ray.data  # noqa: F401  (type only)

    from ..sharding import auto_buckets, bucket_of_strs

    if num_buckets is None:
        num_buckets = auto_buckets(None)  # driver-resolved once (see dedup)

    def explode(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].combine_chunks().to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        split, empty = _tokens_list(pc.utf8_lower(b["text"].combine_chunks()))
        keep = pc.invert(empty)
        split = split.filter(keep)
        ids = ids[keep.to_numpy(zero_copy_only=False)]
        flat = pc.list_flatten(split)
        parent = pc.list_parent_indices(split).to_numpy(zero_copy_only=False)
        t = pa.table({"token": flat,
                      "doc_id": pa.array(ids[parent], pa.int64())})
        t = t.group_by(["token", "doc_id"]).aggregate([([], "count_all")])
        pk = bucket_of_strs(t["token"].to_pylist(), num_buckets)
        return pa.table({"token": t["token"], "doc_id": t["doc_id"],
                         "c": pc.cast(t["count_all"], pa.int64()),
                         "pkey": pa.array(pk, pa.int64())})

    def local(g: pa.Table) -> pa.Table:
        t = g.group_by(["token", "doc_id"]).aggregate([("c", "sum")])
        tok = np.asarray(t["token"].to_pylist(), dtype=object)
        doc = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        c = t["c_sum"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((doc, tok))
        tok, doc, c = tok[order], doc[order], c[order]
        n = len(tok)
        first = np.r_[True, tok[1:] != tok[:-1]] if n else np.zeros(0, bool)
        starts = np.flatnonzero(first)
        ends = np.r_[starts[1:], n]
        tf = np.add.reduceat(c, starts) if n else np.zeros(0, np.int64)
        digests = [hashlib.md5(
            ",".join(map(str, doc[s:e])).encode()).hexdigest()
            for s, e in zip(starts, ends)]
        return pa.table({
            "token": pa.array(tok[starts].tolist(), pa.string()),
            "df": pa.array(ends - starts, pa.int64()),
            "tf": pa.array(tf, pa.int64()),
            "postings_md5": pa.array(digests, pa.string())})

    return ds.map_batches(explode, batch_format="pyarrow") \
        .groupby("pkey").map_groups(local, batch_format="pyarrow")


def doc_top_terms(ds: "ray.data.Dataset", k: int = 3,
                  num_buckets: "int | None" = None) -> "ray.data.Dataset":
    """TF-IDF-style per-document top-k terms. Relevance = tf/df as an IEEE
    double — division is correctly rounded (unlike ln), so numpy and a SQL
    twin produce bit-identical scores and the ranking is exactly
    reproducible; ties break on token asc.

    Two bucketed exchanges, no join: shuffle 1 on crc32(token) co-locates
    a token's postings, and the reducer emits (doc_id, token, tf, df) with
    df computed in place (the join the naive plan would do is free here);
    shuffle 2 on hash(doc_id) ranks each doc's terms vectorized (lexsort +
    segment boundaries, no per-doc loop)."""
    from ..sharding import auto_buckets, bucket_of_ints, bucket_of_strs

    if num_buckets is None:
        num_buckets = auto_buckets(None)

    def explode(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].combine_chunks().to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        split, empty = _tokens_list(pc.utf8_lower(b["text"].combine_chunks()))
        keep = pc.invert(empty)
        split = split.filter(keep)
        ids = ids[keep.to_numpy(zero_copy_only=False)]
        flat = pc.list_flatten(split)
        parent = pc.list_parent_indices(split).to_numpy(zero_copy_only=False)
        t = pa.table({"token": flat,
                      "doc_id": pa.array(ids[parent], pa.int64())})
        t = t.group_by(["token", "doc_id"]).aggregate([([], "count_all")])
        pk = bucket_of_strs(t["token"].to_pylist(), num_buckets)
        return pa.table({"token": t["token"], "doc_id": t["doc_id"],
                         "c": pc.cast(t["count_all"], pa.int64()),
                         "pkey": pa.array(pk, pa.int64())})

    def with_df(g: pa.Table) -> pa.Table:
        t = g.group_by(["token", "doc_id"]).aggregate([("c", "sum")])
        tok = np.asarray(t["token"].to_pylist(), dtype=object)
        doc = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        c = t["c_sum"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((doc, tok))
        tok, doc, c = tok[order], doc[order], c[order]
        n = len(tok)
        first = np.r_[True, tok[1:] != tok[:-1]] if n else np.zeros(0, bool)
        seg = np.cumsum(first) - 1
        starts = np.flatnonzero(first)
        df = np.diff(np.r_[starts, n])[seg]       # token's df on every row
        return pa.table({
            "doc_id": pa.array(doc, pa.int64()),
            "token": pa.array(tok.tolist(), pa.string()),
            "tf": pa.array(c, pa.int64()),
            "df": pa.array(df, pa.int64()),
            "pkey": pa.array(bucket_of_ints(doc, num_buckets), pa.int64())})

    def topk(g: pa.Table) -> pa.Table:
        doc = g["doc_id"].to_numpy(zero_copy_only=False)
        tok = np.asarray(g["token"].to_pylist(), dtype=object)
        tf = g["tf"].to_numpy(zero_copy_only=False).astype(np.int64)
        df = g["df"].to_numpy(zero_copy_only=False).astype(np.int64)
        score = tf.astype(np.float64) / df.astype(np.float64)
        order = np.lexsort((tok, -score, doc))
        doc, tok, tf, df = doc[order], tok[order], tf[order], df[order]
        n = len(doc)
        first = np.r_[True, doc[1:] != doc[:-1]] if n else np.zeros(0, bool)
        seg = np.cumsum(first) - 1
        starts = np.flatnonzero(first)
        rank = np.arange(n) - starts[seg] + 1
        keep = rank <= k
        return pa.table({
            "doc_id": pa.array(doc[keep], pa.int64()),
            "rank": pa.array(rank[keep], pa.int64()),
            "token": pa.array(tok[keep].tolist(), pa.string()),
            "tf": pa.array(tf[keep], pa.int64()),
            "df": pa.array(df[keep], pa.int64())})

    return ds.map_batches(explode, batch_format="pyarrow") \
        .groupby("pkey").map_groups(with_df, batch_format="pyarrow") \
        .groupby("pkey").map_groups(topk, batch_format="pyarrow")


# ------------------------------------------------------------------ redact
# Pattern redaction (PII scrubbing at corpus scale). Every pattern is
# RE2-only syntax (no backreferences, no lookaround) so the pyarrow kernels
# here and a DuckDB regexp_replace twin produce byte-identical output.
# Patterns apply SEQUENTIALLY: each is counted on the current string, then
# replaced, before the next pattern runs — deterministic in both engines.

PII_PATTERNS = [
    # order matters: ssn/ipv4 before the looser phone pattern
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    (r"\+?\d{1,2}[- ]?\(?\d{3}\)?[- ]?\d{3}[- ]?\d{4}", "<PHONE>"),
]


def redact_batch(batch: pa.Table, col: str = "text",
                 patterns=None, out_col: str = "red_text") -> pa.Table:
    """Redact every pattern occurrence in ``col``; emit the scrubbed string
    plus the total match count. Fully vectorized (one RE2 pass per pattern
    per batch); stateless, so it runs on the task pool."""
    patterns = PII_PATTERNS if patterns is None else patterns
    arr = batch[col].combine_chunks()
    total = np.zeros(len(arr), dtype=np.int64)
    for pat, repl in patterns:
        total += pc.count_substring_regex(arr, pat) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        arr = pc.replace_substring_regex(arr, pat, repl)
    key = batch.column_names[0]
    return pa.table({
        key: batch[key],
        out_col: arr,
        "n_redactions": pa.array(total, pa.int64()),
    })


def extract_int_field_batch(batch: pa.Table, col: str, pattern: str,
                            out_col: str) -> pa.Table:
    """Extract one integer capture group per row (e.g. a field out of a
    JSON-ish props string) with RE2 ``extract_regex`` — the vectorized
    scale path for schema-on-read field extraction; rows with no match
    come back NULL."""
    ex = pc.extract_regex(batch[col].combine_chunks(), pattern)
    # extract_regex yields a StructArray with one field per capture group;
    # the child array holds "" under a null parent, so re-apply the parent
    # validity before casting
    f = pc.if_else(pc.is_valid(ex), ex.field(0), pa.scalar(None, pa.string()))
    val = pc.cast(f, pa.int64())
    key = batch.column_names[0]
    return pa.table({key: batch[key], out_col: val})


# ------------------------------------------------------- repetition stats
# Gopher-style (Rae et al. 2021 §A1.1) repetition signals: most-frequent-
# token share and duplicate 2-/3-gram counts. Integer counts only (the
# consumer compares exact rationals), one boolean flag with fixed
# thresholds. Distinctness is counted over 64-bit token/shingle hashes —
# the same ~2^-64 collision trade every hashed dedup path here makes.

def _per_doc_distinct(doc_of: np.ndarray, hashes: np.ndarray,
                      n_docs: int) -> Tuple[np.ndarray, np.ndarray]:
    """(distinct_count, max_multiplicity) per doc, vectorized: one lexsort,
    run-length encode (doc, hash) runs, then bincount / maximum.reduceat."""
    distinct = np.zeros(n_docs, dtype=np.int64)
    top = np.zeros(n_docs, dtype=np.int64)
    if len(hashes) == 0:
        return distinct, top
    order = np.lexsort((hashes, doc_of))
    d, h = doc_of[order], hashes[order]
    starts = np.flatnonzero(np.r_[True, (d[1:] != d[:-1]) | (h[1:] != h[:-1])])
    run_len = np.diff(np.r_[starts, len(h)])
    run_doc = d[starts]
    distinct += np.bincount(run_doc, minlength=n_docs)
    doc_starts = np.flatnonzero(np.r_[True, run_doc[1:] != run_doc[:-1]])
    top[run_doc[doc_starts]] = np.maximum.reduceat(run_len, doc_starts)
    return distinct, top


def repetition_stats_batch(batch: pa.Table, min_tokens: int = 20) -> pa.Table:
    """Per-doc repetition signals over whitespace tokens of the trimmed
    text: token count, distinct tokens, top-token multiplicity, 2-/3-gram
    totals and duplicate counts, and a repetition flag
    (n_tokens >= min_tokens AND (top share > 30% OR dup-2-gram share > 20%
    OR dup-3-gram share > 18%), all compared as exact integer rationals).
    Blank docs report all-zero counts."""
    arr = batch["text"].combine_chunks()
    trimmed = pc.replace_substring_regex(arr, r"^\s+|\s+$", "")
    split = pc.split_pattern_regex(trimmed, _RE_WS)
    la = split.combine_chunks() if isinstance(split, pa.ChunkedArray) else split
    offsets = la.offsets.to_numpy().astype(np.int64)
    n_tok = np.diff(offsets)
    blank = pc.equal(trimmed, "").to_numpy(zero_copy_only=False)
    n_docs = len(n_tok)
    doc_of = np.repeat(np.arange(n_docs), n_tok)
    toks = np.asarray(la.values.to_pylist(), dtype=object)
    th = _token_hashes(toks)

    n_tokens = np.where(blank, 0, n_tok)
    n_distinct, top_count = _per_doc_distinct(doc_of, th, n_docs)
    n_distinct = np.where(blank, 0, n_distinct)
    top_count = np.where(blank, 0, top_count)

    out = {"doc_id": batch["doc_id"],
           "n_tokens": pa.array(n_tokens, pa.int64()),
           "n_distinct": pa.array(n_distinct, pa.int64()),
           "top_count": pa.array(top_count, pa.int64())}
    dup = {}
    for k in (2, 3):
        n_k = np.maximum(n_tok - k + 1, 0)
        n_k = np.where(blank | (n_tok < k), 0, n_k)
        sh = shingle_hashes(th, k)
        # drop shingles that cross a document boundary
        if len(sh):
            valid = doc_of[: len(sh)] == doc_of[k - 1:]
            d_k, _ = _per_doc_distinct(doc_of[: len(sh)][valid], sh[valid],
                                       n_docs)
        else:
            d_k = np.zeros(n_docs, dtype=np.int64)
        d_k = np.where(blank, 0, d_k)
        out[f"n_{k}grams"] = pa.array(n_k, pa.int64())
        out[f"n_dup_{k}grams"] = pa.array(n_k - d_k, pa.int64())
        dup[k] = (n_k, n_k - d_k)
    n2, dup2 = dup[2]
    n3, dup3 = dup[3]
    flag = (n_tokens >= min_tokens) & (
        (10 * top_count > 3 * n_tokens)
        | (10 * dup2 > 2 * n2)
        | (100 * dup3 > 18 * n3))
    out["flag_repetitive"] = pa.array(flag, pa.bool_())
    return pa.table(out)


def bigram_rarity(ds: "ray.data.Dataset", rare_max: int = 2,
                  num_buckets=None) -> "ray.data.Dataset":
    """Corpus-frequency bigram rarity score per document — the integer-exact
    core of an LM-style quality/rarity signal (CCNet shape): for every
    bigram OCCURRENCE in a doc, look up how often that bigram appears in
    the whole corpus, then report per doc the occurrence count, the summed
    corpus frequency, and how many occurrences are "rare" (corpus freq <=
    rare_max). High n_rare/n_bigrams = unusual text; low = boilerplate.

    Scale shape: TWO bucketed shuffles, both combiner-compacted. (1) each
    doc's bigram hashes ship once as (doc_id, h) -> cnt cells to
    bucket(h); a bucket holds EVERY occurrence row of its bigrams, so one
    sorted segment-sum yields the corpus frequency and the per-doc partial
    scores in the same pass — the frequency table is never materialized,
    joined, or broadcast. (2) per-doc partials merge with a bucketed sum.
    Token identity is the 64-bit rolling hash (collision odds ~2^-64/pair,
    same trade as the Jaccard family; the DuckDB string twin hash-matches).
    """
    from ..sharding import auto_buckets, bucket_of_ints
    from .agg import bucketed_group_sum

    nb = num_buckets or auto_buckets(None)  # driver-resolved once

    def emit(batch: pa.Table) -> pa.Table:
        # fully vectorized: Arrow lower+split, matrix FNV token hashes,
        # rolling 2-shingle over the batch-flat token stream with a doc
        # boundary mask (a <2-token doc can never form an in-doc bigram)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        split, _ = _tokens_list(
            pc.utf8_lower(batch["text"].combine_chunks()))
        lens = pc.list_value_length(split) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        flat = split.flatten().to_numpy(zero_copy_only=False)
        th = _token_hashes(np.asarray(flat, dtype=object))
        if len(th) >= 2:
            doc_of = np.repeat(np.arange(len(ids), dtype=np.int64), lens)
            bh = shingle_hashes(th, 2)
            valid = doc_of[:-1] == doc_of[1:]
            hs = bh[valid].view(np.int64)
            dids = ids[doc_of[:-1][valid]]
        else:
            hs = np.empty(0, np.int64)
            dids = np.empty(0, np.int64)
        t = pa.table({"doc_id": pa.array(dids, pa.int64()),
                      "h": pa.array(hs, pa.int64())}) \
            .group_by(["doc_id", "h"]).aggregate([([], "count_all")])
        cnt = pc.cast(t["count_all"], pa.int64())
        h64 = t["h"].to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": t["doc_id"], "h": t["h"], "cnt": cnt,
            "pkey": pa.array(bucket_of_ints(h64, nb), pa.int64())})

    def per_bucket(g: pa.Table) -> pa.Table:
        t = g.select(["doc_id", "h", "cnt"]).group_by(["doc_id", "h"]) \
            .aggregate([("cnt", "sum")])
        h = t["h"].to_numpy(zero_copy_only=False)
        did = t["doc_id"].to_numpy(zero_copy_only=False)
        cnt = t["cnt_sum"].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(h) == 0:
            z = pa.array([], pa.int64())
            return pa.table({"doc_id": z, "n_bigrams": z,
                             "sum_freq": z, "n_rare": z})
        order = np.argsort(h, kind="stable")
        h, did, cnt = h[order], did[order], cnt[order]
        new_h = np.empty(len(h), dtype=bool)
        new_h[0] = True
        new_h[1:] = h[1:] != h[:-1]
        starts = np.flatnonzero(new_h)
        freq = np.add.reduceat(cnt, starts)       # corpus freq per bigram
        f_row = freq[np.cumsum(new_h) - 1]        # broadcast back to rows
        part = pa.table({
            "doc_id": pa.array(did, pa.int64()),
            "n_bigrams": pa.array(cnt, pa.int64()),
            "sum_freq": pa.array(cnt * f_row, pa.int64()),
            "n_rare": pa.array(np.where(f_row <= rare_max, cnt, 0),
                               pa.int64()),
        }).group_by("doc_id").aggregate(
            [("n_bigrams", "sum"), ("sum_freq", "sum"), ("n_rare", "sum")])
        return pa.table({
            "doc_id": part["doc_id"],
            "n_bigrams": pc.cast(part["n_bigrams_sum"], pa.int64()),
            "sum_freq": pc.cast(part["sum_freq_sum"], pa.int64()),
            "n_rare": pc.cast(part["n_rare_sum"], pa.int64())})

    partials = ds.map_batches(emit, batch_format="pyarrow") \
        .groupby("pkey").map_groups(per_bucket, batch_format="pyarrow")
    return bucketed_group_sum(partials, "doc_id",
                              ["n_bigrams", "sum_freq", "n_rare"])


_LM_V = 1 << 20  # smoothing vocab size (hashed-bucket LM, CCNet shape)


def _ilog_micro(v: np.ndarray) -> np.ndarray:
    """round(1e6 * ln(v)) as int64 — the quantize-ONCE step (same
    discipline as clustering._quantize_rows): float log happens exactly
    once per exact-integer count, then everything downstream is int64
    sums, so the single-process twin matches bit-for-bit."""
    return np.round(1e6 * np.log(v.astype(np.float64))).astype(np.int64)


def bigram_surprisal(ds: "ray.data.Dataset",
                     num_buckets=None) -> "ray.data.Dataset":
    """Bigram-LM surprisal per document — the CCNet-style perplexity
    filter (Wenzek et al. 2020) with an add-one-smoothed hashed-vocab LM
    fit on the corpus itself: per bigram occurrence (x, y),
    surprisal = ln(c_x + V) - ln(c_xy + 1), reported per doc as exact
    int64 micro-nat totals plus the floor-div mean. High mean = text the
    corpus LM finds improbable (noise/rare); low = boilerplate.

    Scale shape: the two log terms decompose into independent
    hash-keyed lookups, so ONE bucketed exchange carries
    (doc_id, h, cnt, kind) cells — kind 0 = context unigram x (every
    token that has a successor in its doc), kind 1 = bigram (x, y). A
    bucket holds EVERY occurrence cell of its hashes, so one sorted
    segment-sum yields the corpus counts AND the per-doc partial log-sums
    in the same pass; the LM table is never materialized, joined, or
    broadcast (same plan as bigram_rarity). Per-doc partials then merge
    with a bucketed sum. Token identity is the 64-bit FNV/rolling hash
    (collision odds ~2^-64/pair).
    """
    from ..sharding import auto_buckets, bucket_of_ints
    from .agg import bucketed_group_sum

    nb = num_buckets or auto_buckets(None)  # driver-resolved once

    def emit(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        split, _ = _tokens_list(
            pc.utf8_lower(batch["text"].combine_chunks()))
        lens = pc.list_value_length(split) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        flat = split.flatten().to_numpy(zero_copy_only=False)
        th = _token_hashes(np.asarray(flat, dtype=object))
        if len(th) >= 2:
            doc_of = np.repeat(np.arange(len(ids), dtype=np.int64), lens)
            valid = doc_of[:-1] == doc_of[1:]  # in-doc (x, successor) pairs
            bh = shingle_hashes(th, 2)[valid].view(np.int64)
            ch = th[:-1][valid].view(np.int64)
            dids = ids[doc_of[:-1][valid]]
            hs = np.concatenate([ch, bh])
            dd = np.concatenate([dids, dids])
            kind = np.repeat(np.array([0, 1], np.int64), len(dids))
        else:
            hs = np.empty(0, np.int64)
            dd = np.empty(0, np.int64)
            kind = np.empty(0, np.int64)
        t = pa.table({"doc_id": pa.array(dd, pa.int64()),
                      "h": pa.array(hs, pa.int64()),
                      "kind": pa.array(kind, pa.int64())}) \
            .group_by(["doc_id", "h", "kind"]).aggregate([([], "count_all")])
        h64 = t["h"].to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": t["doc_id"], "h": t["h"], "kind": t["kind"],
            "cnt": pc.cast(t["count_all"], pa.int64()),
            "pkey": pa.array(bucket_of_ints(h64, nb), pa.int64())})

    def per_bucket(g: pa.Table) -> pa.Table:
        t = g.select(["doc_id", "h", "kind", "cnt"]) \
            .group_by(["doc_id", "h", "kind"]).aggregate([("cnt", "sum")])
        did = t["doc_id"].to_numpy(zero_copy_only=False)
        h = t["h"].to_numpy(zero_copy_only=False)
        kind = t["kind"].to_numpy(zero_copy_only=False)
        cnt = t["cnt_sum"].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(h) == 0:
            z = pa.array([], pa.int64())
            return pa.table({"doc_id": z, "n_bigrams": z,
                             "ctx_micro": z, "big_micro": z})
        order = np.lexsort((h, kind))
        did, h, kind, cnt = did[order], h[order], kind[order], cnt[order]
        new_g = np.empty(len(h), dtype=bool)
        new_g[0] = True
        new_g[1:] = (h[1:] != h[:-1]) | (kind[1:] != kind[:-1])
        starts = np.flatnonzero(new_g)
        freq = np.add.reduceat(cnt, starts)      # corpus count per (kind,h)
        f_row = freq[np.cumsum(new_g) - 1]
        is_big = kind == 1
        ctx = np.where(is_big, 0, cnt * _ilog_micro(f_row + _LM_V))
        big = np.where(is_big, cnt * _ilog_micro(f_row + 1), 0)
        part = pa.table({
            "doc_id": pa.array(did, pa.int64()),
            "n_bigrams": pa.array(np.where(is_big, cnt, 0), pa.int64()),
            "ctx_micro": pa.array(ctx, pa.int64()),
            "big_micro": pa.array(big, pa.int64()),
        }).group_by("doc_id").aggregate(
            [("n_bigrams", "sum"), ("ctx_micro", "sum"),
             ("big_micro", "sum")])
        return pa.table({
            "doc_id": part["doc_id"],
            "n_bigrams": pc.cast(part["n_bigrams_sum"], pa.int64()),
            "ctx_micro": pc.cast(part["ctx_micro_sum"], pa.int64()),
            "big_micro": pc.cast(part["big_micro_sum"], pa.int64())})

    def final(b: pa.Table) -> pa.Table:
        n = b["n_bigrams"].to_numpy(zero_copy_only=False)
        s = b["ctx_micro"].to_numpy(zero_copy_only=False) - \
            b["big_micro"].to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": b["doc_id"],
            "n_bigrams": b["n_bigrams"],
            "surprisal_micro": pa.array(s, pa.int64()),
            "mean_surprisal_micro": pa.array(s // n, pa.int64())})

    partials = ds.map_batches(emit, batch_format="pyarrow") \
        .groupby("pkey").map_groups(per_bucket, batch_format="pyarrow")
    return bucketed_group_sum(
        partials, "doc_id", ["n_bigrams", "ctx_micro", "big_micro"]) \
        .map_batches(final, batch_format="pyarrow")


def bigram_surprisal_reference(doc_ids: List[int],
                               texts: List[str]) -> List[tuple]:
    """Single-process twin of bigram_surprisal: plain re-based
    tokenization, dict counts, one scoring loop — no Ray, no bucketed
    exchange. The oracle-dump side."""
    import re

    ctx_count: dict = {}
    big_count: dict = {}
    per_doc = []
    for did, text in zip(doc_ids, texts):
        toks = re.split(r"\s+", re.sub(r"^\s+|\s+$", "", text.lower()))
        th = _token_hashes(np.asarray(toks, dtype=object))
        if len(th) < 2:
            per_doc.append((did, None, None))
            continue
        bh = shingle_hashes(th, 2)
        ch = th[:-1]
        for v in ch.view(np.int64):
            ctx_count[int(v)] = ctx_count.get(int(v), 0) + 1
        for v in bh.view(np.int64):
            big_count[int(v)] = big_count.get(int(v), 0) + 1
        per_doc.append((did, ch.view(np.int64), bh.view(np.int64)))
    out = []
    for did, ch, bh in per_doc:
        if ch is None:
            continue
        cv = np.array([ctx_count[int(c)] for c in ch], np.int64)
        bv = np.array([big_count[int(b)] for b in bh], np.int64)
        s = int(_ilog_micro(cv + _LM_V).sum() - _ilog_micro(bv + 1).sum())
        out.append((int(did), len(ch), s, s // len(ch)))
    return out


def dsir_logweight(ds: "ray.data.Dataset", target_col: str = "is_target",
                   num_buckets=None) -> "ray.data.Dataset":
    """DSIR importance log-weights (Xie et al. 2023, arXiv:2302.03169):
    score every raw document by how target-like its hashed unigram
    distribution is — log w(d) = Σ_tokens [ln p_target(h) − ln p_raw(h)]
    under add-one-smoothed hashed-vocab unigram LMs fit on the target
    slice vs the whole corpus. Sampling ∝ w(d) is DSIR's data-selection
    step (the weighted_sample_n operator composes downstream). Input needs
    doc_id, text and an int64 0/1 ``target_col``; output is
    (doc_id, n_tokens, logw_micro) in exact int64 micro-nats.

    Scale shape: the per-token term needs the target and raw corpus count
    of the SAME hash in the same place, so ONE bucketed exchange carries
    (doc_id, h, cnt, tgt_cnt) cells; each bucket computes both counts and
    the per-doc partial log-ratio sums in one sorted segment-sum pass
    (bigram_surprisal's plan), and per-doc partials merge with a bucketed
    sum. The two global token totals (Nt, Nr) are a two-scalar driver
    aggregate over the merged narrow table — the only driver-side data —
    applied in a final vectorized map. Quantize-once logs (_ilog_micro)
    keep everything downstream exact int64, so the single-process twin
    matches bit-for-bit."""
    from ..sharding import auto_buckets, bucket_of_ints
    from .agg import bucketed_group_sum

    nb = num_buckets or auto_buckets(None)

    def emit(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        tgt = batch[target_col].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        split, _ = _tokens_list(
            pc.utf8_lower(batch["text"].combine_chunks()))
        lens = pc.list_value_length(split) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        flat = np.asarray(split.flatten().to_numpy(zero_copy_only=False),
                          dtype=object)
        doc_of = np.repeat(np.arange(len(ids), dtype=np.int64), lens)
        # an empty-trim doc splits to [""]; that token is not a feature
        keep = flat != ""
        flat, doc_of = flat[keep], doc_of[keep]
        hs = _token_hashes(flat).view(np.int64)
        t = pa.table({
            "doc_id": pa.array(ids[doc_of], pa.int64()),
            "h": pa.array(hs, pa.int64()),
            "tgt": pa.array(tgt[doc_of], pa.int64())}) \
            .group_by(["doc_id", "h", "tgt"]).aggregate([([], "count_all")])
        cnt = pc.cast(t["count_all"], pa.int64())
        h64 = t["h"].to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": t["doc_id"], "h": t["h"], "cnt": cnt,
            "tgt_cnt": pc.multiply(t["tgt"], cnt),
            "pkey": pa.array(bucket_of_ints(h64, nb), pa.int64())})

    def per_bucket(g: pa.Table) -> pa.Table:
        t = g.select(["doc_id", "h", "cnt", "tgt_cnt"]) \
            .group_by(["doc_id", "h"]) \
            .aggregate([("cnt", "sum"), ("tgt_cnt", "sum")])
        did = t["doc_id"].to_numpy(zero_copy_only=False)
        h = t["h"].to_numpy(zero_copy_only=False)
        cnt = t["cnt_sum"].to_numpy(zero_copy_only=False).astype(np.int64)
        tc = t["tgt_cnt_sum"].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(h) == 0:
            z = pa.array([], pa.int64())
            return pa.table({"doc_id": z, "n_tokens": z,
                             "tgt_tokens": z, "lw_part": z})
        order = np.argsort(h, kind="stable")
        did, h, cnt, tc = did[order], h[order], cnt[order], tc[order]
        new_h = np.empty(len(h), dtype=bool)
        new_h[0] = True
        new_h[1:] = h[1:] != h[:-1]
        starts = np.flatnonzero(new_h)
        seg = np.cumsum(new_h) - 1
        cr = np.add.reduceat(cnt, starts)[seg]   # raw corpus count per h
        ct = np.add.reduceat(tc, starts)[seg]    # target corpus count
        lw = cnt * (_ilog_micro(ct + 1) - _ilog_micro(cr + 1))
        part = pa.table({
            "doc_id": pa.array(did, pa.int64()),
            "n_tokens": pa.array(cnt, pa.int64()),
            "tgt_tokens": pa.array(tc, pa.int64()),
            "lw_part": pa.array(lw, pa.int64()),
        }).group_by("doc_id").aggregate(
            [("n_tokens", "sum"), ("tgt_tokens", "sum"), ("lw_part", "sum")])
        return pa.table({
            "doc_id": part["doc_id"],
            "n_tokens": pc.cast(part["n_tokens_sum"], pa.int64()),
            "tgt_tokens": pc.cast(part["tgt_tokens_sum"], pa.int64()),
            "lw_part": pc.cast(part["lw_part_sum"], pa.int64())})

    partials = ds.map_batches(emit, batch_format="pyarrow") \
        .groupby("pkey").map_groups(per_bucket, batch_format="pyarrow")
    merged = bucketed_group_sum(
        partials, "doc_id", ["n_tokens", "tgt_tokens", "lw_part"]) \
        .materialize()

    totals = merged.sum(["n_tokens", "tgt_tokens"])
    nr = int(totals["sum(n_tokens)"])
    nt = int(totals["sum(tgt_tokens)"])
    norm = int(_ilog_micro(np.array([nr + _LM_V]))[0]) - \
        int(_ilog_micro(np.array([nt + _LM_V]))[0])

    def final(b: pa.Table) -> pa.Table:
        n = b["n_tokens"].to_numpy(zero_copy_only=False)
        lw = b["lw_part"].to_numpy(zero_copy_only=False) + n * norm
        return pa.table({
            "doc_id": b["doc_id"],
            "n_tokens": b["n_tokens"],
            "logw_micro": pa.array(lw, pa.int64())})

    return merged.map_batches(final, batch_format="pyarrow")


def dsir_logweight_reference(doc_ids: List[int], texts: List[str],
                             targets: List[int]) -> List[tuple]:
    """Single-process twin of dsir_logweight: plain re tokenization, dict
    counts for the target and raw unigram LMs, one scoring loop — the
    oracle-dump side."""
    import re

    raw: dict = {}
    tgt: dict = {}
    per_doc = []
    nr = nt = 0
    for did, text, is_t in zip(doc_ids, texts, targets):
        toks = [t for t in re.split(
            r"\s+", re.sub(r"^\s+|\s+$", "", text.lower())) if t != ""]
        th = _token_hashes(np.asarray(toks, dtype=object)).view(np.int64)
        for v in th:
            raw[int(v)] = raw.get(int(v), 0) + 1
            if is_t:
                tgt[int(v)] = tgt.get(int(v), 0) + 1
        nr += len(th)
        if is_t:
            nt += len(th)
        per_doc.append((did, th))
    norm = int(_ilog_micro(np.array([nr + _LM_V]))[0]) - \
        int(_ilog_micro(np.array([nt + _LM_V]))[0])
    out = []
    for did, th in per_doc:
        if len(th) == 0:
            continue
        ct = np.array([tgt.get(int(v), 0) for v in th], np.int64)
        cr = np.array([raw[int(v)] for v in th], np.int64)
        s = int((_ilog_micro(ct + 1) - _ilog_micro(cr + 1)).sum())
        out.append((int(did), len(th), s + len(th) * norm))
    return out


def chunk_text_batch(batch: pa.Table, chunk_tokens: int = 64,
                     stride: int = 48) -> pa.Table:
    """Sliding token-window chunking (the RAG / context-window prep step):
    each doc's whitespace tokens are cut into windows of ``chunk_tokens``
    starting every ``stride`` tokens (overlap = chunk_tokens - stride); a
    window is emitted while its start lies inside the doc, so tails may be
    short. Output one row per (doc, chunk): doc_id, chunk_id, chunk_text
    (tokens re-joined with single spaces), n_tokens.

    Stateless and embarrassingly parallel — no shuffle at any scale. The
    kernel is vectorized over the CHUNK INDEX: ceil(max_tokens/stride)
    iterations of whole-column Arrow list_slice + binary_join, never a
    per-doc Python loop."""
    ids = batch["doc_id"]
    split, empty = _tokens_list(batch["text"].combine_chunks())
    n = pc.list_value_length(split).to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    n = np.where(empty.to_numpy(zero_copy_only=False), 0, n)
    parts = []
    max_n = int(n.max()) if len(n) else 0
    k = 0
    while k * stride < max_n:
        start = k * stride
        mask = n > start
        if mask.any():
            sel = pa.array(mask)
            txt = pc.binary_join(
                pc.list_slice(split.filter(sel), start,
                              start + chunk_tokens), " ")
            nt = np.minimum(n[mask] - start, chunk_tokens)
            parts.append(pa.table({
                "doc_id": ids.filter(sel),
                "chunk_id": pa.array(
                    np.full(int(mask.sum()), k, np.int64), pa.int64()),
                "chunk_text": txt,
                "n_tokens": pa.array(nt, pa.int64())}))
        k += 1
    if not parts:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "chunk_id": pa.array([], pa.int64()),
                         "chunk_text": pa.array([], pa.string()),
                         "n_tokens": pa.array([], pa.int64())})
    return pa.concat_tables(parts)


def compression_ratio_batch(batch: pa.Table, level: int = 6) -> pa.Table:
    """Deflate-compressibility quality signal (the cheap perplexity proxy
    web pipelines use to flag template/boilerplate text — highly
    compressible — and binary junk — incompressible): per doc the utf-8
    byte length and the zlib(level) compressed length, as raw integers so
    the consumer thresholds exactly (no float ratio). Deterministic for a
    fixed zlib level; stateless, zero shuffle."""
    import zlib

    raw = [(t or "").encode("utf-8")
           for t in batch["text"].to_pylist()]
    return pa.table({
        "doc_id": batch["doc_id"],
        "raw_len": pa.array([len(b) for b in raw], pa.int64()),
        "comp_len": pa.array([len(zlib.compress(b, level)) for b in raw],
                             pa.int64()),
    })


def nfc_normalize_batch(batch: pa.Table) -> pa.Table:
    """Unicode NFC normalization (canonical composition — the standard
    pre-tokenization step so 'e'+combining-acute and precomposed 'é' hash
    identically downstream). Matches DuckDB ``nfc_normalize`` (probed on
    composed/decomposed/ligature cases). Stateless, zero shuffle; already-
    normalized text short-circuits via unicodedata.is_normalized."""
    import unicodedata

    out = []
    for t in batch["text"].to_pylist():
        t = t or ""
        out.append(t if unicodedata.is_normalized("NFC", t)
                   else unicodedata.normalize("NFC", t))
    return pa.table({"doc_id": batch["doc_id"],
                     "nfc_text": pa.array(out, pa.string())})


def phrase_count_batch(batch: pa.Table, phrase: List[str]) -> pa.Table:
    """(doc_id, n_matches): occurrences of the exact token phrase per doc.

    Vectorized across the batch: all docs' tokens are flattened into ONE
    object array; each phrase position is a shifted elementwise equality,
    AND-ed together; matches whose window crosses a document boundary are
    masked; per-doc counts come from one reduceat over the segment starts.
    The positional scan is the map side of phrase search — at corpus scale
    it composes with ``inverted_index`` to prune candidate docs first.
    """
    p = len(phrase)
    split, empty = _tokens_list(batch["text"].combine_chunks())
    counts_per_doc = pc.list_value_length(split).to_numpy(
        zero_copy_only=False).astype(np.int64)
    counts_per_doc[np.asarray(empty.to_pylist())] = 0
    flat_vals = []
    for toks, e in zip(split.to_pylist(), empty.to_pylist()):
        if not e and toks:
            flat_vals.extend(toks)
    flat = np.asarray(flat_vals, dtype=object)
    n = len(flat)
    n_matches = np.zeros(len(counts_per_doc), np.int64)
    if n >= p:
        m = flat[: n - p + 1] == phrase[0]
        for j in range(1, p):
            m &= flat[j: n - p + 1 + j] == phrase[j]
        # mask windows crossing a doc boundary: window at flat position i
        # belongs to the doc owning i AND i+p-1
        starts = np.zeros(len(counts_per_doc) + 1, np.int64)
        np.cumsum(counts_per_doc, out=starts[1:])
        doc_of = np.repeat(np.arange(len(counts_per_doc)), counts_per_doc)
        valid = doc_of[: n - p + 1] == doc_of[p - 1:]
        m &= valid
        hits = np.flatnonzero(m)
        if len(hits):
            np.add.at(n_matches, doc_of[hits], 1)
    return pa.table({
        "doc_id": batch["doc_id"],
        "n_matches": pa.array(n_matches, pa.int64()),
    })


_LOG04_MICRO = int(np.round(1e6 * np.log(0.4)))  # one backoff step, micro-nats


def _count_lookup(keys: np.ndarray, cnts: np.ndarray,
                  q: np.ndarray) -> np.ndarray:
    """Vectorized sorted-array count lookup; missing keys -> 0."""
    if len(keys) == 0 or len(q) == 0:
        return np.zeros(len(q), np.int64)
    pos = np.clip(np.searchsorted(keys, q), 0, len(keys) - 1)
    return np.where(keys[pos] == q, cnts[pos], 0).astype(np.int64)


def trigram_backoff(ds: "ray.data.Dataset", train_col: str = "is_train",
                    num_buckets=None) -> "ray.data.Dataset":
    """Trigram stupid-backoff surprisal per document — the CCNet-style LM
    quality filter (Wenzek et al. 2020) with the LM of Brants et al. 2007
    ("Large Language Models in Machine Translation"): a trigram model fit
    on the ``train_col``-flagged reference slice scores EVERY document,

        S(w|u,v) = c(uvw)/c(uv)            if c(uvw) > 0
                 = 0.4 * c(vw)/c(v)        elif c(vw) > 0
                 = 0.4^2 * (c(w)+1)/(N+V)  otherwise (add-one unigram),

    reported per doc as exact int64 micro-nat surprisal totals plus the
    floor-div mean. Unlike self-trained LMs (where every trigram has
    count >= 1 and backoff is dead code), the reference-slice split makes
    the backoff chain real for out-of-slice text — high mean surprisal =
    text the reference LM finds improbable.

    Scale shape: two bucketed exchanges over one tokenization pass.
    Per-occurrence rows (collapsed to one row per distinct (doc, trigram)
    with a count) first visit bucket(h(w)) to resolve the unigram-fallback
    term, then bucket(h(v)) — where v is the middle/context word — which
    by construction co-locates ALL four remaining lookups: c(uvw) routed
    by its middle word, c(uv) by its second, c(vw) by its first and c(v)
    by itself. Count cells are combiner-aggregated per batch and never
    materialize as a joined table; the unigram cells serve BOTH exchanges
    (same bucket key), and N rides in as one driver scalar (the knn_int8
    maxabs pattern). At production scale the unified pass-through stream
    would split into a cell stream and an occurrence stream; the unified
    schema here keeps it one shuffle graph.
    """
    from ..sharding import auto_buckets, bucket_of_ints
    from .agg import bucketed_group_sum

    nb = num_buckets or auto_buckets(None)

    def count_train(batch: pa.Table) -> pa.Table:
        split, _ = _tokens_list(
            pc.utf8_lower(batch["text"].combine_chunks()))
        lens = pc.list_value_length(split) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        tr = batch[train_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"n": pa.array([int((lens * tr).sum())], pa.int64())})

    n_train = int(ds.map_batches(
        count_train, batch_format="pyarrow").sum("n") or 0)
    ilog_nv = int(_ilog_micro(np.array([n_train + _LM_V]))[0])

    Z = np.empty(0, np.int64)

    def _unified(role, doc_id, h_tri, h_bictx, h_bi, h_unictx, h_uni,
                 kind, h, cnt, pkey) -> pa.Table:
        return pa.table({
            "role": pa.array(role, pa.int64()),
            "doc_id": pa.array(doc_id, pa.int64()),
            "h_tri": pa.array(h_tri, pa.int64()),
            "h_bictx": pa.array(h_bictx, pa.int64()),
            "h_bi": pa.array(h_bi, pa.int64()),
            "h_unictx": pa.array(h_unictx, pa.int64()),
            "h_uni": pa.array(h_uni, pa.int64()),
            "kind": pa.array(kind, pa.int64()),
            "h": pa.array(h, pa.int64()),
            "cnt": pa.array(cnt, pa.int64()),
            "pkey": pa.array(pkey, pa.int64())})

    def _agg_cells(kind: int, h: np.ndarray, route: np.ndarray):
        """Per-batch combiner: distinct (h, route) with counts."""
        if len(h) == 0:
            return Z, Z, Z
        order = np.lexsort((route, h))
        h, route = h[order], route[order]
        new = np.empty(len(h), bool)
        new[0] = True
        new[1:] = (h[1:] != h[:-1]) | (route[1:] != route[:-1])
        starts = np.flatnonzero(new)
        cnt = np.diff(np.append(starts, len(h)))
        return h[starts], route[starts], cnt.astype(np.int64)

    def emit(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        tr = batch[train_col].to_numpy(zero_copy_only=False).astype(np.int64)
        split, _ = _tokens_list(
            pc.utf8_lower(batch["text"].combine_chunks()))
        lens = pc.list_value_length(split) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        flat = split.flatten().to_numpy(zero_copy_only=False)
        th = _token_hashes(np.asarray(flat, dtype=object))
        doc_of = np.repeat(np.arange(len(ids), dtype=np.int64), lens)
        th64 = th.view(np.int64)
        sh2 = shingle_hashes(th, 2).view(np.int64)
        sh3 = shingle_hashes(th, 3).view(np.int64)
        v2 = (doc_of[:-1] == doc_of[1:]) if len(th) >= 2 \
            else np.empty(0, bool)
        v3 = (doc_of[:-2] == doc_of[2:]) if len(th) >= 3 \
            else np.empty(0, bool)
        tr_pos = tr[doc_of] == 1

        tabs = []
        # occurrence rows (ALL docs), one per distinct (doc, trigram)
        p3 = np.flatnonzero(v3)
        if len(p3):
            occ = pa.table({
                "doc_id": pa.array(ids[doc_of[p3]], pa.int64()),
                "h_tri": pa.array(sh3[p3], pa.int64()),
                "h_bictx": pa.array(sh2[p3], pa.int64()),
                "h_bi": pa.array(sh2[p3 + 1], pa.int64()),
                "h_unictx": pa.array(th64[p3 + 1], pa.int64()),
                "h_uni": pa.array(th64[p3 + 2], pa.int64()),
            }).group_by(["doc_id", "h_tri"]).aggregate(
                [("h_bictx", "min"), ("h_bi", "min"),
                 ("h_unictx", "min"), ("h_uni", "min"),
                 ([], "count_all")])
            n = occ.num_rows
            uni = occ["h_uni_min"].to_numpy(zero_copy_only=False)
            z = np.zeros(n, np.int64)
            tabs.append(_unified(
                z, occ["doc_id"].to_numpy(zero_copy_only=False),
                occ["h_tri"].to_numpy(zero_copy_only=False),
                occ["h_bictx_min"].to_numpy(zero_copy_only=False),
                occ["h_bi_min"].to_numpy(zero_copy_only=False),
                occ["h_unictx_min"].to_numpy(zero_copy_only=False),
                uni, z, z,
                occ["count_all"].to_numpy(zero_copy_only=False)
                .astype(np.int64),
                bucket_of_ints(uni, nb)))

        # train count cells, combiner-aggregated per batch:
        # kind 0 trigram (route = middle word), 1 bigram-as-context
        # (route = second word), 2 bigram-as-predictor (route = first
        # word), 3 unigram (route = itself; serves BOTH exchanges)
        t3 = np.flatnonzero(v3 & tr_pos[:-2] if len(v3) else v3)
        t2 = np.flatnonzero(v2 & tr_pos[:-1] if len(v2) else v2)
        tu = np.flatnonzero(tr_pos)
        for kind, hh, route in (
                (0, sh3[t3], th64[t3 + 1]),
                (1, sh2[t2], th64[t2 + 1]),
                (2, sh2[t2], th64[t2]),
                (3, th64[tu], th64[tu])):
            h_k, r_k, c_k = _agg_cells(kind, hh, route)
            if len(h_k):
                n = len(h_k)
                z = np.zeros(n, np.int64)
                tabs.append(_unified(
                    np.ones(n, np.int64), z, z, z, z, z, z,
                    np.full(n, kind, np.int64), h_k, c_k,
                    bucket_of_ints(r_k, nb)))
        if not tabs:
            return _unified(Z, Z, Z, Z, Z, Z, Z, Z, Z, Z, Z)
        return pa.concat_tables(tabs)

    def _kind_map(g: pa.Table, want: int):
        roles = g["role"].to_numpy(zero_copy_only=False)
        kinds = g["kind"].to_numpy(zero_copy_only=False)
        m = (roles == 1) & (kinds == want)
        h = g["h"].to_numpy(zero_copy_only=False)[m]
        c = g["cnt"].to_numpy(zero_copy_only=False)[m]
        if len(h) == 0:
            return Z, Z
        order = np.argsort(h)
        h, c = h[order], c[order]
        new = np.empty(len(h), bool)
        new[0] = True
        new[1:] = h[1:] != h[:-1]
        starts = np.flatnonzero(new)
        return h[starts], np.add.reduceat(c, starts)

    def resolve_uni(g: pa.Table) -> pa.Table:
        g = g.combine_chunks()
        uk, uc = _kind_map(g, 3)
        roles = g["role"].to_numpy(zero_copy_only=False)
        occ = g.filter(pa.array(roles == 0))
        cells = g.filter(pa.array(roles == 1))
        if occ.num_rows:
            h_uni = occ["h_uni"].to_numpy(zero_copy_only=False)
            c_uni = _count_lookup(uk, uc, h_uni)
            uni_micro = _ilog_micro(c_uni + 1)
            h_ctx = occ["h_unictx"].to_numpy(zero_copy_only=False)
            occ = occ.set_column(
                occ.schema.get_field_index("h_uni"), "h_uni",
                pa.array(uni_micro, pa.int64()))
            occ = occ.set_column(
                occ.schema.get_field_index("pkey"), "pkey",
                pa.array(bucket_of_ints(h_ctx, nb), pa.int64()))
        return pa.concat_tables([occ, cells])

    def score(g: pa.Table) -> pa.Table:
        g = g.combine_chunks()
        roles = g["role"].to_numpy(zero_copy_only=False)
        occ = g.filter(pa.array(roles == 0))
        if occ.num_rows == 0:
            return pa.table({"doc_id": pa.array(Z, pa.int64()),
                             "n_scored": pa.array(Z, pa.int64()),
                             "surp_micro": pa.array(Z, pa.int64())})
        c_tri = _count_lookup(*_kind_map(g, 0),
                              occ["h_tri"].to_numpy(zero_copy_only=False))
        c_bictx = _count_lookup(*_kind_map(g, 1),
                                occ["h_bictx"]
                                .to_numpy(zero_copy_only=False))
        c_bi = _count_lookup(*_kind_map(g, 2),
                             occ["h_bi"].to_numpy(zero_copy_only=False))
        c_uctx = _count_lookup(*_kind_map(g, 3),
                               occ["h_unictx"]
                               .to_numpy(zero_copy_only=False))
        uni_micro = occ["h_uni"].to_numpy(zero_copy_only=False)
        s_tri = _ilog_micro(np.maximum(c_bictx, 1)) \
            - _ilog_micro(np.maximum(c_tri, 1))
        s_bi = -_LOG04_MICRO + _ilog_micro(np.maximum(c_uctx, 1)) \
            - _ilog_micro(np.maximum(c_bi, 1))
        s_uni = -2 * _LOG04_MICRO + ilog_nv - uni_micro
        s = np.where(c_tri > 0, s_tri, np.where(c_bi > 0, s_bi, s_uni))
        cnt = occ["cnt"].to_numpy(zero_copy_only=False)
        did = occ["doc_id"].to_numpy(zero_copy_only=False)
        part = pa.table({
            "doc_id": pa.array(did, pa.int64()),
            "n_scored": pa.array(cnt, pa.int64()),
            "surp_micro": pa.array(cnt * s, pa.int64()),
        }).group_by("doc_id").aggregate(
            [("n_scored", "sum"), ("surp_micro", "sum")])
        return pa.table({
            "doc_id": part["doc_id"],
            "n_scored": pc.cast(part["n_scored_sum"], pa.int64()),
            "surp_micro": pc.cast(part["surp_micro_sum"], pa.int64())})

    def final(b: pa.Table) -> pa.Table:
        n = b["n_scored"].to_numpy(zero_copy_only=False)
        s = b["surp_micro"].to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": b["doc_id"],
            "n_scored": b["n_scored"],
            "surp_micro": b["surp_micro"],
            "mean_surp_micro": pa.array(s // n, pa.int64())})

    partials = ds.map_batches(emit, batch_format="pyarrow") \
        .groupby("pkey").map_groups(resolve_uni, batch_format="pyarrow") \
        .groupby("pkey").map_groups(score, batch_format="pyarrow")
    return bucketed_group_sum(partials, "doc_id",
                              ["n_scored", "surp_micro"]) \
        .map_batches(final, batch_format="pyarrow")


def trigram_backoff_reference(doc_ids: List[int], texts: List[str],
                              trains: List[int]) -> List[tuple]:
    """Single-process twin of trigram_backoff: plain re tokenization, dict
    n-gram counts from the train slice, one scoring loop over every doc's
    trigram positions — no Ray, no bucketed exchanges. The oracle-dump
    side; shares only the pure hash/quantize kernels."""
    import re

    tri: dict = {}
    big: dict = {}
    uni: dict = {}
    n_train = 0
    hashed = []
    for did, text, is_t in zip(doc_ids, texts, trains):
        toks = re.split(r"\s+", re.sub(r"^\s+|\s+$", "", text.lower()))
        th = _token_hashes(np.asarray(toks, dtype=object))
        h3 = shingle_hashes(th, 3).view(np.int64)
        h2 = shingle_hashes(th, 2).view(np.int64)
        h1 = th.view(np.int64)
        hashed.append((did, h3, h2, h1))
        if is_t:
            n_train += len(h1)
            for v in h3:
                tri[int(v)] = tri.get(int(v), 0) + 1
            for v in h2:
                big[int(v)] = big.get(int(v), 0) + 1
            for v in h1:
                uni[int(v)] = uni.get(int(v), 0) + 1
    ilog_nv = int(_ilog_micro(np.array([n_train + _LM_V]))[0])

    def il(c: int) -> int:
        return int(_ilog_micro(np.array([c]))[0])

    out = []
    for did, h3, h2, h1 in hashed:
        if len(h3) == 0:
            continue
        total = 0
        for p in range(len(h3)):
            c_tri = tri.get(int(h3[p]), 0)
            if c_tri > 0:
                s = il(big.get(int(h2[p]), 0)) - il(c_tri)
            else:
                c_bi = big.get(int(h2[p + 1]), 0)
                if c_bi > 0:
                    s = -_LOG04_MICRO + il(uni.get(int(h1[p + 1]), 0)) \
                        - il(c_bi)
                else:
                    s = -2 * _LOG04_MICRO + ilog_nv \
                        - il(uni.get(int(h1[p + 2]), 0) + 1)
            total += s
        out.append((int(did), len(h3), total, total // len(h3)))
    return out


# --- interpolated Kneser-Ney trigram LM (KenLM/CCNet-standard smoothing) ---

_KN_D = 0.75  # fixed absolute discount (Chen & Goodman 1999 default) —
#               parameter-free and deterministic at any scale; estimated
#               discounts would need count-of-count global passes


def kn_surprisal_micro(c3, c2ctx, t_uv, t_vw, t_vmid, t_vdot, n_w,
                       nbb: int, V: int = _LM_V) -> np.ndarray:
    """Per-position interpolated Kneser-Ney surprisal in int64 micro-nats
    — the ONE shared pure kernel both the distributed operator and the
    single-process twin call with identical integer stats, so float
    arithmetic happens exactly once per position in one fixed expression
    order:

        p1 = (N1+(.w) + 1) / (N1+(..) + V)          (add-one floor)
        p2 = (max(N1+(.vw)-D, 0) + D*N1+(v.)*p1) / N1+(.v.)   [p1 if 0]
        p3 = (max(c(uvw)-D, 0) + D*N1+(uv.)*p2) / c(uv)       [p2 if 0]
        surprisal = round(-1e6 * ln(p3))

    All inputs are exact int64 counts; p3 > 0 always (p1 > 0, and a
    nonzero c(uv) implies N1+(uv.) >= 1)."""
    D = _KN_D
    c3 = np.asarray(c3, np.float64)
    c2ctx = np.asarray(c2ctx, np.float64)
    t_uv = np.asarray(t_uv, np.float64)
    t_vw = np.asarray(t_vw, np.float64)
    t_vmid = np.asarray(t_vmid, np.float64)
    t_vdot = np.asarray(t_vdot, np.float64)
    n_w = np.asarray(n_w, np.float64)
    p1 = (n_w + 1.0) / (float(nbb) + float(V))
    p2 = np.where(t_vmid > 0,
                  (np.maximum(t_vw - D, 0.0) + D * t_vdot * p1)
                  / np.maximum(t_vmid, 1.0),
                  p1)
    # trigram level is usable only when the context has at least one
    # CONTINUATION type (t_uv > 0); a bigram seen only at a train
    # document's tail has c2ctx > 0 but no continuation — interpolating
    # there would yield p3 = 0 (log-inf). c3 > 0 implies t_uv >= 1, so
    # the guard loses nothing.
    p3 = np.where((c2ctx > 0) & (t_uv > 0),
                  (np.maximum(c3 - D, 0.0) + D * t_uv * p2)
                  / np.maximum(c2ctx, 1.0),
                  p2)
    return np.round(-1e6 * np.log(p3)).astype(np.int64)


def kn_trigram(ds: "ray.data.Dataset", train_col: str = "is_train",
               num_buckets=None) -> "ray.data.Dataset":
    """Interpolated Kneser-Ney trigram surprisal per document — the
    smoothing KenLM implements and CCNet's perplexity filter actually
    uses (Wenzek et al. 2020 build their filter on KenLM 5-gram models;
    Kneser & Ney 1995; Chen & Goodman 1999), fit on the
    ``train_col``-flagged reference slice, scoring EVERY document.

    Unlike stupid backoff (trigram_backoff), KN interpolates all orders
    at every position and its lower orders use CONTINUATION counts
    (how many distinct contexts a gram completes), not raw counts —
    which requires distinct-type statistics that are NOT sum-mergeable
    across batches. The scale shape therefore adds one type-dedup
    exchange in front:

      1. type dedup: distinct trigram types (bucketed on h(trigram)) and
         distinct bigram types (bucketed on h(bigram)) from the train
         slice; each surviving type emits +1 cells for the five
         continuation stats, now sum-mergeable. The cell table is
         vocab-bounded and materialized ONCE; N1+(..) — the global
         distinct-bigram-type count — is one driver scalar summed off it
         (the knn_int8 maxabs pattern).
      2. resolve hop at bucket(h(w)): occurrences pick up N1+(.w).
      3. score hop at bucket(h(v)): c(uvw), c(uv), N1+(uv.), N1+(.vw),
         N1+(.v.), N1+(v.) ALL co-locate at the middle word's bucket by
         routing construction; the shared kernel scores every position
         vectorized, partials sum per doc.

    Occurrence rows are one per distinct (doc, trigram) with a count;
    count cells are combiner-aggregated per batch; text never rides an
    exchange. Output: (doc_id, n_scored, kn_surp_micro, mean_kn_micro),
    exact int64 micro-nats."""
    from ..sharding import auto_buckets, bucket_of_ints
    from .agg import bucketed_group_sum

    nb = num_buckets or auto_buckets(None)
    Z = np.empty(0, np.int64)

    def _uni(role, doc_id, h_tri, h_bictx, h_bi, h_v, h_w, kind, h, cnt,
             pkey) -> pa.Table:
        return pa.table({
            "role": pa.array(role, pa.int64()),
            "doc_id": pa.array(doc_id, pa.int64()),
            "h_tri": pa.array(h_tri, pa.int64()),
            "h_bictx": pa.array(h_bictx, pa.int64()),
            "h_bi": pa.array(h_bi, pa.int64()),
            "h_v": pa.array(h_v, pa.int64()),
            "h_w": pa.array(h_w, pa.int64()),
            "kind": pa.array(kind, pa.int64()),
            "h": pa.array(h, pa.int64()),
            "cnt": pa.array(cnt, pa.int64()),
            "pkey": pa.array(pkey, pa.int64())})

    def _empty() -> pa.Table:
        return _uni(Z, Z, Z, Z, Z, Z, Z, Z, Z, Z, Z)

    def _hash_streams(batch: pa.Table):
        ids = batch["doc_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        tr = batch[train_col].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        split, _ = _tokens_list(
            pc.utf8_lower(batch["text"].combine_chunks()))
        lens = pc.list_value_length(split) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        flat = split.flatten().to_numpy(zero_copy_only=False)
        th = _token_hashes(np.asarray(flat, dtype=object))
        doc_of = np.repeat(np.arange(len(ids), dtype=np.int64), lens)
        th64 = th.view(np.int64)
        sh2 = shingle_hashes(th, 2).view(np.int64)
        sh3 = shingle_hashes(th, 3).view(np.int64)
        v2 = (doc_of[:-1] == doc_of[1:]) if len(th) >= 2 \
            else np.empty(0, bool)
        v3 = (doc_of[:-2] == doc_of[2:]) if len(th) >= 3 \
            else np.empty(0, bool)
        tr_pos = tr[doc_of] == 1
        return ids, doc_of, th64, sh2, sh3, v2, v3, tr_pos

    def _batch_distinct(h: np.ndarray, *companions):
        """Distinct h with companion fields (identical per h) — the
        per-batch combiner in front of the type-dedup exchange."""
        if len(h) == 0:
            return (Z,) + tuple(Z for _ in companions)
        order = np.argsort(h)
        h = h[order]
        new = np.empty(len(h), bool)
        new[0] = True
        new[1:] = h[1:] != h[:-1]
        keep = order[new]
        return (h[new],) + tuple(c[keep] for c in companions)

    def emit_types(batch: pa.Table) -> pa.Table:
        (_, _, th64, sh2, sh3, v2, v3, tr_pos) = _hash_streams(batch)
        tabs = []
        p3 = np.flatnonzero(v3 & tr_pos[:-2]) if len(v3) else Z
        if len(p3):
            h3, h2c, h2p, hv = _batch_distinct(
                sh3[p3], sh2[p3], sh2[p3 + 1], th64[p3 + 1])
            n = len(h3)
            z = np.zeros(n, np.int64)
            tabs.append(_uni(
                np.full(n, 2, np.int64), z, h3, h2c, h2p, hv, z, z, z,
                np.ones(n, np.int64), bucket_of_ints(h3, nb)))
        p2 = np.flatnonzero(v2 & tr_pos[:-1]) if len(v2) else Z
        if len(p2):
            h2, hf, hs = _batch_distinct(sh2[p2], th64[p2], th64[p2 + 1])
            n = len(h2)
            z = np.zeros(n, np.int64)
            tabs.append(_uni(
                np.full(n, 3, np.int64), z, z, z, h2, hf, hs, z, z,
                np.ones(n, np.int64), bucket_of_ints(h2, nb)))
        return pa.concat_tables(tabs) if tabs else _empty()

    def dedup_types(g: pa.Table) -> pa.Table:
        """Global type dedup inside the bucket; each surviving type emits
        +1 continuation cells, pre-summed per key before leaving."""
        g = g.combine_chunks()
        roles = g["role"].to_numpy(zero_copy_only=False)
        tabs = []

        def _cells(kind: int, keys: np.ndarray, routes: np.ndarray):
            if len(keys) == 0:
                return
            order = np.lexsort((routes, keys))
            k, r = keys[order], routes[order]
            new = np.empty(len(k), bool)
            new[0] = True
            new[1:] = (k[1:] != k[:-1]) | (r[1:] != r[:-1])
            starts = np.flatnonzero(new)
            cnt = np.diff(np.append(starts, len(k))).astype(np.int64)
            n = len(starts)
            z = np.zeros(n, np.int64)
            tabs.append(_uni(
                np.ones(n, np.int64), z, z, z, z, z, z,
                np.full(n, kind, np.int64), k[starts], cnt,
                bucket_of_ints(r[starts], nb)))

        m3 = roles == 2
        if m3.any():
            h3 = g["h_tri"].to_numpy(zero_copy_only=False)[m3]
            h2c = g["h_bictx"].to_numpy(zero_copy_only=False)[m3]
            h2p = g["h_bi"].to_numpy(zero_copy_only=False)[m3]
            hv = g["h_v"].to_numpy(zero_copy_only=False)[m3]
            h3, h2c, h2p, hv = _batch_distinct(h3, h2c, h2p, hv)
            _cells(2, h2c, hv)   # N1+(uv.) keyed (u,v), routed v
            _cells(3, h2p, hv)   # N1+(.vw) keyed (v,w), routed v
            _cells(4, hv, hv)    # N1+(.v.) keyed v
        m2 = roles == 3
        if m2.any():
            h2 = g["h_bi"].to_numpy(zero_copy_only=False)[m2]
            hf = g["h_v"].to_numpy(zero_copy_only=False)[m2]
            hs = g["h_w"].to_numpy(zero_copy_only=False)[m2]
            h2, hf, hs = _batch_distinct(h2, hf, hs)
            _cells(5, hf, hf)    # N1+(v.) keyed v
            _cells(6, hs, hs)    # N1+(.w) keyed w
        return pa.concat_tables(tabs) if tabs else _empty()

    def emit_main(batch: pa.Table) -> pa.Table:
        (ids, doc_of, th64, sh2, sh3, v2, v3,
         tr_pos) = _hash_streams(batch)
        tabs = []
        p3 = np.flatnonzero(v3) if len(v3) else Z
        if len(p3):
            occ = pa.table({
                "doc_id": pa.array(ids[doc_of[p3]], pa.int64()),
                "h_tri": pa.array(sh3[p3], pa.int64()),
                "h_bictx": pa.array(sh2[p3], pa.int64()),
                "h_bi": pa.array(sh2[p3 + 1], pa.int64()),
                "h_v": pa.array(th64[p3 + 1], pa.int64()),
                "h_w": pa.array(th64[p3 + 2], pa.int64()),
            }).group_by(["doc_id", "h_tri"]).aggregate(
                [("h_bictx", "min"), ("h_bi", "min"), ("h_v", "min"),
                 ("h_w", "min"), ([], "count_all")])
            n = occ.num_rows
            hw = occ["h_w_min"].to_numpy(zero_copy_only=False)
            z = np.zeros(n, np.int64)
            tabs.append(_uni(
                z, occ["doc_id"].to_numpy(zero_copy_only=False),
                occ["h_tri"].to_numpy(zero_copy_only=False),
                occ["h_bictx_min"].to_numpy(zero_copy_only=False),
                occ["h_bi_min"].to_numpy(zero_copy_only=False),
                occ["h_v_min"].to_numpy(zero_copy_only=False),
                hw, z, z,
                occ["count_all"].to_numpy(zero_copy_only=False)
                .astype(np.int64),
                bucket_of_ints(hw, nb)))
        # raw count cells (train): kind 0 c(uvw) routed v, kind 1 c(uv)
        # routed v (its second word)
        t3 = np.flatnonzero(v3 & tr_pos[:-2]) if len(v3) else Z
        t2 = np.flatnonzero(v2 & tr_pos[:-1]) if len(v2) else Z
        for kind, hh, route in ((0, sh3[t3], th64[t3 + 1]),
                                (1, sh2[t2], th64[t2 + 1])):
            if len(hh) == 0:
                continue
            order = np.lexsort((route, hh))
            h_s, r_s = hh[order], route[order]
            new = np.empty(len(h_s), bool)
            new[0] = True
            new[1:] = (h_s[1:] != h_s[:-1]) | (r_s[1:] != r_s[:-1])
            starts = np.flatnonzero(new)
            cnt = np.diff(np.append(starts, len(h_s))).astype(np.int64)
            n = len(starts)
            z = np.zeros(n, np.int64)
            tabs.append(_uni(
                np.ones(n, np.int64), z, z, z, z, z, z,
                np.full(n, kind, np.int64), h_s[starts], cnt,
                bucket_of_ints(r_s[starts], nb)))
        return pa.concat_tables(tabs) if tabs else _empty()

    def _kind_map(g: pa.Table, want: int):
        roles = g["role"].to_numpy(zero_copy_only=False)
        kinds = g["kind"].to_numpy(zero_copy_only=False)
        m = (roles == 1) & (kinds == want)
        h = g["h"].to_numpy(zero_copy_only=False)[m]
        c = g["cnt"].to_numpy(zero_copy_only=False)[m]
        if len(h) == 0:
            return Z, Z
        order = np.argsort(h)
        h, c = h[order], c[order]
        new = np.empty(len(h), bool)
        new[0] = True
        new[1:] = h[1:] != h[:-1]
        starts = np.flatnonzero(new)
        return h[starts], np.add.reduceat(c, starts)

    def resolve_nw(g: pa.Table) -> pa.Table:
        g = g.combine_chunks()
        roles = g["role"].to_numpy(zero_copy_only=False)
        kinds = g["kind"].to_numpy(zero_copy_only=False)
        occ = g.filter(pa.array(roles == 0))
        cells = g.filter(pa.array((roles == 1) & (kinds != 6)))
        if occ.num_rows:
            wk, wc = _kind_map(g, 6)
            h_w = occ["h_w"].to_numpy(zero_copy_only=False)
            n_w = _count_lookup(wk, wc, h_w)
            h_v = occ["h_v"].to_numpy(zero_copy_only=False)
            occ = occ.set_column(
                occ.schema.get_field_index("h_w"), "h_w",
                pa.array(n_w, pa.int64()))
            occ = occ.set_column(
                occ.schema.get_field_index("pkey"), "pkey",
                pa.array(bucket_of_ints(h_v, nb), pa.int64()))
        return pa.concat_tables([occ, cells])

    def make_score(nbb: int):
        def score(g: pa.Table) -> pa.Table:
            g = g.combine_chunks()
            roles = g["role"].to_numpy(zero_copy_only=False)
            occ = g.filter(pa.array(roles == 0))
            if occ.num_rows == 0:
                return pa.table({
                    "doc_id": pa.array(Z, pa.int64()),
                    "n_scored": pa.array(Z, pa.int64()),
                    "kn_surp_micro": pa.array(Z, pa.int64())})
            c3 = _count_lookup(*_kind_map(g, 0),
                               occ["h_tri"]
                               .to_numpy(zero_copy_only=False))
            c2ctx = _count_lookup(*_kind_map(g, 1),
                                  occ["h_bictx"]
                                  .to_numpy(zero_copy_only=False))
            t_uv = _count_lookup(*_kind_map(g, 2),
                                 occ["h_bictx"]
                                 .to_numpy(zero_copy_only=False))
            t_vw = _count_lookup(*_kind_map(g, 3),
                                 occ["h_bi"]
                                 .to_numpy(zero_copy_only=False))
            t_vmid = _count_lookup(*_kind_map(g, 4),
                                   occ["h_v"]
                                   .to_numpy(zero_copy_only=False))
            t_vdot = _count_lookup(*_kind_map(g, 5),
                                   occ["h_v"]
                                   .to_numpy(zero_copy_only=False))
            n_w = occ["h_w"].to_numpy(zero_copy_only=False)
            s = kn_surprisal_micro(c3, c2ctx, t_uv, t_vw, t_vmid,
                                   t_vdot, n_w, nbb)
            cnt = occ["cnt"].to_numpy(zero_copy_only=False)
            did = occ["doc_id"].to_numpy(zero_copy_only=False)
            part = pa.table({
                "doc_id": pa.array(did, pa.int64()),
                "n_scored": pa.array(cnt, pa.int64()),
                "kn_surp_micro": pa.array(cnt * s, pa.int64()),
            }).group_by("doc_id").aggregate(
                [("n_scored", "sum"), ("kn_surp_micro", "sum")])
            return pa.table({
                "doc_id": part["doc_id"],
                "n_scored": pc.cast(part["n_scored_sum"], pa.int64()),
                "kn_surp_micro": pc.cast(part["kn_surp_micro_sum"],
                                         pa.int64())})
        return score

    def final(b: pa.Table) -> pa.Table:
        n = b["n_scored"].to_numpy(zero_copy_only=False)
        s = b["kn_surp_micro"].to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": b["doc_id"],
            "n_scored": b["n_scored"],
            "kn_surp_micro": b["kn_surp_micro"],
            "mean_kn_micro": pa.array(s // np.maximum(n, 1), pa.int64())})

    # the type pass only reads the train slice — push the filter into
    # the scan so non-train docs are never tokenized twice
    typed_cells = ds.filter(expr=f"{train_col} == 1") \
        .map_batches(emit_types, batch_format="pyarrow") \
        .groupby("pkey").map_groups(dedup_types, batch_format="pyarrow") \
        .materialize()

    def _nbb_part(b: pa.Table) -> pa.Table:
        kinds = b["kind"].to_numpy(zero_copy_only=False)
        cnts = b["cnt"].to_numpy(zero_copy_only=False)
        return pa.table({"n": pa.array(
            [int(cnts[kinds == 6].sum())], pa.int64())})

    nbb = int(typed_cells.map_batches(
        _nbb_part, batch_format="pyarrow").sum("n") or 0)

    partials = ds.map_batches(emit_main, batch_format="pyarrow") \
        .union(typed_cells) \
        .groupby("pkey").map_groups(resolve_nw, batch_format="pyarrow") \
        .groupby("pkey").map_groups(make_score(nbb),
                                    batch_format="pyarrow")
    return bucketed_group_sum(partials, "doc_id",
                              ["n_scored", "kn_surp_micro"]) \
        .map_batches(final, batch_format="pyarrow")


def kn_trigram_reference(doc_ids: List[int], texts: List[str],
                         trains: List[int]) -> List[tuple]:
    """Single-process twin of kn_trigram: plain re tokenization, dict/set
    n-gram type and count statistics from the train slice, one scoring
    loop over every doc's trigram positions — no Ray, no exchanges.
    Shares ONLY the pure hash and kn_surprisal_micro kernels."""
    import re

    tri: dict = {}
    bictx: dict = {}
    tri_types: dict = {}   # h3 -> (h2ctx, h2, hv)
    bi_types: dict = {}    # h2 -> (hfirst, hsecond)
    hashed = []
    for did, text, is_t in zip(doc_ids, texts, trains):
        toks = re.split(r"\s+", re.sub(r"^\s+|\s+$", "", (text or "").lower()))
        th = _token_hashes(np.asarray(toks, dtype=object))
        h3 = shingle_hashes(th, 3).view(np.int64)
        h2 = shingle_hashes(th, 2).view(np.int64)
        h1 = th.view(np.int64)
        hashed.append((did, h3, h2, h1))
        if is_t:
            for i in range(len(h3)):
                k = int(h3[i])
                tri[k] = tri.get(k, 0) + 1
                tri_types[k] = (int(h2[i]), int(h2[i + 1]),
                                int(h1[i + 1]))
            for i in range(len(h2)):
                k = int(h2[i])
                bictx[k] = bictx.get(k, 0) + 1
                bi_types[k] = (int(h1[i]), int(h1[i + 1]))
    t_uv: dict = {}
    t_vw: dict = {}
    t_vmid: dict = {}
    for h2c, h2p, hv in tri_types.values():
        t_uv[h2c] = t_uv.get(h2c, 0) + 1
        t_vw[h2p] = t_vw.get(h2p, 0) + 1
        t_vmid[hv] = t_vmid.get(hv, 0) + 1
    t_vdot: dict = {}
    n_w: dict = {}
    for hf, hs in bi_types.values():
        t_vdot[hf] = t_vdot.get(hf, 0) + 1
        n_w[hs] = n_w.get(hs, 0) + 1
    nbb = len(bi_types)

    out = []
    for did, h3, h2, h1 in hashed:
        if len(h3) == 0:
            continue  # no trigram positions -> no row (distributed parity)
        s = kn_surprisal_micro(
            np.array([tri.get(int(v), 0) for v in h3], np.int64),
            np.array([bictx.get(int(v), 0) for v in h2[:-1]], np.int64),
            np.array([t_uv.get(int(v), 0) for v in h2[:-1]], np.int64),
            np.array([t_vw.get(int(v), 0) for v in h2[1:]], np.int64),
            np.array([t_vmid.get(int(v), 0) for v in h1[1:-1]],
                     np.int64),
            np.array([t_vdot.get(int(v), 0) for v in h1[1:-1]],
                     np.int64),
            np.array([n_w.get(int(v), 0) for v in h1[2:]], np.int64),
            nbb)
        tot = int(s.sum())
        out.append((did, len(h3), tot, tot // len(h3)))
    return out


def blocklist_scan(ds: "ray.data.Dataset",
                   phrases: List[str]) -> "ray.data.Dataset":
    """C4-style banned-word/phrase page filter (Raffel et al. 2020 drop
    pages containing any blocklisted word; RefinedWeb/FineWeb keep the
    same gate): token-boundary phrase matching over whitespace-normalized
    lowered text, fully vectorized — text is lowered, trimmed, runs of
    whitespace collapsed to one space, padded with one space each side,
    and each phrase matches as a substring ``' phrase '`` (so 'slow'
    never fires inside 'slowly'). Zero shuffles, one pass; the phrase
    list is a handful of compiled constants per task, never shipped per
    batch.

    Output: (doc_id, blocked, n_matches, matched_phrase) — n_matches is
    the count of DISTINCT phrases present; matched_phrase the first hit
    in list order (null when clean). Exact SQL twin via the same
    normalize + LIKE chain."""
    pl = [" " + " ".join(p.split()) + " " for p in phrases]
    raw = list(phrases)

    def scan(b: pa.Table) -> pa.Table:
        text = b["text"].combine_chunks()
        norm = pc.replace_substring_regex(
            pc.replace_substring_regex(pc.utf8_lower(text),
                                       r"^\s+|\s+$", ""),
            r"\s+", " ")
        padded = pc.binary_join_element_wise(" ", norm, " ", "")
        hits = [pc.match_substring(padded, p)
                .to_numpy(zero_copy_only=False) for p in pl]
        if hits:
            stack = np.stack(hits)
            n = stack.sum(axis=0).astype(np.int64)
            first = np.where(stack.any(axis=0),
                             stack.argmax(axis=0), -1)
        else:  # empty blocklist: nothing is ever blocked
            n = np.zeros(b.num_rows, np.int64)
            first = np.full(b.num_rows, -1, np.int64)
        blocked = (n > 0).astype(np.int64)
        matched = pa.array(
            [raw[i] if i >= 0 else None for i in first.tolist()],
            pa.string())
        return pa.table({
            "doc_id": b["doc_id"],
            "blocked": pa.array(blocked, pa.int64()),
            "n_matches": pa.array(n, pa.int64()),
            "matched_phrase": matched})

    return ds.map_batches(scan, batch_format="pyarrow")


# --- corpus drift: pairwise Jensen-Shannon divergence between sources ---

def js_contrib_micro(c_a: np.ndarray, n_a: int, c_b: np.ndarray,
                     n_b: int) -> np.ndarray:
    """Per-word Jensen-Shannon contribution in int64 micro-nats — the ONE
    shared pure kernel: p = c_a/n_a, q = c_b/n_b, m = (p+q)/2,
    contrib = 0.5*(p*ln(p/m) + q*ln(q/m)) with 0*ln0 = 0, rounded ONCE
    per word to 1e-6 nats so any summation order gives identical int64
    totals. Inputs are exact integer counts."""
    # a zero-token source has all-zero counts; divide by max(n,1) so its
    # distribution is exactly zero instead of NaN (the other side then
    # contributes q*ln2 per word, the correct JS against an empty dist)
    p = c_a.astype(np.float64) / float(max(n_a, 1))
    q = c_b.astype(np.float64) / float(max(n_b, 1))
    m = 0.5 * (p + q)
    with np.errstate(divide="ignore", invalid="ignore"):
        ta = np.where(p > 0, p * np.log(p / m), 0.0)
        tb = np.where(q > 0, q * np.log(q / m), 0.0)
    return np.round(1e6 * 0.5 * (ta + tb)).astype(np.int64)


def source_divergence(ds: "ray.data.Dataset",
                      num_buckets=None) -> "ray.data.Dataset":
    """Pairwise Jensen-Shannon divergence between the per-source unigram
    token distributions — the corpus-drift monitor a multi-source
    training pipeline runs per ingest (did crawl batch X shift away from
    the reference mix?). Output: (source_a, source_b, js_micro) for every
    unordered source pair, exact int64 micro-nats.

    Scale shape: per-source token totals are K driver scalars (one tiny
    aggregate); (source, word-hash) counts combiner-aggregate per batch
    and exchange ONCE on bucket(h(word)) — every word's K counts
    co-locate, so each bucket computes its words' contributions for ALL
    K*(K-1)/2 pairs vectorized and emits K^2/2 partial rows; the final
    reduce touches num_buckets * pairs tiny rows. The vocab-sized count
    table is never assembled anywhere."""
    import ray

    from ..sharding import auto_buckets, bucket_of_ints
    from .agg import bucketed_group_sum_multi

    nb = num_buckets or auto_buckets(None)

    def totals(b: pa.Table) -> pa.Table:
        split, empty = _tokens_list(
            pc.utf8_lower(b["text"].combine_chunks()))
        lens = pc.list_value_length(split) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        lens = np.where(empty.to_numpy(zero_copy_only=False), 0, lens)
        t = pa.table({"source": b["source"],
                      "n": pa.array(lens, pa.int64())}) \
            .group_by("source").aggregate([("n", "sum")])
        return pa.table({"source": t["source"],
                         "n": pc.cast(t["n_sum"], pa.int64())})

    tot = ds.map_batches(totals, batch_format="pyarrow") \
        .groupby("source").sum("n").take_all()
    n_of = {r["source"]: int(r["sum(n)"]) for r in tot}
    sources = sorted(n_of)
    shared = ray.put((sources, n_of))

    def emit(b: pa.Table) -> pa.Table:
        split, empty = _tokens_list(
            pc.utf8_lower(b["text"].combine_chunks()))
        raw_lens = pc.list_value_length(split) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        emp = empty.to_numpy(zero_copy_only=False)
        lens = np.where(emp, 0, raw_lens)
        flat = split.flatten().to_numpy(zero_copy_only=False)
        keep = np.repeat(~emp, raw_lens)  # drop the [''] RE2 artifact
        flat = flat[keep] if len(flat) else flat
        th = _token_hashes(np.asarray(flat, dtype=object)).view(np.int64)
        src = np.repeat(np.asarray(b["source"].to_pylist(), dtype=object),
                        lens)
        tbl = pa.table({
            "h": pa.array(th, pa.int64()),
            "source": pa.array(src.tolist(), pa.string()),
        }).group_by(["h", "source"]).aggregate([([], "count_all")])
        h = tbl["h"].to_numpy(zero_copy_only=False)
        return pa.table({
            "h": tbl["h"],
            "source": tbl["source"],
            "cnt": pc.cast(tbl["count_all"], pa.int64()),
            "pkey": pa.array(bucket_of_ints(h, nb), pa.int64())})

    def score(g: pa.Table) -> pa.Table:
        srcs, totals_of = ray.get(shared)
        g = g.combine_chunks()
        h = g["h"].to_numpy(zero_copy_only=False)
        src = np.asarray(g["source"].to_pylist(), dtype=object)
        cnt = g["cnt"].to_numpy(zero_copy_only=False)
        # distinct words in this bucket -> dense row index
        uh, inv = np.unique(h, return_inverse=True)
        k = len(srcs)
        sidx = {s: i for i, s in enumerate(srcs)}
        mat = np.zeros((len(uh), k), np.int64)
        cols = np.array([sidx[s] for s in src], np.int64)
        np.add.at(mat, (inv, cols), cnt)
        out_a, out_b, out_j = [], [], []
        for i in range(k):
            for j in range(i + 1, k):
                contrib = js_contrib_micro(mat[:, i], totals_of[srcs[i]],
                                           mat[:, j], totals_of[srcs[j]])
                out_a.append(srcs[i])
                out_b.append(srcs[j])
                out_j.append(int(contrib.sum()))
        return pa.table({
            "source_a": pa.array(out_a, pa.string()),
            "source_b": pa.array(out_b, pa.string()),
            "js_micro": pa.array(out_j, pa.int64())})

    partials = ds.map_batches(emit, batch_format="pyarrow") \
        .groupby("pkey").map_groups(score, batch_format="pyarrow")
    return bucketed_group_sum_multi(partials, ["source_a", "source_b"],
                                    ["js_micro"])


def source_divergence_reference(texts: List[str],
                                sources: List[str]) -> List[tuple]:
    """Single-process twin: dict unigram counts per source, one pass over
    the union vocabulary through the SHARED js_contrib_micro kernel."""
    import re

    counts: dict = {}
    n_of: dict = {}
    for text, s in zip(texts, sources):
        toks = re.split(r"\s+",
                        re.sub(r"^\s+|\s+$", "", (text or "").lower()))
        toks = [t for t in toks if t != ""]
        th = _token_hashes(np.asarray(toks, dtype=object)).view(np.int64) \
            if toks else np.empty(0, np.int64)
        n_of[s] = n_of.get(s, 0) + len(th)
        d = counts.setdefault(s, {})
        for v in th:
            d[int(v)] = d.get(int(v), 0) + 1
    srcs = sorted(n_of)
    out = []
    for i in range(len(srcs)):
        for j in range(i + 1, len(srcs)):
            a, b = srcs[i], srcs[j]
            vocab = sorted(set(counts.get(a, {})) | set(counts.get(b, {})))
            c_a = np.array([counts[a].get(w, 0) for w in vocab], np.int64)
            c_b = np.array([counts[b].get(w, 0) for w in vocab], np.int64)
            js = int(js_contrib_micro(c_a, n_of[a], c_b, n_of[b]).sum())
            out.append((a, b, js))
    return out


# --- TextTiling topic segmentation (Hearst 1997) ---

def tiling_boundaries(th: np.ndarray, w: int = 20,
                      step: int = 10) -> List[int]:
    """Topic-boundary TOKEN offsets for one document (Hearst 1997
    TextTiling, block-comparison variant): token-count vectors over
    adjacent w-token blocks at every step-token gap, lexical cohesion =
    cosine similarity (quantized ONCE to 1e-6), depth score at each gap
    = (nearest left peak - score) + (nearest right peak - score), and a
    boundary wherever depth > mean_depth (mean over gaps, quantized) —
    the parameter-free cutoff. Pure (operates on token hashes), shared
    by the distributed operator and the oracle twin; all comparisons
    happen on int64-quantized values so float noise cannot move a
    boundary."""
    n = len(th)
    gaps = list(range(w, n - w + 1, step))
    if not gaps:
        return []
    scores = np.empty(len(gaps), np.int64)
    for gi, g in enumerate(gaps):
        left = th[g - w:g]
        right = th[g:g + w]
        ul, cl = np.unique(left, return_counts=True)
        ur, cr = np.unique(right, return_counts=True)
        common, li, ri = np.intersect1d(ul, ur, assume_unique=True,
                                        return_indices=True)
        dot = int((cl[li].astype(np.int64)
                   * cr[ri].astype(np.int64)).sum())
        na = float((cl.astype(np.int64) ** 2).sum())
        nb = float((cr.astype(np.int64) ** 2).sum())
        scores[gi] = int(np.round(1e6 * dot / np.sqrt(na * nb)))
    # depth: rise to the nearest strictly-higher run on each side
    depth = np.zeros(len(gaps), np.int64)
    for i in range(len(gaps)):
        lpeak = scores[i]
        j = i - 1
        while j >= 0 and scores[j] >= lpeak:
            lpeak = scores[j]
            j -= 1
        rpeak = scores[i]
        j = i + 1
        while j < len(gaps) and scores[j] >= rpeak:
            rpeak = scores[j]
            j += 1
        depth[i] = (lpeak - scores[i]) + (rpeak - scores[i])
    if not depth.any():
        return []
    thresh = int(depth.sum() // len(depth))  # exact integer mean floor
    return [gaps[i] for i in range(len(gaps))
            if depth[i] > thresh and depth[i] > 0]


def text_tiling(ds: "ray.data.Dataset", w: int = 20,
                step: int = 10) -> "ray.data.Dataset":
    """TextTiling topic segmentation per document — the RAG-prep chunker
    that cuts at SUBJECT shifts instead of fixed token windows
    (chunk_text): zero shuffles, one vectorized tokenize pass, the pure
    tiling_boundaries kernel per doc. Output: (doc_id, n_tokens,
    n_tiles, boundary_checksum) where n_tiles = boundaries + 1 and the
    checksum is sum((i+1) * (offset+1)) — order-sensitive, so the gate
    pins every boundary position."""
    def score(b: pa.Table) -> pa.Table:
        split, empty = _tokens_list(
            pc.utf8_lower(b["text"].combine_chunks()))
        raw_lens = pc.list_value_length(split) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        emp = empty.to_numpy(zero_copy_only=False)
        lens = np.where(emp, 0, raw_lens)
        flat = split.flatten().to_numpy(zero_copy_only=False)
        keep = np.repeat(~emp, raw_lens)
        flat = flat[keep] if len(flat) else flat
        th = _token_hashes(np.asarray(flat, dtype=object)).view(np.int64)
        starts = np.cumsum(lens) - lens
        out_n, out_t, out_c = [], [], []
        for i in range(len(lens)):
            doc_th = th[starts[i]:starts[i] + lens[i]]
            bounds = tiling_boundaries(doc_th, w, step)
            chk = sum((k + 1) * (off + 1)
                      for k, off in enumerate(bounds))
            out_n.append(int(lens[i]))
            out_t.append(len(bounds) + 1)
            out_c.append(chk)
        return pa.table({
            "doc_id": b["doc_id"],
            "n_tokens": pa.array(out_n, pa.int64()),
            "n_tiles": pa.array(out_t, pa.int64()),
            "boundary_checksum": pa.array(out_c, pa.int64())})

    return ds.map_batches(score, batch_format="pyarrow")
