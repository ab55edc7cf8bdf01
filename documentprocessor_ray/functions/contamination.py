"""Substring-level dedup.

A canonical training-data operator the doc-level dedup family
(functions/dedup.py) does not cover:

``substring_dedup`` — exact duplicated-substring detection (public lineage:
    Lee et al. 2022, "Deduplicating Training Data Makes Language Models
    Better"): every length-k CHARACTER window of every document is hashed
    (vectorized byte-level rolling polynomial, one pass over the whole
    batch), windows are shuffled by hash bucket, and windows whose content
    occurs in >= 2 DISTINCT documents are counted back per document. At
    crawl scale the suffix-array construction the paper uses is replaced by
    this hash-bucket exchange: candidates are pre-aggregated per (hash, doc)
    on the map side (combiner-first), so shuffle rows are bounded by
    distinct windows per doc, not positions.

(Benchmark n-gram decontamination already lives in functions/dedup.py
``decontaminate`` — the broadcast-small-side pattern.)

The DuckDB twin (pipelines/analysis.py) compares REAL substrings while the
engine compares 64-bit rolling hashes — collision probability ~n^2/2^64 is
the same accepted tradeoff as the jaccard family.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..sharding import auto_buckets, bucket_of_ints

_B = np.uint64(1000003)


def _window_hashes(texts: List[str], k: int) -> Tuple[np.ndarray, np.ndarray]:
    """All length-k byte-window rolling hashes for a batch of documents.

    Returns (hashes, doc_offsets): hashes is the concatenation of each
    doc's (len-k+1) window hashes; doc_offsets[i]:doc_offsets[i+1] slices
    doc i. ONE flat pass: all docs' bytes are concatenated, the polynomial
    accumulates in k vectorized shifts, and windows crossing a document
    boundary are masked out.
    """
    bs = [t.encode("utf-8") for t in texts]
    lens = np.fromiter((len(b) for b in bs), dtype=np.int64, count=len(bs))
    n_win = np.maximum(lens - k + 1, 0)
    offsets = np.zeros(len(bs) + 1, dtype=np.int64)
    np.cumsum(n_win, out=offsets[1:])
    total = int(lens.sum())
    if total == 0 or int(offsets[-1]) == 0:
        return np.empty(0, np.uint64), offsets
    flat = np.frombuffer(b"".join(bs), dtype=np.uint8).astype(np.uint64)
    n = total
    acc = np.zeros(n - k + 1, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(k):
            acc = acc * _B + flat[j: n - k + 1 + j]
    # keep only windows fully inside one document
    starts = np.zeros(len(bs) + 1, dtype=np.int64)
    np.cumsum(lens, out=starts[1:])
    keep = np.zeros(n - k + 1, dtype=bool)
    for i in range(len(bs)):
        if n_win[i] > 0:
            keep[starts[i]: starts[i] + n_win[i]] = True
    return acc[keep], offsets


def substring_dedup(ds: "ray.data.Dataset",
                    k: int = 40) -> "ray.data.Dataset":
    """(doc_id, n_kgrams, n_dup): per document, the total number of
    length-k character windows and how many of them occur (as content) in
    at least 2 distinct documents."""
    nb = auto_buckets(None)  # driver-resolved once (see ADVICE: never
    # resolve shuffle width inside worker UDFs)

    def emit(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        texts = batch["text"].to_pylist()
        hs, off = _window_hashes([t or "" for t in texts], k)
        out_h, out_d, out_c = [], [], []
        tot_ids, tot_n = [], []
        for i, d in enumerate(ids):
            seg = hs[off[i]:off[i + 1]]
            tot_ids.append(int(d))
            tot_n.append(len(seg))
            if len(seg):
                u, c = np.unique(seg, return_counts=True)
                out_h.append(u)
                out_d.append(np.full(len(u), d, np.int64))
                out_c.append(c.astype(np.int64))
        h = np.concatenate(out_h) if out_h else np.empty(0, np.uint64)
        dcol = np.concatenate(out_d) if out_d else np.empty(0, np.int64)
        ccol = np.concatenate(out_c) if out_c else np.empty(0, np.int64)
        cand = pa.table({
            "pkey": pa.array(bucket_of_ints(h.view(np.int64), nb)),
            "h": pa.array(h.view(np.int64), pa.int64()),
            "doc_id": pa.array(dcol, pa.int64()),
            "cnt": pa.array(ccol, pa.int64()),
            "n_kgrams": pa.array(np.zeros(len(dcol), np.int64)),
            "is_total": pa.array(np.zeros(len(dcol), np.bool_)),
        })
        # per-doc totals ride the same stream, bucketed by doc_id, so the
        # final aggregate needs no join
        tot = pa.table({
            "pkey": pa.array(bucket_of_ints(
                np.asarray(tot_ids, np.int64), nb)),
            "h": pa.array(np.zeros(len(tot_ids), np.int64)),
            "doc_id": pa.array(np.asarray(tot_ids, np.int64)),
            "cnt": pa.array(np.zeros(len(tot_ids), np.int64)),
            "n_kgrams": pa.array(np.asarray(tot_n, np.int64)),
            "is_total": pa.array(np.ones(len(tot_ids), np.bool_)),
        })
        return pa.concat_tables([cand, tot])

    def resolve_bucket(g: pa.Table) -> pa.Table:
        """Bucket holds candidate rows (by hash bucket) AND total rows (by
        doc bucket); totals pass through, candidates reduce to per-doc
        duplicated-position counts for hashes seen in >= 2 docs."""
        is_tot = g["is_total"].to_numpy(zero_copy_only=False)
        tot = g.filter(pa.array(is_tot))
        cand = g.filter(pa.array(~is_tot))
        out_doc, out_dup = np.empty(0, np.int64), np.empty(0, np.int64)
        if cand.num_rows:
            h = cand["h"].to_numpy(zero_copy_only=False)
            d = cand["doc_id"].to_numpy(zero_copy_only=False)
            c = cand["cnt"].to_numpy(zero_copy_only=False)
            order = np.lexsort((d, h))
            h, d, c = h[order], d[order], c[order]
            # rows are unique per (h, doc) by construction: docs per hash =
            # segment length
            seg_start = np.empty(len(h), dtype=bool)
            seg_start[0] = True
            np.not_equal(h[1:], h[:-1], out=seg_start[1:])
            seg_id = np.cumsum(seg_start) - 1
            docs_per_h = np.bincount(seg_id)
            dup_rows = docs_per_h[seg_id] >= 2
            if dup_rows.any():
                dd, cc = d[dup_rows], c[dup_rows]
                uo = np.unique(dd)
                sums = np.zeros(len(uo), np.int64)
                np.add.at(sums, np.searchsorted(uo, dd), cc)
                out_doc, out_dup = uo, sums
        return pa.table({
            "pkey": pa.array(bucket_of_ints(
                np.concatenate([out_doc,
                                tot["doc_id"].to_numpy(zero_copy_only=False)
                                .astype(np.int64)]), nb)),
            "doc_id": pa.array(np.concatenate(
                [out_doc, tot["doc_id"].to_numpy(zero_copy_only=False)
                 .astype(np.int64)]), pa.int64()),
            "n_dup": pa.array(np.concatenate(
                [out_dup, np.zeros(tot.num_rows, np.int64)]), pa.int64()),
            "n_kgrams": pa.array(np.concatenate(
                [np.zeros(len(out_doc), np.int64),
                 tot["n_kgrams"].to_numpy(zero_copy_only=False)]),
                pa.int64()),
        })

    def finalize_bucket(g: pa.Table) -> pa.Table:
        t = g.group_by("doc_id").aggregate(
            [("n_dup", "sum"), ("n_kgrams", "sum")])
        return pa.table({
            "doc_id": t["doc_id"],
            "n_kgrams": pc.cast(t["n_kgrams_sum"], pa.int64()),
            "n_dup": pc.cast(t["n_dup_sum"], pa.int64()),
        })

    return ds.map_batches(emit, batch_format="pyarrow") \
        .groupby("pkey").map_groups(resolve_bucket, batch_format="pyarrow") \
        .groupby("pkey").map_groups(finalize_bucket, batch_format="pyarrow")


def _excise(bs: bytes, positions: np.ndarray, k: int):
    """Merge duplicated-window byte intervals ``[p, p+k)``, widen every
    merged span outward to UTF-8 character boundaries (so the pruned text
    is always valid UTF-8 even when a window starts mid-character), and
    excise them. Returns (pruned_bytes, n_spans, n_removed_bytes).

    Shared verbatim by the distributed operator and the oracle-dump replay
    — the gate checks the aggregation seam (bucketed exchange vs dict),
    not this pure kernel.
    """
    if len(positions) == 0:
        return bs, 0, 0
    arr = np.sort(positions.astype(np.int64))
    # sorted equal-length windows: the running span end is always
    # last_p + k, so spans break exactly where the position gap exceeds k
    brk = np.nonzero(np.diff(arr) > k)[0]
    starts = arr[np.concatenate([[0], brk + 1])]
    ends = arr[np.concatenate([brk, [len(arr) - 1]])] + k
    merged = []
    for s, e in zip(starts.tolist(), ends.tolist()):
        while s > 0 and (bs[s] & 0xC0) == 0x80:
            s -= 1
        while e < len(bs) and (bs[e] & 0xC0) == 0x80:
            e += 1
        if merged and s <= merged[-1][1]:
            merged[-1][1] = max(merged[-1][1], e)
        else:
            merged.append([s, e])
    pieces = []
    prev = 0
    removed = 0
    for s, e in merged:
        pieces.append(bs[prev:s])
        removed += e - s
        prev = e
    pieces.append(bs[prev:])
    return b"".join(pieces), len(merged), removed


def substring_prune(ds: "ray.data.Dataset",
                    k: int = 40) -> "ray.data.Dataset":
    """Duplicate-SPAN REMOVAL — the second half of Lee et al. 2022 (their
    ExactSubstr dedup deletes the duplicated spans rather than dropping
    whole documents); ``substring_dedup`` above only COUNTS duplicated
    windows. Returns (doc_id, n_spans, n_removed, pruned_text).

    Three-hop plan, each hop linear in distinct windows (never positions):
      1. per-(hash, doc) DISTINCT candidate rows, bucketed on hash(h);
      2. per hash-bucket, hashes seen in >= 2 distinct docs bounce back as
         (doc_id, h) rows bucketed on hash(doc_id) — each doc receives only
         ITS duplicated window-hash set, so nothing is broadcast;
      3. the text rides ONCE into the same doc-bucket (union, one
         exchange), where each doc re-hashes its windows locally, marks
         positions whose hash is in its dup set, and excises via _excise.

    Collision contract: 64-bit rolling hashes stand in for window content
    (~n^2/2^64), the same accepted tradeoff as substring_dedup/jaccard.
    """
    nb = auto_buckets(None)

    def emit(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        texts = batch["text"].to_pylist()
        hs, off = _window_hashes([t or "" for t in texts], k)
        out_h, out_d = [], []
        for i, d in enumerate(ids):
            seg = hs[off[i]:off[i + 1]]
            if len(seg):
                u = np.unique(seg)
                out_h.append(u)
                out_d.append(np.full(len(u), d, np.int64))
        h = (np.concatenate(out_h) if out_h
             else np.empty(0, np.uint64)).view(np.int64)
        dcol = np.concatenate(out_d) if out_d else np.empty(0, np.int64)
        return pa.table({
            "pkey": pa.array(bucket_of_ints(h, nb), pa.int64()),
            "h": pa.array(h, pa.int64()),
            "doc_id": pa.array(dcol, pa.int64()),
        })

    def resolve_bucket(g: pa.Table) -> pa.Table:
        h = g["h"].to_numpy(zero_copy_only=False)
        d = g["doc_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((d, h))
        h, d = h[order], d[order]
        if len(h):
            seg_start = np.empty(len(h), dtype=bool)
            seg_start[0] = True
            np.not_equal(h[1:], h[:-1], out=seg_start[1:])
            seg_id = np.cumsum(seg_start) - 1
            docs_per_h = np.bincount(seg_id)
            keep = docs_per_h[seg_id] >= 2
            h, d = h[keep], d[keep]
        return pa.table({
            "pkey": pa.array(bucket_of_ints(d, nb), pa.int64()),
            "doc_id": pa.array(d, pa.int64()),
            "h": pa.array(h, pa.int64()),
            "text": pa.array([""] * len(d), pa.string()),
            "is_text": pa.array(np.zeros(len(d), np.bool_)),
        })

    dup = ds.map_batches(emit, batch_format="pyarrow") \
        .groupby("pkey").map_groups(resolve_bucket, batch_format="pyarrow")

    def text_rows(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "pkey": pa.array(bucket_of_ints(ids, nb), pa.int64()),
            "doc_id": pa.array(ids, pa.int64()),
            "h": pa.array(np.zeros(len(ids), np.int64)),
            "text": batch["text"],
            "is_text": pa.array(np.ones(len(ids), np.bool_)),
        })

    texts = ds.map_batches(text_rows, batch_format="pyarrow")

    def finalize(g: pa.Table) -> pa.Table:
        is_t = g["is_text"].to_numpy(zero_copy_only=False)
        dup_part = g.filter(pa.array(~is_t))
        txt_part = g.filter(pa.array(is_t))
        dd = dup_part["doc_id"].to_numpy(zero_copy_only=False)
        dh = dup_part["h"].to_numpy(zero_copy_only=False)
        order = np.lexsort((dh, dd))
        dd, dh = dd[order], dh[order]
        out = {"doc_id": [], "n_spans": [], "n_removed": [],
               "pruned_text": []}
        ids = txt_part["doc_id"].to_numpy(zero_copy_only=False)
        texts_py = txt_part["text"].to_pylist()
        # ONE vectorized hashing pass over the whole bucket's text
        hs_all, off = _window_hashes([t or "" for t in texts_py], k)
        h_all = hs_all.view(np.int64)
        for i, txt in enumerate(texts_py):
            d = int(ids[i])
            lo = np.searchsorted(dd, d, side="left")
            hi = np.searchsorted(dd, d, side="right")
            myh = dh[lo:hi]  # sorted by construction
            bs = (txt or "").encode("utf-8")
            n_spans = 0
            n_removed = 0
            pruned = bs
            hi64 = h_all[off[i]:off[i + 1]]
            if len(myh) and len(hi64):
                idx = np.searchsorted(myh, hi64)
                idx_c = np.minimum(idx, len(myh) - 1)
                mask = myh[idx_c] == hi64
                pos = np.nonzero(mask)[0]
                pruned, n_spans, n_removed = _excise(bs, pos, k)
            out["doc_id"].append(d)
            out["n_spans"].append(n_spans)
            out["n_removed"].append(n_removed)
            out["pruned_text"].append(pruned.decode("utf-8"))
        return pa.table({
            "doc_id": pa.array(out["doc_id"], pa.int64()),
            "n_spans": pa.array(out["n_spans"], pa.int64()),
            "n_removed": pa.array(out["n_removed"], pa.int64()),
            "pruned_text": pa.array(out["pruned_text"], pa.string()),
        })

    return dup.union(texts).groupby("pkey") \
        .map_groups(finalize, batch_format="pyarrow")
