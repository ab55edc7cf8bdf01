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
