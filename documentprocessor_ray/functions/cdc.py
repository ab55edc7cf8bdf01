"""Content-defined chunking (Gear hash / FastCDC family) + cross-doc
chunk-level exact dedup — the byte-level dedup primitive storage and
training-data systems use when fixed windows would break on insertions
(Xia et al. 2016, FastCDC; Muthitacharoen et al. 2001, LBFS): a chunk
boundary is declared wherever a rolling hash of the last 64 bytes lands
in a sparse set (``h & mask == 0``), so an edit only reshapes the chunks
it touches, and identical passages re-align to identical chunks at any
byte offset.

Two implementations gate each other:
- ``cdc_boundaries`` — vectorized: the Gear state at byte i is exactly
  ``sum_{j<64} gear[b[i-j]] << j`` (older bytes have shifted out of the
  64-bit window), so the whole hash stream is 64 shifted vector adds;
  min/max-size enforcement walks only the (sparse) candidate list.
- ``cdc_boundaries_reference`` — the classic sequential per-byte loop.

``cdc_chunk_stats`` is the distributed operator: per-doc chunking is
embarrassingly parallel; chunk hashes then play exact first-wins dedup
across documents in TWO narrow exchanges (hash hop -> winner pick,
doc hop -> per-doc rollup). Chunk text never rides an exchange — only
(hash, doc_id, chunk_idx, n_bytes) int rows.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

# fixed 256-entry random table — the only CDC parameter both
# implementations share (regenerating with the same seed is part of the
# spec, like the LM hash kernels)
_GEAR = np.random.default_rng(97).integers(
    0, 1 << 63, size=256, dtype=np.int64).astype(np.uint64)

_ONE = np.uint64(1)


def cdc_boundaries(data: bytes, mask: int = 0x3F, min_size: int = 16,
                   max_size: int = 256) -> List[int]:
    """Chunk END offsets (exclusive) for one byte string, vectorized.

    Candidate cut after byte i iff gear_hash(last 64 bytes) & mask == 0;
    cuts closer than ``min_size`` to the previous cut are suppressed and
    a cut is forced at ``max_size`` — the standard CDC normalization.
    Always ends with len(data)."""
    n = len(data)
    if n == 0:
        return []
    b = np.frombuffer(data, dtype=np.uint8)
    g = _GEAR[b]
    h = np.zeros(n, dtype=np.uint64)
    for j in range(64):
        if j >= n:
            break
        h[j:] += g[:n - j] << np.uint64(j)
    cand = np.flatnonzero((h & np.uint64(mask)) == 0) + 1  # cut AFTER i
    out: List[int] = []
    prev = 0
    ci = 0
    m = len(cand)
    while prev < n:
        lo = prev + min_size
        hi = prev + max_size
        while ci < m and cand[ci] < lo:
            ci += 1
        if ci < m and cand[ci] <= hi and cand[ci] < n:
            cut = int(cand[ci])
            ci += 1
        else:
            cut = min(hi, n)
        out.append(cut)
        prev = cut
    return out


def cdc_boundaries_reference(data: bytes, mask: int = 0x3F,
                             min_size: int = 16,
                             max_size: int = 256) -> List[int]:
    """Independent sequential per-byte Gear loop — the spec is WINDOWLESS
    (the hash never resets at a cut: a boundary depends only on the last
    64 bytes, which is exactly what makes identical passages re-align at
    any offset after an edit). The vectorized implementation is gated
    against this one."""
    n = len(data)
    out: List[int] = []
    prev = 0
    h = np.uint64(0)
    msk = np.uint64(mask)
    # the Gear recurrence is mod-2^64 BY DESIGN; silence numpy's expected
    # per-wrap RuntimeWarning so worker logs stay readable
    with np.errstate(over="ignore"):
        for i in range(n):
            h = (h << _ONE) + _GEAR[data[i]]
            pos = i + 1
            if pos - prev >= min_size and pos - prev <= max_size \
                    and (h & msk) == 0 and pos < n:
                out.append(pos)
                prev = pos
            elif pos - prev >= max_size:
                out.append(pos)
                prev = pos
    if prev < n:
        out.append(n)
    return out


def _chunk_hashes_bytes(data: bytes, cuts: List[int]) -> np.ndarray:
    """md5-derived 64-bit id per chunk (first 8 digest bytes); pure,
    shared by both sides."""
    import hashlib

    out = np.empty(len(cuts), dtype=np.int64)
    prev = 0
    for k, c in enumerate(cuts):
        out[k] = int.from_bytes(
            hashlib.md5(data[prev:c]).digest()[:8], "little", signed=True)
        prev = c
    return out


def cdc_chunk_stats(ds: "ray.data.Dataset", mask: int = 0x3F,
                    min_size: int = 16, max_size: int = 256,
                    num_buckets: Optional[int] = None
                    ) -> "ray.data.Dataset":
    """Cross-document CDC chunk dedup rollup: every chunk whose bytes
    were already produced by a smaller (doc_id, chunk_idx) is a
    duplicate. Output per doc: (doc_id, n_chunks, n_dup_chunks,
    dup_bytes), ordered stats an ingestion pipeline uses to decide
    skip/rewrite.

    Plan: chunking is per-doc local; (h, doc_id, chunk_idx, n_bytes)
    int rows hop to bucket(h) where the winner per distinct hash is the
    lexicographic min (doc_id, chunk_idx) — everything else is marked
    dup — then per-doc sums co-locate at bucket(doc_id) via the shared
    bucketed_group_sum. Two exchanges, ~32 B/row, chunk text never
    moves."""
    from ..sharding import auto_buckets, bucket_of_ints
    from .agg import bucketed_group_sum

    nb = num_buckets or auto_buckets(None)

    def emit(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        texts = batch["text"].to_pylist()
        h_all, d_all, c_all, n_all = [], [], [], []
        for did, text in zip(ids, texts):
            data = (text or "").encode("utf-8")
            cuts = cdc_boundaries(data, mask, min_size, max_size)
            if not cuts:
                continue
            hs = _chunk_hashes_bytes(data, cuts)
            sizes = np.diff(np.concatenate(([0], cuts)))
            h_all.append(hs)
            d_all.append(np.full(len(hs), did, np.int64))
            c_all.append(np.arange(len(hs), dtype=np.int64))
            n_all.append(sizes.astype(np.int64))
        if not h_all:
            z = np.empty(0, np.int64)
            h, d, c, nbytes = z, z, z, z
        else:
            h = np.concatenate(h_all)
            d = np.concatenate(d_all)
            c = np.concatenate(c_all)
            nbytes = np.concatenate(n_all)
        return pa.table({
            "h": pa.array(h, pa.int64()),
            "doc_id": pa.array(d, pa.int64()),
            "chunk_idx": pa.array(c, pa.int64()),
            "n_bytes": pa.array(nbytes, pa.int64()),
            "pkey": pa.array(bucket_of_ints(h, nb), pa.int64()),
        })

    def mark(g: pa.Table) -> pa.Table:
        g = g.combine_chunks()
        h = g["h"].to_numpy(zero_copy_only=False)
        d = g["doc_id"].to_numpy(zero_copy_only=False)
        c = g["chunk_idx"].to_numpy(zero_copy_only=False)
        nbytes = g["n_bytes"].to_numpy(zero_copy_only=False)
        order = np.lexsort((c, d, h))
        h, d, c, nbytes = h[order], d[order], c[order], nbytes[order]
        first = np.empty(len(h), bool)
        if len(h):
            first[0] = True
            first[1:] = h[1:] != h[:-1]
        dup = (~first).astype(np.int64)
        return pa.table({
            "doc_id": pa.array(d, pa.int64()),
            "n_chunks": pa.array(np.ones(len(d), np.int64), pa.int64()),
            "n_dup_chunks": pa.array(dup, pa.int64()),
            "dup_bytes": pa.array(dup * nbytes, pa.int64()),
        })

    marked = ds.map_batches(emit, batch_format="pyarrow") \
        .groupby("pkey").map_groups(mark, batch_format="pyarrow")
    return bucketed_group_sum(marked, "doc_id",
                              ["n_chunks", "n_dup_chunks", "dup_bytes"])


def cdc_chunk_stats_reference(doc_ids: List[int],
                              texts: List[str], mask: int = 0x3F,
                              min_size: int = 16,
                              max_size: int = 256) -> List[tuple]:
    """Single-process twin: sequential-loop boundaries, dict first-wins
    in ascending (doc_id, chunk_idx) order."""
    rows = []
    seen: dict = {}
    order = np.argsort(np.asarray(doc_ids, dtype=np.int64))
    chunked = []
    for i in order:
        did = int(doc_ids[i])
        data = (texts[i] or "").encode("utf-8")
        cuts = cdc_boundaries_reference(data, mask, min_size, max_size)
        hs = _chunk_hashes_bytes(data, cuts)
        sizes = np.diff(np.concatenate(([0], cuts))) if cuts else \
            np.empty(0, np.int64)
        chunked.append((did, hs, sizes))
        for k in range(len(hs)):
            key = int(hs[k])
            if key not in seen or (did, k) < seen[key]:
                seen[key] = (did, k)
    for did, hs, sizes in chunked:
        if len(hs) == 0:
            continue
        dup = np.array([seen[int(hs[k])] != (did, k)
                        for k in range(len(hs))], bool)
        rows.append((did, len(hs), int(dup.sum()),
                     int(sizes[dup].sum())))
    return rows
