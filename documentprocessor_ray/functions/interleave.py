"""Interleaved text+media sequence packing — the layout step that turns an
interleaved document stream (ordered text spans and image spans, the
MMC4/OBELICS document shape and the span sequence this engine's extraction
flagship emits) into fixed-length training sequences.

Semantics (doc-atomic, the standard multimodal-SFT layout — documents never
share a sequence, so no cross-document attention contamination):

- A document is an ordered stream of text tokens with ``m`` image blocks
  interleaved at deterministic boundaries; each image block contributes
  ``patch_tokens`` (P) positions and is ATOMIC — patches of one image must
  land in one sequence.
- The stream packs greedily into sequences of length ``seq_len`` (L):
  text splits freely across sequence boundaries; when an image block does
  not fit in the current sequence's remaining room, the sequence is padded
  to L and the image starts the next one; the final sequence pads to L.

The padding makes sequence layout a sequential recurrence per document, but
documents are independent, so the operator is embarrassingly parallel: one
``map_batches`` stage, zero shuffle. Within a batch the walk is vectorized
ACROSS documents with a fixed loop over image slots (≤3 here) — no per-row
Python, no per-token work (pack_sequences in window.py is the cross-doc
concatenate-and-chunk dual; here atomicity forbids that layout).

For the sandbox gate the interleave boundaries derive deterministically
from the documents table: ``m = doc_id % 4`` images, image ``j`` after
token ``(j+1)*n_tok // (m+1)``. In production the same packer runs over
the real (kind, text, media_ref, order) span sequences.

Scale notes (100 TB): stateless, linear, column-pruned read — the only
cost is the tokenize; at 10^12 documents this stage never exchanges a
byte between partitions.
"""

from __future__ import annotations

from typing import List

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

SEQ_LEN = 256
PATCH_TOKENS = 64
MAX_IMAGES = 3  # m = doc_id % 4 ∈ {0,1,2,3}


def _token_counts(text: pa.Array) -> np.ndarray:
    from .textstats import _tokens_list

    split, empty = _tokens_list(text)
    n = pc.if_else(empty, pa.scalar(0, pa.int32()),
                   pc.cast(pc.list_value_length(split), pa.int32()))
    return n.to_numpy(zero_copy_only=False).astype(np.int64)


def interleaved_pack_batch(batch: pa.Table, seq_len: int = SEQ_LEN,
                           patch_tokens: int = PATCH_TOKENS) -> pa.Table:
    """Per-doc packing summary, vectorized across the batch.

    The per-doc walk has at most 2m+1 spans; the loop below runs over the
    ≤3 image SLOTS with every doc in the batch advancing in lockstep numpy
    state (g = emitted length incl. pads, pad = pad total).
    """
    L = np.int64(seq_len)
    P = np.int64(patch_tokens)
    doc_id = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    n_tok = _token_counts(batch["text"].combine_chunks())
    m = doc_id % 4

    g = np.zeros(len(doc_id), np.int64)
    pad = np.zeros(len(doc_id), np.int64)
    b_prev = np.zeros(len(doc_id), np.int64)
    for j in range(MAX_IMAGES):
        act = j < m
        b_j = (j + 1) * n_tok // (m + 1)
        g = g + np.where(act, b_j - b_prev, 0)          # text before image j
        room = L - g % L
        defer = act & (room < P)
        pad = pad + np.where(defer, room, 0)
        g = g + np.where(defer, room, 0) + np.where(act, P, 0)
        b_prev = np.where(act, b_j, b_prev)
    g = g + (n_tok - b_prev)                            # trailing text
    rem = g % L
    tail = np.where((g > 0) & (rem > 0), L - rem, 0)    # pad final sequence
    pad = pad + tail
    g = g + tail

    return pa.table({
        "doc_id": pa.array(doc_id, pa.int64()),
        "n_seqs": pa.array(g // L, pa.int64()),
        "n_text_tokens": pa.array(n_tok, pa.int64()),
        "n_images": pa.array(m, pa.int64()),
        "n_pad_tokens": pa.array(pad, pa.int64())})


def interleaved_pack_reference(doc_ids: List[int], texts: List[str],
                               seq_len: int = SEQ_LEN,
                               patch_tokens: int = PATCH_TOKENS
                               ) -> List[tuple]:
    """Single-process twin: an explicit span-by-span walk per document
    (build the span list, then simulate the pack) — independent of the
    vectorized lockstep above. The oracle-dump side."""
    import re

    out = []
    for did, text in zip(doc_ids, texts):
        trimmed = re.sub(r"^\s+|\s+$", "", text or "")
        n_tok = 0 if trimmed == "" else len(re.split(r"\s+", trimmed))
        m = did % 4
        bounds = [(j + 1) * n_tok // (m + 1) for j in range(m)]
        spans: List[tuple] = []  # (kind, length)
        prev = 0
        for b in bounds:
            spans.append(("text", b - prev))
            spans.append(("image", patch_tokens))
            prev = b
        spans.append(("text", n_tok - prev))

        # explicit simulation: fill sequence slots span by span, counting a
        # sequence when it CLOSES (full or padded)
        pos = 0        # filled positions in the open sequence
        n_seqs = 0
        pad = 0
        for kind, ln in spans:
            while ln > 0:
                if kind == "text":
                    take = min(ln, seq_len - pos)
                    pos += take
                    ln -= take
                else:
                    if seq_len - pos < ln:   # atomic block doesn't fit
                        pad += seq_len - pos
                        n_seqs += 1
                        pos = 0
                    pos += ln
                    ln = 0
                if pos == seq_len:
                    n_seqs += 1
                    pos = 0
        if pos > 0:
            pad += seq_len - pos
            n_seqs += 1
        out.append((did, n_seqs, n_tok, m, pad))
    return out
