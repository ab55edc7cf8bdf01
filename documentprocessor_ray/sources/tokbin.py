"""Indexed binary token-shard sink/source — the Megatron-LM-style
``.bin``/``.idx`` layout LM trainers memory-map (one flat little-endian
token array per shard plus an offset index), the standard final artifact
of a training-data pipeline.

Layout (self-describing, versioned):
  ``shard-{k:05d}.bin``  — all sequences' token ids concatenated,
                           little-endian int32.
  ``shard-{k:05d}.idx``  — magic ``DPTKIDX1`` (8 bytes), int64 n_seqs,
                           then (n_seqs + 1) int64 cumulative token
                           offsets, then n_seqs int64 doc_ids. A reader
                           maps sequence i to bin[offsets[i]:offsets[i+1]]
                           without touching any other byte — random access
                           and length come from the idx alone.

``write_token_shards`` is the distributed sink: shard k holds
doc_id % num_shards == k in ascending doc_id order (deterministic,
bit-reproducible bytes), ONE groupby exchange routes each doc's id row
to its shard and each shard is written by exactly one task — the shard
is the parallel grain, the driver never sees token bytes. At cluster
scale ``out_dir`` is a shared filesystem / object-store prefix and
num_shards is sized so one shard is one trainer-readable file
(100 MB–1 GB).

``read_token_shards`` is the source: the driver lists shard paths
(metadata only); each task parses one (idx, bin) pair and emits
(doc_id, tokens list<int32>) rows.
"""

from __future__ import annotations

import os
import struct
from typing import List

import numpy as np
import pyarrow as pa

import ray.data

_MAGIC = b"DPTKIDX1"


def _encode_shard(doc_ids: np.ndarray, tokens_flat: np.ndarray,
                  lengths: np.ndarray) -> tuple:
    """(bin bytes, idx bytes) for one shard — pure, shared with the
    round-trip twin. Sequences in the given order."""
    offsets = np.zeros(len(lengths) + 1, dtype=np.int64)
    np.cumsum(lengths, out=offsets[1:])
    bin_bytes = tokens_flat.astype("<i4").tobytes()
    idx = bytearray()
    idx += _MAGIC
    idx += struct.pack("<q", len(lengths))
    idx += offsets.astype("<i8").tobytes()
    idx += doc_ids.astype("<i8").tobytes()
    return bin_bytes, bytes(idx)


def _decode_shard(idx_bytes: bytes, bin_bytes: bytes) -> tuple:
    """(doc_ids, offsets, flat tokens) from one shard's files — pure.
    Raises ValueError on a wrong magic or a torn index."""
    if idx_bytes[:8] != _MAGIC:
        raise ValueError(f"bad token-shard magic: {idx_bytes[:8]!r}")
    (n,) = struct.unpack_from("<q", idx_bytes, 8)
    need = 16 + (n + 1) * 8 + n * 8
    if len(idx_bytes) != need:
        raise ValueError(f"torn token-shard index: {len(idx_bytes)} bytes,"
                         f" expected {need}")
    offsets = np.frombuffer(idx_bytes, dtype="<i8", count=n + 1, offset=16)
    doc_ids = np.frombuffer(idx_bytes, dtype="<i8", count=n,
                            offset=16 + (n + 1) * 8)
    toks = np.frombuffer(bin_bytes, dtype="<i4")
    if len(toks) != offsets[-1]:
        raise ValueError(f"token shard length {len(toks)} != index total "
                         f"{offsets[-1]}")
    return doc_ids.astype(np.int64), offsets.astype(np.int64), \
        toks.astype(np.int32)


def write_token_shards(ds: "ray.data.Dataset", out_dir: str,
                       num_shards: int = 8,
                       id_col: str = "doc_id",
                       tokens_col: str = "tokens") -> "ray.data.Dataset":
    """Distributed indexed-binary sink. ``ds`` rows: (doc_id int64,
    tokens list<int32>). Returns the manifest Dataset (shard, n_seqs,
    n_tokens, path) — consuming it IS the write (one task per shard)."""
    os.makedirs(out_dir, exist_ok=True)
    ns = int(num_shards)

    def add_shard(b: pa.Table) -> pa.Table:
        did = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return b.append_column("shard", pa.array(did % ns, pa.int64()))

    def write_shard(g: pa.Table) -> pa.Table:
        g = g.combine_chunks()
        k = int(g["shard"][0].as_py())
        did = g[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(did)
        col = g[tokens_col].combine_chunks()
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        col = col.take(pa.array(order))
        did = did[order]
        lengths = pa.compute.list_value_length(col) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        flat = pa.compute.list_flatten(col) \
            .to_numpy(zero_copy_only=False).astype(np.int32)
        bin_bytes, idx_bytes = _encode_shard(did, flat, lengths)
        bin_path = os.path.join(out_dir, f"shard-{k:05d}.bin")
        for path, payload in ((bin_path, bin_bytes),
                              (bin_path[:-4] + ".idx", idx_bytes)):
            tmp = path + f".tmp{os.getpid()}"
            with open(tmp, "wb") as f:
                f.write(payload)
            os.replace(tmp, path)
        return pa.table({
            "shard": pa.array([k], pa.int64()),
            "n_seqs": pa.array([len(did)], pa.int64()),
            "n_tokens": pa.array([int(lengths.sum())], pa.int64()),
            "path": pa.array([bin_path], pa.string()),
        })

    return ds.map_batches(add_shard, batch_format="pyarrow") \
        .groupby("shard").map_groups(write_shard, batch_format="pyarrow")


def read_token_shards(shard_dir: str) -> "ray.data.Dataset":
    """Source: one parse task per (idx, bin) shard pair; emits
    (doc_id int64, tokens list<int32>) rows."""
    paths: List[str] = sorted(
        os.path.join(shard_dir, f) for f in os.listdir(shard_dir)
        if f.endswith(".idx"))
    items = ray.data.from_items([{"idx_path": p} for p in paths])

    def parse(b: pa.Table) -> pa.Table:
        # one Arrow chunk PER SHARD: each chunk's 32-bit list offsets only
        # span that shard's tokens, so a batch of many large shards can
        # never overflow the int32 offset space of a single ListArray
        tabs = []
        for p in b["idx_path"].to_pylist():
            with open(p, "rb") as f:
                idx_bytes = f.read()
            with open(p[:-4] + ".bin", "rb") as f:
                bin_bytes = f.read()
            did, offsets, toks = _decode_shard(idx_bytes, bin_bytes)
            col = pa.ListArray.from_arrays(
                pa.array(offsets, pa.int64()).cast(pa.int32()),
                pa.array(toks, pa.int32()))
            tabs.append(pa.table({
                "doc_id": pa.array(did, pa.int64()),
                "tokens": col}))
        if not tabs:
            return pa.table({
                "doc_id": pa.array(np.empty(0, np.int64), pa.int64()),
                "tokens": pa.ListArray.from_arrays(
                    pa.array(np.zeros(1, np.int32), pa.int32()),
                    pa.array(np.empty(0, np.int32), pa.int32()))})
        return pa.concat_tables(tabs)

    return items.map_batches(parse, batch_format="pyarrow")
