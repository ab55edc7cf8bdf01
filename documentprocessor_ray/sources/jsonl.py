"""JSONL (newline-delimited JSON) source — the lingua franca of LLM
training-data interchange (CommonCrawl derivatives, Dolma, RedPajama all
ship JSONL shards).

``read_jsonl`` wraps ``ray.data.read_json``: shard FILES are the parallel
grain (one read task per file, pyarrow's line-delimited JSON reader per
task), so a directory of N shards reads with N-way parallelism and streams
— no driver-side parsing. At 100 TB the shard listing is the only
driver-side metadata; schema comes from Arrow inference on the first
blocks.

``write_jsonl_shards`` exists for the sandbox gate: it derives a
deterministic JSONL corpus from the documents table (shard k holds
doc_id % num_shards == k in ascending doc_id order, one ``json.dumps``
object per line) so the paired query's DuckDB twin can re-derive the same
aggregate logically from the parquet view — the hash gate then verifies
the JSON encode + Ray read_json parse round trip, not a pass-through.
Idempotent via a _COMPLETE marker that is invalidated when the source
parquet is newer (same staleness discipline as sources/warc.py:53)."""

from __future__ import annotations

import json
import os

import pyarrow.parquet as pq

import ray.data


def write_jsonl_shards(documents_parquet: str, out_dir: str,
                       num_shards: int = 8,
                       compress: str | None = None) -> str:
    """Deterministic JSONL shards from a documents table. Returns out_dir.

    ``compress="gzip"`` writes ``.jsonl.gz`` shards (the Common Crawl /
    Dolma interchange reality) with ``mtime=0`` and an empty embedded
    filename so the compressed BYTES are deterministic too — the cache
    marker and the hash gate both stay stable across rebuilds."""
    marker = os.path.join(out_dir, "_COMPLETE")
    if os.path.exists(marker) and \
            os.stat(marker).st_mtime_ns >= \
            os.stat(documents_parquet).st_mtime_ns:
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    t = pq.read_table(documents_parquet).sort_by("doc_id")
    cols = t.column_names
    rows = t.to_pylist()
    shards: list[list[str]] = [[] for _ in range(num_shards)]
    for r in rows:
        shards[int(r["doc_id"]) % num_shards].append(
            json.dumps({c: r[c] for c in cols}, ensure_ascii=False,
                       separators=(",", ":")))
    for k, lines in enumerate(shards):
        payload = ("\n".join(lines) + ("\n" if lines else "")) \
            .encode("utf-8")
        if compress == "gzip":
            import gzip

            path = os.path.join(out_dir, f"shard-{k:05d}.jsonl.gz")
            with open(path, "wb") as f:
                with gzip.GzipFile(filename="", mode="wb", fileobj=f,
                                   mtime=0) as gz:
                    gz.write(payload)
        elif compress == "zstd":
            import pyarrow as pa

            path = os.path.join(out_dir, f"shard-{k:05d}.jsonl.zst")
            with open(path, "wb") as f:
                f.write(pa.Codec("zstd").compress(
                    payload, asbytes=True))
        else:
            with open(os.path.join(out_dir, f"shard-{k:05d}.jsonl"),
                      "wb") as f:
                f.write(payload)
    with open(marker, "w") as f:
        f.write("ok")
    return out_dir


def read_jsonl(shard_dir: str) -> "ray.data.Dataset":
    """Read a directory of .jsonl / .jsonl.gz shards; one read task per
    shard file. Compressed shards stream through Arrow's gzip input
    stream — decompression happens in the read tasks, never the driver."""
    names = sorted(os.listdir(shard_dir))
    gz = [os.path.join(shard_dir, f) for f in names
          if f.endswith(".jsonl.gz")]
    zst = [os.path.join(shard_dir, f) for f in names
           if f.endswith(".jsonl.zst")]
    plain = [os.path.join(shard_dir, f) for f in names
             if f.endswith(".jsonl")]
    if sum(bool(x) for x in (gz, zst, plain)) > 1:
        raise ValueError(
            f"mixed jsonl compression flavors in {shard_dir}")
    if gz:
        return ray.data.read_json(
            gz, arrow_open_stream_args={"compression": "gzip"})
    if zst:
        return ray.data.read_json(
            zst, arrow_open_stream_args={"compression": "zstd"})
    return ray.data.read_json(plain)
