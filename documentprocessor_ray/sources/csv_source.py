"""CSV source — the other interchange format a data-engineering user of the
reference would bring (DocumentProcessor's shell exports tabular results;
Ocr/sql consumers ingest CSV). Same design as sources/jsonl.py: shard
FILES are the parallel grain (ray.data.read_csv = one pyarrow CSV read
task per file, streaming), and the sandbox writer derives deterministic
shards from the documents table so the paired query's DuckDB twin can
re-derive the aggregate logically — the hash gate then verifies the CSV
quoting round trip (embedded commas, quotes and newlines included).

``newlines_in_values=True`` is load-bearing: document text contains
embedded newlines once quoted, and pyarrow's default parser would split
records there."""

from __future__ import annotations

import csv
import io
import os

import pyarrow.csv as pacsv
import pyarrow.parquet as pq

import ray.data


def write_csv_shards(documents_parquet: str, out_dir: str,
                     num_shards: int = 8) -> str:
    """Deterministic CSV shards (header + QUOTE_MINIMAL rows; shard k holds
    doc_id % num_shards == k ascending). Idempotent via _COMPLETE, stale
    when the source parquet is newer (sources/warc.py:53 discipline)."""
    marker = os.path.join(out_dir, "_COMPLETE")
    if os.path.exists(marker) and \
            os.stat(marker).st_mtime_ns >= \
            os.stat(documents_parquet).st_mtime_ns:
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    t = pq.read_table(documents_parquet).sort_by("doc_id")
    cols = t.column_names
    rows = t.to_pylist()
    bufs = [io.StringIO() for _ in range(num_shards)]
    writers = [csv.writer(b, quoting=csv.QUOTE_MINIMAL, lineterminator="\n")
               for b in bufs]
    for w in writers:
        w.writerow(cols)
    for r in rows:
        writers[int(r["doc_id"]) % num_shards].writerow(
            [r[c] for c in cols])
    for k, b in enumerate(bufs):
        with open(os.path.join(out_dir, f"shard-{k:05d}.csv"), "w",
                  encoding="utf-8", newline="") as f:
            f.write(b.getvalue())
    with open(marker, "w") as f:
        f.write("ok")
    return out_dir


def read_csv(shard_dir: str) -> "ray.data.Dataset":
    """Read a directory of .csv shards; one read task per shard file.
    Quoted embedded newlines are honored (newlines_in_values)."""
    paths = sorted(
        os.path.join(shard_dir, f) for f in os.listdir(shard_dir)
        if f.endswith(".csv"))
    return ray.data.read_csv(
        paths,
        parse_options=pacsv.ParseOptions(newlines_in_values=True))
