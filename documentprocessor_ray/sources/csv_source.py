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
                     num_shards: int = 8,
                     compress: str | None = None) -> str:
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
        payload = b.getvalue().encode("utf-8")
        if compress == "gzip":
            import gzip

            path = os.path.join(out_dir, f"shard-{k:05d}.csv.gz")
            with open(path, "wb") as f:
                with gzip.GzipFile(filename="", mode="wb", fileobj=f,
                                   mtime=0) as gz:  # deterministic bytes
                    gz.write(payload)
        else:
            with open(os.path.join(out_dir, f"shard-{k:05d}.csv"),
                      "wb") as f:
                f.write(payload)
    with open(marker, "w") as f:
        f.write("ok")
    return out_dir


def read_csv(shard_dir: str) -> "ray.data.Dataset":
    """Read a directory of .csv / .csv.gz shards; one read task per shard
    file. Quoted embedded newlines are honored (newlines_in_values);
    compressed shards stream through Arrow's gzip input stream inside the
    read tasks."""
    names = sorted(os.listdir(shard_dir))
    gz = [os.path.join(shard_dir, f) for f in names
          if f.endswith(".csv.gz")]
    plain = [os.path.join(shard_dir, f) for f in names
             if f.endswith(".csv")]
    if gz and plain:
        raise ValueError(f"mixed .csv and .csv.gz shards in {shard_dir}")
    opts = pacsv.ParseOptions(newlines_in_values=True)
    if gz:
        return ray.data.read_csv(
            gz, parse_options=opts,
            arrow_open_stream_args={"compression": "gzip"})
    return ray.data.read_csv(plain, parse_options=opts)
