"""Columnar interchange sources — ORC and Arrow IPC (Feather V2).

Two more formats a data-engineering user of the reference would bring to
the engine (the reference's shell exports tabular results its SQL
consumers re-ingest; warehouse ecosystems hand over ORC, Arrow-native
ones hand over IPC files). Same design as sources/csv_source.py and
sources/jsonl.py: shard FILES are the parallel grain — the reader lists
the shard files and parses each inside its read task (one
``read_binary_files`` block per shard, the sources/warc.py:13 pattern,
since ray.data has no built-in ORC/IPC reader) — and the sandbox writer
derives deterministic shards from the documents table so the paired
query's DuckDB twin can re-derive the rollup logically from the parquet
view. The hash gate then proves the encode + distributed-decode round
trip preserved every document byte-exactly.

At 100 TB the shard list is thousands of files: ``read_binary_files``
streams one file per task, the parse happens on the worker that holds
the bytes, and nothing ever lands on the driver.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

import ray.data

_FORMATS = ("orc", "ipc")


def _write_shards(documents_parquet: str, out_dir: str, fmt: str,
                  num_shards: int = 8) -> str:
    """Deterministic shard writer shared by both formats (shard k holds
    doc_id % num_shards == k, ascending doc_id). Idempotent via _COMPLETE,
    stale when the source parquet is newer (sources/warc.py:53
    discipline). Sandbox-side only — real deployments bring their own
    ORC/IPC files; num_shards is the test-scale stand-in for the
    thousands of files a warehouse export produces."""
    if fmt not in _FORMATS:
        raise ValueError(f"fmt must be one of {_FORMATS}, got {fmt!r}")
    marker = os.path.join(out_dir, "_COMPLETE")
    if os.path.exists(marker) and \
            os.stat(marker).st_mtime_ns >= \
            os.stat(documents_parquet).st_mtime_ns:
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    t = pq.read_table(documents_parquet).sort_by("doc_id")
    t = t.replace_schema_metadata(None)  # no pandas metadata in shards
    import pyarrow.compute as pc

    mod = pa.array(t["doc_id"].to_numpy() % num_shards, pa.int64())
    for k in range(num_shards):
        part = t.filter(pc.equal(mod, k))
        if fmt == "orc":
            import pyarrow.orc as paorc

            paorc.write_table(part,
                              os.path.join(out_dir, f"shard-{k:05d}.orc"))
        else:
            import pyarrow.feather as paft

            paft.write_feather(
                part, os.path.join(out_dir, f"shard-{k:05d}.arrow"),
                compression="zstd")
    with open(marker, "w") as f:
        f.write("ok")
    return out_dir


def write_orc_shards(documents_parquet: str, out_dir: str,
                     num_shards: int = 8) -> str:
    return _write_shards(documents_parquet, out_dir, "orc", num_shards)


def write_ipc_shards(documents_parquet: str, out_dir: str,
                     num_shards: int = 8) -> str:
    return _write_shards(documents_parquet, out_dir, "ipc", num_shards)


def _reader(fmt: str):
    """Per-shard parse fn: each input row is (path, whole-file bytes);
    output is the decoded Arrow table. Runs inside the read task on the
    worker holding the bytes — decode never touches the driver."""

    def parse(batch: pa.Table) -> pa.Table:
        parts = []
        for buf in batch["bytes"].to_pylist():
            reader = pa.BufferReader(buf)
            if fmt == "orc":
                import pyarrow.orc as paorc

                parts.append(paorc.ORCFile(reader).read())
            else:
                parts.append(pa.ipc.open_file(reader).read_all())
        return pa.concat_tables(parts) if parts else pa.table({})

    return parse


def _read_shards(shard_dir: str, fmt: str) -> "ray.data.Dataset":
    ext = ".orc" if fmt == "orc" else ".arrow"
    paths = [os.path.join(shard_dir, f)
             for f in sorted(os.listdir(shard_dir)) if f.endswith(ext)]
    if not paths:
        raise ValueError(f"no *{ext} shards in {shard_dir}")
    files = ray.data.read_binary_files(paths, include_paths=True)
    return files.map_batches(_reader(fmt), batch_format="pyarrow",
                             batch_size=1)


def read_orc(shard_dir: str) -> "ray.data.Dataset":
    """Read a directory of .orc shards; one decode task per shard file."""
    return _read_shards(shard_dir, "orc")


def read_ipc(shard_dir: str) -> "ray.data.Dataset":
    """Read a directory of .arrow (Feather V2 / IPC file, zstd) shards;
    one decode task per shard file."""
    return _read_shards(shard_dir, "ipc")
