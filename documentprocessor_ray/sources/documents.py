"""Document-table source: partition-pruned reads + media-ref validation.

Reference analogs: S1 load_image / S2 validate_image_path
(Ocr/src/cli/utils.py:74-117) — validation becomes an in-band predicate
column (error channel) instead of raising, and the read itself prunes both
COLUMNS (Arrow projection pushdown) and PARTITIONS (checkpoint resume skips
completed `part=` directories at the read, so finished work never leaves
storage).
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence

import pyarrow as pa

import ray.data


def read_documents(
    documents_dir: str,
    columns: Optional[Sequence[str]] = None,
    include_partitions: Optional[Sequence[str]] = None,
) -> "ray.data.Dataset":
    """Read the hash-partitioned documents table.

    include_partitions: names like ["part=3", ...] — only those directories
    are listed and read (resume-time pruning; the complement of
    state.checkpoint.completed_partitions). None reads everything.
    """
    if include_partitions is None:
        paths = [documents_dir]
    else:
        # read_parquet wants files when given a list -> expand each part dir
        paths = []
        for p in sorted(include_partitions):
            d = os.path.join(documents_dir, p)
            paths.extend(os.path.join(d, f) for f in sorted(os.listdir(d))
                         if f.endswith(".parquet"))
        if not paths:
            return ray.data.from_arrow(_empty_table(columns))
    ds = ray.data.read_parquet(paths)
    if columns:
        ds = ds.select_columns(list(columns))
    return ds


def _empty_table(columns) -> pa.Table:
    from ..corpus import DOCUMENTS_SCHEMA

    t = DOCUMENTS_SCHEMA.empty_table()
    return t.select(list(columns)) if columns else t


def validate_media_refs(ds: "ray.data.Dataset", media_dir: str) -> "ray.data.Dataset":
    """S2 as a predicate stage: adds (n_media_refs, n_missing_refs,
    missing_refs) columns — bad documents are FLAGGED, not dropped or raised,
    so the error channel stays in-band (M31 discipline)."""

    def check(batch: pa.Table) -> pa.Table:
        from ..corpus import MediaStore

        store = MediaStore(media_dir)
        n_refs: List[int] = []
        n_missing: List[int] = []
        missing: List[List[str]] = []
        for spans in batch["spans"].to_pylist():
            refs = [s["media_ref"] for s in (spans or []) if s["kind"] == "media"]
            miss = [r for r in refs
                    if not (os.path.exists(os.path.join(store.media_dir, r + ".npz8"))
                            or os.path.exists(os.path.join(store.media_dir, r + ".npy")))]
            n_refs.append(len(refs))
            n_missing.append(len(miss))
            missing.append(miss)
        return (batch
                .append_column("n_media_refs", pa.array(n_refs, pa.int64()))
                .append_column("n_missing_refs", pa.array(n_missing, pa.int64()))
                .append_column("missing_refs", pa.array(missing, pa.list_(pa.string()))))

    return ds.map_batches(check, batch_format="pyarrow")
