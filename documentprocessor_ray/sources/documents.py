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


def lance_available() -> bool:
    try:
        import lance  # noqa: F401

        return True
    except ImportError:
        return False


def _looks_like_lance(path: str) -> bool:
    """A Lance dataset is a directory with a _versions/ manifest dir (or the
    conventional .lance suffix)."""
    return str(path).endswith(".lance") or os.path.isdir(os.path.join(path, "_versions"))


def read_table_auto(
    path: str,
    columns: Optional[Sequence[str]] = None,
    fmt: Optional[str] = None,
) -> "ray.data.Dataset":
    """Format-dispatching source: the north rule's input tables are LANCE
    (BASELINE.json input_hint); parquet is the sanctioned fallback where the
    lance package is absent (FIXTURES.md F1). fmt: 'lance' | 'parquet' |
    None (auto-detect: .lance suffix or _versions/ layout -> lance).

    Both paths prune COLUMNS at the read (Lance is a columnar format with
    native projection pushdown; ray.data.read_lance passes columns straight
    to the fragment scanner)."""
    if fmt is None:
        fmt = "lance" if _looks_like_lance(path) else "parquet"
    if fmt == "lance":
        if not lance_available():
            raise ImportError(
                "input looks like a Lance table but the 'lance' package is "
                "not installed; install pylance or pass fmt='parquet'")
        return ray.data.read_lance(path, columns=list(columns) if columns else None)
    if fmt != "parquet":
        raise ValueError(f"unknown table format '{fmt}' (lance|parquet)")
    ds = ray.data.read_parquet(path)
    if columns:
        ds = ds.select_columns(list(columns))
    return ds


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
