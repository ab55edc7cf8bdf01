"""Result sinks (reference S5: JSON result writer, commands.py:341-349).

``write_results`` streams a result Dataset to partitioned files — parquet
(the default: columnar, splittable, schema-carrying) or JSON-lines (the
reference's interchange format, for humans and downstream line readers).
Never one giant file: Ray writes one file per block, so output stays
resumable/parallel-readable; the checkpointed path (state/checkpoint.py)
adds per-partition manifests on top.
"""

from __future__ import annotations

import ray.data


def write_results(ds: "ray.data.Dataset", output_dir: str,
                  fmt: str = "parquet") -> None:
    if fmt == "parquet":
        ds.write_parquet(output_dir)
    elif fmt == "lance":
        # north-rule output format; import-guarded (FIXTURES.md F1 fallback)
        from .documents import lance_available

        if not lance_available():
            raise ImportError("'lance' package not installed; use fmt='parquet'")
        ds.write_lance(output_dir)
    elif fmt in ("json", "jsonl"):
        ds.write_json(output_dir)
    else:
        raise ValueError(f"unknown sink format '{fmt}' (parquet|lance|json)")


def read_results(output_dir: str, fmt: str = "parquet") -> "ray.data.Dataset":
    if fmt == "parquet":
        return ray.data.read_parquet(output_dir)
    if fmt == "lance":
        from .documents import lance_available

        if not lance_available():
            raise ImportError("'lance' package not installed; use fmt='parquet'")
        return ray.data.read_lance(output_dir)
    if fmt in ("json", "jsonl"):
        return ray.data.read_json(output_dir)
    raise ValueError(f"unknown sink format '{fmt}' (parquet|lance|json)")
