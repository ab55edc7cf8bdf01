"""Distributed joins for large-x-large inputs.

Ray Data's 2.49 Dataset API has no general join operator, so this implements
the classic co-bucketed hash join as a composition: both sides are tagged,
null-padded to one aligned schema, and hash-bucketed on the join key
(pkey = mix64(key) % num_buckets); the tagged union shuffles ONCE on pkey and
each bucket joins locally with a vectorized pandas merge. Shuffle volume =
|L| + |R| rows moved once — the same exchange a warehouse hash join performs.

When one side is small, prefer the broadcast pattern instead
(pipelines/analysis.q_top_customers: ray.put once, dict lookup per batch) —
no shuffle at all. This module is the path for two BIG sides.

Skew note: a hot join key lands in one bucket; num_buckets spreads distinct
keys, and a single pathological key should be salted (split key -> key#i on
one side, replicate on the other) before calling this.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

N_BUCKETS = 64
_MIX = np.uint64(0x9E3779B97F4A7C15)  # splitmix64 multiplier


def _bucket_of(keys: np.ndarray, n: int) -> np.ndarray:
    """Stable bucket for int64 keys (splitmix-style mix, not raw modulo, so
    sequential keys spread instead of striping)."""
    h = keys.astype(np.uint64) * _MIX
    h ^= h >> np.uint64(31)
    return (h % np.uint64(n)).astype(np.int64)


def hash_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    on: str,
    num_buckets: int = N_BUCKETS,
    how: str = "inner",
) -> "ray.data.Dataset":
    """Join two Datasets on an int64 key column (how: inner|left).

    Non-key columns must be disjoint (rename before joining) so the padded
    union schema is unambiguous.
    """
    l_schema = left.schema()
    r_schema = right.schema()
    l_cols = list(l_schema.names)
    r_cols = list(r_schema.names)
    overlap = (set(l_cols) & set(r_cols)) - {on}
    if overlap:
        raise ValueError(f"rename overlapping columns before joining: {sorted(overlap)}")

    l_types = dict(zip(l_schema.names, l_schema.types))
    r_types = dict(zip(r_schema.names, r_schema.types))
    all_fields = [(c, l_types[c]) for c in l_cols] + \
        [(c, r_types[c]) for c in r_cols if c != on]

    def tag(side: str):
        def fn(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            keys = batch[on].to_numpy(zero_copy_only=False).astype(np.int64)
            cols = {}
            for name, typ in all_fields:
                if name in batch.column_names:
                    cols[name] = batch[name]
                else:
                    cols[name] = pa.nulls(n, typ)
            cols["__pkey"] = pa.array(_bucket_of(keys, num_buckets), pa.int64())
            cols["__side"] = pa.array([side] * n, pa.string())
            return pa.table(cols)
        return fn

    tagged = left.map_batches(tag("l"), batch_format="pyarrow").union(
        right.map_batches(tag("r"), batch_format="pyarrow"))

    r_value_cols = [c for c in r_cols if c != on]
    int_cols = [c for c, t in all_fields if pa.types.is_integer(t)]

    def join_bucket(g: pd.DataFrame) -> pd.DataFrame:
        lhs = g[g["__side"] == "l"][l_cols]
        rhs = g[g["__side"] == "r"][[on] + r_value_cols]
        merged = lhs.merge(rhs, on=on, how=how)
        # the null-padded union floats integer columns in pandas; restore
        for c in int_cols:
            if c in merged.columns:
                if how == "inner":
                    merged[c] = merged[c].astype("int64")
                else:
                    merged[c] = merged[c].astype("Int64")
        return merged

    return tagged.groupby("__pkey").map_groups(join_bucket, batch_format="pandas")
