"""Bucketed group-aggregate: the high-cardinality replacement for
``Dataset.groupby(key).aggregate(Sum(...))``.

Ray Data's groupby+aggregate sorts the whole stream on the fine key and pays
per-key overhead downstream — measured 6-10x slower than hash-bucketing the
key to a coarse pkey and aggregating VECTORIZED (pyarrow group_by) inside
each bucket (see memory/ray-data-perf-patterns). Use Ray's native aggregate
only when distinct-key count is small (event types, languages); use this for
order keys, customer keys, content hashes.

Callers should pre-combine inside map_batches first (per-batch partial sums)
so the shuffle moves ~distinct-keys-per-batch rows, then this performs the
final merge in ONE bucketed exchange.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..sharding import auto_buckets, bucket_of_ints


def bucketed_group_sum(
    ds: "ray.data.Dataset",
    key: str,
    cols: List[str],
    num_buckets: Optional[int] = None,
    size_hint: Optional[int] = None,
) -> "ray.data.Dataset":
    """Sum ``cols`` per distinct int64 ``key``: one shuffle on
    pkey = mix64(key) % num_buckets, vectorized per-key sum inside each
    bucket. Output columns: [key] + cols, all int64."""
    if num_buckets is None:
        num_buckets = auto_buckets(size_hint, rows_per_bucket=65536)

    def add_pkey(b: pa.Table) -> pa.Table:
        k = b[key].to_numpy(zero_copy_only=False).astype(np.int64)
        return b.append_column(
            "pkey", pa.array(bucket_of_ints(k, num_buckets), pa.int64()))

    def local(g: pa.Table) -> pa.Table:
        t = g.select([key] + cols).group_by(key).aggregate(
            [(c, "sum") for c in cols])
        out = {key: pc.cast(t[key], pa.int64())}
        for c in cols:
            out[c] = pc.cast(t[f"{c}_sum"], pa.int64())
        return pa.table(out)

    return ds.map_batches(add_pkey, batch_format="pyarrow") \
        .groupby("pkey").map_groups(local, batch_format="pyarrow")


def bucketed_group_sum_multi(
    ds: "ray.data.Dataset",
    keys: List[str],
    cols: List[str],
    num_buckets: Optional[int] = None,
    size_hint: Optional[int] = None,
) -> "ray.data.Dataset":
    """Composite-key variant: sum ``cols`` per distinct tuple of ``keys``
    (int64 or string columns). The tuple hashes into one bucket key (string
    columns crc-hashed once per DISTINCT value via dictionary encoding);
    the exact grouping happens vectorized inside the bucket. Right shape
    for (event_type, window) style keys whose cardinality grows with the
    data's time range."""
    import zlib

    if num_buckets is None:
        num_buckets = auto_buckets(size_hint, rows_per_bucket=65536)

    def add_pkey(b: pa.Table) -> pa.Table:
        h = np.zeros(b.num_rows, dtype=np.int64)
        for k in keys:
            col = b[k].combine_chunks()
            if pa.types.is_integer(col.type):
                vals = col.to_numpy(zero_copy_only=False).astype(np.int64)
            else:
                enc = pc.dictionary_encode(col)
                uniq = np.array([zlib.crc32(str(s).encode())
                                 for s in enc.dictionary.to_pylist()],
                                dtype=np.int64)
                vals = uniq[enc.indices.to_numpy(zero_copy_only=False)]
            h = h * np.int64(1000003) ^ vals
        return b.append_column(
            "pkey", pa.array(bucket_of_ints(h, num_buckets), pa.int64()))

    def local(g: pa.Table) -> pa.Table:
        t = g.select(keys + cols).group_by(keys).aggregate(
            [(c, "sum") for c in cols])
        out = {k: t[k] for k in keys}
        for c in cols:
            out[c] = pc.cast(t[f"{c}_sum"], pa.int64())
        return pa.table(out)

    return ds.map_batches(add_pkey, batch_format="pyarrow") \
        .groupby("pkey").map_groups(local, batch_format="pyarrow")
