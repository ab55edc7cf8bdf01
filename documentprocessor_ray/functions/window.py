"""Ordered per-partition window functions (running sum, lag) — the
``SUM(...) OVER (PARTITION BY k ORDER BY ...)`` / ``lag(...)`` shape Ray
Data has no native operator for.

One bucketed shuffle on hash(partition key); inside each bucket a single
lexsort orders EVERY partition at once and the window results come from
global vectorized recurrences with per-segment correction (running sum =
global cumsum minus the segment's offset; lag = shift-by-one with segment
starts masked to a sentinel). No per-partition loop, no driver collect.
Partitioning assumption: one partition key's rows fit a reducer (salt or
sub-aggregate upstream for pathological entities).

Exactness note: the SQL default frame for an ORDER BY window is RANGE
(peers collapse); this operator implements ROWS over a TOTAL order, so
callers must pass ``order_cols`` that are unique per partition (append the
row's primary key) — then RANGE == ROWS and a DuckDB twin hash-matches.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..sharding import auto_buckets, bucket_of_ints


def running_sum_lag(
    ds: "ray.data.Dataset",
    key: str,
    order_cols: List[str],
    sum_col: str,
    lag_cols: Optional[List[str]] = None,
    sentinel: int = -1,
    num_buckets: Optional[int] = None,
) -> "ray.data.Dataset":
    """Per distinct ``key``, ordered by ``order_cols`` (int64, unique per
    partition): append ``running_<sum_col>`` (inclusive prefix sum, int64)
    and ``prev_<c>`` for each lag col (previous row's value, ``sentinel``
    on the partition's first row). All other input columns pass through."""
    if lag_cols is None:
        lag_cols = []
    if num_buckets is None:
        num_buckets = auto_buckets(None)

    def add_pkey(b: pa.Table) -> pa.Table:
        k = b[key].combine_chunks().to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return b.append_column(
            "pkey", pa.array(bucket_of_ints(k, num_buckets), pa.int64()))

    def local(g: pa.Table) -> pa.Table:
        k = g[key].combine_chunks().to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        okeys = [g[c].combine_chunks().to_numpy(zero_copy_only=False)
                 .astype(np.int64) for c in order_cols]
        order = np.lexsort(tuple(reversed(okeys)) + (k,))
        g = g.take(pa.array(order))
        sk = k[order]
        n = len(sk)
        first = np.r_[True, sk[1:] != sk[:-1]] if n else np.zeros(0, bool)
        s = g[sum_col].combine_chunks().to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        csum = np.cumsum(s)
        starts = np.flatnonzero(first)
        seg_len = np.diff(np.r_[starts, n])
        offsets = np.where(starts > 0, csum[starts - 1], 0)
        running = csum - np.repeat(offsets, seg_len)
        cols = {c: g[c] for c in g.column_names if c != "pkey"}
        cols[f"running_{sum_col}"] = pa.array(running, pa.int64())
        for c in lag_cols:
            v = g[c].combine_chunks()
            if pa.types.is_timestamp(v.type):
                v = v.cast(pa.int64())
            v = v.to_numpy(zero_copy_only=False).astype(np.int64)
            prev = np.r_[np.int64(sentinel), v[:-1]]
            prev[first] = sentinel
            cols[f"prev_{c}"] = pa.array(prev, pa.int64())
        return pa.table(cols)

    return ds.map_batches(add_pkey, batch_format="pyarrow") \
        .groupby("pkey").map_groups(local, batch_format="pyarrow")
