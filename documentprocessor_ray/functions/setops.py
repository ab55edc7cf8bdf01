"""Distributed DISTINCT set operations (UNION / INTERSECT / EXCEPT) over a
single int64 key column.

Reference parity: the reference engine exposes set-style combinators only
implicitly (its dedup keep-lists and filter chains); this module makes them
first-class because LLM-corpus work needs them constantly ("ids in snapshot
A but not B", "users present in both splits").

Plan shape (one bucketed shuffle, no driver materialization):
  1. tag each side with a bit (left=1, right=2) inside a cheap map_batches;
  2. union the two tagged streams (zero-copy concatenation of blocks);
  3. hash-bucket on the key (splitmix64 — same mix as every other shuffle in
     this repo, so co-partitioned inputs reuse their layout);
  4. per bucket: ONE Arrow group_by(key).aggregate(side_bit, "max"/"min"...)
     — presence masks are computed from the bit_or of tags, vectorized.

At 100 TB the shuffle moves only (key, tag) pairs — 16 bytes/row — and the
per-bucket reduce is a single Arrow kernel, so the exchange is as small as a
distinct() of the union.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..sharding import auto_buckets, bucket_of_ints

_LEFT = 1
_RIGHT = 2


def _tag(side_bit: int, key: str):
    def f(b: pa.Table) -> pa.Table:
        return pa.table({
            "k": pc.cast(b[key], pa.int64()),
            "tag": pa.array(np.full(b.num_rows, side_bit, np.int64))})
    return f


def set_op(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    key: str,
    op: str,
    num_buckets: Optional[int] = None,
    out_name: Optional[str] = None,
) -> "ray.data.Dataset":
    """DISTINCT set operation on ``key``: op in {union, intersect, except}.

    ``except`` is left-minus-right. Output is one column (named ``key`` or
    ``out_name``) of distinct int64 keys.
    """
    if op not in ("union", "intersect", "except"):
        raise ValueError(f"unknown set op: {op}")
    nb = num_buckets or auto_buckets(None)  # driver-resolved ONCE
    out = out_name or key

    tagged = left.map_batches(_tag(_LEFT, key), batch_format="pyarrow") \
        .union(right.map_batches(_tag(_RIGHT, key), batch_format="pyarrow"))

    def add_pkey(b: pa.Table) -> pa.Table:
        k = b["k"].to_numpy(zero_copy_only=False)
        return b.append_column("pkey", pa.array(bucket_of_ints(k, nb)))

    def per_bucket(g: pa.Table) -> pa.Table:
        # bit_or of tags per key == max of {1,2,3} partial sums; compute via
        # per-key presence of each side (max of equality indicators).
        t = pa.table({
            "k": g["k"],
            "l": pc.cast(pc.equal(g["tag"], _LEFT), pa.int64()),
            "r": pc.cast(pc.equal(g["tag"], _RIGHT), pa.int64())})
        a = t.group_by("k").aggregate([("l", "max"), ("r", "max")])
        l = a["l_max"].to_numpy(zero_copy_only=False)
        r = a["r_max"].to_numpy(zero_copy_only=False)
        if op == "union":
            keep = np.ones(len(l), bool)
        elif op == "intersect":
            keep = (l == 1) & (r == 1)
        else:  # except: in left, not in right
            keep = (l == 1) & (r == 0)
        ks = a["k"].to_numpy(zero_copy_only=False)[keep]
        return pa.table({out: pa.array(ks, pa.int64())})

    return tagged.map_batches(add_pkey, batch_format="pyarrow") \
        .groupby("pkey").map_groups(per_bucket, batch_format="pyarrow")
