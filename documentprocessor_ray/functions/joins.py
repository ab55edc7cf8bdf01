"""Distributed joins for large-x-large inputs.

Ray Data's 2.49 Dataset API has no general join operator, so this implements
the classic co-bucketed hash join as a composition: both sides are tagged,
null-padded to one aligned schema, and hash-bucketed on the join key
(pkey = mix64(key) % num_buckets); the tagged union shuffles ONCE on pkey and
each bucket joins locally with pyarrow's vectorized hash join
(``pa.Table.join`` — Acero, no pandas conversion on the Arrow-native path).
Shuffle volume = |L| + |R| rows moved once — the same exchange a warehouse
hash join performs. The bucket count scales with data/cluster size
(sharding.auto_buckets), never a fixed constant.

When one side is small, prefer the broadcast pattern instead
(pipelines/analysis.q_top_customers: ray.put once, dict lookup per batch) —
no shuffle at all. This module is the path for two BIG sides.

Skew note: a hot join key lands in one bucket; num_buckets spreads distinct
keys, and a single pathological key is handled with ``salt=S``: left rows
scatter across S salt partitions (round-robin within each batch) and right
rows replicate to every salt, so a key with millions of left rows spreads
over S reducers at the cost of S-times the (small) right side — the classic
skew-join trade. Output is identical to the unsalted join.
"""

from __future__ import annotations

from typing import List, Optional, Union

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..sharding import auto_buckets, bucket_of_ints

# rows-per-bucket budget for join buckets: join rows are narrow (a few
# scalar columns), so a bucket of ~64k rows joins in-memory in milliseconds
JOIN_ROWS_PER_BUCKET = 65536

_bucket_of = bucket_of_ints  # back-compat alias (tests import it)


def _key_hash(arr, typ: pa.DataType) -> np.ndarray:
    """int64 bucket-hash input for a join key column: ints pass through,
    strings get a deterministic vectorized 64-bit hash (siphash via
    pandas.util.hash_array, fixed key — identical across processes). The
    hash is used for BUCKETING only; equality is always tested on the real
    values inside the bucket, so a collision costs balance, never
    correctness."""
    if pa.types.is_string(typ) or pa.types.is_large_string(typ):
        import pandas as pd

        v = arr.to_numpy(zero_copy_only=False)
        return pd.util.hash_array(np.asarray(v, dtype=object)).view(np.int64)
    return arr.to_numpy(zero_copy_only=False).astype(np.int64)


def hash_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    on: Union[str, List[str]],
    num_buckets: Optional[int] = None,
    how: str = "inner",
    size_hint: Optional[int] = None,
    left_schema=None,
    right_schema=None,
    salt: int = 1,
) -> "ray.data.Dataset":
    """Join two Datasets on one or more int64/string key columns
    (how: inner|left|right|full). A composite key buckets on the combined
    tuple hash (strings crc-hashed per distinct value); the in-bucket Acero
    join always matches on the REAL key values.

    Non-key columns must be disjoint (rename before joining) so the padded
    union schema is unambiguous. ``size_hint`` (approx rows of the larger
    side, e.g. a metadata-only ``count()``) sizes the shuffle width; omitted,
    the width still scales with cluster CPUs.

    ``left_schema``/``right_schema`` (pa.Schema): pass when the side is a
    non-trivial lazy plan — ``Dataset.schema()`` EXECUTES the plan up to its
    first block, which for an aggregate-tailed input means running the whole
    aggregation once for the schema and again for the join (a measured 2x on
    the join benchmarks). The pipeline author statically knows these schemas.
    """
    key_list = [on] if isinstance(on, str) else list(on)
    if num_buckets is None:
        num_buckets = auto_buckets(size_hint, rows_per_bucket=JOIN_ROWS_PER_BUCKET)
    l_schema = left_schema if left_schema is not None else left.schema()
    r_schema = right_schema if right_schema is not None else right.schema()
    l_cols = list(l_schema.names)
    r_cols = list(r_schema.names)
    overlap = (set(l_cols) & set(r_cols)) - set(key_list)
    if overlap:
        raise ValueError(f"rename overlapping columns before joining: {sorted(overlap)}")

    l_types = dict(zip(l_schema.names, l_schema.types))
    r_types = dict(zip(r_schema.names, r_schema.types))
    all_fields = [(c, l_types[c]) for c in l_cols] + \
        [(c, r_types[c]) for c in r_cols if c not in key_list]

    def tag(side: str):
        def fn(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            if len(key_list) == 1:
                keys = _key_hash(batch[key_list[0]].combine_chunks(),
                                 l_types[key_list[0]])
            else:
                from .agg import _composite_key_hash

                keys = _composite_key_hash(batch, key_list)
            cols = {}
            for name, typ in all_fields:
                if name in batch.column_names:
                    cols[name] = pc.cast(batch[name].combine_chunks(), typ)
                else:
                    cols[name] = pa.nulls(n, typ)
            if salt > 1 and side == "l":
                # scatter left rows over salt partitions (round-robin is
                # deterministic per batch; any assignment is correct). The
                # salt is carried as a JOIN KEY — two (key, salt) partitions
                # can hash into the same bucket, and only the matching salt
                # may pair up there.
                s = np.arange(n, dtype=np.int64) % salt
                cols["__salt"] = pa.array(s, pa.int64())
                cols["__pkey"] = pa.array(
                    bucket_of_ints(keys * np.int64(salt) + s, num_buckets),
                    pa.int64())
                cols["__side"] = pa.array(["l"] * n, pa.string())
                return pa.table(cols)
            if salt > 1:  # replicate the right side to every salt partition
                reps = []
                for s in range(salt):
                    rc = dict(cols)
                    rc["__salt"] = pa.array(
                        np.full(n, s, dtype=np.int64), pa.int64())
                    rc["__pkey"] = pa.array(
                        bucket_of_ints(keys * np.int64(salt) + np.int64(s),
                                       num_buckets), pa.int64())
                    rc["__side"] = pa.array(["r"] * n, pa.string())
                    reps.append(pa.table(rc))
                return pa.concat_tables(reps)
            cols["__pkey"] = pa.array(bucket_of_ints(keys, num_buckets), pa.int64())
            cols["__side"] = pa.array(["l"] * n if side == "l" else ["r"] * n,
                                      pa.string())
            return pa.table(cols)
        return fn

    tagged = left.map_batches(tag("l"), batch_format="pyarrow").union(
        right.map_batches(tag("r"), batch_format="pyarrow"))

    r_value_cols = [c for c in r_cols if c not in key_list]
    out_cols = l_cols + r_value_cols
    join_type = {"inner": "inner", "left": "left outer",
                 "right": "right outer", "full": "full outer"}[how]
    if salt > 1 and how in ("right", "full"):
        # the salt plan REPLICATES right rows to every salt partition, so a
        # right row unmatched everywhere would surface `salt` times
        raise ValueError("salt-based skew handling supports inner/left only")

    join_keys = key_list if salt <= 1 else key_list + ["__salt"]

    def join_bucket(g: pa.Table) -> pa.Table:
        lmask = pc.equal(g["__side"], "l")
        lhs = g.filter(lmask).select(l_cols + (["__salt"] if salt > 1 else []))
        rhs = g.filter(pc.invert(lmask)).select(join_keys + r_value_cols)
        # Acero hash join inside the bucket: vectorized, null-safe, keeps
        # integer types intact (no pandas float/Int64 round-trip)
        joined = lhs.join(rhs, keys=join_keys, join_type=join_type)
        return joined.select(out_cols)

    return tagged.groupby("__pkey").map_groups(join_bucket, batch_format="pyarrow")


def semi_join(
    left: "ray.data.Dataset",
    keep: "ray.data.Dataset",
    left_on: str,
    keep_on: str,
    num_buckets: Optional[int] = None,
    size_hint: Optional[int] = None,
    left_schema=None,
    anti: bool = False,
) -> "ray.data.Dataset":
    """Distributed semi-join: rows of ``left`` whose ``left_on`` value appears
    in ``keep[keep_on]`` (int64 or string keys). The scale-safe replacement for a
    driver-side keep-set + broadcast filter: both sides shuffle ONCE on the
    bucketed key and membership is tested vectorized (``pc.is_in``) inside
    each bucket — keep-list cardinality never lands on one machine.

    ``anti=True`` inverts the membership test (anti-join: rows whose key does
    NOT appear in ``keep``) — correctness relies on co-bucketing: a key's
    keep rows land in the same bucket as its left rows, so a miss in the
    bucket is a global miss.
    """
    if num_buckets is None:
        num_buckets = auto_buckets(size_hint, rows_per_bucket=JOIN_ROWS_PER_BUCKET)
    ls = left_schema if left_schema is not None else left.schema()
    l_names = list(ls.names)
    l_types = dict(zip(ls.names, ls.types))

    key_typ = l_types[left_on]

    def tag_left(batch: pa.Table) -> pa.Table:
        kh = _key_hash(batch[left_on].combine_chunks(), key_typ)
        cols = {c: batch[c] for c in l_names}
        cols["__key"] = pc.cast(batch[left_on].combine_chunks(), key_typ)
        cols["__pkey"] = pa.array(bucket_of_ints(kh, num_buckets), pa.int64())
        cols["__side"] = pa.array(["l"] * batch.num_rows, pa.string())
        return pa.table(cols)

    def tag_keep(batch: pa.Table) -> pa.Table:
        vals = pc.cast(batch[keep_on].combine_chunks(), key_typ)
        kh = _key_hash(vals, key_typ)
        n = len(vals)
        cols = {c: pa.nulls(n, l_types[c]) for c in l_names}
        cols["__key"] = vals
        cols["__pkey"] = pa.array(bucket_of_ints(kh, num_buckets), pa.int64())
        cols["__side"] = pa.array(["k"] * n, pa.string())
        return pa.table(cols)

    tagged = left.map_batches(tag_left, batch_format="pyarrow").union(
        keep.map_batches(tag_keep, batch_format="pyarrow"))

    def filter_bucket(g: pa.Table) -> pa.Table:
        lmask = pc.equal(g["__side"], "l")
        lhs = g.filter(lmask)
        keep_keys = g.filter(pc.invert(lmask))["__key"]
        hit = pc.is_in(lhs["__key"], value_set=pc.unique(keep_keys.combine_chunks()))
        if anti:
            hit = pc.invert(hit)
        return lhs.filter(hit).select(l_names)

    return tagged.groupby("__pkey").map_groups(filter_bucket, batch_format="pyarrow")


def broadcast_join(
    left: "ray.data.Dataset",
    small: pa.Table,
    on: str,
    how: str = "inner",
) -> "ray.data.Dataset":
    """ZERO-shuffle join against a SMALL side (dimension tables, lookup
    maps, top-k results): the small table is ``ray.put`` into the object
    store ONCE and every map task Acero-joins its batch against the shared
    zero-copy plasma object — the classic broadcast-hash-join, the first
    choice whenever one side fits a worker's memory (the co-bucketed
    ``hash_join`` is for two BIG sides). Non-key columns must be disjoint;
    the key column must carry the same name on both sides (rename before
    calling). how: inner|left."""
    if how not in ("inner", "left"):
        raise ValueError("broadcast_join supports inner/left")
    ref = ray.put(small)
    join_type = {"inner": "inner", "left": "left outer"}[how]
    small_value_cols = [c for c in small.column_names if c != on]

    def fn(batch: pa.Table) -> pa.Table:
        bad = (set(small_value_cols) & set(batch.column_names))
        if bad:
            raise ValueError(
                f"rename overlapping columns before joining: {sorted(bad)}")
        sm = ray.get(ref)  # zero-copy shared read, once per task
        out_cols = list(batch.column_names) + small_value_cols
        return batch.join(sm, keys=[on], join_type=join_type) \
            .select(out_cols)

    return left.map_batches(fn, batch_format="pyarrow")
