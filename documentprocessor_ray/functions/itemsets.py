"""Market-basket frequent item PAIRS with lift (A-Priori's k=2 pass,
Agrawal & Srikant 1994) — the co-occurrence mining operator a
recommendations / data-curation user runs over (basket, item) tables.

Scale shape (the one that matters at 100 TB):
- ONE exchange co-locates each basket: rows bucket on hash(group_col),
  the in-bucket kernel lexsorts (basket, item), dedupes, and generates
  unordered pairs with a d-offset sweep (d = 1..max_basket_size): pair
  fan-out is sum_g L_g*(L_g-1)/2, bounded per basket — the classic
  quadratic-in-basket-size hazard is the BASKET's property, not the
  engine's (a retail basket is ~10 items; cap oversized baskets upstream
  if the domain allows them).
- Pair partials pre-aggregate INSIDE the bucket (lexsort + run-length)
  before the second exchange, so the (part_a, part_b) merge moves
  ~distinct-pairs-per-bucket rows, not raw pair instances.
- Item supports and the basket count ride the SAME bucket kernel as
  sentinel rows (item_b = -1 / item_a = -1), merged by the same
  bucketed_group_sum_multi — no extra pass over the input.
- Lift joins are hash_join exchanges against the (item, support) table
  (which scales with the item vocabulary — never broadcast, never on
  the driver); only the single basket-count scalar is taken.

lift_micro = floor(1e6 * n_baskets * support(a,b) /
                   (support(a) * support(b))), int64-exact while
n_baskets * support * 1e6 < 2^63 (~9e12 basket-support product — far
above any retail corpus; the DuckDB twin uses HUGEINT so the gate would
catch an overflow divergence).

Item ids must be non-negative int64 (the -1 sentinel); baskets hash as
int64.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..sharding import auto_buckets, bucket_of_ints
from .agg import bucketed_group_sum_multi


def _basket_pairs_kernel(ok: np.ndarray, it: np.ndarray):
    """Distinct (basket, item) rows -> (pair_a, pair_b, n_pairs per
    distinct pair within this shard) plus per-item distinct-basket counts
    and the shard's distinct-basket count. Pure numpy; shared by the
    distributed bucket kernel and the single-process twin replay."""
    order = np.lexsort((it, ok))
    ok, it = ok[order], it[order]
    keep = np.ones(len(ok), bool)
    if len(ok) > 1:
        keep[1:] = (ok[1:] != ok[:-1]) | (it[1:] != it[:-1])
    ok, it = ok[keep], it[keep]
    new_run = np.ones(len(ok), bool)
    if len(ok) > 1:
        new_run[1:] = ok[1:] != ok[:-1]
    run_id = np.cumsum(new_run)
    n_baskets = int(run_id[-1]) if len(run_id) else 0
    # unordered pairs via the d-offset sweep: items are sorted ascending
    # and distinct within a run, so a < b holds by construction
    pa_, pb_ = [], []
    d = 1
    while d < len(ok):
        m = run_id[:-d] == run_id[d:]
        if not m.any():
            break
        pa_.append(it[:-d][m])
        pb_.append(it[d:][m])
        d += 1
    if pa_:
        a = np.concatenate(pa_)
        b = np.concatenate(pb_)
        o2 = np.lexsort((b, a))
        a, b = a[o2], b[o2]
        first = np.ones(len(a), bool)
        first[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
        starts = np.flatnonzero(first)
        counts = np.diff(np.append(starts, len(a)))
        a, b = a[starts], b[starts]
    else:
        a = b = counts = np.empty(0, np.int64)
    items, icounts = (np.unique(it, return_counts=True) if len(it)
                      else (np.empty(0, np.int64), np.empty(0, np.int64)))
    return (a.astype(np.int64), b.astype(np.int64),
            counts.astype(np.int64), items.astype(np.int64),
            icounts.astype(np.int64), n_baskets)


def frequent_pairs(
    ds: "ray.data.Dataset",
    group_col: str,
    item_col: str,
    min_support: int = 2,
    num_buckets: Optional[int] = None,
    size_hint: Optional[int] = None,
) -> "ray.data.Dataset":
    """Frequent unordered item pairs per basket with support and
    integer-quantized lift. Output: (part_a, part_b, support, lift_micro)
    for pairs with support >= min_support."""
    from .joins import hash_join

    if num_buckets is None:
        num_buckets = auto_buckets(size_hint, rows_per_bucket=65536)

    def add_pkey(b: pa.Table) -> pa.Table:
        k = b[group_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "g": pa.array(k, pa.int64()),
            "i": pc.cast(b[item_col].combine_chunks(), pa.int64()),
            "pkey": pa.array(bucket_of_ints(k, num_buckets), pa.int64())})

    def bucket_kernel(g: pa.Table) -> pa.Table:
        ok = g["g"].to_numpy(zero_copy_only=False)
        it = g["i"].to_numpy(zero_copy_only=False)
        if len(it) and it.min() < 0:
            raise ValueError("frequent_pairs: item ids must be >= 0")
        a, b, cnts, items, icounts, n_baskets = _basket_pairs_kernel(ok, it)
        neg = np.full(len(items), -1, np.int64)
        return pa.table({
            "part_a": pa.array(np.concatenate([a, items, [-1]]), pa.int64()),
            "part_b": pa.array(np.concatenate([b, neg, [-1]]), pa.int64()),
            "n": pa.array(np.concatenate(
                [cnts, icounts, [n_baskets]]), pa.int64())})

    merged = bucketed_group_sum_multi(
        ds.map_batches(add_pkey, batch_format="pyarrow")
          .groupby("pkey").map_groups(bucket_kernel, batch_format="pyarrow"),
        keys=["part_a", "part_b"], cols=["n"],
        size_hint=size_hint).materialize()

    n_baskets = merged.filter(expr="part_a == -1").take_all()[0]["n"]

    def take_items(t: pa.Table) -> pa.Table:
        m = pc.and_(pc.greater_equal(t["part_a"], 0),
                    pc.equal(t["part_b"], -1))
        return t.filter(m)

    itemc = merged.map_batches(take_items, batch_format="pyarrow")

    def take_pairs(t: pa.Table) -> pa.Table:
        m = pc.and_(pc.greater_equal(t["part_b"], 0),
                    pc.greater_equal(t["n"], int(min_support)))
        f = t.filter(m)
        return pa.table({"part_a": f["part_a"], "part_b": f["part_b"],
                         "support": f["n"]})

    pair_schema = pa.schema([("part_a", pa.int64()), ("part_b", pa.int64()),
                             ("support", pa.int64())])
    pairs = merged.map_batches(take_pairs, batch_format="pyarrow")

    def item_side(key: str, out: str):
        def f(t: pa.Table) -> pa.Table:
            return pa.table({key: t["part_a"], out: t["n"]})
        return f

    sa = pa.schema([("part_a", pa.int64()), ("cnt_a", pa.int64())])
    sb = pa.schema([("part_b", pa.int64()), ("cnt_b", pa.int64())])
    j = hash_join(pairs, itemc.map_batches(item_side("part_a", "cnt_a"),
                                           batch_format="pyarrow"),
                  on="part_a", size_hint=size_hint,
                  left_schema=pair_schema, right_schema=sa)
    j = hash_join(j, itemc.map_batches(item_side("part_b", "cnt_b"),
                                       batch_format="pyarrow"),
                  on="part_b", size_hint=size_hint,
                  left_schema=pa.schema([("part_b", pa.int64()),
                                         ("part_a", pa.int64()),
                                         ("support", pa.int64()),
                                         ("cnt_a", pa.int64())]),
                  right_schema=sb)

    def lift(t: pa.Table) -> pa.Table:
        s = t["support"].to_numpy(zero_copy_only=False)
        ca = t["cnt_a"].to_numpy(zero_copy_only=False)
        cb = t["cnt_b"].to_numpy(zero_copy_only=False)
        lm = (int(n_baskets) * s * 1_000_000) // (ca * cb)
        return pa.table({
            "part_a": t["part_a"], "part_b": t["part_b"],
            "support": t["support"],
            "lift_micro": pa.array(lm, pa.int64())})

    return j.map_batches(lift, batch_format="pyarrow")
