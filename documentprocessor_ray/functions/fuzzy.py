"""Fuzzy string matching: bounded-distance Levenshtein self-join over the
DISTINCT values of a string column.

Reference parity: the reference's field consolidation fuzzily merges vendor
spellings (Ocr/src heuristics); this generalizes that into a first-class
pair-finding operator, the string analog of the embedding near-dup family.

Plan (all exchanges bounded by the DISTINCT-value domain, not corpus rows):
  1. distinct values via one bucketed (hash, value) shuffle — dictionary
     pass; a fuzzy join runs over the VOCABULARY, which is orders of
     magnitude smaller than the corpus;
  2. LENGTH BLOCKING that exactly covers the |len(a)-len(b)| <= band
     predicate: every value of length L is emitted to blocks
     [L-band .. L], and a pair materializes only in the block equal to its
     SMALLER length — each candidate pair is examined exactly once, no
     post-hoc dedup exchange;
  3. in-block banded Levenshtein (Ukkonen cutoff at max_dist: the DP only
     fills the +-max_dist diagonal stripe and abandons a row whose stripe
     minimum already exceeds the cutoff).

The in-block pair loop is Python over the blocked vocabulary — bounded by
block sizes, not data size; at 100 TB the vocabulary block is the unit that
must fit a reducer, which the length blocking guarantees for natural-language
name domains.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..sharding import auto_buckets, bucket_of_strs


def _lev_banded(a: str, b: str, k: int) -> int:
    """Levenshtein distance, early-exit if > k (returns k+1 then).
    Unit costs; standard DP restricted to the +-k diagonal stripe."""
    la, lb = len(a), len(b)
    if abs(la - lb) > k:
        return k + 1
    if la > lb:
        a, b, la, lb = b, a, lb, la
    prev = list(range(la + 1))
    for j in range(1, lb + 1):
        cj = b[j - 1]
        lo = max(1, j - k)
        hi = min(la, j + k)
        cur = [0] * (la + 1)
        cur[0] = j
        if lo > 1:
            cur[lo - 1] = k + 1
        best = cur[0] if lo == 1 else k + 1
        for i in range(lo, hi + 1):
            cost = 0 if a[i - 1] == cj else 1
            v = min(prev[i] + 1, cur[i - 1] + 1, prev[i - 1] + cost)
            cur[i] = v
            if v < best:
                best = v
        for i in range(hi + 1, la + 1):
            cur[i] = k + 1
        if best > k:
            return k + 1
        prev = cur
    return prev[la] if prev[la] <= k else k + 1


def fuzzy_pairs(
    ds: "ray.data.Dataset",
    column: str,
    max_dist: int = 3,
    len_band: int = 2,
    num_buckets: Optional[int] = None,
) -> "ray.data.Dataset":
    """All unordered pairs of DISTINCT ``column`` values with
    |len(a)-len(b)| <= len_band and levenshtein(a,b) <= max_dist.
    Output: (name_a, name_b, dist) with name_a < name_b."""
    nb = num_buckets or auto_buckets(None)  # driver-resolved ONCE

    def local_distinct(b: pa.Table) -> pa.Table:
        vals = pc.unique(b[column].combine_chunks())
        return pa.table({"v": pc.cast(vals, pa.string())})

    def add_pkey(b: pa.Table) -> pa.Table:
        return b.append_column(
            "pkey", pa.array(bucket_of_strs(b["v"].to_pylist(), nb),
                             pa.int64()))

    def bucket_distinct(g: pa.Table) -> pa.Table:
        vals = pc.unique(g["v"].combine_chunks())
        return pa.table({"v": vals})

    distinct = ds.map_batches(local_distinct, batch_format="pyarrow") \
        .map_batches(add_pkey, batch_format="pyarrow") \
        .groupby("pkey").map_groups(bucket_distinct, batch_format="pyarrow")

    def emit_blocks(b: pa.Table) -> pa.Table:
        vs, blocks = [], []
        for v in b["v"].to_pylist():
            lo = max(0, len(v) - len_band)
            for blk in range(lo, len(v) + 1):
                vs.append(v)
                blocks.append(blk)
        return pa.table({"v": pa.array(vs, pa.string()),
                         "blk": pa.array(blocks, pa.int64())})

    def block_pairs(g: pa.Table) -> pa.Table:
        blk = int(g["blk"][0].as_py())
        vals = sorted(set(g["v"].to_pylist()))
        short = [v for v in vals if len(v) == blk]
        out_a, out_b, out_d = [], [], []
        for a in short:
            # a's length IS the block key, so min(len) == blk holds and this
            # block is the unique owner of every (a, longer) pair; equal-
            # length pairs are owned once via the lexicographic guard.
            for b2 in vals:
                if len(b2) == blk and b2 <= a:
                    continue  # short-short pair counted at the smaller name
                if len(b2) < blk:
                    continue
                d = _lev_banded(a, b2, max_dist)
                if d <= max_dist:
                    lo_, hi_ = (a, b2) if a < b2 else (b2, a)
                    out_a.append(lo_)
                    out_b.append(hi_)
                    out_d.append(d)
        return pa.table({"name_a": pa.array(out_a, pa.string()),
                         "name_b": pa.array(out_b, pa.string()),
                         "dist": pa.array(out_d, pa.int64())})

    return distinct.map_batches(emit_blocks, batch_format="pyarrow") \
        .groupby("blk").map_groups(block_pairs, batch_format="pyarrow")


def snm_pairs(
    ds: "ray.data.Dataset",
    column: str,
    window: int = 3,
    max_dist: int = 3,
    rows_per_bucket: int = 65536,
) -> "ray.data.Dataset":
    """Sorted-neighborhood-method entity-resolution pairs (Hernandez &
    Stolfo 1995): all unordered pairs of DISTINCT ``column`` values whose
    positions in the global sorted order differ by <= ``window`` and whose
    Levenshtein distance is <= ``max_dist``. The complementary blocking to
    ``fuzzy_pairs``'s length blocks: SNM catches near-duplicates that sort
    adjacently (shared prefixes, serial IDs) at O(n*w) comparisons total.

    Scale shape: ONE distinct exchange (vocabulary-sized), then a
    TeraSort-style string rank (global_rank's integer sample-sort leg,
    re-derived for strings): a deterministic hash-sample of the distinct
    values yields sorted split points (driver holds the bounded sample
    only), values range-bucket by searchsorted, per-bucket counts give
    cross-bucket rank offsets (num_buckets scalars), and each bucket ranks
    locally. Window pairs own exactly one bucket (the min rank's); the
    first ``window`` rows of each bucket also ride to the previous bucket
    as overlap partners. In-bucket comparisons are the banded DP, w per
    value. Output: (name_a, name_b, dist) with name_a < name_b."""


    nb = auto_buckets(None)

    def local_distinct(b: pa.Table) -> pa.Table:
        vals = pc.unique(b[column].combine_chunks())
        return pa.table({"v": pc.cast(vals, pa.string())})

    def add_pkey(b: pa.Table) -> pa.Table:
        return b.append_column(
            "pkey", pa.array(bucket_of_strs(b["v"].to_pylist(), nb),
                             pa.int64()))

    def bucket_distinct(g: pa.Table) -> pa.Table:
        vals = pc.unique(g["v"].combine_chunks())
        return pa.table({"v": vals})

    # materialize ONCE: three consumers follow (count, split sample, rank
    # assignment) and the handle is vocabulary-bounded by the same
    # assumption the ranking itself rests on — without this the distinct
    # exchange re-executes per consumer (measured 3x the op's cost)
    distinct = ds.map_batches(local_distinct, batch_format="pyarrow") \
        .map_batches(add_pkey, batch_format="pyarrow") \
        .groupby("pkey").map_groups(bucket_distinct,
                                    batch_format="pyarrow").materialize()

    import zlib

    # ---- sample-sort split points (driver holds only the bounded sample)
    n_distinct = max(1, distinct.count())
    rate = max(1, n_distinct // (nb * 64))  # expected sample ~ nb*64

    def sample_vals(b: pa.Table) -> pa.Table:
        vs = [v for v in b["v"].to_pylist()
              if zlib.crc32(v.encode()) % rate == 0]
        return pa.table({"v": pa.array(vs, pa.string())})

    sample = sorted(
        r["v"] for r in distinct.map_batches(
            sample_vals, batch_format="pyarrow").take_all())
    if sample and nb > 1:
        idx = [((i + 1) * len(sample)) // nb for i in range(nb - 1)]
        splits = sorted({sample[min(j, len(sample) - 1)] for j in idx})
    else:
        splits = []
    splits_arr = np.array(splits, dtype=object)

    def assign_rb(b: pa.Table) -> pa.Table:
        vs = np.array(b["v"].to_pylist(), dtype=object)
        rb = (np.searchsorted(splits_arr, vs, side="right")
              if len(splits_arr) else np.zeros(len(vs), np.int64))
        return pa.table({"rb": pa.array(rb.astype(np.int64), pa.int64()),
                         "v": pa.array(vs.tolist(), pa.string())})

    ranged = distinct.map_batches(assign_rb, batch_format="pyarrow")

    # per-range-bucket counts -> cross-bucket rank offsets (driver holds
    # at most len(splits)+1 scalars per batch partial)
    def rb_counts(b: pa.Table) -> pa.Table:
        t = b.select(["rb"]).group_by("rb").aggregate([([], "count_all")])
        return pa.table({"rb": t["rb"],
                         "c": pc.cast(t["count_all"], pa.int64())})

    agg: dict = {}
    for r in ranged.map_batches(rb_counts,
                                batch_format="pyarrow").take_all():
        agg[int(r["rb"])] = agg.get(int(r["rb"]), 0) + int(r["c"])
    offsets: dict = {}
    run = 0
    for rb in range(len(splits) + 1):
        offsets[rb] = run
        run += agg.get(rb, 0)

    def rank_windows(g: pa.Table) -> pa.Table:
        rb = int(g["rb"][0].as_py())
        vals = sorted(g["v"].to_pylist())
        off = offsets[rb]
        out_r, out_v, out_p, out_n = [], [], [], []
        for i, v in enumerate(vals):
            r = off + i
            out_r.append(r)
            out_v.append(v)
            out_p.append(rb)
            out_n.append(True)
            # boundary overlap: copy to EVERY earlier bucket whose native
            # rank range reaches back into [r-window, r-1] — buckets can
            # hold fewer than `window` values, so one hop is not enough
            b2 = rb - 1
            while b2 >= 0 and offsets[b2 + 1] - 1 >= r - window:
                out_r.append(r)
                out_v.append(v)
                out_p.append(b2)
                out_n.append(False)
                b2 -= 1
        return pa.table({"rk": pa.array(out_r, pa.int64()),
                         "v": pa.array(out_v, pa.string()),
                         "pkey": pa.array(out_p, pa.int64()),
                         "native": pa.array(out_n, pa.bool_())})

    win = ranged.groupby("rb").map_groups(rank_windows,
                                          batch_format="pyarrow")

    def window_pairs(g: pa.Table) -> pa.Table:
        rk = g["rk"].to_numpy(zero_copy_only=False)
        nat = g["native"].to_numpy(zero_copy_only=False)
        order = np.argsort(rk, kind="stable")
        rk, nat = rk[order], nat[order]
        vals = [g["v"][int(i)].as_py() for i in order]
        out_a, out_b, out_d = [], [], []
        for i in range(len(rk)):
            if not nat[i]:
                continue  # overlap copies never OWN pairs
            for j in range(i + 1, len(rk)):
                if rk[j] - rk[i] > window:
                    break
                d = _lev_banded(vals[i], vals[j], max_dist)
                if d <= max_dist:
                    lo_, hi_ = ((vals[i], vals[j])
                                if vals[i] < vals[j]
                                else (vals[j], vals[i]))
                    out_a.append(lo_)
                    out_b.append(hi_)
                    out_d.append(d)
        return pa.table({"name_a": pa.array(out_a, pa.string()),
                         "name_b": pa.array(out_b, pa.string()),
                         "dist": pa.array(out_d, pa.int64())})

    return win.groupby("pkey").map_groups(window_pairs,
                                          batch_format="pyarrow")
