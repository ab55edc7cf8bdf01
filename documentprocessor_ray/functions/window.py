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


def global_rank(
    ds: "ray.data.Dataset",
    key: str,
    tie_col: str,
    descending: bool = True,
    n_tiles: Optional[int] = None,
    num_buckets: Optional[int] = None,
    max_driver_keys: int = 65536,
) -> "ray.data.Dataset":
    """Dense global ordering (``row_number() OVER (ORDER BY key, tie_col)``)
    without a global sort: the zipWithIndex primitive.

    Two regimes, switched on the measured DISTINCT count of ``key``:

    * **small cardinality** (≤ ``max_driver_keys``, e.g. document lengths,
      dates): a combiner-first per-key-value count aggregate (one row per
      distinct value) whose cumulative sums become each value's rank
      offset; broadcast once with ``ray.put``, then one hash shuffle of
      (key, tie_col) rows — inside each bucket a single lexsort ranks
      every key-group at once.
    * **high cardinality** (> ``max_driver_keys``): the driver NEVER holds
      the histogram. Distinct-key counts stay a Dataset; keys are
      range-bucketed by value, per-bucket totals (≤ ``num_buckets``
      scalars) give cross-bucket cumulative offsets on the driver, and
      per-key offsets are derived INSIDE each bucket (local sort + cumsum
      of the bucket's distinct keys) co-grouped with that bucket's data
      rows in one shuffle. Driver state: ``num_buckets`` scalars + 3
      aggregates, independent of distinct-key count.

    ``n_tiles`` additionally emits the exact SQL ``ntile(n)`` bucket
    (first n_rows % n tiles get the larger size), computed from the global
    rank in closed form. Skew note: one key VALUE's rows co-locate; for keys
    with pathological multiplicity pre-aggregate or salt upstream.
    """
    if num_buckets is None:
        num_buckets = auto_buckets(None)

    def partial_counts(b: pa.Table) -> pa.Table:
        t = pa.table({key: b[key]}).group_by(key).aggregate([([], "count_all")])
        return pa.table({key: t[key],
                         "c": pc.cast(t["count_all"], pa.int64())})

    counts = ds.map_batches(partial_counts, batch_format="pyarrow") \
        .groupby(key).aggregate(ray.data.aggregate.Sum("c")).materialize()
    if counts.count() > max_driver_keys:
        return _global_rank_distributed(
            ds, counts, key, tie_col, descending, n_tiles, num_buckets)
    # driver holds one row per distinct key VALUE (not per input row),
    # bounded by max_driver_keys
    ct = counts.to_pandas()
    order = np.argsort(ct[key].to_numpy())
    if descending:
        order = order[::-1]
    keys_sorted = ct[key].to_numpy()[order]
    cnts_sorted = ct["sum(c)"].to_numpy().astype(np.int64)[order]
    offsets = np.concatenate([[0], np.cumsum(cnts_sorted)[:-1]])
    total = int(cnts_sorted.sum())
    # lookup arrays sorted by key for worker-side searchsorted
    lut_order = np.argsort(keys_sorted)
    lut_keys = keys_sorted[lut_order]
    lut_offsets = offsets[lut_order]
    shared = ray.put((lut_keys, lut_offsets))

    def add_pkey(b: pa.Table) -> pa.Table:
        kv = b[key].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            key: b[key], tie_col: b[tie_col],
            "pkey": pa.array(bucket_of_ints(kv, num_buckets), pa.int64()),
        })

    def rank_bucket(g: pa.Table) -> pa.Table:
        lk, lo = ray.get(shared)
        kv = g[key].to_numpy(zero_copy_only=False).astype(np.int64)
        tv = g[tie_col].to_numpy(zero_copy_only=False).astype(np.int64)
        srt = np.lexsort((tv, -kv if descending else kv))
        kv_s, tv_s = kv[srt], tv[srt]
        # position within each key group (groups are contiguous after sort)
        starts = np.flatnonzero(np.r_[True, kv_s[1:] != kv_s[:-1]])
        within = np.arange(len(kv_s)) - np.repeat(starts, np.diff(
            np.r_[starts, len(kv_s)]))
        rank = lo[np.searchsorted(lk, kv_s)] + within + 1
        cols = {key: pa.array(kv_s, pa.int64()),
                tie_col: pa.array(tv_s, pa.int64()),
                "rnk": pa.array(rank, pa.int64())}
        if n_tiles:
            name, col = _ntile_col(rank, total, n_tiles)
            cols[name] = col
        return pa.table(cols)

    return ds.map_batches(add_pkey, batch_format="pyarrow") \
        .groupby("pkey").map_groups(rank_bucket, batch_format="pyarrow")


def _ntile_col(rank: np.ndarray, total: int, n_tiles: int):
    """Exact SQL ntile(n) from the global rank in closed form (first
    ``total % n`` tiles get the larger size). Returns (column_name,
    int64 array) — shared by both global_rank legs so their outputs
    cannot diverge."""
    n, k = total, n_tiles
    big = n % k
    size_big, size_small = -(-n // k), n // k
    cut = big * size_big
    tile = np.where(
        rank <= cut,
        -(-rank // max(size_big, 1)),
        big + -(-(rank - cut) // max(size_small, 1)))
    return ("quartile" if k == 4 else f"tile{k}",
            pa.array(tile.astype(np.int64), pa.int64()))


def _global_rank_distributed(
    ds: "ray.data.Dataset",
    counts: "ray.data.Dataset",
    key: str,
    tie_col: str,
    descending: bool,
    n_tiles: Optional[int],
    num_buckets: int,
) -> "ray.data.Dataset":
    """High-cardinality leg of :func:`global_rank`: per-key rank offsets are
    computed distributed, never collected.

    ``counts`` is the materialized (key, c=count) distinct-key dataset.
    Keys are partitioned into ``num_buckets`` contiguous VALUE ranges (so
    bucket order == key order) whose boundaries come from a DETERMINISTIC
    hash-sample of the distinct keys (TeraSort-style sample-sort split
    points, ~64 sampled keys per bucket) — equal-WIDTH ranges would
    collapse under outlier keys (one sentinel next to epoch-nano
    timestamps puts every real key in one bucket). The driver holds the
    bounded sample + per-bucket row totals, turns the totals into
    cross-bucket cumulative offsets (``num_buckets`` int64s, broadcast
    via ``ray.put``), and one shuffle co-groups each bucket's
    distinct-key counts with its data rows. Inside the group the bucket's
    own keys are sorted + cumsum'd to per-key offsets and the data rows
    ranked against them — identical output to the broadcast-LUT leg at
    ANY choice of boundaries (they only steer load balance). Balance is
    over DISTINCT keys; a single key value's rows still co-locate (the
    documented skew caveat)."""
    import ray.data.aggregate as _agg

    mm = counts.aggregate(_agg.Min(key), _agg.Max(key),
                          _agg.Sum("sum(c)"))
    kmin = int(mm[f"min({key})"])
    kmax = int(mm[f"max({key})"])
    total = int(mm["sum(sum(c))"])
    span = kmax - kmin + 1  # Python ints: no int64 overflow
    nb = max(1, min(num_buckets, span))

    # deterministic hash-stride sample of distinct keys -> split points
    n_distinct = counts.count()  # metadata: counts is materialized
    stride = max(1, n_distinct // (nb * 64))

    def sample_keys(b: pa.Table) -> pa.Table:
        kv = b[key].to_numpy(zero_copy_only=False).astype(np.int64)
        if stride > 1:
            h = kv.view(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
            kv = kv[h % np.uint64(stride) == 0]
        return pa.table({"s": pa.array(kv, pa.int64())})

    samp = np.sort(counts.map_batches(
        sample_keys, batch_format="pyarrow").to_pandas()["s"].to_numpy())
    if len(samp) >= nb:
        bounds = samp[np.linspace(0, len(samp) - 1,
                                  nb + 1).astype(np.int64)[1:-1]]
    else:  # degenerate sample: fall back to equal-width split points
        width = -(-span // nb)
        bounds = np.array([min(kmin + width * i, (1 << 63) - 1)
                           for i in range(1, nb)], np.int64)

    def rb_of(vals: np.ndarray) -> np.ndarray:
        return np.searchsorted(bounds, vals.astype(np.int64),
                               side="right").astype(np.int64)

    def count_rows(b: pa.Table) -> pa.Table:
        kv = b[key].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({key: pa.array(kv, pa.int64()),
                         "v": pc.cast(b["sum(c)"], pa.int64()),
                         "rb": pa.array(rb_of(kv), pa.int64()),
                         "tag": pa.array(np.ones(len(kv), np.int64))})

    # per-bucket totals -> driver: <= num_buckets rows, NOT per-key
    ckeys = counts.map_batches(count_rows, batch_format="pyarrow") \
        .materialize()

    def bucket_partials(b: pa.Table) -> pa.Table:
        t = pa.table({"rb": b["rb"], "v": b["v"]}).group_by("rb") \
            .aggregate([("v", "sum")])
        return pa.table({"rb": t["rb"], "bc": t["v_sum"]})

    bt = ckeys.map_batches(bucket_partials, batch_format="pyarrow") \
        .groupby("rb").aggregate(ray.data.aggregate.Sum("bc")).to_pandas()
    rb_ids = bt["rb"].to_numpy().astype(np.int64)
    rb_tot = bt["sum(bc)"].to_numpy().astype(np.int64)
    order = np.argsort(rb_ids)
    if descending:
        order = order[::-1]
    boff = np.zeros(nb, np.int64)
    boff[rb_ids[order]] = np.concatenate(
        [[0], np.cumsum(rb_tot[order])[:-1]])
    shared = ray.put(boff)

    def data_rows(b: pa.Table) -> pa.Table:
        kv = b[key].to_numpy(zero_copy_only=False).astype(np.int64)
        tv = b[tie_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({key: pa.array(kv, pa.int64()),
                         "v": pa.array(tv, pa.int64()),
                         "rb": pa.array(rb_of(kv), pa.int64()),
                         "tag": pa.array(np.zeros(len(kv), np.int64))})

    unioned = ds.map_batches(data_rows, batch_format="pyarrow").union(ckeys)

    def rank_group(g: pa.Table) -> pa.Table:
        bo = ray.get(shared)
        tag = g["tag"].to_numpy(zero_copy_only=False)
        kv = g[key].to_numpy(zero_copy_only=False).astype(np.int64)
        vv = g["v"].to_numpy(zero_copy_only=False).astype(np.int64)
        rb = int(g["rb"][0].as_py())
        cmask = tag == 1
        ck, cc = kv[cmask], vv[cmask]
        o = np.argsort(-ck if descending else ck)
        off = bo[rb] + np.concatenate([[0], np.cumsum(cc[o])[:-1]])
        lut_order = np.argsort(ck[o])
        lut_keys = ck[o][lut_order]
        lut_off = off[lut_order]
        dk, dt = kv[~cmask], vv[~cmask]
        srt = np.lexsort((dt, -dk if descending else dk))
        dk_s, dt_s = dk[srt], dt[srt]
        starts = np.flatnonzero(np.r_[True, dk_s[1:] != dk_s[:-1]]) \
            if len(dk_s) else np.zeros(0, np.int64)
        within = np.arange(len(dk_s)) - np.repeat(
            starts, np.diff(np.r_[starts, len(dk_s)]))
        rank = lut_off[np.searchsorted(lut_keys, dk_s)] + within + 1
        cols = {key: pa.array(dk_s, pa.int64()),
                tie_col: pa.array(dt_s, pa.int64()),
                "rnk": pa.array(rank, pa.int64())}
        if n_tiles:
            name, col = _ntile_col(rank, total, n_tiles)
            cols[name] = col
        return pa.table(cols)

    return unioned.groupby("rb").map_groups(
        rank_group, batch_format="pyarrow")


def pack_sequences(ds: "ray.data.Dataset", n_col: str = "n_tokens",
                   order_col: str = "doc_id", bin_size: int = 512,
                   carry_cols: Optional[List[str]] = None,
                   num_buckets: Optional[int] = None) -> "ray.data.Dataset":
    """GPT-style sequence packing: concatenate the corpus's token streams in
    ``order_col`` order, cut the concatenation into fixed ``bin_size``-token
    bins, and emit one row per (doc, bin) overlap with the doc-local token
    span ``[tok_start, tok_end)`` that lands in that bin — the
    concatenate-and-chunk layout LM training batches are built from. Docs
    with 0 tokens emit nothing.

    Scale shape: the global running offset is the only cross-partition
    dependency, so the input is RANGE-partitioned on ``order_col`` into
    ``num_buckets`` contiguous slices and materialized ONCE (narrow rows:
    id + count + pkey); per-slice token totals — one int64 per slice, the
    only driver-side data — prefix-sum into each slice's global starting
    offset, closed over by the reducer. Each slice then computes its docs'
    global cumsum locally and expands bin overlaps with one repeat/arange —
    no per-doc loop, no second pass over the text. Partitioning assumption:
    ``order_col`` is roughly uniform over its range (true for dense ids and
    for hash-valued shuffle keys); replace the linear split with a sampled
    CDF for skewed keys. ``carry_cols``: per-doc columns copied through to
    every overlap row (e.g. the real doc_id when order_col is a shuffle
    hash). ``order_col`` must be total (unique) — ties make the global
    concatenation order ambiguous."""
    from ray.data.aggregate import Max, Min, Sum

    agg = ds.aggregate(Min(order_col), Max(order_col))
    lo, hi = agg[f"min({order_col})"], agg[f"max({order_col})"]
    span = max(1, int(hi) - int(lo) + 1)
    nb = num_buckets or auto_buckets(None)
    nb = min(nb, span)
    B = np.int64(bin_size)

    carry = carry_cols or []

    chunk = np.int64(-(-span // nb))  # ceil: monotone, overflow-free for
    #                                    hash-valued 60+ bit order keys
    #                                    ((oid-lo)*nb would overflow int64)

    def add_pkey(b: pa.Table) -> pa.Table:
        oid = b[order_col].to_numpy(zero_copy_only=False).astype(np.int64)
        pk = (oid - np.int64(lo)) // chunk
        return pa.table({order_col: b[order_col], n_col: b[n_col],
                         **{c: b[c] for c in carry},
                         "pkey": pa.array(pk, pa.int64())})

    tagged = ds.map_batches(add_pkey, batch_format="pyarrow").materialize()

    # per-slice totals -> global starting offset per slice (nb ints)
    totals = tagged.groupby("pkey").aggregate(Sum(n_col)).to_pandas()
    totals = totals.sort_values("pkey")
    csum = totals[f"sum({n_col})"].astype("int64").cumsum()
    offsets = dict(zip(totals["pkey"].astype("int64"),
                       (csum - totals[f"sum({n_col})"].astype("int64"))))

    def pack_bucket(g: pa.Table) -> pa.Table:
        empty = pa.table({
            order_col: pa.array([], pa.int64()),
            **{c: pa.array([], g.schema.field(c).type) for c in carry},
            "bin_id": pa.array([], pa.int64()),
            "tok_start": pa.array([], pa.int64()),
            "tok_end": pa.array([], pa.int64())})
        if g.num_rows == 0:
            return empty
        t = g.sort_by([(order_col, "ascending")])
        oid = t[order_col].to_numpy(zero_copy_only=False).astype(np.int64)
        n = t[n_col].to_numpy(zero_copy_only=False).astype(np.int64)
        off = np.int64(offsets[int(t["pkey"][0].as_py())])
        before = off + np.cumsum(n) - n
        m = n > 0
        if not m.any():
            return empty
        pos = np.flatnonzero(m)  # row index into the sorted table
        oid, n, before = oid[m], n[m], before[m]
        lo_b = before // B
        hi_b = (before + n - 1) // B
        cnt = hi_b - lo_b + 1
        rows = np.repeat(np.arange(len(n)), cnt)
        k = np.arange(cnt.sum()) - np.repeat(np.cumsum(cnt) - cnt, cnt)
        bin_id = lo_b[rows] + k
        tok_start = np.maximum(0, bin_id * B - before[rows])
        tok_end = np.minimum(n[rows], (bin_id + 1) * B - before[rows])
        take = pa.array(pos[rows], pa.int64())
        return pa.table({
            order_col: pa.array(oid[rows], pa.int64()),
            **{c: t[c].take(take) for c in carry},
            "bin_id": pa.array(bin_id, pa.int64()),
            "tok_start": pa.array(tok_start, pa.int64()),
            "tok_end": pa.array(tok_end, pa.int64())})

    return tagged.groupby("pkey").map_groups(pack_bucket,
                                             batch_format="pyarrow")


def rolling_sum(
    ds: "ray.data.Dataset",
    key: str,
    order_cols: List[str],
    sum_col: str,
    window_rows: int = 3,
    num_buckets: Optional[int] = None,
) -> "ray.data.Dataset":
    """Per distinct ``key``, ordered by ``order_cols`` (int64, unique per
    partition): append ``rolling_<sum_col>`` — the inclusive sum of the
    last ``window_rows`` rows (SQL ``ROWS BETWEEN window_rows-1 PRECEDING
    AND CURRENT ROW``). Same one-shuffle plan as running_sum_lag; the
    window is a cumsum difference with the lag index clamped at each
    partition's start, so short heads sum what exists."""
    if num_buckets is None:
        num_buckets = auto_buckets(None)
    w = int(window_rows)

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
        if n == 0:
            return g.drop_columns(["pkey"]).append_column(
                f"rolling_{sum_col}", pa.array([], pa.int64()))
        first = np.r_[True, sk[1:] != sk[:-1]]
        s = g[sum_col].combine_chunks().to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        csum = np.cumsum(s)
        starts = np.flatnonzero(first)
        seg_id = np.cumsum(first) - 1
        seg_start = starts[seg_id]
        idx = np.arange(n, dtype=np.int64)
        # exclusive lower bound: max(row - w, segment start - 1)
        lo = np.maximum(idx - w, seg_start - 1)
        rolling = csum - np.where(lo >= 0, csum[np.maximum(lo, 0)], 0)
        cols = {c: g[c] for c in g.column_names if c != "pkey"}
        cols[f"rolling_{sum_col}"] = pa.array(rolling, pa.int64())
        return pa.table(cols)

    return ds.map_batches(add_pkey, batch_format="pyarrow") \
        .groupby("pkey").map_groups(local, batch_format="pyarrow")


def bfd_pack_reference(items, bin_size: int):
    """Independent single-process best-fit-decreasing packer (the oracle
    twin's kernel — plain Python lists, no numpy). ``items`` is a list of
    (doc_id, chunk_idx, length, is_full) tuples from ONE partition.
    Returns rows (doc_id, chunk_idx, item_len, bin_idx, slot)."""
    full = sorted([t for t in items if t[3]], key=lambda t: (t[0], t[1]))
    pool = sorted([t for t in items if not t[3]],
                  key=lambda t: (-t[2], t[0], t[1]))
    rows = []
    for b, (did, ci, ln, _) in enumerate(full):
        rows.append((did, ci, ln, b, 0))
    nfull = len(full)
    residuals: list = []  # residual capacity per open pool bin
    fills: list = []      # item count per open pool bin
    for did, ci, ln, _ in pool:
        best = -1
        for i, r in enumerate(residuals):
            if r >= ln and (best < 0 or r < residuals[best]):
                best = i
        if best < 0:
            residuals.append(bin_size - ln)
            fills.append(1)
            rows.append((did, ci, ln, nfull + len(residuals) - 1, 0))
        else:
            rows.append((did, ci, ln, nfull + best, fills[best]))
            residuals[best] -= ln
            fills[best] += 1
    return rows


def pack_bfd(ds: "ray.data.Dataset", n_col: str = "n_tokens",
             id_col: str = "doc_id", bin_size: int = 512,
             part_size: int = 4096) -> "ray.data.Dataset":
    """Best-fit-decreasing DOC-ATOMIC sequence packing (Ding et al. 2024,
    "Fewer Truncations Improve Language Modeling"): unlike the GPT-style
    concat-and-cut (``pack_sequences``), a document shorter than
    ``bin_size`` is NEVER split across training sequences — bins are
    filled by best-fit over whole documents, so the only truncations are
    docs longer than a bin (pre-split into full-bin chunks + a remainder
    that joins the pool, the paper's treatment).

    Deterministic spec (what the oracle replays):
      - doc with n tokens -> ceil(n/bin_size) items; items 0..k-2 are
        full-bin chunks, each a dedicated bin; the remainder enters the
        BFD pool — unless it is exactly bin_size tokens (n divisible by
        bin_size), which is also a dedicated bin. n = 0 emits nothing.
      - partition = doc_id // part_size; packing runs per partition.
      - dedicated bins first, numbered 0..F-1 in (doc_id, chunk_idx)
        order; pool items sorted by (len desc, doc_id, chunk_idx), each
        placed in the open bin with the SMALLEST residual that fits
        (ties -> lowest bin index), else a new bin.

    Output: one row per item — (part, bin_idx, slot, doc_id, chunk_idx,
    item_len), ``slot`` = placement order within the bin.

    Scale shape: items are 5 int64s (text never moves); ONE groupby
    exchange on the doc-range partition key; each partition packs
    independently (greedy packing is sequential only WITHIN a partition —
    the documented assumption is that padding efficiency is measured per
    ``part_size``-doc slice, which at corpus scale is statistically
    indistinguishable from global packing). The in-kernel scan is a
    vectorized residual argmin per item."""
    B = int(bin_size)

    def explode(b: pa.Table) -> pa.Table:
        did = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        n = b[n_col].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = n > 0
        did, n = did[keep], n[keep]
        k = -(-n // B)  # chunks per doc
        tot = int(k.sum())
        rep_did = np.repeat(did, k)
        # chunk_idx 0..k-1 per doc via global arange minus segment starts
        starts = np.repeat(np.cumsum(k) - k, k)
        ci = np.arange(tot, dtype=np.int64) - starts
        is_last = ci == np.repeat(k - 1, k)
        rem = np.repeat(n - (k - 1) * B, k)
        ln = np.where(is_last, rem, B)
        return pa.table({
            "doc_id": pa.array(rep_did, pa.int64()),
            "chunk_idx": pa.array(ci, pa.int64()),
            "item_len": pa.array(ln, pa.int64()),
            "is_full": pa.array(~is_last | (ln == B), pa.bool_()),
            "part": pa.array(rep_did // np.int64(part_size), pa.int64()),
        })

    def pack_part(g: pa.Table) -> pa.Table:
        part = int(g["part"][0].as_py())
        did = g["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ci = g["chunk_idx"].to_numpy(zero_copy_only=False).astype(np.int64)
        ln = g["item_len"].to_numpy(zero_copy_only=False).astype(np.int64)
        # a full-length LAST chunk is still a dedicated bin (is_full above
        # marks len == B remainders full) — matches the reference split
        isf = g["is_full"].to_numpy(zero_copy_only=False)

        out_d, out_c, out_l, out_b, out_s = [], [], [], [], []
        forder = np.lexsort((ci[isf], did[isf]))
        fd, fc, fl = did[isf][forder], ci[isf][forder], ln[isf][forder]
        out_d.extend(fd.tolist())
        out_c.extend(fc.tolist())
        out_l.extend(fl.tolist())
        out_b.extend(range(len(fd)))
        out_s.extend([0] * len(fd))
        nfull = len(fd)

        pool = ~isf
        porder = np.lexsort((ci[pool], did[pool], -ln[pool]))
        pd, pc_, pl = did[pool][porder], ci[pool][porder], ln[pool][porder]
        residuals = np.empty(len(pd), dtype=np.int64)
        fills = np.empty(len(pd), dtype=np.int64)
        nb = 0
        for i in range(len(pd)):
            L = pl[i]
            r = residuals[:nb]
            fit = r >= L
            if fit.any():
                cand = np.where(fit, r, np.iinfo(np.int64).max)
                best = int(np.argmin(cand))  # ties -> lowest index
                out_b.append(nfull + best)
                out_s.append(int(fills[best]))
                residuals[best] -= L
                fills[best] += 1
            else:
                residuals[nb] = B - L
                fills[nb] = 1
                out_b.append(nfull + nb)
                out_s.append(0)
                nb += 1
            out_d.append(int(pd[i]))
            out_c.append(int(pc_[i]))
            out_l.append(int(L))
        return pa.table({
            "part": pa.array([part] * len(out_d), pa.int64()),
            "bin_idx": pa.array(out_b, pa.int64()),
            "slot": pa.array(out_s, pa.int64()),
            "doc_id": pa.array(out_d, pa.int64()),
            "chunk_idx": pa.array(out_c, pa.int64()),
            "item_len": pa.array(out_l, pa.int64()),
        })

    return ds.map_batches(explode, batch_format="pyarrow") \
        .groupby("part").map_groups(pack_part, batch_format="pyarrow")


def assemble_packed_bins(ids_ds: "ray.data.Dataset",
                         assign_ds: "ray.data.Dataset",
                         bin_size: int = 512, pad_id: int = 0,
                         num_buckets: Optional[int] = None
                         ) -> "ray.data.Dataset":
    """Materialize pack_bfd's assignments into actual padded training
    sequences: each (part, bin_idx) bin gathers its items' token slices
    in slot order and pads to ``bin_size`` with ``pad_id``. Output:
    (bin_key = part * 2^32 + bin_idx, tokens list<int32> of exactly
    bin_size).

    Two exchanges, token ids move ONCE: assignment rows (5 int64s) hop
    to bucket(doc_id) where each doc's ids are sliced per item, then the
    sliced items (carrying only their own bytes) hop to bucket(bin_key)
    for slot-ordered concatenation. Docs' full token lists are never
    replicated per item and never visit the driver."""
    from ..sharding import auto_buckets, bucket_of_ints

    nb = num_buckets or auto_buckets(None)
    B = int(bin_size)

    def key_ids(b: pa.Table) -> pa.Table:
        did = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "role": pa.array(np.zeros(len(did), np.int64), pa.int64()),
            "doc_id": b["doc_id"],
            "tokens": b["tokens"],
            "chunk_idx": pa.array(np.zeros(len(did), np.int64),
                                  pa.int64()),
            "slot": pa.array(np.zeros(len(did), np.int64), pa.int64()),
            "item_len": pa.array(np.zeros(len(did), np.int64),
                                 pa.int64()),
            "bin_key": pa.array(np.zeros(len(did), np.int64), pa.int64()),
            "pkey": pa.array(bucket_of_ints(did, nb), pa.int64())})

    def key_assign(b: pa.Table) -> pa.Table:
        did = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        part = b["part"].to_numpy(zero_copy_only=False).astype(np.int64)
        bi = b["bin_idx"].to_numpy(zero_copy_only=False).astype(np.int64)
        bk = part * np.int64(1 << 32) + bi
        empty = pa.array(
            np.empty(0, np.int32), pa.int32())
        tok = pa.ListArray.from_arrays(
            pa.array(np.zeros(len(did) + 1, np.int32), pa.int32()),
            empty)
        return pa.table({
            "role": pa.array(np.ones(len(did), np.int64), pa.int64()),
            "doc_id": b["doc_id"],
            "tokens": tok,
            "chunk_idx": b["chunk_idx"],
            "slot": b["slot"],
            "item_len": b["item_len"],
            "bin_key": pa.array(bk, pa.int64()),
            "pkey": pa.array(bucket_of_ints(did, nb), pa.int64())})

    def slice_items(g: pa.Table) -> pa.Table:
        g = g.combine_chunks()
        roles = g["role"].to_numpy(zero_copy_only=False)
        ids_rows = g.filter(pa.array(roles == 0))
        asn = g.filter(pa.array(roles == 1))
        if asn.num_rows == 0:
            return pa.table({
                "bin_key": pa.array(np.empty(0, np.int64), pa.int64()),
                "slot": pa.array(np.empty(0, np.int64), pa.int64()),
                "item": pa.ListArray.from_arrays(
                    pa.array(np.zeros(1, np.int32), pa.int32()),
                    pa.array(np.empty(0, np.int32), pa.int32()))})
        tok_of = {int(d): t for d, t in
                  zip(ids_rows["doc_id"].to_pylist(),
                      ids_rows["tokens"].to_pylist())}
        out_bk, out_slot, out_items = [], [], []
        for d, ci, ln, slot, bk in zip(asn["doc_id"].to_pylist(),
                                       asn["chunk_idx"].to_pylist(),
                                       asn["item_len"].to_pylist(),
                                       asn["slot"].to_pylist(),
                                       asn["bin_key"].to_pylist()):
            ids = tok_of[int(d)]
            out_bk.append(bk)
            out_slot.append(slot)
            out_items.append(ids[ci * B:ci * B + ln])
        return pa.table({
            "bin_key": pa.array(out_bk, pa.int64()),
            "slot": pa.array(out_slot, pa.int64()),
            "item": pa.array(out_items, pa.list_(pa.int32()))})

    def add_binkey_bucket(b: pa.Table) -> pa.Table:
        bk = b["bin_key"].to_numpy(zero_copy_only=False).astype(np.int64)
        return b.append_column(
            "pkey2", pa.array(bucket_of_ints(bk, nb), pa.int64()))

    def assemble(g: pa.Table) -> pa.Table:
        g = g.combine_chunks()
        bk = g["bin_key"].to_numpy(zero_copy_only=False)
        slot = g["slot"].to_numpy(zero_copy_only=False)
        order = np.lexsort((slot, bk))
        items = g["item"].to_pylist()
        out_bk: list = []
        out_tok: list = []
        cur = None
        buf: list = []
        for i in order:
            if bk[i] != cur:
                if cur is not None:
                    buf.extend([pad_id] * (B - len(buf)))
                    out_bk.append(int(cur))
                    out_tok.append(buf)
                cur = bk[i]
                buf = []
            buf.extend(items[i])
        if cur is not None:
            buf.extend([pad_id] * (B - len(buf)))
            out_bk.append(int(cur))
            out_tok.append(buf)
        return pa.table({
            "bin_key": pa.array(out_bk, pa.int64()),
            "tokens": pa.array(out_tok, pa.list_(pa.int32()))})

    unioned = ids_ds.map_batches(key_ids, batch_format="pyarrow").union(
        assign_ds.map_batches(key_assign, batch_format="pyarrow"))
    items = unioned.groupby("pkey").map_groups(slice_items,
                                               batch_format="pyarrow")
    return items.map_batches(add_binkey_bucket, batch_format="pyarrow") \
        .groupby("pkey2").map_groups(assemble, batch_format="pyarrow")
