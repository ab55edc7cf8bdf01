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


def _composite_key_hash(b: pa.Table, keys: List[str]) -> np.ndarray:
    """int64 hash of the composite key tuple for each row (string columns
    crc-hashed once per DISTINCT value via dictionary encoding). Bucketing
    only — exact grouping always happens on the real values in-bucket."""
    import zlib

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
    return h


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
    if num_buckets is None:
        num_buckets = auto_buckets(size_hint, rows_per_bucket=65536)

    def add_pkey(b: pa.Table) -> pa.Table:
        h = _composite_key_hash(b, keys)
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


def grouped_quantile_disc(
    ds: "ray.data.Dataset",
    keys: List[str],
    value: str,
    qs: List[float],
    q_names: Optional[List[str]] = None,
    count_col: str = "n_vals",
    num_buckets: Optional[int] = None,
    size_hint: Optional[int] = None,
) -> "ray.data.Dataset":
    """EXACT discrete quantiles of int64 ``value`` per distinct tuple of
    ``keys`` — a holistic aggregate, distributed as a value histogram.

    DuckDB ``quantile_disc(x, q)`` semantics (probed, all n/q combos): the
    element at 1-based index ``max(1, ceil(q*n))`` of the sorted values,
    with ``q*n`` evaluated in double — reproduced here bit-for-bit so the
    oracle twin hash-matches.

    Plan shape (the 100-TB story): quantiles need the full value multiset
    per group, so the combiner compacts rows to per-batch
    ``(keys, value) -> count`` histogram cells FIRST (for low-cardinality
    values — quantities, scores, bucketed cents — this collapses row count
    to ~distinct-cells-per-batch), then ONE bucketed shuffle on
    hash(keys) co-locates each group's cells, and the per-bucket reducer is
    fully vectorized: merge cells, lexsort by (key, value), one global
    cumsum, and a single ``searchsorted`` per q answers EVERY group in the
    bucket at once (the global cumsum is strictly increasing since counts
    are positive, so offset+target lands inside the right segment). No
    per-group loop, no driver materialization. Skew caveat: one group's
    distinct-value count must fit a reducer; for near-unique values at
    crawl scale, pre-bucket the value (cents -> dollars) or switch to a
    two-pass splitter search.
    """
    if q_names is None:
        q_names = [f"q{int(round(q * 100))}" for q in qs]
    if num_buckets is None:
        num_buckets = auto_buckets(size_hint, rows_per_bucket=65536)

    def combine(b: pa.Table) -> pa.Table:
        t = b.select(keys + [value]).group_by(keys + [value]) \
            .aggregate([([], "count_all")])
        t = pa.table({**{k: t[k] for k in keys + [value]},
                      "cnt": pc.cast(t["count_all"], pa.int64())})
        h = _composite_key_hash(t, keys)
        return t.append_column(
            "pkey", pa.array(bucket_of_ints(h, num_buckets), pa.int64()))

    def local(g: pa.Table) -> pa.Table:
        karrs, starts, val, csum, offsets, n_group = \
            _merged_histogram(g, keys, value)
        out = {k: pa.array(a[starts]) for k, a in zip(keys, karrs)}
        for q, name in zip(qs, q_names):
            # double q*n then ceil: DuckDB's exact index arithmetic
            tgt = np.maximum(1, np.ceil(q * n_group.astype(np.float64))
                             .astype(np.int64))
            idx = np.searchsorted(csum, offsets + tgt, side="left")
            out[name] = pa.array(val[idx], pa.int64())
        out[count_col] = pa.array(n_group, pa.int64())
        return pa.table(out)

    return ds.map_batches(combine, batch_format="pyarrow") \
        .groupby("pkey").map_groups(local, batch_format="pyarrow")


def _merged_histogram(g: pa.Table, keys: List[str], value: str):
    """Merge a bucket's (keys, value, cnt) histogram cells and lay them out
    as contiguous per-group segments sorted by value. Returns
    (key arrays, segment starts, sorted values, global cumsum, per-segment
    count offsets, per-group totals) — the vectorized substrate every
    holistic order-statistic aggregate in this module selects from."""
    t = g.select(keys + [value, "cnt"]).group_by(keys + [value]) \
        .aggregate([("cnt", "sum")])
    val = t[value].to_numpy(zero_copy_only=False).astype(np.int64)
    cnt = t["cnt_sum"].to_numpy(zero_copy_only=False).astype(np.int64)
    karrs = [t[k].combine_chunks().to_numpy(zero_copy_only=False)
             for k in keys]
    order = np.lexsort((val,) + tuple(reversed(karrs)))
    val, cnt = val[order], cnt[order]
    karrs = [a[order] for a in karrs]
    new_seg = np.ones(len(val), dtype=bool)
    if len(val) > 1:
        new_seg[1:] = False
        for a in karrs:
            new_seg[1:] |= a[1:] != a[:-1]
    starts = np.flatnonzero(new_seg)
    csum = np.cumsum(cnt)
    offsets = np.where(starts > 0, csum[starts - 1], 0)
    ends = np.r_[starts[1:], len(val)] - 1
    n_group = csum[ends] - offsets
    return karrs, starts, val, csum, offsets, n_group


def grouped_quantile_cont(
    ds: "ray.data.Dataset",
    keys: List[str],
    value: str,
    qs: List[float],
    q_names: Optional[List[str]] = None,
    count_col: str = "n_vals",
    num_buckets: Optional[int] = None,
    size_hint: Optional[int] = None,
) -> "ray.data.Dataset":
    """EXACT continuous (interpolated) quantiles of int64 ``value`` per key
    tuple — same histogram-merge plan as ``grouped_quantile_disc``, but the
    selector reproduces DuckDB ``quantile_cont`` bit-for-bit (probed across
    n/q combinations): RN = (n-1)*q in double, and when RN is fractional the
    result is v[floor]*(ceil(RN)-RN) + v[ceil]*(RN-floor(RN)) — that exact
    expression shape, NOT lo+(hi-lo)*frac, which rounds differently."""
    if q_names is None:
        q_names = [f"q{int(round(q * 100))}" for q in qs]
    if num_buckets is None:
        num_buckets = auto_buckets(size_hint, rows_per_bucket=65536)

    def combine(b: pa.Table) -> pa.Table:
        t = b.select(keys + [value]).group_by(keys + [value]) \
            .aggregate([([], "count_all")])
        t = pa.table({**{k: t[k] for k in keys + [value]},
                      "cnt": pc.cast(t["count_all"], pa.int64())})
        h = _composite_key_hash(t, keys)
        return t.append_column(
            "pkey", pa.array(bucket_of_ints(h, num_buckets), pa.int64()))

    def local(g: pa.Table) -> pa.Table:
        karrs, starts, val, csum, offsets, n_group = \
            _merged_histogram(g, keys, value)
        out = {k: pa.array(a[starts]) for k, a in zip(keys, karrs)}
        fval = val.astype(np.float64)
        for q, name in zip(qs, q_names):
            rn = (n_group - 1).astype(np.float64) * np.float64(q)
            frn = np.floor(rn)
            crn = np.ceil(rn)
            # order statistic at 0-based position p = 1-based index p+1
            ilo = np.searchsorted(csum, offsets + frn.astype(np.int64) + 1,
                                  side="left")
            ihi = np.searchsorted(csum, offsets + crn.astype(np.int64) + 1,
                                  side="left")
            lo, hi = fval[ilo], fval[ihi]
            interp = lo * (crn - rn) + hi * (rn - frn)
            out[name] = pa.array(np.where(crn == frn, lo, interp),
                                 pa.float64())
        out[count_col] = pa.array(n_group, pa.int64())
        return pa.table(out)

    return ds.map_batches(combine, batch_format="pyarrow") \
        .groupby("pkey").map_groups(local, batch_format="pyarrow")


def log_bin(v: np.ndarray, sub_bits: int) -> np.ndarray:
    """HDR-style integer log bin (exponent + sub_bits mantissa bits) — pure
    integer ops, bit-reproducible; shared by grouped_quantile_approx and
    its single-process oracle dump. Negative/zero clamp to bin 0."""
    s = np.int64(sub_bits)
    v = v.astype(np.int64)
    pos = v > 0
    out = np.zeros(len(v), dtype=np.int64)
    if pos.any():
        vp = v[pos].astype(np.uint64)
        # exponent = index of the highest set bit, computed with six
        # whole-array shift steps (float64 log2 is unsafe past 2^53)
        e = np.zeros(len(vp), dtype=np.int64)
        x = vp.copy()
        for shift in (32, 16, 8, 4, 2, 1):
            big = x >= (np.uint64(1) << np.uint64(shift))
            e[big] += shift
            x[big] >>= np.uint64(shift)
        sh = np.maximum(0, e - int(s))
        mant = (v[pos] >> sh) & ((np.int64(1) << s) - 1)
        full = e >= int(s)
        out[pos] = np.where(full, ((e - int(s) + 1) << s) | mant, v[pos])
    return out


def log_bin_lower(b: np.ndarray, sub_bits: int) -> np.ndarray:
    """Lower bound of a log bin (the reported quantile value)."""
    s = np.int64(sub_bits)
    b = b.astype(np.int64)
    small = b < (np.int64(1) << s)
    blk = (b >> s) + int(s) - 1
    mant = b & ((np.int64(1) << s) - 1)
    lo = ((np.int64(1) << s) | mant) << np.maximum(0, blk - int(s))
    return np.where(small, b, lo)


def grouped_quantile_approx(
    ds: "ray.data.Dataset",
    keys: List[str],
    value: str,
    qs: List[float],
    q_names: Optional[List[str]] = None,
    sub_bits: int = 5,
    count_col: str = "n_vals",
    num_buckets: Optional[int] = None,
    size_hint: Optional[int] = None,
) -> "ray.data.Dataset":
    """Bounded-state approximate grouped quantiles — the companion to
    ``grouped_quantile_disc`` for NEAR-UNIQUE heavy-tailed values, where the
    exact value histogram would hold one cell per distinct value. Values
    collapse to deterministic HDR-style integer log bins first (exponent +
    ``sub_bits`` mantissa bits, pure integer ops — no float log, so binning
    is bit-reproducible everywhere); per-group state is then O(64 * 2^s)
    cells regardless of cardinality, and cells are sum-mergeable by
    construction. The reported quantile is the selected bin's LOWER BOUND:
    an underestimate within relative error 2^-sub_bits (~3% at s=5).
    Negative/zero values clamp to bin 0 (reported as 0)."""
    if q_names is None:
        q_names = [f"q{int(round(q * 100))}" for q in qs]
    if num_buckets is None:
        num_buckets = auto_buckets(size_hint, rows_per_bucket=65536)

    def to_bin(v: np.ndarray) -> np.ndarray:
        return log_bin(v, sub_bits)

    def from_bin(b: np.ndarray) -> np.ndarray:
        return log_bin_lower(b, sub_bits)

    def combine(b: pa.Table) -> pa.Table:
        v = b[value].to_numpy(zero_copy_only=False).astype(np.int64)
        t = pa.table({**{k: b[k] for k in keys},
                      "__bin": pa.array(to_bin(v), pa.int64())})
        t = t.group_by(keys + ["__bin"]).aggregate([([], "count_all")])
        t = pa.table({**{k: t[k] for k in keys + ["__bin"]},
                      "cnt": pc.cast(t["count_all"], pa.int64())})
        h = _composite_key_hash(t, keys)
        return t.append_column(
            "pkey", pa.array(bucket_of_ints(h, num_buckets), pa.int64()))

    def local(g: pa.Table) -> pa.Table:
        karrs, starts, binv, csum, offsets, n_group = \
            _merged_histogram(g, keys, "__bin")
        out = {k: pa.array(a[starts]) for k, a in zip(keys, karrs)}
        for q, name in zip(qs, q_names):
            tgt = np.maximum(1, np.ceil(q * n_group.astype(np.float64))
                             .astype(np.int64))
            idx = np.searchsorted(csum, offsets + tgt, side="left")
            out[name] = pa.array(from_bin(binv[idx]), pa.int64())
        out[count_col] = pa.array(n_group, pa.int64())
        return pa.table(out)

    return ds.map_batches(combine, batch_format="pyarrow") \
        .groupby("pkey").map_groups(local, batch_format="pyarrow")


def ks_pairs(
    ds: "ray.data.Dataset",
    group_col: str,
    value_col: str,
) -> "ray.data.Dataset":
    """Pairwise two-sample Kolmogorov-Smirnov distance between every pair
    of groups' int64 value distributions — the distribution-drift companion
    to ``source_divergence`` (which compares token unigrams; this compares
    any numeric column, e.g. doc lengths across languages).

    Statistic: ``d_micro = max_v |floor(1e6*F_a(v)) - floor(1e6*F_b(v))|``
    over the union value grid — the micro-quantized ECDF sup-distance
    (within 2e-6 of the exact KS D, and bit-stable: both the engine and the
    DuckDB twin evaluate the identical integer floor formula, so summation
    or scan order can never flip the result).

    Plan shape (the 100-TB story): rows collapse to ``(group, value) ->
    count`` histogram cells inside map_batches (combiner-first), the cells
    merge in ONE bucketed exchange on hash(value), and the merged cells —
    bounded by |groups| x |distinct values|, NOT row count — gather to a
    single vectorized reducer that answers every pair at once (same
    bounded-cell argument as grouped_quantile_disc; for near-unique value
    columns pre-bucket the value first). int64-safe while
    ``1e6 * max_group_count`` fits 63 bits, i.e. up to ~9e12 rows/group.
    """
    nb = auto_buckets(None)

    def combine(b: pa.Table) -> pa.Table:
        t = b.select([group_col, value_col]) \
            .group_by([group_col, value_col]).aggregate([([], "count_all")])
        v = t[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "pkey": pa.array(bucket_of_ints(v, nb), pa.int64()),
            "g": t[group_col],
            "v": pa.array(v, pa.int64()),
            "cnt": pc.cast(t["count_all"], pa.int64()),
        })

    def merge_cells(g: pa.Table) -> pa.Table:
        t = g.select(["g", "v", "cnt"]).group_by(["g", "v"]) \
            .aggregate([("cnt", "sum")])
        return pa.table({"pkey": pa.array(np.zeros(t.num_rows, np.int64)),
                         "g": t["g"], "v": t["v"],
                         "cnt": pc.cast(t["cnt_sum"], pa.int64())})

    def ks_all_pairs(cells: pa.Table) -> pa.Table:
        gs = cells["g"].combine_chunks().to_numpy(zero_copy_only=False)
        vs = cells["v"].to_numpy(zero_copy_only=False)
        cs = cells["cnt"].to_numpy(zero_copy_only=False)
        grid = np.unique(vs)
        groups = sorted(set(gs.tolist()))
        # per-group micro-ECDF on the union grid (vectorized scatter-add)
        fm = {}
        tot = {}
        for gname in groups:
            m = gs == gname
            counts = np.zeros(len(grid), np.int64)
            np.add.at(counts, np.searchsorted(grid, vs[m]), cs[m])
            cum = np.cumsum(counts)
            n = int(cum[-1])
            tot[gname] = n
            fm[gname] = (1_000_000 * cum) // n
        out_a, out_b, out_na, out_nb, out_d = [], [], [], [], []
        for i, a in enumerate(groups):
            for b_ in groups[i + 1:]:
                out_a.append(a)
                out_b.append(b_)
                out_na.append(tot[a])
                out_nb.append(tot[b_])
                out_d.append(int(np.abs(fm[a] - fm[b_]).max()))
        return pa.table({
            "g_a": pa.array(out_a, pa.string()),
            "g_b": pa.array(out_b, pa.string()),
            "n_a": pa.array(out_na, pa.int64()),
            "n_b": pa.array(out_nb, pa.int64()),
            "d_micro": pa.array(out_d, pa.int64()),
        })

    # final gather: merged cells are bounded (groups x distinct values);
    # repartition(1) + map_batches avoids a second all-to-all Sort whose
    # fixed per-block overhead dwarfs the tiny payload (measured 10x)
    return ds.map_batches(combine, batch_format="pyarrow",
                          batch_size=None) \
        .groupby("pkey").map_groups(merge_cells, batch_format="pyarrow") \
        .repartition(1).map_batches(ks_all_pairs, batch_format="pyarrow",
                                    batch_size=None)


def chi2_assoc(
    ds: "ray.data.Dataset",
    col_a: str,
    col_b: str,
) -> "ray.data.Dataset":
    """Chi-square test of association between two categorical columns
    (feature-selection / leakage-audit primitive): one output row with
    ``chi2_micro`` (Pearson X^2 in micro units), ``dof``, and ``n``.

    Integer-exact contract: per contingency cell (INCLUDING empty cells of
    the full category cross product, whose expected count is positive),
    ``contrib = floor(1e6 * (N*o - r*c)^2 / (r*c*N))`` summed over cells —
    floors on both sides, order-free because flooring happens per cell.
    The engine computes contributions in unbounded Python ints (the final
    reduce touches |A| x |B| cells, not rows); the DuckDB twin uses
    HUGEINT, exact while ``1e6*(N*o)^2`` fits 127 bits (~1e16 rows).

    Plan shape: rows collapse to ``(a, b) -> count`` cells per batch
    (combiner-first), cells merge in one exchange bounded by the category
    product — never by row count.
    """
    nb = auto_buckets(None)

    def combine(b: pa.Table) -> pa.Table:
        t = b.select([col_a, col_b]).group_by([col_a, col_b]) \
            .aggregate([([], "count_all")])
        h = _composite_key_hash(t, [col_a, col_b])
        return pa.table({
            "pkey": pa.array(bucket_of_ints(h, nb), pa.int64()),
            "a": t[col_a], "b": t[col_b],
            "cnt": pc.cast(t["count_all"], pa.int64()),
        })

    def merge_cells(g: pa.Table) -> pa.Table:
        t = g.select(["a", "b", "cnt"]).group_by(["a", "b"]) \
            .aggregate([("cnt", "sum")])
        return pa.table({"pkey": pa.array(np.zeros(t.num_rows, np.int64)),
                         "a": t["a"], "b": t["b"],
                         "cnt": pc.cast(t["cnt_sum"], pa.int64())})

    def finalize(cells: pa.Table) -> pa.Table:
        a = cells["a"].to_pylist()
        b = cells["b"].to_pylist()
        c = cells["cnt"].to_pylist()
        obs = {(x, y): int(v) for x, y, v in zip(a, b, c)}
        rows = sorted({x for x, _ in obs})
        cols = sorted({y for _, y in obs})
        r = {x: sum(v for (xx, _), v in obs.items() if xx == x)
             for x in rows}
        ctot = {y: sum(v for (_, yy), v in obs.items() if yy == y)
                for y in cols}
        n = sum(obs.values())
        chi2_micro = 0
        for x in rows:
            for y in cols:
                o = obs.get((x, y), 0)
                num = n * o - r[x] * ctot[y]
                chi2_micro += (1_000_000 * num * num) // (r[x] * ctot[y] * n)
        return pa.table({
            "chi2_micro": pa.array([chi2_micro], pa.int64()),
            "dof": pa.array([(len(rows) - 1) * (len(cols) - 1)], pa.int64()),
            "n": pa.array([n], pa.int64()),
        })

    return ds.map_batches(combine, batch_format="pyarrow",
                          batch_size=None) \
        .groupby("pkey").map_groups(merge_cells, batch_format="pyarrow") \
        .repartition(1).map_batches(finalize, batch_format="pyarrow",
                                    batch_size=None)


def mannwhitney_pairs(
    ds: "ray.data.Dataset",
    group_col: str,
    value_col: str,
) -> "ray.data.Dataset":
    """Pairwise Mann-Whitney U (rank-sum) statistic between every pair of
    groups' int64 value distributions — the location-shift companion to
    ``ks_pairs``'s shape test. Ties use midranks, so the DOUBLED statistic
    ``u2_a = 2*U_a = sum_v cnt_a(v) * (2*cum_b(v) - cnt_b(v))`` stays
    integer-exact (cum_b inclusive of v; the identity
    ``u2_a + u2_b == 2*n_a*n_b`` is asserted per pair). int64-safe while
    ``2*n_a*n_b`` fits 63 bits, i.e. up to ~2e9 rows/group.

    Same plan shape as ks_pairs: combiner-first (group, value) -> count
    cells, ONE exchange on hash(value), merged cells (bounded by
    |groups| x |distinct values|) gather to a single vectorized reducer.
    """
    nb = auto_buckets(None)

    def combine(b: pa.Table) -> pa.Table:
        t = b.select([group_col, value_col]) \
            .group_by([group_col, value_col]).aggregate([([], "count_all")])
        v = t[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "pkey": pa.array(bucket_of_ints(v, nb), pa.int64()),
            "g": t[group_col],
            "v": pa.array(v, pa.int64()),
            "cnt": pc.cast(t["count_all"], pa.int64()),
        })

    def merge_cells(g: pa.Table) -> pa.Table:
        t = g.select(["g", "v", "cnt"]).group_by(["g", "v"]) \
            .aggregate([("cnt", "sum")])
        return pa.table({"pkey": pa.array(np.zeros(t.num_rows, np.int64)),
                         "g": t["g"], "v": t["v"],
                         "cnt": pc.cast(t["cnt_sum"], pa.int64())})

    def u_all_pairs(cells: pa.Table) -> pa.Table:
        gs = cells["g"].combine_chunks().to_numpy(zero_copy_only=False)
        vs = cells["v"].to_numpy(zero_copy_only=False)
        cs = cells["cnt"].to_numpy(zero_copy_only=False)
        grid = np.unique(vs)
        groups = sorted(set(gs.tolist()))
        cnt = {}
        cum = {}
        tot = {}
        for gname in groups:
            m = gs == gname
            counts = np.zeros(len(grid), np.int64)
            np.add.at(counts, np.searchsorted(grid, vs[m]), cs[m])
            cnt[gname] = counts
            cum[gname] = np.cumsum(counts)
            tot[gname] = int(cum[gname][-1])
        out = {"g_a": [], "g_b": [], "n_a": [], "n_b": [], "u2_a": []}
        for i, a in enumerate(groups):
            for b_ in groups[i + 1:]:
                u2 = int(cnt[a] @ (2 * cum[b_] - cnt[b_]))
                u2_b = int(cnt[b_] @ (2 * cum[a] - cnt[a]))
                assert u2 + u2_b == 2 * tot[a] * tot[b_]
                out["g_a"].append(a)
                out["g_b"].append(b_)
                out["n_a"].append(tot[a])
                out["n_b"].append(tot[b_])
                out["u2_a"].append(u2)
        return pa.table({
            "g_a": pa.array(out["g_a"], pa.string()),
            "g_b": pa.array(out["g_b"], pa.string()),
            "n_a": pa.array(out["n_a"], pa.int64()),
            "n_b": pa.array(out["n_b"], pa.int64()),
            "u2_a": pa.array(out["u2_a"], pa.int64()),
        })

    return ds.map_batches(combine, batch_format="pyarrow",
                          batch_size=None) \
        .groupby("pkey").map_groups(merge_cells, batch_format="pyarrow") \
        .repartition(1).map_batches(u_all_pairs, batch_format="pyarrow",
                                    batch_size=None)


def skyline_2d(
    ds: "ray.data.Dataset",
    max_col: str,
    min_col: str,
    keep_cols: List[str],
) -> "ray.data.Dataset":
    """2D skyline (Pareto front): rows not dominated under (maximize
    ``max_col``, minimize ``min_col``) — b dominates a iff b is >= / <= on
    both axes and strictly better on at least one. Duplicate points on the
    front are ALL kept (neither dominates the other).

    Scale shape — the classic distributed-skyline composition: the front
    of a union is the front of the locals' fronts (dominance is
    transitive), so each batch reduces to its LOCAL front first (typically
    O(log n) rows for non-degenerate data), one bounded gather of the
    local fronts follows, and the final reducer re-runs the identical
    kernel. No all-pairs comparison anywhere; the only data-dependent
    bound is the true front size."""
    def _front(t: pa.Table) -> pa.Table:
        p = t[max_col].to_numpy(zero_copy_only=False).astype(np.int64)
        d = t[min_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(p) == 0:
            return t
        order = np.lexsort((d, -p))  # p desc, d asc within p
        ps, ds_ = p[order], d[order]
        starts = np.empty(len(ps), dtype=bool)
        starts[0] = True
        np.not_equal(ps[1:], ps[:-1], out=starts[1:])
        dmin = ds_[starts]  # per-p-group min d (d asc within group)
        before = np.empty(len(dmin), np.int64)
        before[0] = np.iinfo(np.int64).max
        if len(dmin) > 1:
            np.minimum.accumulate(dmin[:-1], out=before[1:])
        group_front = dmin < before
        gid = np.cumsum(starts) - 1
        keep_sorted = group_front[gid] & (ds_ == dmin[gid])
        keep = np.zeros(len(p), dtype=bool)
        keep[order[keep_sorted]] = True
        return t.filter(pa.array(keep))

    def local(b: pa.Table) -> pa.Table:
        return _front(b.select(keep_cols + [max_col, min_col]))

    # the local fronts are tiny by construction: repartition(1) gathers
    # them without an all-to-all Sort (whose fixed per-block overhead
    # would dominate — measured 10x on 300+ input blocks)
    return ds.map_batches(local, batch_format="pyarrow",
                          batch_size=None) \
        .repartition(1).map_batches(_front, batch_format="pyarrow",
                                    batch_size=None)
