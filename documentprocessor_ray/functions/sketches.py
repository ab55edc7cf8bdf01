"""Mergeable cardinality sketches: HyperLogLog distinct counting per group.

Exact distinct counting at 100 TB is a full shuffle of every distinct value
(the `events_rollup` n_users leg pays it correctly but it scales with
distinct count); HLL answers the same question in 2^p registers per group
with ~1.04/sqrt(2^p) relative error, and its partials are MAX-mergeable, so
the combiner collapses a batch to at most (groups x registers-touched) rows
and the shuffle is bounded by sketch size, not data size. Flajolet et al.
2007 construction with the standard linear-counting small-range correction;
64-bit splitmix hash (no large-range correction needed).

No SQL twin: DuckDB's approx_count_distinct is also HLL but a different
hash/register layout, so estimates differ by design — the gate is a pytest
tolerance test against the exact count (rows-only in the driver)."""

from __future__ import annotations

from typing import List, Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from .agg import _composite_key_hash
from ..sharding import auto_buckets, bucket_of_ints


def _mix64(x: np.ndarray) -> np.ndarray:
    h = x.astype(np.uint64)
    h = (h ^ (h >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    h = (h ^ (h >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return h ^ (h >> np.uint64(31))


def _rho(rest: np.ndarray, width: int) -> np.ndarray:
    """1 + count of leading zeros in the low ``width`` bits (position of the
    first 1-bit from the top), ``width + 1`` when all zero. Vectorized via
    frexp bit-length (exact: frexp exponents are exact even when the float
    mantissa rounds)."""
    bl = np.zeros(len(rest), np.int64)
    nz = rest != 0
    # bit_length via frexp exponent; values < 2^53 are exact, larger values
    # may round the mantissa but the exponent only increments when crossing
    # a power of two — correct that case by checking the bound
    f = rest[nz].astype(np.float64)
    e = np.frexp(f)[1].astype(np.int64)
    over = f >= np.ldexp(1.0, 64)  # never true for uint64, defensive
    e = e - over.astype(np.int64)
    # rounding up to exactly 2^e (e.g. 2^53-1 -> 2^53) overstates by 1
    exact_pow = np.ldexp(1.0, np.minimum(e - 1, 63).astype(np.int32))
    e = e - (rest[nz] < exact_pow.astype(np.uint64)).astype(np.int64)
    bl[nz] = e
    return np.where(nz, width - bl + 1, width + 1).astype(np.int64)


def hll_partial_rows(values: np.ndarray, p: int):
    """(slot, rho) per value — deduplicated to the max rho per (key, slot)
    by the caller's group_by."""
    h = _mix64(values)
    slot = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = (h << np.uint64(p)) >> np.uint64(p)  # low 64-p bits
    return slot, _rho(rest, 64 - p)


def _estimate(rho_by_slot: np.ndarray, p: int) -> int:
    m = 1 << p
    zeros = m - len(rho_by_slot)
    s = zeros * 1.0 + np.sum(np.ldexp(1.0, -rho_by_slot.astype(np.int32)))
    alpha = 0.7213 / (1.0 + 1.079 / m)
    e = alpha * m * m / s
    if e <= 2.5 * m and zeros > 0:
        e = m * np.log(m / zeros)
    return int(round(e))


def hll_group_distinct(
    ds: "ray.data.Dataset",
    keys: List[str],
    value: str,
    p: int = 12,
    num_buckets: Optional[int] = None,
) -> "ray.data.Dataset":
    """Approximate distinct ``value`` (int64) per distinct tuple of
    ``keys``. Output: keys + ``approx_distinct`` (int64)."""
    if num_buckets is None:
        num_buckets = auto_buckets(None)

    def partial(b: pa.Table) -> pa.Table:
        v = b[value].combine_chunks().to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        slot, rho = hll_partial_rows(v, p)
        t = pa.table({**{k: b[k] for k in keys},
                      "slot": pa.array(slot, pa.int64()),
                      "rho": pa.array(rho, pa.int64())})
        t = t.group_by(keys + ["slot"]).aggregate([("rho", "max")])
        kh = _composite_key_hash(t, keys)
        return pa.table({**{k: t[k] for k in keys},
                         "slot": t["slot"],
                         "rho": pc.cast(t["rho_max"], pa.int64()),
                         "pkey": pa.array(bucket_of_ints(kh, num_buckets),
                                          pa.int64())})

    def local(g: pa.Table) -> pa.Table:
        t = g.group_by(keys + ["slot"]).aggregate([("rho", "max")])
        karrs = [t[k].combine_chunks().to_numpy(zero_copy_only=False)
                 for k in keys]
        rho = t["rho_max"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort(tuple(reversed(karrs)))
        karrs = [a[order] for a in karrs]
        rho = rho[order]
        n = len(rho)
        first = np.ones(n, bool)
        if n > 1:
            first[1:] = False
            for a in karrs:
                first[1:] |= a[1:] != a[:-1]
        starts = np.flatnonzero(first)
        ends = np.r_[starts[1:], n]
        out = {k: pa.array(a[starts]) for k, a in zip(keys, karrs)}
        out["approx_distinct"] = pa.array(
            [_estimate(rho[s:e], p) for s, e in zip(starts, ends)],
            pa.int64())
        return pa.table(out)

    return ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("pkey").map_groups(local, batch_format="pyarrow")


# ----------------------------------------------------- Count-Min heavy hitters
# Cormode & Muthukrishnan 2005: depth x width counter matrix, est(v) =
# min_d cms[d, slot_d(v)] — always >= the true count, over by at most
# ~N/width w.h.p. Partials are SUM-mergeable, so the shuffle moves at most
# (nonzero cells per batch) rows and the merged sketch is depth*width cells
# REGARDLESS of input size — that bounded size is what licenses the final
# driver-side assembly (sketch-bounded, not data-bounded).

_CMS_SEEDS = np.array([0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F,
                       0x165667B19E3779F9, 0x27D4EB2F165667C5],
                      dtype=np.uint64)


def _cms_slots(values: np.ndarray, depth: int, width: int) -> np.ndarray:
    """(depth, n) slot matrix for int64 values."""
    v = values.astype(np.uint64)
    return np.stack([
        (_mix64(v ^ _CMS_SEEDS[d]) % np.uint64(width)).astype(np.int64)
        for d in range(depth)])


def cms_heavy_hitters(
    ds: "ray.data.Dataset",
    value: str,
    k: int = 10,
    depth: int = 4,
    width: int = 4096,
    local_k: int = 64,
    num_buckets: Optional[int] = None,
    candidates: str = "all",
) -> "ray.data.Dataset":
    """Approximate global top-``k`` heavy hitters of the int64 ``value``
    column: (value, est_count), est_count >= true count, ordered
    (est_count desc, value asc).

    Frequencies come from the merged Count-Min sketch, so no exact
    per-value global count is ever shuffled. Candidate generation:

    - ``"all"`` (default): every distinct value is a candidate — candidate
      rows are bare int64s deduplicated per batch then per bucket, so the
      exchange is ~8 B x distinct values while COUNTS stay sketch-bounded.
      Partition-independent, hence hash-gateable: the answer is a pure
      function of the multiset of values.
    - ``"local_topk"``: the local-top-``local_k``-per-batch union (a true
      global heavy hitter is a local heavy hitter in at least one batch
      region) — shuffle bounded by sketch + local_k x batches, for corpora
      where even the distinct-value set is too wide, at the price of a
      batch-layout-dependent candidate set (rows-only checkable)."""
    if num_buckets is None:
        num_buckets = auto_buckets(None)

    def partial(b: pa.Table) -> pa.Table:
        v = b[value].combine_chunks().to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        uniq, cnt = np.unique(v, return_counts=True)
        slots = _cms_slots(uniq, depth, width)  # (depth, u)
        d_idx = np.repeat(np.arange(depth), len(uniq))
        cell = d_idx * width + slots.ravel()
        # sum counts into distinct cells (two values can share a slot)
        cell_u, inv = np.unique(cell, return_inverse=True)
        cell_cnt = np.zeros(len(cell_u), np.int64)
        np.add.at(cell_cnt, inv, np.tile(cnt, depth))
        if candidates == "all":
            top = np.arange(len(uniq))
        else:
            top = np.argsort(-cnt, kind="stable")[:local_k]
        n_cells, n_cand = len(cell_u), len(top)
        return pa.table({
            "cell": pa.array(np.r_[cell_u, np.full(n_cand, -1)], pa.int64()),
            "cnt": pa.array(np.r_[cell_cnt, cnt[top]], pa.int64()),
            "cand": pa.array(np.r_[np.full(n_cells, 0), uniq[top]],
                             pa.int64()),
            "pkey": pa.array(bucket_of_ints(
                np.r_[cell_u, uniq[top]], num_buckets), pa.int64()),
        })

    def local_merge(g: pa.Table) -> pa.Table:
        is_cell = pc.greater_equal(g["cell"], 0)
        cells = g.filter(is_cell)
        t = cells.group_by("cell").aggregate([("cnt", "sum")])
        cands = g.filter(pc.invert(is_cell))
        cu = np.unique(cands["cand"].to_numpy(zero_copy_only=False))
        return pa.table({
            "cell": pa.concat_arrays([
                t["cell"].combine_chunks(),
                pa.array(np.full(len(cu), -1), pa.int64())]),
            "cnt": pa.concat_arrays([
                pc.cast(t["cnt_sum"], pa.int64()).combine_chunks(),
                pa.array(np.zeros(len(cu), np.int64), pa.int64())]),
            "cand": pa.concat_arrays([
                pa.array(np.zeros(t.num_rows, np.int64), pa.int64()),
                pa.array(cu, pa.int64())]),
        })

    merged = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("pkey").map_groups(local_merge, batch_format="pyarrow")

    # driver assembly bounded by depth*width + total distinct candidates
    tbl = pa.concat_tables(list(merged.iter_batches(batch_format="pyarrow")))
    cell = tbl["cell"].to_numpy()
    cms = np.zeros(depth * width, np.int64)
    cmask = cell >= 0
    np.add.at(cms, cell[cmask], tbl["cnt"].to_numpy()[cmask])
    cands = np.unique(tbl["cand"].to_numpy()[~cmask])
    slots = _cms_slots(cands, depth, width)
    est = np.min(np.stack([cms[d * width + slots[d]]
                           for d in range(depth)]), axis=0)
    order = np.lexsort((cands, -est))[:k]
    out = pa.table({value: pa.array(cands[order], pa.int64()),
                    "est_count": pa.array(est[order], pa.int64())})
    import ray.data as rd
    return rd.from_arrow(out)


# ----------------------------------------------------------------- Bloom

_BLOOM_SEED1 = np.uint64(0x9E3779B97F4A7C15)


def _bloom_hashes(keys: np.ndarray, k: int, m_bits: int) -> np.ndarray:
    """(k, n) bit positions via double hashing h1 + i*h2 (Kirsch-
    Mitzenmacher); pure integer splitmix-style mixes, deterministic
    everywhere."""
    x = keys.astype(np.uint64)
    h1 = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    h1 = (h1 ^ (h1 >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    h1 = h1 ^ (h1 >> np.uint64(31))
    y = x + _BLOOM_SEED1
    h2 = (y ^ (y >> np.uint64(33))) * np.uint64(0xFF51AFD7ED558CCD)
    h2 = (h2 ^ (h2 >> np.uint64(33))) | np.uint64(1)  # odd -> full cycle
    i = np.arange(k, dtype=np.uint64)[:, None]
    return ((h1[None, :] + i * h2[None, :]) % np.uint64(m_bits))


def bloom_build(ds: "ray.data.Dataset", key: str, m_bits: int = 1 << 20,
                k: int = 5) -> np.ndarray:
    """Build a Bloom filter over ``ds[key]`` (int64). Per-batch partials
    emit only the NONZERO words of their local bit array; the driver ORs
    them (the whole filter is m_bits/8 bytes — small BY DESIGN; that is
    the point of the sketch) and the caller broadcasts it with ray.put.
    Deterministic: same keys -> same bits, any batch order."""
    n_words = m_bits // 64

    def partial(b: pa.Table) -> pa.Table:
        v = b[key].combine_chunks().to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        arr = np.zeros(n_words, dtype=np.uint64)
        pos = _bloom_hashes(v, k, m_bits).ravel()
        np.bitwise_or.at(arr, (pos // np.uint64(64)).astype(np.int64),
                         np.uint64(1) << (pos % np.uint64(64)))
        nz = np.flatnonzero(arr)
        return pa.table({
            "w": pa.array(nz, pa.int64()),
            "bits": pa.array(arr[nz].view(np.int64), pa.int64())})

    out = np.zeros(n_words, dtype=np.uint64)
    for b in ds.map_batches(partial, batch_format="pyarrow") \
            .iter_batches(batch_format="pyarrow"):
        w = b["w"].to_numpy(zero_copy_only=False)
        bits = b["bits"].to_numpy(zero_copy_only=False).view(np.uint64)
        np.bitwise_or.at(out, w, bits)
    return out


def bloom_probe_mask(filter_bits: np.ndarray, keys: np.ndarray,
                     k: int = 5) -> np.ndarray:
    """Membership mask: True -> possibly present (false positives at the
    configured rate), False -> DEFINITELY absent (no false negatives)."""
    m_bits = len(filter_bits) * 64
    pos = _bloom_hashes(keys.astype(np.int64), k, m_bits)
    word = (pos // np.uint64(64)).astype(np.int64)
    bit = np.uint64(1) << (pos % np.uint64(64))
    hits = (filter_bits[word] & bit) != 0
    return hits.all(axis=0)
