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
