"""asof_join vs a brute-force scalar reference (DuckDB ASOF semantics:
greatest right ts <= left ts per key, ties on (ts) broken by max tiebreak)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from documentprocessor_ray.functions.temporal import asof_join


def _ref(lk, lt, rk, rt, rtb):
    out = []
    for k, t in zip(lk, lt):
        best = None
        for j, (k2, t2) in enumerate(zip(rk, rt)):
            if k2 == k and t2 <= t:
                cand = (t2, rtb[j], j)
                if best is None or cand > best:
                    best = cand
        out.append(best[2] if best else -1)
    return out


class TestAsofJoin:
    def test_random_matches_reference(self, ray_session):
        rng = np.random.default_rng(3)
        nl, nr = 400, 300
        lk = rng.integers(0, 12, nl)
        lt = rng.integers(0, 50, nl)          # small range forces ts ties
        rk = rng.integers(0, 12, nr)
        rt = rng.integers(0, 50, nr)
        rtb = np.arange(nr)                    # unique tiebreak ids
        rv = rng.integers(100, 999, nr)
        left = ray.data.from_arrow(pa.table({
            "k": pa.array(lk, pa.int64()), "t": pa.array(lt, pa.int64()),
            "lid": pa.array(np.arange(nl), pa.int64())}))
        right = ray.data.from_arrow(pa.table({
            "k": pa.array(rk, pa.int64()), "t": pa.array(rt, pa.int64()),
            "rid": pa.array(rtb, pa.int64()),
            "val": pa.array(rv, pa.int64())}))
        out = asof_join(left, right, key="k", ts="t", left_cols=["lid"],
                        right_cols={"m_rid": "rid", "m_val": "val"},
                        tiebreak="rid", num_buckets=8).to_pandas()
        assert len(out) == nl
        ref = _ref(lk, lt, rk, rt, rtb)
        got = out.set_index("lid")
        for i in range(nl):
            exp = ref[i]
            m = got.loc[i, "m_rid"]
            if exp < 0:
                assert m != m or m is None or got.loc[i, "m_val"] != got.loc[i, "m_val"]  # NaN
            else:
                assert int(m) == int(rtb[exp])
                assert int(got.loc[i, "m_val"]) == int(rv[exp])

    def test_exact_ts_match_allowed_and_no_match_null(self, ray_session):
        left = ray.data.from_arrow(pa.table({
            "k": pa.array([1, 1, 2], pa.int64()),
            "t": pa.array([10, 5, 10], pa.int64()),
            "lid": pa.array([0, 1, 2], pa.int64())}))
        right = ray.data.from_arrow(pa.table({
            "k": pa.array([1], pa.int64()), "t": pa.array([10], pa.int64()),
            "rid": pa.array([7], pa.int64())}))
        out = asof_join(left, right, key="k", ts="t", left_cols=["lid"],
                        right_cols={"m": "rid"}, num_buckets=4) \
            .to_pandas().set_index("lid")
        assert int(out.loc[0, "m"]) == 7       # exact ts counts
        assert np.isnan(out.loc[1, "m"])       # right ts later -> no match
        assert np.isnan(out.loc[2, "m"])       # other key -> no match


class TestRangeJoin:
    def test_overlap_boundaries_and_multi_match(self, ray_session):
        from documentprocessor_ray.functions.temporal import range_join_broadcast
        pts = ray.data.from_arrow(pa.table({
            "pid": pa.array([0, 1, 2, 3], pa.int64()),
            "v": pa.array([5, 10, 15, 100], pa.int64())}))
        iv = pa.table({"band": pa.array([0, 1], pa.int64()),
                       "lo": pa.array([0, 10], pa.int64()),
                       "hi": pa.array([15, 20], pa.int64())})
        out = range_join_broadcast(pts, iv, value="v",
                                   interval_cols=["band"]).to_pandas()
        got = sorted(map(tuple, out[["pid", "band"]].values.tolist()))
        # v=5 -> band0; v=10 -> band0 AND band1 (overlap, lo inclusive);
        # v=15 -> band1 only (hi exclusive); v=100 -> none
        assert got == [(0, 0), (1, 0), (1, 1), (2, 1)]

    def test_random_matches_bruteforce(self, ray_session):
        from documentprocessor_ray.functions.temporal import range_join_broadcast
        rng = np.random.default_rng(5)
        v = rng.integers(0, 1000, 500)
        lo = rng.integers(0, 900, 20)
        hi = lo + rng.integers(1, 300, 20)
        pts = ray.data.from_arrow(pa.table({
            "pid": pa.array(np.arange(500), pa.int64()),
            "v": pa.array(v, pa.int64())}))
        iv = pa.table({"band": pa.array(np.arange(20), pa.int64()),
                       "lo": pa.array(lo, pa.int64()),
                       "hi": pa.array(hi, pa.int64())})
        out = range_join_broadcast(pts, iv, value="v",
                                   interval_cols=["band"]).to_pandas()
        exp = sorted((p, b) for p in range(500) for b in range(20)
                     if lo[b] <= v[p] < hi[b])
        assert sorted(map(tuple, out[["pid", "band"]].values.tolist())) == exp


class TestRunningWindow:
    def test_running_sum_and_lag_match_reference(self, ray_session):
        from documentprocessor_ray.functions.window import running_sum_lag
        rng = np.random.default_rng(9)
        n = 600
        k = rng.integers(0, 15, n)
        o = rng.permutation(n)          # unique order key per row
        v = rng.integers(1, 100, n)
        ds = ray.data.from_arrow(pa.table({
            "k": pa.array(k, pa.int64()), "o": pa.array(o, pa.int64()),
            "v": pa.array(v, pa.int64())}))
        out = running_sum_lag(ds, key="k", order_cols=["o"], sum_col="v",
                              lag_cols=["o"], num_buckets=8).to_pandas()
        assert len(out) == n
        # scalar reference per partition
        import collections
        rows = sorted(zip(k, o, v), key=lambda r: (r[0], r[1]))
        run = collections.defaultdict(int)
        prev = {}
        exp = {}
        for kk, oo, vv in rows:
            run[kk] += vv
            exp[oo] = (run[kk], prev.get(kk, -1))
            prev[kk] = oo
        got = out.set_index("o")
        for oo in o:
            assert int(got.loc[oo, "running_v"]) == exp[oo][0]
            assert int(got.loc[oo, "prev_o"]) == exp[oo][1]

    def test_single_row_partition(self, ray_session):
        from documentprocessor_ray.functions.window import running_sum_lag
        ds = ray.data.from_arrow(pa.table({
            "k": pa.array([5], pa.int64()), "o": pa.array([1], pa.int64()),
            "v": pa.array([42], pa.int64())}))
        out = running_sum_lag(ds, "k", ["o"], "v", lag_cols=["o"],
                              num_buckets=4).to_pandas()
        assert int(out.loc[0, "running_v"]) == 42
        assert int(out.loc[0, "prev_o"]) == -1


class TestGlobalRank:
    def test_matches_numpy_reference(self, ray_session):
        from documentprocessor_ray.functions.window import global_rank
        rng = np.random.default_rng(5)
        n = 500
        key = rng.integers(0, 40, n)       # heavy ties
        ids = rng.permutation(n).astype(np.int64)
        ds = ray.data.from_arrow(pa.table({
            "k": pa.array(key, pa.int64()),
            "doc_id": pa.array(ids, pa.int64())}))
        out = global_rank(ds, key="k", tie_col="doc_id",
                          descending=True, n_tiles=4).to_pandas() \
            .sort_values("rnk").reset_index(drop=True)
        order = np.lexsort((ids, -key))
        assert (out["k"].to_numpy() == key[order]).all()
        assert (out["doc_id"].to_numpy() == ids[order]).all()
        assert (out["rnk"].to_numpy() == np.arange(1, n + 1)).all()
        # exact ntile sizes: n % 4 big tiles of ceil(n/4) first
        sizes = out.groupby("quartile").size()
        big, small = -(-n // 4), n // 4
        exp = [big] * (n % 4) + [small] * (4 - n % 4)
        assert sizes.sort_index().tolist() == exp

    def test_ascending_and_n_less_than_tiles(self, ray_session):
        from documentprocessor_ray.functions.window import global_rank
        ds = ray.data.from_arrow(pa.table({
            "k": pa.array([7, 3], pa.int64()),
            "doc_id": pa.array([1, 2], pa.int64())}))
        out = global_rank(ds, key="k", tie_col="doc_id",
                          descending=False, n_tiles=4).to_pandas() \
            .sort_values("rnk")
        assert out["k"].tolist() == [3, 7]
        assert out["quartile"].tolist() == [1, 2]


class TestAsofForward:
    def test_forward_matches_bruteforce(self, ray_session):
        rng = np.random.default_rng(17)
        n_l, n_r = 300, 200
        lk = rng.integers(0, 20, n_l)
        lt = rng.integers(0, 1000, n_l)
        rk = rng.integers(0, 20, n_r)
        rt = rng.integers(0, 1000, n_r)
        rtb = np.arange(n_r, dtype=np.int64)
        left = ray.data.from_arrow(pa.table({
            "k": pa.array(lk, pa.int64()), "ts": pa.array(lt, pa.int64()),
            "lid": pa.array(np.arange(n_l), pa.int64())}))
        right = ray.data.from_arrow(pa.table({
            "k": pa.array(rk, pa.int64()), "ts": pa.array(rt, pa.int64()),
            "rid": pa.array(rtb, pa.int64())}))
        out = asof_join(left, right, key="k", ts="ts", left_cols=["lid"],
                        right_cols={"rid": "rid", "rts": "ts"},
                        tiebreak="rid", direction="forward").to_pandas() \
            .set_index("lid").sort_index()

        for i in range(n_l):
            best = None
            for j in range(n_r):
                if rk[j] == lk[i] and rt[j] >= lt[i]:
                    cand = (rt[j], -rtb[j])
                    # smallest ts wins; at equal ts the LARGEST rid wins
                    if best is None or cand < (rt[best], -rtb[best]):
                        best = j
            got = out.loc[i, "rid"]
            if best is None:
                assert np.isnan(got)
            else:
                assert int(got) == best, (i, best, got)


class TestRollingSum:
    def test_matches_pandas_rolling(self, ray_session):
        from documentprocessor_ray.functions.window import rolling_sum
        import pandas as pd
        rng = np.random.default_rng(23)
        n = 400
        df = pd.DataFrame({
            "k": rng.integers(0, 15, n).astype("int64"),
            "o": rng.permutation(n).astype("int64"),
            "v": rng.integers(-50, 50, n).astype("int64")})
        out = rolling_sum(ray.data.from_arrow(pa.Table.from_pandas(
            df, preserve_index=False)), key="k", order_cols=["o"],
            sum_col="v", window_rows=4, num_buckets=8).to_pandas()
        exp = df.sort_values(["k", "o"]).groupby("k")["v"] \
            .rolling(4, min_periods=1).sum().astype("int64") \
            .reset_index(drop=True)
        got = out.sort_values(["k", "o"]).reset_index(drop=True)["rolling_v"]
        assert (got.to_numpy() == exp.to_numpy()).all()
