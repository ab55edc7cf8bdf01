"""Co-bucketed hash join: correctness vs pandas merge, left join nulls,
overlap rejection, bucket stability."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data

from documentprocessor_ray.functions.joins import _bucket_of, hash_join, semi_join


def _ds(df):
    return ray.data.from_arrow(pa.Table.from_pandas(df, preserve_index=False))


@pytest.fixture()
def sides(ray_session):
    rng = np.random.default_rng(5)
    left = pd.DataFrame({
        "k": rng.integers(0, 50, size=200).astype("int64"),
        "lv": np.arange(200, dtype="int64"),
    })
    right = pd.DataFrame({
        "k": rng.integers(0, 50, size=120).astype("int64"),
        "rv": np.arange(1000, 1120, dtype="int64"),
    })
    return left, right


class TestHashJoin:
    def test_inner_matches_pandas(self, sides):
        left, right = sides
        got = hash_join(_ds(left), _ds(right), on="k").to_pandas()
        exp = left.merge(right, on="k", how="inner")
        key = ["k", "lv", "rv"]
        got = got[key].sort_values(key).reset_index(drop=True)
        exp = exp[key].sort_values(key).reset_index(drop=True)
        pd.testing.assert_frame_equal(got, exp)

    def test_left_join_keeps_unmatched(self, sides):
        left, right = sides
        # restrict right so some left keys have no match
        right = right[right["k"] < 10]
        got = hash_join(_ds(left), _ds(right), on="k", how="left").to_pandas()
        exp = left.merge(right, on="k", how="left")
        assert len(got) == len(exp)
        assert int(got["rv"].isna().sum()) == int(exp["rv"].isna().sum())

    def test_overlapping_columns_rejected(self, sides):
        left, right = sides
        right2 = right.rename(columns={"rv": "lv"})
        with pytest.raises(ValueError, match="rename overlapping"):
            hash_join(_ds(left), _ds(right2), on="k")

    def test_bucket_stability_and_spread(self):
        keys = np.arange(10_000, dtype=np.int64)
        b1 = _bucket_of(keys, 64)
        b2 = _bucket_of(keys, 64)
        assert (b1 == b2).all()
        counts = np.bincount(b1, minlength=64)
        assert counts.min() > 0.5 * counts.mean()  # no striping/empty buckets


class TestSemiAntiJoin:
    def test_semi_matches_set_filter(self, sides):
        left, right = sides
        keep = right[right["k"] % 3 == 0][["k"]].rename(columns={"k": "kk"})
        got = semi_join(_ds(left), _ds(keep), left_on="k", keep_on="kk").to_pandas()
        exp = left[left["k"].isin(set(keep["kk"]))]
        assert sorted(got["lv"]) == sorted(exp["lv"])
        assert list(got.columns) == ["k", "lv"]

    def test_anti_is_complement(self, sides):
        left, right = sides
        keep = right[right["k"] % 3 == 0][["k"]].rename(columns={"k": "kk"})
        semi = semi_join(_ds(left), _ds(keep), left_on="k", keep_on="kk").to_pandas()
        anti = semi_join(_ds(left), _ds(keep), left_on="k", keep_on="kk",
                         anti=True).to_pandas()
        assert len(semi) + len(anti) == len(left)
        assert set(semi["lv"]).isdisjoint(set(anti["lv"]))
        exp = left[~left["k"].isin(set(keep["kk"]))]
        assert sorted(anti["lv"]) == sorted(exp["lv"])


class TestSaltedJoin:
    def test_salted_inner_equals_unsalted(self, sides):
        left, right = sides
        # make one key pathologically hot on the left
        hot = pd.DataFrame({"k": np.full(300, 7, dtype="int64"),
                            "lv": np.arange(10_000, 10_300, dtype="int64")})
        left = pd.concat([left, hot], ignore_index=True)
        plain = hash_join(_ds(left), _ds(right), on="k").to_pandas()
        salted = hash_join(_ds(left), _ds(right), on="k", salt=8).to_pandas()
        key = ["k", "lv", "rv"]
        a = plain[key].sort_values(key).reset_index(drop=True)
        b = salted[key].sort_values(key).reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b)

    def test_salted_left_equals_unsalted(self, sides):
        left, right = sides
        right = right[right["k"] < 10]
        plain = hash_join(_ds(left), _ds(right), on="k", how="left").to_pandas()
        salted = hash_join(_ds(left), _ds(right), on="k", how="left",
                           salt=4).to_pandas()
        assert len(plain) == len(salted)
        assert int(plain["rv"].isna().sum()) == int(salted["rv"].isna().sum())


class TestOuterJoin:
    def test_full_outer_matches_pandas(self, sides):
        left, right = sides
        # disjointify key ranges so BOTH sides have unmatched rows
        left = left[left["k"] < 40]
        right = right[right["k"] > 20]
        got = hash_join(_ds(left), _ds(right), on="k", how="full").to_pandas()
        exp = left.merge(right, on="k", how="outer")
        assert len(got) == len(exp)
        assert int(got["lv"].isna().sum()) == int(exp["lv"].isna().sum())
        assert int(got["rv"].isna().sum()) == int(exp["rv"].isna().sum())
        key = ["k", "lv", "rv"]
        a = got[key].sort_values(key).reset_index(drop=True)
        b = exp[key].sort_values(key).reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b, check_dtype=False)

    def test_right_outer_matches_pandas(self, sides):
        left, right = sides
        left = left[left["k"] < 10]
        got = hash_join(_ds(left), _ds(right), on="k", how="right").to_pandas()
        exp = left.merge(right, on="k", how="right")
        assert len(got) == len(exp)
        assert int(got["lv"].isna().sum()) == int(exp["lv"].isna().sum())

    def test_salted_outer_rejected(self, sides):
        left, right = sides
        with pytest.raises(ValueError, match="inner/left"):
            hash_join(_ds(left), _ds(right), on="k", how="full", salt=4)


class TestStringKeyJoin:
    def test_inner_on_string_key(self, ray_session):
        left = pd.DataFrame({"s": ["a", "b", "c", "a", "z"],
                             "lv": np.arange(5, dtype="int64")})
        right = pd.DataFrame({"s": ["a", "b", "b", "q"],
                              "rv": np.arange(10, 14, dtype="int64")})
        got = hash_join(_ds(left), _ds(right), on="s").to_pandas()
        exp = left.merge(right, on="s", how="inner")
        key = ["s", "lv", "rv"]
        a = got[key].sort_values(key).reset_index(drop=True)
        b = exp[key].sort_values(key).reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b)

    def test_semi_anti_on_string_key(self, ray_session):
        left = pd.DataFrame({"s": ["a", "b", "c", "d"],
                             "lv": np.arange(4, dtype="int64")})
        keep = pd.DataFrame({"k": ["b", "d", "x"]})
        semi = semi_join(_ds(left), _ds(keep), left_on="s",
                         keep_on="k").to_pandas()
        anti = semi_join(_ds(left), _ds(keep), left_on="s", keep_on="k",
                         anti=True).to_pandas()
        assert sorted(semi["s"]) == ["b", "d"]
        assert sorted(anti["s"]) == ["a", "c"]


class TestBroadcastJoin:
    def test_inner_and_left(self, ray_session):
        from documentprocessor_ray.functions.joins import broadcast_join
        left = pd.DataFrame({"k": np.array([1, 2, 3, 2], dtype="int64"),
                             "lv": np.arange(4, dtype="int64")})
        dim = pa.table({"k": pa.array([1, 2], pa.int64()),
                        "name": pa.array(["one", "two"])})
        inner = broadcast_join(_ds(left), dim, on="k").to_pandas()
        assert sorted(zip(inner["k"], inner["name"])) == \
            [(1, "one"), (2, "two"), (2, "two")]
        lj = broadcast_join(_ds(left), dim, on="k", how="left").to_pandas()
        assert len(lj) == 4 and int(lj["name"].isna().sum()) == 1

    def test_overlap_rejected(self, ray_session):
        from documentprocessor_ray.functions.joins import broadcast_join
        left = pd.DataFrame({"k": np.array([1], dtype="int64"),
                             "name": ["x"]})
        dim = pa.table({"k": pa.array([1], pa.int64()),
                        "name": pa.array(["one"])})
        with pytest.raises(Exception, match="rename overlapping"):
            broadcast_join(_ds(left), dim, on="k").to_pandas()


class TestCompositeKeyJoin:
    def test_two_key_inner_matches_pandas(self, ray_session):
        rng = np.random.default_rng(31)
        left = pd.DataFrame({
            "k1": rng.integers(0, 8, 150).astype("int64"),
            "k2": rng.choice(["x", "y", "z"], 150),
            "lv": np.arange(150, dtype="int64")})
        right = pd.DataFrame({
            "k1": rng.integers(0, 8, 60).astype("int64"),
            "k2": rng.choice(["x", "y", "z"], 60),
            "rv": np.arange(500, 560, dtype="int64")})
        got = hash_join(_ds(left), _ds(right), on=["k1", "k2"]).to_pandas()
        exp = left.merge(right, on=["k1", "k2"], how="inner")
        key = ["k1", "k2", "lv", "rv"]
        a = got[key].sort_values(key).reset_index(drop=True)
        b = exp[key].sort_values(key).reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b)

    def test_two_key_left_nulls(self, ray_session):
        left = pd.DataFrame({"k1": np.array([1, 1, 2], dtype="int64"),
                             "k2": ["a", "b", "a"],
                             "lv": np.arange(3, dtype="int64")})
        right = pd.DataFrame({"k1": np.array([1], dtype="int64"),
                              "k2": ["a"], "rv": np.array([9], dtype="int64")})
        got = hash_join(_ds(left), _ds(right), on=["k1", "k2"],
                        how="left").to_pandas()
        assert len(got) == 3 and int(got["rv"].isna().sum()) == 2
