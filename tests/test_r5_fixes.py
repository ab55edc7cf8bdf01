"""Round-5 regression tests: VERDICT.md r4 items #2 (stale WARC shard
cache in q_crawl_clean) and #5 (global_rank scale-safe distributed-offsets
leg), plus ADVICE r4 low items."""

import os
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import ray
import ray.data


class TestWarcShardCacheFreshness:
    def test_regenerated_parquet_gets_fresh_shard_dir(self, tmp_path):
        """VERDICT r4 'What's wrong' #1: q_crawl_clean must key its WARC
        shard cache on the source's content fingerprint, not basename —
        a regenerated documents.parquet at the same path must map to a
        NEW shard dir."""
        from documentprocessor_ray.pipelines.analysis import _warc_shard_dir

        sf = tmp_path / "sfX"
        sf.mkdir()
        src = sf / "documents.parquet"
        pq.write_table(pa.table({"doc_id": pa.array([1], pa.int64()),
                                 "text": ["alpha"]}), src)
        d1 = _warc_shard_dir(str(sf))
        time.sleep(0.01)  # ensure mtime_ns differs
        pq.write_table(pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                                 "text": ["alpha", "beta"]}), src)
        d2 = _warc_shard_dir(str(sf))
        assert d1 != d2

    def test_no_basename_only_cache_path_remains(self):
        """Source-level guard: every /tmp/dpray_warc join must go through
        _warc_shard_dir (content-fingerprinted); the r4 regression was a
        raw os.path.join('/tmp/dpray_warc', sfname) in q_crawl_clean."""
        import documentprocessor_ray.pipelines.analysis as mod

        src = open(mod.__file__).read()
        for i, line in enumerate(src.splitlines(), 1):
            if "/tmp/dpray_warc" in line and "_warc_shard_dir" not in line \
                    and not line.lstrip().startswith("#"):
                # only the definition inside _warc_shard_dir may name it
                assert "sfname}_{fp}" in line or 'f"{sfname}_{fp}"' in line \
                    or "return os.path.join" in line, \
                    f"basename-only WARC cache path at analysis.py:{i}"


def _rank_reference(key, ids, descending, n):
    order = np.lexsort((ids, -key if descending else key))
    return key[order], ids[order]


class TestGlobalRankDistributed:
    """VERDICT r4 item #5: high-cardinality keys must not put a per-key
    histogram on the driver. Force the distributed leg with a tiny
    max_driver_keys and assert exact equivalence with the broadcast leg
    and a numpy reference."""

    def test_distributed_leg_matches_reference(self, ray_session):
        from documentprocessor_ray.functions.window import global_rank

        rng = np.random.default_rng(11)
        n = 2000
        key = rng.integers(-500, 500, n).astype(np.int64)  # ties + negatives
        ids = rng.permutation(n).astype(np.int64)
        ds = ray.data.from_arrow(pa.table({
            "k": pa.array(key, pa.int64()),
            "doc_id": pa.array(ids, pa.int64())}))
        for desc in (True, False):
            out = global_rank(ds, key="k", tie_col="doc_id",
                              descending=desc, n_tiles=4,
                              max_driver_keys=8).to_pandas() \
                .sort_values("rnk").reset_index(drop=True)
            k_ref, id_ref = _rank_reference(key, ids, desc, n)
            assert (out["k"].to_numpy() == k_ref).all()
            assert (out["doc_id"].to_numpy() == id_ref).all()
            assert (out["rnk"].to_numpy() == np.arange(1, n + 1)).all()
            sizes = out.groupby("quartile").size()
            big, small = -(-n // 4), n // 4
            exp = [big] * (n % 4) + [small] * (4 - n % 4)
            assert sizes.sort_index().tolist() == exp

    def test_both_legs_agree(self, ray_session):
        from documentprocessor_ray.functions.window import global_rank

        rng = np.random.default_rng(12)
        n = 1500
        key = rng.integers(0, 200, n).astype(np.int64)
        ids = rng.permutation(n).astype(np.int64)
        ds = ray.data.from_arrow(pa.table({
            "k": pa.array(key, pa.int64()),
            "doc_id": pa.array(ids, pa.int64())}))
        a = global_rank(ds, "k", "doc_id", max_driver_keys=65536) \
            .to_pandas().sort_values("rnk").reset_index(drop=True)
        b = global_rank(ds, "k", "doc_id", max_driver_keys=4) \
            .to_pandas().sort_values("rnk").reset_index(drop=True)
        assert (a["k"] == b["k"]).all()
        assert (a["doc_id"] == b["doc_id"]).all()
        assert (a["rnk"] == b["rnk"]).all()

    def test_million_distinct_keys_off_driver(self, ray_session):
        """The VERDICT's done-bar: rank on a ~1e6-distinct key with the
        distributed leg (driver holds only num_buckets scalars)."""
        from documentprocessor_ray.functions.window import global_rank

        n = 1_000_000
        key = np.arange(n, dtype=np.int64)
        rng = np.random.default_rng(13)
        rng.shuffle(key)
        ids = np.arange(n, dtype=np.int64)
        ds = ray.data.from_arrow(pa.table({
            "k": pa.array(key, pa.int64()),
            "doc_id": pa.array(ids, pa.int64())})) \
            .repartition(8)
        out = global_rank(ds, "k", "doc_id", descending=False,
                          max_driver_keys=1000)
        # every key distinct -> rank == k+1; verify via a distributed
        # mismatch count, never collecting the ranked table
        bad = out.map_batches(
            lambda b: pa.table({"bad": pa.array(
                [int((b["rnk"].to_numpy(zero_copy_only=False)
                      != b["k"].to_numpy(zero_copy_only=False) + 1).sum())],
                pa.int64())}),
            batch_format="pyarrow").sum("bad")
        assert bad == 0

    def test_outlier_key_distribution(self, ray_session):
        """Review fix: equal-width range buckets collapse when one
        sentinel key (0) sits next to timestamp-like keys (~1.7e18).
        Sample-based split points must keep the result exact (and spread
        the real keys); verify exact ranks under that distribution."""
        from documentprocessor_ray.functions.window import global_rank

        rng = np.random.default_rng(21)
        n = 3000
        key = np.int64(1_700_000_000_000_000_000) + \
            rng.integers(0, 10_000_000, n).astype(np.int64)
        key[:25] = 0  # missing-value sentinels
        ids = rng.permutation(n).astype(np.int64)
        ds = ray.data.from_arrow(pa.table({
            "k": pa.array(key, pa.int64()),
            "doc_id": pa.array(ids, pa.int64())}))
        out = global_rank(ds, "k", "doc_id", descending=False,
                          max_driver_keys=8).to_pandas() \
            .sort_values("rnk").reset_index(drop=True)
        order = np.lexsort((ids, key))
        assert (out["k"].to_numpy() == key[order]).all()
        assert (out["doc_id"].to_numpy() == ids[order]).all()
        assert (out["rnk"].to_numpy() == np.arange(1, n + 1)).all()
