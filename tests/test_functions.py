"""Unit tests for the training-data operators (textstats / dedup /
similarity) — small deterministic inputs, exact expectations."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from documentprocessor_ray.functions import dedup as D
from documentprocessor_ray.functions import similarity as S
from documentprocessor_ray.functions import textstats as T


def _docs_table(texts, ids=None):
    ids = ids if ids is not None else list(range(len(texts)))
    return pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(texts, pa.string()),
    })


class TestTextStats:
    def test_normalize_matches_oracle(self):
        from documentprocessor_ray.oracle.textnorm import normalize_text
        texts = [
            "<html><b>Hello</b>   world &amp; friends</html>",
            "<script>var x=1;</script>keep &lt;this&gt;",
            "<style type='x'>b{}</style>plain",
            "", "   spaced   out   ",
        ]
        out = T.normalize_batch(_docs_table(texts))
        assert out["norm_text"].to_pylist() == [normalize_text(t) for t in texts]

    def test_token_count(self):
        out = T.token_count_batch(_docs_table(["a b  c", "", "  ", "one"]))
        assert out["n_tokens"].to_pylist() == [3, 0, 0, 1]

    def test_quality_stats(self):
        out = T.quality_stats_batch(_docs_table(["The cat and a hat!", ""]))
        row = {c: out[c][0].as_py() for c in out.column_names}
        assert row["n_tokens"] == 5
        assert row["n_stop"] == 3  # the, and, a
        assert row["n_alpha"] == 13
        assert row["n_chars"] == 18
        assert out["n_tokens"][1].as_py() == 0

    def test_fingerprint_is_md5_of_normalized(self):
        import hashlib
        from documentprocessor_ray.oracle.textnorm import normalize_text
        texts = ["<p>x</p>", "plain"]
        out = T.fingerprint_md5_batch(_docs_table(texts))
        exp = [hashlib.md5(normalize_text(t).encode()).hexdigest() for t in texts]
        assert out["fingerprint"].to_pylist() == exp

    def test_langid_stateful_batch(self):
        model = T.LangIdModel()
        out = model(_docs_table(["the thing and the other thing", ""]))
        assert out["pred_lang"].to_pylist()[0] == "en"
        assert out["pred_lang"].to_pylist()[1] == "und"

    def test_winnow_deterministic(self):
        t = _docs_table(["the quick brown fox jumps over the lazy dog again and again"])
        a = T.winnow_fingerprint_batch(t)
        b = T.winnow_fingerprint_batch(t)
        assert a["sketch_hash"].to_pylist() == b["sketch_hash"].to_pylist()
        assert a["n_sketch"][0].as_py() >= 1


class TestDedup:
    def test_exact_dedup(self, ray_session):
        ds = ray.data.from_arrow(_docs_table(["same", "same", "other"], [5, 2, 9]))
        out = D.exact_dedup(ds).to_pandas().sort_values("keep_id").reset_index(drop=True)
        assert list(out["keep_id"]) == [2, 9]
        assert list(out["n_dups"]) == [2, 1]

    def test_jaccard_pairs_exact(self, ray_session):
        # doc0 vs doc1: tokens {a b c d} vs {a b c e} -> J = 3/5 = 0.6 >= 3/5
        # doc2 disjoint
        ds = ray.data.from_arrow(_docs_table(["a b c d", "a b c e", "x y z w"]))
        out = D.jaccard_pairs(ds, 3, 5).to_pandas()
        assert len(out) == 1
        assert (out.iloc[0]["doc_a"], out.iloc[0]["doc_b"]) == (0, 1)
        assert (out.iloc[0]["n_inter"], out.iloc[0]["n_union"]) == (3, 5)

    def test_ngram_jaccard_exact(self, ray_session):
        # shingles of "a b c d": {a b c, b c d}; "a b c e": {a b c, b c e}
        # J = 1/3 >= 1/3; third doc disjoint
        ds = ray.data.from_arrow(_docs_table(["a b c d", "a b c e", "x y z w"]))
        out = D.jaccard_pairs(ds, 1, 3, shingle_k=3).to_pandas()
        assert len(out) == 1
        assert (out.iloc[0]["n_inter"], out.iloc[0]["n_union"]) == (1, 3)

    def test_shingle_helper_matches_sql_model(self):
        assert D._distinct_shingles("A b a b a", 2) == ["a b", "b a"]
        assert D._distinct_shingles("one two", 3) == []
        assert D._distinct_shingles("", 3) == []

    def test_minhash_detects_near_dup(self, ray_session):
        base = "the quick brown fox jumps over the lazy dog " * 5
        near = base.replace("lazy", "sleepy", 1)
        other = "completely different words entirely unrelated content here now " * 5
        ds = ray.data.from_arrow(_docs_table([base, near, other]))
        out = D.minhash_lsh_pairs(ds, threshold=0.3).to_pandas()
        pairs = set(zip(out["doc_a"], out["doc_b"]))
        assert (0, 1) in pairs
        assert (0, 2) not in pairs and (1, 2) not in pairs

    def test_simhash_hamming(self, ray_session):
        base = "alpha beta gamma delta epsilon zeta eta theta " * 4
        near = base.replace("zeta", "zetaa", 1)
        other = "one two three four five six seven eight nine ten " * 4
        ds = ray.data.from_arrow(_docs_table([base, near, other]))
        out = D.simhash_pairs(ds, max_hamming=6).to_pandas()
        pairs = set(zip(out["doc_a"], out["doc_b"]))
        assert (0, 1) in pairs

    def test_simhash64_pure(self):
        assert D.simhash64("") == 0
        a = D.simhash64("hello world hello")
        assert a == D.simhash64("hello world hello")  # deterministic
        assert 0 < a < 2 ** 64

    def test_simhash64_batch_matches_scalar_reference(self):
        """The vectorized batch kernel must reproduce the per-token scalar
        definition bit-for-bit (tf-weighted ±1 bit votes, little-endian
        blake2b-8 token hashes)."""
        import hashlib
        from collections import Counter

        def scalar_ref(text):
            toks = D._re2_tokens(text)
            if not toks:
                return 0
            acc = np.zeros(64, dtype=np.int64)
            for tok, cnt in Counter(toks).items():
                h = int.from_bytes(
                    hashlib.blake2b(tok.encode(), digest_size=8).digest(), "little")
                bits = np.unpackbits(
                    np.frombuffer(h.to_bytes(8, "little"), dtype=np.uint8))
                acc += cnt * (bits.astype(np.int64) * 2 - 1)
            out = 0
            for i, v in enumerate(acc):
                if v > 0:
                    out |= (1 << i)
            return out

        texts = ["hello world hello", "", "a", "x y z x y z unique",
                 "The   Quick\tBrown Fox", "unicode tøkens ünïque"]
        assert D.simhash64_batch(texts) == [scalar_ref(t) for t in texts]

    def test_token_hashes_match_scalar_fnv(self):
        from documentprocessor_ray.functions.textstats import _token_hashes

        def fnv(t):
            h = 1469598103934665603
            for b in t.encode("utf-8"):
                h = ((h ^ b) * 1099511628211) & 0xFFFFFFFFFFFFFFFF
            return h

        toks = np.array(["a", "hello", "", "tøken", "longer-token-here"],
                        dtype=object)
        got = _token_hashes(toks)
        assert got.tolist() == [fnv(t) for t in toks]

    def test_pair_clusters_union_find(self, ray_session):
        pairs = ray.data.from_arrow(pa.table({
            "doc_a": pa.array([1, 2, 7], pa.int64()),
            "doc_b": pa.array([2, 3, 9], pa.int64()),
        }))
        m = D.pair_clusters(pairs)
        assert m[1] == m[2] == m[3] == 1
        assert m[7] == m[9] == 7
        assert 5 not in m

    def test_distributed_clusters_match_union_find(self, ray_session):
        """cluster_pairs_distributed == driver union-find on a graph with a
        chain (multi-round propagation), a star, and a disjoint pair."""
        edges = [(1, 2), (2, 3), (3, 4), (4, 5),          # chain, rep 1
                 (10, 11), (10, 12), (10, 13),            # star, rep 10
                 (20, 21)]                                # pair, rep 20
        pairs = ray.data.from_arrow(pa.table({
            "doc_a": pa.array([a for a, _ in edges], pa.int64()),
            "doc_b": pa.array([b for _, b in edges], pa.int64()),
        }))
        oracle = D.pair_clusters(pairs)
        # small_graph_rows=0 forces the ITERATIVE scale path (the default
        # would short-circuit a graph this small into one union-find task)
        got = D.cluster_pairs_distributed(pairs, small_graph_rows=0).to_pandas()
        assert dict(zip(got["doc_id"], got["cluster_rep"])) == oracle
        # the small-graph short-circuit must agree with both
        sc = D.cluster_pairs_distributed(pairs).to_pandas()
        assert dict(zip(sc["doc_id"], sc["cluster_rep"])) == oracle

    def test_distributed_clusters_empty(self, ray_session):
        pairs = ray.data.from_arrow(pa.table({
            "doc_a": pa.array([], pa.int64()),
            "doc_b": pa.array([], pa.int64()),
        }))
        got = D.cluster_pairs_distributed(pairs)
        assert got.count() == 0
        assert set(got.schema().names) == {"doc_id", "cluster_rep"}

    def test_group_cap_drops_hot_key_and_logs(self, caplog):
        """_pairs_by_key skips key groups above group_cap and logs the drop
        (called in-process: the warning fires inside Ray workers in real
        runs, so the unit test exercises the wrapper directly)."""
        import logging as _logging

        emitted = []

        def local_fn(g, idxs):
            emitted.append(list(idxs))
            return pa.table({"doc_a": pa.array([], pa.int64()),
                             "doc_b": pa.array([], pa.int64())})

        g = pa.table({
            "key": pa.array(["hot"] * 5 + ["cold"] * 2, pa.string()),
            "doc_id": pa.array(range(7), pa.int64()),
        })
        with caplog.at_level(_logging.WARNING,
                             logger="documentprocessor_ray.functions.dedup"):
            D._pairs_by_key(local_fn, group_cap=3)(g)
        assert any("group_cap" in r.message for r in caplog.records)
        assert [5, 6] in emitted                 # cold group processed
        assert [0, 1, 2, 3, 4] not in emitted    # hot group dropped

    def test_group_cap_none_keeps_all(self, ray_session):
        """Default (no cap) behavior unchanged: identical docs pair up."""
        docs = ["same words here entirely"] * 4
        out = D.jaccard_pairs(ray.data.from_arrow(_docs_table(docs)),
                              threshold_num=3, threshold_den=5).to_pandas()
        assert len(out) == 6  # all C(4,2) pairs

    def test_df_sketch_identical_output(self, ray_session):
        """The bounded DF sketch only reorders prefixes; the exact verify
        makes the final pair set identical to the exact-dict path."""
        docs = ["alpha beta gamma delta", "alpha beta gamma epsilon",
                "zeta eta theta iota", "alpha beta gamma delta",
                "completely different content here"]
        ds = ray.data.from_arrow(_docs_table(docs))
        exact = D.jaccard_pairs(ds, 3, 5, df_sketch_bits=None).to_pandas()
        sketched = D.jaccard_pairs(ds, 3, 5, df_sketch_bits=12).to_pandas()
        key = ["doc_a", "doc_b", "n_inter", "n_union"]
        assert sorted(map(tuple, exact[key].values.tolist())) == \
            sorted(map(tuple, sketched[key].values.tolist()))

    def test_embedding_lsh_subset_of_exact(self, ray_session):
        """Sign-LSH near-dup: finds the near-identical pair; every emitted
        pair is exact-verified, so LSH pairs are a subset of the exact set."""
        rng = np.random.default_rng(4)
        vecs = rng.normal(size=(40, 16))
        vecs[1] = vecs[0] + rng.normal(scale=0.01, size=16)  # near-dup of 0
        ds = ray.data.from_arrow(pa.table({
            "vec_id": pa.array(range(40), pa.int64()),
            "embedding": pa.array([list(map(float, v)) for v in vecs],
                                  pa.list_(pa.float32())),
        }))
        lsh = D.embedding_neardup_lsh_pairs(ds, threshold=0.9).to_pandas()
        exact = D.embedding_neardup_pairs(ds, threshold=0.9).to_pandas()
        lsh_pairs = set(zip(lsh["vec_a"], lsh["vec_b"]))
        exact_pairs = set(zip(exact["vec_a"], exact["vec_b"]))
        assert (0, 1) in lsh_pairs
        assert lsh_pairs <= exact_pairs

    def test_embedding_neardup(self, ray_session):
        vecs = [[1.0, 0.0], [0.999, 0.01], [0.0, 1.0]]
        ds = ray.data.from_arrow(pa.table({
            "vec_id": pa.array([0, 1, 2], pa.int64()),
            "embedding": pa.array(vecs, pa.list_(pa.float32())),
        }))
        out = D.embedding_neardup_pairs(ds, threshold=0.95).to_pandas()
        assert set(zip(out["vec_a"], out["vec_b"])) == {(0, 1)}


class TestSimilarity:
    @pytest.fixture()
    def emb_ds(self, ray_session):
        rng = np.random.default_rng(3)
        m = rng.normal(size=(60, 8)).astype(np.float32)
        return ray.data.from_arrow(pa.table({
            "vec_id": pa.array(range(60), pa.int64()),
            "embedding": pa.array([list(map(float, r)) for r in m],
                                  pa.list_(pa.float32())),
        })), m

    def test_bruteforce_matches_numpy(self, emb_ds):
        ds, m = emb_ds
        out = S.knn_bruteforce(ds, n_queries=2, k=5).to_pandas()
        mm = m.astype(np.float64)
        mm = mm / np.linalg.norm(mm, axis=1, keepdims=True)
        sims = np.round(mm[:2] @ mm.T, 6)
        for q in range(2):
            s = sims[q].copy()
            s[q] = -np.inf
            order = np.lexsort((np.arange(60), -s))[:5]
            got = out[out["qid"] == q].sort_values("rank")["vec_id"].tolist()
            assert got == [int(x) for x in order]

    def test_ivf_shape_and_rank(self, emb_ds):
        ds, _ = emb_ds
        out = S.knn_ivf(ds, n_queries=2, k=5, n_lists=4, nprobe=2,
                        sample_size=60).to_pandas()
        assert set(out.columns) == {"qid", "vec_id", "rank", "sim"}
        for q in (0, 1):
            ranks = out[out["qid"] == q]["rank"].tolist()
            assert ranks == sorted(ranks)
            assert q not in out[out["qid"] == q]["vec_id"].tolist()

    def test_ivf_recall_vs_bruteforce(self, emb_ds):
        ds, _ = emb_ds
        bf = S.knn_bruteforce(ds, n_queries=2, k=5).to_pandas()
        ivf = S.knn_ivf(ds, n_queries=2, k=5, n_lists=2, nprobe=2,
                        sample_size=60).to_pandas()
        # nprobe == n_lists -> exhaustive -> identical to brute force
        for q in (0, 1):
            a = bf[bf["qid"] == q].sort_values("rank")["vec_id"].tolist()
            b = ivf[ivf["qid"] == q].sort_values("rank")["vec_id"].tolist()
            assert a == b

    def test_int8_matches_numpy_and_parallelism(self, emb_ds):
        ds, m = emb_ds
        maxabs = float(np.abs(m).max())
        qm = np.floor(m.astype(np.float64) / maxabs * 127 + 0.5) \
            .astype(np.int64)
        scores = qm[:2] @ qm.T
        out = S.knn_int8(ds, n_queries=2, k=5).to_pandas()
        for q in (0, 1):
            ids = np.array([i for i in range(60) if i != q])
            s = scores[q][ids]
            order = ids[np.lexsort((ids, -s))[:5]]
            g = out[out["qid"] == q].sort_values("rank")
            assert g["vec_id"].tolist() == [int(x) for x in order]
            assert g["score"].tolist() == [int(scores[q][i]) for i in order]
        # block-count invariance (partial top-k merge is associative)
        out7 = S.knn_int8(ds.repartition(7), n_queries=2, k=5).to_pandas()
        a = out.sort_values(["qid", "rank"]).reset_index(drop=True)
        b = out7.sort_values(["qid", "rank"]).reset_index(drop=True)
        assert a.equals(b)


class TestDistributedClustersRandom:
    def test_random_graph_matches_union_find(self, ray_session):
        """Seeded random graph (chains + triangles + singdoubles): the
        distributed labels equal the union-find oracle exactly."""
        rng = np.random.default_rng(17)
        edges = set()
        while len(edges) < 60:
            a, b = int(rng.integers(0, 80)), int(rng.integers(0, 80))
            if a != b:
                edges.add((min(a, b), max(a, b)))
        edges = sorted(edges)
        pairs = ray.data.from_arrow(pa.table({
            "doc_a": pa.array([a for a, _ in edges], pa.int64()),
            "doc_b": pa.array([b for _, b in edges], pa.int64()),
        }))
        oracle = D.pair_clusters(pairs)
        got = D.cluster_pairs_distributed(pairs, small_graph_rows=0).to_pandas()
        assert dict(zip(got["doc_id"], got["cluster_rep"])) == oracle
        sc = D.cluster_pairs_distributed(pairs).to_pandas()
        assert dict(zip(sc["doc_id"], sc["cluster_rep"])) == oracle


class TestBoilerplate:
    def test_link_farm_rejected_body_kept(self):
        from documentprocessor_ray.functions.boilerplate import (
            extract_main_content_batch)

        body = "this is the real article content " * 3  # > 50 chars
        nav = " ".join(f'<a href="#">link{i}</a>' for i in range(8))
        html = f"<div>{nav}</div><p>{body.strip()}</p><div>ok</div>"
        out = extract_main_content_batch(pa.table({
            "doc_id": pa.array([1], pa.int64()),
            "html": pa.array([html], pa.string()),
        }))
        assert out["n_kept"][0].as_py() == 1
        assert out["main_text"][0].as_py() == body.strip()

    def test_short_and_empty_blocks_dropped(self):
        from documentprocessor_ray.functions.boilerplate import (
            extract_main_content_batch)

        out = extract_main_content_batch(pa.table({
            "doc_id": pa.array([1, 2], pa.int64()),
            "html": pa.array(["<div>tiny</div><p>also small</p>", ""],
                             pa.string()),
        }))
        assert out["main_text"].to_pylist() == ["", ""]
        assert out["n_kept"].to_pylist() == [0, 0]

    def test_low_link_density_long_block_kept(self):
        from documentprocessor_ray.functions.boilerplate import (
            extract_main_content_batch)

        body = ("prose with one <a href='#'>ref</a> inside " +
                "and plenty of surrounding words to stay well above limits")
        out = extract_main_content_batch(pa.table({
            "doc_id": pa.array([1], pa.int64()),
            "html": pa.array([f"<p>{body}</p>", ], pa.string()),
        }))
        assert out["n_kept"][0].as_py() == 1
        assert "ref" in out["main_text"][0].as_py()


class TestPayloadFetchPlans:
    """The cost-based physical-plan switch (replicate payload on band rows
    vs two-hop fetch) must be output-invariant."""

    def test_minhash_plans_identical(self, ray_session):
        docs = ["the quick brown fox jumps over the lazy dog today",
                "the quick brown fox jumps over the lazy dog tonight",
                "completely different content with other words entirely",
                "the quick brown fox jumps over the lazy dog today"]
        ds = ray.data.from_arrow(_docs_table(docs))
        key = ["doc_a", "doc_b", "est_jaccard"]
        small = D.minhash_lsh_pairs(ds, threshold=0.3, payload_fetch=False) \
            .to_pandas()
        big = D.minhash_lsh_pairs(ds, threshold=0.3, payload_fetch=True) \
            .to_pandas()
        assert sorted(map(tuple, small[key].values.tolist())) == \
            sorted(map(tuple, big[key].values.tolist()))
        assert len(small) > 0

    def test_embedding_lsh_plans_identical(self, ray_session):
        rng = np.random.default_rng(6)
        vecs = rng.normal(size=(30, 16))
        vecs[1] = vecs[0] + rng.normal(scale=0.01, size=16)
        ds = ray.data.from_arrow(pa.table({
            "vec_id": pa.array(range(30), pa.int64()),
            "embedding": pa.array([list(map(float, v)) for v in vecs],
                                  pa.list_(pa.float32())),
        }))
        key = ["vec_a", "vec_b", "sim_milli"]
        small = D.embedding_neardup_lsh_pairs(
            ds, threshold=0.9, payload_fetch=False).to_pandas()
        big = D.embedding_neardup_lsh_pairs(
            ds, threshold=0.9, payload_fetch=True).to_pandas()
        assert sorted(map(tuple, small[key].values.tolist())) == \
            sorted(map(tuple, big[key].values.tolist()))
        assert len(small) > 0


class TestDecontaminate:
    def test_shared_shingles_counted(self, ray_session):
        """Doc sharing a 3-gram with an eval doc gets n_shared >= 1; clean
        docs report 0; eval docs are not emitted."""
        texts = ["alpha beta gamma delta epsilon",      # id 0 -> eval
                 "alpha beta gamma other words here",   # id 1 -> shares 1
                 "totally different content entirely",  # id 2 -> clean
                 "alpha beta gamma delta trailing"]     # id 3 -> shares 2
        ds = ray.data.from_arrow(_docs_table(texts))

        def eval_mask(ids):
            return np.asarray(ids) == 0

        out = D.decontaminate(ds, shingle_k=3, eval_mask_fn=eval_mask) \
            .to_pandas().set_index("doc_id")["n_shared"].to_dict()
        assert 0 not in out                # eval doc not emitted
        assert out[1] == 1                 # "alpha beta gamma"
        assert out[2] == 0                 # clean but PRESENT
        assert out[3] == 2                 # "alpha beta gamma", "beta gamma delta"

    def test_empty_text_train_doc_reports_zero(self, ray_session):
        ds = ray.data.from_arrow(_docs_table(["alpha beta gamma", ""], [0, 7]))

        def eval_mask(ids):
            return np.asarray(ids) == 0

        out = D.decontaminate(ds, shingle_k=3, eval_mask_fn=eval_mask) \
            .to_pandas().set_index("doc_id")["n_shared"].to_dict()
        assert out == {7: 0}


class TestGroupedQuantiles:
    """grouped_quantile_disc vs a scalar sorted-index reference
    (idx = max(1, ceil(q*n)), 1-based — DuckDB quantile_disc semantics,
    probed over all n/q combos in scripts history)."""

    @staticmethod
    def _ref(keys, vals, qs):
        import math
        from collections import defaultdict
        groups = defaultdict(list)
        for k, v in zip(keys, vals):
            groups[k].append(v)
        out = {}
        for k, vs in groups.items():
            vs = sorted(vs)
            out[k] = tuple(vs[max(1, math.ceil(q * len(vs))) - 1] for q in qs)
        return out

    def test_matches_reference_random(self, ray_session):
        from documentprocessor_ray.functions.agg import grouped_quantile_disc
        rng = np.random.default_rng(11)
        n = 5000
        k1 = rng.integers(0, 40, n)          # int key, some groups tiny
        k2 = rng.choice(["a", "b", "c"], n)  # string key
        v = rng.integers(-100, 100, n)
        ds = ray.data.from_arrow(pa.table({
            "k1": pa.array(k1, pa.int64()), "k2": pa.array(k2),
            "v": pa.array(v, pa.int64())}))
        qs = [0.0, 0.25, 0.5, 0.9, 1.0]
        out = grouped_quantile_disc(ds, ["k1", "k2"], "v", qs,
                                    q_names=[f"x{i}" for i in range(5)],
                                    num_buckets=8).to_pandas()
        ref = self._ref(list(zip(k1.tolist(), k2.tolist())), v.tolist(), qs)
        assert len(out) == len(ref)
        for row in out.itertuples(index=False):
            assert ref[(row.k1, row.k2)] == (row.x0, row.x1, row.x2,
                                             row.x3, row.x4)

    def test_singleton_and_duplicate_groups(self, ray_session):
        from documentprocessor_ray.functions.agg import grouped_quantile_disc
        t = pa.table({"k": pa.array([1, 2, 2, 2, 2], pa.int64()),
                      "v": pa.array([7, 5, 5, 5, 9], pa.int64())})
        out = grouped_quantile_disc(
            ray.data.from_arrow(t), ["k"], "v", [0.5, 0.95],
            num_buckets=4).to_pandas().set_index("k")
        assert out.loc[1, "q50"] == 7 and out.loc[1, "q95"] == 7
        # group 2 sorted: [5,5,5,9]; q50 idx=ceil(2)=2 -> 5; q95 idx=4 -> 9
        assert out.loc[2, "q50"] == 5 and out.loc[2, "q95"] == 9
        assert out.loc[2, "n_vals"] == 4

    def test_cont_matches_duckdb_bitwise(self, ray_session):
        import duckdb
        import pandas as pd
        from documentprocessor_ray.functions.agg import grouped_quantile_cont
        rng = np.random.default_rng(13)
        n = 4000
        k = rng.integers(0, 37, n)  # tiny + bigger groups, fractional RN
        v = rng.integers(-500, 500, n)
        ds = ray.data.from_arrow(pa.table({
            "k": pa.array(k, pa.int64()), "v": pa.array(v, pa.int64())}))
        qs = [0.0, 0.1, 0.25, 0.33, 0.5, 0.75, 0.9, 1.0]
        names = [f"x{i}" for i in range(len(qs))]
        got = grouped_quantile_cont(ds, ["k"], "v", qs, q_names=names,
                                    num_buckets=8).to_pandas() \
            .set_index("k").sort_index()
        sel = ", ".join(f"quantile_cont(v, {q!r}) AS x{i}"
                        for i, q in enumerate(qs))
        t = pd.DataFrame({"k": k.astype("int64"), "v": v.astype("int64")})
        exp = duckdb.sql(
            f"SELECT k, {sel} FROM t GROUP BY k ORDER BY k").df() \
            .set_index("k")
        for name in names:
            # bitwise equality — the interpolation formula must match, not
            # just be close
            assert (got[name].to_numpy() == exp[name].to_numpy()).all(), name


class TestInvertedIndex:
    def test_df_tf_postings(self, ray_session):
        import hashlib
        t = pa.table({
            "doc_id": pa.array([3, 1, 2, 9], pa.int64()),
            "text": pa.array(["apple Banana apple", "banana cherry",
                              "  ", "APPLE"], pa.string())})
        out = T.inverted_index(ray.data.from_arrow(t), num_buckets=4) \
            .to_pandas().set_index("token")
        # doc 2 is blank -> excluded entirely
        assert set(out.index) == {"apple", "banana", "cherry"}
        assert out.loc["apple", "df"] == 2 and out.loc["apple", "tf"] == 3
        assert out.loc["banana", "df"] == 2 and out.loc["banana", "tf"] == 2
        assert out.loc["cherry", "df"] == 1
        # postings digest pins ascending doc order: apple in docs 3 and 9
        exp = hashlib.md5(b"3,9").hexdigest()
        assert out.loc["apple", "postings_md5"] == exp
        assert out.loc["banana", "postings_md5"] == \
            hashlib.md5(b"1,3").hexdigest()

    def test_doc_top_terms_rank_and_ties(self, ray_session):
        t = pa.table({
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": pa.array(["rare rare common zeta", "common zeta"],
                             pa.string())})
        out = T.doc_top_terms(ray.data.from_arrow(t), k=2, num_buckets=4) \
            .to_pandas()
        d1 = out[out.doc_id == 1].set_index("rank")
        # doc1: rare tf=2 df=1 -> 2.0; common tf=1 df=2 -> 0.5; zeta 0.5
        assert d1.loc[1, "token"] == "rare"
        assert d1.loc[2, "token"] == "common"   # tie 0.5 broken token asc
        d2 = out[out.doc_id == 2].set_index("rank")
        assert list(d2["token"]) == ["common", "zeta"]


class TestHll:
    def test_group_distinct_within_tolerance(self, ray_session):
        from documentprocessor_ray.functions.sketches import hll_group_distinct
        rng = np.random.default_rng(21)
        # three groups with very different cardinalities; values repeat
        rows_k, rows_v = [], []
        for g, card in [(0, 50), (1, 2000), (2, 20000)]:
            vals = rng.integers(0, 1 << 61, card)
            picks = vals[rng.integers(0, card, card * 2)]  # duplicates
            rows_k += [g] * len(picks)
            rows_v += picks.tolist()
        ds = ray.data.from_arrow(pa.table({
            "g": pa.array(rows_k, pa.int64()),
            "v": pa.array(rows_v, pa.int64())}))
        out = hll_group_distinct(ds, ["g"], "v", p=12, num_buckets=8) \
            .to_pandas().set_index("g")
        import collections
        exact = collections.defaultdict(set)
        for g, v in zip(rows_k, rows_v):
            exact[g].add(v)
        for g in (0, 1, 2):
            est = int(out.loc[g, "approx_distinct"])
            true = len(exact[g])
            assert abs(est - true) / true < 0.06, (g, est, true)

    def test_merge_invariance_across_batch_splits(self, ray_session):
        """Same multiset split into different batch layouts must give the
        IDENTICAL estimate (sketch merge is exact)."""
        from documentprocessor_ray.functions.sketches import hll_group_distinct
        rng = np.random.default_rng(4)
        v = rng.integers(0, 1 << 60, 5000)
        t = pa.table({"g": pa.array(np.zeros(5000, np.int64)),
                      "v": pa.array(v, pa.int64())})
        a = hll_group_distinct(ray.data.from_arrow(t), ["g"], "v",
                               p=12, num_buckets=8).to_pandas()
        b = hll_group_distinct(
            ray.data.from_arrow(t).repartition(13), ["g"], "v",
            p=12, num_buckets=8).to_pandas()
        assert int(a.loc[0, "approx_distinct"]) == \
            int(b.loc[0, "approx_distinct"])


class TestRevenueRollup:
    def test_rollup_levels_consistent(self, ray_session):
        """ROLLUP invariants: the 'ALL' subtotal per priority equals the sum
        of its fine rows, and the grand total equals the sum of subtotals."""
        from documentprocessor_ray.pipelines.analysis import q_revenue_rollup
        df = q_revenue_rollup("/root/testdata/sf0.001").to_pandas()
        fine = df[(df.o_orderpriority != "ALL") & (df.o_orderstatus != "ALL")]
        sub = df[(df.o_orderpriority != "ALL") & (df.o_orderstatus == "ALL")]
        grand = df[(df.o_orderpriority == "ALL") & (df.o_orderstatus == "ALL")]
        assert len(grand) == 1
        assert int(grand.revenue_cents.iloc[0]) == int(fine.revenue_cents.sum())
        assert int(grand.n_orders.iloc[0]) == int(fine.n_orders.sum())
        for prio, g in fine.groupby("o_orderpriority"):
            row = sub[sub.o_orderpriority == prio]
            assert len(row) == 1, prio
            assert int(row.revenue_cents.iloc[0]) == int(g.revenue_cents.sum())
            assert int(row.n_orders.iloc[0]) == int(g.n_orders.sum())


class TestChunkDedup:
    def _brute(self, docs, k=10):
        import re as _re
        rows = []
        for doc_id, text in docs:
            t = _re.sub(r"^[\t\n\f\r ]+|[\t\n\f\r ]+$", "", text)
            toks = _re.split(r"[\t\n\f\r ]+", t) if True else []
            # RE2 split of "" yields [""] — one empty chunk
            chunks = [" ".join(toks[i:i + k])
                      for i in range(0, max(len(toks), 1), k)]
            for ci, c in enumerate(chunks):
                rows.append((doc_id, ci, c))
        first = {}
        for doc_id, ci, c in sorted(rows):
            first.setdefault(c, (doc_id, ci))
        out = {}
        for doc_id, ci, c in rows:
            keep = first[c] == (doc_id, ci)
            d = out.setdefault(doc_id, {"kept": [], "n": 0})
            d["n"] += 1
            if keep:
                d["kept"].append(c)
        return {i: (" ".join(d["kept"]), d["n"], len(d["kept"]))
                for i, d in out.items()}

    def test_matches_bruteforce_with_edge_cases(self, ray_session):
        words = ["alpha", "beta", "gamma", "delta", "eps"]
        rng = np.random.default_rng(11)
        docs = []
        for i in range(40):
            n = int(rng.integers(0, 35))  # includes 0-token (blank) docs
            docs.append((i, " ".join(words[int(j)] for j in
                                     rng.integers(0, len(words), n))))
        # doc 40 repeats doc 3's text exactly: every chunk is a dup
        docs.append((40, docs[3][1]))
        # doc 41 is blank-with-whitespace
        docs.append((41, "  \t "))
        ds = ray.data.from_arrow(pa.table({
            "doc_id": pa.array([d[0] for d in docs], pa.int64()),
            "text": pa.array([d[1] for d in docs], pa.string())}))
        got = {r["doc_id"]: (r["clean_text"], r["n_chunks"], r["n_kept"])
               for r in D.chunk_dedup(ds, chunk_tokens=10).take_all()}
        exp = self._brute(docs, k=10)
        assert got == exp
        assert got[40][2] < got[40][1]  # full-repeat doc loses chunks


class TestRedact:
    def test_pii_preset_scrubs_and_counts(self):
        t = pa.table({
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array([
                "mail a@b.co or 192.168.0.1 ssn 123-45-6789 tel +1 (555) 123-4567",
                "clean text with no pii at all",
                "two mails: x.y+z@test.org w@example.io",
            ])})
        out = T.redact_batch(t).to_pydict()
        assert out["red_text"][0] == "mail <EMAIL> or <IP> ssn <SSN> tel <PHONE>"
        assert out["n_redactions"] == [4, 0, 2]
        assert out["red_text"][1] == "clean text with no pii at all"
        assert "<EMAIL> <EMAIL>" in out["red_text"][2]

    def test_sequential_semantics(self):
        # after the ipv4 pass, the phone pattern must not re-match the <IP>
        t = pa.table({"doc_id": pa.array([1], pa.int64()),
                      "text": pa.array(["ip 10.20.30.40 end"])})
        out = T.redact_batch(t).to_pydict()
        assert out["red_text"][0] == "ip <IP> end"
        assert out["n_redactions"] == [1]

    def test_extract_int_field_null_on_miss(self):
        t = pa.table({"event_id": pa.array([1, 2], pa.int64()),
                      "props": pa.array(['{"k": 5}', "zzz"])})
        out = T.extract_int_field_batch(
            t, "props", r'"k": (?P<k>\d+)', "k").to_pydict()
        assert out["k"] == [5, None]


class TestRepetitionStats:
    def test_counts_and_flag(self):
        t = pa.table({
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": pa.array([
                "a b c d e f g h i j k l m n o p q r s t",   # 20 uniq
                "spam " * 19 + "spam",                        # 20x same token
                "",                                            # blank
                "x y",                                         # tiny
            ])})
        out = T.repetition_stats_batch(t).to_pydict()
        assert out["n_tokens"] == [20, 20, 0, 2]
        assert out["n_distinct"] == [20, 1, 0, 2]
        assert out["top_count"] == [1, 20, 0, 1]
        assert out["n_2grams"] == [19, 19, 0, 1]
        assert out["n_dup_2grams"] == [0, 18, 0, 0]
        assert out["n_3grams"] == [18, 18, 0, 0]
        assert out["n_dup_3grams"] == [0, 17, 0, 0]
        assert out["flag_repetitive"] == [False, True, False, False]

    def test_shingles_do_not_cross_docs(self):
        # identical tail/head tokens in adjacent docs must not create
        # cross-document 2-grams
        t = pa.table({
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": pa.array(["p q", "q p"])})
        out = T.repetition_stats_batch(t).to_pydict()
        assert out["n_2grams"] == [1, 1]
        assert out["n_dup_2grams"] == [0, 0]


class TestCmsHeavyHitters:
    def _zipf_ds(self, n=30000, seed=3):
        rng = np.random.default_rng(seed)
        v = rng.zipf(1.5, n).astype(np.int64) % 1000
        return v, ray.data.from_arrow(pa.table({"v": pa.array(v, pa.int64())}))

    def test_overestimate_and_topk(self, ray_session):
        from documentprocessor_ray.functions.sketches import cms_heavy_hitters
        v, ds = self._zipf_ds()
        out = cms_heavy_hitters(ds.repartition(8), "v", k=10).to_pandas()
        import collections
        true = collections.Counter(v.tolist())
        n = len(v)
        for _, r in out.iterrows():
            t = true[int(r["v"])]
            assert r["est_count"] >= t          # CMS never undercounts
            assert r["est_count"] - t <= n // 1000 + 1  # ~N/width slack
        # the true top-3 must appear in the approximate top-10
        top_true = [x for x, _ in true.most_common(3)]
        assert set(top_true) <= set(out["v"].tolist())

    def test_merge_invariance(self, ray_session):
        from documentprocessor_ray.functions.sketches import cms_heavy_hitters
        _, ds = self._zipf_ds(seed=9)
        # default candidates="all": the whole answer is a pure function of
        # the value multiset — bit-identical under any partitioning
        a = cms_heavy_hitters(ds.repartition(3), "v", k=8).to_pandas()
        b = cms_heavy_hitters(ds.repartition(17), "v", k=8).to_pandas()
        assert a["v"].tolist() == b["v"].tolist()
        assert a["est_count"].tolist() == b["est_count"].tolist()

    def test_local_topk_mode_head_agrees(self, ray_session):
        from documentprocessor_ray.functions.sketches import cms_heavy_hitters
        _, ds = self._zipf_ds(seed=9)
        # local_topk candidates are batch-layout-dependent by design, but
        # sketch cells are sum-merged exactly so the heavy head agrees
        a = cms_heavy_hitters(ds.repartition(3), "v", k=8,
                              candidates="local_topk").to_pandas()
        b = cms_heavy_hitters(ds.repartition(17), "v", k=8,
                              candidates="local_topk").to_pandas()
        assert a["v"].tolist()[:3] == b["v"].tolist()[:3]
        assert a["est_count"].tolist()[:3] == b["est_count"].tolist()[:3]


class TestBigramRarity:
    def test_matches_bruteforce(self, ray_session):
        from collections import Counter
        from documentprocessor_ray.functions.textstats import bigram_rarity

        docs = {
            1: "the cat sat on the mat",
            2: "the cat sat on the hat",
            3: "one two three",
            4: "  the   cat  ",          # messy whitespace -> 1 bigram
            5: "solo",                    # <2 tokens -> no output row
            6: "",                        # empty -> no output row
            7: "THE CAT sat",             # lowercased -> shares bigrams
        }
        ds = ray.data.from_arrow(pa.table({
            "doc_id": pa.array(list(docs), pa.int64()),
            "text": pa.array(list(docs.values()), pa.string())}))
        got = bigram_rarity(ds, rare_max=2, num_buckets=4).to_pandas() \
            .set_index("doc_id").sort_index()

        # brute force with the same tokenization semantics
        def toks(s):
            return s.strip().lower().split()
        bgs = {d: [f"{a} {b}" for a, b in zip(toks(t), toks(t)[1:])]
               for d, t in docs.items() if len(toks(t)) >= 2}
        freq = Counter(b for lst in bgs.values() for b in lst)
        assert sorted(got.index) == sorted(bgs)
        for d, lst in bgs.items():
            assert got.loc[d, "n_bigrams"] == len(lst)
            assert got.loc[d, "sum_freq"] == sum(freq[b] for b in lst)
            assert got.loc[d, "n_rare"] == sum(freq[b] <= 2 for b in lst)


class TestPackSequences:
    def test_bin_layout_exact(self, ray_session):
        from documentprocessor_ray.functions.window import pack_sequences
        # bins of 10 tokens; doc 3 has 0 tokens (emits nothing); doc 2
        # straddles 3 bins; doc ids deliberately sparse (range partition)
        t = pa.table({"doc_id": pa.array([1, 2, 3, 50], pa.int64()),
                      "n_tokens": pa.array([7, 25, 0, 8], pa.int64())})
        out = pack_sequences(ray.data.from_arrow(t), bin_size=10,
                             num_buckets=4).to_pandas() \
            .sort_values(["doc_id", "bin_id"]).reset_index(drop=True)
        rows = [tuple(r) for r in out.to_numpy()]
        # concatenation: doc1 tokens [0,7), doc2 [7,32), doc50 [32,40)
        assert rows == [
            (1, 0, 0, 7),            # doc1 entirely in bin 0
            (2, 0, 0, 3),            # doc2 tokens 0-3 fill bin 0
            (2, 1, 3, 13),           # tokens 3-13 fill bin 1
            (2, 2, 13, 23),          # tokens 13-23 fill bin 2
            (2, 3, 23, 25),          # tail in bin 3
            (50, 3, 0, 8),           # doc50 completes bin 3
        ]
        # spans tile each doc exactly
        g = out.groupby("doc_id").apply(
            lambda d: (d["tok_end"] - d["tok_start"]).sum(),
            include_groups=False)
        assert g.to_dict() == {1: 7, 2: 25, 50: 8}


class TestChunkText:
    def test_windows_and_overlap(self):
        toks = [f"t{i}" for i in range(10)]
        t = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                      "text": pa.array([" ".join(toks), "a b", "  "])})
        out = T.chunk_text_batch(t, chunk_tokens=4, stride=3).to_pandas() \
            .sort_values(["doc_id", "chunk_id"]).reset_index(drop=True)
        # doc1: starts 0,3,6,9 -> windows [0:4),[3:7),[6:10),[9:10)
        d1 = out[out.doc_id == 1]
        assert list(d1["chunk_text"]) == [
            "t0 t1 t2 t3", "t3 t4 t5 t6", "t6 t7 t8 t9", "t9"]
        assert list(d1["n_tokens"]) == [4, 4, 4, 1]
        # doc2: one short window; doc3 blank: nothing
        assert list(out[out.doc_id == 2]["chunk_text"]) == ["a b"]
        assert (out.doc_id != 3).all()


class TestApproxQuantiles:
    def test_bin_roundtrip_bounds(self):
        """from_bin(to_bin(v)) is a lower bound within relative 2^-s."""
        from documentprocessor_ray.functions.agg import grouped_quantile_approx  # noqa: F401
        # exercise via the public op on singleton groups: est <= v < est*(1+2^-s)+1
        import ray.data as rd
        rng = np.random.default_rng(3)
        v = np.unique(np.concatenate([
            rng.integers(1, 10**9, 3000),
            np.array([1, 2, 31, 32, 33, 2**40, 2**62])]))
        t = pa.table({"k": pa.array(np.arange(len(v)), pa.int64()),
                      "v": pa.array(v.astype("int64"), pa.int64())})
        out = grouped_quantile_approx(rd.from_arrow(t), ["k"], "v", [0.5],
                                      q_names=["est"], num_buckets=8) \
            .to_pandas().set_index("k").sort_index()
        est = out["est"].to_numpy()
        vv = v[out.index.to_numpy()]
        assert (est <= vv).all()
        assert (vv.astype(float) < est.astype(float) * (1 + 2**-5) + 1).all()

    def test_quantile_close_to_exact_and_merge_invariant(self, ray_session):
        from documentprocessor_ray.functions.agg import grouped_quantile_approx
        rng = np.random.default_rng(7)
        # heavy-tailed near-unique values, 3 groups
        k = rng.integers(0, 3, 20000)
        v = (np.exp(rng.normal(8, 2, 20000))).astype("int64") + 1
        t = pa.table({"k": pa.array(k, pa.int64()),
                      "v": pa.array(v, pa.int64())})
        ds = ray.data.from_arrow(t)
        outs = []
        for nb in (4, 16):  # merge invariance across shuffle widths
            out = grouped_quantile_approx(ds, ["k"], "v", [0.5, 0.9],
                                          q_names=["q50", "q90"],
                                          num_buckets=nb).to_pandas() \
                .set_index("k").sort_index()
            outs.append(out)
        assert (outs[0] == outs[1]).all().all()
        for g in range(3):
            vs = np.sort(v[k == g])
            for q, col in [(0.5, "q50"), (0.9, "q90")]:
                exact = vs[max(1, int(np.ceil(q * len(vs)))) - 1]
                est = outs[0].loc[g, col]
                assert est <= exact
                assert exact < est * (1 + 2**-5) + 1


class TestPagerank:
    def test_matches_integer_reference_exactly(self, ray_session):
        from documentprocessor_ray.functions.graph import (
            pagerank, pagerank_reference)
        rng = np.random.default_rng(21)
        edges = rng.integers(0, 80, size=(400, 2)).astype("int64")
        ds = ray.data.from_arrow(pa.table({
            "doc_a": pa.array(edges[:, 0]), "doc_b": pa.array(edges[:, 1])}))
        ref = pagerank_reference(edges, n_iters=5)
        # iterative path (short-circuit disabled): bit-exact at two
        # different shuffle widths (merge invariance)
        for nb in (4, 16):
            out = pagerank(ds, n_iters=5, num_buckets=nb,
                           small_graph_rows=0).to_pandas() \
                .set_index("node")["score_micro"].to_dict()
            assert out == ref
        # small-graph single-task short-circuit: identical result
        sc = pagerank(ds, n_iters=5).to_pandas() \
            .set_index("node")["score_micro"].to_dict()
        assert sc == ref

    def test_hub_scores_higher(self, ray_session):
        from documentprocessor_ray.functions.graph import pagerank
        # star graph: center 0 linked to 1..6 -> center must score highest
        t = pa.table({"doc_a": pa.array([0] * 6, pa.int64()),
                      "doc_b": pa.array(list(range(1, 7)), pa.int64())})
        out = pagerank(ray.data.from_arrow(t), n_iters=10, num_buckets=4) \
            .to_pandas().set_index("node")["score_micro"]
        assert out.idxmax() == 0
        assert out[0] > 2 * out[1]


class TestCompressionRatio:
    def test_repetitive_compresses_smaller(self):
        t = pa.table({
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(["spam ham" * 200,
                              "9f8a7b6c5d4e3210" * 100, ""])})
        out = T.compression_ratio_batch(t).to_pydict()
        assert out["raw_len"][0] == out["raw_len"][1] == 1600
        assert out["comp_len"][0] < out["comp_len"][1]  # repetition wins
        assert out["raw_len"][2] == 0 and out["comp_len"][2] > 0
        # determinism
        again = T.compression_ratio_batch(t).to_pydict()
        assert again == out


class TestNfcNormalize:
    def test_composes_and_preserves(self):
        t = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                      "text": pa.array(["éclair", "éclair", "plain"])})
        out = T.nfc_normalize_batch(t)["nfc_text"].to_pylist()
        assert out[0] == out[1] == "éclair"
        assert out[2] == "plain"


class TestBloom:
    def test_no_false_negatives_and_bounded_fpr(self, ray_session):
        from documentprocessor_ray.functions.sketches import (
            bloom_build, bloom_probe_mask)
        rng = np.random.default_rng(41)
        members = np.unique(rng.integers(0, 10**12, 5000)).astype("int64")
        ds = ray.data.from_arrow(pa.table({"k": pa.array(members)}))
        f = bloom_build(ds, "k", m_bits=1 << 17, k=5)
        # every inserted key passes
        assert bloom_probe_mask(f, members).all()
        # false-positive rate near theory: (1-e^{-kn/m})^k ~ 0.6% here
        probe = np.setdiff1d(
            rng.integers(0, 10**12, 20000).astype("int64"), members)
        fpr = bloom_probe_mask(f, probe).mean()
        assert fpr < 0.05
        # deterministic across rebuilds (different batch order irrelevant)
        f2 = bloom_build(ds.random_shuffle(seed=1), "k", m_bits=1 << 17, k=5)
        assert (f == f2).all()


class TestLabelCentroids:
    def test_sums_match_brute_force(self, ray_session):
        """Distributed per-(label,dim) integer sums equal a single-process
        numpy recomputation over the same parquet (quantization identical)."""
        import pyarrow.parquet as pq
        import pyarrow.compute as pc
        from documentprocessor_ray.pipelines.analysis import q_label_centroids
        sf = "/root/testdata/sf0.001"
        df = q_label_centroids(sf).to_pandas()
        t = pq.read_table(f"{sf}/embeddings.parquet",
                          columns=["embedding", "label"])
        emb = t["embedding"].combine_chunks()
        flat = emb.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        lens = pc.list_value_length(emb).to_numpy(zero_copy_only=False)
        labels = np.repeat(t["label"].to_numpy(zero_copy_only=False), lens)
        dims = np.concatenate([np.arange(1, n + 1) for n in lens])
        y = flat * 1e6
        q = (np.sign(y) * np.floor(np.abs(y) + 0.5)).astype(np.int64)
        brute = {}
        for lb, d, v in zip(labels, dims, q):
            key = (int(lb), int(d))
            s, n = brute.get(key, (0, 0))
            brute[key] = (s + int(v), n + 1)
        assert len(df) == len(brute)
        for _, r in df.iterrows():
            s, n = brute[(int(r.label), int(r.dim))]
            assert int(r.sum_q) == s and int(r.n_vecs) == n


class TestMomentsFamily:
    def test_comoments_match_pandas(self, ray_session):
        import pyarrow.parquet as pq
        from documentprocessor_ray.pipelines.analysis import q_grouped_comoments
        sf = "/root/testdata/sf0.001"
        df = q_grouped_comoments(sf).to_pandas()
        li = pq.read_table(
            f"{sf}/lineitem.parquet",
            columns=["l_returnflag", "l_linestatus", "l_quantity",
                     "l_extendedprice"]).to_pandas()
        li["x"] = np.floor(li.l_quantity + 0.5).astype(np.int64)
        li["y"] = np.floor(li.l_extendedprice + 0.5).astype(np.int64)
        for (rf, ls), g in li.groupby(["l_returnflag", "l_linestatus"]):
            row = df[(df.l_returnflag == rf) & (df.l_linestatus == ls)]
            assert len(row) == 1
            assert int(row.n_rows.iloc[0]) == len(g)
            assert int(row.sum_xy.iloc[0]) == int((g.x * g.y).sum())
            assert int(row.sum_yy.iloc[0]) == int((g.y * g.y).sum())

    def test_zscore_outliers_flag(self, ray_session):
        import pyarrow.parquet as pq
        from documentprocessor_ray.pipelines.analysis import q_zscore_outliers
        sf = "/root/testdata/sf0.001"
        df = q_zscore_outliers(sf).to_pandas()
        lens = pq.read_table(f"{sf}/documents.parquet",
                             columns=["n_chars"]).to_pandas().n_chars
        mu, var = lens.mean(), lens.var(ddof=0)
        want = ((lens - mu) ** 2 > 4 * var).sum()
        assert len(df) == len(lens)
        assert int(df.is_outlier.sum()) == int(want)

    def test_large_orders_all_exceed_threshold(self, ray_session):
        from documentprocessor_ray.pipelines.analysis import q_large_orders
        df = q_large_orders("/root/testdata/sf0.001").to_pandas()
        assert (df.total_qty > 250).all()
        assert set(df.columns) == {"o_orderkey", "total_qty", "o_custkey",
                                   "o_total_cents"}


class TestSetOps:
    def _mk(self, vals):
        return ray.data.from_arrow(
            pa.table({"k": pa.array(vals, pa.int64())}))

    def test_three_ops_match_python_sets(self, ray_session):
        from documentprocessor_ray.functions.setops import set_op
        import random
        rng = random.Random(11)
        a = [rng.randrange(200) for _ in range(500)]
        b = [rng.randrange(200) for _ in range(300)]
        for op, want in [
            ("union", set(a) | set(b)),
            ("intersect", set(a) & set(b)),
            ("except", set(a) - set(b)),
        ]:
            got = set_op(self._mk(a), self._mk(b), "k", op).to_pandas()
            assert set(got.k.tolist()) == want, op
            assert len(got) == len(want), op  # distinct: no dup keys

    def test_repartition_invariance(self, ray_session):
        from documentprocessor_ray.functions.setops import set_op
        a = self._mk(list(range(0, 120)))
        b = self._mk(list(range(60, 180)))
        one = set_op(a, b, "k", "intersect").to_pandas()
        many = set_op(a.repartition(7), b.repartition(3),
                      "k", "intersect").to_pandas()
        assert sorted(one.k) == sorted(many.k) == list(range(60, 120))


class TestFuzzyPairs:
    def _brute(self, vals, max_dist, band):
        def lev(a, b):
            dp = list(range(len(b) + 1))
            for i, ca in enumerate(a, 1):
                prev, dp[0] = dp[0], i
                for j, cb in enumerate(b, 1):
                    prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1,
                                             prev + (ca != cb))
            return dp[-1]
        out = set()
        vs = sorted(set(vals))
        for i, a in enumerate(vs):
            for b in vs[i + 1:]:
                if abs(len(a) - len(b)) <= band and lev(a, b) <= max_dist:
                    out.add((a, b, lev(a, b)))
        return out

    def test_matches_bruteforce_random(self, ray_session):
        from documentprocessor_ray.functions.fuzzy import fuzzy_pairs
        import random
        rng = random.Random(5)
        vals = ["".join(rng.choice("abc") for _ in range(rng.randint(2, 8)))
                for _ in range(120)]
        ds = ray.data.from_arrow(
            pa.table({"v": pa.array(vals * 3, pa.string())}))
        got = fuzzy_pairs(ds, "v", max_dist=2, len_band=1).to_pandas()
        want = self._brute(vals, 2, 1)
        have = set(zip(got.name_a, got.name_b, got.dist))
        assert have == want
        assert len(got) == len(have)  # each pair exactly once

    def test_banded_lev_equals_full(self):
        from documentprocessor_ray.functions.fuzzy import _lev_banded
        import random
        rng = random.Random(9)
        for _ in range(200):
            a = "".join(rng.choice("ab") for _ in range(rng.randint(0, 7)))
            b = "".join(rng.choice("ab") for _ in range(rng.randint(0, 7)))
            k = rng.randint(0, 4)
            full = self._brute([a if a < b else b, b if a < b else a],
                               99, 99)
            d_true = next(iter(full))[2] if a != b and full else 0
            got = _lev_banded(a, b, k)
            if d_true <= k:
                assert got == d_true, (a, b, k)
            else:
                assert got == k + 1, (a, b, k)


class TestNationCustomerRank:
    def test_rank_invariants(self, ray_session):
        from documentprocessor_ray.pipelines.analysis import \
            q_nation_customer_rank
        df = q_nation_customer_rank("/root/testdata/sf0.001").to_pandas()
        for nk, g in df.groupby("c_nationkey"):
            g = g.sort_values("rn")
            assert list(g.rn) == list(range(1, len(g) + 1))
            assert (g.dense_rnk <= g.rnk).all()
            assert g.rnk.iloc[0] == 1 and g.dense_rnk.iloc[0] == 1
            # balances non-increasing in rank order
            assert (np.diff(g.bal_cents.values) <= 0).all()


class TestArgmaxAndTrigrams:
    def test_latest_event_matches_pandas(self, ray_session):
        import pyarrow.parquet as pq
        from documentprocessor_ray.pipelines.analysis import \
            q_latest_event_per_user
        sf = "/root/testdata/sf0.001"
        df = q_latest_event_per_user(sf).to_pandas()
        ev = pq.read_table(f"{sf}/events.parquet").to_pandas()
        ev["ts_us"] = ev.ts.astype("int64")
        want = ev.sort_values(["user_id", "ts_us", "event_id"]) \
            .groupby("user_id").tail(1)
        assert len(df) == len(want)
        m = df.set_index("user_id")
        for r in want.itertuples():
            assert int(m.loc[r.user_id, "event_id"]) == int(r.event_id)

    def test_trigram_topk_shape(self, ray_session):
        from documentprocessor_ray.pipelines.analysis import \
            q_char_trigram_topk
        df = q_char_trigram_topk("/root/testdata/sf0.001").to_pandas()
        for lang, g in df.groupby("lang"):
            g = g.sort_values("rn")
            assert list(g.rn) == list(range(1, len(g) + 1))
            assert len(g) <= 20
            # counts non-increasing in rank order
            assert (np.diff(g.n.values) <= 0).all()
            assert (g.gram.str.len() == 3).all()


class TestGrowthAndOhlc:
    def test_growth_cumsum_monotone(self, ray_session):
        from documentprocessor_ray.pipelines.analysis import \
            q_user_growth_daily
        df = q_user_growth_daily("/root/testdata/sf0.001").to_pandas()
        df = df.sort_values("day")
        assert (df.new_users > 0).all()
        assert list(df.cum_users) == list(df.new_users.cumsum())

    def test_ohlc_invariants_and_pandas_parity(self, ray_session):
        import pyarrow.parquet as pq
        from documentprocessor_ray.pipelines.analysis import \
            q_purchase_ohlc_hourly
        sf = "/root/testdata/sf0.001"
        df = q_purchase_ohlc_hourly(sf).to_pandas()
        assert (df.low_cents <= df.open_cents).all()
        assert (df.low_cents <= df.close_cents).all()
        assert (df.high_cents >= df.open_cents).all()
        ev = pq.read_table(f"{sf}/events.parquet").to_pandas()
        ev = ev[ev.event_type == "purchase"].copy()
        ev["cents"] = np.rint(ev.value * 100).astype(np.int64)
        ev["hour"] = ev.ts.astype("int64") // 3_600_000_000
        for h, g in ev.groupby("hour"):
            row = df[df.hour == h]
            assert len(row) == 1, h
            g = g.sort_values(["ts", "event_id"])
            assert int(row.open_cents.iloc[0]) == int(g.cents.iloc[0])
            assert int(row.close_cents.iloc[0]) == int(g.cents.iloc[-1])
            assert int(row.high_cents.iloc[0]) == int(g.cents.max())
            assert int(row.n_trades.iloc[0]) == len(g)


class TestCanonicalAndStrata:
    def test_cluster_canonical_invariants(self, ray_session):
        from documentprocessor_ray.pipelines.analysis import \
            q_cluster_canonical, q_dedup_clusters
        sf = "/root/testdata/sf0.001"
        can = q_cluster_canonical(sf).to_pandas()
        cl = q_dedup_clusters(sf).to_pandas()
        sizes = cl.groupby("cluster_rep").size()
        assert len(can) == len(sizes)
        for r in can.itertuples():
            assert int(sizes[r.cluster_rep]) == int(r.cluster_size)
            members = set(cl[cl.cluster_rep == r.cluster_rep].doc_id)
            assert r.canonical_doc in members

    def test_lang_sample_quota(self, ray_session):
        from documentprocessor_ray.pipelines.analysis import q_lang_sample_n
        df = q_lang_sample_n("/root/testdata/sf0.001").to_pandas()
        for lang, g in df.groupby("lang"):
            assert len(g) <= 20


class TestCalendarAndShare:
    def test_monthly_revenue_against_pandas(self, ray_session):
        import pyarrow.parquet as pq
        from documentprocessor_ray.pipelines.analysis import \
            q_monthly_revenue
        sf = "/root/testdata/sf0.001"
        df = q_monthly_revenue(sf).to_pandas()
        o = pq.read_table(f"{sf}/orders.parquet").to_pandas()
        o["month"] = o.o_orderdate.values.astype("datetime64[M]") \
            .astype(np.int64)
        o["cents"] = np.rint(o.o_totalprice * 100).astype(np.int64)
        want = o.groupby("month").agg(n=("cents", "size"),
                                      c=("cents", "sum"))
        assert len(df) == len(want)
        m = df.set_index("month")
        for month, r in want.iterrows():
            assert int(m.loc[month, "n_orders"]) == int(r.n)
            assert int(m.loc[month, "revenue_cents"]) == int(r.c)

    def test_brand_share_sums_to_type_total(self, ray_session):
        from documentprocessor_ray.pipelines.analysis import \
            q_brand_type_share
        df = q_brand_type_share("/root/testdata/sf0.001").to_pandas()
        for ty, g in df.groupby("p_type"):
            assert g.type_cents.nunique() == 1
            assert int(g.brand_cents.sum()) == int(g.type_cents.iloc[0])


class TestStreaksAndGaps:
    def test_streaks_match_bruteforce(self, ray_session):
        import pyarrow.parquet as pq
        from documentprocessor_ray.pipelines.analysis import \
            q_activity_streaks
        sf = "/root/testdata/sf0.001"
        df = q_activity_streaks(sf).to_pandas().set_index("user_id")
        ev = pq.read_table(f"{sf}/events.parquet").to_pandas()
        ev["day"] = ev.ts.astype("int64") // 86_400_000_000
        for uid, g in ev.groupby("user_id"):
            days = sorted(set(g.day))
            best = run = 1
            for a, b in zip(days, days[1:]):
                run = run + 1 if b == a + 1 else 1
                best = max(best, run)
            assert int(df.loc[uid, "active_days"]) == len(days)
            assert int(df.loc[uid, "longest_streak"]) == best

    def test_gaps_total_equals_span_for_sorted_days(self, ray_session):
        import pyarrow.parquet as pq
        from documentprocessor_ray.pipelines.analysis import \
            q_customer_order_gaps
        sf = "/root/testdata/sf0.001"
        df = q_customer_order_gaps(sf).to_pandas().set_index("o_custkey")
        o = pq.read_table(f"{sf}/orders.parquet").to_pandas()
        o["day"] = o.o_orderdate.astype("int64") // 86_400_000_000
        for ck, g in o.groupby("o_custkey"):
            days = sorted(g.day)
            # consecutive diffs telescope to max-min
            assert int(df.loc[ck, "total_gap_days"]) == days[-1] - days[0]
            assert int(df.loc[ck, "n_orders"]) == len(g)


class TestAuditAndSplit:
    def test_split_partitions_complete(self, ray_session):
        import pyarrow.parquet as pq
        from documentprocessor_ray.pipelines.analysis import q_dataset_split
        sf = "/root/testdata/sf0.001"
        df = q_dataset_split(sf).to_pandas()
        total = pq.read_table(f"{sf}/documents.parquet").num_rows
        assert int(df.n_docs.sum()) == total
        assert set(df.split) <= {"train", "val", "test"}
        by = df.groupby("split").n_docs.sum()
        assert by.get("train", 0) > by.get("val", 0)
        assert by.get("train", 0) > by.get("test", 0)

    def test_fk_orphans_zero_on_synthetic(self, ray_session):
        from documentprocessor_ray.pipelines.analysis import q_fk_orphans
        df = q_fk_orphans("/root/testdata/sf0.001").to_pandas()
        assert len(df) == 2
        assert (df.n_orphans == 0).all()  # synthetic data has intact FKs

    def test_table_audit_bounds(self, ray_session):
        from documentprocessor_ray.pipelines.analysis import q_table_audit
        df = q_table_audit("/root/testdata/sf0.001").to_pandas() \
            .set_index("column")
        assert int(df.loc["l_quantity", "min_q"]) >= 1
        assert int(df.loc["l_quantity", "max_q"]) <= 50
        assert int(df.loc["l_discount", "max_q"]) <= 10
        assert (df.n_null == 0).all()


class TestWeightedSampleAndBM25:
    def test_weighted_sample_matches_bruteforce(self, ray_session):
        import hashlib
        import pyarrow.parquet as pq
        from documentprocessor_ray.pipelines.analysis import \
            q_weighted_sample_n
        sf = "/root/testdata/sf0.001"
        df = q_weighted_sample_n(sf).to_pandas()
        d = pq.read_table(f"{sf}/documents.parquet",
                          columns=["doc_id", "n_chars"]).to_pandas()
        h = d.doc_id.map(lambda i: int(
            hashlib.md5(str(i).encode()).hexdigest()[:8], 16))
        d["k"] = np.log((h + 1) / 4294967296.0) / d.n_chars
        want = d.sort_values(["k", "doc_id"],
                             ascending=[False, True]).head(50)
        assert list(df.doc_id) == list(want.doc_id)

    def test_bm25_scores_positive_and_sorted(self, ray_session):
        from documentprocessor_ray.pipelines.analysis import q_bm25_topk
        df = q_bm25_topk("/root/testdata/sf0.001").to_pandas()
        assert len(df) == 50
        assert (df.score_micro > 0).all()
        assert (np.diff(df.score_micro.values) <= 0).all()


class TestPriceBandPairs:
    def test_matches_bruteforce(self, ray_session):
        import pyarrow.parquet as pq
        from documentprocessor_ray.pipelines.analysis import \
            q_price_band_pairs
        sf = "/root/testdata/sf0.001"
        df = q_price_band_pairs(sf).to_pandas()
        p = pq.read_table(f"{sf}/part.parquet",
                          columns=["p_partkey", "p_retailprice"]).to_pandas()
        cents = np.rint(p.p_retailprice * 100).astype(np.int64).values
        keys = p.p_partkey.values
        want = set()
        for i in range(len(keys)):
            for j in range(i + 1, len(keys)):
                if abs(int(cents[i]) - int(cents[j])) < 100:
                    want.add((min(keys[i], keys[j]),
                              max(keys[i], keys[j])))
        have = set(zip(df.part_a, df.part_b))
        assert have == want
        assert len(df) == len(have)  # exactly-once ownership


class TestRepartitionInvarianceNewOps:
    def test_new_mergeable_ops_stable_under_block_count(self, ray_session):
        """Distributed-correctness guard: results must not depend on how
        input rows land in blocks (combiner/merge associativity)."""
        from documentprocessor_ray.pipelines import analysis as A
        sf = "/root/testdata/sf0.001"
        for fn in (A.q_latest_event_per_user, A.q_purchase_ohlc_hourly,
                   A.q_activity_streaks, A.q_grouped_comoments,
                   A.q_label_centroids):
            base = fn(sf).to_pandas()
            cols = sorted(base.columns)
            a = base[cols].sort_values(cols).reset_index(drop=True)
            again = fn(sf).to_pandas()[cols].sort_values(cols) \
                .reset_index(drop=True)
            assert a.equals(again), fn.__name__


def test_phrase_count_batch():
    import pyarrow as pa

    from documentprocessor_ray.functions.textstats import phrase_count_batch

    batch = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": pa.array([
            "a b c a b c a b",   # two full "a b c", trailing "a b" ignored
            "x a b c y",         # one
            "a b x c",           # zero (not contiguous)
            "",                  # empty doc
        ], pa.string()),
    })
    out = phrase_count_batch(batch, ["a", "b", "c"]).to_pylist()
    assert [r["n_matches"] for r in out] == [2, 1, 0, 0]


def test_phrase_count_batch_no_cross_doc_match():
    import pyarrow as pa

    from documentprocessor_ray.functions.textstats import phrase_count_batch

    # "a b" ends doc0 and "c" starts doc1: must NOT count as a match
    batch = pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": pa.array(["z a b", "c z z"], pa.string()),
    })
    out = phrase_count_batch(batch, ["a", "b", "c"]).to_pylist()
    assert [r["n_matches"] for r in out] == [0, 0]
