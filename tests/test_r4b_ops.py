"""Round-4 second-batch operators: semantic dedup (SemDeDup) and the
bigram-LM surprisal scorer."""

import numpy as np
import pyarrow as pa

import ray
import ray.data


def _emb_ds(m: np.ndarray, blocks=None):
    t = pa.table({
        "vec_id": pa.array(range(len(m)), pa.int64()),
        "embedding": pa.array([list(map(float, r)) for r in m],
                              pa.list_(pa.float32())),
    })
    ds = ray.data.from_arrow(t)
    if blocks:
        ds = ds.repartition(blocks)
    return ds


def _seed_rows(m: np.ndarray, n_seed: int):
    vids = list(range(len(m)))
    hs = [((v * 2654435761) & 0xFFFFFFFF) for v in vids]
    order = sorted(zip(hs, vids))
    return [{"embedding": list(map(float, m[v]))}
            for _, v in order[:n_seed]]


class TestSemDedup:
    def _m(self, n=60, d=6, dup_from=40):
        """Random rows; rows >= dup_from are exact copies of earlier rows
        (guaranteed cosine 1.0 semantic dups in the same cluster)."""
        rng = np.random.default_rng(29)
        m = rng.normal(size=(n, d)).astype(np.float32)
        for i in range(dup_from, n):
            m[i] = m[i - dup_from]
        return m

    def test_matches_single_process_reference(self, ray_session):
        from documentprocessor_ray.functions.clustering import (
            semdedup_int, semdedup_reference)

        m = self._m()
        got = sorted((r["vec_id"], r["cluster"], r["keep"]) for r in
                     semdedup_int(_emb_ds(m), k=4, iters=3).take_all())
        exp = sorted(semdedup_reference(
            list(range(len(m))), [list(map(float, r)) for r in m],
            _seed_rows(m, 16), k=4, iters=3))
        assert got == exp

    def test_parallelism_invariant(self, ray_session):
        from documentprocessor_ray.functions.clustering import semdedup_int

        m = self._m()
        a = sorted((r["vec_id"], r["cluster"], r["keep"]) for r in
                   semdedup_int(_emb_ds(m, blocks=1), k=4, iters=3)
                   .take_all())
        b = sorted((r["vec_id"], r["cluster"], r["keep"]) for r in
                   semdedup_int(_emb_ds(m, blocks=7), k=4, iters=3)
                   .take_all())
        assert a == b

    def test_exact_duplicates_dropped_keep_lowest_id(self, ray_session):
        from documentprocessor_ray.functions.clustering import semdedup_int

        m = self._m()
        out = {r["vec_id"]: r for r in
               semdedup_int(_emb_ds(m), k=4, iters=3).take_all()}
        assert len(out) == len(m)
        for i in range(40, len(m)):
            twin = i - 40
            # identical vectors land in the same cluster; the copy can
            # never survive — its twin is either kept (a cos=1 witness) or
            # was itself dropped by a witness that also covers the copy
            assert out[i]["cluster"] == out[twin]["cluster"]
            assert out[i]["keep"] == 0

    def test_kept_set_is_tau_separated_and_dropped_have_witness(
            self, ray_session):
        from documentprocessor_ray.functions.clustering import (
            _quantize_rows, semdedup_int)

        m = self._m()
        scale = 1 << 20
        tau_scaled = (400_000 * scale * scale) // 1_000_000
        qx = _quantize_rows(m.astype(np.float64), scale)
        out = semdedup_int(_emb_ds(m), k=4, iters=3).take_all()
        by_cluster = {}
        for r in out:
            by_cluster.setdefault(r["cluster"], []).append(r)
        for rows in by_cluster.values():
            kept = sorted(r["vec_id"] for r in rows if r["keep"] == 1)
            for i, a in enumerate(kept):
                for b in kept[i + 1:]:
                    assert int(qx[a] @ qx[b]) < tau_scaled
            for r in rows:
                if r["keep"] == 0:
                    v = r["vec_id"]
                    assert any(int(qx[v] @ qx[w]) >= tau_scaled
                               for w in kept if w < v)

    def test_query_matches_dump_twin(self, ray_session, tmp_path):
        """q_semdedup vs oracle_dump.semdedup_expected over a corpus-shaped
        embeddings.parquet — the driver-gate contract."""
        import pyarrow.parquet as pq

        from documentprocessor_ray.pipelines import oracle_dump as OD
        from documentprocessor_ray.pipelines.analysis import q_semdedup

        m = self._m(n=90, d=8, dup_from=60)
        t = pa.table({
            "vec_id": pa.array(range(len(m)), pa.int64()),
            "embedding": pa.array([list(map(float, r)) for r in m],
                                  pa.list_(pa.float32())),
        })
        pq.write_table(t, tmp_path / "embeddings.parquet")
        got = sorted((r["vec_id"], r["cluster"], r["keep"]) for r in
                     q_semdedup(str(tmp_path)).take_all())
        exp_t = OD.semdedup_expected(str(tmp_path))
        exp = sorted(zip(exp_t["vec_id"].to_pylist(),
                         exp_t["cluster"].to_pylist(),
                         exp_t["keep"].to_pylist()))
        assert got == exp
        n_dropped = sum(1 for _, _, kf in got if kf == 0)
        assert n_dropped >= 1  # the seeded dups actually dedup


class TestBigramSurprisal:
    def _docs(self, blocks=None):
        texts = [
            "the cat sat on the mat",
            "the cat sat on the hat",
            "a completely different sentence entirely here",
            "the the the the",
            "single",
            "",
            "  spaced   out   tokens  ",
        ] * 4
        t = pa.table({
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        })
        ds = ray.data.from_arrow(t)
        if blocks:
            ds = ds.repartition(blocks)
        return ds, texts

    def test_matches_single_process_reference(self, ray_session):
        from documentprocessor_ray.functions.textstats import (
            bigram_surprisal, bigram_surprisal_reference)

        ds, texts = self._docs()
        got = sorted(
            (r["doc_id"], r["n_bigrams"], r["surprisal_micro"],
             r["mean_surprisal_micro"])
            for r in bigram_surprisal(ds).take_all())
        exp = sorted(bigram_surprisal_reference(
            list(range(len(texts))), texts))
        assert got == exp

    def test_parallelism_invariant(self, ray_session):
        from documentprocessor_ray.functions.textstats import (
            bigram_surprisal)

        a = sorted(tuple(sorted(r.items())) for r in
                   bigram_surprisal(self._docs(blocks=1)[0]).take_all())
        b = sorted(tuple(sorted(r.items())) for r in
                   bigram_surprisal(self._docs(blocks=9)[0]).take_all())
        assert a == b

    def test_hand_computed_tiny_corpus(self, ray_session):
        from documentprocessor_ray.functions.textstats import (
            _LM_V, bigram_surprisal)

        t = pa.table({
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array(["a b", "a b", "a c"], pa.string()),
        })
        out = {r["doc_id"]: r for r in
               bigram_surprisal(ray.data.from_arrow(t)).take_all()}

        def ilog(v):
            return int(np.round(1e6 * np.log(float(v))))

        # context 'a' occurs 3x; bigram (a,b) 2x, (a,c) 1x
        s_ab = ilog(3 + _LM_V) - ilog(2 + 1)
        s_ac = ilog(3 + _LM_V) - ilog(1 + 1)
        assert out[0]["n_bigrams"] == 1
        assert out[0]["surprisal_micro"] == s_ab
        assert out[1]["surprisal_micro"] == s_ab
        assert out[2]["surprisal_micro"] == s_ac
        assert out[2]["mean_surprisal_micro"] == s_ac
        # the rarer bigram is more surprising
        assert s_ac > s_ab

    def test_short_docs_absent(self, ray_session):
        from documentprocessor_ray.functions.textstats import (
            bigram_surprisal)

        ds, texts = self._docs()
        ids = {r["doc_id"] for r in bigram_surprisal(ds).take_all()}
        for i, txt in enumerate(texts):
            has_bigram = len(txt.split()) >= 2
            assert ((i in ids) == has_bigram), (i, txt)

    def test_query_matches_dump_twin(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        from documentprocessor_ray.pipelines import oracle_dump as OD
        from documentprocessor_ray.pipelines.analysis import (
            q_bigram_surprisal)

        _, texts = self._docs()
        pq.write_table(pa.table({
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }), tmp_path / "documents.parquet")
        got = sorted(
            (r["doc_id"], r["n_bigrams"], r["surprisal_micro"],
             r["mean_surprisal_micro"])
            for r in q_bigram_surprisal(str(tmp_path)).take_all())
        exp_t = OD.bigram_surprisal_expected(str(tmp_path))
        exp = sorted(zip(*(exp_t[c].to_pylist() for c in
                           ("doc_id", "n_bigrams", "surprisal_micro",
                            "mean_surprisal_micro"))))
        assert got == exp


class TestDsirLogweight:
    def _ds(self, blocks=None):
        texts = [
            "the quick brown fox jumps over the lazy dog",
            "the cat sat on the mat",
            "der schnelle braune fuchs springt",
            "le chat est sur le tapis",
            "the dog and the fox and the cat",
            "",
            "one",
        ] * 3
        targets = [1, 1, 0, 0, 1, 0, 1] * 3
        t = pa.table({
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "is_target": pa.array(targets, pa.int64()),
        })
        ds = ray.data.from_arrow(t)
        if blocks:
            ds = ds.repartition(blocks)
        return ds, texts, targets

    def test_matches_single_process_reference(self, ray_session):
        from documentprocessor_ray.functions.textstats import (
            dsir_logweight, dsir_logweight_reference)

        ds, texts, targets = self._ds()
        got = sorted((r["doc_id"], r["n_tokens"], r["logw_micro"])
                     for r in dsir_logweight(ds).take_all())
        exp = sorted(dsir_logweight_reference(
            list(range(len(texts))), texts, targets))
        assert got == exp

    def test_parallelism_invariant(self, ray_session):
        from documentprocessor_ray.functions.textstats import dsir_logweight

        a = sorted(tuple(sorted(r.items())) for r in
                   dsir_logweight(self._ds(blocks=1)[0]).take_all())
        b = sorted(tuple(sorted(r.items())) for r in
                   dsir_logweight(self._ds(blocks=9)[0]).take_all())
        assert a == b

    def test_target_docs_score_higher(self, ray_session):
        """English (target-like) docs must out-score the non-target-language
        docs on mean per-token log-weight."""
        from documentprocessor_ray.functions.textstats import dsir_logweight

        ds, texts, targets = self._ds()
        out = {r["doc_id"]: r for r in dsir_logweight(ds).take_all()}
        mean = {i: out[i]["logw_micro"] / out[i]["n_tokens"]
                for i in out}
        en = [mean[i] for i in range(7) if targets[i] and texts[i]]
        non = [mean[i] for i in range(7) if not targets[i] and texts[i]]
        assert min(en) > max(non)

    def test_query_matches_dump_twin(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        from documentprocessor_ray.pipelines import oracle_dump as OD
        from documentprocessor_ray.pipelines.analysis import q_dsir_logweight

        _, texts, targets = self._ds()
        pq.write_table(pa.table({
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en" if t else "de" for t in targets],
                             pa.string()),
        }), tmp_path / "documents.parquet")
        got = sorted((r["doc_id"], r["n_tokens"], r["logw_micro"])
                     for r in q_dsir_logweight(str(tmp_path)).take_all())
        exp_t = OD.dsir_logweight_expected(str(tmp_path))
        exp = sorted(zip(exp_t["doc_id"].to_pylist(),
                         exp_t["n_tokens"].to_pylist(),
                         exp_t["logw_micro"].to_pylist()))
        assert got == exp


class TestSplitNoLeakage:
    def test_no_near_dup_pair_crosses_splits(self, ray_session):
        """The operator's contract: after rep-based assignment, every
        3-gram near-dup pair lands in ONE split (cross-split count 0)."""
        import hashlib as _hl

        from documentprocessor_ray.pipelines.analysis import (
            _ngram_pairs_cached, q_dedup_clusters)

        sf = "/root/testdata/sf0.001"
        rep = {r["doc_id"]: r["cluster_rep"]
               for r in q_dedup_clusters(sf).take_all()}

        def split_of(doc):
            r = rep.get(doc, doc)
            hb = int(_hl.md5(str(r).encode()).hexdigest()[:8], 16) % 100
            return "train" if hb < 80 else ("val" if hb < 90 else "test")

        pairs = _ngram_pairs_cached(sf).take_all()
        assert pairs, "corpus should contain near-dup pairs"
        for p in pairs:
            assert split_of(p["doc_a"]) == split_of(p["doc_b"])

    def test_totals_match_dataset_split(self, ray_session):
        """Same docs, same 80/10/10 law — only the assignment key moves, so
        corpus-wide totals must agree with dataset_split."""
        from documentprocessor_ray.pipelines.analysis import (
            q_dataset_split, q_split_no_leakage)

        sf = "/root/testdata/sf0.001"
        a = q_split_no_leakage(sf).take_all()
        b = q_dataset_split(sf).take_all()
        assert sum(r["n_docs"] for r in a) == sum(r["n_docs"] for r in b)
        assert sum(r["sum_chars"] for r in a) == \
            sum(r["sum_chars"] for r in b)
        assert {r["split"] for r in a} == {"train", "val", "test"}


class TestTriangleCounts:
    def _edges(self, n_nodes=40, n_edges=160, seed=17, blocks=None):
        rng = np.random.default_rng(seed)
        a = rng.integers(0, n_nodes, n_edges)
        b = rng.integers(0, n_nodes, n_edges)
        t = pa.table({"doc_a": pa.array(a, pa.int64()),
                      "doc_b": pa.array(b, pa.int64())})
        ds = ray.data.from_arrow(t)
        if blocks:
            ds = ds.repartition(blocks)
        return ds, list(zip(a.tolist(), b.tolist()))

    def test_matches_reference(self, ray_session):
        from documentprocessor_ray.functions.graph import (
            triangle_counts, triangle_counts_reference)

        ds, pairs = self._edges()
        exp = triangle_counts_reference(pairs)
        # short-circuit path AND the forced distributed path must agree
        got = {r["node"]: r["n_triangles"]
               for r in triangle_counts(ds).take_all()}
        assert got == exp
        got_dist = {r["node"]: r["n_triangles"] for r in
                    triangle_counts(self._edges()[0],
                                    small_graph_rows=0).take_all()}
        assert got_dist == exp
        assert exp, "graph should contain triangles"
        # total per-corner credits = 3 * number of triangles
        assert sum(exp.values()) % 3 == 0

    def test_parallelism_invariant(self, ray_session):
        from documentprocessor_ray.functions.graph import triangle_counts

        a = sorted((r["node"], r["n_triangles"]) for r in
                   triangle_counts(self._edges(blocks=1)[0],
                                   small_graph_rows=0).take_all())
        b = sorted((r["node"], r["n_triangles"]) for r in
                   triangle_counts(self._edges(blocks=7)[0],
                                   small_graph_rows=0).take_all())
        assert a == b

    def test_known_graph(self, ray_session):
        from documentprocessor_ray.functions.graph import triangle_counts

        # K4 plus a pendant: K4 has 4 triangles; each corner sits in 3
        edges = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3), (3, 4),
                 (1, 0)]  # duplicate + reversed edges must not double-count
        t = pa.table({
            "doc_a": pa.array([e[0] for e in edges], pa.int64()),
            "doc_b": pa.array([e[1] for e in edges], pa.int64())})
        got = {r["node"]: r["n_triangles"] for r in
               triangle_counts(ray.data.from_arrow(t)).take_all()}
        assert got == {0: 3, 1: 3, 2: 3, 3: 3}


class TestIncrementalNeardup:
    def test_best_match_vs_bruteforce(self, ray_session, tmp_path):
        import hashlib as _hl

        import pyarrow.parquet as pq

        from documentprocessor_ray.pipelines.analysis import (
            _is_incoming, q_incremental_neardup)

        rng = np.random.default_rng(41)
        vocab = [f"w{i}" for i in range(30)]
        texts = []
        for i in range(40):
            toks = list(rng.choice(vocab, size=12))
            texts.append(" ".join(toks))
        # force near-dups across the split: copy doc texts around
        for i in range(30, 40):
            texts[i] = texts[i - 30] + " extra"
        pq.write_table(pa.table({
            "doc_id": pa.array(range(40), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }), tmp_path / "documents.parquet")

        got = {r["doc_id"]: (r["dup_of"], r["n_inter"], r["n_union"])
               for r in q_incremental_neardup(str(tmp_path)).take_all()}

        def shingles(t):
            toks = t.lower().split()
            return {tuple(toks[i:i + 3]) for i in range(len(toks) - 2)}

        sh = [shingles(t) for t in texts]
        exp = {}
        for d in range(40):
            if not _is_incoming(d):
                continue
            best = None
            for b in range(40):
                if _is_incoming(b) or not sh[d] or not sh[b]:
                    continue
                ni = len(sh[d] & sh[b])
                nu = len(sh[d] | sh[b])
                if 2 * ni < nu:
                    continue
                key = (-ni / nu, -ni, b)
                if best is None or key < best[0]:
                    best = (key, (b, ni, nu))
            if best:
                exp[d] = best[1]
        assert exp, "synthetic corpus must contain cross near-dups"
        assert got == exp

    def test_results_are_incoming_vs_base_only(self, ray_session):
        from documentprocessor_ray.pipelines.analysis import (
            _is_incoming, q_incremental_neardup)

        out = q_incremental_neardup("/root/testdata/sf0.001").take_all()
        for r in out:
            assert _is_incoming(r["doc_id"])
            assert not _is_incoming(r["dup_of"])
            assert 2 * r["n_inter"] >= r["n_union"]


class TestPcaProject:
    def test_matches_reference_and_parallelism(self, ray_session):
        from documentprocessor_ray.functions.clustering import (
            pca_project_int, pca_project_reference)

        rng = np.random.default_rng(23)
        # anisotropic data so the principal axes are well-separated
        base = rng.normal(size=(70, 6)) * np.array([9, 5, 2, 1, .5, .2])
        m = base.astype(np.float32)
        exp = {r[0]: tuple(r[1]) for r in pca_project_reference(
            list(range(len(m))), [list(map(float, r)) for r in m], k=3)}
        for blocks in (1, 7):
            out = pca_project_int(_emb_ds(m, blocks=blocks), k=3).take_all()
            got = {r["vec_id"]: (r["pc0"], r["pc1"], r["pc2"]) for r in out}
            assert got == exp, blocks

    def test_component_variance_ordering(self, ray_session):
        from documentprocessor_ray.functions.clustering import (
            pca_project_reference)

        rng = np.random.default_rng(5)
        base = rng.normal(size=(200, 5)) * np.array([20, 6, 2, 1, .3])
        rows = pca_project_reference(
            list(range(len(base))), [list(map(float, r)) for r in base],
            k=3)
        mat = np.array([r[1] for r in rows], dtype=np.float64)
        v = mat.var(axis=0)
        assert v[0] > v[1] > v[2] > 0
