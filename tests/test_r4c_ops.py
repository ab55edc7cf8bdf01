"""Round-4 third-batch operators: k-core decomposition."""

import numpy as np
import pyarrow as pa

import ray
import ray.data

from documentprocessor_ray.functions.graph import kcore, kcore_reference


def _edges_ds(pairs, blocks=None):
    t = pa.table({"doc_a": pa.array([p[0] for p in pairs], pa.int64()),
                  "doc_b": pa.array([p[1] for p in pairs], pa.int64())})
    ds = ray.data.from_arrow(t)
    if blocks:
        ds = ds.repartition(blocks)
    return ds


def _rand_pairs(n_nodes=30, n_edges=140, seed=11):
    rng = np.random.default_rng(seed)
    a = rng.integers(0, n_nodes, n_edges)
    b = rng.integers(0, n_nodes, n_edges)
    return list(zip(a.tolist(), b.tolist()))


class TestKCore:
    def test_reference_peels_cascade(self):
        # path graph a-b-c-d: 2-core is empty (endpoints peel, cascade)
        ref = kcore_reference([(0, 1), (1, 2), (2, 3)], k=2)
        assert ref == {}
        # triangle + pendant: 2-core is exactly the triangle
        ref = kcore_reference([(0, 1), (1, 2), (0, 2), (2, 9)], k=2)
        assert ref == {0: 2, 1: 2, 2: 2}

    def test_distributed_matches_reference(self, ray_session):
        pairs = _rand_pairs()
        for k in (2, 3, 4):
            got = sorted((r["node"], r["deg"]) for r in kcore(
                _edges_ds(pairs), k=k, small_graph_rows=0).take_all())
            exp = sorted(kcore_reference(pairs, k=k).items())
            assert got == exp, f"k={k}"

    def test_distributed_parallelism_invariant(self, ray_session):
        pairs = _rand_pairs(seed=23)
        a = sorted((r["node"], r["deg"]) for r in kcore(
            _edges_ds(pairs, blocks=1), k=3, small_graph_rows=0)
            .take_all())
        b = sorted((r["node"], r["deg"]) for r in kcore(
            _edges_ds(pairs, blocks=8), k=3, small_graph_rows=0)
            .take_all())
        assert a == b

    def test_short_circuit_equals_distributed(self, ray_session):
        pairs = _rand_pairs(seed=5)
        small = sorted((r["node"], r["deg"]) for r in kcore(
            _edges_ds(pairs), k=3).take_all())
        dist = sorted((r["node"], r["deg"]) for r in kcore(
            _edges_ds(pairs), k=3, small_graph_rows=0).take_all())
        assert small == dist

    def test_fixed_round_budget_is_respected(self):
        # a long path peels one layer (both endpoints) per round; with a
        # 2-round budget only 2 layers go, matching the unrolled SQL twin
        path = [(i, i + 1) for i in range(10)]
        ref = kcore_reference(path, k=2, max_rounds=2)
        # after 2 rounds: nodes 0,1,9,10 then 1?,... endpoints peel inward
        full = kcore_reference(path, k=2, max_rounds=12)
        assert full == {}
        assert len(ref) > 0  # the budget stopped the cascade mid-way


class TestJsonlSource:
    def _write_docs(self, tmp_path, texts):
        import pyarrow.parquet as pq
        t = pa.table({
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * len(texts)),
            "source": pa.array(["web"] * len(texts)),
            "n_chars": pa.array([len(x) for x in texts], pa.int64())})
        p = str(tmp_path / "documents.parquet")
        pq.write_table(t, p)
        return p

    def test_round_trip_preserves_unicode_and_escapes(
            self, ray_session, tmp_path):
        from documentprocessor_ray.sources.jsonl import (
            read_jsonl, write_jsonl_shards)

        texts = ['plain', 'quote " and \\ backslash', 'newline\nin text',
                 'unicode: café 中文', 'tab\there', '']
        p = self._write_docs(tmp_path, texts)
        d = write_jsonl_shards(p, str(tmp_path / "shards"), num_shards=3)
        got = sorted((r["doc_id"], r["text"])
                     for r in read_jsonl(d).take_all())
        assert got == sorted(enumerate(texts))

    def test_shards_are_the_parallel_grain(self, ray_session, tmp_path):
        import os

        from documentprocessor_ray.sources.jsonl import write_jsonl_shards

        p = self._write_docs(tmp_path, [f"doc {i}" for i in range(20)])
        d = write_jsonl_shards(p, str(tmp_path / "s"), num_shards=4)
        files = [f for f in os.listdir(d) if f.endswith(".jsonl")]
        assert len(files) == 4
        # doc_id % num_shards == k per shard
        import json as _j
        for f in files:
            k = int(f.split("-")[1].split(".")[0])
            with open(os.path.join(d, f)) as fh:
                ids = [_j.loads(l)["doc_id"] for l in fh if l.strip()]
            assert all(i % 4 == k for i in ids)
            assert ids == sorted(ids)

    def test_stale_marker_regenerates(self, ray_session, tmp_path):
        import os
        import time

        from documentprocessor_ray.sources.jsonl import (
            read_jsonl, write_jsonl_shards)

        p = self._write_docs(tmp_path, ["old text"])
        d = write_jsonl_shards(p, str(tmp_path / "s2"))
        assert read_jsonl(d).take_all()[0]["text"] == "old text"
        time.sleep(0.01)
        self._write_docs(tmp_path, ["new text"])  # overwrite, newer mtime
        write_jsonl_shards(p, str(tmp_path / "s2"))
        assert read_jsonl(d).take_all()[0]["text"] == "new text"


class TestCsvSource:
    def _write_docs(self, tmp_path, texts):
        import pyarrow.parquet as pq
        t = pa.table({
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * len(texts)),
            "source": pa.array(["web"] * len(texts)),
            "n_chars": pa.array([len(x) for x in texts], pa.int64())})
        p = str(tmp_path / "documents.parquet")
        pq.write_table(t, p)
        return p

    def test_round_trip_quoting(self, ray_session, tmp_path):
        from documentprocessor_ray.sources.csv_source import (
            read_csv, write_csv_shards)

        texts = ['plain', 'comma, inside', 'quote " inside',
                 'newline\ninside quoted field', 'both ",\n" mixed',
                 'unicode: café 中文']
        p = self._write_docs(tmp_path, texts)
        d = write_csv_shards(p, str(tmp_path / "shards"), num_shards=3)
        got = sorted((r["doc_id"], r["text"])
                     for r in read_csv(d).take_all())
        assert got == sorted(enumerate(texts))

    def test_header_per_shard(self, tmp_path, ray_session):
        import os

        from documentprocessor_ray.sources.csv_source import \
            write_csv_shards

        p = self._write_docs(tmp_path, [f"d{i}" for i in range(8)])
        d = write_csv_shards(p, str(tmp_path / "s"), num_shards=2)
        for f in sorted(os.listdir(d)):
            if f.endswith(".csv"):
                first = open(os.path.join(d, f)).readline().strip()
                assert first == "doc_id,text,lang,source,n_chars"


class TestDomainMixture:
    def test_weights_sum_below_one_and_monotone(self, ray_session):
        from documentprocessor_ray.pipelines.analysis import \
            q_domain_mixture

        rows = q_domain_mixture("/root/testdata/sf0.001").take_all()
        assert len(rows) > 1
        total = sum(r["w_ppm"] for r in rows)
        assert 1_000_000 - len(rows) <= total <= 1_000_000
        # weight is monotone in token count
        by_tok = sorted(rows, key=lambda r: r["n_tokens"])
        ws = [r["w_ppm"] for r in by_tok]
        assert ws == sorted(ws)
