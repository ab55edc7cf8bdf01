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
