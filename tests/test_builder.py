"""Pipeline builder protocol (§2.9): function stages, actor stages, registry.

UDFs are defined inside the tests so cloudpickle ships them by value (Ray
workers do not have tests/ on their import path)."""

from __future__ import annotations

import pyarrow as pa
import pytest

import ray.data

from documentprocessor_ray.pipelines.builder import (
    Pipeline, Stage, get_stage, register_stage,
)


def _make_udfs():
    import pyarrow.compute as pc

    def double(batch: pa.Table) -> pa.Table:
        return batch.set_column(0, "id", pc.multiply(batch["id"], 2))

    class AddBias:
        def __init__(self, bias: int = 0):
            self.bias = bias

        def __call__(self, batch: pa.Table) -> pa.Table:
            return batch.set_column(0, "id", pc.add(batch["id"], self.bias))

    return double, AddBias


class TestBuilder:
    def test_function_and_actor_stages_compose(self, ray_session):
        double, AddBias = _make_udfs()
        ds = ray.data.from_arrow(pa.table({"id": pa.array(range(10), pa.int64())}))
        pipe = Pipeline([
            Stage("double", double, batch_size=4),
            Stage("bias", AddBias, concurrency=(1, 2),
                  fn_constructor_kwargs={"bias": 5}),
        ])
        out = sorted(pipe.apply(ds).to_pandas()["id"])
        assert out == sorted(2 * i + 5 for i in range(10))
        assert pipe.names() == ["double", "bias"]

    def test_registry(self, ray_session):
        double, _ = _make_udfs()
        register_stage("double-test", Stage("double-test", double))
        ds = ray.data.from_arrow(pa.table({"id": pa.array([3], pa.int64())}))
        out = get_stage("double-test").apply(ds).to_pandas()
        assert out["id"].tolist() == [6]
        with pytest.raises(ValueError, match="unknown stage"):
            get_stage("nope")
