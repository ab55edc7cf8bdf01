"""User-extension surface: the pipeline builder protocol (SURVEY.md §2.9).

The reference exposes an ``IDocumentProcessor`` interface swapped via DI
(Data/IDocumentProcessor.cs:9-29; README.md:323-345). The Ray-native
equivalent is data-shaped, not interface-shaped: a ``Stage`` names a batch
transform (function or actor class) plus its resources, a ``Pipeline`` is an
ordered list of stages applied to a Dataset, and a registry lets users add
stages by name (mirroring the OcrEngine/BaseModel registries in
ocr_kernel.py / stages/scorer.py).

    register_stage("strip", Stage("strip", my_fn, batch_size=1024))
    ds = Pipeline([get_stage("strip"), Stage("score", ScorerCls,
                   batch_size=32, concurrency=(1, 4), num_gpus=1)]).apply(ds)

Functions run on the task pool; classes run as actor pools with the given
concurrency — exactly the stateless/stateful split the engine itself uses.
"""

from __future__ import annotations

import inspect
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, List, Optional, Union

import ray.data


@dataclass
class Stage:
    name: str
    fn: Union[Callable, type]
    batch_size: Optional[int] = None
    batch_format: str = "pyarrow"
    concurrency: Any = None           # actor-pool size for class stages
    num_cpus: Optional[float] = None
    num_gpus: Optional[float] = None
    fn_constructor_kwargs: Dict[str, Any] = field(default_factory=dict)

    def apply(self, ds: "ray.data.Dataset") -> "ray.data.Dataset":
        kwargs: Dict[str, Any] = {
            "batch_format": self.batch_format,
        }
        if self.batch_size is not None:
            kwargs["batch_size"] = self.batch_size
        if self.num_cpus is not None:
            kwargs["num_cpus"] = self.num_cpus
        if self.num_gpus is not None:
            kwargs["num_gpus"] = self.num_gpus
        if inspect.isclass(self.fn):
            # explicit None/0 means "use the default pool", not falsy-skip
            kwargs["concurrency"] = (self.concurrency
                                     if self.concurrency is not None else (1, 2))
            if self.fn_constructor_kwargs:
                kwargs["fn_constructor_kwargs"] = self.fn_constructor_kwargs
        elif self.concurrency is not None:
            # function stages accept concurrency too (caps task parallelism)
            kwargs["concurrency"] = self.concurrency
        return ds.map_batches(self.fn, **kwargs)


@dataclass
class Pipeline:
    stages: List[Stage]

    def apply(self, ds: "ray.data.Dataset") -> "ray.data.Dataset":
        for stage in self.stages:
            ds = stage.apply(ds)
        return ds

    def names(self) -> List[str]:
        return [s.name for s in self.stages]


_STAGE_REGISTRY: Dict[str, Stage] = {}


def register_stage(name: str, stage: Stage) -> None:
    _STAGE_REGISTRY[name] = stage


def get_stage(name: str) -> Stage:
    if name not in _STAGE_REGISTRY:
        raise ValueError(f"unknown stage '{name}'; known: {sorted(_STAGE_REGISTRY)}")
    return _STAGE_REGISTRY[name]
