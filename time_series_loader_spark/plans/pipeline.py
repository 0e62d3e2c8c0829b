"""Extension registry and ordered pipeline builder (§2.8).

Parity targets:
- ``register_extension`` (typed slots + free-form dict) — reference
  ``load_file.py:2362-2402``
- ``with_extensions`` builder — reference ``load_file.py:2420-2510``
- ``create_pipeline`` (ordered step list) — reference
  ``load_file.py:2512-2561``
- ``update_config`` (rebuild dataclasses, hot-swap validator) — reference
  ``load_file.py:548-619``

Spark design: a pipeline is an ordered list of named ``DataFrame →
DataFrame`` steps composed with ``DataFrame.transform`` — the result is
still ONE lazy plan; steps add no materialization boundaries.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

from pyspark.sql import DataFrame

Step = Callable[[DataFrame], DataFrame]


class ExtensionRegistry:
    """Typed slots (metadata extractor / validator / transformer / hooks)
    plus a free-form extension dict, as in the reference."""

    TYPED_SLOTS = ("metadata_extractor", "time_series_validator", "data_transformer")

    def __init__(self) -> None:
        self.typed: dict[str, Any] = {}
        self.hooks: list[Any] = []
        self.custom: dict[str, Any] = {}

    def register(self, kind: str, ext: Any) -> "ExtensionRegistry":
        if kind in self.TYPED_SLOTS:
            self.typed[kind] = ext
        elif kind == "post_processing_hook":
            self.hooks.append(ext)
        else:
            self.custom[kind] = ext
        return self

    def get(self, kind: str, default: Any = None) -> Any:
        if kind in self.TYPED_SLOTS:
            return self.typed.get(kind, default)
        return self.custom.get(kind, default)


class Pipeline:
    """Ordered, named DataFrame→DataFrame steps; one lazy composed plan."""

    def __init__(self, steps: Optional[list[tuple[str, Step]]] = None) -> None:
        self.steps: list[tuple[str, Step]] = list(steps or [])

    def add(self, name: str, step: Step) -> "Pipeline":
        self.steps.append((name, step))
        return self

    def insert(self, index: int, name: str, step: Step) -> "Pipeline":
        self.steps.insert(index, (name, step))
        return self

    def remove(self, name: str) -> "Pipeline":
        self.steps = [(n, s) for n, s in self.steps if n != name]
        return self

    def names(self) -> list[str]:
        return [n for n, _ in self.steps]

    def run(self, df: DataFrame) -> DataFrame:
        for _, step in self.steps:
            df = df.transform(step)
        return df


def create_pipeline(*steps: tuple[str, Step]) -> Pipeline:
    return Pipeline(list(steps))


def update_config(config: Any, **overrides: Any) -> Any:
    """Rebuild a config dataclass with field overrides (hot-swap semantics
    of reference ``update_config``); unknown fields raise."""
    valid = {f.name for f in dataclasses.fields(config)}
    unknown = set(overrides) - valid
    if unknown:
        raise ValueError(f"unknown config fields: {sorted(unknown)}")
    return dataclasses.replace(config, **overrides)
