"""SourceRegistry — name -> Source-class registration with cached instances.

Reference parity: PluginManager (src/plugins/manager.py:19-74): duplicate-name
and subtype checks on register, singleton cached instances on get, bulk
cleanup. Spark replaces connection pooling, so "cleanup" just drops cached
instances (and unpersists nothing — sources are lazy readers).
"""

from __future__ import annotations

from typing import Any

from meshinsights_data_pipeline_spark.sources.base import Source


class SourceRegistry:
    """Driver-side registry mapping names to Source factories."""

    def __init__(self) -> None:
        self._classes: dict[str, type[Source]] = {}
        self._active: dict[str, Source] = {}

    # manager.py:19-35 semantics
    def register(self, name: str, source_cls: type[Source]) -> None:
        if name in self._classes:
            raise ValueError(f"Source {name!r} is already registered")
        if not (isinstance(source_cls, type) and issubclass(source_cls, Source)):
            raise TypeError(f"{source_cls!r} is not a Source subclass")
        self._classes[name] = source_cls

    # manager.py:52-59 semantics (instantiate once, cache)
    def get(self, name: str, **kwargs: Any) -> Source:
        if name not in self._classes:
            raise KeyError(f"Unknown source {name!r}; registered: {sorted(self._classes)}")
        if name not in self._active:
            self._active[name] = self._classes[name](**kwargs)
        return self._active[name]

    def list(self) -> list[str]:
        return sorted(self._classes)

    # manager.py:66-74 semantics
    def cleanup(self) -> None:
        self._active.clear()
