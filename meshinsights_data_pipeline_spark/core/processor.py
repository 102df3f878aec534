"""Processor — the universal extension point (a step over the context).

Reference parity: src/core/processor.py:10-174. Same contract: stateless,
side-effect-free ``process(context) -> context``; ``validate_prerequisites``
and ``validate_output`` hooks; ``__call__`` wraps them with logging, timing,
and per-processor error policy (stop_on_error -> re-raise; else record into
context.errors and return the UNCHANGED context, processor.py:158-174).

Spark-first deltas:
- ``process`` composes lazy DataFrame plans; timing measures plan-building
  plus whatever small actions (collect of scalar aggregates) the step takes.
- Validation checks schemas eagerly (df.schema is metadata, free) and data
  lazily — the reference's eager "No raw data available" error on empty
  frames becomes a schema/handle check, with optional row checks gated
  behind ``validate_data`` for tests.
"""

from __future__ import annotations

import logging
import time
from abc import ABC, abstractmethod
from collections.abc import Sequence

from pyspark.sql import DataFrame

from meshinsights_data_pipeline_spark.core.context import PipelineContext

logger = logging.getLogger(__name__)


class Processor(ABC):
    """A single, stateless pipeline step.

    Subclasses implement ``process``; they may override the validation
    hooks. ``name`` defaults to the class name (processor.py:34-37).
    """

    def __init__(self, name: str | None = None, stop_on_error: bool = True):
        self.name = name or self.__class__.__name__
        self.stop_on_error = stop_on_error

    # -- hooks ------------------------------------------------------------

    @abstractmethod
    def process(self, context: PipelineContext) -> PipelineContext:
        """Pure transform: read context -> compute -> return modified copy."""

    def validate_prerequisites(self, context: PipelineContext) -> None:
        """Raise ValueError when required inputs are missing
        (processor.py:79-93). Override for custom checks."""

    def validate_output(self, context: PipelineContext) -> None:
        """Raise ValueError when outputs violate invariants
        (processor.py:95-110)."""

    # -- helpers for subclasses -------------------------------------------

    @staticmethod
    def require_raw_data(context: PipelineContext) -> DataFrame:
        if context.raw_data is None:
            raise ValueError("No raw data available")
        return context.raw_data

    @staticmethod
    def require_columns(df: DataFrame, columns: Sequence[str]) -> None:
        missing = [c for c in columns if c not in df.columns]
        if missing:
            raise ValueError(f"Missing required columns: {missing}")

    # -- execution wrapper (processor.py:112-174) --------------------------

    def __call__(self, context: PipelineContext) -> PipelineContext:
        logger.info("Starting processor: %s", self.name)
        start = time.perf_counter()
        try:
            self.validate_prerequisites(context)
            result = self.process(context)
            self.validate_output(result)
            elapsed = time.perf_counter() - start
            result.log_execution(self.name, {"execution_time": elapsed, "status": "success"})
            logger.info("Completed processor %s in %.3fs", self.name, elapsed)
            return result
        except Exception as exc:  # noqa: BLE001 — error policy is the contract
            elapsed = time.perf_counter() - start
            # Reference parity (src/core/processor.py:158-174): the error is
            # recorded in context.errors on EVERY failure; under
            # stop_on_error it then re-raises, otherwise a warning is added
            # and the UNCHANGED context is returned.
            context.add_error(self.name, str(exc))
            if self.stop_on_error:
                context.log_execution(
                    self.name, {"execution_time": elapsed, "status": "failed", "error": str(exc)}
                )
                raise
            context.add_warning(self.name, f"Processor {self.name} failed: {exc}")
            context.log_execution(
                self.name, {"execution_time": elapsed, "status": "error_continue", "error": str(exc)}
            )
            logger.warning("Processor %s failed (continuing): %s", self.name, exc)
            return context
