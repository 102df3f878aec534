"""Gated threshold write-back sink (S6) + BasicStatistics processor (A9).

S6 reference: Requirements/requirements.md:45-46 — "Update the alert
threshold database with the calculated thresholds (if the power variance is
low enough)". The sink step writes the per-stage thresholds through any
``Source`` (JDBC in production, parquet in-sandbox) and is gated by the
all-Low condition; stages with a None threshold are excluded (a None
threshold means the stage had no reliable baseline, EPC:479-483).

A9 reference: Architectural Options/Opus.md:537-552 — ``BasicStatistics``
is the canonical day-1 processor: describe-style stats per numeric column.
One ``agg`` pass (count/mean/std/min/max/quartiles), all built-in JVM
expressions; only the per-column scalar summary is collected.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import functions as F
from pyspark.sql.types import NumericType

from meshinsights_data_pipeline_spark.core.context import PipelineContext
from meshinsights_data_pipeline_spark.core.processor import Processor
from meshinsights_data_pipeline_spark.sources.base import Source


def all_low_variance(context: PipelineContext) -> bool:
    """The S6 gating condition: every classified stage is Low variance."""
    va = context.variance_analysis
    return bool(va) and all(v.get("variance") == "Low" for v in va.values())


class ThresholdSinkStep(Processor):
    """Write non-null thresholds to a sink when the gate allows.

    Use with ``conditions={"threshold_sink": all_low_variance}`` for the
    canonical pipeline wiring; the step itself also re-checks the gate so a
    bare call can't write an unreliable baseline.
    """

    def __init__(self, sink: Source, mode: str = "append", **kw: Any):
        super().__init__(name="threshold_sink", **kw)
        self.sink = sink
        self.mode = mode

    def validate_prerequisites(self, context: PipelineContext) -> None:
        if not context.thresholds:
            raise ValueError("No thresholds computed — run CalculateThresholdsStep first")

    def process(self, context: PipelineContext) -> PipelineContext:
        out = context.model_copy()
        if not all_low_variance(context):
            out.stages[self.name] = {"written": False, "reason": "variance gate not met"}
            return out
        rows = [
            (str(stage), float(th))
            for stage, th in sorted(context.thresholds.items())
            if th is not None
        ]
        if not rows:
            out.stages[self.name] = {"written": False, "reason": "no non-null thresholds"}
            return out
        spark = context.raw_data.sparkSession if context.raw_data is not None else None
        if spark is None:
            raise ValueError("No SparkSession available to build the threshold frame")
        df = spark.createDataFrame(rows, "stage string, threshold double")
        self.sink.write(df, mode=self.mode)
        out.stages[self.name] = {"written": True, "rows": len(rows)}
        return out


class BasicStatisticsStep(Processor):
    """Day-1 describe-style stats per numeric column (OPS:537-552).

    Stores {column: {count, mean, std, min, q25, median, q75, max}} into
    ``context.stages["basic_statistics"]``. std is SAMPLE std (pandas
    describe parity); quartiles are exact interpolated percentiles.
    """

    def __init__(self, columns: list[str] | None = None, **kw: Any):
        super().__init__(name="basic_statistics", **kw)
        self.columns = columns

    def validate_prerequisites(self, context: PipelineContext) -> None:
        self.require_raw_data(context)

    def process(self, context: PipelineContext) -> PipelineContext:
        df = context.raw_data
        cols = self.columns or [
            f.name for f in df.schema.fields if isinstance(f.dataType, NumericType)
        ]
        aggs = []
        for c in cols:
            v = F.col(c)
            aggs += [
                F.count(v).alias(f"{c}__count"),
                F.avg(v).alias(f"{c}__mean"),
                F.stddev(v).alias(f"{c}__std"),
                F.min(v).alias(f"{c}__min"),
                F.percentile(v, F.lit(0.25)).alias(f"{c}__q25"),
                F.median(v).alias(f"{c}__median"),
                F.percentile(v, F.lit(0.75)).alias(f"{c}__q75"),
                F.max(v).alias(f"{c}__max"),
            ]
        row = df.agg(*aggs).collect()[0] if aggs else {}
        stats = {
            c: {
                stat: row[f"{c}__{stat}"]
                for stat in ("count", "mean", "std", "min", "q25", "median", "q75", "max")
            }
            for c in cols
        }
        out = context.model_copy()
        out.stages[self.name] = stats
        return out
