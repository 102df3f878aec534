"""S6 gated threshold sink + A9 BasicStatistics tests."""

from __future__ import annotations

import pytest

from meshinsights_data_pipeline_spark.analytics.sink import (
    BasicStatisticsStep,
    ThresholdSinkStep,
    all_low_variance,
)
from meshinsights_data_pipeline_spark.core.context import PipelineContext
from meshinsights_data_pipeline_spark.core.pipeline import Pipeline
from meshinsights_data_pipeline_spark.sources.factories import ParquetSource


def _ctx(spark, variance, thresholds):
    ctx = PipelineContext(
        pipeline_name="p",
        correlation_id="c",
        raw_data=spark.createDataFrame([(1.0,)], "x double"),
    )
    ctx.variance_analysis = variance
    ctx.thresholds = thresholds
    return ctx


def test_threshold_sink_writes_under_all_low(spark, tmp_path):
    sink = ParquetSource(str(tmp_path / "thresholds"))
    ctx = _ctx(
        spark,
        {"s1": {"variance": "Low"}, "s2": {"variance": "Low"}},
        {"s1": 1200.0, "s2": None},
    )
    out = ThresholdSinkStep(sink)(ctx)
    assert out.stages["threshold_sink"] == {"written": True, "rows": 1}
    written = spark.read.parquet(str(tmp_path / "thresholds")).collect()
    assert [(r["stage"], r["threshold"]) for r in written] == [("s1", 1200.0)]


def test_threshold_sink_gated_when_any_high(spark, tmp_path):
    sink = ParquetSource(str(tmp_path / "thresholds"))
    ctx = _ctx(
        spark,
        {"s1": {"variance": "High"}, "s2": {"variance": "Low"}},
        {"s1": 900.0, "s2": 800.0},
    )
    out = ThresholdSinkStep(sink)(ctx)
    assert out.stages["threshold_sink"]["written"] is False
    assert not (tmp_path / "thresholds").exists()
    assert not all_low_variance(ctx)


def test_threshold_sink_requires_thresholds(spark, tmp_path):
    sink = ParquetSource(str(tmp_path / "thresholds"))
    ctx = _ctx(spark, {"s1": {"variance": "Low"}}, {})
    with pytest.raises(ValueError, match="No thresholds"):
        ThresholdSinkStep(sink)(ctx)


def test_threshold_sink_pipeline_condition_skips(spark, tmp_path):
    """Canonical wiring: the condition skips the step entirely when High."""
    sink = ParquetSource(str(tmp_path / "thresholds"))
    pipe = Pipeline(
        [ThresholdSinkStep(sink)], conditions={"threshold_sink": all_low_variance}
    )
    ctx = _ctx(spark, {"s1": {"variance": "High"}}, {"s1": 1.0})
    out = pipe.run(ctx)
    assert any(
        e["processor"] == "threshold_sink" and e.get("skipped")
        for e in out.execution_log
    )


def test_basic_statistics(spark):
    import statistics

    vals = [1.0, 2.0, 3.0, 4.0, 100.0]
    ctx = PipelineContext(
        pipeline_name="p",
        correlation_id="c",
        raw_data=spark.createDataFrame(
            [(v, str(v)) for v in vals], "x double, label string"
        ),
    )
    out = BasicStatisticsStep()(ctx)
    stats = out.stages["basic_statistics"]
    assert set(stats) == {"x"}  # string column excluded
    s = stats["x"]
    assert s["count"] == 5
    assert s["mean"] == pytest.approx(statistics.mean(vals))
    assert s["std"] == pytest.approx(statistics.stdev(vals))  # sample std
    assert s["min"] == 1.0 and s["max"] == 100.0
    assert s["median"] == 3.0
    assert s["q25"] == 2.0 and s["q75"] == 4.0
