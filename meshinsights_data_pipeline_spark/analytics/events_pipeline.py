"""EventsAnalyticsPipeline — the event-stream analytics workload composed
as a Processor list (the corpus_pipeline pattern applied to the event
operators added in rounds 8-11):

    raw events
      -> idle-gap sessionization        (operators.sessionize, x69)
      -> last-touch attribution         (operators.funnel, x86)
      -> per-user z-score outliers      (operators.stats, x85)
      -> LOCF time-weighted averages    (operators.rollup, x87)
      -> summary report                 (one aggregate over the stashes)

Every step stashes its full frame under ``processed_data`` and
``raw_data`` flows through unchanged (analytics annotate, they don't
filter — unlike the corpus pipeline's gates), so downstream consumers
compose freely. Each underlying operator already carries its own DuckDB
oracle (x69/x86/x85/x87); this module adds the composability contract —
validation, timing, error policy, conditions, run_partial — on top.

Scale: inherits each operator's shape (entity-keyed windows and
aggregates, broadcast moment/state frames; no corpus-squared step, no
driver-side data).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from meshinsights_data_pipeline_spark.core.context import PipelineContext
from meshinsights_data_pipeline_spark.core.pipeline import Pipeline, PipelineConfig
from meshinsights_data_pipeline_spark.core.processor import Processor


class EventColumns:
    """Column-name binding (testdata: user_id/ts/event_type/event_id/value)."""

    def __init__(self, user="user_id", ts="ts", type_="event_type",
                 id_="event_id", value="value"):
        self.user, self.ts, self.type, self.id, self.value = (
            user, ts, type_, id_, value,
        )


class _EventStep(Processor):
    #: extra columns a concrete step needs beyond the id/ts/type/user
    #: quartet (e.g. the value column) — validated up front so a missing
    #: column fails the Processor contract's controlled validation path,
    #: not an AnalysisException two expensive steps in.
    extra_cols: tuple[str, ...] = ()

    def __init__(self, cols: EventColumns, name: str, **kw):
        super().__init__(name=name, **kw)
        self.cols = cols

    def validate_prerequisites(self, context: PipelineContext) -> None:
        # The Processor contract is RAISE-on-missing (processor.py:49-51;
        # __call__ ignores return values, so a bool-returning override
        # would silently never fail — the convention the power/corpus
        # pipelines follow).
        df = self.require_raw_data(context)
        need = [self.cols.user, self.cols.ts, self.cols.type, self.cols.id]
        need += [getattr(self.cols, c) for c in self.extra_cols]
        self.require_columns(df, need)


class SessionizeStep(_EventStep):
    """Idle-gap sessions (x69 semantics); stash "events.sessions"."""

    def __init__(self, cols: EventColumns, gap_seconds: int = 43200, **kw):
        super().__init__(cols, name="sessionize", **kw)
        self.gap_seconds = gap_seconds

    def process(self, context: PipelineContext) -> PipelineContext:
        from meshinsights_data_pipeline_spark.operators.sessionize import (
            sessionize_by_gap,
        )

        context.processed_data["events.sessions"] = sessionize_by_gap(
            context.raw_data,
            ts_col=self.cols.ts,
            gap_seconds=self.gap_seconds,
            partition_by=[self.cols.user],
            tiebreak=[F.col(self.cols.id)],
        )
        return context


class AttributionStep(_EventStep):
    """Last-touch attribution (x86); stash "events.attribution"."""

    def __init__(self, cols: EventColumns, conversion: str = "purchase",
                 touch: str = "click", lookback_hours: int = 24, **kw):
        super().__init__(cols, name="attribution", **kw)
        self.conversion, self.touch = conversion, touch
        self.lookback_hours = lookback_hours

    def process(self, context: PipelineContext) -> PipelineContext:
        from meshinsights_data_pipeline_spark.operators.funnel import (
            last_touch_attribution,
        )

        context.processed_data["events.attribution"] = last_touch_attribution(
            context.raw_data, self.cols.user, self.cols.ts, self.cols.type,
            self.cols.id, conversion=self.conversion, touch=self.touch,
            lookback_hours=self.lookback_hours,
        )
        return context


class OutlierStep(_EventStep):
    """Per-user outliers; stash "events.outliers". ``method``:
    ``zscore`` (x85 — parametric; threshold in population sigmas) or
    ``mad`` (x92 — robust; threshold in raw MAD units, so pick ~3-5:
    one wild value cannot inflate the spread estimate and mask itself,
    the right mode for fat-tailed telemetry).

    ``threshold=None`` (the default) resolves per method — 2.0 sigmas
    for zscore, 3.5 MAD units for mad (the Iglewicz-Hoaglin convention)
    — because the two scales aren't comparable: a shared 2.0 default
    would be an over-aggressive cutoff in MAD units."""

    extra_cols = ("value",)

    #: per-method resolution of threshold=None; the units differ
    #: (population sigmas vs raw MAD units), so no single number is
    #: right for both.
    DEFAULT_THRESHOLDS = {"zscore": 2.0, "mad": 3.5}

    def __init__(self, cols: EventColumns, threshold: float | None = None,
                 method: str = "zscore", **kw):
        if method not in ("zscore", "mad"):
            raise ValueError(f"unknown outlier method: {method!r}")
        super().__init__(cols, name="outliers", **kw)
        self.threshold = (self.DEFAULT_THRESHOLDS[method]
                          if threshold is None else threshold)
        self.method = method

    def process(self, context: PipelineContext) -> PipelineContext:
        from meshinsights_data_pipeline_spark.operators.stats import (
            mad_outliers,
            zscore_outliers,
        )

        detect = zscore_outliers if self.method == "zscore" else mad_outliers
        context.processed_data["events.outliers"] = detect(
            context.raw_data, [self.cols.user], self.cols.value,
            threshold=self.threshold,
        ).filter(F.col("is_outlier"))
        return context


class TimeWeightedStep(_EventStep):
    """Per-user LOCF time-weighted value (x87); stash "events.twa"."""

    extra_cols = ("value",)

    def __init__(self, cols: EventColumns, **kw):
        super().__init__(cols, name="time_weighted", **kw)

    def process(self, context: PipelineContext) -> PipelineContext:
        from meshinsights_data_pipeline_spark.operators.rollup import (
            time_weighted_avg,
        )

        context.processed_data["events.twa"] = time_weighted_avg(
            context.raw_data, self.cols.ts, [self.cols.user], self.cols.value,
        )
        return context


class EventsReportStep(_EventStep):
    """Bounded summary scalars into ``context.stages`` (the dashboard
    hand-off: counts only — the frames stay distributed)."""

    #: the processed_data stashes the report reads with hard key lookups;
    #: validated up front so a run_partial() that skipped an upstream step
    #: fails the Processor contract's controlled validation path instead
    #: of a raw KeyError inside process().
    REQUIRED_STASHES = (
        "events.sessions",
        "events.attribution",
        "events.outliers",
        "events.twa",
    )

    def __init__(self, cols: EventColumns, **kw):
        super().__init__(cols, name="events_report", **kw)

    def validate_prerequisites(self, context: PipelineContext) -> None:
        # This step consumes upstream stashes, not raw_data columns — the
        # base check would pass raw_data while the keys are missing (e.g.
        # a run_partial() that skipped an upstream step).
        missing = [k for k in self.REQUIRED_STASHES
                   if k not in context.processed_data]
        if missing:
            raise ValueError(
                f"EventsReportStep needs processed_data keys {missing}; "
                "run the upstream steps (or run_partial from 'sessionize')"
            )

    def process(self, context: PipelineContext) -> PipelineContext:
        pd = context.processed_data
        sessions = pd["events.sessions"]
        # ONE aggregate over the attribution frame for both counts —
        # count(touch_id) skips NULLs, so the expensive asof DAG runs
        # once instead of once per scalar.
        attr = pd["events.attribution"].agg(
            F.count(F.lit(1)).alias("conv"),
            F.count("touch_id").alias("attr"),
        ).first()
        report = {
            "n_sessions": sessions.groupBy(
                self.cols.user, "session"
            ).count().count(),
            "n_attributed": attr["attr"],
            "n_conversions": attr["conv"],
            "n_outlier_rows": pd["events.outliers"].count(),
            "n_twa_users": pd["events.twa"].count(),
        }
        context.stages["events.report"] = report
        return context


def build_events_pipeline(
    cols: EventColumns | None = None,
    config: PipelineConfig | None = None,
    gap_seconds: int = 43200,
    conversion: str = "purchase",
    touch: str = "click",
    lookback_hours: int = 24,
    outlier_threshold: float | None = None,
    outlier_method: str = "zscore",
) -> Pipeline:
    cols = cols or EventColumns()
    steps = [
        SessionizeStep(cols, gap_seconds=gap_seconds),
        AttributionStep(cols, conversion=conversion, touch=touch,
                        lookback_hours=lookback_hours),
        OutlierStep(cols, threshold=outlier_threshold,
                    method=outlier_method),
        TimeWeightedStep(cols),
        EventsReportStep(cols),
    ]
    return Pipeline(steps, config=config or PipelineConfig())
