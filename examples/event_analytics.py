"""Event-stream analytics on one page — the EventsAnalyticsPipeline
(analytics/events_pipeline.py) over real testdata:

    raw events
      -> idle-gap sessionization        (x69)
      -> last-touch attribution         (x86)
      -> per-user z-score outliers      (x85)
      -> LOCF time-weighted averages    (x87)
      -> bounded report scalars         (context.stages)

Analytics annotate rather than gate: raw_data flows through unfiltered
while each step stashes its frame under processed_data. Every operator
carries its own DuckDB oracle in the declared query set.

Run: python examples/event_analytics.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from meshinsights_data_pipeline_spark.analytics.events_pipeline import (  # noqa: E402
    build_events_pipeline,
)
from meshinsights_data_pipeline_spark.core.context import PipelineContext  # noqa: E402
from meshinsights_data_pipeline_spark.session import get_spark, read_table  # noqa: E402


def main(sf_dir: str) -> None:
    spark = get_spark("event-analytics")
    ev = read_table(spark, sf_dir, "events")
    pipe = build_events_pipeline(lookback_hours=24, outlier_threshold=2.0)
    ctx = pipe.run(
        PipelineContext(
            pipeline_name="event_analytics", correlation_id="example",
            raw_data=ev,
        )
    )

    print("report:", ctx.stages["events.report"])
    print("-- attributed conversions (latest click within 24h) --")
    ctx.processed_data["events.attribution"].filter(
        F.col("touch_id").isNotNull()
    ).orderBy("conv_id").show(5)
    print("-- strongest per-user outliers --")
    ctx.processed_data["events.outliers"].orderBy(F.desc(F.abs(F.col("z")))).show(5)
    print("-- time-weighted value per user (micros) --")
    ctx.processed_data["events.twa"].orderBy(F.desc("twa_micros")).show(5)

    # Kaplan-Meier churn curve per acquisition cohort: duration = each
    # user's first-to-last event span, churned when the last event is
    # > 12h behind the corpus max (otherwise censored: still active).
    from meshinsights_data_pipeline_spark.operators.survival import (
        km_survival,
    )

    spans = ev.groupBy("user_id").agg(
        F.min("ts").alias("t0"), F.max("ts").alias("t1")
    )
    mx = ev.agg(F.max("ts").alias("tmax"))
    prep = spans.crossJoin(F.broadcast(mx)).select(
        (F.col("user_id") % 4).alias("cohort"),
        (F.expr("timestampdiff(MICROSECOND, t0, t1)")
         / F.lit(86_400_000_000.0)).alias("days_active"),
        (F.col("t1") < F.col("tmax") - F.expr("INTERVAL 12 HOURS")).alias(
            "churned"
        ),
    )
    print("-- survival (fraction still active) at observed churn times --")
    km_survival(prep, ["cohort"], "days_active", "churned").orderBy(
        "cohort", "t"
    ).show(8)
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
