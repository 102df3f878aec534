"""Temporal drift monitoring end-to-end on the events table: per-user
CUSUM changepoints -> alarm summary -> A/B readout of a derived
experiment — the telemetry-monitoring composition next to the
distributional drift examples (PSI/TV/centroid compare populations;
CUSUM watches each key IN TIME).

1. cusum_changepoints: two-sided Page CUSUM per user over event values
   in (ts, id) order — the max(0, S+d) recurrence computed by its
   closed form (cumsum minus running-min of prefix sums), one shuffle.
2. Alarm summary: first alarm time and alarm counts per user — the
   triage frame an on-call dashboard reads.
3. ab_test_zscores: treat odd/even user ids as experiment arms and
   "user ever alarmed" as the conversion — the two-proportion z
   readout pattern (here expected insignificant: the split is random).
4. ks_drift: exact two-sample KS of each event type's value
   distribution vs the corpus — the population-level check run NEXT to
   the per-key CUSUM (did the whole distribution move, not just one
   key's series?).
5. mann_kendall_trend: per-user Mann-Kendall z + Theil-Sen slope —
   the is-it-drifting/how-fast triage over the users CUSUM alarmed.

Run: python examples/drift_monitoring.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from meshinsights_data_pipeline_spark.operators.abtest import ab_test_zscores
from meshinsights_data_pipeline_spark.operators.changepoint import (
    cusum_changepoints,
)
from meshinsights_data_pipeline_spark.session import get_spark, read_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("drift-monitoring-example")
    ev = read_table(spark, sf_dir, "events")

    # target/slack from the corpus's own scale, as literals (classic
    # CUSUM practice: baseline from history, not the window under test)
    mu, sigma = ev.agg(
        F.round(F.avg("value"), 2), F.round(F.stddev_pop("value"), 2)
    ).first()
    scored = cusum_changepoints(
        ev, "ts", ["user_id"], "value", "event_id",
        target=mu, slack=0.5 * sigma, threshold=4.0 * sigma,
    )

    alarms = scored.filter(F.col("alarm_up") | F.col("alarm_down"))
    summary = alarms.groupBy("user_id").agg(
        F.min("ts").alias("first_alarm"),
        F.sum(F.col("alarm_up").cast("int")).alias("n_up"),
        F.sum(F.col("alarm_down").cast("int")).alias("n_down"),
    )
    n_alarmed = summary.count()
    print(f"target={mu} slack={0.5 * sigma} h={4.0 * sigma}: "
          f"{n_alarmed} users alarmed")
    summary.orderBy("first_alarm").show(5)

    # A/B readout: random odd/even split, conversion = ever alarmed
    units = ev.select("user_id").distinct().withColumn(
        "arm", F.when(F.col("user_id") % 2 == 0, "control").otherwise("t1")
    ).join(
        summary.select("user_id").withColumn("conv", F.lit(True)),
        "user_id", "left",
    ).fillna(False, ["conv"]).withColumn("exp", F.lit("alarm_rate"))
    ab_test_zscores(units, "exp", "arm", "conv",
                    control_label="control").show()

    # population-level: did any event type's whole distribution move?
    from meshinsights_data_pipeline_spark.operators.stats import ks_drift

    print("KS of each event type vs the corpus:")
    ks_drift(ev, "event_type", "value").orderBy(F.desc("ks")).show(5)

    # per-key triage: of the alarmed users, whose series actually
    # trends, and at what rate? (CUSUM flags level shifts too;
    # Mann-Kendall separates monotone drift from a step.)
    from meshinsights_data_pipeline_spark.operators.trend import (
        mann_kendall_trend,
    )

    alarmed_events = ev.join(summary.select("user_id"), "user_id")
    print("Mann-Kendall trend over the alarmed users:")
    mann_kendall_trend(
        alarmed_events, "ts", ["user_id"], "value", cap_n=200
    ).orderBy(F.desc(F.abs(F.col("z")))).show(5)

    # continuous-metric readout: did the arms' mean VALUE differ, not
    # just the alarm rate? (Welch stays valid under unequal variances)
    from meshinsights_data_pipeline_spark.operators.abtest import (
        welch_ttest,
    )

    print("Welch t of mean event value, odd vs even users:")
    metric = ev.select(
        F.lit("mean_value").alias("exp"),
        F.when(F.col("user_id") % 2 == 0, "control")
        .otherwise("t1").alias("arm"),
        F.col("value"),
    )
    welch_ttest(metric, "exp", "arm", "value",
                control_label="control").show()

    # the nonparametric readout of the same experiment: any
    # distribution shift, not just the mean (heavy tails welcome)
    from meshinsights_data_pipeline_spark.operators.abtest import (
        mann_whitney_u,
    )

    print("Mann-Whitney U of the same arms:")
    mann_whitney_u(metric, "exp", "arm", "value",
                   control_label="control").show()

    # k-arm omnibus BEFORE pairwise readouts: do any of three
    # user-segments differ at all? (gate the k pairwise tests on H)
    from meshinsights_data_pipeline_spark.operators.abtest import (
        kruskal_wallis,
    )

    print("Kruskal-Wallis H across three user segments:")
    kruskal_wallis(
        ev.select(
            F.lit("mean_value").alias("exp"),
            (F.col("user_id") % 3).cast("string").alias("arm"),
            F.col("value"),
        ),
        "exp", "arm", "value",
    ).show()

    # periodicity triage: does an alarmed user's series self-correlate
    # (daily cycle / stuck sensor) rather than drift?
    from meshinsights_data_pipeline_spark.operators.trend import (
        autocorrelation,
    )

    print("Lag-1..3 autocorrelation over the alarmed users:")
    autocorrelation(
        alarmed_events, "ts", ["user_id"], "value", "event_id", lags=3
    ).orderBy(F.desc(F.abs(F.col("acf")))).show(6)

    # seasonality strength: how much of each event type's value
    # variance is its hour-of-day schedule? (eta^2 near 1 = the series
    # IS its schedule; drift alarms there need seasonal baselines)
    from meshinsights_data_pipeline_spark.operators.stats import (
        correlation_ratio,
    )

    print("eta^2 of value vs hour-of-day, per event type:")
    correlation_ratio(
        ev.select("event_type", F.hour("ts").alias("hod"), "value"),
        ["event_type"], "hod", "value",
    ).orderBy(F.desc("eta2")).show(5)
    spark.stop()


if __name__ == "__main__":
    main()
