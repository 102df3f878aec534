"""Salted aggregation equivalence + bucketed join shuffle-elimination."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from meshinsights_data_pipeline_spark.operators.skew import (
    explain_has_exchange,
    salted_agg,
    write_bucketed,
)
from meshinsights_data_pipeline_spark.session import read_table

SF_DIR = "/root/testdata/sf0.001"


def test_salted_agg_matches_plain_groupby(spark):
    ev = read_table(spark, SF_DIR, "events")
    plain = {
        (r["event_type"],): (r["cnt"], r["total"], r["lo"], r["hi"])
        for r in ev.groupBy("event_type")
        .agg(
            F.count("value").alias("cnt"),
            F.sum("value").alias("total"),
            F.min("value").alias("lo"),
            F.max("value").alias("hi"),
        )
        .collect()
    }
    salted = {
        (r["event_type"],): (r["cnt"], r["total"], r["lo"], r["hi"])
        for r in salted_agg(
            ev,
            ["event_type"],
            {
                "cnt": ("count", "value"),
                "total": ("sum", "value"),
                "lo": ("min", "value"),
                "hi": ("max", "value"),
            },
        ).collect()
    }
    assert set(plain) == set(salted)
    for k in plain:
        pc, pt, pl, ph = plain[k]
        sc, st, sl, sh = salted[k]
        assert pc == sc and pl == sl and ph == sh
        assert pt == pytest.approx(st, rel=1e-9)  # double sum order differs


def test_salted_agg_rejects_nondecomposable(spark):
    ev = read_table(spark, SF_DIR, "events")
    with pytest.raises(ValueError, match="non-decomposable"):
        salted_agg(ev, ["event_type"], {"m": ("median", "value")})


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    import shutil

    # drop catalog entries AND their managed locations from any earlier run
    for t in ("b_orders", "b_lineitem"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"spark-warehouse/{t}", ignore_errors=True)
    orders = read_table(spark, SF_DIR, "orders")
    lineitem = read_table(spark, SF_DIR, "lineitem").withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )
    write_bucketed(orders, "b_orders", ["o_orderkey"], num_buckets=8,
                   sort_cols=["o_orderkey"])
    write_bucketed(lineitem, "b_lineitem", ["o_orderkey"], num_buckets=8,
                   sort_cols=["o_orderkey"])
    # Force a sort-merge join (at sf0.001 the planner would broadcast and
    # skip bucketing entirely — at 100 TB neither side broadcasts, which is
    # exactly the regime bucketing exists for).
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = (
            spark.table("b_orders")
            .join(spark.table("b_lineitem"), "o_orderkey")
            .select("o_orderkey", "o_totalprice", "l_extendedprice")
        )
        # bucket-local sort-merge join: no Exchange anywhere in the plan
        assert not explain_has_exchange(joined)
        assert joined.count() == spark.table("b_lineitem").count()

        # control: the same join on plain parquet DOES shuffle
        plain = orders.join(
            read_table(spark, SF_DIR, "lineitem").withColumnRenamed(
                "l_orderkey", "o_orderkey"
            ),
            "o_orderkey",
        )
        assert explain_has_exchange(plain)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_approx_tier_close_to_exact(spark):
    """100 TB tier sketches: bounded error vs the exact aggregates."""
    from meshinsights_data_pipeline_spark.operators.stats import (
        approx_distinct_count,
        approx_quantiles,
        distinct_count,
    )

    ev = read_table(spark, SF_DIR, "events")
    exact = {r["event_type"]: r["n_distinct"]
             for r in distinct_count(ev, ["event_type"], "user_id").collect()}
    approx = {r["event_type"]: r["n_distinct_approx"]
              for r in approx_distinct_count(ev, ["event_type"], "user_id", rsd=0.05).collect()}
    for k, v in exact.items():
        assert abs(approx[k] - v) <= max(3, 0.15 * v)

    qa = {r["event_type"]: r["quantiles_approx"]
          for r in approx_quantiles(ev, ["event_type"], "value").collect()}
    med = {r["event_type"]: r["med"]
           for r in ev.groupBy("event_type").agg(F.median("value").alias("med")).collect()}
    for k, (q25, q50, q75) in qa.items():
        assert q25 <= q50 <= q75
        assert abs(q50 - med[k]) <= max(1.0, 0.1 * abs(med[k]))
