"""global_rank operator: exact parity with row_number/ntile semantics,
verified against the single-partition window forms on small frames (the
operator exists precisely so production plans never run those forms)."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from meshinsights_data_pipeline_spark.operators.global_rank import (
    equal_depth_tile,
    grouped_row_number,
    with_global_row_number,
)


def _frame(spark, n, seed=7):
    # deliberately collides on `v` so the tiebreaker column matters
    return spark.range(n).select(
        F.col("id"),
        (F.hash(F.col("id") + seed) % 13).alias("v"),
    )


def test_global_row_number_matches_window(spark):
    df = _frame(spark, 500)
    got = with_global_row_number(df, ["v", "id"], out_col="rn", num_partitions=7)
    w = Window.orderBy("v", "id")
    want = df.select("id", F.row_number().over(w).alias("rn"))
    diff = (
        got.select("id", "rn")
        .join(want.withColumnRenamed("rn", "rn2"), "id")
        .filter(F.col("rn") != F.col("rn2"))
        .count()
    )
    assert diff == 0


def test_global_row_number_total_col(spark):
    df = _frame(spark, 123)
    out = with_global_row_number(
        df, ["v", "id"], out_col="rn", total_col="n_total", num_partitions=5
    )
    rows = out.select("n_total").distinct().collect()
    assert [r.n_total for r in rows] == [123]


@pytest.mark.parametrize(
    ("n", "k"),
    [(100, 10), (101, 10), (109, 10), (7, 10), (1, 3), (50, 7), (64, 1)],
)
def test_equal_depth_tile_is_exact_ntile(spark, n, k):
    df = _frame(spark, n)
    got = equal_depth_tile(df, ["v", "id"], k, out_col="t", num_partitions=4)
    w = Window.orderBy("v", "id")
    want = df.select("id", F.ntile(k).over(w).alias("t2"))
    diff = (
        got.select("id", "t")
        .join(want, "id")
        .filter(F.col("t") != F.col("t2"))
        .count()
    )
    assert diff == 0


def test_equal_depth_tile_rejects_bad_k(spark):
    with pytest.raises(ValueError):
        equal_depth_tile(_frame(spark, 10), ["v", "id"], 0)


def test_grouped_row_number_matches_window(spark):
    from pyspark.sql import Window

    df = spark.range(400).select(
        F.col("id"),
        (F.col("id") % 3).alias("g"),
        (F.hash(F.col("id") + 1) % 11).alias("v"),
    )
    # plus a degenerate one-row group
    df = df.unionByName(
        spark.createDataFrame([(9999, 77, 5)], "id long, g long, v int")
    )
    got = grouped_row_number(
        df, ["g"], ["v", "id"], out_col="rn", num_partitions=6,
        total_col="n",
    )
    w = Window.partitionBy("g").orderBy("v", "id")
    want = df.select(
        "id",
        F.row_number().over(w).alias("rn2"),
        F.count(F.lit(1)).over(
            Window.partitionBy("g").rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("n2"),
    )
    diff = (
        got.join(want, "id")
        .filter((F.col("rn") != F.col("rn2")) | (F.col("n") != F.col("n2")))
        .count()
    )
    assert diff == 0


def test_ranked_percentiles_match_exact_aggregate(spark):
    from meshinsights_data_pipeline_spark.operators.global_rank import (
        ranked_percentiles,
    )

    df = spark.range(1000).select(
        (F.hash("id") % 997).cast("double").alias("v")
    )
    probs = [0.0, 0.25, 0.5, 0.95, 1.0]
    got = ranked_percentiles(df, "v", probs, num_partitions=5).first()
    want = df.agg(
        F.percentile("v", F.array(*[F.lit(p) for p in probs])).alias("q")
    ).first().q
    for i, w in enumerate(want):
        assert abs(got[f"p{i}"] - w) < 1e-9, (i, got, want)


def test_ranked_percentiles_nulls_and_empty(spark):
    from meshinsights_data_pipeline_spark.operators.global_rank import (
        ranked_percentiles,
    )

    df = spark.createDataFrame(
        [(1.0,), (None,), (3.0,), (None,), (2.0,)], "v double"
    )
    got = ranked_percentiles(df, "v", [0.5]).first()
    assert got.p0 == 2.0  # nulls ignored, exact median of {1,2,3}
    empty = spark.createDataFrame([], "v double")
    assert ranked_percentiles(empty, "v", [0.5]).first().p0 is None


def test_grouped_ranked_percentiles_match_grouped_aggregate(spark):
    from meshinsights_data_pipeline_spark.operators.global_rank import (
        grouped_ranked_percentiles,
    )

    df = spark.range(600).select(
        (F.col("id") % 4).alias("g"),
        F.when(F.col("id") % 37 == 0, None)
        .otherwise((F.hash("id") % 503).cast("double"))
        .alias("v"),
    )
    probs = [0.1, 0.5, 0.9]
    got = {
        r.g: (r.p0, r.p1, r.p2)
        for r in grouped_ranked_percentiles(
            df, ["g"], "v", probs, num_partitions=5
        ).collect()
    }
    want = {
        r.g: tuple(r.q)
        for r in df.groupBy("g")
        .agg(F.percentile("v", F.array(*[F.lit(p) for p in probs])).alias("q"))
        .collect()
    }
    assert set(got) == set(want)
    for g in want:
        for a, b in zip(got[g], want[g]):
            assert abs(a - b) < 1e-9, (g, got[g], want[g])


def test_global_topk_matches_window(spark):
    from meshinsights_data_pipeline_spark.operators.global_rank import (
        global_topk,
    )

    df = _frame(spark, 500)  # collides on v -> id tiebreak matters
    got = {
        (r.id, r.rk)
        for r in global_topk(
            df, [F.col("v").asc(), F.col("id").asc()], 37, salt_col=F.col("id")
        ).collect()
    }
    w = Window.orderBy(F.col("v").asc(), F.col("id").asc())
    want = {
        (r.id, r.rk)
        for r in df.select("id", F.row_number().over(w).alias("rk"))
        .filter(F.col("rk") <= 37)
        .collect()
    }
    assert got == want
    # k larger than the frame: every row survives, ranks dense 1..N
    all_rk = sorted(
        r.rk
        for r in global_topk(
            df, [F.col("v").asc(), F.col("id").asc()], 10_000,
            salt_col=F.col("id"),
        ).collect()
    )
    assert all_rk == list(range(1, 501))
    with pytest.raises(ValueError):
        global_topk(df, ["v"], 0, salt_col=F.col("id"))
