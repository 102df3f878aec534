"""Table maintenance end to end: SCD2 history, point-in-time reads, and
CDC deltas over the customer dimension — the glue layer between ingest
and analytics that keeps dimensions queryable "as of" any instant.

1. Seed an SCD2 history from the customer table (all-open versions).
2. Apply an update batch derived from orders with the batch operator
   (scd2_merge): changed customers get their open version closed and a
   new one appended; unchanged feed rows are no-ops.
3. Replay the same updates as micro-batches through the streaming twin
   (streaming_scd2_ingest — split state: open-slice snapshot +
   append-only closed log) and show the sequential fold matches,
   including after a simulated micro-batch retry.
4. Point-in-time: scd2_read(as_of=...) returns the dimension as it
   stood at an instant.
5. CDC: cdc_delta emits the insert/update/delete feed between two
   snapshots — what an incremental consumer reads instead of the table.

Run: python examples/table_maintenance.py [sf_dir]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from meshinsights_data_pipeline_spark.operators.snapshot import (
    cdc_delta,
    scd2_merge,
)
from meshinsights_data_pipeline_spark.session import get_spark, read_table
from meshinsights_data_pipeline_spark.sources.layout import snapshot_overwrite
from meshinsights_data_pipeline_spark.streaming import (
    scd2_read,
    streaming_scd2_ingest,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("example-table-maintenance", shuffle_partitions=8)

    cust = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")

    history = cust.select(
        "c_custkey",
        F.col("c_mktsegment").alias("segment"),
        F.round("c_acctbal", 2).alias("bal"),
        F.lit("1992-01-01").cast("timestamp").alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
    )
    updates = (
        orders.groupBy(F.col("o_custkey").alias("c_custkey"))
        .agg(
            F.max("o_orderdate").alias("change_ts"),
            F.round(F.sum("o_totalprice"), 2).alias("bal"),
        )
        .join(
            cust.select("c_custkey", F.col("c_mktsegment").alias("segment")),
            "c_custkey",
        )
    )

    # --- 2. batch merge -----------------------------------------------
    merged = scd2_merge(
        history, updates, keys=["c_custkey"], attrs=["segment", "bal"],
        ts_col="change_ts",
    )
    n_open = merged.where(F.col("valid_to").isNull()).count()
    n_closed = merged.where(F.col("valid_to").isNotNull()).count()
    print(f"batch scd2_merge: {n_open} open versions, {n_closed} closed")

    # --- 3. streaming twin, two micro-batches + a retry ----------------
    work = tempfile.mkdtemp(prefix="scd2_example_")
    try:
        odir, cdir = f"{work}/open", f"{work}/closed"
        snapshot_overwrite(history, odir, version=-1)
        b1 = updates.where(F.col("c_custkey") % 2 == 0)
        b2 = updates.where(F.col("c_custkey") % 2 == 1)
        process = streaming_scd2_ingest(
            b1, keys=["c_custkey"], attrs=["segment", "bal"],
            ts_col="change_ts", open_dir=odir, closed_dir=cdir,
        )
        process(b1, 0)
        process(b2, 1)
        process(b2, 1)  # a Structured Streaming retry of epoch 1
        streamed = scd2_read(spark, odir, cdir)
        assert streamed.count() == merged.count()
        print(f"streaming fold matches batch: {streamed.count()} rows "
              "(retry left state unchanged)")

        asof = scd2_read(spark, odir, cdir, as_of="1996-06-01")
        print(f"dimension as of 1996-06-01: {asof.count()} rows "
              f"({asof.where(F.col('valid_to').isNotNull()).count()} "
              "already-superseded versions visible)")
    finally:
        shutil.rmtree(work, ignore_errors=True)

    # --- 5. CDC delta between two order snapshots ----------------------
    old = orders.where(
        F.col("o_orderdate") < F.lit("1995-01-01").cast("timestamp")
    ).select("o_orderkey", "o_orderstatus", F.round("o_totalprice", 2).alias("price"))
    new = orders.where(
        (F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderkey") % 97 != 0)
    ).select("o_orderkey", "o_orderstatus", F.round("o_totalprice", 2).alias("price"))
    delta = cdc_delta(old, new, keys=["o_orderkey"])
    counts = {r["change_type"]: r["n"] for r in
              delta.groupBy("change_type").agg(F.count("*").alias("n")).collect()}
    print(f"cdc_delta: {counts}")


if __name__ == "__main__":
    main()
