"""Incremental Benford conformance monitoring — the streaming twin of
``operators.dq.benford_deviation``.

The per-(group, first-digit) count table (at most 9 rows per group) is
a mergeable sufficient statistic: digit counts sum across micro-batches
and the chi-square/max-deviation report is recomputed from the merged
table — after any batch the report equals the batch operator over
everything ingested so far (FULL cross-batch parity, the
KS/KM/PMI/drift-twin shape; tested). The per-epoch reports form the
feed-integrity time series: a scraper that starts truncating or
synthesizing amounts bends the digit distribution epoch over epoch.

State is TINY by construction — 9 rows per group — so this is the
cheapest twin in the family: the merge shuffle carries at most
9 x |groups| rows regardless of batch size. snapshot_before(epoch)
reads keep retries idempotent; report appends are exactly-once per
epoch by default.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_benford_ingest(
    stream: DataFrame,
    group_col: str = "source",
    value_col: str = "value",
    *,
    counts_dir: str,
    report_dir: str,
    idempotent: bool = True,
):
    """foreachBatch callable: merge batch (group, digit) counts into the
    Benford state, recompute the conformance report from the merged
    counts, append it with the epoch id.

    Seed the state dir with ``snapshot_overwrite(empty, counts_dir, -1)``
    (schema ``g string, _d int, _c long``). Report rows are
    ``[epoch, g, n, chi2, max_dev]``.
    """
    from meshinsights_data_pipeline_spark.operators.dq import (
        benford_digit_counts,
        benford_from_counts,
    )
    from meshinsights_data_pipeline_spark.sources.layout import (
        snapshot_before,
        snapshot_overwrite,
    )

    def _process(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        # the batch operator's own digit stage — shared so the twin's
        # domain guards (NULL group, |v| >= 1e12 ANSI overflow) can
        # never drift from batch semantics
        batch_counts = benford_digit_counts(batch_df, group_col, value_col)
        prev = snapshot_before(spark, counts_dir, epoch_id).select(
            "g", "_d", "_c"
        )
        merged = (
            prev.union(batch_counts)
            .groupBy("g", "_d")
            .agg(F.sum("_c").cast("bigint").alias("_c"))
            .localCheckpoint()  # consumed by the report AND the snapshot
            # write; must not read a plan referencing its own output dir
        )
        snapshot_overwrite(merged, counts_dir, version=epoch_id)

        report = benford_from_counts(merged).withColumn(
            "epoch", F.lit(int(epoch_id)).cast("bigint")
        )
        if idempotent:
            from meshinsights_data_pipeline_spark.sources.layout import (
                idempotent_epoch_append,
            )

            idempotent_epoch_append(report, report_dir, epoch_id)
        else:
            report.write.mode("append").parquet(report_dir)

    return _process
