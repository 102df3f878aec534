"""Standalone measurement of the two streaming bench extras, with
EXACTLY bench.py's cost model (fresh checkpoint per run, min-of-2),
in a fresh session — used to establish min-of-N expectation provenance
(VERDICT r15 #3: a single fast run must not set an expectation).

Usage: python examples/measure_stream_extras.py
Prints one JSON line {"streaming_exact_dedup_e2e": s, "streaming_stat_ingest_e2e": s}.
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    from pyspark.sql import functions as F

    from meshinsights_data_pipeline_spark.session import get_spark, read_table
    from meshinsights_data_pipeline_spark.sources.layout import (
        snapshot_overwrite,
    )
    from meshinsights_data_pipeline_spark.streaming import (
        streaming_entropy_ingest,
        streaming_exact_dedup,
        streaming_jsd_ingest,
        streaming_mann_whitney_ingest,
    )
    from meshinsights_data_pipeline_spark.streaming.abtest import (
        streaming_sprt_ingest,
    )
    from meshinsights_data_pipeline_spark.streaming.mleval import (
        streaming_auc_ingest,
        streaming_bootstrap_ingest,
        streaming_calibration_ingest,
    )

    spark = get_spark("measure-stream-extras")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    out: dict[str, float] = {}

    # --- streaming_exact_dedup_e2e (bench.py's leg, verbatim) ---
    stage_dir = tempfile.mkdtemp(prefix="bench_stream_")
    try:
        docs = read_table(spark, sf_dir, "documents").withColumn(
            "ts",
            F.expr(
                "timestamp'2024-01-01 00:00:00' + "
                "make_interval(0,0,0,0,0,0,doc_id)"
            ),
        )
        src = f"{stage_dir}/src"
        docs.write.parquet(src)
        runs = []
        for attempt in range(2):
            t0 = time.perf_counter()
            stream = spark.readStream.schema(
                spark.read.parquet(src).schema
            ).parquet(src)
            sdd = streaming_exact_dedup(stream, "doc_id", "text", ts_col="ts")
            q = (
                sdd.writeStream.outputMode("append")
                .format("noop")
                .option("checkpointLocation", f"{stage_dir}/ckpt{attempt}")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(300)
            runs.append(round(time.perf_counter() - t0, 3))
        out["streaming_exact_dedup_e2e"] = min(runs)
    finally:
        shutil.rmtree(stage_dir, ignore_errors=True)

    # --- streaming_stat_ingest_e2e (bench.py's r16 7-twin leg) ---
    stage_dir = tempfile.mkdtemp(prefix="bench_statstream_")
    try:
        docs = read_table(spark, sf_dir, "documents")
        ev = read_table(spark, sf_dir, "events").select(
            F.col("event_type").alias("experiment"),
            F.when(F.col("user_id") % 2 == 0, "control")
            .otherwise("t1").alias("arm"),
            F.col("value"),
            F.col("event_id"),
            (F.col("user_id") % 2 == 0).alias("label"),
            (F.col("value").cast("double") / F.lit(100.0)).alias("score"),
            (F.col("user_id") % 3 == 0).alias("converted"),
        )
        dsrc, esrc = f"{stage_dir}/docs", f"{stage_dir}/events"
        docs.write.parquet(dsrc)
        ev.write.parquet(esrc)
        runs = []
        for attempt in range(2):
            root = f"{stage_dir}/run{attempt}"
            t0 = time.perf_counter()
            for d in ("jsd_state", "ent_state"):
                snapshot_overwrite(
                    spark.createDataFrame(
                        [], "source string, _tok long, _c long"
                    ),
                    f"{root}/{d}", -1,
                )
            snapshot_overwrite(
                spark.createDataFrame(
                    [], "experiment string, arm string, _v double, _c long"
                ),
                f"{root}/mw_state", -1,
            )
            snapshot_overwrite(
                spark.createDataFrame(
                    [], "experiment string, _v double, _pos long, _neg long"
                ),
                f"{root}/auc_state", -1,
            )
            snapshot_overwrite(
                spark.createDataFrame(
                    [],
                    "experiment string, _b int, _n long, _np long,"
                    " _ssum decimal(38,12), _rsum decimal(38,12)",
                ),
                f"{root}/cal_state", -1,
            )
            snapshot_overwrite(
                spark.createDataFrame(
                    [],
                    "experiment string, _b int, _s decimal(38,12),"
                    " _n_w long, _rows long",
                ),
                f"{root}/bs_state", -1,
            )
            snapshot_overwrite(
                spark.createDataFrame(
                    [], "experiment string, arm string, n long, x long"
                ),
                f"{root}/sprt_state", -1,
            )
            jsd_proc = streaming_jsd_ingest(
                docs, counts_dir=f"{root}/jsd_state",
                report_dir=f"{root}/jsd_report",
            )
            ent_proc = streaming_entropy_ingest(
                docs, counts_dir=f"{root}/ent_state",
                report_dir=f"{root}/ent_report",
            )

            def _doc_batch(batch_df, epoch_id):
                jsd_proc(batch_df, epoch_id)
                ent_proc(batch_df, epoch_id)

            qd = (
                spark.readStream.schema(spark.read.parquet(dsrc).schema)
                .parquet(dsrc)
                .writeStream.foreachBatch(_doc_batch)
                .option("checkpointLocation", f"{root}/ckpt_docs")
                .trigger(availableNow=True)
                .start()
            )
            qd.awaitTermination(300)
            mw_proc = streaming_mann_whitney_ingest(
                ev, cells_dir=f"{root}/mw_state",
                report_dir=f"{root}/mw_report",
            )
            auc_proc = streaming_auc_ingest(
                ev, "experiment", "label", "value",
                cells_dir=f"{root}/auc_state",
                report_dir=f"{root}/auc_report",
            )
            cal_proc = streaming_calibration_ingest(
                ev, "experiment", "score", "converted", bins=10,
                state_dir=f"{root}/cal_state",
                report_dir=f"{root}/cal_report",
            )
            bs_proc = streaming_bootstrap_ingest(
                ev, "experiment", "value", "event_id", b=60,
                state_dir=f"{root}/bs_state",
                report_dir=f"{root}/bs_report",
            )
            sprt_proc = streaming_sprt_ingest(
                ev, "experiment", "arm", "converted",
                p0=0.30, p1=0.36,
                cells_dir=f"{root}/sprt_state",
                report_dir=f"{root}/sprt_report",
            )

            def _event_batch(batch_df, epoch_id):
                mw_proc(batch_df, epoch_id)
                auc_proc(batch_df, epoch_id)
                cal_proc(batch_df, epoch_id)
                bs_proc(batch_df, epoch_id)
                sprt_proc(batch_df, epoch_id)

            qe = (
                spark.readStream.schema(spark.read.parquet(esrc).schema)
                .parquet(esrc)
                .writeStream.foreachBatch(_event_batch)
                .option("checkpointLocation", f"{root}/ckpt_events")
                .trigger(availableNow=True)
                .start()
            )
            qe.awaitTermination(300)
            runs.append(round(time.perf_counter() - t0, 3))
        out["streaming_stat_ingest_e2e"] = min(runs)
    finally:
        shutil.rmtree(stage_dir, ignore_errors=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
