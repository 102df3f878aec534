"""Streaming exact deduplication — the streaming twin of
operators.dedup.exact_dedup for continuous ingest pipelines.

Design notes (100 TB / unbounded):
- ``dropDuplicatesWithinWatermark`` keys state on the normalized-text
  fingerprint only; a duplicate arriving within the watermark horizon of
  its first sighting is dropped, and fingerprint state is evicted once the
  watermark passes — so state size tracks the ingest window, not corpus
  history. That is the only sound contract on an unbounded stream: exact
  forever-dedup would need unbounded state (do periodic batch exact_dedup
  compaction over the sink for the long tail).
- Emission is immediate (dedup is not a windowed aggregate): first-seen
  rows flow through in append mode with no watermark-close latency.
- Semantic delta vs batch (documented, by design): the batch op keeps the
  MIN id per fingerprint; the streaming op keeps the FIRST ARRIVAL. The
  surviving fingerprint SET is identical — parity tests compare that.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from meshinsights_data_pipeline_spark.operators.text import fingerprint


def streaming_exact_dedup(
    stream: DataFrame,
    id_col: str,
    text_col: str,
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Keep the first-arriving row per normalized-text fingerprint within
    the watermark horizon. Returns [id, ts, fp]."""
    fp = stream.select(id_col, ts_col, fingerprint(text_col).alias("fp"))
    return fp.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(["fp"])
