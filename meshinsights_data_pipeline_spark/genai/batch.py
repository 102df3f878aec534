"""Batch LLM inference over DataFrame rows (G4 — north-star only; the
reference calls the LLM once per pipeline run, never per row. SURVEY §2.12).

Pattern: ``mapInPandas`` streams Arrow batches to Python workers; each batch
is sent to the provider in ONE batched request (or chunked by
``max_batch_size``), so the API round-trip amortizes over rows — the
standard shape for LLM labeling/scoring/extraction jobs over a corpus.

Scale notes (100 TB):
- Concurrency = number of partitions; repartition the input to the desired
  request parallelism (provider rate limits are the real ceiling, not CPU).
- The transport is injected, so retries/backoff/rate-limiting live there;
  workers stay stateless and idempotent (safe under Spark task retry).
- Never collect: results land as a column, downstream ops stay distributed.

In-sandbox there is no network; tests inject a deterministic stub transport.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame

# Batched transport: list of prompts in, list of completions out (same order).
BatchTransport = Callable[[list[str]], list[str]]


def llm_map(
    df: DataFrame,
    prompt_col: str,
    transport: BatchTransport,
    out_col: str = "completion",
    max_batch_size: int = 64,
) -> DataFrame:
    """Add ``out_col`` with the transport's completion for each row's prompt.

    The transport receives up to ``max_batch_size`` prompts per call and
    must return one completion per prompt, in order.
    """
    from pyspark.sql.types import StringType, StructField, StructType

    from meshinsights_data_pipeline_spark.session import ensure_package_on_workers

    ensure_package_on_workers(df.sparkSession)
    # Fresh StructType — StructType.add would mutate the DataFrame's CACHED
    # schema object and desynchronize df.columns from the JVM plan.
    schema = StructType(list(df.schema.fields) + [StructField(out_col, StringType())])
    field_names = [f.name for f in df.schema.fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            prompts = pdf[prompt_col].fillna("").tolist()
            outs: list[str] = []
            for i in range(0, len(prompts), max_batch_size):
                chunk = prompts[i : i + max_batch_size]
                got = transport(chunk)
                if len(got) != len(chunk):
                    raise ValueError(
                        f"transport returned {len(got)} completions for {len(chunk)} prompts"
                    )
                outs.extend(got)
            out = pdf[field_names].copy()
            out[out_col] = outs
            yield out

    return df.mapInPandas(run, schema)
