"""G4 batch-LLM-over-rows tests (mapInPandas, injected transport)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from meshinsights_data_pipeline_spark.genai.batch import llm_map
from meshinsights_data_pipeline_spark.session import read_table

SF_DIR = "/root/testdata/sf0.001"


def test_llm_map_adds_completions(spark):
    docs = read_table(spark, SF_DIR, "documents").limit(50)

    def stub(prompts):
        return [f"summary:{len(p)}" for p in prompts]

    out = llm_map(docs, "text", stub, out_col="summary", max_batch_size=16)
    rows = out.select("doc_id", "text", "summary").collect()
    assert len(rows) == 50
    for r in rows:
        assert r["summary"] == f"summary:{len(r['text'] or '')}"
    # original columns preserved
    assert set(out.columns) == set(docs.columns) | {"summary"}


def test_llm_map_batches_respect_max_size(spark):
    docs = read_table(spark, SF_DIR, "documents").limit(40).coalesce(1)
    sizes = []

    def stub(prompts):
        sizes.append(len(prompts))
        return ["x"] * len(prompts)

    # NOTE: the closure list only observes sizes in local mode single-worker
    # runs via the driver-side plan build; assert via a counting column
    # instead (robust to worker processes): completions are positionally
    # correct even when chunked.
    out = llm_map(docs, "text", lambda p: [str(len(t or "")) for t in p],
                  out_col="n", max_batch_size=7)
    rows = out.withColumn("expected", F.length(F.coalesce("text", F.lit(""))).cast("string"))
    bad = rows.filter(F.col("n") != F.col("expected")).count()
    assert bad == 0


def test_llm_map_transport_arity_error(spark):
    docs = read_table(spark, SF_DIR, "documents").limit(5)
    out = llm_map(docs, "text", lambda p: ["only one"], out_col="c")
    with pytest.raises(Exception, match="completions"):
        out.collect()
