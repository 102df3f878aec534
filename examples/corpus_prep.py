"""End-to-end training-corpus preparation — composed as a Pipeline of
Processors (analytics/corpus_pipeline.py), so the flow gets the full
composability contract: per-step validation, timing, error policy,
conditions, checkpoints, run_partial.

    raw documents
      -> Gopher quality gate          (map-side, codegen)
      -> LM perplexity band           (CCNet-style bigram LM, optional)
      -> per-source quality band      (exact quantile threshold, optional)
      -> URL-level dedup              (canonicalize + min-id survivor)
      -> exact dedup                  (md5 fingerprint, one shuffle)
      -> near-dup cluster collapse    (MinHash-LSH -> verified Jaccard
                                       -> connected components)
      -> benchmark decontamination    (broadcast shingle probe)
      -> PII redaction                (chained regexp, map-side)
      -> per-source quota             (salted two-phase top-n)
      -> fixed-token chunking         (narrow, shuffle-free)

Every step composes lazy DataFrame plans, so Catalyst still sees across
stage boundaries; at 100 TB the only wide stages are the dedup shuffles
and the quota window. The per-stage row counts printed below come from
the ``corpus.count_rows`` config flag — a per-step action for small
runs/debugging, off by default at scale.

Run: python examples/corpus_prep.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

# repo-root import shim (the package is not pip-installed)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from meshinsights_data_pipeline_spark.analytics.corpus_pipeline import (
    BENCHMARK_KEY,
    CorpusColumns,
    build_corpus_pipeline,
)
from meshinsights_data_pipeline_spark.core.context import PipelineContext
from meshinsights_data_pipeline_spark.session import get_spark, read_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("corpus-prep-example")

    # Synthetic URL from source (as in x27 — a real pipeline has a url
    # column from the crawl), so the UrlDedupStep condition activates.
    docs = read_table(spark, sf_dir, "documents").withColumn(
        "url",
        F.concat(
            F.lit("https://"), F.col("source"), F.lit(".example.com/d/"),
            F.col("doc_id").cast("string"),
        ),
    )
    bench = read_table(spark, sf_dir, "documents").filter(F.col("source") == "src0")

    ctx = PipelineContext(
        pipeline_name="corpus_prep",
        correlation_id="example",
        raw_data=docs,
        config={"corpus.count_rows": True},
    )
    ctx.processed_data[BENCHMARK_KEY] = bench

    pipe = build_corpus_pipeline(
        CorpusColumns(url="url"),
        contamination_threshold=0.8,
        quota_n=10,
        quota_salt_buckets=4,
        chunk_tokens=64,
        span_excise_n=5,  # ExactSubstr span cut between dedup and decontam
        lm_ppl_band=(0.0, 1e6),   # CCNet band: reject nothing here, but
                                  # the per-doc scores land in
                                  # processed_data["corpus.lm_scores"]
        quality_keep_frac=0.9,    # keep each source's top 90% band
        url_blocklist=["src19.example.com"],  # UT1-style domain filter
        lexical_report=True,      # per-source TTR / Zipf-slope report
    )
    n0 = docs.count()
    ctx = pipe.run(ctx)

    print(f"raw documents        : {n0}")
    for step, meta in ctx.stages.items():
        print(f"{step:<32}: {meta['rows']}")
    print(f"training chunks      : {ctx.processed_data['corpus.chunks'].count()}")
    print("per-source report card:")
    for r in ctx.processed_data["corpus.report"].orderBy("source").collect():
        print(f"  {r.source}: docs={r.n_docs} tokens={r.total_tokens} "
              f"quality={r.mean_quality} dup_frac={round(r.dup_frac, 3)}")
    print("lexical diversity (flattest Zipf head first):")
    for r in (
        ctx.processed_data["corpus.lexical_diversity"]
        .orderBy(F.desc("zipf_slope")).limit(3).collect()
    ):
        print(f"  {r.source}: vocab={r.vocab} ttr={r.ttr} "
              f"zipf_slope={r.zipf_slope}")
    for entry in ctx.execution_log:
        status = "skipped" if entry.get("skipped") else entry.get("status")
        t = entry.get("execution_time")
        print(f"  [{status:>8}] {entry['processor']}"
              + (f" ({t:.2f}s)" if t is not None else ""))
    spark.stop()


if __name__ == "__main__":
    main()
