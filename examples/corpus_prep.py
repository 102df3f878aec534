"""End-to-end training-corpus preparation: the composed LLM-data-pipeline
flow the extension operators exist for (north-star; no reference
counterpart — SURVEY.md §2 extension inventory).

    raw documents
      -> Gopher quality gate          (map-side, codegen)
      -> URL-level dedup              (canonicalize + min-id survivor)
      -> exact dedup                  (md5 fingerprint, one shuffle)
      -> near-dup cluster collapse    (MinHash-LSH -> verified Jaccard
                                       -> connected components)
      -> benchmark decontamination    (broadcast shingle probe)
      -> per-source quota             (salted two-phase top-n)
      -> fixed-token chunking         (narrow, shuffle-free)

Every stage is a DataFrame -> DataFrame operator, so the whole flow is ONE
lazy plan per action and Catalyst sees across stage boundaries. At 100 TB
the only wide stages are the dedup shuffles and the quota window — the
quality gate, decontamination probe, and chunking all stay map-side.

Run: python examples/corpus_prep.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

# repo-root import shim (the package is not pip-installed)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from meshinsights_data_pipeline_spark.operators.components import dedup_survivors
from meshinsights_data_pipeline_spark.operators.corpus import (
    canonical_url,
    chunk_documents,
    contamination_check,
    gopher_quality,
    quota_sample,
)
from meshinsights_data_pipeline_spark.operators.dedup import (
    exact_dedup,
    minhash_dedup_pairs,
)
from meshinsights_data_pipeline_spark.session import get_spark, read_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("corpus-prep-example")
    docs = read_table(spark, sf_dir, "documents")
    n0 = docs.count()

    # 1. Quality gate (Gopher rules) — keep only docs passing every rule.
    quality = gopher_quality(docs, "doc_id", "text")
    docs = docs.join(
        quality.filter(F.col("keep")).select("doc_id"), "doc_id", "left_semi"
    )
    n1 = docs.count()

    # 2. URL-level dedup (synthetic URL from source, as in x27 — a real
    #    pipeline has a url column from the crawl).
    url = F.concat(
        F.lit("https://"), F.col("source"), F.lit(".example.com/d/"),
        F.col("doc_id").cast("string"),
    )
    urls = docs.select("doc_id", canonical_url(url).alias("url_canon"))
    url_keep = urls.groupBy("url_canon").agg(F.min("doc_id").alias("doc_id"))
    docs = docs.join(url_keep.select("doc_id"), "doc_id", "left_semi")

    # 3. Exact dedup on normalized text.
    docs = docs.join(
        exact_dedup(docs, "doc_id", "text").select("doc_id"), "doc_id", "left_semi"
    )
    n2 = docs.count()

    # 4. Near-dup collapse: LSH candidates -> verified Jaccard -> connected
    #    components -> drop every cluster member but the min-id survivor.
    pairs = minhash_dedup_pairs(docs, "doc_id", "text", threshold=0.5)
    docs = dedup_survivors(docs, pairs, "doc_id")
    n3 = docs.count()

    # 5. Decontamination vs a benchmark slice (here: the src0 docs).
    bench = read_table(spark, sf_dir, "documents").filter(F.col("source") == "src0")
    contam = contamination_check(docs, bench, "doc_id", "text", threshold=0.8)
    clean_ids = contam.filter(~F.col("contaminated")).select("doc_id")
    docs = docs.join(clean_ids, "doc_id", "left_semi")
    n4 = docs.count()

    # 6. Per-source quota (salted two-phase top-n), then fixed-token chunks.
    docs = quota_sample(docs, "source", 10, "n_chars", "doc_id", salt_buckets=4)
    chunks = chunk_documents(docs, "doc_id", "text", chunk_tokens=64)
    n5, nch = docs.count(), chunks.count()

    print(f"raw documents        : {n0}")
    print(f"after quality gate   : {n1}")
    print(f"after exact/url dedup: {n2}")
    print(f"after near-dup       : {n3}")
    print(f"after decontamination: {n4}")
    print(f"after source quota   : {n5}")
    print(f"training chunks      : {nch}")
    spark.stop()


if __name__ == "__main__":
    main()
