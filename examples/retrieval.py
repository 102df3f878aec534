"""BM25 retrieval — rank the corpus for a query bag, then flag the top
matches against an eval-set query as contamination suspects:

    documents
      -> BM25 top-k search            (text.bm25_topk: ratio-idf,
                                       map-side doc lengths, only
                                       query-term tokens shuffle)
      -> retrieval decontamination    (same scorer, terms drawn from a
                                       benchmark doc; hits above a
                                       score floor are suspects)

This is the search-based complement to the shingle (x25), bloom (x29)
and embedding (x56) decontamination paths: instead of exact n-gram or
vector overlap, it asks "would a BM25 search for the benchmark text
surface this training doc?" — the recipe used to audit pretraining
corpora for eval leakage. Everything heavy is one tokenize scan; the
df / N / avgdl statistics are broadcast one-row frames and the global
top-k is the distributed offset rank (no single-partition window).

Run: python examples/retrieval.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from meshinsights_data_pipeline_spark.operators.text import (  # noqa: E402
    bm25_topk,
    normalized_text,
)
from meshinsights_data_pipeline_spark.session import (  # noqa: E402
    get_spark,
    read_table,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("retrieval-example")

    docs = read_table(spark, sf_dir, "documents")

    # 1. Ad-hoc search: one rare term + two common ones.
    hits = bm25_topk(docs, "doc_id", "text", ["dup", "vector", "scan"], top_k=10)
    print("BM25 top-10 for {dup, vector, scan}:")
    for r in hits.collect():
        print(f"  rk={r.rk:>2}  doc={r.doc_id:>6}  score={r.score:>10.6f}  "
              f"terms={r.n_terms}")

    # 2. Retrieval decontamination: treat the lowest-id doc as the
    # benchmark item, use its distinct tokens as the query bag, and flag
    # training docs a BM25 search would surface. The query bag is tiny
    # (vocabulary of one doc), so it ships as literals exactly like the
    # ad-hoc case; the benchmark doc itself always ranks first — drop it.
    bench_id, bench_text = (
        docs.orderBy("doc_id").select("doc_id", "text").first()
    )
    terms_row = (
        spark.createDataFrame([(bench_text,)], "t string")
        .select(
            F.array_distinct(
                F.filter(
                    F.split(normalized_text(F.col("t")), " "),
                    lambda x: x != "",
                )
            ).alias("terms")
        )
        .first()
    )
    suspects = (
        bm25_topk(docs, "doc_id", "text", list(terms_row.terms), top_k=6)
        .filter(F.col("doc_id") != bench_id)
    )
    print(f"\ntraining docs a search for benchmark doc {bench_id} surfaces:")
    for r in suspects.collect():
        print(f"  rk={r.rk:>2}  doc={r.doc_id:>6}  score={r.score:>10.6f}")
    spark.stop()


if __name__ == "__main__":
    main()
