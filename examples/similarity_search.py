"""ANN strategy comparison on the embeddings table: exact brute-force
cosine vs RP-LSH buckets vs IVF inverted lists, with recall@k measured
against the exact result — the decision data for choosing a scale path.

- cosine_topk: exact, corpus never shuffles (queries broadcast). The
  baseline and the small-corpus answer.
- rp_lsh_topk: multi-table random-hyperplane LSH — bucket-colliding
  candidates only; recall tunable via tables/bits.
- ivf_topk: centroid-partitioned inverted lists probed nprobe-deep —
  the write-time partition-pruning layout for big corpora.

Run: python examples/similarity_search.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from meshinsights_data_pipeline_spark.operators.similarity import (
    cosine_topk,
    ivf_topk,
    pq_topk,
    rp_lsh_topk,
)
from meshinsights_data_pipeline_spark.session import get_spark, read_table

K = 10


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("similarity-search-example")
    emb = read_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    queries = emb.filter(F.col("vec_id") < 5)
    centroids = emb.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("centroid_id"),
        F.col("embedding").alias("centroid_vec"),
    )

    def run(name, fn):
        t0 = time.perf_counter()
        rows = fn().collect()
        dt = time.perf_counter() - t0
        by_q = {}
        for r in rows:
            by_q.setdefault(r.query_id, set()).add(r.neighbor_id)
        return name, dt, by_q

    exact = run("exact cosine", lambda: cosine_topk(emb, queries, k=K))
    lsh = run("rp-lsh 4-bit", lambda: rp_lsh_topk(emb, queries, k=K, bits=4))
    ivf = run("ivf nprobe=4", lambda: ivf_topk(emb, queries, centroids, k=K, nprobe=4))
    pq = run("pq m=8 adc", lambda: pq_topk(emb, queries, k=K))

    # PCA front-end: project to the top-16 components and search there
    # — the dimensionality-reduction path for the same exact machinery
    # (recall measures how much the 64->16 cut loses on THIS corpus).
    from meshinsights_data_pipeline_spark.operators.similarity import (
        pca_components,
        pca_project,
    )

    comps, _, means = pca_components(emb, "vec_id", "embedding", k=16)
    red = pca_project(
        emb, "vec_id", "embedding", comps, means=means, out_col="embedding"
    )
    red_q = red.filter(F.col("vec_id") < 5)
    pca = run("pca-16 exact", lambda: cosine_topk(red, red_q, k=K))

    truth = exact[2]
    print(f"{'strategy':<14} {'time':>7} {'recall@%d' % K:>10}")
    for name, dt, by_q in (exact, lsh, ivf, pq, pca):
        hits = sum(len(by_q.get(q, set()) & t) for q, t in truth.items())
        total = sum(len(t) for t in truth.values())
        print(f"{name:<14} {dt:6.2f}s {hits / total:10.2%}")
    spark.stop()


if __name__ == "__main__":
    main()
