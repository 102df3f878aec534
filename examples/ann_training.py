"""Train the coarse-quantizer codebook, then search with it — the full
ANN lifecycle on one page:

    seed centroids (lowest-id vectors)
      -> Lloyd to convergence          (similarity.kmeans_fit:
                                        cosine assign -> per-dim mean,
                                        stop on max centroid shift)
      -> IVF inverted-list search      (similarity.ivf_topk, nprobe=4)
      -> recall vs exact cosine top-k  (similarity.cosine_topk)

Each Lloyd round is one corpus scan + a |centroids| x dim aggregate —
the codebook is a broadcast dim table on both ends, so the loop costs
rounds x one-pass, never corpus^2. The SAME trained centroids feed
ivf_topk, semantic_dedup_pairs, and (as codebook seeds) the PQ path.

Run: python examples/ann_training.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from meshinsights_data_pipeline_spark.operators.similarity import (  # noqa: E402
    cosine_topk,
    ivf_topk,
    ivf_topk_indexed,
    kmeans_fit,
    write_ivf_index,
)
from meshinsights_data_pipeline_spark.session import get_spark, read_table  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("ann-training")

    emb = read_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    queries = emb.filter(F.col("vec_id") < 5)

    # Deterministic lowest-id init, per-round checkpoints and the
    # convergence check all live inside kmeans_fit.
    centroids = kmeans_fit(emb, k=16, max_iter=5)
    print(f"kmeans_fit trained {centroids.count()} centroids")

    k = 10
    exact = {
        (r.query_id, r.neighbor_id)
        for r in cosine_topk(emb, queries, k=k).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in ivf_topk(emb, queries, centroids, k=k, nprobe=4).collect()
    }
    recall = len(exact & approx) / len(exact)
    print(f"IVF nprobe=4 recall@{k} with trained centroids: {recall:.2f}")

    # Persist the index (one directory per inverted list) and search it —
    # the scan opens only the probed list directories (partition pruning).
    import shutil
    import tempfile

    idx = tempfile.mkdtemp(prefix="ivf_idx_")
    write_ivf_index(emb, centroids, idx)
    from_disk = {
        (r.query_id, r.neighbor_id)
        for r in ivf_topk_indexed(spark, idx, queries, centroids, k=k, nprobe=4).collect()
    }
    print(f"persisted-index search matches in-memory: {from_disk == approx}")
    shutil.rmtree(idx, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
