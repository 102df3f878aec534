"""Train the coarse-quantizer codebook, then search with it — the full
ANN lifecycle on one page:

    seed centroids (lowest-id vectors)
      -> 3 Lloyd rounds                (similarity.kmeans_update:
                                        cosine assign -> per-dim mean)
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
    kmeans_update,
    write_ivf_index,
)
from meshinsights_data_pipeline_spark.session import get_spark, read_table  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("ann-training")

    emb = read_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    queries = emb.filter(F.col("vec_id") < 5)

    centroids = emb.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("centroid_id"),
        F.col("embedding").alias("centroid_vec"),
    )
    for rnd in range(3):
        # localCheckpoint per round: the next round's plan would otherwise
        # nest the previous assignment window (plan doubling, same
        # rationale as connected_components).
        centroids = kmeans_update(emb, centroids).localCheckpoint()
        print(f"lloyd round {rnd + 1} done ({centroids.count()} centroids)")

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
