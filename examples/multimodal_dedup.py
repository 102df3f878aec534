"""Multimodal table maintenance — probe, dedup, and stream binary media
without ever decoding a payload:

    media table (opaque binary payloads)
      -> payload metadata              (multimodal.attach_payload_metadata:
                                        byte length + content hash, JVM-side)
      -> exact dedup                   (group on the content hash)
      -> near-dup pairs                (multimodal.payload_neardup_pairs:
                                        byte-shingle MinHash LSH ->
                                        verified Jaccard on candidates)
      -> streaming ingest twin         (streaming_payload_lsh_ingest:
                                        new media vs the accumulated
                                        signature table, exactly-once)

Exact dups (same bytes) collapse on the md5; container-level near-dups
(same content, trailing metadata differences, appended fragments) fall
out of the byte-shingle LSH. Re-encoded/resized variants need the decode
tier (multimodal.decode_image_dims and friends) — a different, much more
expensive pass; run this one first.

Run: python examples/multimodal_dedup.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from meshinsights_data_pipeline_spark.operators.dedup import (  # noqa: E402
    banded_signatures,
)
from meshinsights_data_pipeline_spark.operators.multimodal import (  # noqa: E402
    attach_payload_metadata,
    payload_neardup_pairs,
    payload_shingle_hashes,
)
from meshinsights_data_pipeline_spark.session import (  # noqa: E402
    get_spark,
    read_table,
)
from meshinsights_data_pipeline_spark.sources.layout import (  # noqa: E402
    idempotent_epoch_append,
)
from meshinsights_data_pipeline_spark.streaming import (  # noqa: E402
    streaming_payload_lsh_ingest,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("multimodal-dedup-example")

    docs = read_table(spark, sf_dir, "documents")
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("modality"),
        F.encode("text", "UTF-8").alias("payload"),
    )

    # 1. Metadata + exact dedup on the content hash.
    meta = attach_payload_metadata(media)
    exact_groups = (
        meta.groupBy("payload_hash")
        .agg(F.count(F.lit(1)).alias("copies"))
        .filter(F.col("copies") > 1)
    )
    print(f"exact-duplicate payload groups: {exact_groups.count()}")

    # 2. Near-dup pairs without decode.
    pairs = payload_neardup_pairs(media, threshold=0.5)
    print("byte-shingle near-dup pairs (top 5 by jaccard):")
    for r in pairs.orderBy(F.desc("jaccard"), "id_a").limit(5).collect():
        print(f"  {r.id_a} ~ {r.id_b}  jaccard={r.jaccard}")

    # 3. Streaming twin: seed the signature table with even ids, stream
    # the odd ids as one batch, collect cross/intra pairs.
    seed = media.filter(F.col("media_id") % 2 == 0)
    arriving = media.filter(F.col("media_id") % 2 == 1)
    with tempfile.TemporaryDirectory() as tmp:
        sig_dir, pairs_dir = f"{tmp}/sigs", f"{tmp}/pairs"
        idempotent_epoch_append(
            banded_signatures(
                seed, "media_id", "payload",
                shingles=payload_shingle_hashes(seed),
            ),
            sig_dir,
            -1,
        )
        process = streaming_payload_lsh_ingest(
            arriving, signature_dir=sig_dir, pairs_dir=pairs_dir
        )
        process(arriving, 0)  # one micro-batch, batch-mode invocation
        n = spark.read.parquet(pairs_dir).count()
        print(f"streaming ingest found {n} candidate pairs involving new media")
    spark.stop()


if __name__ == "__main__":
    main()
