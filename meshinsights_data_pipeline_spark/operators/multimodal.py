"""Multimodal column plumbing: opaque binary payloads + typed metadata.

North-star extension. Image/audio/video payloads are opaque ``binary``
columns with a typed metadata struct; decode / feature-extract / resize /
frame-sample run as Arrow-batched ``mapInPandas`` stages. The decode step
itself is STUBBED (no image/audio libraries in this container — marked
clearly below); everything Spark-side is real and tested: schemas,
batch iteration, partition sizing, UDF signatures.

Scale notes: binary payloads dominate row size, so
- partition by (modality, shard) at write time to keep scan parallelism;
- set spark.sql.files.maxPartitionBytes low (64-128 MB) for payload tables
  so one task never holds too many blobs;
- mapInPandas streams batches (Arrow) — peak worker memory is one batch,
  controlled by spark.sql.execution.arrow.maxRecordsPerBatch.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("modality", StringType(), False),  # image | audio | video
        StructField("mime_type", StringType(), True),
        StructField("payload", BinaryType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", IntegerType(), True),
    ]
)

FEATURE_SCHEMA = (
    "media_id string, modality string, n_bytes bigint, "
    "payload_hash string, feature array<double>"
)


def attach_payload_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Cheap, real metadata computed JVM-side: byte length + content hash.

    These are the columns exact-dedup and integrity checks shuffle on; no
    Python involved."""
    return df.withColumn("n_bytes", F.length(F.col(payload_col)).cast("bigint")).withColumn(
        "payload_hash", F.md5(F.col(payload_col).cast("binary"))
    )


# Optional imaging backend: real decode lights up automatically where PIL
# is installed; in this container (no imaging libs) the stub path raises
# and the Spark-side plumbing stays fully tested either way.
try:  # pragma: no cover - which branch runs depends on the environment
    from PIL import Image as _PILImage

    HAS_PIL = True
except ImportError:
    _PILImage = None
    HAS_PIL = False


def _decode_image(payload: bytes) -> "object":
    """Decode an image payload to a PIL Image when PIL is available;
    otherwise raise (this container has no imaging library — the
    Spark-side contract, bytes in / decoded object out, is what the
    surrounding stages test)."""
    if not HAS_PIL:
        raise NotImplementedError(
            "image decode requires an imaging library not present in this environment"
        )
    import io

    return _PILImage.open(io.BytesIO(payload))


def decode_image_dims(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """mapInPandas image-decode stage: [media_id, dec_width, dec_height,
    dec_mode] per decodable image row (real decode via PIL where present;
    raises the stub NotImplementedError otherwise — call sites gate on
    ``HAS_PIL``). Same Arrow-batched shape as extract_features: one batch
    in memory at a time, blobs never shuffle."""
    if not HAS_PIL:
        raise NotImplementedError(
            "image decode requires an imaging library not present in this environment"
        )
    from meshinsights_data_pipeline_spark.session import ensure_package_on_workers

    ensure_package_on_workers(df.sparkSession)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            # payload is nullable in MEDIA_SCHEMA: an image row with a
            # NULL payload null-fills its dims instead of crashing the
            # task (io.BytesIO(None) would raise TypeError).
            decoded = pdf[payload_col].map(
                lambda p: None if p is None else _decode_image(p)
            )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "dec_width": decoded.map(lambda im: None if im is None else im.width),
                    "dec_height": decoded.map(lambda im: None if im is None else im.height),
                    "dec_mode": decoded.map(lambda im: None if im is None else im.mode),
                }
            )

    return df.filter(F.col("modality") == "image").mapInPandas(
        batches, "media_id string, dec_width int, dec_height int, dec_mode string"
    )


def _fake_feature(payload: bytes | None, dim: int = 8) -> list[float]:
    """Deterministic stand-in feature: byte-histogram moments. Real plumbing
    (used in tests); replace with a model embedding in production."""
    if not payload:
        return [0.0] * dim
    buckets = [0] * dim
    for i, byte in enumerate(payload):
        buckets[byte % dim] += 1
    total = float(len(payload))
    return [round(b / total, 9) for b in buckets]


def extract_features(df: DataFrame, payload_col: str = "payload", dim: int = 8) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Streams Arrow batches; each output row keeps the id/modality plus the
    (stub) feature vector. The batch loop shape is exactly what a real
    decoder plugs into."""
    from meshinsights_data_pipeline_spark.session import ensure_package_on_workers

    ensure_package_on_workers(df.sparkSession)
    with_meta = attach_payload_metadata(df, payload_col)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "n_bytes": pdf["n_bytes"],
                    "payload_hash": pdf["payload_hash"],
                    "feature": pdf[payload_col].map(lambda p: _fake_feature(p, dim)),
                }
            )
            yield out

    return with_meta.mapInPandas(batches, FEATURE_SCHEMA)


def chunk_audio(df: DataFrame, chunk_ms: int = 5000) -> DataFrame:
    """Fixed-duration chunk plan for audio rows: one output row per chunk
    window, end capped at the clip duration. Same explode fan-out shape as
    sample_frames — chunk rows stay colocated with their source shard, and
    a decoder (stubbed in this container) maps over the (payload, start,
    end) triples downstream."""
    n_chunks = F.ceil(
        F.coalesce(F.col("duration_ms"), F.lit(0)) / F.lit(chunk_ms)
    ).cast("int")
    return (
        df.filter(F.col("modality") == "audio")
        .withColumn(
            "chunk_idx",
            F.explode(F.sequence(F.lit(0), F.greatest(n_chunks - 1, F.lit(0)))),
        )
        .withColumn("chunk_start_ms", F.col("chunk_idx") * chunk_ms)
        .withColumn(
            "chunk_end_ms",
            F.least(F.col("chunk_start_ms") + chunk_ms, F.coalesce(F.col("duration_ms"), F.lit(chunk_ms))),
        )
        .select("media_id", "chunk_idx", "chunk_start_ms", "chunk_end_ms")
    )


def sample_frames(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plan for video rows: one output row per sampled
    timestamp (the decode itself is the stub above). The explode is real —
    it demonstrates the fan-out schema and keeps frame rows colocated with
    their source shard."""
    n_frames = (F.coalesce(F.col("duration_ms"), F.lit(0)) / every_ms).cast("int")
    return (
        df.filter(F.col("modality") == "video")
        .withColumn("frame_idx", F.explode(F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)))))
        .withColumn("frame_ts_ms", F.col("frame_idx") * every_ms)
        .select("media_id", "frame_idx", "frame_ts_ms")
    )
