"""Multimodal column plumbing: opaque binary payloads + typed metadata.

North-star extension. Image/audio/video payloads are opaque ``binary``
columns with a typed metadata struct; decode / feature-extract / resize /
frame-sample run as Arrow-batched ``mapInPandas`` stages. Image
DIMENSIONS are real everywhere via a pure-stdlib container-header probe
(PNG/JPEG/GIF/BMP — probe_image_dims); full PIXEL decode is tiered
behind PIL and raises a clearly-marked NotImplementedError where no
imaging library exists. Everything Spark-side is real and tested:
schemas, batch iteration, partition sizing, UDF signatures.

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


def probe_image_dims(payload: bytes | None) -> tuple[int, int, str] | None:
    """(width, height, format) from the container HEADER alone — pure
    stdlib ``struct``, no imaging library. Supports PNG (IHDR), JPEG
    (SOF0/1/2/... frame headers), GIF (logical screen descriptor) and BMP
    (BITMAPINFOHEADER). Returns None for unrecognized / truncated
    payloads rather than raising: a corrupt blob in a 100 TB media table
    must null-fill its row, not kill the task. This is the dimensions
    tier that works everywhere; full pixel decode stays behind PIL."""
    import struct

    if not payload or len(payload) < 10:
        return None
    # PNG: 8-byte signature; IHDR data (width, height as BE uint32) at 16.
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        if len(payload) < 24:
            return None
        w, h = struct.unpack(">II", payload[16:24])
        return (w, h, "PNG")
    # GIF87a / GIF89a: LE uint16 width, height at offset 6.
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack("<HH", payload[6:10])
        return (w, h, "GIF")
    # BMP: 'BM' + BITMAPINFOHEADER; LE int32 width, height at offset 18
    # (height may be negative for top-down DIBs).
    if payload[:2] == b"BM" and len(payload) >= 26:
        w, h = struct.unpack("<ii", payload[18:26])
        return (w, abs(h), "BMP")
    # JPEG: walk the marker segments to the first frame header (SOFn,
    # 0xC0-0xCF excluding DHT 0xC4, JPG 0xC8, DAC 0xCC); height then
    # width as BE uint16 after the 2-byte length + 1-byte precision.
    if payload[:2] == b"\xff\xd8":
        i, n = 2, len(payload)
        while i + 4 <= n:
            if payload[i] != 0xFF:  # desynced: not a marker where expected
                return None
            marker = payload[i + 1]
            if marker == 0xFF:  # fill byte
                i += 1
                continue
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2  # standalone markers carry no length
                continue
            seg_len = struct.unpack(">H", payload[i + 2 : i + 4])[0]
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                if i + 9 > n:
                    return None
                h, w = struct.unpack(">HH", payload[i + 5 : i + 9])
                return (w, h, "JPEG")
            i += 2 + seg_len
        return None
    return None


def decode_image_dims(
    df: DataFrame, payload_col: str = "payload", backend: str = "auto"
) -> DataFrame:
    """mapInPandas image-decode stage: [media_id, dec_width, dec_height,
    dec_mode] per image row. Two tiers:

    - ``pil``: full decode via PIL (dec_mode = pixel mode, e.g. 'RGB');
      raises NotImplementedError where no imaging library exists.
    - ``probe``: pure-Python container-header parse (probe_image_dims) —
      dimensions + format string everywhere, no third-party libs
      (dec_mode = container format, e.g. 'PNG').

    ``auto`` picks pil when available, probe otherwise, so the stage is
    real in every environment. Same Arrow-batched shape as
    extract_features: one batch in memory at a time, blobs never shuffle."""
    if backend not in ("auto", "pil", "probe"):
        raise ValueError(f"unknown backend: {backend!r}")
    if backend == "auto":
        backend = "pil" if HAS_PIL else "probe"
    if backend == "pil" and not HAS_PIL:
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
            if backend == "pil":
                decoded = pdf[payload_col].map(
                    lambda p: None if p is None else _decode_image(p)
                )
                triples = decoded.map(
                    lambda im: None if im is None else (im.width, im.height, im.mode)
                )
            else:
                triples = pdf[payload_col].map(probe_image_dims)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "dec_width": triples.map(lambda t: None if t is None else t[0]),
                    "dec_height": triples.map(lambda t: None if t is None else t[1]),
                    "dec_mode": triples.map(lambda t: None if t is None else t[2]),
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


def payload_shingle_hashes(
    df: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    n_bytes: int = 8,
    stride: int = 4,
) -> DataFrame:
    """Distinct byte-``n_bytes``-gram shingles per binary payload as
    60-bit hashes ``[id, h]`` — content fingerprints for media dedup
    WITHOUT decoding (re-encoded/cropped variants need the decode tier;
    this catches exact and container-level near duplicates, the dominant
    dup class in crawled media).

    Shingles are sliced in HEX-text space (2 chars per byte, byte-aligned
    positions) because that is the one byte-window form Spark and DuckDB
    compute identically — DuckDB has no BLOB substring, and both engines'
    ``hex()`` emit identical uppercase digits, so the md5-60bit hash
    contract carries over unchanged. ``stride`` samples every k-th byte
    offset: payload near-dups keep byte alignment (unlike edited text),
    so stride trades shingle count for recall linearly and 4 is a safe
    default for container formats. Payloads shorter than ``n_bytes``
    contribute their whole hex form as a single shingle. Hex doubles the
    bytes in flight for the slicing expression only — the frame that
    shuffles is the distinct 60-bit hash set, ~|payload|/stride longs
    per doc.
    """
    width, step = 2 * n_bytes, 2 * stride
    from meshinsights_data_pipeline_spark.operators.dedup import md5_int60

    hx = df.select(F.col(id_col), F.hex(F.col(payload_col)).alias("_hx"))
    sh = (
        hx.select(
            F.col(id_col),
            F.explode(
                F.sequence(
                    F.lit(1),
                    F.greatest(
                        F.length("_hx") - F.lit(width - 1), F.lit(1)
                    ),
                    F.lit(step),
                )
            ).alias("pos"),
            F.col("_hx"),
        )
        .select(
            F.col(id_col),
            F.expr(f"substring(_hx, pos, {width})").alias("shingle"),
        )
        .distinct()
    )
    return sh.select(F.col(id_col), md5_int60(F.col("shingle")).alias("h"))


def payload_neardup_pairs(
    df: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    threshold: float = 0.5,
    n_bytes: int = 8,
    stride: int = 4,
    num_hashes: int = 16,
    bands: int = 4,
) -> DataFrame:
    """Verified binary near-dup pairs ``[id_a, id_b, jaccard]`` — the
    minhash_dedup_pairs composition (LSH candidates -> exact Jaccard on
    candidates only, two corpus scans at any scale) over byte shingles
    instead of word shingles. Same banding/verify machinery, same 100 TB
    shape: nothing touches corpus^2."""
    from meshinsights_data_pipeline_spark.operators.dedup import (
        _verified_pairs_from_candidates,
        minhash_lsh_candidates,
    )

    sh = payload_shingle_hashes(df, id_col, payload_col, n_bytes, stride)
    cands = minhash_lsh_candidates(
        df,
        id_col,
        payload_col,
        num_hashes=num_hashes,
        bands=bands,
        shingles=sh,
        materialize=True,
    )
    return _verified_pairs_from_candidates(sh, cands, id_col, threshold)
