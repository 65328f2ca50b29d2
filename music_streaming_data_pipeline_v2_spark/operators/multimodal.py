"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata, processed via Arrow-batched Pandas UDFs.

Extension surface (SURVEY.md §7 phase 6). The container has no codec
libraries, so the decode kernels are deterministic fakes / clearly
marked stubs — but the Spark-side plumbing is real and tested: schema
contract, ``mapInPandas`` batch iteration, partition sizing, and the
metadata struct convention.

Design for 100 TB of media:

- A media row is ``(media_id, modality, content binary, meta struct)``;
  content stays opaque bytes end-to-end — Spark never interprets it,
  so predicate pushdown on metadata (modality, width, duration) prunes
  row groups without touching blobs.
- Kernels run in ``mapInPandas`` (Arrow batches, not per-row pickling).
  Batch size is controlled by ``spark.sql.execution.arrow.
  maxRecordsPerBatch`` — set low (e.g. 64) for large blobs so a batch
  fits executor memory.
- Real deployments swap ``fake_image_features``/``decode_stub`` for
  Pillow/ffmpeg kernels with the same signature; nothing else changes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Schema contract for a multimodal corpus table.
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), nullable=False),
        T.StructField("modality", T.StringType(), nullable=False),  # image|audio|video
        T.StructField("content", T.BinaryType(), nullable=True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                    T.StructField("format", T.StringType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("modality", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("content_hash", T.StringType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def decode_stub(content: bytes, fmt: str) -> object:
    """Placeholder for a real codec (Pillow/ffmpeg). The container has
    no media libraries; real deployments replace this kernel."""
    raise NotImplementedError(
        "media decoding requires codec libraries not present in this "
        "environment; swap decode_stub for a Pillow/ffmpeg kernel"
    )


def _byte_histogram_features():
    """Factory for the stand-in feature extractor (byte-histogram
    moments). Factory-nested so cloudpickle serializes the function BY
    VALUE into UDF closures — Python workers then never need this
    package on their import path (the driver may run from any cwd).
    Real pipelines replace with a model embedding; the Spark plumbing
    (batching, schema, partitioning) is identical."""

    def features(content: bytes, dim: int = 8) -> list[float]:
        if not content:
            return [0.0] * dim
        buckets = [0] * dim
        for b in content:
            buckets[b % dim] += 1
        total = float(len(content))
        return [round(c / total, 6) for c in buckets]

    return features


#: Module-level alias for direct (driver-side / test) use.
fake_image_features = _byte_histogram_features()


def extract_features(media: DataFrame, batch_size: int = 64) -> DataFrame:
    """Arrow-batched feature extraction over the binary column.

    ``mapInPandas`` so one Python worker processes a whole Arrow batch;
    blobs never round-trip through per-row pickling.
    """

    # pickle-by-value copy: the kernel closure must not reference any
    # module-level symbol of this package (workers may not have it
    # importable when the driving process runs from another cwd)
    features = _byte_histogram_features()

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            content = pdf["content"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "n_bytes": content.map(lambda b: len(b) if b is not None else 0),
                    "content_hash": content.map(
                        lambda b: hashlib.md5(b).hexdigest() if b is not None else None
                    ),
                    "feature": content.map(lambda b: features(b or b"")),
                }
            )

    spark = media.sparkSession
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", str(batch_size))
    return media.mapInPandas(kernel, FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one output row per sampled frame
    timestamp (the decode itself is the stubbed kernel). Demonstrates
    the explode-by-metadata pattern: frame rows are generated from
    ``meta.duration_ms`` WITHOUT touching the blob, so the expensive
    decode only runs on the sampled offsets."""
    return media.filter(F.col("modality") == "video").select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.col("meta.duration_ms") - 1, F.lit(0)),
                F.lit(every_ms),
            )
        ).alias("frame_ts_ms"),
    )


def synthetic_media(spark, n: int = 64, seed: int = 7) -> DataFrame:
    """Deterministic synthetic media corpus for tests: binary payloads
    derived from the row id (no external files)."""
    rows = spark.range(n).select(
        F.col("id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("id") % 3 + 1).cast("int"),
        ).alias("modality"),
        F.encode(
            F.concat(F.lit("blob-"), F.sha2(F.concat(F.lit(seed), F.col("id")), 256)),
            "utf-8",
        ).cast("binary").alias("content"),
    )
    return rows.withColumn(
        "meta",
        F.struct(
            (F.col("media_id") % 640 + 16).cast("int").alias("width"),
            (F.col("media_id") % 480 + 16).cast("int").alias("height"),
            (F.col("media_id") % 5000 + 500).cast("int").alias("duration_ms"),
            F.lit("synthetic").alias("format"),
        ),
    )
