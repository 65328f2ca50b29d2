"""Kafka source for real-time ingestion.

The north-star streaming architecture (BASELINE.json spark_approach):
Kafka topic of listen events → Structured Streaming → the same
validation / enrichment / KPI plan as the file path. The container has
no Kafka broker, so ``kafka_stream`` is exercised structurally (the
parse layer is pure DataFrame code, tested on batch frames shaped like
Kafka output); point it at a real broker and nothing else changes.

Scale notes: one Spark task per topic-partition — size the topic's
partition count to the cluster's parallelism; ``maxOffsetsPerTrigger``
bounds micro-batch size; the checkpoint stores offsets, giving the
same exactly-once contract as the file source's manifest replacement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def parse_kafka_value(
    raw: DataFrame, schema: T.StructType, ts_col: str | None = None
) -> DataFrame:
    """Decode the Kafka wire format: ``value`` bytes → JSON → columns.

    Works identically on a streaming frame from the kafka source or a
    batch frame with the same (key, value, topic, partition, offset,
    timestamp) shape — which is how it's unit-tested without a broker.
    Rows whose value fails to parse keep nulls in every data column
    (from_json's coerce behavior) and are left for the validation
    layer's coerce-and-drop pass — same policy as file ingest.
    """
    parsed = raw.select(
        F.col("key").cast("string").alias("_key"),
        F.from_json(F.col("value").cast("string"), schema).alias("_data"),
        F.col("timestamp").alias("_kafka_ts"),
        F.col("partition").alias("_partition"),
        F.col("offset").alias("_offset"),
    )
    out = parsed.select("_key", "_data.*", "_kafka_ts", "_partition", "_offset")
    if ts_col is not None:
        out = out.withColumn(ts_col, F.to_timestamp(ts_col))
    return out


def kafka_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    schema: T.StructType,
    ts_col: str | None = None,
    starting_offsets: str = "latest",
    max_offsets_per_trigger: int | None = None,
) -> DataFrame:
    """Subscribe to a topic and decode events with ``schema``."""
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
    )
    if max_offsets_per_trigger is not None:
        reader = reader.option("maxOffsetsPerTrigger", str(max_offsets_per_trigger))
    return parse_kafka_value(reader.load(), schema, ts_col)
