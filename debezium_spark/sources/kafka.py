"""Kafka envelope source (production path) — gated on the kafka connector jar.

In production the change feed usually lands in Kafka (the reference's
primary deployment); the Spark side is then

    spark.readStream.format("kafka")... → from_json(value) → envelope

This container has neither a broker nor the spark-sql-kafka package, so the
builder raises with remediation unless the format is loadable. The file-feed
replay (streaming/pipeline.py) is the test-time stand-in; the transform
chain and sink contract downstream are identical either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def kafka_available(spark: SparkSession) -> bool:
    try:
        spark.readStream.format("kafka").option(
            "kafka.bootstrap.servers", "none:0"
        ).option("subscribe", "probe").load()
        return True
    except Exception as e:  # noqa: BLE001
        return "Failed to find data source" not in str(e)


def kafka_envelope_stream(
    spark: SparkSession,
    *,
    bootstrap_servers: str,
    topic: str,
    envelope_schema,
    starting_offsets: str = "earliest",
) -> DataFrame:
    """readStream from a Kafka topic of JSON envelopes → typed envelope
    DataFrame (key ignored; the envelope carries its own key struct)."""
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
    )
    return raw.select(
        F.from_json(F.col("value").cast("string"), envelope_schema).alias("e")
    ).select("e.*")
