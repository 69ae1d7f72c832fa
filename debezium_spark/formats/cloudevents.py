"""F1 — CloudEvents envelope format (serialize / deserialize).

Reference: ``CloudEventsConverter`` (debezium-connect-plugins/src/main/java/
io/debezium/converters/CloudEventsConverter.java, 719 LoC): wraps each change
event in a CloudEvents 1.0 structure — ``id`` from the source position,
``source`` URI, ``type`` ``io.debezium.<connector>.datachangeevent``,
``time`` RFC3339 from ts_ms, extension attributes carrying the envelope
metadata, ``data`` holding the payload.

Spark shape: a deterministic struct wrapper + ``to_json`` — serialization is
a narrow projection; consume-side is ``from_json`` with the explicit schema
(F2's JsonSerde pattern).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

SPECVERSION = "1.0"


def to_cloudevents(
    env_df: DataFrame,
    *,
    source_uri: str = "/debezium/spark",
    data_col: str = "after",
) -> DataFrame:
    """Wrap envelopes into CloudEvents structs (CloudEventsConverter.java)."""
    ce = F.struct(
        F.concat_ws(
            ";",
            F.concat(F.lit("name:"), F.col("source.db"), F.lit("."),
                     F.col("source.table")),
            F.concat(F.lit("pos:"), F.col("source.pos").cast("string")),
        ).alias("id"),
        F.lit(source_uri).alias("source"),
        F.lit(SPECVERSION).alias("specversion"),
        F.concat(
            F.lit("io.debezium."), F.col("source.table"), F.lit(".datachangeevent")
        ).alias("type"),
        F.date_format(
            F.timestamp_millis(F.col("ts_ms")), "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'"
        ).alias("time"),
        F.col("op").alias("iodebeziumop"),
        F.col("source.tx_id").alias("iodebeziumtxid"),
        F.col(data_col).alias("data"),
    )
    return env_df.withColumn("cloudevent", ce)


def to_cloudevents_json(env_df: DataFrame, **kw) -> DataFrame:
    return to_cloudevents(env_df, **kw).withColumn(
        "cloudevent_json", F.to_json(F.col("cloudevent"))
    )


def cloudevents_schema(data_schema: T.DataType) -> T.StructType:
    return T.StructType(
        [
            T.StructField("id", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("specversion", T.StringType()),
            T.StructField("type", T.StringType()),
            T.StructField("time", T.StringType()),
            T.StructField("iodebeziumop", T.StringType()),
            T.StructField("iodebeziumtxid", T.StringType()),
            T.StructField("data", data_schema),
        ]
    )


def from_cloudevents_json(
    df: DataFrame,
    data_schema: T.DataType,
    *,
    json_col: str = "cloudevent_json",
    out_col: str = "cloudevent",
) -> DataFrame:
    """Consume side: parse CloudEvents JSON back (explicit schema, no
    inference pass)."""
    return df.withColumn(
        out_col, F.from_json(F.col(json_col), cloudevents_schema(data_schema))
    )
