"""Deterministic sharded corpus export — the delivery end of the
training-data pipeline.

Trainers want shards that are (a) reproducible run-to-run, (b) balanced,
(c) internally ordered, so a dataloader can seek and resume. Spark shape:
``repartitionByRange`` on the shard key (range partitioner → balanced,
contiguous key ranges per shard) + ``sortWithinPartitions`` (no global
sort — each shard orders locally), written with one file per shard.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def export_corpus(
    df: DataFrame,
    path: str,
    *,
    num_shards: int,
    shard_by: str = "doc_id",
    sort_by: tuple[str, ...] = ("doc_id",),
    fmt: str = "parquet",
) -> None:
    """Write ``num_shards`` deterministic, internally-sorted shard files."""
    out = (
        df.repartitionByRange(num_shards, F.col(shard_by))
        .sortWithinPartitions(*[F.col(c) for c in sort_by])
    )
    writer = out.write.mode("overwrite")
    if fmt == "parquet":
        writer.parquet(path)
    elif fmt == "json":
        writer.json(path)
    else:
        raise ValueError(f"unknown export format: {fmt}")


def shard_manifest(spark, path: str) -> DataFrame:
    """Per-shard row counts + key ranges (the dataloader's index)."""
    df = spark.read.parquet(path).withColumn(
        "__file", F.element_at(F.split(F.input_file_name(), "/"), -1)
    )
    return df.groupBy("__file").agg(
        F.count("*").alias("rows"),
        F.min("doc_id").alias("min_key"),
        F.max("doc_id").alias("max_key"),
    )
