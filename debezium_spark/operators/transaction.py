"""P4 — transaction metadata enrichment.

Reference: ``TransactionMonitor`` (debezium-connector-common/.../pipeline/
txmetadata/TransactionMonitor.java:47,75-104) assigns each event its
``transaction{id, total_order, data_collection_order}`` — the event's rank
within its transaction, and within (transaction, table).

Spark shape: two ranks over one window family. Both windows share the
``tx_id`` partitioning so they hash-shuffle once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def enrich_transaction_metadata(env_df: DataFrame) -> DataFrame:
    tx = F.col("source.tx_id")
    w_total = Window.partitionBy(tx).orderBy(F.col("source.pos"))
    w_coll = Window.partitionBy(tx, F.col("source.table")).orderBy(
        F.col("source.pos")
    )
    enriched = F.struct(
        tx.alias("id"),
        F.row_number().over(w_total).cast("long").alias("total_order"),
        F.row_number().over(w_coll).cast("long").alias("data_collection_order"),
    )
    return env_df.withColumn(
        "transaction", F.when(tx.isNotNull(), enriched)
    )


def transaction_boundaries(env_df: DataFrame) -> DataFrame:
    """BEGIN/END events per transaction (TransactionMonitor topic records).

    One row per tx with event_count and first/last position — the batch
    equivalent of the BEGIN/END boundary records.
    """
    return (
        env_df.filter(F.col("source.tx_id").isNotNull())
        .groupBy(F.col("source.tx_id").alias("tx_id"))
        .agg(
            F.count("*").alias("event_count"),
            F.min("source.pos").alias("begin_pos"),
            F.max("source.pos").alias("end_pos"),
        )
    )
