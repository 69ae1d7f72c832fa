"""S3 — incremental snapshot: the DBLog watermark/window algorithm.

Reference: ``AbstractIncrementalSnapshotChangeEventSource``
(debezium-connector-common/.../pipeline/source/snapshot/incremental/
AbstractIncrementalSnapshotChangeEventSource.java:171-207,245-352,699):
while streaming, read PK-ordered chunks; any streamed change for a PK inside
the chunk's window EVICTS the buffered snapshot row (the stream wins); the
surviving chunk rows are emitted as ``r`` events when the window closes.

Spark-first insight (SURVEY S3): the window-buffer dedup IS a left-anti
join — ``chunk ANTI JOIN stream_window USING (pk)`` — applied per chunk/
micro-batch. No state store needed for the batch formulation; the streaming
formulation applies the same join inside foreachBatch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def incremental_snapshot_chunk(
    chunk_df: DataFrame,
    window_events_df: DataFrame,
    pk_cols: list[str],
) -> DataFrame:
    """Rows of ``chunk_df`` surviving the dedup window.

    ``window_events_df`` is the set of change events observed between the
    low and high watermark (AbstractIncrementalSnapshotChangeEventSource.java:198-207
    ``deduplicateWindow``); any chunk row whose PK appears there is dropped.
    """
    keys = window_events_df.select(*pk_cols).distinct()
    return chunk_df.join(keys, pk_cols, "left_anti")


def incremental_snapshot(
    table_df: DataFrame,
    stream_df: DataFrame,
    pk_cols: list[str],
    *,
    chunk_size: int = 1024,
    pos_col: str = "pos",
) -> DataFrame:
    """Full-table incremental snapshot merged with concurrent stream events.

    Batch-equivalent of the chunk loop (readChunk :245 → window dedup :198 →
    sendWindowEvents :171): chunking only changes *when* rows are emitted,
    not *which* version survives, so the distributed formulation runs ONE
    anti-join over the whole table — each executor processes its partitions
    independently (the chunk loop parallelized instead of serialized).
    Returns the final materialized state: surviving snapshot rows plus the
    latest non-delete stream state per key.
    """
    from debezium_spark.operators.reduce import reduce_last_per_key

    if {"key", "op", "source"}.issubset(set(stream_df.columns)):
        # Envelope input (the engine's own changefeed): flatten to the
        # documented contract — pk/value columns + op + pos.
        value_fields = [f.name for f in stream_df.schema["after"].dataType.fields]
        stream_df = stream_df.select(
            *[F.col(f"key.{c}").alias(c) for c in pk_cols],
            *[
                F.col(f"after.{c}").alias(c)
                for c in value_fields
                if c not in pk_cols
            ],
            "op",
            F.col("source.pos").alias(pos_col),
        )
    latest = reduce_last_per_key(
        stream_df, tuple(pk_cols), order_col=pos_col
    )
    survivors = table_df.join(latest.select(*pk_cols), pk_cols, "left_anti")
    value_cols = [c for c in table_df.columns]
    stream_state = latest.filter(F.col("op") != "d").select(*value_cols)
    return survivors.unionByName(stream_state)
