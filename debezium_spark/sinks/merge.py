"""K1-K6 — the change-event sink: MERGE semantics on Spark.

Reference: ``JdbcChangeEventSink`` (debezium-connector-jdbc/.../
JdbcChangeEventSink.java:48,89-186,244) routes each batch's events —
truncate / delete / tombstone / upsert — with flush-order guarantees; the 11
SQL dialects' upsert statements (dialect/postgres PostgresDatabaseDialect
.java:102-110, mysql MySqlDatabaseDialect.java:199-222, …) all collapse into
ONE logical MERGE here. Insert modes insert/upsert/update:
JdbcSinkConnectorConfig.java:59,142-151.

Without Delta in the container, MERGE is emulated as
``target ANTI JOIN keys ∪ new_state`` and an idempotent overwrite —
semantically the Delta ``MERGE INTO`` we would issue in production (the
K4 reduction guarantees unique match keys either way).

Scale notes: the anti-join shuffles on the PK — same key as the K4 window,
so the exchange is reused; the change side is usually a micro-batch (small)
and broadcasts.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from debezium_spark.envelope import OP_DELETE, OP_TRUNCATE
from debezium_spark.operators.reduce import apply_truncates, reduce_last_per_key
from debezium_spark.operators.unwrap import extract_new_record_state


def merge_changes(
    target_df: DataFrame,
    env_df: DataFrame,
    pk_cols: list[str],
    *,
    insert_mode: str = "upsert",  # insert | upsert | update
    broadcast_changes: bool = True,
) -> DataFrame:
    """Apply one batch of envelopes to the target table, returning new state.

    Order of operations mirrors JdbcChangeEventSink.execute
    (JdbcChangeEventSink.java:89-186): truncates clear pending + target,
    then the reduced (last-per-key, K4) change set merges in.
    """
    env_df = env_df.filter(F.col("op").isNotNull())  # tombstones carry no state
    env_df = apply_truncates(env_df)

    truncated = env_df.filter(F.col("op") == OP_TRUNCATE)
    if truncated.take(1):
        # TRUNCATE clears the whole target for that table; with a single-table
        # target that is an empty base.
        target_df = target_df.limit(0)
    changes = env_df.filter(F.col("op") != OP_TRUNCATE)

    latest = reduce_last_per_key(changes)
    flat = extract_new_record_state(
        latest, delete_handling="rewrite", add_fields=("op",)
    )
    if broadcast_changes:
        flat = F.broadcast(flat)

    keys = flat.select(*pk_cols)
    value_cols = target_df.columns
    new_state = flat.filter(~F.col("__deleted")).select(*value_cols)

    if insert_mode == "upsert":
        kept = target_df.join(keys, pk_cols, "left_anti")
        return kept.unionByName(new_state)
    if insert_mode == "insert":
        # Plain INSERT of every create/read event; no matching.
        inserts = flat.filter(F.col("__op").isin("c", "r")).select(*value_cols)
        return target_df.unionByName(inserts)
    if insert_mode == "update":
        # Only matched rows change; unmatched change rows are ignored.
        upd = target_df.join(keys, pk_cols, "left_semi")
        kept = target_df.join(keys, pk_cols, "left_anti")
        updated = new_state.join(upd.select(*pk_cols), pk_cols, "left_semi")
        return kept.unionByName(updated)
    raise ValueError(f"unknown insert mode: {insert_mode}")


class ParquetMergeSink:
    """foreachBatch sink materializing an envelope stream into a parquet table.

    The production analog is ``MERGE INTO`` on Delta/Iceberg; parquet
    emulation rewrites the table (fine for tests; the interface is the
    contract). Schema evolution mode ``basic`` adds missing optional columns
    from the event schema (JdbcSinkConnectorConfig.java:158-163,
    JdbcChangeEventSink.java:195-238).
    """

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        pk_cols: list[str],
        *,
        insert_mode: str = "upsert",
        schema_evolution: str = "basic",
    ):
        self.spark = spark
        self.path = path
        self.pk_cols = pk_cols
        self.insert_mode = insert_mode
        self.schema_evolution = schema_evolution

    def _read_target(self, like_df: DataFrame) -> DataFrame:
        if os.path.exists(self.path):
            return self.spark.read.parquet(self.path)
        return like_df.limit(0)

    def write_batch(self, env_batch: DataFrame, epoch_id: int | None = None) -> None:
        flat_like = extract_new_record_state(
            env_batch.filter(F.col("op").isNotNull()), delete_handling="drop"
        )
        target = self._read_target(flat_like)
        if self.schema_evolution == "basic":
            for c in flat_like.columns:
                if c not in target.columns:
                    target = target.withColumn(
                        c, F.lit(None).cast(flat_like.schema[c].dataType)
                    )
        merged = merge_changes(
            target, env_batch, self.pk_cols, insert_mode=self.insert_mode
        )
        # Idempotent rewrite: localCheckpoint breaks lineage on the old files
        # so the overwrite is safe to re-run (exactly-once with checkpointing).
        merged.localCheckpoint(eager=True).write.mode("overwrite").parquet(self.path)

    def __call__(self, env_batch: DataFrame, epoch_id: int) -> None:
        self.write_batch(env_batch, epoch_id)
