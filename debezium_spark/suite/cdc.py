"""CDC operator correctness queries (SURVEY §2.1-§2.5 ✅ rows).

Each query applies one engine operator to the deterministic change feed /
snapshot derived from the synthetic tables (sources/changefeed.py) and pairs
it with the equivalent DuckDB oracle SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from debezium_spark.envelope import with_tombstones, wrap_snapshot
from debezium_spark.operators import (
    by_logical_table_router,
    content_based_router,
    convert_timezone_fields,
    enforce_record_size,
    extract_new_record_state,
    filter_records,
    hash_mask,
    incremental_snapshot_chunk,
    mask_string,
    outbox_event_router,
    partition_routing,
    reduce_last_per_key,
    skipped_operations,
    truncate_column,
)
from debezium_spark.operators.transaction import (
    enrich_transaction_metadata,
    transaction_boundaries,
)
from debezium_spark.operators.unwrap import extract_changed_record_state
from debezium_spark.sinks.merge import merge_changes
from debezium_spark.sources.changefeed import (
    CHANGES_CTE,
    LATEST_CTE,
    SNAPSHOT_CTE,
    accounts_changefeed,
    accounts_snapshot,
)
from debezium_spark.suite import register


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _snapshot_flat(spark: SparkSession, sf_dir: str) -> DataFrame:
    return extract_new_record_state(
        accounts_snapshot(spark, sf_dir), delete_handling="drop"
    )


# ---------------------------------------------------------------------------
# S1 — snapshot source emits `r` envelopes
# ---------------------------------------------------------------------------
@register(
    "s1_snapshot_envelope",
    oracle="""
    SELECT c_custkey AS id, c_mktsegment AS status, c_acctbal AS balance,
           'r' AS op, 'accounts' AS tbl, 'true' AS snapshot_flag
    FROM customer
    """,
)
def s1_snapshot_envelope(spark, sf_dir):
    env = accounts_snapshot(spark, sf_dir)
    return env.select(
        F.col("after.id").alias("id"),
        F.col("after.status").alias("status"),
        F.col("after.balance").alias("balance"),
        F.col("op").alias("op"),
        F.col("source.table").alias("tbl"),
        F.col("source.snapshot").alias("snapshot_flag"),
    )


# ---------------------------------------------------------------------------
# S14 — envelope timestamp precisions (ts_ms / ts_us / ts_ns)
# ---------------------------------------------------------------------------
@register(
    "s14_envelope_timestamps",
    oracle="""
    SELECT event_id,
           CASE event_type WHEN 'signup' THEN 'c'
                           WHEN 'error' THEN 'd' ELSE 'u' END AS op,
           epoch_ms(ts) AS ts_ms,
           epoch_us(ts) AS ts_us,
           epoch_ns(ts) AS ts_ns
    FROM events
    """,
)
def s14_envelope_timestamps(spark, sf_dir):
    """The envelope carries the event time at all three precisions
    (Envelope.java:90-128 — ts_ms plus the ts_us/ts_ns fields). The feed
    populates them exactly from the source's nanosecond clock, so downstream
    consumers never re-derive a finer precision from a coarser one."""
    env = accounts_changefeed(spark, sf_dir)
    return env.select(
        F.col("source.pos").alias("event_id"),
        F.col("op"),
        F.col("ts_ms"),
        F.col("ts_us"),
        F.col("ts_ns"),
    )


# ---------------------------------------------------------------------------
# S2 — chunked snapshot boundary calculation
# ---------------------------------------------------------------------------
@register(
    "s2_chunked_snapshot",
    oracle="""
    WITH b AS (SELECT min(c_custkey) AS lo FROM customer)
    SELECT CAST((c_custkey - b.lo) // 512 AS BIGINT) AS chunk_id,
           count(*) AS n_rows,
           min(c_custkey) AS chunk_lo, max(c_custkey) AS chunk_hi
    FROM customer, b
    GROUP BY 1
    """,
)
def s2_chunked_snapshot(spark, sf_dir):
    """Key-range chunking (ChunkBoundaryCalculator.java:56-107): one cheap
    min() agg then equi-width ranges — each chunk is a partition-pruned scan."""
    cust = t(spark, sf_dir, "customer")
    lo = cust.agg(F.min("c_custkey")).collect()[0][0]
    return (
        cust.withColumn(
            "chunk_id", ((F.col("c_custkey") - F.lit(lo)) / 512).cast("bigint")
        )
        .groupBy("chunk_id")
        .agg(
            F.count("*").alias("n_rows"),
            F.min("c_custkey").alias("chunk_lo"),
            F.max("c_custkey").alias("chunk_hi"),
        )
    )


# ---------------------------------------------------------------------------
# T1 — ExtractNewRecordState (unwrap with delete rewrite + added metadata)
# ---------------------------------------------------------------------------
@register(
    "t1_extract_new_record_state",
    oracle=f"""
    WITH {CHANGES_CTE}
    SELECT id,
           CASE WHEN op = 'd' THEN NULL ELSE status END AS status,
           CASE WHEN op = 'd' THEN NULL ELSE balance END AS balance,
           op = 'd' AS __deleted, op AS __op, pos AS __pos
    FROM changes
    """,
)
def t1_extract_new_record_state(spark, sf_dir):
    env = accounts_changefeed(spark, sf_dir)
    return extract_new_record_state(
        env, delete_handling="rewrite", add_fields=("op", "source.pos")
    )


@register(
    "t1_unwrap_drop_deletes",
    oracle=f"""
    WITH {CHANGES_CTE}
    SELECT id, status, balance FROM changes WHERE op <> 'd'
    """,
)
def t1_unwrap_drop_deletes(spark, sf_dir):
    env = accounts_changefeed(spark, sf_dir)
    return extract_new_record_state(env, delete_handling="drop")


# ---------------------------------------------------------------------------
# T3 — ExtractChangedRecordState
# ---------------------------------------------------------------------------
@register(
    "t3_extract_changed_record_state",
    oracle=f"""
    WITH {CHANGES_CTE}
    SELECT pos,
           CASE op
             WHEN 'c' THEN 'id,status,balance'
             WHEN 'd' THEN 'id'
             ELSE 'status,balance'
           END AS changed_fields
    FROM changes
    """,
)
def t3_extract_changed_record_state(spark, sf_dir):
    """before/after diff → changed-field names (ExtractChangedRecordState.java:36).

    On this feed: creates flip every field (before is null); updates change
    status+balance (before carries nulls for non-key fields); deletes have a
    skinny before image (id, NULL, NULL) and a null after image, so under
    null-safe comparison only `id` differs.
    """
    env = accounts_changefeed(spark, sf_dir)
    out = extract_changed_record_state(env)
    return out.select(
        F.col("source.pos").alias("pos"),
        F.array_join("__changed", ",").alias("changed_fields"),
    )


# ---------------------------------------------------------------------------
# T4/T22 — filtering
# ---------------------------------------------------------------------------
@register(
    "t4_filter_expression",
    oracle=f"""
    WITH {CHANGES_CTE}
    SELECT id, pos, balance FROM changes
    WHERE op <> 'd' AND balance > 100.0
    """,
)
def t4_filter_expression(spark, sf_dir):
    env = accounts_changefeed(spark, sf_dir)
    flat = filter_records(env, "op <> 'd' AND after.balance > 100.0")
    return flat.select(
        F.col("after.id").alias("id"),
        F.col("source.pos").alias("pos"),
        F.col("after.balance").alias("balance"),
    )


@register(
    "t22_skipped_operations",
    oracle=f"""
    WITH {CHANGES_CTE}
    SELECT op, count(*) AS n FROM changes WHERE op NOT IN ('d') GROUP BY op
    """,
)
def t22_skipped_operations(spark, sf_dir):
    env = accounts_changefeed(spark, sf_dir)
    return skipped_operations(env, skip=("d",)).groupBy("op").agg(
        F.count("*").alias("n")
    )


# ---------------------------------------------------------------------------
# T5/T6/T10 — routing
# ---------------------------------------------------------------------------
@register(
    "t5_content_based_router",
    oracle=f"""
    WITH {CHANGES_CTE}
    SELECT pos, 'accounts.' || CASE WHEN balance >= 100 THEN 'high' ELSE 'low' END AS __topic
    FROM changes WHERE op <> 'd'
    """,
)
def t5_content_based_router(spark, sf_dir):
    env = accounts_changefeed(spark, sf_dir).filter(F.col("op") != "d")
    routed = content_based_router(
        env,
        "concat('accounts.', CASE WHEN after.balance >= 100 THEN 'high' ELSE 'low' END)",
    )
    return routed.select(F.col("source.pos").alias("pos"), "__topic")


@register(
    "t6_logical_table_router",
    oracle=f"""
    WITH {CHANGES_CTE}
    SELECT pos,
           'accounts_' || CAST(id % 4 AS VARCHAR) AS physical_table,
           regexp_replace('accounts_' || CAST(id % 4 AS VARCHAR), 'accounts_[0-9]+', 'accounts') AS __topic
    FROM changes
    """,
)
def t6_logical_table_router(spark, sf_dir):
    """Shard-merge routing (ByLogicalTableRouter.java:26): four physical
    shards accounts_0..3 regex-collapse to one logical stream; the physical
    id is kept for key augmentation."""
    env = accounts_changefeed(spark, sf_dir).withColumn(
        "physical_table",
        F.concat(F.lit("accounts_"), (F.col("key.id") % 4).cast("string")),
    )
    routed = by_logical_table_router(
        env,
        "accounts_[0-9]+",
        "accounts",
        table_col="physical_table",
        key_augment=False,
    )
    return routed.select(F.col("source.pos").alias("pos"), "physical_table", "__topic")


@register(
    "t10_partition_routing",
    oracle=f"""
    WITH {CHANGES_CTE}
    SELECT pos,
           CAST(('0x' || substr(md5(CAST(id AS VARCHAR)), 1, 12))::BIGINT % 8 AS INTEGER) AS __partition
    FROM changes
    """,
)
def t10_partition_routing(spark, sf_dir):
    env = accounts_changefeed(spark, sf_dir).withColumn("id", F.col("key.id"))
    routed = partition_routing(env, ["id"], 8, portable=True)
    return routed.select(F.col("source.pos").alias("pos"), "__partition")


# ---------------------------------------------------------------------------
# T7 — outbox event router
# ---------------------------------------------------------------------------
@register(
    "t7_outbox_router",
    oracle="""
    SELECT CAST(user_id AS VARCHAR) AS key,
           props AS payload,
           'outbox.event.' || event_type AS __topic,
           event_id AS __pos,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_value
    FROM events
    """,
)
def t7_outbox_router(spark, sf_dir):
    """events.parquet acting as the outbox table: aggregatetype=event_type,
    aggregateid=user_id, payload=props (EventRouterDelegate.java:59)."""
    ev = t(spark, sf_dir, "events")
    outbox_rows = ev.select(
        F.struct(F.col("event_id").alias("id")).alias("key"),
        F.lit(None)
        .cast(
            "struct<id:string,aggregatetype:string,aggregateid:string,payload:string>"
        )
        .alias("before"),
        F.struct(
            F.col("event_id").cast("string").alias("id"),
            F.col("event_type").alias("aggregatetype"),
            F.col("user_id").cast("string").alias("aggregateid"),
            F.col("props").alias("payload"),
        ).alias("after"),
        F.lit("c").alias("op"),
        F.struct(
            F.lit("testdb").alias("db"),
            F.lit("outbox").alias("table"),
            F.col("event_id").alias("pos"),
            F.lit(None).cast("string").alias("tx_id"),
            F.lit(None).cast("string").alias("snapshot"),
        ).alias("source"),
    )
    routed = outbox_event_router(
        outbox_rows, expand_json_fields={"k_value": "$.k"}
    )
    return routed.withColumn("k_value", F.col("k_value").cast("int"))


@register(
    "t7b_outbox_config_surface",
    oracle="""
    SELECT CAST(user_id AS VARCHAR) AS key,
           CASE WHEN event_id % 10 = 0 THEN NULL ELSE props END AS payload,
           'app.' || event_type || '.events' AS __topic,
           event_id AS __pos,
           CASE WHEN event_id % 10 = 0 THEN NULL
                ELSE CAST(event_id AS VARCHAR) END AS event_uuid,
           event_type AS h_type
    FROM events
    """,
)
def t7b_outbox_config_surface(spark, sf_dir):
    """T7 config parity: ${routedByValue} topic template, additional-field
    placements (envelope + header), and DELETE->tombstone (key+topic kept,
    payload/envelope extras nulled) - EventRouterConfigDefinition.java:239-342,
    EventRouterDelegate.java:59. Every 10th outbox row arrives as a DELETE."""
    ev = t(spark, sf_dir, "events")
    is_del = F.col("event_id") % 10 == 0
    img = F.struct(
        F.col("event_id").cast("string").alias("id"),
        F.col("event_type").alias("aggregatetype"),
        F.col("user_id").cast("string").alias("aggregateid"),
        F.col("props").alias("payload"),
    )
    outbox_rows = ev.select(
        F.struct(F.col("event_id").alias("id")).alias("key"),
        F.when(is_del, img).alias("before"),
        F.when(~is_del, img).alias("after"),
        F.when(is_del, F.lit("d")).otherwise("c").alias("op"),
        F.struct(
            F.lit("testdb").alias("db"),
            F.lit("outbox").alias("table"),
            F.col("event_id").alias("pos"),
            F.lit(None).cast("string").alias("tx_id"),
            F.lit(None).cast("string").alias("snapshot"),
        ).alias("source"),
    )
    routed = outbox_event_router(
        outbox_rows,
        route_topic_replacement="app.${routedByValue}.events",
        additional_fields=(
            ("id", "envelope", "event_uuid"),
            ("aggregatetype", "header", "h_type"),
        ),
        delete_handling="tombstone",
    )
    return routed.select(
        "key", "payload", "__topic", "__pos", "event_uuid",
        F.col("__headers")["h_type"].alias("h_type"),
    )


# ---------------------------------------------------------------------------
# T8 — header to value
# ---------------------------------------------------------------------------
@register(
    "t8_header_to_value",
    oracle=f"""
    WITH {CHANGES_CTE}
    SELECT pos, 'testdb' AS h_db, op AS h_op FROM changes
    """,
)
def t8_header_to_value(spark, sf_dir):
    from debezium_spark.operators import header_to_value

    env = accounts_changefeed(spark, sf_dir)
    with_headers = env.withColumn(
        "headers",
        F.create_map(
            F.lit("db"), F.col("source.db"), F.lit("op"), F.col("op")
        ),
    )
    out = header_to_value(with_headers, ["db", "op"], operation="copy", prefix="h_")
    return out.select(F.col("source.pos").alias("pos"), "h_db", "h_op")


# ---------------------------------------------------------------------------
# T9 — timezone conversion
# ---------------------------------------------------------------------------
@register(
    "t9_timezone_converter",
    oracle="""
    SELECT event_id,
           strftime(timezone('America/New_York',
                             timezone('UTC', CAST(ts AS TIMESTAMP))),
                    '%Y-%m-%d %H:%M:%S.%f') AS ts_local
    FROM events
    """,
)
def t9_timezone_converter(spark, sf_dir):
    """UTC → zone conversion (TimezoneConverter.java:57,69-96). The fixture's
    nanos column is rebuilt into a µs timestamp first; output is formatted so
    both engines compare a string, not engine-specific timestamp encodings."""
    from debezium_spark.sources.changefeed import events_with_ts

    ev = events_with_ts(spark, sf_dir).withColumnRenamed("ts_utc", "ts_t")
    out = convert_timezone_fields(ev, "America/New_York", include=("ts_t",))
    return out.select(
        "event_id",
        F.date_format("ts_t", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts_local"),
    )


# ---------------------------------------------------------------------------
# T11 — record size guard
# ---------------------------------------------------------------------------
@register(
    "t11_enforce_record_size",
    oracle="SELECT doc_id, n_chars FROM documents WHERE n_chars <= 300",
)
def t11_enforce_record_size(spark, sf_dir):
    docs = t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    return enforce_record_size(docs, 300, size_col="n_chars")


# ---------------------------------------------------------------------------
# T17 — masking / pseudonymization / truncation
# ---------------------------------------------------------------------------
@register(
    "t17_mask_columns",
    oracle="""
    SELECT c_custkey AS id,
           sha256('pepper' || c_name) AS name_hash,
           '***' AS segment_masked,
           substr(c_name, 1, 10) AS name_trunc
    FROM customer
    """,
)
def t17_mask_columns(spark, sf_dir):
    cust = t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("id"),
        F.col("c_name").alias("name_hash"),
        F.col("c_mktsegment").alias("segment_masked"),
        F.col("c_name").alias("name_trunc"),
    )
    cust = hash_mask(cust, "name_hash", "pepper")
    cust = mask_string(cust, "segment_masked")
    cust = truncate_column(cust, "name_trunc", 10)
    return cust


# ---------------------------------------------------------------------------
# T18 — reselect columns (stream-static lookup join)
# ---------------------------------------------------------------------------
@register(
    "t18_reselect_columns",
    oracle=f"""
    WITH {CHANGES_CTE}
    SELECT c.pos, c.id, cu.c_mktsegment AS status_reselected
    FROM changes c JOIN customer cu ON cu.c_custkey = c.id
    WHERE c.op = 'u'
    """,
)
def t18_reselect_columns(spark, sf_dir):
    """ReselectColumnsPostProcessor.java:68-73 — re-query the source row to
    fill columns unavailable in the event. Spark: broadcast lookup join
    against the source table (a static DataFrame in streaming)."""
    env = accounts_changefeed(spark, sf_dir).filter(F.col("op") == "u")
    cust = t(spark, sf_dir, "customer")
    return (
        env.join(
            F.broadcast(cust), env["key.id"] == cust["c_custkey"], "inner"
        ).select(
            F.col("source.pos").alias("pos"),
            F.col("key.id").alias("id"),
            F.col("c_mktsegment").alias("status_reselected"),
        )
    )


# ---------------------------------------------------------------------------
# K4 — last-write-wins reduction
# ---------------------------------------------------------------------------
@register(
    "k4_reduce_last_per_key",
    oracle=f"""
    WITH {CHANGES_CTE}, {LATEST_CTE}
    SELECT id, status, balance, pos, op FROM latest
    """,
)
def k4_reduce_last_per_key(spark, sf_dir):
    env = accounts_changefeed(spark, sf_dir)
    latest = reduce_last_per_key(env)
    return latest.select(
        F.col("key.id").alias("id"),
        F.col("after.status").alias("status"),
        F.col("after.balance").alias("balance"),
        F.col("source.pos").alias("pos"),
        F.col("op").alias("op"),
    )


# ---------------------------------------------------------------------------
# K1/K2 — MERGE sink, three insert modes (flagship = upsert)
# ---------------------------------------------------------------------------
_MERGE_PRELUDE = f"WITH {CHANGES_CTE}, {LATEST_CTE}, {SNAPSHOT_CTE}"

@register(
    "k1_merge_upsert",
    oracle=_MERGE_PRELUDE
    + """
    SELECT id, status, balance FROM snap ANTI JOIN latest USING (id)
    UNION ALL
    SELECT id, status, balance FROM latest WHERE op <> 'd'
    """,
)
def k1_merge_upsert(spark, sf_dir):
    """Flagship: snapshot ∪ change feed materialized via MERGE upsert —
    exercises S1 + T1 + K4 + K1 in one pipeline (SURVEY §7.1)."""
    target = _snapshot_flat(spark, sf_dir)
    env = accounts_changefeed(spark, sf_dir)
    return merge_changes(target, env, ["id"], insert_mode="upsert")


@register(
    "k2_merge_insert_mode",
    oracle=_MERGE_PRELUDE
    + """
    SELECT id, status, balance FROM snap
    UNION ALL
    SELECT id, status, balance FROM latest WHERE op = 'c'
    """,
)
def k2_merge_insert_mode(spark, sf_dir):
    target = _snapshot_flat(spark, sf_dir)
    env = accounts_changefeed(spark, sf_dir)
    return merge_changes(target, env, ["id"], insert_mode="insert")


@register(
    "k2_merge_update_mode",
    oracle=_MERGE_PRELUDE
    + """
    SELECT s.id, s.status, s.balance FROM snap s ANTI JOIN latest l USING (id)
    UNION ALL
    SELECT l.id, l.status, l.balance
    FROM latest l SEMI JOIN snap s ON s.id = l.id
    WHERE l.op <> 'd'
    """,
)
def k2_merge_update_mode(spark, sf_dir):
    target = _snapshot_flat(spark, sf_dir)
    env = accounts_changefeed(spark, sf_dir)
    return merge_changes(target, env, ["id"], insert_mode="update")


# ---------------------------------------------------------------------------
# S3 — incremental snapshot window dedup (stream wins)
# ---------------------------------------------------------------------------
@register(
    "s3_incremental_snapshot_dedup",
    oracle=f"""
    WITH {CHANGES_CTE}, {SNAPSHOT_CTE},
    win AS (SELECT DISTINCT id FROM changes WHERE pos < 500)
    SELECT id, status, balance FROM snap ANTI JOIN win USING (id)
    """,
)
def s3_incremental_snapshot_dedup(spark, sf_dir):
    """The DBLog window: chunk rows whose PK saw a streamed change inside the
    low/high-watermark window are evicted
    (AbstractIncrementalSnapshotChangeEventSource.java:198-207)."""
    chunk = _snapshot_flat(spark, sf_dir)
    window_events = (
        accounts_changefeed(spark, sf_dir)
        .filter(F.col("source.pos") < 500)
        .select(F.col("key.id").alias("id"))
    )
    return incremental_snapshot_chunk(chunk, window_events, ["id"])


# ---------------------------------------------------------------------------
# P4 — transaction metadata enrichment + boundaries
# ---------------------------------------------------------------------------
@register(
    "p4_transaction_metadata",
    oracle=f"""
    WITH {CHANGES_CTE}
    SELECT pos, tx_id,
           row_number() OVER (PARTITION BY tx_id ORDER BY pos) AS total_order,
           row_number() OVER (PARTITION BY tx_id ORDER BY pos) AS data_collection_order
    FROM changes
    """,
)
def p4_transaction_metadata(spark, sf_dir):
    env = enrich_transaction_metadata(accounts_changefeed(spark, sf_dir))
    return env.select(
        F.col("source.pos").alias("pos"),
        F.col("transaction.id").alias("tx_id"),
        F.col("transaction.total_order").alias("total_order"),
        F.col("transaction.data_collection_order").alias("data_collection_order"),
    )


@register(
    "p4_transaction_boundaries",
    oracle=f"""
    WITH {CHANGES_CTE}
    SELECT tx_id, count(*) AS event_count, min(pos) AS begin_pos, max(pos) AS end_pos
    FROM changes GROUP BY tx_id
    """,
)
def p4_transaction_boundaries(spark, sf_dir):
    return transaction_boundaries(accounts_changefeed(spark, sf_dir))


# ---------------------------------------------------------------------------
# Tombstones (envelope semantics, CommonConnectorConfig.java:690)
# ---------------------------------------------------------------------------
@register(
    "tombstones_on_delete",
    oracle=f"""
    WITH {CHANGES_CTE}
    SELECT coalesce(op, 'tombstone') AS op_kind, count(*) AS n
    FROM (
        SELECT op FROM changes
        UNION ALL
        SELECT NULL AS op FROM changes WHERE op = 'd'
    ) GROUP BY 1
    """,
)
def tombstones_on_delete(spark, sf_dir):
    env = with_tombstones(accounts_changefeed(spark, sf_dir))
    return env.groupBy(
        F.coalesce(F.col("op"), F.lit("tombstone")).alias("op_kind")
    ).agg(F.count("*").alias("n"))


# ---------------------------------------------------------------------------
# P9 — error handling / DLQ split
# ---------------------------------------------------------------------------
@register(
    "p9_dlq_quarantine",
    oracle="""
    SELECT CASE WHEN value > 190.0 THEN 'dlq' ELSE 'ok' END AS stream,
           count(*) AS n
    FROM events GROUP BY 1
    """,
)
def p9_dlq_quarantine(spark, sf_dir):
    """EventProcessingFailureHandlingMode=skip: poison records route to a
    quarantine (DLQ) table instead of failing the pipeline
    (CommonConnectorConfig.java:153; debezium-sink/.../dlq/ErrorReporter.java).
    Deterministic stand-in for a decode failure: value > 190."""
    ev = t(spark, sf_dir, "events")
    return ev.withColumn(
        "stream", F.when(F.col("value") > 190.0, "dlq").otherwise("ok")
    ).groupBy("stream").agg(F.count("*").alias("n"))


# ---------------------------------------------------------------------------
# F2 — JSON serde (consume-side unwrap)
# ---------------------------------------------------------------------------
@register(
    "f2_json_serde",
    oracle="""
    SELECT event_id, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
    FROM events
    """,
)
def f2_json_serde(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k"),
    )


# ---------------------------------------------------------------------------
# F4 — Avro binary envelope roundtrip (pure-Python codec)
# ---------------------------------------------------------------------------
@register(
    "f4_avro_roundtrip",
    oracle="""
    SELECT c_custkey AS id, c_mktsegment AS status, c_acctbal AS balance,
           'r' AS op
    FROM customer
    """,
)
def f4_avro_roundtrip(spark, sf_dir):
    """F1's Avro leg without the spark-avro jar: each flattened snapshot
    record is encoded to Avro binary (spec-conformant codec,
    formats/avro_codec.py, goldens in tests/test_avro.py) and decoded back;
    the oracle checks the decode equals the source. Reference format:
    debezium-api/src/main/java/io/debezium/engine/format/Avro.java."""
    from debezium_spark.formats.avro_codec import avro_roundtrip

    env = accounts_snapshot(spark, sf_dir)
    flat = env.select(
        F.col("after.id").alias("id"),
        F.col("after.status").alias("status"),
        F.col("after.balance").alias("balance"),
        F.col("op"),
    )
    rt = avro_roundtrip(flat, ["id", "status", "balance", "op"])
    return rt.select("id", "status", "balance", "op")


# ---------------------------------------------------------------------------
# F5 — Protobuf binary envelope roundtrip (pure-Python wire codec)
# ---------------------------------------------------------------------------
@register(
    "f5_protobuf_roundtrip",
    oracle="""
    SELECT c_custkey AS id, c_mktsegment AS status, c_acctbal AS balance,
           'r' AS op
    FROM customer
    """,
)
def f5_protobuf_roundtrip(spark, sf_dir):
    """F1's Protobuf leg without a protobuf runtime: each flattened snapshot
    record is encoded to Protobuf wire format (spec-conformant codec,
    formats/protobuf_codec.py, goldens against the encoding doc's own
    examples in tests/test_protobuf.py) and decoded back; the oracle checks
    the decode equals the source. Reference format:
    debezium-api/src/main/java/io/debezium/engine/format/Protobuf.java."""
    from debezium_spark.formats.protobuf_codec import protobuf_roundtrip

    env = accounts_snapshot(spark, sf_dir)
    flat = env.select(
        F.col("after.id").alias("id"),
        F.col("after.status").alias("status"),
        F.col("after.balance").alias("balance"),
        F.col("op"),
    )
    rt = protobuf_roundtrip(flat, ["id", "status", "balance", "op"])
    return rt.select("id", "status", "balance", "op")


# ---------------------------------------------------------------------------
# K9 — incremental view maintenance (grouped aggregate from the stream)
# ---------------------------------------------------------------------------
@register(
    "k9_incremental_aggregate",
    oracle=_MERGE_PRELUDE
    + """
    SELECT status,
           CAST(sum(CAST(balance AS DECIMAL(18,2))) AS DOUBLE)
               AS total_balance,
           count(*) AS n
    FROM (
        SELECT id, status, balance FROM snap ANTI JOIN latest USING (id)
        UNION ALL
        SELECT id, status, balance FROM latest WHERE op <> 'd'
    )
    GROUP BY status
    """,
)
def k9_incremental_aggregate(spark, sf_dir):
    """Incremental view maintenance: per-status SUM(balance)/COUNT kept
    live from the snapshot ∪ change stream alone — per-key retract/assert
    deltas (previous state reconstructed via lag, since this feed carries
    no before-images) telescope to exactly the final state. The oracle is
    the BATCH aggregate over the fully merged table: incremental and
    batch must agree to the bit (decimal sums — retract/assert pairs
    cancel exactly where floats would drift)."""
    from debezium_spark.operators.reduce import maintain_group_aggregate

    env = accounts_snapshot(spark, sf_dir).unionByName(
        accounts_changefeed(spark, sf_dir)
    )
    return maintain_group_aggregate(
        env, key_cols=["id"], group_col="status", value_col="balance"
    )


@register(
    "k11_incremental_avg",
    oracle=_MERGE_PRELUDE
    + """
    SELECT status,
           CAST(sum(CAST(balance AS DECIMAL(18,2))) AS DOUBLE)
               / CAST(count(*) AS DOUBLE) AS avg_balance
    FROM (
        SELECT id, status, balance FROM snap ANTI JOIN latest USING (id)
        UNION ALL
        SELECT id, status, balance FROM latest WHERE op <> 'd'
    )
    GROUP BY status
    """,
)
def k11_incremental_avg(spark, sf_dir):
    """IVM derived AVG: maintained as explicit exact-decimal sum over
    exact count, divided once as doubles (IEEE division is deterministic,
    so the oracle's CAST(sum)/CAST(count) reproduces it bit-for-bit —
    never a running mean, which differs across engines). The supported-
    aggregate contract (sum/count/avg; MIN/MAX raise) is asserted in
    tests/test_merge_edges.py."""
    from debezium_spark.operators.reduce import maintain_group_aggregate

    env = accounts_snapshot(spark, sf_dir).unionByName(
        accounts_changefeed(spark, sf_dir)
    )
    return maintain_group_aggregate(
        env,
        key_cols=["id"],
        group_col="status",
        value_col="balance",
        aggs=("avg",),
    )


# ---------------------------------------------------------------------------
# K10 — net-effect compaction (changelog-normalize semantics)
# ---------------------------------------------------------------------------
@register(
    "k10_net_effect",
    oracle=f"""
    WITH {CHANGES_CTE},
    agg AS (
        SELECT id,
               min_by(op, pos) AS first_op,
               max_by(op, pos) AS last_op,
               max_by(status, pos) AS last_status,
               max_by(balance, pos) AS last_balance
        FROM changes GROUP BY id
    )
    SELECT id,
           CASE WHEN first_op = 'c' THEN 'c'
                WHEN last_op = 'd' THEN 'd'
                ELSE 'u' END AS net_op,
           CASE WHEN last_op <> 'd' THEN last_status END AS status,
           CASE WHEN last_op <> 'd' THEN last_balance END AS balance
    FROM agg
    WHERE NOT (first_op = 'c' AND last_op = 'd')
    """,
)
def k10_net_effect(spark, sf_dir):
    """Batch-window compaction to net effect per key — stronger than K4's
    last-wins: create+delete inside the window vanishes, create+updates
    collapse to one create with final state, surviving keys emit one
    update, deletions of pre-existing keys one delete (the
    changelog-normalize / log-compaction contract downstream changelog
    consumers need). One map-side-combinable aggregation on the key."""
    from debezium_spark.operators.reduce import net_effect_per_key

    env = accounts_changefeed(spark, sf_dir)
    out = net_effect_per_key(env, key_cols=["id"])
    return out.select(
        "id", "net_op",
        F.col("after.status").alias("status"),
        F.col("after.balance").alias("balance"),
    )


# ---------------------------------------------------------------------------
# K12 — source↔sink consistency audit (bucketed fingerprints)
# ---------------------------------------------------------------------------
def _k12_oracle() -> str:
    from debezium_spark.operators.audit import oracle_fingerprint_sql

    merged = """(
        SELECT id, status, balance FROM snap ANTI JOIN latest USING (id)
        UNION ALL
        SELECT id, status, balance FROM latest WHERE op <> 'd'
    )"""
    return _MERGE_PRELUDE + oracle_fingerprint_sql(
        merged,
        ["id"],
        ["status", "CAST(balance AS DECIMAL(18,2))"],
        num_buckets=64,
    )


@register("k12_sink_fingerprint", oracle=_k12_oracle())
def k12_sink_fingerprint(spark, sf_dir):
    """Consistency audit the way production runs it: the sink's bucketed
    fingerprint (one scan, one hash agg → 64 rows) against the SOURCE
    database computing its own fingerprint in plain ANSI SQL — matching
    rows prove sink ≡ source without either side shipping a row, and a
    mismatch names the bucket to re-snapshot. Floats render through
    DECIMAL(18,2) (raw float→string differs across engines); hash sums
    are mod-prime so BIGINT holds them on any engine."""
    from debezium_spark.operators.audit import table_fingerprint

    target = _snapshot_flat(spark, sf_dir)
    env = accounts_changefeed(spark, sf_dir)
    merged = merge_changes(target, env, ["id"], insert_mode="upsert")
    return table_fingerprint(
        merged,
        ["id"],
        ["status", F.col("balance").cast("decimal(18,2)")],
        num_buckets=64,
    )


# ---------------------------------------------------------------------------
# K13 — SCD2 history materialization (the type-2 dimension consumer)
# ---------------------------------------------------------------------------
@register(
    "k13_scd2_history",
    oracle=f"""
    WITH {CHANGES_CTE},
    v AS (
        SELECT id, status, balance, op,
               pos AS valid_from_pos,
               lead(pos) OVER (PARTITION BY id ORDER BY pos) AS valid_to_pos
        FROM changes
    )
    SELECT id, status, balance, valid_from_pos, valid_to_pos,
           (valid_to_pos IS NULL) AS is_current
    FROM v
    WHERE op <> 'd'
    """,
)
def k13_scd2_history(spark, sf_dir):
    """Type-2 dimension from the change feed: every version of every key
    with its [valid_from_pos, valid_to_pos) interval; deletes close their
    predecessor and open nothing. One per-key lead() window — the same
    key-clustered shuffle the MERGE path pays."""
    from debezium_spark.operators.reduce import scd2_history

    env = accounts_changefeed(spark, sf_dir)
    return scd2_history(env, key_cols=["id"])


# ---------------------------------------------------------------------------
# K14 — sequence-continuity audit (per-transaction gap detection)
# ---------------------------------------------------------------------------
@register(
    "k14_sequence_gaps",
    oracle=f"""
    WITH {CHANGES_CTE},
    surv AS (
        SELECT CAST(tx_id AS BIGINT) AS tx, pos FROM changes
        WHERE pos % 97 <> 0
    ),
    lagged AS (
        SELECT tx, pos,
               lag(pos) OVER (PARTITION BY tx ORDER BY pos) AS prev
        FROM surv
    )
    SELECT tx, prev + 1 AS gap_start, pos - 1 AS gap_end,
           pos - prev - 1 AS n_missing
    FROM lagged
    WHERE prev IS NOT NULL AND pos > prev + 1
    """,
)
def k14_sequence_gaps(spark, sf_dir):
    """Within-transaction sequence audit: drop every 97th event (simulated
    loss — DLQ'd, dropped, in flight) and report each transaction's
    missing position ranges. The reference's buffered LogMiner assembly
    implicitly needs every event of a tx before COMMIT emission; this is
    that completeness check as a first-class operator (and the Kafka
    per-partition offset-contiguity audit, same shape). One tx-key
    shuffle, per-tx lag — thousands of independent groups, no
    single-partition window, no expected-range explode. Pairs with k12:
    fingerprints say WHETHER a slice diverged, gaps say exactly WHICH
    positions to re-snapshot."""
    from debezium_spark.operators.audit import sequence_gaps
    from debezium_spark.sources.changefeed import accounts_changefeed

    feed = (
        accounts_changefeed(spark, sf_dir)
        .filter(F.col("source.pos") % 97 != 0)
        .select(
            F.col("source.tx_id").cast("long").alias("tx"),
            F.col("source.pos").alias("pos"),
        )
    )
    return sequence_gaps(feed, "pos", ["tx"])
