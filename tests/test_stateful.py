"""Golden run for the stateful transaction assembler: transactions split
across micro-batches complete only when their COMMIT arrives; uncommitted
transactions stay buffered (LogMiner buffered-mode semantics).
"""

from __future__ import annotations

import os
import shutil
import time

from pyspark.sql import functions as F

from debezium_spark.sources.changefeed import accounts_changefeed
from debezium_spark.streaming.stateful import transaction_boundaries_stream


def _write_ordered_chunks(df, feed, num_chunks):
    from pyspark.sql import Window

    chunked = df.withColumn(
        "__chunk", F.ntile(num_chunks).over(Window.orderBy("pos"))
    ).localCheckpoint(eager=True)
    os.makedirs(feed, exist_ok=True)
    for i in range(1, num_chunks + 1):
        part = chunked.filter(F.col("__chunk") == i).drop("__chunk")
        tmp = f"{feed}/__t{i}"
        part.coalesce(1).write.mode("overwrite").parquet(tmp)
        data = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
        final = f"{feed}/chunk_{i:03d}.parquet"
        os.replace(os.path.join(tmp, data), final)
        shutil.rmtree(tmp)
        mt = time.time() + i
        os.utime(final, (mt, mt))


def test_tx_assembly_across_batches(spark, sf_dir, tmp_path):
    env = accounts_changefeed(spark, sf_dir)
    # tx = pos//16; commit marker = last event of the tx ((pos+1) % 16 == 0).
    feed_df = env.select(
        F.col("source.tx_id").alias("tx_id"),
        F.col("source.pos").alias("pos"),
        ((F.col("source.pos") + 1) % 16 == 0).alias("is_commit"),
    )
    feed = str(tmp_path / "feed")
    _write_ordered_chunks(feed_df, feed, 5)

    stream = (
        spark.readStream.schema("tx_id string, pos long, is_commit boolean")
        .option("maxFilesPerTrigger", 1)
        .parquet(feed)
    )
    out = transaction_boundaries_stream(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("tx_bounds")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        r["tx_id"]: (r["event_count"], r["first_pos"], r["last_pos"])
        for r in spark.sql("SELECT * FROM tx_bounds").collect()
    }

    # Expected: exactly the transactions whose commit marker exists in the
    # feed, with full event counts even though chunk boundaries (ntile of
    # 1000 rows into 5 chunks of 200 = not a multiple of 16) split many
    # transactions across micro-batches.
    expected_rows = (
        feed_df.groupBy("tx_id")
        .agg(
            F.count("*").alias("n"),
            F.min("pos").alias("lo"),
            F.max("pos").alias("hi"),
            F.max(F.col("is_commit").cast("int")).alias("has_commit"),
        )
        .filter(F.col("has_commit") == 1)
        .collect()
    )
    expected = {r["tx_id"]: (r["n"], r["lo"], r["hi"]) for r in expected_rows}
    assert got == expected
    # And at least one uncommitted tx was held back (the tail of the feed).
    all_tx = feed_df.select("tx_id").distinct().count()
    assert len(got) <= all_tx


def test_tx_retention_expires_abandoned_to_dlq(spark, tmp_path):
    """Bounded state (the reference's log.mining.transaction.retention.ms):
    a begin-without-commit transaction idle past retention is expired as an
    ABANDONED record (routed to the DLQ here), its state row is REMOVED
    (proved by the late commit re-counting from zero), and committed
    transactions are unaffected."""
    import pandas as pd

    from debezium_spark.sinks.dlq import DeadLetterQueue
    from pyspark.sql import functions as F

    feed = str(tmp_path / "feed")
    os.makedirs(feed, exist_ok=True)
    chunks = [
        # batch 1: tx A begins (3 events, never commits), tx B commits.
        pd.DataFrame(
            {
                "tx_id": ["A", "A", "A", "B", "B"],
                "pos": [1, 2, 3, 4, 5],
                "is_commit": [False, False, False, False, True],
            }
        ),
        # batch 2: unrelated tx C commits; drives the timeout sweep that
        # expires A (retention 1 ms elapsed since batch 1).
        pd.DataFrame(
            {"tx_id": ["C", "C"], "pos": [6, 7], "is_commit": [False, True]}
        ),
        # batch 3: A's commit finally arrives — AFTER expiry, so it must
        # assemble from fresh state (count 1), proving removal.
        pd.DataFrame({"tx_id": ["A"], "pos": [8], "is_commit": [True]}),
    ]
    for i, pdf in enumerate(chunks, 1):
        spark.createDataFrame(
            pdf, "tx_id string, pos long, is_commit boolean"
        ).coalesce(1).write.mode("overwrite").parquet(f"{feed}/../__t{i}")
        src = f"{feed}/../__t{i}"
        data = next(f for f in os.listdir(src) if f.endswith(".parquet"))
        final = f"{feed}/chunk_{i:03d}.parquet"
        os.replace(os.path.join(src, data), final)
        shutil.rmtree(src)
        mt = time.time() + i
        os.utime(final, (mt, mt))

    stream = (
        spark.readStream.schema("tx_id string, pos long, is_commit boolean")
        .option("maxFilesPerTrigger", 1)
        .parquet(feed)
    )
    out = transaction_boundaries_stream(stream, retention_ms=1)
    dlq = DeadLetterQueue(spark, str(tmp_path / "dlq"))
    done_path = str(tmp_path / "done")

    # ProcessingTimeTimeout makes Spark schedule no-data micro-batches
    # indefinitely (each could fire a timeout), so an availableNow query
    # never terminates with the default conf. Expiry only needs A BATCH to
    # run — batch 2's data batch sweeps A here — so disabling no-data
    # batches keeps the test deterministic AND terminating. (Production
    # continuous triggers keep the default: idle streams still expire
    # abandoned transactions; see transaction_boundaries_stream's docs.)
    no_data_key = "spark.sql.streaming.noDataMicroBatches.enabled"
    prev = spark.conf.get(no_data_key)
    spark.conf.set(no_data_key, "false")

    def route(batch, epoch_id):
        abandoned = batch.filter(F.col("status") == "ABANDONED")
        if abandoned.limit(1).count():
            dlq.quarantine(
                abandoned,
                reason="transaction retention expired",
                epoch_id=epoch_id,
            )
        batch.filter(F.col("status") == "END").write.mode("append").parquet(
            done_path
        )

    try:
        q = (
            out.writeStream.foreachBatch(route)
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set(no_data_key, prev)

    dlq_rows = dlq.read().collect()
    assert len(dlq_rows) == 1
    (ab,) = dlq_rows
    assert ab["tx_id"] == "A" and ab["status"] == "ABANDONED"
    assert (ab["event_count"], ab["first_pos"], ab["last_pos"]) == (3, 1, 3)
    assert ab["__error"] == "transaction retention expired"

    done = {
        r["tx_id"]: (r["event_count"], r["first_pos"], r["last_pos"])
        for r in spark.read.parquet(done_path).collect()
    }
    # B and C committed normally; A's late commit rebuilt from EMPTY state.
    assert done == {"B": (2, 4, 5), "C": (2, 6, 7), "A": (1, 8, 8)}


def test_funnel_stream_matches_batch(spark, sf_dir, tmp_path):
    """The streaming funnel's final per-user state (latest emitted row per
    user) must equal the batch operator exactly when events replay in
    event-time order across micro-batches — the CDC log-order contract.
    Also: a user whose funnel doesn't progress in a batch emits nothing
    that batch (append-mode discipline)."""
    from debezium_spark.operators.funnel import (
        funnel_steps,
        funnel_steps_stream,
    )

    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select(
            "user_id",
            "event_type",
            F.col("ts").cast("timestamp").alias("ts_utc"),
            F.col("event_id").alias("pos"),
        )
        .filter(F.col("event_type").isin("view", "click", "purchase"))
    )
    steps = ["view", "click", "purchase"]
    # replay in EVENT-TIME order so cross-batch arrival honors the contract
    feed_df = ev.withColumn("pos", F.unix_micros("ts_utc"))
    feed = str(tmp_path / "feed")
    _write_ordered_chunks(feed_df, feed, 4)

    stream = (
        spark.readStream.schema(
            "user_id long, event_type string, ts_utc timestamp, pos long"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(feed)
    )
    out = funnel_steps_stream(stream, steps)
    q = (
        out.writeStream.format("memory")
        .queryName("funnel_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    emitted = spark.sql("SELECT * FROM funnel_stream").collect()
    assert emitted, "stream should emit progress rows"
    # latest emission per user = final state (step_reached is monotone)
    final = {}
    for r in emitted:
        cur = final.get(r["user"])
        if cur is None or r["step_reached"] > cur["step_reached"]:
            final[r["user"]] = r
    got = {
        u: (r["t1"], r["t2"], r["t3"]) for u, r in final.items()
    }
    batch = {
        r["user_id"]: (r["t1"], r["t2"], r["t3"])
        for r in funnel_steps(ev, steps).collect()
    }
    # streaming emits only users who progressed at least to step 1; the
    # batch frame carries all-NULL rows for users who never reached step 1
    batch_reached = {u: t for u, t in batch.items() if t[0] is not None}
    assert got == batch_reached
    # append discipline: total emissions <= users x steps (one per progress)
    assert len(emitted) <= len(batch_reached) * len(steps)


def test_funnel_event_time_straggler_completes(spark, tmp_path):
    """Event-time variant: a straggler step-1 event arriving a micro-batch
    AFTER its user's step-2 event still completes the funnel (the
    log-order variant drops that progress by design). Watermark is wide
    enough that nothing is late-dropped."""
    import datetime as dt

    from debezium_spark.operators.funnel import (
        funnel_steps,
        funnel_steps_stream_event_time,
    )

    t = lambda m: dt.datetime(2024, 1, 1, 10, m)  # noqa: E731
    # u1: step-2 first (batch 1), straggler step-1 later (batch 2)
    # u2: in-order control across the same batches
    batch1 = [(1, "click", t(20)), (2, "view", t(5))]
    batch2 = [(1, "view", t(10)), (2, "click", t(25))]
    schema = "user_id long, event_type string, ts_utc timestamp"
    feed = str(tmp_path / "feed")
    os.makedirs(feed, exist_ok=True)
    for i, rows in enumerate([batch1, batch2], start=1):
        tmp = f"{feed}/__t{i}"
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(tmp)
        data = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
        os.replace(os.path.join(tmp, data), f"{feed}/chunk_{i:03d}.parquet")
        shutil.rmtree(tmp)
        mt = time.time() + i
        os.utime(f"{feed}/chunk_{i:03d}.parquet", (mt, mt))

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(feed)
    )
    out = funnel_steps_stream_event_time(
        stream, ["view", "click"], watermark_delay="1 hour"
    )
    q = (
        out.writeStream.format("memory")
        .queryName("funnel_et")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    emitted = spark.sql("SELECT * FROM funnel_et").collect()
    final = {}
    for r in emitted:
        cur = final.get(r["user"])
        if cur is None or r["step_reached"] >= cur["step_reached"]:
            final[r["user"]] = r
    # u1 completed DESPITE the out-of-order arrival
    assert final[1]["step_reached"] == 2
    assert (final[1]["t1"], final[1]["t2"]) == (t(10), t(20))
    assert final[2]["step_reached"] == 2
    # exactness: equals the batch operator over the union of all events
    ev = spark.createDataFrame(batch1 + batch2, schema)
    batch = {
        r["user_id"]: (r["t1"], r["t2"])
        for r in funnel_steps(ev, ["view", "click"]).collect()
    }
    got = {u: (r["t1"], r["t2"]) for u, r in final.items()}
    assert got == batch
