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
