"""Deterministic corpus export shards + streaming redelivery dedup."""

from __future__ import annotations

import os
import shutil
import time

from pyspark.sql import functions as F

from debezium_spark.analytics.export import export_corpus, shard_manifest


def test_export_corpus_shards_are_deterministic_and_ordered(spark, sf_dir, tmp_path):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    p1, p2 = str(tmp_path / "e1"), str(tmp_path / "e2")
    export_corpus(docs, p1, num_shards=4)
    export_corpus(docs, p2, num_shards=4)

    m1 = {
        (r["rows"], r["min_key"], r["max_key"])
        for r in shard_manifest(spark, p1).collect()
    }
    m2 = {
        (r["rows"], r["min_key"], r["max_key"])
        for r in shard_manifest(spark, p2).collect()
    }
    assert m1 == m2  # reproducible shard boundaries
    ranges = sorted(m1, key=lambda x: x[1])
    assert sum(r[0] for r in ranges) == docs.count()
    # Contiguous, non-overlapping key ranges (range partitioner contract).
    for (_, _, hi), (_, lo2, _) in zip(ranges, ranges[1:]):
        assert hi < lo2
    # Shards are internally sorted.
    any_file = next(
        f for f in os.listdir(p1) if f.endswith(".parquet")
    )
    ids = [
        r[0]
        for r in spark.read.parquet(os.path.join(p1, any_file))
        .select("doc_id")
        .collect()
    ]
    assert ids == sorted(ids)


def test_stream_dedup_within_watermark(spark, tmp_path):
    """At-least-once feed → effectively-once: redelivered events (same
    event_id, later batch) are dropped by dropDuplicatesWithinWatermark."""
    from datetime import datetime

    feed = str(tmp_path / "feed")
    os.makedirs(feed)

    def write(rows, seq):
        df = spark.createDataFrame(rows, "event_id long, ts timestamp, v double")
        tmp = f"{feed}/__t{seq}"
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        data = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
        final = f"{feed}/c{seq:03d}.parquet"
        os.replace(os.path.join(tmp, data), final)
        shutil.rmtree(tmp)
        mt = time.time() + seq * 0.01
        os.utime(final, (mt, mt))

    t = lambda m: datetime(2024, 1, 1, 10, m)  # noqa: E731
    write([(1, t(0), 1.0), (2, t(1), 2.0)], 0)
    write([(2, t(1), 2.0), (3, t(2), 3.0)], 1)  # event 2 redelivered
    write([(1, t(0), 1.0), (4, t(3), 4.0)], 2)  # event 1 redelivered

    stream = (
        spark.readStream.schema("event_id long, ts timestamp, v double")
        .option("maxFilesPerTrigger", 1)
        .parquet(feed)
        .withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["event_id"])
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("dedup_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(
        r["event_id"] for r in spark.sql("SELECT * FROM dedup_stream").collect()
    )
    assert got == [1, 2, 3, 4]
