"""Stream-stream interval join with watermarks — the event-time enrichment
shape (two live streams, bounded state) the batch suite can't exercise.
"""

from __future__ import annotations

import os
import shutil
import time
from datetime import datetime, timedelta

from pyspark.sql import functions as F


def _write(spark, rows, schema, path, seq):
    df = spark.createDataFrame(rows, schema)
    tmp = f"{path}/__t{seq}"
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    data = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
    os.makedirs(path, exist_ok=True)
    final = f"{path}/chunk_{seq:03d}.parquet"
    os.replace(os.path.join(tmp, data), final)
    shutil.rmtree(tmp)
    mt = time.time() + seq * 0.01
    os.utime(final, (mt, mt))


def test_stream_stream_interval_join(spark, tmp_path):
    """signups joined to purchases of the same user within [0, 1h) after
    the signup — both sides streaming, state bounded by the watermarks."""
    t0 = datetime(2024, 1, 1, 10, 0)
    t = lambda m: t0 + timedelta(minutes=m)  # noqa: E731
    signups = str(tmp_path / "signups")
    purchases = str(tmp_path / "purchases")
    os.makedirs(signups), os.makedirs(purchases)

    _write(spark, [(1, t(0)), (2, t(5)), (3, t(10))],
           "user_id long, s_ts timestamp", signups, 0)
    _write(
        spark,
        [
            (1, t(30), 10.0),   # inside the hour → joins
            (2, t(70), 20.0),   # 65 min after signup → outside → dropped
            (3, t(40), 30.0),   # inside → joins
            (3, t(50), 40.0),   # second purchase inside → joins too
        ],
        "user_id long, p_ts timestamp, amount double",
        purchases,
        0,
    )

    s = (
        spark.readStream.schema("user_id long, s_ts timestamp")
        .parquet(signups)
        .withWatermark("s_ts", "2 hours")
    )
    p = (
        spark.readStream.schema("user_id long, p_ts timestamp, amount double")
        .parquet(purchases)
        .withWatermark("p_ts", "2 hours")
    )
    joined = s.join(
        p,
        (s["user_id"] == p["user_id"])
        & (p["p_ts"] >= s["s_ts"])
        & (p["p_ts"] < s["s_ts"] + F.expr("INTERVAL 1 HOUR")),
    ).select(s["user_id"], "s_ts", "p_ts", "amount")

    q = (
        joined.writeStream.format("memory")
        .queryName("ssj")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(
        (r["user_id"], r["amount"])
        for r in spark.sql("SELECT * FROM ssj").collect()
    )
    assert got == [(1, 10.0), (3, 30.0), (3, 40.0)]
