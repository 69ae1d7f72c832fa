"""Event-time semantics under streaming execution: watermarks close windows
and drop late data (append mode) — the behavior the batch window queries
(suite/windows.py) can't show.
"""

from __future__ import annotations

import os
import time
from datetime import datetime

from pyspark.sql import functions as F


def _write_chunk(spark, rows, path, seq):
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    tmp = f"{path}/__tmp_{seq}"
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    data = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
    final = f"{path}/chunk_{seq:03d}.parquet"
    os.replace(os.path.join(tmp, data), final)
    import shutil

    shutil.rmtree(tmp)
    mtime = time.time() + seq * 0.01
    os.utime(final, (mtime, mtime))


def test_watermark_drops_late_data(spark, tmp_path):
    feed = str(tmp_path / "feed")
    os.makedirs(feed)
    t = lambda h, m: datetime(2024, 1, 1, h, m)  # noqa: E731

    # Batch 1: three events inside the 10:00-10:30 window.
    _write_chunk(
        spark,
        [(1, t(10, 0), 1.0), (1, t(10, 10), 1.0), (2, t(10, 20), 1.0)],
        feed,
        0,
    )
    # Batch 2: an 11:05 event pushes the watermark to 10:55.
    _write_chunk(spark, [(3, t(11, 5), 1.0)], feed, 1)
    # Batch 3: watermark propagation — Spark's late-event filter uses the
    # PREVIOUS batch's watermark (watermarkForLateEvents), so one more batch
    # must pass before 10:55 gates late arrivals; eviction (with the current
    # watermark) emits the closed 10:00 window during this batch.
    _write_chunk(spark, [(4, t(11, 6), 1.0)], feed, 2)
    # Batch 4: a 10:15 straggler arrives BEHIND the late-event watermark →
    # dropped (it would otherwise re-open the already-emitted window).
    _write_chunk(spark, [(9, t(10, 15), 99.0)], feed, 3)

    stream = (
        spark.readStream.schema("user_id long, ts timestamp, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(feed)
    )
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "30 minutes"))
        .agg(F.count("*").alias("n"), F.sum("value").alias("sv"))
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("wm_windows")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    rows = {
        r["window"]["start"].strftime("%H:%M"): (r["n"], r["sv"])
        for r in spark.sql("SELECT * FROM wm_windows").collect()
    }
    # The 10:00 window emitted exactly once, WITHOUT the late straggler
    # (n=3, sum=3.0 — not 4/102.0). The 11:00 window is still open (append
    # mode emits only closed windows), so it's absent.
    assert rows == {"10:00": (3, 3.0)}


def test_funnel_steps_order_and_edges(spark):
    """Hand-checkable funnel semantics: step times must be ordered
    (t1 <= t2 <= t3), a user doing B-before-A never reaches step 2 off
    that B, equal timestamps qualify (>= not >), and users missing step
    1 report all-NULL."""
    from datetime import datetime

    from debezium_spark.operators.funnel import funnel_steps

    T = datetime
    rows = [
        # u1: clean A -> B -> C
        (1, "view", T(2024, 1, 1, 10)),
        (1, "click", T(2024, 1, 1, 11)),
        (1, "purchase", T(2024, 1, 1, 12)),
        # u2: click BEFORE first view -> step2 must use the later click
        (2, "click", T(2024, 1, 1, 9)),
        (2, "view", T(2024, 1, 1, 10)),
        (2, "click", T(2024, 1, 1, 11)),
        # u3: click at the SAME instant as view -> >= admits it
        (3, "view", T(2024, 1, 1, 10)),
        (3, "click", T(2024, 1, 1, 10)),
        # u4: never views -> no steps at all
        (4, "click", T(2024, 1, 1, 10)),
        (4, "purchase", T(2024, 1, 1, 11)),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, ts_utc timestamp"
    )
    out = {
        r["user_id"]: r
        for r in funnel_steps(df, ["view", "click", "purchase"]).collect()
    }
    assert out[1]["t1"] < out[1]["t2"] < out[1]["t3"]
    assert out[2]["t2"] == T(2024, 1, 1, 11)  # not the 09:00 click
    assert out[2]["t3"] is None
    assert out[3]["t2"] == T(2024, 1, 1, 10)  # tie admitted
    assert out[4]["t1"] is None and out[4]["t2"] is None
    import pytest

    with pytest.raises(ValueError):
        funnel_steps(df, ["view"])
    with pytest.raises(ValueError):
        funnel_steps(df, ["view", "view"])


def test_funnel_null_timestamps_ignored(spark):
    """A NULL-timestamp event of the step-1 type must not null the user's
    funnel: the earliest REAL timestamped event wins (the r7 ADVICE repro —
    array_sort used to place the null-t struct first and F.get(hits,0)['t']
    returned NULL even though a timestamped view existed)."""
    from datetime import datetime

    from debezium_spark.operators.funnel import funnel_steps

    T = datetime
    rows = [
        (1, "view", None),
        (1, "view", T(2024, 1, 1, 10)),
        (1, "click", T(2024, 1, 1, 11)),
        # u2: ONLY a null-ts view -> never reaches step 1
        (2, "view", None),
        (2, "click", T(2024, 1, 1, 9)),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, ts_utc timestamp"
    )
    out = {
        r["user_id"]: r for r in funnel_steps(df, ["view", "click"]).collect()
    }
    assert out[1]["t1"] == T(2024, 1, 1, 10)
    assert out[1]["t2"] == T(2024, 1, 1, 11)
    assert out[2]["t1"] is None and out[2]["t2"] is None


def test_funnel_report_quoted_step_names(spark):
    """Step names containing single quotes must be escaped, not break (or
    inject into) the stack() SQL expression."""
    from datetime import datetime

    from debezium_spark.operators.funnel import funnel_report

    T = datetime
    rows = [
        (1, "add'l view", T(2024, 1, 1, 10)),
        (1, "click", T(2024, 1, 1, 11)),
        (2, "add'l view", T(2024, 1, 1, 10)),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, ts_utc timestamp"
    )
    got = {
        r["step_type"]: r["n_users"]
        for r in funnel_report(df, ["add'l view", "click"]).collect()
    }
    assert got == {"add'l view": 2, "click": 1}
