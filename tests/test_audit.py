"""K12 consistency audit (bucketed fingerprints) + effectively-once
stream dedup."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from debezium_spark.operators.audit import (
    reconcile,
    table_fingerprint,
)


def _accounts(spark):
    return spark.createDataFrame(
        [(i, "ACTIVE" if i % 3 else "CLOSED", float(i) * 1.25) for i in range(200)],
        "id long, status string, balance double",
    )


def test_reconcile_equal_tables_is_empty(spark):
    a = _accounts(spark)
    b = _accounts(spark)
    assert (
        reconcile(a, b, ["id"], ["status", F.col("balance").cast("decimal(18,2)")])
        .count()
        == 0
    )


def test_reconcile_flags_exactly_the_corrupted_bucket(spark):
    """One silently corrupted value → exactly one mismatched bucket, the
    corrupted KEY's bucket, with equal counts but differing hashes — the
    signature that distinguishes corruption from loss."""
    a = _accounts(spark)
    vals = ["status", F.col("balance").cast("decimal(18,2)")]
    corrupted = _accounts(spark).withColumn(
        "balance",
        F.when(F.col("id") == 137, F.lit(9999.99)).otherwise(F.col("balance")),
    )
    rows = reconcile(corrupted, a, ["id"], vals).collect()
    assert len(rows) == 1
    (r,) = rows
    # the flagged bucket is where key 137 hashes
    fp = table_fingerprint(
        a.filter(F.col("id") == 137), ["id"], vals
    ).collect()
    assert r["bucket"] == fp[0]["bucket"]
    assert r["n_actual"] == r["n_expected"]  # same rows…
    assert r["h_actual"] != r["h_expected"]  # …different content


def test_reconcile_flags_missing_rows_via_counts(spark):
    a = _accounts(spark)
    short = _accounts(spark).filter(F.col("id") != 42)
    rows = reconcile(short, a, ["id"]).collect()
    assert len(rows) == 1
    (r,) = rows
    assert r["n_actual"] == r["n_expected"] - 1


def test_fingerprint_is_partitioning_invariant(spark):
    """The hash sum must not depend on row order or partitioning — that is
    the property that lets the source database compute its own fingerprint
    independently."""
    a = _accounts(spark)
    f1 = {
        r["bucket"]: (r["n"], r["h"])
        for r in table_fingerprint(a, ["id"], ["status"]).collect()
    }
    f2 = {
        r["bucket"]: (r["n"], r["h"])
        for r in table_fingerprint(
            a.repartition(7).sortWithinPartitions(F.desc("balance")),
            ["id"],
            ["status"],
        ).collect()
    }
    assert f1 == f2


def test_effectively_once_drops_redelivered_positions(spark, tmp_path):
    """Restart-style redelivery: the same source positions re-emitted in a
    later micro-batch inside the watermark are suppressed; new positions
    pass. State is bounded by the watermark (dropDuplicatesWithinWatermark),
    not the stream length."""
    import pandas as pd

    from debezium_spark.streaming.reliability import effectively_once

    feed = str(tmp_path / "feed")
    os.makedirs(feed)
    chunks = [
        # batch 1: positions 1-3
        pd.DataFrame(
            {
                "pos": [1, 2, 3],
                "payload": ["a", "b", "c"],
                "ts": pd.to_datetime([1_000, 2_000, 3_000], unit="ms"),
            }
        ),
        # batch 2: restart replays 2-3, then new 4
        pd.DataFrame(
            {
                "pos": [2, 3, 4],
                "payload": ["b", "c", "d"],
                "ts": pd.to_datetime([2_000, 3_000, 4_000], unit="ms"),
            }
        ),
    ]
    for i, pdf in enumerate(chunks, 1):
        src = f"{feed}/../__t{i}"
        spark.createDataFrame(
            pdf, "pos long, payload string, ts timestamp"
        ).coalesce(1).write.mode("overwrite").parquet(src)
        data = next(f for f in os.listdir(src) if f.endswith(".parquet"))
        os.replace(os.path.join(src, data), f"{feed}/chunk_{i:03d}.parquet")
        shutil.rmtree(src)

    stream = (
        spark.readStream.schema("pos long, payload string, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(feed)
    )
    deduped = effectively_once(
        stream, id_cols=("pos",), event_time_col="ts", delay="1 hour"
    )
    out = str(tmp_path / "out")
    q = (
        deduped.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(
        (r["pos"], r["payload"]) for r in spark.read.parquet(out).collect()
    )
    assert got == [(1, "a"), (2, "b"), (3, "c"), (4, "d")]


def test_sequence_gaps_finds_exact_ranges(spark):
    """Hand-checkable gap report: per group, interior holes come out as
    [start, end] ranges with counts; boundary losses are invisible (by
    contract — reconcile covers counts); a dense group reports nothing."""
    from debezium_spark.operators.audit import sequence_gaps

    rows = (
        [("a", p) for p in [1, 2, 5, 6, 10]]  # gaps 3-4 and 7-9
        + [("b", p) for p in [7, 8, 9]]  # dense
        + [("c", p) for p in [100]]  # single row: nothing to compare
    )
    df = spark.createDataFrame(rows, "grp string, pos long")
    out = sorted(
        tuple(r) for r in sequence_gaps(df, "pos", ["grp"]).collect()
    )
    assert out == [("a", 3, 4, 2), ("a", 7, 9, 3)]
