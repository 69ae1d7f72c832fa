"""Hierarchical rollup (operators/rollup.py): telescoping exactness."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pytest
from pyspark.sql import functions as F

from debezium_spark.operators.rollup import hierarchical_rollup


def _events(spark, n=500, seed=5):
    rng = np.random.default_rng(seed)
    base = dt.datetime(2024, 3, 1)
    rows = [
        (
            base + dt.timedelta(minutes=int(rng.integers(0, 60 * 24 * 21))),
            ["a", "b"][int(rng.integers(0, 2))],
            float(rng.normal()) * 100,
        )
        for _ in range(n)
    ]
    return spark.createDataFrame(rows, "ts timestamp, k string, v double")


def test_rollup_levels_match_direct_aggregation(spark):
    """Every coarser level (merged from partials) equals a direct decimal
    aggregation over raw rows — EXACTLY, because decimal sums are
    associative; min/max/count trivially so."""
    ev = _events(spark)
    out = hierarchical_rollup(
        ev, ts_col="ts", value_col="v", dims=["k"],
        levels=("hour", "day", "week"),
    )
    for level in ("hour", "day", "week"):
        got = {
            (r["bucket"], r["k"]): (r["n"], r["sum_value"], r["min_value"], r["max_value"])
            for r in out.filter(F.col("level") == level).collect()
        }
        direct = {
            (r["bucket"], r["k"]): (r["n"], r["sum_value"], r["min_value"], r["max_value"])
            for r in ev.groupBy(
                F.date_trunc(level, "ts").alias("bucket"), "k"
            ).agg(
                F.count("*").alias("n"),
                F.sum(F.col("v").cast("decimal(28,6)")).cast("double").alias("sum_value"),
                F.min("v").alias("min_value"),
                F.max("v").alias("max_value"),
            ).collect()
        }
        assert got == direct, level


def test_rollup_counts_conserve_across_levels(spark):
    """Total n at every level equals the raw row count (no bucket loses or
    double-counts rows)."""
    ev = _events(spark, n=300, seed=8)
    out = hierarchical_rollup(
        ev, ts_col="ts", value_col="v", levels=("hour", "day")
    )
    totals = {
        r["level"]: r["total"]
        for r in out.groupBy("level").agg(F.sum("n").alias("total")).collect()
    }
    assert totals == {"hour": 300, "day": 300}


def test_rollup_rejects_misordered_levels(spark):
    ev = _events(spark, n=10)
    with pytest.raises(ValueError):
        hierarchical_rollup(ev, ts_col="ts", value_col="v", levels=("day", "hour"))
    with pytest.raises(ValueError):
        hierarchical_rollup(ev, ts_col="ts", value_col="v", levels=("day", "fortnight"))


def test_rollup_rejects_week_into_month(spark):
    ev = spark.createDataFrame(
        [("2024-01-29 00:00:00", 1.0)], "ts string, v double"
    ).select(F.to_timestamp("ts").alias("ts"), "v")
    # the week of 2024-01-29 (Mon) ends in February: merging week partials
    # into month buckets would misplace Feb 1-4 — must be rejected
    with pytest.raises(ValueError, match="week"):
        hierarchical_rollup(
            ev, ts_col="ts", value_col="v", levels=("week", "month")
        )
