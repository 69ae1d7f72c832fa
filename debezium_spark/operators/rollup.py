"""Hierarchical time-bucket rollup (the hypertable continuous-aggregate
shape) — multi-resolution aggregates where every coarser level is computed
from the FINER LEVEL'S PARTIALS, never by re-scanning raw data.

TimescaleDB's continuous aggregates / Druid's rollup segments keep
(minute → hour → day) summaries; the scale property that makes them cheap
is that the kept statistics are MERGEABLE: count sums, sum sums, min mins,
max maxes. Raw data is touched exactly once (the finest level); each
coarser level aggregates the previous level's rows — at 100 TB that is the
difference between one full scan and one scan per resolution. Derived
statistics (avg = sum/count) are computed at read time from the partials.

Exactness discipline: sums run in DECIMAL so the telescoped result is
bit-identical to a direct aggregation at any partitioning/merge order —
the invariant ``tests/test_rollup.py`` locks and the e4 oracle replays
level-by-level straight from raw.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_DEC = "decimal(28,6)"

# date_trunc granularities from finest to coarsest that make sense to chain
_GRAIN_ORDER = [
    "minute", "hour", "day", "week", "month", "quarter", "year",
]


def hierarchical_rollup(
    df: DataFrame,
    *,
    ts_col: str,
    value_col: str,
    dims: list[str] | None = None,
    levels: tuple[str, ...] = ("hour", "day", "week"),
) -> DataFrame:
    """Roll ``df`` up to every granularity in ``levels`` (finest first),
    each coarser level merged from the previous level's partials.

    Returns the union of all levels:
    ``(level, bucket, *dims, n, sum_value, min_value, max_value)`` with
    ``bucket = date_trunc(level, ts_col)``. ``avg = sum_value / n`` is the
    caller's read-time division. ``levels`` must be strictly
    finest-to-coarsest (validated against the date_trunc hierarchy) —
    merging partials is only sound when every coarse bucket is a disjoint
    union of fine buckets.
    """
    dims = dims or []
    order = [g for g in levels if g in _GRAIN_ORDER]
    if list(levels) != order or order != sorted(
        order, key=_GRAIN_ORDER.index
    ):
        raise ValueError(
            f"levels {levels!r} must be a finest-to-coarsest subset of "
            f"{_GRAIN_ORDER}"
        )
    if "week" in levels[:-1]:
        # weeks straddle month/quarter/year boundaries: a coarser bucket is
        # NOT a disjoint union of weeks, so merging week partials upward
        # would assign a whole week to the month of its Monday
        raise ValueError(
            "'week' buckets cannot be merged into a coarser level — "
            "use 'week' only as the final level, or chain day→month"
        )

    finest = levels[0]
    partial = df.groupBy(
        F.date_trunc(finest, F.col(ts_col)).alias("bucket"), *dims
    ).agg(
        F.count("*").alias("n"),
        F.sum(F.col(value_col).cast(_DEC)).alias("__sum_dec"),
        F.min(value_col).alias("min_value"),
        F.max(value_col).alias("max_value"),
    )

    def _finish(level_df: DataFrame, level: str) -> DataFrame:
        return level_df.select(
            F.lit(level).alias("level"),
            "bucket",
            *dims,
            "n",
            F.col("__sum_dec").cast("double").alias("sum_value"),
            "min_value",
            "max_value",
        )

    out = _finish(partial, finest)
    prev = partial
    for level in levels[1:]:
        # merge of partials, NOT a re-scan: counts/sums sum, min/max fold
        prev = prev.groupBy(
            F.date_trunc(level, F.col("bucket")).alias("bucket"), *dims
        ).agg(
            F.sum("n").alias("n"),
            F.sum("__sum_dec").alias("__sum_dec"),
            F.min("min_value").alias("min_value"),
            F.max("max_value").alias("max_value"),
        )
        out = out.unionByName(_finish(prev, level))
    return out
