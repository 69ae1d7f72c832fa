"""Snapshot-diff changefeed: derive c/u/d events from two table versions.

The reference bootstraps CDC from a log; when only periodic table snapshots
exist (the common lakehouse backfill situation), the change stream is the
*diff* of consecutive versions. This is the batch twin of S1→S7 handoff:
feed the emitted events into the same SMT chain / MERGE sinks.

Shape at scale: ONE full-outer hash join on the PK (both sides shuffle
once; bucketed snapshots make it co-located), null-safe column comparison
decides u-vs-unchanged, unchanged rows drop before anything downstream
sees them.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old_df: DataFrame,
    new_df: DataFrame,
    pk_cols: list[str],
    *,
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Events turning ``old_df`` into ``new_df``: one row per changed key.

    Returns ``pk_cols…, op ('c'|'u'|'d'), before struct, after struct``;
    unchanged keys are filtered out inside the join projection.
    """
    if compare_cols is None:
        compare_cols = [c for c in new_df.columns if c not in pk_cols]
    o = old_df.select(
        *pk_cols, F.struct(*compare_cols).alias("__before")
    ).alias("o")
    n = new_df.select(
        *pk_cols, F.struct(*compare_cols).alias("__after")
    ).alias("n")
    joined = o.join(n, pk_cols, "full_outer")
    op = (
        F.when(F.col("__before").isNull(), F.lit("c"))
        .when(F.col("__after").isNull(), F.lit("d"))
        .otherwise(F.lit("u"))
    )
    changed = reduce(
        lambda a, b: a | b,
        [
            ~F.col(f"__before.{c}").eqNullSafe(F.col(f"__after.{c}"))
            for c in compare_cols
        ],
    )
    return (
        joined.withColumn("op", op)
        .filter((F.col("op") != "u") | changed)
        .select(
            *pk_cols,
            "op",
            F.col("__before").alias("before"),
            F.col("__after").alias("after"),
        )
    )
