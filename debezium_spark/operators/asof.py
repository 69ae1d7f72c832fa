"""As-of (temporal) join — a custom operator Spark lacks natively.

The CDC-native use case: enrich each fact row with the *latest change-event
state at or before its timestamp* (time-travel against the change stream —
the reference's closest analog is the reselect post-processor T18 plus the
schema-at-position lookup, SchemaHistory.java:183-224).

Spark-first design — the union/window formulation, NOT a per-row subquery:

1. Tag both sides, union on the shared key + timestamp axis.
2. One window per key ordered by (ts, side) where right rows sort before
   left rows at equal ts (inclusive backward match).
3. ``last(struct, ignorenulls=True)`` carries the most recent right-side
   row forward AS ONE STRUCT — per-column fills would stitch together
   columns from different right rows whenever the matched row carries a
   NULL (legitimate in CDC state) — then the struct expands; filter back
   to left rows.

Cost: ONE shuffle on the join key for any number of left/right rows — the
same exchange a regular join would need — and no skew-prone range
condition. A broadcast range-join alternative is right only when the right
side is tiny; this shape survives both sides being huge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: list[str],
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    suffix: str = "_asof",
) -> DataFrame:
    """For each left row, attach the right row with the greatest
    ``right_ts <= left_ts`` per key (backward-inclusive as-of semantics,
    matching ANSI-ish ASOF JOIN implementations)."""
    import pyspark.sql.types as T

    lcols = left.columns
    r_struct = T.StructType([right.schema[c] for c in right_cols])
    l_tagged = left.select(
        *lcols,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r_struct).alias("__r"),
    )
    r_tagged = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          if c not in on else F.col(c)
          for c in lcols],
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.struct(*[F.col(c) for c in right_cols]).alias("__r"),
    )
    unioned = l_tagged.unionByName(r_tagged)
    w = (
        Window.partitionBy(*on)
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # ONE last() over the struct: the matched right row travels atomically,
    # so a NULL in one of its columns stays a NULL instead of falling back
    # to an older right row's value.
    filled = unioned.select(
        *lcols,
        "__side",
        F.last("__r", ignorenulls=True).over(w).alias("__m"),
    )
    return (
        filled.filter(F.col("__side") == 1)
        .select(
            *lcols,
            *[F.col(f"__m.{c}").alias(c + suffix) for c in right_cols],
        )
    )
