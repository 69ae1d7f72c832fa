"""Skew-resilient join: key salting for hot keys.

Debezium never joins at scale (single-JVM), but this engine's MERGE /
reselect / dedup paths do, and a hot key (one account receiving most
changes) turns a shuffle join into a straggler task. Two defenses, layered:

1. AQE skew-join splitting (enabled in session.py) — handles *sort-merge*
   join skew at runtime for free.
2. Explicit salting (this module) — for the cases AQE can't fix (skewed
   aggregations feeding joins, or hash joins): the skewed side's key gains
   a deterministic salt in [0, n); the other side is replicated n ways.
   Shuffle fan-out per hot key becomes n tasks instead of 1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: list[str],
    *,
    num_salts: int = 8,
    how: str = "inner",
    salt_source: str | None = None,
) -> DataFrame:
    """Join with the skewed side salted and the other side replicated.

    ``salt_source`` names a column whose hash picks the salt (deterministic,
    replayable — never ``rand()``, which breaks retry idempotence); default
    is the whole row hash.
    """
    salt_col = (
        F.pmod(F.hash(F.col(salt_source)), F.lit(num_salts))
        if salt_source
        else F.pmod(F.hash(*[F.col(c) for c in skewed.columns]), F.lit(num_salts))
    )
    left = skewed.withColumn("__salt", salt_col)
    right = other.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(num_salts - 1)))
    )
    return left.join(right, [*on, "__salt"], how).drop("__salt")
