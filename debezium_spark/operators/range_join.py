"""Binned range (interval) join — a custom operator Spark lacks natively.

``point ⋈ [start, end]`` joins are the other temporal-join shape next to
as-of (``operators/asof.py``): enrich events with the campaign / maintenance
/ in-transit window they fall inside. Spark's own planner turns a bare
non-equi condition into BroadcastNestedLoopJoin (right side must fit in one
executor) or a cartesian product — both scale-killers.

Spark-first design — the standard binning trick (the same shape Databricks'
range-join optimization and interval libraries use):

1. Pick a ``bin_width`` on the numeric join axis.
2. Each LEFT point maps to exactly ONE bin: ``floor(point / w)``.
3. Each RIGHT interval explodes to the bins it covers:
   ``sequence(floor(start/w), floor(end/w))`` — ``ceil(len/w)+1`` rows.
4. Equi-join on the bin (plus any equality keys), with the exact
   ``start <= point <= end`` predicate INSIDE the join condition, so outer
   joins stay correct and the range check runs during the join, not as a
   post-filter over a wider result.

Each matched pair emits exactly once (a point owns one bin; an interval
covers that bin at most once), so there is no dedup pass. Cost: ONE
shuffle of left points + right interval-bin rows on the bin key — a plain
shuffled hash/sort-merge join at any scale, AQE-splittable on skewed bins.

Tuning: right-side row amplification is ``ceil(interval_len / w) + 1``,
while bucket width controls false candidates filtered by the exact
predicate — set ``bin_width`` near the MEDIAN interval length so both stay
O(1). Intervals with ``start > end`` are invalid and match nothing.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def range_join(
    left: DataFrame,
    right: DataFrame,
    *,
    left_point: str,
    right_start: str,
    right_end: str,
    bin_width: int | float,
    on: list[str] | None = None,
    how: str = "inner",
) -> DataFrame:
    """Join each left row to every right row whose
    ``[right_start, right_end]`` interval (inclusive both ends) contains
    ``left_point``, optionally also matching equality keys ``on``.

    The join axis must be numeric (cast dates/timestamps to epoch days /
    seconds first); ``bin_width`` is in the same unit. ``how`` is
    ``'inner'`` or ``'left'`` (unmatched left rows survive with NULL right
    columns). Column names shared between the two sides (other than
    ``on``) must be disambiguated by the caller, as with any Spark join.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how={how!r}: only 'inner' and 'left' supported")
    w = float(bin_width)
    if not w > 0:
        raise ValueError("bin_width must be > 0")
    on = on or []

    def _bin(c: Column) -> Column:
        return F.floor(c / F.lit(w)).cast("long")

    l_b = left.withColumn("__bin", _bin(F.col(left_point)))
    r_b = (
        right.filter(F.col(right_start) <= F.col(right_end))
        .withColumn(
            "__bin",
            F.explode(
                F.sequence(
                    _bin(F.col(right_start)), _bin(F.col(right_end))
                )
            ),
        )
    )
    cond = (l_b["__bin"] == r_b["__bin"])
    for k in on:
        cond = cond & (l_b[k] == r_b[k])
    # exact range predicate inside the join condition: runs as the join's
    # residual filter (correct under left-outer), never a post-filter
    cond = (
        cond
        & (l_b[left_point] >= r_b[right_start])
        & (l_b[left_point] <= r_b[right_end])
    )
    joined = l_b.join(r_b, cond, "left_outer" if how == "left" else "inner")
    keep = [l_b[c] for c in left.columns] + [
        r_b[c] for c in right.columns if c not in on
    ]
    return joined.select(*keep)
