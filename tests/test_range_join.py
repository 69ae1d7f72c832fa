"""Binned range-join operator (operators/range_join.py)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from debezium_spark.operators.range_join import range_join


def _fixture(spark, seed=3, n_left=80, n_right=40):
    rng = np.random.default_rng(seed)
    left = spark.createDataFrame(
        [(int(i), float(rng.integers(0, 1000))) for i in range(n_left)],
        "lid long, pt double",
    )
    rows = []
    for j in range(n_right):
        s = float(rng.integers(0, 1000))
        rows.append((int(j), s, s + float(rng.integers(0, 120))))
    right = spark.createDataFrame(rows, "rid long, s double, e double")
    return left, right


def _naive(left, right, how):
    j = left.crossJoin(right).filter(
        (F.col("pt") >= F.col("s")) & (F.col("pt") <= F.col("e"))
    )
    if how == "left":
        matched = j
        unmatched = left.join(
            j.select("lid").distinct(), "lid", "left_anti"
        ).select(
            "lid", "pt",
            F.lit(None).cast("long").alias("rid"),
            F.lit(None).cast("double").alias("s"),
            F.lit(None).cast("double").alias("e"),
        )
        return matched.select("lid", "pt", "rid", "s", "e").unionByName(unmatched)
    return j.select("lid", "pt", "rid", "s", "e")


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_range_join_matches_naive_inner_and_left(spark):
    """Binned equi-join + residual predicate == the naive cross-join filter,
    for inner AND left-outer, across bin widths smaller/comparable/larger
    than the interval lengths (bin geometry must not change results)."""
    left, right = _fixture(spark)
    for how in ("inner", "left"):
        expected = _rows(_naive(left, right, how))
        for w in (7, 64, 500):
            got = _rows(range_join(
                left, right,
                left_point="pt", right_start="s", right_end="e",
                bin_width=w, how=how,
            ))
            assert got == expected, (how, w)


def test_range_join_with_equality_keys(spark):
    """The optional `on` keys compose with the range predicate."""
    left = spark.createDataFrame(
        [(1, "a", 5.0), (2, "b", 5.0)], "lid long, k string, pt double"
    )
    right = spark.createDataFrame(
        [(10, "a", 0.0, 10.0), (11, "b", 6.0, 9.0)],
        "rid long, k string, s double, e double",
    )
    got = range_join(
        left, right, left_point="pt", right_start="s", right_end="e",
        bin_width=4, on=["k"],
    ).select("lid", "rid").collect()
    assert [(r["lid"], r["rid"]) for r in got] == [(1, 10)]


def test_range_join_invalid_intervals_and_bounds(spark):
    """start > end matches nothing; bounds are inclusive on both ends."""
    left = spark.createDataFrame([(1, 5.0)], "lid long, pt double")
    right = spark.createDataFrame(
        [(20, 9.0, 1.0), (21, 5.0, 5.0)], "rid long, s double, e double"
    )
    got = range_join(
        left, right, left_point="pt", right_start="s", right_end="e",
        bin_width=2,
    ).select("rid").collect()
    assert [r["rid"] for r in got] == [21]


def test_range_join_plan_is_equi_not_nested_loop(spark):
    """The point is the plan: a shuffled equi-join on the bin key, never
    BroadcastNestedLoop/CartesianProduct (what a bare non-equi condition
    would produce)."""
    left, right = _fixture(spark)
    plan = range_join(
        left, right, left_point="pt", right_start="s", right_end="e",
        bin_width=32,
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoop" not in plan
    assert "CartesianProduct" not in plan
