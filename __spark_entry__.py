"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All implementations live in ``debezium_spark``; queries register themselves
in ``debezium_spark.suite``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from debezium_spark.suite import load_all  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: CDC-materialize the
    ``accounts`` table (snapshot ∪ change feed → unwrap → last-write-wins →
    MERGE upsert) — SURVEY §7.1's minimum end-to-end slice."""
    qs = load_all()
    return qs["k1_merge_upsert"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.fn for name, q in load_all().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: q.oracle for name, q in load_all().items() if q.oracle is not None
    }
