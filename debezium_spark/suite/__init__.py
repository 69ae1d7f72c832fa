"""Correctness-suite registry.

Every implemented operator registers a named query (spark, sf_dir) →
DataFrame plus, when SQL-expressible, the equivalent DuckDB oracle SQL over
the pre-registered views (region nation customer supplier part orders
lineitem events documents embeddings). The driver hash-compares the two at
sf0.01 (order-insensitive, columns sorted by name) — so every computed column
is aliased identically on both sides, and float aggregates go through
decimal internally + a final round so the values are bit-identical across
engines.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class Q:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None


QUERIES: dict[str, Q] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = Q(fn=fn, oracle=oracle)
        return fn

    return deco


def load_all() -> dict[str, Q]:
    """Import all suite modules (side effect: registration) and return the map.

    Imports are guarded per-module so one broken suite file degrades to a
    smaller registry instead of zeroing every query (the round-1 failure
    mode: a missing module made queries() itself raise).
    """
    import importlib
    import sys
    import traceback

    for mod in (
        "cdc",
        "cdc2",
        "analytics",
        "textml",
        "multimodal",
        "warehouse",
        "windows",
    ):
        try:
            importlib.import_module(f"debezium_spark.suite.{mod}")
        except Exception:  # pragma: no cover - defensive
            print(f"suite module {mod!r} failed to load:", file=sys.stderr)
            traceback.print_exc()
    return QUERIES
