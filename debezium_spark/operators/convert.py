"""T19 — custom converters SPI: per-column value/schema overrides.

Reference: ``CustomConverter`` SPI (debezium-api/src/main/java/io/debezium/spi/
converter/CustomConverter.java:18,48) with the shipped implementations as the
model rules: ``TinyIntOneToBooleanConverter`` and ``ZeroDateFallbackConverter``
(debezium-connector-binlog/...).

Spark shape: a converter is a column-level expression rewrite applied at
decode time — a dict of ``column -> Column`` folded into one projection, so
Catalyst sees a single narrow select (no per-rule passes).
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def apply_custom_converters(
    df: DataFrame, rules: Mapping[str, Column]
) -> DataFrame:
    """Rewrite the given columns in ONE projection (CustomConverter.java:48)."""
    return df.select(
        *[
            (rules[c].alias(c) if c in rules else F.col(c))
            for c in df.columns
        ]
    )


def tinyint_one_to_boolean(col: Column) -> Column:
    """TinyIntOneToBooleanConverter: 1/0 numeric flags → boolean."""
    return (col.cast("int") == 1).cast("boolean")


def zero_date_fallback(col: Column, fallback: str = "1970-01-01") -> Column:
    """ZeroDateFallbackConverter: MySQL zero-dates → an explicit fallback."""
    return F.when(
        col.cast("string").startswith("0000-00-00"), F.lit(fallback).cast("date")
    ).otherwise(col.cast("date"))
