"""Type-widening schema evolution (schema/evolution.py) — the lossless
matrix, decimal digit rules, and batch normalization."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from debezium_spark.schema.evolution import can_widen, widen_types, widened


def test_widening_matrix():
    assert can_widen(T.IntegerType(), T.LongType())
    assert can_widen(T.ShortType(), T.DecimalType(10, 0))
    assert can_widen(T.FloatType(), T.DoubleType())
    assert not can_widen(T.LongType(), T.IntegerType())
    assert not can_widen(T.DoubleType(), T.FloatType())
    assert not can_widen(T.DateType(), T.TimestampType())  # semantic change
    assert not can_widen(T.StringType(), T.LongType())
    # decimal: scale may grow, integer digits must not shrink
    assert can_widen(T.DecimalType(10, 2), T.DecimalType(14, 4))
    assert not can_widen(T.DecimalType(10, 2), T.DecimalType(10, 4))
    # bigint needs 20 integer digits to fit losslessly
    assert can_widen(T.LongType(), T.DecimalType(22, 2))
    assert not can_widen(T.LongType(), T.DecimalType(18, 0))


def test_widened_resolution_and_incompatible():
    assert widened(T.IntegerType(), T.LongType()) == T.LongType()
    assert widened(T.LongType(), T.IntegerType()) == T.LongType()
    with pytest.raises(ValueError):
        widened(T.StringType(), T.LongType())


def test_widen_types_normalizes_batch(spark):
    batch = spark.createDataFrame(
        [(1, 2, 3.5)], "id int, v int, f float"
    )
    target = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("v", T.IntegerType()),
            T.StructField("f", T.DoubleType()),
        ]
    )
    out = widen_types(batch, target)
    got = {f.name: f.dataType for f in out.schema.fields}
    assert got["id"] == T.LongType()      # batch side widened
    assert got["v"] == T.IntegerType()    # equal, untouched
    assert got["f"] == T.DoubleType()
    # incompatible change surfaces, never a silent cast
    bad_target = T.StructType([T.StructField("id", T.StringType())])
    with pytest.raises(ValueError):
        widen_types(batch, bad_target)
    # new-to-batch columns pass through (K6's add-column path)
    extra = T.StructType([T.StructField("other", T.LongType())])
    assert widen_types(batch, extra).schema == batch.schema
