"""Geometry logical types: Circle/Line structs and the PG text decode path.

Reference semantics: io/debezium/data/geometry/Circle.java (struct{center:
Point, radius f64} — no WKB curve primitive, carried losslessly) and
Line.java (struct{a,b,c} for Ax + By + C = 0).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from debezium_spark.operators.geometry import (
    circle_contains_point,
    circle_struct,
    line_struct,
    line_through_points,
    parse_pg_circle,
    parse_pg_line,
)


def test_parse_pg_circle_roundtrip(spark):
    df = spark.createDataFrame(
        [("<(1.5,-2),3.25>",), ("<(0,0),1>",)], ["txt"]
    ).select(parse_pg_circle(F.col("txt")).alias("c"))
    rows = df.select("c.center.x", "c.center.y", "c.radius").collect()
    assert [tuple(r) for r in rows] == [(1.5, -2.0, 3.25), (0.0, 0.0, 1.0)]


def test_parse_pg_line(spark):
    df = spark.createDataFrame([("{1,-2,3.5}",)], ["txt"]).select(
        parse_pg_line(F.col("txt")).alias("l")
    )
    (r,) = df.select("l.a", "l.b", "l.c").collect()
    assert tuple(r) == (1.0, -2.0, 3.5)


def test_line_through_points_satisfies_both_points(spark):
    # Ax + By + C must vanish at both defining points.
    df = spark.range(1).select(
        line_through_points(F.lit(1.0), F.lit(2.0), F.lit(4.0), F.lit(6.0)).alias("l")
    )
    (r,) = df.select(
        (F.col("l.a") * 1.0 + F.col("l.b") * 2.0 + F.col("l.c")).alias("p1"),
        (F.col("l.a") * 4.0 + F.col("l.b") * 6.0 + F.col("l.c")).alias("p2"),
    ).collect()
    assert r["p1"] == 0.0 and r["p2"] == 0.0


def test_circle_contains_point_boundary(spark):
    c = circle_struct(F.lit(0.0), F.lit(0.0), F.lit(5.0))
    df = spark.range(1).select(
        circle_contains_point(c, F.lit(3.0), F.lit(4.0)).alias("on_edge"),
        circle_contains_point(c, F.lit(3.0), F.lit(4.1)).alias("outside"),
        circle_contains_point(c, F.lit(0.0), F.lit(0.0)).alias("center"),
    )
    (r,) = df.collect()
    assert r["on_edge"] is True and r["outside"] is False and r["center"] is True


def test_struct_field_names_match_reference(spark):
    # Circle.java CENTER_FIELD/RADIUS_FIELD; Line.java A/B/C_FIELD.
    df = spark.range(1).select(
        circle_struct(F.lit(1.0), F.lit(2.0), F.lit(3.0)).alias("c"),
        line_struct(F.lit(1.0), F.lit(2.0), F.lit(3.0)).alias("l"),
    )
    c_t = df.schema["c"].dataType
    assert [f.name for f in c_t.fields] == ["center", "radius"]
    assert [f.name for f in c_t.fields[0].dataType.fields] == ["x", "y"]
    l_t = df.schema["l"].dataType
    assert [f.name for f in l_t.fields] == ["a", "b", "c"]


def test_bits_le_large_and_negative(spark):
    from pyspark.sql import functions as F

    from debezium_spark.operators.handling import bits_le, decode_bits_le

    vals = [(2**60 + 1,), (-1,), (-2**40,), (65535,), (0,)]
    df = spark.createDataFrame(vals, "v long")
    out = df.select(
        "v", decode_bits_le(bits_le(F.col("v"), 8), 8).alias("rt")
    ).collect()
    for r in out:
        # full-width decode reassembles the exact signed two's-complement long
        assert r["rt"] == r["v"]


def test_variable_scale_decimal_negative_roundtrip(spark):
    from pyspark.sql import functions as F

    from debezium_spark.operators.handling import (
        decode_variable_scale_decimal,
        variable_scale_decimal,
    )

    vals = [
        (12345, 2), (-12345, 2), (-1, 0), (0, 3),
        (-(2**62), 0), (2**62, 0), (-7, 4),
    ]
    df = spark.createDataFrame(vals, "unscaled long, scale int")
    out = df.select(
        "unscaled",
        "scale",
        decode_variable_scale_decimal(
            variable_scale_decimal(F.col("unscaled"), F.col("scale"))
        ).alias("rt"),
    ).collect()
    for r in out:
        # sign-aware decode: negatives round-trip exactly (the old
        # conv→cast path NULLed any value with the top bit set)
        assert r["rt"] == r["unscaled"] / (10 ** r["scale"]), r


def test_variable_scale_decimal_minimal_length_decode(spark):
    """A reference-faithful producer writes minimal-length BigInteger bytes;
    the decoder sign-extends any width ≤ 8."""
    from pyspark.sql import functions as F

    from debezium_spark.operators.handling import (
        decode_variable_scale_decimal,
    )

    # -2 as ONE two's-complement byte (0xFE), scale 0 → -2.0
    df = spark.createDataFrame([(bytearray(b"\xfe"), 0), (bytearray(b"\x7f"), 1)],
                               "value binary, scale int")
    out = df.select(
        decode_variable_scale_decimal(
            F.struct(F.col("scale"), F.col("value"))
        ).alias("d")
    ).collect()
    assert out[0]["d"] == -2.0
    assert out[1]["d"] == 12.7


def test_variable_scale_decimal_overlong_is_null(spark):
    """Unscaled values wider than 8 bytes can't be reassembled into a long;
    they decode to NULL instead of a silently truncated number."""
    from pyspark.sql import functions as F

    from debezium_spark.operators.handling import (
        decode_variable_scale_decimal,
    )

    df = spark.createDataFrame(
        [(bytearray(b"\x01" * 9), 0), (bytearray(b"\x02"), 0)],
        "value binary, scale int",
    )
    out = df.select(
        decode_variable_scale_decimal(
            F.struct(F.col("scale"), F.col("value"))
        ).alias("d")
    ).collect()
    assert out[0]["d"] is None
    assert out[1]["d"] == 2.0


def test_sparse_vector_json_matches_reference_shape(spark):
    """Golden: the converter's exact spacing/ordering
    (VectorToJsonConverter.java:163-165), including the NULL contract."""
    from pyspark.sql import functions as F

    from debezium_spark.operators.handling import sparse_double_vector
    from debezium_spark.operators.misc import vector_to_json

    df = spark.createDataFrame(
        [(1, [0.0, 0.5, 0.0, 2.0]), (2, [0.0, 0.0, 0.0, 0.0])],
        "id long, dense array<double>",
    )
    sv = df.select(
        "id", sparse_double_vector(F.col("dense"), 4).alias("sv")
    )
    out = {
        r["id"]: r["sv"]
        for r in vector_to_json(sv, "sv").select("id", "sv").collect()
    }
    assert out[1] == '{ "dimensions": 4, "vector": { "2": 0.5, "4": 2.0 } }'
    assert out[2] == '{ "dimensions": 4, "vector": {  } }'

    nulled = sv.withColumn("sv", F.when(F.col("id") == 1, F.col("sv")))
    out2 = {
        r["id"]: r["sv"]
        for r in vector_to_json(nulled, "sv").select("id", "sv").collect()
    }
    assert out2[2] is None
