"""Avro binary codec: spec-conformance goldens + Spark roundtrip.

The golden byte strings below are the Avro 1.11 specification's own examples
(Binary Encoding section): zigzag varints 0→00, -1→01, 1→02, -2→03, 2→04,
-64→7f, 64→80 01; string "foo" → 06 66 6f 6f.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from debezium_spark.formats.avro_codec import (
    avro_roundtrip,
    avro_schema_for,
    decode_record,
    encode_record,
)

LONG = {"type": "record", "name": "L", "fields": [{"name": "v", "type": "long"}]}
STR = {"type": "record", "name": "S", "fields": [{"name": "v", "type": "string"}]}


@pytest.mark.parametrize(
    "n,expect",
    [
        (0, b"\x00"),
        (-1, b"\x01"),
        (1, b"\x02"),
        (-2, b"\x03"),
        (2, b"\x04"),
        (-64, b"\x7f"),
        (64, b"\x80\x01"),
        (2**40, b"\x80\x80\x80\x80\x80\x40"),
        (-(2**40), b"\xff\xff\xff\xff\xff\x3f"),
    ],
)
def test_zigzag_varint_spec_examples(n, expect):
    assert encode_record(LONG, {"v": n}) == expect
    assert decode_record(LONG, expect) == {"v": n}


def test_string_spec_example():
    assert encode_record(STR, {"v": "foo"}) == b"\x06foo"
    assert decode_record(STR, b"\x06foo") == {"v": "foo"}


def test_nullable_union_and_double():
    sch = {
        "type": "record",
        "name": "R",
        "fields": [
            {"name": "a", "type": ["null", "double"]},
            {"name": "b", "type": ["null", "string"]},
        ],
    }
    # null branch: union index 0 and nothing else.
    assert encode_record(sch, {"a": None, "b": None}) == b"\x00\x00"
    enc = encode_record(sch, {"a": 1.5, "b": "x"})
    assert enc[0:1] == b"\x02"  # union index 1 (zigzag(1)=2)
    assert decode_record(sch, enc) == {"a": 1.5, "b": "x"}


def test_trailing_bytes_rejected():
    with pytest.raises(ValueError, match="trailing"):
        decode_record(LONG, b"\x02\x00")


def test_schema_mapping_nullable_union(spark):
    df = spark.range(1).select(
        F.col("id").alias("k"), F.lit("s").alias("t"), F.lit(1.0).alias("d")
    )
    sch = avro_schema_for(df.schema)
    kinds = {f["name"]: f["type"] for f in sch["fields"]}
    assert kinds["t"] == ["null", "string"] or kinds["t"] == "string"
    assert sch["type"] == "record"


def test_spark_roundtrip_with_nulls(spark):
    df = spark.createDataFrame(
        [(1, "a", 2.5), (2, None, None), (3, "c", -0.0)],
        "id long, s string, d double",
    )
    rt = avro_roundtrip(df, ["id", "s", "d"])
    rows = sorted(
        [(r["id"], r["s"], r["d"]) for r in rt.collect()], key=lambda x: x[0]
    )
    assert rows == [(1, "a", 2.5), (2, None, None), (3, "c", -0.0)]
    # encoded length is reported and positive
    assert all(r["avro_len"] >= 3 for r in rt.collect())


def test_overflow_rejected():
    with pytest.raises(OverflowError):
        encode_record(LONG, {"v": 2**63})
    with pytest.raises(OverflowError):
        encode_record(LONG, {"v": -(2**63) - 1})
    # boundary values still encode
    for v in (2**63 - 1, -(2**63)):
        assert decode_record(LONG, encode_record(LONG, {"v": v})) == {"v": v}


def test_nan_double_is_a_value_not_null():
    import math

    sch = {
        "type": "record",
        "name": "N",
        "fields": [{"name": "d", "type": ["null", "double"]}],
    }
    out = decode_record(sch, encode_record(sch, {"d": float("nan")}))
    assert math.isnan(out["d"])
    assert decode_record(sch, encode_record(sch, {"d": None})) == {"d": None}


def test_from_avro_py_null_payload_decodes_to_null_row(spark):
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from debezium_spark.formats.avro_codec import from_avro_py, to_avro_py

    st = T.StructType(
        [T.StructField("a", T.LongType()), T.StructField("b", T.StringType())]
    )
    df = spark.createDataFrame([(7, "y")], "a long, b string")
    enc = df.select(to_avro_py(F.struct("a", "b"), st).alias("av")).unionByName(
        spark.createDataFrame([(None,)], "av binary")
    )
    out = enc.select(from_avro_py(F.col("av"), st).alias("d")).collect()
    vals = sorted(
        (r["d"]["a"], r["d"]["b"]) for r in out if r["d"] is not None and r["d"]["a"] is not None
    )
    assert vals == [(7, "y")]
