"""Protobuf wire-format codec: spec-example goldens + round-trip law.

Golden byte strings are the protobuf encoding documentation's own examples
(protobuf.dev "Encoding"), so conformance is pinned against what protoc
itself produces for the same messages — the same discipline as the Avro
codec's spec-example goldens in test_avro.py.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from debezium_spark.formats.protobuf_codec import (
    decode_message,
    encode_message,
    proto_schema_for,
    proto_schema_text,
    protobuf_roundtrip,
)


def _schema(*fields):
    return proto_schema_for(T.StructType([T.StructField(n, t) for n, t in fields]))


def test_golden_varint_field():
    # Test1 { int32 a = 1; } with a=150 → 08 96 01
    s = _schema(("a", T.LongType()))
    assert encode_message(s, {"a": 150}) == bytes.fromhex("089601")


def test_golden_string_field():
    # Test2 { string b = 2; } with b="testing" → 12 07 74 65 73 74 69 6e 67
    s = _schema(("pad", T.LongType()), ("b", T.StringType()))
    assert encode_message(s, {"pad": None, "b": "testing"}) == bytes.fromhex(
        "120774657374696e67"
    )


def test_golden_embedded_message():
    # Test3 { Test1 c = 3; } with c.a=150 → 1a 03 08 96 01
    inner = T.StructType([T.StructField("a", T.LongType())])
    s = _schema(("p1", T.LongType()), ("p2", T.LongType()), ("c", inner))
    assert encode_message(s, {"p1": None, "p2": None, "c": {"a": 150}}) == (
        bytes.fromhex("1a03089601")
    )


def test_golden_packed_repeated():
    # Test4 { repeated int32 d = 4 } with d=[3,270,86942] →
    # 22 06 03 8e 02 9e a7 05 (proto3 packed default)
    s = _schema(
        ("p1", T.LongType()),
        ("p2", T.LongType()),
        ("p3", T.LongType()),
        ("d", T.ArrayType(T.LongType())),
    )
    enc = encode_message(s, {"p1": None, "p2": None, "p3": None, "d": [3, 270, 86942]})
    assert enc == bytes.fromhex("2206038e029ea705")


def test_golden_negative_int64_is_ten_bytes():
    # Spec: int64 negatives are two's complement — always a 10-byte varint.
    s = _schema(("a", T.LongType()))
    assert encode_message(s, {"a": -2}) == bytes.fromhex(
        "08feffffffffffffffff01"
    )
    assert decode_message(s, encode_message(s, {"a": -2}))["a"] == -2


def test_golden_bool_and_double():
    s = _schema(("f", T.BooleanType()), ("x", T.DoubleType()))
    enc = encode_message(s, {"f": True, "x": 1.0})
    # field1 varint 1 → 08 01; field2 fixed64 LE 1.0 → 11 000000000000f03f
    assert enc == bytes.fromhex("0801" + "11" + "000000000000f03f")


def test_explicit_presence_roundtrips_null_vs_zero():
    s = _schema(("a", T.LongType()), ("b", T.StringType()))
    # NULL field: absent from the wire → decodes to None.
    assert decode_message(s, encode_message(s, {"a": None, "b": None})) == {
        "a": None,
        "b": None,
    }
    # Explicit default values ARE written (presence semantics) and survive.
    enc = encode_message(s, {"a": 0, "b": ""})
    assert enc == bytes.fromhex("0800" + "1200")
    assert decode_message(s, enc) == {"a": 0, "b": ""}


def test_decoder_skips_unknown_fields():
    # A message with extra fields 9 (varint) and 10 (len-delimited) decodes
    # against a schema that only knows field 1 — spec-required tolerance.
    s1 = _schema(("a", T.LongType()))
    wide = _schema(
        *[(f"p{i}", T.LongType()) for i in range(8)], ("s", T.StringType())
    )
    # wide field nums: p0..p7 → 1..8, s → 9
    enc = encode_message(s1, {"a": 150}) + encode_message(
        wide, {**{f"p{i}": None for i in range(8)}, "s": "junk"}
    )
    assert decode_message(s1, enc)["a"] == 150


def test_decoder_accepts_unpacked_repeated_scalars():
    # Spec: parsers must accept repeated scalars in either packed or
    # unpacked form. Unpacked = one varint-tagged record per element.
    s = _schema(("d", T.ArrayType(T.LongType())))
    unpacked = bytes.fromhex("0803" + "08" + "8e02" + "08" + "9ea705")
    assert decode_message(s, unpacked)["d"] == [3, 270, 86942]


def test_roundtrip_nested_and_repeated():
    inner = T.StructType(
        [T.StructField("x", T.DoubleType()), T.StructField("s", T.StringType())]
    )
    st = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("tags", T.ArrayType(T.StringType())),
            T.StructField("vals", T.ArrayType(T.DoubleType())),
            T.StructField("sub", inner),
            T.StructField("blob", T.BinaryType()),
        ]
    )
    s = proto_schema_for(st)
    rec = {
        "id": -(2**62),
        "tags": ["a", "", "c"],
        "vals": [0.0, -1.5, math.inf],
        "sub": {"x": math.nan, "s": None},
        "blob": b"\x00\xff",
    }
    out = decode_message(s, encode_message(s, rec))
    assert out["id"] == rec["id"]
    assert out["tags"] == rec["tags"]
    assert out["vals"][:2] == [0.0, -1.5] and out["vals"][2] == math.inf
    assert math.isnan(out["sub"]["x"]) and out["sub"]["s"] is None
    assert out["blob"] == b"\x00\xff"


def test_int64_range_checked():
    s = _schema(("a", T.LongType()))
    with pytest.raises(OverflowError):
        encode_message(s, {"a": 2**63})


def test_proto_schema_text_renders_proto3():
    inner = T.StructType([T.StructField("a", T.LongType())])
    st = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("tags", T.ArrayType(T.StringType())),
            T.StructField("sub", inner),
        ]
    )
    text = proto_schema_text(proto_schema_for(st))
    assert "optional int64 id = 1;" in text
    assert "repeated string tags = 2;" in text
    assert "optional Envelope_sub sub = 3;" in text
    assert "message Envelope_sub {" in text


def test_spark_roundtrip_with_nulls(spark):
    df = spark.createDataFrame(
        [(1, "alpha", 10.5, "c"), (2, None, None, "u"), (3, "", 0.0, "d")],
        "id long, status string, balance double, op string",
    )
    rt = protobuf_roundtrip(df, ["id", "status", "balance", "op"])
    rows = {r["id"]: r for r in rt.collect()}
    assert rows[2]["status"] is None and rows[2]["balance"] is None
    assert rows[3]["status"] == "" and rows[3]["balance"] == 0.0
    assert rows[1]["balance"] == 10.5
    assert all(r["pb_len"] > 0 for r in rows.values())


def test_full_envelope_roundtrips_nested_structs(spark):
    """The real CDC envelope — nested before/after/source/transaction
    structs plus scalars — survives a wire round-trip, not just flat
    records: the nested-message encoding is what a reference-parity
    consumer would see."""
    from debezium_spark.envelope import wrap_snapshot
    from debezium_spark.formats.protobuf_codec import (
        from_protobuf_py,
        to_protobuf_py,
    )

    base = spark.createDataFrame(
        [(1, "a", 10.5), (2, None, None)], "id long, status string, balance double"
    )
    env = wrap_snapshot(base, ["id"], table="accounts", pos=7)
    st = env.schema
    rec = F.struct(*[F.col(c) for c in env.columns])
    rt = env.select(
        from_protobuf_py(to_protobuf_py(rec, st), st).alias("d")
    ).select("d.*")
    got = {r["after"]["id"]: r for r in rt.collect()}
    src = {r["after"]["id"]: r for r in env.collect()}
    assert set(got) == {1, 2}
    for k in got:
        assert got[k]["after"] == src[k]["after"]
        assert got[k]["before"] == src[k]["before"]
        assert got[k]["source"] == src[k]["source"]
        assert got[k]["op"] == src[k]["op"]
        assert got[k]["ts_ns"] == src[k]["ts_ns"]


def test_spark_roundtrip_matches_source(spark, sf_dir):
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        F.col("c_custkey").alias("id"),
        F.col("c_mktsegment").alias("status"),
        F.col("c_acctbal").alias("balance"),
    )
    rt = protobuf_roundtrip(cust, ["id", "status", "balance"])
    src = {r["id"]: (r["status"], r["balance"]) for r in cust.collect()}
    for r in rt.collect():
        assert src[r["id"]] == (r["status"], r["balance"])


def test_from_protobuf_py_null_payload_decodes_to_null_row(spark):
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from debezium_spark.formats.protobuf_codec import from_protobuf_py, to_protobuf_py

    st = T.StructType(
        [T.StructField("a", T.LongType()), T.StructField("b", T.StringType())]
    )
    df = spark.createDataFrame([(1, "x"), (2, None)], "a long, b string")
    enc = df.select(to_protobuf_py(F.struct("a", "b"), st).alias("pb"))
    # NULL out one payload, then decode the mixed column
    enc = enc.withColumn(
        "pb", F.when(F.col("pb").isNotNull() & (F.length("pb") > 0), F.col("pb"))
    )
    withnull = enc.unionByName(
        spark.createDataFrame([(None,)], "pb binary")
    )
    out = withnull.select(from_protobuf_py(F.col("pb"), st).alias("d")).collect()
    decoded = sorted(
        ((r["d"]["a"], r["d"]["b"]) for r in out if r["d"] is not None and r["d"]["a"] is not None)
    )
    assert decoded == [(1, "x"), (2, None)]
    assert any(r["d"] is None or r["d"]["a"] is None for r in out)
