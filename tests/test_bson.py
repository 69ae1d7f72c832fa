"""BSON codec byte goldens + the MongoDataConverter typed projection
(bsonspec.org layout; MongoDataConverter.java:620-663,785-835)."""

from __future__ import annotations

import struct

import pytest

from debezium_spark.sources.bson import (
    Binary,
    DateTime,
    Decimal128,
    JavaScript,
    ObjectId,
    Regex,
    Timestamp,
    decode_bson,
    encode_bson,
)


def test_spec_example_bytes():
    # the bsonspec.org worked example: {"hello": "world"}
    buf = encode_bson({"hello": "world"})
    assert buf == (
        b"\x16\x00\x00\x00"            # total 22
        b"\x02hello\x00"               # string element
        b"\x06\x00\x00\x00world\x00"
        b"\x00"
    )
    assert decode_bson(buf) == {"hello": "world"}


def test_scalar_layouts_round_trip():
    doc = {
        "i32": 7,
        "i64": 5_000_000_000,
        "dbl": 0.5,
        "s": "héllo",
        "b": True,
        "n": None,
        "bin": Binary(0x80, b"\x01\x02"),
        "oid": ObjectId(bytes(range(12))),
        "dt": DateTime(1421363065000),
        "ts": Timestamp(1565545664, 1),
        "rx": Regex("^a.*b$", "i"),
        "js": JavaScript("function(){}"),
        "arr": [1, "two", None],
        "sub": {"k": 1},
    }
    buf = encode_bson(doc)
    out = decode_bson(buf)
    assert out == doc
    # int32 vs int64 discrimination is on the wire, not just in Python
    assert b"\x10i32\x00" in buf and b"\x12i64\x00" in buf
    # timestamp packs (increment, time) little-endian
    i = buf.index(b"\x11ts\x00") + 4
    assert struct.unpack_from("<II", buf, i) == (1, 1565545664)


def test_decimal128_bid_encoding_and_tostring():
    # 1234.56 -> coefficient 123456, exponent -2 (BID small form)
    d = Decimal128(False, "123456", -2)
    buf = encode_bson({"d": d})
    bits = int.from_bytes(buf[buf.index(b"\x13d\x00") + 3 :][:16], "little")
    assert bits & ((1 << 113) - 1) == 123456
    assert ((bits >> 113) & 0x3FFF) - 6176 == -2
    assert decode_bson(buf)["d"] == d

    # Java Decimal128.toString rules
    assert str(Decimal128(False, "123456", -2)) == "1234.56"
    assert str(Decimal128(True, "5", -1)) == "-0.5"
    assert str(Decimal128(False, "5", -8)) == "5E-8"      # adj -8 < -6
    assert str(Decimal128(False, "15", 2)) == "1.5E+3"    # exp > 0
    assert str(Decimal128(False, "1", 0)) == "1"
    assert str(Decimal128(False, "123", -6)) == "0.000123"

    # Inf/NaN / large-coefficient form refuses
    inf = (0b11110 << 122).to_bytes(16, "little")
    raw = (
        b"\x18\x00\x00\x00" + b"\x13x\x00" + inf + b"\x00"
    )
    with pytest.raises(ValueError, match="decimal128"):
        decode_bson(raw)


def test_framing_errors_raise():
    good = encode_bson({"a": 1})
    with pytest.raises(ValueError, match="length"):
        decode_bson(good[:-2])
    bad = bytearray(good)
    bad[-1] = 1
    with pytest.raises(ValueError, match="length|NUL"):
        decode_bson(bytes(bad))


def test_typed_table_conversions(spark):
    from debezium_spark.sources.bson import bson_typed_table

    docs = [
        (
            1,
            bytearray(encode_bson({
                "name": "a",
                "oid": ObjectId(b"\x54\xb7\x13\x79" + b"\x00" * 8),
                "price": Decimal128(False, "1999", -2),
                "created": DateTime(1_421_363_065_123),
                "seen": Timestamp(1_565_545_664, 7),
                "ok": True,
                "score": 2.5,
                "payload": Binary(0, b"\xde\xad"),
                "tags": ["x", "y"],
                "rx": Regex("^a", "im"),
                "js": JavaScript("f()"),
                "n32": 7,
                "n64": 6_000_000_000,
            })),
        ),
        (2, bytearray(encode_bson({"name": None}))),  # nulls + missing
    ]
    df = spark.createDataFrame(docs, "pos long, doc binary")
    out = bson_typed_table(
        df,
        [
            ("name", "string"), ("oid", "objectid"),
            ("price", "decimal128"), ("created", "datetime"),
            ("seen", "timestamp"), ("ok", "boolean"),
            ("score", "double"), ("payload", "binary"),
            ("tags", "array_string"), ("rx", "regex"),
            ("js", "javascript"), ("n32", "int32"), ("n64", "int64"),
        ],
    ).orderBy("pos").collect()

    r = out[0]
    assert r["oid"] == "54b71379" + "00" * 8
    assert r["price"] == "19.99"
    assert r["created"] == 1_421_363_065_123          # DATE_TIME ms
    assert r["seen"] == 1_565_545_664_000             # TIMESTAMP s*1000
    assert r["ok"] is True and r["score"] == 2.5
    assert bytes(r["payload"]) == b"\xde\xad"          # subtype dropped
    assert r["tags"] == ["x", "y"]
    assert r["rx"]["regex"] == "^a" and r["rx"]["options"] == "im"
    assert r["js"] == "f()" and r["n32"] == 7
    assert r["n64"] == 6_000_000_000

    r2 = out[1]
    assert r2["name"] is None and r2["oid"] is None and r2["n32"] is None


def test_typed_table_type_mismatch_raises(spark):
    from debezium_spark.sources.bson import bson_typed_table

    df = spark.createDataFrame(
        [(1, bytearray(encode_bson({"price": "not-a-decimal"})))],
        "pos long, doc binary",
    )
    with pytest.raises(Exception, match="does not match declared"):
        bson_typed_table(df, [("price", "decimal128")]).collect()
