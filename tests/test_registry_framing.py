"""Schema-registry wire framing: magic byte + big-endian id + payload.

Golden bytes follow the public registry wire format: a framed message is
``00`` then the 4-byte big-endian schema id then the encoded payload —
what a registry-aware consumer of the Avro/Protobuf engine formats reads.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from debezium_spark.formats.registry import (
    SchemaIdRegistry,
    check_magic,
    frame,
    unframe_payload,
    unframe_schema_id,
)


def test_registry_assigns_stable_ids():
    reg = SchemaIdRegistry()
    a = reg.register("accounts-value", '{"type":"record"}')
    b = reg.register("orders-value", '{"type":"record"}')
    assert a == 1 and b == 2
    # same subject+schema → same id
    assert reg.register("accounts-value", '{"type":"record"}') == a
    assert reg.lookup(a) == '{"type":"record"}'
    with pytest.raises(KeyError):
        reg.lookup(99)


def test_frame_golden_bytes(spark):
    df = spark.createDataFrame([(bytearray(b"\xde\xad"),)], "p binary")
    out = df.select(frame(F.col("p"), 7).alias("f")).collect()[0]["f"]
    assert bytes(out) == b"\x00" + (7).to_bytes(4, "big") + b"\xde\xad"
    # large id exercises all 4 big-endian bytes
    out2 = df.select(
        frame(F.col("p"), 0x01020304).alias("f")
    ).collect()[0]["f"]
    assert bytes(out2) == b"\x00\x01\x02\x03\x04\xde\xad"


def test_unframe_roundtrip(spark):
    df = spark.createDataFrame(
        [(1, bytearray(b"alpha")), (2, bytearray(b"")), (3, bytearray(b"\x00\xff"))],
        "sid int, p binary",
    )
    framed = df.select("sid", "p", frame(F.col("p"), F.col("sid")).alias("f"))
    back = framed.select(
        "sid",
        "p",
        unframe_schema_id(F.col("f")).alias("rid"),
        unframe_payload(F.col("f")).alias("rp"),
        check_magic(F.col("f")).alias("ok"),
    ).collect()
    for r in back:
        assert r["rid"] == r["sid"]
        assert bytes(r["rp"] or b"") == bytes(r["p"])
        assert r["ok"] is True


def test_framed_avro_payload_decodes(spark):
    """End-to-end: registry-framed Avro messages decode after unframing —
    the deployment shape of the F1 Avro leg."""
    from pyspark.sql import types as T

    from debezium_spark.formats.avro_codec import (
        avro_schema_json,
        from_avro_py,
        to_avro_py,
    )

    st = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("s", T.StringType())]
    )
    reg = SchemaIdRegistry()
    sid = reg.register("t-value", avro_schema_json(st))
    df = spark.createDataFrame([(1, "a"), (2, None)], st)
    rec = F.struct("id", "s")
    framed = df.select(frame(to_avro_py(rec, st), sid).alias("f"))
    back = framed.select(
        unframe_schema_id(F.col("f")).alias("sid"),
        from_avro_py(unframe_payload(F.col("f")), st).alias("d"),
    ).select("sid", "d.*").collect()
    assert {(r["sid"], r["id"], r["s"]) for r in back} == {
        (sid, 1, "a"),
        (sid, 2, None),
    }


def test_unframe_roundtrips_unsigned32_ids(spark):
    """ids in [2^31, 2^32) must round-trip — frame() masks to unsigned 32,
    so unframe must read back as long, not a NULLing int cast."""
    big = 0x80000001
    df = spark.createDataFrame([(bytearray(b"x"),)], "p binary")
    out = df.select(
        unframe_schema_id(frame(F.col("p"), big)).alias("rid")
    ).collect()[0]
    assert out["rid"] == big
