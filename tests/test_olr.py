"""OpenLogReplicator adapter goldens (sources/olr.py): wire framing,
handshake protobuf, the value-converter arms, and the restart replay
gate — pinned against the reference's olr/ module semantics."""

from __future__ import annotations

import json
import struct

import pytest
from pyspark.sql import functions as F

from debezium_spark.sources.olr import (
    REQUEST_CONTINUE,
    REQUEST_START,
    decode_olr_events,
    encode_olr_frame,
    encode_redo_request,
    olr_replay_filter,
    olr_typed_value,
    parse_redo_response,
    split_frames,
)


def test_frame_split_and_truncation():
    a, b = b'{"scn":"1"}', b'{"scn":"2","payload":[]}'
    blob = encode_olr_frame(a) + encode_olr_frame(b)
    assert split_frames(blob) == [a, b]
    assert split_frames(b"") == []
    # a cut length prefix and an overrunning frame both raise cleanly
    with pytest.raises(ValueError, match="length prefix"):
        split_frames(blob + b"\x05\x00")
    with pytest.raises(ValueError, match="overruns"):
        split_frames(struct.pack("<I", 99) + b"short")


def test_handshake_request_and_response_wire():
    """RedoRequest/RedoResponse ride the repo's pure-Python protobuf
    codec with OraProtoBuf.proto's field numbers; frames are 4-byte-LE
    length-prefixed like every OLR message
    (OlrNetworkClient.java:62,385-388)."""
    from debezium_spark.formats.protobuf_codec import encode_message

    frame = encode_redo_request(REQUEST_START, "ORCLPDB1", scn=5000)
    (n,) = struct.unpack_from("<I", frame, 0)
    payload = frame[4:]
    assert n == len(payload)
    # field 1 (code=START=1): tag 0x08 varint 1; field 2: tag 0x12 LEN
    assert payload[0:2] == b"\x08\x01"
    assert b"ORCLPDB1" in payload
    # field 3 (scn): tag = 3<<3 | 0 = 0x18
    assert b"\x18" + bytes([5000 & 0x7F | 0x80, 5000 >> 7]) in payload

    cont = encode_redo_request(
        REQUEST_CONTINUE, "ORCLPDB1", c_scn=7000, c_idx=3)
    # c_scn field 8 -> tag 0x40, c_idx field 9 -> tag 0x48
    assert b"\x40" in cont and b"\x48\x03" in cont[4:]

    resp = encode_message(
        {"name": "RedoResponse", "fields": [
            {"name": "code", "num": 1, "type": "int64", "repeated": False},
            {"name": "c_scn", "num": 10, "type": "int64",
             "repeated": False},
        ]},
        {"code": 4, "c_scn": 9000},
    )
    out = parse_redo_response(resp)
    assert out["code"] == 4 and out["c_scn"] == 9000


def _typed(spark, meta, text):
    df = spark.createDataFrame([(text,)], "v string")
    return df.select(
        olr_typed_value(F.col("v"), meta).alias("t")
    ).collect()[0]["t"]


def test_value_converter_arms(spark):
    """NUMBER precision/scale + the FLOAT binary-scale marker, RAW hex,
    BINARY_DOUBLE Inf spellings, TIMESTAMP WITH TIME ZONE offset
    rendering (named zones raise), intervals to ISO-8601 — per
    OpenLogReplicatorValueConverter.java."""
    from decimal import Decimal

    assert _typed(spark, {"type": "NUMBER", "precision": 8, "scale": 2},
                  "123.45") == Decimal("123.45")
    assert _typed(spark, {"type": "NUMBER", "precision": 5,
                          "scale": -127}, "2.5") == 2.5
    assert bytes(_typed(spark, {"type": "RAW"}, "DEADBEEF")) == \
        b"\xde\xad\xbe\xef"
    import math
    assert _typed(spark, {"type": "BINARY_DOUBLE"}, "-Inf") == \
        float("-inf")
    assert math.isnan(_typed(spark, {"type": "BINARY_FLOAT"}, "Nan"))
    # 2021-01-01T00:00:00.5 UTC in nanos, viewed at +05:30
    nanos = str(1_609_459_200_500_000_000)
    assert _typed(spark, {"type": "TIMESTAMP_WITH_TZ"},
                  nanos + ",+05:30") == "2021-01-01T05:30:00.5+05:30"
    assert _typed(spark, {"type": "TIMESTAMP_WITH_LOCAL_TZ"},
                  nanos) == "2021-01-01T00:00:00.5Z"
    with pytest.raises(Exception, match="tz-database"):
        _typed(spark, {"type": "TIMESTAMP_WITH_TZ"},
               nanos + ",America/New_York")
    assert _typed(spark, {"type": "INTERVAL_YEAR_TO_MONTH"},
                  "2-3") == "P2Y3M0DT0H0M0S"
    assert _typed(spark, {"type": "INTERVAL_DAY_TO_SECOND"},
                  "5,10:30:15.5") == "P0Y0M5DT10H30M15.5S"
    with pytest.raises(ValueError, match="no typed mapping"):
        olr_typed_value(F.col("v"), {"type": "SDO_GEOMETRY"})


def test_replay_gate_matches_reference_predicate(spark):
    """isAlreadyEmitted (OpenLogReplicatorStreamingChangeEventSource
    .java:231-251): rows strictly before the replay SCN drop; AT the
    replay SCN only the replayed transaction's rows at-or-below the
    replayed index drop; everything else streams."""
    rows = [
        (5, 1, "xa"),   # before replay scn -> dropped
        (7, 2, "xa"),   # at scn, same xid, idx <= 3 -> dropped
        (7, 3, "xa"),   # at scn, same xid, idx == 3 -> dropped
        (7, 4, "xa"),   # at scn, same xid, idx > 3 -> kept
        (7, 1, "xb"),   # at scn, DIFFERENT xid -> kept
        (9, 1, "xc"),   # past -> kept
    ]
    df = spark.createDataFrame(rows, "c_scn long, c_idx long, xid string")
    kept = sorted(
        (r["c_scn"], r["c_idx"], r["xid"])
        for r in olr_replay_filter(df, 7, 3, "xa").collect()
    )
    assert kept == [(7, 1, "xb"), (7, 4, "xa"), (9, 1, "xc")]
    assert olr_replay_filter(df, None).count() == 6


def test_malformed_event_raises(spark):
    df = spark.createDataFrame(
        [(bytearray(b"not json at all"),)], "msg binary"
    )
    with pytest.raises(Exception, match="Malformed|FAILFAST|malformed"):
        decode_olr_events(df).collect()


def test_event_timestamp_unit_inference(spark):
    """The four epoch units decode to the same instant via the magnitude
    cascade (StreamingEvent.TimestampAsInstantDeserializer:108-140)."""
    base = 1_700_000_000
    docs = [
        json.dumps({"scn": str(i), "tm": str(base * mult), "xid": "x",
                    "db": "D", "c_scn": str(i), "c_idx": 0,
                    "payload": [{"op": "begin"}]})
        for i, mult in enumerate(
            [1, 1_000, 1_000_000, 1_000_000_000])
    ]
    df = spark.createDataFrame(
        [(bytearray(d.encode()),) for d in docs], "msg binary"
    )
    out = decode_olr_events(df).select(
        F.unix_micros("tm").alias("us")).collect()
    assert {r["us"] for r in out} == {base * 1_000_000}


def test_stream_decoder_accumulates_schemas_and_confirm(spark):
    """OlrStreamDecoder: a schema seen only in batch 1 still types batch
    2's mutations (cross-batch registry, the BinlogStreamDecoder
    pattern); confirm_request frames a CONFIRM RedoRequest at the
    batch's high-water (c_scn, c_idx) — the reference's delivery ack
    (OlrNetworkClient.confirm:240-246)."""
    from debezium_spark.sources.olr import (
        REQUEST_CONFIRM,
        OlrStreamDecoder,
        confirm_request,
        parse_redo_response,
    )
    from debezium_spark.formats.protobuf_codec import decode_message

    COLS = [{"name": "ID", "type": "NUMBER", "precision": 5, "scale": 0,
             "length": 22, "nullable": False}]

    def ev(scn, idx, op, with_schema, val):
        mut = {"op": op, "rid": "r", "after": {"ID": str(val)}}
        if with_schema:
            mut["schema"] = {"owner": "S", "table": "T", "obj": 1,
                             "columns": COLS}
        else:
            mut["schema"] = {"owner": "S", "table": "T", "obj": 1}
        return json.dumps({
            "scn": str(scn), "tm": str(1_700_000_000), "xid": "x",
            "db": "D", "c_scn": str(scn), "c_idx": idx, "payload": [mut],
        })

    dec = OlrStreamDecoder()
    b1 = spark.createDataFrame(
        [(bytearray(ev(10, 1, "c", True, 7).encode()),)], "msg binary")
    d1 = dec.decode_batch(b1)
    assert dec.typed_rows(d1, "S", "T").collect()[0]["ID"] == 7

    # batch 2: mutation WITHOUT columns -> registry carries over
    b2 = spark.createDataFrame(
        [(bytearray(ev(12, 2, "c", False, 9).encode()),)], "msg binary")
    d2 = dec.decode_batch(b2)
    assert dec.typed_rows(d2, "S", "T").collect()[0]["ID"] == 9

    frame = confirm_request(d2, "ORCLPDB1")
    (n,) = struct.unpack_from("<I", frame, 0)
    req = decode_message(
        {"name": "RedoRequest", "fields": [
            {"name": "code", "num": 1, "type": "int64", "repeated": False},
            {"name": "database_name", "num": 2, "type": "string",
             "repeated": False},
            {"name": "c_scn", "num": 8, "type": "int64", "repeated": False},
            {"name": "c_idx", "num": 9, "type": "int64", "repeated": False},
        ]}, frame[4:])
    assert req["code"] == REQUEST_CONFIRM
    assert req["c_scn"] == 12 and req["c_idx"] == 2
    assert req["database_name"] == "ORCLPDB1"

    empty = spark.createDataFrame([], "c_scn long, c_idx long")
    assert confirm_request(empty, "ORCLPDB1") is None


def test_review_fixes_replay_partial_args_negative_scale_registry(spark):
    """r13 review: (1) a replay filter given only the SCN must KEEP rows
    at that SCN (three-valued logic previously dropped them silently);
    (2) NUMBER(p, negative scale) widens to decimal(p+|s|, 0) instead of
    building an illegal Spark decimal; (3) the schema registry picks the
    variant with the HIGHEST checkpoint SCN when a batch spans an ALTER,
    not a nondeterministic distinct-order winner."""
    from decimal import Decimal

    from debezium_spark.sources.olr import (
        decode_olr_events,
        olr_replay_filter,
        olr_schema_registry,
        olr_typed_value,
    )

    rows = [(5, 1, "xa"), (7, 2, "xa"), (9, 1, "xb")]
    df = spark.createDataFrame(rows, "c_scn long, c_idx long, xid string")
    kept = sorted(r["c_scn"] for r in olr_replay_filter(df, 7).collect())
    assert kept == [7, 9]

    v = spark.createDataFrame([("1200",)], "v string").select(
        olr_typed_value(
            F.col("v"), {"type": "NUMBER", "precision": 5, "scale": -2}
        ).alias("t")
    ).collect()[0]["t"]
    assert v == Decimal("1200")

    def ev(scn, cols):
        mut = {"op": "c", "rid": "r", "after": {"ID": "1"},
               "schema": {"owner": "S", "table": "T", "obj": 1,
                          "columns": cols}}
        return json.dumps({"scn": str(scn), "tm": "1700000000",
                           "xid": "x", "db": "D", "c_scn": str(scn),
                           "c_idx": 0, "payload": [mut]})

    v1 = [{"name": "ID", "type": "NUMBER", "precision": 5, "scale": 0,
           "length": 22, "nullable": False}]
    v2 = v1 + [{"name": "N2", "type": "VARCHAR2", "length": 10,
                "nullable": True}]
    msgs = spark.createDataFrame(
        [(bytearray(ev(20, v2).encode()),),   # NEWER schema, earlier row
         (bytearray(ev(10, v1).encode()),)],
        "msg binary",
    )
    reg = olr_schema_registry(decode_olr_events(msgs))
    assert [c["name"] for c in reg[("S", "T")]] == ["ID", "N2"]
