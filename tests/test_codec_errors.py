"""P9 error modes wired into the Avro/Protobuf decode path: a malformed
(not merely NULL) payload lands in the quarantine table with the decoder's
exception text instead of raising mid-stage — unless mode='fail', the
connector-stop semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from debezium_spark.formats.errors import decode_or_quarantine
from debezium_spark.sinks.dlq import DeadLetterQueue, ProcessingFailure

ST = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("status", T.StringType()),
    ]
)


def _payload_df(spark, codec):
    """Three payloads: one valid, one NULL (documented all-NULL contract),
    one corrupt."""
    if codec == "avro":
        from debezium_spark.formats.avro_codec import avro_schema_for, encode_record

        good = encode_record(avro_schema_for(ST), {"id": 7, "status": "active"})
    else:
        from debezium_spark.formats.protobuf_codec import (
            encode_message,
            proto_schema_for,
        )

        good = encode_message(proto_schema_for(ST), {"id": 7, "status": "active"})
    corrupt = b"\xff\xff\xff\xff\xff"
    return spark.createDataFrame(
        [(1, bytearray(good)), (2, None), (3, bytearray(corrupt))],
        "seq long, payload binary",
    )


@pytest.mark.parametrize("codec", ["avro", "protobuf"])
def test_skip_mode_quarantines_malformed_payload(spark, tmp_path, codec):
    df = _payload_df(spark, codec)
    dlq = DeadLetterQueue(spark, str(tmp_path / f"dlq_{codec}"))
    good = decode_or_quarantine(
        df, "payload", ST, codec=codec, mode="skip", dlq=dlq, epoch_id=4
    )
    rows = {r["seq"]: r["decoded"] for r in good.collect()}
    # valid row decoded; NULL payload kept as the all-NULL row; corrupt gone
    assert set(rows) == {1, 2}
    assert rows[1]["id"] == 7 and rows[1]["status"] == "active"
    assert rows[2]["id"] is None and rows[2]["status"] is None
    q = dlq.read().collect()
    assert len(q) == 1  # skip-count: exactly the one corrupt payload
    assert q[0]["seq"] == 3
    assert q[0]["__error"].startswith(f"{codec} decode failed: ")
    assert q[0]["__epoch"] == 4


@pytest.mark.parametrize("codec", ["avro", "protobuf"])
def test_fail_mode_raises_on_malformed_payload(spark, codec):
    df = _payload_df(spark, codec)
    with pytest.raises(ProcessingFailure, match=f"{codec} decode failed"):
        decode_or_quarantine(df, "payload", ST, codec=codec, mode="fail")


@pytest.mark.parametrize("codec", ["avro", "protobuf"])
def test_fail_mode_passes_clean_batches(spark, codec):
    df = _payload_df(spark, codec).filter(F.col("seq") != 3)
    good = decode_or_quarantine(df, "payload", ST, codec=codec, mode="fail")
    assert good.count() == 2


def test_warn_mode_invokes_warn_and_quarantines(spark, tmp_path):
    df = _payload_df(spark, "protobuf")
    dlq = DeadLetterQueue(spark, str(tmp_path / "dlq"))
    msgs = []
    good = decode_or_quarantine(
        df, "payload", ST, codec="protobuf", mode="warn", dlq=dlq,
        warn=msgs.append,
    )
    assert good.count() == 2
    assert len(dlq.read().collect()) == 1
    assert msgs and "protobuf" in msgs[0]
