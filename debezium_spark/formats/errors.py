"""Codec decode errors → P9 error modes (fail / warn / skip + DLQ).

Reference: the converters deployed behind the engine surface decode
failures through ``EventProcessingFailureHandlingMode``
(debezium-connector-common/src/main/java/io/debezium/config/
CommonConnectorConfig.java — fail/warn/skip) so one poison payload doesn't
stop the pipeline unless configured to; the sink side routes the poison
record to the DLQ with error context (debezium-sink/src/main/java/io/
debezium/sink/dlq/ErrorReporter.java).

Spark shape: ONE decode pass with ``on_error='mark'`` (the pandas-UDF
decoder catches per-row and reports the exception text in a ``__codec_err``
field — no second decode, no per-row Python round trips beyond the batch
already being decoded), then the standard P9 split: good rows continue with
the decoded struct, marked rows land in the quarantine table carrying the
actual decoder exception as the reason.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from debezium_spark.sinks.dlq import DeadLetterQueue, ProcessingFailure


def decode_or_quarantine(
    df: DataFrame,
    bytes_col: str,
    struct_type: T.StructType,
    *,
    codec: str,  # 'avro' | 'protobuf'
    mode: str = "fail",  # fail | warn | skip
    dlq: DeadLetterQueue | None = None,
    out_col: str = "decoded",
    epoch_id: int | None = None,
    warn=lambda m: None,
) -> DataFrame:
    """Decode ``bytes_col`` with the chosen codec under a P9 error mode.

    Returns the input rows that decoded cleanly (NULL payloads included —
    they are the documented all-NULL-row contract, not errors) with the
    decoded struct as ``out_col``. Malformed payloads: ``fail`` raises
    ProcessingFailure with the first decoder error; ``warn``/``skip``
    quarantine the offending input rows (with the per-row decoder
    exception text as the DLQ reason) and drop them from the result.
    """
    if codec == "avro":
        from debezium_spark.formats.avro_codec import from_avro_py as dec_fn
    elif codec == "protobuf":
        from debezium_spark.formats.protobuf_codec import (
            from_protobuf_py as dec_fn,
        )
    else:
        raise ValueError(f"unknown codec {codec!r} (want 'avro' or 'protobuf')")

    marked = dec_fn(F.col(bytes_col), struct_type, on_error="mark")
    tagged = df.withColumn("__dec", marked)
    err: Column = F.col("__dec.__codec_err")
    field_names = [f.name for f in struct_type.fields]
    clean_struct = F.struct(
        *[F.col(f"__dec.{n}").alias(n) for n in field_names]
    ).alias(out_col)
    good = (
        tagged.filter(err.isNull())
        .withColumn(out_col, clean_struct)
        .drop("__dec")
    )
    bad = tagged.filter(err.isNotNull())
    if mode == "fail":
        first = bad.select(err.alias("e")).limit(1).collect()
        if first:
            raise ProcessingFailure(f"{codec} decode failed: {first[0]['e']}")
        return good
    if mode not in ("warn", "skip"):
        raise ValueError(f"unknown failure mode: {mode}")
    if dlq is not None:
        # The marked struct stays on the quarantined row — the reference's
        # DLQ records carry error context headers; here the all-NULL decode
        # plus the per-row exception text serve that role.
        dlq.quarantine(
            bad,
            reason=F.concat(F.lit(f"{codec} decode failed: "), err),
            epoch_id=epoch_id,
        )
    if mode == "warn":
        warn(f"quarantined malformed {codec} payload(s)")
    return good
