"""F1 (Avro leg) — Avro envelope serialization, gated on the spark-avro jar.

The reference's Avro converter is config-selected the same way
(debezium-api/.../engine/format/Avro.java); this container ships without
the spark-avro package, so the functions raise with a clear remediation
instead of failing at import. CloudEvents/JSON (formats/cloudevents.py) is
the always-available F1 leg.
"""

from __future__ import annotations

from pyspark.sql import Column

try:  # pragma: no cover - environment probe
    from pyspark.sql.avro.functions import from_avro, to_avro  # noqa: F401

    _AVRO_IMPORTED = True
except Exception:  # pragma: no cover
    _AVRO_IMPORTED = False


def avro_available(spark) -> bool:
    """True when the spark-avro data source is actually loaded (the import
    alone succeeds even without the jar)."""
    if not _AVRO_IMPORTED:
        return False
    try:
        from pyspark.sql import functions as F

        spark.range(1).select(
            to_avro(F.struct(F.col("id"))).alias("b")
        ).collect()
        return True
    except Exception:
        return False


def envelope_to_avro(col: Column) -> Column:
    """Serialize a struct column to Avro bytes (requires spark-avro)."""
    if not _AVRO_IMPORTED:
        raise NotImplementedError(
            "spark-avro is not on the classpath; start the session with "
            "--packages org.apache.spark:spark-avro_2.13:<spark-version>, "
            "or use the pure-Python codec: formats.avro_codec.to_avro_py / "
            "from_avro_py (same binary encoding, jar-free)"
        )
    return to_avro(col)


def envelope_from_avro(col: Column, json_schema: str) -> Column:
    if not _AVRO_IMPORTED:
        raise NotImplementedError(
            "spark-avro is not on the classpath; start the session with "
            "--packages org.apache.spark:spark-avro_2.13:<spark-version>, "
            "or use the pure-Python codec: formats.avro_codec.to_avro_py / "
            "from_avro_py (same binary encoding, jar-free)"
        )
    return from_avro(col, json_schema)
