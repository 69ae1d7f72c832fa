"""Schema-history storage backends: one SPI, interchangeable stores.

The reference keeps SchemaHistory storage pluggable (8 backends under
debezium-storage/); these tests pin the contract — every backend records
the same rows, recovers the same history, and answers the same
schema-at-position queries — so swapping the store never changes engine
behavior.
"""

from __future__ import annotations

import os

from debezium_spark.schema.history import (
    FileSchemaHistory,
    JdbcSchemaHistory,
    MemorySchemaHistory,
    ObjectStoreSchemaHistory,
    SchemaRegistry,
)

_VERSIONS = [
    ("accounts", 1, ["id", "status"], 0),
    ("accounts", 2, ["id", "status", "balance"], 500),
    ("orders", 1, ["oid", "total"], 100),
]


def _backends(spark, tmp_path):
    return [
        SchemaRegistry(spark, str(tmp_path / "parquet_hist")),
        FileSchemaHistory(spark, str(tmp_path / "hist.jsonl")),
        MemorySchemaHistory(spark),
        JdbcSchemaHistory(spark, str(tmp_path / "hist.sqlite")),
        # object-store (S3/Azure-blob) shape through Hadoop FS — file:/ here,
        # s3a:// / abfs:// in production, same code path
        ObjectStoreSchemaHistory(spark, "file:" + str(tmp_path / "hist_obj")),
    ]


def test_backends_record_and_recover_identically(spark, tmp_path):
    recovered = []
    for be in _backends(spark, tmp_path):
        for v in _VERSIONS:
            be.record(*v)
        rows = sorted(
            (r["table"], r["version"], r["columns_json"], r["valid_from_pos"])
            for r in be.recover().collect()
        )
        recovered.append(rows)
    assert all(r == recovered[0] for r in recovered[1:])
    assert len(recovered[0]) == len(_VERSIONS)


def test_backends_answer_schema_at_identically(spark, tmp_path):
    for be in _backends(spark, tmp_path):
        for v in _VERSIONS:
            be.record(*v)
        assert be.schema_at("accounts", 100) == ["id", "status"]
        assert be.schema_at("accounts", 500) == ["id", "status", "balance"]
        assert be.schema_at("orders", 10**9) == ["oid", "total"]
        try:
            be.schema_at("accounts", -1)
            raise AssertionError("expected KeyError before first version")
        except KeyError:
            pass


def test_empty_history_recovers_empty(spark, tmp_path):
    for be in _backends(spark, tmp_path):
        assert be.recover().count() == 0


def test_attach_schema_version_from_file_backend(spark, tmp_path):
    """T13 version attachment works off ANY backend's recover() output —
    the range join only sees a DataFrame."""
    from pyspark.sql import functions as F

    from debezium_spark.schema.history import attach_schema_version

    be = FileSchemaHistory(spark, str(tmp_path / "hist.jsonl"))
    for v in _VERSIONS:
        be.record(*v)
    env = spark.createDataFrame(
        [("accounts", 50), ("accounts", 700), ("orders", 400)],
        "tbl string, p long",
    ).select(
        F.struct(
            F.col("tbl").alias("table"), F.col("p").alias("pos")
        ).alias("source")
    )
    out = attach_schema_version(env, be.recover())
    got = {
        (r["source"]["table"], r["source"]["pos"]): r["__schema_version"]
        for r in out.collect()
    }
    assert got == {("accounts", 50): 1, ("accounts", 700): 2, ("orders", 400): 1}


def test_merge_sink_accepts_file_backend(spark, tmp_path):
    """K6 evolution records flow into whichever backend is plugged in."""
    from debezium_spark.envelope import wrap_snapshot
    from debezium_spark.sinks.merge import ParquetMergeSink

    be = FileSchemaHistory(spark, str(tmp_path / "hist.jsonl"))
    base = spark.createDataFrame(
        [(1, "a"), (2, "b")], "id long, status string"
    )
    env = wrap_snapshot(base, ["id"], table="accounts", pos=1)
    sink = ParquetMergeSink(
        spark,
        str(tmp_path / "target"),
        ["id"],
        num_buckets=2,
        schema_registry=be,
        table_name="accounts",
    )
    sink.write_batch(env, epoch_id=0)
    # evolve: add a column, merge again
    evolved = spark.createDataFrame(
        [(3, "c", 9.5)], "id long, status string, balance double"
    )
    env2 = wrap_snapshot(evolved, ["id"], table="accounts", pos=50)
    sink.write_batch(env2, epoch_id=1)
    hist = be.recover().collect()
    assert any("balance" in r["columns_json"] for r in hist)
    # the sink records the physical layout (incl. its bucket column)
    assert set(be.schema_at("accounts", 50)) >= {"id", "status", "balance"}
    assert os.path.exists(str(tmp_path / "hist.jsonl"))


def test_jdbc_backend_survives_restart(spark, tmp_path):
    """A new JdbcSchemaHistory instance over the same database file sees
    the full history — the restart-recovery property the storage backend
    exists for (JdbcSchemaHistory.java recover-from-table contract)."""
    db = str(tmp_path / "hist.sqlite")
    writer = JdbcSchemaHistory(spark, db)
    for v in _VERSIONS:
        writer.record(*v)
    reader = JdbcSchemaHistory(spark, db)
    assert reader.recover().count() == len(_VERSIONS)
    assert reader.schema_at("accounts", 600) == ["id", "status", "balance"]


def test_object_store_backend_survives_restart(spark, tmp_path):
    """A new instance over the same URI recovers everything — the
    whole-object re-upload semantics (S3SchemaHistory) hold across
    restarts, and partial writes can't tear the object (old-or-new)."""
    uri = "file:" + str(tmp_path / "hist_obj")
    be = ObjectStoreSchemaHistory(spark, uri)
    for v in _VERSIONS:
        be.record(*v)
    fresh = ObjectStoreSchemaHistory(spark, uri)
    assert fresh.recover().count() == len(_VERSIONS)
    assert fresh.schema_at("accounts", 600) == ["id", "status", "balance"]
