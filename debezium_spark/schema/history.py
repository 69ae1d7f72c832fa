"""Schema history / evolution registry (§1.2) + T13 ExtractSchemaToNewRecord.

Reference: ``SchemaHistory.record()/recover()`` (debezium-connector-common/
src/main/java/io/debezium/relational/history/SchemaHistory.java:34,183-224)
persists every DDL-induced schema version keyed by stream position so a
restart can reconstruct the schema in effect at any offset; the file backend
(debezium-storage/debezium-storage-file/.../FileSchemaHistory.java) is the
shape used here. ``ExtractSchemaToNewRecord`` (debezium-connect-plugins/.../
transforms/ExtractSchemaToNewRecord.java:53) copies the source schema
metadata into each record.

Spark shape: the registry is an append-only table (parquet in tests, Delta
in production) of ``(table, version, columns_json, valid_from_pos)``; the
"schema at position" lookup is a broadcast range join — the registry is
always tiny relative to the stream, so version attachment costs no shuffle
on the event side.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


_HISTORY_DDL = (
    "table string, version int, columns_json string, valid_from_pos long,"
    " defaults_json string"
)


class SchemaHistoryBackend:
    """SchemaHistory SPI (SchemaHistory.java:34): ``record`` appends one
    version row, ``recover`` replays the full history as a DataFrame,
    ``schema_at`` resolves the columns in effect at a stream position.

    The reference ships 8 storage backends under ``debezium-storage/``
    (file, memory, kafka, redis, jdbc, azure-blob, s3, configmap) behind
    this exact record/recover contract; the three here cover the
    local-runtime shapes — swapping in an object store is a URI change in
    the parquet backend, and a Kafka topic is the same append log."""

    def __init__(self, spark: SparkSession):
        self.spark = spark

    def record(
        self,
        table: str,
        version: int,
        columns: list[str],
        valid_from_pos: int,
        defaults: dict[str, str] | None = None,
    ) -> None:
        """Append one version row. ``defaults`` carries column DEFAULT
        expressions (the reference's ``Column.defaultValueExpression``
        propagated through schema history); None when the source has
        none."""
        raise NotImplementedError

    def recover(self) -> DataFrame:
        raise NotImplementedError

    def schema_at(self, table: str, pos: int) -> list[str]:
        """Columns in effect for ``table`` at stream position ``pos``."""
        rows = (
            self.recover()
            .filter((F.col("table") == table) & (F.col("valid_from_pos") <= pos))
            .orderBy(F.col("valid_from_pos").desc())
            .limit(1)
            .collect()
        )
        if not rows:
            raise KeyError(f"no schema recorded for {table} at pos {pos}")
        return json.loads(rows[0]["columns_json"])


class SchemaRegistry(SchemaHistoryBackend):
    """Parquet-backed history — the Spark-native default (object-store
    ready; Delta/Iceberg in production). Append-only like every backend."""

    def __init__(self, spark: SparkSession, path: str):
        super().__init__(spark)
        self.path = path

    def record(
        self,
        table: str,
        version: int,
        columns: list[str],
        valid_from_pos: int,
        defaults: dict[str, str] | None = None,
    ) -> None:
        """SchemaHistory.record: append one version row."""
        row = [(
            table, version, json.dumps(columns), valid_from_pos,
            json.dumps(defaults) if defaults else None,
        )]
        df = self.spark.createDataFrame(row, _HISTORY_DDL)
        df.coalesce(1).write.mode("append").parquet(self.path)

    def recover(self) -> DataFrame:
        """SchemaHistory.recover: the full version history."""
        if not os.path.exists(self.path):
            return self.spark.createDataFrame([], _HISTORY_DDL)
        return self.spark.read.parquet(self.path)


class FileSchemaHistory(SchemaHistoryBackend):
    """One JSON document per line, appended — the reference's file backend
    shape (debezium-storage/debezium-storage-file/src/main/java/io/debezium/
    storage/file/history/FileSchemaHistory.java stores newline-delimited
    JSON history records the same way)."""

    def __init__(self, spark: SparkSession, path: str):
        super().__init__(spark)
        self.path = path

    def record(
        self,
        table: str,
        version: int,
        columns: list[str],
        valid_from_pos: int,
        defaults: dict[str, str] | None = None,
    ) -> None:
        os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
        rec = {
            "table": table,
            "version": version,
            "columns_json": json.dumps(columns),
            "valid_from_pos": valid_from_pos,
            "defaults_json": json.dumps(defaults) if defaults else None,
        }
        with open(self.path, "a", encoding="utf-8") as fh:
            fh.write(json.dumps(rec) + "\n")

    def recover(self) -> DataFrame:
        if not os.path.exists(self.path):
            return self.spark.createDataFrame([], _HISTORY_DDL)
        with open(self.path, encoding="utf-8") as fh:
            rows = [json.loads(line) for line in fh if line.strip()]
        return self.spark.createDataFrame(
            [
                (r["table"], r["version"], r["columns_json"],
                 r["valid_from_pos"], r.get("defaults_json"))
                for r in rows
            ],
            _HISTORY_DDL,
        )


class MemorySchemaHistory(SchemaHistoryBackend):
    """In-process history (debezium-connector-common/.../relational/history/
    MemorySchemaHistory.java) — tests and embedded runs; lost on restart by
    design."""

    def __init__(self, spark: SparkSession):
        super().__init__(spark)
        self._rows: list[tuple] = []

    def record(
        self,
        table: str,
        version: int,
        columns: list[str],
        valid_from_pos: int,
        defaults: dict[str, str] | None = None,
    ) -> None:
        self._rows.append((
            table, version, json.dumps(columns), valid_from_pos,
            json.dumps(defaults) if defaults else None,
        ))

    def recover(self) -> DataFrame:
        return self.spark.createDataFrame(list(self._rows), _HISTORY_DDL)


class JdbcSchemaHistory(SchemaHistoryBackend):
    """SQL-database-backed history — the self-hosted deployment shape
    (debezium-storage/debezium-storage-jdbc/src/main/java/io/debezium/
    storage/jdbc/history/JdbcSchemaHistory.java: an auto-created history
    table, one INSERT per record(), full-table SELECT on recover()).
    Backed here by Python's stdlib sqlite3 — the same append-only SQL
    contract; a production server swap is a connection-string change."""

    _DDL = (
        "CREATE TABLE IF NOT EXISTS debezium_schema_history ("
        "  seq INTEGER PRIMARY KEY AUTOINCREMENT,"
        "  tbl TEXT NOT NULL,"
        "  version INTEGER NOT NULL,"
        "  columns_json TEXT NOT NULL,"
        "  valid_from_pos INTEGER NOT NULL,"
        "  defaults_json TEXT)"
    )

    def __init__(self, spark: SparkSession, db_path: str):
        super().__init__(spark)
        self.db_path = db_path

    def _conn(self):
        import sqlite3

        os.makedirs(os.path.dirname(self.db_path) or ".", exist_ok=True)
        conn = sqlite3.connect(self.db_path)
        conn.execute(self._DDL)
        return conn

    def record(
        self,
        table: str,
        version: int,
        columns: list[str],
        valid_from_pos: int,
        defaults: dict[str, str] | None = None,
    ) -> None:
        # `with conn` alone only scopes the transaction (commit/rollback),
        # not the file handle — closing() prevents a descriptor leak per
        # record() over a long-running streaming job.
        from contextlib import closing

        with closing(self._conn()) as conn, conn:
            conn.execute(
                "INSERT INTO debezium_schema_history"
                " (tbl, version, columns_json, valid_from_pos, defaults_json)"
                " VALUES (?, ?, ?, ?, ?)",
                (table, version, json.dumps(columns), valid_from_pos,
                 json.dumps(defaults) if defaults else None),
            )

    def recover(self) -> DataFrame:
        from contextlib import closing

        if not os.path.exists(self.db_path):
            return self.spark.createDataFrame([], _HISTORY_DDL)
        with closing(self._conn()) as conn, conn:
            rows = conn.execute(
                "SELECT tbl, version, columns_json, valid_from_pos,"
                " defaults_json"
                " FROM debezium_schema_history ORDER BY seq"
            ).fetchall()
        return self.spark.createDataFrame(rows, _HISTORY_DDL)


def registry_with_validity(registry_df: DataFrame) -> DataFrame:
    """Add ``valid_to_pos`` (exclusive) per version via a lead window —
    turns the append log into range-joinable intervals."""
    w = Window.partitionBy("table").orderBy("valid_from_pos")
    return registry_df.withColumn(
        "valid_to_pos",
        F.coalesce(F.lead("valid_from_pos").over(w), F.lit(2**62)),
    )


def attach_schema_version(
    env_df: DataFrame,
    registry_df: DataFrame,
    *,
    table_col: str = "source.table",
    pos_col: str = "source.pos",
) -> DataFrame:
    """T13: join each event to the schema version in effect at its position
    (ExtractSchemaToNewRecord.java:53 — schema metadata into the record).

    Broadcast range join: the registry side is versions-per-table (tiny);
    the event side keeps its partitioning — no shuffle of the stream.
    """
    reg = registry_with_validity(registry_df).select(
        F.col("table").alias("__t"),
        F.col("version").alias("__schema_version"),
        F.col("columns_json").alias("__schema_columns"),
        "valid_from_pos",
        "valid_to_pos",
    )
    joined = env_df.join(
        F.broadcast(reg),
        (F.col(table_col) == F.col("__t"))
        & (F.col(pos_col) >= F.col("valid_from_pos"))
        & (F.col(pos_col) < F.col("valid_to_pos")),
        "left",
    )
    return joined.drop("__t", "valid_from_pos", "valid_to_pos")


class ObjectStoreSchemaHistory(SchemaHistoryBackend):
    """Single-object history for append-less object stores — the
    S3 / Azure-blob storage shape (debezium-storage/debezium-storage-s3/
    src/main/java/io/debezium/storage/s3/history/S3SchemaHistory.java
    keeps ALL history records in ONE object and re-uploads the whole
    object on every ``record()``; the azure-blob backend mirrors it).

    Implemented over Hadoop's FileSystem layer, so the SAME code path runs
    against ``file:/`` in tests and ``s3a://`` / ``abfs://`` / ``hdfs://``
    in production — the swap is a URI, not new code. Each ``record()``
    reads the current object and rewrites it whole via ``create(overwrite)``
    (object PUTs are atomic — readers see the old or the new object, never
    a torn one, matching the reference's upload semantics); schema changes
    are rare, so the O(history) rewrite is the right trade for a store
    with no append."""

    def __init__(self, spark: SparkSession, uri: str):
        super().__init__(spark)
        self.uri = uri

    def _fs(self):
        jvm = self.spark._jvm
        path = jvm.org.apache.hadoop.fs.Path(self.uri)
        fs = path.getFileSystem(self.spark._jsc.hadoopConfiguration())
        return jvm, fs, path

    def _read_bytes(self) -> bytes:
        jvm, fs, path = self._fs()
        if not fs.exists(path):
            return b""
        stream = fs.open(path)
        try:
            return bytes(jvm.org.apache.commons.io.IOUtils.toByteArray(stream))
        finally:
            stream.close()

    def record(
        self,
        table: str,
        version: int,
        columns: list[str],
        valid_from_pos: int,
        defaults: dict[str, str] | None = None,
    ) -> None:
        rec = {
            "table": table,
            "version": version,
            "columns_json": json.dumps(columns),
            "valid_from_pos": valid_from_pos,
            "defaults_json": json.dumps(defaults) if defaults else None,
        }
        data = self._read_bytes() + (json.dumps(rec) + "\n").encode("utf-8")
        _, fs, path = self._fs()
        out = fs.create(path, True)
        try:
            out.write(data)
        finally:
            out.close()

    def recover(self) -> DataFrame:
        rows = [
            json.loads(line)
            for line in self._read_bytes().decode("utf-8").splitlines()
            if line.strip()
        ]
        return self.spark.createDataFrame(
            [
                (r["table"], r["version"], r["columns_json"],
                 r["valid_from_pos"], r.get("defaults_json"))
                for r in rows
            ],
            _HISTORY_DDL,
        )
