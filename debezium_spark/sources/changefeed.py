"""Deterministic change feeds derived from the synthetic test tables.

The reference's log-reading sources (S7 binlog / S8 pgoutput / S9 LogMiner /
S10 SQLServer CDC) all normalize into the same envelope stream; in this
container there is no database, so the test stand-in derives an envelope
stream from ``events.parquet`` — exactly the role the golden event fixtures
play in the reference's integration tests
(debezium-connector-binlog/src/test/resources/ddl/*.sql + *IT.java asserts).

The mapping is fixed so the DuckDB oracle can reproduce it:

  table    = 'accounts' (id BIGINT, status STRING, balance DOUBLE)
  key.id   = events.user_id
  op       = signup→'c', error→'d', purchase/click/view→'u'
  after    = (user_id, event_type, value)  for c/u; NULL for d
  before   = (user_id, NULL, NULL)         for u/d; NULL for c
  pos      = events.event_id (total order), tx_id = event_id // 16
  snapshot = customer → (c_custkey, c_mktsegment, c_acctbal) as op='r'
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from debezium_spark.envelope import make_envelope, wrap_snapshot

# SQL fragments shared with the DuckDB oracles (kept in one place so the two
# sides cannot drift).
OP_CASE_SQL = (
    "CASE event_type WHEN 'signup' THEN 'c' WHEN 'error' THEN 'd' ELSE 'u' END"
)


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The fixture generator has shipped events.ts as both TIMESTAMP(NANOS)
    # (scannable only as long nanos) and timestamp[us] (TIMESTAMP_NTZ).
    # Normalize here to ONE canonical encoding — `ts` as long nanos since
    # epoch, naive-UTC — so every downstream consumer and oracle sees the
    # same value regardless of the fixture vintage. nanosAsLong must be set
    # on the caller's session (the driver hands us ITS session) and must stay
    # set: executors consult it when decoding the nanos column at run time.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    ts_type = ev.schema["ts"].dataType.simpleString()
    if ts_type != "bigint":
        # timestamp / timestamp_ntz at µs precision. The NTZ→TZ cast is
        # wall-clock-preserving only under a UTC session timezone, so set it
        # just long enough for analysis to bind the zone into the Cast node
        # (forced via .schema below), then restore the caller's value —
        # a non-UTC driver session must not see its timezone silently changed.
        prev_tz = spark.conf.get("spark.sql.session.timeZone")
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        try:
            ev = ev.withColumn(
                "ts", F.unix_micros(F.col("ts").cast("timestamp")) * F.lit(1000)
            )
            ev.schema  # noqa: B018 - force analysis while the UTC conf holds
        finally:
            spark.conf.set("spark.sql.session.timeZone", prev_tz)
    return ev


def events_with_ts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events with `ts` rebuilt as a proper µs TIMESTAMP (`ts_utc`) from the
    long-nanos raw column, plus the raw nanos kept as `ts_ns`."""
    ev = _events(spark, sf_dir)
    # Integer `div`, not `/`: the nanos epoch (~1.7e18) exceeds double's 53-bit
    # integer range, so float division would corrupt the low digits.
    return ev.withColumn("ts_ns", F.col("ts")).withColumn(
        "ts_utc", F.timestamp_micros(F.expr("ts div 1000"))
    )


def accounts_changefeed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Envelope stream over the virtual ``accounts`` table."""
    ev = _events(spark, sf_dir)
    op = F.expr(OP_CASE_SQL)
    after_row = F.struct(
        F.col("user_id").alias("id"),
        F.col("event_type").alias("status"),
        F.col("value").alias("balance"),
    )
    before_row = F.struct(
        F.col("user_id").alias("id"),
        F.lit(None).cast("string").alias("status"),
        F.lit(None).cast("double").alias("balance"),
    )
    return make_envelope(
        ev,
        key=F.struct(F.col("user_id").alias("id")),
        before=F.when(op != "c", before_row),
        after=F.when(op != "d", after_row),
        op=op,
        db="testdb",
        table="accounts",
        pos=F.col("event_id"),
        tx_id=(F.col("event_id") / 16).cast("long").cast("string"),
        ts_ms=F.expr("ts div 1000000"),
        ts_us=F.expr("ts div 1000"),
        ts_ns=F.col("ts"),
    )


def accounts_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot phase of the same pipeline: customer → accounts ``r`` rows."""
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        F.col("c_custkey").alias("id"),
        F.col("c_mktsegment").alias("status"),
        F.col("c_acctbal").alias("balance"),
    )
    return wrap_snapshot(cust, ["id"], db="testdb", table="accounts")


# DuckDB oracle building blocks (ANSI SQL on the pre-registered views).
CHANGES_CTE = f"""
changes AS (
    SELECT user_id AS id,
           event_type AS status,
           value AS balance,
           event_id AS pos,
           CAST(event_id // 16 AS VARCHAR) AS tx_id,
           {OP_CASE_SQL} AS op
    FROM events
)"""

SNAPSHOT_CTE = """
snap AS (
    SELECT c_custkey AS id, c_mktsegment AS status, c_acctbal AS balance
    FROM customer
)"""

# Envelope semantics: a delete carries no after-image (Envelope.java:330-345),
# so the latest state for a key whose last event is 'd' is NULL status/balance.
LATEST_CTE = """
latest AS (
    SELECT id,
           CASE WHEN op = 'd' THEN NULL ELSE status END AS status,
           CASE WHEN op = 'd' THEN NULL ELSE balance END AS balance,
           pos, op
    FROM changes
    QUALIFY row_number() OVER (PARTITION BY id ORDER BY pos DESC) = 1
)"""
