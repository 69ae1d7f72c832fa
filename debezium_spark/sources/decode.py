"""S7/S8 — log-message decoding: binlog event dispatch and pgoutput-style
text message parsing into envelopes.

References:
* Binlog dispatch table (debezium-connector-binlog/.../
  BinlogStreamingChangeEventSource.java:201-222,250-301): WRITE_ROWS→insert,
  UPDATE_ROWS→update, DELETE_ROWS→delete, QUERY→DDL, XID→tx commit,
  TABLE_MAP→schema tracking.
* Postgres logical decoding (debezium-connector-postgres/.../connection/
  pgoutput/PgOutputMessageDecoder.java:84-113): R(relation) B(begin)
  C(commit) I U D T(truncate) message codes.

This module keeps the lightweight text-line grammar (the
test-decoding-style fixtures); the REAL binary pgoutput wire format —
Relation/Begin/Commit/Insert/Update/Delete/Truncate with tuple-data
sub-messages — is decoded in ``sources/pgoutput.py``, and the binlog v4 event format
(headers, TABLE_MAP, v2 rows events) in ``sources/binlog.py``. What
matters at 100 TB: decode is a narrow per-row projection (regexp + CASE —
whole-stage codegen), dispatch is a filter per route (one scan feeding all
routes), and malformed lines flow to the DLQ rather than killing the batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Binlog event-type → route (BinlogStreamingChangeEventSource.java:206-217).
BINLOG_DISPATCH = {
    "WRITE_ROWS": ("data", "c"),
    "UPDATE_ROWS": ("data", "u"),
    "DELETE_ROWS": ("data", "d"),
    "QUERY": ("schema", None),
    "TABLE_MAP": ("schema_track", None),
    "XID": ("tx_commit", None),
    "GTID": ("offset", None),
    "HEARTBEAT": ("heartbeat", None),
}


def binlog_dispatch(df: DataFrame, type_col: str = "event_kind") -> DataFrame:
    """Attach (route, op) per the dispatch table; unknown kinds route to
    'skip' (the reference ignores unregistered handlers)."""
    route = F.lit("skip")
    op = F.lit(None).cast("string")
    for kind, (r, o) in BINLOG_DISPATCH.items():
        route = F.when(F.col(type_col) == kind, F.lit(r)).otherwise(route)
        op = F.when(
            F.col(type_col) == kind,
            F.lit(o).cast("string"),
        ).otherwise(op)
    return df.withColumn("route", route).withColumn("op", op)


# pgoutput-ish text line:  <OP> <schema>.<table> id=<n> status=<s> balance=<f>
_MSG_RE = r"^([IUDBCT]) (\w+)\.(\w+)(?: id=(\d+))?(?: status=([\w-]+))?(?: balance=([0-9.:-]+))?$"


def format_pgoutput_line(
    op_code, table, id_col, status_col, balance_col
):
    """Encode side (the test-decoding fixture generator): deterministic text
    both engines can rebuild."""
    return F.concat_ws(
        " ",
        op_code,
        F.concat(F.lit("public."), table),
        F.concat(F.lit("id="), id_col.cast("string")),
        F.concat(F.lit("status="), status_col),
        F.concat(F.lit("balance="), balance_col.cast("string")),
    )


def decode_pgoutput(df: DataFrame, msg_col: str = "msg") -> DataFrame:
    """Parse message lines into (op, schema, table, id, status, balance);
    lines that don't match the grammar get op=NULL (DLQ-able), mirroring the
    decoder's unsupported-message skip path
    (PgOutputMessageDecoder.java:84-113)."""
    m = F.col(msg_col)
    code = F.regexp_extract(m, _MSG_RE, 1)
    valid = m.rlike(_MSG_RE)
    return df.select(
        "*",
        F.when(valid, code).alias("op_code"),
        F.when(valid, F.regexp_extract(m, _MSG_RE, 3)).alias("table"),
        F.when(valid, F.regexp_extract(m, _MSG_RE, 4).cast("long")).alias("id"),
        F.when(
            valid & (F.regexp_extract(m, _MSG_RE, 5) != ""),
            F.regexp_extract(m, _MSG_RE, 5),
        ).alias("status"),
        F.when(
            valid & (F.regexp_extract(m, _MSG_RE, 6) != ""),
            F.regexp_extract(m, _MSG_RE, 6).cast("double"),
        ).alias("balance"),
    )
