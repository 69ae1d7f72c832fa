"""Source↔sink consistency audit — bucketed table fingerprints.

Every CDC deployment eventually asks "does the sink still equal the
source?" — the reference answers it structurally (incremental-snapshot
watermarking re-reads chunks consistently,
debezium-connector-common/src/main/java/io/debezium/pipeline/source/snapshot/incremental/
AbstractIncrementalSnapshotChangeEventSource.java), and operators pair it
with an external checksum validation run. This module is that validation
as a first-class operator.

Spark shape: one scan → map-side bucket assignment → one hash aggregation
producing ``num_buckets`` rows of (bucket, n, h): row count and an
order-independent hash sum per bucket. Comparing two fingerprints (sink
vs source, or sink vs yesterday's sink) is then a ``num_buckets``-row
join — O(table) scan once per side, O(buckets) everything after, and a
mismatch names the BUCKET to re-sync, which is exactly the chunk shape
the incremental snapshot re-reads (send an execute-snapshot signal with
the bucket's key range as its additional-condition).

Engine-portable by construction: the row hash is the md5-based
:func:`~debezium_spark.analytics.text.portable_hash64` over an explicit,
deterministic string rendering (callers pick render-safe column
expressions — cast floats to fixed-scale DECIMAL; raw float→string
rendering differs across engines), reduced mod a prime so per-bucket sums
fit comfortably in ``BIGINT`` on any engine (DuckDB's ``sum`` widens to
HUGEINT; the mod keeps the cast back lossless for < ~9e9 rows/bucket).
A database can therefore compute ITS OWN fingerprint with three lines of
ANSI SQL and never ship a row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from debezium_spark.analytics.text import oracle_hash64, portable_hash64

# Per-row hashes are reduced mod this prime before the per-bucket sum:
# sums stay < 2^63 up to ~9.2e9 rows per bucket on every engine.
HASH_MOD = 1_000_000_007

_SEP = "\x1f"  # unit separator: can't appear in rendered numeric/key text


def row_render(cols: list[str | Column]) -> Column:
    """Deterministic one-string rendering of a row: values joined on the
    0x1f unit separator, NULL rendered as the empty field (concat_ws
    skips-with-separator semantics differ across engines — coalesce
    explicitly instead)."""
    rendered = [
        F.coalesce(
            (F.col(c) if isinstance(c, str) else c).cast("string"), F.lit("")
        )
        for c in cols
    ]
    return F.concat_ws(_SEP, *rendered)


def oracle_row_render(exprs: list[str]) -> str:
    """DuckDB twin of :func:`row_render` (same separator, same NULL→'')."""
    parts = ", ".join(f"coalesce(CAST({e} AS VARCHAR), '')" for e in exprs)
    return f"concat_ws(chr(31), {parts})"


def table_fingerprint(
    df: DataFrame,
    key_cols: list[str],
    value_cols: list[str | Column] | None = None,
    *,
    num_buckets: int = 64,
    seed: str = "fp:",
) -> DataFrame:
    """Bucketed fingerprint of a table: per key-hash bucket, the row count
    and an order-independent content hash.

    Output (one row per non-empty bucket):
      * ``bucket``  — ``portable_hash64(key) % num_buckets``
      * ``n``       — rows in the bucket
      * ``h``       — ``sum(portable_hash64(key ∥ values) % HASH_MOD)``

    ``value_cols`` defaults to the key columns only (a key-presence
    check); pass explicit render-safe expressions to audit content too.
    Equal fingerprints ⇒ same keys and same rendered content per bucket
    (up to hash collision, ~n²/2⁶⁰ per bucket); a differing row names its
    bucket for a targeted re-sync."""
    key_render = row_render(list(key_cols))
    full_render = row_render(list(key_cols) + list(value_cols or []))
    bucket = (
        portable_hash64(key_render, seed=seed) % F.lit(num_buckets)
    ).cast("int")
    row_h = portable_hash64(full_render, seed=seed) % F.lit(HASH_MOD)
    return (
        df.select(bucket.alias("bucket"), row_h.alias("__h"))
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n"),
            F.sum("__h").alias("h"),
        )
    )


def oracle_fingerprint_sql(
    relation_sql: str,
    key_exprs: list[str],
    value_exprs: list[str] | None = None,
    *,
    num_buckets: int = 64,
    seed: str = "fp:",
) -> str:
    """ANSI-SQL twin of :func:`table_fingerprint` over ``relation_sql``
    (a subquery or table name) — what the SOURCE database runs so the
    comparison never moves a row."""
    key_r = oracle_row_render(list(key_exprs))
    full_r = oracle_row_render(list(key_exprs) + list(value_exprs or []))
    return f"""
    SELECT CAST({oracle_hash64(key_r, seed=seed)} % {num_buckets} AS INT)
               AS bucket,
           count(*) AS n,
           CAST(sum({oracle_hash64(full_r, seed=seed)} % {HASH_MOD})
                AS BIGINT) AS h
    FROM {relation_sql}
    GROUP BY 1
    """


def reconcile(
    actual: DataFrame,
    expected: DataFrame,
    key_cols: list[str],
    value_cols: list[str | Column] | None = None,
    *,
    num_buckets: int = 64,
    seed: str = "fp:",
) -> DataFrame:
    """Compare two tables by fingerprint: returns ONLY the buckets that
    disagree, with both sides' counts and hashes (NULL = bucket absent on
    that side). Empty result ⇒ consistent. O(buckets) after one scan per
    side; feed a mismatched bucket id back into an incremental-snapshot
    signal to re-sync just that slice."""
    a = table_fingerprint(
        actual, key_cols, value_cols, num_buckets=num_buckets, seed=seed
    )
    e = table_fingerprint(
        expected, key_cols, value_cols, num_buckets=num_buckets, seed=seed
    )
    a = a.select("bucket", F.col("n").alias("n_actual"), F.col("h").alias("h_actual"))
    e = e.select("bucket", F.col("n").alias("n_expected"), F.col("h").alias("h_expected"))
    return (
        a.join(e, "bucket", "full_outer")
        .filter(
            ~(
                F.col("n_actual").eqNullSafe(F.col("n_expected"))
                & F.col("h_actual").eqNullSafe(F.col("h_expected"))
            )
        )
        .select("bucket", "n_actual", "n_expected", "h_actual", "h_expected")
    )


def sequence_gaps(
    df: DataFrame,
    seq_col: str,
    part_cols: list[str],
) -> DataFrame:
    """Per-group sequence-continuity audit: within each ``part_cols``
    group, report every hole in the ``seq_col`` integer sequence between
    that group's first and last observed value —
    ``(part_cols..., gap_start, gap_end, n_missing)``.

    This is the completeness check a CDC consumer runs before trusting a
    stream slice: the reference's buffered transaction assembly
    (debezium-connector-oracle's LogMiner buffer) implicitly requires
    every event of a transaction before COMMIT emission, and Kafka
    consumers audit per-partition offset contiguity the same way. A gap
    means events were lost (DLQ'd, dropped, or still in flight) — feed
    the gap's group key into an incremental-snapshot signal (S3) to
    re-sync, exactly like a mismatched `reconcile` bucket.

    Plan shape (100 TB): one shuffle on the group key, per-group sort
    inside the window (Spark spills; group size is a transaction/topic
    partition, not the corpus), gaps emitted by a single lag compare —
    no self-join, no explode of expected ranges. Boundary losses (before
    the first / after the last observed event of a group) are invisible
    by construction — cross-check group COUNTS via `reconcile` for
    those."""
    from pyspark.sql import Window

    w = Window.partitionBy(*part_cols).orderBy(seq_col)
    prev = F.lag(seq_col).over(w)
    return (
        df.select(*part_cols, seq_col)
        .withColumn("__prev", prev)
        .filter(
            F.col("__prev").isNotNull()
            & (F.col(seq_col) > F.col("__prev") + 1)
        )
        .select(
            *part_cols,
            (F.col("__prev") + 1).alias("gap_start"),
            (F.col(seq_col) - 1).alias("gap_end"),
            (F.col(seq_col) - F.col("__prev") - 1).alias("n_missing"),
        )
    )
