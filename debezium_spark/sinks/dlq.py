"""P9 — error handling modes with a real dead-letter-queue writer.

Reference: ``EventProcessingFailureHandlingMode`` (debezium-connector-common/
.../config/CommonConnectorConfig.java:153 — fail / warn / skip) and the sink
side ``ErrorReporter`` (debezium-sink/src/main/java/io/debezium/sink/dlq/
ErrorReporter.java) that routes poison records to a DLQ topic with error
context headers.

Spark shape: ONE pass splits the batch on a validity predicate — the good
branch continues, the bad branch lands in an append-only quarantine table
with error metadata. Both branches derive from the same scan (no second
read), and the quarantine write is append-only parquet (Delta in prod).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class ProcessingFailure(Exception):
    pass


def split_on_validity(
    df: DataFrame, is_valid: Column
) -> tuple[DataFrame, DataFrame]:
    """Tag once, filter twice — Catalyst collapses to one scan with two
    filters (cheaper than evaluating the predicate in two places when it's
    expensive)."""
    tagged = df.withColumn("__valid", is_valid)
    good = tagged.filter(F.col("__valid")).drop("__valid")
    bad = tagged.filter(~F.col("__valid") | F.col("__valid").isNull()).drop(
        "__valid"
    )
    return good, bad


class DeadLetterQueue:
    """Append-only quarantine table (ErrorReporter analog)."""

    def __init__(self, spark, path: str):
        self.spark = spark
        self.path = path

    def quarantine(
        self, bad: DataFrame, *, reason: Column | str, epoch_id: int | None = None
    ) -> None:
        reason_c = F.lit(reason) if isinstance(reason, str) else reason
        out = bad.withColumn("__error", reason_c).withColumn(
            "__epoch", F.lit(epoch_id).cast("long")
        ).withColumn("__quarantined_at", F.current_timestamp())
        out.write.mode("append").parquet(self.path)

    def read(self) -> DataFrame:
        import os

        if not os.path.exists(self.path):
            raise FileNotFoundError(self.path)
        return self.spark.read.parquet(self.path)


def handle_failures(
    df: DataFrame,
    is_valid: Column,
    *,
    mode: str = "skip",  # fail | warn | skip
    dlq: DeadLetterQueue | None = None,
    reason: str = "validation failed",
    epoch_id: int | None = None,
    warn=lambda m: None,
) -> DataFrame:
    """Apply the configured failure mode to one batch; returns the good rows.

    fail: any invalid row aborts the batch (connector stop semantics).
    warn: invalid rows are quarantined (if a DLQ is given) and logged.
    skip: invalid rows are quarantined silently.
    """
    good, bad = split_on_validity(df, is_valid)
    if mode == "fail":
        n_bad = bad.limit(1).count()
        if n_bad:
            raise ProcessingFailure(reason)
        return good
    if mode not in ("warn", "skip"):
        raise ValueError(f"unknown failure mode: {mode}")
    if dlq is not None:
        dlq.quarantine(bad, reason=reason, epoch_id=epoch_id)
    if mode == "warn":
        warn(f"quarantined batch rows: {reason}")
    return good


def reprocess(
    dlq: DeadLetterQueue,
    sink,
    *,
    transform=None,
    is_valid: Column | None = None,
    epoch_id: int | None = None,
) -> tuple[int, int]:
    """Drain the quarantine back through a sink after the cause is fixed —
    the operational other-half of a DLQ (the reference leaves replay to
    tooling around ErrorReporter; here it is one call).

    ``transform`` optionally repairs rows first; rows passing ``is_valid``
    (all rows when omitted) go through ``sink.write_batch`` as one batch,
    the rest are re-quarantined. Returns ``(replayed, remaining)``.
    """
    import shutil

    q = dlq.read()
    env_cols = [c for c in q.columns if not c.startswith("__")]
    cand = q.select(*env_cols)
    if transform is not None:
        cand = transform(cand)
    if is_valid is not None:
        good, bad = split_on_validity(cand, is_valid)
    else:
        good, bad = cand, cand.limit(0)
    # Materialize both branches BEFORE the quarantine dir is rewritten.
    good = good.localCheckpoint(eager=True)
    bad = bad.localCheckpoint(eager=True)
    n_good, n_bad = good.count(), bad.count()
    if n_good:
        sink.write_batch(good, epoch_id)
    shutil.rmtree(dlq.path, ignore_errors=True)
    if n_bad:
        dlq.quarantine(bad, reason="still invalid after reprocess",
                       epoch_id=epoch_id)
    return n_good, n_bad
