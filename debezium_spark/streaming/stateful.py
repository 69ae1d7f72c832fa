"""Stateful streaming: transaction assembly with cross-batch state.

Reference semantics being reproduced:
* ``TransactionMonitor`` (debezium-connector-common/.../pipeline/txmetadata/
  TransactionMonitor.java:47,75-104) emits BEGIN/END boundary events with
  per-transaction event counts.
* Oracle LogMiner *buffered* mode (debezium-connector-oracle/.../logminer/
  buffered/BufferedLogMinerStreamingChangeEventSource.java) caches in-flight
  transactions and emits them only on COMMIT — transactions spanning many
  log batches accumulate in the cache.
* Abandoned-transaction retention: the reference bounds that cache with
  ``log.mining.transaction.retention.ms`` (OracleConnectorConfig —
  debezium-connector-oracle/.../OracleConnectorConfig.java, LOG_MINING_
  TRANSACTION_RETENTION_MS): a transaction whose commit never arrives is
  expired from the buffer (logged and dropped) instead of pinning memory
  forever.

Spark shape: ``applyInPandasWithState`` keyed by tx_id. State = running
(count, first_pos, last_pos); a commit marker flushes the completed
transaction downstream (status ``END``) and clears the state; uncommitted
transactions stay buffered across micro-batches exactly like the
reference's in-flight cache. With ``retention_ms`` set, the state store is
BOUNDED: ``GroupStateTimeout.ProcessingTimeTimeout`` expires any
transaction that saw no event (and no commit) for ``retention_ms`` — the
expired transaction's accumulated bounds are emitted with status
``ABANDONED`` and its state row is removed, so a client abort or source
failover mid-transaction cannot grow the store without limit (SURVEY
§7.3's unbounded-state hazard). Callers route ABANDONED rows to the DLQ
(the reference logs-and-drops; emitting the row keeps the evidence).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

TX_OUT_SCHEMA = T.StructType(
    [
        T.StructField("tx_id", T.StringType()),
        T.StructField("event_count", T.LongType()),
        T.StructField("first_pos", T.LongType()),
        T.StructField("last_pos", T.LongType()),
        # 'END' (committed) | 'ABANDONED' (retention expired, never committed)
        T.StructField("status", T.StringType()),
    ]
)

TX_STATE_SCHEMA = T.StructType(
    [
        T.StructField("count", T.LongType()),
        T.StructField("first_pos", T.LongType()),
        T.StructField("last_pos", T.LongType()),
    ]
)


def _make_assemble(retention_ms: int | None):
    def _assemble(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        """Accumulate events for one tx; emit on commit, expire on timeout."""
        (tx_id,) = key
        if retention_ms is not None and state.hasTimedOut:
            # Never-committed transaction past retention: emit the evidence
            # and drop the state row — the buffered cache stays bounded.
            count, first_pos, last_pos = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "tx_id": [tx_id],
                    "event_count": [count],
                    "first_pos": [first_pos],
                    "last_pos": [last_pos],
                    "status": ["ABANDONED"],
                }
            )
            return
        if state.exists:
            count, first_pos, last_pos = state.get
        else:
            count, first_pos, last_pos = 0, None, None
        committed = False
        for pdf in pdfs:
            count += len(pdf)
            lo, hi = int(pdf["pos"].min()), int(pdf["pos"].max())
            first_pos = lo if first_pos is None else min(first_pos, lo)
            last_pos = hi if last_pos is None else max(last_pos, hi)
            committed = committed or bool(pdf["is_commit"].any())
        if committed:
            state.remove()
            yield pd.DataFrame(
                {
                    "tx_id": [tx_id],
                    "event_count": [count],
                    "first_pos": [first_pos],
                    "last_pos": [last_pos],
                    "status": ["END"],
                }
            )
        else:
            state.update((count, first_pos, last_pos))
            if retention_ms is not None:
                # Re-armed on every event: the clock measures idle time
                # since the transaction's LAST activity, matching the
                # reference's retention semantics.
                state.setTimeoutDuration(retention_ms)

    return _assemble


def transaction_boundaries_stream(
    events: DataFrame,
    *,
    tx_col: str = "tx_id",
    pos_col: str = "pos",
    commit_col: str = "is_commit",
    retention_ms: int | None = None,
) -> DataFrame:
    """Streaming tx assembly: input columns (tx_id, pos, is_commit); output
    one ``END`` record per committed transaction, whenever its commit
    arrives — even many micro-batches after its first event.

    ``retention_ms`` bounds the state store (the reference's
    ``log.mining.transaction.retention.ms``): a transaction idle longer
    than the retention is expired as an ``ABANDONED`` record and its state
    removed. Filter ``status == 'ABANDONED'`` into the DLQ
    (:class:`debezium_spark.sinks.dlq.DeadLetterQueue`) — committed
    transactions are unaffected. ``None`` keeps the unbounded reference
    default (commit always wins eventually).

    Trigger interaction: ProcessingTimeTimeout makes Spark schedule
    no-data micro-batches indefinitely (each is a chance to fire a
    timeout), which is exactly right for a production continuous trigger —
    an idle stream still expires abandoned transactions — but means an
    ``availableNow``/``once`` query never reaches termination. For
    bounded-replay runs set
    ``spark.sql.streaming.noDataMicroBatches.enabled=false``: expiry then
    fires on the next DATA batch past the deadline (the retention contract
    holds whenever events still flow; a fully idle bounded replay is over
    anyway)."""
    from pyspark.sql import functions as F

    prepared = events.select(
        F.col(tx_col).alias("tx_id"),
        F.col(pos_col).cast("long").alias("pos"),
        F.col(commit_col).cast("boolean").alias("is_commit"),
    )
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if retention_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return prepared.groupBy("tx_id").applyInPandasWithState(
        _make_assemble(retention_ms),
        outputStructType=TX_OUT_SCHEMA,
        stateStructType=TX_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout,
    )
