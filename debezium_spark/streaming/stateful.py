"""Stateful streaming: transaction assembly with cross-batch state.

Reference semantics being reproduced:
* ``TransactionMonitor`` (debezium-connector-common/.../pipeline/txmetadata/
  TransactionMonitor.java:47,75-104) emits BEGIN/END boundary events with
  per-transaction event counts.
* Oracle LogMiner *buffered* mode (debezium-connector-oracle/.../logminer/
  buffered/BufferedLogMinerStreamingChangeEventSource.java) caches in-flight
  transactions and emits them only on COMMIT — transactions spanning many
  log batches accumulate in the cache.

Spark shape: ``applyInPandasWithState`` keyed by tx_id. State = running
(count, first_pos, last_pos); a commit marker flushes the completed
transaction downstream and clears the state; uncommitted transactions stay
buffered across micro-batches exactly like the reference's in-flight cache
(with RocksDB state store + TTL at production scale, SURVEY §7.3).
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
        T.StructField("status", T.StringType()),  # 'END' (committed)
    ]
)

TX_STATE_SCHEMA = T.StructType(
    [
        T.StructField("count", T.LongType()),
        T.StructField("first_pos", T.LongType()),
        T.StructField("last_pos", T.LongType()),
    ]
)


def _assemble(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Accumulate events for one tx; emit on commit marker, else keep state."""
    (tx_id,) = key
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


def transaction_boundaries_stream(
    events: DataFrame,
    *,
    tx_col: str = "tx_id",
    pos_col: str = "pos",
    commit_col: str = "is_commit",
) -> DataFrame:
    """Streaming tx assembly: input columns (tx_id, pos, is_commit); output
    one END record per committed transaction, whenever its commit arrives —
    even many micro-batches after its first event."""
    from pyspark.sql import functions as F

    prepared = events.select(
        F.col(tx_col).alias("tx_id"),
        F.col(pos_col).cast("long").alias("pos"),
        F.col(commit_col).cast("boolean").alias("is_commit"),
    )
    return prepared.groupBy("tx_id").applyInPandasWithState(
        _assemble,
        outputStructType=TX_OUT_SCHEMA,
        stateStructType=TX_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
