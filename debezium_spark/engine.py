"""The embedded-engine builder — the public API a reference user lands on.

Mirrors ``DebeziumEngine.create(format).using(props).notifying(consumer)
.build()`` (debezium-api/src/main/java/io/debezium/engine/DebeziumEngine.java:46,311-387)
and the async runtime (debezium-embedded/.../async/AsyncEmbeddedEngine.java:87):

    engine = (CdcEngine(spark)
        .source(feed_dir=..., envelope_schema=...)
        .snapshot(snapshot_df)                      # optional S1 phase
        .transform(extract_new_record_state)        # SMT chain, in order
        .transform(lambda df: df.filter(...))
        .sink(path=..., pk_cols=[...])              # or .notifying(fn)
        .checkpoint(dir)
        .build())
    engine.run_available()       # Trigger.AvailableNow catch-up
    # or engine.start()          # continuous micro-batches

Every knob maps onto the same primitives ChangeDataPipeline exposes; this
class only assembles them.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession

from debezium_spark.sinks.merge import ParquetMergeSink
from debezium_spark.streaming.pipeline import ChangeDataPipeline


class CdcEngine:
    def __init__(self, spark: SparkSession):
        self.spark = spark
        self._feed_dir: str | None = None
        self._schema = None
        self._snapshot_df: DataFrame | None = None
        self._transforms: list[Callable[[DataFrame], DataFrame]] = []
        self._sink = None
        self._checkpoint: str | None = None
        self._max_files: int | None = 1
        self._signals = None
        self._notifications = None
        self._heartbeat = None

    # -- builder steps ----------------------------------------------------
    def source(self, *, feed_dir: str, envelope_schema) -> "CdcEngine":
        self._feed_dir = feed_dir
        self._schema = envelope_schema
        return self

    def snapshot(self, snapshot_env_df: DataFrame) -> "CdcEngine":
        self._snapshot_df = snapshot_env_df
        return self

    def transform(self, fn: Callable[[DataFrame], DataFrame]) -> "CdcEngine":
        """Append one SMT to the chain (Transformations.java:90-108)."""
        self._transforms.append(fn)
        return self

    def transforms(self, fns: Sequence[Callable]) -> "CdcEngine":
        self._transforms.extend(fns)
        return self

    def sink(
        self, *, path: str, pk_cols: list[str], insert_mode: str = "upsert",
        num_buckets: int = 16, storage: str = "cow", compact_every: int = 8,
    ) -> "CdcEngine":
        """``storage``: ``cow`` = bucket-pruned rewrite (`ParquetMergeSink`),
        ``mor`` = merge-on-read delta log (`LogMergeSink`, upsert only)."""
        if storage == "mor":
            from debezium_spark.sinks.mor import LogMergeSink

            self._sink = LogMergeSink(
                self.spark, path, pk_cols, insert_mode=insert_mode,
                compact_every=compact_every,
            )
        elif storage == "cow":
            self._sink = ParquetMergeSink(
                self.spark, path, pk_cols, insert_mode=insert_mode,
                num_buckets=num_buckets,
            )
        else:
            raise ValueError(f"unknown sink storage: {storage}")
        return self

    def notifying(self, handler: Callable[[DataFrame, int], None]) -> "CdcEngine":
        """DebeziumEngine.notifying(ChangeConsumer) — a bare foreachBatch
        consumer instead of the managed MERGE sink."""

        class _FnSink:
            def write_batch(self, batch_df, epoch_id=None):
                handler(batch_df, epoch_id)

        self._sink = _FnSink()
        return self

    def checkpoint(self, checkpoint_dir: str) -> "CdcEngine":
        self._checkpoint = checkpoint_dir
        return self

    def max_batch_files(self, n: int | None) -> "CdcEngine":
        """ChangeEventQueue.maxBatchSize analog."""
        self._max_files = n
        return self

    def with_signals(self, channel) -> "CdcEngine":
        self._signals = channel
        return self

    def with_notifications(self, log) -> "CdcEngine":
        self._notifications = log
        return self

    def with_heartbeat(self, hb) -> "CdcEngine":
        self._heartbeat = hb
        return self

    # -- config-driven construction (connector-properties analog) ---------
    @classmethod
    def from_config(cls, spark: SparkSession, config: dict) -> "CdcEngine":
        """Build from a flat properties dict — the shape of a Debezium
        connector config (DebeziumEngine.using(props)). Recognized keys:

        feed.dir, envelope.schema (a StructType), checkpoint.dir,
        sink.path, sink.pk (list or comma-string), sink.insert.mode,
        sink.num.buckets, sink.storage (cow|mor), sink.compact.every,
        max.batch.files, plus the ``transforms=`` SMT-chain surface
        (``transforms.<name>.type`` / ``transforms.<name>.<key>``,
        operators/chain.py).
        """
        eng = cls(spark)
        eng.source(
            feed_dir=config["feed.dir"], envelope_schema=config["envelope.schema"]
        )
        pk = config["sink.pk"]
        if isinstance(pk, str):
            pk = [c.strip() for c in pk.split(",")]
        eng.sink(
            path=config["sink.path"],
            pk_cols=pk,
            insert_mode=config.get("sink.insert.mode", "upsert"),
            num_buckets=int(config.get("sink.num.buckets", 16)),
            storage=config.get("sink.storage", "cow"),
            compact_every=int(config.get("sink.compact.every", 8)),
        )
        eng.checkpoint(config["checkpoint.dir"])
        if "max.batch.files" in config:
            eng.max_batch_files(int(config["max.batch.files"]))
        if config.get("transforms"):
            from debezium_spark.operators.chain import chain_from_config

            eng.transforms(chain_from_config(config))
        return eng

    # -- terminal ---------------------------------------------------------
    def build(self) -> ChangeDataPipeline:
        if self._feed_dir is None or self._schema is None:
            raise ValueError("source(feed_dir=, envelope_schema=) is required")
        if self._sink is None:
            raise ValueError("sink(...) or notifying(...) is required")
        if self._checkpoint is None:
            raise ValueError("checkpoint(dir) is required (offset storage)")
        pipe = ChangeDataPipeline(
            self.spark,
            feed_dir=self._feed_dir,
            envelope_schema=self._schema,
            sink=self._sink,
            checkpoint_dir=self._checkpoint,
            transforms=self._transforms,
            max_files_per_trigger=self._max_files,
            signals=self._signals,
            notifications=self._notifications,
            heartbeat=self._heartbeat,
        )
        if self._snapshot_df is not None:
            pipe.run_snapshot(self._snapshot_df)
        return pipe
