"""K1-K6 — the change-event sink: MERGE semantics on Spark.

Reference: ``JdbcChangeEventSink`` (debezium-connector-jdbc/.../
JdbcChangeEventSink.java:48,89-186,244) routes each batch's events —
truncate / delete / tombstone / upsert — with flush-order guarantees; the 11
SQL dialects' upsert statements (dialect/postgres PostgresDatabaseDialect
.java:102-110, mysql MySqlDatabaseDialect.java:199-222, …) all collapse into
ONE logical MERGE here. Insert modes insert/upsert/update:
JdbcSinkConnectorConfig.java:59,142-151.

Without Delta in the container, MERGE is emulated as
``target ANTI JOIN keys ∪ new_state`` — semantically the Delta ``MERGE
INTO`` we would issue in production (the K4 reduction guarantees unique
match keys either way).

Scale shape (the 100 TB story):

* ``merge_changes`` is a pure plan builder — zero driver-side actions.
* The change side is NOT unconditionally broadcast; AQE decides from
  runtime stats (a backfill batch can be the whole table — an
  unconditional hint there is an OOM).
* ``ParquetMergeSink`` hash-buckets the target on the PK and rewrites only
  the buckets the batch touches (dynamic partition overwrite) — per-batch
  I/O is O(changed buckets), not O(table). The production analog is Delta
  ``MERGE INTO`` file pruning.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from debezium_spark.envelope import OP_TRUNCATE
from debezium_spark.operators.reduce import apply_truncates, reduce_last_per_key
from debezium_spark.operators.unwrap import extract_new_record_state

BUCKET_COL = "__bucket"


def footer_rows_exceed(env_batch: DataFrame, limit: int) -> bool:
    """True when the micro-batch's parquet footer row counts already exceed
    ``limit`` — a driver-local metadata read (no Spark job). Returns False
    on any uncertainty (non-parquet/remote input, unreadable footer): the
    limit(n+1) probe then decides as before."""
    try:
        files = env_batch.inputFiles()
    except Exception:  # pragma: no cover - non-file-backed batch
        return False
    if not files:
        return False
    try:
        import pyarrow.parquet as pq

        total = 0
        for uri in files:
            path = uri.removeprefix("file://").removeprefix("file:")
            if not path.endswith(".parquet") or not os.path.exists(path):
                return False
            total += pq.ParquetFile(path).metadata.num_rows
            if total > limit:
                return True
    except Exception:  # pragma: no cover - footer read failure
        return False
    return False


def arrow_last_per_key(tbl, n_keys: int):
    """Survivor indices (one per key, last event wins) for a collected
    micro-batch Arrow table carrying ``__op``/``__pos``/``__ts`` and
    ``__k_0..__k_{n-1}`` key columns.

    Order is max (pos, ts_ns, op) with nulls smallest; ties beyond the full
    order key go to the later batch row — identical to the row path's
    ``ok >= prev`` insertion loop (stable lexsort + keep-last reproduces
    both the order and the tie rule) and to ``reduce_last_per_key``'s
    window whenever the full order key differs. A NULL pos sorts smallest
    via the same null-flag trick as ts (NaN would otherwise rank LARGEST
    under lexsort, inverting the distributed window's nulls-smallest
    order)."""
    import numpy as np
    import pandas as pd

    pos_s = tbl.column("__pos").to_pandas()
    pos_flag = pos_s.notna().to_numpy()
    pos = pos_s.fillna(0).to_numpy(dtype=np.int64)
    ts_s = tbl.column("__ts").to_pandas()
    ts_flag = ts_s.notna().to_numpy()
    ts_val = ts_s.fillna(0).to_numpy(dtype=np.int64)
    op_arr = tbl.column("__op").to_pandas().fillna("").to_numpy(dtype=str)
    order = np.lexsort((op_arr, ts_val, ts_flag, pos, pos_flag))
    kdf = pd.DataFrame(
        {
            f"__k_{i}": tbl.column(f"__k_{i}").to_pandas()
            for i in range(n_keys)
        }
    )
    winners = ~kdf.iloc[order].duplicated(keep="last").to_numpy()
    return order[winners]


def merge_changes(
    target_df: DataFrame,
    env_df: DataFrame,
    pk_cols: list[str],
    *,
    insert_mode: str = "upsert",  # insert | upsert | update
    broadcast_changes: bool = False,
) -> DataFrame:
    """Apply one batch of envelopes to the target table, returning new state.

    Order of operations mirrors JdbcChangeEventSink.execute
    (JdbcChangeEventSink.java:89-186): truncates clear pending + target,
    then the reduced (last-per-key, K4) change set merges in.

    Pure plan construction — no Spark actions. The truncate-clears-target
    rule is a broadcast one-row flag joined into the base relation rather
    than a driver-side peek.
    """
    env_df = env_df.filter(F.col("op").isNotNull())  # tombstones carry no state
    env_df = apply_truncates(env_df)

    # One-row flag: does this batch contain a TRUNCATE? Joined (broadcast,
    # single row) so the target-clear is part of the plan, not an action.
    trunc_flag = env_df.agg(
        F.max(F.when(F.col("op") == OP_TRUNCATE, 1).otherwise(0)).alias("__has_trunc")
    )
    target_df = (
        target_df.crossJoin(F.broadcast(trunc_flag))
        .filter(F.coalesce(F.col("__has_trunc"), F.lit(0)) == 0)
        .drop("__has_trunc")
    )
    changes = env_df.filter(F.col("op") != OP_TRUNCATE)

    latest = reduce_last_per_key(changes)
    flat = extract_new_record_state(
        latest, delete_handling="rewrite", add_fields=("op",)
    )
    return merge_flat_changes(
        target_df, flat, pk_cols, insert_mode=insert_mode,
        broadcast=broadcast_changes,
    )


def merge_flat_changes(
    target_df: DataFrame,
    flat: DataFrame,
    pk_cols: list[str],
    *,
    insert_mode: str = "upsert",
    broadcast: bool = False,
) -> DataFrame:
    """The MERGE join itself, given an already-reduced flat change set
    (row fields + ``__deleted`` + ``__op``, unique per key). Shared by the
    distributed path (merge_changes) and the sink's inline micro-batch path,
    so the join/union semantics exist exactly once.

    ``broadcast`` hints only the JOIN side (the key set) — hinting the whole
    change set would put a join hint on the union leg too, which Spark
    rightly warns about. When False, AQE's runtime size estimate picks the
    join strategy (a backfill batch can be the whole table)."""
    keys = flat.select(*pk_cols)
    if broadcast:
        keys = F.broadcast(keys)
    value_cols = target_df.columns
    new_state = flat.filter(~F.col("__deleted")).select(*value_cols)

    if insert_mode == "upsert":
        kept = target_df.join(keys, pk_cols, "left_anti")
        return kept.unionByName(new_state)
    if insert_mode == "insert":
        # Plain INSERT of every create/read event; no matching.
        inserts = flat.filter(F.col("__op").isin("c", "r")).select(*value_cols)
        return target_df.unionByName(inserts)
    if insert_mode == "update":
        # Only matched rows change; unmatched change rows are ignored.
        upd = target_df.join(keys, pk_cols, "left_semi")
        kept = target_df.join(keys, pk_cols, "left_anti")
        updated = new_state.join(upd.select(*pk_cols), pk_cols, "left_semi")
        return kept.unionByName(updated)
    raise ValueError(f"unknown insert mode: {insert_mode}")


class ParquetMergeSink:
    """foreachBatch sink materializing an envelope stream into a parquet table.

    The production analog is ``MERGE INTO`` on Delta/Iceberg; the parquet
    emulation keeps the same interface but makes the I/O scale-shaped: the
    target is hash-bucketed on the PK (``partitionBy(__bucket)``), each
    batch merges against ONLY the buckets its keys touch, and the write is
    a dynamic partition overwrite of exactly those buckets. Schema
    evolution mode ``basic`` adds missing optional columns from the event
    schema (JdbcSinkConnectorConfig.java:158-163,
    JdbcChangeEventSink.java:195-238).
    """

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        pk_cols: list[str],
        *,
        insert_mode: str = "upsert",
        schema_evolution: str = "basic",
        num_buckets: int = 16,
        schema_registry=None,
        table_name: str = "target",
        inline_max_rows: int = 32768,
        inline_merge_target_rows: int = 1 << 18,
    ):
        self.spark = spark
        self.path = path
        self.pk_cols = pk_cols
        self.insert_mode = insert_mode
        self.schema_evolution = schema_evolution
        self.num_buckets = num_buckets
        self.schema_registry = schema_registry
        self.table_name = table_name
        self._schema_version = 0
        # Micro-batches at or below this row count take the inline path:
        # ONE collect materializes the batch driver-side, the K4 reduction
        # runs in Python, and the MERGE joins against a broadcast local
        # relation — 2 Spark jobs per batch instead of 3+, and the batch
        # files are scanned once instead of once per plan subtree. Batches
        # above the bound (backfills) keep the fully distributed plan.
        self.inline_max_rows = inline_max_rows
        # When an inline batch's AFFECTED buckets together hold at most
        # this many on-disk rows (parquet footer counts, no job), the
        # MERGE itself also runs driver-side: pyarrow reads the touched
        # buckets, the upsert anti-join is a key-set filter, and the
        # merged buckets go back through the same staging+swap protocol —
        # ONE Spark job per micro-batch total (the batch collect) instead
        # of two. Bounds driver memory to (threshold + batch) Arrow rows;
        # big tables/buckets keep the distributed merge.
        self.inline_merge_target_rows = inline_merge_target_rows

    def _bucket_of(self) -> F.Column:
        return F.pmod(F.hash(*self.pk_cols), F.lit(self.num_buckets))

    def _has_buckets(self) -> bool:
        return os.path.exists(self.path) and any(
            e.startswith(f"{BUCKET_COL}=") for e in os.listdir(self.path)
        )

    def _write_schema_sidecar(self, schema) -> None:
        """Persist the flat row schema so a table whose every row has been
        deleted (zero bucket dirs — partitioned writes emit no files for an
        empty result) still reads as an empty table, not an error.

        The persisted set is the UNION of all schemas ever written (basic
        evolution only adds columns) — it is the authoritative known-column
        set for evolution detection, so it must not shrink when one batch
        happens to carry a narrower record schema."""
        import json

        import pyspark.sql.types as T

        prev = self._sidecar_schema()
        if prev is not None:
            have = {f.name for f in schema.fields}
            schema = T.StructType(
                [*schema.fields, *(f for f in prev.fields if f.name not in have)]
            )
        os.makedirs(self.path, exist_ok=True)
        tmp = os.path.join(self.path, "_schema.json.tmp")
        with open(tmp, "w") as f:
            json.dump(schema.jsonValue(), f)
        os.replace(tmp, os.path.join(self.path, "_schema.json"))

    def _sidecar_schema(self):
        import json

        import pyspark.sql.types as T

        p = os.path.join(self.path, "_schema.json")
        try:
            with open(p) as f:
                return T.StructType.fromJson(json.load(f))
        except (OSError, ValueError, KeyError):
            return None

    def _read_target(self, row_schema) -> DataFrame:
        import pyspark.sql.types as T

        if self._has_buckets():
            # Explicit schema (event schema + bucket column): no footer
            # merging pass, and buckets written before a schema evolution
            # read the new columns as NULL — same effect as mergeSchema at
            # a fraction of the planning cost.
            schema = T.StructType(
                [*row_schema.fields, T.StructField(BUCKET_COL, T.IntegerType())]
            )
            return self.spark.read.schema(schema).parquet(self.path)
        empty = self.spark.createDataFrame([], row_schema)
        return empty.withColumn(BUCKET_COL, F.lit(0))

    def _detect_evolution(self, row_cols: list[str], min_pos) -> None:
        """K6 schema-evolution detection against the on-disk column set; see
        write_batch for why the sidecar (not one sampled footer) is the
        authority. ``min_pos`` is a callable returning the batch's min
        source.pos, invoked only when a change is actually recorded."""
        if self.schema_evolution != "basic":
            return
        if self._has_buckets():
            sidecar = self._sidecar_schema()
            if sidecar is not None:
                disk_cols = {f.name for f in sidecar.fields}
            else:  # pre-sidecar table: union ALL footers, not one
                disk_cols = {
                    f.name
                    for f in self.spark.read.option("mergeSchema", "true")
                    .parquet(self.path)
                    .schema.fields
                }
        else:
            disk_cols = set(row_cols)
        added = [c for c in row_cols if c not in disk_cols]
        if added and self.schema_registry is not None:
            # K6 → schema history: record the evolved column set keyed by
            # this batch's position (SchemaHistory.java:183-224).
            self._schema_version += 1
            self.schema_registry.record(
                self.table_name,
                self._schema_version,
                [*row_cols, BUCKET_COL],
                int(min_pos() or 0),
            )

    def _footer_rows_exceed_limit(self, env_batch: DataFrame) -> bool:
        """See :func:`footer_rows_exceed` (module-level, shared with the
        MOR sink's inline delta path)."""
        return footer_rows_exceed(env_batch, self.inline_max_rows)

    def _prepare_inline_arrow(self, env_batch: DataFrame, epoch_id):
        """Arrow-vectorized inline micro-batch preparation.

        ONE job flattens the batch (state already folded to the survivor's
        side: before-image for deletes, after-image otherwise) and pulls it
        driver-side as an Arrow table — no Row pickling. Last-per-key
        survivor selection is a stable numpy lexsort on (pos, ts_ns, op)
        plus a keep-last dedup on the key columns; the chosen rows go back
        to the JVM as ONE Arrow batch. State columns never leave Arrow, so
        a genuine NaN double survives (the pandas detour the row path needs
        would conflate it with NULL).

        Returns ``("done", None)`` when the batch was fully handled,
        ``("inline", (flat_local, affected))`` ready for the merge, or
        ``("distributed", None)`` to take the distributed plan. Raises on
        the unexpected — write_batch falls back to the row-based path.
        """
        import numpy as np
        import pandas as pd
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyspark.sql.types as T

        if self.inline_max_rows <= 0 or self._footer_rows_exceed_limit(
            env_batch
        ):
            return ("distributed", None)
        row_schema = T.StructType(env_batch.schema["after"].dataType.fields)
        field_names = [f.name for f in row_schema.fields]
        reserved = {"__op", "__pos", "__ts", "__b", "__deleted"}
        if reserved & set(field_names) or any(
            f.startswith("__k_") for f in field_names
        ):
            return ("distributed", None)  # name collision: let Rows handle
        has_ts = "ts_ns" in env_batch.columns
        bucket = F.pmod(
            F.hash(*[F.col(f"key.{c}") for c in self.pk_cols]),
            F.lit(self.num_buckets),
        )
        sel = [
            F.col("op").alias("__op"),
            F.col("source.pos").alias("__pos"),
            (F.col("ts_ns") if has_ts else F.lit(None)).cast("long").alias("__ts"),
            bucket.alias("__b"),
            *[
                F.col(f"key.{c}").alias(f"__k_{i}")
                for i, c in enumerate(self.pk_cols)
            ],
            *[
                F.when(F.col("op") == "d", F.col(f"before.{f}"))
                .otherwise(F.col(f"after.{f}"))
                .alias(f)
                for f in field_names
            ],
        ]
        tbl = (
            env_batch.filter(F.col("op").isNotNull())
            .select(*sel)
            .limit(self.inline_max_rows + 1)
            .toArrow()
        )
        if tbl.num_rows > self.inline_max_rows:
            return ("distributed", None)
        if tbl.num_rows and pc.any(
            pc.equal(tbl.column("__op"), OP_TRUNCATE)
        ).as_py():
            return ("distributed", None)
        if tbl.num_rows == 0:
            self._detect_evolution(field_names, lambda: 0)
            if not self._has_buckets():
                self._write_schema_sidecar(row_schema)
            return ("done", None)

        # Survivor per key: arrow_last_per_key (module-level, shared with
        # the MOR sink's inline delta path) — max (pos, ts_ns, op) with
        # nulls smallest, ties to the later batch row.
        take_idx = arrow_last_per_key(tbl, len(self.pk_cols))
        won = tbl.take(pa.array(take_idx, type=pa.int64()))
        affected = sorted(set(tbl.column("__b").to_pylist()))
        # Evolution is recorded LAST: everything above can throw (Arrow
        # conversion, exotic types), and write_batch's fallback re-runs
        # _write_batch_inline which detects again — recording earlier would
        # double-increment the schema version and write a duplicate history
        # row for the same batch.
        self._detect_evolution(
            field_names,
            lambda: int(pc.min(tbl.column("__pos")).as_py() or 0),
        )
        return ("inline", (won, affected, row_schema))

    def _flat_local_from_won(self, won, row_schema):
        """Survivor Arrow table -> the one-partition local change relation
        the Spark-side MERGE joins against."""
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyspark.sql.types as T

        field_names = [f.name for f in row_schema.fields]
        deleted = pc.fill_null(pc.equal(won.column("__op"), "d"), False)
        out_tbl = pa.table(
            [*(won.column(f) for f in field_names), deleted, won.column("__op")],
            names=[*field_names, "__deleted", "__op"],
        )
        flat_schema = T.StructType(
            [
                *(
                    T.StructField(f.name, f.dataType, True)
                    for f in row_schema.fields
                ),
                T.StructField("__deleted", T.BooleanType(), False),
                T.StructField("__op", T.StringType(), True),
            ]
        )
        return self.spark.createDataFrame(
            out_tbl, schema=flat_schema
        ).coalesce(1)

    def _merge_inline_driver(self, won, affected, row_schema,
                             epoch_id) -> bool:
        """Driver-side MERGE for a small upsert batch whose affected
        buckets are small: pyarrow reads the touched bucket files (no
        job), the upsert anti-join is a key-set filter, and the merged
        buckets go back through the shared staging+swap protocol — the
        batch's ONLY Spark job stays the collect in
        ``_prepare_inline_arrow``. Returns True when fully handled;
        returns False (no side effects) whenever exactness or scale is at
        risk: non-upsert modes, no table yet, floating-point or nested
        key columns (Spark's NaN/complex equality differs from Python's),
        a survivor whose key struct differs from its state PK (the Spark
        path re-buckets by STATE pk — unreproducible without Spark's
        hash), over-threshold target buckets, or target files whose arrow
        types don't cast to the batch's."""
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        if (
            self.insert_mode != "upsert"
            or self.inline_merge_target_rows <= 0
            or not self._has_buckets()
        ):
            return False
        field_names = [f.name for f in row_schema.fields]
        batch_schema = pa.schema(
            [won.schema.field(f) for f in field_names]
        )
        for c in self.pk_cols:
            t = batch_schema.field(c).type
            if pa.types.is_floating(t) or pa.types.is_nested(t):
                return False
        # the Spark path assigns output buckets by hash(STATE pk); __b was
        # hashed from the KEY struct — only provably equal when the values
        # are (they are for well-formed CDC; guard anyway)
        for i, c in enumerate(self.pk_cols):
            if won.column(f"__k_{i}").to_pylist() != \
                    won.column(c).to_pylist():
                return False

        files_by_bucket: dict[int, list[str]] = {}
        total = 0
        for b in affected:
            d = os.path.join(self.path, f"{BUCKET_COL}={b}")
            fs = (
                sorted(
                    os.path.join(d, e)
                    for e in os.listdir(d)
                    if e.endswith(".parquet")
                )
                if os.path.isdir(d)
                else []
            )
            files_by_bucket[b] = fs
            for p in fs:
                total += pq.ParquetFile(p).metadata.num_rows
            if total > self.inline_merge_target_rows:
                return False

        bcol = won.column("__b").to_numpy(zero_copy_only=False)
        deleted = pc.fill_null(
            pc.equal(won.column("__op"), "d"), False
        ).to_numpy(zero_copy_only=False)
        merged_by_bucket: dict[int, "pa.Table"] = {}
        try:
            for b in affected:
                sel = np.nonzero(bcol == b)[0]
                sub = won.take(pa.array(sel, type=pa.int64()))
                # keys = the survivor STATE's pk values, exactly
                # merge_flat_changes' flat.select(pk_cols); a NULL
                # component never equals anything under join semantics
                keys = set()
                for kt in zip(
                    *(sub.column(c).to_pylist() for c in self.pk_cols)
                ):
                    if all(v is not None for v in kt):
                        keys.add(kt)
                parts = []
                for p in files_by_bucket[b]:
                    t = pq.read_table(p)
                    cols = []
                    for f in batch_schema:
                        if f.name in t.column_names:
                            col = t.column(f.name)
                            if col.type != f.type:
                                col = col.cast(f.type)
                        else:
                            # pre-evolution bucket: new columns read NULL,
                            # same as _read_target's explicit-schema read
                            col = pa.nulls(t.num_rows, type=f.type)
                        cols.append(col)
                    tt = pa.table(cols, schema=batch_schema)
                    if keys:
                        mask = np.fromiter(
                            (
                                kt not in keys
                                for kt in zip(
                                    *(
                                        tt.column(c).to_pylist()
                                        for c in self.pk_cols
                                    )
                                )
                            ),
                            dtype=bool,
                            count=tt.num_rows,
                        )
                        if not mask.all():
                            tt = tt.filter(pa.array(mask))
                    parts.append(tt)
                alive = sub.filter(
                    pa.array(~deleted[sel])
                ).select(field_names)
                parts.append(alive.cast(batch_schema))
                merged_by_bucket[b] = pa.concat_tables(parts)
        except pa.lib.ArrowException:
            # Any Arrow read/cast failure (ArrowInvalid, but also
            # ArrowNotImplementedError / ArrowTypeError on mismatched
            # on-disk types) declines to the Spark merge path — no side
            # effects have happened yet, the distributed plan owns the
            # batch.
            return False

        staging = (
            f"{self.path}.staging-"
            f"{epoch_id if epoch_id is not None else 'x'}"
        )
        import shutil

        shutil.rmtree(staging, ignore_errors=True)
        for b, tbl in merged_by_bucket.items():
            if tbl.num_rows == 0:
                continue  # emptied bucket: the swap drops its dir
            d = os.path.join(staging, f"{BUCKET_COL}={b}")
            os.makedirs(d, exist_ok=True)
            pq.write_table(
                tbl,
                os.path.join(d, "part-00000-inline.snappy.parquet"),
                compression="snappy",
            )
        os.makedirs(staging, exist_ok=True)
        self._swap_staged(staging, affected, row_schema)
        return True

    def _try_collect_inline(self, env_batch: DataFrame):
        """Inline fast path: materialize the micro-batch driver-side in ONE
        job (rows + their target bucket), or return None to take the
        distributed path. Falls back for over-threshold batches (backfills
        must never be collected) and for truncate-carrying batches (the
        distributed plan owns the clear-target semantics)."""
        if self.inline_max_rows <= 0:
            return None
        if self._footer_rows_exceed_limit(env_batch):
            # Backfill short-circuit: the batch's parquet footers already
            # prove it is over the inline threshold — skip the probe job
            # entirely instead of paying a wasted collect on every backfill
            # batch. Footer counts are pre-filter (an upper bound), so this
            # only ever declines inlining conservatively, never wrongly
            # inlines.
            return None
        bucket = F.pmod(
            F.hash(*[F.col(f"key.{c}") for c in self.pk_cols]),
            F.lit(self.num_buckets),
        )
        rows = (
            env_batch.filter(F.col("op").isNotNull())
            .withColumn("__b", bucket)
            .limit(self.inline_max_rows + 1)
            .collect()
        )
        if len(rows) > self.inline_max_rows:
            return None
        if any(r["op"] == OP_TRUNCATE for r in rows):
            return None
        return rows

    def _write_batch_inline(self, env_batch: DataFrame, rows, epoch_id) -> None:
        import pyspark.sql.types as T

        row_schema = T.StructType(env_batch.schema["after"].dataType.fields)
        field_names = [f.name for f in row_schema.fields]
        self._detect_evolution(
            field_names,
            lambda: min((r["source"]["pos"] for r in rows), default=0),
        )
        if not rows:
            if not self._has_buckets():
                self._write_schema_sidecar(row_schema)
            return

        # K4 reduction (last event per key by stream position) in Python —
        # the join logic itself is still merge_flat_changes, shared with the
        # distributed path. Position ties break on (ts_ns, op) descending
        # with nulls smallest — the same secondary order
        # reduce_last_per_key's window uses, so both paths pick the same
        # survivor whenever the full order key differs.
        # The order key is computed ONCE per row and stored beside the
        # winner (recomputing it per comparison doubled the Python work of
        # the inline hot loop — Row field access is name-lookup, not slot).
        has_ts = "ts_ns" in rows[0].__fields__
        latest: dict = {}
        n_key = len(self.pk_cols)
        for r in rows:
            ts = r["ts_ns"] if has_ts else None
            op = r["op"]
            pos = r["source"]["pos"]
            ok = (
                # NULL pos sorts smallest, matching both the distributed
                # window (nulls first ascending) and the Arrow path's
                # null-flag lexsort key.
                float("-inf") if pos is None else pos,
                float("-inf") if ts is None else ts,
                "" if op is None else op,
            )
            # A keyless event (op 'm' message / schema-change) groups under
            # the all-null key, mirroring the distributed window's null-key
            # partition.
            k = tuple(r["key"]) if r["key"] is not None else (None,) * n_key
            prev = latest.get(k)
            if prev is None or ok >= prev[0]:
                latest[k] = (ok, r)
        data = []
        for _, r in latest.values():
            deleted = r["op"] == "d"
            state = r["before"] if deleted else r["after"]
            vals = tuple(
                None if state is None else state[f] for f in field_names
            )
            data.append((*vals, deleted, r["op"]))
        flat_schema = T.StructType(
            [
                # Nullable regardless of the event schema: a delete-rewrite
                # row legitimately carries NULL state fields.
                *(T.StructField(f.name, f.dataType, True) for f in row_schema.fields),
                T.StructField("__deleted", T.BooleanType(), False),
                T.StructField("__op", T.StringType(), True),
            ]
        )
        # Arrow conversion + a single partition: a 32-slice pickled local
        # relation costs ~0.3s PER EVALUATION (and the merge plan evaluates
        # the change side twice — broadcast build + union leg); one Arrow
        # batch makes it effectively free. Fall back to the row-based
        # conversion for types Arrow can't take from pandas (nested structs)
        # AND when a genuine NaN is present — pandas can't distinguish NaN
        # from NULL in a float column, so the Arrow path would turn a real
        # NaN value into NULL (the tuple path preserves both).
        import pandas as pd

        has_nan = any(
            isinstance(v, float) and v != v for row in data for v in row
        )
        col_names = [f.name for f in flat_schema.fields]
        try:
            if has_nan:
                raise ValueError("NaN present: pandas would conflate with null")
            pdf = pd.DataFrame(data, columns=col_names)
            flat_local = self.spark.createDataFrame(pdf, schema=flat_schema)
        except Exception:
            flat_local = self.spark.createDataFrame(data, flat_schema)
        flat_local = flat_local.coalesce(1)

        affected = sorted({r["__b"] for r in rows})
        target = self._read_target(row_schema)
        target_sub = target.filter(F.col(BUCKET_COL).isin(affected)).drop(
            BUCKET_COL
        )
        merged = merge_flat_changes(
            target_sub,
            flat_local,
            self.pk_cols,
            insert_mode=self.insert_mode,
            broadcast=True,
        )
        out = merged.withColumn(BUCKET_COL, self._bucket_of())
        self._stage_and_swap(
            out, affected, has_truncate=False, row_schema=row_schema,
            epoch_id=epoch_id,
        )

    def write_batch(self, env_batch: DataFrame, epoch_id: int | None = None) -> None:
        try:
            verdict, payload = self._prepare_inline_arrow(env_batch, epoch_id)
        except Exception:  # pragma: no cover - Arrow-unfriendly schema
            verdict, payload = None, None
        if verdict == "done":
            return
        if verdict == "inline":
            won, affected, row_schema = payload
            if self._merge_inline_driver(won, affected, row_schema,
                                         epoch_id):
                return
            flat_local = self._flat_local_from_won(won, row_schema)
            target = self._read_target(row_schema)
            target_sub = target.filter(
                F.col(BUCKET_COL).isin(affected)
            ).drop(BUCKET_COL)
            merged = merge_flat_changes(
                target_sub,
                flat_local,
                self.pk_cols,
                insert_mode=self.insert_mode,
                broadcast=True,
            )
            out = merged.withColumn(BUCKET_COL, self._bucket_of())
            self._stage_and_swap(
                out, affected, has_truncate=False, row_schema=row_schema,
                epoch_id=epoch_id,
            )
            return
        if verdict is None:
            # Row-based inline fallback (kept for Arrow-unfriendly shapes).
            rows = self._try_collect_inline(env_batch)
            if rows is not None:
                self._write_batch_inline(env_batch, rows, epoch_id)
                return
        flat_like = extract_new_record_state(
            env_batch.filter(F.col("op").isNotNull()), delete_handling="drop"
        )
        target = self._read_target(flat_like.schema)
        # Evolution detection against the authoritative on-disk column set:
        # the _schema.json sidecar written after every batch. A bare
        # spark.read.parquet(path).schema samples ONE footer; after an
        # evolution the buckets are heterogeneous, and sampling a
        # pre-evolution bucket would re-classify an existing column as
        # "added". The explicit-schema target read above already surfaces
        # genuinely-new columns as NULL for old buckets, so detection here
        # only feeds the schema-history registry — it must never rewrite
        # target columns.
        self._detect_evolution(
            flat_like.columns,
            lambda: env_batch.agg(F.min("source.pos")).collect()[0][0],
        )

        # Affected buckets + truncate flag in ONE aggregation job: the
        # Delta-MERGE-style pruning step, driver cost O(num_buckets), never
        # O(rows).
        stats = env_batch.agg(
            F.max(
                F.when(F.col("op") == OP_TRUNCATE, 1).otherwise(0)
            ).alias("has_trunc"),
            F.collect_set(
                F.pmod(
                    F.hash(*[F.col(f"key.{c}") for c in self.pk_cols]),
                    F.lit(self.num_buckets),
                )
            ).alias("buckets"),
        ).collect()[0]
        has_truncate = bool(stats["has_trunc"])
        if has_truncate:
            affected = None  # whole table rewrite (truncate clears it anyway)
            target_sub = target.drop(BUCKET_COL)
        else:
            affected = stats["buckets"]
            # Partition filter → parquet reads only the touched buckets.
            target_sub = target.filter(
                F.col(BUCKET_COL).isin(affected)
            ).drop(BUCKET_COL)

        merged = merge_changes(
            target_sub,
            env_batch,
            self.pk_cols,
            insert_mode=self.insert_mode,
            broadcast_changes=True,  # a micro-batch by construction
        )
        out = merged.withColumn(BUCKET_COL, self._bucket_of())
        self._stage_and_swap(
            out, affected, has_truncate=has_truncate,
            row_schema=flat_like.schema, epoch_id=epoch_id,
        )

    def _stage_and_swap(
        self, out: DataFrame, affected, *, has_truncate: bool, row_schema,
        epoch_id,
    ) -> None:
        # Stage-then-swap: ONE job writes the merged buckets to a staging
        # dir (reading the live target is safe — nothing is overwritten),
        # then bucket directories move into place with driver fs renames.
        # This replaces the localCheckpoint + dynamic-overwrite + cleanup
        # job chain (2 jobs/batch total instead of 4), and the written
        # bucket set falls out of listdir for free — a bucket whose rows
        # were all deleted is simply removed so stale data can't revive.
        # Crash safety: the swap is not atomic across buckets, but a replay
        # of the same batch against ANY mix of old/new buckets re-derives
        # the same per-bucket output (upsert of the same final state;
        # deleted keys already absent) — so checkpoint-driven re-delivery
        # converges, which is the exactly-once-in-effect contract.
        #
        # The pre-write repartition on the bucket id bounds the table's file
        # count: each touched bucket gets exactly ONE new file per batch
        # (instead of files × tasks), so the next batch's target scan opens
        # O(buckets) files no matter how many batches have run. The shuffle
        # it introduces moves only the merged output — the same rows the
        # write was already going to move.
        import shutil

        nparts = len(affected) if affected else self.num_buckets
        out = out.repartition(max(nparts, 1), F.col(BUCKET_COL))
        staging = f"{self.path}.staging-{epoch_id if epoch_id is not None else 'x'}"
        shutil.rmtree(staging, ignore_errors=True)
        out.write.mode("overwrite").partitionBy(BUCKET_COL).parquet(staging)

        if has_truncate or not self._has_buckets():
            shutil.rmtree(self.path, ignore_errors=True)
            os.replace(staging, self.path)
            self._write_schema_sidecar(row_schema)
            return
        self._swap_staged(staging, affected, row_schema)

    def _swap_staged(self, staging: str, affected, row_schema) -> None:
        """Move staged bucket dirs into place (driver fs renames) and drop
        emptied buckets; shared by the Spark write path and the driver-side
        inline merge so the swap/crash-consistency protocol exists once."""
        import shutil

        written = set()
        for entry in os.listdir(staging):
            if entry.startswith(f"{BUCKET_COL}="):
                written.add(int(entry.split("=", 1)[1]))
                dst = os.path.join(self.path, entry)
                shutil.rmtree(dst, ignore_errors=True)
                os.replace(os.path.join(staging, entry), dst)
        for b in set(affected) - written:
            pdir = os.path.join(self.path, f"{BUCKET_COL}={b}")
            if os.path.isdir(pdir):
                shutil.rmtree(pdir)
        shutil.rmtree(staging, ignore_errors=True)
        self._write_schema_sidecar(row_schema)

    def read(self) -> DataFrame:
        """The materialized table (without the bucketing column)."""
        if not self._has_buckets():
            schema = self._sidecar_schema()
            if schema is not None:
                return self.spark.createDataFrame([], schema)
        return (
            self.spark.read.option("mergeSchema", "true")
            .parquet(self.path)
            .drop(BUCKET_COL)
        )

    def __call__(self, env_batch: DataFrame, epoch_id: int) -> None:
        self.write_batch(env_batch, epoch_id)


class MultiTableSink:
    """K1 multi-table dispatch: one multiplexed envelope stream fans out to
    per-table MERGE sinks (JdbcChangeEventSink routes per collection,
    JdbcChangeEventSink.java:89-186; topic→table naming is K7's job).

    The per-batch table set is a tiny distinct on `source.table` (bounded by
    the captured-collection count, P10's guardrail axis); each table's slice
    then follows its own bucket-pruned merge. Unknown tables can be dropped
    or quarantined via the optional DLQ.
    """

    def __init__(self, sinks: dict[str, ParquetMergeSink], *, dlq=None):
        self.sinks = sinks
        self.dlq = dlq

    def write_batch(self, env_batch: DataFrame, epoch_id: int | None = None) -> None:
        tables = [
            r[0]
            for r in env_batch.select(F.col("source.table")).distinct().collect()
        ]
        for t in tables:
            part = env_batch.filter(F.col("source.table") == t)
            sink = self.sinks.get(t)
            if sink is not None:
                sink.write_batch(part, epoch_id)
            elif self.dlq is not None:
                self.dlq.quarantine(
                    part, reason=f"no sink for table {t}", epoch_id=epoch_id
                )

    def __call__(self, env_batch: DataFrame, epoch_id: int) -> None:
        self.write_batch(env_batch, epoch_id)
