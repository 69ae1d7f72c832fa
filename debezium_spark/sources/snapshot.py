"""Snapshot sources (S1/S2/S6/S12).

Reference: the 7-step consistent-snapshot algorithm in
RelationalSnapshotChangeEventSource.java:147-201 and the chunked parallel
variant (ChunkBoundaryCalculator.java:56-107). In Spark the "parallel
per-table SELECT *" phase IS the partitioned scan: parquet splits or
``spark.read.jdbc(partitionColumn=..., numPartitions=...)`` — snapshot
parallelism equals task parallelism, no worker pool to manage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from debezium_spark.envelope import wrap_snapshot


def snapshot_table(
    spark: SparkSession,
    path_or_table: str,
    key_cols: list[str],
    *,
    fmt: str = "parquet",
    db: str = "db",
    table: str = "t",
    columns: list[str] | None = None,
    predicate: str | None = None,
) -> DataFrame:
    """S1: read a table and emit ``r`` envelopes.

    ``columns``/``predicate`` model column include-lists and
    ``snapshot.select.statement.overrides`` (S12,
    RelationalSnapshotChangeEventSource.java:562-591): both are applied
    *before* the envelope wrap so Catalyst pushes them into the scan
    (PushedFilters / ReadSchema — verified in tests/test_plans.py).
    """
    reader = spark.read.format(fmt)
    df = reader.load(path_or_table)
    if predicate:
        df = df.filter(predicate)
    if columns:
        df = df.select(*columns)
    return wrap_snapshot(df, key_cols, db=db, table=table)


def chunked_snapshot_bounds(
    df: DataFrame, pk_col: str, chunk_size: int
) -> list[tuple[int, int]]:
    """S2: compute key-range chunk boundaries for a parallel snapshot
    over a SINGLE NUMERIC key (equi-width integer ranges).

    Reference walks keyset-paginated boundary queries
    (ChunkBoundaryCalculator.java:56-107). Distributed version: exact
    min/max plus equi-width ranges — the scan itself is then issued as one
    filter per range (or, for JDBC, as numPartitions on the reader). At
    100 TB the boundary computation is a single cheap agg, not N boundary
    round-trips. Composite or non-numeric keys (UUID/string/date) go
    through :func:`chunked_snapshot_splits` instead.
    """
    row = df.agg(F.min(pk_col).alias("lo"), F.max(pk_col).alias("hi")).collect()[0]
    lo, hi = int(row["lo"]), int(row["hi"])
    n = max(1, (hi - lo + 1 + chunk_size - 1) // chunk_size)
    bounds = []
    for i in range(n):
        a = lo + i * chunk_size
        b = min(hi, a + chunk_size - 1)
        bounds.append((a, b))
    return bounds


def chunked_snapshot_splits(
    df: DataFrame, key_cols: list[str], chunk_size: int
) -> list[tuple]:
    """S2 for composite and non-numeric primary keys: split points over
    the lexicographic key order (sample-based, RangePartitioner's
    algorithm — `sources/keyset.py`). Chunk ``i`` reads
    ``keyset_range(key_cols, splits[i-1], splits[i])``: approximate
    sizes, EXACT coverage (consecutive half-open row-value ranges
    partition the table no matter the sample). This is the reference's
    multi-column chunk query builder
    (AbstractChunkQueryBuilder.java:49-119) re-expressed as a
    distributed range partitioning instead of N sequential keyset
    round-trips."""
    from debezium_spark.sources.keyset import chunk_split_points

    return chunk_split_points(df, key_cols, chunk_size)


def jdbc_snapshot(
    spark: SparkSession,
    url: str,
    table: str,
    key_cols: list[str],
    *,
    partition_column: str | None = None,
    num_partitions: int = 8,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    **options: str,
) -> DataFrame:
    """S1/S2 against a live database via the built-in JDBC source.

    The chunked snapshot maps 1:1 onto Spark's partitioned JDBC read —
    each partition issues ``WHERE pk BETWEEN lo AND hi`` exactly like the
    reference's chunk workers (RelationalSnapshotChangeEventSource.java:529-591).
    Untested in this container (no database); the code path mirrors
    snapshot_table.
    """
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("numPartitions", str(num_partitions))
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
        )
    for k, v in options.items():
        reader = reader.option(k, v)
    return wrap_snapshot(reader.load(), key_cols, db="jdbc", table=table)


def should_snapshot(mode: str, checkpoint_exists: bool, data_exists: bool) -> bool:
    """S6 snapshot-mode policy (snapshot/mode/*.java, Snapshotter SPI
    debezium-api/.../spi/snapshot/Snapshotter.java:28-56).

    always/initial/initial_only/no_data/when_needed collapse to a driver-side
    decision on checkpoint + target existence.
    """
    if mode == "always":
        return True
    if mode in ("initial", "initial_only"):
        return not checkpoint_exists
    if mode == "no_data" or mode == "never":
        return False
    if mode == "when_needed":
        return not checkpoint_exists or not data_exists
    raise ValueError(f"unknown snapshot mode: {mode}")
