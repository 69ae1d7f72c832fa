"""Composite-key keyset pagination for chunked/incremental snapshots.

Reference: the multi-column chunk query builder
``debezium-connector-common/.../pipeline/source/snapshot/incremental/
AbstractChunkQueryBuilder.java:49-119,225`` — chunk N+1 reads rows whose
key tuple is lexicographically greater than chunk N's maximum, expressed
as the standard row-value expansion::

    (k1 > a) OR (k1 = a AND k2 > b) OR (k1 = a AND k2 = b AND k3 > c)

This module provides that predicate as a Catalyst Column (so it pushes
into the scan), plus the parallel-snapshot half: sample-based split
points over an arbitrary orderable composite key — the same algorithm
Spark's own RangePartitioner uses — and a chunk-assignment expression.

Key columns follow the SQL PRIMARY KEY contract: NOT NULL. Values of any
orderable type work (int, string/UUID, date, timestamp, decimal);
Spark's binary comparison on each column defines the order, identical to
``ORDER BY k1, k2, ...``.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def keyset_gt(
    key_cols: Sequence[str], bound: Sequence, *, strict: bool = True
) -> Column:
    """Lexicographic ``(k1, k2, ...) > (b1, b2, ...)`` as a Column
    (``>=`` with ``strict=False``) — the chunk lower-bound predicate.

    Emitted as the OR-of-ANDs row-value expansion, which Catalyst folds
    into the scan filter: the leading ``k1 > b1`` disjunct alone prunes
    most files/row-groups via min-max statistics even before row-level
    evaluation."""
    if len(key_cols) != len(bound):
        raise ValueError(
            f"bound arity {len(bound)} != key arity {len(key_cols)}"
        )
    disjuncts: list[Column] = []
    for i, col in enumerate(key_cols):
        term = (
            F.col(col) > F.lit(bound[i])
            if (strict or i < len(key_cols) - 1)
            else F.col(col) >= F.lit(bound[i])
        )
        for j in range(i):
            term = (F.col(key_cols[j]) == F.lit(bound[j])) & term
        disjuncts.append(term)
    out = disjuncts[0]
    for d in disjuncts[1:]:
        out = out | d
    return out


def keyset_range(
    key_cols: Sequence[str],
    lo: Sequence | None,
    hi: Sequence | None,
) -> Column:
    """One chunk's predicate: ``key > lo AND key <= hi`` (half-open on
    the low side, matching the keyset walk; ``lo=None``/``hi=None`` leave
    that side unbounded). Chunks built from consecutive split points are
    disjoint and cover the table exactly."""
    cond = F.lit(True)
    if lo is not None:
        cond = cond & keyset_gt(key_cols, lo, strict=True)
    if hi is not None:
        # key <= hi  <=>  NOT (key > hi)
        cond = cond & ~keyset_gt(key_cols, hi, strict=True)
    return cond


def chunk_split_points(
    df: DataFrame,
    key_cols: Sequence[str],
    chunk_size: int,
    *,
    sample_per_chunk: int = 24,
    seed: int = 42,
) -> list[tuple]:
    """Split points for a parallel chunked snapshot over an arbitrary
    composite key — RangePartitioner's algorithm: sample the key space,
    sort the (bounded) sample driver-side, take every k-th element.

    Returns ``n_chunks - 1`` key tuples; chunk ``i`` reads
    ``keyset_range(key_cols, splits[i-1], splits[i])``. Chunk sizes are
    approximate (sampling), but coverage is EXACT: consecutive half-open
    ranges partition the table regardless of sample quality. At 100 TB
    the sample is one cheap scan-side pass and the driver holds
    O(n_chunks · sample_per_chunk) keys, never the table."""
    total = df.count()
    n_chunks = max(1, -(-total // chunk_size))
    if n_chunks == 1:
        return []
    frac = min(1.0, (n_chunks * sample_per_chunk) / max(1, total))
    sample = (
        df.select(*key_cols).sample(fraction=frac, seed=seed).collect()
    )
    if not sample:
        return []
    keys = sorted(tuple(r) for r in sample)
    step = len(keys) / n_chunks
    splits: list[tuple] = []
    for i in range(1, n_chunks):
        cand = keys[min(len(keys) - 1, int(i * step))]
        if not splits or cand > splits[-1]:  # dedupe collapsed quantiles
            splits.append(cand)
    return splits


def assign_chunks(
    df: DataFrame, key_cols: Sequence[str], splits: Sequence[Sequence]
) -> DataFrame:
    """Add a ``chunk_id`` column: the index of the half-open split range
    the row's key falls in. chunk_id = number of split points the key
    exceeds — a sum of O(n_splits) keyset comparisons, all map-side (no
    shuffle, no join). For thousands of chunks prefer issuing one
    bounded read per chunk (`keyset_range`) instead."""
    cid = F.lit(0)
    for s in splits:
        cid = cid + keyset_gt(key_cols, list(s), strict=True).cast("int")
    return df.withColumn("chunk_id", cid)


def exact_rank_chunks(
    df: DataFrame,
    key_cols: Sequence[str],
    chunk_size: int,
    *,
    n_parts: int = 32,
) -> DataFrame:
    """EXACT chunk assignment over an arbitrary composite key:
    ``chunk_id = floor((rank(key) - 1) / chunk_size)`` where rank is the
    MIN-rank under ``ORDER BY k1, k2, ...`` (SQL ``rank()``) — the same
    boundaries as the reference's sequential keyset walk (chunk N+1
    starts after chunk N's max key) but computed in TWO distributed
    passes instead of N driver round-trips.

    Two-level rank (the x27 prefix-sum trick — never one global ordered
    window): rows bucket by CONTENT-derived split points (a deterministic
    expression on the key, NOT spark_partition_id — post-shuffle
    partition ids are not stable across the two jobs under AQE
    coalescing), per-bucket counts collect once and prefix-sum into
    offsets, and ``rank()`` runs inside each bucket. Min-rank makes the
    result deterministic even for duplicated keys — every copy of a tied
    key lands in the SAME chunk (a chunk may overshoot by the tie-group
    size, the shard-packing contract), where row_number would split ties
    arbitrarily across a boundary and never reproduce.

    The driver holds O(n_parts) counts; every heavy step (bucket
    shuffle, local window) runs at full parallelism — the 100 TB path
    for S2 parallel snapshots over composite/string keys."""
    from pyspark.sql import Window

    total = df.count()
    splits = chunk_split_points(
        df, key_cols, max(1, -(-total // n_parts))
    )
    bucket = F.lit(0)
    for s in splits:
        bucket = bucket + keyset_gt(key_cols, list(s)).cast("int")
    keyed = df.withColumn("__b", bucket)
    counts = {
        r["__b"]: r["n"]
        for r in keyed.groupBy("__b").agg(F.count("*").alias("n")).collect()
    }
    offsets, acc = {}, 0
    for b in sorted(counts):
        offsets[b] = acc
        acc += counts[b]
    off_expr = F.lit(0)
    for b, off in offsets.items():
        if off:
            off_expr = F.when(F.col("__b") == b, off).otherwise(off_expr)
    local = Window.partitionBy("__b").orderBy(*[F.col(c) for c in key_cols])
    return (
        keyed.withColumn("__rank", F.rank().over(local) + off_expr)
        .withColumn(
            "chunk_id",
            F.floor((F.col("__rank") - 1) / chunk_size).cast("int"),
        )
        .drop("__b", "__rank")
    )


def jdbc_chunk_predicates(
    key_cols: Sequence[str], splits: Sequence[Sequence]
) -> list[str]:
    """Render split points as SQL WHERE fragments for Spark's
    ``spark.read.jdbc(url, table, predicates=[...])`` — one predicate per
    chunk, so a live-database snapshot reads composite/string-keyed
    tables in parallel exactly like the reference's chunk workers
    (numeric keys keep the simpler partitionColumn bounds path in
    `sources/snapshot.py:jdbc_snapshot`). Values are rendered as SQL
    literals: strings escape embedded quotes, temporal types render as
    ISO strings (every major dialect casts them in comparisons)."""

    def lit(v) -> str:
        if isinstance(v, bool):
            return "TRUE" if v else "FALSE"
        if isinstance(v, (int, float)):
            return repr(v)
        iso = getattr(v, "isoformat", None)
        s = iso() if iso is not None else str(v)
        return "'" + s.replace("'", "''") + "'"

    def gt(bound: Sequence) -> str:
        disjuncts = []
        for i, col in enumerate(key_cols):
            eqs = [f"{key_cols[j]} = {lit(bound[j])}" for j in range(i)]
            eqs.append(f"{col} > {lit(bound[i])}")
            disjuncts.append("(" + " AND ".join(eqs) + ")")
        return "(" + " OR ".join(disjuncts) + ")"

    bounds = [None, *[list(s) for s in splits], None]
    preds = []
    for lo, hi in zip(bounds[:-1], bounds[1:]):
        parts = []
        if lo is not None:
            parts.append(gt(lo))
        if hi is not None:
            parts.append(f"NOT {gt(hi)}")
        preds.append(" AND ".join(parts) if parts else "1 = 1")
    return preds
