"""Analytic-surface queries on the materialized tables (SURVEY §2.6).

The reference has no joins/aggregations/windows; on Spark they arrive as
built-ins and this engine exposes them on the tables the CDC layer
materializes. These registrations prove that surface against the DuckDB
oracle on the TPC-H-ish fixtures.

Float discipline for aggregates: money columns are cast to DECIMAL **before
summing** (decimal addition is exact and associative, so hash-agg ordering
differences between engines can't change a bit); averages/ratios convert the
exact decimal result to double at the very end.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from debezium_spark.operators.asof import asof_join
from debezium_spark.suite import register

_DEC = "decimal(18,2)"


def _t(spark, sf_dir, name):
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def ranked_after_limit(top, *order, name: str = "rk"):
    """Row-index rank over a Limit-bounded result, robust to plan shape.

    orderBy().limit() usually collapses to TakeOrderedAndProject (one sorted
    output partition), but that is a plan detail, not a contract — AQE or a
    limit-strategy change could hand back several partitions and silently
    corrupt a bare monotonically_increasing_id rank. coalesce(1) +
    sortWithinPartitions re-establishes the order structurally on the ≤k
    surviving rows (trivial cost at k ≤ 50), so the id really is the row
    index — no rank window, so the bench tail stays free of WindowExec
    warnings and a real unbounded window still stands out.
    """
    one = top.coalesce(1).sortWithinPartitions(*order)
    return one.withColumn(
        name, (F.monotonically_increasing_id() + 1).cast("int")
    )


# ---------------------------------------------------------------------------
# W1 — pricing summary (TPC-H Q1 shape: scan + hash agg, exact decimals)
# ---------------------------------------------------------------------------
@register(
    "w1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
           count(*) AS count_order
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
)
def w1_pricing_summary(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast(_DEC)
    price = F.col("l_extendedprice").cast(_DEC)
    disc = F.col("l_discount").cast(_DEC)
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(qty).cast("double").alias("sum_qty"),
        F.sum(price).cast("double").alias("sum_base_price"),
        F.sum(price * (F.lit(1) - disc)).cast("double").alias("sum_disc_price"),
        F.count("*").alias("count_order"),
    )


# ---------------------------------------------------------------------------
# W2 — shipping-priority top-k (join + agg + rank: TPC-H Q3 shape)
# ---------------------------------------------------------------------------
@register(
    "w2_top_revenue_orders",
    oracle="""
    WITH rev AS (
        SELECT o.o_orderkey,
               strftime(CAST(o.o_orderdate AS DATE), '%Y-%m-%d') AS orderdate,
               CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                        * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE c.c_mktsegment = 'BUILDING'
        GROUP BY 1, 2
    )
    SELECT o_orderkey, orderdate, revenue,
           CAST(row_number() OVER (ORDER BY revenue DESC, o_orderkey) AS INT) AS rk
    FROM rev
    QUALIFY rk <= 10
    """,
)
def w2_top_revenue_orders(spark, sf_dir):
    """Broadcast the filtered dimension (customer segment), shuffle-agg the
    fact side once, then a top-k window — the canonical star-join shape."""
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    rev = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .groupBy(
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        )
        .agg(
            F.sum(
                F.col("l_extendedprice").cast(_DEC)
                * (F.lit(1) - F.col("l_discount").cast(_DEC))
            ).cast("double").alias("revenue")
        )
    )
    # orderBy+limit = distributed TakeOrderedAndProject (per-partition local
    # top-10, driver merge) — a global rank window before the filter would
    # funnel every aggregated order through ONE partition. The rank is then
    # assigned on the 10 survivors only.
    top = rev.orderBy(F.col("revenue").desc(), F.col("o_orderkey")).limit(10)
    return ranked_after_limit(
        top, F.col("revenue").desc(), F.col("o_orderkey")
    )


# ---------------------------------------------------------------------------
# W3 — forecast revenue (filter + global sum: TPC-H Q6 shape)
# ---------------------------------------------------------------------------
@register(
    "w3_revenue_filter",
    oracle="""
    SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
           count(*) AS n
    FROM lineitem
    WHERE l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
    """,
)
def w3_revenue_filter(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(
                F.col("l_extendedprice").cast(_DEC)
                * F.col("l_discount").cast(_DEC)
            ).cast("double").alias("revenue"),
            F.count("*").alias("n"),
        )
    )


# ---------------------------------------------------------------------------
# W4 — windowed share-of-group (analytic window functions)
# ---------------------------------------------------------------------------
@register(
    "w4_share_window",
    oracle="""
    WITH t AS (
        SELECT o_custkey,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(28,2)) AS spend
        FROM orders GROUP BY 1
    )
    SELECT o_custkey,
           CAST(spend AS DOUBLE) AS spend,
           round(CAST(spend AS DOUBLE)
                 / CAST(sum(spend) OVER () AS DOUBLE), 8) AS share,
           CAST(rank() OVER (ORDER BY spend DESC, o_custkey) AS INT) AS rk
    FROM t
    """,
)
def w4_share_window(spark, sf_dir):
    """Share-of-total + full global rank, both scale-shaped: the total is a
    one-row aggregate broadcast back (not an empty-partition window sum),
    and the rank is the two-phase distributed global_rank — no task ever
    holds more than one range slice."""
    from debezium_spark.operators.rank import global_rank

    o = _t(spark, sf_dir, "orders")
    spend = o.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast(_DEC)).cast("decimal(28,2)").alias("spend")
    )
    total = spend.agg(F.sum("spend").alias("__total"))
    ranked = global_rank(
        spend,
        [F.col("spend").desc(), F.col("o_custkey")],
        rank_col="rk",
    )
    return ranked.crossJoin(F.broadcast(total)).select(
        "o_custkey",
        F.col("spend").cast("double").alias("spend"),
        F.round(
            F.col("spend").cast("double") / F.col("__total").cast("double"), 8
        ).alias("share"),
        F.col("rk").cast("int").alias("rk"),
    )


# ---------------------------------------------------------------------------
# W5 — rollup (grouping sets)
# ---------------------------------------------------------------------------
@register(
    "w5_rollup_counts",
    oracle="""
    SELECT coalesce(r_name, '<all>') AS region,
           coalesce(n_name, '<all>') AS nation,
           count(*) AS n_customers
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
)
def w5_rollup_counts(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    joined = c.join(
        F.broadcast(n), c["c_nationkey"] == n["n_nationkey"]
    ).join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
    return (
        joined.rollup("r_name", "n_name")
        .count()
        .select(
            F.coalesce("r_name", F.lit("<all>")).alias("region"),
            F.coalesce("n_name", F.lit("<all>")).alias("nation"),
            F.col("count").alias("n_customers"),
        )
    )


# ---------------------------------------------------------------------------
# W6 — set operations
# ---------------------------------------------------------------------------
@register(
    "w6_set_ops",
    oracle="""
    SELECT c_custkey FROM customer
    INTERSECT
    SELECT o_custkey FROM orders
    EXCEPT
    SELECT user_id FROM events WHERE event_type = 'error'
    """,
)
def w6_set_ops(spark, sf_dir):
    c = _t(spark, sf_dir, "customer").select(F.col("c_custkey"))
    o = _t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("c_custkey"))
    from debezium_spark.sources.changefeed import _events

    err = (
        _events(spark, sf_dir)
        .filter(F.col("event_type") == "error")
        .select(F.col("user_id").alias("c_custkey"))
    )
    return c.intersect(o).exceptAll(err).distinct()


# ---------------------------------------------------------------------------
# W7 — exact + approximate distinct aggregation
# ---------------------------------------------------------------------------
@register(
    "w7_distinct_agg",
    oracle="""
    SELECT l_returnflag,
           count(DISTINCT l_partkey) AS n_parts,
           count(DISTINCT l_suppkey) AS n_supps
    FROM lineitem GROUP BY 1
    """,
)
def w7_distinct_agg(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
    )


# ---------------------------------------------------------------------------
# W8 — as-of join (custom operator vs DuckDB's native ASOF JOIN)
# ---------------------------------------------------------------------------
@register(
    "w8_asof_join",
    oracle="""
    WITH r AS (
        SELECT user_id, epoch_ns(ts) AS ts_ns, event_type, value
        FROM events
        QUALIFY row_number() OVER (PARTITION BY user_id, epoch_ns(ts)
                                   ORDER BY event_id DESC) = 1
    ),
    l AS (
        SELECT o_orderkey, o_custkey, epoch_us(o_orderdate) * 1000 AS od_ns
        FROM orders
    )
    SELECT l.o_orderkey, l.o_custkey,
           r.event_type AS event_type_asof, r.value AS value_asof
    FROM l ASOF LEFT JOIN r
      ON l.o_custkey = r.user_id AND l.od_ns >= r.ts_ns
    """,
)
def w8_asof_join(spark, sf_dir):
    """Temporal enrichment: each order picks up the latest event state at or
    before its date. The union/window formulation costs one key shuffle
    regardless of side sizes; DuckDB's native ASOF JOIN is the oracle."""
    from debezium_spark.sources.changefeed import _events

    ev = _events(spark, sf_dir).withColumn("ts_ns", F.col("ts"))
    w_dedup = Window.partitionBy("user_id", "ts_ns").orderBy(
        F.col("event_id").desc()
    )
    right = (
        ev.withColumn("__rn", F.row_number().over(w_dedup))
        .filter(F.col("__rn") == 1)
        .select("user_id", "ts_ns", "event_type", "value")
    )
    left = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_custkey"),
        (F.unix_micros(F.col("o_orderdate").cast("timestamp")) * 1000).alias(
            "od_ns"
        ),
    )
    joined = asof_join(
        left.withColumnRenamed("o_custkey", "user_id"),
        right,
        on=["user_id"],
        left_ts="od_ns",
        right_ts="ts_ns",
        right_cols=["event_type", "value"],
    )
    return joined.select(
        "o_orderkey",
        F.col("user_id").alias("o_custkey"),
        F.col("event_type_asof"),
        F.col("value_asof"),
    )


# ---------------------------------------------------------------------------
# W9 — salted skew join (must equal the plain join)
# ---------------------------------------------------------------------------
@register(
    "w9_salted_join",
    oracle="""
    SELECT e.event_id, c.c_mktsegment
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    """,
)
def w9_salted_join(spark, sf_dir):
    """Hot-key defense: the skewed side salted n ways, the other side
    replicated n ways (operators/skew.py) — result identical to the plain
    join, shuffle fan-out per hot key n tasks instead of 1."""
    from debezium_spark.operators.skew import salted_join
    from debezium_spark.sources.changefeed import _events

    ev = _events(spark, sf_dir).select("event_id", "user_id")
    cust = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    return salted_join(
        ev, cust, ["user_id"], num_salts=8, salt_source="event_id"
    ).select("event_id", "c_mktsegment")


# ---------------------------------------------------------------------------
# W10 — percentiles (continuous interpolation)
# ---------------------------------------------------------------------------
@register(
    "w10_percentiles",
    oracle="""
    SELECT o_orderpriority,
           round(quantile_cont(o_totalprice, 0.5), 6) AS p50,
           round(quantile_cont(o_totalprice, 0.95), 6) AS p95,
           count(*) AS n
    FROM orders
    GROUP BY 1
    """,
)
def w10_percentiles(spark, sf_dir):
    """Exact continuous percentiles (linear interpolation — the same
    formula in both engines, so values match to the bit before the display
    round)."""
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.round(F.percentile("o_totalprice", F.lit(0.5)), 6).alias("p50"),
        F.round(F.percentile("o_totalprice", F.lit(0.95)), 6).alias("p95"),
        F.count("*").alias("n"),
    )


# ---------------------------------------------------------------------------
# W11 — pivot (dimension → columns)
# ---------------------------------------------------------------------------
@register(
    "w11_pivot",
    oracle="""
    SELECT l_returnflag,
           CAST(sum(CASE WHEN l_linestatus = 'F'
                    THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS qty_F,
           CAST(sum(CASE WHEN l_linestatus = 'O'
                    THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS qty_O
    FROM lineitem
    GROUP BY 1
    """,
)
def w11_pivot(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    p = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.sum(F.col("l_quantity").cast(_DEC)).cast("double"))
    )
    return p.select(
        "l_returnflag",
        F.col("F").alias("qty_F"),
        F.col("O").alias("qty_O"),
    )


# ---------------------------------------------------------------------------
# W12 — multi-join chain (TPC-H Q5 shape: 5-way star with broadcasts)
# ---------------------------------------------------------------------------
@register(
    "w12_region_revenue",
    oracle="""
    SELECT r.r_name,
           CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
           count(*) AS n_items
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY 1
    """,
)
def w12_region_revenue(spark, sf_dir):
    """Five-way star: fact side keeps its partitioning; every dimension
    broadcasts (nation/region are tiny, customer fits comfortably)."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    joined = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
    )
    return joined.groupBy("r_name").agg(
        F.sum(
            F.col("l_extendedprice").cast(_DEC)
            * (F.lit(1) - F.col("l_discount").cast(_DEC))
        ).cast("double").alias("revenue"),
        F.count("*").alias("n_items"),
    )


# ---------------------------------------------------------------------------
# W13 — EXISTS / NOT EXISTS (semi/anti join semantics)
# ---------------------------------------------------------------------------
@register(
    "w13_exists_anti",
    oracle="""
    SELECT c_custkey, c_mktsegment
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
      AND NOT EXISTS (SELECT 1 FROM events e
                      WHERE e.user_id = c.c_custkey
                        AND e.event_type = 'error')
    """,
)
def w13_exists_anti(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c_custkey")
    )
    from debezium_spark.sources.changefeed import _events

    err = (
        _events(spark, sf_dir)
        .filter(F.col("event_type") == "error")
        .select(F.col("user_id").alias("c_custkey"))
    )
    return (
        c.join(o, "c_custkey", "left_semi")
        .join(err, "c_custkey", "left_anti")
        .select("c_custkey", "c_mktsegment")
    )


# ---------------------------------------------------------------------------
# W14 — local supplier volume (TPC-H Q5 shape: 6-way join, same-nation filter)
# ---------------------------------------------------------------------------
@register(
    "w14_local_supplier_volume",
    oracle="""
    SELECT n.n_name,
           CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
                   AND s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE CAST(o.o_orderdate AS DATE) >= DATE '1996-01-01'
      AND CAST(o.o_orderdate AS DATE) <  DATE '1998-01-01'
    GROUP BY 1
    """,
)
def w14_local_supplier_volume(spark, sf_dir):
    """Q5: revenue where the supplier sits in the customer's nation. The
    fact table keeps its partitioning; orders is the only shuffle join
    (fact-to-fact on orderkey), every dimension broadcasts, and the
    same-nation predicate rides the broadcast joins for free."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1998-01-01")
    )
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    joined = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(
            F.broadcast(n),
            (c["c_nationkey"] == n["n_nationkey"])
            & (s["s_nationkey"] == n["n_nationkey"]),
        )
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
    )
    return joined.groupBy("n_name").agg(
        F.sum(
            F.col("l_extendedprice").cast(_DEC)
            * (F.lit(1) - F.col("l_discount").cast(_DEC))
        ).cast("double").alias("revenue")
    )


# ---------------------------------------------------------------------------
# W15 — returned-item top customers (TPC-H Q10 shape: agg + top-k)
# ---------------------------------------------------------------------------
@register(
    "w15_returned_top_customers",
    oracle="""
    WITH rev AS (
        SELECT c.c_custkey, c.c_name, n.n_name,
               CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                        * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        FROM customer c
        JOIN orders o   ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN nation n   ON c.c_nationkey = n.n_nationkey
        WHERE l.l_returnflag = 'R'
        GROUP BY 1, 2, 3
    )
    SELECT c_custkey, c_name, n_name, revenue,
           CAST(row_number() OVER (ORDER BY revenue DESC, c_custkey) AS INT) AS rk
    FROM rev
    QUALIFY rk <= 20
    """,
)
def w15_returned_top_customers(spark, sf_dir):
    """Q10: who returned the most revenue. Return-flag filter pushes to the
    lineitem scan; one shuffle agg on custkey; distributed TakeOrdered
    top-20 (tie-broken on the key so the result is deterministic)."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    rev = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.sum(
                F.col("l_extendedprice").cast(_DEC)
                * (F.lit(1) - F.col("l_discount").cast(_DEC))
            ).cast("double").alias("revenue")
        )
    )
    # Distributed TakeOrdered first; the global rank window only ever sees
    # the 20 survivors (same pattern as w2 / x15_vocabulary_topk).
    top = rev.orderBy(F.col("revenue").desc(), F.col("c_custkey")).limit(20)
    return ranked_after_limit(
        top, F.col("revenue").desc(), F.col("c_custkey")
    )


# ---------------------------------------------------------------------------
# W16 — min-cost supplier per part (TPC-H Q2 shape: correlated min subquery)
# ---------------------------------------------------------------------------
@register(
    "w16_min_cost_supplier",
    oracle="""
    WITH cost AS (
        SELECT l.l_partkey, l.l_suppkey,
               min(CAST(l.l_extendedprice AS DECIMAL(18,2))
                   / CAST(l.l_quantity AS DECIMAL(18,2))) AS unit_cost
        FROM lineitem l
        GROUP BY 1, 2
    )
    SELECT p.p_partkey, p.p_brand, s.s_name,
           round(CAST(c.unit_cost AS DOUBLE), 6) AS unit_cost
    FROM cost c
    JOIN part p     ON c.l_partkey = p.p_partkey
    JOIN supplier s ON c.l_suppkey = s.s_suppkey
    WHERE p.p_size <= 5
      AND c.unit_cost = (SELECT min(c2.unit_cost) FROM cost c2
                         WHERE c2.l_partkey = c.l_partkey)
    """,
)
def w16_min_cost_supplier(spark, sf_dir):
    """Q2's correlated `= (SELECT min(...))` decorrelates into a window
    min over the part key — one shuffle instead of a rejoin, and exact
    DECIMAL division so the equality predicate is bit-stable."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_size") <= 5)
    s = _t(spark, sf_dir, "supplier")
    cost = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(
            F.col("l_extendedprice").cast(_DEC) / F.col("l_quantity").cast(_DEC)
        ).alias("unit_cost")
    )
    wmin = F.min("unit_cost").over(Window.partitionBy("l_partkey"))
    best = cost.withColumn("__best", wmin).filter(
        F.col("unit_cost") == F.col("__best")
    )
    return (
        best.join(F.broadcast(p), best["l_partkey"] == p["p_partkey"])
        .join(F.broadcast(s), best["l_suppkey"] == s["s_suppkey"])
        .select(
            "p_partkey",
            "p_brand",
            "s_name",
            F.round(F.col("unit_cost").cast("double"), 6).alias("unit_cost"),
        )
    )


# ---------------------------------------------------------------------------
# W17 — small-quantity revenue (TPC-H Q17 shape: correlated avg filter)
# ---------------------------------------------------------------------------
@register(
    "w17_small_quantity_revenue",
    oracle="""
    SELECT CAST(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(18,2))
                / 7.0 AS DOUBLE) AS avg_yearly,
           count(*) AS n_items
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'BRAND#1'
      AND l.l_quantity < (SELECT 0.2 * avg(CAST(l2.l_quantity AS DECIMAL(18,2)))
                          FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)
    """,
)
def w17_small_quantity_revenue(spark, sf_dir):
    """Q17's correlated average decorrelates into a window avg partitioned
    by partkey — the brand filter broadcasts into the fact scan first so
    the window only shuffles the brand's rows."""
    p = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "BRAND#1")
    li = _t(spark, sf_dir, "lineitem")
    branded = li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
    avg_qty = F.avg(F.col("l_quantity").cast(_DEC)).over(
        Window.partitionBy("l_partkey")
    )
    small = branded.withColumn("__avg", avg_qty).filter(
        F.col("l_quantity") < 0.2 * F.col("__avg")
    )
    return small.agg(
        (
            F.sum(F.col("l_extendedprice").cast(_DEC)).cast(_DEC) / F.lit(7.0)
        ).cast("double").alias("avg_yearly"),
        F.count("*").alias("n_items"),
    )


# ---------------------------------------------------------------------------
# W18 — priority split per return flag (TPC-H Q12 shape: conditional agg)
# ---------------------------------------------------------------------------
@register(
    "w18_priority_split",
    oracle="""
    SELECT l.l_returnflag,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY 1
    """,
)
def w18_priority_split(spark, sf_dir):
    """Q12: conditional aggregation — both counters come out of ONE pass
    over the joined fact (no second scan, no second shuffle)."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


# ---------------------------------------------------------------------------
# W19 — promo revenue share (TPC-H Q14 shape: ratio of conditional sums)
# ---------------------------------------------------------------------------
@register(
    "w19_promo_revenue_share",
    oracle="""
    SELECT CAST(100.0 * CAST(sum(CASE WHEN p.p_type = 'PROMO'
                    THEN CAST(l.l_extendedprice AS DECIMAL(18,2))
                         * (1 - CAST(l.l_discount AS DECIMAL(18,2)))
                    ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
                / CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                       * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE)
           AS DOUBLE) AS promo_share
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    """,
)
def w19_promo_revenue_share(spark, sf_dir):
    """Q14: numerator and denominator in one aggregation over a broadcast
    dimension join; exact decimal sums, double only at the final ratio."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    rev = F.col("l_extendedprice").cast(_DEC) * (
        F.lit(1) - F.col("l_discount").cast(_DEC)
    )
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(
        F.lit(0).cast(_DEC)
    )
    return (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .agg(
            (
                F.lit(100.0)
                * F.sum(promo).cast("double")
                / F.sum(rev).cast("double")
            ).cast("double").alias("promo_share")
        )
    )


# ---------------------------------------------------------------------------
# W20 — large-quantity orders (TPC-H Q18 shape: HAVING over fact agg)
# ---------------------------------------------------------------------------
@register(
    "w20_large_orders",
    oracle="""
    WITH big AS (
        SELECT l_orderkey,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
        FROM lineitem GROUP BY 1
        HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 120
    )
    SELECT c.c_custkey, c.c_name, b.l_orderkey, o.o_totalprice, b.total_qty
    FROM big b
    JOIN orders o   ON b.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    """,
)
def w20_large_orders(spark, sf_dir):
    """Q18: the HAVING filter shrinks the fact agg *before* any join —
    orders/customer then join the survivors (both effectively broadcast
    at that point)."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast(_DEC)).alias("__q"))
        .filter(F.col("__q") > 120)
        .select("l_orderkey", F.col("__q").cast("double").alias("total_qty"))
    )
    return (
        big.join(o, big["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .select("c_custkey", "c_name", "l_orderkey", "o_totalprice", "total_qty")
    )


# ---------------------------------------------------------------------------
# W21 — disjunctive predicate join (TPC-H Q19 shape: OR-of-ANDs pushdown)
# ---------------------------------------------------------------------------
@register(
    "w21_disjunctive_revenue",
    oracle="""
    SELECT CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE)
               AS revenue,
           count(*) AS n_items
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'BRAND#1' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 30)
       OR (p.p_brand = 'BRAND#2' AND p.p_size BETWEEN 10 AND 30
           AND l.l_quantity BETWEEN 10 AND 40)
    """,
)
def w21_disjunctive_revenue(spark, sf_dir):
    """Q19: OR-of-ANDs across both join sides. The per-side conjuncts
    Catalyst can factor out (p_brand IN (...), quantity range) prune
    before the join; the cross-side disjunction evaluates post-join."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    cond1 = (
        (F.col("p_brand") == "BRAND#1")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 30)
    )
    cond2 = (
        (F.col("p_brand") == "BRAND#2")
        & F.col("p_size").between(10, 30)
        & F.col("l_quantity").between(10, 40)
    )
    return (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .filter(cond1 | cond2)
        .agg(
            F.sum(
                F.col("l_extendedprice").cast(_DEC)
                * (F.lit(1) - F.col("l_discount").cast(_DEC))
            ).cast("double").alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


# ---------------------------------------------------------------------------
# W22 — dormant rich customers (TPC-H Q22 shape: scalar subquery + anti join)
# ---------------------------------------------------------------------------
@register(
    "w22_dormant_customers",
    oracle="""
    WITH threshold AS (
        SELECT avg(CAST(c_acctbal AS DECIMAL(18,2))) AS t
        FROM customer WHERE CAST(c_acctbal AS DECIMAL(18,2)) > 0
    )
    SELECT c.c_nationkey,
           count(*) AS numcust,
           CAST(sum(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
    FROM customer c, threshold
    WHERE CAST(c.c_acctbal AS DECIMAL(18,2)) > threshold.t
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
    GROUP BY 1
    """,
)
def w22_dormant_customers(spark, sf_dir):
    """Q22: the global-average threshold is a one-row broadcast (scalar
    subquery shape), never-ordered customers come from a left-anti join
    on the orders key set."""
    c = _t(spark, sf_dir, "customer")
    o = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    bal = F.col("c_acctbal").cast(_DEC)
    thr = c.filter(bal > 0).agg(F.avg(bal).alias("t"))
    return (
        c.crossJoin(F.broadcast(thr))
        .filter(bal > F.col("t"))
        .join(o, "c_custkey", "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("numcust"),
            F.sum(bal).cast("double").alias("totacctbal"),
        )
    )


# ---------------------------------------------------------------------------
# W23 — running total (cumulative frame: ROWS UNBOUNDED PRECEDING)
# ---------------------------------------------------------------------------
@register(
    "w23_running_total",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS running_spend
    FROM orders
    """,
)
def w23_running_total(spark, sf_dir):
    """Cumulative spend per customer: one shuffle on the partition key;
    the frame accumulates within the sorted partition (exact decimal sum,
    deterministic tie-break on the order key)."""
    o = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast(_DEC)).over(w)
        .cast("double").alias("running_spend"),
    )


# ---------------------------------------------------------------------------
# W24 — order-gap analysis (LAG frame: consecutive-row deltas)
# ---------------------------------------------------------------------------
@register(
    "w24_order_gaps",
    oracle="""
    WITH g AS (
        SELECT o_custkey, o_orderkey,
               CAST(o_orderdate AS DATE) AS d,
               lag(CAST(o_orderdate AS DATE)) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ) AS prev_d
        FROM orders
    )
    SELECT o_custkey, o_orderkey,
           CAST(d - prev_d AS BIGINT) AS days_since_prev
    FROM g WHERE prev_d IS NOT NULL
    """,
)
def w24_order_gaps(spark, sf_dir):
    """Days between consecutive orders per customer (lag over the same
    sorted partition as w23 — at scale these share one exchange)."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    d = F.to_date("o_orderdate")
    prev = F.lag(d).over(w)
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            F.datediff(d, prev).cast("long").alias("days_since_prev"),
        )
        .filter(F.col("days_since_prev").isNotNull())
    )


# ---------------------------------------------------------------------------
# W25 — CUBE aggregation (all grouping-set combinations)
# ---------------------------------------------------------------------------
@register(
    "w25_cube_counts",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           count(*) AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def w25_cube_counts(spark, sf_dir):
    """CUBE = all 2^k grouping sets in one pass: Spark expands the sets
    map-side and aggregates once (complements w5's ROLLUP)."""
    o = _t(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast(_DEC)).cast("double").alias("revenue"),
    )


# ---------------------------------------------------------------------------
# W26 — excess-stock suppliers (TPC-H Q20 shape: semi join on HAVING agg)
# ---------------------------------------------------------------------------
@register(
    "w26_excess_stock_suppliers",
    oracle="""
    SELECT s.s_suppkey, s.s_name
    FROM supplier s
    WHERE s.s_suppkey IN (
        SELECT l.l_suppkey
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        WHERE p.p_size <= 5
        GROUP BY l.l_suppkey
        HAVING sum(CAST(l.l_quantity AS DECIMAL(18,2))) > 500
    )
    """,
)
def w26_excess_stock_suppliers(spark, sf_dir):
    """Q20: the IN-subquery decorrelates to agg → HAVING → left-semi join;
    the tiny survivor set broadcasts into the supplier scan."""
    s = _t(spark, sf_dir, "supplier")
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_size") <= 5)
    heavy = (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .groupBy("l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast(_DEC)).alias("__q"))
        .filter(F.col("__q") > 500)
        .select(F.col("l_suppkey").alias("s_suppkey"))
    )
    return s.join(heavy, "s_suppkey", "left_semi").select("s_suppkey", "s_name")


# ---------------------------------------------------------------------------
# W27 — customer order-count distribution (TPC-H Q13: outer join + histogram)
# ---------------------------------------------------------------------------
@register(
    "w27_order_count_histogram",
    oracle="""
    WITH per_cust AS (
        SELECT c.c_custkey, count(o.o_orderkey) AS c_count
        FROM customer c
        LEFT OUTER JOIN orders o
          ON c.c_custkey = o.o_custkey
         AND o.o_orderpriority <> '5-LOW'
        GROUP BY 1
    )
    SELECT c_count, count(*) AS custdist
    FROM per_cust
    GROUP BY 1
    """,
)
def w27_order_count_histogram(spark, sf_dir):
    """Q13: LEFT OUTER join keeps order-less customers (count=0 bucket),
    then a second tiny aggregation histograms the counts — two shuffles,
    the second over at most max-order-count distinct keys."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "5-LOW")
    per_cust = (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left_outer")
        .groupBy(c["c_custkey"])
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


# ---------------------------------------------------------------------------
# W28 — cross-nation trade volume (TPC-H Q7: two-role dimension join)
# ---------------------------------------------------------------------------
@register(
    "w28_nation_pair_volume",
    oracle="""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE)
               AS volume
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
    JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
    WHERE n1.n_nationkey <> n2.n_nationkey
    GROUP BY 1, 2
    """,
)
def w28_nation_pair_volume(spark, sf_dir):
    """Q7: the same dimension (nation) joins in two roles — supplier side
    and customer side — so it broadcasts twice under different aliases;
    the inequality filters cross-border trade only."""
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    joined = (
        li.join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(F.col("n1_key") != F.col("n2_key"))
    )
    return joined.groupBy("supp_nation", "cust_nation").agg(
        F.sum(
            F.col("l_extendedprice").cast(_DEC)
            * (F.lit(1) - F.col("l_discount").cast(_DEC))
        ).cast("double").alias("volume")
    )


# ---------------------------------------------------------------------------
# W29 — GROUPING SETS (explicit multi-granularity aggregation)
# ---------------------------------------------------------------------------
@register(
    "w29_grouping_sets",
    oracle="""
    SELECT coalesce(l_returnflag, 'ALL') AS rflag,
           coalesce(l_linestatus, 'ALL') AS lstatus,
           count(*) AS n,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    """,
)
def w29_grouping_sets(spark, sf_dir):
    """Explicit GROUPING SETS — the multi-granularity report between w5's
    ROLLUP and w25's CUBE: detail, per-flag, and grand-total rows out of
    ONE pass (Spark expands the sets into a single Expand+hash-agg plan —
    one scan, one shuffle, never one job per granularity). The grouping
    marker is COALESCE to 'ALL' (fixture columns are never null), which
    sidesteps engine-specific GROUPING_ID bit orders."""
    li = _t(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("w29_lineitem")
    return spark.sql(f"""
        SELECT coalesce(l_returnflag, 'ALL') AS rflag,
               coalesce(l_linestatus, 'ALL') AS lstatus,
               count(*) AS n,
               CAST(sum(CAST(l_quantity AS {_DEC})) AS DOUBLE) AS sum_qty
        FROM w29_lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    """)


# ---------------------------------------------------------------------------
# W30 — bounded-frame moving average (ROWS BETWEEN k PRECEDING)
# ---------------------------------------------------------------------------
@register(
    "w30_moving_average",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE)
                / count(*) OVER w AS DOUBLE) AS avg_recent_spend
    FROM orders
    WINDOW w AS (
        PARTITION BY o_custkey
        ORDER BY o_orderdate, o_orderkey
        ROWS BETWEEN 3 PRECEDING AND CURRENT ROW
    )
    """,
)
def w30_moving_average(spark, sf_dir):
    """Trailing 4-order moving average per customer — the bounded ROWS
    frame w23's running total doesn't exercise. Explicit sum/count (both
    exact over the frame) instead of AVG, so the division is the only
    float op and both engines compute it bit-identically."""
    o = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-3, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        (
            F.sum(F.col("o_totalprice").cast(_DEC)).over(w).cast("double")
            / F.count("*").over(w)
        ).cast("double").alias("avg_recent_spend"),
    )


@register(
    "w31_range_join",
    oracle="""
    WITH pts AS (
        SELECT DISTINCT
               strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS order_date,
               date_diff('day', DATE '1970-01-01',
                         CAST(o_orderdate AS DATE)) AS d
        FROM orders
        WHERE CAST(o_orderdate AS DATE) >= DATE '1995-03-01'
          AND CAST(o_orderdate AS DATE) <  DATE '1995-04-01'
    ),
    iv AS (
        SELECT date_diff('day', DATE '1970-01-01',
                         CAST(l_shipdate AS DATE)) AS s,
               date_diff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE))
                   + 3 + l_orderkey % 25 AS e
        FROM lineitem
    )
    SELECT p.order_date, CAST(count(iv.s) AS BIGINT) AS n_transit
    FROM pts p LEFT JOIN iv ON p.d BETWEEN iv.s AND iv.e
    GROUP BY 1
    """,
)
def w31_range_join(spark, sf_dir):
    """Point-in-interval join via the binned range-join operator: how many
    line items were in transit (derived window [shipdate, shipdate + 3 +
    orderkey%25 days] — deterministic arithmetic both engines replay) on
    each distinct March-1995 order date. The oracle replays the SEMANTICS
    with a plain BETWEEN join; the Spark plan is the scale shape — an
    equi-join on 16-day bins with the exact range predicate as the join's
    residual, never BroadcastNestedLoop (locked in tests/test_range_join.py
    and the registry-wide no-cartesian audit)."""
    from debezium_spark.operators.range_join import range_join

    epoch = F.lit("1970-01-01")
    o = _t(spark, sf_dir, "orders")
    pts = (
        o.filter(
            (F.col("o_orderdate") >= "1995-03-01")
            & (F.col("o_orderdate") < "1995-04-01")
        )
        .select(
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
            F.datediff(F.col("o_orderdate").cast("date"), epoch).alias("d"),
        )
        .distinct()
    )
    li = _t(spark, sf_dir, "lineitem")
    iv = li.select(
        F.datediff(F.col("l_shipdate").cast("date"), epoch).alias("s"),
        (
            F.datediff(F.col("l_shipdate").cast("date"), epoch)
            + F.lit(3)
            + F.pmod(F.col("l_orderkey"), F.lit(25))
        ).alias("e"),
    )
    joined = range_join(
        pts, iv, left_point="d", right_start="s", right_end="e",
        bin_width=16, how="left",
    )
    return joined.groupBy("order_date").agg(
        F.count("s").alias("n_transit")
    )


# ---------------------------------------------------------------------------
# W32 — waiting suppliers (TPC-H Q21: the semi + anti join composition).
# The schema has no receipt/commit dates, so "late" is defined as shipping
# more than 45 days after the order date — same predicate on both engines.
# ---------------------------------------------------------------------------
@register(
    "w32_waiting_suppliers",
    oracle="""
    SELECT s.s_suppkey, s.s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
    JOIN orders o ON o.o_orderkey = l1.l_orderkey
    WHERE o.o_orderstatus = 'F'
      AND l1.l_shipdate > o.o_orderdate + INTERVAL 45 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o3.o_orderdate + INTERVAL 45 DAY)
    GROUP BY 1, 2
    ORDER BY numwait DESC, s_suppkey
    LIMIT 20
    """,
)
def w32_waiting_suppliers(spark, sf_dir):
    """TPC-H Q21 (suppliers who kept 'F' orders waiting): reference SQL
    runs the literal EXISTS / NOT-EXISTS pair; the Spark plan decorrelates
    both subqueries into a TWO-LEVEL aggregation — per (order, supplier)
    first (late flag + late-row count), then per order (supplier count =
    the EXISTS, late-supplier count = the NOT EXISTS, the sole late
    supplier and its late rows). Deliberately NOT two countDistinct()s on
    one groupBy: that plans an Expand (gid) tripling every joined lineitem
    row before the partial agg; the two plain hash aggs combine map-side,
    and at scale the second agg's order-key clustering is already
    satisfied by the first's (subset of (order, supplier)), so a
    sort-merge lineitem⋈orders feeds both without a new exchange.
    Qualifying orders collapse to (suppkey, late_rows); a tiny per-supplier
    sum, the 25-row supplier dim broadcast, and TakeOrderedAndProject keep
    the top 20 (never a global sort). Count semantics match Q21's: one per
    LATE LINEITEM ROW of the waiting supplier, not one per order."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    s = _t(spark, sf_dir, "supplier")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr(
        "INTERVAL 45 DAYS"
    )
    flagged = li.join(o, li["l_orderkey"] == o["o_orderkey"]).select(
        "l_orderkey", "l_suppkey", late.alias("__late")
    )
    per_supp = flagged.groupBy("l_orderkey", "l_suppkey").agg(
        F.max("__late").alias("__supp_late"),
        F.sum(F.when(F.col("__late"), 1).otherwise(0)).alias("__rows"),
    )
    per_order = per_supp.groupBy("l_orderkey").agg(
        F.count("*").alias("__nsupp"),
        F.sum(F.col("__supp_late").cast("int")).alias("__nlate_supp"),
        F.max(
            F.when(F.col("__supp_late"), F.col("l_suppkey"))
        ).alias("s_suppkey"),
        F.sum(
            F.when(F.col("__supp_late"), F.col("__rows")).otherwise(0)
        ).alias("__late_rows"),
    )
    waiting = per_order.filter(
        (F.col("__nsupp") >= 2) & (F.col("__nlate_supp") == 1)
    )
    return (
        waiting.groupBy("s_suppkey")
        .agg(F.sum("__late_rows").cast("long").alias("numwait"))
        .join(F.broadcast(s.select("s_suppkey", "s_name")), "s_suppkey")
        .orderBy(F.desc("numwait"), "s_suppkey")
        .limit(20)
        .select("s_suppkey", "s_name", "numwait")
    )


# ---------------------------------------------------------------------------
# W33 — national market share (TPC-H Q8: nested-ratio star join)
# ---------------------------------------------------------------------------
@register(
    "w33_market_share",
    oracle="""
    WITH vol AS (
        SELECT CAST(year(o.o_orderdate) AS INT) AS o_year,
               CAST(l.l_extendedprice AS DECIMAL(18,2))
                 * (1 - CAST(l.l_discount AS DECIMAL(18,2))) AS volume,
               n2.n_name AS supp_nation
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey AND p.p_type = 'STANDARD'
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n2 ON n2.n_nationkey = s.s_nationkey
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n1 ON n1.n_nationkey = c.c_nationkey
        JOIN region r ON r.r_regionkey = n1.n_regionkey
                     AND r.r_name = 'AMERICA'
    )
    SELECT o_year,
           CAST(CAST(sum(CASE WHEN supp_nation = 'NATION_3' THEN volume
                         ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
                / CAST(sum(volume) AS DOUBLE) AS DOUBLE) AS mkt_share
    FROM vol
    GROUP BY o_year
    """,
)
def w33_market_share(spark, sf_dir):
    """Q8: NATION_3's share of STANDARD-part revenue sold into AMERICA, by
    order year. Dimension chain (part filter, supplier→nation, customer→
    nation→region) broadcasts; the two fact-side joins (lineitem⋈orders on
    the order key, then the customer filter) are the only shuffles; exact
    decimal sums, double only at the final ratio — numerator and
    denominator in ONE aggregation, never two passes."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "STANDARD")
    s = _t(spark, sf_dir, "supplier")
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nationkey"),
        F.col("n_name").alias("supp_nation"),
    )
    o = _t(spark, sf_dir, "orders")
    n1 = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    cust_am = (
        _t(spark, sf_dir, "customer")
        .join(
            F.broadcast(
                n1.join(
                    F.broadcast(r),
                    n1["n_regionkey"] == r["r_regionkey"],
                ).select("n_nationkey")
            ),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select(F.col("c_custkey").alias("o_custkey"))
    )
    vol = F.col("l_extendedprice").cast(_DEC) * (
        F.lit(1) - F.col("l_discount").cast(_DEC)
    )
    fact = (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .join(
            F.broadcast(s.join(F.broadcast(n2), "s_nationkey")),
            li["l_suppkey"] == F.col("s_suppkey"),
        )
        .select("l_orderkey", vol.alias("volume"), "supp_nation")
        .join(o, F.col("l_orderkey") == o["o_orderkey"])
        .join(cust_am, "o_custkey", "left_semi")
        .select(
            F.year("o_orderdate").cast("int").alias("o_year"),
            "volume",
            "supp_nation",
        )
    )
    target = F.when(
        F.col("supp_nation") == "NATION_3", F.col("volume")
    ).otherwise(F.lit(0).cast(_DEC))
    return fact.groupBy("o_year").agg(
        (
            F.sum(target).cast("double") / F.sum("volume").cast("double")
        ).cast("double").alias("mkt_share")
    )


# ---------------------------------------------------------------------------
# W34 — Q11 shape: group value vs a global-threshold scalar subquery
# ---------------------------------------------------------------------------
@register(
    "w34_important_parts",
    oracle="""
    WITH v AS (
        SELECT l_partkey,
               sum(CAST(l_extendedprice AS DECIMAL(18,2))
                   * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS value
        FROM lineitem l
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
                     AND n.n_name = 'NATION_5'
        GROUP BY 1
    )
    SELECT l_partkey AS p_partkey, CAST(value AS DOUBLE) AS part_value
    FROM v
    WHERE CAST(value AS DOUBLE) >
          (SELECT CAST(sum(value) AS DOUBLE) FROM v) * 0.002
    """,
)
def w34_important_parts(spark, sf_dir):
    """Q11 (important stock identification), re-based on lineitem revenue
    since the fixtures carry no partsupp: parts whose NATION_5-supplied
    revenue exceeds 0.2% of that nation's total. The scalar subquery
    decorrelates to a 1-row broadcast joined onto the PER-PART aggregate
    (2,000 rows), not the fact table — the fact scans once, the grouped
    result is reused for both sides via a self-agg, and no
    single-partition window appears anywhere. Exact decimal sums; double
    only at the threshold compare and display."""
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_5")
    supp5 = s.join(
        F.broadcast(n), s["s_nationkey"] == n["n_nationkey"]
    ).select("s_suppkey")
    val = F.col("l_extendedprice").cast(_DEC) * (
        F.lit(1) - F.col("l_discount").cast(_DEC)
    )
    per_part = (
        li.join(F.broadcast(supp5), li["l_suppkey"] == F.col("s_suppkey"))
        .groupBy(F.col("l_partkey").alias("p_partkey"))
        .agg(F.sum(val).alias("__value"))
    )
    total = per_part.agg(
        (F.sum("__value").cast("double") * F.lit(0.002)).alias("__thresh")
    )
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("__value").cast("double") > F.col("__thresh"))
        .select(
            "p_partkey", F.col("__value").cast("double").alias("part_value")
        )
    )


# ---------------------------------------------------------------------------
# W35 — Q15 shape: top supplier(s) by windowed revenue, ties kept
# ---------------------------------------------------------------------------
@register(
    "w35_top_supplier",
    oracle="""
    WITH rev AS (
        SELECT l_suppkey AS s_suppkey,
               sum(CAST(l_extendedprice AS DECIMAL(18,2))
                   * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS total_rev
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1996-04-01'
        GROUP BY 1
    )
    SELECT r.s_suppkey, s.s_name, CAST(r.total_rev AS DOUBLE) AS total_revenue
    FROM rev r JOIN supplier s USING (s_suppkey)
    WHERE r.total_rev = (SELECT max(total_rev) FROM rev)
    """,
)
def w35_top_supplier(spark, sf_dir):
    """Q15 (top supplier): the supplier(s) with maximum revenue over one
    shipdate quarter — ALL ties kept, per the spec's revenue-view + max
    subquery formulation (a top-1-by-row_number would silently drop
    ties). The quarter filter pushes into the scan; one supplier-key agg
    builds the revenue view; the max is a 1-row broadcast onto that
    2,000-row view (never the fact table); equality compares exact
    decimals, so ties are exact, not float-luck."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    val = F.col("l_extendedprice").cast(_DEC) * (
        F.lit(1) - F.col("l_discount").cast(_DEC)
    )
    rev = li.groupBy(F.col("l_suppkey").alias("s_suppkey")).agg(
        F.sum(val).alias("__rev")
    )
    mx = rev.agg(F.max("__rev").alias("__mx"))
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.join(F.broadcast(mx))
        .filter(F.col("__rev") == F.col("__mx"))
        .join(F.broadcast(s), "s_suppkey")
        .select(
            "s_suppkey",
            "s_name",
            F.col("__rev").cast("double").alias("total_revenue"),
        )
    )


# ---------------------------------------------------------------------------
# W36 — product-type profit (TPC-H Q9 shape: LIKE-filtered 5-table join,
# nation × year profit). No partsupp in the fixtures, so supply cost is
# synthesized deterministically from the part's retail price.
# ---------------------------------------------------------------------------
@register(
    "w36_product_profit",
    oracle="""
    SELECT n.n_name AS nation,
           CAST(year(o.o_orderdate) AS INT) AS o_year,
           CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(18,2)))
                    - CAST(p.p_retailprice AS DECIMAL(18,2))
                      * CAST(0.6 AS DECIMAL(2,1))
                      * CAST(l.l_quantity AS DECIMAL(18,2)))
                AS DOUBLE) AS profit
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey AND p.p_type LIKE '%M%'
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    GROUP BY n.n_name, CAST(year(o.o_orderdate) AS INT)
    """,
)
def w36_product_profit(spark, sf_dir):
    """Q9: profit on parts whose type contains 'M' (MEDIUM/SMALL/ECONOMY/PROMO in these fixtures) by supplier nation and order year.
    Plan: part (LIKE-filtered) and supplier⋈nation broadcast into the
    lineitem scan; the single shuffle-join is lineitem⋈orders on the
    order key; ONE hash aggregation on (nation, year) with exact decimal
    profit terms (revenue minus synthesized unit cost × quantity — the
    fixtures carry no partsupp, so cost = 0.6 × retail price as EXACT
    decimal multiplication — no float rounding anywhere, so both engines
    agree bit-for-bit)."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_type").like("%M%"))
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nationkey"),
        F.col("n_name").alias("nation"),
    )
    o = _t(spark, sf_dir, "orders")
    cost = F.col("p_retailprice").cast(_DEC) * F.lit("0.6").cast(
        "decimal(2,1)"
    )
    profit_term = F.col("l_extendedprice").cast(_DEC) * (
        F.lit(1) - F.col("l_discount").cast(_DEC)
    ) - cost * F.col("l_quantity").cast(_DEC)
    fact = (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .join(
            F.broadcast(s.join(F.broadcast(n), "s_nationkey")),
            li["l_suppkey"] == F.col("s_suppkey"),
        )
        .select("l_orderkey", "nation", profit_term.alias("term"))
        .join(o, F.col("l_orderkey") == o["o_orderkey"])
        .select(
            "nation",
            F.year("o_orderdate").cast("int").alias("o_year"),
            "term",
        )
    )
    return fact.groupBy("nation", "o_year").agg(
        F.sum("term").cast("double").alias("profit")
    )


# ---------------------------------------------------------------------------
# W37 — supplier-count distribution with exclusion (TPC-H Q16 shape:
# count-distinct per part group, anti-joined against a complaint list).
# ---------------------------------------------------------------------------
@register(
    "w37_part_supplier_counts",
    oracle="""
    SELECT p.p_brand, p.p_size,
           count(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
                AND p.p_brand <> 'Brand#1' AND p.p_size IN (1, 4, 7)
    WHERE l.l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_suppkey % 10 = 0
    )
    GROUP BY p.p_brand, p.p_size
    """,
)
def w37_part_supplier_counts(spark, sf_dir):
    """Q16: how many distinct suppliers stock each (brand, size) group,
    excluding a complaint list. Plan: the filtered part dim and the
    (tiny) exclusion list broadcast — the exclusion is a broadcast
    left-anti join, never a NOT-IN null-aware subquery plan; one
    count-distinct hash aggregation on the group key (Spark expands it
    to a two-level agg with map-side partials)."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1") & F.col("p_size").isin(1, 4, 7)
    )
    excl = (
        _t(spark, sf_dir, "supplier")
        .filter(F.col("s_suppkey") % 10 == 0)
        .select(F.col("s_suppkey").alias("l_suppkey"))
    )
    return (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .join(F.broadcast(excl), "l_suppkey", "left_anti")
        .groupBy("p_brand", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )
