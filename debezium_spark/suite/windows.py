"""Event-time windowed aggregation queries (tumbling / sliding / session).

The reference has no event-time semantics (SURVEY §2.6); Structured
Streaming provides them natively and this engine exposes them over the
change stream's event time. Batch registrations here prove value semantics
against DuckDB; the watermark/late-data *streaming* behavior is covered by
tests/test_event_time.py.

The event timestamp is rebuilt from the fixture's nanos column
(`ts_utc = timestamp_micros(ts div 1000)`, sources/changefeed.py).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from debezium_spark.sources.changefeed import events_with_ts
from debezium_spark.suite import register

_DEC = "decimal(18,6)"


# ---------------------------------------------------------------------------
# E1 — tumbling windows
# ---------------------------------------------------------------------------
@register(
    "e1_tumbling_window",
    oracle="""
    SELECT strftime(date_trunc('day', CAST(ts AS TIMESTAMP)),
                    '%Y-%m-%d %H:%M:%S') AS win_start,
           event_type,
           count(*) AS n,
           CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def e1_tumbling_window(spark, sf_dir):
    ev = events_with_ts(spark, sf_dir)
    win = F.window(F.col("ts_utc"), "1 day")
    return ev.groupBy(win, "event_type").agg(
        F.count("*").alias("n"),
        F.sum(F.col("value").cast(_DEC)).cast("double").alias("sum_value"),
    ).select(
        F.date_format("window.start", "yyyy-MM-dd HH:mm:ss").alias("win_start"),
        "event_type",
        "n",
        "sum_value",
    )


# ---------------------------------------------------------------------------
# E2 — sliding windows (1 day every 12 hours → each event in 2 windows)
# ---------------------------------------------------------------------------
@register(
    "e2_sliding_window",
    oracle="""
    WITH base AS (
        SELECT CAST(ts AS TIMESTAMP) AS t, value FROM events
    ),
    assigned AS (
        SELECT to_timestamp(
                   (epoch(t)::BIGINT // 43200) * 43200 - s.off
               ) AS win_start,
               t, value
        FROM base,
             (SELECT unnest([0, 43200]) AS off) s
        WHERE epoch(to_timestamp((epoch(t)::BIGINT // 43200) * 43200 - s.off))
              + 86400 > epoch(t)
    )
    SELECT strftime(win_start AT TIME ZONE 'UTC', '%Y-%m-%d %H:%M:%S') AS win_start,
           count(*) AS n,
           CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
    FROM assigned
    GROUP BY 1
    """,
)
def e2_sliding_window(spark, sf_dir):
    """window(ts, '1 day', '12 hours'): each event lands in the two sliding
    windows covering it; the oracle materializes the same two bucket starts
    arithmetically."""
    ev = events_with_ts(spark, sf_dir)
    win = F.window(F.col("ts_utc"), "1 day", "12 hours")
    return ev.groupBy(win).agg(
        F.count("*").alias("n"),
        F.sum(F.col("value").cast(_DEC)).cast("double").alias("sum_value"),
    ).select(
        F.date_format("window.start", "yyyy-MM-dd HH:mm:ss").alias("win_start"),
        "n",
        "sum_value",
    )


# ---------------------------------------------------------------------------
# E3 — session windows (gaps-and-islands equivalence)
# ---------------------------------------------------------------------------
@register(
    "e3_session_window",
    oracle="""
    WITH e AS (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS t FROM events
    ),
    flagged AS (
        SELECT user_id, t,
               CASE WHEN t - lag(t) OVER (PARTITION BY user_id ORDER BY t)
                         > INTERVAL 1 HOUR
                    OR lag(t) OVER (PARTITION BY user_id ORDER BY t) IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM e
    ),
    sess AS (
        SELECT user_id, t,
               sum(new_session) OVER (PARTITION BY user_id ORDER BY t
                   ROWS UNBOUNDED PRECEDING) AS sid
        FROM flagged
    )
    SELECT user_id,
           strftime(min(t), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
           strftime(max(t) + INTERVAL 1 HOUR, '%Y-%m-%d %H:%M:%S.%f') AS session_end,
           count(*) AS n_events
    FROM sess
    GROUP BY user_id, sid
    """,
)
def e3_session_window(spark, sf_dir):
    """session_window(ts, '1 hour') per user — Spark's native session
    semantics (start = first event, end = last event + gap) checked against
    the classic gaps-and-islands SQL formulation."""
    ev = events_with_ts(spark, sf_dir)
    sw = F.session_window(F.col("ts_utc"), "1 hour")
    return ev.groupBy(sw, "user_id").agg(F.count("*").alias("n_events")).select(
        "user_id",
        F.date_format("session_window.start", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
            "session_start"
        ),
        F.date_format("session_window.end", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
            "session_end"
        ),
        "n_events",
    )


# ---------------------------------------------------------------------------
# E4 — hierarchical time-bucket rollup (hypertable continuous-aggregate shape)
# ---------------------------------------------------------------------------
def _e4_level_sql(level: str) -> str:
    return f"""
    SELECT '{level}' AS level,
           strftime(date_trunc('{level}', CAST(ts AS TIMESTAMP)),
                    '%Y-%m-%d %H:%M:%S') AS bucket,
           event_type,
           count(*) AS n,
           CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sum_value,
           min(value) AS min_value,
           max(value) AS max_value
    FROM events
    GROUP BY 2, 3"""


@register(
    "e4_hierarchical_rollup",
    oracle=" UNION ALL ".join(
        _e4_level_sql(lv) for lv in ("hour", "day", "week")
    ),
)
def e4_hierarchical_rollup(spark, sf_dir):
    """Hypertable-style continuous aggregate: hour partials from raw, day
    merged from hour, week merged from day — raw data scanned ONCE. The
    oracle computes every level directly from raw, so a green row proves
    the partial-merge telescopes exactly (decimal sums are associative;
    count/min/max trivially mergeable)."""
    from debezium_spark.operators.rollup import hierarchical_rollup

    ev = events_with_ts(spark, sf_dir)
    out = hierarchical_rollup(
        ev,
        ts_col="ts_utc",
        value_col="value",
        dims=["event_type"],
        levels=("hour", "day", "week"),
    )
    return out.select(
        "level",
        F.date_format("bucket", "yyyy-MM-dd HH:mm:ss").alias("bucket"),
        "event_type",
        "n",
        "sum_value",
        "min_value",
        "max_value",
    )


# ---------------------------------------------------------------------------
# E5 — ordered funnel (sequential-pattern detection: view -> click -> purchase)
# ---------------------------------------------------------------------------
@register(
    "e5_funnel",
    oracle="""
    WITH e AS (
        SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS t
        FROM events
        WHERE event_type IN ('view', 'click', 'purchase')
    ),
    s1 AS (
        SELECT user_id, min(t) AS t1 FROM e
        WHERE event_type = 'view' GROUP BY 1
    ),
    s2 AS (
        SELECT e.user_id, min(e.t) AS t2
        FROM e JOIN s1 USING (user_id)
        WHERE e.event_type = 'click' AND e.t >= s1.t1
        GROUP BY 1
    ),
    s3 AS (
        SELECT e.user_id, min(e.t) AS t3
        FROM e JOIN s2 USING (user_id)
        WHERE e.event_type = 'purchase' AND e.t >= s2.t2
        GROUP BY 1
    )
    SELECT 1 AS step, 'view' AS step_type, count(*) AS n_users FROM s1
    UNION ALL
    SELECT 2, 'click', count(*) FROM s2
    UNION ALL
    SELECT 3, 'purchase', count(*) FROM s3
    """,
)
def e5_funnel(spark, sf_dir):
    """Ordered funnel over the event stream: users reaching view, then
    click at-or-after their first view, then purchase at-or-after that
    click — step k at the EARLIEST qualifying event (min-based, so
    timestamp ties are deterministic). The engine does it in ONE user-key
    aggregation (pre-filtered to funnel types, per-user sorted array
    program — no join per step); the oracle is the textbook k-fold
    join-per-step SQL, proving the single-pass plan computes the same
    funnel."""
    from debezium_spark.operators.funnel import funnel_report

    ev = events_with_ts(spark, sf_dir)
    return funnel_report(ev, ["view", "click", "purchase"])


# ---------------------------------------------------------------------------
# E6 — time-series pattern search: z-normalized correlation of each user's
# value subsequences against a query pattern (the matrix-profile/UCR-style
# subsequence similarity primitive, in its one-window distributed form).
# ---------------------------------------------------------------------------
_E6_Q = (3, 1, 4, 1)  # query pattern
_E6_N = len(_E6_Q)
_E6_QSUM = sum(_E6_Q)
_E6_QSS = sum(q * q for q in _E6_Q)


@register(
    "e6_ts_pattern_search",
    oracle=f"""
    WITH s AS (
        SELECT user_id, event_id AS pos,
               CAST(floor(value * 100) AS BIGINT) AS v
        FROM events
    ),
    w AS (
        SELECT user_id, pos, v,
               lead(v, 1) OVER u AS v1,
               lead(v, 2) OVER u AS v2,
               lead(v, 3) OVER u AS v3
        FROM s WINDOW u AS (PARTITION BY user_id ORDER BY pos)
    ),
    m AS (
        SELECT user_id, pos,
               v + v1 + v2 + v3 AS sv,
               v*v + v1*v1 + v2*v2 + v3*v3 AS ssv,
               v*{_E6_Q[0]} + v1*{_E6_Q[1]} + v2*{_E6_Q[2]}
                 + v3*{_E6_Q[3]} AS dot
        FROM w WHERE v3 IS NOT NULL
    ),
    c AS (
        SELECT user_id, pos,
               CAST({_E6_N} * dot - sv * {_E6_QSUM} AS DOUBLE)
               / sqrt(CAST(({_E6_N} * ssv - sv * sv)
                           * CAST({_E6_N} * {_E6_QSS}
                                  - {_E6_QSUM} * {_E6_QSUM} AS BIGINT)
                           AS DOUBLE)) AS corr
        FROM m WHERE {_E6_N} * ssv - sv * sv > 0
    ),
    r AS (
        SELECT user_id, pos, corr,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY corr DESC, pos) AS rk
        FROM c
    )
    SELECT user_id, pos AS best_pos, round(corr, 6) AS corr_r
    FROM r WHERE rk = 1
    """,
)
def e6_ts_pattern_search(spark, sf_dir):
    """Subsequence similarity search over event-value series: every
    length-4 window of each user's sequence scores z-normalized
    correlation against a fixed query pattern, and the best-matching
    offset per user wins (ties to the earliest). This is the
    matrix-profile/UCR primitive in its distributed one-pass form:
    running sums via lead() inside the user partition — NO
    per-subsequence explode (that would be an n-fold row blowup) — and
    the correlation assembled from INTEGER sums (cents-quantized
    values), so numerator/denominator are exact and the single
    division + sqrt is bit-identical in any IEEE engine. Scale shape:
    one shuffle on user_id shared by both windows; pattern constants
    fold into codegen."""
    u = Window.partitionBy("user_id").orderBy("pos")
    s = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "user_id",
        F.col("event_id").alias("pos"),
        F.floor(F.col("value") * 100).cast("long").alias("v"),
    )
    w = s.select(
        "user_id", "pos", "v",
        F.lead("v", 1).over(u).alias("v1"),
        F.lead("v", 2).over(u).alias("v2"),
        F.lead("v", 3).over(u).alias("v3"),
    ).filter(F.col("v3").isNotNull())
    sv = F.col("v") + F.col("v1") + F.col("v2") + F.col("v3")
    ssv = (F.col("v") * F.col("v") + F.col("v1") * F.col("v1")
           + F.col("v2") * F.col("v2") + F.col("v3") * F.col("v3"))
    dot = (F.col("v") * _E6_Q[0] + F.col("v1") * _E6_Q[1]
           + F.col("v2") * _E6_Q[2] + F.col("v3") * _E6_Q[3])
    m = w.select(
        "user_id", "pos", sv.alias("sv"), ssv.alias("ssv"),
        dot.alias("dot"),
    )
    qvar = _E6_N * _E6_QSS - _E6_QSUM * _E6_QSUM
    den = (_E6_N * F.col("ssv") - F.col("sv") * F.col("sv")) * F.lit(qvar)
    c = m.filter(
        _E6_N * F.col("ssv") - F.col("sv") * F.col("sv") > 0
    ).select(
        "user_id", "pos",
        ((_E6_N * F.col("dot") - F.col("sv") * _E6_QSUM).cast("double")
         / F.sqrt(den.cast("double"))).alias("corr"),
    )
    rk = Window.partitionBy("user_id").orderBy(
        F.col("corr").desc(), F.col("pos")
    )
    return (
        c.withColumn("rk", F.row_number().over(rk))
        .filter(F.col("rk") == 1)
        .select(
            "user_id",
            F.col("pos").alias("best_pos"),
            F.round("corr", 6).alias("corr_r"),
        )
    )


# ---------------------------------------------------------------------------
# W38 — cohort retention (product-analytics matrix: users bucketed by
# first-seen week x weeks-since-cohort activity)
# ---------------------------------------------------------------------------
@register(
    "w38_cohort_retention",
    oracle="""
    WITH up AS (
        -- epoch_ns over the raw column, no µs TIMESTAMP cast: on a
        -- TIMESTAMP_NS-vintage fixture the cast would truncate to µs
        -- BEFORE the week division while the Spark side buckets the full
        -- raw nanos, splitting an event within 1µs of a week boundary
        -- (r12 ADVICE)
        SELECT DISTINCT user_id,
               epoch_ns(ts) // 604800000000000 AS period
        FROM events
    ),
    c AS (SELECT user_id, min(period) AS cohort FROM up GROUP BY user_id)
    SELECT c.cohort AS cohort_period,
           up.period - c.cohort AS week_offset,
           CAST(count(*) AS BIGINT) AS n_users
    FROM up JOIN c USING (user_id)
    GROUP BY 1, 2
    """,
)
def w38_cohort_retention(spark, sf_dir):
    """Cohort retention over the events stream: each user's cohort is the
    7-day period of their first event — pure INTEGER nanosecond
    arithmetic (epoch-ns div one week), never a timestamp→date cast,
    which would shift bucket boundaries under a non-UTC driver session
    timezone and disagree with any independent engine; the matrix counts
    users active at each week offset from their cohort.

    Spark shape beats the textbook 3-shuffle form (distinct + first-seen
    agg + join back): ONE user-keyed aggregation computes the cohort and
    the distinct period set together (collect_set is bounded by the data's
    week span, not its event count), then one matrix aggregation over the
    exploded per-user rows. Two shuffles total at any scale."""
    from debezium_spark.sources.changefeed import events_with_ts

    ev = events_with_ts(spark, sf_dir)
    period = F.expr("ts_ns div 604800000000000")
    per_user = ev.groupBy("user_id").agg(
        F.min(period).alias("cohort"),
        F.collect_set(period).alias("periods"),
    )
    return (
        per_user.select(
            F.col("cohort").alias("cohort_period"),
            F.explode("periods").alias("p"),
        )
        .groupBy(
            "cohort_period",
            (F.col("p") - F.col("cohort_period")).alias("week_offset"),
        )
        .agg(F.count("*").alias("n_users"))
    )
