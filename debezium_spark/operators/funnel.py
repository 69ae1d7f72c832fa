"""Sequential-pattern (funnel) detection over an event stream.

The reference engine has no sequence semantics (SURVEY §2.6 — its event
model is row-level CDC); this is the MATCH_RECOGNIZE-shaped analytics
operator every event pipeline bolts onto the change stream: "of the users
who did A, how many later did B, and later still C?".

Semantics (the standard ordered-funnel definition): step k is reached at
the EARLIEST event of step k's type at-or-after the step k-1 reach time;
step 1 at the earliest step-1 event overall. ``t_k = min{t : type=s_k,
t >= t_{k-1}}`` — deterministic under timestamp ties because only minima
are taken, never "the next row".
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def funnel_steps(
    events: DataFrame,
    steps: Sequence[str],
    *,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts_utc",
) -> DataFrame:
    """Per-user funnel reach times: one row per user holding
    ``t1..t{len(steps)}`` (NULL from the first step not reached).

    Plan shape (100 TB): the stream is pre-filtered to the funnel's event
    types BEFORE the shuffle (for a 3-type funnel over a many-type stream
    that is the big reduction), then ONE hash aggregation on the user key
    collects each user's (ts, type) pairs; the step scan is a per-row
    array program over that sorted list — no join per step, no window
    function, no second shuffle. Per-user state is bounded by that user's
    funnel-type event count; a time-sliced pre-filter bounds it further
    when users are long-lived. This beats the textbook k-fold
    join-per-step plan (k shuffles) at any scale.
    """
    steps = list(steps)
    if len(steps) < 2:
        raise ValueError("a funnel needs at least 2 steps")
    if len(set(steps)) != len(steps):
        raise ValueError(f"funnel steps must be distinct, got {steps!r}")
    evs = (
        # NULL timestamps carry no ordering information and must not occupy
        # the "earliest" slot (array_sort places a null-t struct first and
        # F.get(hits, 0)['t'] would null the whole funnel even when a real
        # timestamped event exists) — drop them before the aggregation,
        # matching min(t)'s NULL-skipping in the SQL formulation.
        events.filter(F.col(type_col).isin(steps) & F.col(ts_col).isNotNull())
        .groupBy(F.col(user_col).alias("user"))
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col(ts_col).alias("t"),
                        F.col(type_col).alias("s"),
                    )
                )
            ).alias("__evs")
        )
    )

    def first_at_or_after(prev: Column, step: str) -> Column:
        hits = F.filter(
            F.col("__evs"),
            lambda e: (e["s"] == step)
            & (F.lit(True) if prev is None else (e["t"] >= prev)),
        )
        # F.get: NULL on empty, never an out-of-bounds error (ANSI-safe)
        return F.get(hits, 0)["t"]

    out = evs
    prev: Column | None = None
    for i, s in enumerate(steps, start=1):
        col = first_at_or_after(prev, s)
        out = out.withColumn(f"t{i}", col)
        prev = F.col(f"t{i}")
    return out.select(
        F.col("user").alias(user_col), *[f"t{i}" for i in range(1, len(steps) + 1)]
    )


def funnel_report(
    events: DataFrame,
    steps: Sequence[str],
    *,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts_utc",
) -> DataFrame:
    """Aggregate funnel: ``(step, step_type, n_users)`` — users reaching
    each step under :func:`funnel_steps` semantics. The per-user frame
    reduces to one global row (count of non-NULL t_k), then unpivots to
    one row per step via ``stack`` — no extra shuffle beyond the per-user
    aggregation."""
    per_user = funnel_steps(
        events, steps, user_col=user_col, type_col=type_col, ts_col=ts_col
    )
    counts = per_user.agg(
        *[
            F.count(f"t{i}").alias(f"n{i}")
            for i in range(1, len(steps) + 1)
        ]
    )
    # Step names are interpolated into stack()'s SQL literals — escape
    # embedded single quotes so a name can't break (or inject into) the expr.
    stack_args = ", ".join(
        "{}, '{}', n{}".format(i, s.replace("'", "''"), i)
        for i, s in enumerate(steps, start=1)
    )
    return counts.select(
        F.expr(
            f"stack({len(steps)}, {stack_args}) AS (step, step_type, n_users)"
        )
    ).select(F.col("step").cast("int"), "step_type", "n_users")


def funnel_steps_stream(
    events: DataFrame,
    steps: Sequence[str],
    *,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts_utc",
    idle_timeout_ms: int | None = None,
) -> DataFrame:
    """Streaming funnel: per-user reach times maintained across
    micro-batches with ``applyInPandasWithState`` — the stream form of
    :func:`funnel_steps`, same ``t_k = min{t : type=s_k, t >= t_{k-1}}``
    semantics. Emits one row per user per micro-batch in which their
    funnel PROGRESSED: ``(user, step_reached, t1..tk)`` — the latest row
    per user is the batch operator's result.

    Exactness contract: each batch's events fold in ``(ts, step)`` order
    (step index breaks timestamp ties so an equal-timestamp successor
    still qualifies under ``>=``), which reproduces the batch semantics
    exactly as long as per-user arrival order across batches is
    non-decreasing in event time — the log-order guarantee a CDC feed
    carries. A cross-batch straggler (an earlier-timestamped step
    arriving after later steps folded) can only improve future progress,
    never corrupt recorded times. NULL timestamps are dropped, matching
    the batch operator.

    State is one row of ``len(steps)`` epoch-micro longs per user — tiny
    but user-cardinality-bound, so production streams set
    ``idle_timeout_ms`` (the funnel observation window, SURVEY §7.3's
    unbounded-state rule): a user idle past it is evicted silently; a
    returning user restarts their funnel."""
    import pandas as pd
    from pyspark.sql import types as T
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    steps = list(steps)
    if len(steps) < 2:
        raise ValueError("a funnel needs at least 2 steps")
    if len(set(steps)) != len(steps):
        raise ValueError(f"funnel steps must be distinct, got {steps!r}")
    k = len(steps)

    user_type = events.schema[user_col].dataType
    out_schema = T.StructType(
        [
            T.StructField("user", user_type),
            T.StructField("step_reached", T.IntegerType()),
            *[T.StructField(f"t{i}", T.TimestampType()) for i in range(1, k + 1)],
        ]
    )
    state_schema = T.StructType(
        [T.StructField(f"u{i}", T.LongType()) for i in range(1, k + 1)]
    )

    step_idx = F.lit(None).cast("int")
    for i, s in enumerate(steps):
        step_idx = F.when(F.col(type_col) == s, F.lit(i)).otherwise(step_idx)
    prepared = events.filter(
        F.col(type_col).isin(steps) & F.col(ts_col).isNotNull()
    ).select(
        F.col(user_col).alias("user"),
        step_idx.alias("step"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("us"),
    )

    def fold(key, pdfs, state: GroupState):
        (user,) = key
        if idle_timeout_ms is not None and state.hasTimedOut:
            state.remove()  # observation window closed; no emission
            return
        ts = list(state.get) if state.exists else [None] * k
        before = list(ts)
        batch = pd.concat(list(pdfs), ignore_index=True)
        if len(batch):
            batch = batch.sort_values(["us", "step"])
            for us, step in zip(batch["us"], batch["step"]):
                i = int(step)
                if ts[i] is not None:
                    continue
                if i == 0 or (ts[i - 1] is not None and us >= ts[i - 1]):
                    ts[i] = int(us)
        if ts != before:
            state.update(tuple(ts))
            reached = sum(1 for t in ts if t is not None)
            row = {"user": [user], "step_reached": [reached]}
            for i in range(1, k + 1):
                v = ts[i - 1]
                # tz-aware so Arrow preserves the instant under any
                # spark.sql.session.timeZone (a naive pandas timestamp is
                # read in session-local time and would shift by the offset)
                row[f"t{i}"] = [
                    pd.Timestamp(v, unit="us", tz="UTC")
                    if v is not None
                    else pd.NaT
                ]
            yield pd.DataFrame(row)
        if idle_timeout_ms is not None:
            state.setTimeoutDuration(idle_timeout_ms)

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if idle_timeout_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return prepared.groupBy("user").applyInPandasWithState(
        fold,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=timeout,
    )


def funnel_steps_stream_event_time(
    events: DataFrame,
    steps: Sequence[str],
    *,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts_utc",
    watermark_delay: str = "10 minutes",
    horizon_ms: int = 3_600_000,
) -> DataFrame:
    """Out-of-order-tolerant streaming funnel: the event-time variant of
    :func:`funnel_steps_stream` for non-CDC feeds with no log-order
    guarantee. A straggler (an earlier-timestamped step arriving after
    later steps) RE-FOLDS the user's funnel, so e.g. a step-1 event
    landing a batch after its step-2 event still completes the funnel —
    the log-order variant would drop that progress.

    Mechanics: per user the state keeps (a) the finalized reach times
    folded from events already below the watermark and (b) a live buffer
    of events at-or-above it. Every batch re-folds ``final ∪ live`` in
    event-time order (the batch operator's exact semantics), emits on
    progress CHANGE, then compacts: once the watermark passes time W, no
    event below W can arrive, so sub-W decisions are final — fired
    events are absorbed into the finalized times and unfired sub-W
    events can never fire later (their missing predecessor can only be
    set to a LATER time), so both leave the buffer. State is therefore
    bounded by the watermark delay × per-user event rate, not by stream
    length; ``horizon_ms`` of event-time idleness evicts the user
    (EventTimeTimeout), closing the observation window.

    Exactness contract: equals the batch operator over all non-dropped
    events — arrival order is irrelevant as long as events beat the
    watermark (Spark drops later ones before the stateful operator, the
    standard bounded-lateness trade)."""
    import pandas as pd
    from pyspark.sql import types as T
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    steps = list(steps)
    if len(steps) < 2:
        raise ValueError("a funnel needs at least 2 steps")
    if len(set(steps)) != len(steps):
        raise ValueError(f"funnel steps must be distinct, got {steps!r}")
    k = len(steps)

    user_type = events.schema[user_col].dataType
    out_schema = T.StructType(
        [
            T.StructField("user", user_type),
            T.StructField("step_reached", T.IntegerType()),
            *[T.StructField(f"t{i}", T.TimestampType()) for i in range(1, k + 1)],
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("final_ts", T.ArrayType(T.LongType())),
            T.StructField("prev_ts", T.ArrayType(T.LongType())),
            T.StructField("ev_us", T.ArrayType(T.LongType())),
            T.StructField("ev_step", T.ArrayType(T.IntegerType())),
        ]
    )

    step_idx = F.lit(None).cast("int")
    for i, s in enumerate(steps):
        step_idx = F.when(F.col(type_col) == s, F.lit(i)).otherwise(step_idx)
    prepared = (
        events.withWatermark(ts_col, watermark_delay)
        .filter(F.col(type_col).isin(steps) & F.col(ts_col).isNotNull())
        .select(
            F.col(user_col).alias("user"),
            step_idx.alias("step"),
            F.unix_micros(F.col(ts_col).cast("timestamp")).alias("us"),
            F.col(ts_col).alias("__wm_ts"),  # keeps the watermark column
        )
    )

    def _fold(base: list, evs: list) -> list:
        cur = list(base)
        for us, st in evs:
            if cur[st] is not None:
                continue
            if st == 0 or (cur[st - 1] is not None and us >= cur[st - 1]):
                cur[st] = us
        return cur

    def fold(key, pdfs, state: GroupState):
        (user,) = key
        if state.hasTimedOut:
            state.remove()  # observation window closed
            return
        if state.exists:
            final_ts, prev, eus, estep = state.get
            final_ts, prev = list(final_ts), list(prev)
            live = list(zip(eus, estep))
        else:
            final_ts, prev, live = [None] * k, [None] * k, []
        batch = pd.concat(list(pdfs), ignore_index=True)
        live += [
            (int(us), int(st)) for us, st in zip(batch["us"], batch["step"])
        ]
        live.sort(key=lambda p: (p[0], p[1]))
        cur = _fold(final_ts, live)
        wm_us = state.getCurrentWatermarkMs() * 1000
        new_final = _fold(
            final_ts, [(us, st) for us, st in live if us < wm_us]
        )
        keep = [(us, st) for us, st in live if us >= wm_us]
        if cur != prev:
            reached = sum(1 for t in cur if t is not None)
            row = {"user": [user], "step_reached": [reached]}
            for i in range(1, k + 1):
                v = cur[i - 1]
                row[f"t{i}"] = [
                    pd.Timestamp(v, unit="us", tz="UTC")
                    if v is not None
                    else pd.NaT
                ]
            yield pd.DataFrame(row)
        state.update(
            (
                new_final,
                cur,
                [us for us, _ in keep],
                [st for _, st in keep],
            )
        )
        state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + horizon_ms)

    return prepared.groupBy("user").applyInPandasWithState(
        fold,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
