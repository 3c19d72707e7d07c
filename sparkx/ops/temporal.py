"""Temporal / event-stream operators: sessionization, as-of join, pivot.

Standard large-scale event-pipeline operators the reference lacks but a
transcript/training-data engine needs (companions to W1's ordering window).
All native window/join expressions — one shuffle each on their natural key,
AQE-skew-safe, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SESSION_GAP_SEC = 1800  # 30 min


def sessionize(events: DataFrame, gap_sec: int = SESSION_GAP_SEC) -> DataFrame:
    """Classic gap-based sessionization: a new session starts when the gap to
    the previous event of the same user exceeds ``gap_sec``.  One shuffle on
    user_id; session ids are deterministic (user_id, session_idx)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("timestamp").cast("long") - F.lag(F.col("ts").cast("timestamp").cast("long")).over(w)
    is_new = F.when(gap.isNull() | (gap > gap_sec), 1).otherwise(0)
    return events.withColumn(
        "session_idx", F.sum(is_new).over(w)
    )


def session_stats(events: DataFrame, gap_sec: int = SESSION_GAP_SEC) -> DataFrame:
    s = sessionize(events, gap_sec)
    return s.groupBy("user_id", "session_idx").agg(
        F.count("*").alias("n_events"),
        # integer micro-units → exact, summation-order-free (float sums are
        # nondeterministic across partitionings; never hash-compare them)
        F.sum(F.round(F.col("value") * 10000).cast("long")).alias("total_value_e4"),
        (F.max(F.col("ts").cast("timestamp").cast("long")) - F.min(F.col("ts").cast("timestamp").cast("long"))).alias(
            "duration_sec"
        ),
    )


def asof_join_native(left: DataFrame, right: DataFrame, key: str = "user_id",
                     ts: str = "ts") -> DataFrame:
    """As-of join (for each left row, the latest right row with
    right.ts <= left.ts, same key) without a pandas kernel: tag + union +
    last_value over an ordered window, then keep left rows.  One shuffle on
    the key; scales like any window aggregation.

    (The per-group ``pd.merge_asof`` applyInPandas variant is the fallback
    when the right side carries many columns; this union form keeps
    everything in codegen.)
    """
    l_ = left.select(
        F.col(key), F.col(ts), F.lit(1).alias("_side"),
        F.col("event_id").alias("l_event_id"), F.lit(None).cast("double").alias("_rv"),
    )
    r_ = right.select(
        F.col(key), F.col(ts), F.lit(0).alias("_side"),
        F.lit(None).cast("long").alias("l_event_id"), F.col("value").alias("_rv"),
    )
    u = l_.unionByName(r_)
    # right rows sort before left rows at equal ts (_side 0 < 1) → ties are
    # inclusive (right.ts == left.ts matches), matching ASOF JOIN semantics
    w = (
        Window.partitionBy(key)
        .orderBy(ts, "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = u.withColumn("asof_value", F.last("_rv", ignorenulls=True).over(w))
    return (
        matched.filter(F.col("_side") == 1)
        .select(key, F.col("l_event_id").alias("event_id"), ts, "asof_value")
    )


def funnel_conversion(
    events: DataFrame,
    steps: list[str],
    horizon_sec: int = 86_400,
) -> DataFrame:
    """Event-funnel analysis (the ClickHouse ``windowFunnel`` analog): per
    user, the deepest prefix of ``steps`` completed at strictly increasing
    event times with every step inside ``horizon_sec`` of the chain's FIRST
    step.  Output: one row per user — ``(user_id, max_step, converted)``
    with ``max_step`` in 0..len(steps) (0 = never performed step 1).

    Semantics are exact over ALL chain starts: every step-1 event opens a
    candidate chain, and for a FIXED start the earliest valid successor is
    optimal (exchange argument — any completing chain can be rewritten to
    the greedy one), so each subsequent step is one left join + min
    aggregate, and the per-user max over chain starts is exact.

    Execution: len(steps)−1 join+aggregate rounds, each keyed on user_id
    (the funnel's natural key — one shuffle per step, AQE-skew-splittable
    for hot users).  The chain frame never exceeds the step-1 event count
    (each round min-aggregates back down); the transient join fan-out is
    per-user step-1 × step-i events, the same bound every funnel engine
    pays.  Epoch seconds (ts → long, the sessionize convention) keep the
    time math in exact integers."""
    if len(steps) < 2:
        raise ValueError("need at least 2 funnel steps")
    ep = F.col("ts").cast("timestamp").cast("long")
    e = events.select("user_id", "event_type", ep.alias("_ep"))
    chains = e.filter(F.col("event_type") == steps[0]).select(
        "user_id", F.col("_ep").alias("t1")
    )
    for i, step in enumerate(steps[1:], start=2):
        prev, cur = f"t{i - 1}", f"t{i}"
        si = e.filter(F.col("event_type") == step).select(
            F.col("user_id").alias("_su"), "_ep"
        )
        keys = ["user_id"] + [f"t{j}" for j in range(1, i)]
        chains = (
            chains.join(
                si,
                (F.col("user_id") == F.col("_su"))
                & (F.col("_ep") > F.col(prev))
                & (F.col("_ep") <= F.col("t1") + F.lit(horizon_sec)),
                "left",
            )
            .groupBy(*keys)
            .agg(F.min("_ep").alias(cur))
        )
    depth = F.lit(1)
    for i in range(2, len(steps) + 1):
        depth = depth + F.col(f"t{i}").isNotNull().cast("int")
    per_user = (
        chains.withColumn("_depth", depth)
        .groupBy("user_id")
        .agg(F.max("_depth").cast("int").alias("max_step"))
    )
    users = events.select("user_id").distinct()
    return users.join(per_user, "user_id", "left").select(
        "user_id",
        F.coalesce(F.col("max_step"), F.lit(0)).cast("int").alias("max_step"),
        (F.coalesce(F.col("max_step"), F.lit(0)) == len(steps)).alias("converted"),
    )


def cohort_retention(events: DataFrame) -> DataFrame:
    """Weekly cohort retention — the second classic event-analytics table
    next to the funnel: users are cohorted by the week (Monday-truncated,
    identical in Spark and DuckDB) of their FIRST event, and each
    (cohort_week, week_offset) cell reports how many cohort members were
    active that week and the retained fraction.

    Execution: one aggregate for first-events (shuffle on user_id), one
    distinct over (user, week) — both map-side combinable — then a join
    back on user_id and a small (cohort, offset) aggregate; cohort sizes
    broadcast.  Engine parity: the cohort week is emitted as a 'yyyy-MM-dd'
    STRING (date/timestamp value-hash parity is the known trap), offsets
    are exact day diffs ``div`` 7, and the retained fraction is the
    tie-free 1e-4 integer-grid division."""
    wk = F.date_trunc("week", F.col("ts")).cast("date")
    cohorts = events.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("_cw")
    )
    active = events.select("user_id", wk.alias("_wk")).distinct()
    cells = (
        active.join(cohorts, "user_id")
        .select(
            "_cw",
            F.expr("datediff(_wk, _cw) div 7").cast("int").alias("week_offset"),
        )
        .groupBy("_cw", "week_offset")
        .agg(F.count("*").alias("n_active"))
    )
    sizes = cohorts.groupBy("_cw").agg(F.count("*").alias("cohort_size"))
    return (
        cells.join(F.broadcast(sizes), "_cw")
        .select(
            F.date_format("_cw", "yyyy-MM-dd").alias("cohort_week"),
            "week_offset",
            "n_active",
            "cohort_size",
            (F.expr("(n_active * 10000) div cohort_size") / 10000.0).alias(
                "retention"
            ),
        )
    )


def pivot_event_counts(events: DataFrame) -> DataFrame:
    """Per-user event_type count pivot.  Explicit value list → no extra
    distinct-discovery job (required at scale)."""
    types = ["click", "view", "purchase", "signup", "error"]
    aggs = [
        F.sum(F.when(F.col("event_type") == t, 1).otherwise(0)).alias(f"n_{t}")
        for t in types
    ]
    return events.groupBy("user_id").agg(*aggs)


def range_join(left: DataFrame, right: DataFrame, horizon_sec: int,
               left_ts: str = "ts", right_ts: str = "ts",
               left_id: str = "event_id",
               right_id: str = "event_id") -> DataFrame:
    """Time-range join WITHOUT an equality key: every (l, r) pair with
    ``r.ts`` in ``[l.ts, l.ts + horizon_sec]`` — e.g. "every purchase
    within 60 s after any error", correlating two event streams that share
    nothing but time.  Expressed naively (a theta join on the range
    predicate) Spark can only plan BroadcastNestedLoopJoin / cartesian —
    the canonical scale-killer.

    Bucketed rewrite: quantize epoch-microseconds by the horizon; a match
    forces ``bucket(r) ∈ {bucket(l), bucket(l)+1}``, so the left side
    explodes into those two probe buckets, the join becomes an EQUI-join
    on the bucket (shuffle-hash/SMJ, partition-parallel), and the exact
    range predicate filters the bounded candidate set.  Cost is
    O(|L| + |R| + pairs-within-2h) instead of |L|x|R|; the same rewrite
    at any horizon.  Lag is exact integer microseconds (``unix_micros``;
    DuckDB mirror ``epoch_us``), so output is engine-exact.  Parquet
    timestamps read as TIMESTAMP_NTZ are cast through TIMESTAMP first —
    identity under the UTC session zone (sparkx.session), and the cast is
    what ``unix_micros`` requires.

    Output: (l_id, r_id, lag_us), lag_us in [0, horizon*10^6]."""
    h_us = int(horizon_sec) * 1_000_000
    l = left.select(
        F.col(left_id).alias("l_id"),
        F.unix_micros(F.col(left_ts).cast("timestamp")).alias("l_us"),
    ).withColumn(
        "_pb",
        F.explode(
            F.array(
                F.expr(f"l_us div {h_us}"),
                F.expr(f"l_us div {h_us} + 1"),
            )
        ),
    )
    r = right.select(
        F.col(right_id).alias("r_id"),
        F.unix_micros(F.col(right_ts).cast("timestamp")).alias("r_us"),
    ).withColumn("_b", F.expr(f"r_us div {h_us}"))
    return (
        l.join(r, F.col("_pb") == F.col("_b"))
        .filter(
            (F.col("r_us") >= F.col("l_us"))
            & (F.col("r_us") <= F.col("l_us") + h_us)
        )
        .select(
            "l_id",
            "r_id",
            (F.col("r_us") - F.col("l_us")).alias("lag_us"),
        )
    )
