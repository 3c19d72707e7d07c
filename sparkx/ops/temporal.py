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


def pivot_event_counts(events: DataFrame) -> DataFrame:
    """Per-user event_type count pivot.  Explicit value list → no extra
    distinct-discovery job (required at scale)."""
    types = ["click", "view", "purchase", "signup", "error"]
    aggs = [
        F.sum(F.when(F.col("event_type") == t, 1).otherwise(0)).alias(f"n_{t}")
        for t in types
    ]
    return events.groupBy("user_id").agg(*aggs)
