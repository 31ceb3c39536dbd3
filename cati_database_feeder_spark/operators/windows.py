"""Window-function operators (SURVEY.md §2.6 extension surface).

The reference's nearest relative is the per-file first-row peek
(add_q5011_2t.py:28). The engine exposes proper window analytics; the
headline one is ``first_occurrence_dedup`` — the declarative, in-batch
superset of the reference's cross-batch phone dedup (feeder.py:157-160).

Scale note: a window over ``partitionBy(k)`` shuffles once on k and
sorts within partitions — same cost class as a groupBy on k. Skewed
keys are AQE's problem for joins but NOT for windows, so callers should
pick partition keys with bounded cardinality per key (phone, user_id…),
which all of these do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def first_occurrence_dedup(df: DataFrame, keys: list[str], order: list) -> DataFrame:
    """Keep the first row per key by a deterministic order — the
    within-batch dedup the reference cannot do (SURVEY.md §2.6)."""
    w = Window.partitionBy(*keys).orderBy(*order)
    return (df.withColumn("__rn", F.row_number().over(w))
              .filter(F.col("__rn") == 1).drop("__rn"))


def rank_within_group(df: DataFrame, keys: list[str], order: list,
                      col_name: str = "rn") -> DataFrame:
    """row_number() over an explicit deterministic order."""
    w = Window.partitionBy(*keys).orderBy(*order)
    return df.withColumn(col_name, F.row_number().over(w))


def running_total(df: DataFrame, keys: list[str], order: list, value,
                  col_name: str = "running_total"):
    """Cumulative sum within group (rowsBetween unbounded→current)."""
    w = (Window.partitionBy(*keys).orderBy(*order)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return df.withColumn(col_name, F.sum(value).over(w))


def sessionize(events: DataFrame, gap_sec: int,
               user_col: str = "user_id", ts_col: str = "ts",
               tie_col: str = "event_id",
               value_col: str = "value") -> DataFrame:
    """Batch gap-based sessionization (extension E68): group each
    user's events into sessions separated by more than ``gap_sec``
    of inactivity — the batch twin of Structured Streaming's
    ``session_window`` (streaming/events.py), and the standard first
    step of behavioral / training-interaction analytics.

    Semantics: events ordered by (``ts_col``, ``tie_col``) within a
    user; a session BREAK happens where the gap from the previous
    event strictly exceeds ``gap_sec``; ``session_id`` is the 1-based
    running count of breaks (a cumulative sum over the same window the
    lag just used, so the shuffle+sort is paid ONCE and both window
    functions ride it — one Exchange in the plan). Gap arithmetic is
    integer MICROSECONDS (``unix_micros``): the fixtures carry
    sub-second timestamps, and float epoch seconds would make the
    break predicate engine-dependent at the boundary.

    Output: one row per (user, session) with ``n_events``, formatted
    session start/end, integer ``duration_sec`` (micros DIV 1e6), and
    the decimal-accumulated ``value_sum``.

    Scale shape: the window partitions by USER — millions of users
    parallelize across the cluster, and events-per-user is bounded by
    human behavior (a window partition is one user's history, not the
    corpus). A pathological machine user (bot emitting 10^9 events)
    would serialize its own partition only; the mitigation at that
    point is the same per-group hybrid used by cap_per_group
    (operators/sampling.py) with (user, day) as the composite key.
    The session aggregate afterwards is a plain groupBy with map-side
    partials on (user, session_id).
    """
    from cati_database_feeder_spark.operators.aggregates import dsum
    sess = sessionize_events(events, gap_sec, user_col, ts_col,
                             tie_col)
    return (sess.groupBy(user_col, "session_id")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.min(ts_col).alias("__t0"),
                 F.max(ts_col).alias("__t1"),
                 F.min("__us").alias("__us0"),
                 F.max("__us").alias("__us1"),
                 dsum(F.col(value_col)).alias("value_sum"))
            .select(user_col, "session_id", "n_events",
                    F.date_format("__t0", "yyyy-MM-dd HH:mm:ss")
                    .alias("session_start"),
                    F.date_format("__t1", "yyyy-MM-dd HH:mm:ss")
                    .alias("session_end"),
                    F.expr("(__us1 - __us0) DIV 1000000")
                    .cast("bigint").alias("duration_sec"),
                    "value_sum"))


def sessionize_events(events: DataFrame, gap_sec: int,
                      user_col: str = "user_id", ts_col: str = "ts",
                      tie_col: str = "event_id") -> DataFrame:
    """Event-level half of :func:`sessionize`: every input row plus
    ``session_id`` (1-based per user), ``__us`` (epoch micros) and
    ``__brk`` — the frame session-scoped analytics (funnels, dwell
    time, per-session features) start from. Both window functions
    share one (user)×(ts, tie) window spec → one Exchange."""
    w = Window.partitionBy(user_col).orderBy(ts_col, tie_col)
    us = F.unix_micros(F.col(ts_col))
    prev = F.lag(us).over(w)
    brk = F.when(prev.isNull()
                 | ((us - prev) > F.lit(int(gap_sec) * 1_000_000)),
                 F.lit(1)).otherwise(F.lit(0))
    cum = (Window.partitionBy(user_col).orderBy(ts_col, tie_col)
           .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (events
            .withColumn("__us", us)
            .withColumn("__brk", brk)
            .withColumn("session_id",
                        F.sum("__brk").over(cum).cast("bigint")))
