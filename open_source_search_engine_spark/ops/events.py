"""Event-stream analytics operators over an events table
(event_id, ts, user_id, event_type, value, props).

The batch complements of the streaming modules (streaming/trends.py
windowed counts, streaming/dedupstream.py stateful gates):
sessionization is THE canonical operation Spark has no built-in for —
it needs ordered per-user state, which in batch is a user-keyed window
(lag → new-session flag → running sum) and in streaming would be
``applyInPandasWithState`` with a per-user last-ts state row. The
batch form below is one shuffle (partitionBy user) and two window
passes over each user's events.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sessionize(events: DataFrame, gap_seconds: int = 1800,
               user_col: str = "user_id", ts_col: str = "ts",
               id_col: str = "event_id") -> DataFrame:
    """Gap-based sessionization: within a user's time-ordered events, a
    new session starts when the gap from the previous event exceeds
    ``gap_seconds`` (whole seconds — timestamps compare at second
    resolution so the rule is engine-exact). Returns the input plus
    ``session_idx`` (1-based per user). Ordering ties break on
    ``event_id`` for determinism.

    Scale shape: one shuffle on user_id; both window passes (lag, then
    running sum of the new-session flags) run inside the same sort, so
    Catalyst executes a single Window node chain per user partition —
    no second exchange."""
    from pyspark.sql import Window

    w = (Window.partitionBy(user_col)
         .orderBy(F.col(ts_col).asc(), F.col(id_col).asc()))
    # unix_timestamp (session tz is pinned UTC in session.py) ==
    # DuckDB epoch(); TIMESTAMP_NTZ has no direct bigint cast in Spark 4
    es = F.unix_timestamp(F.col(ts_col))
    prev = F.lag(es).over(w)
    new_s = F.when(
        prev.isNull() | (es - prev > gap_seconds), 1).otherwise(0)
    return events.withColumn(
        "session_idx",
        F.sum(new_s).over(
            w.rowsBetween(Window.unboundedPreceding, 0)).cast("int"))


def session_rollup(events: DataFrame, gap_seconds: int = 1800,
                   user_col: str = "user_id", ts_col: str = "ts",
                   id_col: str = "event_id") -> DataFrame:
    """Per-session aggregate over ``sessionize``'s output:
    (user_id, session_idx, n_events, first_ts, last_ts,
    duration_secs, total_value). One additional groupBy on
    (user, session) — same partitioning as the sessionize shuffle, so
    AQE typically coalesces it into the existing exchange."""
    s = sessionize(events, gap_seconds, user_col, ts_col, id_col)
    return (s.groupBy(user_col, "session_idx")
            .agg(F.count("*").alias("n_events"),
                 F.min(ts_col).alias("first_ts"),
                 F.max(ts_col).alias("last_ts"),
                 (F.max(F.unix_timestamp(F.col(ts_col)))
                  - F.min(F.unix_timestamp(F.col(ts_col))))
                 .alias("duration_secs"),
                 F.round(F.sum("value"), 4).alias("total_value")))
