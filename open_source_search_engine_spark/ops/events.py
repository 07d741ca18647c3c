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


def funnel(events: DataFrame, steps: "list[str]",
           user_col: str = "user_id", ts_col: str = "ts",
           type_col: str = "event_type") -> DataFrame:
    """Ordered funnel analysis: for each user, how far they progressed
    through ``steps`` — step i+1 counts only when it occurs STRICTLY
    after the user's earliest completion of step i (the standard
    product-analytics funnel rule). Returns (user_id, steps_completed,
    step1_ts .. stepN_ts) for every user in the events frame, null ts
    for uncompleted steps.

    Strictness compares at second resolution (engine-exact epoch
    seconds); same-second step events do not advance the funnel —
    define sub-second ordering on (ts, event_id) upstream if the
    source can emit them.

    Scale shape: one filtered min-aggregate per step, each keyed on
    user_id — k co-partitioned aggregates + k-1 joins on the same key,
    so after the first shuffle the rest are exchange-free. No windows,
    no per-user state."""
    users = events.select(F.col(user_col).alias("user_id")).distinct()
    es = F.unix_timestamp(F.col(ts_col))
    out = users
    prev_ts = None
    for i, step in enumerate(steps):
        step_ev = (events.where(F.col(type_col) == step)
                   .select(F.col(user_col).alias("user_id"),
                           es.alias("_es")))
        if prev_ts is not None:
            step_ev = (step_ev.join(out.select("user_id", prev_ts),
                                    "user_id")
                       .where(F.col("_es") > F.col(prev_ts))
                       .select("user_id", "_es"))
        agg = (step_ev.groupBy("user_id")
               .agg(F.min("_es").alias(f"step{i + 1}_ts")))
        out = out.join(agg, "user_id", "left")
        prev_ts = f"step{i + 1}_ts"
    done = None
    for i in range(len(steps)):
        c = F.when(F.col(f"step{i + 1}_ts").isNotNull(), 1).otherwise(0)
        done = c if done is None else done + c
    return out.withColumn("steps_completed", done.cast("int"))
