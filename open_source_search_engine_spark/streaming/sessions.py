"""Streaming gap-based sessionization — the stateful-streaming twin of
``ops/events.py sessionize``.

Canonical custom stateful operator: each user carries (last event
time, last session index) across micro-batches. Like the other
streaming modules this uses ``foreachBatch`` + a persisted newest-wins
state table rather than ``applyInPandasWithState`` (unusable in this
environment — see streaming/urlseen.py header — and the state table
joins distributed instead of living per-key in executor memory, which
is what you want at 10^9 users). Exactly-once across restarts: both
the output and the state land in ``batch=<id>`` directories that a
replayed batch OVERWRITES, and the state read excludes the current
batch id — the same idempotent-generation pattern as
streaming.ingest / urlseen / dedupstream.

Semantics match the batch operator whenever each user's events arrive
in time order across micro-batches (the usual log-stream property);
within a batch, ordering is (ts, event_id) exactly like the batch op.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

EVENTS_SCHEMA = ("event_id long, ts timestamp, user_id long, "
                 "event_type string, value double, props string")


def streaming_sessionize(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    out_dir: str,
    gap_seconds: int = 1800,
    available_now: bool = True,
):
    """Assign per-user session indices to an event stream; returns the
    query handle. Output rows land under ``<out_dir>/data`` with a
    ``session_idx`` column (1-based per user, continuous across
    micro-batches)."""
    state_dir = os.path.join(out_dir, "_state")
    data_dir = os.path.join(out_dir, "data")

    stream = (spark.readStream.schema(EVENTS_SCHEMA)
              .option("maxFilesPerTrigger", 64)
              .parquet(input_dir))

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        w = (Window.partitionBy("user_id")
             .orderBy(F.col("ts").asc(), F.col("event_id").asc()))
        b = batch_df.withColumn("_es", F.unix_timestamp(F.col("ts")))
        try:
            st = spark.read.parquet(state_dir).where(
                F.col("batch") != batch_id)
        except Exception:
            st = None
        if st is not None:
            stw = (Window.partitionBy("user_id")
                   .orderBy(F.col("batch").desc()))
            st = (st.withColumn("_rn", F.row_number().over(stw))
                  .where(F.col("_rn") == 1)
                  .select("user_id", "last_es", "last_idx"))
            b = b.join(st, "user_id", "left")
        else:
            b = (b.withColumn("last_es", F.lit(None).cast("long"))
                 .withColumn("last_idx", F.lit(None).cast("int")))
        # the first batch event chains off the persisted state; later
        # ones off their in-batch predecessor
        prev_eff = F.coalesce(F.lag("_es").over(w), F.col("last_es"))
        ns = F.when(prev_eff.isNull()
                    | (F.col("_es") - prev_eff > gap_seconds),
                    1).otherwise(0)
        b = (b.withColumn("_ns", ns)
             .withColumn(
                 "session_idx",
                 (F.coalesce(F.col("last_idx"), F.lit(0))
                  + F.sum("_ns").over(
                      w.rowsBetween(Window.unboundedPreceding, 0)))
                 .cast("int"))
             .cache())
        (b.select("event_id", "ts", "user_id", "event_type", "value",
                  "props", "session_idx")
         .write.mode("overwrite")
         .parquet(os.path.join(data_dir, f"batch={batch_id}")))
        lastw = (Window.partitionBy("user_id")
                 .orderBy(F.col("ts").desc(), F.col("event_id").desc()))
        (b.withColumn("_rn", F.row_number().over(lastw))
         .where(F.col("_rn") == 1)
         .select("user_id", F.col("_es").alias("last_es"),
                 F.col("session_idx").alias("last_idx"))
         .withColumn("batch", F.lit(int(batch_id)))
         .write.mode("overwrite")
         .parquet(os.path.join(state_dir, f"batch={batch_id}")))
        b.unpersist()

    writer = (stream.writeStream.foreachBatch(fold)
              .option("checkpointLocation", checkpoint_dir))
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.start()


def session_output(spark: SparkSession, out_dir: str) -> DataFrame:
    """All sessionized events accumulated so far."""
    d = os.path.join(out_dir, "data")
    return spark.read.option("basePath", d).parquet(d)
