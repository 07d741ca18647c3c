"""Streaming percolation: stored-query alerts over the crawl stream.

The serving complement of ``query.percolate``: stored queries are
compiled ONCE (driver-side, broadcast tables reused by every
micro-batch), each arriving webtext micro-batch is percolated, and the
alert rows (query_id, doc_id, url, warc_ts) land under ``batch=<id>``
directories — a replayed batch overwrites its own directory, so the
sink is exactly-once across restarts (the idempotent-generation
pattern shared with streaming.ingest / urlseen / dedupstream). The
union of the batch outputs equals one batch percolation of the whole
input (pytest-pinned), because percolation is stateless per document —
no cross-batch state table needed at all.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..query.percolate import compile_stored_queries, percolate
from ..sources.webtext import WEBTEXT_DOCID_SCHEMA


def streaming_percolate(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    out_dir: str,
    queries: list[tuple[int, str]],
    available_now: bool = True,
):
    """Start (and with available_now=True, drain) the alert stream.
    Returns the query handle."""
    compiled = compile_stored_queries(spark, queries)
    stream = (
        spark.readStream.schema(WEBTEXT_DOCID_SCHEMA)
        .option("maxFilesPerTrigger", 64)
        .parquet(input_dir)
    )

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        hits = percolate(spark, batch_df, compiled)
        alerts = hits.join(
            batch_df.select("doc_id", "url", "warc_ts"), "doc_id")
        (alerts.select("query_id", "doc_id", "url", "warc_ts")
         .write.mode("overwrite")
         .parquet(os.path.join(out_dir, f"batch={batch_id}")))

    writer = (
        stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.start()


def alerts_output(spark: SparkSession, out_dir: str) -> DataFrame:
    """The accumulated alert rows (query_id, doc_id, url, warc_ts)."""
    return spark.read.parquet(out_dir).drop("batch")
