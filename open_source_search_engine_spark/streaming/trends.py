"""Windowed term-frequency trends over the crawl stream (Structured
Streaming: watermark + windowed aggregation with late-data handling).

The reference has no streaming analytics; this is the Spark-native
surface a crawl pipeline needs on top of ingest: per-time-window term
counts over arriving pages, with event time = warc_ts (crawl time) and
a watermark bounding how late a page may arrive before its window
finalizes. Append output mode emits each (window, token) row exactly
once, when the watermark passes the window end — so the sink is an
incrementally-growing, never-rewritten parquet table that a 1000-node
consumer can tail.

All per-row work is JVM-side (lower/split/explode on the ``text``
column — space-joined tokens by the webtext invariant); the stateful
window aggregation is Spark's own watermark-managed store, sized by
(windows in flight x distinct tokens), not by stream length.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..sources.webtext import WEBTEXT_DOCID_SCHEMA, WEBTEXT_SCHEMA


def streaming_term_trends(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    out_dir: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
    with_doc_id: bool = True,
    available_now: bool = True,
):
    """Start (and with available_now=True, drain) the trends stream:
    webtext parquet drops in ``input_dir`` -> finalized
    (window_start, window_end, tok, n) rows appended under ``out_dir``.
    Returns the query handle."""
    schema = WEBTEXT_DOCID_SCHEMA if with_doc_id else WEBTEXT_SCHEMA
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 64)
        .parquet(input_dir)
    )
    toks = stream.select(
        "warc_ts",
        F.explode(F.split(F.lower(F.col("text")), " ")).alias("tok"),
    ).where(F.col("tok") != "")
    agg = (
        toks.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window), "tok")
        .count()
        .select(F.col("window.start").alias("window_start"),
                F.col("window.end").alias("window_end"),
                "tok", F.col("count").alias("n"))
    )
    writer = (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.start()
