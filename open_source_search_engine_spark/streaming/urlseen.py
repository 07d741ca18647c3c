"""Stateful cross-batch URL dedup (crawl-frontier first-seen filter).

Crawl streams re-discover the same URL endlessly (link loops, sitemap
refreshes); the indexer must admit each URL once. The reference does
this with Spiderdb's doledb/waiting-tree dedup.

Spark-native implementation: ``foreachBatch`` + a persisted state
table. Each micro-batch anti-joins its URLs (xxhash64, JVM-side)
against the accumulated ``_seen`` table, appends the survivors to the
output, and appends their hashes to ``_seen`` under a
``batch=<id>`` directory — so a replayed batch OVERWRITES its own
directories and the operator is exactly-once across restarts, the same
idempotent-generation pattern as ``streaming.ingest``. State is a
parquet table (hash per distinct URL) that joins distributed — never a
driver-side set.

Note: this was first built on ``applyInPandasWithState`` /
``transformWithStateInPandas``; both are unusable in this environment
(the former crashes the python worker in pyspark 4.1.2 local mode, the
latter needs google.protobuf which isn't installed), and the
foreachBatch formulation is strictly more scale-friendly anyway: the
per-host state lives in a joinable table instead of per-key
memory-resident GroupState.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources.webtext import WEBTEXT_DOCID_SCHEMA


def streaming_url_seen(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    out_dir: str,
    available_now: bool = True,
):
    """First-seen URL filter over webtext drops: emits (host, url,
    doc_id) for never-before-seen URLs only, across micro-batches and
    restarts. Returns the query handle."""
    seen_dir = os.path.join(out_dir, "_seen")
    data_dir = os.path.join(out_dir, "data")

    stream = (
        spark.readStream.schema(WEBTEXT_DOCID_SCHEMA)
        .option("maxFilesPerTrigger", 64)
        .parquet(input_dir)
    )

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        rows = (
            batch_df.select(
                F.regexp_extract(
                    "url", r"^[A-Za-z][A-Za-z0-9+.-]*://([^/]+)", 1)
                .alias("host"),
                "url", "doc_id",
                F.xxhash64("url").alias("_h"))
            # first occurrence within the batch: smallest doc_id wins
            .withColumn("_rn", F.row_number().over(
                Window.partitionBy("_h")
                .orderBy(F.col("doc_id").asc())))
            .where(F.col("_rn") == 1)
            .drop("_rn")
        )
        try:
            seen = spark.read.parquet(seen_dir).where(
                F.col("batch") != batch_id)
        except Exception:
            seen = None
        if seen is not None:
            rows = rows.join(seen.select(F.col("_h")), "_h", "left_anti")
        rows = rows.cache()
        (rows.select("host", "url", "doc_id")
         .write.mode("overwrite")
         .parquet(os.path.join(data_dir, f"batch={batch_id}")))
        (rows.select("_h", "host")
         .withColumn("batch", F.lit(int(batch_id)))
         .write.mode("overwrite")
         .parquet(os.path.join(seen_dir, f"batch={batch_id}")))
        rows.unpersist()

    writer = (
        stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.start()


def seen_output(spark: SparkSession, out_dir: str) -> DataFrame:
    """The accumulated first-seen rows (host, url, doc_id)."""
    return spark.read.option("basePath", os.path.join(out_dir, "data")) \
        .parquet(os.path.join(out_dir, "data"))
