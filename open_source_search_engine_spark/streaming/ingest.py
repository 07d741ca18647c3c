"""Structured-Streaming incremental index ingest.

The reference has no streams — incrementality is re-crawl batches
feeding negative-diff metalists (SURVEY.md §2.6, XmlDoc.cpp:12290
getMetaList). The Spark-native generalization: watch a webtext drop
directory (or any streaming source) and fold each micro-batch into the
generational index as its own generation via ``foreachBatch``.

Exactly-once across restarts comes from two layers composing:
- the stream checkpoint makes batch ids replay-stable, and
- ``build_index(resume=True)`` is idempotent per generation (completed
  buckets are skipped via the per-bucket manifests),
so a replayed batch is a no-op — the streaming analog of the
resumable-build requirement in the north rule.

Query-side nothing changes: readers resolve generations newest-wins
(executor.IndexReader), and ``compact_index`` folds accumulated
micro-batch generations down to one.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

from ..config import DEFAULT_CONF, EngineConf
from ..index.build import build_index
from ..sources.webtext import WEBTEXT_DOCID_SCHEMA, WEBTEXT_SCHEMA

BATCH_GEN_BASE = 1_000  # stream generations live above manual ones


def stream_index(
    spark: SparkSession,
    input_dir: str,
    index_dir: str,
    checkpoint_dir: str,
    conf: EngineConf = DEFAULT_CONF,
    with_doc_id: bool = True,
    available_now: bool = True,
    min_to_merge: int | None = None,
):
    """Start (and with available_now=True, drain) a streaming ingest of
    webtext parquet files landing in input_dir. Returns the query handle.

    min_to_merge (optional) applies the RdbBase merge-scheduling policy
    after each folded batch (`index.build.maybe_compact`): when the
    live generation count reaches the threshold, generations compact to
    one — so a long-running stream keeps query-side k-way fan-in
    bounded, exactly like the reference's per-Rdb minToMerge
    (RdbBase.h:193). Compaction is itself idempotent (a replayed batch
    after a crash re-compacts to the same newest-wins state).
    """
    schema = WEBTEXT_DOCID_SCHEMA if with_doc_id else WEBTEXT_SCHEMA
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 64)
        .parquet(input_dir)
    )

    def fold_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        gen = BATCH_GEN_BASE + int(batch_id)
        build_index(spark, batch_df, index_dir, conf=conf, gen=gen,
                    resume=True)
        _register_gen(index_dir, gen)
        if min_to_merge is not None:
            from ..index.build import maybe_compact

            maybe_compact(spark, index_dir, min_to_merge=min_to_merge,
                          conf=conf)

    writer = (
        stream.writeStream.foreachBatch(fold_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.start()


def _register_gen(index_dir: str, gen: int) -> None:
    meta_path = os.path.join(index_dir, "_index_meta.json")
    with open(meta_path) as f:
        meta = json.load(f)
    if gen not in meta.get("gens", []):
        meta["gens"] = sorted(set(meta.get("gens", [])) | {gen})
        with open(meta_path, "w") as f:
            json.dump(meta, f)
