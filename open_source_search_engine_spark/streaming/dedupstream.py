"""Stateful cross-batch near-duplicate admission gate.

A streaming ingest pipeline must reject near-duplicate documents at
admission time — template pages, syndicated articles, re-crawls with
trivial edits — or the index (and any training corpus built from it)
fills with redundant content. The reference rejects exact re-crawls via
the content-hash nosplit terms (XmlDoc_Indexing.cpp:156) and doc-event
newest-wins; this operator generalizes that to NEAR duplicates in the
streaming path.

Semantics per micro-batch:

1. **Intra-batch**: MinHash-LSH near-dup pairs within the batch
   (``ops.dedup.minhash_lsh_pairs`` — exact-Jaccard verified); the
   higher doc_id of every verified pair is rejected.
2. **Cross-batch**: survivors' LSH band keys join against the
   accumulated band-key state of previously ADMITTED docs; colliding
   candidates are verified by MinHash signature agreement — the
   fraction of matching signature components is an unbiased estimator
   of Jaccard similarity (the classic MinHash property), so
   ``agree >= threshold`` approximates the batch operator's exact
   verify with state bounded at n_perm ints per admitted doc instead
   of its full shingle set. Matches are rejected.
3. Survivors append to the output, and their (band_key, doc_id) rows +
   signatures append to state under ``batch=<id>`` directories — a
   replayed batch overwrites its own directories, so the operator is
   exactly-once across restarts (the same idempotent-generation
   pattern as ``streaming.ingest`` / ``streaming.urlseen``).

Scale shape: state lives in two parquet tables that join DISTRIBUTED
(band-key equality join + signature-row join) — never a driver-side
set; per-batch cost is the batch's banding plus one join per table.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..ops.dedup import band_key_array, minhash_lsh_pairs, minhash_signatures
from ..sources.webtext import WEBTEXT_DOCID_SCHEMA


def streaming_near_dup_filter(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    out_dir: str,
    n: int = 3,
    n_perm: int = 32,
    band_rows: int = 4,
    threshold: float = 0.5,
    available_now: bool = True,
):
    """Admit only docs that are not near-duplicates of any earlier
    admitted doc (within or across micro-batches). Emits (doc_id, url,
    text) per admitted doc; returns the query handle."""
    bands_dir = os.path.join(out_dir, "_bands")
    sigs_dir = os.path.join(out_dir, "_sigs")
    data_dir = os.path.join(out_dir, "data")
    sig_cols = [f"sig_{i}" for i in range(n_perm)]

    stream = (
        spark.readStream.schema(WEBTEXT_DOCID_SCHEMA)
        .option("maxFilesPerTrigger", 64)
        .parquet(input_dir)
    )

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        docs = batch_df.select("doc_id", "url", "text")
        # 1. intra-batch: exact-verified near-dup pairs; doc_a < doc_b
        #    by construction, so dropping every doc_b keeps the
        #    smallest member of each dup chain
        pairs = minhash_lsh_pairs(docs, n=n, threshold=threshold,
                                  n_perm=n_perm, band_rows=band_rows)
        surv = docs.join(
            pairs.select(F.col("doc_b").alias("doc_id")).distinct(),
            "doc_id", "left_anti")
        sigs = minhash_signatures(surv, n=n, n_perm=n_perm)
        # 2. cross-batch: band-key collision against admitted state,
        #    verified by signature agreement >= threshold
        state_bands = state_sigs = None
        try:
            state_bands = spark.read.parquet(bands_dir).where(
                F.col("batch") != batch_id)
            state_sigs = spark.read.parquet(sigs_dir).where(
                F.col("batch") != batch_id)
        except Exception:
            pass
        if state_bands is not None and state_sigs is not None:
            new_bands = sigs.select(
                "doc_id",
                F.explode(band_key_array(n_perm, band_rows))
                .alias("band_key"))
            cand = (new_bands
                    .join(state_bands
                          .select("band_key",
                                  F.col("doc_id").alias("_old")),
                          "band_key")
                    .select("doc_id", "_old").distinct())
            old_sigs = state_sigs.select(
                F.col("doc_id").alias("_old"),
                *[F.col(c).alias(f"_o{i}")
                  for i, c in enumerate(sig_cols)])
            agree = sum(
                (F.col(f"sig_{i}") == F.col(f"_o{i}")).cast("int")
                for i in range(n_perm)) / F.lit(float(n_perm))
            dup_new = (cand.join(sigs, "doc_id").join(old_sigs, "_old")
                       .where(agree >= threshold)
                       .select("doc_id").distinct())
            surv = surv.join(dup_new, "doc_id", "left_anti")
            sigs = sigs.join(dup_new, "doc_id", "left_anti")
        sigs = sigs.cache()
        # 3. idempotent per-batch state + output appends
        (surv.write.mode("overwrite")
         .parquet(os.path.join(data_dir, f"batch={batch_id}")))
        (sigs.select(
            "doc_id",
            F.explode(band_key_array(n_perm, band_rows))
            .alias("band_key"))
         .withColumn("batch", F.lit(int(batch_id)))
         .write.mode("overwrite")
         .parquet(os.path.join(bands_dir, f"batch={batch_id}")))
        (sigs.withColumn("batch", F.lit(int(batch_id)))
         .write.mode("overwrite")
         .parquet(os.path.join(sigs_dir, f"batch={batch_id}")))
        sigs.unpersist()

    writer = (
        stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.start()


def admitted_output(spark: SparkSession, out_dir: str) -> DataFrame:
    """The accumulated admitted rows (doc_id, url, text)."""
    data_dir = os.path.join(out_dir, "data")
    return spark.read.option("basePath", data_dir).parquet(data_dir)
