"""High-frequency-term shortcuts (HighFrequencyTermShortcuts.h:9-38;
consumed at list-fetch in Msg2.cpp:262-284).

The reference keeps a file of PRE-TRUNCATED posdb lists for stopword
termIds; when `m_useHighFrequencyTermCache` is on, Msg2 substitutes the
cached short list for the real (huge) termlist and never touches PosDB
for that term. This is an explicit approximation the reference accepts
for stopword-frequency terms: a doc outside the cached top slice cannot
be returned for that term.

Spark-native analog: ``build_hf_shortcuts`` decodes each hot term's
full postings ONCE at build time, keeps the top-C docs by the term's
build-time BM25 single-term score (idf is constant per term, so the
champion criterion reduces to tf / (tf + k1*(1 - b + b*dl/avgdl)) —
classic champion-list construction), re-encodes them with the segment
codec, and writes ``<index>/hf_shortcuts``. Query side, IndexReader
substitutes the shortcut rows for those termIds when
``conf.use_hf_shortcuts`` is on (off by default, like the reference's
conf gate — the driver correctness oracles run exact).

Scale shape: the only wide ops are one bucket-pruned decode of the hot
termlists and a salted two-phase top-C (no reducer ever holds a full
stopword termlist); the blob re-encode is per-term, bounded by C.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..config import DEFAULT_CONF, EngineConf

SUBDIR = "hf_shortcuts"


def build_hf_shortcuts(spark: SparkSession, index_dir: str,
                       conf: EngineConf = DEFAULT_CONF,
                       top_c: int = 50_000,
                       df_threshold: int | None = None) -> int:
    """Build the shortcut table for every hot term. Returns the number
    of terms shortcut. Requires a built index; overwrites any previous
    shortcut table."""
    from ..index.build import _encode_runs
    from ..query.executor import IndexReader

    rd = IndexReader(spark, index_dir, conf)
    n = rd.n_docs
    if df_threshold is None:
        df_threshold = min(conf.salt_df_threshold,
                           max(1000, int(conf.salt_df_frac * n)))
    hot = (rd.term_stats().where(F.col("df") >= int(df_threshold))
           .select("term_id").collect())
    hot_ids = [int(r["term_id"]) for r in hot]
    if not hot_ids:
        return 0
    avgdl = rd.avgdl
    k1, b = conf.k1, conf.b

    posts = rd.postings(hot_ids, with_positions=True)
    # champion score: tf/(tf + k1*(1-b+b*dl/avgdl)); idf is per-term
    # constant so it cannot change the within-term order
    denom = (F.col("tf") + F.lit(k1)
             * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.lit(avgdl)))
    posts = posts.withColumn("_cs", F.col("tf") / denom)

    from pyspark.sql import Window

    order = (F.col("_cs").desc(), F.col("doc_id").asc())
    posts = posts.withColumn(
        "_sl", F.pmod(F.col("doc_id"), F.lit(conf.n_salts)))
    w1 = Window.partitionBy("term_id", "_sl").orderBy(*order)
    w2 = Window.partitionBy("term_id").orderBy(*order)
    top = (posts.withColumn("_r1", F.row_number().over(w1))
           .where(F.col("_r1") <= top_c)
           .withColumn("_r2", F.row_number().over(w2))
           .where(F.col("_r2") <= top_c)
           .drop("_cs", "_sl", "_r1", "_r2"))

    n_buckets = conf.n_buckets
    n_salts = conf.n_salts

    def encode_term(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id", kind="mergesort")
        # repeat counts must mirror the DECODED position arrays, whose
        # length is the tf as stored (position cap applied at encode) —
        # derive from the arrays, never trust a separate column
        tfs = np.fromiter((len(p) for p in pdf["positions"]),
                          dtype=np.int64, count=len(pdf))
        npost = int(tfs.sum())
        term = np.repeat(pdf["term_id"].to_numpy(), tfs)
        doc = np.repeat(pdf["doc_id"].to_numpy(), tfs)
        dl = np.repeat(pdf["dl"].to_numpy(), tfs)
        rank = np.repeat(pdf["rank"].to_numpy(), tfs)
        pos = np.concatenate(
            [np.asarray(p, dtype=np.int64) for p in pdf["positions"]]) \
            if npost else np.empty(0, dtype=np.int64)
        ctx = np.concatenate(
            [np.asarray(c, dtype=np.int64) for c in pdf["ctxs"]]) \
            if npost else np.empty(0, dtype=np.int64)
        # same uniform doc-keyed salt as the segment encoder: shortcut
        # lists stay residue-disjoint per salt, so the multi-term WAND
        # path works unchanged over substituted champion lists
        doc64 = doc.astype(np.int64)
        salt = (doc64 % n_salts).astype(np.int64)
        order = np.lexsort((pos, doc64, salt))
        out = _encode_runs(term.astype(np.int64)[order], salt[order],
                           doc64[order], pos[order], ctx[order],
                           dl.astype(np.int64)[order],
                           rank.astype(np.int64)[order],
                           n_buckets)
        return out

    from ..index.build import SEGMENT_SCHEMA

    enc = top.groupBy("term_id").applyInPandas(
        encode_term, schema=SEGMENT_SCHEMA)
    (enc.write.mode("overwrite")
     .parquet(os.path.join(index_dir, SUBDIR)))
    return len(hot_ids)


def shortcut_ids(spark: SparkSession, index_dir: str) -> set[int]:
    """TermIds with a shortcut list (is_registered_term analog)."""
    p = os.path.join(index_dir, SUBDIR)
    if not os.path.exists(p):
        return set()
    try:
        rows = (spark.read.parquet(p).select("term_id")
                .distinct().collect())
    except Exception:
        return set()
    return {int(r["term_id"]) for r in rows}
