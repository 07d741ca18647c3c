"""Trainable language identification — Cavnar & Trenkle 1994
("N-Gram-Based Text Categorization"), the classic rank-order profile
classifier behind most pre-neural langid tools (textcat, an ancestor
of the reference's Language.cpp tables). Unlike the fixed stopword
heuristic in ops.textstats.detect_language, this TRAINS from a labeled
corpus:

  train:    per-language character-trigram counts over space-padded
            words → rank by (count desc, gram asc) → keep top-k.
            One (lang, gram) aggregation; profiles are k rows/language.
  classify: per-doc trigram counts → per-doc top-k ranks (one per-doc
            sort — the same cost class as tokenization) → join the
            broadcast profile table → out-of-place distance
            Σ |doc_rank − profile_rank|, missing gram = penalty k →
            argmin (distance asc, lang asc).

Everything is INTEGER arithmetic with deterministic total tie orders
((count desc, gram asc) ranks, (distance, lang) argmin), so a SQL
oracle reproduces predictions bit for bit — the package's standard
engine-exactness convention.

Scale shape: training shuffles one (lang, gram) aggregate (bounded by
langs × distinct trigrams); per-doc ranking keys by doc_id (windowed
within the doc's own grams only); classification joins each doc's k
grams against a broadcast langs×k profile — ~k·|langs| rows per doc,
never corpus × vocabulary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _trigrams(text_col):
    """Character trigrams of every space-padded word (' '+word+' '),
    the Cavnar-Trenkle n=3 slice, as one exploded column — pure
    Catalyst (split → transform(sequence) → flatten)."""
    words = F.filter(F.split(text_col, " "), lambda w: w != "")
    padded = F.transform(words, lambda w: F.concat(F.lit(" "), w,
                                                   F.lit(" ")))
    grams = F.flatten(F.transform(
        padded,
        lambda w: F.transform(
            F.sequence(F.lit(1), F.length(w) - 2),
            lambda i: F.substring(w, i, 3))))
    return grams


def train_lang_profiles(docs: DataFrame, k: int = 50,
                        label_col: str = "lang",
                        text_col: str = "text") -> DataFrame:
    """(lang, gram, rank) — the top-k trigram rank profile per
    language, rank 1 = most frequent, ties to the lexicographically
    smaller gram (a deterministic total order)."""
    g = docs.select(F.col(label_col).alias("lang"),
                    F.explode(_trigrams(F.col(text_col))).alias("gram"))
    cnt = g.groupBy("lang", "gram").agg(F.count("*").alias("c"))
    w = Window.partitionBy("lang").orderBy(F.desc("c"), F.asc("gram"))
    return (cnt.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("lang", "gram", "rank"))


def detect_lang_rank(docs: DataFrame, profiles: DataFrame, k: int = 50,
                     id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """(id, predicted_lang, distance): Cavnar-Trenkle out-of-place
    classification against trained profiles. distance is the integer
    sum over the doc's top-k grams of |doc_rank − profile_rank|, with
    the standard maximum penalty k for grams absent from a profile;
    argmin ties break to the lexicographically smaller language."""
    did = F.col(id_col)
    g = docs.select(did.alias("_id"),
                    F.explode(_trigrams(F.col(text_col))).alias("gram"))
    cnt = g.groupBy("_id", "gram").agg(F.count("*").alias("c"))
    w = Window.partitionBy("_id").orderBy(F.desc("c"), F.asc("gram"))
    dg = (cnt.withColumn("drank", F.row_number().over(w))
          .where(F.col("drank") <= k)
          .select("_id", "gram", "drank"))
    langs = profiles.select("lang").distinct()
    # every (doc-gram, lang) pair scored: profile hit -> |Δrank|,
    # miss -> penalty k
    scored = (dg.crossJoin(F.broadcast(langs))
              .join(F.broadcast(profiles), ["lang", "gram"], "left")
              .select("_id", "lang",
                      F.coalesce(F.abs(F.col("drank") - F.col("rank")),
                                 F.lit(k)).alias("oop")))
    per = (scored.groupBy("_id", "lang")
           .agg(F.sum("oop").alias("dist")))
    best = (per.groupBy("_id")
            .agg(F.min(F.struct(F.col("dist"), F.col("lang"))).alias("b"))
            .select(F.col("_id").alias(id_col),
                    F.col("b.lang").alias("predicted_lang"),
                    F.col("b.dist").cast("long").alias("distance")))
    return best
