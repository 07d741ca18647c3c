"""Distributed Naive-Bayes text classifier — the quality-filter shape
LLM data pipelines use (GPT-3 appendix A / CCNet / LLaMA train a linear
classifier on "curated reference vs raw crawl" and keep high-scoring
pages; fastText's supervised mode is the usual tool). Multinomial NB is
the Spark-first instance of that recipe: training IS two aggregations
(class totals + per-(term, class) counts), scoring IS one broadcast
join + one groupBy sum — no gradient loop, no UDF, and the whole thing
is exactly reproducible.

Determinism contract: per-term log-odds weights are rounded to INTEGER
MICRO-UNITS (round(w * 1e6) as long) in the vocabulary-sized model
frame, so per-doc scores are integer sums — order-free under any
partitioning, and a SQL oracle reproduces them bit for bit (the same
convention as the integer-exact PageRank/HLL ops in this package; raw
double lns differ across engines only at ulp level, which the micro
rounding absorbs).

Semantics (standard multinomial NB, Laplace alpha):
  w(t)  = ln((cnt_pos(t)+a)/(tot_pos+a·V)) − ln((cnt_neg(t)+a)/(tot_neg+a·V))
  prior = ln(n_docs_pos/n_docs_neg)
  score(doc) = prior + Σ_occurrences w(t)   [terms outside the training
               vocabulary contribute 0 — the usual NB convention]
score > 0 ⇒ the doc looks more like the positive (curated) class.

Scale shape: training shuffles one (term, class) aggregate (vocab-
bounded output, map-side partials); the model frame is vocab-sized and
broadcast at scoring; scoring shuffles only the per-doc sum. Nothing
is ever corpus × vocab.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MICRO = 1_000_000


def nb_train(docs: DataFrame, label_col: str = "label",
             text_col: str = "text", alpha: int = 1,
             ) -> tuple[DataFrame, int]:
    """Train on a frame with a 0/1 ``label_col``. Returns
    ``(model, prior_micro)``: model = (term, w_micro) — the per-term
    log-odds weight in integer micro-units — and the class-prior
    log-odds, also micro-rounded. Both classes must be non-empty."""
    lab = F.col(label_col).cast("int")
    toks = docs.select(lab.alias("_y"),
                       F.explode(F.split(F.col(text_col), " "))
                       .alias("term")).where(F.col("term") != "")
    cnt = (toks.groupBy("term")
           .agg(F.sum("_y").alias("c1"),
                F.sum(1 - F.col("_y")).alias("c0")))
    tot = cnt.agg(F.sum("c1").alias("t1"), F.sum("c0").alias("t0"),
                  F.count("*").alias("v")).collect()[0]
    t1, t0, v = int(tot["t1"] or 0), int(tot["t0"] or 0), int(tot["v"])
    nd = docs.groupBy().agg(
        F.sum(lab).alias("n1"),
        F.sum(1 - lab).alias("n0")).collect()[0]
    n1, n0 = int(nd["n1"] or 0), int(nd["n0"] or 0)
    if not n1 or not n0:
        raise ValueError(f"need both classes, got n_pos={n1} n_neg={n0}")
    w = (F.log((F.col("c1") + alpha) / F.lit(float(t1 + alpha * v)))
         - F.log((F.col("c0") + alpha) / F.lit(float(t0 + alpha * v))))
    model = cnt.select(
        "term",
        F.round(w * MICRO).cast("long").alias("w_micro"))
    import math

    # half-away-from-zero, matching Spark/DuckDB round() (python's
    # round is banker's — the repo-wide literal-rounding trap)
    x = math.log(n1 / n0) * MICRO
    prior_micro = int(math.copysign(math.floor(abs(x) + 0.5), x))
    return model, prior_micro


def nb_score(docs: DataFrame, model: DataFrame, prior_micro: int = 0,
             id_col: str = "doc_id", text_col: str = "text",
             ) -> DataFrame:
    """(id, score_micro, score): integer-exact NB log-odds per doc.
    ``score = score_micro / 1e6`` is the float convenience view; the
    long is the deterministic contract. Out-of-vocabulary terms score
    0; a doc with no in-vocabulary term gets just the prior."""
    did = F.col(id_col)
    occ = docs.select(did.alias("_id"),
                      F.explode(F.split(F.col(text_col), " "))
                      .alias("term")).where(F.col("term") != "")
    per_doc = (occ.join(F.broadcast(model), "term")
               .groupBy("_id")
               .agg(F.sum("w_micro").alias("_s")))
    return (docs.select(did.alias("_id"))
            .join(per_doc, "_id", "left")
            .select(F.col("_id").alias(id_col),
                    (F.coalesce(F.col("_s"), F.lit(0))
                     + F.lit(int(prior_micro))).alias("score_micro"))
            .withColumn("score",
                        F.round(F.col("score_micro") / MICRO, 6)))


def quality_filter(docs: DataFrame, model: DataFrame,
                   prior_micro: int = 0, threshold: float = 0.0,
                   id_col: str = "doc_id", text_col: str = "text",
                   ) -> DataFrame:
    """Keep docs the classifier scores above ``threshold`` log-odds —
    the CCNet/GPT-3 'looks like the curated reference corpus' gate.
    Returns the original rows plus the score columns."""
    scored = nb_score(docs, model, prior_micro, id_col, text_col)
    return (docs.join(scored, id_col)
            .where(F.col("score_micro") > int(threshold * MICRO)))
