"""Stored-query percolation (prospective search): match documents
against a REGISTERED QUERY SET — retrieval turned inside out. The
reference engine has no percolator; a crawl pipeline at 10^12 pages
needs one (alerting, topic routing, collection building: "tell me when
a page matching `key -customer` arrives" without re-running the query
against the whole index). The classic serving-side design (Elasticsearch
percolator) walks queries per document; the Spark-first shape inverts
the QUERIES instead of the corpus:

  stored queries --compile--> broadcast tables
      req(query_id, term)   required terms
      neg(query_id, term)   negated terms
      phr(query_id, phrase) quoted runs
  corpus --one explode--> (doc, term) --broadcast join req+neg-->
      groupBy(doc, query_id): required-hit count == n_req AND no
      negated hit, in the SAME aggregate (map-side partials);
  phrases: candidates-only verify against the padded text (never
      the full corpus x queries).

Scale shape: the corpus side is ONE explode + ONE groupBy keyed
(doc_id, query_id); the shuffled rows are (doc, matched-query-term)
pairs — proportional to actual hits, not |docs| x |queries|. Query
tables are driver-compiled (a query set is thousands, not billions)
and broadcast. The phrase verify re-reads text only for candidate
(doc, query) pairs.

Query subset: the engine's conjunctive grammar — AND terms, ``-term``
negation, quoted phrases. Field filters, boolean OR trees and numeric
operators raise (register them as separate conjunctive queries; OR is
a union of percolations by construction).

Tokenization contract: terms match on whitespace-split ``text`` — the
same normalized extracted-text column the index build hashes
(input_hint: text is the byte-identical extraction invariant).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .compiler import compile_query


def compile_stored_queries(
    spark: SparkSession,
    queries: list[tuple[int, str]],
) -> dict[str, DataFrame]:
    """Driver-side compile of the stored query set into the three
    broadcastable match tables + per-query required-term counts.
    Raises on constructs percolation does not cover (fields, boolean
    trees, numeric ops, gbdocid)."""
    req, neg, phr = [], [], []
    for qid, qs in queries:
        cq = compile_query(qs)
        if (cq.boolean_expr is not None or cq.sort_spec
                or cq.num_filters or cq.docid_filter is not None):
            raise ValueError(
                f"query {qid!r}: boolean/numeric/docid operators are not "
                "percolatable — register conjunctive queries (OR = a "
                "union of stored queries)")
        for g in cq.groups:
            if g.field:
                raise ValueError(
                    f"query {qid!r}: field filter {g.field!r} is not "
                    "percolatable")
            # match case-insensitively like the engine (termIds hash
            # lowercased, Query.cpp wordId path): store lowercase terms
            # and lowercase the document side at match time
            (neg if g.negative else req).append(
                (int(qid), g.word.lower()))
        for run in cq.quoted_runs:
            phr.append((int(qid),
                        " ".join(cq.groups[i].word.lower()
                                 for i in run)))
    req_df = spark.createDataFrame(req, "query_id int, term string")
    out = {
        "req": req_df,
        "neg": spark.createDataFrame(neg or [(None, None)],
                                     "query_id int, term string"
                                     ).where(F.col("term").isNotNull()),
        "phr": spark.createDataFrame(phr or [(None, None)],
                                     "query_id int, phrase string"
                                     ).where(F.col("phrase").isNotNull()),
        "n_req": req_df.groupBy("query_id").agg(
            F.countDistinct("term").alias("n_req")),
    }
    return out


def percolate(
    spark: SparkSession,
    docs: DataFrame,
    queries: list[tuple[int, str]] | dict[str, DataFrame],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(query_id, doc_id) for every stored query each document
    satisfies. ``queries`` is either the raw list[(id, query-string)]
    or a pre-compiled ``compile_stored_queries`` dict (reuse it across
    micro-batches — the stream case)."""
    q = (queries if isinstance(queries, dict)
         else compile_stored_queries(spark, queries))
    did = F.col(id_col)
    toks = docs.select(
        did.alias("doc_id"),
        F.explode(F.array_distinct(
            F.split(F.lower(F.col(text_col)), " "))).alias("term"))

    # required + negated terms fold into ONE aggregation: a doc matching
    # a negated term lands in the same (doc, query) group its required
    # hits do, so max(_neg) kills it without a second corpus scan or an
    # anti-join (one explode, one broadcast join, one shuffle total)
    both = (q["req"].withColumn("_neg", F.lit(0))
            .unionByName(q["neg"].withColumn("_neg", F.lit(1))))
    cand = (toks.join(F.broadcast(both), "term")
            .groupBy("doc_id", "query_id")
            .agg(F.countDistinct(
                     F.when(F.col("_neg") == 0, F.col("term")))
                 .alias("_hit"),
                 F.max("_neg").alias("_bad"))
            .join(F.broadcast(q["n_req"]), "query_id")
            .where((F.col("_hit") == F.col("n_req"))
                   & (F.col("_bad") == 0))
            .select("query_id", "doc_id"))

    if not q["phr"].isEmpty():
        phr_q = q["phr"].select("query_id").distinct()
        padded = docs.select(
            did.alias("doc_id"),
            F.concat(F.lit(" "), F.lower(F.col(text_col)),
                     F.lit(" ")).alias("_t"))
        with_phr = (
            cand.join(F.broadcast(q["phr"]), "query_id")
            .join(padded, "doc_id")
            .withColumn("_ok", F.col("_t").contains(
                F.concat(F.lit(" "), F.col("phrase"), F.lit(" ")))
                .cast("int"))
            .groupBy("query_id", "doc_id")
            .agg(F.min("_ok").alias("_all"))
            .where(F.col("_all") == 1)
            .select("query_id", "doc_id"))
        cand = (cand.join(F.broadcast(phr_q), "query_id", "left_anti")
                .unionByName(with_phr))
    return cand
