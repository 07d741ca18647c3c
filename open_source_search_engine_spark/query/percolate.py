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
      fld(query_id, field, value, neg)   field constraints
      num(query_id, field, lo, hi)       numeric range constraints
      bterm(query_id, term, slot)        boolean-tree term slots
  corpus --one explode--> (doc, term) --broadcast join req+neg-->
      groupBy(doc, query_id): required-hit count == n_req AND no
      negated hit, in the SAME aggregate (map-side partials);
  boolean trees: the same explode joins bterm, bit_or's per-(doc,
      query) slot masks, and a pandas UDF evaluates each query's
      compiled tree against the mask (candidate rows only);
  fields/numerics: evaluated against the INCOMING doc's columns
      (url-derived host/ext, lang, numeric columns) — the percolator
      sees the document before any index exists, so constraints
      re-derive exactly what the build would hash (index/build.py
      parse_doc: site: = url host, ext: = last-path-segment suffix
      <= 6 chars, gblang: = lang or 'xx');
  phrases: candidates-only verify against the padded text (never
      the full corpus x queries).

Scale shape: the corpus side is ONE explode + ONE groupBy keyed
(doc_id, query_id); the shuffled rows are (doc, matched-query-term)
pairs — proportional to actual hits, not |docs| x |queries|. Query
tables are driver-compiled (a query set is thousands, not billions)
and broadcast. The phrase verify re-reads text only for candidate
(doc, query) pairs. Two registered shapes are inherently
full-corpus and documented as such: attribute-only queries (no
positive term — e.g. pure `site:x` or `gbmin:...`) and boolean trees
satisfiable with zero positive hits (pure-negation arms, e.g.
`a OR NOT b`) — each such query joins EVERY incoming doc, which is
the query's real semantics, so the cost is per offending query, not
per registered query.

Query grammar (r5 — serving-compiler parity, VERDICT r4 item 4):
AND terms, ``-term`` negation, quoted phrases, boolean AND/OR/NOT
trees over plain terms, field constraints evaluable on the incoming
row (``site:``, ``ext:``, ``gblang:``, negatable), and
``gbmin:/gbmax:/gbequal:`` numeric ranges over the frame's numeric
columns plus the derived ``n_tokens``. Still rejected, with the gap
named: ``gbsortby`` (ordering is meaningless per-document),
``gbdocid`` (a stored identity probe is a filter, not a query),
fields the incoming row cannot answer, and phrases/fields INSIDE
boolean trees.

Tokenization contract: terms match on whitespace-split ``text`` — the
same normalized extracted-text column the index build hashes
(input_hint: text is the byte-identical extraction invariant).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .compiler import compile_query

PERCOLATABLE_FIELDS = ("site", "ext", "gblang")


def _tree_terms(node, cq, qid: int, slot_of: dict) -> None:
    """Collect TERM leaves of a boolean tree into slot assignments;
    raise on leaves the mask evaluation cannot cover."""
    if node.op == "TERM":
        g = cq.groups[node.group_index]
        if g.field:
            raise ValueError(
                f"query {qid!r}: field terms inside boolean trees are "
                "not percolatable — lift the field out as a top-level "
                "conjunctive constraint")
        if g.quoted:
            raise ValueError(
                f"query {qid!r}: quoted phrases inside boolean trees "
                "are not percolatable")
        if node.group_index not in slot_of:
            if len(slot_of) >= 63:
                raise ValueError(
                    f"query {qid!r}: boolean tree exceeds 63 distinct "
                    "terms (mask width)")
            slot_of[node.group_index] = len(slot_of)
        return
    for ch in node.children:
        _tree_terms(ch, cq, qid, slot_of)


def _tree_eval(node, slot_of: dict):
    """Compile a BoolNode tree into mask -> bool (driver-side)."""
    if node.op == "TERM":
        s = slot_of[node.group_index]
        return lambda m: bool((m >> s) & 1)
    if node.op == "NOT":
        f = _tree_eval(node.children[0], slot_of)
        return lambda m: not f(m)
    fs = [_tree_eval(ch, slot_of) for ch in node.children]
    if node.op == "AND":
        return lambda m: all(f(m) for f in fs)
    return lambda m: any(f(m) for f in fs)


def compile_stored_queries(
    spark: SparkSession,
    queries: list[tuple[int, str]],
) -> dict:
    """Driver-side compile of the stored query set into broadcastable
    match tables + per-query metadata. Raises on constructs percolation
    does not cover (see module docstring)."""
    req, neg, phr, fld, num, bterm = [], [], [], [], [], []
    attr_only: list[int] = []       # no positive term: full-corpus
    evals: dict[int, object] = {}   # boolean qid -> mask evaluator
    default_match: list[int] = []   # boolean qid true on empty mask
    for qid, qs in queries:
        qid = int(qid)
        cq = compile_query(qs)
        if cq.sort_spec is not None:
            raise ValueError(
                f"query {qid!r}: gbsortby is not percolatable — "
                "per-document matching has no result order")
        if cq.docid_filter is not None:
            raise ValueError(
                f"query {qid!r}: gbdocid is not percolatable — filter "
                "the incoming frame on doc_id instead")
        for tid, (lo, hi) in cq.num_filters.items():
            fname = cq.num_filter_fields.get(tid)
            if fname is None:
                raise ValueError(
                    f"query {qid!r}: numeric filter on an unresolvable "
                    "field")
            num.append((qid, fname, lo, hi))
        if cq.boolean_expr is not None:
            slot_of: dict = {}
            _tree_terms(cq.boolean_expr, cq, qid, slot_of)
            ev = _tree_eval(cq.boolean_expr, slot_of)
            evals[qid] = ev
            if ev(0):
                default_match.append(qid)
            for gi, slot in slot_of.items():
                bterm.append((qid, cq.groups[gi].word.lower(), slot))
            continue
        n_pos = 0
        for g in cq.groups:
            if g.field:
                fl = g.field.lower()
                if fl not in PERCOLATABLE_FIELDS:
                    raise ValueError(
                        f"query {qid!r}: field {g.field!r} is not "
                        f"percolatable (supported: "
                        f"{', '.join(PERCOLATABLE_FIELDS)})")
                value = g.word.partition(":")[2].lower()
                fld.append((qid, fl, value, bool(g.negative)))
                continue
            # match case-insensitively like the engine (termIds hash
            # lowercased, Query.cpp wordId path)
            if g.negative:
                neg.append((qid, g.word.lower()))
            else:
                req.append((qid, g.word.lower()))
                n_pos += 1
        for run in cq.quoted_runs:
            phr.append((qid, " ".join(cq.groups[i].word.lower()
                                      for i in run)))
        if n_pos == 0:
            attr_only.append(qid)
    req_df = spark.createDataFrame(
        req or [(None, None)],
        "query_id int, term string").where(F.col("term").isNotNull())
    out = {
        "req": req_df,
        "neg": spark.createDataFrame(neg or [(None, None)],
                                     "query_id int, term string"
                                     ).where(F.col("term").isNotNull()),
        "phr": spark.createDataFrame(phr or [(None, None)],
                                     "query_id int, phrase string"
                                     ).where(F.col("phrase").isNotNull()),
        "fld": spark.createDataFrame(
            fld or [(None, None, None, None)],
            "query_id int, field string, value string, neg boolean"
        ).where(F.col("field").isNotNull()),
        "num": spark.createDataFrame(
            num or [(None, None, None, None)],
            "query_id int, field string, lo double, hi double"
        ).where(F.col("field").isNotNull()),
        "bterm": spark.createDataFrame(
            bterm or [(None, None, None)],
            "query_id int, term string, slot int"
        ).where(F.col("term").isNotNull()),
        "n_req": req_df.groupBy("query_id").agg(
            F.countDistinct("term").alias("n_req")),
        "evals": evals,
        "default_match": default_match,
        "attr_only": attr_only,
        "num_fields": sorted({f for _, f, _, _ in num}),
        "has_fld": bool(fld),
    }
    return out


def _doc_attrs(docs: DataFrame, id_col: str, text_col: str,
               q: dict) -> DataFrame:
    """Per-doc attribute frame for field/numeric constraint evaluation
    — re-derives exactly what the build would hash (parse_doc:
    site: = url host; ext: = last path segment's <=6-char suffix;
    gblang: = lang or 'xx')."""
    cols = [F.col(id_col).alias("doc_id")]
    names = set(docs.columns)
    if q["has_fld"]:
        if "url" not in names:
            raise ValueError(
                "stored queries use site:/ext: field constraints but "
                "the incoming frame has no 'url' column")
        host = F.lower(F.regexp_extract(
            "url", r"^[A-Za-z][A-Za-z0-9+.-]*://([^/:]+)", 1))
        seg = F.element_at(
            F.split(F.regexp_replace("url", "/+$", ""), "/"), -1)
        ext = F.lower(F.element_at(F.split(seg, r"\."), -1))
        ext = F.when(
            seg.contains(".") & ~seg.contains("://")
            & (F.length(ext) > 0) & (F.length(ext) <= 6), ext)
        lang_l = (F.when((F.col("lang").isNull())
                         | (F.col("lang") == ""), F.lit("xx"))
                  .otherwise(F.lower(F.col("lang")))
                  if "lang" in names else F.lit("xx"))
        cols += [host.alias("_site"), ext.alias("_ext"),
                 lang_l.alias("_gblang")]
    for fname in q["num_fields"]:
        if fname == "n_tokens" and "n_tokens" not in names:
            cols.append(F.size(F.split(F.col(text_col), " "))
                        .cast("double").alias("_n_n_tokens"))
        elif fname in names:
            cols.append(F.col(fname).cast("double")
                        .alias(f"_n_{fname}"))
        else:
            raise ValueError(
                f"stored queries use numeric field {fname!r} but the "
                "incoming frame has no such column (derived fields: "
                "n_tokens)")
    return docs.select(*cols)


def _apply_constraints(cand: DataFrame, docs: DataFrame, q: dict,
                       id_col: str, text_col: str) -> DataFrame:
    """Filter (query_id, doc_id) candidates by their query's field and
    numeric constraints (no-op frame-wise when none registered)."""
    if not q["has_fld"] and not q["num_fields"]:
        return cand
    attrs = _doc_attrs(docs, id_col, text_col, q)
    cand = cand.join(attrs, "doc_id")
    if q["has_fld"]:
        fb = F.broadcast(q["fld"])
        m = (F.when(F.col("field") == "site",
                    F.col("_site") == F.col("value"))
             .when(F.col("field") == "ext",
                   F.col("_ext") == F.col("value"))
             .otherwise(F.col("_gblang") == F.col("value")))
        ok = F.coalesce(m, F.lit(False)) != F.col("neg")
        fail = (cand.join(fb, "query_id")
                .groupBy("query_id", "doc_id")
                .agg(F.min(ok.cast("int")).alias("_ok"))
                .where(F.col("_ok") == 0)
                .select("query_id", "doc_id"))
        cand = cand.join(fail, ["query_id", "doc_id"], "left_anti")
    if q["num_fields"]:
        nb = F.broadcast(q["num"])
        val = F.lit(None).cast("double")
        for fname in q["num_fields"]:
            val = F.when(F.col("field") == fname,
                         F.col(f"_n_{fname}")).otherwise(val)
        ok = (val.isNotNull()
              & (F.col("lo").isNull() | (val >= F.col("lo")))
              & (F.col("hi").isNull() | (val <= F.col("hi"))))
        fail = (cand.join(nb, "query_id")
                .groupBy("query_id", "doc_id")
                .agg(F.min(ok.cast("int")).alias("_ok"))
                .where(F.col("_ok") == 0)
                .select("query_id", "doc_id"))
        cand = cand.join(fail, ["query_id", "doc_id"], "left_anti")
    return cand.select("query_id", "doc_id")


def percolate(
    spark: SparkSession,
    docs: DataFrame,
    queries: list[tuple[int, str]] | dict,
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
            .join(F.broadcast(q["n_req"]), "query_id", "left")
            .where((F.col("_hit") == F.coalesce(F.col("n_req"),
                                                F.lit(0)))
                   & (F.col("_bad") == 0))
            .select("query_id", "doc_id"))

    # attribute-only conjunctive queries (no positive term): their
    # match set is defined purely by field/numeric constraints —
    # full-corpus by semantics, one row per (doc, such query)
    if q["attr_only"]:
        ao = spark.createDataFrame([(i,) for i in q["attr_only"]],
                                   "query_id int")
        ao_cand = docs.select(did.alias("doc_id")).crossJoin(
            F.broadcast(ao))
        # negated-term kills still apply (e.g. "site:x -spam")
        neg_hit = (toks.join(F.broadcast(q["neg"]), "term")
                   .select("query_id", "doc_id").distinct())
        ao_cand = ao_cand.join(neg_hit, ["query_id", "doc_id"],
                               "left_anti")
        cand = cand.unionByName(ao_cand)

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

    # boolean trees: per-(doc, query) slot masks from the same explode,
    # evaluated by the driver-compiled tree closures on candidate rows
    # only; default-match queries (true on the empty mask) additionally
    # cover docs with zero matched terms
    evals = q["evals"]
    if evals:
        from pyspark.sql.functions import pandas_udf

        masks = (toks.join(F.broadcast(q["bterm"]), "term")
                 .groupBy("doc_id", "query_id")
                 .agg(F.expr("bit_or(shiftleft(1L, slot))")
                      .alias("_mask")))
        if q["default_match"]:
            dm = spark.createDataFrame(
                [(i,) for i in q["default_match"]], "query_id int")
            all_pairs = docs.select(did.alias("doc_id")).crossJoin(
                F.broadcast(dm))
            masks = (all_pairs.join(masks, ["doc_id", "query_id"],
                                    "left")
                     .select("doc_id", "query_id",
                             F.coalesce("_mask", F.lit(0))
                             .alias("_mask"))
                     .unionByName(
                         masks.join(F.broadcast(dm), "query_id",
                                    "left_anti")))

        @pandas_udf("boolean")
        def tree_ok(qid: pd.Series, mask: pd.Series) -> pd.Series:
            return pd.Series([evals[int(i)](int(m))
                              for i, m in zip(qid, mask)])

        bool_cand = (masks.where(tree_ok(F.col("query_id"),
                                         F.col("_mask")))
                     .select("query_id", "doc_id"))
        cand = cand.unionByName(bool_cand)

    return _apply_constraints(cand, docs, q, id_col, text_col)
