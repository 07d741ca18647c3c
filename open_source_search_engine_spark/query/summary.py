"""Result summaries + titles (Msg20 fan-out analog; Summary.cpp:1140,
Title.h:25, Matches.h:1-18).

The reference renders each result by loading its TitleRec, re-parsing,
finding query-term match groups (``Matches``), and choosing the
best-scoring sentence window for the summary; the title comes from
``<title>``/h1/link text. Our Spark-native equivalent joins the top-k
result set (small) against the document text source and computes
title + snippet in one vectorized pandas stage:

- title: the indexed ``docs.title`` when present, else the first
  ``title_tokens`` body tokens (the reference's fallback chain
  Title.cpp: title tag -> h1 -> first words).
- snippet: the body is cut into consecutive ``window_tokens``-token
  windows; each window scores = number of DISTINCT query words it
  contains; the first window with the maximum score wins (deterministic
  tie-break, mirroring Summary.cpp's best-sentence-window scan with
  leftmost preference). Windows are non-overlapping, which keeps the
  rule exactly reproducible in SQL for the correctness oracle.

The top-k side is tiny (k rows) and broadcast into the join; the text
source is never shuffled (Catalyst broadcasts the k-row side), so this
scales to any corpus size — the per-result work is O(k), same as the
reference's Msg20 fan-out of k docId lookups.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import DEFAULT_CONF, EngineConf
from ..functions.tokenizer import ALNUM, tokenize
from .compiler import compile_query
from .executor import IndexReader, search


def _query_words(q: str) -> list[str]:
    cq = compile_query(q)
    return [g.word.lower() for g in cq.groups if not g.negative]


def snippet_of(text: str, qwords: set[str], window_tokens: int = 20) -> str:
    """Best window snippet (Summary.cpp best-sentence scan, simplified to
    fixed windows for determinism/oracle parity)."""
    toks = tokenize(text or "")
    words = [toks.words[k] for k in range(len(toks))
             if toks.kinds[k] == ALNUM]
    if not words:
        return ""
    best_i, best_s = 0, -1
    for i in range(0, len(words), window_tokens):
        w = words[i:i + window_tokens]
        s = len({x.lower() for x in w} & qwords)
        if s > best_s:
            best_i, best_s = i, s
    return " ".join(words[best_i:best_i + window_tokens])


def title_of(title: str | None, text: str, title_tokens: int = 8) -> str:
    if title:
        return title
    toks = tokenize(text or "")
    words = [toks.words[k] for k in range(len(toks))
             if toks.kinds[k] == ALNUM]
    return " ".join(words[:title_tokens])


def search_with_snippets(
    spark: SparkSession,
    index_dir: str,
    query: str,
    text_source: DataFrame,
    k: int | None = 10,
    window_tokens: int = 20,
    title_tokens: int = 8,
    conf: EngineConf = DEFAULT_CONF,
    reader: IndexReader | None = None,
) -> DataFrame:
    """Top-k search + per-result (title, snippet). ``text_source`` must
    have (doc_id, text); returns (doc_id, score, title, snippet) ordered
    (score DESC, doc_id ASC)."""
    rd = reader or IndexReader(spark, index_dir, conf)
    topk = search(spark, index_dir, query, k=k, conf=conf, reader=rd)
    qwords = set(_query_words(query))

    titles = rd.docs().select("doc_id", F.col("title").alias("_idx_title"))
    # k-row side broadcasts; with k=None (oracle mode) fall back to a
    # plain shuffled join — the result set is unbounded by construction
    results = F.broadcast(topk) if k is not None else topk
    joined = (
        text_source.select("doc_id", "text")
        .join(results, "doc_id")
        .join(titles, "doc_id", "left")
    )

    def render(iterator):
        for pdf in iterator:
            out = pd.DataFrame({
                "doc_id": pdf["doc_id"].astype("int64"),
                "score": pdf["score"].astype("float64"),
                "title": [
                    title_of(t if isinstance(t, str) and t else None,
                             x or "", title_tokens)
                    for t, x in zip(pdf["_idx_title"], pdf["text"])
                ],
                "snippet": [
                    snippet_of(x or "", qwords, window_tokens)
                    for x in pdf["text"]
                ],
            })
            yield out

    out = joined.mapInPandas(
        render, schema="doc_id long, score double, title string, snippet string")
    return out.orderBy(F.col("score").desc(), F.col("doc_id").asc())
