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
from ..functions.tokenizer import ALNUM, sentence_ids, tokenize
from .compiler import compile_query
from .executor import IndexReader, search

# Highlight.cpp:12-23 — per-query-term cycling front tags; </span> back
FRONT_TAGS = tuple(f"<span class='gbcnst{i:02d}'>" for i in range(10))
BACK_TAG = "</span>"


def _query_words(q: str) -> list[str]:
    cq = compile_query(q)
    return [g.word.lower() for g in cq.groups if not g.negative]


def snippet_of(text: str, qwords: set[str], window_tokens: int = 20) -> str:
    """Best window snippet (Summary.cpp best-sentence scan, simplified to
    fixed windows for determinism/oracle parity). Display text is run
    through the unwanted-symbol filter FIRST (Pos.cpp:282
    isUtf8UnwantedSymbols in the summary render loop), so emoji strip
    and their fragments rejoin — 'bro😑😑wn' renders 'brown' (reference
    golden test/system/test_result_summary.py summary_emoticon_*)."""
    from ..functions.extractor import strip_unwanted_symbols

    toks = tokenize(strip_unwanted_symbols(text or ""))
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


def sentence_snippet_of(text: str, qwords: set[str],
                        max_sentences: int = 1) -> str:
    """Best-sentence summary (Summary.cpp:347 getBestWindow over
    sentence-bounded excerpts): sentences come from the tokenizer's
    Sections-style segmentation (punct [.!?] / breaking tags); each
    sentence scores the number of DISTINCT query words it contains; the
    leftmost max-score run of ``max_sentences`` consecutive sentences
    wins. Returns the winning sentences' words space-joined. Unwanted
    symbols strip before tokenization (Pos.cpp:282), like
    ``snippet_of``."""
    from ..functions.extractor import strip_unwanted_symbols

    toks = tokenize(strip_unwanted_symbols(text or ""))
    sids = sentence_ids(toks)
    # per-sentence word lists, in first-appearance order
    sent_words: dict[int, list[str]] = {}
    for k in range(len(toks)):
        if toks.kinds[k] == ALNUM:
            sent_words.setdefault(sids[k], []).append(toks.words[k])
    if not sent_words:
        return ""
    order = sorted(sent_words)
    scores = [len({w.lower() for w in sent_words[s]} & qwords)
              for s in order]
    best_i, best_s = 0, -1
    for i in range(len(order)):
        s = sum(scores[i:i + max_sentences])
        if s > best_s:
            best_i, best_s = i, s
    out: list[str] = []
    for s in order[best_i:best_i + max_sentences]:
        out.extend(sent_words[s])
    return " ".join(out)


def highlight_text(snippet: str, qwords: list[str]) -> str:
    """Highlight.cpp markup: the i-th query term's occurrences are
    wrapped in FRONT_TAGS[i % 10] ... </span>. Whole-word, case-kept,
    token-level (the snippet is already space-joined words)."""
    tag_of = {w.lower(): FRONT_TAGS[i % len(FRONT_TAGS)]
              for i, w in enumerate(qwords)}
    out = []
    for w in snippet.split(" "):
        t = tag_of.get(w.lower())
        out.append(f"{t}{w}{BACK_TAG}" if t else w)
    return " ".join(out)


def title_of(title: str | None, text: str, title_tokens: int = 8) -> str:
    """Display title (Title.cpp): the indexed title run through the
    unwanted-symbol filter (Title.cpp:1710 isUtf8UnwantedSymbols —
    emojis/dingbats stripped; reference golden
    test/system/test_result_title.py title_emoticon_*)."""
    from ..functions.extractor import strip_unwanted_symbols

    if title:
        return strip_unwanted_symbols(title)
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
    mode: str = "window",
    highlight: bool = False,
) -> DataFrame:
    """Top-k search + per-result (title, snippet). ``text_source`` must
    have (doc_id, text); returns (doc_id, score, title, snippet) ordered
    (score DESC, doc_id ASC).

    ``mode="window"`` uses fixed ``window_tokens`` windows (oracle-exact
    rule); ``mode="sentence"`` uses the reference's sentence-bounded
    best excerpt (Summary.cpp:347). ``highlight=True`` wraps each query
    term in its cycling ``<span class='gbcnstNN'>`` tag
    (Highlight.cpp:12-23)."""
    rd = reader or IndexReader(spark, index_dir, conf)
    topk = search(spark, index_dir, query, k=k, conf=conf, reader=rd)
    qlist = _query_words(query)
    qwords = set(qlist)

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
        def snip(x: str) -> str:
            if mode == "sentence":
                s = sentence_snippet_of(x, qwords)
            else:
                s = snippet_of(x, qwords, window_tokens)
            return highlight_text(s, qlist) if highlight else s

        for pdf in iterator:
            out = pd.DataFrame({
                "doc_id": pdf["doc_id"].astype("int64"),
                "score": pdf["score"].astype("float64"),
                "title": [
                    title_of(t if isinstance(t, str) and t else None,
                             x or "", title_tokens)
                    for t, x in zip(pdf["_idx_title"], pdf["text"])
                ],
                "snippet": [snip(x or "") for x in pdf["text"]],
            })
            yield out

    out = joined.mapInPandas(
        render, schema="doc_id long, score double, title string, snippet string")
    return out.orderBy(F.col("score").desc(), F.col("doc_id").asc())
