"""Webtext input table: Common-Crawl-style pages
``(url:string, warc_ts:timestamp, html:binary, text:string, lang:string)``
(shape mandated by BASELINE.json ``input_hint``).

Two deterministic sources:

- ``synthesize_rows(n)``: a seeded template-grammar corpus covering every
  branch of the extraction+indexing pipeline (FIXTURES.md §1): titles,
  headings, lists, repeated nav menus, script/style/select invisible
  content, meta tags, entity and token edge cases, Zipf'd vocabulary with
  stopword skew, minority languages.
- ``webtext_from_documents(spark, sf_dir)``: wraps the driver-provided
  ``documents.parquet`` texts into the same HTML template so benches and
  correctness runs use driver data (TESTDATA.md), html rendered with a
  vectorized pandas UDF (no per-row Python at the Spark layer).

In production this table is an Iceberg table fed by WARC ingest
(SURVEY.md §1.5); the ``html``/``text`` invariant (text ==
extract_text(html), byte-identical) is enforced by tests.
"""

from __future__ import annotations

import datetime as _dt
import hashlib
import json

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.extractor import extract_text

EPOCH = _dt.datetime(2024, 1, 1)  # fixed epoch, no wall clock (FIXTURES.md)

_VOCAB_CORE = [
    "fox", "dog", "crawl", "index", "search", "engine", "ranking",
    "spark", "shuffle", "partition", "posting", "merge", "segment",
    "query", "score", "proximity", "density", "diversity", "term",
    "document", "web", "page", "link", "anchor", "title", "heading",
]
_STOPS = ["the", "of", "and", "to", "a", "in", "is", "it", "on", "for"]
_EDGE_TOKENS = [
    "C++", "c#", "1,000,000", "3.14", "dave's", "e-mail", "the one",
    "café", "øl", "Smølferne", "naïve",
]
_LANGS = ["en", "en", "en", "en", "en", "en", "da", "de", "xx"]

MENU_HTML = (
    '<div class="nav"><ul><li><a href="/home">home menu item link</a></li>'
    "<li><a href=\"/about\">about menu item link</a></li>"
    "<li><a href=\"/contact\">contact menu item link</a></li></ul></div>"
)


def _rand(seed: int, k: int) -> int:
    """Deterministic pseudo-random int from (seed, k) via sha1."""
    h = hashlib.sha1(f"{seed}:{k}".encode()).digest()
    return int.from_bytes(h[:8], "big")


def _pick(lst: list[str], seed: int, k: int) -> str:
    return lst[_rand(seed, k) % len(lst)]


def _sentence(doc: int, si: int, nwords: int) -> str:
    words = []
    for w in range(nwords):
        r = _rand(doc, si * 1000 + w)
        if r % 3 == 0:
            words.append(_STOPS[r % len(_STOPS)])
        elif r % 17 == 0:
            words.append(f"rare{r % 5000:04d}")
        elif r % 11 == 0:
            # mid-df band (~10% of docs each): flat-ratio multi-term
            # ANDs over these are non-selective AND non-stopword — the
            # query shape that exercises the always-on WAND routing
            words.append(f"topic{r % 50:02d}")
        else:
            words.append(_VOCAB_CORE[r % len(_VOCAB_CORE)])
    return " ".join(words)


def render_html(doc_id: int, title_text: str, body_sentences: list[str],
                lang: str = "en", with_menu: bool = True,
                headings: list[str] | None = None,
                edge_tokens: list[str] | None = None) -> bytes:
    """The HTML template grammar (FIXTURES.md §1)."""
    parts = [
        "<html><head>",
        f"<title>{title_text}</title>",
        '<meta name="keywords" content="search, engine, spark">',
        f'<meta name="description" content="document {doc_id} description">',
        # custom-meta coverage (hashMetaTags whitelist,
        # XmlDoc_Indexing.cpp:572-586): deterministic single-token
        # values so field-query oracles stay SQL-expressible
        f'<meta name="author" content="author{doc_id % 13:02d}">',
        f'<meta name="subject" content="subject{doc_id % 5}">',
        "<style>.nav{color:red}</style>",
        "<script>var tracker=1;</script>",
        "</head><body>",
    ]
    if with_menu:
        parts.append(MENU_HTML)
    hs = headings if headings is not None else []
    for hi, h in enumerate(hs):
        parts.append(f"<h{(hi % 2) + 1}>{h}</h{(hi % 2) + 1}>")
    for si, sent in enumerate(body_sentences):
        parts.append(f"<p>{sent}.</p>")
    if edge_tokens:
        parts.append("<p>" + " ".join(edge_tokens) + ".</p>")
    parts.append("<select><option>opt-a</option><option>opt-b</option></select>")
    if with_menu:
        parts.append(MENU_HTML)
    parts.append("</body></html>")
    return "".join(parts).encode("utf-8")


def synthesize_rows(n_docs: int, seed: int = 42) -> pd.DataFrame:
    """Deterministic corpus of n_docs pages; Zipf sites (docId domain-bit
    clustering, Titledb.h:66-80), stopword skew, edge-case subset."""
    return pd.DataFrame([_synth_one(d, seed) for d in range(n_docs)])


WEBTEXT_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("html", T.BinaryType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
    ]
)


def synthesize(spark: SparkSession, n_docs: int, seed: int = 42,
               n_partitions: int = 8) -> DataFrame:
    """Distributed synthesis: the doc-id range is partitioned and each
    executor renders its slice (no driver-side corpus materialization —
    scales to arbitrary n_docs)."""
    bounds = spark.range(n_docs, numPartitions=n_partitions)

    def render(iterator):
        for pdf in iterator:
            recs = []
            for d in pdf["id"].astype(int):
                one = _synth_one(int(d), seed)
                recs.append(one)
            yield pd.DataFrame(recs)

    return bounds.mapInPandas(render, schema=WEBTEXT_SCHEMA)


def _synth_one(d: int, seed: int) -> dict:
    site = int((_rand(seed, d * 7 + 1) % 1000) ** 0.5)
    url = f"http://site{site:04d}.example/p/{d:06d}.html"
    lang = _LANGS[_rand(seed, d * 7 + 2) % len(_LANGS)]
    n_sent = 2 + _rand(seed, d * 7 + 3) % 6
    sents = [_sentence(d, si, 4 + _rand(seed, d * 7 + 4 + si) % 9)
             for si in range(n_sent)]
    title = _sentence(d, 999, 3)
    headings = [_sentence(d, 998, 4)] if d % 3 == 0 else []
    edge = [_pick(_EDGE_TOKENS, seed, d)] if d % 5 == 0 else None
    html = render_html(d, title, sents, lang, with_menu=(d % 2 == 0),
                       headings=headings, edge_tokens=edge)
    return {
        "url": url,
        "warc_ts": EPOCH + _dt.timedelta(minutes=d),
        "html": html,
        "text": extract_text(html),
        "lang": lang,
    }


WEBTEXT_DOCID_SCHEMA = T.StructType(
    WEBTEXT_SCHEMA.fields + [T.StructField("doc_id", T.LongType())]
)


def webtext_from_documents(spark: SparkSession, sf_dir: str,
                           keep_doc_id: bool = True,
                           body_only: bool = True,
                           text_suffix: str = "",
                           doc_filter=None,
                           json_every: int | None = None,
                           noarchive_every: int | None = None) -> DataFrame:
    """Wrap the driver-provided documents table into webtext shape.

    url/warc_ts derive from doc_id; html renders the doc text through the
    HTML template; text = extract_text(html). Vectorized via mapInPandas.

    body_only=True renders a minimal page (no title/menu/meta boilerplate)
    so the body posting stream is exactly the document's token stream —
    this is the oracle-parity mode (driver correctness gate compares our
    BM25/tf/df output against DuckDB SQL over the raw text). body_only=
    False exercises the full template grammar (titles/menus/meta).

    text_suffix is appended to each doc's text (re-crawl simulation for
    incremental-build tests); doc_filter is an optional Column predicate.
    With keep_doc_id the provided doc_id rides along so engine results
    join back to the documents table for oracle comparison.

    json_every=N renders every doc with doc_id %% N == 0 as a raw JSON
    payload instead of an HTML page (the bytes start with '{', so the
    content sniff yields CT_JSON and the build's BR-20160127 gate
    indexes only the url: probe term — XmlDoc_Indexing.cpp:252-262).

    noarchive_every=N injects <meta name=robots content="noarchive">
    into the head of every doc_id %% N == 0 page (invisible to the
    extracted text, so the html/text invariant holds); the build's
    getIsNoArchive port flags those docs and fetch_cached withholds
    their cached copies (XmlDoc.cpp:16942 / PageGet.cpp:270).
    """
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    if doc_filter is not None:
        docs = docs.where(doc_filter)
    # small sf dirs arrive as one parquet file = one partition; spread the
    # Python render+parse work across the executor cores (at real scale
    # the source table already has many splits and this is a no-op)
    par = spark.sparkContext.defaultParallelism
    if docs.rdd.getNumPartitions() < par:
        docs = docs.repartition(par)
    schema = WEBTEXT_DOCID_SCHEMA if keep_doc_id else WEBTEXT_SCHEMA

    def render(iterator):
        for pdf in iterator:
            recs = []
            for doc_id, text, lang in zip(pdf["doc_id"], pdf["text"], pdf["lang"]):
                d = int(doc_id)
                site = d % 97
                # every 7th doc gets a digitless, hyphenless path so the
                # gbpermalink:/suburl: fields have both values in-corpus
                # (url format drives isPermalink, Msg25.cpp:4546)
                if d % 7 == 0:
                    slug = "".join(chr(97 + int(c)) for c in str(d))
                    url = f"http://site{site:04d}.example/about/p{slug}.html"
                else:
                    url = f"http://site{site:04d}.example/p/{d:06d}.html"
                body = ((text or "empty") + text_suffix).strip()
                if json_every is not None and d % json_every == 0:
                    html = json.dumps({"text": body}).encode("utf-8")
                    rec = {
                        "url": url,
                        "warc_ts": EPOCH + _dt.timedelta(minutes=d % 100000),
                        "html": html,
                        "text": body,
                        "lang": lang or "en",
                    }
                    if keep_doc_id:
                        rec["doc_id"] = d
                    recs.append(rec)
                    continue
                if body_only:
                    head = ""
                    if noarchive_every is not None and \
                            d % noarchive_every == 0:
                        head = ('<meta name="robots" '
                                'content="noarchive">')
                    html = (
                        "<html><head>" + head + "</head><body><p>" +
                        body + "</p></body></html>"
                    ).encode("utf-8")
                else:
                    title = " ".join(body.split()[:4])
                    html = render_html(d, title, [body], lang or "en",
                                       with_menu=(d % 2 == 0))
                rec = {
                    "url": url,
                    "warc_ts": EPOCH + _dt.timedelta(minutes=d % 100000),
                    "html": html,
                    "text": extract_text(html),
                    "lang": lang or "en",
                }
                if keep_doc_id:
                    rec["doc_id"] = d
                recs.append(rec)
            yield pd.DataFrame(recs)[[f.name for f in schema.fields]]

    return docs.mapInPandas(render, schema=schema)
