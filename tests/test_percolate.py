"""Stored-query percolation: batch semantics (AND / -neg / phrase),
compile-time rejections, and streamed-alerts == batch equivalence."""

from __future__ import annotations

import datetime as dt
import os

import pandas as pd
import pytest

from open_source_search_engine_spark.query.percolate import (
    compile_stored_queries,
    percolate,
)

DOCS = {
    1: "key window stream value",
    2: "key value window",          # 'key value' adjacent
    3: "window customer key",
    4: "stream only here",
    5: "value key",                 # reversed: no 'key value' phrase
    6: "batch small key window",
}

QUERIES = [
    (1, "key window"),              # AND
    (2, "stream -customer"),        # negation
    (3, '"key value"'),             # phrase
    (4, "zzznothere"),              # no match
    (5, "window -customer -batch"),  # multi-negation
]

EXPECT = {
    (1, 1), (1, 2), (1, 3), (1, 6),  # key AND window
    (2, 1), (2, 4),                 # stream, no customer
    (3, 2),                         # phrase adjacency only
    (5, 1), (5, 2),                 # window minus customer/batch docs
}


def _docs_df(spark):
    return spark.createDataFrame(
        [(d, t) for d, t in DOCS.items()], "doc_id long, text string")


def test_percolate_batch_semantics(spark):
    got = {(r["query_id"], r["doc_id"]) for r in
           percolate(spark, _docs_df(spark), QUERIES).collect()}
    assert got == EXPECT


def test_percolate_rejects_uncoverable(spark):
    """r5 narrows the rejection set to the shapes the incoming row
    genuinely cannot answer: sort order, identity probes, unsupported
    fields, and phrases/fields inside boolean trees."""
    with pytest.raises(ValueError, match="gbdocid"):
        compile_stored_queries(spark, [(1, "gbdocid:3")])
    with pytest.raises(ValueError, match="gbsortby"):
        compile_stored_queries(spark, [(1, "gbsortby:n_tokens key")])
    with pytest.raises(ValueError, match="not percolatable"):
        compile_stored_queries(spark, [(1, "ip:1.2.3.4 key")])
    with pytest.raises(ValueError, match="boolean trees"):
        compile_stored_queries(
            spark, [(1, "key AND (site:a.example OR b)")])


def test_percolate_precompiled_reuse(spark):
    q = compile_stored_queries(spark, QUERIES)
    got = {(r["query_id"], r["doc_id"]) for r in
           percolate(spark, _docs_df(spark), q).collect()}
    assert got == EXPECT


def test_streaming_percolate_matches_batch(spark, tmp_path):
    from open_source_search_engine_spark.streaming.percolate import (
        alerts_output,
        streaming_percolate,
    )

    inp = str(tmp_path / "pdrops")
    ckpt = str(tmp_path / "pckpt")
    out = str(tmp_path / "palerts")
    os.makedirs(inp, exist_ok=True)

    def drop(ids):
        recs = [{"url": f"http://x.example/{d}",
                 "warc_ts": dt.datetime(2024, 1, 1, second=d % 60),
                 "html": b"x", "text": DOCS[d], "lang": "en",
                 "doc_id": d} for d in ids]
        (spark.createDataFrame(pd.DataFrame(recs))
         .coalesce(1).write.mode("append").parquet(inp))

    drop([1, 2, 3])
    streaming_percolate(spark, inp, ckpt, out, QUERIES)
    got1 = {(r["query_id"], r["doc_id"]) for r in
            alerts_output(spark, out).collect()}
    assert got1 == {p for p in EXPECT if p[1] in {1, 2, 3}}

    drop([4, 5, 6])
    streaming_percolate(spark, inp, ckpt, out, QUERIES)
    got = {(r["query_id"], r["doc_id"]) for r in
           alerts_output(spark, out).collect()}
    assert got == EXPECT
    # alert rows carry the doc's url + crawl time
    row = [r for r in alerts_output(spark, out).collect()
           if r["doc_id"] == 2][0]
    assert row["url"] == "http://x.example/2"


def test_percolate_case_insensitive(spark):
    """Engine parity: termIds hash lowercased, so percolation matches
    case-insensitively on both the query and the document side."""
    docs = spark.createDataFrame(
        [(1, "Key WINDOW value"), (2, "stream Customer here")],
        "doc_id long, text string")
    got = {(r["query_id"], r["doc_id"]) for r in
           percolate(spark, docs, [(1, "KEY window"),
                                   (2, "stream -CUSTOMER"),
                                   (3, '"key Window"')]).collect()}
    assert got == {(1, 1), (3, 1)}


# ---------------------------------------------------------------------------
# r5: serving-compiler parity — fields, boolean trees, numeric ranges
# (VERDICT r4 item 4)
# ---------------------------------------------------------------------------

DOCS_ATTR = [
    # (doc_id, url, text, lang)
    (1, "http://a.example/p/1.html", "key window stream", "en"),
    (2, "http://b.example/p/2.pdf", "key window", "en"),
    (3, "http://a.example/p/3.html", "stream customer", "da"),
    (4, "http://a.example/deep/", "key lonely words here five", None),
    (5, "http://b.example/x.html", "spam spam key", "en"),
]


def _attr_docs(spark):
    return spark.createDataFrame(
        DOCS_ATTR, "doc_id long, url string, text string, lang string")


def test_percolate_field_constraints(spark):
    qs = [
        (1, "key site:a.example"),        # host equality
        (2, "key ext:pdf"),               # url extension
        (3, "stream gblang:da"),          # language
        (4, "key -site:b.example"),       # negated field
        (5, "gblang:xx"),                 # attribute-only (lang None)
    ]
    got = {(r["query_id"], r["doc_id"]) for r in
           percolate(spark, _attr_docs(spark), qs).collect()}
    assert got == {
        (1, 1), (1, 4),
        (2, 2),
        (3, 3),
        (4, 1), (4, 4),
        (5, 4),
    }


def test_percolate_boolean_trees(spark):
    qs = [
        (1, "key AND (stream OR customer)"),
        (2, "window OR NOT key"),          # default-match arm
        (3, "(key AND NOT spam) OR customer"),
    ]
    got = {(r["query_id"], r["doc_id"]) for r in
           percolate(spark, _attr_docs(spark), qs).collect()}
    assert got == {
        (1, 1),
        (2, 1), (2, 2), (2, 3),            # window docs + docs w/o key
        (3, 1), (3, 2), (3, 3), (3, 4),    # key-not-spam or customer
    }


def test_percolate_numeric_ranges(spark):
    qs = [
        (1, "key gbmin:n_tokens:4"),
        (2, "gbmax:n_tokens:2 key"),
        (3, "gbequal:n_tokens:3"),
    ]
    got = {(r["query_id"], r["doc_id"]) for r in
           percolate(spark, _attr_docs(spark), qs).collect()}
    # n_tokens: d1=3 d2=2 d3=2 d4=5 d5=3
    assert got == {(1, 4), (2, 2), (3, 1), (3, 5)}


def test_percolate_missing_column_raises(spark):
    docs = spark.createDataFrame([(1, "key")], "doc_id long, text string")
    with pytest.raises(ValueError, match="no 'url' column"):
        percolate(spark, docs, [(1, "key site:a.example")]).collect()
    with pytest.raises(ValueError, match="no such column"):
        percolate(spark, docs, [(1, "key gbmin:site_rank:3")]).collect()


def test_percolate_extended_streaming_matches_batch(spark, tmp_path):
    """Streamed percolation over the EXTENDED grammar (boolean tree +
    field + numeric stored queries) must equal the batch run on the
    same rows (exactly-once per micro-batch)."""
    from open_source_search_engine_spark.streaming.percolate import (
        alerts_output,
        streaming_percolate,
    )

    qs = [(1, "key AND (stream OR customer)"),
          (2, "key site:a.example"),
          (3, "gbmin:n_tokens:4")]
    recs = [{"url": u, "warc_ts": dt.datetime(2024, 1, 1),
             "html": b"x", "text": t, "lang": lg, "doc_id": d}
            for d, u, t, lg in DOCS_ATTR]
    wt = spark.createDataFrame(pd.DataFrame(recs))
    batch = {(r["query_id"], r["doc_id"]) for r in
             percolate(spark, wt, qs).collect()}
    assert batch  # the fixture must exercise all three query shapes

    inp = str(tmp_path / "xin")
    ckpt = str(tmp_path / "xck")
    out = str(tmp_path / "xout")
    os.makedirs(inp, exist_ok=True)
    wt.coalesce(1).write.mode("append").parquet(inp)
    streaming_percolate(spark, inp, ckpt, out, qs)
    streamed = {(r["query_id"], r["doc_id"]) for r in
                alerts_output(spark, out).collect()}
    assert streamed == batch
