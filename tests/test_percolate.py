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


def test_percolate_rejects_non_conjunctive(spark):
    with pytest.raises(ValueError):
        compile_stored_queries(spark, [(1, "key AND (a OR b)")])
    with pytest.raises(ValueError):
        compile_stored_queries(spark, [(1, "site:s1.example key")])
    with pytest.raises(ValueError):
        compile_stored_queries(spark, [(1, "gbdocid:3")])


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
