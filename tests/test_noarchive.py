"""meta robots noarchive: getIsNoArchive port quirks, build-side doc
flag, and the fetch_cached (/get cached copy) gate with admin bypass.
Indexing and search are NOT gated — the reference withholds only the
cached copy (PageResults.cpp:2405), never the result itself."""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest

from open_source_search_engine_spark.functions.extractor import (
    is_no_archive,
)


@pytest.mark.parametrize("html,want", [
    ('<meta name="robots" content="noarchive">', True),
    ('<meta name="robots" content="noarchive,nofollow">', True),
    # the reference only checks the START of the content value
    # (strncasecmp(att,"noarchive",9)) — later tokens never match
    ('<meta name="robots" content="nofollow,noarchive">', False),
    # name is PREFIX-matched (strncasecmp with pattern length)
    ('<meta name="robotsfoo" content="noarchive">', True),
    ('<meta name="gigablastopensource" content="noarchive">', True),
    ('<meta name="GigablastOpenSourceBot" content="NOARCHIVE">', True),
    ('<meta name="keywords" content="noarchive">', False),
    # leading whitespace in the value is skipped on both attrs
    ('<meta name=" robots" content="  noarchive">', True),
    # unquoted attributes
    ('<meta name=robots content=noarchive>', True),
    ('<meta content="noarchive">', False),          # no name attr
    ('<meta name="robots">', False),                # no content attr
    ('<p>noarchive robots</p>', False),             # not a meta tag
])
def test_is_no_archive_quirks(html, want):
    assert is_no_archive(f"<html><head>{html}</head></html>") is want


def _corpus(spark):
    rows = []
    for d, (text, na) in {
        1: ("spark merge cached page", False),
        2: ("spark merge private page", True),
        3: ("spark other text here", False),
    }.items():
        head = ('<meta name="robots" content="noarchive">' if na else "")
        html = (f"<html><head>{head}</head><body><p>{text}</p>"
                "</body></html>").encode()
        rows.append({
            "url": f"http://s{d}.example/p/{d}.html",
            "warc_ts": dt.datetime(2024, 1, 1) + dt.timedelta(minutes=d),
            "html": html, "text": text, "lang": "en", "doc_id": d,
        })
    return spark.createDataFrame(pd.DataFrame(rows))


def test_noarchive_flag_and_cached_copy_gate(spark, small_conf, tmp_index):
    from pyspark.sql import functions as F

    from open_source_search_engine_spark.index.build import build_index
    from open_source_search_engine_spark.query.executor import (
        IndexReader,
        fetch_cached,
        search_all,
    )

    src = _corpus(spark)
    build_index(spark, src, tmp_index, conf=small_conf, gen=0)
    rd = IndexReader(spark, tmp_index, small_conf)
    flags = {r["doc_id"]: r["no_archive"] for r in
             rd.docs().select("doc_id", "no_archive").collect()}
    assert flags == {1: 0, 2: 1, 3: 0}

    # indexing/search are NOT gated: the noarchive doc still matches
    got = {r["doc_id"] for r in
           search_all(spark, tmp_index, "spark merge",
                      conf=small_conf).collect()}
    assert got == {1, 2}

    # cached copy: served for 1, withheld for 2, admin bypass serves 2
    r1 = fetch_cached(spark, tmp_index, 1, src, conf=small_conf,
                      reader=rd).collect()
    assert len(r1) == 1 and r1[0]["text"] == "spark merge cached page"
    assert fetch_cached(spark, tmp_index, 2, src, conf=small_conf,
                        reader=rd).count() == 0
    r2 = fetch_cached(spark, tmp_index, 2, src, conf=small_conf,
                      reader=rd, admin=True).collect()
    assert len(r2) == 1 and r2[0]["url"] == "http://s2.example/p/2.html"


def test_wrapper_noarchive_every_preserves_text_invariant(spark):
    from open_source_search_engine_spark.functions.extractor import (
        extract_text,
    )
    from open_source_search_engine_spark.sources.webtext import (
        webtext_from_documents,
    )

    wt = webtext_from_documents(
        spark, "/root/testdata/sf0.001", noarchive_every=9).limit(30)
    for r in wt.collect():
        assert extract_text(bytes(r["html"])) == r["text"]
        assert is_no_archive(bytes(r["html"]).decode()) == \
            (r["doc_id"] % 9 == 0)
