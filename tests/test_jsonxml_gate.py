"""CT_JSON / CT_XML docs are never term-indexed (BR 20160127 gate,
XmlDoc_Indexing.cpp:252-262): hashAll calls hashUrl(urlOnly=true) —
which stores the url: probe term (XmlDoc_Indexing.cpp:940-967) and
returns — so such docs are findable (and bannable) ONLY by url:."""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest

from open_source_search_engine_spark.functions.gbhash import (
    fielded_term_id,
    hash64_lower_utf8,
)
from open_source_search_engine_spark.index.build import (
    PFX_URL,
    build_index,
    parse_doc,
)
from open_source_search_engine_spark.query.executor import search_all

JSON_URL = "http://api.example.com/feed.json"
XML_URL = "http://api.example.com/feed.xml"


def test_parse_doc_json_url_only():
    rec = parse_doc(JSON_URL, b'{"body": "secret election words"}',
                    None, "en", doc_id=7)
    assert rec["term_ids"] == [
        fielded_term_id(hash64_lower_utf8(JSON_URL), PFX_URL)]
    assert rec["n_tokens"] == 0
    assert rec["lex_words"] == [] and rec["out_hrefs"] == []
    assert rec["title"] == ""


def test_parse_doc_xml_url_only():
    rec = parse_doc(
        XML_URL,
        b'<?xml version="1.0"?><rss><item>secret election</item></rss>',
        None, "en", doc_id=8)
    assert rec["term_ids"] == [
        fielded_term_id(hash64_lower_utf8(XML_URL), PFX_URL)]
    assert rec["n_tokens"] == 0


def test_parse_doc_supplied_text_ignored_for_json():
    # even when the pipeline supplies an extracted-text column, the
    # content-type gate wins (the fork never reaches the hashing loop)
    rec = parse_doc(JSON_URL, b'{"a": 1}', "visible election text",
                    "en", doc_id=9)
    assert len(rec["term_ids"]) == 1


@pytest.fixture(scope="module")
def gate_index(spark, small_conf, tmp_path_factory):
    rows = [
        {"url": "http://news.example.com/story",
         "warc_ts": dt.datetime(2024, 1, 1),
         "html": b"<html><body><p>election report body</p></body></html>",
         "text": None, "lang": "en", "doc_id": 1,
         "ip": "1.2.3.4"},
        {"url": JSON_URL,
         "warc_ts": dt.datetime(2024, 1, 1, 0, 1),
         "html": b'{"body": "election report body"}',
         "text": None, "lang": "en", "doc_id": 2,
         "ip": "1.2.3.4"},
    ]
    d = str(tmp_path_factory.mktemp("jsonxmlidx"))
    build_index(spark, spark.createDataFrame(pd.DataFrame(rows)), d,
                conf=small_conf)
    return d


def test_body_query_skips_json_doc(gate_index, spark, small_conf):
    got = search_all(spark, gate_index, "election", conf=small_conf)
    assert sorted(r["doc_id"] for r in got.collect()) == [1]


def test_url_query_finds_json_doc(gate_index, spark, small_conf):
    got = search_all(spark, gate_index, f"url:{JSON_URL}",
                     conf=small_conf)
    assert sorted(r["doc_id"] for r in got.collect()) == [2]
