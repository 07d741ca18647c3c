"""New query fields e2e: inurl:/suburl:, ip:, gbcountry:, gbpermalink:,
type:/filetype: (Query.h:33-83 field codes; build sources
XmlDoc_Indexing.cpp:337-420, 1618, 1642)."""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest

from open_source_search_engine_spark.index.build import build_index
from open_source_search_engine_spark.query.executor import search_all


@pytest.fixture(scope="module")
def fields_index(spark, small_conf, tmp_path_factory):
    rows = []
    docs = [
        # (doc_id, url, ip, body)
        (1, "http://news.example.de/politik/2024/05/wahl-ergebnis-bericht",
         "1.2.3.4", "election report body"),
        (2, "http://blog.example.com/?p=123", "1.2.3.4",
         "a blog post body"),
        (3, "http://shop.example.fr/", "5.6.7.8", "front page body"),
        (4, "http://docs.example.com/guide/intro.html", "5.6.7.8",
         "introduction guide body"),
    ]
    for did, url, ip, body in docs:
        rows.append({
            "url": url,
            "warc_ts": dt.datetime(2024, 1, 1) + dt.timedelta(minutes=did),
            "html": f"<html><body><p>{body}</p></body></html>".encode(),
            "text": body, "lang": "en", "doc_id": did, "ip": ip,
        })
    d = str(tmp_path_factory.mktemp("fieldsidx"))
    build_index(spark, spark.createDataFrame(pd.DataFrame(rows)), d,
                conf=small_conf)
    return d


def ids(rows):
    return sorted(r["doc_id"] for r in rows)


def test_inurl_and_suburl(fields_index, spark, small_conf):
    got = search_all(spark, fields_index, "inurl:politik",
                     conf=small_conf).collect()
    assert ids(got) == [1]
    # suburl: maps to the same termlists (Query.cpp:1662)
    got2 = search_all(spark, fields_index, "suburl:guide",
                      conf=small_conf).collect()
    assert ids(got2) == [4]
    # numbers are not hashed for inurl (hi.m_hashNumbers = false)
    got3 = search_all(spark, fields_index, "inurl:2024",
                      conf=small_conf).collect()
    assert ids(got3) == []


def test_ip_field(fields_index, spark, small_conf):
    got = search_all(spark, fields_index, "ip:1.2.3.4",
                     conf=small_conf).collect()
    assert ids(got) == [1, 2]
    got2 = search_all(spark, fields_index, "ip:5.6.7.8",
                      conf=small_conf).collect()
    assert ids(got2) == [3, 4]


def test_gbcountry(fields_index, spark, small_conf):
    got = search_all(spark, fields_index, "gbcountry:de",
                     conf=small_conf).collect()
    assert ids(got) == [1]
    got2 = search_all(spark, fields_index, "gbcountry:us",
                      conf=small_conf).collect()
    assert ids(got2) == [2, 4]  # .com urls default to us
    got3 = search_all(spark, fields_index, "gbcountry:fr",
                      conf=small_conf).collect()
    assert ids(got3) == [3]


def test_gbpermalink(fields_index, spark, small_conf):
    got = search_all(spark, fields_index, "gbpermalink:1",
                     conf=small_conf).collect()
    # doc 1: /2024/05/ digits + hyphens; doc 2: ?p=123
    assert ids(got) == [1, 2]
    got0 = search_all(spark, fields_index, "gbpermalink:0",
                      conf=small_conf).collect()
    assert ids(got0) == [3, 4]


def test_type_and_filetype(fields_index, spark, small_conf):
    got = search_all(spark, fields_index, "type:html",
                     conf=small_conf).collect()
    assert ids(got) == [1, 2, 3, 4]
    got2 = search_all(spark, fields_index, "filetype:pdf",
                      conf=small_conf).collect()
    assert ids(got2) == []


def test_field_combines_with_words(fields_index, spark, small_conf):
    got = search_all(spark, fields_index, "body gbcountry:us",
                     conf=small_conf).collect()
    assert ids(got) == [2, 4]


def test_adult_scorer_and_field():
    """gbisadult (hashIsAdult XmlDoc_Indexing.cpp:1660; scorer
    AdultCheck.cpp:501): matched needles counted once, clean-word
    cancellation, threshold >= 2."""
    from open_source_search_engine_spark.functions.adult import (
        adult_points,
        is_adult,
    )

    assert adult_points("clean text about spark joins") == 0
    # 'sex' alone = 1 point -> not adult
    assert not is_adult("sex education resources")
    # 'essex' cancels its embedded 'sex' (net 0)
    assert adult_points("visit essex county") == 0
    # two strong needles -> adult
    assert is_adult("porn site")          # porn = +2
    assert is_adult("erotic content")     # erotic = +2
    assert is_adult("xxx nude pics")      # 1 + 1
    # needle counted ONCE regardless of occurrences
    assert adult_points("sex sex sex sex") == 1


def test_date_number_fields(fields_index, spark, small_conf):
    """hashDateNumbers (XmlDoc_Indexing.cpp:647): gbspiderdate /
    gbindexdate numeric termlists mirror warc_ts."""
    from open_source_search_engine_spark.query.executor import search_all

    a = [r["doc_id"] for r in
         search_all(spark, fields_index, "gbsortby:warc_ts",
                    conf=small_conf).collect()]
    b = [r["doc_id"] for r in
         search_all(spark, fields_index, "gbsortby:gbspiderdate",
                    conf=small_conf).collect()]
    c = [r["doc_id"] for r in
         search_all(spark, fields_index, "gbsortby:gbindexdate",
                    conf=small_conf).collect()]
    assert a and a == b == c


@pytest.fixture(scope="module")
def numrange_index(spark, small_conf, tmp_path_factory):
    """600 docs with warc_ts ascending in doc_id: multiple 128-doc
    blocks per salt whose per-block value ranges are disjoint."""
    rows = []
    for did in range(1, 601):
        rows.append({
            "url": f"http://n{did % 5}.example/r/{did}.html",
            "warc_ts": (dt.datetime(2024, 1, 1)
                        + dt.timedelta(minutes=did)),
            "html": b"<html><body><p>range probe body</p></body></html>",
            "text": "range probe body", "lang": "en", "doc_id": did,
        })
    d = str(tmp_path_factory.mktemp("numrangeidx"))
    build_index(spark, spark.createDataFrame(pd.DataFrame(rows)), d,
                conf=small_conf)
    return d


def test_numeric_range_block_skip(numrange_index, spark, small_conf):
    """VERDICT r2 #6: gbmin/gbmax probes must skip blocks whose value
    range (codec v3 bmin_pos/bmax_pos) can't contain a match — and the
    pruned result must equal the unpruned ground truth."""
    import calendar

    from open_source_search_engine_spark.query.executor import (
        numeric_block_stats,
    )

    base = calendar.timegm(dt.datetime(2024, 1, 1).timetuple()) // 60
    lo = base + 550  # last 51 docs only
    got = search_all(spark, numrange_index, f"gbmin:warc_ts:{lo}",
                     conf=small_conf).collect()
    assert sorted(r["doc_id"] for r in got) == list(range(550, 601))
    st = numeric_block_stats(spark, numrange_index, "warc_ts",
                             lo=float(lo), hi=None, conf=small_conf)
    assert st["blocks_total"].iloc[0] > st["blocks_decoded"].iloc[0]
    assert st["blocks_decoded"].iloc[0] >= 1
