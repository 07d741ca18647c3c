"""Query-field batch 2 e2e: charset:, isclean:, gbcontenthash:,
gbtermid:, sitelink:, custom meta-as-text, and the int32 numeric
operators gbsortbyint:/gbrevsortbyint:/gbminint:/gbmaxint:/gbequalint:
(Query.h field codes; build sources XmlDoc_Indexing.cpp:166-176 content
hash, :509-640 hashMetaTags, :828 sitelink, :2371
hashNumberForSortingAsInt32; charset chain GbEncoding.cpp:154-360)."""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest

from open_source_search_engine_spark.functions.gbhash import (
    TERMID_MASK,
    hash64_lower_utf8,
)
from open_source_search_engine_spark.index.build import build_index
from open_source_search_engine_spark.query.executor import search_all


@pytest.fixture(scope="module")
def fields2_index(spark, small_conf, tmp_path_factory):
    latin = ('<html><head><meta charset="iso-8859-1"></head>'
             '<body><p>caf\xe9 cr\xe8me menu</p></body>'
             "</html>").encode("latin-1")
    docs = [
        # (doc_id, url, html)
        (1, "http://a.example/one.html",
         b"<html><head><meta name=\"author\" content=\"asimov\">"
         b"</head><body><p>robot stories collection</p></body></html>"),
        (2, "http://a.example/two.html",
         b"<html><body><p>duplicated body text here</p></body></html>"),
        (3, "http://b.example/three.html",
         b"<html><body><p>duplicated body text here</p></body></html>"),
        (6, "http://a.example/six.html",
         b"<html><body><p>outbound page</p>"
         b"<a href=\"http://linkee.example/page.html\">out</a>"
         b"</body></html>"),
        (4, "http://b.example/dirty.html",
         b"<html><body><p>porn site gallery</p></body></html>"),
        (5, "http://c.example/latin.html", latin),
    ]
    rows = [{
        "url": url,
        "warc_ts": dt.datetime(1970, 1, 1) + dt.timedelta(minutes=did),
        "html": html,
        "text": None, "lang": "en", "doc_id": did,
    } for did, url, html in docs]
    d = str(tmp_path_factory.mktemp("fields2idx"))
    build_index(spark, spark.createDataFrame(pd.DataFrame(rows)), d,
                conf=small_conf)
    return d


def ids(rows):
    return sorted(r["doc_id"] for r in rows)


def test_charset_field(fields2_index, spark, small_conf):
    # meta-declared latin-1 page; every query spelling of the charset
    # canonicalizes to the same term (Query.cpp:1948 IANA round-trip)
    for spelling in ("iso-8859-1", "ISO-8859-1", "latin-1", "csisolatin1"):
        got = search_all(spark, fields2_index, f"charset:{spelling}",
                         conf=small_conf).collect()
        assert ids(got) == [5], spelling
    got = search_all(spark, fields2_index, "charset:utf8",
                     conf=small_conf).collect()
    assert ids(got) == [1, 2, 3, 4, 6]


def test_charset_decode_end_to_end(fields2_index, spark, small_conf):
    # the latin-1 bytes decoded correctly: accented word findable
    got = search_all(spark, fields2_index, "caf\xe9",
                     conf=small_conf).collect()
    assert ids(got) == [5]


def test_isclean_field(fields2_index, spark, small_conf):
    got = search_all(spark, fields2_index, "isclean:1",
                     conf=small_conf).collect()
    assert ids(got) == [1, 2, 3, 5, 6]  # doc 4 is adult
    # the build hashes isclean only for clean docs (Query.h:57) —
    # isclean:0 matches nothing, exactly like the reference
    got0 = search_all(spark, fields2_index, "isclean:0",
                      conf=small_conf).collect()
    assert ids(got0) == []


def test_contenthash_field(fields2_index, spark, small_conf):
    chash = hash64_lower_utf8("duplicated body text here") & TERMID_MASK
    got = search_all(spark, fields2_index, f"gbcontenthash:{chash}",
                     conf=small_conf).collect()
    assert ids(got) == [2, 3]


def test_gbtermid_field(fields2_index, spark, small_conf):
    tid = hash64_lower_utf8("robot") & TERMID_MASK
    got = search_all(spark, fields2_index, f"gbtermid:{tid}",
                     conf=small_conf).collect()
    assert ids(got) == [1]


def test_sitelink_field(fields2_index, spark, small_conf):
    got = search_all(spark, fields2_index, "sitelink:linkee.example",
                     conf=small_conf).collect()
    assert ids(got) == [6]


def test_custom_meta_indexed_as_text(fields2_index, spark, small_conf):
    # hashMetaTags whitelist: author meta words searchable as plain
    # terms (hi.m_prefix = NULL, XmlDoc_Indexing.cpp:627)
    got = search_all(spark, fields2_index, "asimov",
                     conf=small_conf).collect()
    assert ids(got) == [1]


def test_int_sort_fields(fields2_index, spark, small_conf):
    # gbsortbyint: high-to-low, gbrevsortbyint: low-to-high
    hi2lo = [r["doc_id"] for r in
             search_all(spark, fields2_index, "gbsortbyint:warc_ts",
                        conf=small_conf).collect()]
    assert hi2lo == [6, 5, 4, 3, 2, 1]
    lo2hi = [r["doc_id"] for r in
             search_all(spark, fields2_index, "gbrevsortbyint:warc_ts",
                        conf=small_conf).collect()]
    assert lo2hi == [1, 2, 3, 4, 5, 6]
    # values are SECONDS (int32 full resolution,
    # XmlDoc_Indexing.cpp:2371), not the float termlist's minutes
    rows = search_all(spark, fields2_index, "gbsortbyint:warc_ts",
                      conf=small_conf).collect()
    assert [int(r["sort_value"]) for r in rows] == [360, 300, 240, 180, 120, 60]


def test_int_range_and_equal(fields2_index, spark, small_conf):
    got = search_all(spark, fields2_index,
                     "gbminint:warc_ts:90 gbmaxint:warc_ts:250",
                     conf=small_conf).collect()
    assert ids(got) == [2, 3, 4]
    eq = search_all(spark, fields2_index, "gbequalint:warc_ts:180",
                    conf=small_conf).collect()
    assert ids(eq) == [3]
    # float-side equality operator shares the degenerate-range path
    eqf = search_all(spark, fields2_index, "gbequal:warc_ts:3",
                     conf=small_conf).collect()
    assert ids(eqf) == [3]
