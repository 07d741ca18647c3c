"""SiteGetter port (functions/sitegetter.py): path-defined sites —
unit parity with SiteGetter.cpp:449-594 setRecognizedSite (incl. the
examples cited in its comments) and the e2e criterion from VERDICT r4
item 8: on a shared ~user host, site: queries and site clustering
distinguish the path-sites while host-level queries keep working."""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest

from open_source_search_engine_spark.functions.sitegetter import (
    get_site,
    recognized_site,
)


@pytest.mark.parametrize("url,site", [
    # C++ comment examples (SiteGetter.cpp:513-518, :505)
    ("http://www.cits.ucsb.edu/users/michael-osborne",
     "www.cits.ucsb.edu/users/michael-osborne/"),
    ("http://www.cits.ucsb.edu/users/michael-osborne/",
     "www.cits.ucsb.edu/users/michael-osborne/"),
    ("http://stackoverflow.com/users/271376/sigterm",
     "stackoverflow.com/users/271376/"),
    ("http://www.rus-obr.ru/users/maksim-sokolov",
     "www.rus-obr.ru/users/maksim-sokolov/"),
    # ~user home dirs
    ("http://xyz.com/~fred/page.html", "xyz.com/~fred/"),
    ("http://xyz.com/~fred", "xyz.com/~fred/"),
    # member variants
    ("http://forum.example.org/member.php?u=1234",
     "forum.example.org/member.php?u=1234/"),
    ("http://a.example/members/bob/post/7", "a.example/members/bob/"),
    # homesteads: first path segment
    ("http://twitter.com/jack", "twitter.com/jack/"),
    ("http://twitter.com/jack/status/99", "twitter.com/jack/"),
    ("http://twitter.com/", "twitter.com"),
    ("http://vimeo.com/someuser/videos", "vimeo.com/someuser/"),
])
def test_recognized_site(url, site):
    assert recognized_site(url) == site
    assert get_site(url) == site


@pytest.mark.parametrize("url", [
    "http://xyz.com/users/",          # no username after the prefix
    "http://xyz.com/profile/fred",    # prefix not in the hardcoded set
    "http://xyz.com/page.html",
    "http://site0001.example/p/000001.html",  # the synthetic grammar
])
def test_unrecognized_falls_back_to_host(url):
    assert recognized_site(url) is None
    host = url.split("://", 1)[1].split("/", 1)[0]
    assert get_site(url) == host


def _shared_host_corpus(spark):
    rows = []
    did = 1
    for user in ("fred", "jane"):
        for i in range(3):
            rows.append({
                "url": f"http://shared.example/~{user}/p{i}.html",
                "warc_ts": dt.datetime(2024, 1, 1),
                "html": (f"<html><body><p>homepage of {user} "
                         f"number {i} alpha beta</p></body></html>"
                         ).encode(),
                "text": f"homepage of {user} number {i} alpha beta",
                "lang": "en", "doc_id": did})
            did += 1
    for i in range(3):
        rows.append({
            "url": f"http://shared.example/p/{i}.html",
            "warc_ts": dt.datetime(2024, 1, 1),
            "html": ("<html><body><p>plain page alpha beta"
                     "</p></body></html>").encode(),
            "text": "plain page alpha beta",
            "lang": "en", "doc_id": did})
        did += 1
    return spark.createDataFrame(pd.DataFrame(rows))


def test_path_sites_e2e(spark, small_conf, tmp_path):
    from open_source_search_engine_spark.index.build import build_index
    from open_source_search_engine_spark.ops.sitestats import site_table
    from open_source_search_engine_spark.query.executor import (
        IndexReader,
        search_all,
        search_clustered,
    )

    d = str(tmp_path / "siteidx")
    build_index(spark, _shared_host_corpus(spark), d, conf=small_conf)

    def ids(q):
        return sorted(r["doc_id"] for r in
                      search_all(spark, d, q, conf=small_conf).collect())

    # host-level site: still matches EVERYTHING on the host
    assert ids("site:shared.example") == list(range(1, 10))
    # path-site queries select one home dir each
    assert ids("site:shared.example/~fred/") == [1, 2, 3]
    assert ids("site:shared.example/~jane/") == [4, 5, 6]
    # clustering distinguishes the path-sites: clustered top-k over a
    # term every doc matches returns one representative per SITE —
    # fred, jane, and the plain host = 3 clusters
    rows = search_clustered(spark, d, "alpha", k=9, max_per_site=1,
                            conf=small_conf).collect()
    assert len(rows) == 3
    # the tagdb rollup keys on the path-site too
    rd = IndexReader(spark, d, small_conf)
    sites = {r["site"]: r["n_docs"]
             for r in site_table(rd.docs()).collect()}
    assert sites == {"shared.example/~fred/": 3,
                     "shared.example/~jane/": 3,
                     "shared.example": 3}
