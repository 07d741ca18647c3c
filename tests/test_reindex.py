"""Query-driven reindex/delete (Msg1c::reindexQuery / PageReindex.h:9-38
analog): delete-by-query tombstones the serving result set of ANY query
shape, respider-by-query emits a re-fetch worklist, and both compose
with incremental generations and compaction."""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest

from open_source_search_engine_spark.index.build import (
    build_index,
    compact_index,
)
from open_source_search_engine_spark.index.reindex import (
    reindex_query,
    reindex_queue,
)
from open_source_search_engine_spark.query.executor import search_all


def _wt(spark, rows):
    recs = []
    for d, text in rows:
        recs.append({
            "url": f"http://s{d % 5}.example/p/{d}.html",
            "warc_ts": dt.datetime(2024, 1, 1, second=d % 60),
            "html": f"<html><body><p>{text}</p></body></html>".encode(),
            "text": text, "lang": "en", "doc_id": d,
        })
    return spark.createDataFrame(pd.DataFrame(recs))


@pytest.fixture()
def reindex_index(spark, small_conf, tmp_path):
    rows = []
    for d in range(1, 41):
        text = "common words here"
        if d % 4 == 0:
            text += " spamword junk"
        if d % 3 == 0:
            text += " keeper token"
        rows.append((d, text))
    d0 = str(tmp_path / "ridx")
    build_index(spark, _wt(spark, rows), d0, conf=small_conf, gen=0)
    return d0


def _ids(spark, idx, q, conf):
    return sorted(r["doc_id"]
                  for r in search_all(spark, idx, q, conf=conf).collect())


def test_delete_by_query(reindex_index, spark, small_conf):
    spam = _ids(spark, reindex_index, "spamword", small_conf)
    assert spam == [d for d in range(1, 41) if d % 4 == 0]
    res = reindex_query(spark, reindex_index, "spamword",
                        conf=small_conf, force_del=True)
    assert res["action"] == "delete" and res["n_docs"] == len(spam)
    # the deleted query's results vanish; other docs stay intact
    assert _ids(spark, reindex_index, "spamword", small_conf) == []
    assert _ids(spark, reindex_index, "common", small_conf) == [
        d for d in range(1, 41) if d % 4 != 0]
    # compaction annihilates the tombstoned postings physically and
    # results stay identical
    compact_index(spark, reindex_index, conf=small_conf)
    assert _ids(spark, reindex_index, "spamword", small_conf) == []
    assert _ids(spark, reindex_index, "common", small_conf) == [
        d for d in range(1, 41) if d % 4 != 0]


def test_delete_by_boolean_and_field_query(reindex_index, spark,
                                           small_conf):
    """The admin lever works through the FULL serving grammar — the
    point of composing over search_all (a site: kill is the reference's
    canonical use, PageReindex.cpp)."""
    res = reindex_query(spark, reindex_index,
                        "spamword AND NOT keeper",
                        conf=small_conf, force_del=True)
    expect = [d for d in range(1, 41) if d % 4 == 0 and d % 3 != 0]
    assert sorted(res["doc_ids"].tolist()) == expect
    left = _ids(spark, reindex_index, "spamword", small_conf)
    assert left == [d for d in range(1, 41) if d % 4 == 0 and d % 3 == 0]
    res2 = reindex_query(spark, reindex_index, "site:s1.example",
                         conf=small_conf, force_del=True)
    assert res2["n_docs"] > 0
    assert _ids(spark, reindex_index, "site:s1.example",
                small_conf) == []


def test_respider_queue(reindex_index, spark, small_conf):
    res = reindex_query(spark, reindex_index, "keeper",
                        conf=small_conf, force_del=False)
    assert res["action"] == "respider"
    q = reindex_queue(spark, reindex_index)
    rows = {r["doc_id"]: r for r in q.collect()}
    assert sorted(rows) == [d for d in range(1, 41) if d % 3 == 0]
    assert all(r["url"].startswith("http://s") for r in rows.values())
    assert all(r["requested_gen"] == res["gen"] for r in rows.values())
    # queueing does NOT mutate the index
    assert _ids(spark, reindex_index, "keeper", small_conf) == sorted(rows)


def test_delete_cap_and_multi_gen(reindex_index, spark, small_conf):
    """max_docs keeps only the top-scored slice; the tombstone gen
    composes with a later incremental build (multi-gen e2e)."""
    res = reindex_query(spark, reindex_index, "spamword",
                        conf=small_conf, force_del=True, max_docs=3)
    assert res["n_docs"] == 3
    remaining = _ids(spark, reindex_index, "spamword", small_conf)
    assert len(remaining) == 10 - 3
    # incremental gen on top: a NEW doc with the spam word arrives
    gen2 = res["gen"] + 1
    build_index(spark, _wt(spark, [(100, "fresh spamword page")]),
                reindex_index, gen=gen2, conf=small_conf)
    ids = _ids(spark, reindex_index, "spamword", small_conf)
    assert 100 in ids and len(ids) == 8
    # second delete-by-query round kills the lot including the new doc
    reindex_query(spark, reindex_index, "spamword", conf=small_conf,
                  force_del=True)
    assert _ids(spark, reindex_index, "spamword", small_conf) == []


def test_noop_on_empty_result(reindex_index, spark, small_conf):
    res = reindex_query(spark, reindex_index, "zzznothere",
                        conf=small_conf, force_del=True)
    assert res["action"] == "noop" and res["n_docs"] == 0
