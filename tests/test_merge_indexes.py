"""Cross-index consolidation (index/build.py merge_indexes)."""

from __future__ import annotations

import dataclasses
import datetime as dt

import pandas as pd
import pytest
from pyspark.sql import functions as F

from open_source_search_engine_spark.config import EngineConf
from open_source_search_engine_spark.index.build import (
    build_index,
    delete_docs,
    merge_indexes,
)
from open_source_search_engine_spark.query.executor import (
    IndexReader,
    search_all,
)

DOCS_A = {
    1: "spark shuffle partition merge",
    2: "spark spark spark index",
    3: "posting merge engine ranking spark",
    4: "query engine score proximity",
}
DOCS_B = {
    11: "spark merge",
    12: "the one ranking",
    13: "unrelated words entirely here",
    14: "1 ranking score spark",
}


def _wt(spark, docs):
    rows = []
    for did, text in docs.items():
        rows.append({
            "url": f"http://s{did % 3}.example/p/{did}.html",
            "warc_ts": dt.datetime(2024, 1, 1) + dt.timedelta(minutes=did),
            "html": f"<html><body><p>{text}</p></body></html>".encode(),
            "text": text, "lang": "en", "doc_id": did,
        })
    return spark.createDataFrame(pd.DataFrame(rows))


@pytest.fixture(scope="module")
def merged(spark, small_conf, tmp_path_factory):
    base = tmp_path_factory.mktemp("mi")
    da, db, dm, du = (str(base / x) for x in ("a", "b", "m", "union"))
    build_index(spark, _wt(spark, DOCS_A), da, conf=small_conf)
    build_index(spark, _wt(spark, DOCS_B), db, conf=small_conf)
    build_index(spark, _wt(spark, {**DOCS_A, **DOCS_B}), du,
                conf=small_conf)
    meta = merge_indexes(spark, [da, db], dm, conf=small_conf)
    return da, db, dm, du, meta


def test_merged_matches_union_build(merged, spark, small_conf):
    """Querying the merged index returns the SAME (doc_id, score)
    rows as an index built from the union corpus in one shot — df,
    cf, n_docs and avgdl all consolidate exactly."""
    _, _, dm, du, meta = merged
    assert meta["n_docs"] == len(DOCS_A) + len(DOCS_B)
    for q in ["spark", "spark merge", "ranking -engine",
              '"spark merge"', "(spark AND merge) OR ranking"]:
        a = [(r["doc_id"], round(r["score"], 9)) for r in
             search_all(spark, dm, q, conf=small_conf)
             .orderBy("doc_id").collect()]
        b = [(r["doc_id"], round(r["score"], 9)) for r in
             search_all(spark, du, q, conf=small_conf)
             .orderBy("doc_id").collect()]
        assert a == b, q


def test_merged_reader_surface(merged, spark, small_conf):
    _, _, dm, du, _ = merged
    rd = IndexReader(spark, dm, small_conf)
    ru = IndexReader(spark, du, small_conf)
    assert rd.n_docs == ru.n_docs == 8
    from open_source_search_engine_spark.functions.gbhash import term_id
    tid = term_id("spark")
    assert rd.df_of([tid]) == ru.df_of([tid])
    lex = {r["term"] for r in rd.lexicon().collect()}
    assert {"spark", "ranking", "unrelated"} <= lex


def test_merge_validations(merged, spark, small_conf, tmp_path):
    da, db, _, _, _ = merged
    # overlapping doc ids
    dc = str(tmp_path / "dupe")
    build_index(spark, _wt(spark, {1: "spark again"}), dc,
                conf=small_conf)
    with pytest.raises(ValueError, match="disjoint"):
        merge_indexes(spark, [da, dc], str(tmp_path / "out1"),
                      conf=small_conf)
    # layout mismatch
    other = dataclasses.replace(small_conf, n_buckets=2)
    dd = str(tmp_path / "nb2")
    build_index(spark, _wt(spark, {21: "spark misfit"}), dd, conf=other)
    with pytest.raises(ValueError, match="n_buckets"):
        merge_indexes(spark, [da, dd], str(tmp_path / "out2"),
                      conf=small_conf)
    # multi-gen / tombstoned inputs must compact first
    de = str(tmp_path / "twogen")
    build_index(spark, _wt(spark, {31: "spark one"}), de,
                conf=small_conf, gen=0)
    build_index(spark, _wt(spark, {32: "spark two"}), de,
                conf=small_conf, gen=1)
    with pytest.raises(ValueError, match="compact"):
        merge_indexes(spark, [da, de], str(tmp_path / "out3"),
                      conf=small_conf)
    with pytest.raises(ValueError, match="two input"):
        merge_indexes(spark, [da], str(tmp_path / "out4"),
                      conf=small_conf)


def test_merge_sketches_max_merge(spark, tmp_path):
    """When every input carries term sketches at one precision, the
    merged index's registers are the elementwise max (HLL union) and
    serve the cardinality estimator."""
    from open_source_search_engine_spark.query.executor import (
        estimate_and_cardinality,
    )

    conf = EngineConf(n_buckets=4, n_salts=2, salt_df_threshold=10_000,
                      term_sketch_p=8)
    da, db, dm = (str(tmp_path / x) for x in ("a", "b", "m"))
    build_index(spark, _wt(spark, DOCS_A), da, conf=conf)
    build_index(spark, _wt(spark, DOCS_B), db, conf=conf)
    meta = merge_indexes(spark, [da, db], dm, conf=conf)
    assert meta["conf"]["term_sketch_p"] == 8
    rows = {r["subset"]: r["estimate"] for r in estimate_and_cardinality(
        spark, dm, ["spark", "ranking"], conf=conf).collect()}
    # spark in 6 docs, ranking in 3, intersection 2 — p=8 on tiny sets
    # is near-exact (linear counting regime)
    assert abs(rows["spark"] - 6) <= 1
    assert abs(rows["ranking"] - 3) <= 1
    assert abs(rows["ranking&spark"] - 2) <= 1.5
