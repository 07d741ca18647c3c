"""Differential pin of the reference-scorer DuckDB oracle
(`__spark_entry__._refscore_oracle_sql`) against the engine: the SQL
twin must reproduce the float32 score of EVERY matching doc bit-exactly
on the body-only base index — AND and boolean query shapes (VERDICT r4
item 2: search_reference / search_bool_reference exit `no_oracle`).

Runs at sf0.001 (500 docs) so the whole-doc >25%-spam bump path is
covered (it fires on exactly one sf0.001 doc) alongside the per-word
spam scan, the sliding-window state enumeration, and the NULL-winner
pair-death drop. Any violated corpus assumption (frag demotion,
plen>50 truncation, position grammar drift) surfaces here as a value
mismatch.
"""
from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))

SF_DIR = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.exists(f"{SF_DIR}/documents.parquet"),
    reason="driver testdata not present")


@pytest.fixture(scope="module")
def base_index(spark):
    import __spark_entry__ as se

    return se._ensure_base_index(spark, SF_DIR)


@pytest.mark.parametrize("query,membership", [
    ("key window stream", "pr.has1 and pr.has2 and pr.has3"),
    ("key AND (window OR stream)", "pr.has1 and (pr.has2 or pr.has3)"),
])
def test_refscore_oracle_bit_exact(spark, base_index, query, membership):
    import __spark_entry__ as se
    from open_source_search_engine_spark.config import EngineConf
    from open_source_search_engine_spark.query.executor import search_all

    eng = (search_all(spark, base_index, query,
                      conf=EngineConf(scorer="reference"))
           .select("doc_id", "score").toPandas())
    eng_map = dict(zip(eng.doc_id.astype(int), eng.score))
    assert eng_map, "query matched no docs — fixture corpus changed?"

    con = duckdb.connect()
    con.execute("create view documents as select * from "
                f"read_parquet('{SF_DIR}/documents.parquet')")
    sql = se._refscore_oracle_sql(["key", "window", "stream"], membership)
    got = con.execute(sql).fetchdf()
    got_map = dict(zip(got.doc_id.astype(int), got.score))

    assert set(got_map) == set(eng_map)
    mismatches = {d: (eng_map[d], got_map[d]) for d in eng_map
                  if eng_map[d] != got_map[d]}
    assert not mismatches, f"non-bit-exact scores: {mismatches}"


def test_refscore_oracle_covers_spam_bump():
    """The sf0.001 corpus must keep exercising the whole-doc 99% bump
    (XmlDoc.cpp:19773 >25%-spam path) — if the testdata ever changes
    and no doc trips it, this test flags the lost coverage rather than
    letting the oracle's bump branch go dark."""
    import pandas as pd

    from open_source_search_engine_spark.functions.tokenizer import (
        tokenize,
    )
    from open_source_search_engine_spark.functions.wordspam import (
        word_spam_ranks,
    )

    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    bumped = 0
    for _, r in docs.iterrows():
        html = ("<html><head></head><body><p>"
                + (r.text or "empty").strip() + "</p></body></html>")
        t = tokenize(html, has_tags=True)
        sp = word_spam_ranks(t)
        alnum = [k for k in range(len(t)) if t.wids[k]]
        if alnum and all(int(sp[k]) == 0 for k in alnum):
            bumped += 1
    assert bumped >= 1
