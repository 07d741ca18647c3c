"""Speller tests (Speller.cpp analog: popularity-ranked edit-1
correction from the index lexicon via SymSpell delete join)."""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest

from open_source_search_engine_spark.index.build import build_index
from open_source_search_engine_spark.query.spell import (
    _deletes,
    suggestions,
)


def test_deletes():
    assert _deletes("abc") == ["abc", "bc", "ac", "ab"]
    assert _deletes("a") == ["a", ""]


@pytest.fixture(scope="module")
def spell_index(spark, small_conf, tmp_path_factory):
    docs = {
        1: "customer orders spark engine",
        2: "customer invoice spark",
        3: "custom paint spark",
        4: "costumes for sale",
    }
    rows = [{"url": f"http://s.example/p/{d}.html",
             "warc_ts": dt.datetime(2024, 1, 1),
             "html": f"<html><body><p>{t}</p></body></html>".encode(),
             "text": t, "lang": "en", "doc_id": d}
            for d, t in docs.items()]
    idx = str(tmp_path_factory.mktemp("spellidx"))
    build_index(spark, spark.createDataFrame(pd.DataFrame(rows)), idx,
                conf=small_conf, gen=0)
    return idx


def test_suggestions_rank_by_df(spell_index, spark):
    got = {r["word"]: (r["suggestion"], r["df"]) for r in
           suggestions(spark, spell_index,
                       ["custoner", "spark", "qqqq", "Enginx"]).collect()}
    # substitution distance 1, highest df wins ('customer' df=2 beats
    # nothing else within distance 1 of 'custoner')
    assert got["custoner"] == ("customer", 2)
    # in-lexicon word suggests itself
    assert got["spark"] == ("spark", 3)
    # case-folded probe; 'enginx' -> 'engine' (sub, distance 1)
    assert got["enginx"] == ("engine", 1)
    # nothing within distance 1 -> null suggestion (docstring contract)
    assert got["qqqq"] == (None, None)


def test_suggestion_matches_brute_force(spell_index, spark):
    """SymSpell candidates + exact levenshtein filter == brute-force
    levenshtein scan of the vocabulary (the oracle's formulation)."""
    from pyspark.sql import functions as F

    from open_source_search_engine_spark.query.executor import IndexReader

    rd = IndexReader(spark, spell_index)
    vocab = rd.lexicon().join(rd.term_stats(), "term_id") \
        .select("term", "df")
    for w in ("custoner", "spork", "paind"):
        brute = (vocab.where(F.levenshtein(F.lit(w), F.col("term")) <= 1)
                 .orderBy(F.col("df").desc(), F.col("term").asc())
                 .limit(1).collect())
        got = suggestions(spark, spell_index, [w]).collect()
        if brute:
            assert got and got[0]["suggestion"] == brute[0]["term"]
        else:
            assert not got


def test_suggest_prefix(spark, small_conf, tmp_index):
    """Autocomplete: df-desc ranking under the prefix, term-asc ties,
    k truncation, case-folded prefix, no match -> empty."""
    from open_source_search_engine_spark.index.build import build_index
    from open_source_search_engine_spark.query.spell import suggest_prefix
    from open_source_search_engine_spark.sources.webtext import synthesize

    build_index(spark, synthesize(spark, 60), tmp_index, conf=small_conf)
    got = suggest_prefix(spark, tmp_index, "s", k=3).collect()
    assert 0 < len(got) <= 3
    dfs = [r["df"] for r in got]
    assert dfs == sorted(dfs, reverse=True)
    assert all(r["term"].startswith("s") for r in got)
    # ties break term-ascending within equal df
    for x, y in zip(got, got[1:]):
        if x["df"] == y["df"]:
            assert x["term"] < y["term"]
    assert suggest_prefix(spark, tmp_index, "ZZQX", k=3).count() == 0
