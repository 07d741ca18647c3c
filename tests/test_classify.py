"""Naive-Bayes quality classifier: exact differential vs a pure-python
multinomial NB with the same micro-unit rounding, plus the filter gate
and degenerate-input contracts."""

from __future__ import annotations

import math

import pytest

from open_source_search_engine_spark.ops.classify import (
    MICRO,
    nb_score,
    nb_train,
    quality_filter,
)

POS = {
    1: "clean prose with varied careful words",
    2: "careful clean writing and varied structure",
    3: "prose structure words writing careful",
}
NEG = {
    11: "buy buy cheap cheap now",
    12: "cheap buy now now spam",
    13: "spam spam buy cheap",
}
TEST = {
    21: "clean careful prose",           # should score positive
    22: "buy cheap spam",                # should score negative
    23: "zzz unseen tokens only",        # OOV -> prior only
}


def _labeled(spark):
    rows = [(d, t, 1) for d, t in POS.items()] + \
           [(d, t, 0) for d, t in NEG.items()]
    return spark.createDataFrame(rows, "doc_id long, text string, label int")


def _py_model(alpha=1):
    """Reference NB with half-away-from-zero micro rounding (Spark
    round semantics)."""
    def r(x):
        return int(math.copysign(math.floor(abs(x) + 0.5), x))
    c1, c0 = {}, {}
    for t in POS.values():
        for w in t.split():
            c1[w] = c1.get(w, 0) + 1
            c0.setdefault(w, 0)
    for t in NEG.values():
        for w in t.split():
            c0[w] = c0.get(w, 0) + 1
            c1.setdefault(w, 0)
    v = len(set(c1) | set(c0))
    t1, t0 = sum(c1.values()), sum(c0.values())
    model = {w: r((math.log((c1[w] + alpha) / (t1 + alpha * v))
                   - math.log((c0[w] + alpha) / (t0 + alpha * v))) * MICRO)
             for w in c1}
    prior = r(math.log(len(POS) / len(NEG)) * MICRO)
    return model, prior


def test_nb_matches_pure_python(spark):
    model, prior = nb_train(_labeled(spark))
    got = {r["term"]: r["w_micro"] for r in model.collect()}
    want, want_prior = _py_model()
    assert got == want
    assert prior == want_prior

    test_df = spark.createDataFrame(list(TEST.items()),
                                    "doc_id long, text string")
    scores = {r["doc_id"]: r["score_micro"]
              for r in nb_score(test_df, model, prior).collect()}
    for d, t in TEST.items():
        exp = want_prior + sum(want.get(w, 0) for w in t.split())
        assert scores[d] == exp, (d, scores[d], exp)
    assert scores[21] > 0 > scores[22]
    assert scores[23] == want_prior  # OOV-only doc: prior alone


def test_quality_filter_gate(spark):
    model, prior = nb_train(_labeled(spark))
    test_df = spark.createDataFrame(list(TEST.items()),
                                    "doc_id long, text string")
    kept = {r["doc_id"] for r in
            quality_filter(test_df, model, prior).collect()}
    assert 21 in kept and 22 not in kept


def test_nb_needs_both_classes(spark):
    df = spark.createDataFrame([(1, "a b", 1), (2, "c d", 1)],
                               "doc_id long, text string, label int")
    with pytest.raises(ValueError):
        nb_train(df)
