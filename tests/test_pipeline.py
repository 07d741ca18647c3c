"""Composed training-corpus curation pipeline (ops/pipeline.py)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from open_source_search_engine_spark.ops.pipeline import (
    curate_training_corpus,
    training_corpus,
)

# A text that passes every Gopher A1.1 rule: 60 words, mean word len
# ~3.9, no symbols, all-alpha words, plenty of required stopwords,
# no ellipsis/bullet lines.
GOOD_SENT = ("the quick brown fox jumps over the lazy dog and runs "
             "into the wide green field for fun and then sleeps")
GOOD = " ".join([GOOD_SENT] * 3)
# Same quality shape but with a planted email address.
GOOD_PII = GOOD + " contact me at alice.smith@example.org please"
# German: fails the lang stage (profile hits on der/die/und...).
GERMAN = " ".join(["der hund und die katze sind nicht ein problem "
                   "mit den leuten zu reden"] * 5)
# English but too short: fails ok_words (< 50 tokens).
SHORT = "the cat sat on the mat and it was fine for a while"
# Kept doc whose first 13 tokens also appear in the eval set.
CONTAM = GOOD_SENT + " some extra trailing words to vary the text " \
    + GOOD_SENT


def _docs(spark):
    rows = [
        (1, GOOD),          # kept
        (2, GOOD),          # exact dup of 1 -> exact_dup
        (3, GERMAN),        # lang
        (4, SHORT),         # quality
        (5, CONTAM),        # contaminated
        (6, GOOD_PII),      # kept, with PII
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _eval(spark):
    # shares the first 13 tokens of CONTAM (and of GOOD... careful:
    # GOOD repeats GOOD_SENT, so its shingles include the eval one too)
    ev = " ".join(GOOD_SENT.split()[:13])
    return spark.createDataFrame([(100, ev)], "doc_id long, text string")


def _eval_distinct(spark):
    # a 13-gram unique to CONTAM: spans the seam between the trailing
    # filler and the repeated sentence
    toks = CONTAM.split()
    seam = toks.index("some")
    ev = " ".join(toks[seam:seam + 13])
    return spark.createDataFrame([(100, ev)], "doc_id long, text string")


def test_stage_verdicts(spark):
    audit = curate_training_corpus(
        _docs(spark), _eval_distinct(spark)).collect()
    by_id = {r["doc_id"]: r for r in audit}
    assert len(by_id) == 6
    assert by_id[1]["drop_stage"] == "kept" and by_id[1]["kept"]
    assert by_id[2]["drop_stage"] == "exact_dup"
    assert by_id[3]["drop_stage"] == "lang"
    assert by_id[3]["pred_lang"] == "de"
    assert by_id[4]["drop_stage"] == "quality"
    assert by_id[5]["drop_stage"] == "contaminated"
    assert by_id[6]["drop_stage"] == "kept"
    # flags not evaluated for earlier-stage drops
    assert not by_id[3]["exact_dup"] and not by_id[3]["contaminated"]
    assert not by_id[4]["exact_dup"] and not by_id[4]["contaminated"]
    # dup keeps the smallest doc_id
    assert not by_id[1]["exact_dup"] and by_id[2]["exact_dup"]


def test_metrics_only_for_kept(spark):
    audit = curate_training_corpus(
        _docs(spark), _eval_distinct(spark)).collect()
    by_id = {r["doc_id"]: r for r in audit}
    for i in (2, 3, 4, 5):
        assert by_id[i]["n_tokens"] is None
        assert by_id[i]["n_pii"] is None
        assert by_id[i]["clean_md5"] is None
    assert by_id[1]["n_tokens"] == len(GOOD.split())
    assert by_id[1]["n_pii"] == 0
    assert by_id[1]["clean_md5"] == hashlib.md5(
        GOOD.encode()).hexdigest()
    # the PII doc's email is redacted before hashing/counting
    clean = GOOD_PII.replace("alice.smith@example.org", "<EMAIL>")
    assert by_id[6]["n_pii"] == 1
    assert by_id[6]["clean_md5"] == hashlib.md5(
        clean.encode()).hexdigest()
    assert by_id[6]["n_tokens"] == len(clean.split())


def test_dup_group_shares_contamination_verdict(spark):
    # when the eval set hits the duplicated text, the keeper is
    # contaminated and the dup still reports drop_stage=exact_dup
    # with contaminated=True (same text, same shingles)
    audit = curate_training_corpus(_docs(spark), _eval(spark)).collect()
    by_id = {r["doc_id"]: r for r in audit}
    assert by_id[1]["drop_stage"] == "contaminated"
    assert by_id[2]["drop_stage"] == "exact_dup"
    assert by_id[2]["contaminated"]
    # CONTAM shares the eval 13-gram too (GOOD_SENT prefix)
    assert by_id[5]["drop_stage"] == "contaminated"


def test_deliverable_matches_audit(spark):
    docs, ev = _docs(spark), _eval_distinct(spark)
    audit = curate_training_corpus(docs, ev)
    corpus = training_corpus(docs, ev)
    kept_ids = {r["doc_id"] for r in audit.where("kept").collect()}
    rows = corpus.collect()
    assert {r["doc_id"] for r in rows} == kept_ids == {1, 6}
    by_id = {r["doc_id"]: r for r in rows}
    assert "<EMAIL>" in by_id[6]["clean_text"]
    aud = {r["doc_id"]: r for r in audit.collect()}
    for i in kept_ids:
        assert by_id[i]["n_tokens"] == aud[i]["n_tokens"]
        assert (hashlib.md5(by_id[i]["clean_text"].encode()).hexdigest()
                == aud[i]["clean_md5"])


# ---------------------------------------------------------------------------
# r5: optional MinHash-LSH fuzzy-dedup stage (VERDICT r4 item 10)
# ---------------------------------------------------------------------------

# near-identical variants of GOOD: one word appended/substituted, so
# md5 differs but 3-shingle Jaccard stays >= 0.5
NEAR_A = GOOD + " epilogue"
NEAR_B = GOOD.replace("lazy dog", "lazy cat", 1)


# a second quality-passing text sharing NO 3-shingles with GOOD
OTHER = " ".join(["many small boats sail near the old stone pier and "
                  "gulls circle above it to watch the calm grey water"] * 3)


def _fuzzy_docs(spark):
    rows = [
        (1, GOOD),     # keeper
        (2, NEAR_A),   # fuzzy dup of 1 (not exact)
        (3, NEAR_B),   # fuzzy dup of 1
        (4, OTHER),    # distinct kept doc
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_fuzzy_stage_off_by_default(spark):
    out = {r["doc_id"]: r for r in curate_training_corpus(
        _fuzzy_docs(spark), _eval_distinct(spark)).collect()}
    assert all(not r["fuzzy_dup"] for r in out.values())
    assert out[2]["drop_stage"] == "kept"  # near-dup survives w/o stage


def test_fuzzy_stage_drops_near_dups(spark):
    out = {r["doc_id"]: r for r in curate_training_corpus(
        _fuzzy_docs(spark), _eval_distinct(spark),
        fuzzy_threshold=0.5).collect()}
    assert out[1]["drop_stage"] == "kept"          # smallest id kept
    assert out[2]["drop_stage"] == "fuzzy_dup"
    assert out[3]["drop_stage"] == "fuzzy_dup"
    assert out[4]["drop_stage"] == "kept"          # distinct text kept
    assert out[2]["fuzzy_dup"] and out[3]["fuzzy_dup"]
    assert not out[1]["fuzzy_dup"] and not out[4]["fuzzy_dup"]
    # deliverable matches the audit with the stage on
    corpus = {r["doc_id"] for r in training_corpus(
        _fuzzy_docs(spark), _eval_distinct(spark),
        fuzzy_threshold=0.5).collect()}
    assert corpus == {1, 4}


def test_fuzzy_stage_after_exact(spark):
    """Exact dups drop at the exact stage; only post-exact survivors
    enter the fuzzy pass (an exact copy of a fuzzy-dup must say
    exact_dup, not fuzzy_dup)."""
    rows = [(1, GOOD), (2, NEAR_A), (3, NEAR_A)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r["drop_stage"] for r in curate_training_corpus(
        docs, _eval_distinct(spark), fuzzy_threshold=0.5).collect()}
    assert out == {1: "kept", 2: "fuzzy_dup", 3: "exact_dup"}
