"""Word-spam vector tests (XmlDoc.cpp:19773 getWordSpamVec, :20186
setSpam, :20283 getProbSpam semantics incl. integer arithmetic)."""

from __future__ import annotations

import numpy as np

from open_source_search_engine_spark.functions.tokenizer import (
    ALNUM,
    MAXWORDSPAMRANK,
    tokenize,
)
from open_source_search_engine_spark.functions.wordspam import (
    get_prob_spam,
    word_spam_ranks,
)


def ranks_of(text: str, word: str) -> list[int]:
    t = tokenize(text)
    r = word_spam_ranks(t)
    return [int(r[i]) for i in range(len(t))
            if t.kinds[i] == ALNUM and t.words[i].lower() == word]


def test_natural_text_clean():
    text = ("the quick brown fox jumps over the lazy dog near the river "
            "bank where children play football every sunny afternoon")
    t = tokenize(text)
    r = word_spam_ranks(t)
    alnum = [int(r[i]) for i in range(len(t)) if t.kinds[i] == ALNUM]
    assert all(v == MAXWORDSPAMRANK for v in alnum)


def test_evenly_spaced_repeats_are_spam():
    # "buy" every 2nd word, 31 times: perfectly regular spacing ->
    # getProbSpam dev ~ 0 -> 100% -> rank 0 (except spared occurrences)
    text = "buy " + " ".join(f"w{i} buy" for i in range(30))
    rs = ranks_of(text, "buy")
    assert min(rs) == 0
    assert sum(1 for v in rs if v == 0) >= len(rs) - 3


def test_two_occurrences_never_spam():
    text = "alpha beta alpha gamma delta epsilon zeta eta theta iota"
    assert all(v == MAXWORDSPAMRANK for v in ranks_of(text, "alpha"))


def test_num_repeat_spam_rule():
    # word >= 20% of ALL tokens (punct included — words->getNumWords()):
    # all but profile[0] (the LAST occurrence) get 100% spam
    # (setSpam :20197-20203)
    text = "spam spam spam spam alpha beta"  # 6 alnum + 5 punct = 11
    rs = ranks_of(text, "spam")
    assert rs == [0, 0, 0, MAXWORDSPAMRANK]


def test_get_prob_spam_regular_vs_irregular():
    # perfectly regular profile (descending): dev 0 -> 100
    reg = list(range(60, 0, -2))[:10]
    assert get_prob_spam(reg, len(reg), 1) == 100
    # irregular: natural-ish gaps -> below 100
    irr = [97, 80, 61, 45, 44, 20, 9, 5, 2, 0]
    assert get_prob_spam(irr, len(irr), 1) < 100
    # tiny profiles never spam
    assert get_prob_spam([5, 3], 2, 1) == 0


def test_spam_ranks_flow_into_index_ctx(spark, small_conf, tmp_path_factory):
    import datetime as dt

    import pandas as pd

    from open_source_search_engine_spark.config import EngineConf
    from open_source_search_engine_spark.index.build import build_index
    from open_source_search_engine_spark.query.executor import search

    # doc 1: "offer" spammed 20x evenly; doc 2: "offer" once, natural
    spam_body = "offer " + " ".join(f"pad{i} offer" for i in range(19))
    nat_body = "a genuine offer of help arrived this quiet morning"
    rows = []
    for did, body in ((1, spam_body), (2, nat_body)):
        rows.append({
            "url": f"http://s{did}.example/p/{did}.html",
            "warc_ts": dt.datetime(2024, 1, 1),
            "html": f"<html><body><p>{body}</p></body></html>".encode(),
            "text": body, "lang": "en", "doc_id": did,
        })
    d = str(tmp_path_factory.mktemp("spamidx"))
    build_index(spark, spark.createDataFrame(pd.DataFrame(rows)), d,
                conf=small_conf)
    ref = EngineConf(scorer="reference", n_buckets=small_conf.n_buckets,
                     n_salts=small_conf.n_salts,
                     salt_df_threshold=small_conf.salt_df_threshold)
    got = search(spark, d, "offer", k=10, conf=ref).collect()
    ids = [r["doc_id"] for r in got]
    # the natural doc must outrank the spammed one in reference mode
    # (spam rank ~0 -> wordSpamWeight 1/15 squared)
    assert ids.index(2) < ids.index(1)
