"""Reference-scorer tests (SURVEY.md §4.6 formula, PosdbTable.cpp
semantics) — unit kernels hand-checked + e2e ranking behavior."""

from __future__ import annotations

import numpy as np
import pytest

from open_source_search_engine_spark.config import DEFAULT_CONF, EngineConf
from open_source_search_engine_spark.functions.posdb import (
    HASHGROUP_BODY,
    HASHGROUP_TITLE,
    MAXDENSITYRANK,
    MAXDIVERSITYRANK,
    MAXWORDSPAMRANK,
    pack_ctx,
)
from open_source_search_engine_spark.query.refscore import (
    MAX_TOP,
    SITERANK_MULTIPLIER,
    ScoringWeights,
    combine_score,
    pair_score,
    score_doc,
    single_term_score,
    term_freq_weight,
)

W = ScoringWeights(DEFAULT_CONF)


def ctx(hg=HASHGROUP_BODY, den=MAXDENSITYRANK, div=MAXDIVERSITYRANK,
        spam=MAXWORDSPAMRANK, syn=0):
    return pack_ctx(hg, den, div, spam, syn)


def test_term_freq_weight_linear():
    # scale_linear(x, 0.0, 0.5, 1.0, 0.5): Msg3a.cpp:1003-1008
    assert term_freq_weight(0, 100) == 1.0
    assert term_freq_weight(50, 100) == 0.5
    assert term_freq_weight(100, 100) == 0.5  # clamped
    assert term_freq_weight(25, 100) == pytest.approx(0.75)


def test_single_term_max_ranks():
    # one body occurrence at max ranks: 100 · 1²·1²·1²·1² · tfw²
    c = np.array([ctx()], dtype=np.int64)
    s = single_term_score(c, 1.0, W)
    assert s == pytest.approx(100.0)


def test_single_term_title_beats_body():
    body = single_term_score(np.array([ctx(HASHGROUP_BODY)]), 1.0, W)
    title = single_term_score(np.array([ctx(HASHGROUP_TITLE)]), 1.0, W)
    # title weight 8.0 (Parms.cpp:4067) -> 64x body
    assert title == pytest.approx(body * 64.0)


def test_single_term_distinct_hashgroups_sum():
    both = single_term_score(
        np.array([ctx(HASHGROUP_BODY), ctx(HASHGROUP_TITLE)]), 1.0, W)
    assert both == pytest.approx(100.0 + 6400.0)
    # repeats within one hash-group don't add (best-per-group)
    rep = single_term_score(
        np.array([ctx(HASHGROUP_BODY), ctx(HASHGROUP_BODY)]), 1.0, W)
    assert rep == pytest.approx(100.0)


def test_single_term_density_weight():
    lo = single_term_score(np.array([ctx(den=0)]), 1.0, W)
    hi = single_term_score(np.array([ctx(den=MAXDENSITYRANK)]), 1.0, W)
    # density weight interpolates conf.density_weight_min..max (0.35..1.0)
    assert lo == pytest.approx(100.0 * 0.35 ** 2)
    assert hi == pytest.approx(100.0)


def test_single_term_syn_weight():
    syn = single_term_score(np.array([ctx(syn=1)]), 1.0, W)
    assert syn == pytest.approx(100.0 * 0.9 ** 2)


def test_single_term_tfw_squared():
    s = single_term_score(np.array([ctx()]), 0.5, W)
    assert s == pytest.approx(100.0 * 0.25)


def test_pair_score_adjacent_beats_far():
    c = np.array([ctx()])
    near = pair_score(np.array([10]), c, np.array([12]), c, 2, 1.0, 1.0, W)
    far = pair_score(np.array([10]), c, np.array([200]), c, 2, 1.0, 1.0, W)
    assert near > far
    # adjacent at exactly qdist: dist=max(2,2)-2=0 -> 100/(0+1)
    assert near == pytest.approx(100.0)


def test_pair_score_out_of_order_penalty():
    c = np.array([ctx()])
    in_order = pair_score(np.array([10]), c, np.array([14]), c, 2, 1.0, 1.0, W)
    out_order = pair_score(np.array([14]), c, np.array([10]), c, 2, 1.0, 1.0, W)
    assert in_order > out_order


def test_pair_top10_cap():
    c20 = np.array([ctx()] * 20)
    p = np.arange(20) * 2 + 10
    s = pair_score(p, c20, p + 2, c20, 2, 1.0, 1.0, W)
    # 400 combinations but only MAX_TOP count
    assert s <= MAX_TOP * 100.0 + 1e-9


def test_combine_min_semantics_and_siterank():
    base = combine_score([50.0, 80.0], [60.0], 0)
    assert base == 50.0
    boosted = combine_score([50.0, 80.0], [60.0], 9)
    assert boosted == pytest.approx(50.0 * (9 * SITERANK_MULTIPLIER + 1.0))
    pair_min = combine_score([80.0], [30.0], 0)
    assert pair_min == 30.0


def test_score_doc_integration():
    td = [
        (np.array([10]), np.array([ctx()])),
        (np.array([12]), np.array([ctx()])),
    ]
    s = score_doc(td, [1.0, 1.0], [0, 2], 0, W)
    # singles 100 each; pair 100 -> min = 100
    assert s == pytest.approx(100.0)


@pytest.fixture(scope="module")
def ref_index(spark, small_conf, tmp_path_factory):
    import datetime as dt

    import pandas as pd

    from open_source_search_engine_spark.index.build import build_index

    rows = []
    docs = {
        1: "needle in a short line",
        2: ("needle buried in a much longer sentence that dilutes the "
            "density rank of every word that appears within it"),
        3: "close pair needle thread here",
        4: "needle and then lots of words before thread appears",
    }
    for did, text in docs.items():
        rows.append({
            "url": f"http://s{did}.example/p/{did}.html",
            "warc_ts": dt.datetime(2024, 1, 1),
            "html": f"<html><body><p>{text}</p></body></html>".encode(),
            "text": text, "lang": "en", "doc_id": did,
        })
    d = str(tmp_path_factory.mktemp("refidx"))
    build_index(spark, spark.createDataFrame(pd.DataFrame(rows)), d,
                conf=small_conf, gen=0)
    return d


def test_e2e_reference_density_ranking(ref_index, spark, small_conf):
    from open_source_search_engine_spark.query.executor import search

    conf = EngineConf(scorer="reference", n_buckets=small_conf.n_buckets,
                      n_salts=small_conf.n_salts,
                      salt_df_threshold=small_conf.salt_df_threshold)
    rows = search(spark, ref_index, "needle", k=10, conf=conf).collect()
    ids = [r["doc_id"] for r in rows]
    assert set(ids) == {1, 2, 3, 4}
    # doc 1 (short sentence, high density) must outrank doc 2 (diluted)
    assert ids.index(1) < ids.index(2)


def test_e2e_reference_proximity(ref_index, spark, small_conf):
    from open_source_search_engine_spark.query.executor import search

    conf = EngineConf(scorer="reference", n_buckets=small_conf.n_buckets,
                      n_salts=small_conf.n_salts,
                      salt_df_threshold=small_conf.salt_df_threshold)
    rows = search(spark, ref_index, "needle thread", k=10,
                  conf=conf).collect()
    ids = [r["doc_id"] for r in rows]
    assert set(ids) == {3, 4}
    assert ids[0] == 3  # adjacent pair beats distant pair
