"""Per-term docid HLL sketches as an index artifact + the planner's
conjunctive-cardinality estimate (estimate_and_cardinality): built
conf-gated in stage B, max-merged across generations and through
compaction, read without touching a single posting blob."""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest

from open_source_search_engine_spark.config import EngineConf
from open_source_search_engine_spark.index.build import (
    build_index,
    compact_index,
)
from open_source_search_engine_spark.query.executor import (
    IndexReader,
    estimate_and_cardinality,
)

SK_CONF = EngineConf(n_buckets=4, n_salts=2, salt_df_threshold=10_000,
                     term_sketch_p=8)

N = 600
A_SET = set(range(0, 400))          # 'alpha' docs
B_SET = set(range(200, 600))        # 'beta' docs


def _corpus(spark, ids, suffix=""):
    rows = []
    for d in ids:
        words = ["filler"]
        if d in A_SET:
            words.append("alpha")
        if d in B_SET:
            words.append("beta")
        body = " ".join(words) + suffix
        rows.append({
            "url": f"http://s{d % 5}.example/p/{d}.html",
            "warc_ts": dt.datetime(2024, 1, 1) + dt.timedelta(seconds=d),
            "html": f"<html><body><p>{body}</p></body></html>".encode(),
            "text": body, "lang": "en", "doc_id": d,
        })
    return spark.createDataFrame(pd.DataFrame(rows))


@pytest.fixture(scope="module")
def sk_index(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("skidx"))
    build_index(spark, _corpus(spark, range(N)), d, conf=SK_CONF, gen=0)
    return d


def _est_map(df):
    return {r["subset"]: (r["n_keys"], r["estimate"]) for r in df.collect()}


def test_sketch_estimates_near_truth_and_deterministic(spark, sk_index):
    got = _est_map(estimate_and_cardinality(
        spark, sk_index, ["alpha", "beta"], conf=SK_CONF))
    assert set(got) == {"alpha", "beta", "alpha,beta", "alpha&beta"}
    truth = {"alpha": len(A_SET), "beta": len(B_SET),
             "alpha,beta": len(A_SET | B_SET),
             "alpha&beta": len(A_SET & B_SET)}
    for k, t in truth.items():
        nk, est = got[k]
        # p=8 single-set std error ~6.5%, but n in [m, 5m] sits in
        # HLL's linear-counting/raw transition (known bias region) and
        # IE compounds union errors: 20%/30% bounds are the honest
        # envelope, determinism below is the real contract
        tol = 0.3 if k == "alpha&beta" else 0.2
        assert abs(est - t) <= tol * t, (k, est, t)
    assert got["alpha&beta"][0] == 2
    # deterministic md5 registers: a second run is bit-identical
    again = _est_map(estimate_and_cardinality(
        spark, sk_index, ["alpha", "beta"], conf=SK_CONF))
    assert again == got


def test_single_term_estimate_matches_grouped_hll(spark, sk_index):
    """Index-side registers agree with ops-level registers computed
    straight from the known (term, doc) membership — same universe,
    same bit math."""
    from pyspark.sql import functions as F

    from open_source_search_engine_spark.functions.gbhash import term_id
    from open_source_search_engine_spark.ops.sketches import (
        grouped_hll_cardinality,
        grouped_hll_registers,
    )

    rd = IndexReader(spark, sk_index, SK_CONF)
    regs, p = rd.term_sketches()
    assert p == 8
    tid = term_id("alpha")
    got = {(r["bucket"], r["register"]) for r in
           regs.where(F.col("term_id") == tid).collect()}
    direct = grouped_hll_registers(
        spark.createDataFrame([(str(d),) for d in sorted(A_SET)],
                              "v string").withColumn("k", F.lit(0)),
        ["k"], "v", p=8)
    want = {(r["bucket"], r["register"]) for r in direct.collect()}
    assert got == want
    est = grouped_hll_cardinality(direct, ["k"], 8).collect()[0]["estimate"]
    assert abs(est - len(A_SET)) <= 0.15 * len(A_SET)


def test_incremental_gen_merge_and_compaction(spark, tmp_index):
    """gen-0 holds half the alpha docs, gen-1 the rest: the multi-gen
    reader max-merges registers to the full-set sketch, and compaction
    rolls the merged registers into the new generation."""
    import json
    import os

    from pyspark.sql import functions as F

    from open_source_search_engine_spark.functions.gbhash import term_id

    half = sorted(A_SET)[:200]
    rest = sorted(A_SET)[200:]
    build_index(spark, _corpus(spark, half), tmp_index,
                conf=SK_CONF, gen=0)
    build_index(spark, _corpus(spark, rest), tmp_index,
                conf=SK_CONF, gen=1)
    rd = IndexReader(spark, tmp_index, SK_CONF)
    regs, p = rd.term_sketches()
    tid = term_id("alpha")
    merged = {(r["bucket"], r["register"]) for r in
              regs.where(F.col("term_id") == tid).collect()}

    got = _est_map(estimate_and_cardinality(
        spark, tmp_index, ["alpha"], conf=SK_CONF, reader=rd))
    assert abs(got["alpha"][1] - len(A_SET)) <= 0.15 * len(A_SET)

    # as-of gen 0 sees only the first half's sketch
    rd0 = IndexReader(spark, tmp_index, SK_CONF, as_of_gen=0)
    got0 = _est_map(estimate_and_cardinality(
        spark, tmp_index, ["alpha"], conf=SK_CONF, reader=rd0))
    assert abs(got0["alpha"][1] - len(half)) <= 0.2 * len(half)

    compact_index(spark, tmp_index, conf=SK_CONF)
    rdc = IndexReader(spark, tmp_index, SK_CONF)
    assert len(rdc.gens) == 1
    regs_c, _ = rdc.term_sketches()
    got_c = {(r["bucket"], r["register"]) for r in
             regs_c.where(F.col("term_id") == tid).collect()}
    assert got_c == merged

    # meta survives compaction
    meta = json.load(open(os.path.join(tmp_index, "_index_meta.json")))
    assert meta["conf"]["term_sketch_p"] == 8


def test_no_sketches_is_explicit(spark, small_conf, tmp_index):
    build_index(spark, _corpus(spark, range(50)), tmp_index,
                conf=small_conf, gen=0)
    rd = IndexReader(spark, tmp_index, small_conf)
    assert rd.term_sketches() is None
    with pytest.raises(ValueError):
        estimate_and_cardinality(spark, tmp_index, ["alpha"],
                                 conf=small_conf, reader=rd)


def test_missing_term_conjunction_is_zero(spark, sk_index):
    """A query term with no registers has df == 0, so the AND is
    provably empty: the estimate reports 0, never a silent estimate
    over the present subset."""
    got = _est_map(estimate_and_cardinality(
        spark, sk_index, ["alpha", "zzznothere"], conf=SK_CONF))
    assert got["zzznothere"] == (1, 0.0)
    assert got["alpha&zzznothere"] == (2, 0.0)
    assert got["alpha"][1] > 300  # the present term still estimates


def test_local_estimate_matches_spark_estimate(spark, sk_index):
    """The planner's driver-side inclusion-exclusion mirror
    (hll_intersection_estimate_local via
    IndexReader.sketch_intersection_estimate) reproduces the Spark
    estimate_and_cardinality intersection value."""
    from open_source_search_engine_spark.functions.gbhash import (
        hash64_lower_utf8,
    )

    got = _est_map(estimate_and_cardinality(
        spark, sk_index, ["alpha", "beta"], conf=SK_CONF))
    rd = IndexReader(spark, sk_index, SK_CONF)
    tids = [hash64_lower_utf8("alpha") & ((1 << 48) - 1),
            hash64_lower_utf8("beta") & ((1 << 48) - 1)]
    est = rd.sketch_intersection_estimate(tids)
    assert est is not None
    assert abs(est - got["alpha&beta"][1]) < 1e-6
    # cached second call, same value
    assert rd.sketch_intersection_estimate(tids) == est


GATE_CONF = EngineConf(n_buckets=4, n_salts=2, salt_df_threshold=50,
                       term_sketch_p=8)

G_SET = set(range(0, 250))        # 'gamma' docs
D_SET = set(range(245, 495))      # 'delta' docs: |G ∩ D| = 5


def _gate_corpus(spark):
    rows = []
    for d in range(500):
        words = ["filler"]
        if d in G_SET:
            words.append("gamma")
        if d in D_SET:
            words.append("delta")
        body = " ".join(words)
        rows.append({
            "url": f"http://s{d % 5}.example/p/{d}.html",
            "warc_ts": dt.datetime(2024, 1, 1) + dt.timedelta(seconds=d),
            "html": f"<html><body><p>{body}</p></body></html>".encode(),
            "text": body, "lang": "en", "doc_id": d,
        })
    return spark.createDataFrame(pd.DataFrame(rows))


@pytest.fixture(scope="module")
def gate_index(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("gateidx"))
    build_index(spark, _gate_corpus(spark), d, conf=GATE_CONF, gen=0)
    return d


def test_sketch_gate_routes_tiny_intersections_selective(spark,
                                                         gate_index):
    """Flat-df conjunction (df 250 vs 250 — the ratio heuristic keeps
    WAND) with a near-empty intersection: the sketch gate reroutes to
    the rarest-first candidate plan, and the results are identical to
    the ungated WAND plan."""
    import dataclasses

    from open_source_search_engine_spark.query import executor as ex
    from open_source_search_engine_spark.query.executor import search

    got = {(r["doc_id"]) for r in
           search(spark, gate_index, "gamma delta", k=10,
                  conf=GATE_CONF).collect()}
    assert ex.PLANNER_LAST["path"] == "selective"
    assert ex.PLANNER_LAST["sketch_est"] <= \
        GATE_CONF.planner_selective_max_est
    assert got == (G_SET & D_SET)

    off = dataclasses.replace(GATE_CONF, planner_sketch_gate=False)
    got_wand = {(r["doc_id"]) for r in
                search(spark, gate_index, "gamma delta", k=10,
                       conf=off).collect()}
    assert ex.PLANNER_LAST["path"] == "wand"
    assert "sketch_est" not in ex.PLANNER_LAST
    assert got_wand == got

    # a LARGE estimated intersection stays on WAND even with the gate
    # on: gamma ⊆ filler, so the gamma∧filler estimate is ~|gamma|
    tight = dataclasses.replace(GATE_CONF,
                                planner_selective_max_est=25.0)
    search(spark, gate_index, "gamma filler", k=10,
           conf=tight).collect()
    assert ex.PLANNER_LAST["path"] == "wand"
    assert ex.PLANNER_LAST["sketch_est"] > 25.0


def test_partial_sketch_coverage_refuses(spark, tmp_path_factory):
    """ADVICE r4: a register-less term is only provably df==0 when the
    exact stats agree. Sketches enabled on a LATER incremental build
    leave earlier-gen terms with df>0 but no registers — the estimator
    must refuse with the gap named, not report a confident 0; a term
    that is truly absent everywhere still estimates 0."""
    d = str(tmp_path_factory.mktemp("skpart"))
    plain = EngineConf(n_buckets=4, n_salts=2, salt_df_threshold=10_000)
    # gen0 (no sketches) is the only generation holding 'gamma'
    rows = [{"url": f"http://a.example/{i}.html",
             "warc_ts": dt.datetime(2024, 1, 1),
             "html": b"<html><body><p>gamma filler</p></body></html>",
             "text": "gamma filler", "lang": "en", "doc_id": i}
            for i in range(10)]
    build_index(spark, spark.createDataFrame(pd.DataFrame(rows)),
                d, conf=plain, gen=0)
    rows1 = [{"url": f"http://a.example/n{i}.html",
              "warc_ts": dt.datetime(2024, 2, 1),
              "html": b"<html><body><p>alpha filler</p></body></html>",
              "text": "alpha filler", "lang": "en", "doc_id": 100 + i}
             for i in range(10)]
    build_index(spark, spark.createDataFrame(pd.DataFrame(rows1)),
                d, conf=SK_CONF, gen=1)

    with pytest.raises(ValueError, match="partial sketch coverage"):
        estimate_and_cardinality(spark, d, ["gamma", "alpha"],
                                 conf=SK_CONF).collect()

    got = _est_map(estimate_and_cardinality(
        spark, d, ["alpha", "zzznotaword"], conf=SK_CONF))
    assert got["zzznotaword"] == (1, 0.0)
    assert got["alpha&zzznotaword"][1] == 0.0
