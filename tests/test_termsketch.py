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
