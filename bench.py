"""Benchmark harness (driver contract): builds the inverted index over
$SPARK_GRAFT_SF_DIR documents on local[$SPARK_GRAFT_CPUS], times the
headline queries, prints ONE JSON line:

  {"metric": ..., "value": <total secs>, "unit": "sec",
   "queries": {name: secs, ...}, "sf": ...,
   "build_secs": ..., "docs_per_sec": ..., "postings_per_sec": ...}

The metric mirrors BASELINE.md: index-build throughput (docs/sec) +
query latency over the built index. tools/scaling_bench.py runs this at
two parallelism levels for the scaling-efficiency evidence.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    keep = os.environ.get("OSSE_BENCH_KEEP_INDEX")

    from open_source_search_engine_spark.session import get_spark

    spark = get_spark(app="osse-bench", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    from pyspark.sql import functions as F

    from open_source_search_engine_spark.index.build import build_index
    from open_source_search_engine_spark.ops.ann import brute_force_topk
    from open_source_search_engine_spark.ops.dedup import minhash_lsh_pairs
    from open_source_search_engine_spark.ops.textstats import simhash
    from open_source_search_engine_spark.query.executor import (
        IndexReader,
        search,
    )
    from open_source_search_engine_spark.sources.webtext import (
        webtext_from_documents,
    )

    t_all = time.time()
    idx_dir = tempfile.mkdtemp(prefix="osse_bench_idx_")
    timings: dict[str, float] = {}

    # ---- warmup: spin up JVM codegen + the Python worker pool once so
    # the measured numbers reflect steady-state throughput, not process
    # cold-start (a long-lived cluster is always warm) ----
    import pandas as _pd

    def _noop(it):
        from open_source_search_engine_spark.index import build  # noqa: F401
        for pdf in it:
            yield pdf

    warm = spark.range(cpus * 4, numPartitions=cpus).mapInPandas(
        _noop, schema="id long")
    warm.groupBy((warm.id % 7).alias("k")).count().collect()

    # ---- index build (fresh, resume off: measure real work) ----
    t0 = time.time()
    wt = webtext_from_documents(spark, sf_dir, body_only=True)
    meta = build_index(spark, wt, idx_dir, resume=False)
    build_secs = time.time() - t0
    n_docs = meta["n_docs"]
    n_postings = _total_postings(idx_dir)

    rd = IndexReader(spark, idx_dir)
    rd.avgdl  # warm the docs-side stats once (real serving would cache)

    # ---- query latency: steady-state — one discarded warm run, then
    # median of OSSE_BENCH_REPS (default 3) timed runs. The median (not
    # the single warm run r1-r4 reported) is what makes round-over-round
    # deltas signal on a shared box: the documented run-to-run spread
    # here is +/-40%, and one unlucky GC or noisy-neighbor burst used to
    # masquerade as a 30% regression (VERDICT r4 bench-hygiene item) ----
    import statistics

    reps = max(1, int(os.environ.get("OSSE_BENCH_REPS", "3")))

    def timed(name, fn):
        fn()  # warm: plans compiled, workers up, page cache hot
        samples = []
        for _ in range(reps):
            t = time.time()
            fn()
            samples.append(time.time() - t)
        timings[name] = round(statistics.median(samples), 4)

    timed("q_and_top10",
          lambda: search(spark, idx_dir, "key window stream", k=10,
                         reader=rd).collect())
    timed("q_single_top10",
          lambda: search(spark, idx_dir, "customer", k=10,
                         reader=rd).collect())
    timed("q_phrase",
          lambda: search(spark, idx_dir, '"key value"', k=10,
                         reader=rd).collect())
    timed("q_bool",
          lambda: search(spark, idx_dir, "key AND (window OR stream)",
                         k=10, reader=rd).collect())
    timed("q_not",
          lambda: search(spark, idx_dir, "window -customer", k=10,
                         reader=rd).collect())
    # reference-scorer path (the engine's heaviest query pipeline:
    # positions + ctx decode, sliding-window proximity scoring)
    from open_source_search_engine_spark.config import EngineConf

    ref_conf = EngineConf(scorer="reference")
    timed("q_reference_2term",
          lambda: search(spark, idx_dir, "key window", k=10,
                         conf=ref_conf, reader=rd).collect())
    timed("q_reference_3term",
          lambda: search(spark, idx_dir, "key window stream", k=10,
                         conf=ref_conf, reader=rd).collect())

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    timed("op_minhash_lsh",
          lambda: minhash_lsh_pairs(docs, threshold=0.5).collect())
    timed("op_simhash", lambda: simhash(docs).count())
    # CCNet-style duplicated-line removal + corpus-overlap novelty
    # (lines derived as 8-token windows — the synthetic text has no
    # newlines; same derivation as the driver-contract entry)
    from open_source_search_engine_spark.ops.dedup import (
        line_dedup,
        novelty_scores,
    )

    _ts = F.split(F.col("text"), " ")
    _lns = F.transform(
        F.sequence(F.lit(0), F.ceil(F.size(_ts) / F.lit(8)).cast("int") - 1),
        lambda i: F.concat_ws(" ", F.slice(_ts, i * 8 + 1, 8)))
    lined = docs.select("doc_id", F.array_join(_lns, "\n").alias("text"))
    timed("op_line_dedup", lambda: line_dedup(lined).count())
    # Dolma BFF Bloom-filter paragraph dedup (two bounded shuffles)
    from open_source_search_engine_spark.ops.dedup import (
        bloom_filter_dedup,
    )

    timed("op_bloom_dedup",
          lambda: bloom_filter_dedup(lined, m_bits=1 << 18).count())
    timed("op_novelty", lambda: novelty_scores(docs).count())
    # ExactSubstr-style duplicated-span removal (Lee et al. 2021)
    from open_source_search_engine_spark.ops.dedup import substring_dedup

    timed("op_substring_dedup",
          lambda: substring_dedup(docs, window=8).count())
    # CCNet unigram-LM quality bucketing + DSIR importance resampling
    from open_source_search_engine_spark.ops.sampling import (
        dsir_importance,
    )
    from open_source_search_engine_spark.ops.textstats import (
        lm_quality_buckets,
    )

    timed("op_lm_buckets", lambda: lm_quality_buckets(docs).count())
    timed("op_dsir",
          lambda: dsir_importance(
              docs, docs.where(F.col("lang") == "en"), k=100).collect())
    # eval-set 13-gram decontamination (broadcast eval shingles — the
    # train side streams map-side, no corpus-shingle shuffle)
    from open_source_search_engine_spark.ops.dedup import decontaminate

    ev = docs.where(F.col("doc_id") % 20 == 0)
    tr = docs.where(F.col("doc_id") % 20 != 0)
    timed("op_decontaminate",
          lambda: decontaminate(tr, ev, n=13).count())
    # SemDedup semantic embedding dedup (cell-keyed pairwise stage)
    from open_source_search_engine_spark.ops.dedup import semdedup

    timed("op_semdedup",
          lambda: semdedup(emb, threshold=0.4, n_cells=16).count())
    qv = [float(x)
          for x in emb.where(F.col("vec_id") == 0).collect()[0]["embedding"]]
    timed("op_ann_top10", lambda: brute_force_topk(emb, qv, 10).collect())

    # indexed IVF probe: build the cell table once (untimed), then time
    # the directory-pruned probe (reads nprobe of n_cells directories)
    from open_source_search_engine_spark.ops.ann import (
        build_ivf_index,
        ivf_topk_indexed,
    )

    ivf_dir = tempfile.mkdtemp(prefix="osse_bench_ivf_")
    cents = build_ivf_index(emb, ivf_dir, n_cells=16)
    timed("op_ann_ivf_probe",
          lambda: ivf_topk_indexed(spark, ivf_dir, cents, qv, 10,
                                   nprobe=4).collect())
    shutil.rmtree(ivf_dir, ignore_errors=True)

    # IVF-PQ probe: partition-pruned cell dirs + ADC table lookups
    # over 4-byte codes (no float vectors read at serve time)
    from open_source_search_engine_spark.ops.ann import (
        build_ivfpq_index,
        ivfpq_topk_indexed,
        pq_codebooks,
    )

    ivfpq_dir = tempfile.mkdtemp(prefix="osse_bench_ivfpq_")
    pq_cents, pq_cbs = build_ivfpq_index(emb, ivfpq_dir, n_cells=16,
                                         n_sub=8, n_codes=16)
    timed("op_ann_ivfpq_probe",
          lambda: ivfpq_topk_indexed(spark, ivfpq_dir, pq_cents, pq_cbs,
                                     qv, 10, nprobe=4).collect())
    shutil.rmtree(ivfpq_dir, ignore_errors=True)

    # indexed LSH probe: persisted (tbl, bucket)-partitioned table,
    # probe reads exactly `tables` bucket dirs (VERDICT r2 #9: both
    # persisted ANN paths need wall-time entries)
    from open_source_search_engine_spark.ops.ann import (
        build_rp_lsh_index,
        rp_lsh_topk_indexed,
    )

    dim = len(qv)
    lsh_dir = tempfile.mkdtemp(prefix="osse_bench_lsh_")
    build_rp_lsh_index(emb, lsh_dir, dim=dim)
    timed("op_ann_lsh_probe",
          lambda: rp_lsh_topk_indexed(spark, lsh_dir, qv, 10).collect())
    shutil.rmtree(lsh_dir, ignore_errors=True)

    # fixed-point PageRank over a synthetic doc-id link graph (two
    # node-keyed shuffles per iteration, 5 iterations)
    from open_source_search_engine_spark.ops.graph import pagerank

    n_d = docs.count()
    pr_edges = (docs.select(
        F.col("doc_id").alias("src"),
        F.explode(F.sequence(F.lit(1), F.lit(2) + F.col("doc_id") % 3))
        .alias("j"))
        .select("src", ((F.col("src") + F.col("j") * 37) % n_d)
                .alias("dst")))
    timed("op_pagerank", lambda: pagerank(pr_edges, n_iter=5).count())

    # gap sessionization over the events table (one user-keyed shuffle)
    from open_source_search_engine_spark.ops.events import sessionize

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    timed("op_sessionize",
          lambda: sessionize(ev, gap_seconds=43200).count())

    # bounded site-clustered search (top-(k x M) buffer + refill —
    # never scores the full match set, VERDICT r2 #5)
    from open_source_search_engine_spark.query.executor import (
        search_clustered,
    )

    timed("q_site_clustered",
          lambda: search_clustered(spark, idx_dir, "key", k=10,
                                   reader=rd).collect())

    # stored-query percolation: 4 registered queries over the corpus
    # (one explode + one broadcast join + one (doc,query) groupBy)
    from open_source_search_engine_spark.query.percolate import percolate

    stored = [(1, "key window"), (2, "stream -customer"),
              (3, '"key value"'), (4, "batch -key")]
    timed("op_percolate",
          lambda: percolate(spark, docs, stored).count())

    # NB quality classifier: train (two aggregations) + score (one
    # broadcast model join + integer per-doc sum)
    from open_source_search_engine_spark.ops.classify import (
        nb_score,
        nb_train,
    )

    def _nb():
        labeled = docs.withColumn(
            "label",
            F.concat(F.lit(" "), F.col("text"), F.lit(" "))
            .contains(" customer ").cast("int"))
        model, prior = nb_train(labeled)
        return nb_score(docs, model, prior).count()
    timed("op_nb_quality", _nb)

    # tagdb site rollup over the index docs snapshot
    from open_source_search_engine_spark.ops.sitestats import site_table

    timed("op_site_stats", lambda: site_table(rd.docs()).count())

    # composed training-corpus curation chain (langid -> gopher ->
    # exact dedup -> 13-gram decontaminate -> PII+tokens; no shuffle
    # carries text)
    from open_source_search_engine_spark.ops.pipeline import (
        curate_training_corpus,
    )

    def _curate():
        ev = docs.where(F.col("doc_id") % 20 == 0)
        tr = docs.where(F.col("doc_id") % 20 != 0)
        return curate_training_corpus(tr, ev).count()
    timed("op_curate_pipeline", _curate)

    # co-citation related sites over a synthetic link graph (src-keyed
    # pair join with the max_out skew guard)
    from open_source_search_engine_spark.ops.graph import (
        cocitation_related,
    )

    # hybrid lexical+vector retrieval (BM25 leg + brute cosine leg,
    # reciprocal-rank fusion)
    from open_source_search_engine_spark.query.hybrid import (
        hybrid_search,
    )

    def _hybrid():
        emb = spark.read.parquet(os.path.join(sf_dir,
                                              "embeddings.parquet"))
        qv = [float(x) for x in
              emb.where(F.col("vec_id") == 0).collect()[0]["embedding"]]
        return hybrid_search(spark, idx_dir, "key value", qv, emb,
                             k=10, k_each=50, reader=rd).collect()
    timed("q_hybrid", _hybrid)

    def _cocite():
        links = (docs.select(
            F.col("doc_id").alias("src"),
            F.explode(F.sequence(F.lit(1),
                                 F.lit(2) + F.col("doc_id") % 3))
            .alias("j"))
            .select("src",
                    ((F.col("src") + F.col("j") * 37) % 61).alias("dst")))
        return cocitation_related(links, k=5, min_common=2).count()
    timed("op_cocite", _cocite)

    total = time.time() - t_all
    out = {
        "metric": ("index-build docs/sec + query latency "
                   "(BM25 top-k over compressed posting segments)"),
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf_dir,
        "cpus": cpus,
        "n_docs": n_docs,
        "n_postings": n_postings,
        "build_secs": round(build_secs, 3),
        "docs_per_sec": round(n_docs / build_secs, 2),
        "postings_per_sec": round(n_postings / build_secs, 1),
    }
    if keep:
        out["index_dir"] = idx_dir
    else:
        shutil.rmtree(idx_dir, ignore_errors=True)
    spark.stop()
    print(json.dumps(out))
    return 0


def _total_postings(idx_dir: str) -> int:
    import glob

    total = 0
    for m in glob.glob(os.path.join(idx_dir, "_manifests", "*.json")):
        with open(m) as f:
            total += json.load(f).get("n_postings", 0)
    return total


if __name__ == "__main__":
    sys.exit(main())
