"""One-off: attribute segments-stage time to C1 encode / C2 merge /
bucket write / stats rewrite at a given parallelism.

Usage: python tools/exp_stagec.py <n_docs> <cpus>
Reuses (or creates) a parsed checkpoint at /tmp/osse_exp2_parsed_<n>.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    n_docs = int(sys.argv[1])
    cpus = int(sys.argv[2])

    import numpy as np
    from pyspark.sql import functions as F

    from open_source_search_engine_spark.config import EngineConf
    from open_source_search_engine_spark.index.build import (
        SEGMENT_SCHEMA,
        _effective_salt_min_df,
        anchor_parsed,
        make_mini_encoder,
        make_merge_partition,
        make_stats_partials,
        parse_docs_udf,
    )
    from open_source_search_engine_spark.session import get_spark

    corpus = os.path.join(tempfile.gettempdir(),
                          f"osse_scale_corpus_{n_docs}")
    spark = get_spark(app="osse-exp-stagec", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    p_parsed = os.path.join(tempfile.gettempdir(),
                            f"osse_exp2_parsed_{n_docs}")
    if not os.path.exists(os.path.join(p_parsed, "_SUCCESS")):
        src = spark.read.parquet(corpus)
        par = spark.sparkContext.defaultParallelism
        if src.rdd.getNumPartitions() < par:
            src = src.repartition(par * 2)
        src.mapInPandas(
            parse_docs_udf,
            schema=__import__(
                "open_source_search_engine_spark.index.build",
                fromlist=["PARSED_SCHEMA"]).PARSED_SCHEMA,
        ).write.mode("overwrite").parquet(p_parsed)
    parsed = spark.read.parquet(p_parsed)

    conf = EngineConf()
    has_links = bool(parsed.where(F.size("out_hrefs") > 0).limit(1).count())
    indexed = (parsed.unionByName(anchor_parsed(parsed)) if has_links
               else parsed)
    n_part = indexed.rdd.getNumPartitions()

    # hot ids (stats pass, timed separately)
    t0 = time.time()
    cur = (indexed.select("doc_id", "term_ids")
           .mapInPandas(make_stats_partials(),
                        schema="term_id long, df long, cf long")
           .groupBy("term_id").agg(F.sum("df").alias("df")))
    thr = _effective_salt_min_df(conf, n_docs)
    hot = cur.where(F.col("df") > thr).select("term_id").collect()
    hot_ids = np.array([r["term_id"] for r in hot], dtype=np.int64)
    t_hot = time.time() - t0

    enc = make_mini_encoder(conf.n_buckets, conf.n_salts, hot_ids)

    # C1: encode only
    t0 = time.time()
    mini = indexed.mapInPandas(enc, schema=SEGMENT_SCHEMA)
    n_mini = mini.count()
    t_c1 = time.time() - t0

    # C1 + shuffle + C2 merge
    t0 = time.time()
    seg = (indexed.mapInPandas(enc, schema=SEGMENT_SCHEMA)
           .repartition(F.col("term_id"), F.col("salt"))
           .sortWithinPartitions("term_id", "salt")
           .mapInPandas(make_merge_partition(), schema=SEGMENT_SCHEMA))
    n_seg = seg.count()
    t_c2 = time.time() - t0

    # + bucket write
    out = tempfile.mkdtemp(prefix="osse_exp2_seg_")
    t0 = time.time()
    (indexed.mapInPandas(enc, schema=SEGMENT_SCHEMA)
     .repartition(F.col("term_id"), F.col("salt"))
     .sortWithinPartitions("term_id", "salt")
     .mapInPandas(make_merge_partition(), schema=SEGMENT_SCHEMA)
     .repartition("bucket")
     .sortWithinPartitions("term_id", "salt")
     .write.mode("overwrite").partitionBy("bucket").parquet(out))
    t_c3 = time.time() - t0

    # stats rewrite read-back
    t0 = time.time()
    (spark.read.parquet(out).groupBy("term_id")
     .agg(F.sum("df").alias("df"), F.sum("cf").alias("cf"))
     .write.mode("overwrite").parquet(out + "_stats"))
    t_c4 = time.time() - t0

    print(json.dumps({
        "cpus": cpus, "n_docs": n_docs, "n_partitions": n_part,
        "mini_rows": int(n_mini), "seg_rows": int(n_seg),
        "hot_secs": round(t_hot, 2),
        "c1_encode_secs": round(t_c1, 2),
        "c12_encode_shuffle_merge_secs": round(t_c2, 2),
        "c123_plus_bucket_write_secs": round(t_c3, 2),
        "stats_rewrite_secs": round(t_c4, 2),
    }))
    shutil.rmtree(out, ignore_errors=True)
    shutil.rmtree(out + "_stats", ignore_errors=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
