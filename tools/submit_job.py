"""spark-submit entry point for the index build + query job (north rule:
"run via spark-submit --py-files on a multi-executor cluster").

The engine package is shipped to executors as a zip via --py-files (no
repo checkout needed on workers). Usage:

  python tools/make_pyfiles_zip.py /tmp/osse_pkg.zip
  spark-submit --master local[32] --py-files /tmp/osse_pkg.zip \
      tools/submit_job.py --input <webtext parquet dir or sf_dir> \
      --index-dir /tmp/osse_submit_idx --query "crawl index engine"

On a real cluster, replace --master with yarn/k8s and size
--num-executors/--executor-cores; the job itself is unchanged (the build
is expressed against the SparkSession, all parallelism comes from the
input partitioning + the repartition on (term_id, salt)).

Prints one JSON line with build metrics + the query's top-10.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True,
                    help="webtext parquet dir, or a testdata sf dir "
                         "containing documents.parquet")
    ap.add_argument("--index-dir", required=True)
    ap.add_argument("--query", default="crawl index engine")
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--no-resume", action="store_true")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    # spark-submit owns master/deploy config; we only set SQL knobs
    spark = (
        SparkSession.builder.appName("osse-index-build")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from open_source_search_engine_spark.index.build import build_index
    from open_source_search_engine_spark.query.executor import search
    from open_source_search_engine_spark.sources.webtext import (
        webtext_from_documents,
    )

    if os.path.exists(os.path.join(args.input, "documents.parquet")):
        wt = webtext_from_documents(spark, args.input, body_only=True)
    else:
        wt = spark.read.parquet(args.input)

    t0 = time.time()
    meta = build_index(spark, wt, args.index_dir,
                       resume=not args.no_resume)
    build_secs = time.time() - t0
    top = [
        {"doc_id": r["doc_id"], "score": round(r["score"], 6)}
        for r in search(spark, args.index_dir, args.query,
                        k=args.k).collect()
    ]
    print(json.dumps({
        "master": spark.sparkContext.master,
        "default_parallelism": spark.sparkContext.defaultParallelism,
        "n_docs": meta["n_docs"],
        "build_secs": round(build_secs, 2),
        "docs_per_sec": round(meta["n_docs"] / max(build_secs, 1e-9), 1),
        "query": args.query,
        "topk": top,
    }))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
