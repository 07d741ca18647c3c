"""One-off experiment: segments-stage cost vs salt_min_df threshold.

Usage: python tools/exp_saltcost.py <n_docs> <cpus> <salt_min_df>
Builds from the cached scaling corpus with the given threshold and
prints stage timings + (term,salt) run count. Index dir is deleted.
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
    salt_min = int(sys.argv[3])

    from open_source_search_engine_spark.config import EngineConf
    from open_source_search_engine_spark.index.build import build_index
    from open_source_search_engine_spark.session import get_spark

    corpus = os.path.join(tempfile.gettempdir(),
                          f"osse_scale_corpus_{n_docs}")
    assert os.path.exists(os.path.join(corpus, "_SUCCESS")), corpus
    spark = get_spark(app=f"osse-exp-salt-{salt_min}",
                      master=f"local[{cpus}]", shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    wt = spark.read.parquet(corpus)
    wt.limit(cpus * 2).selectExpr("length(html)").collect()

    conf = EngineConf(salt_min_df=salt_min)
    idx = tempfile.mkdtemp(prefix=f"osse_exp_salt{salt_min}_")
    t0 = time.time()
    meta = build_index(spark, wt, idx, conf=conf, resume=False)
    total = time.time() - t0

    seg = spark.read.parquet(os.path.join(idx, "segments", "gen=0"))
    n_runs = seg.count()
    n_salted = seg.where("salt >= 0").count()
    bytes_total = seg.agg({"n_bytes": "sum"}).collect()[0][0]
    print(json.dumps({
        "salt_min_df": salt_min, "cpus": cpus, "n_docs": n_docs,
        "total_secs": round(total, 2),
        "stage_secs": {k: round(v, 2)
                       for k, v in meta.get("secs", {}).items()},
        "runs": int(n_runs), "salted_runs": int(n_salted),
        "blob_bytes": int(bytes_total),
    }))
    shutil.rmtree(idx, ignore_errors=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
