"""Query-driven reindex/delete — the reference's ``/admin/reindex``
surface (``Msg1c::reindexQuery``, decl ``PageReindex.h:9-38``;
``PageReindex.cpp``): an operator runs a QUERY and applies an action to
its whole result set — force-delete every matching doc (``forceDel``,
the "kill a spam site's results" lever) or queue every matching doc for
re-spidering.

Spark-first recomposition: the result set comes from the normal serving
path (``search_all`` — WAND/candidate plans, boolean trees, field and
numeric constraints all work, because it IS the serving query
executor), capped like the reference's ``m_maxRecs``; the action is

- ``force_del=True``: one tombstone generation (``delete_docs`` — the
  negative-key analog, Posdb.h:88 delbit) covering the result set, so
  every reader sees the deletion immediately and the next
  ``compact_index`` annihilates the postings physically;
- ``force_del=False``: a respider QUEUE — ``<index>/reindex_queue/
  gen=N/`` parquet rows ``(doc_id, url, requested_gen)`` the crawl
  pipeline consumes to re-fetch and re-index those urls into a later
  generation (streaming.ingest's incremental build is the consumer).
  The reference's spider-priority knob (``m_spiderPriority``) is n/a
  by design: Spark has no in-engine spider — priority belongs to the
  fetch scheduler that drains the queue.

Scale shape: the query runs the serving plan (bounded decode), ids move
as ONE Arrow column (never 1M Row objects — the boolean-reference
lesson), the tombstone write is a single small parquet, and nothing
touches posting blobs until the next compaction folds the tombstones
in. The whole op is O(result set), not O(index).
"""

from __future__ import annotations

import json
import os

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import DEFAULT_CONF, EngineConf
from .build import IndexPaths, delete_docs


def reindex_query(spark: SparkSession, index_dir: str, query: str,
                  conf: EngineConf = DEFAULT_CONF,
                  force_del: bool = False,
                  max_docs: int | None = None) -> dict:
    """Run ``query`` against the index and delete or queue-for-respider
    its entire result set. Returns
    ``{"n_docs", "gen", "action", "doc_ids"}`` (ids ascending;
    ``gen`` is the tombstone generation for deletes, the queue
    generation otherwise)."""
    from ..query.executor import search_all

    res = search_all(spark, index_dir, query, conf=conf).select("doc_id")
    if max_docs is not None:
        # the reference caps reindex result sets (PageReindex.cpp
        # m_maxRecs); keep the cap deterministic: best-scored first
        res = search_all(spark, index_dir, query, conf=conf) \
            .orderBy(F.col("score").desc(), F.col("doc_id").asc()) \
            .limit(int(max_docs)).select("doc_id")
    ids = np.sort(res.toPandas()["doc_id"].to_numpy().astype(np.int64))
    paths = IndexPaths(index_dir)
    with open(paths.meta) as f:
        meta = json.load(f)
    new_gen = max(meta.get("gens", [0])) + 1
    if len(ids) == 0:
        return {"n_docs": 0, "gen": None, "action": "noop",
                "doc_ids": ids}
    if force_del:
        delete_docs(spark, index_dir, [int(d) for d in ids], gen=new_gen)
        return {"n_docs": int(len(ids)), "gen": new_gen,
                "action": "delete", "doc_ids": ids}
    # respider queue: (doc_id, url, requested_gen) — urls resolved from
    # the docs snapshot so the fetch scheduler needs no index access
    from ..query.executor import IndexReader

    rd = IndexReader(spark, index_dir, conf)
    idf = spark.createDataFrame([(int(d),) for d in ids], "doc_id long")
    out = (idf.join(rd.docs().select("doc_id", "url"), "doc_id", "left")
           .withColumn("requested_gen", F.lit(int(new_gen))))
    qdir = os.path.join(index_dir, "reindex_queue", f"gen={new_gen}")
    out.write.mode("overwrite").parquet(qdir)
    return {"n_docs": int(len(ids)), "gen": new_gen,
            "action": "respider", "doc_ids": ids}


def reindex_queue(spark: SparkSession, index_dir: str) -> DataFrame | None:
    """The accumulated respider queue (doc_id, url, requested_gen), or
    None when no reindex was ever queued."""
    qdir = os.path.join(index_dir, "reindex_queue")
    if not os.path.exists(qdir):
        return None
    return spark.read.option("basePath", qdir).parquet(qdir)
