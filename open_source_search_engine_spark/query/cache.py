"""Query-result cache — the Msg40 serving cache the fork REMOVED
("the cache has been removed a long time ago", Msg40.cpp:1907) while
keeping its policy plumbing: SearchInput still computes m_useCache /
m_rcache / m_wcache (SearchInput.cpp:444-455), it just has nothing to
talk to. Re-added engine-side with the fork's exact policy chain:

  - tri-state ``use_cache``: -1 (default/auto), 0 (off), 1 (on) —
    the reference's Parms default is -1;
  - in auto mode WITH spidering enabled, queries carrying a positive
    site: field, an ip: field, or a url: field default to NO cache
    (the index under them churns fastest while crawling —
    SearchInput.cpp:444-451); everything else caches;
  - with spidering disabled, auto always caches (:443 comment).

Invalidation is STRONGER than the reference's age-based cache: the key
fingerprints the index snapshot (the committed ``gens`` list +
n_docs), so any new generation, tombstone batch or compaction changes
the key and stale entries are simply never read again — Iceberg-
snapshot semantics instead of TTLs. An optional ``max_age_secs``
reproduces the reference's maxCacheAge knob on top.

Scale shape: a cache entry is the FINAL top-k rows (k-sized parquet),
written once per (snapshot, query, k, scorer); a hit is a k-row
parquet read — no segment scan, no decode. The cache directory is a
plain filesystem/object-store prefix, shared by any number of serving
sessions."""

from __future__ import annotations

import hashlib
import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import DEFAULT_CONF, EngineConf
from .compiler import compile_query

# fields whose positive presence disables auto-caching while spidering
# (SearchInput.cpp:445-450: m_hasPositiveSiteField / m_hasIpField /
# m_hasUrlField; our compiler maps suburl->inurl)
_NO_CACHE_FIELDS = ("site", "ip", "url", "inurl")


class QueryCache:
    def __init__(self, cache_dir: str, spider_enabled: bool = True,
                 max_age_secs: float | None = None):
        self.cache_dir = cache_dir
        self.spider_enabled = spider_enabled
        self.max_age_secs = max_age_secs
        self.hits = 0
        self.misses = 0
        os.makedirs(cache_dir, exist_ok=True)

    def _policy(self, query: str, use_cache: int) -> tuple[bool, bool]:
        """(read, write) — the SearchInput.cpp:440-468 chain."""
        uc = use_cache
        if uc == -1 and self.spider_enabled:
            cq = compile_query(query)
            if any(g.field in _NO_CACHE_FIELDS and not g.negative
                   for g in cq.groups):
                uc = 0
        if uc == -1:
            uc = 1
        read = uc == 1
        write = uc != 0  # m_wcache default follows m_useCache (:462-466)
        return read, write

    # every EngineConf field that can change a result row or its rank —
    # NOT just the bm25 trio: the reference-scorer weight knobs, lang
    # boost, page temperature and the hf-shortcut approximation all
    # alter scores, so two sessions sharing a cache_dir with different
    # values must never share entries (ADVICE r4). Build-time and
    # plan-only knobs (codec, salting, planner gates) are excluded on
    # purpose: they are results-identical by contract.
    _SCORE_FIELDS = (
        "k1", "b", "scorer", "hashgroup_weights",
        "density_weight_min", "density_weight_max",
        "diversity_weight_min", "diversity_weight_max",
        "termfreq_min", "termfreq_max",
        "termfreq_weight_min", "termfreq_weight_max", "syn_weight",
        "query_lang", "same_lang_weight", "unknown_lang_weight",
        "use_page_temperature", "page_temp_weight_min",
        "page_temp_weight_max", "page_temp_default",
        "use_hf_shortcuts",
    )

    def _key(self, index_dir: str, query: str, k, conf: EngineConf) -> str:
        with open(os.path.join(index_dir, "_index_meta.json")) as f:
            meta = json.load(f)
        snap = {"gens": meta.get("gens"), "n_docs": meta.get("n_docs")}
        scoring = [list(v) if isinstance(
            v := getattr(conf, fld), tuple) else v
            for fld in self._SCORE_FIELDS]
        raw = json.dumps([os.path.abspath(index_dir), snap, query, k,
                          scoring], sort_keys=True)
        return hashlib.md5(raw.encode()).hexdigest()

    def search(self, spark: SparkSession, index_dir: str, query: str,
               k: int | None = 10, conf: EngineConf = DEFAULT_CONF,
               use_cache: int = -1) -> DataFrame:
        """Drop-in for executor.search with the cache in front."""
        from .executor import search as _search

        read, write = self._policy(query, use_cache)
        path = os.path.join(self.cache_dir,
                            self._key(index_dir, query, k, conf))
        ok = os.path.exists(os.path.join(path, "_SUCCESS"))
        if ok and self.max_age_secs is not None:
            ok = (time.time() - os.path.getmtime(path)) <= self.max_age_secs
        if read and ok:
            self.hits += 1
            return self._ordered(spark.read.parquet(path))
        self.misses += 1
        res = _search(spark, index_dir, query, k=k, conf=conf)
        if write:
            res.write.mode("overwrite").parquet(path)
            return self._ordered(spark.read.parquet(path))
        return res

    @staticmethod
    def _ordered(df: DataFrame) -> DataFrame:
        # parquet round-trips don't preserve row order: restore the
        # search contract (score DESC, doc_id ASC) as a plan invariant
        return df.orderBy(F.col("score").desc(), F.col("doc_id").asc())
