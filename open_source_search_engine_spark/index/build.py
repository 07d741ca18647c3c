"""Index build job: webtext -> parsed checkpoint -> docs + segments +
term_stats + build_metrics.

Spark-first dataflow (SURVEY.md §3.2 "Spark lifecycle"):

  stage A (narrow, one Python pass, Arrow-batched):
      webtext --mapInPandas(parse_docs)--> parsed
      parsed is checkpointed to parquet: one row per doc with doc metadata
      plus parallel posting arrays (term_ids/poss/ctxs). This is the
      analog of the reference's metalist (XmlDoc.cpp:12290 getMetaList) —
      extraction runs exactly once per crawled page.

  stage B (pure Catalyst, JVM-side):
      docs       = parsed.select(doc columns)
      postings   = parsed.select(explode(zip(arrays)))        # no Python
      term_stats = postings.groupBy(term_id).agg(df, cf)
      hot terms (df > conf.salt_df_threshold) get salt = doc_id % n_salts
      (broadcast join — the salted-key skew splitting of the north rule;
      reference analog: HighFrequencyTermShortcuts.h:9-38)

  stage C (the only wide boundary):
      postings.repartition(bucket, term_id, salt)
              .applyInPandas(encode per (term_id,salt) -> blob)
      written as segments/gen=G/bucket=B/*.parquet — bucket dirs give
      partition pruning at query time; per-bucket _manifest.json records
      lineage + build metrics (docs/sec, postings/sec, bytes) and makes
      the build resumable bucket-by-bucket (north rule).

The reference's sorted-file + RdbMap layout maps to: parquet row-group
stats on term_id within each bucket dir (SURVEY.md §1.5).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..config import DEFAULT_CONF, EngineConf
from ..functions import gbhash
from ..functions.codec import encode_postings
from ..functions.extractor import (
    extract_headings,
    extract_meta,
    extract_title,
    extract_text,
)
from ..functions.gbhash import (
    TERMID_MASK,
    fielded_term_id,
    hash64_lower_utf8,
    prefix_hash,
    probable_doc_id,
)
from ..functions.posdb import (
    HASHGROUP_BODY,
    HASHGROUP_HEADING,
    HASHGROUP_INMETATAG,
    HASHGROUP_INURL,
    HASHGROUP_TITLE,
    MAXDENSITYRANK,
    MAXDIVERSITYRANK,
    MAXWORDSPAMRANK,
    SYN_CONJUGATE,
    SYN_ORIGINAL,
    pack_ctx,
    site_rank_from_inlinks,
)
from ..functions.tokenizer import (
    ALNUM,
    density_ranks,
    diversity_ranks,
    frag_vec,
    phrase_bits,
    phrase_ids,
    sentence_ids,
    tokenize,
    word_pos_vec,
)

PARSED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("url", T.StringType()),
        T.StructField("site_id", T.LongType()),
        T.StructField("site_rank", T.IntegerType()),
        T.StructField("lang_id", T.IntegerType()),
        T.StructField("title", T.StringType()),
        T.StructField("n_tokens", T.IntegerType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("term_ids", T.ArrayType(T.LongType())),
        T.StructField("poss", T.ArrayType(T.IntegerType())),
        T.StructField("ctxs", T.ArrayType(T.IntegerType())),
        # per-doc unique body unigrams (word -> termId); feeds the lexicon
        # table (the reference keeps no lexicon — posdb stores only hashes,
        # Posdb.h:3 — ours is a debug/oracle aid, deduped by Catalyst)
        T.StructField("lex_words", T.ArrayType(T.StringType())),
        T.StructField("lex_ids", T.ArrayType(T.LongType())),
    ]
)

# langId mapping subset (GbLanguage / Lang.cpp); unknown -> 0
LANG_IDS = {"xx": 0, "en": 1, "fr": 2, "es": 3, "ru": 4, "tr": 5, "ja": 6,
            "zh": 7, "ko": 8, "de": 9, "nl": 10, "it": 11, "fi": 12,
            "sv": 13, "no": 14, "pt": 15, "vi": 16, "ar": 17, "he": 18,
            "id": 19, "el": 20, "th": 21, "hi": 22, "bn": 23, "pl": 24,
            "da": 27}

PFX_TITLE = prefix_hash("title")
PFX_URL = prefix_hash("url")
PFX_SITE = prefix_hash("site")
PFX_LANG = prefix_hash("gblang")
_POS_FIELD_BASE = 0  # positions for non-body groups restart at 0


def hash_string_group(tokens, hash_group: int, out_terms, out_pos, out_ctx,
                      start_dist: int = 0, prefix: int | None = None,
                      with_bigrams: bool = True, spam_rank: int = MAXWORDSPAMRANK):
    """hashString/hashWords3 analog for one hash group
    (XmlDoc_Indexing.cpp:1817-2250): emits unfielded (or prefixed) word
    terms, possessive-stripped variants (2110-2153), and bigram terms
    (2164-2191, diversity=MAX, syn flag set)."""
    t = tokens
    sent = sentence_ids(t)
    body = hash_group in (HASHGROUP_BODY, HASHGROUP_HEADING)
    fv = frag_vec(t) if hash_group == HASHGROUP_BODY else None
    wpos = word_pos_vec(t, start_dist, fv, sent)
    dens = density_ranks(t, hash_group, sent)
    bits = phrase_bits(t)
    pids = phrase_ids(t, bits) if with_bigrams else [0] * len(t)
    divs = diversity_ranks(t, pids)
    nw = len(t)
    for k in range(nw):
        if t.kinds[k] != ALNUM:
            continue
        if fv is not None and fv[k] == 0:
            continue  # repeated fragment: not indexed (XmlDoc.cpp:20574)
        wid = t.wids[k]
        p = wpos[k]
        d = dens[k]
        dv = divs[k]
        tid = (wid & TERMID_MASK) if prefix is None else fielded_term_id(wid, prefix)
        out_terms.append(tid)
        out_pos.append(p)
        out_ctx.append(pack_ctx(hash_group, d, dv, spam_rank, SYN_ORIGINAL))
        w = t.words[k]
        # possessive: "dave's" also indexes "dave" with syn flag
        # (XmlDoc_Indexing.cpp:2110-2153)
        if w.endswith("'s") or w.endswith("'S"):
            wid2 = hash64_lower_utf8(w[:-2])
            tid2 = (wid2 & TERMID_MASK) if prefix is None else fielded_term_id(wid2, prefix)
            out_terms.append(tid2)
            out_pos.append(p)
            out_ctx.append(pack_ctx(hash_group, d, dv, spam_rank, SYN_CONJUGATE))
        # bigram term (diversity=MAX, syn=1; XmlDoc_Indexing.cpp:2164-2191)
        if pids[k]:
            bid = (pids[k] & TERMID_MASK) if prefix is None else fielded_term_id(pids[k], prefix)
            out_terms.append(bid)
            out_pos.append(p)
            out_ctx.append(pack_ctx(hash_group, d, MAXDIVERSITYRANK, spam_rank, SYN_CONJUGATE))
    return wpos[-1] + 1 if nw else start_dist


def parse_doc(url: str, html: bytes, text: str | None, lang: str | None,
              doc_id: int | None = None, site_inlinks: int | None = None) -> dict:
    """Full per-doc term generation (hashAll orchestration,
    XmlDoc_Indexing.cpp:226-470): title, body, headings, metatags, url,
    plus fielded probe terms (title:, url:, site:, gblang:)."""
    if text is None:
        text = extract_text(html)
    title = extract_title(html)
    headings = extract_headings(html)
    meta_kw = extract_meta(html, "keywords")
    meta_desc = extract_meta(html, "description")
    if doc_id is None:
        doc_id = probable_doc_id(url)
    host = url.split("://", 1)[-1].split("/", 1)[0]
    site_id = hash64_lower_utf8(host) & TERMID_MASK
    # deterministic synthetic inlink count when no link graph is given
    if site_inlinks is None:
        site_inlinks = gbhash.hash8(host.encode()) % 200
    srank = site_rank_from_inlinks(site_inlinks)
    lang_id = LANG_IDS.get((lang or "xx").lower(), 0)

    terms: list[int] = []
    poss: list[int] = []
    ctxs: list[int] = []

    body_tokens = tokenize(text or "")
    n_tokens = sum(1 for k in body_tokens.kinds if k == ALNUM)
    hash_string_group(body_tokens, HASHGROUP_BODY, terms, poss, ctxs)
    lex = {}
    for k in range(len(body_tokens)):
        if body_tokens.kinds[k] == ALNUM:
            w = body_tokens.words[k]
            if w not in lex:
                lex[w] = body_tokens.wids[k] & TERMID_MASK

    if title:
        tt = tokenize(title)
        hash_string_group(tt, HASHGROUP_TITLE, terms, poss, ctxs)
        hash_string_group(tt, HASHGROUP_TITLE, terms, poss, ctxs,
                          prefix=PFX_TITLE)
    for h in headings:
        hash_string_group(tokenize(h), HASHGROUP_HEADING, terms, poss, ctxs)
    for m in (meta_kw, meta_desc):
        if m:
            hash_string_group(tokenize(m), HASHGROUP_INMETATAG, terms, poss,
                              ctxs, with_bigrams=False)
    # url terms (hashUrl, XmlDoc_Indexing.cpp:940): tokenized url words in
    # HASHGROUP_INURL + exact-url and site fielded probe terms
    hash_string_group(tokenize(url), HASHGROUP_INURL, terms, poss, ctxs,
                      with_bigrams=False, prefix=PFX_URL)
    terms.append(fielded_term_id(hash64_lower_utf8(url), PFX_URL))
    poss.append(0)
    ctxs.append(pack_ctx(HASHGROUP_INURL, MAXDENSITYRANK, MAXDIVERSITYRANK,
                         MAXWORDSPAMRANK, SYN_ORIGINAL))
    terms.append(fielded_term_id(hash64_lower_utf8(host), PFX_SITE))
    poss.append(0)
    ctxs.append(pack_ctx(HASHGROUP_INURL, MAXDENSITYRANK, MAXDIVERSITYRANK,
                         MAXWORDSPAMRANK, SYN_ORIGINAL))
    # language probe term (hashLanguage, XmlDoc_Indexing.cpp:1577)
    terms.append(fielded_term_id(hash64_lower_utf8(lang or "xx"), PFX_LANG))
    poss.append(0)
    ctxs.append(pack_ctx(HASHGROUP_INMETATAG, MAXDENSITYRANK,
                         MAXDIVERSITYRANK, MAXWORDSPAMRANK, SYN_ORIGINAL))

    return {
        "doc_id": doc_id,
        "url": url,
        "site_id": site_id,
        "site_rank": srank,
        "lang_id": lang_id,
        "title": title,
        "n_tokens": n_tokens,
        "term_ids": terms,
        "poss": poss,
        "ctxs": ctxs,
        "lex_words": list(lex.keys()),
        "lex_ids": list(lex.values()),
    }


def parse_docs_udf(iterator):
    """mapInPandas body: webtext rows -> PARSED_SCHEMA rows."""
    for pdf in iterator:
        recs = []
        has_docid = "doc_id" in pdf.columns
        for i in range(len(pdf)):
            row = pdf.iloc[i]
            rec = parse_doc(
                row["url"],
                bytes(row["html"]) if row["html"] is not None else b"",
                row.get("text"),
                row.get("lang"),
                doc_id=int(row["doc_id"]) if has_docid else None,
            )
            rec["warc_ts"] = row.get("warc_ts")
            recs.append(rec)
        if recs:
            yield pd.DataFrame(recs)[[f.name for f in PARSED_SCHEMA.fields]]


class IndexPaths:
    """Index directory layout. Every table is generation-partitioned
    (``gen=G`` dirs): a generation is one build/ingest batch — the analog
    of one RdbBase file generation (RdbBase.h:193). Readers apply
    newest-generation-wins per docId (RdbIndex semantics, RdbIndex.h:20);
    ``compact_index`` physically merges generations (RdbMerge analog)."""

    def __init__(self, index_dir: str):
        self.root = index_dir
        self.parsed = os.path.join(index_dir, "parsed")
        self.docs = os.path.join(index_dir, "docs")
        self.term_stats = os.path.join(index_dir, "term_stats")
        self.lexicon = os.path.join(index_dir, "lexicon")
        self.segments = os.path.join(index_dir, "segments")
        self.tombstones = os.path.join(index_dir, "tombstones")
        self.manifests = os.path.join(index_dir, "_manifests")
        self.meta = os.path.join(index_dir, "_index_meta.json")

    def gen(self, table: str, gen: int) -> str:
        return os.path.join(getattr(self, table), f"gen={gen}")


SEGMENT_SCHEMA = T.StructType(
    [
        T.StructField("bucket", T.IntegerType()),
        T.StructField("term_id", T.LongType()),
        T.StructField("salt", T.IntegerType()),
        T.StructField("df", T.LongType()),
        T.StructField("cf", T.LongType()),
        T.StructField("max_tf", T.LongType()),
        # blob size as a column so build metrics aggregate with column
        # pruning (never re-reading the blobs themselves)
        T.StructField("n_bytes", T.LongType()),
        T.StructField("postings", T.BinaryType()),
    ]
)


def _encode_runs(term: np.ndarray, salt: np.ndarray, doc: np.ndarray,
                 pos: np.ndarray, ctx: np.ndarray, dl: np.ndarray,
                 rank: np.ndarray, n_buckets: int) -> pd.DataFrame:
    """Encode a frame of postings SORTED by (term_id, salt, doc_id, pos)
    into one segment row per (term_id, salt) run. Pure numpy slicing —
    no per-group pandas frames (this is the RdbDump memtable->sorted-file
    compression, RdbDump.cpp + Posdb.h:228-233)."""
    key_change = np.empty(len(term), dtype=bool)
    key_change[0] = True
    key_change[1:] = (term[1:] != term[:-1]) | (salt[1:] != salt[:-1])
    starts = np.flatnonzero(key_change)
    ends = np.empty_like(starts)
    ends[:-1] = starts[1:]
    ends[-1] = len(term)
    recs = []
    for s, e in zip(starts, ends):
        d = doc[s:e].astype(np.uint64)
        uniq, dstarts, counts = np.unique(d, return_index=True,
                                          return_counts=True)
        blob = encode_postings(
            uniq,
            counts.astype(np.uint64),
            dl[s:e][dstarts].astype(np.uint64),
            pos[s:e].astype(np.uint64),
            ctx[s:e].astype(np.uint64),
            rank[s:e][dstarts].astype(np.uint64),
        )
        tid = int(term[s])
        recs.append((int(tid % n_buckets), tid, int(salt[s]),
                     int(len(uniq)), int(e - s), int(counts.max()),
                     len(blob), blob))
    return pd.DataFrame(
        recs, columns=["bucket", "term_id", "salt", "df", "cf", "max_tf",
                       "n_bytes", "postings"])


def make_encode_partition(n_buckets: int):
    """mapInPandas body over a partition hash-shuffled on (term_id, salt)
    and sorted within: encodes (term, salt) runs, carrying the trailing
    incomplete run across Arrow batch boundaries."""

    def encode_partition(iterator):
        carry: pd.DataFrame | None = None
        for pdf in iterator:
            if carry is not None and len(carry):
                pdf = pd.concat([carry, pdf], ignore_index=True)
            if not len(pdf):
                continue
            last_t = pdf["term_id"].iloc[-1]
            last_s = pdf["salt"].iloc[-1]
            tail = (pdf["term_id"] == last_t) & (pdf["salt"] == last_s)
            carry = pdf[tail]
            body = pdf[~tail]
            if len(body):
                yield _encode_runs(
                    body["term_id"].to_numpy(np.int64),
                    body["salt"].to_numpy(np.int64),
                    body["doc_id"].to_numpy(np.int64),
                    body["pos"].to_numpy(np.int64),
                    body["ctx"].to_numpy(np.int64),
                    body["dl"].to_numpy(np.int64),
                    body["rank"].to_numpy(np.int64),
                    n_buckets)
        if carry is not None and len(carry):
            yield _encode_runs(
                carry["term_id"].to_numpy(np.int64),
                carry["salt"].to_numpy(np.int64),
                carry["doc_id"].to_numpy(np.int64),
                carry["pos"].to_numpy(np.int64),
                carry["ctx"].to_numpy(np.int64),
                carry["dl"].to_numpy(np.int64),
                carry["rank"].to_numpy(np.int64),
                n_buckets)

    return encode_partition


def build_index(
    spark: SparkSession,
    webtext: DataFrame,
    index_dir: str,
    conf: EngineConf = DEFAULT_CONF,
    gen: int = 0,
    buckets: list[int] | None = None,
    resume: bool = True,
) -> dict:
    """Full build. Returns build metrics. Resumable: completed buckets
    (recorded in _manifests/bucket_*.json) are skipped when resume=True."""
    paths = IndexPaths(index_dir)
    os.makedirs(paths.manifests, exist_ok=True)
    t0 = time.time()
    p_parsed = paths.gen("parsed", gen)
    p_docs = paths.gen("docs", gen)
    p_stats = paths.gen("term_stats", gen)
    p_lex = paths.gen("lexicon", gen)

    # ---- stage A: parse (checkpoint) ----
    if not resume or not _parquet_exists(p_parsed):
        parsed = webtext.mapInPandas(parse_docs_udf, schema=PARSED_SCHEMA)
        parsed.write.mode("overwrite").parquet(p_parsed)
    parsed = spark.read.parquet(p_parsed)
    t_parse = time.time()

    # ---- stage B: docs + term stats + lexicon (Catalyst only) ----
    doc_cols = ["doc_id", "url", "site_id", "site_rank", "lang_id", "title",
                "n_tokens", "warc_ts"]
    if not resume or not _parquet_exists(p_docs):
        parsed.select(*doc_cols).write.mode("overwrite").parquet(p_docs)
    if not resume or not _parquet_exists(p_lex):
        (
            parsed.select(
                F.explode(F.arrays_zip(
                    F.col("lex_words").alias("term"),
                    F.col("lex_ids").alias("term_id"),
                )).alias("z")
            )
            .select(F.col("z.term").alias("term"),
                    F.col("z.term_id").alias("term_id"))
            .distinct()
            .write.mode("overwrite")
            .parquet(p_lex)
        )

    postings = (
        parsed.select(
            "doc_id",
            F.col("n_tokens").alias("dl"),
            (F.col("site_rank").cast("long") * 64 + F.col("lang_id")).alias("rank"),
            F.explode(F.arrays_zip(
                F.col("term_ids").alias("term_id"),
                F.col("poss").alias("pos"),
                F.col("ctxs").alias("ctx"),
            )).alias("z"),
        )
        .select(
            "doc_id", "dl", "rank",
            F.col("z.term_id").alias("term_id"),
            F.col("z.pos").alias("pos"),
            F.col("z.ctx").alias("ctx"),
        )
    )

    if not resume or not _parquet_exists(p_stats):
        # two-level partial agg beats countDistinct's expand rewrite: the
        # map-side combine on (term_id, doc_id) collapses each doc's tf
        # before the shuffle (a doc's positions for a term are co-located)
        (
            postings.groupBy("term_id", "doc_id")
            .agg(F.count("*").alias("tf"))
            .groupBy("term_id")
            .agg(F.count("*").alias("df"), F.sum("tf").alias("cf"))
            .write.mode("overwrite")
            .parquet(p_stats)
        )
    term_stats = spark.read.parquet(p_stats)
    n_docs = spark.read.parquet(p_docs).count()
    t_stats = time.time()

    # ---- stage C: salted segment encode (the one wide shuffle) ----
    # hot-term decision uses cumulative df over ALL generations so a doc's
    # (term, salt) assignment is stable across incremental builds
    # (salt = doc_id % n_salts is itself deterministic per doc)
    stats_dirs = [p for p in _glob_gens(paths.term_stats) if True]
    all_stats = (spark.read.parquet(*stats_dirs)
                 if stats_dirs else term_stats)
    hot = (
        all_stats.groupBy("term_id").agg(F.sum("df").alias("df"))
        .where(F.col("df") > conf.salt_df_threshold)
        .select("term_id", F.lit(True).alias("is_hot"))
    )
    n_salts = F.lit(conf.n_salts)
    with_salt = (
        postings.join(F.broadcast(hot), "term_id", "left")
        .withColumn(
            "salt",
            F.when(F.col("is_hot").isNotNull(),
                   F.pmod(F.col("doc_id"), n_salts).cast("int"))
            .otherwise(F.lit(0)),
        )
        .drop("is_hot")
    )

    all_buckets = buckets if buckets is not None else list(range(conf.n_buckets))
    todo = [b for b in all_buckets
            if not (resume and os.path.exists(_manifest_path(paths, gen, b)))]
    if todo:
        if len(todo) < conf.n_buckets:
            sel = with_salt.where(
                F.pmod(F.col("term_id"), F.lit(conf.n_buckets))
                .cast("int").isin(todo))
        else:
            sel = with_salt
        # ONE wide shuffle: hash on (term_id, salt) — salted sub-lists of
        # a hot term land on different reducers (skew splitting), then
        # sort within partition and encode runs in a single pass
        seg = (
            sel.repartition(F.col("term_id"), F.col("salt"))
            .sortWithinPartitions("term_id", "salt", "doc_id", "pos")
            .mapInPandas(make_encode_partition(conf.n_buckets),
                         schema=SEGMENT_SCHEMA)
        )
        out = os.path.join(paths.segments, f"gen={gen}")
        # consolidation shuffle of the ENCODED blobs (a fraction of the
        # posting volume): one sorted file per bucket dir -> term_id
        # row-group stats stay tight for scan pruning (RdbMap analog)
        (
            seg.repartition("bucket")
            .sortWithinPartitions("term_id", "salt")
            .write.mode("append")
            .partitionBy("bucket")
            .parquet(out)
        )
        # per-bucket manifest: lineage + metrics (north rule). The stats
        # scan column-prunes to (bucket, cf, n_bytes) — blobs not read.
        seg_stats = (
            spark.read.parquet(out)
            .groupBy("bucket")
            .agg(
                F.count("*").alias("n_terms"),
                F.sum("cf").alias("n_postings"),
                F.sum("n_bytes").alias("bytes_out"),
            )
            .collect()
        )
        elapsed = time.time() - t_stats
        for r in seg_stats:
            if r["bucket"] not in todo:
                continue
            with open(_manifest_path(paths, gen, r["bucket"]), "w") as f:
                json.dump(
                    {
                        "bucket": r["bucket"],
                        "gen": gen,
                        "n_terms": r["n_terms"],
                        "n_postings": int(r["n_postings"]),
                        "bytes_out": int(r["bytes_out"]),
                        "secs_stage_c": elapsed,
                        "input": paths.parsed,
                        "status": "complete",
                    },
                    f,
                )
    t_seg = time.time()

    meta = {
        "n_docs": int(n_docs),
        "n_terms": int(term_stats.count()),
        "conf": {"n_buckets": conf.n_buckets, "n_salts": conf.n_salts,
                 "salt_df_threshold": conf.salt_df_threshold},
        "gens": [gen],
        "secs": {"parse": t_parse - t0, "stats": t_stats - t_parse,
                 "segments": t_seg - t_stats, "total": t_seg - t0},
        "docs_per_sec": n_docs / max(t_seg - t0, 1e-9),
    }
    if os.path.exists(paths.meta):
        with open(paths.meta) as f:
            old = json.load(f)
        meta["gens"] = sorted(set(old.get("gens", [])) | {gen})
    with open(paths.meta, "w") as f:
        json.dump(meta, f)
    return meta


def delete_docs(spark: SparkSession, index_dir: str, doc_ids: list[int],
                gen: int) -> None:
    """Record tombstones for docIds at generation `gen`: the analog of the
    reference's negative keys (delbit, Posdb.h:88; RdbList.cpp:1945-2043).
    Readers drop postings of a doc whose tombstone gen is >= the posting's
    gen; ``compact_index`` annihilates them physically (merge-time
    negative-key removal, RdbListTest.cpp:184)."""
    paths = IndexPaths(index_dir)
    df = spark.createDataFrame([(int(d),) for d in doc_ids], "doc_id long")
    df.write.mode("overwrite").parquet(paths.gen("tombstones", gen))


def compact_index(spark: SparkSession, index_dir: str,
                  conf: EngineConf = DEFAULT_CONF) -> dict:
    """Merge all segment generations into one new generation
    (k-way posdb merge, RdbList.cpp:2154 posdbMerge_r + RdbMerge.h):
    newest-gen-wins per (term_id, doc_id), tombstoned docs annihilated.
    Pure Catalyst shuffle on (bucket, term_id, salt) + a vectorized
    per-group merge UDF (codec.merge_blobs)."""
    paths = IndexPaths(index_dir)
    with open(paths.meta) as f:
        meta = json.load(f)
    gens = meta.get("gens", [0])
    new_gen = max(gens) + 1
    seg = spark.read.option("basePath", paths.segments).parquet(
        *[paths.gen("segments", g) for g in gens if
          os.path.exists(paths.gen("segments", g))])
    tombs = _read_tombstones(spark, paths, gens)
    events = compute_doc_events(spark, paths, gens)
    ev_map = ({int(r["doc_id"]): int(r["keep_gen"])
               for r in events.collect()} if events is not None else {})
    ev_bc = spark.sparkContext.broadcast(ev_map)

    merged_schema = T.StructType(
        [f for f in SEGMENT_SCHEMA.fields] + [T.StructField("gen", T.IntegerType())]
    )

    def merge_group(pdf: pd.DataFrame) -> pd.DataFrame:
        from ..functions.codec import decode_postings, encode_postings

        pdf = pdf.sort_values("gen", kind="mergesort")
        decoded = [decode_postings(bytes(b)) for b in pdf["postings"]]
        blob_gens = pdf["gen"].to_list()
        max_gen = int(blob_gens[-1])
        # concatenate per-doc arrays with their gen tags
        docs = np.concatenate([d["doc_ids"] for d in decoded])
        gens_arr = np.concatenate(
            [np.full(len(d["doc_ids"]), g, dtype=np.int64)
             for g, d in zip(blob_gens, decoded)])
        tfs = np.concatenate([d["tfs"] for d in decoded])
        dls = np.concatenate([d["doclens"] for d in decoded])
        rks = np.concatenate([d["ranks"] for d in decoded])
        # per-doc slices into the flattened position/ctx streams
        pos_all = [d["positions"] for d in decoded]
        ctx_all = [d["ctxs"] for d in decoded]
        src = np.concatenate(
            [np.full(len(d["doc_ids"]), i, dtype=np.int64)
             for i, d in enumerate(decoded)])
        local_start = np.concatenate(
            [np.concatenate(([0], np.cumsum(d["tfs"][:-1]))).astype(np.int64)
             if len(d["tfs"]) else np.empty(0, dtype=np.int64)
             for d in decoded])
        # doc-level latest-event resolution (RdbIndex semantics): a
        # posting at gen g is live iff its doc has no later event or the
        # latest event is a re-index at exactly g; keep_gen -1 = deleted
        emap = ev_bc.value
        keep = np.arange(len(docs), dtype=np.int64)
        if emap:
            edocs = np.array(sorted(emap), dtype=np.uint64)
            egens = np.array([emap[int(d)] for d in edocs], dtype=np.int64)
            ei = np.searchsorted(edocs, docs)
            ei_c = np.clip(ei, 0, len(edocs) - 1)
            in_map = (len(edocs) > 0) & (edocs[ei_c] == docs)
            dead = in_map & (egens[ei_c] != gens_arr)
            keep = keep[~dead]
        # safety: newest-gen-wins per doc for any residual duplicates
        order = keep[np.lexsort((gens_arr[keep], docs[keep]))]
        if len(order):
            keep = order[np.concatenate(
                (docs[order][:-1] != docs[order][1:], [True]))]
        else:
            keep = order
        if len(keep) == 0:
            return pd.DataFrame(columns=[f.name for f in merged_schema.fields])
        keep = keep[np.argsort(docs[keep], kind="stable")]
        k_tf = tfs[keep].astype(np.uint64)
        pos_out = np.concatenate(
            [pos_all[src[i]][local_start[i]: local_start[i] + int(tfs[i])]
             for i in keep]) if k_tf.sum() else np.empty(0, dtype=np.uint64)
        ctx_out = np.concatenate(
            [ctx_all[src[i]][local_start[i]: local_start[i] + int(tfs[i])]
             for i in keep]) if k_tf.sum() else np.empty(0, dtype=np.uint64)
        blob = encode_postings(docs[keep], k_tf, dls[keep], pos_out,
                               ctx_out, rks[keep])
        return pd.DataFrame(
            [
                {
                    "bucket": int(pdf["bucket"].iloc[0]),
                    "term_id": int(pdf["term_id"].iloc[0]),
                    "salt": int(pdf["salt"].iloc[0]),
                    "df": int(len(keep)),
                    "cf": int(k_tf.sum()),
                    "max_tf": int(k_tf.max()),
                    "n_bytes": len(blob),
                    "postings": blob,
                    "gen": max_gen,
                }
            ]
        )

    out_dir = paths.gen("segments", new_gen)
    (
        seg.groupBy("bucket", "term_id", "salt")
        .applyInPandas(merge_group, schema=merged_schema)
        .drop("gen")
        .repartition("bucket")
        .sortWithinPartitions("term_id", "salt")
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(out_dir)
    )

    # docs/term_stats/lexicon: newest-wins rollup into the new gen
    docs = spark.read.option("basePath", paths.docs).parquet(
        *[paths.gen("docs", g) for g in gens
          if os.path.exists(paths.gen("docs", g))])
    from pyspark.sql import Window
    w = Window.partitionBy("doc_id").orderBy(F.desc("gen"))
    docs_new = (
        docs.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1).drop("_rn", "gen")
    )
    if tombs:
        tomb_df = spark.createDataFrame(
            [(int(d),) for d in tombs], "doc_id long")
        docs_new = docs_new.join(F.broadcast(tomb_df), "doc_id", "left_anti")
    docs_new.write.mode("overwrite").parquet(paths.gen("docs", new_gen))
    # exact term stats recomputed from merged segments (cheap: one row per
    # (term, salt) blob, not per posting)
    (
        spark.read.parquet(out_dir)
        .groupBy("term_id")
        .agg(F.sum("df").alias("df"), F.sum("cf").alias("cf"))
        .write.mode("overwrite")
        .parquet(paths.gen("term_stats", new_gen))
    )
    lex_dirs = [paths.gen("lexicon", g) for g in gens
                if os.path.exists(paths.gen("lexicon", g))]
    if lex_dirs:
        (
            spark.read.parquet(*lex_dirs).distinct()
            .write.mode("overwrite").parquet(paths.gen("lexicon", new_gen))
        )

    n_docs = docs_new.count()
    meta.update({
        "gens": [new_gen],
        "n_docs": int(n_docs),
        "compacted_from": gens,
    })
    with open(paths.meta, "w") as f:
        json.dump(meta, f)
    return meta


def _read_tombstones(spark: SparkSession, paths: IndexPaths,
                     gens: list[int]) -> dict[int, int] | None:
    """doc_id -> newest tombstone gen, or None if no tombstones exist."""
    dirs = [paths.gen("tombstones", g) for g in gens
            if os.path.exists(paths.gen("tombstones", g))]
    if not dirs:
        return None
    rows = (
        spark.read.option("basePath", paths.tombstones).parquet(*dirs)
        .groupBy("doc_id").agg(F.max("gen").alias("gen")).collect()
    )
    return {int(r["doc_id"]): int(r["gen"]) for r in rows}


def compute_doc_events(spark: SparkSession, paths: IndexPaths,
                       gens: list[int]) -> DataFrame | None:
    """(doc_id, keep_gen) for every doc touched after the base generation:
    keep_gen = the doc's newest (re)index gen, or -1 if its newest event
    is a tombstone. A posting of doc d at gen g is live iff d is absent
    here or keep_gen == g — the RdbIndex doc-presence resolution
    (RdbIndex.h:20-40): a re-crawl shadows ALL the doc's older postings.
    Only delta docs appear, so this stays broadcast-sized at any corpus
    scale (re-crawl batches are small relative to the index). None when
    single-generation with no tombstones (compacted fast path)."""
    parts = []
    base_gen = min(gens) if gens else 0
    delta_dirs = [paths.gen("docs", g) for g in gens
                  if g != base_gen and os.path.exists(paths.gen("docs", g))]
    if delta_dirs:
        parts.append(
            spark.read.option("basePath", paths.docs).parquet(*delta_dirs)
            .select("doc_id", F.col("gen").cast("int").alias("gen"),
                    F.lit(False).alias("is_tomb"))
        )
    tomb_dirs = [paths.gen("tombstones", g) for g in gens
                 if os.path.exists(paths.gen("tombstones", g))]
    if tomb_dirs:
        parts.append(
            spark.read.option("basePath", paths.tombstones).parquet(*tomb_dirs)
            .select("doc_id", F.col("gen").cast("int").alias("gen"),
                    F.lit(True).alias("is_tomb"))
        )
    if not parts:
        return None
    events = parts[0]
    for p in parts[1:]:
        events = events.unionByName(p)
    return (
        events.groupBy("doc_id")
        .agg(F.max(F.struct("gen", "is_tomb")).alias("ev"))
        .select(
            "doc_id",
            F.when(F.col("ev.is_tomb"), F.lit(-1))
            .otherwise(F.col("ev.gen")).alias("keep_gen"),
        )
    )


def _manifest_path(paths: IndexPaths, gen: int, bucket: int) -> str:
    return os.path.join(paths.manifests, f"gen{gen}_bucket{bucket:04d}.json")


def _glob_gens(table_dir: str) -> list[str]:
    if not os.path.isdir(table_dir):
        return []
    return sorted(
        os.path.join(table_dir, d) for d in os.listdir(table_dir)
        if d.startswith("gen=")
    )


def _parquet_exists(path: str) -> bool:
    return os.path.exists(os.path.join(path, "_SUCCESS"))
