"""Deterministic splitting / sampling for training-data pipelines.

At 100 TB a train/val/test split must be (a) reproducible across reruns
and cluster sizes — no `rand()`, whose per-row draws depend on partition
layout — and (b) leakage-aware: two near-identical documents must not
land on opposite sides of the split, or eval measures memorization.
Both follow from hashing a STABLE KEY per document:

- key = the document text (default): exact duplicates always land in
  the same split; combine with ops.dedup.dup_clusters and key on the
  cluster's canonical doc to extend that guarantee to near-dups.
- key = url / domain: holds whole sites out of train (domain holdout).

The hash is the same portable md5-derived ``hash60`` the other ops use
(Spark `conv(substr(md5(x),1,15),16,10)` == DuckDB
`('0x' || substr(md5(x),1,15))::bigint`), so the driver oracle checks
the exact assignment, not just counts. Everything is a narrow
projection — no shuffle, no UDF, scale-free.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .textstats import hash60

BUCKETS = 1_000_000  # split granularity: 1e-6 resolution on weights


def split_bucket(key: Column, salt: str) -> Column:
    """Deterministic bucket 0..BUCKETS-1 from a stable key column."""
    return hash60(F.concat(F.lit(salt), key)) % F.lit(BUCKETS)


def split_thresholds(weights: "list[tuple[str, float]]") -> "list[tuple[str, int]]":
    """Cumulative integer bucket thresholds for named weights (must sum
    to 1 within rounding; the last split absorbs the remainder)."""
    total = sum(w for _, w in weights)
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights sum to {total}, expected 1.0")
    out, acc = [], 0.0
    for name, w in weights:
        acc += w
        out.append((name, min(BUCKETS, round(acc * BUCKETS))))
    out[-1] = (out[-1][0], BUCKETS)
    return out


def deterministic_split(docs: DataFrame,
                        weights: "list[tuple[str, float]] | None" = None,
                        key_col: str = "text",
                        salt: str = "split-v1") -> DataFrame:
    """Assign every row a split label, deterministically from
    md5(salt || key). Returns the input plus a ``split`` column."""
    if weights is None:
        weights = [("train", 0.9), ("val", 0.05), ("test", 0.05)]
    b = split_bucket(F.col(key_col).cast("string"), salt)
    expr = None
    for name, thr in split_thresholds(weights):
        cond = b < F.lit(thr)
        expr = F.when(cond, F.lit(name)) if expr is None \
            else expr.when(cond, F.lit(name))
    return docs.withColumn("split", expr)


def deterministic_sample(docs: DataFrame, frac: float,
                         key_col: str = "text",
                         salt: str = "sample-v1") -> DataFrame:
    """Keep a deterministic ~frac of rows (bucket < frac * BUCKETS).
    Samples are NESTED across fracs with the same salt (the 1% sample
    is a subset of the 10% sample), which is what iterative data-scaling
    experiments want."""
    thr = round(frac * BUCKETS)
    b = split_bucket(F.col(key_col).cast("string"), salt)
    return docs.where(b < F.lit(thr))


def stratified_sample(docs: DataFrame, n_per_stratum: int,
                      strata_cols: "list[str] | None" = None,
                      id_col: str = "doc_id",
                      salt: str = "strat-v1") -> DataFrame:
    """Deterministic equal-allocation sampling: keep the n_per_stratum
    rows with the smallest md5(salt || id) per stratum — the balanced
    training-mix primitive (equal docs per language / per source
    domain) that plain rate sampling can't give on skewed corpora.

    Hash-ordering makes the sample (a) reproducible across reruns and
    cluster sizes, (b) NESTED in n (the 100-per-stratum sample contains
    the 50-per-stratum sample), like ``deterministic_sample``. Returns
    the input plus a ``stratum_rank`` column (1-based hash rank within
    the stratum).

    Scale shape: one window over the strata — a single shuffle
    partitioned by the stratum key. Strata counts are typically small
    (languages, source domains), so per-partition top-N is the
    rank-then-filter Catalyst already optimizes (WindowGroupLimit
    pushes the n_per_stratum limit into the sort)."""
    from pyspark.sql import Window

    strata_cols = strata_cols or ["lang"]
    hk = hash60(F.concat(F.lit(salt),
                         F.col(id_col).cast("string")))
    w = (Window.partitionBy(*[F.col(c) for c in strata_cols])
         .orderBy(hk.asc(), F.col(id_col).asc()))
    return (docs.withColumn("stratum_rank", F.row_number().over(w))
            .where(F.col("stratum_rank") <= n_per_stratum))


DSIR_SALT = "dsir-v1"


def _dsir_feats(docs: DataFrame, n_buckets: int, id_col: str,
                text_col: str) -> DataFrame:
    """(doc_id, bucket) — one row per hashed unigram+bigram OCCURRENCE.
    Features follow Xie et al. 2023 §4: word uni+bigrams hashed into
    n_buckets (their N=10k) — the bag the importance estimator counts."""
    ts = F.split(F.col(text_col), " ")
    grams = F.concat(
        ts,
        F.when(F.size(ts) >= 2,
               F.transform(
                   F.sequence(F.lit(1), F.size(ts) - 1),
                   lambda i: F.concat_ws(
                       " ", F.element_at(ts, i), F.element_at(ts, i + 1))))
        .otherwise(F.array().cast("array<string>")))
    return (docs.select(F.col(id_col).alias("doc_id"),
                        F.explode(grams).alias("gram"))
            .select("doc_id",
                    (hash60(F.concat(F.lit(DSIR_SALT), F.col("gram")))
                     % F.lit(n_buckets)).alias("bucket")))


def dsir_importance(docs: DataFrame, target: DataFrame,
                    n_buckets: int = 4096, k: "int | None" = None,
                    id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """DSIR — Data Selection with Importance Resampling (Xie et al.
    2023, arXiv:2302.03169): score every raw document by how much more
    likely its hashed-ngram bag is under the TARGET distribution than
    under the RAW distribution, ``logw(d) = Σ_f count_d(f) ·
    (ln p_target(f) − ln p_raw(f))``, with add-one smoothing over the
    n_buckets hashed features (word uni+bigrams, hash60 % n_buckets).
    The paper then Gumbel-samples ∝ w; this implementation ranks
    deterministically by (logw DESC, doc_id ASC) — reproducible across
    reruns and cluster sizes, like every sampler in this module — and
    keeps the top ``k`` when given. Returns
    ``(doc_id, n_feats, logw, dsir_rank)``.

    Scale shape: two bucket-count aggregations (n_buckets rows each —
    broadcastable), one join of exploded feature occurrences against
    the broadcast ratio table pre-aggregated per (doc, bucket)
    map-side, one per-doc sum, and a global top-k only when k is given
    (TakeOrderedAndProject, no full sort). The raw corpus never
    collects; the 100-TB cost is the one explode+sum, the same shape as
    the index build's posting stream."""
    feats = _dsir_feats(docs, n_buckets, id_col, text_col)
    tfeats = _dsir_feats(target, n_buckets, id_col, text_col)

    ct = tfeats.groupBy("bucket").agg(F.count("*").alias("cnt_t"))
    cr = feats.groupBy("bucket").agg(F.count("*").alias("cnt_r"))
    tot_t = ct.agg(F.sum("cnt_t").cast("double").alias("total_t"))
    tot_r = cr.agg(F.sum("cnt_r").cast("double").alias("total_r"))
    B = F.lit(float(n_buckets))
    # full-outer on bucket: a bucket absent from one side counts 0 there
    # and takes that side's add-one floor
    ratio = (ct.join(cr, "bucket", "full")
             .crossJoin(F.broadcast(tot_t))
             .crossJoin(F.broadcast(tot_r))
             .select(
                 "bucket",
                 (F.log((F.coalesce(F.col("cnt_t"), F.lit(0)) + 1.0)
                        / (F.col("total_t") + B))
                  - F.log((F.coalesce(F.col("cnt_r"), F.lit(0)) + 1.0)
                          / (F.col("total_r") + B))).alias("llr")))
    # pre-aggregate per (doc, bucket) map-side, then one broadcast join
    per_doc = (feats.groupBy("doc_id", "bucket")
               .agg(F.count("*").alias("occ"))
               .join(F.broadcast(ratio), "bucket")
               .groupBy("doc_id")
               .agg(F.sum("occ").cast("long").alias("n_feats"),
                    F.round(F.sum(F.col("occ") * F.col("llr")), 4)
                    .alias("logw")))
    from pyspark.sql import Window

    w = Window.orderBy(F.col("logw").desc(), F.col("doc_id").asc())
    if k is not None:
        # distributed top-k first (TakeOrderedAndProject), THEN number
        # the k survivors — the global rank window only ever sees k rows
        per_doc = (per_doc
                   .orderBy(F.col("logw").desc(), F.col("doc_id").asc())
                   .limit(k))
    # k=None ranks the whole corpus: a global sort by construction —
    # use k (the resampling size) at scale
    return per_doc.withColumn(
        "dsir_rank", F.row_number().over(w).cast("long"))


def mixture_sample(docs: DataFrame, n_target: int,
                   source_col: str = "lang",
                   weights: "dict[str, int] | None" = None,
                   id_col: str = "doc_id",
                   salt: str = "mix-v1") -> DataFrame:
    """Temperature-based corpus mixing (the multilingual/multi-source
    sampling rule of XLM-R/PaLM/Llama: p_i ∝ n_i^alpha with alpha<1 to
    upweight small sources): allocate n_target docs across sources by
    smoothed weight, then take each source's quota deterministically.

    alpha is fixed at 0.5 implemented as INTEGER sqrt — w_i =
    floor(sqrt(count_i)), quota_i = n_target·w_i div Σw — so the
    allocation is integer-exact and engine-reproducible (no libm pow
    in the decision path; floor(sqrt) is exact for counts < 2^52).
    For any other temperature pass precomputed integer ``weights``
    (source -> weight); the allocation arithmetic is unchanged.
    Σquota <= n_target (floor allocation; remainder intentionally
    undistributed — stable under source reordering); a source smaller
    than its quota contributes everything it has, so the sample can
    undershoot n_target on very skewed corpora (the PaLM-style mixing
    rule's own behavior when a small source is exhausted).

    Within a source, the quota fills with the smallest
    md5(salt||doc_id) rows — the same hash ranking as
    ``stratified_sample``: reproducible across reruns/cluster sizes
    and nested in n_target. Returns input rows + (mix_weight, quota,
    mix_rank). Scale shape: one count aggregation (sources are few →
    tiny result, broadcast back) + one window partitioned by source."""
    from pyspark.sql import Window

    from .textstats import hash60

    counts = docs.groupBy(F.col(source_col).alias("_src")).count()
    if weights is None:
        wcol = F.floor(F.sqrt(F.col("count"))).cast("long")
    else:
        wcol = F.coalesce(*(
            [F.when(F.col("_src") == k, F.lit(int(v)))
             for k, v in sorted(weights.items())] + [F.lit(0)]))
    wtab = counts.select("_src", wcol.alias("mix_weight"))
    total = wtab.agg(F.sum("mix_weight")).collect()[0][0] or 1
    wtab = wtab.withColumn(
        "quota", F.expr(f"{int(n_target)}L * mix_weight div {int(total)}L"))
    hk = hash60(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    w = (Window.partitionBy(source_col)
         .orderBy(hk.asc(), F.col(id_col).asc()))
    return (docs.withColumn("mix_rank", F.row_number().over(w))
            .join(F.broadcast(wtab),
                  F.col(source_col) == F.col("_src"))
            .where(F.col("mix_rank") <= F.col("quota"))
            .drop("_src"))
