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
