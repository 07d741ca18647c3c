"""Hybrid lexical + vector retrieval with reciprocal-rank fusion.

The reference is a pure lexical engine (posdb positions + the
PosdbTable scorer); a corpus that also carries document embeddings
(the ``embeddings`` side table of the input hint) serves modern
retrieval by FUSING the two result lists. Reciprocal-rank fusion
(Cormack, Clarke & Buettcher 2009) is the standard score-free way:
``rrf(d) = Σ_legs 1 / (rrf_k + rank_leg(d))`` over the legs where d
appears in the top-k_each — no score normalization across
incomparable scales (BM25 vs cosine), just ranks.

Scale shape: each leg is already a bounded top-k (the BM25 leg rides
block-max WAND / the sketch-gated planner; the vector leg can be the
brute scorer or any persisted ANN index's probe — both end in a
TakeOrderedAndProject), so the fusion joins two k_each-row frames:
driver-scale inputs, one full-outer join on doc_id, one final sort.
The expensive work stays in the legs, which prune like the standalone
paths they reuse.

Determinism contract: leg ranks order by the ROUNDED leg score
(BM25 to 6 decimals, cosine to 4 — the same rounding the standalone
oracle entries pin) with doc_id ascending ties, so rank assignment —
and therefore the fused order — is bit-reproducible across engines
and partitionings. RRF only consumes ranks, so rounding the scores
first costs nothing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..config import DEFAULT_CONF, EngineConf

__all__ = ["rrf_fuse", "hybrid_search"]


def rrf_fuse(legs: list[DataFrame], k: int = 10,
             rrf_k: int = 60) -> DataFrame:
    """Fuse rank frames ``(doc_id, rank)`` (rank 1-based) into
    ``(doc_id, rrf, n_legs)`` — top-k by (rrf DESC, doc_id ASC).
    ``rrf`` is rounded to 6 decimals; ``n_legs`` counts the legs the
    doc appeared in (the agreement signal)."""
    if not legs:
        raise ValueError("need at least one leg")
    fused = None
    for i, leg in enumerate(legs):
        part = leg.select(
            "doc_id",
            (1.0 / (F.lit(float(rrf_k)) + F.col("rank").cast("double")))
            .alias(f"_c{i}"))
        fused = part if fused is None else fused.join(part, "doc_id",
                                                      "full")
    contribs = [F.col(f"_c{i}") for i in range(len(legs))]
    rrf = sum(F.coalesce(c, F.lit(0.0)) for c in contribs)
    n_legs = sum(c.isNotNull().cast("int") for c in contribs)
    return (fused.select("doc_id",
                         F.round(rrf, 6).alias("rrf"),
                         n_legs.alias("n_legs"))
            .orderBy(F.col("rrf").desc(), F.col("doc_id").asc())
            .limit(k))


def hybrid_search(spark: SparkSession, index_dir: str, query: str,
                  query_vec: list[float], embeddings: DataFrame,
                  k: int = 10, k_each: int = 20, rrf_k: int = 60,
                  conf: EngineConf = DEFAULT_CONF,
                  reader=None, ann_impl: str = "brute") -> DataFrame:
    """BM25 top-k_each (full engine query language) ⊕ embedding-cosine
    top-k_each, fused by RRF: ``(doc_id, rrf, n_legs)``, top-k.
    ``embeddings`` is a (vec_id, embedding) frame whose vec_id IS the
    doc_id (the input hint's side table). ``ann_impl`` picks the
    vector leg: "brute" (exact) today; persisted-index probes
    (ivf/lsh/ivfpq) share the (vec_id, cos) shape and plug in the
    same way."""
    from ..ops.ann import brute_force_topk
    from .executor import search

    if ann_impl != "brute":
        raise ValueError("ann_impl: only 'brute' is wired here; call "
                         "rrf_fuse directly with an indexed probe leg")
    lex = (search(spark, index_dir, query, k=k_each, conf=conf,
                  reader=reader)
           .select("doc_id", F.round("score", 6).alias("s")))
    w = Window.orderBy(F.col("s").desc(), F.col("doc_id").asc())
    lex_rank = lex.select("doc_id", F.row_number().over(w).alias("rank"))
    vec = (brute_force_topk(embeddings, query_vec, k=k_each)
           .select(F.col("vec_id").alias("doc_id"), "cos"))
    wv = Window.orderBy(F.col("cos").desc(), F.col("doc_id").asc())
    vec_rank = vec.select("doc_id",
                          F.row_number().over(wv).alias("rank"))
    return rrf_fuse([lex_rank, vec_rank], k=k, rrf_k=rrf_k)
