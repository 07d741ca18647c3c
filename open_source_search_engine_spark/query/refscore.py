"""Reference-scorer mode: the Gigablast position/context-weight ranking
formula (SURVEY.md §4.6), reproduced from the reference semantics so our
engine can return rank-identical results when configured identically.

Formula (reference citations):

  tfw_i    = scale_linear(df_i/N, 0.0, 0.5, 1.0, 0.5)    Msg3a.cpp:1003-1033
  ctx(p)   = 100 · divW² · hgW² · denW² · spamW² [· synW²]
                                                  PosdbTable.cpp:210-461
  single_i = (Σ top-10 ctx, one per distinct hash-group) · tfw_i²
                                                  PosdbTable.cpp:3245
  pair(i,j)= Σ top-10 [100·denW·denW·hgW·hgW·spamW·spamW/(dist+1)]
             · tfw_i·tfw_j                        PosdbTable.cpp:715-792
  dist     = max(|p1-p2|, 2) - qdist, +1 if out of query order
  minScore = min(min_i single_i, min_{i<j} pair(i,j))
                                                  PosdbTable.cpp:4207-4216
  score    = minScore · (siteRank·0.3333 + 1)     PosdbTable.cpp:4237-4244,
                                                  SITERANKMULTIPLIER PosdbTable.h:16

Weight tables (ScoringWeights.cpp:1-50, Parms.cpp:3638-3665): density and
diversity weights interpolate quadratically from conf min->max over the
rank range; word-spam interpolates linearly; hash-group weights are the
Parms.cpp:4067-4167 defaults (config.EngineConf.hashgroup_weights);
synonym-flagged occurrences weigh conf.syn_weight (0.9,
SearchInput.cpp:74).

Round-1 scope note (documented deviation): for queries of 3+ terms the
reference evaluates pair scores inside a sliding window over body
positions (PosdbTable.cpp:3514 getMinTermPairScoreSlidingWindow); here
each pair's best position combination is taken independently, which is
exact for 1- and 2-term queries and an upper-bound approximation beyond.
Inlink-text repeatability, wiki-bigram boosts, language boosts and page
temperature are not modeled (no link graph / wiki data in scope).

All kernels are numpy over the decoded position/ctx arrays.
"""

from __future__ import annotations

import numpy as np

from ..config import DEFAULT_CONF, EngineConf
from ..functions.posdb import (
    MAXDENSITYRANK,
    MAXDIVERSITYRANK,
    MAXWORDSPAMRANK,
)

MAX_TOP = 10  # m_realMaxTop default (Parms.cpp "real max top")
SITERANK_MULTIPLIER = 0.33333333  # PosdbTable.h:16


def term_freq_weight(df: float, n_docs: float, conf: EngineConf = DEFAULT_CONF) -> float:
    """scale_linear(df/N, termfreq_min, termfreq_max, w_min, w_max)
    (Msg3a.cpp:1003-1008, ScalingFunctions.h:8-10): linear IDF analog."""
    x = df / max(n_docs, 1.0)
    lo, hi = conf.termfreq_min, conf.termfreq_max
    wlo, whi = conf.termfreq_weight_min, conf.termfreq_weight_max
    if x <= lo:
        return wlo
    if x >= hi:
        return whi
    return wlo + (whi - wlo) * (x - lo) / (hi - lo)


class ScoringWeights:
    """Precomputed rank->weight tables (ScoringWeights.cpp analog)."""

    def __init__(self, conf: EngineConf = DEFAULT_CONF):
        self.conf = conf
        r = np.arange(MAXDENSITYRANK + 1, dtype=np.float64)
        self.density = (
            conf.density_weight_min
            + (conf.density_weight_max - conf.density_weight_min)
            * (r / MAXDENSITYRANK) ** 2
        )
        d = np.arange(MAXDIVERSITYRANK + 1, dtype=np.float64)
        self.diversity = (
            conf.diversity_weight_min
            + (conf.diversity_weight_max - conf.diversity_weight_min)
            * (d / MAXDIVERSITYRANK) ** 2
        )
        s = np.arange(MAXWORDSPAMRANK + 1, dtype=np.float64)
        self.wordspam = s / MAXWORDSPAMRANK  # linear (ScoringWeights.cpp)
        self.hashgroup = np.asarray(conf.hashgroup_weights, dtype=np.float64)
        self.syn = getattr(conf, "syn_weight", 0.9)


def _unpack(ctx: np.ndarray):
    hg = (ctx >> 15) & 0xF
    den = (ctx >> 10) & 0x1F
    div = (ctx >> 6) & 0xF
    spam = (ctx >> 2) & 0xF
    syn = ctx & 0x3
    return hg, den, div, spam, syn


def single_term_score(ctx: np.ndarray, tfw: float,
                      w: ScoringWeights) -> float:
    """getBestScoreSumForSingleTerm (PosdbTable.cpp:210-461): best ctx
    score per distinct hash-group, top-MAX_TOP summed, × tfw²."""
    hg, den, div, spam, syn = _unpack(ctx.astype(np.int64))
    scores = (
        100.0
        * w.diversity[div] ** 2
        * w.hashgroup[np.clip(hg, 0, len(w.hashgroup) - 1)] ** 2
        * w.density[den] ** 2
        * w.wordspam[spam] ** 2
    )
    scores = np.where(syn != 0, scores * (w.syn ** 2), scores)
    best_per_hg = {}
    for g, s in zip(hg, scores):
        if s > best_per_hg.get(int(g), -1.0):
            best_per_hg[int(g)] = float(s)
    top = sorted(best_per_hg.values(), reverse=True)[:MAX_TOP]
    return float(sum(top)) * tfw * tfw


def pair_score(pos_i: np.ndarray, ctx_i: np.ndarray,
               pos_j: np.ndarray, ctx_j: np.ndarray,
               qdist: int, tfw_i: float, tfw_j: float,
               w: ScoringWeights) -> float:
    """getScoreForTermPair (PosdbTable.cpp:715-792) over all position
    combinations; top-MAX_TOP summed, × tfw_i·tfw_j."""
    hg_i, den_i, _, spam_i, _ = _unpack(ctx_i.astype(np.int64))
    hg_j, den_j, _, spam_j, _ = _unpack(ctx_j.astype(np.int64))
    wi = (w.density[den_i] * w.hashgroup[np.clip(hg_i, 0, len(w.hashgroup) - 1)]
          * w.wordspam[spam_i])
    wj = (w.density[den_j] * w.hashgroup[np.clip(hg_j, 0, len(w.hashgroup) - 1)]
          * w.wordspam[spam_j])
    p1 = pos_i.astype(np.int64)[:, None]
    p2 = pos_j.astype(np.int64)[None, :]
    raw = np.abs(p1 - p2)
    dist = np.maximum(raw, 2) - qdist
    dist = dist + (p2 < p1)  # out-of-order penalty (PosdbTable.cpp:762)
    dist = np.maximum(dist, 0)
    mat = 100.0 * (wi[:, None] * wj[None, :]) / (dist + 1.0)
    flat = np.sort(mat.ravel())[::-1][:MAX_TOP]
    return float(flat.sum()) * tfw_i * tfw_j


def combine_score(singles: list[float], pairs: list[float],
                  site_rank: int) -> float:
    """min-combine + site-rank multiplier (PosdbTable.cpp:4207-4275)."""
    m = min(singles)
    if pairs:
        m = min(m, min(pairs))
    return m * (site_rank * SITERANK_MULTIPLIER + 1.0)


def score_doc(term_data: list[tuple[np.ndarray, np.ndarray]],
              tfws: list[float], qdists: list[int],
              site_rank: int, w: ScoringWeights) -> float:
    """Full per-doc reference score. term_data[i] = (positions, ctxs) of
    query term i in this doc; qdists[i] = query position of term i."""
    singles = [
        single_term_score(ctx, tfws[i], w)
        for i, (_, ctx) in enumerate(term_data)
    ]
    pairs = []
    for i in range(len(term_data)):
        for j in range(i + 1, len(term_data)):
            qd = abs(qdists[j] - qdists[i])
            pairs.append(
                pair_score(term_data[i][0], term_data[i][1],
                           term_data[j][0], term_data[j][1],
                           qd, tfws[i], tfws[j], w))
    return combine_score(singles, pairs, site_rank)
