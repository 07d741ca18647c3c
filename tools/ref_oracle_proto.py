"""Prototype of the SQL-expressible body-only reference-scorer oracle.

Validates the reduction (SURVEY.md §4.6 / VERDICT r4 item 2) that the
DuckDB twin for `search_reference` will implement:

  - body-only index: every posting hashgroup BODY, inbody, one mhg
    -> non-body pair matrix empty, nonbody_ix = -1 per term
  - positions: word k (0-based) at 155 + 2k (template-grammar constant)
  - density: uniform per doc, max(MAXDENSITYRANK - (n_words-1), 1)
  - diversity weight: 1.0 (conf min == max)
  - word-spam: per query-term occurrence, max-over-(window,wlen,step)
    combos integer formula (set_spam re-derivation; whole-doc bump and
    frag demotion never fire on the driver corpus - asserted)
  - singles: one slot per term = max s_single, x tfw x tfw
  - sliding window: state k = prefix counts of merged (pos, term)
    events; eval mask = ~exhausting shift; min over live pairs;
    first-argmax -> winners
  - final pairs = single-state _g_pair at winners (0.0 if a winner
    is NULL); min-combine; x (site_rank/3 + 1)

Everything float32 in the engine's op order. Run against the engine:
    python tools/ref_oracle_proto.py [sf_dir]
"""
from __future__ import annotations

import sys

import numpy as np
import pandas as pd

F32 = np.float32
MAXDENSITYRANK = 31
MAXWORDSPAMRANK = 15
PROB_SCALE = 256 * 100 // 7  # 3657


def get_prob_spam(profile: list[int], wlen: int, step: int) -> int:
    if wlen <= 2 or step == wlen:
        return 0
    istop = wlen - 1
    avg = 0
    for i in range(0, istop, step):
        avg += profile[i] - profile[i + 1]
    avg = (avg * 256) // istop
    dev = 0
    for i in range(0, istop, step):
        d = (profile[i] - profile[i + 1]) * 256 - avg
        dev += -d if d < 0 else d
    dev //= istop
    if dev <= 51.2:
        return 100
    prob = (PROB_SCALE * wlen) // dev
    return 100 if prob > 100 else prob


def spam_percents(profile_desc: list[int], n_tokens: int) -> list[int]:
    """spam%% per profile index (0 = newest occurrence)."""
    plen = len(profile_desc)
    spam = [0] * plen
    if plen < 3:
        return spam
    if n_tokens > 10 and (plen * 100) // n_tokens >= 20:
        for i in range(1, plen):
            spam[i] = 100
        return spam
    assert plen <= 50, "plen>50 branch not modelled (never fires here)"
    max_step = min(plen // 4, 4)
    for step in range(1, max_step + 1):
        for window in range(0, plen - 3):
            for wlen in range(3, plen - window + 1):
                if wlen % step != 0:
                    continue
                prob = get_prob_spam(profile_desc[window:], wlen, step)
                if prob <= 20:
                    continue
                for i in range(window, min(window + wlen, plen - 3)):
                    if spam[i] < prob:
                        spam[i] = prob
    if all(s > 0 for s in spam):
        spam[0] = 0
    return spam


def term_freq_weight(df: int, n_docs: int) -> np.float32:
    x = df / max(n_docs, 1.0)
    x = min(max(x, 0.0), 0.5)
    r = (x - 0.0) / 0.5
    return F32(1.0 + r * (0.5 - 1.0))


def den_weight(den: int) -> np.float32:
    r = den / MAXDENSITYRANK
    return F32(((r + 1.0) * (r + 1.0) - 1.0) / 3.0 * (1.0 - 0.35) + 0.35)


def spam_weight(rank: int) -> np.float32:
    r = rank / MAXWORDSPAMRANK
    lo = 1.0 / MAXWORDSPAMRANK
    return F32(lo + r * (1.0 - lo))


def g_pair(pA, dA, sA, pB, dB, sB) -> np.float32:
    """Body-body pair score, qdist=2, hgw=1, no syn/wiki."""
    dist = max(abs(int(pB) - int(pA)), 2)
    dist = dist - 2 + (1 if pB < pA else 0)
    s = F32(100.0)
    s = F32(s * dA)
    s = F32(s * dB)
    s = F32(s * F32(sA * sB))
    s = F32(np.float64(s) / (dist + 1.0))
    return s


def score_docs(docs: pd.DataFrame, terms: list[str],
               site_rank_of) -> dict[int, float]:
    n_docs = len(docs)
    dfs = {q: 0 for q in terms}
    toks = {}
    for _, row in docs.iterrows():
        ts = (row.text or "empty").strip().split(" ")
        toks[int(row.doc_id)] = ts
        for q in terms:
            if q in ts:
                dfs[q] += 1
    tfw = {q: term_freq_weight(dfs[q], n_docs) for q in terms}

    out = {}
    for _, row in docs.iterrows():
        d = int(row.doc_id)
        ts = toks[d]
        occ = {q: [k for k, w in enumerate(ts) if w == q] for q in terms}
        if not all(occ[q] for q in terms):
            continue
        w = len(ts)
        n_tokens = 2 * w + 7
        den = max(MAXDENSITYRANK - (w - 1), 1)
        dw = den_weight(den)

        # per-term posting arrays: position, spam weight
        plists = {}
        for q in terms:
            kidx = occ[q]
            token_idx = [5 + 2 * k for k in kidx]
            profile = token_idx[::-1]
            sp = spam_percents(profile, n_tokens)
            ranks = [(MAXWORDSPAMRANK * (100 - p)) // 100 for p in sp]
            ranks = ranks[::-1]  # back to ascending position order
            pos = [155 + 2 * k for k in kidx]
            plists[q] = (np.array(pos, dtype=np.int64),
                         np.array([spam_weight(r) for r in ranks],
                                  dtype=np.float32))

        # singles: one slot = max s_single; total x tfw x tfw
        min_single = F32(2e9)
        for q in terms:
            _, spw = plists[q]
            s = F32(100.0) * dw  # f32*f32
            s = F32(s * dw)
            sv = [F32(F32(s * x) * x) for x in spw]
            best = sv[0]
            for v in sv[1:]:
                if v > best:
                    best = v
            tot = F32(F32(F32(0.0) + best) * tfw[q])
            tot = F32(tot * tfw[q])
            if tot < min_single:
                min_single = tot

        # sliding window
        T = len(terms)
        ev = []
        for i, q in enumerate(terms):
            for j, p in enumerate(plists[q][0]):
                ev.append((int(p), i, j))
        ev.sort()
        E = len(ev)
        # state k: per-term pointer = count of its events before k
        ptr = [0] * T
        states = []
        exhausting_prev = False
        for k in range(E):
            states.append((tuple(ptr), k == 0 or not exhausting_prev))
            _, ti, _ = ev[k]
            ptr = list(ptr)
            ptr[ti] += 1
            exhausting_prev = ptr[ti] >= len(plists[terms[ti]][0])
        best_score = F32(-np.inf)
        best_state = None
        for ptrs, evaled in states:
            if not evaled:
                continue
            sc = F32(2e9)
            any_pair = False
            for i in range(T):
                for j in range(i + 1, T):
                    pi, si = plists[terms[i]]
                    pj, sj = plists[terms[j]]
                    if ptrs[i] >= len(pi) or ptrs[j] >= len(pj):
                        continue
                    any_pair = True
                    v = g_pair(pi[ptrs[i]], dw, si[ptrs[i]],
                               pj[ptrs[j]], dw, sj[ptrs[j]])
                    v = F32(v * F32(F32(tfw[terms[i]]) * F32(tfw[terms[j]])))
                    if v < sc:
                        sc = v
            if not any_pair:
                sc = F32(-1.0)
            if best_state is None or sc > best_score:
                best_score = sc
                best_state = ptrs
        winners = []
        for i in range(T):
            wix = best_state[i]
            winners.append(wix if wix < len(plists[terms[i]][0]) else -1)

        # final pairs
        min_pair = F32(-1.0)
        for i in range(T):
            for j in range(i + 1, T):
                if winners[i] < 0 or winners[j] < 0:
                    tp = F32(0.0)
                else:
                    pi, si = plists[terms[i]]
                    pj, sj = plists[terms[j]]
                    tp = g_pair(pi[winners[i]], dw, si[winners[i]],
                                pj[winners[j]], dw, sj[winners[j]])
                    tp = F32(F32(0.0) + tp)
                    tp = F32(tp * F32(1.0))
                    tp = F32(tp * F32(tfw[terms[i]]))
                    tp = F32(tp * F32(tfw[terms[j]]))
                if min_pair >= 0 and tp >= min_pair:
                    continue
                min_pair = tp

        min_score = F32(999999999.0)
        if 0.0 <= min_pair < min_score:
            min_score = min_pair
        if min_single < min_score:
            min_score = min_single
        if min_score <= 0.0:
            continue
        sr = site_rank_of(d)
        score = F32(min_score * (F32(sr) * F32(0.33333333) + F32(1.0)))
        out[d] = float(score)
    return out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from pyspark.sql import SparkSession

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as se
    from open_source_search_engine_spark.config import EngineConf
    from open_source_search_engine_spark.functions.gbhash import hash8
    from open_source_search_engine_spark.functions.posdb import (
        site_rank_from_inlinks,
    )
    from open_source_search_engine_spark.query.executor import search_all

    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.driver.memory", "8g")
             .getOrCreate())
    d = se._ensure_base_index(spark, sf_dir)
    eng = (search_all(spark, d, "key window stream",
                      conf=EngineConf(scorer="reference"))
           .select("doc_id", "score").toPandas())
    eng_map = dict(zip(eng.doc_id.astype(int), eng.score))

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")

    def site_rank_of(doc_id: int) -> int:
        host = f"site{doc_id % 97:04d}.example".encode()
        return site_rank_from_inlinks(hash8(host) % 200)

    proto = score_docs(docs, ["key", "window", "stream"], site_rank_of)

    only_e = set(eng_map) - set(proto)
    only_p = set(proto) - set(eng_map)
    print(f"engine {len(eng_map)} docs, proto {len(proto)} docs; "
          f"only-engine {sorted(only_e)[:5]} only-proto {sorted(only_p)[:5]}")
    bad = []
    for doc in sorted(set(eng_map) & set(proto)):
        if eng_map[doc] != proto[doc]:
            bad.append((doc, eng_map[doc], proto[doc]))
    print(f"score mismatches: {len(bad)}")
    for b in bad[:10]:
        print("  ", b)
    if not only_e and not only_p and not bad:
        print("PROTO == ENGINE (bit-exact)")
    spark.stop()


if __name__ == "__main__":
    main()
