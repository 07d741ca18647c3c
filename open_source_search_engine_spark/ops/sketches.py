"""Mergeable sketches for corpus-scale approximate statistics.

At 10^12 documents the exact answers to "how many distinct terms?" and
"how often does term X occur?" cost a full shuffle each; sketches give
bounded-error answers from one map-side pass, and they MERGE — per-
partition sketches combine by max (HLL registers) or elementwise sum
(count-min cells), which is exactly a Spark aggregation. The reference
engine's analog is its termfreq cache of approximate df per termId
(Posdb.h:341 getTermFreq), refreshed lazily rather than exactly.

Both sketches here are DETERMINISTIC (md5-derived hashes, no RNG) and
ENGINE-EXACT: every decision is integer arithmetic, so a SQL oracle
reproduces the same registers/cells/estimates bit for bit. The one
classically-float HLL step (sum of 2^-M_j) is computed as an INTEGER
sum of 2^(RHO_MAX+1-M_j) — terms are >= 2 and the total bounded by
m·2^RHO_MAX < 2^62 — so even the harmonic mean is order-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import MERSENNE_P, _perm_coeffs
from .textstats import hash60

HLL_ALPHA = {16: 0.673, 32: 0.697, 64: 0.709}  # Flajolet et al. 2007


def _hll_alpha(m: int) -> float:
    return HLL_ALPHA.get(m, 0.7213 / (1 + 1.079 / m))


def hll_registers(df: DataFrame, col: str, p: int = 12) -> DataFrame:
    """(bucket, register) HyperLogLog registers over a column's values:
    bucket = low p bits of hash60(value), register = max over the
    bucket's values of rho(w) where w = the remaining 60-p bits and
    rho = 1 + leading-zero count = (60-p) - floor(log2(w)) for w>0
    (log2 of an exact-in-double integer is boundary-exact at powers of
    two, so floor(log2) is deterministic), capped at 60-p+1 when w=0.
    One groupBy(bucket).max — a <=2^p-row aggregate with map-side
    partial max: THE mergeable-sketch shape."""
    wbits = 60 - p
    h = hash60(F.col(col))
    bucket = (h % F.lit(1 << p)).alias("bucket")
    # integer shift, NOT division: h is up to 2^60, beyond double's
    # 53-bit exact range — a float division would corrupt low bits
    w = F.shiftright(h, p)
    rho = (F.when(w > 0, F.lit(wbits) - F.floor(F.log2(w)))
           .otherwise(F.lit(wbits + 1)).cast("int"))
    return (df.select(bucket, rho.alias("_rho"))
            .groupBy("bucket").agg(F.max("_rho").alias("register")))


def hll_cardinality(df: DataFrame, col: str, p: int = 12) -> DataFrame:
    """One row (estimate, nonzero_buckets): the HLL distinct-count
    estimate with the standard small-range linear-counting correction
    (E <= 2.5m and empty buckets exist -> m·ln(m/V)). The harmonic-mean
    denominator is the integer sum 2^(RHO_MAX+1-M_j) (+ 2^(RHO_MAX+1)
    per empty bucket), so the estimate is bit-reproducible across
    engines and partitionings; estimate rounds to 4."""
    m = 1 << p
    wbits = 60 - p
    shift = wbits + 2  # terms 2^(shift - register), register <= wbits+1
    regs = hll_registers(df, col, p)
    agg = regs.agg(
        F.count("*").alias("nz"),
        F.sum(F.expr(f"shiftleft(1L, {shift} - register)")).alias("isum"))
    alpha = _hll_alpha(m)
    # denominator stays INT64 (isum can exceed 2^53 — converting it to
    # double before the addition would round differently than adding
    # exactly and converting once, breaking cross-engine parity)
    raw = (F.lit(alpha * m * m * float(1 << shift))
           / (F.col("isum")
              + (F.lit(m).cast("long") - F.col("nz"))
              * F.lit(1 << shift)))
    zeros = F.lit(m) - F.col("nz")
    est = F.when((raw <= F.lit(2.5 * m)) & (zeros > 0),
                 F.lit(float(m)) * F.log(F.lit(float(m)) / zeros)
                 ).otherwise(raw)
    return agg.select(F.round(est, 4).alias("estimate"),
                      F.col("nz").cast("long").alias("nonzero_buckets"))


def countmin_build(df: DataFrame, col: str, depth: int = 4,
                   width: int = 1024,
                   seed: str = "osse-cms") -> DataFrame:
    """(row, cell, cnt) count-min sketch cells over a column's
    OCCURRENCES: row d's cell is (a_d·(hash60(v) mod P) + b_d) mod P
    mod width with md5-derived (a_d, b_d) — the same int64-safe family
    as the MinHash permutations. One explode + groupBy((row, cell))
    with map-side partials; the result is <= depth·width rows no
    matter the corpus size, and two sketches merge by summing cells."""
    coeffs = _perm_coeffs(depth, seed=seed)
    x = hash60(F.col(col)) % MERSENNE_P
    cells = F.array(*[
        F.struct(F.lit(d).alias("row"),
                 ((F.lit(a) * x + F.lit(b)) % MERSENNE_P % F.lit(width))
                 .alias("cell"))
        for d, (a, b) in enumerate(coeffs)])
    return (df.select(F.explode(cells).alias("c"))
            .groupBy(F.col("c.row").alias("row"),
                     F.col("c.cell").alias("cell"))
            .agg(F.count("*").alias("cnt")))


def countmin_estimate(sketch: DataFrame, probes: DataFrame,
                      col: str, depth: int = 4, width: int = 1024,
                      seed: str = "osse-cms") -> DataFrame:
    """(value, est) for each probe value: min over the sketch rows of
    the value's cell count (the count-min upper-bound estimate — never
    below the true count; equality whenever no collision landed in all
    depth cells). Probe frame is tiny -> broadcast against the
    depth·width-row sketch."""
    coeffs = _perm_coeffs(depth, seed=seed)
    x = hash60(F.col(col)) % MERSENNE_P
    cells = F.array(*[
        F.struct(F.lit(d).alias("row"),
                 ((F.lit(a) * x + F.lit(b)) % MERSENNE_P % F.lit(width))
                 .alias("cell"))
        for d, (a, b) in enumerate(coeffs)])
    pr = (probes.select(F.col(col).alias("value"),
                        F.explode(cells).alias("c"))
          .select("value", F.col("c.row").alias("row"),
                  F.col("c.cell").alias("cell")))
    return (F.broadcast(pr).join(sketch, ["row", "cell"], "left")
            .groupBy("value")
            .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0)))
                 .cast("long").alias("est")))


def grouped_hll_registers(df: DataFrame, keys: list[str], col: str,
                          p: int = 8) -> DataFrame:
    """(keys..., bucket, register) — one HLL register set PER KEY GROUP,
    same bit math as ``hll_registers``. The shape that makes per-term
    docid sketches an index artifact: explode (term, doc) occurrences,
    one groupBy(term, bucket).max with map-side partial max — output
    bounded by vocab·2^p rows no matter the corpus size, and register
    sets MERGE BY MAX, so incremental build generations combine with
    the same aggregate (HLLs never subtract: deletions stay counted
    until a from-scratch rebuild — an upper sketch, like the reference's
    lazily-refreshed termfreq cache, Posdb.h:341)."""
    wbits = 60 - p
    h = hash60(F.col(col))
    bucket = (h % F.lit(1 << p)).alias("bucket")
    w = F.shiftright(h, p)
    rho = (F.when(w > 0, F.lit(wbits) - F.floor(F.log2(w)))
           .otherwise(F.lit(wbits + 1)).cast("int"))
    return (df.select(*keys, bucket, rho.alias("_rho"))
            .groupBy(*keys, "bucket")
            .agg(F.max("_rho").alias("register")))


def _hll_estimate(nz, isum, m: int, shift: int):
    """Estimate Column from per-group (nonzero buckets, integer harmonic
    sum) — the exact expression ``hll_cardinality`` uses (int64
    denominator, small-range linear counting), factored so per-key and
    whole-frame estimates share one definition."""
    alpha = _hll_alpha(m)
    raw = (F.lit(alpha * m * m * float(1 << shift))
           / (isum + (F.lit(m).cast("long") - nz) * F.lit(1 << shift)))
    zeros = F.lit(m) - nz
    return F.when((raw <= F.lit(2.5 * m)) & (zeros > 0),
                  F.lit(float(m)) * F.log(F.lit(float(m)) / zeros)
                  ).otherwise(raw)


def grouped_hll_cardinality(regs: DataFrame, keys: list[str],
                            p: int) -> DataFrame:
    """(keys..., estimate, nonzero_buckets) from a grouped register
    frame: per-key distinct-count estimates, bit-reproducible (integer
    harmonic sum; estimate rounds to 4)."""
    m = 1 << p
    shift = (60 - p) + 2
    agg = regs.groupBy(*keys).agg(
        F.count("*").alias("nz"),
        F.sum(F.expr(f"shiftleft(1L, {shift} - register)")).alias("isum"))
    est = _hll_estimate(F.col("nz"), F.col("isum"), m, shift)
    return agg.select(*keys, F.round(est, 4).alias("estimate"),
                      F.col("nz").cast("long").alias("nonzero_buckets"))


def hll_subset_unions(regs: DataFrame, p: int, key: str = "key",
                      max_keys: int = 6) -> DataFrame:
    """(subset, n_keys, estimate) — the HLL union estimate for EVERY
    non-empty subset of the register frame's key values (union sketch =
    elementwise max register, exactly an aggregation). ``subset`` is the
    comma-joined sorted member list. Keys are capped at ``max_keys``
    (2^k subsets — this is for query-term planning, not arbitrary k).

    One broadcast join against the 2^k-row membership table + one
    groupBy(subset, bucket).max + the per-subset estimate aggregate —
    all bounded by 2^k · 2^p rows."""
    spark = regs.sparkSession
    kt = regs.schema[key].dataType.simpleString()
    vals = sorted(r[0] for r in regs.select(key).distinct().collect())
    if not 1 <= len(vals) <= max_keys:
        raise ValueError(f"need 1..{max_keys} keys, got {len(vals)}")
    rows, labels = [], {}
    for sid in range(1, 1 << len(vals)):
        members = [vals[i] for i in range(len(vals)) if sid >> i & 1]
        labels[sid] = ",".join(str(v) for v in members)
        rows += [(sid, v) for v in members]
    memb = spark.createDataFrame(rows, f"subset int, {key} {kt}")
    lab = F.create_map(*[F.lit(x) for sid, s in sorted(labels.items())
                         for x in (sid, s)])
    uni = (regs.join(F.broadcast(memb), key)
           .groupBy("subset", "bucket")
           .agg(F.max("register").alias("register")))
    card = grouped_hll_cardinality(uni, ["subset"], p)
    n_keys = F.expr("bit_count(subset)").cast("int")
    return card.select(lab[F.col("subset")].alias("subset"),
                       n_keys.alias("n_keys"), "estimate")


def hll_intersection_estimate(regs: DataFrame, p: int,
                              key: str = "key") -> DataFrame:
    """One row (n_sets, est_intersection): the k-way intersection
    estimate by inclusion-exclusion over the subset-union estimates,
    |∩Aᵢ| = Σ_{∅≠S} (−1)^(|S|+1) |∪_{i∈S}Aᵢ| (exact for true
    cardinalities; the standard HLL intersection estimator otherwise).
    Clamped at 0 — IE over noisy unions can go negative for
    near-disjoint sets. The planner use: estimate a conjunctive query's
    result size from per-term docid sketches WITHOUT decoding any
    posting list."""
    sub = hll_subset_unions(regs, p, key=key)
    signed = F.when(F.col("n_keys") % 2 == 1, F.col("estimate")) \
        .otherwise(-F.col("estimate"))
    return sub.agg(
        F.max("n_keys").cast("int").alias("n_sets"),
        F.round(F.greatest(F.lit(0.0), F.sum(signed)), 4)
        .alias("est_intersection"))


def hll_intersection_estimate_local(reg_dicts: "list[dict[int, int]]",
                                    p: int) -> float:
    """Driver-side mirror of :func:`hll_intersection_estimate` over
    already-collected register dicts (bucket -> register, absent
    buckets zero): the same inclusion-exclusion over subset-union
    estimates with the same integer harmonic sum, small-range
    correction, per-subset rounding and zero clamp — float64 all the
    way, so it agrees with the Spark estimate to addition-order noise.

    This is the query PLANNER's entry point: deciding WAND-vs-
    selective for one query needs the handful of query terms'
    registers (<= 2^p rows each, a pruned stats scan), not a
    distributed job over the sketch table."""
    import math

    import numpy as np

    m = 1 << p
    shift = (60 - p) + 2
    alpha = _hll_alpha(m)
    k = len(reg_dicts)
    if not 1 <= k <= 6:
        raise ValueError(f"need 1..6 register sets, got {k}")
    vecs = []
    for d in reg_dicts:
        v = np.zeros(m, dtype=np.int64)
        for b, r in d.items():
            v[int(b)] = int(r)
        vecs.append(v)
    total = 0.0
    for sid in range(1, 1 << k):
        u = None
        bits = 0
        for i in range(k):
            if sid >> i & 1:
                bits += 1
                u = vecs[i] if u is None else np.maximum(u, vecs[i])
        pres = u[u > 0]
        nz = len(pres)
        isum = int(np.sum(np.int64(1) << (np.int64(shift) - pres)))
        raw = (alpha * m * m * float(1 << shift)
               / (isum + (m - nz) * (1 << shift)))
        zeros = m - nz
        est = (m * math.log(m / zeros)
               if (raw <= 2.5 * m and zeros > 0) else raw)
        est = round(est, 4)
        total += est if bits % 2 == 1 else -est
    return round(max(0.0, total), 4)
