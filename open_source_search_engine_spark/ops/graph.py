"""Link-graph operators.

The reference engine's query-time quality signals are link-derived:
siteNumInlinks -> siteRank (`PosdbTable.cpp:4237-4244` adjusted-
siterank multiplier) and pageTemperature (`PageTemperatureRegistry.h:
8-38`), both produced offline by its link-analysis pipeline over
linkdb. `pagerank` is the corpus-scale generalization of that
pipeline: damped PageRank over an (src, dst) edge frame, the standard
input for page-quality priors in web-scale training-data curation
(e.g. Common Crawl harmonic-centrality/PR page selection).

Arithmetic is FIXED-POINT INT64 (rank scaled by `scale`, damping as
the rational d_num/d_den, integer division throughout). That is not
just a test convenience: integer sums are associative-commutative with
NO float rounding, so results are bit-identical regardless of shuffle
partitioning, aggregation order, or engine — reproducible builds and
cross-engine oracles for free. Mass lost to truncation/dangling nodes
is the standard practical concession (document-ranking uses relative
order, not the exact eigenvector).

Scale shape: each iteration is one (edges ⋈ ranks) hash join keyed on
src + one groupBy(dst) sum with map-side partial combine, i.e. two
shuffles per iteration, both on node keys — the same shape Spark's own
GraphX/Pregel PageRank lowers to. Ranks frames are re-used across
iterations; for large n_iter, localCheckpoint every few rounds to cut
lineage. int64 headroom: a node's rank is bounded by scale × (total
in-mass); at 10^12 nodes raise `scale` down / rescale per iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(edges: DataFrame, n_iter: int = 5,
             damping: tuple[int, int] = (85, 100),
             scale: int = 10 ** 9,
             src_col: str = "src", dst_col: str = "dst") -> DataFrame:
    """(node, rank_fp): fixed-point damped PageRank after ``n_iter``
    synchronous iterations.

    r_0(v) = scale;
    r_{t+1}(v) = (scale*(den-num)) div den
                 + (num * sum_{u->v} (r_t(u) div outdeg(u))) div den

    Nodes = distinct src ∪ dst; dangling nodes contribute no mass
    (practical-web-ranking convention). All arithmetic is int64 with
    truncating division, so the result is deterministic under any
    partitioning and replicable in plain SQL."""
    num, den = damping
    e = edges.select(F.col(src_col).cast("long").alias("src"),
                     F.col(dst_col).cast("long").alias("dst"))
    outdeg = e.groupBy("src").agg(F.count("*").alias("og"))
    nodes = (e.select(F.col("src").alias("node"))
             .union(e.select(F.col("dst").alias("node"))).distinct())
    ranks = nodes.withColumn("r", F.lit(scale).cast("long"))
    base = int(scale * (den - num)) // den
    for _ in range(n_iter):
        contrib = (e.join(ranks, e.src == ranks.node)
                   .join(outdeg, "src")
                   .select(F.col("dst").alias("node"),
                           F.expr("r div og").alias("c"))
                   .groupBy("node").agg(F.sum("c").alias("in_mass")))
        ranks = (nodes.join(contrib, "node", "left")
                 .select("node",
                         (F.lit(base)
                          + F.expr(f"({num} * coalesce(in_mass, 0L))"
                                   f" div {den}")).alias("r")))
    return ranks.select("node", F.col("r").alias("rank_fp"))


def hits(edges: DataFrame, n_iter: int = 5, scale: int = 10 ** 6,
         src_col: str = "src", dst_col: str = "dst") -> DataFrame:
    """(node, hub_fp, auth_fp): Kleinberg HITS after ``n_iter``
    synchronous rounds, fixed-point int64 like ``pagerank``:

    a_{t+1}(v) = sum_{u->v} h_t(u), then a := a*scale div max(a);
    h_{t+1}(u) = sum_{u->v} a_{t+1}(v), then h := h*scale div max(h).

    Max-normalization (instead of the L2 norm) keeps everything in
    integers while preserving the ranking — HITS scores are only
    meaningful relative to each other. Nodes with no in-links get
    authority 0, no out-links hub 0. Two node-keyed aggregation
    shuffles per round plus one scalar max (a collected 1-row agg);
    deterministic under any partitioning, SQL-replicable.

    int64 bound: the normalization product is (sum of scale-bounded
    scores) * scale <= n_nodes * scale^2, so scale=1e6 is safe to ~9e6
    nodes; shrink scale (or move the product to decimal128) beyond
    that — relative ranking only needs ~1e-6 resolution."""
    e = edges.select(F.col(src_col).cast("long").alias("src"),
                     F.col(dst_col).cast("long").alias("dst"))
    nodes = (e.select(F.col("src").alias("node"))
             .union(e.select(F.col("dst").alias("node"))).distinct()
             .localCheckpoint())
    hub = nodes.withColumn("h", F.lit(scale).cast("long"))
    auth = None
    for _ in range(n_iter):
        # localCheckpoint each round: the per-round max() is an ACTION,
        # so without truncation every round would recompute the whole
        # iteration lineage from scratch (quadratic work), and the
        # checkpointed frame is what the next round's join reads
        raw_a = (e.join(hub, e.src == hub.node)
                 .groupBy(F.col("dst").alias("node"))
                 .agg(F.sum("h").alias("a"))
                 .localCheckpoint())
        amax = raw_a.agg(F.max("a")).collect()[0][0] or 1
        auth = (nodes.join(raw_a, "node", "left")
                .select("node",
                        F.expr(f"coalesce(a, 0L) * {scale}L div {amax}L")
                        .alias("a")))
        raw_h = (e.join(auth, e.dst == auth.node)
                 .groupBy(F.col("src").alias("node"))
                 .agg(F.sum("a").alias("h"))
                 .localCheckpoint())
        hmax = raw_h.agg(F.max("h")).collect()[0][0] or 1
        hub = (nodes.join(raw_h, "node", "left")
               .select("node",
                       F.expr(f"coalesce(h, 0L) * {scale}L div {hmax}L")
                       .alias("h")))
    return (hub.join(auth, "node")
            .select("node", F.col("h").alias("hub_fp"),
                    F.col("a").alias("auth_fp")))


def label_propagation(edges: DataFrame, n_iter: int = 5,
                      src_col: str = "src",
                      dst_col: str = "dst") -> DataFrame:
    """Synchronous label propagation community detection (Raghavan et
    al. 2007), determinized: labels start as node ids; each round every
    node adopts the most frequent label among its IN-neighbors
    (smallest label on frequency ties); isolated-in-degree nodes keep
    their label. Undirected graphs: pass both edge directions. Returns
    (node, community) after n_iter rounds — deterministic under any
    partitioning (integer counts, total tie order), unlike classical
    LPA's random visit order.

    Scale shape per round: one labels⋈edges hash join on src + one
    (dst, label) count aggregation + one per-dst argmax via a single
    max(struct(count, -label)) aggregate — all node-keyed shuffles, no
    windows. Complements ``pagerank``/``hits`` (importance) and
    dup_clusters' connected components (reachability): LPA finds
    DENSITY communities, which CC merges and PageRank ignores."""
    e = edges.select(F.col(src_col).cast("long").alias("src"),
                     F.col(dst_col).cast("long").alias("dst"))
    nodes = (e.select(F.col("src").alias("node"))
             .union(e.select(F.col("dst").alias("node"))).distinct())
    labels = nodes.withColumn("community", F.col("node"))
    for _ in range(n_iter):
        msgs = (e.join(labels, e.src == labels.node)
                .select("dst", "community"))
        freq = (msgs.groupBy("dst", "community")
                .agg(F.count("*").alias("cnt")))
        best = (freq.groupBy("dst")
                .agg(F.max(F.struct(F.col("cnt"),
                                    (-F.col("community")).alias("nl")))
                     .alias("m"))
                .select(F.col("dst").alias("node"),
                        (-F.col("m.nl")).alias("new")))
        labels = (labels.join(best, "node", "left")
                  .select("node",
                          F.coalesce(F.col("new"), F.col("community"))
                          .alias("community")))
    return labels


def cocitation_related(links: DataFrame, k: int = 10,
                       min_common: int = 2,
                       max_out: int | None = 100) -> DataFrame:
    """Related sites by co-citation (Small 1973; Dean & Henzinger 1999
    §4's cocitation algorithm for related-page finding): two link
    targets are related when many common linkers cite both. This is
    the corpus-scale realization of the related-results feature the
    Gigablast lineage built its linkdb for (Linkdb.h:90-110 keys every
    (linkee site, linker) pair precisely so 'who links here' is one
    range scan; the Privacore fork kept the store but dropped the
    related-pages UI) — here the linkee-keyed pair join IS that range
    scan, run for every site at once.

    Input ``links``: (src, dst) edges, any types (linker doc/site ->
    linked site). Returns ``(site, related, n_common, jaccard, rank)``
    — for each dst, the top-k other dsts by shared in-linker count,
    ties (n_common DESC, jaccard DESC, related ASC); ``jaccard`` is
    over the two in-linker sets, rounded to 4. Pairs below
    ``min_common`` shared linkers are noise and dropped before
    ranking.

    Scale shape: dedup, then a src-keyed self-join — the pair fanout
    per linker is C(out-degree, 2), so the ``max_out`` guard drops
    linkers citing more than that many sites BEFORE the join
    (navigational mega-hubs: quadratic pairs, near-zero signal — the
    standard cocitation skew guard; None keeps every linker). After
    the guard the join is bounded by max_out * |links|; counts and
    in-degrees aggregate with map-side partials, the final top-k is
    one window per site over the surviving (filtered) pair frame."""
    e = links.select("src", "dst").where(
        F.col("src").isNotNull() & F.col("dst").isNotNull()).distinct()
    if max_out is not None:
        deg = (e.groupBy("src").agg(F.count("*").alias("outd"))
               .where(F.col("outd") <= int(max_out)).select("src"))
        e = e.join(deg, "src")
    indeg = e.groupBy("dst").agg(F.count("*").alias("n_in"))
    l, r = e.alias("l"), e.alias("r")
    pairs = (l.join(r, (F.col("l.src") == F.col("r.src"))
                    & (F.col("l.dst") < F.col("r.dst")))
             .groupBy(F.col("l.dst").alias("a"),
                      F.col("r.dst").alias("b"))
             .agg(F.count("*").alias("n_common"))
             .where(F.col("n_common") >= int(min_common)))
    both = pairs.unionByName(
        pairs.select(F.col("b").alias("a"), F.col("a").alias("b"),
                     "n_common"))
    scored = (both
              .join(indeg.withColumnRenamed("dst", "a")
                    .withColumnRenamed("n_in", "in_a"), "a")
              .join(indeg.withColumnRenamed("dst", "b")
                    .withColumnRenamed("n_in", "in_b"), "b")
              .withColumn(
                  "jaccard",
                  F.round(F.col("n_common").cast("double")
                          / (F.col("in_a") + F.col("in_b")
                             - F.col("n_common")).cast("double"), 4)))
    from pyspark.sql import Window
    w = Window.partitionBy("a").orderBy(
        F.col("n_common").desc(), F.col("jaccard").desc(),
        F.col("b").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= int(k))
            .select(F.col("a").alias("site"),
                    F.col("b").alias("related"),
                    F.col("n_common").cast("long").alias("n_common"),
                    "jaccard", F.col("rank").cast("int").alias("rank")))
