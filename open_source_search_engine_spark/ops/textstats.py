"""Text-analysis operators for large-scale training-data pipelines.

These are pure-Catalyst column programs (no Python UDFs — everything runs
JVM-side inside whole-stage codegen) over a documents-style table
``(doc_id, text, ...)``:

- token counting + type/token stats + quality ratios
- 60-bit md5-derived token hashes, order-sensitive document fingerprints
- simhash (bitwise-majority sketch over token hashes)
- language distribution + a stopword-profile language-ID heuristic

Every operator has a matching DuckDB oracle (same arithmetic, same
rounding) in ``__spark_entry__.oracle_sql``. Hash primitive: the low 60
bits (15 hex chars) of md5 — portable across engines, unlike builtin
``hash()`` functions, and sign-safe in int64.

Scale notes: all operators are narrow (per-row) followed by at most one
aggregation; they partition-prune and column-prune through the parquet
scan, and need no shuffle except the final groupBy where present.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# low 60 bits of md5 -> signed-positive int64
HASH60_BITS = 60
_PY_STOPWORDS = (
    "the", "a", "of", "and", "to", "in", "is", "it", "on", "for",
)


def hash60(col: Column) -> Column:
    """First 15 hex chars of md5 as int64 (0 .. 2^60-1)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def spread(df: DataFrame) -> DataFrame:
    """Ensure the frame has at least defaultParallelism partitions before
    an explode/groupBy-heavy stage: small test corpora arrive as a single
    parquet split which would serialize the whole op on one core. No-op
    (no shuffle) when the input is already well partitioned."""
    spark = df.sparkSession
    par = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < par:
        return df.repartition(par)
    return df


def tokens_col(text: Column) -> Column:
    return F.split(text, " ")


def doc_token_stats(docs: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, n_types, n_token_chars, ttr, stopword_ratio,
    mean_token_len) — token counting + quality scoring, all array ops."""
    ts = tokens_col(F.col("text"))
    n_tokens = F.size(ts)
    n_types = F.size(F.array_distinct(ts))
    n_chars = F.aggregate(
        F.transform(ts, lambda t: F.length(t)), F.lit(0),
        lambda acc, x: acc + x)
    stops = F.array(*[F.lit(s) for s in _PY_STOPWORDS])
    n_stop = F.size(F.filter(ts, lambda t: F.array_contains(stops, t)))
    return docs.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        n_types.alias("n_types"),
        n_chars.alias("n_token_chars"),
        F.round(n_types.cast("double") / n_tokens, 4).alias("ttr"),
        F.round(n_stop.cast("double") / n_tokens, 4).alias("stopword_ratio"),
        F.round(n_chars.cast("double") / n_tokens, 4).alias("mean_token_len"),
    )


# GPT-2-style pre-tokenizer regex, simplified to the RE2-compatible
# subset (no lookahead; letter/digit/other runs with optional leading
# space) so Spark's Java regex and an external RE2 engine agree on the
# same splits — a cheap LLM-token-budget estimator, not a real BPE merge
BPE_SPLIT_RE = r" ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\s]+"


def bpe_token_stats(docs: DataFrame) -> DataFrame:
    """(doc_id, n_ws_tokens, n_bpe_pieces, bpe_per_ws): whitespace vs
    BPE-ish piece counts. Pieces come from ``regexp_extract_all`` with
    the split regex above — pure codegen, no UDF, one narrow scan;
    bpe_per_ws is the fertility ratio an LLM-ingest pipeline budgets
    tokens with."""
    ws = F.size(tokens_col(F.col("text")))
    pieces = F.size(F.regexp_extract_all(F.col("text"),
                                         F.lit(BPE_SPLIT_RE), F.lit(0)))
    return docs.select(
        "doc_id",
        ws.alias("n_ws_tokens"),
        pieces.alias("n_bpe_pieces"),
        F.round(pieces.cast("double") / ws, 4).alias("bpe_per_ws"),
    )


def pack_sequences(docs: DataFrame, seq_len: int = 2048,
                   sep_tokens: int = 1,
                   bucket_width: int = 65536) -> DataFrame:
    """(doc_id, n_tokens, tok_off, seq_first, seq_last): GPT-style
    concat-and-chunk sequence-packing map. Documents concatenate in
    doc_id order, each followed by ``sep_tokens`` separator tokens
    (the EOS an LLM pretraining pipeline inserts between documents),
    and the stream is cut into fixed ``seq_len``-token training
    sequences. Each output row gives the doc's global token offset in
    the packed stream plus the first/last sequence index its tokens
    land in — the map a sharded tokenizer needs to emit sequences
    without ever materializing the concatenated corpus.

    The global prefix sum is computed scale-safely — no
    single-partition global window: docs bucket by doc_id range
    (``bucket_width`` ids per bucket), per-bucket token sums reduce to
    one tiny frame (one row per bucket; ~15k rows even at 10^9 docs)
    whose running totals become per-bucket base offsets, and the
    within-bucket exclusive cumsum is a window PARTITIONED by bucket.
    Every corpus-sized stage is parallel over buckets; the only
    ordered scan is over the per-bucket sums frame. All codegen, no
    UDF."""
    from pyspark.sql import Window

    if seq_len <= 0:
        raise ValueError("seq_len must be positive")
    n = F.size(tokens_col(F.col("text"))).cast("long")
    slot = (n + sep_tokens).alias("slot")
    t = docs.select(
        "doc_id", n.alias("n_tokens"), slot,
        (F.col("doc_id") / bucket_width).cast("long").alias("_b"))
    # per-bucket totals -> running base offsets (tiny frame)
    sums = t.groupBy("_b").agg(F.sum("slot").alias("_bsum"))
    wb = (Window.orderBy("_b")
          .rowsBetween(Window.unboundedPreceding, -1))
    bases = sums.select(
        "_b", F.coalesce(F.sum("_bsum").over(wb), F.lit(0))
        .alias("_base"))
    # within-bucket exclusive cumsum, parallel over buckets
    ww = (Window.partitionBy("_b").orderBy("doc_id")
          .rowsBetween(Window.unboundedPreceding, -1))
    off = (F.coalesce(F.sum("slot").over(ww), F.lit(0)) +
           F.col("_base")).alias("tok_off")
    out = (t.join(F.broadcast(bases), "_b")
           .select("doc_id", "n_tokens", off))
    return out.select(
        "doc_id", "n_tokens", "tok_off",
        F.expr(f"CAST(tok_off DIV {seq_len} AS BIGINT)")
        .alias("seq_first"),
        F.expr(f"CAST((tok_off + n_tokens - 1) DIV {seq_len} AS BIGINT)")
        .alias("seq_last"))


def chunk_documents(docs: DataFrame, chunk_tokens: int = 128,
                    overlap: int = 16) -> DataFrame:
    """(doc_id, chunk_id, chunk_text, n_chunk_tokens): sliding
    token-window chunking — the splitter an LLM-training pipeline runs
    before tokenization. Window starts step by ``chunk_tokens -
    overlap``; a start is emitted while it is < n_tokens - overlap (plus
    start 0 always), so the tail chunk is never fully contained in its
    predecessor. Pure Catalyst: ``sequence`` generates the starts,
    ``posexplode`` fans out one row per chunk, ``slice`` +
    ``array_join`` rebuild the chunk text — no UDF, one narrow
    projection + explode, no shuffle. At 100 TB this is map-only and
    preserves the input partitioning."""
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be < chunk_tokens")
    stride = chunk_tokens - overlap
    toks = tokens_col(F.col("text"))
    starts = F.sequence(
        F.lit(0),
        F.greatest(F.size(toks) - overlap - 1, F.lit(0)),
        F.lit(stride))
    return (docs
            .select("doc_id", toks.alias("_toks"),
                    F.posexplode(starts).alias("chunk_id", "_start"))
            .select(
                "doc_id",
                F.col("chunk_id").cast("long").alias("chunk_id"),
                F.array_join(
                    F.slice(F.col("_toks"), F.col("_start") + 1,
                            chunk_tokens),
                    " ").alias("chunk_text"),
                F.least(
                    F.size(F.col("_toks")) - F.col("_start"),
                    F.lit(chunk_tokens)).cast("long")
                .alias("n_chunk_tokens")))


def repetition_stats(docs: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, dup_token_frac, top_bigram_frac,
    dup_trigram_frac): within-document repetition signals from the
    Gopher-style quality-filter family (Rae et al. 2021, public
    methodology): fraction of non-distinct tokens, fraction of bigram
    occurrences taken by the single most frequent bigram, fraction of
    trigram occurrences belonging to trigrams that repeat. High values
    flag template/spam/boilerplate docs an LLM-ingest pipeline drops.

    Dataflow: per-row n-gram arrays (transform+slice, codegen), one
    explode + groupBy(doc_id, gram) per gram order — shuffles keyed by
    (doc_id, gram), well-distributed at any corpus size since doc_id
    leads the key. Docs too short for an n-gram get NULL for that
    fraction."""
    toks = tokens_col(F.col("text"))
    base = spread(docs).select(
        "doc_id",
        toks.alias("toks"),
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct"))

    def gram_col(k: int):
        # guard: sequence(1, 0) would generate a DESCENDING [1, 0] in
        # Spark, not an empty array — short docs must yield no grams
        return F.when(
            F.size("toks") >= k,
            F.transform(
                F.sequence(F.lit(1), F.size("toks") - (k - 1)),
                lambda i: F.concat_ws(" ", F.slice("toks", i, k)))
        ).otherwise(F.array().cast("array<string>"))

    def gram_aggs(k: int, prefix: str):
        ex = base.select(
            "doc_id", F.explode(gram_col(k)).alias("g"))
        return (ex.groupBy("doc_id", "g").agg(F.count("*").alias("c"))
                .groupBy("doc_id")
                .agg(F.max("c").alias(f"{prefix}_max"),
                     F.sum("c").alias(f"{prefix}_tot"),
                     F.sum(F.when(F.col("c") > 1, F.col("c"))
                           .otherwise(F.lit(0))).alias(f"{prefix}_dup")))

    bg = gram_aggs(2, "bg")
    tg = gram_aggs(3, "tg")
    return (base.select("doc_id", "n_tokens", "n_distinct")
            .join(bg, "doc_id", "left")
            .join(tg, "doc_id", "left")
            .select(
                "doc_id",
                F.col("n_tokens").cast("long").alias("n_tokens"),
                F.round(1.0 - F.col("n_distinct")
                        / F.col("n_tokens"), 4).alias("dup_token_frac"),
                F.round(F.col("bg_max").cast("double")
                        / F.col("bg_tot"), 4).alias("top_bigram_frac"),
                F.round(F.col("tg_dup").cast("double")
                        / F.col("tg_tot"), 4).alias("dup_trigram_frac")))


# PII patterns, restricted to the syntax subset where Java regex and
# RE2 (DuckDB) agree: character classes, counted repeats, \b word
# boundaries — no lookarounds, no backrefs. Order of application:
# emails first (their digits must not feed the phone pattern), then
# IPs, then phones.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RE = r"\+?\d[\d() -]{7,}\d"


def pii_cols(t0: Column) -> dict[str, Column]:
    """The PII-redaction expressions as named columns over a text
    expression — exposed so composed pipelines (ops/pipeline.py) can
    inline the redaction into an existing projection instead of
    joining :func:`redact_pii`'s output back on doc_id."""
    t1 = F.regexp_replace(t0, EMAIL_RE, "<EMAIL>")
    t2 = F.regexp_replace(t1, IPV4_RE, "<IP>")
    t3 = F.regexp_replace(t2, PHONE_RE, "<PHONE>")
    return {
        "clean_text": t3,
        "n_email": F.regexp_count(t0, F.lit(EMAIL_RE)).cast("long"),
        "n_ip": F.regexp_count(t1, F.lit(IPV4_RE)).cast("long"),
        "n_phone": F.regexp_count(t2, F.lit(PHONE_RE)).cast("long"),
    }


def redact_pii(docs: DataFrame,
               text_col: str = "text") -> DataFrame:
    """(doc_id, clean_text, n_email, n_ip, n_phone): redact
    emails/IPv4s/phone-shaped digit runs to <EMAIL>/<IP>/<PHONE>
    placeholder tokens — the scrub pass a training-data pipeline runs
    before tokenization. Three chained ``regexp_replace``s, pure
    codegen, map-only; counts are taken on the stage each pattern
    actually ran against (emails removed before phone counting, so an
    address's digits are never double-counted as a phone)."""
    cols = pii_cols(F.col(text_col))
    return docs.select(
        "doc_id", *[c.alias(n) for n, c in cols.items()])


def doc_fingerprint(docs: DataFrame) -> DataFrame:
    """(doc_id, fingerprint): order-sensitive rolling fingerprint =
    XOR over tokens of rotate60(hash60(token), position mod 60).

    The rotation makes it order-sensitive (same bag, different order ->
    different fingerprint) — the content-sequence analog of the
    reference's 5-word shingle ring hashes (XmlDoc.cpp:20574 getFragVec),
    usable as an exact-dup content checksum like the reference's nosplit
    content-hash dedup terms (XmlDoc_Indexing.cpp:156 hashNoSplit)."""
    two60 = 1 << 60
    ex = spread(docs).select(
        "doc_id", F.posexplode(tokens_col(F.col("text"))).alias("pos", "tok")
    ).select(
        "doc_id",
        hash60(F.col("tok")).alias("h"),
        (F.col("pos") % 60).alias("s"),
    )
    # rotate-left by s within 60 bits, in overflow-safe int64 arithmetic:
    # ((h mod 2^(60-s)) * 2^s) + (h div 2^(60-s))
    rot = (
        (F.col("h") % (F.lit(two60) / F.pow(F.lit(2.0), F.col("s"))).cast("long"))
        * F.pow(F.lit(2.0), F.col("s")).cast("long")
        + F.expr("h div cast(pow(2.0, 60 - s) as long)")
    )
    return (
        ex.select("doc_id", rot.alias("r"))
        .groupBy("doc_id")
        .agg(F.expr("bit_xor(r)").alias("fingerprint"))
    )


def simhash(docs: DataFrame, bits: int = HASH60_BITS) -> DataFrame:
    """(doc_id, simhash): bitwise-majority sketch over per-occurrence
    token hashes. Bit b of the sketch is 1 iff more token occurrences
    have bit b set than clear (ties -> 0). Near-dup docs land at small
    hamming distance; used with `hamming_pairs` for near-dup mining."""
    ex = spread(docs).select(
        "doc_id", F.explode(tokens_col(F.col("text"))).alias("tok")
    ).select("doc_id", hash60(F.col("tok")).alias("h"))
    aggs = [
        F.sum(
            F.when(F.expr(f"(h div {1 << b}) % 2 = 1"), 1).otherwise(-1)
        ).alias(f"b{b}")
        for b in range(bits)
    ]
    per_bit = ex.groupBy("doc_id").agg(*aggs)
    sh = None
    for b in range(bits):
        term = F.when(F.col(f"b{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0))
        sh = term if sh is None else sh + term
    return per_bit.select("doc_id", sh.cast("long").alias("simhash"))


def simhash_hamming_pairs(sim: DataFrame, max_dist: int = 3) -> DataFrame:
    """(doc_a, doc_b, dist) pairs with hamming(simhash) <= max_dist.

    Scale path: band the 60-bit sketch into 4 15-bit bands; by pigeonhole
    any pair within distance 3 agrees on >= 1 band, so candidates come
    from 4 equality self-joins (shuffle on band value) instead of a cross
    join — the same band-bucket-join trick as MinHash LSH."""
    two15 = 1 << 15
    banded = sim.select(
        "doc_id", "simhash",
        *[
            F.expr(f"(simhash div {two15 ** i}) % {two15}").alias(f"band{i}")
            for i in range(4)
        ],
    )
    # explode to (band_index, band_value) rows and self-join on BOTH,
    # NOT a union of 4 per-band self-joins: each union branch would
    # re-evaluate the upstream simhash subtree (the 60 conditional
    # aggs), 8× the sketch compute; the (bi, bv) equi-join keys collide
    # only within a band, so the candidate set is identical.
    lng = banded.select(
        "doc_id", "simhash",
        F.explode(F.array(*[
            F.struct(F.lit(i).alias("bi"), F.col(f"band{i}").alias("bv"))
            for i in range(4)])).alias("b")
    ).select("doc_id", "simhash", "b.bi", "b.bv")
    a = lng.select(F.col("doc_id").alias("doc_a"),
                   F.col("simhash").alias("sim_a"), "bi", "bv")
    b = lng.select(F.col("doc_id").alias("doc_b"),
                   F.col("simhash").alias("sim_b"), "bi", "bv")
    cands = (a.join(b, ["bi", "bv"])
             .where(F.col("doc_a") < F.col("doc_b"))
             .drop("bi", "bv").distinct())
    dist = F.bit_count(F.expr("sim_a ^ sim_b"))
    return (
        cands.select("doc_a", "doc_b", dist.alias("dist"))
        .where(F.col("dist") <= max_dist)
    )


def lang_dist(docs: DataFrame) -> DataFrame:
    """(lang, n_docs, total_chars, avg_tokens) distribution."""
    return (
        docs.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.length("text")).alias("total_chars"),
            F.round(F.avg(F.size(tokens_col(F.col("text")))), 4)
            .alias("avg_tokens"),
        )
    )


# stopword-profile language ID (n-gram/stopword heuristic; the reference
# delegates to CLD2, GbLanguage.cpp — ours is a self-contained profile
# matcher usable as a cheap pre-filter at scale)
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "of", "and", "to", "a", "in", "is", "it", "was", "for"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "zu", "den"),
    "fr": ("le", "la", "les", "et", "est", "un", "une", "des", "que", "pour"),
    "es": ("el", "la", "los", "las", "es", "y", "un", "una", "que", "por"),
    "da": ("og", "i", "det", "at", "en", "den", "til", "er", "som", "af"),
}


def lang_pred_col(text: Column) -> Column:
    """The language-ID prediction as one column expression over a text
    expression — exposed so composed pipelines can inline it into an
    existing projection (no join-back on doc_id). Same argmax/tie/zero
    semantics as :func:`detect_language`."""
    ts = F.array_distinct(tokens_col(text))
    langs = sorted(LANG_PROFILES)
    scores = {
        lg: F.size(F.array_intersect(
            ts, F.array(*[F.lit(w) for w in LANG_PROFILES[lg]])))
        for lg in langs
    }
    best = F.greatest(*scores.values())
    pred = F.lit("xx")
    # first (ascending) language reaching the max wins: build backwards
    for lg in reversed(langs):
        pred = F.when((scores[lg] == best) & (best > 0), lg).otherwise(pred)
    return pred


def detect_language(docs: DataFrame) -> DataFrame:
    """(doc_id, predicted_lang): argmax over per-language stopword-profile
    hit counts on the token set; ties broken by language code ascending;
    zero hits -> 'xx'."""
    return docs.select(
        "doc_id", lang_pred_col(F.col("text")).alias("predicted_lang"))


def keywords_tfidf(docs: DataFrame, top_k: int = 3) -> DataFrame:
    """Top-k characteristic terms per document by tf-idf (ln-idf,
    smooth-free: idf = ln(N / df), df = docs containing the term) —
    the classic keyword/topic-labeling primitive for corpus triage.
    Ties break (tfidf DESC, term ASC) so the output is deterministic.
    Returns ``(doc_id, term, tf, df, tfidf, rank)``.

    Scale shape: one explode + (doc, term) count aggregation, one
    term-df aggregation (both with map-side partials), one join back on
    term, one window per doc for the top-k — the same inverted-index
    dataflow as the posting build, with the same skew character
    (stopword terms have high df but the join fans out per doc, not
    per pair)."""
    from pyspark.sql import Window

    ts = tokens_col(F.col("text"))
    tf = (spread(docs)
          .select("doc_id", F.explode(ts).alias("term"))
          .groupBy("doc_id", "term")
          .agg(F.count("*").alias("tf")))
    n_docs = docs.count()
    dfc = tf.groupBy("term").agg(F.count("*").alias("df"))
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("term").asc())
    return (tf.join(dfc, "term")
            .withColumn("tfidf",
                        F.round(F.col("tf")
                                * F.log(F.lit(float(n_docs))
                                        / F.col("df")), 6))
            .withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= top_k)
            .select("doc_id", "term",
                    F.col("tf").cast("long").alias("tf"),
                    F.col("df").cast("long").alias("df"),
                    "tfidf",
                    F.col("rank").cast("int").alias("rank")))


def gopher_quality_filter(
    docs: DataFrame,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    min_alpha_word_frac: float = 0.8,
    min_stop_hits: int = 2,
    max_ellipsis_line_frac: float = 0.3,
    max_bullet_line_frac: float = 0.9,
) -> DataFrame:
    """The Gopher rules (Rae et al. 2021, appendix A1.1): the standard
    named document-quality gate for web-scale training corpora. Emits
    every signal plus the per-rule verdicts and a combined ``keep`` —
    downstream can drop, or keep-and-tag. All signals are Catalyst
    array/string expressions (codegen, no UDF):
      n_words, mean_word_len, symbol_ratio (#/… per word),
      alpha_word_frac (words containing [a-z]),
      n_stop_hits (distinct required stopwords present),
      ellipsis_line_frac / bullet_line_frac (over newline lines).
    Scale shape: a narrow projection — no shuffle, no join, linear
    scan; composable with repetition_stats (the A1.2 repetition rules)
    which needs its own n-gram aggregations."""
    cols = gopher_cols(
        F.col("text"), min_words, max_words, min_mean_word_len,
        max_mean_word_len, max_symbol_ratio, min_alpha_word_frac,
        min_stop_hits, max_ellipsis_line_frac, max_bullet_line_frac)
    return docs.select(
        "doc_id", *[c.alias(n) for n, c in cols.items()])


def gopher_cols(
    text: Column,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    min_alpha_word_frac: float = 0.8,
    min_stop_hits: int = 2,
    max_ellipsis_line_frac: float = 0.3,
    max_bullet_line_frac: float = 0.9,
) -> dict[str, Column]:
    """The Gopher signals + verdicts as named column expressions over a
    text expression — exposed so composed pipelines can inline the gate
    into an existing projection (no join-back on doc_id). Verdicts
    compare the ROUNDED signals, exactly like the projected columns
    :func:`gopher_quality_filter` emits."""
    ts = tokens_col(text)
    n_words = F.size(ts)
    mean_len = (F.aggregate(F.transform(ts, lambda t: F.length(t)),
                            F.lit(0),
                            lambda acc, x: acc + x).cast("double")
                / n_words)
    n_symbols = (F.length(text)
                 - F.length(F.regexp_replace(text, r"#|\.\.\.|…", "")))
    symbol_ratio = n_symbols.cast("double") / n_words
    alpha_frac = (F.size(F.filter(ts, lambda t: t.rlike("[a-zA-Z]")))
                  .cast("double") / n_words)
    stops = F.array(*[F.lit(s) for s in _PY_STOPWORDS])
    n_stop = F.size(F.array_intersect(F.array_distinct(ts), stops))
    lines = F.split(text, "\n")
    n_lines = F.size(lines)
    ell = (F.size(F.filter(
        lines, lambda x: x.endswith("...") | x.endswith("…")))
        .cast("double") / n_lines)
    bul = (F.size(F.filter(
        lines,
        lambda x: x.startswith("-") | x.startswith("*")
        | x.startswith("•")))
        .cast("double") / n_lines)
    sig: dict[str, Column] = {
        "n_words": n_words.cast("long"),
        "mean_word_len": F.round(mean_len, 4),
        "symbol_ratio": F.round(symbol_ratio, 4),
        "alpha_word_frac": F.round(alpha_frac, 4),
        "n_stop_hits": n_stop.cast("long"),
        "ellipsis_line_frac": F.round(ell, 4),
        "bullet_line_frac": F.round(bul, 4),
    }
    checks: dict[str, Column] = {
        "ok_words": (sig["n_words"] >= min_words)
        & (sig["n_words"] <= max_words),
        "ok_word_len": (sig["mean_word_len"] >= min_mean_word_len)
        & (sig["mean_word_len"] <= max_mean_word_len),
        "ok_symbols": sig["symbol_ratio"] <= max_symbol_ratio,
        "ok_alpha": sig["alpha_word_frac"] >= min_alpha_word_frac,
        "ok_stops": sig["n_stop_hits"] >= min_stop_hits,
        "ok_ellipsis": sig["ellipsis_line_frac"]
        <= max_ellipsis_line_frac,
        "ok_bullets": sig["bullet_line_frac"]
        <= max_bullet_line_frac,
    }
    keep = None
    for c in checks.values():
        keep = c if keep is None else keep & c
    return {**sig, **checks, "keep": keep}


def c4_quality_filter(
    docs: DataFrame,
    min_line_words: int = 5,
    min_kept_lines: int = 3,
    badwords: "tuple[str, ...]" = ("lorem ipsum", "javascript"),
) -> DataFrame:
    """The C4 cleaning rules (Raffel et al. 2020 §2.2) — the other
    standard named web-corpus gate, complementing the Gopher rules:
      - a line is kept only if it ends in terminal punctuation
        (. ! ? ") AND has >= min_line_words words;
      - the doc is dropped if it has < min_kept_lines kept lines,
        contains any badword phrase (case-insensitive), or contains
        a curly brace (code leakage).
    Emits per-doc counts + per-rule verdicts + combined ``keep`` and
    the cleaned text (kept lines rejoined) — C4 keeps only the kept
    lines of surviving docs. Pure Catalyst array ops: a narrow
    projection, no shuffle.

    (The reference engine has no corpus-cleaning stage — this family
    generalizes its spam/adult gating, SURVEY §2.3, to training-data
    curation.)"""
    lines = F.split(F.col("text"), "\n")
    kept = F.filter(
        lines,
        lambda x: (x.rlike('[.!?"]\\s*$'))
        & (F.size(F.split(F.trim(x), " +")) >= min_line_words))
    lower = F.lower(F.col("text"))
    has_bad = None
    for b in badwords:
        c = lower.contains(b.lower())
        has_bad = c if has_bad is None else (has_bad | c)
    has_brace = F.col("text").contains("{") | F.col("text").contains("}")
    out = docs.select(
        "doc_id",
        F.size(lines).cast("long").alias("n_lines"),
        F.size(kept).cast("long").alias("n_kept_lines"),
        has_bad.alias("has_badword"),
        has_brace.alias("has_brace"),
        F.array_join(kept, "\n").alias("clean_text"),
    )
    keep = ((F.col("n_kept_lines") >= min_kept_lines)
            & ~F.col("has_badword") & ~F.col("has_brace"))
    return out.withColumn("keep", keep)


def lm_quality_buckets(docs: DataFrame, lm_docs: DataFrame | None = None,
                       cutoffs: tuple[float, float] | None = None,
                       per_lang: bool = True) -> DataFrame:
    """CCNet §4.3 language-model quality bucketing (Wenzek et al. 2020):
    score every document by its per-token cross-entropy under a unigram
    LM estimated from ``lm_docs`` (CCNet uses a KenLM 5-gram trained on
    Wikipedia; the deterministic stand-in here is an add-one-smoothed
    unigram model — same bucketing mechanics, no external model file),
    then label each doc ``head`` / ``middle`` / ``tail`` by where its
    score falls in the per-language score distribution (CCNet computes
    the cutoffs per language so a hard language never lands entirely in
    tail). Returns ``(doc_id, lang, n_tokens, cross_entropy, bucket)``.

    Two cutoff modes:
    - ``cutoffs=None`` (default): exact tertiles via a rank window
      partitioned by language — one task per language, which is how
      CCNet derives its cutoffs (on a bounded sample). At 100 TB run
      this on a sample, then reuse the learned constants:
    - ``cutoffs=(c1, c2)``: explicit cross-entropy thresholds; bucket
      assignment becomes a map-only projection with no shuffle beyond
      the LM join (the production path once cutoffs are learned).

    Scale shape: the LM table is one groupBy over exploded tokens
    (map-side partial counts) and is vocabulary-sized, so the score
    join broadcasts; everything else is narrow."""
    from pyspark.sql import Window

    lm_src = lm_docs if lm_docs is not None else docs
    tok = lm_src.select(F.explode(tokens_col(F.col("text"))).alias("tok"))
    cnt = tok.groupBy("tok").agg(F.count("*").alias("cnt"))
    tot = cnt.agg(F.sum("cnt").cast("double").alias("total"),
                  F.count("*").cast("double").alias("vsize"))
    lm = (cnt.crossJoin(F.broadcast(tot))
          .select("tok",
                  F.log((F.col("cnt") + 1.0)
                        / (F.col("total") + F.col("vsize"))).alias("logp")))
    dtok = docs.select("doc_id", "lang",
                       F.explode(tokens_col(F.col("text"))).alias("tok"))
    ce = (dtok.join(F.broadcast(lm), "tok", "left")
          .crossJoin(F.broadcast(tot))
          .groupBy("doc_id", "lang")
          .agg(F.count("*").cast("long").alias("n_tokens"),
               (-F.avg(F.coalesce(
                   F.col("logp"),
                   # add-one floor for tokens unseen by the LM corpus
                   F.log(1.0 / (F.col("total") + F.col("vsize"))))))
               .alias("_ce")))
    ce = ce.select("doc_id", "lang", "n_tokens",
                   F.round("_ce", 4).alias("cross_entropy"))
    if cutoffs is not None:
        c1, c2 = cutoffs
        bucket = (F.when(F.col("cross_entropy") <= c1, "head")
                  .when(F.col("cross_entropy") <= c2, "middle")
                  .otherwise("tail"))
        return ce.withColumn("bucket", bucket)
    part = ["lang"] if per_lang else [F.lit(1)]
    w = Window.partitionBy(*part).orderBy(
        F.col("cross_entropy").asc(), F.col("doc_id").asc())
    wn = Window.partitionBy(*part)
    r = F.row_number().over(w)
    n = F.count("*").over(wn)
    bucket = (F.when(r * 3 <= n, "head")
              .when(r * 3 <= 2 * n, "middle")
              .otherwise("tail"))
    return ce.withColumn("bucket", bucket)


def similar_docs(docs: DataFrame, query_doc_id: int,
                 k: int = 10) -> DataFrame:
    """'More like this' — top-k related docs by tf-idf cosine to one
    query document (the related-pages primitive; same w = tf·ln(N/df)
    convention as ``keywords_tfidf``). Returns (doc_id, sim), sim
    rounded to 4, ties doc_id ASC, the query doc itself excluded.

    Scale shape: the query doc's weighted term vector is tiny (its
    distinct terms) and BROADCAST; candidate scoring is a broadcast
    join on term + one per-doc sum with map-side partials — only docs
    sharing >=1 term with the query are touched at all (the inverted-
    index access pattern: common terms fan out, rare terms prune),
    then one TakeOrderedAndProject(k). Doc norms come from one per-doc
    aggregation of the same tf frame — no pairwise stage anywhere."""
    ts = tokens_col(F.col("text"))
    tf = (spread(docs)
          .select("doc_id", F.explode(ts).alias("term"))
          .groupBy("doc_id", "term")
          .agg(F.count("*").alias("tf")))
    n_docs = docs.count()
    dfc = tf.groupBy("term").agg(F.count("*").alias("df"))
    w = (tf.join(dfc, "term")
         .select("doc_id", "term",
                 (F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")))
                 .alias("w")))
    norms = (w.groupBy("doc_id")
             .agg(F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("nrm")))
    qvec = (w.where(F.col("doc_id") == query_doc_id)
            .select("term", F.col("w").alias("qw")))
    qnorm = (norms.where(F.col("doc_id") == query_doc_id)
             .select(F.col("nrm").alias("qnrm")))
    dots = (w.join(F.broadcast(qvec), "term")
            .where(F.col("doc_id") != query_doc_id)
            .groupBy("doc_id")
            .agg(F.sum(F.col("w") * F.col("qw")).alias("dot")))
    return (dots.join(norms, "doc_id").crossJoin(F.broadcast(qnorm))
            .select("doc_id",
                    F.round(F.col("dot") / (F.col("nrm") * F.col("qnrm")), 4)
                    .alias("sim"))
            .orderBy(F.col("sim").desc(), F.col("doc_id").asc())
            .limit(k))


def _merge_pair_col(syms_col, left: str, right: str, merged: str):
    """Greedy left-to-right non-overlapping merge of (left, right)
    inside a symbol array — one Catalyst aggregate fold, no UDF."""
    return F.aggregate(
        syms_col,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (x == F.lit(right)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1),
                     F.array(F.lit(merged)))
        ).otherwise(F.concat(acc, F.array(x))))


def bpe_train(docs: DataFrame, n_merges: int = 30,
              text_col: str = "text"):
    """Learn a BPE merge table from the corpus (Sennrich et al. 2016).
    Returns a DataFrame (rank, left, right, merged), rank 0 first.

    The corpus first collapses to its VOCABULARY frame (word, count) —
    one shuffle — after which every round works on vocabulary-sized
    data: pair statistics depend only on distinct words × counts, the
    classic trick that makes BPE training cheap at any corpus size.
    Words start as character arrays + a trailing '</w>' marker. Each
    round: explode adjacent symbol pairs weighted by word count (all
    adjacent positions, the original implementation's counting),
    groupBy(pair) sum with map-side partials, argmax with (count DESC,
    left ASC, right ASC) tie-break — fully deterministic — then fold
    the winning pair into every word's symbol array via
    ``_merge_pair_col`` and localCheckpoint (bounds lineage across
    rounds). Stops early when no pair occurs >= 2 times.

    The merge decision is a data-dependent iterative argmax, so there
    is no closed-form SQL twin; correctness is pinned by a pure-python
    differential test (tests/test_ops.py) and the driver entry is
    rows-only by design."""
    spark = docs.sparkSession
    vocab = (spread(docs)
             .select(F.explode(tokens_col(F.col(text_col))).alias("w"))
             .groupBy("w").agg(F.count("*").alias("cnt"))
             .select(
                 F.concat(F.split(F.col("w"), ""),
                          F.array(F.lit("</w>"))).alias("syms"),
                 "cnt")
             .localCheckpoint())
    merges: list[tuple[int, str, str, str]] = []
    for rank in range(n_merges):
        idx = F.sequence(F.lit(1), F.size("syms") - 1)
        pairs = (vocab.where(F.size("syms") >= 2)
                 .select("cnt", F.explode(
                     F.transform(idx, lambda i: F.struct(
                         F.element_at(F.col("syms"), i).alias("l"),
                         F.element_at(F.col("syms"), i + 1).alias("r"))))
                     .alias("p"))
                 .groupBy("p.l", "p.r")
                 .agg(F.sum("cnt").alias("n"))
                 .orderBy(F.col("n").desc(), F.col("l").asc(),
                          F.col("r").asc())
                 .limit(1).collect())
        if not pairs or pairs[0]["n"] < 2:
            break
        left, right = pairs[0]["l"], pairs[0]["r"]
        merged = left + right
        merges.append((rank, left, right, merged))
        vocab = (vocab.select(
            _merge_pair_col(F.col("syms"), left, right, merged)
            .alias("syms"), "cnt")
            .localCheckpoint())
    return spark.createDataFrame(
        merges, "rank int, left string, right string, merged string")


def bpe_word_pieces(docs: DataFrame, merges: list[tuple[str, str]],
                    text_col: str = "text") -> DataFrame:
    """(word, pieces): the corpus vocabulary segmented by a learned
    merge list (apply side of ``bpe_train`` — the same fold chain
    replayed in merge-rank order over the vocabulary frame)."""
    vocab = (spread(docs)
             .select(F.explode(tokens_col(F.col(text_col))).alias("w"))
             .distinct()
             .select("w", F.concat(F.split(F.col("w"), ""),
                                   F.array(F.lit("</w>"))).alias("syms")))
    col = F.col("syms")
    for left, right in merges:
        col = _merge_pair_col(col, left, right, left + right)
    return vocab.select(F.col("w").alias("word"), col.alias("pieces"))


def winnow_fingerprints(docs: DataFrame, k: int = 5, w: int = 4,
                        text_col: str = "text") -> DataFrame:
    """Winnowing document fingerprints (Schleimer et al. 2003, the
    MOSS scheme): hash every word k-gram, slide a window of ``w``
    consecutive hashes, and select each window's MINIMUM hash —
    rightmost position on ties, per the paper — keeping the distinct
    (position, hash) picks. Guarantees every duplicate span of at
    least k+w-1 tokens shares a fingerprint between documents, at an
    expected density of 2/(w+1) — the local, position-robust
    complement of ``doc_fingerprint``'s single whole-doc hash.

    Returns (doc_id, pos, fp): pos = 0-based k-gram start. Everything
    is one narrow projection (array expressions: k-gram hash array,
    per-window argmin via reverse/array_position for the rightmost-tie
    rule) + one explode + distinct — shuffle only on the output rows.
    fp = hash60(k-gram) mod 2^31 (plenty for collision-rare selection;
    the verify step of any match pipeline re-checks text anyway)."""
    ts = tokens_col(F.col(text_col))
    grams = F.transform(
        F.sequence(F.lit(1), F.size(ts) - (k - 1)),
        lambda i: F.concat_ws(" ", F.slice(ts, i, k)))
    hashes = F.transform(grams, lambda g: hash60(g) % F.lit(1 << 31))
    n_win = F.size(hashes) - (w - 1)
    picks = F.transform(
        F.sequence(F.lit(1), n_win),
        lambda i: F.struct(
            (i - 1 + F.lit(w)
             - F.array_position(F.reverse(F.slice(hashes, i, w)),
                                F.array_min(F.slice(hashes, i, w))))
            .cast("int").alias("pos"),
            F.array_min(F.slice(hashes, i, w)).alias("fp")))
    return (spread(docs).where(F.size(ts) >= k + w - 1)
            .select("doc_id", F.explode(F.array_distinct(picks)).alias("s"))
            .select("doc_id", F.col("s.pos").alias("pos"),
                    F.col("s.fp").alias("fp"))
            .distinct())


def collocations(docs: DataFrame, min_count: int = 5,
                 top_k: int = 50, text_col: str = "text") -> DataFrame:
    """Collocation mining by pointwise mutual information over adjacent
    word pairs: pmi = ln(c_xy · T / (c_x· · c_·y)) with T = total
    bigram occurrences, c_x· / c_·y the left/right marginals — the
    classic collocation statistic (Church & Hanks 1990). Returns the
    ``top_k`` pairs with count >= min_count ranked (pmi DESC, w1 ASC,
    w2 ASC), pmi rounded to 4.

    Scale shape: one bigram explode + count aggregation; marginals are
    two more aggregations OVER THE BIGRAM COUNTS (vocabulary-sized, not
    corpus-sized), joined back broadcast; TakeOrderedAndProject(k)."""
    ts = tokens_col(F.col(text_col))
    bigs = F.transform(
        F.sequence(F.lit(1), F.size(ts) - 1),
        lambda i: F.struct(F.element_at(ts, i).alias("w1"),
                           F.element_at(ts, i + 1).alias("w2")))
    bc = (spread(docs).where(F.size(ts) >= 2)
          .select(F.explode(bigs).alias("b"))
          .groupBy(F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))
          .agg(F.count("*").alias("c_xy")))
    total = bc.agg(F.sum("c_xy")).collect()[0][0]
    left = bc.groupBy("w1").agg(F.sum("c_xy").alias("c_x"))
    right = bc.groupBy("w2").agg(F.sum("c_xy").alias("c_y"))
    return (bc.where(F.col("c_xy") >= min_count)
            .join(F.broadcast(left), "w1").join(F.broadcast(right), "w2")
            .select("w1", "w2", F.col("c_xy").cast("long").alias("c_xy"),
                    F.round(F.log(F.col("c_xy") * F.lit(float(total))
                                  / (F.col("c_x") * F.col("c_y"))), 4)
                    .alias("pmi"))
            .orderBy(F.col("pmi").desc(), F.col("w1").asc(),
                     F.col("w2").asc())
            .limit(top_k))


def textrank_keywords(docs: DataFrame, top_k: int = 3,
                      n_iter: int = 5,
                      text_col: str = "text") -> DataFrame:
    """TextRank keyword extraction (Mihalcea & Tarau 2004): per
    document, rank tokens by PageRank over the adjacent-co-occurrence
    graph (undirected: both directions, distinct, self-loops dropped)
    and keep the top_k per doc — the graph-centrality alternative to
    ``keywords_tfidf``. Returns (doc_id, term, rank_fp, rank).

    Composition trick: every per-doc graph becomes one node set keyed
    by hash60(doc_id:term) and a SINGLE corpus-wide ``ops.graph.
    pagerank`` run scores all documents at once — fixed-point
    PageRank's teleport term is node-local (scale·(1-d), no global 1/N
    factor), so PageRank over the disjoint union is EXACTLY the
    per-doc run, and the engine executes 5 iterations × 2 node-keyed
    shuffles TOTAL for the whole corpus instead of a per-doc loop.
    Ties (same fixed-point score) break term-ascending."""
    from pyspark.sql import Window

    from .graph import pagerank

    ts = tokens_col(F.col(text_col))
    toks = (spread(docs).where(F.size(ts) >= 2)
            .select("doc_id", F.posexplode(ts).alias("i", "w")))
    nxt = toks.select("doc_id", (F.col("i") + 1).alias("i"),
                      F.col("w").alias("w2"))
    pairs = (toks.join(nxt, ["doc_id", "i"])
             .where(F.col("w") != F.col("w2"))
             .select("doc_id", "w", "w2").distinct())
    und = (pairs.union(pairs.select("doc_id", F.col("w2").alias("w"),
                                    F.col("w").alias("w2")))
           .distinct())  # a pair adjacent in BOTH orders must not
                         # double its edge weight (undirected edge SET)

    def node(doc, term):
        return hash60(F.concat(doc.cast("string"), F.lit(":"), term))

    edges = und.select(node(F.col("doc_id"), F.col("w")).alias("src"),
                       node(F.col("doc_id"), F.col("w2")).alias("dst"))
    pr = pagerank(edges, n_iter=n_iter)
    vocab = (und.select("doc_id", F.col("w").alias("term"))
             .distinct()
             .withColumn("node", node(F.col("doc_id"), F.col("term"))))
    wnd = (Window.partitionBy("doc_id")
           .orderBy(F.col("rank_fp").desc(), F.col("term").asc()))
    return (vocab.join(pr, "node")
            .withColumn("rank", F.row_number().over(wnd))
            .where(F.col("rank") <= top_k)
            .select("doc_id", "term", "rank_fp",
                    F.col("rank").cast("int")))


def group_keywords_tfidf(docs: DataFrame, group_col: str = "source",
                         top_k: int = 5) -> DataFrame:
    """Top-k characteristic terms PER GROUP (corpus source, site,
    language, ...) by tf-idf at group granularity: tf = term count in
    the group's concatenated text, df = number of GROUPS containing
    the term, idf = ln(n_groups / df) — the standard contrastive
    corpus-profiling op for training-data mixture QA ("what
    distinguishes source A's text from the rest"); a term appearing
    in every group scores zero, exactly the boilerplate-suppression
    tf-idf gives at doc granularity (keywords_tfidf, same arithmetic,
    same rounding). Ties (tfidf DESC, term ASC).
    Returns ``(group, term, tf, df, tfidf, rank)``.

    Scale shape: identical to keywords_tfidf with the group key
    substituted for doc_id — one explode + (group, term) count
    aggregation, one term-df aggregation (both map-side partial), one
    join on term, one per-group top-k window over the
    groups-x-vocabulary frame (far smaller than the corpus)."""
    from pyspark.sql import Window

    g = F.col(group_col).alias("group")
    tf = (spread(docs)
          .select(g, F.explode(tokens_col(F.col("text"))).alias("term"))
          .groupBy("group", "term")
          .agg(F.count("*").alias("tf")))
    n_groups = tf.select("group").distinct().count()
    dfc = tf.groupBy("term").agg(F.count("*").alias("df"))
    w = Window.partitionBy("group").orderBy(
        F.col("tfidf").desc(), F.col("term").asc())
    return (tf.join(dfc, "term")
            .withColumn("tfidf",
                        F.round(F.col("tf")
                                * F.log(F.lit(float(n_groups))
                                        / F.col("df")), 6))
            .withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= top_k)
            .select("group", "term",
                    F.col("tf").cast("long").alias("tf"),
                    F.col("df").cast("long").alias("df"),
                    "tfidf",
                    F.col("rank").cast("int").alias("rank")))
