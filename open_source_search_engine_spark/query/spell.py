"""Query spell correction (Speller.cpp; PageResults.cpp:335 spellcheck).

The reference spell-checks query words against its unified dictionary,
ranking replacement candidates by phrase popularity
(Speller.cpp:463 getPhrasePopularity). The dictionary data file is not
shipped — but the Spark-native engine has something strictly better on
hand: the index's OWN lexicon with exact document frequencies, which is
the popularity table a web-scale deployment would actually want.

Scale path (SymSpell symmetric deletes): ``build_spell_index`` writes a
``(dkey, term, df)`` table — every length-1 deletion of every lexicon
term plus the term itself — partitioned by a hash bucket of dkey. A
misspelled word probes with ITS OWN delete neighborhood (a handful of
keys), so the lookup is a bucket-pruned join against <= len(word)+1
keys, never a scan: levenshtein over the whole lexicon would be O(V)
per query word, the delete join is O(len(word)) key lookups at any
vocabulary size. Delete-neighborhood overlap admits a few distance-2
candidates; an exact ``F.levenshtein <= 1`` filter on the tiny
candidate set makes the result identical to a brute-force scan (the
driver oracle recomputes it with DuckDB's levenshtein to prove it).

Suggestion rule: highest-df candidate within edit distance 1, ties by
term ascending; a word that IS in the lexicon suggests itself
(popularity >= any rival is implicit — the reference likewise keeps
in-dictionary words, Speller.cpp:752-760).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SUBDIR = "spell"
N_BUCKETS = 64


def _deletes(word: str) -> list[str]:
    """The word plus every single-character deletion."""
    out = [word]
    out.extend(word[:i] + word[i + 1:] for i in range(len(word)))
    return out


def build_spell_index(spark: SparkSession, index_dir: str) -> None:
    """Materialize the delete-neighborhood table from the lexicon +
    term_stats (one pass; ~len(term)+1 rows per term), bucketed by
    xxhash64(dkey) for probe-side partition pruning."""
    from .executor import IndexReader

    rd = IndexReader(spark, index_dir)
    lex = rd.lexicon().join(rd.term_stats(), "term_id").select("term", "df")
    dels = lex.select(
        "term", "df",
        F.explode(F.concat(
            F.array(F.col("term")),
            F.expr("transform(sequence(0, length(term) - 1), "
                   "i -> concat(substring(term, 1, i), "
                   "substring(term, i + 2, length(term))))")
        )).alias("dkey"))
    (dels.withColumn("bucket",
                     F.pmod(F.xxhash64("dkey"), F.lit(N_BUCKETS)))
     .write.mode("overwrite").partitionBy("bucket")
     .parquet(os.path.join(index_dir, SUBDIR)))


def suggestions(spark: SparkSession, index_dir: str,
                words: list[str]) -> DataFrame:
    """(word, suggestion, df) — the best edit-distance-<=1 lexicon term
    per query word (null suggestion when nothing is within distance 1).
    Builds the spell table on first use."""
    p = os.path.join(index_dir, SUBDIR)
    if not os.path.exists(p):
        build_spell_index(spark, index_dir)
    spell = spark.read.parquet(p)

    probe_rows = []
    buckets: set[int] = set()
    for w in sorted(set(words)):
        lw = w.lower()
        for dk in set(_deletes(lw)):
            probe_rows.append((lw, dk))
    probe = spark.createDataFrame(probe_rows, "word string, dkey string")
    # bucket pruning: the probe's dkey set is tiny — compute its bucket
    # ids (one driver-side job over the broadcast-sized probe) and
    # restrict the scan to those partition dirs
    bks = [int(r[0]) for r in probe.select(
        F.pmod(F.xxhash64("dkey"), F.lit(N_BUCKETS))).distinct().collect()]
    spell = spell.where(F.col("bucket").isin(bks))
    cand = (
        spell.join(F.broadcast(probe), "dkey")
        .where(F.levenshtein("word", "term") <= 1)
        .select("word", "term", "df")
        .distinct()
    )
    from pyspark.sql import Window

    w = Window.partitionBy("word").orderBy(F.col("df").desc(),
                                           F.col("term").asc())
    winners = (cand.withColumn("_r", F.row_number().over(w))
               .where(F.col("_r") == 1)
               .select("word", F.col("term").alias("suggestion"),
                       F.col("df").cast("long").alias("df")))
    # words with no candidate within distance 1 come back with a null
    # suggestion (docstring contract; ADVICE r2: the inner join silently
    # dropped them)
    return probe.select("word").distinct().join(winners, "word", "left")


def suggest_prefix(spark: SparkSession, index_dir: str, prefix: str,
                   k: int = 10) -> DataFrame:
    """(term, df) — query autocompletion: the top-k lexicon terms with
    the given prefix, ranked df DESC (term ASC ties). The serving-side
    complement of ``suggestions`` (typo repair): both rank candidate
    completions by the index's OWN exact document frequencies rather
    than an external dictionary, so suggestions always hit the corpus.

    Plan shape: one scan of the (tiny, vocabulary-sized) lexicon⋈
    term_stats frame with the prefix predicate pushed into the parquet
    scan (PushedFilters: StringStartsWith — row groups whose term
    min/max excludes the prefix range are skipped), ending in
    TakeOrderedAndProject(k). No posting data is touched."""
    from .executor import IndexReader

    rd = IndexReader(spark, index_dir)
    lex = rd.lexicon().join(rd.term_stats(), "term_id").select("term", "df")
    return (lex.where(F.col("term").startswith(prefix.lower()))
            .orderBy(F.col("df").desc(), F.col("term").asc())
            .limit(k))
