"""URL-level filtering for training-data pipelines (RefinedWeb §3.1,
Penedo et al. 2023: blocklist + url bad-word score + heuristics; the
same stage C4 runs with its badwords list and UT1-style blocklists).

The reference engine's crawl path has the analogous admission controls
(site bans via tagdb/Collectiondb url filters, adult url heuristics in
AdultCheck.cpp getUrlAdultPoints); this operator is the corpus-side
batch formulation: given (doc_id, url), emit per-rule verdicts and a
combined keep flag.

Everything is pure Catalyst codegen over one narrow projection — no
UDF, no shuffle, scale-free. The domain blocklist is embedded as a
literal array when small (the common case: a few thousand banned
domains compile into one `array_contains`); pass a DataFrame for
UT1-scale lists (millions) and it becomes one broadcast left-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# url substrings that page the doc into the adult/fraud bucket
# (AdultCheck.cpp getUrlAdultPoints-style needles; extend like the
# reference edits its table)
DEFAULT_URL_BADWORDS: tuple[str, ...] = (
    "porn", "xxx", "casino", "viagra", "escort", "webcam",
)


def url_quality_filter(
    docs: DataFrame,
    blocked_domains: "list[str] | DataFrame | None" = None,
    badwords: "tuple[str, ...]" = DEFAULT_URL_BADWORDS,
    max_len: int = 256,
    max_digit_frac: float = 0.5,
    url_col: str = "url",
) -> DataFrame:
    """(doc_id, url, domain, n_badwords, digit_frac, blocked_domain,
    too_long, keep): keep = no blocklisted domain, no url badword,
    length <= max_len, digit fraction <= max_digit_frac."""
    url = F.lower(F.col(url_col))
    domain = F.regexp_extract(url, r"^[a-z][a-z0-9+.-]*://([^/:]+)", 1)
    n_digits = (F.length(url)
                - F.length(F.regexp_replace(url, "[0-9]", "")))
    digit_frac = F.round(n_digits / F.greatest(F.length(url), F.lit(1)), 4)
    n_bad = sum(
        (F.when(F.contains(url, F.lit(w)), 1).otherwise(0)
         for w in badwords),
        F.lit(0))
    out = docs.select(
        "doc_id", F.col(url_col).alias("url"), domain.alias("domain"),
        n_bad.cast("int").alias("n_badwords"),
        digit_frac.alias("digit_frac"),
        (F.length(url) > max_len).alias("too_long"))
    if blocked_domains is None:
        out = out.withColumn("blocked_domain", F.lit(False))
    elif isinstance(blocked_domains, DataFrame):
        # UT1-scale blocklist: one broadcast left-join on domain
        bl = blocked_domains.select(
            F.lower(F.col(blocked_domains.columns[0])).alias("domain"),
            F.lit(True).alias("blocked_domain"))
        out = (out.join(F.broadcast(bl), "domain", "left")
               .withColumn("blocked_domain",
                           F.coalesce("blocked_domain", F.lit(False))))
    else:
        lits = F.array(*[F.lit(d.lower()) for d in blocked_domains])
        out = out.withColumn("blocked_domain",
                             F.array_contains(lits, F.col("domain")))
    keep = (~F.col("blocked_domain") & (F.col("n_badwords") == 0)
            & ~F.col("too_long")
            & (F.col("digit_frac") <= max_digit_frac))
    return out.select("doc_id", "url", "domain", "n_badwords",
                      "digit_frac", "blocked_domain", "too_long",
                      keep.alias("keep"))
