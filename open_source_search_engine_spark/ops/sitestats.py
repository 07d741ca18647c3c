"""Per-site rollup table — the tagdb analog (Tagdb.cpp:875-940: the
reference keeps per-site records — sitenuminlinks, language, ban state,
root titles — in a dedicated Rdb keyed by site hash, populated by the
spider pipeline). The Spark-native equivalent derives the site table
FROM the index's docs snapshot: one site-keyed aggregation pass over
corpus metadata, no spider state.

Scale shape: two groupBy(site) aggregations + one site-keyed join —
site cardinality is orders of magnitude below doc cardinality, and the
counting aggregates are map-side-partial friendly, so a mega-site (the
skew case) reduces locally before the shuffle. Nothing doc-pairwise.

Columns: site (host), n_docs, site_rank (max over docs — constant per
site by construction, Msg25.cpp:4974 step function over inlink count),
total_tokens, n_langs, main_lang_id (dominant language, ties to the
smaller langId — a deterministic total order, same convention as the
label-propagation op), first_ts/last_ts (crawl-time span, floored
epoch seconds like unix_timestamp).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_HOST_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/:]+)"


def site_table(docs: DataFrame, url_col: str = "url") -> DataFrame:
    """Roll the index docs view (IndexReader.docs()) up to one row per
    site. Works on any frame carrying (url, site_rank, lang_id,
    n_tokens, warc_ts). Since r5 the site key is PATH-AWARE (the
    SiteGetter port): ~user//users/ subtrees and homestead path
    prefixes roll up separately — a vectorized pandas UDF applies
    functions.sitegetter.get_site per url (plain hosts are unchanged,
    so the host-regex fast shape of earlier rounds is a special
    case)."""
    from pyspark.sql.functions import pandas_udf

    from ..functions.sitegetter import get_site

    @pandas_udf("string")
    def _site_of(urls: pd.Series) -> pd.Series:
        return urls.map(get_site)

    base = docs.select(
        _site_of(F.col(url_col)).alias("site"),
        "site_rank", "lang_id", "n_tokens", "warc_ts")
    lc = (base.groupBy("site", "lang_id")
          .agg(F.count("*").alias("c")))
    main = (lc.groupBy("site")
            .agg(F.max(F.struct(F.col("c"),
                                (-F.col("lang_id")).alias("nl")))
                 .alias("m"),
                 F.count("*").alias("n_langs"))
            .select("site",
                    (-F.col("m.nl")).cast("int").alias("main_lang_id"),
                    F.col("n_langs").cast("long")))
    agg = (base.groupBy("site")
           .agg(F.count("*").alias("n_docs"),
                F.max("site_rank").cast("int").alias("site_rank"),
                F.sum("n_tokens").cast("long").alias("total_tokens"),
                F.min(F.unix_timestamp("warc_ts")).alias("first_ts"),
                F.max(F.unix_timestamp("warc_ts")).alias("last_ts")))
    return agg.join(main, "site")
