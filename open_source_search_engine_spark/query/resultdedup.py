"""Serving-time result dedup: summary-similarity + URL normalize-and-
compare (Msg40.cpp:1524-1650).

After site clustering, the reference's Msg40 applies two more
visibility filters to the ranked result buffer:

1. **Summary-similarity dedup** (`m_percentSimilarSummary`,
   Msg40.cpp:1526-1578): each result carries a *summary vector* — the
   deduped, ascending-sorted low-32-bit word hashes of its title+summary
   (XmlDoc::getSummaryVector :4374 over XmlDoc::computeVector :4537) —
   and a lower-ranked result whose vector is `computeSimilarity`-percent
   similar (XmlDoc.cpp:4693) to any visible higher-ranked result is
   marked CR_DUP_SUMMARY.
2. **URL normalize-and-compare** (`m_dedupURL`, Msg40.cpp:1585-1650):
   results are keyed by a normalized url — scheme stripped, trailing
   slash stripped, a variant-like subdomain (language/country codes +
   www, Msg40.cpp:1942) stripped when a real path exists — and only the
   best-ranked result per key stays (CR_DUP_URL). Skipped when the
   query itself carries a site:/suburl: field (Msg40.cpp:1589).

Both operate on the driver-side top-(k x M) candidate buffer that
`search_clustered` already holds (the reference's TopTree is likewise
in-RAM), so the added cost is O(buffer) python over <= a few hundred
rows per query — never a cluster job; the summary text itself comes
from the same pushed-down docs lookup the site caps use.
"""

from __future__ import annotations

from ..functions.gbhash import hash64_lower_utf8
from ..functions.tokenizer import ALNUM, tokenize

# SAMPLE_VECTOR_SIZE = 32*4 bytes (Msg40.h:8) -> 32 int32 slots, one
# reserved for the null terminator
MAX_VECTOR_TERMS = 32 - 1
_NUMTERMIDBITS = 48  # XmlDoc.cpp:57
_U64 = (1 << 64) - 1

# s_variantLikeSubDomains, Msg40.cpp:1942-1975: language codes, country
# codes, and www — subdomains that usually serve the same page
VARIANT_SUBDOMAINS = frozenset([
    "en", "fr", "es", "ru", "zz", "ja", "tw", "cn", "ko", "de", "nl",
    "it", "fi", "sv", "no", "pt", "vi", "ar", "he", "id", "el", "th",
    "hi", "bn", "pl", "tl", "us", "uk", "www",
])


def summary_vector(title: str | None, summary: str | None) -> list[int]:
    """Dedup vector of a result: deduped, ascending-sorted low-32-bit
    word hashes of "title summary" (XmlDoc::getSummaryVector :4374 +
    computeVector :4537), truncated to MAX_VECTOR_TERMS. The reference's
    sampling mask (computeVector :4560-4572) only engages when the text
    has >= 4x maxTerms alnum words; ported for parity although
    title+summary rarely trips it."""
    text = " ".join(x for x in (title, summary) if x)
    toks = tokenize(text)
    words = [toks.words[i] for i in range(len(toks))
             if toks.kinds[i] == ALNUM]
    wids = [hash64_lower_utf8(w) & _U64 for w in words]
    count = len(wids)
    ratio = count // MAX_VECTOR_TERMS if MAX_VECTOR_TERMS else 0
    mask = 0x00
    while ratio >= 4:
        mask = ((mask >> 1) | 0x80) & 0xFF
        ratio >>= 1
    while True:
        seen: set[int] = set()
        out: list[int] = []
        masked_out = 0
        for wid in wids:
            if ((wid >> (_NUMTERMIDBITS - 8)) & mask) != 0:
                masked_out += 1
                continue
            w32 = wid & 0xFFFFFFFF
            if w32 in seen:
                continue
            seen.add(w32)
            out.append(w32)
            if len(out) >= 3000:
                break
        # if the mask over-filtered, relax it and retry
        # (computeVector :4617-4623)
        if len(out) < MAX_VECTOR_TERMS and mask and masked_out:
            mask = (mask << 1) & 0xFF
            continue
        break
    out.sort()
    return out[:MAX_VECTOR_TERMS]


def percent_similar(v0: list[int], v1: list[int]) -> float:
    """computeSimilarity(vec0, vec1, NULL, NULL, NULL) for the deduped
    vectors summary_vector emits (XmlDoc.cpp:4693): every entry scores
    1, a match scores on both sides, so percent = 100 * 2|v0 ∩ v1| /
    (|v0| + |v1|) — the Dice coefficient. Empty-vs-anything is 0."""
    if not v0 or not v1:
        return 0.0
    inter = len(set(v0) & set(v1))
    total = len(v0) + len(v1)
    return 100.0 * (2 * inter) / total


def normalize_url_for_dedup(url: str) -> str:
    """The Msg40 URL normalize-and-compare key (Msg40.cpp:1592-1637):
    scheme stripped, one trailing slash stripped, and — when the url
    has a real path — a leading variant-like subdomain (en/fr/www/...)
    stripped so language mirrors collapse. Lower-cased; the reference
    hashes with hash64Lower, we return the lowered string itself (the
    caller keys a dict with it)."""
    u = url or ""
    # strip scheme
    p = u.find("://")
    rest = u[p + 3:] if p >= 0 else u
    # strip ONE trailing slash (the reference decrements ulen once)
    if rest.endswith("/"):
        rest = rest[:-1]
    slash = rest.find("/")
    if slash >= 0:
        host, path = rest[:slash], rest[slash:]
    else:
        host, path = rest, ""
    labels = host.split(".")
    # u.getPathLen() > 1: a path beyond the bare "/" must exist, and a
    # subdomain must exist for mdom > host (>= 3 labels)
    if len(path) > 1 and len(labels) >= 3 and \
            labels[0].lower() in VARIANT_SUBDOMAINS:
        host = ".".join(labels[1:])
    return (host + path).lower()
