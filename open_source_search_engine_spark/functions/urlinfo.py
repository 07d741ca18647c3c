"""URL-derived doc attributes: country, permalink-format flag, host IP.

Feeds the gbcountry:/gbpermalink:/ip: fielded terms
(XmlDoc_Indexing.cpp:1618 hashCountry, :1642 hashPermalink, :395-420
hashUrl ip: block; query fields Query.h:36,75 and Query.cpp:3117
getFieldCode).
"""

from __future__ import annotations

import re

# ccTLD -> country abbreviation (public ISO-3166 ccTLD assignments; the
# reference's CountryCode.cpp getCountryFromDNS does the same TLD map,
# with generic TLDs defaulting to US)
_GENERIC_TLDS = frozenset(
    {"com", "org", "net", "edu", "gov", "mil", "int", "info", "biz",
     "name", "io", "co", "me", "tv", "app", "dev", "xyz", "site",
     "online", "example", "test", "local", "invalid", "localhost"})

_CC_SPECIAL = {"uk": "gb"}  # .uk -> ISO gb (CountryCode.cpp gbAbbr table)


def country_of_url(url: str) -> str:
    """Country abbreviation from the url's TLD (getCountryId /
    CountryCode.cpp getCountryFromDNS semantics: 2-letter ccTLD wins,
    generic TLDs -> 'us')."""
    host = url.split("://", 1)[-1].split("/", 1)[0].split(":", 1)[0]
    tld = host.rsplit(".", 1)[-1].lower()
    if len(tld) == 2 and tld.isalpha() and tld not in _GENERIC_TLDS:
        return _CC_SPECIAL.get(tld, tld)
    return "us"


_DIGIT_RUN = re.compile(r"[0-9]{3}")
_P_CGI = re.compile(r"(?:^|[?&])p=[0-9]")
_M_CGI = re.compile(r"(?:^|[?&])m=([0-9]+)")


def is_permalink_url(url: str) -> bool:
    """URL-format permalink guess: the link-graph-free core of
    ::isPermalink (Msg25.cpp:4546-4700): not a root page; needs a run of
    3+ digits in path+query, OR 2+ hyphens/underscores within a single
    path component, OR a ?p=<digit> cgi; the ?m=<yyyymm> calendar cgi is
    never a permalink. The reference's Links-based refinements (self
    permalink anchor, subdir outlink vetoes) need the crawl link graph
    and are out of scope (SURVEY.md non-goals)."""
    rest = url.split("://", 1)[-1]
    path_q = "/" + rest.split("/", 1)[1] if "/" in rest else "/"
    path, _, query = path_q.partition("?")
    # Url::isRoot (Url.cpp:1362): path "/" AND no query
    if path in ("", "/") and not query:
        return False
    m = _M_CGI.search("?" + query)
    if m:
        try:
            n = int(m.group(1)[:6])
            if 199000 < n < 205000:
                return False
        except ValueError:
            pass
    if _P_CGI.search("?" + query):
        return True
    if _DIGIT_RUN.search(path + "?" + query):
        return True
    for seg in path.split("/"):
        if seg.count("-") + seg.count("_") >= 2:
            return True
    return False


def synth_ip(host: str) -> str:
    """Deterministic stand-in IP for a host when the input table has no
    crawl-time ip column (the reference records the resolved IP at fetch
    time, XmlDoc.cpp m_ip; our input_hint table carries none). Marked
    synthetic: real deployments should provide an `ip` column."""
    from .gbhash import hash64_lower_utf8

    h = hash64_lower_utf8(host)
    return (f"10.{(h >> 16) & 0xFF}.{(h >> 8) & 0xFF}.{h & 0xFF}")
