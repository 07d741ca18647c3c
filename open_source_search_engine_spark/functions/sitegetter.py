"""Path-aware site definition — the ``SiteGetter`` port (VERDICT r4
item 8; ``SiteGetter.cpp:449-594 setRecognizedSite``): on shared hosts
a "site" is not the hostname but a path subtree — ``~user`` home dirs
and ``/users/<name>/``-style prefixes each define their own site, so
``site:`` queries, site clustering, siteNumInlinks aggregation and the
tagdb rollup treat ``xyz.com/~fred/`` and ``xyz.com/~jane/`` as
DIFFERENT sites.

Recognized shapes, verbatim from the reference:

- path-prefix usernames (``:481-489``): ``/~``, ``/users/``,
  ``/user/``, ``/members/``, ``/membres/``, ``/member/``,
  ``/membre/``, ``/member.php?u=`` — the username runs to the next
  ``/`` or ``?`` and must contain at least one alnum char
  (``:502-512``; "sometimes usernames are numbers!!!" —
  stackoverflow.com/users/271376/sigterm); the stored site ends on
  ``/`` unless it already ends on ``/`` or ``=`` (``:530-537``).
- popular homesteads (``:545-556``): hosts containing ``vimeo.com``,
  ``www.myspace.com``, ``twitter.com``, ``www.facebook.com``,
  ``xoomer.alice.it``, ``plus.google.com`` take the first path
  segment as the site (depth 1).

Everything else falls back to the hostname (``setSite``, ``:403``).
Two scope notes: the reference's ``www.`` prefix for subdomain-less
hosts is a url-normalization concern we leave upstream (our site ids
key on the literal lowered host — folding would re-key every existing
index), and the tagdb ``sitepathdepth`` VOTING path (``:221-398``,
subsite discovery from crawl history) is the adaptive complement of
these hardcoded rules — n/a without spider state, documented in
SURVEY §7.

Build integration: ``get_site(url)`` feeds ``site_id``/``site_rank``
and an ADDITIONAL ``site:`` probe term when the path-site differs from
the host — host-level ``site:`` queries keep matching everything on
the host (superset of the reference, where a path-site page answers
only its path-site term), while ``site:xyz.com/~fred/`` selects the
home dir alone.
"""

from __future__ import annotations

_PREFIXES = ("/~", "/users/", "/user/", "/members/", "/membres/",
             "/member/", "/membre/", "/member.php?u=")
_HOMESTEADS = ("vimeo.com", "www.myspace.com", "twitter.com",
               "www.facebook.com", "xoomer.alice.it", "plus.google.com")


def _split(url: str) -> tuple[str, str] | None:
    """(host, path-with-query) from a normalized url; None if no
    scheme/path structure (SiteGetter:454-469 manual scan)."""
    i = url.find("://")
    if i < 0:
        return None
    rest = url[i + 3:]
    j = rest.find("/")
    if j < 0:
        return None
    return rest[:j], rest[j:]


def recognized_site(url: str) -> str | None:
    """setRecognizedSite: the path-defined site of ``url`` (lowered,
    host + path prefix, trailing ``/`` per the reference), or None
    when no hardcoded shape applies."""
    parts = _split(url)
    if parts is None:
        return None
    host, path = parts
    lp = path.lower()
    plen = 0
    for pre in _PREFIXES:
        if lp.startswith(pre):
            plen = len(pre)
            # the reference applies the checks in order with plain
            # assignment, so the LAST matching prefix wins; the list
            # is prefix-free in practice (only /~ vs /member.php?u=
            # could overlap with nothing)
    if plen:
        p = plen
        username = False
        # scan to the next '/' or '?' (":502-512")
        while p < len(path) and path[p] not in "/?":
            if path[p].isalnum():
                username = True
            p += 1
        if username:
            site = (host + path[:p]).lower()
            if not site.endswith(("/", "=")):
                site += "/"
            return site
        return None
    if not any(h in host.lower() for h in _HOMESTEADS):
        return None
    # homestead depth is 1 for every hardcoded host: the site is the
    # first path segment. Root path -> the host alone (":567-581");
    # otherwise host + segment, '/'-terminated whether or not the url
    # carried the trailing slash (":583-594" exhausts the loop and
    # still jumps to storeIt)
    if len(path) <= 1:
        return host.lower()
    p = 1
    while p < len(path) and path[p] != "/":
        p += 1
    site = (host + path[:p]).lower()
    if not site.endswith(("/", "=")):
        site += "/"
    return site


def get_site(url: str) -> str:
    """The document's site string: the recognized path-site, else the
    lowered host (SiteGetter::getSite fall-through to setSite)."""
    rec = recognized_site(url)
    if rec is not None:
        return rec
    parts = _split(url)
    if parts is not None:
        return parts[0].lower()
    return url.split("://", 1)[-1].split("/", 1)[0].lower()
