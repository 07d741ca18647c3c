"""Wiki-phrase detection for query compilation (Wiki.cpp analog).

The reference loads a Wikipedia-title dictionary and, at query time,
gives consecutive query words that form a known title a shared
``wikiPhraseId`` with their in-phrase distances preserved
(``PosdbTable.cpp:799-830``; weights ``WIKI_WEIGHT`` 0.10 /
``WIKI_BIGRAM_WEIGHT`` 1.40, ``PosdbTable.h:14,21`` — consumed by the
reference scorer's pair weighting).

We ship a tiny deterministic built-in sample; deployments load the full
title set via ``load_wiki_titles`` (same pluggable pattern as
``synonyms.py``). Detection is greedy longest-match over the query's
word sequence, mirroring the reference's scan.
"""

from __future__ import annotations

from .gbhash import TERMID_MASK, hash64_lower_utf8

_BUILTIN_TITLES = {
    "new york", "new york city", "world war ii", "machine learning",
    "hypertext markup language", "united states", "united kingdom",
    "search engine", "open source",
}

_titles: set[str] = set(_BUILTIN_TITLES)
_max_len = max(len(t.split()) for t in _BUILTIN_TITLES)


def load_wiki_titles(titles: set[str], *, replace: bool = False) -> None:
    global _titles, _max_len
    _titles = set(t.lower() for t in titles) if replace else \
        _titles | {t.lower() for t in titles}
    _max_len = max((len(t.split()) for t in _titles), default=1)


def wiki_phrase_id(phrase: str) -> int:
    return hash64_lower_utf8(phrase) & TERMID_MASK


def detect_wiki_spans(words: list[str]) -> list[tuple[int, int, int]]:
    """Greedy longest-match scan: returns (start, end_exclusive,
    wiki_phrase_id) spans over the lowercased word list."""
    wl = [w.lower() for w in words]
    out: list[tuple[int, int, int]] = []
    i = 0
    n = len(wl)
    while i < n:
        matched = 0
        for ln in range(min(_max_len, n - i), 1, -1):
            phrase = " ".join(wl[i:i + ln])
            if phrase in _titles:
                out.append((i, i + ln, wiki_phrase_id(phrase)))
                matched = ln
                break
        i += matched or 1
    return out
