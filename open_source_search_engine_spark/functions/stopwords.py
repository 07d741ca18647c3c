"""English stopword list of the reference engine.

Word strings transcribed from ``StopWords.cpp:21-141`` (s_stopWords[]); the
reference builds a hash table keyed by ``hash64Lower_utf8(word)``
(``StopWords.cpp:147 initWordTable``) and tests membership by wordId
(``Bits.cpp getAlnumBits`` -> ``isStopWord``). We do the same: the set below
holds wordIds computed with our ported hash.

The odd multi-word entries ("Mainstream thru A1 Dance") exist verbatim in
the reference list; they are kept for table parity (they can never match a
single-token wordId, same as in the reference).
"""

from __future__ import annotations

from .gbhash import hash64_lower_utf8

STOP_WORD_STRINGS: tuple[str, ...] = (
    "a", "b", "c", "d", "e", "f", "g", "h", "i", "j", "k", "l", "m",
    "n", "o", "p", "q", "r", "s", "t", "u", "v", "w", "x", "y", "z",
    "0", "1", "2", "3", "4", "5", "6", "7", "8", "9",
    "an", "as", "at", "be", "by", "of", "on", "or", "do", "he", "if",
    "is", "it", "in", "me", "my", "re", "so", "to", "us", "vs", "we",
    "the", "and", "are", "can", "did", "per", "for", "get", "had",
    "has", "her", "him", "its", "may", "not", "our", "she", "you",
    "also", "been", "from", "have", "here", "hers", "mine", "ours",
    "that", "them", "then", "they", "this", "were", "will", "with",
    "your", "about", "above", "ain", "could", "isn", "their", "there",
    "these", "those", "through", "Mainstream thru A1 Dance", "thru",
    "Mainstream thru A1 Dance", "thru", "until", "under", "would",
    "yours", "theirs", "aren", "hadn", "didn", "hasn", "ll", "ve",
    "should", "shouldn",
)

STOP_WORD_IDS: frozenset[int] = frozenset(
    hash64_lower_utf8(w) for w in STOP_WORD_STRINGS
)


def is_stop_word_id(word_id: int) -> bool:
    """isStopWord by wordId (StopWords.cpp:160-180 table probe)."""
    return word_id in STOP_WORD_IDS
