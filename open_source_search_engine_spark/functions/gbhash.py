"""Gigablast-compatible hash family (positional Zobrist over ``g_hashtab``).

The reference engine hashes every word/term/url with XORs into a constant
256x256 table of 64-bit values, ``g_hashtab`` (reference ``g_hashtab.inc:1``,
declared ``hash.h:19``). The table was generated once with glibc
``srand(1945687)`` + ``rand()`` (generator code preserved in
``hash.cpp:33-75``). We do NOT copy the 512 KB constant: we regenerate it
bit-identically by reimplementing glibc's TYPE_3 additive-feedback PRNG,
then verify the pinned first cell ``g_hashtab[0][0] ==
6720717044602784129`` (the same self-check the reference uses,
``hash.cpp:70``).

Ported functions (semantics, not code):
- ``hash64`` / ``hash64b``   — byte-wise Zobrist (``hash.h:46-65``)
- ``hash64_combine``         — hash64(h1,h2) 2-key combiner (``hash.h:86-110``)
- ``hash64_lower_utf8``      — case-folded, UTF-8-aware (``hash.h:118-182``)
- ``hash64_lower_utf8_nospaces`` (``hash.h:184``), used for field prefixes
  (``XmlDoc_Indexing.cpp:1849-1860``)
- ``hash64_lower_utf8_cont`` — continuation hashing used for bigrams
  (``hash.h`` hash64Lower_utf8_cont, ``Phrases.cpp:200``)
- ``hash8``                  — domain hash for docIds (``hash.cpp:78-87``)

TermIds are the low 48 bits (``termid_mask.h:4``); collisions above 48 bits
are by design in the reference and preserved here (SURVEY.md §7).
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

_GLIBC_SEED = 1945687  # reference hash.cpp:42
_RAND_HALF = 0x7FFFFFFF // 2  # reference hash.cpp:55,60

TERMID_MASK = 0x0000FFFFFFFFFFFF  # termid_mask.h:4
DOCID_MASK = 0x0000003FFFFFFFFF  # Titledb.h:10


def _glibc_rand(seed: int, n: int) -> np.ndarray:
    """glibc TYPE_3 random(): r[i] = r[i-31] + r[i-3] (mod 2^32), out >> 1."""
    total = 344 + n
    r = np.empty(total, dtype=np.uint64)
    x = seed
    r[0] = x
    for i in range(1, 31):
        # Lehmer step 16807*x mod (2^31-1); python ints avoid the
        # signed-overflow dance in glibc's source.
        x = (16807 * x) % 2147483647
        r[i] = x
    r[31:34] = r[0:3]
    rv = r  # additive feedback, vectorization is awkward (serial dep)
    buf = rv.tolist()
    mask = 0xFFFFFFFF
    for i in range(34, total):
        buf[i] = (buf[i - 31] + buf[i - 3]) & mask
    out = np.array(buf[344:], dtype=np.uint64)
    return out >> np.uint64(1)


def _build_hashtab() -> np.ndarray:
    """Regenerate g_hashtab exactly (reference hash.cpp:33-75)."""
    r = _glibc_rand(_GLIBC_SEED, 256 * 256 * 4).reshape(-1, 4)
    hi = r[:, 0].copy()
    hi[r[:, 1] > _RAND_HALF] |= np.uint64(0x80000000)
    lo = r[:, 2].copy()
    lo[r[:, 3] > _RAND_HALF] |= np.uint64(0x80000000)
    tab = (hi << np.uint64(32)) | lo
    tab = tab.reshape(256, 256)
    if int(tab[0, 0]) != 6720717044602784129:
        raise RuntimeError("g_hashtab regeneration failed self-check")
    return tab


HASHTAB: np.ndarray = _build_hashtab()
# flattened python list: scalar indexing on a list is ~3x faster than numpy
_TAB = HASHTAB.ravel().tolist()

_U64 = (1 << 64) - 1


def hash64(data: bytes, start_hash: int = 0) -> int:
    """Byte hash, position-indexed (hash.h:56-65). Index wraps mod 256."""
    h = start_hash
    t = _TAB
    for i, b in enumerate(data):
        h ^= t[((i & 0xFF) << 8) | b]
    return h


def hash64b(s: str, start_hash: int = 0) -> int:
    """hash64b: NUL-terminated byte hash of the raw string (hash.h:46-54)."""
    return hash64(s.encode("utf-8"), start_hash)


def hash64_combine(h1: int, h2: int) -> int:
    """hash64(h1,h2): hash the 16 little-endian bytes (hash.h:86-110).

    Used for fielded termIds: hash64(wordId, prefixHash)
    (XmlDoc_Indexing.cpp:1943).
    """
    t = _TAB
    h = 0
    for i in range(8):
        h ^= t[(i << 8) | ((h1 >> (8 * i)) & 0xFF)]
    for i in range(8):
        h ^= t[((i + 8) << 8) | ((h2 >> (8 * i)) & 0xFF)]
    return h


def hash64_combine_vec(h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
    """Vectorized hash64_combine over uint64 arrays (same table walk as the
    scalar version; the accumulator never feeds back into the byte indices
    within one combine, so the 16 gathers vectorize cleanly). Used by the
    frag-vec shingle hashing (XmlDoc.cpp:20574) where the scalar call was
    the hottest single function of the per-doc parse."""
    h = np.zeros(len(h1), dtype=np.uint64)
    tab = HASHTAB.ravel()
    mask = np.uint64(0xFF)
    for i in range(8):
        idx = ((h1 >> np.uint64(8 * i)) & mask) | np.uint64(i << 8)
        h ^= tab[idx]
    for i in range(8):
        idx = ((h2 >> np.uint64(8 * i)) & mask) | np.uint64((i + 8) << 8)
        h ^= tab[idx]
    return h


def _lower_char_utf8(ch: str) -> bytes:
    """Per-codepoint lowercase, UTF-8 encoded (hash.h ucToLower path).

    The reference lowers one codepoint to one codepoint (ucToLower); if
    Python's lowercase expands (e.g. 'İ' -> 'i̇') we keep the original
    char, matching the reference's identity fallback for unmappable chars.
    """
    lo = ch.lower()
    if len(lo) != 1:
        return ch.encode("utf-8")
    enc = lo.encode("utf-8")
    if len(enc) > 4:
        return ch.encode("utf-8")
    return enc


@lru_cache(maxsize=1 << 20)
def hash64_lower_utf8(s: str, start_hash: int = 0) -> int:
    """hash64Lower_utf8 (hash.h:118-182): the wordId hash.

    ASCII chars are lowered with to_lower_a; non-ASCII per codepoint via
    Unicode lowercase, re-encoded UTF-8, hashed byte-wise. The byte index
    counter is uint8 (wraps at 256), matching the reference.
    """
    h = start_hash
    t = _TAB
    i = 0
    for ch in s:
        o = ord(ch)
        if o < 128:
            if 65 <= o <= 90:
                o += 32
            h ^= t[((i & 0xFF) << 8) | o]
            i += 1
            continue
        for b in _lower_char_utf8(ch):
            h ^= t[((i & 0xFF) << 8) | b]
            i += 1
    return h


def hash64_lower_utf8_cont(s: str, start_hash: int, conti: int) -> tuple[int, int]:
    """hash64Lower_utf8_cont: continue positional hashing at index `conti`.

    Used by the bigram ("phrase") hash, Phrases.cpp:200. Returns
    (hash, new_conti). Index counter is uint8 in the reference.
    """
    h = start_hash
    t = _TAB
    i = conti
    for ch in s:
        o = ord(ch)
        if o < 128:
            if 65 <= o <= 90:
                o += 32
            h ^= t[((i & 0xFF) << 8) | o]
            i += 1
            continue
        for b in _lower_char_utf8(ch):
            h ^= t[((i & 0xFF) << 8) | b]
            i += 1
    return h, i


def hash64_lower_utf8_nospaces(s: str) -> int:
    """hash64Lower_utf8_nospaces (hash.h:184): skips ASCII whitespace;
    the table index counts only hashed bytes. Used for field-prefix hashes
    (XmlDoc_Indexing.cpp:1849-1860)."""
    h = 0
    t = _TAB
    i = 0
    for ch in s:
        o = ord(ch)
        if o < 128:
            if ch in " \t\n\r\v\f":
                continue
            if 65 <= o <= 90:
                o += 32
            h ^= t[((i & 0xFF) << 8) | o]
            i += 1
            continue
        for b in _lower_char_utf8(ch):
            h ^= t[((i & 0xFF) << 8) | b]
            i += 1
    return h


def hash8(data: bytes) -> int:
    """hash8 (hash.cpp:78-87): XOR of low bytes of table cells."""
    h = 0
    t = _TAB
    for i, b in enumerate(data):
        h ^= t[((i & 0xFF) << 8) | b] & 0xFF
    return h


def term_id(word: str) -> int:
    """48-bit termId of a body word: hash64Lower_utf8 & TERMID_MASK."""
    return hash64_lower_utf8(word) & TERMID_MASK


def prefix_hash(prefix: str) -> int:
    """Field prefix hash: hash64Lower_utf8_nospaces(prefix)
    (XmlDoc_Indexing.cpp:1849-1860)."""
    return hash64_lower_utf8_nospaces(prefix)


def fielded_term_id(word_id: int, pfx_hash: int) -> int:
    """Fielded termId = hash64(wordId, prefixHash) & mask
    (XmlDoc_Indexing.cpp:1943, hash.h:87-110)."""
    return hash64_combine(word_id & _U64, pfx_hash & _U64) & TERMID_MASK


def probable_doc_id(url: str) -> int:
    """38-bit docId from url (Titledb.h:53-80): hash64b(url) & DOCID_MASK,
    bits 6..13 replaced by hash8(domain) so same-domain docs cluster."""
    d = hash64b(url) & DOCID_MASK
    d &= 0xFFFFFFFFFFFFC03F
    dom = _domain_of(url)
    d |= hash8(dom.encode("utf-8")) << 6
    return d


def _domain_of(url: str) -> str:
    """Registrable domain approximation of Url::getDomain: host minus the
    first label when the host has >2 labels (reference Url.cpp uses a TLD
    table; our synthetic corpus uses single-TLD hosts where this agrees)."""
    host = url.split("://", 1)[-1].split("/", 1)[0].split(":", 1)[0]
    labels = host.split(".")
    if len(labels) <= 2:
        return host
    return ".".join(labels[-2:])


def hash_words_batch(words: "list[str]") -> np.ndarray:
    """Vectorized-ish wordId hashing for a batch: dedup via dict, hash each
    unique word once (corpora repeat tokens heavily), return int64 array
    (two's-complement of the uint64 hash) suitable for Spark LongType."""
    cache: dict[str, int] = {}
    out = np.empty(len(words), dtype=np.uint64)
    for idx, w in enumerate(words):
        v = cache.get(w)
        if v is None:
            v = hash64_lower_utf8(w)
            cache[w] = v
        out[idx] = v
    return out.view(np.int64)
