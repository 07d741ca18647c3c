"""Gigablast-compatible tokenizer ("Words"), bigrams ("Phrases") and the
word-position / density vectors.

Ports the *semantics* of:
- ``Words::addWords`` (``Words.cpp:218-440``): alnum runs with the C++/C#/
  number-comma/decimal/apostrophe exceptions, punct runs, tags-as-words,
  UTF-8 script-change splits, wordId = hash64Lower_utf8.
- ``Phrases::setPhrase`` (``Phrases.cpp:109-263``): two-word bigram ids via
  continuation hashing (``hash64Lower_utf8_cont``), skip-hyphen rule
  ("e-mail" -> "email"), stopword-second-word xor ``0x768867``
  (``Phrases.cpp:253-262``; the final value of ``hasStopWord2`` is the
  stopness of the *second* word, ``Phrases.cpp:154,209``).
- ``Bits`` phrase bits (``Bits.cpp:74-106,164-172``): alnum words can be in
  a phrase; only stopword alnum words and punct words can be paired across;
  breaking tags cannot; at most one ``<br>``.
- ``getWordPosVec`` (``XmlDoc.cpp:20339-20426``): +1/word, +1 space-ish
  punct, +2 other punct, +1/tag, +SENT_UNITS(30)+capped tagDist at sentence
  change.
- ``getDensityRanks`` (``XmlDoc.cpp:20428-20493``).

Divergences (documented, pinned by golden fixtures in tests/):
- Unicode word-char / script classification approximates the reference's
  UCPropTable with Python unicodedata categories + codepoint ranges.
- Sentence segmentation approximates Sections.cpp: sentences end at
  [.!?] punct tokens or at breaking tags.
"""

from __future__ import annotations

import re
import unicodedata
from dataclasses import dataclass, field

from .gbhash import hash64_lower_utf8, hash64_lower_utf8_cont
from .stopwords import STOP_WORD_IDS

SENT_UNITS = 30  # XmlDoc.cpp:55
MAXDENSITYRANK = 0x1F  # Posdb.h:67
MAXDIVERSITYRANK = 0x0F  # Posdb.h:69
MAXWORDSPAMRANK = 0x0F  # Posdb.h:68
MAXFRAGWORDS = 80000  # XmlDoc.h:57

# token kinds
PUNCT = 0
ALNUM = 1
TAG = 2

# tag name -> isBreaking, transcribed from the reference tag table
# (XmlNode.cpp g_nodes[]; breaking column). Unlisted tags default to
# breaking=True, matching the generic xmlTag row.
NON_BREAKING_TAGS = frozenset(
    {
        "a", "b", "big", "blink", "em", "font", "i", "nobr", "small",
        "span", "strong", "sub", "sup", "u", "ul", "tt", "abbr",
        "textnode",
    }
)
# tags whose contents are invisible (isVisible=0 rows of the reference tag
# table; Sections.h:73 NOINDEXFLAGS, Xml.cpp:614 getText visibility stack)
INVISIBLE_TAGS = frozenset(
    {"script", "style", "select", "marquee", "noscript",
     "item", "entry", "channel", "enclosure", "weblog"}
)


def _is_breaking_tag(name: str) -> bool:
    return name not in NON_BREAKING_TAGS


@dataclass
class Tokens:
    """Parallel arrays, one entry per word (Words.cpp layout)."""

    kinds: list[int] = field(default_factory=list)
    words: list[str] = field(default_factory=list)
    wids: list[int] = field(default_factory=list)  # 0 for punct/tag
    tag_names: list[str] = field(default_factory=list)  # "" unless TAG
    tag_closing: list[bool] = field(default_factory=list)

    def append(self, kind: int, word: str, wid: int, tag: str = "", closing: bool = False) -> None:
        self.kinds.append(kind)
        self.words.append(word)
        self.wids.append(wid)
        self.tag_names.append(tag)
        self.tag_closing.append(closing)

    def __len__(self) -> int:
        return len(self.words)


_IDEO_RANGES = (
    (0x2E80, 0x9FFF),  # CJK radicals..unified ideographs
    (0xF900, 0xFAFF),  # CJK compat ideographs
    (0x3040, 0x309F),  # hiragana
    (0x0E00, 0x0E7F),  # thai
    (0x20000, 0x3FFFF),
)


def _is_ideograph(cp: int) -> bool:
    for a, b in _IDEO_RANGES:
        if a <= cp <= b:
            return True
    return False


def _script(cp: int) -> int:
    """Coarse script id; Latin folds to common (Words.cpp:349-352)."""
    if cp < 0x370:
        return 0  # latin/common
    if cp < 0x400:
        return 1  # greek
    if cp < 0x530:
        return 2  # cyrillic
    if 0x590 <= cp < 0x600:
        return 4  # hebrew
    if 0x600 <= cp < 0x700:
        return 3  # arabic
    if 0xAC00 <= cp <= 0xD7AF or 0x1100 <= cp <= 0x11FF:
        return 5  # hangul
    if 0x1E00 <= cp <= 0x1EFF or 0x2C60 <= cp <= 0x2C7F:
        return 0  # latin extended
    return 6


def _is_word_char(ch: str) -> bool:
    """UC_WORDCHAR approximation: letters and numbers."""
    o = ord(ch)
    if o < 128:
        return ch.isalnum()
    cat = unicodedata.category(ch)
    return cat[0] in ("L", "N")


def _is_extend(ch: str) -> bool:
    """UC_IGNORABLE|UC_EXTEND approximation: marks + format chars."""
    cat = unicodedata.category(ch)
    return cat in ("Mn", "Mc", "Me", "Cf")


def _is_ascii_alnum(ch: str) -> bool:
    return ("0" <= ch <= "9") or ("a" <= ch <= "z") or ("A" <= ch <= "Z")


def _is_alnum_start(s: str, i: int) -> bool:
    """is_alnum_utf8 at position i ('\\0' beyond end)."""
    if i >= len(s) or i < 0:
        return False
    ch = s[i]
    if ord(ch) < 128:
        return _is_ascii_alnum(ch)
    return _is_word_char(ch)


_ALNUM_RUN = re.compile(r"[0-9A-Za-z]+")
_PUNCT_RUN_TAGS = re.compile(r"[^0-9A-Za-z<]+")
_PUNCT_RUN = re.compile(r"[^0-9A-Za-z]+")


def _tokenize_ascii(s: str, has_tags: bool, compute_ids: bool):
    """Regex-run fast path of ``tokenize`` for pure-ASCII input — the
    per-char scan is the parse stage's hottest python loop, and for
    ASCII the script/ideograph/extend machinery is inert (old_script
    stays 0), so maximal [0-9A-Za-z]+ runs ARE the char loop's spans.
    The boundary rules (c++/c#, comma groups, decimals, apostrophe
    merge) run per RUN, not per char, in the slow path's exact order
    and guard conditions. Returns None (caller falls back to the char
    loop) on a stray non-tag '<' under has_tags — the one shape whose
    slow-path semantics aren't worth replicating here. Differentially
    tested against the char loop (tests/test_tokenizer.py)."""
    t = Tokens()
    n = len(s)
    i = 0
    punct_re = _PUNCT_RUN_TAGS if has_tags else _PUNCT_RUN

    def ch(k: int) -> str:
        return s[k] if 0 <= k < n else "\0"

    def alnum_at(k: int) -> bool:
        return 0 <= k < n and _is_ascii_alnum(s[k])

    while i < n:
        if has_tags and s[i] == "<":
            if not _is_tag_start(s, i):
                return None
            end = s.find(">", i + 1)
            end = n if end < 0 else end + 1
            raw = s[i:end]
            t.append(TAG, raw, 0, _tag_name(raw), raw.startswith("</"))
            i = end
            continue
        m = punct_re.match(s, i)
        if m is not None:
            t.append(PUNCT, m.group(0), 0)
            i = m.end()
            continue
        # alnum word (same rule order as the char loop)
        j = i
        had_apostrophe = False
        while True:
            mr = _ALNUM_RUN.match(s, i)
            if mr is not None:
                i = mr.end()
            if ch(i) == "+":
                if ch(i + 1) == "+" and not alnum_at(i + 2):
                    i += 2
                elif not alnum_at(i + 1):
                    i += 1
            if ch(i) == "#" and not alnum_at(i + 1):
                i += 1
            if ch(i) == "," and i - j <= 3 and ch(i - 1).isdigit():
                ok = True
                if i - j >= 2 and not ch(i - 2).isdigit():
                    ok = False
                if ok and i - j >= 3 and not ch(i - 3).isdigit():
                    ok = False
                if ok:
                    while (
                        ch(i) == ","
                        and ch(i + 1).isdigit()
                        and ch(i + 2).isdigit()
                        and ch(i + 3).isdigit()
                        and not ch(i + 4).isdigit()
                    ):
                        i += 4
            if ch(i) == "." and ch(i - 1).isdigit() and ch(i + 1).isdigit():
                i += 1
                while ch(i).isdigit():
                    i += 1
            if ch(i) == "'" and alnum_at(i + 1) and not had_apostrophe:
                i += 1
                had_apostrophe = True
                continue
            break
        word = s[j:i]
        wid = hash64_lower_utf8(word) if compute_ids else 1
        t.append(ALNUM, word, wid)
    return t


def tokenize(s: str, has_tags: bool = False, compute_ids: bool = True) -> Tokens:
    """Words::set / addWords port. Returns the full word stream including
    punct "words" (wid 0) and, when ``has_tags``, tag words."""
    if s.isascii():
        fast = _tokenize_ascii(s, has_tags, compute_ids)
        if fast is not None:
            return fast
    t = Tokens()
    n = len(s)
    i = 0
    old_script = 0  # ucScriptCommon; persists across tokens as in the C++

    def ch(k: int) -> str:
        return s[k] if 0 <= k < n else "\0"

    while i < n:
        if not _is_alnum_start(s, i):
            # tag word? (Words.cpp:243-270)
            if has_tags and s[i] == "<" and _is_tag_start(s, i):
                end = s.find(">", i + 1)
                end = n if end < 0 else end + 1
                raw = s[i:end]
                closing = raw.startswith("</")
                name = _tag_name(raw)
                t.append(TAG, raw, 0, name, closing)
                i = end
                continue
            # punct word: accumulate non-alnum chars (Words.cpp:272-315)
            start = i
            while i < n:
                c = s[i]
                if has_tags and c == "<":
                    break
                if ord(c) < 128:
                    if not _is_ascii_alnum(c):
                        i += 1
                        continue
                    old_script = 0
                    break
                if not _is_word_char(c):
                    i += 1
                    continue
                old_script = _script(ord(c))
                break
            t.append(PUNCT, s[start:i], 0)
            continue

        # alnum word (Words.cpp:319-447)
        j = i
        had_apostrophe = False
        while True:
            while i < n:
                c = s[i]
                o = ord(c)
                if o < 128:
                    if _is_ascii_alnum(c):
                        i += 1
                        continue
                    old_script = 0
                    break
                if _is_extend(c):
                    i += 1
                    continue
                if not _is_word_char(c):
                    old_script = 0
                    break
                saved = old_script
                sc = _script(o)
                old_script = 0 if sc == 0 else sc
                if _is_ideograph(o):
                    i += 1  # include it, then stop
                    break
                if saved != old_script:
                    break
                i += 1
            # java++/C++ , A+/C+ exception (Words.cpp:361-367)
            if ch(i) == "+":
                if ch(i + 1) == "+" and not _is_alnum_start(s, i + 2):
                    i += 2
                elif not _is_alnum_start(s, i + 1):
                    i += 1
            # c#, j# (Words.cpp:369-370)
            if ch(i) == "#" and not _is_alnum_start(s, i + 1):
                i += 1
            # comma groups: 1,000,000 (Words.cpp:372-387)
            if ch(i) == "," and i - j <= 3 and ch(i - 1).isdigit():
                ok = True
                if i - j >= 2 and not ch(i - 2).isdigit():
                    ok = False
                if ok and i - j >= 3 and not ch(i - 3).isdigit():
                    ok = False
                if ok:
                    while (
                        ch(i) == ","
                        and ch(i + 1).isdigit()
                        and ch(i + 2).isdigit()
                        and ch(i + 3).isdigit()
                        and not ch(i + 4).isdigit()
                    ):
                        i += 4
            # decimal point: 3.14 (Words.cpp:389-397)
            if ch(i) == "." and ch(i - 1).isdigit() and ch(i + 1).isdigit():
                i += 1
                while ch(i).isdigit():
                    i += 1
            # apostrophe: we're, dave's (Words.cpp:401-408)
            if ch(i) == "'" and _is_alnum_start(s, i + 1) and not had_apostrophe:
                i += 1
                had_apostrophe = True
                continue
            break
        word = s[j:i]
        wid = hash64_lower_utf8(word) if compute_ids else 1
        t.append(ALNUM, word, wid)
    return t


def _is_tag_start(s: str, i: int) -> bool:
    """isTagStart: '<' followed by alpha, '/', '!' or '?'."""
    if i + 1 >= len(s):
        return False
    c = s[i + 1]
    return c.isalpha() or c in "/!?"


def _tag_name(raw: str) -> str:
    body = raw[1:].lstrip("/")
    out = []
    for c in body:
        if c.isalnum() or c in ":-_!":
            out.append(c)
        else:
            break
    return "".join(out).lower()


# ---------------------------------------------------------------------------
# Bits (phrase pairing rules) — Bits.cpp:74-106
# ---------------------------------------------------------------------------

CAN_BE_IN_PHRASE = 0x01  # Bits.h:16
CAN_PAIR_ACROSS = 0x20  # Bits.h:27
IS_STOPWORD = 0x02


def phrase_bits(t: Tokens) -> list[int]:
    bits = []
    brcount = 0
    for k in range(len(t)):
        kind = t.kinds[k]
        if kind == TAG:
            name = t.tag_names[k]
            if _is_breaking_tag(name):
                if name == "br":
                    if brcount > 0:
                        b = 0
                    else:
                        brcount += 1
                        b = CAN_PAIR_ACROSS
                else:
                    b = 0
            else:
                b = CAN_PAIR_ACROSS
        elif kind == ALNUM:
            if t.wids[k] in STOP_WORD_IDS:
                b = CAN_BE_IN_PHRASE | CAN_PAIR_ACROSS | IS_STOPWORD
            else:
                b = CAN_BE_IN_PHRASE
            brcount = 0
        else:
            b = CAN_PAIR_ACROSS
        bits.append(b)
    return bits


def phrase_ids(t: Tokens, bits: list[int] | None = None) -> list[int]:
    """Phrases::setPhrase for every word; 0 when no 2-word phrase."""
    if bits is None:
        bits = phrase_bits(t)
    nw = len(t)
    out = [0] * nw
    for i in range(nw):
        if t.kinds[i] != ALNUM or not (bits[i] & CAN_BE_IN_PHRASE):
            continue
        h = t.wids[i]
        pos = len(t.words[i].encode("utf-8")) & 0xFF  # uint8 pos cursor
        has_hyphen = False
        has_stop2 = bool(bits[i] & IS_STOPWORD)
        is_num = t.words[i][0].isdigit()
        n_in_phrase = 1
        h2 = 0
        for j in range(i + 1, nw):
            if j > i + 32:
                n_in_phrase = 1  # nophrase
                break
            if t.wids[j] == 0:
                if not (bits[j] & CAN_PAIR_ACROSS):
                    break
                if j == i + 1 and t.kinds[j] == PUNCT and "-" in t.words[j]:
                    has_hyphen = True
                continue
            if bits[j] & CAN_BE_IN_PHRASE:
                h, pos = hash64_lower_utf8_cont(t.words[j], h, pos)
                n_in_phrase += 1
                if n_in_phrase == 2:
                    h2 = h
                    has_stop2 = bool(bits[j] & IS_STOPWORD)
                    break
            if not (bits[j] & CAN_PAIR_ACROSS):
                break
        if n_in_phrase < 2:
            continue
        if is_num:
            has_hyphen = False
        out[i] = h2 if (has_hyphen or not has_stop2) else (h2 ^ 0x768867)
    return out


# ---------------------------------------------------------------------------
# word positions, sentences, density — XmlDoc.cpp:20339-20493
# ---------------------------------------------------------------------------


def _is_spaces(w: str, start: int = 0) -> bool:
    return all(c.isspace() for c in w[start:]) and len(w) > start


def sentence_ids(t: Tokens) -> list[int]:
    """Approximate Sections sentence segmentation: a new sentence starts
    after a punct token containing [.!?] or after a breaking tag."""
    sid = 0
    out = [0] * len(t)
    pending_break = False
    for k in range(len(t)):
        kind = t.kinds[k]
        if kind == ALNUM:
            if pending_break:
                sid += 1
                pending_break = False
            out[k] = sid
            continue
        out[k] = sid
        if kind == TAG:
            if _is_breaking_tag(t.tag_names[k]):
                pending_break = True
        else:
            w = t.words[k]
            if any(c in ".!?" for c in w):
                pending_break = True
    return out


def word_pos_vec(t: Tokens, start_dist: int = 0, frag_vec: list[int] | None = None,
                 sent_ids: list[int] | None = None) -> list[int]:
    """getWordPosVec port (XmlDoc.cpp:20339-20426)."""
    if sent_ids is None:
        sent_ids = sentence_ids(t)
    dist = start_dist
    tag_dist = 0
    last_sent = None
    out = [0] * len(t)
    for k in range(len(t)):
        out[k] = dist
        kind = t.kinds[k]
        if kind == TAG:
            if _is_breaking_tag(t.tag_names[k]):
                tag_dist += SENT_UNITS
            dist += 1
            continue
        if t.wids[k] == 0:
            w = t.words[k]
            if _is_spaces(w):
                dist += 1
            elif w[0] == "-" and len(w) == 1:
                dist += 1
            elif w[0] == "." and _is_spaces(w, 1):
                dist += 1
            else:
                dist += 2
            continue
        if frag_vec is not None and k < MAXFRAGWORDS and frag_vec[k] == 0:
            dist += 1
            continue
        sx = sent_ids[k]
        if last_sent is None or sx != last_sent:
            dist += SENT_UNITS
            if tag_dist > 120:
                tag_dist = 120
            dist += tag_dist
            last_sent = sx
            out[k] = dist
        tag_dist = 0
        dist += 1
    return out


def density_ranks(t: Tokens, hash_group: int, sent_ids: list[int] | None = None,
                  use_sections: bool = True) -> list[int]:
    """getDensityRanks port (XmlDoc.cpp:20428-20493). For body/heading the
    rank is per sentence; otherwise per whole string."""
    nw = len(t)
    out = [0] * nw
    from .posdb import HASHGROUP_BODY, HASHGROUP_HEADING  # local: avoid cycle

    if use_sections and hash_group in (HASHGROUP_BODY, HASHGROUP_HEADING):
        if sent_ids is None:
            sent_ids = sentence_ids(t)
        # count alnum words per sentence
        counts: dict[int, int] = {}
        for k in range(nw):
            if t.wids[k]:
                counts[sent_ids[k]] = counts.get(sent_ids[k], 0) + 1
        for k in range(nw):
            c = counts.get(sent_ids[k], 0) - 1
            if c < 0:
                continue
            dr = MAXDENSITYRANK - c
            out[k] = max(dr, 1)
        return out
    na = sum(1 for k in range(nw) if t.wids[k]) - 1
    if na < 0:
        return out
    dr = max(MAXDENSITYRANK - na, 1)
    return [dr] * nw


def frag_vec(t: Tokens) -> list[int]:
    """Repeated-fragment filter (XmlDoc.cpp:20574-20790 getFragVec):
    5-word shingle ring; words inside a >=5-word repeated run get 0
    (not indexed); others 1."""
    nw = len(t)
    out = [1] * nw
    alnum_idx = [k for k in range(nw) if t.wids[k]]
    if len(alnum_idx) < 5:
        return out
    seen: dict[int, int] = {}
    from .gbhash import hash64_combine_vec

    import numpy as np

    wids = t.wids
    na = len(alnum_idx)
    aw = np.array([wids[k] & ((1 << 64) - 1) for k in alnum_idx],
                  dtype=np.uint64)
    # all shingles advance one chain step together (5 vectorized combines
    # instead of 5*(na-4) scalar ones)
    h_vec = np.zeros(na - 4, dtype=np.uint64)
    for b in range(5):
        h_vec = hash64_combine_vec(h_vec, aw[b:b + na - 4])
    shingle = h_vec.tolist()
    for a in range(na - 4):
        h = shingle[a]
        first = seen.get(h)
        if first is None:
            seen[h] = a
        else:
            # repeated 5-gram: demote all five words of this occurrence
            for b in range(5):
                out[alnum_idx[a + b]] = 0
    return out


def diversity_ranks(t: Tokens, pids: list[int] | None = None) -> list[int]:
    """Diversity vector (XmlDoc.cpp:20499-20572): rank in 0..15 from the
    doc-local word-vs-phrase occurrence ratio. Approximation of
    getWordToPhraseRatioWeights (table-driven in the reference): words
    that mostly occur inside the same repeated phrase get a low rank,
    words with diverse contexts get a high one; pinned by fixtures."""
    nw = len(t)
    if pids is None:
        pids = phrase_ids(t)
    wc: dict[int, int] = {}
    pc: dict[int, int] = {}
    for k in range(nw):
        if t.wids[k]:
            wc[t.wids[k]] = wc.get(t.wids[k], 0) + 1
        if pids[k]:
            pc[pids[k]] = pc.get(pids[k], 0) + 1
    out = [0] * nw
    for k in range(nw):
        if not t.wids[k]:
            continue
        w = wc.get(t.wids[k], 1)
        p = pc.get(pids[k], 0) if pids[k] else 0
        ratio = p / w if w else 0.0
        # ratio 1.0 (always in the same phrase) -> low diversity
        r = int(round((1.0 - 0.45 * ratio) * MAXDIVERSITYRANK / 0.55 * 0.55))
        out[k] = max(1, min(MAXDIVERSITYRANK, r))
    return out
