"""Word-spam vector: per-word repetition-spam ranks.

Ports the semantics of ``XmlDoc::getWordSpamVec`` (``XmlDoc.cpp:19773-
20172``), ``XmlDoc::setSpam`` (``:20186-20270``) and
``XmlDoc::getProbSpam`` (``:20283-20336``), including the integer
arithmetic (×256 fixed-point deviations, truncating divisions) and the
reference's own quirks, all pinned by tests:

- profiles are built newest-first (the hash-bucket linked list prepends),
  so ``profile[0]`` is the word's LAST occurrence in the document;
- the ``plen > 50`` truncation marks everything but the first 50 profile
  entries (the document's LAST 50 occurrences) 100% spam, then — due to
  ``plen`` being reassigned before ``profile += plen - 50`` — keeps
  scanning those same last-50 entries (the "skip the first plen-50"
  comment never happens);
- ``getProbSpam``'s outer ``j`` loop re-runs an identical computation
  ``step`` times and divides by ``step`` (the inner loop ignores ``j``),
  and its gaps are consecutive-occurrence gaps regardless of ``step``;
- one occurrence is spared (``spam[profile[0]] = 0``) only when no
  occurrence was left clean — and ``profile[0]`` is the last occurrence;
- when >25% of distinct non-common candidate words are spammed, every
  word in the document is bumped to 99% spam ("now only set to 99 so
  each singleton usually gets hashed").

Rank = (MAXWORDSPAMRANK * (100 - spam%)) / 100: rank 15 = clean, 0 = pure
spam. Weights at query time: ScoringWeights.wordspam (linear, bottoming
at 1/15 — a fully-spammed word still scores a sliver).
"""

from __future__ import annotations

import numpy as np

from .stopwords import STOP_WORD_IDS
from .tokenizer import ALNUM, MAXWORDSPAMRANK, Tokens

NUM_REPEAT_SPAM = 20   # m_numRepeatSpam (XmlDoc.cpp:19825)
MAX_PERCENT = 25       # maxPercent (XmlDoc.cpp:19843)
PROB_SCALE = 256 * 100 // 7  # 3657 (XmlDoc.cpp:20331, integer division)


def get_prob_spam(profile: list[int], plen: int, step: int) -> int:
    """getProbSpam (XmlDoc.cpp:20283): 0-100 spam probability of a
    subprofile from the fixed-point mean absolute deviation of its
    occurrence gaps. profile is DESCENDING (newest first)."""
    if plen <= 2:
        return 0
    if step == plen:
        return 0
    istop = plen - 1
    # the reference's outer j-loop repeats this identical computation
    # `step` times and divides the sum by `step` — same value
    avg = 0
    for i in range(0, istop, step):
        avg += profile[i] - profile[i + 1]
    avg = (avg * 256) // istop
    dev = 0
    for i in range(0, istop, step):
        d = (profile[i] - profile[i + 1]) * 256 - avg
        dev += -d if d < 0 else d
    dev //= istop
    if dev <= 51.2:  # (.2 * 256) — float compare in the reference too
        return 100
    prob = (PROB_SCALE * plen) // dev
    return 100 if prob > 100 else prob


def set_spam(profile: list[int], plen: int, num_words: int,
             spam: np.ndarray) -> bool:
    """setSpam (XmlDoc.cpp:20186): writes per-occurrence spam% into
    `spam` (indexed by token position), returns True if any occurrence
    was considered spam. profile is DESCENDING."""
    if plen < 3:
        return False
    if num_words > 10 and (plen * 100) // num_words >= NUM_REPEAT_SPAM:
        for i in range(1, plen):
            spam[profile[i]] = 100
        return True
    if plen > 50:
        for i in range(plen - 50):
            spam[profile[i]] = 100
        plen = 50
        # NOTE: the reference's `profile += plen - 50` runs AFTER the
        # plen reassignment, adding zero — the scan below covers the
        # same first-50 profile entries it just marked
    off = 3
    max_step = plen // 4
    if max_step > 4:
        max_step = 4
    for step in range(1, max_step + 1):
        window = 0
        while window + 3 < plen:
            wlen = 3
            while window + wlen <= plen:
                if wlen % step != 0:
                    wlen += 1
                    continue
                prob = get_prob_spam(profile[window:], wlen, step)
                if prob <= 20:
                    wlen += 1
                    continue
                for i in range(window, window + wlen):
                    if i >= plen - off:
                        break
                    if spam[profile[i]] < prob:
                        spam[profile[i]] = prob
                wlen += 1
            window += 1
    had_spam = False
    for i in range(plen):
        if spam[profile[i]] > 20:
            had_spam = True
    for i in range(plen):
        if spam[profile[i]] == 0:
            return had_spam
    spam[profile[0]] = 0
    return had_spam


def word_spam_ranks(t: Tokens) -> np.ndarray:
    """getWordSpamVec (XmlDoc.cpp:19773): per-token word-spam RANK
    (0..MAXWORDSPAMRANK, 15 = clean). Non-alnum tokens get the clean
    rank (they are never hashed)."""
    n = len(t)
    spam = np.zeros(n, dtype=np.int64)
    if n == 0:
        return spam + MAXWORDSPAMRANK
    # occurrence profiles per distinct wordId, positions ascending; the
    # reference's bucket linked-list yields them newest-first
    occ: dict[int, list[int]] = {}
    common: dict[int, bool] = {}
    for i in range(n):
        if t.kinds[i] != ALNUM:
            continue
        wid = t.wids[i]
        occ.setdefault(wid, []).append(i)
        if wid in STOP_WORD_IDS or t.words[i].isdigit():
            common[wid] = True
    spam_words = 0
    good_words = 0
    for wid, positions in occ.items():
        profile = positions[::-1]  # newest first
        if len(profile) < 3:
            # reference quirk kept verbatim (XmlDoc.cpp:20008-20011):
            # the <3-occurrence early-out increments goodWords BEFORE
            # the commonWords check, so low-count stopwords/digits DO
            # dilute the whole-doc spam percentage while >=3-count
            # commons are excluded below — that asymmetry is the
            # reference's behavior, not an accident here
            good_words += 1
            continue
        is_spam = set_spam(profile, len(profile), n, spam)
        if common.get(wid):
            continue
        if is_spam:
            spam_words += 1
        else:
            good_words += 1
    total = spam_words + good_words
    if total > 10:
        percent = (spam_words * 100) // total
        if percent > MAX_PERCENT:
            for i in range(n):
                if t.kinds[i] == ALNUM and spam[i] < 99:
                    spam[i] = 99
    # percent -> rank
    return (MAXWORDSPAMRANK * (100 - spam)) // 100
