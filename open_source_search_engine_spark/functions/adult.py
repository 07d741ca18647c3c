"""Adult-content scorer (AdultCheck.cpp:501 getAdultPoints;
XmlDoc.cpp:3090 getIsAdult).

The reference substring-matches a needle table over the raw utf-8
content; each MATCHED needle contributes its id once (+2 for hard
terms, +1 borderline, negative ids for clean words that contain a
dirty substring — 'essex' cancels 'sex'); the doc is adult when the
total is >= 2 (XmlDoc.cpp:3118).

The table here is a compact subset with the same +2/+1/-1 mechanics
(the reference's full s_dirtyWords list is hundreds of entries; the
scoring semantics, not the exhaustive vocabulary, are the contract —
deployments extend NEEDLES the same way the reference edits its
table)."""

from __future__ import annotations

# (needle, id): positive = dirty (+2 hard, +1 borderline),
# negative = clean word containing a dirty substring
NEEDLES: tuple[tuple[str, int], ...] = (
    ("porn", 2),
    ("hardcore", 1),
    ("xxx", 1),
    ("sex", 1),
    ("nude", 1),
    ("naked", 1),
    ("erotic", 2),
    ("escort", 1),
    ("viagra", 1),
    ("casino", 1),
    # clean-word cancellations (AdultCheck.cpp negative ids)
    ("essex", -1),
    ("sussex", -1),
    ("middlesex", -1),
    ("sexton", -1),
    ("sexual health", -1),
)


def adult_points(text: str) -> int:
    """getAdultPoints: each matched needle's id counted ONCE."""
    low = (text or "").lower()
    return sum(pid for needle, pid in NEEDLES if needle in low)


def is_adult(text: str) -> bool:
    """getIsAdult threshold: points >= 2 (XmlDoc.cpp:3118)."""
    return adult_points(text) >= 2
