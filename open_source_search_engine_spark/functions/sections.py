"""Sections DOM block tree (Sections.cpp; flags Sections.h:27-73).

The reference builds a tree of Section nodes over the tag stream, sets
per-section flags (SEC_IN_TITLE, SEC_IN_HEADER, SEC_MENU, ...), and the
indexer picks each body word's hash group from its section's flags
(XmlDoc_Indexing.cpp:1957-1966: IN_TITLE words are skipped — hashTitle
covers them; IN_HEADER -> HASHGROUP_HEADING; SEC_MENU* ->
HASHGROUP_INMENU).

This module replays the exact ``extractor.get_text`` walk (same
visibility stack, same "\\n\\n" break insertion, same \\r translation)
while ALSO maintaining the section tree, and returns per-character flag
ranges aligned to the extracted-text string — so the byte-identical
``text`` invariant is untouched and token offsets map 1:1.

Menu detection is the setMenus core (Sections.cpp:2359-2470): mark
SEC_LINK_TEXT / SEC_PLAIN_TEXT up each word's ancestor chain, then scan
anchor sections in document order — two consecutive anchors with no
intervening plain text telescope to siblings under their common
container; if neither telescoped node has plain text and their first
"hard" (breaking-tag) sections match, both get SEC_MENU, which then
propagates to descendants (.cpp:2496-2522). Deviations (documented):
``isHardSection``'s first-child lookahead (.cpp:2334-2343) is
simplified to the breaking-tag test, and SEC_MENU_HEADER /
SEC_MENU_SENTENCE refinement passes are folded into SEC_MENU — the
indexer treats all three identically (XmlDoc_Indexing.cpp:1964).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from .tokenizer import INVISIBLE_TAGS, NON_BREAKING_TAGS

# Sections.h flag subset the indexer consumes
SEC_IN_TITLE = 0x0100
SEC_IN_HEADER = 0x0200
SEC_MENU = 0x00010000
SEC_LINK_TEXT = 0x00020000
SEC_PLAIN_TEXT = 0x02000000

_HEADER_TAGS = frozenset({"h1", "h2", "h3", "h4", "h5", "h6"})
_VOID_TAGS = frozenset({"br", "img", "hr", "meta", "link", "input",
                        "base", "area", "param", "col", "wbr", "embed",
                        "source"})


@dataclass
class Section:
    tag: str
    parent: "Section | None"
    order: int
    flags: int = 0
    children: list = field(default_factory=list)

    def contains(self, other: "Section") -> bool:
        """Section::contains (range containment; self == other counts)."""
        node = other
        while node is not None:
            if node is self:
                return True
            node = node.parent
        return False


def _is_hard(sec: Section) -> bool:
    """isHardSection (Sections.cpp:2324): breaking-tag sections are
    'hard' (div/td/li/p/...); inline spans are soft."""
    return sec.tag not in NON_BREAKING_TAGS and sec.tag != ""


def body_flag_ranges(html_norm: str) -> tuple[list[tuple[int, int, int]], str]:
    """Walk the normalized html exactly like ``extractor.get_text`` and
    return ``(ranges, text)``: ranges is [(start_char, end_char,
    flags)] over the output text for every visible text piece, with
    flags already resolved (SEC_MENU propagated); text is the
    reconstructed get_text output (callers verify it matches the stored
    ``text`` column before trusting the ranges)."""
    from .extractor import iter_nodes

    root = Section("", None, 0)
    sections: list[Section] = [root]
    cur = root
    not_visible = 0
    title_depth = 0
    header_depth = 0
    anchor_depth = 0
    size = 0
    out: list[str] = []
    # (start, end, piece_text, section, in_link, in_title, in_header)
    pieces: list[tuple[int, int, str, Section, bool, bool, bool]] = []
    mailto_anchors: set[int] = set()

    for is_tag, name, closing, text in iter_nodes(html_norm):
        if is_tag:
            if name in INVISIBLE_TAGS:
                if closing:
                    not_visible = max(0, not_visible - 1)
                else:
                    not_visible += 1
            # --- section tree (independent of visibility) ---
            if (name and not name.startswith("!")
                    and not name.startswith("?")
                    and name not in _VOID_TAGS):
                if not closing:
                    sec = Section(name, cur, len(sections))
                    cur.children.append(sec)
                    sections.append(sec)
                    cur = sec
                    if name == "title":
                        title_depth += 1
                    elif name in _HEADER_TAGS:
                        header_depth += 1
                    elif name == "a":
                        anchor_depth += 1
                        if "mailto:" in text.lower():
                            mailto_anchors.add(sec.order)
                else:
                    node = cur
                    while node is not root and node.tag != name:
                        node = node.parent
                    if node is not root:
                        # pop node and everything inside it
                        walk = cur
                        while walk is not node.parent:
                            if walk.tag == "title":
                                title_depth = max(0, title_depth - 1)
                            elif walk.tag in _HEADER_TAGS:
                                header_depth = max(0, header_depth - 1)
                            elif walk.tag == "a":
                                anchor_depth = max(0, anchor_depth - 1)
                            walk = walk.parent
                        cur = node.parent
            # --- output size tracking (get_text byte parity) ---
            if size == 0:
                continue
            if name in NON_BREAKING_TAGS:
                continue
            out.append("\n\n")
            size += 2
            continue
        if not_visible:
            continue
        if text:
            t = text.replace("\r", " ")
            start = size
            out.append(t)
            size += len(t)
            pieces.append((start, size, t, cur, anchor_depth > 0,
                           title_depth > 0, header_depth > 0))

    # SEC_LINK_TEXT / SEC_PLAIN_TEXT up the ancestor chain per piece
    # with alnum content (setMenus phase 1, Sections.cpp:2370-2385)
    for start, end, t, sec, in_link, _t, _h in pieces:
        if not any(c.isalnum() for c in t):
            continue
        flag = SEC_LINK_TEXT if in_link else SEC_PLAIN_TEXT
        node = sec
        while node is not None and not (node.flags & flag):
            node.flags |= flag
            node = node.parent

    # consecutive-anchor scan with telescoping (.cpp:2394-2470)
    last: Section | None = None
    for si in sections[1:]:
        if si.flags & SEC_PLAIN_TEXT:
            last = None
        if si.tag != "a":
            continue
        if si.order in mailto_anchors:
            last = None
        if last is None:
            last = si
            continue
        prev, last = last, si
        prev_hard = None
        p = prev
        while p is not None:
            if prev_hard is None and _is_hard(p):
                prev_hard = p
            if p.parent is None or p.parent.contains(si):
                break
            p = p.parent
        if p is not None and (p.flags & SEC_PLAIN_TEXT):
            continue
        sk = si
        sk_hard = None
        while sk is not None:
            if sk_hard is None and _is_hard(sk):
                sk_hard = sk
            if (p is not None and sk.parent is not None
                    and sk.parent.contains(p)):
                break
            sk = sk.parent
        if sk is not None and (sk.flags & SEC_PLAIN_TEXT):
            continue
        if (prev_hard is None) != (sk_hard is None):
            continue
        if prev_hard is not None and prev_hard.tag != sk_hard.tag:
            continue
        if p is not None:
            p.flags |= SEC_MENU
        if sk is not None:
            sk.flags |= SEC_MENU

    # propagate SEC_MENU to descendants (.cpp:2496-2522; sections list
    # is in creation order so parents precede children)
    for sec in sections[1:]:
        if sec.parent is not None and (sec.parent.flags & SEC_MENU):
            sec.flags |= SEC_MENU

    ranges: list[tuple[int, int, int]] = []
    for start, end, _txt, sec, in_link, in_title, in_header in pieces:
        flags = sec.flags & SEC_MENU
        if in_title:
            flags |= SEC_IN_TITLE
        if in_header:
            flags |= SEC_IN_HEADER
        ranges.append((start, end, flags))

    text_out = "".join(out).rstrip(" \t\n\r\v\f")
    return ranges, text_out
