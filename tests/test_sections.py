"""Sections DOM block tree tests (Sections.cpp setMenus core; flags
Sections.h:27-73; hashgroup mapping XmlDoc_Indexing.cpp:1957-1966)."""

from __future__ import annotations

from open_source_search_engine_spark.functions.extractor import (
    get_text,
    normalize_html,
)
from open_source_search_engine_spark.functions.sections import (
    SEC_IN_HEADER,
    SEC_IN_TITLE,
    SEC_MENU,
    body_flag_ranges,
)


def _flags_of(html: bytes, needle: str) -> int:
    s = normalize_html(html)
    ranges, text = body_flag_ranges(s)
    assert text == get_text(s), "walk must replay get_text byte-for-byte"
    pos = text.find(needle)
    assert pos >= 0, f"{needle!r} not in extracted text"
    for st, en, fl in ranges:
        if st <= pos < en:
            return fl
    return 0


MENU_PAGE = (b"<html><head><title>T</title></head><body>"
             b"<h2>Section Head</h2>"
             b'<div><ul><li><a href="/1">alpha link</a></li>'
             b'<li><a href="/2">beta link</a></li>'
             b'<li><a href="/3">gamma link</a></li></ul></div>'
             b"<p>plain paragraph text</p>"
             b'<a href="/solo">lonely link</a>'
             b"</body></html>")


def test_text_byte_parity_and_basic_flags():
    assert _flags_of(MENU_PAGE, "T") & SEC_IN_TITLE
    assert _flags_of(MENU_PAGE, "Section Head") & SEC_IN_HEADER
    assert _flags_of(MENU_PAGE, "plain paragraph") == 0


def test_menu_detection_consecutive_links():
    # three <li><a> items with no intervening plain text -> SEC_MENU
    for w in ("alpha link", "beta link", "gamma link"):
        assert _flags_of(MENU_PAGE, w) & SEC_MENU, w
    # a single link after plain text is NOT a menu
    assert not _flags_of(MENU_PAGE, "lonely link") & SEC_MENU


def test_plain_text_breaks_menu_run():
    html = (b"<html><body>"
            b'<div><a href="/1">one link</a>'
            b"<p>interrupting plain text</p>"
            b'<a href="/2">two link</a></div>'
            b"</body></html>")
    assert not _flags_of(html, "one link") & SEC_MENU
    assert not _flags_of(html, "two link") & SEC_MENU


def test_mailto_resets_menu_run():
    # mailto anchors reset the run BEFORE pairing (Sections.cpp:
    # 2408-2416 abtango fix): consecutive mailto links never pair up
    html = (b"<html><body><ul>"
            b'<li><a href="mailto:a@b.c">mail one</a></li>'
            b'<li><a href="mailto:d@e.f">mail two</a></li>'
            b'<li><a href="mailto:g@h.i">mail three</a></li>'
            b"</ul></body></html>")
    assert not _flags_of(html, "mail one") & SEC_MENU
    assert not _flags_of(html, "mail two") & SEC_MENU
    assert not _flags_of(html, "mail three") & SEC_MENU


def test_menu_propagates_to_children():
    # nested spans inside menu items inherit SEC_MENU (.cpp:2496-2522)
    html = (b"<html><body><ul>"
            b'<li><a href="/1"><span>deep one</span></a></li>'
            b'<li><a href="/2"><span>deep two</span></a></li>'
            b"</ul></body></html>")
    assert _flags_of(html, "deep one") & SEC_MENU
    assert _flags_of(html, "deep two") & SEC_MENU


def test_hard_section_mismatch_no_menu():
    # anchors telescoping to DIFFERENT hard-section tags don't pair
    # (switchboard.com fix, Sections.cpp:2454-2461)
    html = (b"<html><body>"
            b'<td><a href="/1">in cell</a></td>'
            b'<h3><a href="/2">in header</a></h3>'
            b"</body></html>")
    assert not _flags_of(html, "in cell") & SEC_MENU
    assert not _flags_of(html, "in header") & SEC_MENU


def test_parse_doc_group_assignment():
    """Build-side mapping: IN_TITLE skipped in body stream, IN_HEADER ->
    HEADING, MENU -> INMENU, rest BODY; title still findable via
    hashTitle's TITLE group."""
    from collections import defaultdict

    from open_source_search_engine_spark.functions.gbhash import term_id
    from open_source_search_engine_spark.functions.posdb import (
        HASHGROUP_NAMES,
        unpack_ctx,
    )
    from open_source_search_engine_spark.index.build import parse_doc

    d = parse_doc("http://x.example/p.html", MENU_PAGE, None, "en")
    groups = defaultdict(set)
    for t, c in zip(d["term_ids"], d["ctxs"]):
        groups[t].add(HASHGROUP_NAMES[unpack_ctx(c)[0]])
    assert groups[term_id("alpha")] == {"inmenu"}
    assert groups[term_id("section")] == {"heading"}
    assert groups[term_id("plain")] == {"body"}
    assert groups[term_id("lonely")] == {"body"}
    # title word: TITLE group only — not duplicated into the body stream
    assert groups[term_id("t")] == {"title"}


def test_body_only_doc_all_body():
    from open_source_search_engine_spark.index.build import (
        _section_group_vec,
    )
    from open_source_search_engine_spark.functions.tokenizer import tokenize

    assert _section_group_vec(None, "plain words", tokenize("plain words")) \
        is None
    assert _section_group_vec(b"", "plain words", tokenize("plain words")) \
        is None
