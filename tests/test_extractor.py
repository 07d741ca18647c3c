"""Extraction tests (reference analog: XmlTest.cpp, PosTest.cpp entity
cases, Xml.cpp:614-760 getText visibility rules)."""

from __future__ import annotations

from open_source_search_engine_spark.functions.extractor import (
    decode_entities,
    extract_headings,
    extract_meta,
    extract_text,
    extract_title,
    normalize_utf8,
)


def test_do_special_keeps_markup_entities_inert():
    # XmlDoc.cpp:10046-10050: &lt;&gt;&amp; must not become live markup
    s = decode_entities("a &amp; b &lt;i&gt; c")
    assert s == "a &amp; b &lt;i&gt; c"


def test_quot_becomes_apostrophe():
    assert decode_entities("say &quot;hi&quot;") == "say 'hi'"


def test_numeric_entities():
    assert decode_entities("&#65;") == "A"
    assert decode_entities("&#x42;") == "B"


def test_unknown_entity_stays():
    assert decode_entities("&nosuch;") == "&nosuch;"


def test_smart_quotes_and_dashes_normalized():
    s = normalize_utf8("‘a’ “b” x–y z—w s­y")
    assert s == "'a' \"b\" x-y z-w s-y"


def test_c1_controls_become_space():
    assert normalize_utf8("ab") == "a b"


def test_utf8_spaces_become_ascii():
    assert normalize_utf8("a b c") == "a b c"


HTML = (
    b"<html><head><title>The Title</title>"
    b"<style>.x{color:red}</style><script>var a=1;</script></head>"
    b"<body><p>Hello world</p><select><option>n</option></select>"
    b"<h1>Big Head</h1><h2>Small Head</h2>"
    b'<meta name="keywords" content="alpha, beta">'
    b"tail</body></html>"
)


def test_invisible_tags_excluded():
    t = extract_text(HTML)
    assert "color:red" not in t
    assert "var a=1" not in t
    assert "option" not in t and ">n<" not in t
    assert "Hello world" in t


def test_breaking_tags_make_paragraphs():
    t = extract_text(b"<p>one</p><p>two</p>")
    assert "one" in t and "two" in t
    assert "\n\n" in t


def test_inline_tags_do_not_break():
    t = extract_text(b"<p>one <b>two</b> three</p>")
    assert "one two three" in t


def test_no_leading_break():
    t = extract_text(b"<div><p>first</p></div>")
    assert t.startswith("first")


def test_title_heading_meta_extraction():
    assert extract_title(HTML) == "The Title"
    assert extract_headings(HTML) == ["Big Head", "Small Head"]
    assert extract_meta(HTML, "keywords") == "alpha, beta"
    assert extract_meta(HTML, "absent") == ""


def test_charset_latin1():
    raw = "smörgåsbord".encode("latin-1")
    t = extract_text(b"<p>" + raw + b"</p>", charset="latin-1")
    assert t == "smörgåsbord"


def test_nul_and_invalid_bytes_become_spaces():
    t = extract_text(b"<p>a\x00b\xff\xfec</p>")
    assert "\x00" not in t
    assert "a b" in t


def test_entities_in_flow():
    t = extract_text(b"<p>fish &amp; chips &#8217;s</p>")
    assert "fish &amp; chips 's" == t


def test_comment_and_doctype_skipped():
    t = extract_text(b"<!DOCTYPE html><!-- hidden --><p>shown</p>")
    assert t == "shown"
    assert "hidden" not in t


def test_idempotent_invariant():
    """text == extract_text(html) is the per-row invariant; re-wrapping
    extracted text must round-trip tokens."""
    t = extract_text(HTML)
    t2 = extract_text(("<html><body><p>" + t + "</p></body></html>")
                      .encode("utf-8"))
    # entity-inert forms survive unchanged
    assert t2.split() == t.split()


def test_extract_links_and_anchor_text():
    from open_source_search_engine_spark.functions.extractor import (
        extract_links,
    )

    html = (b'<html><body>'
            b'<a href="http://a.example/x">first anchor</a>'
            b'<a href=\'/rel/path\'>second</a>'
            b'<a href=bare>third one</a>'
            b'<a>no href</a></body></html>')
    links = extract_links(html)
    assert links[0] == ("http://a.example/x", "first anchor")
    assert links[1] == ("/rel/path", "second")
    assert links[2] == ("bare", "third one")
    assert len(links) == 4  # hrefless anchor yields empty href
    assert links[3][0] == ""


def test_absolute_url_resolution():
    from open_source_search_engine_spark.functions.extractor import (
        absolute_url,
    )

    base = "http://host.example/dir/page.html"
    assert absolute_url(base, "http://other.example/a") == \
        "http://other.example/a"
    assert absolute_url(base, "//cdn.example/x") == "http://cdn.example/x"
    assert absolute_url(base, "/root.html") == "http://host.example/root.html"
    assert absolute_url(base, "sib.html") == \
        "http://host.example/dir/sib.html"
    assert absolute_url(base, "#frag") == ""
    assert absolute_url("http://host.example", "a.html") == \
        "http://host.example/a.html"


# ---------------------------------------------------------------------------
# charset detection (GbEncoding.cpp:154-360), content-type sniff,
# absolute_url scheme/dot-segment handling
# ---------------------------------------------------------------------------

def test_detect_charset_bom():
    from open_source_search_engine_spark.functions.extractor import (
        detect_charset,
    )

    # BOM-consuming codecs: 'utf-16'/'utf-32' strip the BOM like
    # 'utf-8-sig' ('-le/-be' would leak U+FEFF into the text)
    assert detect_charset(b"\xef\xbb\xbfhello") == "utf-8-sig"
    assert detect_charset(b"\xff\xfeh\x00i\x00") == "utf-16"
    assert detect_charset(b"\xfe\xff\x00h\x00i") == "utf-16"
    assert detect_charset(b"\x00\x00\xfe\xff" + b"\x00\x00\x00h") == \
        "utf-32"


def test_detect_charset_meta_declaration():
    from open_source_search_engine_spark.functions.extractor import (
        detect_charset,
        extract_text,
    )

    body = "caf\xe9 ol\xe9 smørrebrød"
    html = ('<html><head><meta http-equiv="Content-Type" '
            'content="text/html; charset=iso-8859-1"></head>'
            f"<body><p>{body}</p></body></html>").encode("latin-1")
    assert detect_charset(html) == "latin-1"
    # byte-identical decode through the auto-detect path
    assert body.replace("ø", "ø") in extract_text(html, charset=None)


def test_detect_charset_xml_encoding_and_fake_utf8():
    from open_source_search_engine_spark.functions.extractor import (
        detect_charset,
    )

    xml = (b'<?xml version="1.0" encoding="shift_jis"?><doc>x</doc>')
    assert detect_charset(xml) == "shift_jis"
    # claims utf-8 but bytes are invalid -> falls through to latin-1
    fake = (b'<meta charset="utf-8">\xe9\xe9 broken')
    assert detect_charset(fake) == "latin-1"
    # charset= outside any meta/xml tag is ignored
    stray = b"<p>set charset=koi8-r in your editor</p>\xff"
    assert detect_charset(stray) == "latin-1"


def test_detect_charset_utf8_probe_default():
    from open_source_search_engine_spark.functions.extractor import (
        detect_charset,
    )

    assert detect_charset("héllo wörld".encode("utf-8")) == "utf-8"
    assert detect_charset(b"plain ascii") == "utf-8"
    assert detect_charset("caf\xe9".encode("latin-1")) == "latin-1"


def test_sniff_content_type():
    from open_source_search_engine_spark.functions.extractor import (
        sniff_content_type,
    )

    assert sniff_content_type(b"<!DOCTYPE html><html>...") == "html"
    assert sniff_content_type(b"  <html><body>x</body>") == "html"
    assert sniff_content_type(b"%PDF-1.4 ...") == "pdf"
    assert sniff_content_type(b'<?xml version="1.0"?><rss>') == "xml"
    assert sniff_content_type(b'{"a": 1}') == "json"
    assert sniff_content_type(b"just words") == "txt"
    assert sniff_content_type(b"\x89PNG\r\n\x1a\nxxxx") == "png"


def test_absolute_url_rejects_nonfetchable_schemes():
    from open_source_search_engine_spark.functions.extractor import (
        absolute_url,
    )

    base = "http://host.example/dir/page.html"
    assert absolute_url(base, "mailto:x@y.z") == ""
    assert absolute_url(base, "javascript:void(0)") == ""
    assert absolute_url(base, "tel:+123456") == ""
    assert absolute_url(base, "data:text/plain,hi") == ""
    assert absolute_url(base, "ftp://host/file") == ""
    assert absolute_url(base, "HTTPS://other.example/x") \
        == "HTTPS://other.example/x"


def test_absolute_url_collapses_dot_segments():
    from open_source_search_engine_spark.functions.extractor import (
        absolute_url,
    )

    base = "http://host.example/a/b/page.html"
    assert absolute_url(base, "../c/d.html") == "http://host.example/a/c/d.html"
    assert absolute_url(base, "./e.html") == "http://host.example/a/b/e.html"
    assert absolute_url(base, "../../up.html") == "http://host.example/up.html"
    assert absolute_url(base, "http://x.example/p/../q.html") \
        == "http://x.example/q.html"


def test_title_emoticon_stripping():
    """Reference goldens test/system/test_result_title.py:38-44 +
    data/html/title_emoticon_{start,middle,end}.html: unwanted symbols
    (Unicode.h:170) are stripped from the DISPLAY title."""
    from open_source_search_engine_spark.functions.extractor import (
        extract_title,
        strip_unwanted_symbols,
    )
    from open_source_search_engine_spark.query.summary import title_of

    want = "The quick brown fox jumps over the lazy dog"
    for raw in (f"\U0001F60E{want}", f"{want}\U0001F60E",
                "The quick brown fox \U0001F60Ejumps over the lazy dog"):
        html = (f"<html><head><title>{raw}</title></head>"
                f"<body><p>body</p></body></html>").encode()
        t = extract_title(html)          # indexed title keeps the raw
        assert title_of(t, "") == want   # display title filters it
    # filter specifics: geometric shapes + specials + emoji gone,
    # CJK/latin/punct kept
    assert strip_unwanted_symbols("a■b�c\U0001F600") == "a" + "b" + "c"
    assert strip_unwanted_symbols("香實發望") == "香實發望"


def test_summary_emoticon_free():
    """Reference goldens data/html/summary_emoticon_*.html (Pos.cpp:282
    applies isUtf8UnwantedSymbols to summary text): snippets never
    contain unwanted symbols — the tokenizer classifies them as punct
    so word-joined snippets are emoji-free by construction."""
    from open_source_search_engine_spark.query.summary import (
        sentence_snippet_of,
        snippet_of,
    )

    txt = ("The quick \U0001F60Ebrown fox jumps. "
           "Another sentence here\U0001F600.")
    s = snippet_of(txt, {"fox"}, window_tokens=8)
    assert "\U0001F60E" not in s and "brown fox" in s
    s2 = sentence_snippet_of(txt, {"fox"})
    assert "\U0001F60E" not in s2 and s2.endswith("jumps")


def test_utf16_bom_stripped():
    """utf-16/32 BOMs must not leak U+FEFF into the extracted text
    (code-review r2 finding #5)."""
    from open_source_search_engine_spark.functions.extractor import (
        extract_text,
    )

    html = "<html><body><p>bom body words</p></body></html>"
    for enc, bom in (("utf-16-le", b"\xff\xfe"),
                     ("utf-16-be", b"\xfe\xff")):
        raw = bom + html.encode(enc)
        t = extract_text(raw, charset=None)
        assert "﻿" not in t
        assert t == "bom body words"


def test_emoticon_goldens_title_and_summary():
    """Reference goldens (test/system/test_result_title.py and
    test_result_summary.py, data/html/*emoticon*): emoji strip from
    display titles AND summaries, rejoining split word fragments."""
    from open_source_search_engine_spark.query.summary import (
        snippet_of,
        title_of,
    )

    raw_title = ("The\U0001F60D quick\U0001F608 bro\U0001F611\U0001F611"
                 "wn\U0001F634 fox\U0001F60E jumps\U0001F60F "
                 "over\U0001F63D the \U0001F631lazy "
                 "d\U0001F633o\U0001F633g")
    assert title_of(raw_title, "") == \
        "The quick brown fox jumps over the lazy dog"
    body = ("Li\U0001F631 Europan lingues es membres del sam "
            "fam\U0001F634ilie and more words beyond")
    snip = snippet_of(body, {"lingues"}, window_tokens=8)
    assert snip.startswith("Li Europan lingues es membres del sam familie")
    assert "\U0001F634" not in snip and "fam ilie" not in snip
