"""HTML -> text extraction pipeline (the byte-identical invariant).

Ports the reference chain (SURVEY.md §2.2):
1. charset decode -> UTF-8, NULs/invalid sequences -> spaces
   (``XmlDoc.cpp:9441-9610 getRawUtf8Content``)
2. entity decode with doSpecial (``fctypes.cpp:545 htmlDecode``):
   entities decoding to ``< > &`` are re-emitted literally as
   ``&lt; &gt; &amp;``; entities decoding to ``"`` become ``'``; unknown
   entities and entities whose UTF-8 is longer than their source are left
   as text (``XmlDoc.cpp:10046-10050``)
3. normalization (``XmlDoc.cpp:10062-10130``): U+2018/19/1B -> ``'``,
   U+201C/D -> ``"``, C1 controls (U+0080-009F) -> space,
   soft hyphen / en dash / em dash -> ``-``, non-ASCII whitespace -> space
4. HTML node parse with the reference tag table (visibility: contents of
   ``<script><style><select>...`` skipped via a not-visible stack,
   ``Xml.cpp:614-640``)
5. visible-text walk (``Xml.cpp:614-760 Xml::getText`` with
   filterSpaces=false): breaking tags emit ``\\n\\n`` only when the output
   buffer is non-empty; trailing whitespace stripped.

``extract_text(html_bytes)`` output defines the ``text`` column of the
webtext table (input_hint per-row invariant).
"""

from __future__ import annotations

import codecs
import html.entities
import re

from .tokenizer import INVISIBLE_TAGS, NON_BREAKING_TAGS

# HTML5 named entities (public table, html.entities.html5). The reference
# loads the same data from entities.json (generate_entities.py).
_ENTITIES = html.entities.html5

_SPECIAL_SRC = {"<": "&lt;", ">": "&gt;", "&": "&amp;"}

_ENT_RE = re.compile(r"&(#[0-9]+;?|#[xX][0-9a-fA-F]+;?|[A-Za-z][A-Za-z0-9]*;)")


def decode_entities(s: str, do_special: bool = True) -> str:
    """htmlDecode port (fctypes.cpp:545-640)."""

    def repl(m: re.Match) -> str:
        ent = m.group(1)
        src = m.group(0)
        if ent.startswith("#"):
            body = ent.rstrip(";")
            try:
                cp = int(body[2:], 16) if body[1] in "xX" else int(body[1:])
                decoded = chr(cp) if 0 < cp <= 0x10FFFF else None
            except (ValueError, OverflowError):
                decoded = None
        else:
            decoded = _ENTITIES.get(ent)
        if decoded is None:
            return src  # unknown entity: keep as text
        # in-place constraint of the reference: decoded utf8 longer than
        # the source entity stays as text (fctypes.cpp:575-581)
        if len(decoded.encode("utf-8")) > len(src.encode("utf-8")):
            return src
        if do_special:
            if decoded in _SPECIAL_SRC:
                return _SPECIAL_SRC[decoded]
            if decoded == '"':
                return "'"
        return decoded

    return _ENT_RE.sub(repl, s)


_C1 = {chr(c): " " for c in range(0x80, 0xA0)}
_NORM_MAP = {
    "‘": "'", "’": "'", "‛": "'",
    "“": '"', "”": '"',
    "­": "-", "–": "-", "—": "-",
    **_C1,
}


def normalize_utf8(s: str) -> str:
    """Post-decode normalization pass (XmlDoc.cpp:10062-10130)."""
    out = []
    for ch in s:
        o = ord(ch)
        if o < 128:
            out.append(ch)
            continue
        m = _NORM_MAP.get(ch)
        if m is not None:
            out.append(m)
            continue
        if ch.isspace():
            out.append(" ")  # utf8 whitespace -> ascii space
            continue
        out.append(ch)
    return "".join(out)


# BOM -> codec that CONSUMES the BOM ('utf-16'/'utf-32' read the BOM
# and strip it, like 'utf-8-sig'; the -le/-be variants would leak a
# stray U+FEFF into the extracted text and every downstream offset)
_BOMS = (
    (b"\x00\x00\xfe\xff", "utf-32"),
    (b"\xff\xfe\x00\x00", "utf-32"),
    (b"\xef\xbb\xbf", "utf-8-sig"),
    (b"\xfe\xff", "utf-16"),
    (b"\xff\xfe", "utf-16"),
)

# iana names -> python codecs, plus the reference's serving aliases
# (GbEncoding.cpp:337-344: GB2312-family -> GB18030, EUC-KR -> cp949)
_CHARSET_ALIASES = {
    "gb2312": "gb18030", "gbk": "gb18030", "hz-gb-2312": "gb18030",
    "euc-kr": "cp949", "ks_c_5601-1987": "cp949",
    "iso-8859-1": "latin-1", "windows-1252": "cp1252",
    "shift_jis": "shift_jis", "shift-jis": "shift_jis",
    "x-sjis": "shift_jis",
}

_META_CS_RE = re.compile(
    rb"(charset|encoding)\s*=\s*[\"']?\s*([A-Za-z0-9_:.\-]+)", re.I)


def detect_charset(raw: bytes) -> str:
    """Charset detection chain (GbEncoding.cpp:154-360 getCharset,
    XmlDoc.cpp:9065 getCharset caller): Unicode BOM first, then a
    charset=/encoding= scan that must sit inside a <meta>/<xml>/<?xml
    tag (<=500 bytes back, GbEncoding.cpp:226-262), then a claimed-UTF-8
    byte validation. The reference's final CED (compact encoding
    detector) library pass is approximated by a strict UTF-8 probe; the
    residual default is ISO-Latin-1 (GbEncoding.cpp:350-353), exactly as
    in the reference."""
    for bom, cs in _BOMS:
        if raw.startswith(bom):
            return cs
    charset = None
    head = raw[:65536]
    for m in _META_CS_RE.finditer(head):
        # must be preceded (within 500 bytes, no '>' between) by a
        # <meta, <xml or <?xml open
        start = m.start()
        back = head[max(0, start - 500):start]
        gt = back.rfind(b">")
        lt = max(back.rfind(b"<meta"), back.rfind(b"<META"),
                 back.rfind(b"<xml"), back.rfind(b"<?xml"),
                 back.lower().rfind(b"<meta"))
        if lt < 0 or (gt > lt):
            continue
        cand = m.group(2).decode("ascii", "ignore").lower().rstrip(";")
        cand = _CHARSET_ALIASES.get(cand, cand)
        try:
            b"x".decode(cand)
        except LookupError:
            continue
        charset = cand
        break
    if charset in ("utf-8", "utf8"):
        try:
            raw.decode("utf-8", errors="strict")
            return "utf-8"
        except UnicodeDecodeError:
            charset = None  # "says UTF8 but does not seem to be"
    if charset:
        return charset
    # CED substitute: reliable only when the bytes ARE valid utf-8
    try:
        raw.decode("utf-8", errors="strict")
        return "utf-8"
    except UnicodeDecodeError:
        return "latin-1"  # csISOLatin1 default (GbEncoding.cpp:351)


def canon_charset(name: str) -> str:
    """Canonical charset name for ``charset:`` terms. The reference
    round-trips the value through the IANA enum (get_iana_charset then
    back to string, Query.cpp:1948-1960) so 'latin-1', 'ISO-8859-1' and
    'csISOLatin1' hash to one term; we round-trip through the python
    codec registry for the same effect. Unknown names hash as typed."""
    s = (name or "").strip().lower().rstrip(";")
    s = _CHARSET_ALIASES.get(s, s)
    try:
        return codecs.lookup(s).name
    except LookupError:
        return s


# content-type magic sniffing (XmlDoc.cpp:8550 getContentType /
# HttpMime.cpp getContentTypeFromMime + getTypeFromString): the serving
# name set matches the reference's CT_* table subset we index as type:
_CT_MAGIC: list[tuple[bytes, str]] = [
    (b"%PDF-", "pdf"),
    (b"\x89PNG\r\n\x1a\n", "png"),
    (b"GIF87a", "gif"),
    (b"GIF89a", "gif"),
    (b"\xff\xd8\xff", "jpg"),
    (b"PK\x03\x04", "zip"),
    (b"\x1f\x8b", "gz"),
]


def sniff_content_type(raw: bytes) -> str:
    """Content-type sniff by magic + markup probe. Returns the short
    type name used for ``type:``/``filetype:`` terms (Query.cpp:1666
    maps both to the "type" prefix; CT_HTML/CT_XML/CT_TEXT/CT_PDF...
    per HttpMime.h)."""
    for magic, name in _CT_MAGIC:
        if raw.startswith(magic):
            return name
    head = raw[:2048]
    if head[:3] == b"\xef\xbb\xbf":
        head = head[3:]
    head = head.lstrip(b" \t\r\n")
    low = head[:512].lower()
    if low.startswith(b"<?xml"):
        return "xml"
    if (low.startswith(b"<!doctype html") or low.startswith(b"<html")
            or b"<html" in low or b"<body" in low or b"<head" in low):
        return "html"
    if low.startswith(b"{"):
        return "json"
    return "txt"


def to_utf8_text(raw: bytes, charset: str | None = "utf-8") -> str:
    """getRawUtf8Content: decode, NULs -> spaces, invalid -> spaces.
    charset=None runs the detection chain (detect_charset)."""
    if charset is None:
        charset = detect_charset(raw)
    try:
        s = raw.decode(charset, errors="replace")
    except LookupError:
        s = raw.decode("utf-8", errors="replace")
    return s.replace("�", " ").replace("\x00", " ")


def normalize_html(raw: bytes, charset: str | None = "utf-8") -> str:
    """Stages 1-3: the indexable utf8Content string."""
    return normalize_utf8(decode_entities(to_utf8_text(raw, charset)))


# --------------------------------------------------------------------------
# node parse + getText
# --------------------------------------------------------------------------

_TAG_RE = re.compile(r"<(/?)([a-zA-Z][a-zA-Z0-9:_-]*)((?:[^>\"']|\"[^\"]*\"|'[^']*')*)>|<!--.*?-->|<!\[CDATA\[.*?\]\]>|<[!?][^>]*>", re.S)

# void tags never push the visibility stack (hasBackTag=0 rows in g_nodes)
_VOID_TAGS = frozenset({"br", "img", "hr", "meta", "link", "input", "base",
                        "area", "param", "col", "wbr", "embed", "source"})


def iter_nodes(s: str):
    """Yield (is_tag, name, closing, text) over the normalized html."""
    pos = 0
    for m in _TAG_RE.finditer(s):
        if m.start() > pos:
            yield (False, "", False, s[pos:m.start()])
        if m.group(2):
            yield (True, m.group(2).lower(), m.group(1) == "/", m.group(0))
        else:
            yield (True, "!--", False, m.group(0))
        pos = m.end()
    if pos < len(s):
        yield (False, "", False, s[pos:])


def get_text(s: str) -> str:
    """Xml::getText port, filterSpaces=false (Xml.cpp:614-760):
    visible text nodes concatenated; breaking tags append "\\n\\n" when the
    buffer is non-empty; \\r translated to space; trailing ws stripped."""
    out: list[str] = []
    size = 0
    not_visible = 0
    for is_tag, name, closing, text in iter_nodes(s):
        if is_tag:
            if name in INVISIBLE_TAGS:
                # visibility stack (Xml.cpp:636-643)
                if closing:
                    not_visible = max(0, not_visible - 1)
                else:
                    not_visible += 1
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
            out.append(t)
            size += len(t)
    res = "".join(out).rstrip(" \t\n\r\v\f")
    return res


def extract_text(html_bytes: bytes, charset: str = "utf-8") -> str:
    """The webtext ``text`` column: byte-identical invariant per url."""
    return get_text(normalize_html(html_bytes, charset))


def extract_title(html_bytes: bytes, charset: str = "utf-8") -> str:
    """Title extraction (<title> contents; Title.cpp primary source)."""
    return title_from_norm(normalize_html(html_bytes, charset))


def title_from_norm(s: str) -> str:
    """Same, over an already-normalized html string (parse_doc
    normalizes once and fans out — one decode per doc)."""
    return _field_text(s, "title")


def _field_text(s: str, tag: str) -> str:
    depth = 0
    buf: list[str] = []
    for is_tag, name, closing, text in iter_nodes(s):
        if is_tag and name == tag:
            if closing:
                if depth:
                    break
            else:
                depth = 1
            continue
        if depth and not is_tag:
            buf.append(text)
    return "".join(buf).strip()


def extract_headings(html_bytes: bytes, charset: str = "utf-8") -> list[str]:
    """h1-h6 contents (HASHGROUP_HEADING sources,
    XmlDoc_Indexing.cpp:1961-1963)."""
    return headings_from_norm(normalize_html(html_bytes, charset))


def headings_from_norm(s: str) -> list[str]:
    out: list[str] = []
    stack = 0
    buf: list[str] = []
    for is_tag, name, closing, text in iter_nodes(s):
        if is_tag and name in ("h1", "h2", "h3", "h4", "h5", "h6"):
            if closing:
                if stack:
                    out.append("".join(buf).strip())
                    buf = []
                    stack = 0
            else:
                stack = 1
            continue
        if stack and not is_tag:
            buf.append(text)
    return [h for h in out if h]


_HREF_RE = re.compile(
    r"href\s*=\s*(?:\"([^\"]*)\"|'([^']*)'|([^\s>]+))", re.I)


def extract_links(html_bytes: bytes, charset: str = "utf-8"
                  ) -> list[tuple[str, str]]:
    """``<a href>`` outlinks with their anchor text (Links.cpp analog —
    feeds the linkdb analog and incoming-link-text hashing,
    Linkdb.h:90-110, XmlDoc_Indexing.cpp:745 hashLinks /
    1269 hashIncomingLinkText)."""
    return links_from_norm(normalize_html(html_bytes, charset))


def links_from_norm(s: str) -> list[tuple[str, str]]:
    out: list[tuple[str, str]] = []
    href: str | None = None
    buf: list[str] = []
    for is_tag, name, closing, text in iter_nodes(s):
        if is_tag and name == "a":
            if closing:
                if href is not None:
                    out.append((href, "".join(buf).strip()))
                href = None
                buf = []
            else:
                m = _HREF_RE.search(text)
                href = ((m.group(1) or m.group(2) or m.group(3) or "")
                        if m else "")
            continue
        if href is not None and not is_tag:
            buf.append(text)
    return out


_NEIGH_WORD_RE = re.compile(r"[A-Za-z0-9']+")


def links_with_neighborhoods_from_norm(s: str, window: int = 12
                                       ) -> list[tuple[str, str, str]]:
    """(href, anchor_text, surrounding_text) per ``<a href>``: the
    surrounding text is up to ``window`` visible words on each side of
    the anchor, excluding the anchor text itself — the linker-side
    source of the reference's per-inlink surroundingText
    (Inlink::getSurroundingText; consumed by hashNeighborhoods,
    XmlDoc_Indexing.cpp:1374-1388, HASHGROUP_NEIGHBORHOOD). The
    reference window is sentence-based; fixed word counts here keep the
    capture deterministic and bounded."""
    out: list[list] = []  # [href, atext, before_words, after_words]
    unfilled: list[list] = []
    href: str | None = None
    buf: list[str] = []
    recent: list[str] = []
    for is_tag, name, closing, text in iter_nodes(s):
        if is_tag and name == "a":
            if closing:
                if href is not None:
                    rec = [href, "".join(buf).strip(),
                           list(recent[-window:]), []]
                    out.append(rec)
                    unfilled.append(rec)
                href = None
                buf = []
            else:
                m = _HREF_RE.search(text)
                href = ((m.group(1) or m.group(2) or m.group(3) or "")
                        if m else "")
            continue
        if is_tag:
            continue
        if href is not None:
            buf.append(text)
            continue
        words = _NEIGH_WORD_RE.findall(text)
        if not words:
            continue
        still = []
        for rec in unfilled:
            need = window - len(rec[3])
            rec[3].extend(words[:need])
            if len(rec[3]) < window:
                still.append(rec)
        unfilled = still
        recent.extend(words)
        if len(recent) > window:
            recent = recent[-window:]
    return [(h, a, " ".join(b + aft)) for h, a, b, aft in out]


_SCHEME_RE = re.compile(r"^([a-zA-Z][a-zA-Z0-9+.-]*):")


def _collapse_dots(path: str) -> str:
    """Collapse ./ and ../ segments (RFC 3986 remove_dot_segments,
    Url.cpp normalization) so relative links hash to the linkee's
    canonical url."""
    out: list[str] = []
    for seg in path.split("/"):
        if seg == "." or seg == "":
            continue
        if seg == "..":
            if out:
                out.pop()
            continue
        out.append(seg)
    trail = "/" if path.endswith(("/", "/.", "/..")) and out else ""
    return "/" + "/".join(out) + trail if out else "/"


def absolute_url(base: str, href: str) -> str:
    """Resolve an href against the page url (Url.cpp normalization,
    deterministic subset: absolute / protocol-relative / root-relative /
    relative; fragments stripped, dot segments collapsed). Non-fetchable
    schemes (mailto:, javascript:, tel:, data:, ...) resolve to "" so
    they never produce link: terms."""
    href = href.split("#", 1)[0].strip()
    if not href:
        return ""
    m = _SCHEME_RE.match(href)
    if m:
        scheme_l = m.group(1).lower()
        if scheme_l in ("http", "https"):
            s, _, rest = href.partition("://")
            if not rest:
                return ""
            host, slash, path = rest.partition("/")
            return (f"{s}://{host}{_collapse_dots('/' + path)}"
                    if slash else f"{s}://{host}")
        return ""  # mailto:, javascript:, tel:, data:, ftp:, ...
    scheme, _, rest = base.partition("://")
    host = rest.split("/", 1)[0]
    if href.startswith("//"):
        return f"{scheme}:{href}"
    if href.startswith("/"):
        return f"{scheme}://{host}{_collapse_dots(href)}"
    basedir = rest.split("/", 1)[1] if "/" in rest else ""
    basedir = basedir.rsplit("/", 1)[0] if "/" in basedir else ""
    rel = f"/{basedir}/{href}" if basedir else f"/{href}"
    return f"{scheme}://{host}{_collapse_dots(rel)}"


def meta_from_norm(s: str, name: str) -> str:
    """<meta name=... content=...> over an already-decoded html string
    (Xml.cpp getMetaContentPointer); parse_doc normalizes once and fans
    out — no per-meta re-decode of the raw bytes."""
    pat = re.compile(
        r"<meta[^>]*\bname\s*=\s*[\"']?" + re.escape(name) +
        r"[\"']?[^>]*\bcontent\s*=\s*([\"'])(.*?)\1", re.I | re.S)
    m = pat.search(s)
    return m.group(2).strip() if m else ""


_META_TAG_RE = re.compile(r"<meta\b[^>]*>", re.I)
_NAME_ATTR_RE = re.compile(
    r"\bname\s*=\s*(?:\"([^\"]*)\"|'([^']*)'|([^\s>]+))", re.I)
_CONTENT_ATTR_RE = re.compile(
    r"\bcontent\s*=\s*(?:\"([^\"]*)\"|'([^']*)'|([^\s>]+))", re.I)


def _meta_attr(tag: str, rx: re.Pattern) -> str | None:
    m = rx.search(tag)
    if not m:
        return None
    return next(g for g in m.groups() if g is not None)


def is_no_archive(norm: str,
                  bot_name: str = "gigablastopensource") -> bool:
    """<meta name=robots content=noarchive> detection — the faithful
    port of XmlDoc::getIsNoArchive (XmlDoc.cpp:16942-16984), quirks
    included: the name attribute is PREFIX-matched case-insensitively
    against "robots" or the configured bot name (strncasecmp with the
    pattern's own length, so name="robotsfoo" matches too), and the
    content value must START with "noarchive" after leading whitespace
    ("noarchive,nofollow" flags; "nofollow,noarchive" does NOT — the
    reference never scans past the first token). Bot-name default is
    the fork's conf default (Parms.cpp:4916 m_def)."""
    bn = bot_name.lower()
    for m in _META_TAG_RE.finditer(norm):
        tag = m.group(0)
        nm = _meta_attr(tag, _NAME_ATTR_RE)
        if nm is None:
            continue
        low = nm.lstrip().lower()
        if not (low.startswith("robots") or low.startswith(bn)):
            continue
        ct = _meta_attr(tag, _CONTENT_ATTR_RE)
        if ct is not None and ct.lstrip().lower().startswith("noarchive"):
            return True
    return False


def extract_meta(html_bytes: bytes, name: str, charset: str = "utf-8") -> str:
    """<meta name=... content=...> (Xml.cpp getMetaContentPointer)."""
    s = to_utf8_text(html_bytes, charset)
    pat = re.compile(
        r"<meta[^>]*\bname\s*=\s*[\"']?" + re.escape(name) +
        r"[\"']?[^>]*\bcontent\s*=\s*([\"'])(.*?)\1", re.I | re.S)
    m = pat.search(s)
    if not m:
        pat2 = re.compile(
            r"<meta[^>]*\bcontent\s*=\s*([\"'])(.*?)\1[^>]*\bname\s*=\s*[\"']?"
            + re.escape(name) + r"[\"']?", re.I | re.S)
        m = pat2.search(s)
    if not m:
        return ""
    return normalize_utf8(decode_entities(m.group(2)))


# unwanted display symbols (Unicode.h:170 isUtf8UnwantedSymbols):
# geometric shapes, specials, game tiles, regional indicators, emoji
# blocks — stripped from display titles and summaries (Title.cpp:1710,
# Pos.cpp:282), NOT from the indexed term stream
_UNWANTED_RANGES = (
    (0x25A0, 0x25BF), (0x25C0, 0x27BF), (0xFFF0, 0xFFFF),
    (0x1F000, 0x1F0FF), (0x1F1E6, 0x1F1FF), (0x1F300, 0x1F6FF),
    (0x1F900, 0x1F9FF),
)


def is_unwanted_symbol(ch: str) -> bool:
    cp = ord(ch)
    return any(lo <= cp <= hi for lo, hi in _UNWANTED_RANGES)


def strip_unwanted_symbols(s: str) -> str:
    """Title.cpp:1694-1712 display filter: drop unwanted symbols, keep
    everything else; callers strip leading/trailing whitespace."""
    return "".join(c for c in s if not is_unwanted_symbol(c)).strip()
