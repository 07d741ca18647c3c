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


def to_utf8_text(raw: bytes, charset: str = "utf-8") -> str:
    """getRawUtf8Content: decode, NULs -> spaces, invalid -> spaces."""
    try:
        s = raw.decode(charset, errors="replace")
    except LookupError:
        s = raw.decode("utf-8", errors="replace")
    return s.replace("�", " ").replace("\x00", " ")


def normalize_html(raw: bytes, charset: str = "utf-8") -> str:
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
    s = normalize_html(html_bytes, charset)
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
    s = normalize_html(html_bytes, charset)
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
    s = normalize_html(html_bytes, charset)
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


def absolute_url(base: str, href: str) -> str:
    """Resolve an href against the page url (Url.cpp normalization,
    minimal deterministic subset: absolute / protocol-relative /
    root-relative / relative; fragments stripped)."""
    href = href.split("#", 1)[0].strip()
    if not href:
        return ""
    if "://" in href:
        return href
    scheme, _, rest = base.partition("://")
    host = rest.split("/", 1)[0]
    if href.startswith("//"):
        return f"{scheme}:{href}"
    if href.startswith("/"):
        return f"{scheme}://{host}{href}"
    basedir = rest.split("/", 1)[1] if "/" in rest else ""
    basedir = basedir.rsplit("/", 1)[0] if "/" in basedir else ""
    prefix = f"{scheme}://{host}/{basedir}/" if basedir else f"{scheme}://{host}/"
    return prefix + href


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
