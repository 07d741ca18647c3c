"""Query compiler: query string -> term groups (Query.cpp:365 setQTerms).

Supported surface (SURVEY.md §2.4):
- default AND of term groups (PosdbTable.cpp:2110-2196)
- ``-term`` negative (BF_NEGATIVE, PosdbTable.cpp:32, delDocIdVotes 5086)
- ``+term`` required sign (Query.h:187)
- ``"quoted phrase"`` adjacency (Query.h:215, PosdbTable.cpp:832-870)
- ``field:value`` fielded terms via prefix-hash termIds
  (Query.cpp:3117 getFieldCode; XmlDoc_Indexing.cpp:1943)
- boolean ``AND OR NOT ( )`` expressions (Query.cpp:1310-1938)
- query bigrams: adjacent query words also match the bigram termId
  ('the one' -> terms ['the one','the','one'], Query.cpp:505-596;
  test/system/test_search_terms.py:4-9)

The same tokenizer/hash as indexing guarantees termId identity.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from ..functions.gbhash import (
    TERMID_MASK,
    fielded_term_id,
    hash64_lower_utf8,
    prefix_hash,
)
from ..functions.tokenizer import ALNUM, phrase_ids, tokenize, word_pos_vec

FIELD_PREFIXES = {
    "title": "title",
    "intitle": "title",      # FIELD_TITLE alias (Query.cpp:1659)
    "url": "url",
    "site": "site",
    "lang": "gblang",
    "gblang": "gblang",
    # docs LINKING to the url (linkdb analog; linker-side link: terms)
    "link": "link",
    # url extension (ext:html, ext:pdf — Query.h:33-83)
    "ext": "ext",
    # tokenized url words (Query.h:37; suburl: maps to the same
    # termlists, Query.cpp:1662-1663)
    "inurl": "inurl",
    "suburl": "inurl",
    # host ip at crawl time (Query.h:36; XmlDoc_Indexing.cpp:395)
    "ip": "ip",
    # country from TLD (Query.h:75; XmlDoc_Indexing.cpp:1618)
    "gbcountry": "gbcountry",
    # url-format permalink flag 0/1 (XmlDoc_Indexing.cpp:1642)
    "gbpermalink": "gbpermalink",
    # sniffed content type (Query.h:39; filetype: alias Query.cpp:1666)
    "type": "type",
    "filetype": "type",
    # adult-content bit 0/1 (hashIsAdult, XmlDoc_Indexing.cpp:1660)
    "gbisadult": "gbisadult",
    # docs linking to any page on the host (FIELD_SITELINK, Query.h:44;
    # build side XmlDoc_Indexing.cpp:828)
    "sitelink": "sitelink",
    # sniffed charset, IANA-canonicalized (FIELD_CHARSET, Query.cpp:1948)
    "charset": "charset",
    # isclean:1 — non-adult docs (FIELD_ISCLEAN, Query.h:57; the build
    # hashes the term only for clean docs, so isclean:0 matches nothing,
    # exactly like the reference)
    "isclean": "isclean",
    # exact-content-hash dedup probe (FIELD_GBCONTENTHASH, Query.h:83;
    # build side XmlDoc_Indexing.cpp:166-176)
    "gbcontenthash": "gbcontenthash",
}

# per-field query-value canonicalization applied before hashing, mirroring
# the build-side term emission (Query.cpp:1948-1960 round-trips charset:
# values through the IANA enum)
FIELD_VALUE_CANON: dict = {}


def _install_field_canon() -> None:
    from ..functions.extractor import canon_charset

    FIELD_VALUE_CANON["charset"] = canon_charset


_install_field_canon()


@dataclass
class TermGroup:
    """One query term group: the term plus its bigram/variant termIds
    (PosdbTable.cpp:1497 setQueryTermInfo)."""

    word: str
    term_ids: list[int]  # alternatives (term, its bigram with next word)
    required: bool = True
    negative: bool = False
    quoted: bool = False
    qpos: int = 0  # query word position (for phrase adjacency)
    # synonym expansion (Query.cpp:414-441): matchable synonym termIds
    # and their display strings; weighted syn_weight^2 at scoring
    # (declared before the `field` attr, which shadows dataclasses.field)
    syn_term_ids: list[int] = field(default_factory=list)
    syn_words: list[str] = field(default_factory=list)
    # display-only expansions (3+-word synonyms, no indexed term)
    syn_display: list[str] = field(default_factory=list)
    field: str | None = None
    is_bigram: bool = False
    # shared id when this word sits inside a known Wikipedia title
    # (Wiki.cpp; PosdbTable.cpp:799-830 wikiPhraseId) — qdist preserved
    # via qpos. The reference feeds this into its pair weighting
    # (WIKI_BIGRAM_WEIGHT); our reference-scorer hook for it is a
    # documented phase-2 item (rank-identity suite pins current scope)
    wiki_phrase_id: int = 0


@dataclass
class CompiledQuery:
    raw: str
    groups: list[TermGroup] = field(default_factory=list)
    boolean_expr: object | None = None  # tree for boolean queries
    quoted_runs: list[list[int]] = field(default_factory=list)  # group idx runs
    bigram_strs: list[str] = field(default_factory=list)  # display only
    # numeric operators (BF_NUMBER termlists, PosdbTable.cpp:34,
    # 4282-4321): sort_spec = (numeric termId, ascending); num_filters =
    # {numeric termId: [min, max]} with None = unbounded
    sort_spec: tuple | None = None
    num_filters: dict = field(default_factory=dict)
    # numeric termId -> the user-visible field name it hashed from
    # (gbmin:FIELD:v): serving execution needs only the termId, but the
    # percolator evaluates the constraint against the INCOMING doc's
    # columns and needs the name back (query/percolate.py)
    num_filter_fields: dict = field(default_factory=dict)
    # gbdocid:<N> — restrict to one docId (Query.h:33-83 field list;
    # PageGet /get docid lookup path)
    docid_filter: int | None = None

    def expanded_terms(self) -> list[str]:
        """queryInfo.terms[].termStr parity surface
        (test/system/test_search_terms.py asserts membership): bigram
        phrase strings, then each term word, then synonym strings."""
        out: list[str] = list(self.bigram_strs)
        for g in self.groups:
            out.append(g.word)
        for g in self.groups:
            out.extend(g.syn_words)
            out.extend(g.syn_display)
        seen: set[str] = set()
        uniq = []
        for t in out:
            if t not in seen:
                seen.add(t)
                uniq.append(t)
        return uniq

    @property
    def positive_groups(self) -> list[TermGroup]:
        return [g for g in self.groups if not g.negative]

    @property
    def negative_groups(self) -> list[TermGroup]:
        return [g for g in self.groups if g.negative]

    def all_term_ids(self) -> list[int]:
        out: list[int] = []
        for g in self.groups:
            out.extend(g.term_ids)
        return sorted(set(out))


def _body_term_id(word: str) -> int:
    return hash64_lower_utf8(word) & TERMID_MASK


def _field_tid(fieldname: str, value: str) -> int:
    pfx = prefix_hash(FIELD_PREFIXES[fieldname])
    canon = FIELD_VALUE_CANON.get(fieldname)
    if canon is not None:
        value = canon(value)
    return fielded_term_id(hash64_lower_utf8(value), pfx)


def _numeric_tid(fieldname: str, as_int: bool = False) -> int:
    """termId of a numeric sort-by field (same hash at index time,
    index.build PFX_SORTBY / PFX_SORTBYINT — the int32 companion
    termlist, hashNumberForSortingAsInt32 XmlDoc_Indexing.cpp:2371)."""
    return fielded_term_id(hash64_lower_utf8(fieldname),
                           prefix_hash("gbsortbyint" if as_int
                                       else "gbsortby"))


_BOOL_OPS = {"AND", "OR", "NOT"}


def compile_query(q: str, synonyms: bool = False) -> CompiledQuery:
    cq = CompiledQuery(raw=q)
    # boolean query? (uppercase operators, Query.cpp:1310)
    if any(f" {op} " in f" {q} " for op in _BOOL_OPS) or "(" in q:
        return _compile_boolean(q, cq)

    # split into units respecting quotes
    units = _split_units(q)
    qpos = 0
    for unit in units:
        sign = ""
        u = unit
        if u and u[0] in "+-":
            sign, u = u[0], u[1:]
        if not u:
            continue
        if u.startswith('"') and u.endswith('"') and len(u) > 1:
            words = [w for w in _words_of(u.strip('"'))]
            run = []
            # phrase words carry their in-phrase position deltas
            toks = tokenize(u.strip('"'))
            wpos = word_pos_vec(toks)
            alnum_pos = [wpos[k] for k in range(len(toks))
                         if toks.kinds[k] == ALNUM]
            for wi, w in enumerate(words):
                g = TermGroup(
                    word=w,
                    term_ids=[_body_term_id(w)],
                    required=True,
                    negative=(sign == "-"),
                    quoted=True,
                    qpos=alnum_pos[wi] if wi < len(alnum_pos) else wi * 2,
                )
                run.append(len(cq.groups))
                cq.groups.append(g)
            if not sign == "-" and len(run) > 1:
                cq.quoted_runs.append(run)
            qpos += 2 * len(words)
            continue
        if ":" in u:
            fieldname, _, value = u.partition(":")
            fl = fieldname.lower()
            # numeric operators: gbsortby:<field> / gbrevsortby:<field>
            # (desc/asc sort on the field's numeric termlist) and
            # gbmin:<field>:<v> / gbmax:<field>:<v> range filters
            # (Query.h:33-83 field codes; value lives in the position
            # slot, hashNumberForSorting XmlDoc_Indexing.cpp:2348)
            if fl in ("gbsortby", "gbrevsortby",
                      "gbsortbyint", "gbrevsortbyint"):
                # int variants hit the int32 companion termlist
                # (Query.cpp:1682-1695 maps *int fields to the
                # "gbsortbyint" prefix hash)
                cq.sort_spec = (_numeric_tid(value, fl.endswith("int")),
                                fl.startswith("gbrevsortby"))
                continue
            if fl == "gbdocid":
                try:
                    cq.docid_filter = int(value)
                except ValueError:
                    pass  # malformed docid: no constraint, never crash
                continue
            if fl == "gbtermid":
                # raw-termId probe (FIELD_GBTERMID, Query.h:80:
                # "gbtermid:123456 matches the documents for the term
                # with termid 123456") — debug surface, no prefix hash
                try:
                    raw_tid = int(value) & TERMID_MASK
                except ValueError:
                    continue  # malformed termid: no constraint
                cq.groups.append(
                    TermGroup(
                        word=u,
                        term_ids=[raw_tid],
                        required=(sign != "-"),
                        negative=(sign == "-"),
                        qpos=qpos,
                        field="gbtermid",
                    )
                )
                qpos += 2
                continue
            if fl in ("gbmin", "gbmax", "gbminint", "gbmaxint",
                      "gbequal", "gbequalint"):
                fld, _, num = value.partition(":")
                try:
                    v = float(num)
                except ValueError:
                    # malformed numeric operator ("gbmin:x:", junk
                    # value): the reference treats an unparseable
                    # number as no constraint — skip the filter,
                    # never crash on user input (fuzz-pinned)
                    continue
                tid = _numeric_tid(fld, fl.endswith("int"))
                cq.num_filter_fields[tid] = fld.lower()
                lohi = cq.num_filters.setdefault(tid, [None, None])
                # gbequal[int]: exact match == degenerate [v, v] range
                # (FIELD_GBNUMBEREQUALFLOAT/INT, Query.h:94-99)
                if fl.startswith("gbequal"):
                    lohi[0] = lohi[1] = v
                else:
                    lohi[0 if fl.startswith("gbmin") else 1] = v
                continue
            if fl in FIELD_PREFIXES:
                cq.groups.append(
                    TermGroup(
                        word=u,
                        term_ids=[_field_tid(fieldname.lower(), value)],
                        required=(sign != "-"),
                        negative=(sign == "-"),
                        qpos=qpos,
                        field=fieldname.lower(),
                    )
                )
                qpos += 2
                continue
        for w in _words_of(u):
            cq.groups.append(
                TermGroup(
                    word=w,
                    term_ids=[_body_term_id(w)],
                    required=(sign != "-"),
                    negative=(sign == "-"),
                    qpos=qpos,
                )
            )
            qpos += 2

    _add_query_bigrams(cq)
    _assign_wiki_phrases(cq)
    if synonyms:
        _add_synonyms(cq)
    return cq


def _assign_wiki_phrases(cq: CompiledQuery) -> None:
    """Consecutive unquoted unfielded positive words forming a known
    Wikipedia title share a wikiPhraseId (Wiki.cpp; greedy longest
    match)."""
    from ..functions.wikiphrases import detect_wiki_spans

    eligible = [g for g in cq.groups
                if not g.negative and not g.quoted and g.field is None]
    for s, e, wid in detect_wiki_spans([g.word for g in eligible]):
        for g in eligible[s:e]:
            g.wiki_phrase_id = wid


def _add_query_bigrams(cq: CompiledQuery) -> None:
    """Adjacent unquoted unfielded positive words also match their bigram
    termId (Query.cpp:505-596, 961-1110): 'the one' docs indexed the
    bigram term satisfy both groups."""
    toks = tokenize(" ".join(
        g.word for g in cq.groups
        if not g.negative and not g.quoted and g.field is None))
    pids = phrase_ids(toks)
    alnum_ix = [k for k in range(len(toks)) if toks.kinds[k] == ALNUM]
    eligible = [g for g in cq.groups
                if not g.negative and not g.quoted and g.field is None]
    for gi, g in enumerate(eligible):
        if gi >= len(alnum_ix):
            break
        pid = pids[alnum_ix[gi]]
        if pid and gi + 1 < len(eligible):
            bid = pid & TERMID_MASK
            g.term_ids.append(bid)
            eligible[gi + 1].term_ids.append(bid)
            cq.bigram_strs.append(f"{g.word} {eligible[gi + 1].word}")


def _add_synonyms(cq: CompiledQuery) -> None:
    """Synonym expansion (Query.cpp:414-441, Synonyms.cpp:59): each
    positive unquoted unfielded word group also matches its synonyms'
    termIds at syn_weight^2 (SearchInput.cpp:74). 1-word synonyms use the
    body termId, 2-word synonyms the indexed bigram termId; longer ones
    are display-only (see functions/synonyms.py).

    Beyond the table, SOURCE_GENERATED forms are always added
    (Synonyms.cpp:408-424): accent-stripped, apostrophe-stripped,
    singular/plural + conjugate morph forms, and the amp-phrase bigram
    ('d & b' -> 'd and' bigram termId ^0x768867, addAmpPhrase :468)."""
    from ..functions.gbhash import hash64_lower_utf8_cont
    from ..functions.stopwords import is_stop_word_id
    from ..functions.synonyms import generated_synonyms, synonyms_of

    # amp-phrase: raw-query '&' between two words (the tokenizer drops
    # the '&', so detect on the raw string); the LEFT word's group gains
    # the "<word> and" stop-bigram termId
    import re

    amp_left = {m.group(1).lower()
                for m in re.finditer(r"(\w+)\s*&\s*\w+", cq.raw)}

    for g in cq.groups:
        if g.negative or g.quoted or g.field is not None:
            continue
        if g.word.lower() in amp_left:
            h = hash64_lower_utf8(g.word)
            h2, _ = hash64_lower_utf8_cont(
                "and", h, len(g.word.encode("utf-8")) & 0xFF)
            tid = (h2 ^ 0x768867) & TERMID_MASK
            if tid not in g.syn_term_ids:
                g.syn_term_ids.append(tid)
                g.syn_words.append(f"{g.word} and")
        if not is_stop_word_id(hash64_lower_utf8(g.word)):
            for syn in generated_synonyms(g.word):
                tid = _body_term_id(syn)
                if tid not in g.syn_term_ids and tid not in g.term_ids:
                    g.syn_term_ids.append(tid)
                    g.syn_words.append(syn)
        for syn in synonyms_of(g.word):
            toks = tokenize(syn)
            words = [toks.words[k] for k in range(len(toks))
                     if toks.kinds[k] == ALNUM]
            if len(words) == 1:
                tid = _body_term_id(words[0])
                if tid not in g.syn_term_ids and tid not in g.term_ids:
                    g.syn_term_ids.append(tid)
                    g.syn_words.append(syn)
            elif len(words) == 2:
                pids = phrase_ids(toks)
                first = next(k for k in range(len(toks))
                             if toks.kinds[k] == ALNUM)
                if pids[first]:
                    tid = pids[first] & TERMID_MASK
                    if tid not in g.syn_term_ids and tid not in g.term_ids:
                        g.syn_term_ids.append(tid)
                        g.syn_words.append(syn)
                else:
                    g.syn_display.append(syn)
            else:
                g.syn_display.append(syn)


# ---------------------------------------------------------------------------
# boolean expressions (Query.cpp:1310-1938; evaluated over per-term
# membership flags, PosdbTable.cpp:5549 makeDocIdVoteBufForBoolQuery)
# ---------------------------------------------------------------------------


@dataclass
class BoolNode:
    op: str  # "AND" | "OR" | "NOT" | "TERM"
    children: list = field(default_factory=list)
    group_index: int = -1


def _compile_boolean(q: str, cq: CompiledQuery) -> CompiledQuery:
    tokens = _bool_lex(q)
    pos = [0]

    def parse_or():
        node = parse_and()
        while pos[0] < len(tokens) and tokens[pos[0]] == "OR":
            pos[0] += 1
            rhs = parse_and()
            node = BoolNode("OR", [node, rhs])
        return node

    def parse_and():
        node = parse_not()
        while pos[0] < len(tokens) and tokens[pos[0]] not in (")", "OR"):
            if tokens[pos[0]] == "AND":
                pos[0] += 1
            rhs = parse_not()
            node = BoolNode("AND", [node, rhs])
        return node

    def parse_not():
        if pos[0] < len(tokens) and tokens[pos[0]] == "NOT":
            pos[0] += 1
            return BoolNode("NOT", [parse_not()])
        return parse_atom()

    def parse_atom():
        tok = tokens[pos[0]]
        if tok == "(":
            pos[0] += 1
            node = parse_or()
            if pos[0] < len(tokens) and tokens[pos[0]] == ")":
                pos[0] += 1
            return node
        pos[0] += 1
        if ":" in tok:
            f, _, v = tok.partition(":")
            if f.lower() in FIELD_PREFIXES:
                tid = [_field_tid(f.lower(), v)]
                cq.groups.append(TermGroup(word=tok, term_ids=tid,
                                           required=False, field=f.lower()))
                return BoolNode("TERM", group_index=len(cq.groups) - 1)
        cq.groups.append(
            TermGroup(word=tok, term_ids=[_body_term_id(tok)], required=False)
        )
        return BoolNode("TERM", group_index=len(cq.groups) - 1)

    try:
        cq.boolean_expr = parse_or()
    except IndexError:
        # malformed boolean (trailing operator, unbalanced parens,
        # empty groups like "(AND)"): degrade to a plain term query
        # over the non-operator tokens — the reference likewise
        # refuses to crash on user input (Query.cpp sets an error and
        # serves what parsed). Fuzz-pinned in tests/test_compiler.py.
        plain = " ".join(
            w for w in q.replace("(", " ").replace(")", " ").split()
            if w not in ("AND", "OR", "NOT", "&&", "||"))
        fallback = compile_query(plain) if plain.strip() \
            else CompiledQuery(raw=q)
        fallback.raw = q
        return fallback
    return cq


def _bool_lex(q: str) -> list[str]:
    out: list[str] = []
    buf = []
    for c in q:
        if c in "() ":
            if buf:
                out.append("".join(buf))
                buf = []
            if c != " ":
                out.append(c)
        else:
            buf.append(c)
    if buf:
        out.append("".join(buf))
    return out


def _split_units(q: str) -> list[str]:
    """Split on spaces, keeping quoted spans together."""
    out: list[str] = []
    buf: list[str] = []
    in_q = False
    for c in q:
        if c == '"':
            in_q = not in_q
            buf.append(c)
        elif c == " " and not in_q:
            if buf:
                out.append("".join(buf))
                buf = []
        else:
            buf.append(c)
    if buf:
        out.append("".join(buf))
    return out


def _words_of(s: str) -> list[str]:
    t = tokenize(s)
    return [t.words[k] for k in range(len(t)) if t.kinds[k] == ALNUM]
