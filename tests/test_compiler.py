"""Query-compiler tests (reference analog:
test/system/test_search_terms.py golden expansions, Query.cpp setQTerms)."""

from __future__ import annotations

from open_source_search_engine_spark.functions.gbhash import (
    TERMID_MASK,
    fielded_term_id,
    hash64_lower_utf8,
    prefix_hash,
)
from open_source_search_engine_spark.query.compiler import compile_query


def test_default_and_terms():
    cq = compile_query("key value")
    assert len(cq.positive_groups) == 2
    assert cq.boolean_expr is None
    assert cq.groups[0].term_ids[0] == hash64_lower_utf8("key") & TERMID_MASK


def test_the_one_bigram_expansion():
    # test/system/test_search_terms.py:4-9: 'the one' also searches the
    # bigram term shared by both groups
    cq = compile_query("the one")
    g_the, g_one = cq.groups
    bigram_ids = set(g_the.term_ids[1:]) & set(g_one.term_ids[1:])
    assert bigram_ids, "adjacent words must share a bigram termId"


def test_negative_sign():
    cq = compile_query("window -customer")
    assert len(cq.positive_groups) == 1
    assert len(cq.negative_groups) == 1
    assert cq.negative_groups[0].word == "customer"


def test_quoted_phrase_run():
    cq = compile_query('"key value" extra')
    assert cq.quoted_runs, "quoted phrase must create an adjacency run"
    run = cq.quoted_runs[0]
    assert [cq.groups[i].word for i in run] == ["key", "value"]
    qd = [cq.groups[i].qpos for i in run]
    assert qd[1] > qd[0]


def test_field_terms():
    cq = compile_query("site:example.com")
    tid = cq.groups[0].term_ids[0]
    assert tid == fielded_term_id(
        hash64_lower_utf8("example.com"), prefix_hash("site"))
    cq2 = compile_query("title:spark")
    assert cq2.groups[0].field == "title"


def test_boolean_parse_tree():
    cq = compile_query("key AND (window OR stream)")
    assert cq.boolean_expr is not None
    root = cq.boolean_expr
    assert root.op == "AND"
    assert root.children[1].op == "OR"


def test_boolean_not():
    cq = compile_query("key AND NOT stream")
    root = cq.boolean_expr
    assert root.op == "AND"
    assert root.children[1].op == "NOT"


def test_plus_sign_required():
    cq = compile_query("+key value")
    assert all(g.required for g in cq.positive_groups)


def test_expanded_terms_the_one_golden():
    # test/system/test_search_terms.py:4-9 golden: 'the one' ->
    # ['the one', 'the', 'one', '1'] ('1' via the number-word synonym)
    terms = compile_query("the one", synonyms=True).expanded_terms()
    for t in ("the one", "the", "one", "1"):
        assert t in terms


def test_expanded_terms_bigram_chain_golden():
    # 'to be or not to be' -> bigram chain + unigrams (same golden file)
    terms = compile_query("to be or not to be").expanded_terms()
    for t in ("to be", "be or", "or not", "not to", "to", "be", "or"):
        assert t in terms


def test_expanded_terms_html_synonym_golden():
    # 'html' -> 'Hypertext Markup Language' (Wiktionary synonym golden);
    # 3-word synonym is display-only (no single indexed termId)
    cq = compile_query("html", synonyms=True)
    assert "Hypertext Markup Language" in cq.expanded_terms()
    # the 3-word table synonym is display-only; the only matchable
    # syn termId is the SOURCE_GENERATED plural 'htmls'
    assert cq.groups[0].syn_words == ["htmls"]
    assert "Hypertext Markup Language" in cq.groups[0].syn_display


def test_numeric_operators_parse():
    from open_source_search_engine_spark.query.compiler import _numeric_tid

    cq = compile_query("ranking gbsortby:warc_ts")
    assert cq.sort_spec == (_numeric_tid("warc_ts"), False)
    assert [g.word for g in cq.positive_groups] == ["ranking"]
    cq = compile_query("gbrevsortby:warc_ts")
    assert cq.sort_spec[1] is True
    cq = compile_query("gbmin:warc_ts:100 gbmax:warc_ts:200")
    tid = _numeric_tid("warc_ts")
    assert cq.num_filters[tid] == [100.0, 200.0]
    assert not cq.groups


def test_synonym_term_ids_single_word():
    from open_source_search_engine_spark.functions.gbhash import (
        TERMID_MASK,
        hash64_lower_utf8,
    )

    cq = compile_query("one", synonyms=True)
    assert (hash64_lower_utf8("1") & TERMID_MASK) in cq.groups[0].syn_term_ids
    # off by default
    assert not compile_query("one").groups[0].syn_term_ids


def test_wiki_phrase_assignment():
    # Wiki.cpp analog: consecutive words matching a known title share a
    # wikiPhraseId; others get none; greedy longest match wins
    cq = compile_query("new york city pizza")
    g = cq.positive_groups
    assert g[0].wiki_phrase_id and \
        g[0].wiki_phrase_id == g[1].wiki_phrase_id == g[2].wiki_phrase_id
    assert g[3].wiki_phrase_id == 0
    cq2 = compile_query("machine learning spark")
    g2 = cq2.positive_groups
    assert g2[0].wiki_phrase_id == g2[1].wiki_phrase_id != 0
    assert g2[2].wiki_phrase_id == 0


def test_generated_morph_synonyms():
    # SOURCE_GENERATED forms (Synonyms.cpp:408-424 analog)
    from open_source_search_engine_spark.functions.synonyms import (
        generated_synonyms,
        morph_forms,
        strip_marks,
    )

    assert morph_forms("columns") == ("column",)
    assert morph_forms("boxes") == ("box", "boxe")
    # '-es' only strips to the stem after s/x/z/ch/sh endings: 'cares'
    # must NOT generate 'car' (a real word -> false matches, ADVICE r2)
    assert "car" not in morph_forms("cares")
    assert "care" in morph_forms("cares")
    assert morph_forms("query") == ("queries",)
    assert morph_forms("cities") == ("city",)
    assert "run" in morph_forms("running")       # doubled consonant
    assert "sort" in morph_forms("sorted")
    assert "runnings" not in morph_forms("running")  # no plural of -ing
    assert morph_forms("3.14") == ()             # non-alpha
    # accent strip (addStripped :525)
    assert strip_marks("café") == "cafe"
    assert strip_marks("Smølferne") == "Smolferne"
    assert "cafe" in generated_synonyms("café")
    # apostrophe strip (addWithoutApostrophe :430)
    assert "dave" in generated_synonyms("dave's")


def test_amp_phrase_synonym():
    # addAmpPhrase (Synonyms.cpp:468): 'd & b' left word gains the
    # 'd and' stop-bigram termId (^0x768867, Phrases.cpp:260)
    from open_source_search_engine_spark.functions.gbhash import (
        TERMID_MASK,
        hash64_lower_utf8,
        hash64_lower_utf8_cont,
    )

    cq = compile_query("d & b", synonyms=True)
    g = next(g for g in cq.positive_groups if g.word == "d")
    h = hash64_lower_utf8("d")
    h2, _ = hash64_lower_utf8_cont("and", h, 1)
    assert ((h2 ^ 0x768867) & TERMID_MASK) in g.syn_term_ids
    assert "d and" in cq.expanded_terms()


def test_morph_synonyms_stopwords_skipped():
    cq = compile_query("the one", synonyms=True)
    the = next(g for g in cq.positive_groups if g.word == "the")
    assert "thes" not in the.syn_words


def test_synset_file_ingestion(tmp_path):
    """Reference synset-format ingestion (Wiktionary.cpp getSynSet line
    format, same as mysynonyms.txt): group aliasing, comment/blank/lang
    filtering, one-word kill-override, multi-group extension."""
    from open_source_search_engine_spark.functions.synonyms import (
        load_synonyms,
        load_synset_file,
        parse_synset_lines,
        synonyms_of,
    )

    text = """\
# comment line
en|love,loved,loving
en|like,likes

pt|holandesa,holandeses
en|by
en|love,lover
"""
    m = parse_synset_lines(text.splitlines(), "en")
    assert m["love"] == ("loved", "loving", "lover")
    assert m["loved"] == ("love", "loving")
    assert m["likes"] == ("like",)
    assert "holandesa" not in m  # lang-filtered
    assert m["by"] == ()  # one-word kill
    p = tmp_path / "syns.txt"
    p.write_text(text, encoding="utf-8")
    try:
        n = load_synset_file(str(p))
        assert n == len(m)
        assert synonyms_of("LOVE") == ("loved", "loving", "lover")
        # builtin table still present underneath (merge, not replace)
        assert "Hypertext Markup Language" in synonyms_of("html")
        # and a compiled query picks the file-loaded alias up
        from open_source_search_engine_spark.query.compiler import (
            compile_query,
        )

        cq = compile_query("loved", synonyms=True)
        assert "love" in [w.lower() for w in cq.groups[0].syn_words]
    finally:
        load_synonyms({})


def test_compile_query_never_crashes_fuzz():
    """Robustness: arbitrary printable query strings must compile to a
    CompiledQuery (possibly with zero groups) — never raise. Serving
    engines see genuinely arbitrary user input."""
    import random
    import string

    from open_source_search_engine_spark.query.compiler import (
        compile_query,
    )

    rng = random.Random(7)
    alphabet = (string.ascii_letters + string.digits
                + " \"'()-+:._|&!<>#,~*[]{}$%^;/\\é中")
    specials = ['""', '"', "((", "))", "AND", "OR", "NOT", "-", "+",
                "site:", "gbsortby:", "gbmin:x:", "title:\"", ":",
                "AND OR", "(AND)", "gbdocid:", "ip:", "type:"]
    for trial in range(500):
        if trial % 3 == 0:
            parts = [rng.choice(specials) for _ in range(rng.randint(1, 5))]
            q = " ".join(parts)
        else:
            q = "".join(rng.choice(alphabet)
                        for _ in range(rng.randint(0, 40)))
        for syn in (False, True):
            cq = compile_query(q, synonyms=syn)
            assert cq is not None, repr(q)


def test_default_synset_asset(spark=None):
    """The shipped synset asset (data/synsets_en.txt) loads through the
    standard synset-file path and drives real expansions — the
    reference's system-test golden plus abbreviation/irregular-plural
    groups — then restores the built-in table."""
    from open_source_search_engine_spark.functions import synonyms as syn

    saved = dict(syn._table)
    try:
        n = syn.load_default_synsets(replace=True)
        assert n > 700  # words mapped (members x groups)
        cq = compile_query("html", synonyms=True)
        assert "Hypertext Markup Language" in cq.expanded_terms()
        # abbreviation group: monday <-> mon
        assert "mon" in syn.synonyms_of("monday")
        assert "mondays" in syn.synonyms_of("mon")
        # irregular plural the rule-based morphs miss
        assert "children" in syn.synonyms_of("child")
        # postal code
        assert "texas" in syn.synonyms_of("tx")
        # one-word kill stays a kill
        assert syn.synonyms_of("advertisementless") == ()
        # end-to-end: a query on the abbreviation matches via synonyms
        cq2 = compile_query("monday", synonyms=True)
        assert any("mon" == w for g in cq2.groups
                   for w in g.syn_words)
    finally:
        syn.load_synonyms(saved, replace=True)
