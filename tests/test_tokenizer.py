"""Tokenizer/phrases tests (reference analog: WordsTest.cpp,
Words.cpp:218-440 exception rules, Phrases.cpp:109-263)."""

from __future__ import annotations

from open_source_search_engine_spark.functions.gbhash import (
    TERMID_MASK,
    hash64_lower_utf8,
)
from open_source_search_engine_spark.functions.tokenizer import (
    ALNUM,
    density_ranks,
    diversity_ranks,
    frag_vec,
    phrase_ids,
    sentence_ids,
    tokenize,
    word_pos_vec,
)


def words_of(s):
    t = tokenize(s)
    return [t.words[k] for k in range(len(t)) if t.kinds[k] == ALNUM]


def test_basic_split():
    assert words_of("key agg row") == ["key", "agg", "row"]


def test_cpp_csharp_exceptions():
    # Words.cpp:366-372
    assert words_of("C++ and c#") == ["C++", "and", "c#"]


def test_number_exceptions():
    # Words.cpp:375-399: comma/period digit runs stay one word
    assert words_of("1,000,000 costs 3.14") == ["1,000,000", "costs", "3.14"]


def test_apostrophe_one_in_word():
    # Words.cpp:404-408: single in-word apostrophe joins
    assert words_of("dave's") == ["dave's"]
    # two apostrophes split
    assert words_of("it''s") != ["it''s"]


def test_hyphen_splits_words():
    assert words_of("e-mail") == ["e", "mail"]


def test_utf8_words():
    assert words_of("café naïve Smølferne") == ["café", "naïve", "Smølferne"]


def test_stopword_bigram_xor_rule():
    # Phrases.cpp:230-262: bigram containing a stopword gets h2 ^ 0x768867
    t = tokenize("the one")
    pids = phrase_ids(t)
    assert pids[0] != 0
    plain = hash64_lower_utf8("one", hash64_lower_utf8("the"))
    # stopword-containing bigram must differ from the raw continue-hash
    assert (pids[0] & TERMID_MASK) != (plain & TERMID_MASK)


def test_bigram_continue_hash():
    # non-stopword bigram = continuation hash of next word
    t = tokenize("posting merge")
    pids = phrase_ids(t)
    assert pids[0] != 0


def test_word_positions_monotonic():
    t = tokenize("alpha beta gamma")
    wp = word_pos_vec(t)
    alnum_pos = [wp[k] for k in range(len(t)) if t.kinds[k] == ALNUM]
    assert alnum_pos == sorted(alnum_pos)
    assert len(set(alnum_pos)) == 3


def test_sentence_break_adds_units():
    # sentence change jumps word position by SENT_UNITS-ish (XmlDoc.cpp:20339)
    t1 = tokenize("one two. three")
    wp = word_pos_vec(t1)
    ap = [wp[k] for k in range(len(t1)) if t1.kinds[k] == ALNUM]
    gap_within = ap[1] - ap[0]
    gap_across = ap[2] - ap[1]
    assert gap_across > gap_within


def test_frag_vec_zeroes_repeats():
    # XmlDoc.cpp:20574-20790: repeated >=5-word fragments not indexed
    t = tokenize(" ".join(["one two three four five six"] * 4))
    fv = frag_vec(t)
    alnum = [k for k in range(len(t)) if t.kinds[k] == ALNUM]
    zeros = [k for k in alnum if fv[k] == 0]
    assert zeros, "repeated fragment must be suppressed"
    # first occurrence survives
    assert fv[alnum[0]] == 1


def test_frag_vec_keeps_unique_text():
    t = tokenize("every word here is fresh and unrepeated today")
    fv = frag_vec(t)
    assert all(fv[k] == 1 for k in range(len(t)) if t.kinds[k] == ALNUM)


def test_density_ranks_shorter_sentence_denser():
    t_short = tokenize("tiny one")
    t_long = tokenize("this sentence has very many words in it to dilute")
    d_s = density_ranks(t_short, 0, sentence_ids(t_short))
    d_l = density_ranks(t_long, 0, sentence_ids(t_long))
    s_val = max(d_s)
    l_val = max(d_l)
    assert s_val > l_val


def test_diversity_ranks_bounded():
    t = tokenize("spark spark spark unique words here")
    dv = diversity_ranks(t, phrase_ids(t))
    assert all(0 <= v <= 15 for v in dv)


def test_ascii_fast_path_differential():
    """The regex-run ASCII fast path must produce the IDENTICAL token
    stream (kinds, words, wids, tag names, closing flags) as the
    char-scan loop on randomized ASCII inputs — boundary rules (c++,
    c#, comma groups, decimals, apostrophes), tags, and punct spans
    included."""
    import random

    from open_source_search_engine_spark.functions.tokenizer import (
        Tokens,
        _tokenize_ascii,
        tokenize,
    )

    def slow(s, has_tags):
        # force the char loop by bypassing the isascii gate
        import open_source_search_engine_spark.functions.tokenizer as T
        orig = T._tokenize_ascii
        T._tokenize_ascii = lambda *a: None
        try:
            return tokenize(s, has_tags=has_tags)
        finally:
            T._tokenize_ascii = orig

    rng = random.Random(42)
    words = ["the", "Dave's", "c++", "c#", "j2ee", "1,000,000", "3.14",
             "a", "1,23", "12,345", "x'''y", "A+", "e.g", "don't",
             "100,1000", "5.", ".5", "q+r", "z#1"]
    puncts = [" ", ", ", " - ", "...", "; ", "'", "+", "#", ". ", "!"]
    tags = ["<b>", "</p>", "<br/>", "<!-- c -->", "<a href='x'>",
            "<?xml?>"]
    for trial in range(300):
        has_tags = trial % 2 == 0
        parts = []
        for _ in range(rng.randint(1, 12)):
            r = rng.random()
            if r < 0.5:
                parts.append(rng.choice(words))
            elif r < 0.85 or not has_tags:
                parts.append(rng.choice(puncts))
            else:
                parts.append(rng.choice(tags))
        s = "".join(parts)
        if not has_tags:
            s = s.replace("<", "(")
        a = _tokenize_ascii(s, has_tags, True)
        b = slow(s, has_tags)
        assert a is not None, s
        assert a.kinds == b.kinds, s
        assert a.words == b.words, s
        assert a.wids == b.wids, s
        assert a.tag_names == b.tag_names, s
        assert a.tag_closing == b.tag_closing, s
