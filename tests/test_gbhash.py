"""Hash-family tests (reference analog: hashtest in hash.cpp self-check,
plus termId semantics from XmlDoc_Indexing.cpp)."""

from __future__ import annotations

from open_source_search_engine_spark.functions import gbhash
from open_source_search_engine_spark.functions.gbhash import (
    DOCID_MASK,
    TERMID_MASK,
    fielded_term_id,
    hash8,
    hash64,
    hash64_combine,
    hash64_lower_utf8,
    hash64_lower_utf8_cont,
    hash64_lower_utf8_nospaces,
    probable_doc_id,
    term_id,
)


def test_hashtab_pinned_first_cell():
    # the reference's own self-check value (hash.cpp:70, g_hashtab.inc:2)
    assert int(gbhash.HASHTAB[0, 0]) == 6720717044602784129


def test_positional_not_commutative():
    # Zobrist over (position, byte): anagrams hash differently
    assert hash64_lower_utf8("dog") != hash64_lower_utf8("god")
    assert hash64(b"ab") != hash64(b"ba")


def test_case_folding():
    assert hash64_lower_utf8("Dog") == hash64_lower_utf8("dog")
    assert hash64_lower_utf8("DOG") == hash64_lower_utf8("dog")
    # utf8 case folding per codepoint
    assert hash64_lower_utf8("CAFÉ") == hash64_lower_utf8("café")


def test_nospaces_skips_ascii_whitespace():
    assert (hash64_lower_utf8_nospaces("gb sort by")
            == hash64_lower_utf8_nospaces("gbsortby"))


def test_cont_resumes_position():
    h1 = hash64_lower_utf8("foo")
    h2, conti = hash64_lower_utf8_cont("foo", 0, 0)
    assert h1 == h2 and conti == 3
    # continuing "bar" from index 3 equals hashing "foobar" in one go
    h3, _ = hash64_lower_utf8_cont("bar", h2, conti)
    assert h3 == hash64_lower_utf8("foobar")


def test_combine_used_for_fielded_terms():
    wid = hash64_lower_utf8("value")
    pfx = hash64_lower_utf8_nospaces("title")
    tid = fielded_term_id(wid, pfx)
    assert 0 <= tid <= TERMID_MASK
    assert tid != (wid & TERMID_MASK)
    # combiner is order-sensitive
    assert hash64_combine(1, 2) != hash64_combine(2, 1)


def test_termid_mask_48_bits():
    assert term_id("posting") <= TERMID_MASK
    assert TERMID_MASK == (1 << 48) - 1


def test_docid_domain_bit_clustering():
    # docs of one domain share bits 6..13 (Titledb.h:66-80)
    a = probable_doc_id("http://x.example.com/a")
    b = probable_doc_id("http://x.example.com/b")
    c = probable_doc_id("http://other.org/a")
    assert a <= DOCID_MASK
    assert (a >> 6) & 0xFF == (b >> 6) & 0xFF
    assert a != b
    dom_a = (a >> 6) & 0xFF
    dom_c = (c >> 6) & 0xFF
    # different domains: hash8 differs (not guaranteed in general, but
    # pinned for these fixtures)
    assert dom_a != dom_c


def test_hash8_range():
    assert 0 <= hash8(b"example.com") <= 0xFF


def test_deterministic_across_calls():
    assert hash64_lower_utf8("stable") == hash64_lower_utf8("stable")


def test_hash64_combine_vec_matches_scalar():
    # the vectorized combine must reproduce the scalar table walk exactly
    # (it feeds the frag-vec shingle hashes, XmlDoc.cpp:20574)
    import random

    import numpy as np

    from open_source_search_engine_spark.functions.gbhash import (
        hash64_combine,
        hash64_combine_vec,
    )

    rng = random.Random(20260817)
    h1 = [rng.getrandbits(64) for _ in range(1000)] + [0, 1, (1 << 64) - 1]
    h2 = [rng.getrandbits(64) for _ in range(1000)] + [0, (1 << 64) - 1, 1]
    vec = hash64_combine_vec(np.array(h1, dtype=np.uint64),
                             np.array(h2, dtype=np.uint64))
    assert [int(x) for x in vec] == [hash64_combine(a, b)
                                     for a, b in zip(h1, h2)]
