"""Query-language hint-chain goldens: the REFERENCE's own system test
matrix (test/system/test_search_language.py:4-33), all 25 rows verbatim
— including the rows its authors marked '# wrong', because reference
behavior is the parity contract."""

from __future__ import annotations

import pytest

from open_source_search_engine_spark.functions.querylang import (
    query_language,
)

MATRIX = [
    # query         qlang  blang    fetld       country  expected
    ("øl",          "",    "",      "",         "",      "en"),
    ("øl",          "da",  "",      "",         "",      "da"),
    ("øl",          "da",  "en-US", "",         "",      "da"),
    ("øl",          "en",  "da-DK", "findx.dk", "dk",    "en"),
    ("øl",          "",    "en-US", "findx.dk", "",      "en"),
    ("øl",          "",    "en-US", "",         "dk",    "en"),
    ("Smølferne",   "",    "",      "",         "",      "da"),
    ("Smølferne",   "",    "en-US", "",         "",      "da"),
    ("Smølferne",   "",    "",      "",         "uk",    "da"),
    ("Smølferne",   "",    "en-US", "",         "uk",    "da"),
    ("The Smurfs",  "en",  "",      "",         "",      "en"),
    ("The Smurfs",  "en",  "da-DK", "",         "",      "en"),
    ("The Smurfs",  "",    "da-DK", "",         "",      "en"),
    ("The Smurfs",  "",    "",      "",         "dk",    "en"),
    ("The Smurfs",  "",    "da-DK", "",         "dk",    "da"),
    ("Smurfene",    "",    "",      "",         "",      "is"),
    ("Smurfene",    "",    "en-US", "",         "",      "en"),
    ("Smurfene",    "",    "no-NO", "",         "",      "no"),
    ("Smurfene",    "",    "",      "",         "no",    "no"),
    ("kanin",       "",    "",      "",         "",      "tl"),
    ("kanin",       "",    "da-dk", "",         "",      "da"),
    ("kanin",       "da",  "",      "",         "",      "da"),
    ("kanin",       "",    "",      "",         "dk",    "tl"),
]


@pytest.mark.parametrize("query,qlang,blang,fetld,country,expected", MATRIX)
def test_reference_language_matrix(query, qlang, blang, fetld, country,
                                   expected):
    assert query_language(query, qlang=qlang, blang=blang, fetld=fetld,
                          country=country) == expected


def test_conf_with_query_language():
    from open_source_search_engine_spark.config import EngineConf
    from open_source_search_engine_spark.functions.querylang import (
        conf_with_query_language,
    )
    from open_source_search_engine_spark.index.build import LANG_IDS

    c = conf_with_query_language(EngineConf(), "Smølferne")
    assert c.query_lang == LANG_IDS["da"]
    c2 = conf_with_query_language(EngineConf(), "whatever", qlang="en")
    assert c2.query_lang == LANG_IDS["en"]
