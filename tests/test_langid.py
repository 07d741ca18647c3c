"""Trained Cavnar-Trenkle language ID: learns real language profiles
from a multilingual fixture, classifies held-out sentences correctly,
and is deterministic (integer ranks/distances, total tie orders)."""

from __future__ import annotations

import pytest

from open_source_search_engine_spark.ops.langid import (
    detect_lang_rank,
    train_lang_profiles,
)

TRAIN = [
    ("en", "the cat sat on the mat and the dog ran in the park"),
    ("en", "the quick brown fox jumps over the lazy dog in the garden"),
    ("en", "she walked to the market and bought some bread and milk"),
    ("de", "der hund lief durch den wald und die katze schlief leise"),
    ("de", "die kinder spielen gerne im garten hinter dem grossen haus"),
    ("de", "ich gehe morgen mit dem zug in die stadt zum einkaufen"),
    ("fr", "le chien court dans le parc et le chat dort sur le lit"),
    ("fr", "les enfants jouent dans le jardin derriere la grande maison"),
    ("fr", "je vais demain au marche pour acheter du pain et du lait"),
    ("es", "el perro corre en el parque y el gato duerme en la cama"),
    ("es", "los ninos juegan en el jardin detras de la casa grande"),
    ("es", "manana voy al mercado para comprar pan y leche fresca"),
]
HELD_OUT = [
    (1, "en", "the children play in the garden behind the big house"),
    (2, "de", "der zug faehrt morgen durch den wald in die stadt"),
    (3, "fr", "le marche est derriere le parc dans la grande ville"),
    (4, "es", "el mercado esta detras del parque en la ciudad grande"),
]


def test_trained_profiles_classify_held_out(spark):
    tr = spark.createDataFrame(TRAIN, "lang string, text string")
    prof = train_lang_profiles(tr, k=40)
    # profile shape: <= k ranked rows per language, rank 1..k dense
    rows = prof.collect()
    per = {}
    for r in rows:
        per.setdefault(r["lang"], []).append(r["rank"])
    assert set(per) == {"en", "de", "fr", "es"}
    for lg, ranks in per.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1)), lg

    test = spark.createDataFrame(
        [(i, t) for i, _, t in HELD_OUT], "doc_id long, text string")
    got = {r["doc_id"]: r["predicted_lang"] for r in
           detect_lang_rank(test, prof, k=40).collect()}
    assert got == {i: lg for i, lg, _ in HELD_OUT}


def test_detect_deterministic_and_total(spark):
    tr = spark.createDataFrame(TRAIN, "lang string, text string")
    prof = train_lang_profiles(tr, k=40)
    test = spark.createDataFrame(
        [(i, t) for i, _, t in HELD_OUT] + [(9, "zzz qqq xxx")],
        "doc_id long, text string")
    a = sorted(map(tuple, detect_lang_rank(test, prof, k=40).collect()))
    b = sorted(map(tuple, detect_lang_rank(test, prof, k=40).collect()))
    assert a == b
    # the all-unknown doc still gets a deterministic prediction: every
    # gram misses every profile, distance = n_grams*k per lang, tie
    # broken to the smallest language code
    unk = [r for r in a if r[0] == 9][0]
    assert unk[1] == "de"  # lexicographic min of {de,en,es,fr}
