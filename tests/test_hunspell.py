"""Hunspell (analysis/hunspell.py) against the reference's own
hunspell test dictionaries (lucene/analysis/common/src/test/org/apache/
lucene/analysis/hunspell/*.aff|*.dic) and every StemmerTestBase
scenario's assertStemsTo expectations (sorted-multiset compare, exactly
like the Java harness)."""

import os

import pytest

from lucene_solr_spark.analysis.hunspell import (
    HunspellStemmer,
    load_dictionary,
)

_D = os.path.join(os.path.dirname(__file__), "data", "hunspell")


def _stemmer(aff, dics, ignore_case=False):
    d = load_dictionary(
        os.path.join(_D, aff),
        [os.path.join(_D, x) for x in dics],
        ignore_case=ignore_case,
    )
    return HunspellStemmer(d)


# (test class, aff, dics, ignore_case, {word: sorted stems})
SCENARIOS = [
    ("TestStemmer", "simple.aff", ["simple.dic"], False, {
        "ab": ["ab"], "abc": ["ab"], "apach": ["apach"],
        "apache": ["apach"], "foo": ["foo", "foo"], "food": ["foo"],
        "foos": ["foo"], "lucen": ["lucen"],
        "lucene": ["lucen", "lucene"], "mahout": ["mahout"],
        "mahoute": ["mahout"], "moo": ["moo"], "mood": ["moo"],
        "olr": ["olr"], "solr": ["olr"], "abcd": [], "abs": [],
        "abe": [], "sab": [], "sapach": [], "sapache": [],
        "apachee": [], "sfoo": [], "sfoos": [], "fooss": [],
        "lucenee": [], "solre": [],
    }),
    ("TestCaseInsensitive", "simple.aff", ["mixedcase.dic"], True, {
        "lucene": ["lucen", "lucene"], "LuCeNe": ["lucen", "lucene"],
        "mahoute": ["mahout"], "MaHoUte": ["mahout"], "solr": ["olr"],
        "abcd": [], "ab": ["ab"], "abc": ["ab"], "apach": ["apach"],
        "apache": ["apach"], "foo": ["foo", "foo"], "food": ["foo"],
        "foos": ["foo"],
    }),
    ("TestTwoSuffixes", "twosuffixes.aff", ["twosuffixes.dic"], False, {
        "drink": ["drink"], "drinkable": ["drink"], "drinks": ["drink"],
        "drinkableable": [], "drinkss": [],
    }),
    ("TestTwoFold", "twofold.aff", ["morph.dic"], False, {
        "drink": ["drink"], "drinkable": ["drink"],
        "drinkables": ["drink"], "drinksable": [],
        "drinkableable": [], "drinks": [],
    }),
    ("TestMorph", "morph.aff", ["morph.dic"], False, {
        "drink": ["drink"], "drinkable": ["drink"], "drinkableable": [],
    }),
    ("TestCircumfix", "circumfix.aff", ["circumfix.dic"], False, {
        "nagy": ["nagy"], "nagyobb": ["nagy"], "legnagyobb": ["nagy"],
        "legeslegnagyobb": ["nagy"], "nagyobbobb": [], "legnagy": [],
        "legeslegnagy": [],
    }),
    ("TestComplexPrefix", "complexprefix.aff", ["complexprefix.dic"],
     False, {
        "ptwofoo": ["foo"], "poneptwofoo": ["foo"], "foosuf": ["foo"],
        "ptwofoosuf": ["foo"], "poneptwofoosuf": ["foo"],
        "ponefoo": [], "ponefoosuf": [], "ptwoponefoo": [],
        "ptwoponefoosuf": [],
    }),
    ("TestCondition", "condition.aff", ["condition.dic"], False, {
        "hello": ["hello"], "try": ["try"], "tried": ["try"],
        "work": ["work"], "worked": ["work"], "rework": ["work"],
        "reworked": ["work"], "retried": [], "workied": [],
        "tryed": [], "tryied": [], "helloed": [],
    }),
    ("TestCondition2", "condition2.aff", ["condition2.dic"], False, {
        "monopolies": ["monopoly"],
    }),
    ("TestOptionalCondition", "optional-condition.aff",
     ["condition.dic"], False, {
        "hello": ["hello"], "try": ["try"], "tried": ["try"],
        "work": ["work"], "worked": ["work"], "rework": ["work"],
        "reworked": ["work"], "retried": [], "workied": [],
        "tryed": [], "tryied": [], "helloed": [],
    }),
    ("TestZeroAffix", "zeroaffix.aff", ["zeroaffix.dic"], False, {
        "drink": ["drinksierranevada"],
    }),
    ("TestZeroAffix2", "zeroaffix2.aff", ["zeroaffix2.dic"], False, {
        "b": ["beer"],
    }),
    ("TestFullStrip", "fullstrip.aff", ["fullstrip.dic"], False, {
        "tasty": ["beer"],
    }),
    ("TestKeepCase", "keepcase.aff", ["keepcase.dic"], False, {
        "drink": ["drink"], "Drink": ["drink"], "DRINK": ["drink"],
        "drinks": ["drink"], "Drinks": ["drink"], "DRINKS": ["drink"],
        "walk": ["walk"], "walks": ["walk"], "Walk": [], "Walks": [],
        "WALKS": [], "test": ["test"], "Test": [], "TEST": [],
    }),
    ("TestNeedAffix", "needaffix.aff", ["needaffix.dic"], False, {
        "drink": ["drink"], "drinks": ["drink"], "walk": [],
        "walks": ["walk"], "prewalk": ["walk"], "prewalks": ["walk"],
        "test": [], "pretest": [], "tests": [], "pretests": [],
    }),
    ("TestOnlyInCompound", "onlyincompound.aff", ["onlyincompound.dic"],
     False, {
        "drink": ["drink"], "drinks": ["drink"], "drinked": [],
        "predrink": [], "predrinked": [], "walk": [],
    }),
    ("TestIgnore", "ignore.aff", ["ignore.dic"], False, {
        "drink": ["drink"], "drinkable": ["drink"],
        "dr'ink-able": ["drink"], "drank-able": ["drank"],
        "'-'-'-": [],
    }),
    ("TestConv", "conv.aff", ["conv.dic"], False, {
        "drink": ["drInk"], "drInk": ["drInk"], "drInkAble": ["drInk"],
        "drInkABle": ["drInk"], "drinkABle": ["drInk"],
    }),
    ("TestEscaped", "escaped.aff", ["escaped.dic"], False, {
        "works": ["work"], "work": ["work"], "R2/D2": ["R2/D2"],
        "R2/D2s": ["R2/D2"], "N/A": ["N/A"], "N/As": [],
    }),
    ("TestDoubleEscape", "double-escaped.aff", ["double-escaped.dic"],
     False, {
        "adubo": ["adubar"],
    }),
    ("TestSpaces", "spaces.aff", ["spaces.dic"], False, {
        "four": ["four"], "fours": ["four"], "five": ["five"],
        "forty four": ["forty four"], "forty fours": ["forty four"],
        "forty five": ["forty five"], "fifty": ["50"], "fiftys": ["50"],
        "sixty": ["60"], "sixty four": ["64"], "fifty four": ["54"],
        "fifty fours": ["54"],
    }),
    ("TestHomonyms", "homonyms.aff", ["homonyms.dic"], False, {
        "works": ["work", "work"],
    }),
    ("TestDependencies", "dependencies.aff", ["dependencies.dic"],
     False, {
        "drink": ["drink", "drink"], "drinks": ["drink", "drink"],
        "drinkable": ["drink"], "drinkables": ["drink"],
        "undrinkable": ["drink"], "undrinkables": ["drink"],
        "undrink": [], "undrinks": [],
    }),
    ("TestFlagLong", "flaglong.aff", ["flaglong.dic"], False, {
        "foo": ["foo"], "foos": ["foo"], "fooss": [], "foobogus": [],
    }),
    ("TestFlagNum", "flagnum.aff", ["flagnum.dic"], False, {
        "foo": ["foo"], "foos": ["foo"], "fooss": [],
    }),
    ("TestMorphAlias", "morphalias.aff", ["morphalias.dic"], False, {
        "feet": ["foot"], "feetscratcher": ["foot"],
        "work": ["worknoun", "workverb"],
        "works": ["worknoun", "workverb"],
        "notspecial": ["notspecial"], "simplenoun": ["simplenoun"],
        "simplenouns": ["simplenoun"], "simplenounscratcher": [],
    }),
    ("TestMorphData", "morphdata.aff", ["morphdata.dic"], False, {
        "feet": ["foot"], "feetscratcher": ["foot"],
        "work": ["worknoun", "workverb"],
        "works": ["worknoun", "workverb"],
        "notspecial": ["notspecial"], "simplenoun": ["simplenoun"],
        "simplenouns": ["simplenoun"], "simplenounscratcher": [],
    }),
    ("TestStrangeOvergeneration", "strange-overgeneration.aff",
     ["strange-overgeneration.dic"], False, {
        "btasty": ["beer"], "tasty": [], "yuck": [], "foo": [],
    }),
    ("TestCaseSensitive", "casesensitive.aff", ["casesensitive.dic"],
     False, {
        "drink": ["drink"], "drinks": ["drink"], "drinkS": ["drink"],
        "gooddrinks": ["drink"], "Gooddrinks": ["drink", "drink"],
        "GOODdrinks": ["drink"], "gooddrinkS": ["drink"],
        "GooddrinkS": ["drink"], "gooddrink": ["drink"],
        "Gooddrink": ["drink", "drink"], "GOODdrink": ["drink"],
        "Drink": ["Drink", "drink"], "Drinks": ["Drink", "drink"],
        "DrinkS": ["Drink"], "goodDrinks": ["Drink"],
        "GoodDrinks": ["Drink"], "GOODDrinks": ["Drink"],
        "goodDrinkS": ["Drink"], "GoodDrinkS": ["Drink"],
        "GOODDrinkS": ["Drink"], "goodDrink": ["Drink"],
        "GoodDrink": ["Drink"], "GOODDrink": ["Drink"],
        "DRINK": ["DRINK", "Drink", "drink"], "DRINKs": ["DRINK"],
        "DRINKS": ["DRINK", "Drink", "drink"],
        "goodDRINKs": ["DRINK"], "GoodDRINKs": ["DRINK"],
        "GOODDRINKs": ["DRINK"], "goodDRINKS": ["DRINK"],
        "GoodDRINKS": ["DRINK"],
        "GOODDRINKS": ["DRINK", "drink", "drink"],
        "goodDRINK": ["DRINK"], "GoodDRINK": ["DRINK"],
        "GOODDRINK": ["DRINK", "drink", "drink"],
    }),
    ("TestAlternateCasing", "alternate-casing.aff",
     ["alternate-casing.dic"], False, {
        "drink": ["drink"], "DRİNK": ["drink"], "DRINK": [],
        "drinki": ["drink"], "DRİNKİ": ["drink"], "DRİNKI": [],
        "DRINKI": [], "DRINKİ": [], "idrink": ["drink"],
        "İDRİNK": ["drink"], "IDRİNK": [], "IDRINK": [],
        "İDRINK": [], "idrinki": ["drink"], "İDRİNKİ": ["drink"],
        "rıver": ["rıver"], "RIVER": ["rıver"], "RİVER": [],
        "rıverı": ["rıver"], "RIVERI": ["rıver"], "RİVERI": [],
        "RİVERİ": [], "RIVERİ": [], "ırıver": ["rıver"],
        "IRIVER": ["rıver"], "IRİVER": [], "İRİVER": [],
        "İRIVER": [], "ırıverı": ["rıver"], "IRIVERI": ["rıver"],
        "Irıverı": ["rıver"],
    }),
]


@pytest.mark.parametrize(
    "name,aff,dics,ic,cases", SCENARIOS, ids=[s[0] for s in SCENARIOS]
)
def test_reference_scenarios(name, aff, dics, ic, cases):
    st = _stemmer(aff, dics, ignore_case=ic)
    bad = []
    for word, expected in cases.items():
        got = sorted(st.stem(word))
        if got != sorted(expected):
            bad.append((word, got, sorted(expected)))
    assert not bad, f"{name}: {bad}"


def test_unique_stems_dedup():
    st = _stemmer("homonyms.aff", ["homonyms.dic"])
    assert st.unique_stems("works") == ["work"]


def test_term_map_integration(spark):
    """hunspell_stem_map plugs into the vocabulary term-map machinery
    (build_index(term_map=...)): distinct terms map to their longest
    hunspell stem, corpus stays JVM-side."""
    from pyspark.sql import functions as F

    from lucene_solr_spark.analysis.hunspell import hunspell_stem_map

    d = load_dictionary(
        os.path.join(_D, "condition.aff"),
        [os.path.join(_D, "condition.dic")],
    )
    vocab = spark.createDataFrame(
        [("worked",), ("reworked",), ("tried",), ("hello",), ("zzz",)],
        "term: string",
    )
    got = {
        r.term: r.new_term
        for r in hunspell_stem_map(vocab, d).collect()
    }
    # unchanged terms are filtered out of the map (hello, zzz)
    assert got == {"worked": "work", "reworked": "work", "tried": "try"}
