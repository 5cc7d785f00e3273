"""Language-specific filters (analysis/filters_lang.py) against the
reference's own inline test expectations."""

import pytest

from lucene_solr_spark.analysis.filters_lang import (
    apostrophe_strip,
    compound_filter_col,
    dictionary_compound_decompose,
    german_normalize,
    irish_lower_case,
    turkish_lower_case,
)


def test_turkish_lower_case_composed():
    # TestTurkishLowerCaseFilter.testTurkishLowerCaseFilter
    assert turkish_lower_case("İSTANBUL") == "istanbul"
    assert turkish_lower_case("İZMİR") == "izmir"
    assert turkish_lower_case("ISPARTA") == "ısparta"


def test_turkish_lower_case_decomposed():
    # testDecomposed: I + combining dot above == İ
    assert turkish_lower_case("İSTANBUL") == "istanbul"
    assert turkish_lower_case("İZMİR") == "izmir"
    # testDecomposed2: other NSMs between I and the dot are kept
    assert (
        turkish_lower_case("İ̖STANBUL")
        == "i̖stanbul"
    )
    assert turkish_lower_case("I̖SPARTA") == "ı̖sparta"
    # testDecomposed3
    assert turkish_lower_case("İ") == "i"


def test_apostrophe_filter():
    # TestApostropheFilter (after Turkish lowercase)
    words = ["Türkiye'de", "2003'te", "Van", "Gölü'nü", "gördüm"]
    got = [apostrophe_strip(turkish_lower_case(w)) for w in words]
    assert got == ["türkiye", "2003", "van", "gölü", "gördüm"]
    # U+2019 right single quotation mark also splits
    assert apostrophe_strip("ankara’dan") == "ankara"


def test_irish_lower_case():
    # TestIrishLowerCaseFilter
    assert irish_lower_case("nAthair") == "n-athair"
    assert irish_lower_case("tUISCE") == "t-uisce"
    assert irish_lower_case("hARD") == "hard"
    assert irish_lower_case("") == ""
    # fada vowels trigger prothesis too
    assert irish_lower_case("nÉAN") == "n-éan"


def test_german_normalization():
    # TestGermanNormalizationFilter
    assert german_normalize("Schaltflächen") == "Schaltflachen"
    assert german_normalize("Schaltflaechen") == "Schaltflachen"
    assert german_normalize("dauer") == "dauer"  # ue after a: kept
    assert german_normalize("weißbier") == "weissbier"
    assert german_normalize("") == ""


_SE_DICT = frozenset(
    w.lower()
    for w in (
        "Bil", "Dörr", "Motor", "Tak", "Borr", "Slag", "Hammar",
        "Pelar", "Glas", "Ögon", "Fodral", "Bas", "Fiol", "Makare",
        "Gesäll", "Sko", "Vind", "Rute", "Torkare", "Blad",
    )
)


def test_dictionary_compound_se():
    # TestCompoundWordTokenFilter.testDumbCompoundWordsSE
    cases = {
        "Bildörr": ["Bildörr", "Bil", "dörr"],
        "Bilmotor": ["Bilmotor", "Bil", "motor"],
        "Biltak": ["Biltak", "Bil", "tak"],
        "Slagborr": ["Slagborr", "Slag", "borr"],
        "Hammarborr": ["Hammarborr", "Hammar", "borr"],
        "Pelarborr": ["Pelarborr", "Pelar", "borr"],
        "Glasögonfodral": ["Glasögonfodral", "Glas", "ögon", "fodral"],
        "Basfiolsfodral": ["Basfiolsfodral", "Bas", "fiol", "fodral"],
        "Basfiolsfodralmakaregesäll": [
            "Basfiolsfodralmakaregesäll",
            "Bas", "fiol", "fodral", "makare", "gesäll",
        ],
        "Skomakare": ["Skomakare", "Sko", "makare"],
        "Vindrutetorkare": ["Vindrutetorkare", "Vind", "rute", "torkare"],
        "Vindrutetorkarblad": [
            "Vindrutetorkarblad", "Vind", "rute", "blad"
        ],
        "abba": ["abba"],
    }
    for word, expected in cases.items():
        assert dictionary_compound_decompose(word, _SE_DICT) == expected


def test_dictionary_compound_longest_match():
    # testDumbCompoundWordsSELongestMatch
    d = frozenset(
        w.lower()
        for w in (
            "Bil", "Dörr", "Motor", "Tak", "Borr", "Slag", "Hammar",
            "Pelar", "Glas", "Ögon", "Fodral", "Bas", "Fiols", "Makare",
            "Gesäll", "Sko", "Vind", "Rute", "Torkare", "Blad",
            "Fiolsfodral",
        )
    )
    got = dictionary_compound_decompose(
        "Basfiolsfodralmakaregesäll", d, only_longest_match=True
    )
    assert got == [
        "Basfiolsfodralmakaregesäll",
        "Bas", "fiolsfodral", "fodral", "makare", "gesäll",
    ]


def test_compound_min_subword_guard():
    # testWordComponentWithLessThanMinimumLength: 'd' < minSubwordSize
    d = frozenset(["abc", "d", "efg"])
    assert dictionary_compound_decompose("abcdefg", d) == [
        "abcdefg", "abc", "efg"
    ]


def test_compound_filter_col_matches_python(spark):
    from pyspark.sql import functions as F

    dictionary = tuple(sorted(_SE_DICT))
    words = [
        "Bildörr", "Glasögonfodral", "abba", "Vindrutetorkarblad"
    ]
    df = spark.createDataFrame(
        [([w],) for w in words], "tokens: array<string>"
    )
    got = [
        r[0]
        for r in df.select(
            compound_filter_col(F.col("tokens"), dictionary).alias("t")
        ).collect()
    ]
    expected = [
        dictionary_compound_decompose(w, _SE_DICT) for w in words
    ]
    assert got == expected
