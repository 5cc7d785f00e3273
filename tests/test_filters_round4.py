"""Round-4 token-filter factories: EnglishPossessive, RemoveDuplicates,
Elision, ScandinavianNormalization/Folding, CodepointCount, HyphenatedWords,
and the KeywordMarker/StemmerOverride/KeywordRepeat term-map combinators.
Goldens follow the reference's own factory tests
(lucene/analysis/common/src/test/.../miscellaneous/, .../util/TestElision)."""

import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.analysis.filters import (
    codepoint_count_filter,
    elision_filter,
    english_possessive_filter,
    hyphenated_words_filter,
    keyword_marker_map,
    keyword_repeat_map,
    remove_duplicates_filter,
    scandinavian_folding_filter,
    scandinavian_normalization_filter,
    stemmer_override_map,
)
from lucene_solr_spark.analysis.stemmer import porter_stem_map


def _run(spark, tokens: list[str], expr) -> list[str]:
    df = spark.createDataFrame([(tokens,)], "toks array<string>")
    return df.select(expr(F.col("toks")).alias("out")).head().out


# --- EnglishPossessiveFilter (EnglishPossessiveFilter.java:57-72) ---

def test_english_possessive(spark):
    got = _run(
        spark,
        ["dave's", "pete’s", "John＇S", "plain", "'s", "s'", "it's'"],
        english_possessive_filter,
    )
    # trailing 's (ASCII/right-single-quote/fullwidth apostrophe, s or S)
    # strips; a bare 's strips to empty; trailing apostrophe alone does not.
    assert got == ["dave", "pete", "John", "plain", "", "s'", "it's'"]


# --- RemoveDuplicatesTokenFilter (TestRemoveDuplicatesTokenFilter.java) ---

def _run_positioned(spark, toks: list[tuple[str, int]]) -> list[tuple[str, int]]:
    rows = [([{"term": t, "pos": p} for t, p in toks],)]
    df = spark.createDataFrame(
        rows, "toks array<struct<term:string,pos:int>>"
    )
    out = df.select(
        remove_duplicates_filter(F.col("toks")).alias("out")
    ).head().out
    return [(x["term"], x["pos"]) for x in out]


def test_remove_duplicates_no_dups(spark):
    # testNoDups: A B B C D(posInc 0 after C) E — nothing removed
    toks = [("A", 0), ("B", 1), ("B", 2), ("C", 3), ("D", 3), ("E", 4)]
    assert _run_positioned(spark, toks) == toks


def test_remove_duplicates_simple_dups(spark):
    # same term at the same position collapses; later positions survive
    toks = [("A", 0), ("A", 0), ("B", 1), ("A", 2)]
    assert _run_positioned(spark, toks) == [("A", 0), ("B", 1), ("A", 2)]


def test_remove_duplicates_keyword_repeat_shape(spark):
    # the classic KeywordRepeat+stem chain: stem==original duplicates drop
    toks = [("run", 0), ("running", 0), ("cat", 1), ("cat", 1)]
    assert _run_positioned(spark, toks) == [
        ("run", 0), ("running", 0), ("cat", 1)
    ]


# --- ElisionFilter (ElisionFilter.java:52-68, FrenchAnalyzer articles) ---

ELISION_CASES = [
    ("l'avion", "avion"),
    ("L'avion", "avion"),          # CharArraySet ignoreCase=true
    ("j’aime", "aime"),
    ("jusqu'à", "à"),
    ("qu'est", "est"),
    ("d'accord", "accord"),
    ("xyz'abc", "xyz'abc"),        # prefix not an article
    ("la'bc", "la'bc"),            # 'la' is not in the article set
    ("lavion", "lavion"),          # no apostrophe
    ("l＇avion", "l＇avion"),  # fullwidth apostrophe NOT treated
]


def test_elision(spark):
    got = _run(spark, [a for a, _ in ELISION_CASES], elision_filter)
    assert got == [b for _, b in ELISION_CASES]


# --- ScandinavianNormalizationFilter goldens (its reference test) ---

NORM_CASES = [
    ("aeäaeeea", "æææeea"),
    ("aeäaeeeae", "æææeeæ"),
    ("aeaeeeae", "ææeeæ"),
    ("bøen", "bøen"),
    ("bOEen", "bØen"),
    ("åene", "åene"),
    ("blåbærsyltetøj", "blåbærsyltetøj"),
    ("blaabaersyltetöj", "blåbærsyltetøj"),
    ("räksmörgås", "ræksmørgås"),
    ("raeksmörgaos", "ræksmørgås"),
    ("raeksmörgaas", "ræksmørgås"),
    ("raeksmoergås", "ræksmørgås"),
    ("ab", "ab"), ("ob", "ob"), ("Ab", "Ab"), ("Ob", "Ob"),
    ("å", "å"),
    ("aa", "å"), ("aA", "å"), ("ao", "å"), ("aO", "å"),
    ("AA", "Å"), ("Aa", "Å"), ("Ao", "Å"), ("AO", "Å"),
    ("æ", "æ"), ("ä", "æ"),
    ("Æ", "Æ"), ("Ä", "Æ"),
    ("ae", "æ"), ("aE", "æ"), ("Ae", "Æ"), ("AE", "Æ"),
    ("ö", "ø"), ("ø", "ø"),
    ("Ö", "Ø"), ("Ø", "Ø"),
    ("oo", "ø"), ("oe", "ø"), ("oO", "ø"), ("oE", "ø"),
    ("Oo", "Ø"), ("Oe", "Ø"), ("OO", "Ø"), ("OE", "Ø"),
    ("", ""),
]


def test_scandinavian_normalization(spark):
    got = _run(spark, [a for a, _ in NORM_CASES],
               scandinavian_normalization_filter)
    assert got == [b for _, b in NORM_CASES]


FOLD_SCANDI_CASES = [
    ("aeäaeeea", "aaaeea"),
    ("aeäaeeeae", "aaaeea"),
    ("aeaeeeae", "aaeea"),
    ("bøen", "boen"),
    ("åene", "aene"),
    ("blåbærsyltetøj", "blabarsyltetoj"),
    ("blaabaarsyltetoej", "blabarsyltetoj"),
    ("blåbärsyltetöj", "blabarsyltetoj"),
    ("raksmorgas", "raksmorgas"),
    ("räksmörgås", "raksmorgas"),
    ("ræksmørgås", "raksmorgas"),
    ("raeksmoergaas", "raksmorgas"),
    ("ræksmörgaos", "raksmorgas"),
    ("ab", "ab"), ("ob", "ob"), ("Ab", "Ab"), ("Ob", "Ob"),
    ("å", "a"),
    ("aa", "a"), ("aA", "a"), ("ao", "a"), ("aO", "a"),
    ("AA", "A"), ("Aa", "A"), ("Ao", "A"), ("AO", "A"),
    ("æ", "a"), ("ä", "a"), ("Æ", "A"), ("Ä", "A"),
    ("ae", "a"), ("aE", "a"), ("Ae", "A"), ("AE", "A"),
    ("ö", "o"), ("ø", "o"), ("Ö", "O"), ("Ø", "O"),
    ("oo", "o"), ("oe", "o"), ("oO", "o"), ("oE", "o"),
    ("Oo", "O"), ("Oe", "O"), ("OO", "O"), ("OE", "O"),
    ("", ""),
]


def test_scandinavian_folding(spark):
    got = _run(spark, [a for a, _ in FOLD_SCANDI_CASES],
               scandinavian_folding_filter)
    assert got == [b for _, b in FOLD_SCANDI_CASES]


# --- CodepointCountFilter ---

def test_codepoint_count(spark):
    toks = ["a", "ab", "abc", "abcd", "\U0001d11e\U0001d11e"]
    got = _run(spark, toks, lambda t: codepoint_count_filter(t, 2, 3))
    # the surrogate-pair token is 2 CODE POINTS (4 UTF-16 units): kept
    assert got == ["ab", "abc", "\U0001d11e\U0001d11e"]


# --- HyphenatedWordsFilter (TestHyphenatedWordsFilter.java) ---

def test_hyphenated_words(spark):
    toks = ["ecologi-", "cal", "devel-", "op", "compre-",
            "hensive-hands-on", "and", "ecologi-", "cal"]
    got = _run(spark, toks, hyphenated_words_filter)
    assert got == ["ecological", "develop", "comprehensive-hands-on",
                   "and", "ecological"]


def test_hyphen_at_end(spark):
    toks = ["ecologi-", "cal", "and", "ecology-"]
    got = _run(spark, toks, hyphenated_words_filter)
    # trailing unfinished word gets its hyphen restored
    assert got == ["ecological", "and", "ecology-"]


def test_hyphenated_multi_fragment(spark):
    # "1234- 5678-" at stream end: both pend, emitted joined with '-'
    got = _run(spark, ["abc-", "def", "geh", "1234-", "5678-"],
               hyphenated_words_filter)
    assert got == ["abcdef", "geh", "12345678-"]


# --- term-map combinators over the Porter map ---

@pytest.fixture(scope="module")
def vocab(spark):
    return spark.createDataFrame(
        [("running",), ("cats",), ("jumped",), ("as",)], "term string"
    )


def _map_rows(df):
    return {(r.term, r.new_term) for r in df.collect()}


def test_keyword_marker_map(spark, vocab):
    m = keyword_marker_map(porter_stem_map, ("running",))(vocab)
    rows = _map_rows(m)
    assert ("running", "run") not in rows      # protected: never stems
    assert ("cats", "cat") in rows and ("jumped", "jump") in rows


def test_stemmer_override_map(spark, vocab):
    m = stemmer_override_map(porter_stem_map, {"running": "sprint"})(vocab)
    rows = _map_rows(m)
    assert ("running", "sprint") in rows       # dictionary wins
    assert ("running", "run") not in rows      # stemmer never sees it
    assert ("cats", "cat") in rows


def test_keyword_repeat_map_fans_out_in_index(spark):
    """KeywordRepeat + RemoveDuplicates chain: the index holds BOTH the
    surface form and the stem (1:N term map fans out through
    _apply_term_map's broadcast join)."""
    from lucene_solr_spark.index.builder import build_index

    corpus = spark.createDataFrame(
        [(0, "running cats"), (1, "run fast")], "doc_id long, text string"
    )
    idx = build_index(
        spark, corpus, key_col="doc_id", docid_col="doc_id",
        num_index_partitions=2, persist=False,
        term_map=keyword_repeat_map(porter_stem_map),
    )
    terms = {r.term for r in idx.postings.select("term").distinct().collect()}
    assert {"running", "run", "cats", "cat"} <= terms
    df = {r.term: r.df for r in idx.segments.collect()}
    assert df["run"] == 2      # doc 0 via stem, doc 1 surface
    assert df["running"] == 1  # surface form preserved


# --- PatternCaptureGroupTokenFilter (reference test sequences) ---

def test_pattern_capture_group_reference_cases():
    from lucene_solr_spark.analysis.filters import pattern_capture_group as pcg

    # no pattern / no match / no capture / empty capture -> original
    assert pcg("foobarbaz", ()) == ["foobarbaz"]
    assert pcg("foobarbaz", ("xx",)) == ["foobarbaz"]
    assert pcg("foobarbaz", ("..",)) == ["foobarbaz"]
    assert pcg("foobarbaz", (r".(y*)",)) == ["foobarbaz"]
    # whole-token capture: replaced by itself / skipped when preserving
    assert pcg("foobarbaz", ("(.+)",)) == ["foobarbaz"]
    assert pcg("foobarbaz", ("(.+)",), True) == ["foobarbaz"]
    # start / middle / end single captures
    assert pcg("foobarbaz", ("^(.)",)) == ["f"]
    assert pcg("foobarbaz", ("^(.)",), True) == ["foobarbaz", "f"]
    assert pcg("foobarbaz", ("^.(.).",)) == ["o"]
    assert pcg("foobarbaz", ("(.)$",)) == ["z"]
    # two groups
    assert pcg("foobarbaz", ("^(.)(.)",)) == ["f", "o"]
    assert pcg("foobarbaz", ("^(.).+(.)$",)) == ["f", "z"]
    assert pcg("foobarbaz", ("(.)(.)$",)) == ["a", "z"]
    # nested overlapping captures, repeated matches
    assert pcg("foobarbaz", ("(.(.(.)))",)) == [
        "foo", "oo", "o", "bar", "ar", "r", "baz", "az", "z"
    ]
    assert pcg("foobarbaz", ("(.(.(.)))",), True) == [
        "foobarbaz", "foo", "oo", "o", "bar", "ar", "r", "baz", "az", "z"
    ]
    # multiple patterns interleaved by start offset
    assert pcg("aaabbbaaa", ("(aaa)", "(bbb)", "(ccc)")) == [
        "aaa", "bbb", "aaa"
    ]
    # the camelCase stack from the reference javadoc/test
    camel = (
        "([A-Z]{2,})",
        "(?<![A-Z])([A-Z][a-z]+)",
        r"(?:^|\b|(?<=[0-9_])|(?<=[A-Z]{2}))([a-z]+)",
        "([0-9]+)",
    )
    assert pcg("letsPartyLIKEits1999_dude", camel) == [
        "lets", "Party", "LIKE", "its", "1999", "dude"
    ]
    assert pcg("letsPartyLIKEits1999_dude", camel, True) == [
        "letsPartyLIKEits1999_dude",
        "lets", "Party", "LIKE", "its", "1999", "dude",
    ]


def test_upper_case_filter(spark):
    from pyspark.sql import functions as F

    from lucene_solr_spark.analysis.filters import upper_case_filter

    df = spark.createDataFrame([(["foo", "Bar"],)], "t: array<string>")
    assert df.select(
        upper_case_filter(F.col("t")).alias("u")
    ).collect()[0].u == ["FOO", "BAR"]


def test_ascii_folding_preserve_original(spark):
    from lucene_solr_spark.analysis.filters import ascii_folding_filter_preserve

    df = spark.createDataFrame([(["café", "plain", "über"],)], "t array<string>")
    got = list(df.select(
        ascii_folding_filter_preserve(F.col("t")).alias("o")
    ).collect()[0].o)
    assert got == ["cafe", "café", "plain", "uber", "über"]
