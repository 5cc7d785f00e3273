"""Greek analysis (analysis/greek.py): the reference's full TestGreekStemmer
suite (343 checkOneTerm cases through the GreekAnalyzer chain —
lucene/analysis/common/src/test/.../el/TestGreekStemmer.java), gzipped
verbatim into tests/data."""

import gzip
import os

from lucene_solr_spark.analysis.greek import (
    greek_analyze,
    greek_lowercase,
    greek_stem,
    greek_stem_map,
)

_GOLD = os.path.join(
    os.path.dirname(__file__), "data", "greek_stemmer_cases.tsv.gz"
)


def test_reference_cases_all():
    n, bad = 0, []
    with gzip.open(_GOLD, "rt", encoding="utf-8") as fh:
        for line in fh:
            line = line.rstrip("\n")
            if not line:
                continue
            a, b = line.split("\t")
            n += 1
            g = greek_analyze(a)
            if g != b:
                bad.append((a, g, b))
    assert n == 343
    assert not bad, f"{len(bad)} mismatches, first 10: {bad[:10]}"


def test_lowercase_filter():
    # final sigma standardized; tonos/dialytika stripped to base vowels
    assert greek_lowercase("ΜΆΪΟΣ") == "μαιοσ"
    assert greek_lowercase("άνθρωπος") == "ανθρωποσ"
    assert greek_lowercase("ΰ") == "υ"


def test_rule8_precedence_quirk():
    # the whole-word alternatives fire without the length guard, as in the
    # Java operator-precedence behavior (GreekStemmer.java rule8)
    assert greek_stem("ηθηκανε") == greek_stem("ηθηκανε")  # no crash, defined
    assert len(greek_stem("ουσανε")) <= len("ουσανε")


def test_short_words_pass_through():
    assert greek_stem("και") == "και"  # len < 4 bypass
    assert greek_analyze("abc") == "abc"  # non-Greek untouched (len < 4)


def test_term_map_frame(spark):
    vocab = spark.createDataFrame(
        [("ανθρωποι",), ("table",)], "term string"
    )
    got = {r.term: r.new_term for r in greek_stem_map(vocab).collect()}
    assert got == {"ανθρωποι": "ανθρωπ"}
