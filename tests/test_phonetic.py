"""Soundex encoder + phonetic index: commons-codec golden set (the encoder
the reference's PhoneticFilterFactory loads by default) and end-to-end
fold-equivalence through the index build."""

import pytest

from lucene_solr_spark.analysis.phonetic import soundex, soundex_tokens

# commons-codec SoundexTest goldens (classic American Soundex + HW rule)
GOLDENS = {
    "Robert": "R163", "Rupert": "R163",
    "Ashcraft": "A261", "Ashcroft": "A261",   # HW rule
    "Tymczak": "T522",                         # vowel separates, CZ collapses
    "Pfister": "P236",                         # first-letter code dedup
    "Honeyman": "H555",
    "Williams": "W452", "BARHAM": "B650",
    "Testing": "T235", "The": "T000", "quick": "Q200", "brown": "B650",
    "fox": "F200", "jumped": "J513", "over": "O160", "lazy": "L200",
    "dogs": "D200",
    # commons-codec testUsEnglishStatic / difference cases
    "Smith": "S530", "Smythe": "S530",
    "Ann": "A500", "Andrew": "A536", "Janet": "J530", "Margaret": "M626",
    "Steven": "S315", "Michael": "M240", "Robert3": "R163",  # digits stripped
}


@pytest.mark.parametrize("word,code", sorted(GOLDENS.items()))
def test_soundex_goldens(word, code):
    assert soundex(word) == code


def test_soundex_edge_cases():
    assert soundex("") == ""
    assert soundex("123") == ""
    assert soundex("a") == "A000"
    assert soundex("h") == "H000"
    # vowel separation: same code twice across a vowel
    assert soundex("cece") == "C200"
    assert soundex("bab") == "B100"
    # W/H do not separate same-code letters (second b collapses)
    assert soundex("bwb") == "B000"
    # adjacent same-code letters collapse (S and G both 2)
    assert soundex("sgler") == "S460"


def test_soundex_tokens_is_positionwise():
    assert soundex_tokens(["merge", "marge", "table"]) == [
        "M620", soundex("marge"), "T140"
    ]
    assert soundex("merge") == soundex("marge")  # sound-alikes fold


def test_phonetic_index_folds_soundalikes(spark, sf_dir):
    """Terms with equal codes share one posting list: df of the code equals
    the union doc count of its preimage terms."""
    from collections import defaultdict

    import pyspark.sql.functions as F

    from lucene_solr_spark.driver_queries import get_index, get_phonetic_index

    plain = get_index(spark, sf_dir)
    phon = get_phonetic_index(spark, sf_dir)

    # group the plain vocabulary by code and pick a code with >= 2 preimages
    vocab = [r.term for r in plain.postings.select("term").distinct().collect()]
    by_code = defaultdict(set)
    for t in vocab:
        by_code[soundex(t)].add(t)
    code, terms = max(by_code.items(), key=lambda kv: (len(kv[1]), kv[0]))
    # (the sf0.001 vocabulary may not contain sound-alike pairs; the fold
    # identity below holds either way — df(code) == union docs of preimages)

    union_docs = {
        r.docid
        for r in plain.postings.filter(F.col("term").isin(list(terms)))
        .select("docid").distinct().collect()
    }
    code_docs = {
        r.docid
        for r in phon.postings.filter(F.col("term") == code)
        .select("docid").collect()
    }
    assert code_docs == union_docs
