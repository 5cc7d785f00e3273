"""Snowball Russian/Spanish/Italian/Portuguese/French/Dutch: the
reference's full vocabulary golden sets (TestSnowballVocabData.zip) +
the language registry and term-map frame.

Reference: lucene/analysis/common/src/java/org/tartarus/snowball/ext/
{Russian,Spanish,Italian,Portuguese,French,Dutch}Stemmer.java via
SnowballPorterFilterFactory; goldens from TestSnowballVocab.java's data.
"""

import gzip
import os

import pytest

from lucene_solr_spark.analysis.snowball_es import spanish_snowball_stem
from lucene_solr_spark.analysis.snowball_fr import french_snowball_stem
from lucene_solr_spark.analysis.snowball_it import italian_snowball_stem
from lucene_solr_spark.analysis.snowball_nl import dutch_snowball_stem
from lucene_solr_spark.analysis.snowball_pt import portuguese_snowball_stem
from lucene_solr_spark.analysis.snowball_registry import (
    SNOWBALL_STEMMERS,
    snowball_stem_map,
)
from lucene_solr_spark.analysis.snowball_ru import russian_snowball_stem

_DATA = os.path.join(os.path.dirname(__file__), "data")

_CASES = [
    ("russian", russian_snowball_stem, 49673),
    ("spanish", spanish_snowball_stem, 28390),
    ("italian", italian_snowball_stem, 35494),
    ("portuguese", portuguese_snowball_stem, 32016),
    ("french", french_snowball_stem, 20403),
    ("dutch", dutch_snowball_stem, 45669),
]


@pytest.mark.parametrize("lang,fn,expected_n", _CASES, ids=[c[0] for c in _CASES])
def test_reference_vocab_goldens_all(lang, fn, expected_n):
    n, bad = 0, []
    with gzip.open(
        os.path.join(_DATA, f"snowball_{lang}_goldens.txt.gz"),
        "rt",
        encoding="utf-8",
    ) as fh:
        for line in fh:
            line = line.rstrip("\n")
            if not line:
                continue
            a, b = line.split("\t")
            n += 1
            g = fn(a)
            if g != b:
                bad.append((a, g, b))
    assert n == expected_n
    assert not bad, f"{len(bad)} mismatches, first 10: {bad[:10]}"


def test_registry_covers_major_languages():
    # the full ext/ directory: 23 stemmers (test_snowball_ext_tail pins
    # the exact count; here just the major-language core)
    assert set(SNOWBALL_STEMMERS) >= {
        "English", "German", "German2", "Danish", "Norwegian", "Swedish",
        "Russian", "Spanish", "Italian", "Portuguese", "French", "Dutch",
        "Finnish", "Hungarian", "Romanian", "Turkish", "Porter", "Kp",
    }
    # every registered stemmer is callable on plain words
    for lang, fn in SNOWBALL_STEMMERS.items():
        assert isinstance(fn("test"), str), lang


def test_spot_semantics():
    # Spanish attached pronoun with accent repair
    assert spanish_snowball_stem("haciéndola") == "hac"
    # Italian pronoun after infinitive marker -> 'e' restored then stemmed
    assert italian_snowball_stem("mangiarla") == italian_snowball_stem(
        "mangiare"
    )
    # French ment-family rewrites feed the verb step
    assert french_snowball_stem("evidemment") == french_snowball_stem(
        "evident"
    )
    # Dutch lose-double-vowel
    assert dutch_snowball_stem("maan") == "man"
    assert dutch_snowball_stem("brood") == "brod"
    # Russian superlative + нн undouble
    assert russian_snowball_stem("величайший") != "величайший"
    # Portuguese nasal round-trip
    assert portuguese_snowball_stem("não").endswith("ã")


def test_snowball_stem_map_frame(spark):
    vocab = spark.createDataFrame(
        [("corriendo",), ("run",)], "term string"
    )
    got = {
        r.term: r.new_term
        for r in snowball_stem_map(vocab, "Spanish").collect()
    }
    assert got["corriendo"] == spanish_snowball_stem("corriendo")
