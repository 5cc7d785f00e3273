"""Snowball Finnish/Hungarian/Romanian: the reference's full vocabulary
golden sets (TestSnowballVocabData.zip) + registry integration.

Reference: lucene/analysis/common/src/java/org/tartarus/snowball/ext/
{Finnish,Hungarian,Romanian}Stemmer.java via SnowballPorterFilterFactory;
goldens from TestSnowballVocab.java's data (deduplicated by input word).
"""

import gzip
import os

import pytest

from lucene_solr_spark.analysis.snowball_fi import finnish_snowball_stem
from lucene_solr_spark.analysis.snowball_hu import hungarian_snowball_stem
from lucene_solr_spark.analysis.snowball_registry import SNOWBALL_STEMMERS
from lucene_solr_spark.analysis.snowball_ro import romanian_snowball_stem
from lucene_solr_spark.analysis.snowball_kp import kp_stem
from lucene_solr_spark.analysis.snowball_lovins import lovins_stem
from lucene_solr_spark.analysis.snowball_tr import turkish_snowball_stem
from lucene_solr_spark.analysis.stemmer import porter_classic_stem

_DATA = os.path.join(os.path.dirname(__file__), "data")

_CASES = [
    ("finnish", finnish_snowball_stem, 50000),
    ("hungarian", hungarian_snowball_stem, 29881),
    ("romanian", romanian_snowball_stem, 22570),
    ("turkish", turkish_snowball_stem, 96325),
    ("porter", porter_classic_stem, 30428),
    ("kp", kp_stem, 45669),
    ("lovins", lovins_stem, 29417),
]


@pytest.mark.parametrize("lang,fn,expected_n", _CASES, ids=[c[0] for c in _CASES])
def test_reference_vocab_goldens_tail(lang, fn, expected_n):
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


def test_registry_includes_tail_languages():
    assert SNOWBALL_STEMMERS["Finnish"] is finnish_snowball_stem
    assert SNOWBALL_STEMMERS["Hungarian"] is hungarian_snowball_stem
    assert SNOWBALL_STEMMERS["Romanian"] is romanian_snowball_stem
    assert SNOWBALL_STEMMERS["Turkish"] is turkish_snowball_stem
    assert SNOWBALL_STEMMERS["Lovins"] is lovins_stem


def test_spot_semantics():
    # Finnish case-ending 'n' swallows a preceding long vowel
    assert finnish_snowball_stem("taloon") == "talo"
    # Hungarian instrumental undoubles the consonant (fákkal -> fa path)
    assert hungarian_snowball_stem("fákkal") == "fák"
    # Romanian í normalization feeds the verb-suffix step
    assert romanian_snowball_stem("jucării") == romanian_snowball_stem(
        "jucărie"
    )
    # Turkish: single-syllable words are never stemmed
    assert turkish_snowball_stem("ad") == "ad"
    # continue flag: plural verb reading stops noun-suffix stripping
    assert turkish_snowball_stem("kitaplar") == "kitap"
    # postlude final-consonant devoicing
    assert turkish_snowball_stem("kitabı") == "kitap"
    # Lovins: longest-ending removal + undouble + respell
    assert lovins_stem("nationally") == "nat"
    # respell umpt -> um after ending removal
    assert lovins_stem("assumption") == "assum"
    # gated respell: 'ent' preceded by 'm' is NOT recoded ...
    assert lovins_stem("moment") == "moment"
    # ... while a stem long enough for condition C loses 'ent' outright
    assert lovins_stem("torment") == "torm"
