"""Snowball Armenian/Basque/Catalan/Irish: goldens produced by the
reference's OWN generated stemmer classes (org/tartarus/snowball/ext/
{Armenian,Basque,Catalan,Irish}Stemmer.java) compiled standalone and
run over deterministic suffix-table-derived vocabularies
(tools/gen_snowball_tail_goldens.py) — these four languages have no
vocabulary in TestSnowballVocabData.zip.
"""

import gzip
import os

import pytest

from lucene_solr_spark.analysis.snowball_ca import catalan_stem
from lucene_solr_spark.analysis.snowball_eu import basque_stem
from lucene_solr_spark.analysis.snowball_ga import irish_stem
from lucene_solr_spark.analysis.snowball_hy import armenian_stem
from lucene_solr_spark.analysis.snowball_registry import SNOWBALL_STEMMERS

_DATA = os.path.join(os.path.dirname(__file__), "data")

_CASES = [
    ("armenian", armenian_stem, 7071),
    ("basque", basque_stem, 14309),
    ("catalan", catalan_stem, 20070),
    ("irish", irish_stem, 2955),
]


@pytest.mark.parametrize("lang,fn,expected_n", _CASES, ids=[c[0] for c in _CASES])
def test_jvm_goldens_ext_tail(lang, fn, expected_n):
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


def test_registry_completes_ext_directory():
    # with these four, every stemmer in the reference's
    # org/tartarus/snowball/ext/ directory (23 classes) is registered
    assert SNOWBALL_STEMMERS["Armenian"] is armenian_stem
    assert SNOWBALL_STEMMERS["Basque"] is basque_stem
    assert SNOWBALL_STEMMERS["Catalan"] is catalan_stem
    assert SNOWBALL_STEMMERS["Irish"] is irish_stem
    assert len(SNOWBALL_STEMMERS) == 23


def test_spot_semantics():
    # values cross-checked against the compiled reference stemmers
    # Irish initial_morph: eclipsis bhf -> f; 'anna' not in the tables
    assert irish_stem("bhfear") == "fear"
    assert irish_stem("scoileanna") == "scoileanna"
    # Catalan: standard suffix in R1/R2 + cleaning deaccent
    assert catalan_stem("nacionals") == "nacion"
    assert catalan_stem("cantava") == "cant"
    # Basque: repeat strips stacked case endings
    assert basque_stem("liburuak") == "liburu"
    assert basque_stem("etxeetan") == "etxe"
    # Armenian: գրքերը (the books) keeps its stem — the ending table
    # needs R2, which lands past the short stem; աղջիկներ (girls)
    # loses the noun-table suffix իկներ within [pV, end)
    assert armenian_stem("գրքերը") == "գրքերը"
    assert armenian_stem("աղջիկներ") == "աղջ"
