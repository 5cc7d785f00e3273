"""Language light/minimal stemmers + RSLP: full reference golden sweeps.

Golden data is the reference's own test vocabularies
(lucene/analysis/common/src/test/org/apache/lucene/analysis/*/
*testdata.zip and no/nb_*.txt nn_*.txt), gzipped verbatim under
tests/data/.  Each sweep asserts every pair — ~440k pairs total.
"""

import gzip
import os

import pytest

from lucene_solr_spark.analysis import lightstem as L
from lucene_solr_spark.analysis import rslp as R

_DATA = os.path.join(os.path.dirname(__file__), "data")

GOLDEN_CASES = [
    ("delight.txt.gz", L.german_light_stem, 35033),
    ("deminimal.txt.gz", L.german_minimal_stem, 35033),
    ("eslight.txt.gz", L.spanish_light_stem, 28377),
    ("filight.txt.gz", L.finnish_light_stem, 50000),
    ("frlight.txt.gz", L.french_light_stem, 20403),
    ("frminimal.txt.gz", L.french_minimal_stem, 20403),
    ("hulight.txt.gz", L.hungarian_light_stem, 30000),
    ("itlight.txt.gz", L.italian_light_stem, 35494),
    ("ptlight.txt.gz", L.portuguese_light_stem, 32016),
    ("rulight.txt.gz", L.russian_light_stem, 49673),
    ("svlight.txt.gz", L.swedish_light_stem, 30623),
    ("nb_light.txt.gz", lambda w: L.norwegian_light_stem(w, L.BOKMAAL), 123),
    ("nb_minimal.txt.gz", lambda w: L.norwegian_minimal_stem(w, L.BOKMAAL), 82),
    ("nn_light.txt.gz", lambda w: L.norwegian_light_stem(w, L.NYNORSK), 92),
    ("nn_minimal.txt.gz", lambda w: L.norwegian_minimal_stem(w, L.NYNORSK), 59),
    ("ptminimal.txt.gz", R.portuguese_minimal_stem, 32016),
    ("ptrslp.txt.gz", R.portuguese_rslp_stem, 32016),
    ("gl.txt.gz", R.galician_stem, 9416),
]


def _pairs(fname):
    with gzip.open(os.path.join(_DATA, fname), "rt", encoding="utf-8") as fh:
        for line in fh:
            line = line.rstrip("\n")
            if not line or line.startswith("#"):
                continue
            parts = line.split("\t")
            if len(parts) == 2:
                yield parts[0], parts[1]


@pytest.mark.parametrize(
    "fname,fn,expected_n", GOLDEN_CASES, ids=[c[0].split(".")[0] for c in GOLDEN_CASES]
)
def test_reference_goldens(fname, fn, expected_n):
    n, bad = 0, []
    for a, b in _pairs(fname):
        n += 1
        g = fn(a)
        if g != b:
            bad.append((a, g, b))
    assert n == expected_n
    assert not bad, f"{len(bad)} mismatches, first 10: {bad[:10]}"


def test_registry_covers_all():
    assert set(L.LIGHT_STEMMERS) == {
        "de_light", "de_minimal", "fr_light", "fr_minimal", "es_light",
        "it_light", "pt_light", "sv_light", "fi_light", "hu_light",
        "ru_light", "nb_light", "nn_light", "nb_minimal", "nn_minimal",
    }
    assert set(R.RSLP_STEMMERS) == {"pt_minimal", "pt_rslp", "gl_minimal", "gl_rslp"}


def test_rslp_rule_semantics():
    # whole-word exception: "mais" never loses its plural-looking ending
    assert R.portuguese_minimal_stem("mais") == "mais"
    assert R.portuguese_minimal_stem("normais") == "normal"
    # replacement rule: balões -> balão
    assert R.portuguese_minimal_stem("balões") == "balão"
    # min-stem gate: "bons" -> "bom" via ns->m
    assert R.portuguese_minimal_stem("bons") == "bom"
    # full pipeline: adverb + accent strip
    assert R.portuguese_rslp_stem("felizmente") == "feliz"


def test_light_stem_map_frame(spark):
    vocab = spark.createDataFrame(
        [("häufig",), ("aasgeruch",), ("laufen",)], "term string"
    )
    got = {r.term: r.new_term for r in L.light_stem_map(vocab, "de_light").collect()}
    assert got == {"häufig": "haufig", "laufen": "lauf"}


def test_rslp_stem_map_frame(spark):
    vocab = spark.createDataFrame([("normais",), ("bom",)], "term string")
    got = {r.term: r.new_term for r in R.rslp_stem_map(vocab, "pt_minimal").collect()}
    assert got == {"normais": "normal"}
