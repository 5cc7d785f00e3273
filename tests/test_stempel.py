"""Stempel (Egothor Polish stemmer): 28,299 reference-produced goldens —
the reference's own Trie/MultiTrie2/Diff classes run over a Polish-shaped
vocabulary (tools/gen_stempel_goldens.py) — plus StempelFilter gate
semantics and the vocabulary term-map integration."""

import gzip
import os

import pytest

from lucene_solr_spark.analysis.stempel import (
    stempel_filter_term,
    stempel_map,
    stempel_stem,
)

GOLDENS = os.path.join(os.path.dirname(__file__), "data",
                       "stempel_goldens.tsv.gz")


def _goldens():
    with gzip.open(GOLDENS, "rt", encoding="utf-8") as f:
        for line in f:
            w, g = line.rstrip("\n").split("\t")
            yield w, (None if g == " NULL" else g)


def test_goldens_full_sweep():
    n = 0
    for w, want in _goldens():
        assert stempel_stem(w) == want, w
        n += 1
    assert n == 28_299


def test_known_polish_inflections():
    """Real Polish morphology folds to a shared stem (the point of the
    table vs. a suffix-stripper)."""
    # 'kobietami'/'kobiecie' (instrumental pl / dative sg of 'woman')
    assert stempel_stem("kobietami") == stempel_stem("kobietom")
    # 'domach'/'domami' (locative/instrumental plural of 'house')
    assert stempel_stem("domach") == stempel_stem("domami")


def test_filter_gate_semantics():
    """StempelFilter.java:71-82: strictly-longer-than-minLength gate;
    unstemmable terms pass unchanged."""
    assert stempel_filter_term("abc") == "abc"          # len == 3: untouched
    assert stempel_filter_term("ab") == "ab"
    out = stempel_filter_term("kobietami")
    assert out == stempel_stem("kobietami")
    # a term the stemmer nulls comes through unchanged
    for w, want in _goldens():
        if want is None and len(w) > 3:
            assert stempel_filter_term(w) == w
            break


def test_term_map_changed_terms_only(spark):
    vocab = spark.createDataFrame(
        [("kobietami",), ("abc",), ("domach",)], "term string"
    )
    got = {r.term: r.new_term for r in stempel_map(vocab).collect()}
    assert "abc" not in got  # gate: len 3 passes through -> not in the map
    assert got.get("kobietami") == stempel_filter_term("kobietami")
    for t, nt in got.items():
        assert nt != t
