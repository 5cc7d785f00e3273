"""KStem: the full 12,130-pair reference golden corpus
(lucene/analysis/common/src/test/org/apache/lucene/analysis/en/
kstemTestData.zip -> kstem_examples.txt, gzipped verbatim into tests/data),
plus dictionary-behavior spot checks and the vocabulary term-map frame."""

import gzip
import os

import pytest

from lucene_solr_spark.analysis.kstem import kstem, kstem_batch, kstem_map

_GOLD = os.path.join(os.path.dirname(__file__), "data", "kstem_examples.txt.gz")


def _goldens():
    with gzip.open(_GOLD, "rt", encoding="utf-8") as fh:
        for line in fh:
            line = line.rstrip("\n")
            if line:
                a, b = line.split("\t")
                yield a, b


def test_reference_goldens_all():
    pairs = list(_goldens())
    assert len(pairs) == 12130
    got = kstem_batch([a for a, _ in pairs])
    bad = [(a, g, want) for (a, want), g in zip(pairs, got) if g != want]
    assert not bad, f"{len(bad)} mismatches, first 10: {bad[:10]}"


def test_dictionary_behaviors():
    # direct conflations and country nationalities (KStemmer.java tables)
    assert kstem("aging") == "age"
    assert kstem("italians") == "italy"     # plural -> italian -> italy
    assert kstem("mathematical") == "mathematics"
    # exception words block the -e heuristics (aides -> aide, aided -> aid)
    assert kstem("aides") == "aide"
    assert kstem("aided") == "aid"
    # dictionary-checked stems are real words, unlike Porter
    assert kstem("tables") == "table"
    assert kstem("memorized") == "memorize"
    assert kstem("memorial") == "memorial"
    # pass-throughs: short, non-alpha, over-long
    assert kstem("ab") == "ab"
    assert kstem("can't") == "can't"
    assert kstem("x" * 50) == "x" * 50


def test_term_map_frame(spark):
    vocab = spark.createDataFrame(
        [("tables",), ("merged",), ("table",), ("aging",)], "term string"
    )
    got = {r.term: r.new_term for r in kstem_map(vocab).collect()}
    # identity terms excluded; changed terms mapped
    assert got == {"tables": "table", "merged": "merge", "aging": "age"}
