"""Hyphenation compound splitting (analysis/hyphenation.py) against
the reference's TestCompoundWordTokenFilter expectations over the
da_UTF8.xml grammar."""

import os

import pytest

from lucene_solr_spark.analysis.hyphenation import (
    HyphenationTree,
    hyphenation_compound_decompose,
)

_XML = os.path.join(
    os.path.dirname(__file__), "data", "hyphenation_da_UTF8.xml"
)


@pytest.fixture(scope="module")
def tree():
    return HyphenationTree.from_xml(_XML)


def test_hyphenation_compound_words_da(tree):
    # testHyphenationCompoundWordsDA: dictionary-filtered split
    d = frozenset(["læse", "hest"])
    assert hyphenation_compound_decompose("læsehest", tree, d) == [
        "læsehest", "læse", "hest"
    ]
    # short tokens pass through untouched (minWordSize=5)
    for w in ["min", "som", "er", "lidt", "af", "en"]:
        assert hyphenation_compound_decompose(w, tree, d) == [w]
    assert hyphenation_compound_decompose("veninde", tree, d) == [
        "veninde"
    ]


def test_hyphenation_compound_words_de_longest_match(tree):
    # testHyphenationCompoundWordsDELongestMatch: 'basket' suppressed by
    # onlyLongestMatch (basketball wins at its start point)
    d = frozenset(["basketball", "basket", "ball", "kurv"])
    got = hyphenation_compound_decompose(
        "basketballkurv", tree, d,
        max_subword_size=40, only_longest_match=True,
    )
    assert got == ["basketballkurv", "basketball", "ball", "kurv"]


def test_hyphenation_only_no_dictionary(tree):
    # testHyphenationOnly: every hyphen-bounded part inside the size
    # window, no dictionary
    got = hyphenation_compound_decompose(
        "basketballkurv", tree, None,
        min_subword_size=2, max_subword_size=4,
    )
    assert got == ["basketballkurv", "ba", "sket", "bal", "ball", "kurv"]

    got = hyphenation_compound_decompose(
        "basketballkurv", tree, None,
        min_subword_size=4, max_subword_size=6,
    )
    assert got == [
        "basketballkurv", "basket", "sket", "ball", "lkurv", "kurv"
    ]

    got = hyphenation_compound_decompose(
        "basketballkurv", tree, None,
        min_subword_size=4, max_subword_size=10,
    )
    assert got == [
        "basketballkurv", "basket", "basketbal", "basketball", "sket",
        "sketbal", "sketball", "ball", "ballkurv", "lkurv", "kurv",
    ]


def test_non_letters_block_hyphenation(tree):
    # a non-letter in the middle aborts hyphenation (HyphenationTree
    # returns null) — the token passes through whole
    assert hyphenation_compound_decompose(
        "basket2ball", tree, None
    ) == ["basket2ball"]
    # too-short normalized words have no points either
    assert tree.hyphenate("a") is None


def test_classes_fold_uppercase(tree):
    # <classes> maps A->a etc., so case differences don't block points
    lower = tree.hyphenate("basketballkurv")
    upper = tree.hyphenate("BASKETBALLKURV")
    assert lower == upper
