"""Multi-word synonym graph: classic SynonymFilter slot semantics
(SynonymFilter.java addOutput :461-507 — outputs distributed across the
matched block's position slots), rule parsing, and the index integration
that makes phrases match across expansion."""

import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.analysis.synonyms import (
    apply_synonyms,
    parse_rules,
    synonym_chain_positions,
    synonym_positioned_tokens_udf,
)
from lucene_solr_spark.index.builder import build_index


def test_parse_rules_forms():
    rules = parse_rules(["new york => ny", "# comment", "usa, united states"])
    by_inputs = {r.inputs: r for r in rules}
    assert by_inputs[("new", "york")].outputs == (("ny",),)
    assert not by_inputs[("new", "york")].keep_orig
    assert by_inputs[("usa",)].outputs == (("united", "states"),)
    assert by_inputs[("usa",)].keep_orig
    assert by_inputs[("united", "states")].outputs == (("usa",),)


def test_contraction_shifts_following_positions():
    rules = parse_rules(["new york => ny"])
    got = apply_synonyms(["i", "love", "new", "york", "city"], rules)
    assert got == [(0, "i"), (1, "love"), (2, "ny"), (3, "city")]


def test_expansion_stacks_and_inserts_positions():
    # classic flat-graph behavior: a 1->2 expansion with keepOrig stacks the
    # first output on the original and the second consumes a NEW position,
    # shifting what follows (SynonymGraphFilter, which fixes this, postdates
    # the reference)
    rules = parse_rules(["usa, united states"])
    got = apply_synonyms(["from", "usa", "we"], rules)
    assert got == [
        (0, "from"),
        (1, "usa"), (1, "united"),   # stacked at the original's slot
        (2, "states"),
        (3, "we"),
    ]
    # the reverse mapping: 2->1 with keepOrig keeps both input slots
    got2 = apply_synonyms(["united", "states", "here"], rules)
    assert got2 == [
        (0, "united"), (0, "usa"),
        (1, "states"),
        (2, "here"),
    ]


def test_longest_match_wins():
    rules = parse_rules(["big apple => nyc", "big => large"])
    assert apply_synonyms(["big", "apple"], rules) == [(0, "nyc")]
    assert apply_synonyms(["big", "city"], rules) == [(0, "large"), (1, "city")]


def test_chain_applies_stop_after_synonyms():
    # stop removal happens AFTER the graph, so gaps never break a match and
    # survivors keep their slot positions
    rules = parse_rules(["new york => ny"])
    got = synonym_chain_positions("The new york of dreams", rules)
    # the(0, stop) new york(1->ny) of(2, stop) dreams(3)
    assert got == [(1, "ny"), (3, "dreams")]


@pytest.fixture(scope="module")
def syn_index(spark):
    rows = [
        (0, "i love new york city"),
        (1, "new york state of mind"),
        (2, "plain york city words"),
        (3, "other text entirely here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    udf = synonym_positioned_tokens_udf(parse_rules(["new york => ny"]))
    return build_index(
        spark, df, key_col="doc_id", docid_col="doc_id",
        num_index_partitions=2, persist=False, build_positions=True,
        positioned_tokens_col=udf(F.col("text")),
    )


def test_index_positions_match_python_chain(spark, syn_index):
    got = sorted(
        (r.docid, r.pos, r.term) for r in syn_index.positions.collect()
    )
    rules = parse_rules(["new york => ny"])
    texts = {0: "i love new york city", 1: "new york state of mind",
             2: "plain york city words", 3: "other text entirely here"}
    want = sorted(
        (d, p, t)
        for d, txt in texts.items()
        for p, t in synonym_chain_positions(txt, rules)
    )
    assert got == want


def test_phrase_matches_across_contraction(spark, syn_index):
    from lucene_solr_spark.search import PhraseQuery, search

    hits = {r.docid for r in search(syn_index, PhraseQuery(("ny", "city")), k=10).collect()}
    assert hits == {0}  # 'new york city' -> 'ny city'; doc 2's 'york city' unaffected
    # the consumed surface forms are gone from the index
    terms = {r.term for r in syn_index.segments.collect()}
    assert "ny" in terms and "new" not in terms and "york" in terms  # doc 2 keeps bare 'york'


def test_discount_overlaps_dl(spark):
    """Stacked (posInc=0) synonym tokens never count toward dl/norms
    (BM25Similarity computeNorm discountOverlaps default)."""
    rows = [(0, "from usa we speak")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    udf = synonym_positioned_tokens_udf(parse_rules(["usa, united states"]))
    idx = build_index(
        spark, df, key_col="doc_id", docid_col="doc_id",
        num_index_partitions=1, persist=False, build_positions=True,
        positioned_tokens_col=udf(F.col("text")),
    )
    # slots: from(0) usa|united(1) states(2) we(3) speak(4) -> 5 occupied
    assert idx.docs.collect()[0].num_terms == 5
    # ...while the emitted token count is 6 (the stacked 'united')
    assert idx.postings.agg(F.sum("tf")).collect()[0][0] == 6
