"""multiValued text fields through the index chain: per-value analysis,
positionIncrementGap, dl/norms from total emitted tokens (FieldInfo.java
SORTED_SET analog; DefaultIndexingChain.java:668-699 gap mechanics)."""

import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.analysis.analyzer import (
    POSITION_INCREMENT_GAP,
    analyze_multivalued_positions,
    multivalued_positioned_tokens_expr,
    multivalued_tokens_expr,
)
from lucene_solr_spark.index.builder import build_index

GAP = POSITION_INCREMENT_GAP


def _spark_positions(spark, values, gap=GAP):
    df = spark.createDataFrame([(values,)], "vals array<string>")
    row = df.select(
        multivalued_positioned_tokens_expr(F.col("vals"), gap=gap).alias("p")
    ).collect()[0]
    return [(s["pos"], s["term"]) for s in row.p]


CASES = [
    ["plain first value", "plain second value"],
    ["the table", "scan of data"],          # leading/trailing stopwords
    ["table scan the", "the merge"],        # trailing stop advances counter
    ["", "after empty"],                    # empty value: gap only
    [None, "after null"],                   # null value: gap only
    ["the of a", "survivors here"],         # all-stop value
    ["one"],                                # single value == scalar semantics
]


@pytest.mark.parametrize("values", CASES, ids=[str(i) for i in range(len(CASES))])
def test_positions_match_python_oracle(spark, values):
    assert _spark_positions(spark, values) == analyze_multivalued_positions(values)


def test_gap_arithmetic_golden(spark):
    # value 0: 'table'(0) 'scan'(1), raw count 2 -> offset_1 = 2 + GAP
    got = _spark_positions(spark, ["table scan", "merge pass"])
    assert got == [(0, "table"), (1, "scan"),
                   (2 + GAP, "merge"), (3 + GAP, "pass")]


@pytest.fixture(scope="module")
def mv_corpus(spark):
    rows = [
        (0, ["alpha table", "scan beta"]),   # phrase 'table scan' crosses values
        (1, ["alpha table scan beta"]),      # same words, one value
        (2, ["gamma merge", "table scan"]),  # phrase inside the second value
        (3, ["the", ""]),                    # stop-only + empty values
    ]
    return spark.createDataFrame(rows, "doc_id long, vals array<string>")


@pytest.fixture(scope="module")
def mv_index(spark, mv_corpus):
    return build_index(
        spark, mv_corpus, key_col="doc_id", docid_col="doc_id",
        text_col="vals", num_index_partitions=2, persist=False,
        build_positions=True, multivalued=True,
    )


def test_phrase_never_matches_across_value_boundary(spark, mv_index):
    from lucene_solr_spark.search import PhraseQuery, search

    hits = {r.docid for r in search(mv_index, PhraseQuery(("table", "scan")), k=10).collect()}
    assert hits == {1, 2}  # doc 0's 'table|scan' straddles the gap


def test_dl_counts_total_emitted_tokens(mv_index):
    dl = {r.docid: r.num_terms for r in mv_index.docs.collect()}
    # stopwords drop from dl; gaps never count
    assert dl == {0: 4, 1: 4, 2: 4, 3: 0}


def test_multivalued_split_equals_scalar_for_term_stats(spark):
    """Term-level statistics (df/cf/dl/norms) of a text split at a word
    boundary into two values equal the scalar field's — the gap only moves
    positions."""
    rows = [(i, f"alpha beta doc {i} table") for i in range(20)]
    scalar = spark.createDataFrame(rows, "doc_id long, text string")
    words = F.split(F.col("text"), " ")
    half = F.lit(3)
    mv = scalar.select(
        "doc_id",
        F.array(
            F.concat_ws(" ", F.slice(words, 1, 3)),
            F.concat_ws(" ", F.slice(words, 4, 100)),
        ).alias("vals"),
    )
    a = build_index(spark, scalar, key_col="doc_id", docid_col="doc_id",
                    num_index_partitions=2, persist=False)
    b = build_index(spark, mv, key_col="doc_id", docid_col="doc_id",
                    text_col="vals", num_index_partitions=2, persist=False,
                    multivalued=True)
    sa = {(r.term, r.df, r.cf) for r in a.segments.collect()}
    sb = {(r.term, r.df, r.cf) for r in b.segments.collect()}
    assert sa == sb
    da = {(r.docid, r.num_terms, r.norm_byte) for r in a.docs.collect()}
    db = {(r.docid, r.num_terms, r.norm_byte) for r in b.docs.collect()}
    assert da == db
    assert a.avgdl == b.avgdl
