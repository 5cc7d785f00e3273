"""Porter stemmer: golden parity with the reference's own test vocabulary,
plus the vocabulary-join index integration (build_index term_map)."""

import zipfile

import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.analysis.stemmer import (
    porter_stem,
    porter_stem_map,
    porter_stem_tokens,
)

_GOLDEN_ZIP = (
    "/root/reference/lucene/analysis/common/src/test/org/apache/lucene/"
    "analysis/en/porterTestData.zip"
)


def test_full_reference_golden_vocabulary():
    """Token-for-token parity with the 23,531-word voc/output pair the
    reference's TestPorterStemFilter uses."""
    with zipfile.ZipFile(_GOLDEN_ZIP) as z:
        voc = z.read("voc.txt").decode().split()
        out = z.read("output.txt").decode().split()
    assert len(voc) == len(out) == 23531
    mismatches = [
        (v, porter_stem(v), o) for v, o in zip(voc, out) if porter_stem(v) != o
    ]
    assert mismatches == []


def test_spot_checks_and_short_tokens():
    # spec examples + the implementation's short-token guard
    assert porter_stem("caresses") == "caress"
    assert porter_stem("ponies") == "poni"
    assert porter_stem("relational") == "relat"
    assert porter_stem("conditional") == "condit"
    assert porter_stem("controlling") == "control"
    assert porter_stem("probate") == "probat"
    assert porter_stem("rate") == "rate"
    assert porter_stem("cease") == "ceas"
    # length <= 2 passes through (PorterStemmer.java: if (k > 1))
    assert porter_stem("as") == "as"
    assert porter_stem("is") == "is"
    assert porter_stem_tokens(["tables", "querying"]) == ["tabl", "queri"]


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (0, "tables merged quickly"),
        (1, "the table merges values"),
        (2, "querying tabled queries"),
        (3, "unrelated words only"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _build(spark, corpus, **kw):
    from lucene_solr_spark.index.builder import build_index

    return build_index(
        spark, corpus, key_col="doc_id", docid_col="doc_id",
        num_index_partitions=2, persist=False, **kw,
    )


def test_stemmed_index_folds_inflections(spark, corpus):
    idx = _build(spark, corpus, term_map=porter_stem_map)
    terms = {r.term for r in idx.postings.select("term").distinct().collect()}
    # every surface inflection of table/merge/query folds to one stem
    assert "tabl" in terms and "merg" in terms and "queri" in terms
    assert not {"tables", "table", "tabled", "merges", "merged",
                "querying", "queries"} & terms
    df = {r.term: r.df for r in idx.segments.collect()}
    assert df["tabl"] == 3  # docs 0, 1, 2


def test_stemming_never_changes_norms(spark, corpus):
    """Stemming is 1:1 — dl/norms must be identical to the unstemmed build
    (Lucene computes norms from the token count after the full chain)."""
    plain = _build(spark, corpus)
    stemmed = _build(spark, corpus, term_map=porter_stem_map)
    a = {(r.docid, r.num_terms, r.norm_byte) for r in plain.docs.collect()}
    b = {(r.docid, r.num_terms, r.norm_byte) for r in stemmed.docs.collect()}
    assert a == b
    assert plain.sum_total_term_freq == stemmed.sum_total_term_freq


def test_stemmed_positions_path(spark, corpus):
    """term_map applies before the positions aggregation too: phrase-style
    position data carries stemmed terms at unchanged positions."""
    idx = _build(spark, corpus, term_map=porter_stem_map, build_positions=True)
    got = {
        (r.term, r.pos)
        for r in idx.positions.filter(F.col("docid") == 0).collect()
    }
    assert got == {("tabl", 0), ("merg", 1), ("quickli", 2)}
