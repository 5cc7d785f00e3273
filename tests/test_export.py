"""/export handler: {!xport} + SortingResponseWriter contract.

Reference: solr/core/src/java/org/apache/solr/search/ExportQParserPlugin.java
(RankQuery marking the full hit set) + solr/core/src/java/org/apache/solr/
response/SortingResponseWriter.java:72-192,262 (full sorted emission, sort/fl
required, no scoring, docvalues-typed fields only).
"""

from __future__ import annotations

import pytest

from lucene_solr_spark.handler import export
from lucene_solr_spark.index.builder import build_index


@pytest.fixture(scope="module")
def idx(spark):
    docs = spark.createDataFrame(
        [
            (0, "grand table scan", "en", 17),
            (1, "table merge plan", "de", 16),
            (2, "stream hash join", "en", 16),
            (3, "table stream scan", "fr", 17),
        ],
        "doc_id long, text string, lang string, n_chars int",
    )
    return build_index(
        spark, docs, key_col="doc_id", docid_col="doc_id",
        num_index_partitions=2, passthrough_cols=("lang", "n_chars"),
    )


def test_export_full_sorted_set(idx):
    df = export(idx, {"q": "table", "sort": "n_chars desc", "fl": "docid,lang,n_chars"})
    rows = [(r.docid, r.lang, r.n_chars) for r in df.collect()]
    # every 'table' doc (no rows window), n_chars desc, docid asc tie-break
    assert rows == [(0, "en", 17), (3, "fr", 17), (1, "de", 16)]
    assert df.columns == ["docid", "lang", "n_chars"]


def test_export_fq_composition(idx):
    df = export(
        idx,
        {"q": "table", "fq": "{!frange l=17}n_chars",
         "sort": "docid asc", "fl": "docid"},
    )
    assert [r.docid for r in df.collect()] == [0, 3]


def test_export_contract_errors(idx):
    with pytest.raises(ValueError, match="No sort criteria"):
        export(idx, {"q": "table", "fl": "docid"})
    with pytest.raises(ValueError, match="field list"):
        export(idx, {"q": "table", "sort": "n_chars desc"})
    with pytest.raises(ValueError, match="Scoring is not"):
        export(idx, {"q": "table", "sort": "score desc", "fl": "docid"})
    with pytest.raises(ValueError, match="Scoring is not"):
        export(idx, {"q": "table", "sort": "n_chars desc", "fl": "docid,score"})
    with pytest.raises(ValueError, match="types"):
        # a multivalued (array) column is not an exportable docvalues type
        spark = idx.docs.sparkSession
        stored = spark.createDataFrame(
            [(0, ["a", "b"])], "docid long, tags array<string>"
        )
        export(
            idx, {"q": "table", "sort": "docid asc", "fl": "docid,tags"},
            stored=stored,
        )
    with pytest.raises(ValueError, match="not a stored field"):
        export(idx, {"q": "table", "sort": "docid asc", "fl": "docid,nope"})


def test_export_plan_has_no_limit(idx):
    # the export plan must be an unbounded distributed sort (range-partition
    # + external sort), NOT a TakeOrderedAndProject top-k
    df = export(idx, {"q": "table", "sort": "n_chars desc", "fl": "docid"})
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" not in plan
    assert "Sort" in plan
