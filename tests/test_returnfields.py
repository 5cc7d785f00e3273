"""fl= return-fields: projection, renames, function pseudo-fields
(SolrReturnFields.java:80-131)."""

import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.search.returnfields import parse_return_fields, return_fields


@pytest.fixture(scope="module")
def frame(spark):
    return spark.createDataFrame(
        [(0, "en", 100, 0.5), (1, "de", 400, 0.25)],
        "docid long, lang string, n_chars int, score double",
    )


def test_plain_and_rename(frame):
    out = return_fields(frame, "docid, language:lang, score")
    assert out.columns == ["docid", "language", "score"]
    assert {r.language for r in out.collect()} == {"en", "de"}


def test_function_pseudo_field(frame):
    import math

    out = {r.docid: r.len2 for r in
           return_fields(frame, "docid,len2:log(n_chars)").collect()}
    assert out[0] == pytest.approx(math.log10(100))
    assert out[1] == pytest.approx(math.log10(400))


def test_nested_function_and_star(frame):
    out = return_fields(frame, "docid, v:sum(log(n_chars),1)")
    assert out.columns == ["docid", "v"]
    allc = return_fields(frame, "*")
    assert allc.columns == frame.columns


def test_errors(frame):
    with pytest.raises(ValueError, match="needs alias"):
        parse_return_fields("log(n_chars)")
    with pytest.raises(ValueError, match="cannot be aliased"):
        parse_return_fields("x:*")
    with pytest.raises(ValueError, match="empty fl"):
        parse_return_fields("  , ")


def test_projection_prunes_scan(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = return_fields(docs, "doc_id, nc:log(n_chars)")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "text" not in plan.split("ReadSchema")[-1][:200]  # column pruning


def test_missing_separator_rejected(frame):
    with pytest.raises(ValueError, match="trailing tokens|bad fl"):
        return_fields(frame, "nc:log(n_chars)x").collect()


def test_deep_nesting_allowed(frame):
    out = return_fields(frame, "docid, v:sum(log(sum(n_chars,1)),1)")
    assert out.columns == ["docid", "v"]
    out.collect()


def test_star_dedupes_explicit(frame):
    out = return_fields(frame, "*, score")
    assert out.columns.count("score") == 1
    assert set(out.columns) == set(frame.columns)


def test_doc_transformers(spark):
    """[docid] / [value] (TransformerFactory.java:95-103 defaultFactories)."""
    from lucene_solr_spark.search.returnfields import return_fields
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(3, 1.5, "en")], "docid long, score double, lang string")
    out = return_fields(df, "lang, [docid], src:[value v=web t=str], n:[value v=7 t=int]")
    r = out.first()
    assert out.columns == ["lang", "[docid]", "src", "n"]
    assert (r["lang"], r["[docid]"], r["src"], r["n"]) == ("en", 3, "web", 7)


def test_explain_transformer_via_handler(spark):
    from lucene_solr_spark.handler import select
    from lucene_solr_spark.index.builder import build_index

    docs = spark.createDataFrame(
        [(0, "grand table scan"), (1, "table merge"), (2, "stream hash")],
        "doc_id long, text string",
    )
    idx = build_index(spark, docs, key_col="doc_id", docid_col="doc_id",
                      num_index_partitions=2)
    out = select(idx, {"q": "table", "rows": 5, "fl": "docid, score, [explain]"})
    rows = out["response"].collect()
    assert len(rows) == 2
    for r in rows:
        assert r["[explain]"].startswith("table: score=")
        assert "tf=" in r["[explain]"] and "df=" in r["[explain]"]
    import pytest as _pytest
    with _pytest.raises(ValueError, match="term query"):
        select(idx, {"q": "*:*", "rows": 2, "fl": "docid, [explain]"})


def test_child_doc_transformer(spark):
    from lucene_solr_spark.search.returnfields import attach_child_docs

    parents = spark.createDataFrame(
        [(1, 0.9), (2, 0.5), (3, 0.1)], "docid long, score double"
    )
    children = spark.createDataFrame(
        [
            (1, 11, "c11"), (1, 10, "c10"), (1, 12, "c12"),
            (2, 20, "skuX"), (3, 30, "c30"),
        ],
        "parent_id long, child_id long, name string",
    )
    out = attach_child_docs(parents, children, limit=2)
    rows = {int(r.docid): r._childDocuments_ for r in out.collect()}
    # child-key order, capped at limit
    assert [c.child_id for c in rows[1]] == [10, 11]
    assert [c.name for c in rows[2]] == ["skuX"]
    # childFilter prunes
    out2 = attach_child_docs(
        parents, children, child_filter=F.col("name").startswith("c")
    )
    rows2 = {int(r.docid): r._childDocuments_ for r in out2.collect()}
    assert rows2[2] is None and [c.child_id for c in rows2[1]] == [10, 11, 12]
