"""MemoryIndex reverse search: corpus x registered-query matching vs a
Python set-semantics mirror."""

import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.analysis.analyzer import analyze_text
from lucene_solr_spark.search.memoryindex import match_queries

QUERIES = [
    (1, ["table", "scan"], [], 0),
    (2, [], ["merge", "vector"], 1),
    (3, ["table"], ["merge", "slow"], 2),
    (4, [], ["nonexistentterm"], 0),
]


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


@pytest.fixture(scope="module")
def qframe(spark):
    return spark.createDataFrame(
        QUERIES, "query_id int, must array<string>, should array<string>, mm int"
    )


def _py_matches(rows):
    out = set()
    for docid, text in rows:
        toks = set(analyze_text(text))
        for qid, must, should, mm in QUERIES:
            if any(t not in toks for t in must):
                continue
            sm = sum(1 for t in should if t in toks)
            need = mm if mm > 0 else (1 if not must else 0)
            if should and sm < need:
                continue
            if not must and not should:
                continue
            n = sum(1 for t in set(must) | set(should) if t in toks)
            out.add((docid, qid, n))
    return out


def test_match_queries(docs, qframe):
    got = {
        (int(r.docid), int(r.query_id), int(r.n_matched))
        for r in match_queries(docs, qframe).collect()
    }
    rows = [(int(r.doc_id), r.text) for r in docs.select("doc_id", "text").collect()]
    want = _py_matches(rows)
    assert got == want
    # the impossible query never matches
    assert not any(q == 4 for _, q, _ in got)
    # conjunction query is a subset of docs containing 'table'
    t_docs = {d for d, t in rows if "table" in analyze_text(t)}
    assert {d for d, q, _ in got if q == 1} <= t_docs


def test_match_queries_streaming(spark, tmp_path, qframe, docs):
    """Percolator over a STREAM: the same match_queries frame runs per
    micro-batch (stateless — the alerting production shape); stream output
    equals the batch run over the union of batches."""
    sample = docs.select("doc_id", "text").limit(40)
    rows = [(int(r.doc_id), r.text) for r in sample.collect()]
    inp = str(tmp_path / "in")
    for i in range(2):
        spark.createDataFrame(
            rows[i * 20:(i + 1) * 20], "doc_id long, text string"
        ).coalesce(1).write.parquet(f"{inp}/b{i}")
    stream = (
        spark.readStream.schema("doc_id long, text string").format("parquet")
        .option("maxFilesPerTrigger", 1)
        .load(f"{inp}/*")
    )
    hits: list[tuple] = []

    def sink(batch_df, _bid):
        # per-micro-batch matching: docs arrive once, so the per-batch
        # aggregate IS the stream answer (no cross-batch state needed)
        hits.extend(
            (int(r.docid), int(r.query_id), int(r.n_matched))
            for r in match_queries(batch_df, qframe).collect()
        )

    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = set(hits)
    want = {
        (int(r.docid), int(r.query_id), int(r.n_matched))
        for r in match_queries(
            spark.createDataFrame(rows, "doc_id long, text string"), qframe
        ).collect()
    }
    assert got == want and want
