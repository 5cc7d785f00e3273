"""The fixture query set (FIXTURES.md §2, EnwikiQueryMaker.java:45-71 analog):
100 deterministic queries — 40 single terms across head/mid/tail df, 30
two-term AND, 15 two/three-term OR, 10 term+stopword strings, 5 no-match —
run through the engine and compared RANK-IDENTICALLY (docid order + 4dp
scores) against the independent pure-Python oracle; a WAND subsample
re-checks the kernel path on the same set."""

from __future__ import annotations

import pytest

from lucene_solr_spark.index.builder import build_index
from lucene_solr_spark.search import BooleanQuery, search
from lucene_solr_spark.search.bm25 import search_parsed
from lucene_solr_spark.search.wand import wand_search
from tests.oracle_py import make_oracle

K = 10


@pytest.fixture(scope="module")
def index(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return build_index(
        spark, docs, key_col="doc_id", docid_col="doc_id",
        num_index_partitions=8, persist=True,
    )


@pytest.fixture(scope="module")
def oracle(spark, sf_dir):
    rows = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    )
    return make_oracle([(int(r.doc_id), r.text) for r in rows])


def build_query_set(oracle) -> list[tuple[int, str, dict | str]]:
    """qid -> query spec, deterministic from the corpus df distribution."""
    vocab = [t for t, _ in sorted(oracle.df.items(), key=lambda x: (-x[1], x[0]))]
    n = len(vocab)
    third = max(n // 3, 1)
    head, mid, tail = vocab[:third], vocab[third : 2 * third], vocab[2 * third :]
    qs: list[tuple[int, str, dict | str]] = []
    qid = 1
    for i in range(40):  # single terms: head/mid/tail round-robin
        pool = (head, mid, tail)[i % 3]
        qs.append((qid, "bool", {"must": [pool[i % len(pool)]]}))
        qid += 1
    for i in range(30):  # two-term AND
        qs.append((qid, "bool", {"must": [vocab[i % n], vocab[(i + 7) % n]]}))
        qid += 1
    for i in range(15):  # two/three-term OR
        terms = [vocab[(2 * i) % n], vocab[(2 * i + 5) % n]]
        if i % 2:
            terms.append(vocab[(2 * i + 11) % n])
        qs.append((qid, "bool", {"should": list(dict.fromkeys(terms))}))
        qid += 1
    stop = ["the", "a", "of", "and", "to", "in", "is", "it", "that", "was"]
    for i in range(10):  # term + stopword via the string front door
        qs.append((qid, "parsed", f"{vocab[(3 * i) % n]} {stop[i]}"))
        qid += 1
    for i in range(5):  # guaranteed no-match
        qs.append((qid, "bool", {"must": [f"zzqx{i}nomatch"]}))
        qid += 1
    assert len(qs) == 100
    return qs


def _oracle_topk(oracle, spec) -> list[tuple[int, float]]:
    """Engine-ordered expectation: round to 4dp BEFORE ordering, docid ties."""
    if isinstance(spec, str):
        terms = [t for t in spec.split() if t in oracle.df or "zzqx" in t]
        raw = oracle.topk(should=terms, k=len(oracle.docids)) if terms else []
    else:
        raw = oracle.topk(k=len(oracle.docids), **spec)
    rounded = [(d, round(s, 4)) for d, s in raw]
    rounded.sort(key=lambda x: (-x[1], x[0]))
    return rounded[:K]


def _engine_topk(index, kind, spec) -> list[tuple[int, float]]:
    if kind == "parsed":
        df = search_parsed(index, spec, k=K)
    else:
        df = search(index, BooleanQuery.of(**spec), k=K)
    return [(int(r.docid), float(r.score)) for r in df.collect()]


def test_fixture_query_set_rank_identity(index, oracle):
    failures = []
    for qid, kind, spec in build_query_set(oracle):
        got = _engine_topk(index, kind, spec)
        want = _oracle_topk(oracle, spec)
        if got != want:
            failures.append((qid, spec, got[:3], want[:3]))
    assert not failures, f"{len(failures)} of 100 diverge: {failures[:5]}"


def test_fixture_query_set_wand_subsample(index, oracle):
    """Every 5th boolean query through the block-max WAND kernel — the
    second physical path must be rank-identical on the same set."""
    failures = []
    for qid, kind, spec in build_query_set(oracle)[::5]:
        if kind != "bool":
            continue
        want = _oracle_topk(oracle, spec)
        got = [
            (int(r.docid), float(r.score))
            for r in wand_search(index, BooleanQuery.of(**spec), k=K).collect()
        ]
        if got != want:
            failures.append((qid, spec, got[:3], want[:3]))
    assert not failures, f"WAND diverges on {len(failures)}: {failures[:5]}"


def test_group_func(spark):
    """group.func (Grouping.java CommandFunc): group by a function value."""
    from lucene_solr_spark.facets.facets import group_func
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(0, 3.0, 101), (1, 2.0, 155), (2, 1.0, 199), (3, 5.0, 250), (4, 4.0, 260)],
        "docid long, score double, n_chars long",
    )
    # bucket = floor(n_chars/100): {1: docs 0,1,2} {2: docs 3,4}
    out = group_func(
        df, "floor(div(n_chars,100))",
        [F.col("score").desc(), F.col("docid").asc()], k=2,
    ).collect()
    got = sorted((r.group_value, r.docid) for r in out)
    assert got == [(1, 0), (1, 1), (2, 3), (2, 4)]
    # offset skips the best row within each group
    out2 = group_func(
        df, "floor(div(n_chars,100))",
        [F.col("score").desc(), F.col("docid").asc()], k=1, offset=1,
    ).collect()
    assert sorted((r.group_value, r.docid) for r in out2) == [(1, 1), (2, 4)]


def test_stats_component_string(spark):
    """StringStatsValues: min/max by String.compareTo, count/missing only."""
    from lucene_solr_spark.facets.facets import stats_component_string

    df = spark.createDataFrame(
        [(0, "beta"), (1, "alpha"), (2, None), (3, "gamma"), (4, "alpha")],
        "docid long, src string",
    )
    r = stats_component_string(df, "src", calcdistinct=True).first()
    assert (r.stats_min, r.stats_max) == ("alpha", "gamma")
    assert (r.stats_count, r.stats_missing, r.stats_distinct) == (4, 1, 3)


def test_group_main_flattens(spark, sf_dir):
    """group.main=true: grouped heads flatten into one plain list, groups
    ordered by their best row, limit applied to the flat list."""
    from pyspark.sql import functions as F

    from lucene_solr_spark.facets.facets import group_main

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("doc_id").cast("long").alias("docid"), "lang", "n_chars"
    )
    out = group_main(
        docs, "lang", [F.desc("n_chars"), F.asc("docid")],
        group_limit=2, rows=6,
    ).collect()
    assert len(out) == 6
    # per-group contiguity and within-group ordering
    rows = [(r.lang, int(r.n_chars), int(r.docid)) for r in out]
    langs = [l for l, _, _ in rows]
    assert langs == sorted(langs, key=lambda l: langs.index(l))  # contiguous blocks
    by_lang = {}
    for l, n, d in rows:
        by_lang.setdefault(l, []).append((n, d))
    for l, pairs in by_lang.items():
        assert pairs == sorted(pairs, key=lambda p: (-p[0], p[1]))
        assert len(pairs) <= 2
