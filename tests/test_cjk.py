"""CJK bigram analysis (analysis/cjk.py) vs the reference's expected token
streams (lucene/analysis/common/src/test/.../cjk/TestCJKAnalyzer.java) —
checked in all three engines: pure Python, Spark JVM expression, DuckDB
oracle SQL."""

import duckdb
import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.analysis.analyzer import ENGLISH_STOP_WORDS
from lucene_solr_spark.analysis.cjk import (
    CJK_GLOSS,
    cjk_bigram_tokens,
    cjk_bigram_tokens_expr,
    cjk_gloss_text_expr,
    cjk_oracle_tokens_sql,
    cjk_positioned_tokens_expr,
)

# (input, expected token stream) from TestCJKAnalyzer.java (stopwords kept:
# these streams contain none; the analyzer's stop filter applies after)
REFERENCE_STREAMS = [
    ("一二三四五六七八九十",
     ["一二", "二三", "三四", "四五", "五六", "六七", "七八", "八九", "九十"]),
    ("一 二三四 五六七八九 十",
     ["一", "二三", "三四", "五六", "六七", "七八", "八九", "十"]),
    ("abc defgh ijklmn opqrstu vwxy z",
     ["abc", "defgh", "ijklmn", "opqrstu", "vwxy", "z"]),
    ("あい", ["あい"]),
    ("あい   ", ["あい"]),
    ("test", ["test"]),
    ("あいtest", ["あい", "test"]),
    ("testあい    ", ["test", "あい"]),
    ("あいうえおabcかきくけこ",
     ["あい", "いう", "うえ", "えお", "abc", "かき", "きく", "くけ", "けこ"]),
    ("あいうえおabんcかきくけ こ",
     ["あい", "いう", "うえ", "えお", "ab", "ん", "c", "かき", "きく", "くけ",
      "こ"]),
    ("一 روبرت موير", ["一", "روبرت", "موير"]),
    ("𩬅艱鍟䇹愯瀛", ["𩬅艱", "艱鍟", "鍟䇹", "䇹愯", "愯瀛"]),
    ("一", ["一"]),
    ("一丁丂", ["一丁", "丁丂"]),
    ("한국어 텍스트", ["한국", "국어", "텍스", "스트"]),
]


@pytest.mark.parametrize("text,want", REFERENCE_STREAMS,
                         ids=[str(i) for i in range(len(REFERENCE_STREAMS))])
def test_python_reference_streams(text, want):
    assert cjk_bigram_tokens(text) == want


def test_duckdb_reference_streams():
    con = duckdb.connect()
    for text, want in REFERENCE_STREAMS:
        got = con.execute(
            "SELECT " + cjk_oracle_tokens_sql("?::VARCHAR"), [text]
        ).fetchone()[0]
        assert got == want, (text, got, want)


def test_spark_reference_streams(spark):
    df = spark.createDataFrame([(t,) for t, _ in REFERENCE_STREAMS],
                               "text string")
    rows = df.select(
        "text", cjk_bigram_tokens_expr(F.col("text")).alias("toks")
    ).collect()
    by_text = {t: w for t, w in REFERENCE_STREAMS}
    for r in rows:
        want = [w.lower() for w in by_text[r.text]
                if w.lower() not in ENGLISH_STOP_WORDS]
        assert r.toks == want, (r.text, r.toks, want)


def test_output_unigrams_mode():
    # CJKBigramFilterFactory outputUnigrams=true: unigrams + bigrams
    got = cjk_bigram_tokens("一二三", output_unigrams=True)
    assert sorted(got) == sorted(["一", "二", "三", "一二", "二三"])
    assert cjk_bigram_tokens("一", output_unigrams=True) == ["一"]


def test_positioned_positions_are_prefilter_ordinals(spark):
    # "the" is a stopword: position 1 must be gapped, CJK grams keep 0/2/3
    df = spark.createDataFrame([("一二 the 三",)], "text string")
    row = df.select(
        cjk_positioned_tokens_expr(F.col("text")).alias("p")
    ).collect()[0]
    assert [(s.pos, s.term) for s in row.p] == [(0, "一二"), (2, "三")]


def test_gloss_synthesis_cross_engine(spark):
    # Spark map-literal synthesis == DuckDB CASE synthesis, per doc
    from lucene_solr_spark.analysis.cjk import cjk_gloss_doc_source_sql

    sf = "/root/testdata/sf0.001"
    sdf = (
        spark.read.parquet(f"{sf}/documents.parquet")
        .select("doc_id", cjk_gloss_text_expr(F.col("text")).alias("text"))
        .orderBy("doc_id")
        .limit(20)
        .collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'"
    )
    odf = con.execute(
        cjk_gloss_doc_source_sql() + " ORDER BY docid LIMIT 20"
    ).fetchall()
    assert [(r.doc_id, r.text) for r in sdf] == [(d, t) for d, t in odf]
    # every gloss is pure CJK so the synthesized text forms contiguous runs
    assert all(all(ord(c) > 0x2E7F for c in t) for _, t in odf if t)


def test_gloss_map_covers_vocabulary():
    con = duckdb.connect()
    vocab = {
        r[0]
        for r in con.execute(
            "SELECT DISTINCT unnest(string_split(text, ' ')) FROM "
            "'/root/testdata/sf0.001/documents.parquet'"
        ).fetchall()
    }
    assert vocab <= set(CJK_GLOSS)
