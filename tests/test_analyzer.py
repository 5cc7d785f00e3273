"""Token-level golden tests for the analyzer chain.

Pattern follows the reference's BaseTokenStreamTestCase.assertTokenStreamContents
(exact expected token arrays), with goldens derived by hand from the UAX#29
(Unicode 6.3) word-break rules that Lucene 4.10.5's StandardTokenizer
implements, plus StandardAnalyzer's 255-char cap, lowercase, and the 33-word
stop set.  Also asserts the three-engine parity: Python re == Spark JVM regex
== DuckDB RE2 on identical inputs.
"""

import duckdb
import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.analysis.analyzer import (
    ENGLISH_STOP_WORDS,
    analyze_text,
    analyze_text_positions,
    sql_quoted_pattern,
    tokens_expr,
)

GOLDENS = [
    # (input, expected final terms)
    ("Hello World", ["hello", "world"]),
    ("can't won't", ["can't", "won't"]),
    ("a.b.c d..e", ["a.b.c", "d", "e"]),  # single-dot joins letters, double breaks
    ("3.14 1,000 1.2.3", ["3.14", "1,000", "1.2.3"]),
    ("wi-fi state-of-the-art", ["wi", "fi", "state", "art"]),  # hyphen breaks; of/the stopped
    ("foo_bar x_1 _lead trail_", ["foo_bar", "x_1", "_lead", "trail_"]),  # ExtendNumLet
    ("abc123 a1.2b", ["abc123", "a1.2b"]),  # letter<->digit glue (WB9/10)
    ("x.1 1.x", ["x", "1", "1", "x"]),  # mixed types do NOT join across '.'
    ("The quick AND the dead", ["quick", "dead"]),  # stopwords (case-insensitive)
    ("O'Brien's", ["o'brien's"]),
    ("don't, stop. believing!", ["don't", "stop", "believing"]),
    ("A", []),  # lone stopword
    ("", []),
    ("  \t\n ", []),
    ("café Müller", ["café", "müller"]),  # round-3 ALetter supplement: Latin accents join
    ("日本語 test", ["日", "本", "語", "test"]),  # CJK: one token per ideograph
    ("x" * 255 + " ok", ["x" * 255, "ok"]),  # exactly 255 kept
    ("x" * 256 + " ok", ["ok"]),  # 256 dropped (StandardTokenizer maxTokenLength)
    ("IT is AT an ON", []),  # all stopwords
    ("1'000 can'T", ["1'000", "can't"]),  # Single_Quote joins digits and letters
]


@pytest.mark.parametrize("text,expected", GOLDENS)
def test_python_analyzer_goldens(text, expected):
    assert analyze_text(text) == expected


def test_positions_gap_semantics():
    # raw stream: the(0) quick(1) and(2) the(3) dead(4) -> stop leaves gaps
    assert analyze_text_positions("the quick and the dead") == [(1, "quick"), (4, "dead")]
    # over-long token advances position too (skippedPositions)
    big = "x" * 300
    assert analyze_text_positions(f"one {big} two") == [(0, "one"), (2, "two")]


def test_stopword_set_is_lucene_33():
    assert len(ENGLISH_STOP_WORDS) == 33
    assert len(set(ENGLISH_STOP_WORDS)) == 33
    for w in ("the", "a", "such", "will", "these", "into"):
        assert w in ENGLISH_STOP_WORDS


def test_jvm_regex_parity(spark):
    texts = [t for t, _ in GOLDENS] + [
        "edge'case' 'lead", "9.9.9.9 127.0.0.1", "e.g. i.e. U.S.A.",
        "a'b'c''d", "tab\tsep\nnewline", "MiXeD CaSe TeXt",
    ]
    df = spark.createDataFrame([(t,) for t in texts], ["text"])
    got = [r[0] for r in df.select(tokens_expr(F.col("text"))).collect()]
    want = [analyze_text(t) for t in texts]
    assert got == want


def test_duckdb_re2_parity():
    texts = [t for t, _ in GOLDENS] + ["9.9.9.9", "a'b'c''d", "e.g. i.e."]
    con = duckdb.connect()
    pat = sql_quoted_pattern()
    stop = ", ".join(f"'{w}'" for w in ENGLISH_STOP_WORDS)
    for t in texts:
        sq = t.replace("'", "''")
        rows = con.execute(
            f"""
            SELECT t FROM (
              SELECT lower(unnest(regexp_extract_all('{sq}', {pat}))) AS t
            ) WHERE length(t) BETWEEN 1 AND 255 AND t NOT IN ({stop})
            """
        ).fetchall()
        assert [r[0] for r in rows] == analyze_text(t), t


# ---------------------------------------------------------------------------
# token filter factories (§2.11 extension surface) — JVM-side array transforms
# ---------------------------------------------------------------------------

def _toks(spark, expr, text="the Quick brown foxes run fast"):
    from pyspark.sql import functions as F

    from lucene_solr_spark.analysis.analyzer import StandardAnalyzer

    df = spark.createDataFrame([(text,)], "text string")
    base = StandardAnalyzer().tokens_col(F.col("text"))
    return df.select(expr(base).alias("t")).collect()[0].t


def test_synonym_filter(spark):
    from lucene_solr_spark.analysis.filters import synonym_filter

    got = _toks(spark, lambda t: synonym_filter(t, {"quick": "fast", "run": "sprint"}))
    assert got == ["fast", "brown", "foxes", "sprint", "fast"]


def test_shingle_filter(spark):
    from lucene_solr_spark.analysis.filters import shingle_filter

    got = _toks(spark, lambda t: shingle_filter(t, n=2))
    assert got == ["quick brown", "brown foxes", "foxes run", "run fast"]
    # fewer tokens than n -> empty
    assert _toks(spark, lambda t: shingle_filter(t, n=3), text="the word") == []


def test_edge_and_char_ngrams(spark):
    from lucene_solr_spark.analysis.filters import edge_ngram_filter, ngram_filter

    got = _toks(spark, lambda t: edge_ngram_filter(t, 2, 3), text="scan x")
    assert got == ["sc", "sca"]  # 'x' shorter than min_gram drops out
    got2 = _toks(spark, lambda t: ngram_filter(t, 2, 2), text="scan y")
    assert got2 == ["sc", "ca", "an"]


def test_english_minimal_stem_and_length(spark):
    from lucene_solr_spark.analysis.filters import english_minimal_stem, length_filter

    got = _toks(spark, english_minimal_stem, text="foxes pass bus axis dogs is")
    # foxes->foxe dogs->dog; pass/bus/axis keep; 'is' is a stopword upstream
    assert got == ["foxe", "pass", "bus", "axis", "dog"]
    got2 = _toks(spark, lambda t: length_filter(t, 4, 5), text="go fast table scanner")
    assert got2 == ["fast", "table"]


# ---------------------------------------------------------------------------
# CJK token types: tri-engine parity (JVM regex / Python re / DuckDB RE2)
# ---------------------------------------------------------------------------

_CJK_SAMPLES = [
    "日本語のテキスト",          # Han x3, Hiragana 'の', Katakana run 'テキスト'
    "スパーク ストリーム 処理",   # Katakana runs with prolonged mark + Han
    "한국어 검색 엔진",           # Hangul syllable runs
    "mixed 漢字 and カタカナ2000", # Latin + Han + Katakana + digits
    "ひらがな",                  # Hiragana: one char per token
    "ภาษาไทย test ไทย",          # Thai <SOUTHEAST_ASIAN> runs + Latin
    "ພາສາລາວ ແລະ",               # Lao <SOUTHEAST_ASIAN> runs
]


@pytest.mark.parametrize("text", _CJK_SAMPLES)
def test_cjk_tri_engine_parity(spark, text):
    import duckdb
    from pyspark.sql import functions as F

    from lucene_solr_spark.analysis.analyzer import (
        analyze_text,
        sql_quoted_pattern,
        tokens_expr,
    )

    py = analyze_text(text)
    jvm = (
        spark.createDataFrame([(text,)], "text string")
        .select(tokens_expr(F.col("text")).alias("t"))
        .collect()[0]
        .t
    )
    con = duckdb.connect()
    stop = ", ".join(f"'{w}'" for w in ENGLISH_STOP_WORDS)
    rows = con.execute(
        f"""SELECT t FROM (
              SELECT lower(unnest(regexp_extract_all(?, {sql_quoted_pattern()}))) AS t
            ) WHERE length(t) BETWEEN 1 AND 255 AND t NOT IN ({stop})""",
        [text],
    ).fetchall()
    re2 = [r[0] for r in rows]
    assert py == jvm == re2
    assert len(py) > 0


def test_uax29_url_email_goldens():
    from lucene_solr_spark.analysis.analyzer import uax29_url_email_analyzer

    a = uax29_url_email_analyzer()
    assert a.analyze("Contact Admin@Example.COM or visit the site") == [
        "contact", "admin@example.com", "visit", "site",
    ]
    assert a.analyze("see https://spark.apache.org/docs/latest?x=1#frag now") == [
        "see", "https://spark.apache.org/docs/latest?x=1#frag", "now",
    ]
    assert a.analyze("FTP://Files.Example.com and http://host:8080/a/b-c_d") == [
        "ftp://files.example.com", "http://host:8080/a/b-c_d",
    ]
    # plain text identical to the standard chain
    from lucene_solr_spark.analysis.analyzer import analyze_text

    plain = "The quick brown fox can't stop 3.14 foo_bar"
    assert a.analyze(plain) == analyze_text(plain)


@pytest.mark.parametrize(
    "text",
    [
        "Contact Admin@Example.COM or visit https://spark.apache.org/x?a=1 now",
        "FTP://Files.Example.com and http://host:8080/a/b-c_d done",
        "plain words user.name+tag@sub.domain.org trailing",
    ],
)
def test_uax29_url_email_tri_engine_parity(spark, text):
    import duckdb
    from pyspark.sql import functions as F

    from lucene_solr_spark.analysis.analyzer import (
        sql_quote_pattern,
        uax29_url_email_analyzer,
    )

    a = uax29_url_email_analyzer()
    py = a.analyze(text)
    jvm = (
        spark.createDataFrame([(text,)], "text string")
        .select(a.tokens_col(F.col("text")).alias("t"))
        .collect()[0]
        .t
    )
    con = duckdb.connect()
    stop = ", ".join(f"'{w}'" for w in ENGLISH_STOP_WORDS)
    rows = con.execute(
        f"""SELECT t FROM (
              SELECT lower(unnest(regexp_extract_all(?, {sql_quote_pattern(a.pattern)}))) AS t
            ) WHERE length(t) BETWEEN 1 AND 255 AND t NOT IN ({stop})""",
        [text],
    ).fetchall()
    re2 = [r[0] for r in rows]
    assert py == jvm == re2
    assert len(py) > 0


def test_cjk_token_type_shapes():
    from lucene_solr_spark.analysis.analyzer import analyze_text

    # Han + Hiragana single-char, Katakana run
    assert analyze_text("日本語のテキスト") == ["日", "本", "語", "の", "テキスト"]
    # Hangul runs
    assert analyze_text("한국어 검색") == ["한국어", "검색"]
    # Hiragana one per char
    assert analyze_text("ひらがな") == ["ひ", "ら", "が", "な"]
    # Thai/Lao: whole-script runs (<SOUTHEAST_ASIAN>)
    assert analyze_text("ภาษาไทย กับ test") == ["ภาษาไทย", "กับ", "test"]
    assert analyze_text("ພາສາລາວ") == ["ພາສາລາວ"]
