"""Tokenizer zoo (analysis/tokenizers.py) against the reference's
TestPathHierarchyTokenizer / TestPatternTokenizer cases, plus
Column-vs-Python differentials."""

import pytest

from lucene_solr_spark.analysis.tokenizers import (
    keyword_tokenize,
    keyword_tokenizer,
    letter_tokenize,
    letter_tokenizer,
    lowercase_tokenize,
    lowercase_tokenizer,
    path_hierarchy_tokenize,
    path_hierarchy_tokenizer,
    pattern_tokenize,
    pattern_tokenizer,
    whitespace_tokenize,
    whitespace_tokenizer,
)

# TestPathHierarchyTokenizer, every case
PATH_CASES = [
    ("/a/b/c", "/", None, 0, ["/a", "/a/b", "/a/b/c"]),
    ("/a/b/c/", "/", None, 0, ["/a", "/a/b", "/a/b/c", "/a/b/c/"]),
    ("a/b/c", "/", None, 0, ["a", "a/b", "a/b/c"]),
    ("a/b/c/", "/", None, 0, ["a", "a/b", "a/b/c", "a/b/c/"]),
    ("/", "/", None, 0, ["/"]),
    ("//", "/", None, 0, ["/", "//"]),
    ("/a/b/c", "/", "\\", 0, ["\\a", "\\a\\b", "\\a\\b\\c"]),
    ("c:\\a\\b\\c", "\\", None, 0,
     ["c:", "c:\\a", "c:\\a\\b", "c:\\a\\b\\c"]),
    ("/a/b/c", "/", None, 1, ["/b", "/b/c"]),
    ("/a/b/c/", "/", None, 1, ["/b", "/b/c", "/b/c/"]),
    ("a/b/c", "/", None, 1, ["/b", "/b/c"]),
]


@pytest.mark.parametrize("path,delim,rep,skip,expected", PATH_CASES)
def test_path_hierarchy_python(path, delim, rep, skip, expected):
    assert path_hierarchy_tokenize(path, delim, rep, skip) == expected


def test_path_hierarchy_column_differential(spark):
    from pyspark.sql import functions as F

    for path, delim, rep, skip, expected in PATH_CASES:
        df = spark.createDataFrame([(path,)], "p: string")
        got = df.select(
            path_hierarchy_tokenizer(F.col("p"), delim, rep, skip).alias(
                "t"
            )
        ).collect()[0][0]
        assert got == expected, (path, delim, rep, skip, got)


# TestPatternTokenizer.testSplitting
QPAT = r"\'([^\']+)\'"
PATTERN_CASES = [
    (-1, "--", "aaa--bbb--ccc", ["aaa", "bbb", "ccc"]),
    (-1, ":", "aaa:bbb:ccc", ["aaa", "bbb", "ccc"]),
    (-1, r"\s", "aaa   bbb \t\tccc  ", ["aaa", "bbb", "ccc"]),
    (-1, ":", "boo:and:foo", ["boo", "and", "foo"]),
    (-1, "o", "boo:and:foo", ["b", ":and:f"]),
    (0, ":", "boo:and:foo", [":", ":"]),
    (0, QPAT, "aaa 'bbb' 'ccc'", ["'bbb'", "'ccc'"]),
    (1, QPAT, "aaa 'bbb' 'ccc'", ["bbb", "ccc"]),
]


@pytest.mark.parametrize("group,pattern,inp,expected", PATTERN_CASES)
def test_pattern_python(group, pattern, inp, expected):
    assert pattern_tokenize(inp, pattern, group) == expected


def test_pattern_column_differential(spark):
    from pyspark.sql import functions as F

    for group, pattern, inp, expected in PATTERN_CASES:
        df = spark.createDataFrame([(inp,)], "s: string")
        got = df.select(
            pattern_tokenizer(F.col("s"), pattern, group).alias("t")
        ).collect()[0][0]
        assert got == expected, (group, pattern, inp, got)


def test_simple_tokenizers_python():
    assert whitespace_tokenize("foo bar\t baz ") == ["foo", "bar", "baz"]
    assert letter_tokenize("ab3cd ef-gh") == ["ab", "cd", "ef", "gh"]
    assert lowercase_tokenize("FooBar X9Y") == ["foobar", "x", "y"]
    assert keyword_tokenize("one whole value") == ["one whole value"]
    assert keyword_tokenize("") == []


def test_simple_tokenizers_column(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("Foo bar3 Baz-qux",)], "s: string"
    )
    row = df.select(
        whitespace_tokenizer(F.col("s")).alias("w"),
        letter_tokenizer(F.col("s")).alias("l"),
        lowercase_tokenizer(F.col("s")).alias("lc"),
        keyword_tokenizer(F.col("s")).alias("k"),
    ).collect()[0]
    assert row.w == ["Foo", "bar3", "Baz-qux"]
    assert row.l == ["Foo", "bar", "Baz", "qux"]
    assert row.lc == ["foo", "bar", "baz", "qux"]
    assert row.k == ["Foo bar3 Baz-qux"]
