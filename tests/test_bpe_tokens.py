"""BPE-ish pretoken counting (GPT-2 pretokenizer pattern, openai/gpt-2
encoder.py) — the Spark lookahead-free count formula vs the pure-Python
spec tokenizer with the real lookahead semantics."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from lucene_solr_spark.textops.analyze import (
    bpe_pretoken_count_expr,
    bpe_pretokenize_py,
    bpe_token_stats,
)

CASES = [
    "hello world",
    "it's a don't won't we're I'll you've I'm they'd",
    "a  b",              # >=2 run sheds one token
    "a   b",
    " leading",          # single space merges
    "  leading",
    "trailing ",
    "trailing   ",
    "\tword",            # hard whitespace never merges
    "\t\tword",
    " \tword",
    "\t \tword",
    " \t word",
    "a \tb",
    "tab\tsep\tvals",
    "line1\nline2\n",
    "multi!!! punct... (parens) [brackets]",
    "numbers 123 mixed a1b2 45.67",
    "unicode café naïve 東京 βήτα",
    "  ",
    " ",
    "",
    "price: $5.99!",
]


def test_python_spec_reconstructs_text():
    for t in CASES:
        assert "".join(bpe_pretokenize_py(t)) == t, repr(t)


def test_spark_count_matches_python_spec(spark):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(CASES)],
                               "doc_id long, text string")
    got = {
        r.docid: r.n
        for r in df.select(
            F.col("doc_id").alias("docid"),
            bpe_pretoken_count_expr(F.col("text")).alias("n"),
        ).collect()
    }
    for i, t in enumerate(CASES):
        assert got[i] == len(bpe_pretokenize_py(t)), repr(t)


@settings(max_examples=60, deadline=None)
@given(st.text(alphabet=" \t\nabcA1.'é", max_size=40))
def test_count_formula_randomized(raw):
    """The lookahead-free decomposition (base + shed + hard + trail) equals
    the spec tokenizer's count — verified in pure Python with Python's re
    (same Java-style lookahead semantics) standing in for the Spark scan."""
    import re

    base = len(re.findall(
        r"'s|'t|'re|'ve|'m|'ll|'d| ?[^\W\d_]+| ?\d+| ?[^\s\w]+|_+", raw
    ))
    # NB: python re lacks \p{L}; restrict the randomized alphabet to chars
    # where [^\W\d_] == \p{L} and \d == \p{N} ('_' folded into the punct
    # class via the explicit _+ alternative is NOT gpt-2 — alphabet has no _)
    shed = len(re.findall(r"\s{2,}\S", raw))
    hard = len(re.findall(r"[^\S ]\S", raw))
    trail = 1 if re.search(r"\s$", raw) else 0
    assert base + shed + hard + trail == len(bpe_pretokenize_py(raw))


def test_bpe_token_stats_frame(spark):
    df = spark.createDataFrame(
        [(7, "it's a  test\t"), (8, None)], "doc_id long, text string"
    )
    rows = {r.docid: r for r in bpe_token_stats(df).collect()}
    toks = bpe_pretokenize_py("it's a  test\t")
    assert rows[7].n_bpe_pretokens == len(toks)
    assert rows[7].n_ws_tokens == 3
    assert rows[8].n_bpe_pretokens == 0 and rows[8].n_ws_tokens == 0
    assert rows[8].bpe_per_ws == 0.0
