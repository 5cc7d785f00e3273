"""lucene/expressions JavaScript compiler analog: operator semantics,
DEFAULT_FUNCTIONS table, bindings — evaluated per-case against Python
mirrors of the JavascriptCompiler bytecode semantics."""

import math

import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.functions.expressions import compile_expression


def _eval(spark, src, bindings=None, row=None):
    df = spark.createDataFrame(
        [row or (0,)], "x double" if row else "dummy int"
    )
    return df.select(
        compile_expression(src, bindings).alias("v")
    ).collect()[0].v


CASES = [
    # arithmetic, precedence, parens, literals
    ("1 + 2 * 3", 7.0),
    ("(1 + 2) * 3", 9.0),
    ("7 / 2", 3.5),
    ("7 % 3", 1.0),
    ("-7 % 3", -1.0),  # Java remainder keeps the dividend's sign
    ("2 - -3", 5.0),
    ("0x1F", 31.0),
    ("010", 8.0),  # octal (Javascript.g NUMBER)
    ("1.5e2", 150.0),
    # comparison / equality -> 1.0 / 0.0
    ("3 > 2", 1.0),
    ("3 <= 2", 0.0),
    ("2 == 2", 1.0),
    ("2 != 2", 0.0),
    # logical
    ("1 && 0", 0.0),
    ("1 || 0", 1.0),
    ("!0", 1.0),
    ("!3", 0.0),
    # ternary
    ("1 ? 10 : 20", 10.0),
    ("0 ? 10 : 20", 20.0),
    ("3 > 2 ? 2 + 2 : 1", 4.0),
    # bitwise on long-truncated operands
    ("6 & 3", 2.0),
    ("6 | 3", 7.0),
    ("6 ^ 3", 5.0),
    ("~5", float(~5)),
    ("1 << 4", 16.0),
    ("-16 >> 2", -4.0),
    ("16 >>> 2", 4.0),
    # functions
    ("abs(-4.5)", 4.5),
    ("sqrt(16)", 4.0),
    ("ln(1)", 0.0),
    ("log10(1000)", 3.0),
    ("logn(2, 8)", 3.0),
    ("min(3, 7)", 3.0),
    ("max(3, 7)", 7.0),
    ("pow(2, 10)", 1024.0),
    ("ceil(1.2)", 2.0),
    ("floor(1.8)", 1.0),
    ("atan2(1, 1)", math.atan2(1, 1)),
    ("cosh(1)", math.cosh(1.0)),
    ("tanh(0.5)", math.tanh(0.5)),
    ("acosh(2)", math.acosh(2.0)),
    ("asinh(2)", math.asinh(2.0)),
    ("atanh(0.5)", math.atanh(0.5)),
]


@pytest.mark.parametrize("src,want", CASES)
def test_expression_cases(spark, src, want):
    got = _eval(spark, src)
    assert got == pytest.approx(want, rel=1e-12), (src, got, want)


def test_bindings_and_field_resolution(spark):
    got = _eval(
        spark,
        "sqrt(x) + score",
        bindings={"score": F.lit(2.0)},
        row=(9.0,),
    )
    assert got == 5.0


def test_nested_calls_and_composition(spark):
    got = _eval(spark, "max(sqrt(16), min(3, 7)) + (2 > 1 ? 0.5 : 100)")
    assert got == 4.5


def test_unknown_function_rejected(spark):
    with pytest.raises(ValueError):
        compile_expression("nope(1)")


def test_trailing_garbage_rejected(spark):
    with pytest.raises(ValueError):
        compile_expression("1 + 2 )")


def test_expression_sort_over_frame(spark, sf_dir):
    """sort-by-expression — the module's production use (ExpressionSortField)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    e = compile_expression("n_chars > 500 ? sqrt(n_chars) : ln(n_chars + 1)")
    got = (
        docs.select("doc_id", F.round(e, 4).alias("v"))
        .orderBy(F.desc("v"), F.asc("doc_id"))
        .limit(10)
        .collect()
    )
    rows = docs.select("doc_id", "n_chars").collect()
    want = []
    for r in rows:
        n = float(r.n_chars)
        v = math.sqrt(n) if n > 500 else math.log(n + 1)
        want.append((int(r.doc_id), round(v, 4)))
    want.sort(key=lambda t: (-t[1], t[0]))
    assert [(int(r.doc_id), float(r.v)) for r in got] == want[:10]
