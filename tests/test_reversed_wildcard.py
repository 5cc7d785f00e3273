"""ReversedWildcardFilter + factory gate + query rewrite.

Goldens from solr/core/src/test/org/apache/solr/analysis/
TestReversedWildcardFilterFactory.java (token streams :62-79, indexing
analysis incl. supplementary char :82-111, shouldReverse gate :160-171,
false positives :183-205).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.analysis.filters import (
    REVERSE_MARKER as M,
    reversed_wildcard_filter,
    should_reverse,
)
from lucene_solr_spark.search import ReversedWildcardQuery
from lucene_solr_spark.search.bm25 import _matched_terms_df


def _run(spark, toks, **kw):
    df = spark.createDataFrame([(toks,)], "toks array<string>")
    return df.select(
        reversed_wildcard_filter(F.col("toks"), **kw).alias("out")
    ).first().out


def test_reversed_tokens_with_original(spark):
    # java :68-71 — reversed (marker-first) emitted BEFORE the original
    assert _run(spark, ["simple", "text"]) == [
        M + "elpmis", "simple", M + "txet", "text"
    ]


def test_reversed_tokens_without_original(spark):
    # java :76-79
    assert _run(spark, ["simple", "text"], with_original=False) == [
        M + "elpmis", M + "txet"
    ]


def test_surrogate_pair_kept_in_order(spark):
    # java :86-96 — si𝄞x reverses to marker + x𝄞is
    tok = "si\U0001D11Ex"
    assert _run(spark, [tok], with_original=False) == [M + "x\U0001D11Eis"]


def test_should_reverse_gate_goldens():
    # java :160-171 with schema-reversed.xml field "two" args
    # (maxPosAsterisk=3, maxPosQuestion=2, minTrailing=1, maxFraction=0.33)
    kw = dict(max_pos_asterisk=3, max_pos_question=2, min_trailing=1,
              max_fraction_asterisk=0.33)
    assert should_reverse("*hree", **kw)
    assert should_reverse("t*ree", **kw)
    assert should_reverse("th*ee", **kw)
    assert not should_reverse("thr*e", **kw)
    assert should_reverse("?hree", **kw)
    assert should_reverse("t?ree", **kw)
    assert not should_reverse("th?ee", **kw)
    assert not should_reverse("th?*ee", **kw)
    assert not should_reverse("short*token", **kw)
    assert should_reverse("ver*longtoken", **kw)


def test_should_reverse_defaults():
    # factory defaults: maxPosAsterisk=2, maxPosQuestion=1, minTrailing=2
    assert should_reverse("*ing")
    assert should_reverse("?ing")
    assert not should_reverse("ing*")      # trailing wildcard: 1 < minTrailing
    assert not should_reverse("plain")     # no wildcard
    # java counts len - lastPos (wildcard slot included): "*g" -> 2, passes
    # minTrailing=2 and reverses; "g*" -> 1, blocked
    assert should_reverse("*g")
    assert not should_reverse("g*")
    assert should_reverse("a*ing")         # posA=1 < 2


@pytest.fixture(scope="module")
def tiny_index(spark):
    from lucene_solr_spark.index.builder import build_index

    docs = spark.createDataFrame(
        [(0, "gomez sings"), (1, "the song rings"), (2, "gomez walks")],
        "doc_id long, text string",
    )
    return build_index(spark, docs, key_col="doc_id", docid_col="doc_id",
                       num_index_partitions=2)


def _terms(index, pattern, **kw):
    q = ReversedWildcardQuery(pattern, **kw)
    return sorted(r.term for r in _matched_terms_df(index, q).collect())


def test_reversed_query_matches_plain_wildcard(tiny_index):
    # the reversed rewrite must return the SAME term set as a plain
    # dictionary LIKE scan — false-positive golden java :183-205
    assert _terms(tiny_index, "*ings") == ["rings", "sings"]
    assert _terms(tiny_index, "*omez") == ["gomez"]
    assert _terms(tiny_index, "*zemog") == []          # reversed text: no hit
    assert _terms(tiny_index, "s?ngs") == ["sings"]    # not reversed (gate)
    assert _terms(tiny_index, "?ings") == ["rings", "sings"]


def test_reversed_query_plan_is_prefix(tiny_index):
    # shouldReverse -> the filter must be a StartsWith (literal prefix on the
    # reversed dictionary), not a full-pattern LIKE scan
    q = ReversedWildcardQuery("*ings")
    plan = _matched_terms_df(tiny_index, q)._jdf.queryExecution().optimizedPlan().toString()
    assert "StartsWith" in plan or "startswith" in plan.lower()


def test_rewrite_equals_plain_wildcard_randomized(tiny_index, spark):
    """Property: for ANY pattern the gate accepts, the reversed-dictionary
    match set equals the plain LIKE scan's (python re as the spec)."""
    import random
    import re as _re

    rng = random.Random(42)
    vocab = [r.term for r in tiny_index.segments.select("term").collect()]
    alpha = "gsinr"
    for _ in range(40):
        n = rng.randint(2, 6)
        pat = "".join(rng.choice(alpha + "*?") for _ in range(n))
        if "*" not in pat and "?" not in pat:
            pat = "*" + pat
        # spec: full-match wildcard over the vocabulary
        rx = _re.compile(
            "^" + "".join(
                ".*" if c == "*" else "." if c == "?" else _re.escape(c)
                for c in pat
            ) + "$"
        )
        want = sorted(t for t in vocab if rx.match(t))
        got = _terms(tiny_index, pat)
        assert got == want, (pat, got, want)
