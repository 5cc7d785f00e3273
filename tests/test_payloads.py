"""Payload family: DelimitedPayloadTokenFilter parsing (first-delimiter
split, encoder typing, null for payload-less tokens) and PayloadTermQuery
scoring (avg/min/max folds, isPayloadAvailable skip, includeSpanScore),
differential vs a pure-Python oracle."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.analysis.payloads import (
    build_payload_index,
    delimited_payload_tokens,
)
from lucene_solr_spark.search.payloadquery import payload_term_topk


def _parse(spark, text, encoder="float", delimiter="|"):
    df = spark.createDataFrame([(text,)], "t string")
    row = df.select(
        delimited_payload_tokens(F.col("t"), delimiter, encoder).alias("p")
    ).collect()[0]
    return [(s["term"], s["payload"]) for s in row.p]


def test_delimited_parse_float(spark):
    got = _parse(spark, "foo|3.5 bar baz|7")
    assert got == [("foo", 3.5), ("bar", None), ("baz", 7.0)]


def test_delimited_first_delimiter_only(spark):
    # java :57-63 splits at the FIRST delimiter; the rest is all payload
    got = _parse(spark, "q|1|2", encoder="identity")
    assert got == [("q", "1|2")]


def test_delimited_integer_encoder(spark):
    got = _parse(spark, "a|42 b|7", encoder="integer")
    assert got == [("a", 42.0), ("b", 7.0)]


def test_delimited_float32_parse(spark):
    # FloatEncoder parses float32 (PayloadHelper.encodeFloat): 0.1 -> f32(0.1)
    got = _parse(spark, "x|0.1")
    assert got == [("x", float(np.float32("0.1")))]


def _payload_docs(spark, n=60):
    """Synthetic payload-delimited corpus derived from docid arithmetic."""
    d = F.col("doc_id").cast("long")
    text = F.concat(
        F.lit("alpha|"), (d % 10).cast("string"),
        F.lit(".5 beta|"), (d % 7).cast("string"),
        F.lit(" alpha|"), ((d * 7) % 5).cast("string"),
        F.lit(" gamma"),
        F.when(d % 3 == 0, F.lit(" alpha")).otherwise(F.lit("")),
    )
    base = spark.range(n).select(F.col("id").alias("doc_id"))
    return base.select("doc_id", text.alias("text"))


@pytest.fixture(scope="module")
def pindex(spark):
    return build_payload_index(spark, _payload_docs(spark))


def _py_oracle(n_docs, function, include_span=True, k=10):
    """Pure-Python mirror: tf/dl/payloads from the same docid arithmetic,
    dl_approx through the engine's norm quantization, BM25 span score."""
    from lucene_solr_spark.smallfloat import NORM_TABLE, encode_norm

    rows = []
    total_dl = 0
    for d in range(n_docs):
        extra = d % 3 == 0
        total_dl += 5 if extra else 4
    avgdl = float(np.float32(total_dl / n_docs))
    for d in range(n_docs):
        extra = d % 3 == 0
        tf = 3 if extra else 2
        dl = 5 if extra else 4
        dl_approx = float(NORM_TABLE[int(encode_norm(dl)[0])])
        pays = [d % 10 + 0.5, float((d * 7) % 5)]
        if function == "avg":
            pay = sum(pays) / len(pays)
        elif function == "min":
            pay = min(pays)
        else:
            pay = max(pays)
        df = n_docs  # alpha in every doc
        idf = math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))
        span = idf * 2.2 * tf / (tf + 1.2 * (0.25 + 0.75 * dl_approx / avgdl))
        s = span * pay if include_span else pay
        rows.append((d, s))
    rows.sort(key=lambda x: (-round(x[1], 6), x[0]))
    return rows[:k]


def _compare(got, want):
    # Spark round() is HALF_UP, Python round() is HALF_EVEN — compare with
    # tolerance on the unrounded oracle values, exact on the doc order
    assert [d for d, _ in got] == [d for d, _ in want], (got, want)
    for (gd, gs), (wd, ws) in zip(got, want):
        assert abs(gs - ws) < 1e-3 * max(1.0, abs(ws)), (gd, gs, ws)


@pytest.mark.parametrize("function", ["avg", "min", "max"])
def test_payload_term_functions(pindex, function):
    got = [
        (int(r.docid), float(r.score))
        for r in payload_term_topk(pindex, "alpha", function=function, k=10).collect()
    ]
    _compare(got, _py_oracle(60, function))


def test_payload_score_only(pindex):
    got = [
        (int(r.docid), float(r.score))
        for r in payload_term_topk(
            pindex, "alpha", function="max", include_span_score=False, k=10
        ).collect()
    ]
    _compare(got, _py_oracle(60, "max", include_span=False))


def test_payloadless_occurrences_skipped(pindex):
    """gamma never carries a payload -> payloadScore 1 -> score = span score."""
    got = payload_term_topk(pindex, "gamma", function="avg", k=5).collect()
    assert len(got) == 5
    # every doc has exactly one gamma, dl in {4,5}: two distinct score levels
    assert len({float(r.score) for r in got}) <= 2


def test_type_as_payload(spark):
    from lucene_solr_spark.analysis.payloads import type_as_payload_tokens

    df = spark.createDataFrame([("foo 42 한국 中",)], "t string")
    row = df.select(type_as_payload_tokens(F.col("t")).alias("p")).collect()[0]
    got = [(s["term"], s["payload"]) for s in row.p]
    assert got == [
        ("foo", "<ALPHANUM>"), ("42", "<NUM>"),
        ("한국", "<HANGUL>"), ("中", "<IDEOGRAPHIC>"),
    ]


def test_numeric_payload_filter(spark):
    from lucene_solr_spark.analysis.payloads import numeric_payload_tokens

    df = spark.createDataFrame([("foo 42 bar",)], "t string")
    row = df.select(
        numeric_payload_tokens(F.col("t"), 7.5, "<ALPHANUM>").alias("p")
    ).collect()[0]
    got = [(s["term"], s["payload"]) for s in row.p]
    assert got == [("foo", 7.5), ("42", None), ("bar", 7.5)]


def test_token_offset_payload(spark):
    from lucene_solr_spark.analysis.payloads import token_offset_payload_tokens

    df = spark.createDataFrame([("ab cd ab",)], "t string")
    row = df.select(
        token_offset_payload_tokens(F.col("t")).alias("p")
    ).collect()[0]
    got = [(s["term"], s["start_offset"], s["end_offset"]) for s in row.p]
    # the second 'ab' must resolve PAST the first occurrence
    assert got == [("ab", 0, 2), ("cd", 3, 5), ("ab", 6, 8)]


def _near_py_oracle(n_docs, terms, slop, function, include_span=True, k=10):
    """Python mirror of payload_near_topk over the synthetic corpus."""
    from lucene_solr_spark.smallfloat import NORM_TABLE, encode_norm

    total_dl = sum(5 if d % 3 == 0 else 4 for d in range(n_docs))
    avgdl = float(np.float32(total_dl / n_docs))

    def doc_tokens(d):
        toks = [
            ("alpha", d % 10 + 0.5),
            ("beta", float(d % 7)),
            ("alpha", float((d * 7) % 5)),
            ("gamma", None),
        ]
        if d % 3 == 0:
            toks.append(("alpha", None))
        return toks

    # df per term over the corpus
    df = {}
    for d in range(n_docs):
        for t in {t for t, _ in doc_tokens(d)}:
            df[t] = df.get(t, 0) + 1
    t0, t1 = terms
    idf = sum(
        math.log(1.0 + (n_docs - df.get(t, 0) + 0.5) / (df.get(t, 0) + 0.5))
        for t in terms
    )
    hits = []
    for d in range(n_docs):
        toks = doc_tokens(d)
        dl = len(toks)
        dl_approx = float(NORM_TABLE[int(encode_norm(dl)[0])])
        spans, pays = [], []
        for p0, (t, pay0) in enumerate(toks):
            if t != t0:
                continue
            nxt = [(e, pv) for e, (tt, pv) in enumerate(toks) if tt == t1 and e > p0]
            if not nxt:
                continue
            e, pay1 = min(nxt)
            ml = e - p0 - 1
            if ml <= slop:
                spans.append(ml)
                pays.extend(x for x in (pay0, pay1) if x is not None)
        if not spans:
            continue
        tf = sum(1.0 / (1 + m) for m in spans)
        if pays:
            if function == "avg":
                ps = sorted(pays)
                acc = 0.0
                for x in ps:
                    acc += x
                pay = acc / len(ps)
            elif function == "min":
                pay = min(pays)
            else:
                pay = max(pays)
        else:
            pay = 1.0
        span = idf * 2.2 * tf / (tf + 1.2 * (0.25 + 0.75 * dl_approx / avgdl))
        hits.append((d, (span * pay) if include_span else pay))
    hits.sort(key=lambda x: (-round(x[1], 6), x[0]))
    return hits[:k]


@pytest.mark.parametrize("function", ["avg", "min", "max"])
def test_payload_near_adjacent(pindex, function):
    from lucene_solr_spark.search.payloadquery import payload_near_topk

    got = [
        (int(r.docid), float(r.score))
        for r in payload_near_topk(
            pindex, ["alpha", "beta"], slop=0, function=function, k=10
        ).collect()
    ]
    _compare(got, _near_py_oracle(60, ["alpha", "beta"], 0, function))


def test_payload_near_slop_and_null_payload(pindex):
    from lucene_solr_spark.search.payloadquery import payload_near_topk

    # beta .. gamma needs slop 1; gamma has no payload -> fold sees beta's only
    got = [
        (int(r.docid), float(r.score))
        for r in payload_near_topk(
            pindex, ["beta", "gamma"], slop=1, function="avg", k=10
        ).collect()
    ]
    _compare(got, _near_py_oracle(60, ["beta", "gamma"], 1, "avg"))
    # slop 0 finds nothing (one token between them)
    assert (
        payload_near_topk(pindex, ["beta", "gamma"], slop=0, k=10).count() == 0
    )


def test_span_payload_check(pindex):
    from lucene_solr_spark.search.payloadquery import span_payload_check_topk

    # beta's payload is docid % 7 — requiring 3.0 keeps only docid%7==3 docs
    got = span_payload_check_topk(pindex, "beta", [3.0], k=100).collect()
    ids = {int(r.docid) for r in got}
    assert ids == {d for d in range(60) if d % 7 == 3}
    # gamma never carries a payload -> payload-less spans pass regardless
    got_g = span_payload_check_topk(pindex, "gamma", [99.0], k=100).collect()
    assert len(got_g) == 60
    # multi-payload sequence can never match a term span with a payload
    got_m = span_payload_check_topk(pindex, "beta", [1.0, 2.0], k=100).collect()
    assert got_m == []


def test_type_token_filter(spark):
    from lucene_solr_spark.analysis.payloads import type_token_filter

    df = spark.createDataFrame([("foo 42 bar 7 한국",)], "t string")
    drop_num = df.select(
        type_token_filter(F.col("t"), ("<NUM>",)).alias("p")
    ).collect()[0].p
    assert list(drop_num) == ["foo", "bar", "한국"]
    only_num = df.select(
        type_token_filter(F.col("t"), ("<NUM>",), use_whitelist=True).alias("p")
    ).collect()[0].p
    assert list(only_num) == ["42", "7"]
