"""Web-corpus cleaning operators: URL canonicalization + dedup, PII
redaction, within-doc line dedup."""

import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.textops.clean import (
    canonical_url,
    dedup_by_canonical_url,
    dedup_lines_within_doc,
    redact_pii,
)


def _canon(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [r.c for r in df.select(canonical_url(F.col("url")).alias("c")).collect()]


def test_canonical_url_rules(spark):
    got = _canon(spark, [
        "HTTPS://WWW.Example.COM/Path/Page/?utm_source=x&id=3#frag",
        "https://example.com/Path/Page?id=3",
        "http://example.com/",
        "http://example.com/a/?gclid=abc",
        "https://site.org/p?fbclid=1&utm_campaign=c",
    ])
    assert got[0] == "https://example.com/Path/Page?id=3"
    assert got[1] == "https://example.com/Path/Page?id=3"
    assert got[0] == got[1]  # tracking/case/slash variants collapse
    assert got[2] == "http://example.com/"  # bare root slash survives
    assert got[3] == "http://example.com/a"
    assert got[4] == "https://site.org/p"


def test_dedup_by_canonical_url(spark):
    rows = [
        (0, "https://www.a.com/x?utm_source=mail"),
        (1, "https://a.com/x"),
        (2, "https://a.com/y"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    kept = {r.doc_id for r in dedup_by_canonical_url(df).collect()}
    assert kept == {0, 2}  # min-key survivor of the {0,1} canonical group


def test_redact_pii(spark):
    rows = [(0, "mail me at jo.doe+x@site.org or call 555-123-4567 from 10.0.0.1")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = redact_pii(df).collect()[0].text
    assert "<EMAIL>" in out and "<PHONE>" in out and "<IP>" in out
    assert "site.org" not in out and "555" not in out and "10.0.0.1" not in out


def test_dedup_lines_within_doc(spark):
    text = "keep one\nrepeat me\nkeep two\nrepeat me\nrepeat me\nkeep three"
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    out = dedup_lines_within_doc(df).collect()[0].text
    assert out == "keep one\nrepeat me\nkeep two\nkeep three"
    # idempotent
    df2 = spark.createDataFrame([(0, out)], "doc_id long, text string")
    assert dedup_lines_within_doc(df2).collect()[0].text == out


def test_strip_boilerplate_lines(spark):
    rows = [(i, f"unique head {i}\nCOPYRIGHT FOOTER\nbody {i}") for i in range(6)]
    rows.append((99, "COPYRIGHT FOOTER"))  # footer-only doc -> empty text
    df = spark.createDataFrame(rows, "doc_id long, text string")
    from lucene_solr_spark.textops.clean import strip_boilerplate_lines

    out = {r.doc_id: r.text for r in strip_boilerplate_lines(df, min_docs=5).collect()}
    assert out[0] == "unique head 0\nbody 0"
    assert out[5] == "unique head 5\nbody 5"
    assert out[99] == ""  # all lines were boilerplate
    # below-threshold lines survive
    low = {r.doc_id: r.text for r in strip_boilerplate_lines(df, min_docs=50).collect()}
    assert low[0] == "unique head 0\nCOPYRIGHT FOOTER\nbody 0"


def test_canonical_url_root_and_ref(spark):
    got = _canon(spark, [
        "https://a.com",
        "https://a.com/",
        "https://a.com/?utm_source=x",
        "https://a.com?gclid=1",
        "https://repo.example/tree?ref=main",
        "https://repo.example/tree?ref=dev",
    ])
    assert got[0] == got[1] == got[2] == got[3] == "https://a.com/"
    assert got[4] != got[5]  # 'ref' selects content — never stripped


def test_redact_pii_hard_shapes(spark):
    rows = [(0, "call 5551234567 or mail jo.doe@10.0.0.1 now")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = redact_pii(df).collect()[0].text
    assert "5551234567" not in out and "<PHONE>" in out
    assert "jo.doe" not in out and "<EMAIL>" in out  # local part never leaks


def test_domain_blocklist(spark):
    from lucene_solr_spark.textops.clean import extract_domain, filter_blocked_domains

    docs = spark.createDataFrame(
        [
            (1, "https://evil.com/a"),
            (2, "https://sub.evil.com/b"),
            (3, "http://www.evil.com/c"),
            (4, "https://notevil.com/d"),
            (5, "https://good.org/e"),
            (6, "https://EVIL.com/upper"),
        ],
        "doc_id long, url string",
    )
    bl = spark.createDataFrame([("evil.com",), ("spam.net",)], "domain string")
    flagged = {
        int(r.doc_id): bool(r.blocked)
        for r in filter_blocked_domains(docs, bl, mode="flag").collect()
    }
    assert flagged == {1: True, 2: True, 3: True, 4: False, 5: False, 6: True}
    kept = {int(r.doc_id) for r in filter_blocked_domains(docs, bl).collect()}
    assert kept == {4, 5}
    # extract_domain strips www. and lowercases
    got = docs.select("doc_id", extract_domain(F.col("url")).alias("d")).collect()
    dd = {int(r.doc_id): r.d for r in got}
    assert dd[3] == "evil.com" and dd[6] == "evil.com" and dd[2] == "sub.evil.com"


def test_curation_pipeline_reason_priority(spark):
    from lucene_solr_spark.textops.clean import curation_pipeline

    good = " ".join(f"the wordy{i} of valued{i} nice{i}" for i in range(16))
    rows = [
        # blocked domain wins over everything else
        (0, good, "https://evil.com/a"),
        # url duplicate of doc 1 (same canonical url, higher id)
        (1, good + " one", "https://ok.org/p"),
        (2, good + " two", "https://ok.org/p"),
        # exact duplicate of doc 3
        (3, good + " three", "https://ok.org/x"),
        (4, good + " three", "https://ok.org/y"),
        # gopher fail: too short
        (5, "tiny", "https://ok.org/z"),
        # clean keeper
        (6, good + " six", "https://ok.org/w"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, url string")
    bl = spark.createDataFrame([("evil.com",)], "domain string")
    got = {
        int(r.docid): (bool(r.keep), r.reason)
        for r in curation_pipeline(
            docs, blocklist=bl, url_col="url"
        ).collect()
    }
    assert got[0] == (False, "blocked_domain")
    assert got[1][0] is True
    assert got[2] == (False, "url_duplicate")
    assert got[3][0] is True
    assert got[4] == (False, "exact_duplicate")
    assert got[5] == (False, "gopher_fail")
    assert got[6] == (True, "keep")


def test_curation_pipeline_decontaminate_stage(spark):
    from lucene_solr_spark.textops.clean import curation_pipeline
    from lucene_solr_spark.textops.dedup import shingles

    good = " ".join(f"the wordy{i} of valued{i} nice{i}" for i in range(16))
    eval_text = " ".join(
        f"the secret{i} of benchmark{i} answer{i}" for i in range(14)
    )
    leak = " ".join(eval_text.split()[:12])  # >= 3 eval shingles post-analysis
    rows = [
        (0, eval_text, None),
        (1, good + " " + leak, None),
        (2, good + " clean", None),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, url string")
    bench = shingles(docs.where(F.col("doc_id") == 0))
    got = {
        int(r.docid): r.reason
        for r in curation_pipeline(docs, benchmark=bench).collect()
    }
    assert got[0] == "contaminated"   # the eval doc flags itself
    assert got[1] == "contaminated"
    assert got[2] == "keep"
