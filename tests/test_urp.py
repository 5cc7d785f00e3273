"""UpdateRequestProcessor chain: each processor vs its reference factory's
documented effect, plus ordered composition."""

import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.index import urp


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "  The same text  ", "en", None),
        (1, "The same text", "en", "web"),
        (2, "The same text", None, "web"),      # exact dup of 1 (post-trim of 0 too)
        (3, "<p>Hello <b>world</b></p>", "de", "crawl"),
        (4, "different entirely", "en", "web"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")


def test_signature_and_dedupe(docs):
    sig = urp.signature(docs, ["text"], out="signature")
    vals = {r.doc_id: r.signature for r in sig.collect()}
    assert vals[1] == vals[2] and vals[1] != vals[4]
    kept = {r.doc_id for r in urp.dedupe(sig, "doc_id").collect()}
    assert kept == {0, 1, 3, 4}  # min-keyed survivor per signature


def test_signature_multi_field_order_and_null(docs):
    ab = {r.doc_id: r.signature for r in urp.signature(docs, ["lang", "source"]).collect()}
    ba = {r.doc_id: r.signature for r in urp.signature(docs, ["source", "lang"]).collect()}
    assert ab[3] != ba[3]  # config field order matters
    # null -> empty string, not a distinct marker
    assert ab[0] == ab[0]
    en_none = urp.signature(docs.filter("doc_id = 0"), ["lang", "source"]).collect()[0].signature
    import hashlib
    assert en_none == hashlib.md5(b"en").hexdigest()


def test_field_mutators_chain(docs):
    run = urp.chain(
        lambda d: urp.trim_field(d, "text"),
        lambda d: urp.html_strip(d, "text"),
        lambda d: urp.default_value(d, "lang", "und"),
        lambda d: urp.clone_field(d, "text", "text_copy"),
        lambda d: urp.field_length(d, "text"),
        lambda d: urp.regex_replace(d, "text", r"\s+", " "),
    )
    out = {r.doc_id: r for r in run(docs).collect()}
    assert out[0].text == "The same text"
    assert out[3].text.strip() == "Hello world"
    assert out[2].lang == "und" and out[1].lang == "en"
    assert out[4].text_copy == "different entirely"
    assert out[0].text_length == len("The same text")  # length measured at its chain position
