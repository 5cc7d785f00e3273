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


def test_lang_id_processor(spark):
    """solr/contrib/langid LanguageIdentifierUpdateProcessor semantics."""
    from lucene_solr_spark.index.urp import lang_id

    df = spark.createDataFrame(
        [
            (0, "the quick brown fox and the lazy dog", None),
            (1, "der schnelle braune fuchs und der hund", None),
            (2, "zz qq xx", None),                # no evidence -> fallback
            (3, "the the the", "fr"),             # existing value kept
        ],
        "doc_id long, text string, language_s string",
    )
    out = {r.doc_id: r.language_s for r in lang_id(df).collect()}
    assert out[0] == "en" and out[1] == "de"
    assert out[2] == "und"
    assert out[3] == "fr"  # not overwritten
    out2 = {r.doc_id: r.language_s for r in lang_id(df, overwrite=True).collect()}
    assert out2[3] == "en"


def test_timestamp_and_uuid_processors(spark):
    from lucene_solr_spark.index.urp import timestamp_field, uuid_field

    df = spark.createDataFrame([(0, "u/a"), (1, "u/b")], "doc_id long, url string")
    now = 1_700_000_000_000
    ts = timestamp_field(df, now)
    vals = {r.doc_id: r.timestamp for r in ts.collect()}
    assert vals[0] == vals[1] and vals[0].year == 2023

    u1 = {r.doc_id: r.id for r in uuid_field(df, "url").collect()}
    u2 = {r.doc_id: r.id for r in uuid_field(df, "url").collect()}
    assert u1 == u2                      # deterministic across replays
    assert u1[0] != u1[1]
    import re
    import uuid as uuid_mod

    for u in (*u1.values(), *u2.values()):
        # strict RFC 4122 v3: version nibble 3, variant digit in 8..b
        assert re.fullmatch(
            r"[0-9a-f]{8}-[0-9a-f]{4}-3[0-9a-f]{3}-[89ab][0-9a-f]{3}-[0-9a-f]{12}",
            u,
        )
        parsed = uuid_mod.UUID(u)
        assert parsed.version == 3 and parsed.variant == uuid_mod.RFC_4122


def test_ttl_expiration(spark):
    from lucene_solr_spark.index.urp import expiration_sweep, ttl_field

    now = 1_700_000_000_000
    docs = spark.createDataFrame(
        [(1, "+30SECONDS"), (2, "+2HOURS"), (3, None), (4, "+1DAY")],
        "doc_id long, _ttl_ string",
    )
    out = ttl_field(docs, now)
    exp = {int(r.doc_id): r._expire_at_ for r in out.collect()}
    import datetime as dt

    def ts(ms):
        return dt.datetime.fromtimestamp(ms / 1000.0)

    assert exp[1] == ts(now + 30_000)
    assert exp[2] == ts(now + 2 * 3600_000)
    assert exp[3] is None
    assert exp[4] == ts(now + 86_400_000)
    # sweep 1 hour later: +30SECONDS expired; no-TTL doc survives forever
    kept = {
        int(r.doc_id)
        for r in expiration_sweep(out, now + 3600_000).collect()
    }
    assert kept == {2, 3, 4}
