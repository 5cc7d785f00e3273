"""Response writers (response_writers.py): wt=json/csv/xml envelopes over
handler.select() component output, checked against the Solr 4.10 response
conventions (JSONResponseWriter / CSVResponseWriter / XMLWriter)."""

import json
import xml.etree.ElementTree as ET

import pytest

from lucene_solr_spark.handler import select
from lucene_solr_spark.response_writers import (
    write_csv,
    write_json,
    write_response,
    write_xml,
)


@pytest.fixture(scope="module")
def index(spark, sf_dir):
    from lucene_solr_spark.driver_queries import get_index

    return get_index(spark, sf_dir)


@pytest.fixture(scope="module")
def out(index):
    return select(
        index,
        {"q": "table", "rows": 3, "fl": "docid,score,lang",
         "facet.field": ["lang"]},
    )


def test_json_envelope(out):
    body = json.loads(write_json(out, {"q": "table", "rows": 3}))
    assert body["responseHeader"]["status"] == 0
    resp = body["response"]
    assert resp["start"] == 0
    assert resp["numFound"] >= 3
    assert len(resp["docs"]) == 3
    assert all("docid" in d and "score" in d for d in resp["docs"])
    # flat NamedList: [term, count, term, count, ...]
    ff = body["facet_counts"]["facet_fields"]["lang"]
    assert isinstance(ff, list) and len(ff) % 2 == 0
    assert all(isinstance(c, int) for c in ff[1::2])


def test_json_nl_map(out):
    body = json.loads(write_json(out, {"json.nl": "map"}))
    ff = body["facet_counts"]["facet_fields"]["lang"]
    assert isinstance(ff, dict)
    assert all(isinstance(v, int) for v in ff.values())


def test_csv_docs_only(out):
    text = write_csv(out)
    lines = text.strip().split("\n")
    header = lines[0].split(",")
    assert "docid" in header and "lang" in header
    assert len(lines) == 4  # header + 3 docs


def test_csv_custom_separator(out):
    text = write_csv(out, {"csv.separator": "\t"})
    assert "\t" in text.split("\n")[0]


def test_xml_envelope(out):
    text = write_xml(out, {"start": 0})
    root = ET.fromstring(text)
    assert root.tag == "response"
    result = root.find("./result[@name='response']")
    assert result is not None
    assert int(result.get("numFound")) >= 3
    assert len(result.findall("doc")) == 3
    # typed values: docid is long/int, score double
    doc = result.find("doc")
    tags = {c.get("name"): c.tag for c in doc}
    assert tags["docid"] in ("int", "long")
    assert tags["score"] == "double"
    facets = root.find("./lst[@name='facet_counts']/lst[@name='facet_fields']")
    assert facets is not None and facets.find("lst[@name='lang']") is not None


def test_dispatch(out):
    assert write_response(out, {"wt": "csv"}).startswith("docid")
    with pytest.raises(ValueError):
        write_response(out, {"wt": "velocity"})
