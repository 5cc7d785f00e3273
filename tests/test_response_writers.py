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


# -- script-language writers (pure value-level goldens, no Spark needed) ----

def test_python_repr_goldens():
    from lucene_solr_spark.response_writers import _py_repr

    assert _py_repr(None) == "None"
    assert _py_repr(True) == "True" and _py_repr(False) == "False"
    assert _py_repr("it's") == "'it\\'s'"
    assert _py_repr("café") == "'caf\\u00e9'"
    assert _py_repr({"a": [1, 2.5]}) == "{'a':[1,2.5]}"
    # the literal round-trips through eval back to the same value
    v = {"k": [None, True, "x'y", 3, 4.5]}
    assert eval(_py_repr(v)) == v


def test_ruby_repr_goldens():
    from lucene_solr_spark.response_writers import _rb_repr

    assert _rb_repr(None) == "nil"
    assert _rb_repr({"a": 1}) == "{'a'=>1}"
    assert _rb_repr([True, "x'y"]) == "[true,'x\\'y']"


def test_php_repr_goldens():
    from lucene_solr_spark.response_writers import _php_repr

    assert _php_repr(None) == "null"
    assert _php_repr({"a": [1, "b"]}) == "array('a'=>array(0=>1,1=>'b'))"


def test_phps_serialize_goldens():
    """PHP serialize() wire format: byte-length-prefixed raw strings."""
    from lucene_solr_spark.response_writers import _phps_repr

    assert _phps_repr(None) == "N;"
    assert _phps_repr(True) == "b:1;"
    assert _phps_repr(5) == "i:5;"
    assert _phps_repr(2.5) == "d:2.5;"
    assert _phps_repr("ab") == 's:2:"ab";'
    assert _phps_repr("café") == 's:5:"café";'  # UTF-8 byte length
    assert _phps_repr([1, "x"]) == 'a:2:{i:0;i:1;i:1;s:1:"x";}'
    assert _phps_repr({"k": 1}) == 'a:1:{s:1:"k";i:1;}'


def test_script_writers_render_envelope(out):
    from lucene_solr_spark.response_writers import write_response

    py = write_response(out, {"wt": "python", "q": "table"})
    body = eval(py)  # Python literal round-trip
    assert body["responseHeader"]["status"] == 0
    assert body["response"]["numFound"] >= 3
    rb = write_response(out, {"wt": "ruby", "q": "table"})
    assert rb.startswith("{'responseHeader'=>")
    php = write_response(out, {"wt": "php", "q": "table"})
    assert php.startswith("array('responseHeader'=>")
    phps = write_response(out, {"wt": "phps", "q": "table"})
    assert phps.startswith("a:") and phps.endswith("}")


def test_javabin_envelope(out):
    """wt=javabin round-trips to the same envelope write_json renders."""
    from lucene_solr_spark import javabin as jb
    from lucene_solr_spark.response_writers import write_javabin

    data = write_javabin(out, {"q": "table", "rows": 3})
    assert isinstance(data, bytes) and data[0] == 2  # javabin v2
    tree = jb.loads(data)
    assert isinstance(tree, jb.NamedList)
    hdr = tree.get("responseHeader")
    assert isinstance(hdr, jb.SimpleOrderedMap)
    assert hdr.get("status") == 0
    dl = tree.get("response")
    assert isinstance(dl, jb.SolrDocumentList)
    assert len(dl) == 3 and dl.start == 0

    body = json.loads(write_json(out, {"q": "table", "rows": 3}))
    assert dl.num_found == body["response"]["numFound"]
    # docs agree field-by-field (score is a Java Float on the wire)
    for jdoc, jsond in zip(dl, body["response"]["docs"]):
        fields = dict(jdoc.fields)
        assert str(fields["docid"]) == str(jsond["docid"])
        assert abs(fields["score"].value - jsond["score"]) < 1e-5
    # facet counts are Longs keyed by term, matching the flat JSON list
    ff = tree.get("facet_counts").get("facet_fields").get("lang")
    flat = body["facet_counts"]["facet_fields"]["lang"]
    assert [(n, v.value) for n, v in ff] == [
        (flat[i], flat[i + 1]) for i in range(0, len(flat), 2)
    ]


def test_javabin_dispatch(out):
    data = write_response(out, {"wt": "javabin"})
    assert isinstance(data, bytes) and data[0] == 2
