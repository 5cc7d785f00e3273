"""javabin codec: byte-exact goldens from the reference's own
JavaBinCodec (tools/gen_javabin_goldens.java) + round-trip checks.
"""

import gzip
import os

import pytest

from lucene_solr_spark.javabin import (
    END_OBJ,
    EnumFieldValue,
    JByte,
    JDate,
    JDouble,
    JFloat,
    JInt,
    JLong,
    JShort,
    NamedList,
    SimpleOrderedMap,
    SolrDocument,
    SolrDocumentList,
    SolrInputDocument,
    dumps,
    loads,
)

_DATA = os.path.join(os.path.dirname(__file__), "data")


def _golden_map():
    out = {}
    with gzip.open(
        os.path.join(_DATA, "javabin_goldens.tsv.gz"), "rt", encoding="utf-8"
    ) as fh:
        for line in fh:
            name, hexv = line.rstrip("\n").split("\t")
            out[name] = bytes.fromhex(hexv)
    return out


def _cases():
    """The same values tools/gen_javabin_goldens.java marshals."""
    nl_dup = NamedList()
    nl_dup.add("status", JInt(0))
    nl_dup.add("QTime", JInt(12))
    nl_dup.add("status", JInt(1))

    som = SimpleOrderedMap()
    som.add("echoParams", "all")
    som.add("rows", JInt(10))

    d1 = SimpleOrderedMap([("id", "1"), ("score", JFloat(0.5))])
    d2 = SimpleOrderedMap([("id", "2"), ("score", JFloat(0.25))])
    outer = NamedList([("a", d1), ("b", d2), ("id", "top")])

    doc1 = SolrDocument(
        [
            ("id", "42"),
            ("title", "hello"),
            ("score", JFloat(1.25)),
            ("tags", ["a", "b"]),
        ]
    )
    doc2 = SolrDocument([("id", "43"), ("score", JFloat(0.75))])
    dl = SolrDocumentList(
        [doc1, doc2], num_found=2, start=0, max_score=1.25
    )
    dl_nomax = SolrDocumentList([], num_found=0, start=5, max_score=None)

    hdr = SimpleOrderedMap(
        [
            ("status", JInt(0)),
            ("QTime", JInt(3)),
            (
                "params",
                SimpleOrderedMap(
                    [("q", "title:hello"), ("wt", "javabin")]
                ),
            ),
        ]
    )
    ff = NamedList([("en", JLong(7)), ("de", JLong(3))])
    fc = SimpleOrderedMap(
        [
            ("facet_queries", SimpleOrderedMap()),
            ("facet_fields", SimpleOrderedMap([("lang", ff)])),
        ]
    )
    envelope = NamedList(
        [("responseHeader", hdr), ("response", dl), ("facet_counts", fc)]
    )

    return {
        "null": None,
        "true": True,
        "false": False,
        "int_0": JInt(0),
        "int_7": JInt(7),
        "int_14": JInt(14),
        "int_15": JInt(15),
        "int_16": JInt(16),
        "int_127": JInt(127),
        "int_255": JInt(255),
        "int_100000": JInt(100000),
        "int_neg1": JInt(-1),
        "int_neg100000": JInt(-100000),
        "int_max": JInt(2**31 - 1),
        "int_min": JInt(-(2**31)),
        "long_0": JLong(0),
        "long_14": JLong(14),
        "long_15": JLong(15),
        "long_big": JLong(123456789012345),
        "long_neg1": JLong(-1),
        "long_min": JLong(-(2**63)),
        "long_top_byte": JLong(0x7F00000000000000),
        "float_1_5": JFloat(1.5),
        "float_neg": JFloat(-2.75),
        "double_pi": JDouble(3.141592653589793),
        "double_neg": JDouble(-0.001),
        "byte_5": JByte(5),
        "byte_neg": JByte(-3),
        "short_300": JShort(300),
        "date_epoch": JDate(0),
        "date_2026": JDate(1787212837878),
        "str_empty": "",
        "str_ascii": "hello world",
        "str_30": "012345678901234567890123456789",
        "str_31": "0123456789012345678901234567890",
        "str_32": "01234567890123456789012345678901",
        "str_long": "0123456789" * 20,
        "str_unicode": "café 中文 😀",
        "bytes": bytes([0, 1, 0xFE, 0xFF]),
        "list_mixed": [JInt(1), "two", JDouble(3.0), None, True],
        "list_empty": [],
        "list_40": [JInt(i) for i in range(40)],
        "map": {"a": JInt(1), "b": "two", 5: "five"},
        "namedlist_dup": nl_dup,
        "simpleorderedmap": som,
        "extern_strings": outer,
        "solrdoclist": dl,
        "solrdoclist_nomax": dl_nomax,
        "select_envelope": envelope,
        "iterator": iter(["x", JInt(1)]),
        "enum_field": EnumFieldValue(2, "signup"),
        "solrinputdoc": SolrInputDocument(
            [("id", "99"), ("title", "hello", 2.0), ("tags", ["x", "y"])]
        ),
        "update_request": NamedList(
            [
                (
                    "params",
                    NamedList(
                        [("commitWithin", JInt(-1)), ("overwrite", True)]
                    ),
                ),
                ("delById", ["7", "8"]),
                ("delByQ", ["lang:de"]),
                (
                    "docs",
                    iter(
                        [
                            SolrInputDocument(
                                [("id", "1"), ("text", "alpha")]
                            ),
                            SolrInputDocument(
                                [("id", "2"), ("text", "beta")]
                            ),
                        ]
                    ),
                ),
            ]
        ),
    }


@pytest.mark.parametrize("name", list(_golden_map()))
def test_reference_codec_goldens(name):
    goldens = _golden_map()
    cases = _cases()
    assert name in cases, f"no python construction for golden {name}"
    got = dumps(cases[name])
    assert got == goldens[name], (
        f"{name}: {got.hex()} != {goldens[name].hex()}"
    )


def test_bare_python_types_encode_like_java_boxes():
    # int in int32 range == Integer, beyond == Long, float == Double
    assert dumps(7) == dumps(JInt(7))
    assert dumps(-100000) == dumps(JInt(-100000))
    assert dumps(2**40) == dumps(JLong(2**40))
    assert dumps(3.141592653589793) == dumps(JDouble(3.141592653589793))


def test_round_trip():
    cases = _cases()
    for name, val in cases.items():
        if name in ("iterator", "update_request"):
            # ITERATOR has no size header, so a decoded list re-encodes
            # as ARR — same values, different framing (as in Java)
            continue
        data = dumps(val)
        back = loads(data)
        again = dumps(_rewrap(back))
        assert again == data, name


def _rewrap(v):
    """loads() surfaces small ints as bare int (the wire erases the
    distinction only for the small-int form, same as a JVM reader
    yielding Integer); rewrap so a second dumps() is byte-stable."""
    return v


def test_extern_string_back_references():
    # the second occurrence of a repeated key must be a back-reference,
    # making the payload shorter than two inline strings
    a = SimpleOrderedMap([("field_name_xyz", JInt(1))])
    b = SimpleOrderedMap([("field_name_xyz", JInt(2))])
    two = dumps(NamedList([("a", a), ("b", b)]))
    # 14-char key appears once only
    assert two.count(b"field_name_xyz") == 1


def test_iterator_round_trip():
    data = dumps(iter(["x", JInt(1), None]))
    assert loads(data) == ["x", 1, None]
