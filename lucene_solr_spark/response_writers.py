"""Response writers: the wt=json / wt=csv / wt=xml rendering layer.

Reference:
- solr/core/src/java/org/apache/solr/response/JSONResponseWriter.java
  (NamedList rendering; json.nl=flat default renders facet counts as
  [term, count, term, count, ...], json.nl=map as an object)
- solr/core/src/java/org/apache/solr/response/CSVResponseWriter.java
  (docs only; header row of fl fields, csv.separator, csv.mv.separator
  for multiValued values)
- solr/core/src/java/org/apache/solr/response/XMLWriter.java
  (<response><lst name="responseHeader">, <result name="response"
  numFound start>, typed <str|int|long|float|double|bool|date|arr>)

Writers materialize ONLY the ranked page (k rows, already bounded by the
collector) plus facet tables (bounded by facet.limit) — never the corpus.
``out`` is handler.select()'s component dict.
"""

from __future__ import annotations

import datetime as _dt
import io
import json
from xml.sax.saxutils import escape as _xml_escape


def _docs_of(out: dict) -> list[dict]:
    rows = out["response"].collect()
    docs = []
    for r in rows:
        d = r.asDict(recursive=True)
        docs.append({k: v for k, v in d.items() if v is not None})
    return docs


def _facet_counts(out: dict, nl: str = "flat") -> dict:
    ff: dict = {}
    for name, df in (out.get("facet_fields") or {}).items():
        pairs = [(r[0], int(r[1])) for r in df.collect()]
        if nl == "map":
            ff[name] = {t: c for t, c in pairs}
        else:  # flat (the 4.10 default)
            flat: list = []
            for t, c in pairs:
                flat.extend((t, c))
            ff[name] = flat
    fq: dict = {}
    fq_df = out.get("facet_queries")
    if fq_df is not None:
        fq = {r[0]: int(r[1]) for r in fq_df.collect()}
    return {
        "facet_queries": fq,
        "facet_fields": ff,
        "facet_dates": {},
        "facet_ranges": {},
        "facet_intervals": {},
    }


def _body(out: dict, params: dict, nl: str = "flat") -> dict:
    """The shared response envelope (NamedList tree) every writer renders."""
    body: dict = {
        "responseHeader": {"status": 0, "params": {
            k: v for k, v in params.items() if not k.startswith("json.")
        }},
        "response": {
            "numFound": out.get("num_found"),
            "start": int(params.get("start", 0)),
            "docs": _docs_of(out),
        },
    }
    if out.get("facet_fields") or out.get("facet_queries") is not None:
        body["facet_counts"] = _facet_counts(out, nl)
    hl = out.get("highlighting")
    if hl is not None:
        key = [c for c in hl.columns if c != "snippet"][0]
        body["highlighting"] = {
            str(r[key]): {"snippet": [r["snippet"]]} for r in hl.collect()
        }
    return body


def write_json(out: dict, params: dict | None = None) -> str:
    """wt=json: the standard Solr response envelope."""
    params = params or {}
    body = _body(out, params, params.get("json.nl", "flat"))
    return json.dumps(body, ensure_ascii=False, default=_json_default)


def _json_default(v):
    if isinstance(v, (_dt.datetime, _dt.date)):
        return _to_solr_date(v)
    raise TypeError(type(v))


def write_csv(out: dict, params: dict | None = None) -> str:
    """wt=csv: docs only, one header row (CSVResponseWriter)."""
    params = params or {}
    sep = params.get("csv.separator", ",")
    mv_sep = params.get("csv.mv.separator", ",")
    docs = _docs_of(out)
    cols: list[str] = []
    for d in docs:
        for k in d:
            if k not in cols:
                cols.append(k)
    buf = io.StringIO()
    import csv as _csvmod

    w = _csvmod.writer(buf, delimiter=sep, lineterminator="\n")
    w.writerow(cols)
    for d in docs:
        row = []
        for c in cols:
            v = d.get(c, "")
            if isinstance(v, list):
                v = mv_sep.join(str(x) for x in v)
            elif isinstance(v, (_dt.datetime, _dt.date)):
                v = _to_solr_date(v)
            row.append(v)
        w.writerow(row)
    return buf.getvalue()


def _to_solr_date(v) -> str:
    if isinstance(v, _dt.datetime):
        return v.strftime("%Y-%m-%dT%H:%M:%SZ")
    return v.strftime("%Y-%m-%dT00:00:00Z")


def _xml_value(name: str, v, indent: str) -> str:
    attr = f' name="{_xml_escape(str(name))}"' if name is not None else ""
    if isinstance(v, bool):
        return f"{indent}<bool{attr}>{str(v).lower()}</bool>"
    if isinstance(v, int):
        tag = "int" if -(2**31) <= v < 2**31 else "long"
        return f"{indent}<{tag}{attr}>{v}</{tag}>"
    if isinstance(v, float):
        return f"{indent}<double{attr}>{v}</double>"
    if isinstance(v, (_dt.datetime, _dt.date)):
        return f"{indent}<date{attr}>{_to_solr_date(v)}</date>"
    if isinstance(v, list):
        inner = "\n".join(_xml_value(None, x, indent + "  ") for x in v)
        return f"{indent}<arr{attr}>\n{inner}\n{indent}</arr>"
    return f"{indent}<str{attr}>{_xml_escape(str(v))}</str>"


def write_xml(out: dict, params: dict | None = None) -> str:
    """wt=xml: the classic XMLResponseWriter envelope."""
    params = params or {}
    lines = ['<?xml version="1.0" encoding="UTF-8"?>', "<response>"]
    lines.append('  <lst name="responseHeader">')
    lines.append('    <int name="status">0</int>')
    lines.append("  </lst>")
    start = int(params.get("start", 0))
    nf = out.get("num_found")
    lines.append(
        f'  <result name="response" numFound="{nf}" start="{start}">'
    )
    for d in _docs_of(out):
        lines.append("    <doc>")
        for k, v in d.items():
            lines.append(_xml_value(k, v, "      "))
        lines.append("    </doc>")
    lines.append("  </result>")
    ff = out.get("facet_fields") or {}
    if ff:
        lines.append('  <lst name="facet_counts">')
        lines.append('    <lst name="facet_fields">')
        for name, df in ff.items():
            lines.append(f'      <lst name="{_xml_escape(str(name))}">')
            for r in df.collect():
                lines.append(_xml_value(r[0], int(r[1]), "        "))
            lines.append("      </lst>")
        lines.append("    </lst>")
        lines.append("  </lst>")
    lines.append("</response>")
    return "\n".join(lines)


# ---------------------------------------------------------------------------
# Script-language writers: wt=python / wt=ruby / wt=php / wt=phps
# (solr/core/src/java/org/apache/solr/response/PythonResponseWriter.java,
#  RubyResponseWriter.java, PHPResponseWriter.java,
#  PHPSerializedResponseWriter.java — each renders the SAME NamedList
#  envelope in the target language's literal syntax; phps is PHP's
#  serialize() wire format with byte-length-prefixed strings.)
# ---------------------------------------------------------------------------


def _norm(v):
    if isinstance(v, (_dt.datetime, _dt.date)):
        return _to_solr_date(v)
    return v


def _py_repr(v) -> str:
    v = _norm(v)
    if v is None:
        return "None"
    if isinstance(v, bool):
        return "True" if v else "False"
    if isinstance(v, str):
        s = v.replace("\\", "\\\\").replace("'", "\\'")
        s = "".join(c if " " <= c < "\x7f" else f"\\u{ord(c):04x}" for c in s)
        return f"'{s}'"
    if isinstance(v, dict):
        return "{" + ",".join(f"{_py_repr(k)}:{_py_repr(x)}" for k, x in v.items()) + "}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_py_repr(x) for x in v) + "]"
    return repr(v)


def _rb_repr(v) -> str:
    v = _norm(v)
    if v is None:
        return "nil"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, str):
        s = v.replace("\\", "\\\\").replace("'", "\\'")
        return f"'{s}'"
    if isinstance(v, dict):
        return "{" + ",".join(f"{_rb_repr(k)}=>{_rb_repr(x)}" for k, x in v.items()) + "}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_rb_repr(x) for x in v) + "]"
    return repr(v)


def _php_repr(v) -> str:
    v = _norm(v)
    if v is None:
        return "null"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, str):
        s = v.replace("\\", "\\\\").replace("'", "\\'")
        return f"'{s}'"
    if isinstance(v, dict):
        return "array(" + ",".join(
            f"{_php_repr(k)}=>{_php_repr(x)}" for k, x in v.items()) + ")"
    if isinstance(v, (list, tuple)):
        return "array(" + ",".join(
            f"{i}=>{_php_repr(x)}" for i, x in enumerate(v)) + ")"
    return repr(v)


def _phps_repr(v) -> str:
    """PHP serialize() format: s:<bytelen>:"raw"; i:..; d:..; b:..; N;
    a:<n>:{key val ...} — string lengths count UTF-8 BYTES, content raw."""
    v = _norm(v)
    if v is None:
        return "N;"
    if isinstance(v, bool):
        return f"b:{1 if v else 0};"
    if isinstance(v, int):
        return f"i:{v};"
    if isinstance(v, float):
        return f"d:{v};"
    if isinstance(v, str):
        return f's:{len(v.encode("utf-8"))}:"{v}";'
    if isinstance(v, dict):
        inner = "".join(_phps_repr(k) + _phps_repr(x) for k, x in v.items())
        return f"a:{len(v)}:{{{inner}}}"
    if isinstance(v, (list, tuple)):
        inner = "".join(f"i:{i};" + _phps_repr(x) for i, x in enumerate(v))
        return f"a:{len(v)}:{{{inner}}}"
    raise TypeError(type(v))


def write_python(out: dict, params: dict | None = None) -> str:
    """wt=python: the envelope as a Python literal."""
    params = params or {}
    return _py_repr(_body(out, params))


def write_ruby(out: dict, params: dict | None = None) -> str:
    """wt=ruby: the envelope as a Ruby literal (nil / => hashes)."""
    params = params or {}
    return _rb_repr(_body(out, params))


def write_php(out: dict, params: dict | None = None) -> str:
    """wt=php: the envelope as nested PHP array() literals."""
    params = params or {}
    return _php_repr(_body(out, params))


def write_phps(out: dict, params: dict | None = None) -> str:
    """wt=phps: the envelope in PHP serialize() wire format."""
    params = params or {}
    return _phps_repr(_body(out, params))


def write_javabin(out: dict, params: dict | None = None) -> bytes:
    """wt=javabin: Solr's DEFAULT wire format (BinaryResponseWriter.java
    over JavaBinCodec.java) — the same NamedList envelope the text
    writers render, marshalled to javabin v2 bytes with the Java boxed
    types a SolrJ client expects: responseHeader ints, SolrDocumentList
    with long numFound/start + float maxScore, long facet counts."""
    from lucene_solr_spark import javabin as jb

    params = params or {}
    body = _body(out, params)

    hdr_src = body["responseHeader"]
    hdr = jb.SimpleOrderedMap([("status", jb.JInt(hdr_src["status"]))])
    hdr.add(
        "params",
        jb.SimpleOrderedMap(
            [(k, _jb_val(v)) for k, v in hdr_src["params"].items()]
        ),
    )

    resp_src = body["response"]
    docs = []
    max_score = None
    for d in resp_src["docs"]:
        fields = []
        for k, v in d.items():
            if k == "score":
                v = float(v)
                max_score = v if max_score is None else max(max_score, v)
                fields.append((k, jb.JFloat(v)))
            else:
                fields.append((k, _jb_val(v)))
        docs.append(jb.SolrDocument(fields))
    dl = jb.SolrDocumentList(
        docs,
        num_found=int(resp_src["numFound"] or 0),
        start=int(resp_src["start"]),
        max_score=max_score,
    )

    envelope = jb.NamedList([("responseHeader", hdr), ("response", dl)])
    fc_src = body.get("facet_counts")
    if fc_src is not None:
        fc = jb.SimpleOrderedMap()
        fc.add(
            "facet_queries",
            jb.SimpleOrderedMap(
                [(q, jb.JLong(c)) for q, c in fc_src["facet_queries"].items()]
            ),
        )
        ffs = jb.SimpleOrderedMap()
        for fname, flat in fc_src["facet_fields"].items():
            nl = jb.NamedList()
            for i in range(0, len(flat), 2):
                nl.add(flat[i], jb.JLong(flat[i + 1]))
            ffs.add(fname, nl)
        fc.add("facet_fields", ffs)
        fc.add("facet_dates", jb.SimpleOrderedMap())
        fc.add("facet_ranges", jb.SimpleOrderedMap())
        fc.add("facet_intervals", jb.SimpleOrderedMap())
        envelope.add("facet_counts", fc)
    hl_src = body.get("highlighting")
    if hl_src is not None:
        hl = jb.SimpleOrderedMap()
        for key, frags in hl_src.items():
            hl.add(
                key,
                jb.SimpleOrderedMap(
                    [(f, list(v)) for f, v in frags.items()]
                ),
            )
        envelope.add("highlighting", hl)
    return jb.dumps(envelope)


def _jb_val(v):
    from lucene_solr_spark import javabin as jb

    if isinstance(v, (_dt.datetime, _dt.date)):
        if isinstance(v, _dt.datetime):
            epoch = _dt.datetime(1970, 1, 1, tzinfo=v.tzinfo)
            if v.tzinfo is None:
                epoch = _dt.datetime(1970, 1, 1)
            millis = int((v - epoch).total_seconds() * 1000)
        else:
            millis = (
                _dt.date.toordinal(v) - _dt.date(1970, 1, 1).toordinal()
            ) * 86400000
        return jb.JDate(millis)
    if isinstance(v, list):
        return [_jb_val(x) for x in v]
    return v


WRITERS = {
    "json": write_json, "csv": write_csv, "xml": write_xml,
    "python": write_python, "ruby": write_ruby,
    "php": write_php, "phps": write_phps,
    "javabin": write_javabin,
}


def write_response(out: dict, params: dict | None = None) -> str:
    """Dispatch on wt= (default json, like Solr 4.10's default wt)."""
    wt = (params or {}).get("wt", "json")
    if wt not in WRITERS:
        raise ValueError(f"unknown wt: {wt}")
    return WRITERS[wt](out, params)
