"""/update content-stream loaders: JsonLoader / CSVLoader / XMLLoader /
JavaBinUpdateRequestCodec analogs — all four 4.10 /update content types.

Reference:
- solr/core/src/java/org/apache/solr/handler/loader/JsonLoader.java
  (SingleThreadedJsonLoader.processUpdate: streamed top-level object with
  repeatable "add"/"delete"/"commit"/"optimize"/"rollback" keys, plus the
  bare-array-of-docs shorthand; delete accepts a string id, an array of
  ids, {"id": ...} and {"query": ...} forms)
- solr/core/src/java/org/apache/solr/handler/loader/CSVLoaderBase.java
  (header/fieldnames, separator, encapsulator, trim, skipLines,
  f.<field>.split + f.<field>.separator for multiValued columns,
  literal.<field> constants)

The loaders parse a request payload into a command list; ``apply_update``
drives them against a committed IndexStore with the same machinery the
dedicated operators use (update_documents = delete-by-key + add
generation, delete_by_key, delete_by_query), so /update visibility
follows snapshot commits exactly like DirectUpdateHandler2's.

Scale shape: parsing happens once on the driver over the request payload
(requests are KB-MB; corpus data never routes through here), then adds
become ONE DataFrame and every mutation is the distributed semi-join /
anti-join path of the underlying store ops — no per-doc driver loops
against the cluster.
"""

from __future__ import annotations

import csv as _csv
import io
import json
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession


@dataclass
class UpdateCommands:
    """Parsed /update request: ordered mutation plan."""

    adds: list[dict] = field(default_factory=list)
    delete_ids: list[str] = field(default_factory=list)
    delete_queries: list[str] = field(default_factory=list)
    commit: bool = False
    optimize: bool = False
    rollback: bool = False
    commit_within: int | None = None


def _pairs_hook(pairs):
    # JSON update bodies legally repeat keys ("add" per doc); a dict would
    # silently drop all but the last, so the top level keeps raw pairs.
    return pairs


def _is_pairs(v) -> bool:
    # with object_pairs_hook, JSON OBJECTS arrive as lists of 2-tuples;
    # JSON arrays stay plain lists (their elements are never tuples)
    return isinstance(v, list) and all(
        isinstance(x, tuple) and len(x) == 2 for x in v
    ) and bool(v)


def _to_obj(v):
    """Recursively convert pairs-lists back to dicts (nested doc values)."""
    if _is_pairs(v):
        return {k: _to_obj(x) for k, x in v}
    if isinstance(v, list):
        return [_to_obj(x) for x in v]
    return v


def parse_json_update(payload: str) -> UpdateCommands:
    """JsonLoader.processUpdate: either a bare array of documents (all
    adds) or an object whose (repeatable) keys are commands."""
    data = json.loads(payload, object_pairs_hook=_pairs_hook)
    cmds = UpdateCommands()

    if not isinstance(data, list):
        raise ValueError(f"unexpected JSON update root: {type(data)}")
    if not _is_pairs(data):
        # bare array of documents — each element is an object's pairs-list
        for doc in data:
            cmds.adds.append(_to_obj(doc))
        return cmds

    for key, val in data:
        if key == "add":
            v = _to_obj(val)
            doc = v.get("doc")
            if doc is None:
                raise ValueError("add command missing 'doc'")
            if "commitWithin" in v:
                cmds.commit_within = int(v["commitWithin"])
            cmds.adds.append(doc)
        elif key == "delete":
            if isinstance(val, str):
                cmds.delete_ids.append(val)
            elif _is_pairs(val):
                obj = _to_obj(val)
                if "query" in obj:
                    cmds.delete_queries.append(obj["query"])
                elif "id" in obj:
                    cmds.delete_ids.append(str(obj["id"]))
                else:
                    raise ValueError(f"bad delete body: {obj}")
            elif isinstance(val, list):
                cmds.delete_ids.extend(str(x) for x in val)
            else:
                raise ValueError(f"bad delete body: {val!r}")
        elif key == "commit":
            cmds.commit = True
        elif key == "optimize":
            cmds.optimize = True
        elif key == "rollback":
            cmds.rollback = True
        else:
            raise ValueError(f"Unknown command: {key}")
    return cmds


def parse_csv_update(
    payload: str,
    separator: str = ",",
    encapsulator: str = '"',
    header: bool = True,
    fieldnames: list[str] | None = None,
    skip_lines: int = 0,
    trim: bool = False,
    split_fields: dict[str, str] | None = None,
    literals: dict[str, str] | None = None,
) -> UpdateCommands:
    """CSVLoaderBase parameter semantics over an in-memory payload:
    header row or explicit fieldnames, custom separator/encapsulator,
    optional per-field trim, ``f.<field>.split`` multiValued splitting
    with its own separator, and ``literal.<field>`` constants stamped on
    every row."""
    lines = io.StringIO(payload)
    for _ in range(skip_lines):
        lines.readline()
    # Solr's CSVStrategy defaults ignoreLeadingWhitespaces=true, so an
    # encapsulated value after ", " still parses as quoted
    reader = _csv.reader(
        lines, delimiter=separator, quotechar=encapsulator,
        skipinitialspace=True,
    )
    rows = [r for r in reader if r]
    if not rows:
        return UpdateCommands()
    if header and fieldnames is None:
        fieldnames = [c.strip() for c in rows[0]]
        rows = rows[1:]
    if fieldnames is None:
        raise ValueError("fieldnames required when header=false")
    cmds = UpdateCommands()
    split_fields = split_fields or {}
    literals = literals or {}
    for r in rows:
        doc: dict[str, Any] = {}
        for name, raw in zip(fieldnames, r):
            v: Any = raw.strip() if trim else raw
            if name in split_fields:
                v = v.split(split_fields[name])
            doc[name] = v
        doc.update(literals)
        cmds.adds.append(doc)
    return cmds


def parse_xml_update(payload: str) -> UpdateCommands:
    """XMLLoader.processUpdate analog (solr/core/src/java/org/apache/
    solr/handler/loader/XMLLoader.java:221-286, readDoc :369-460): a
    stream of top-level ``<add>``/``<delete>``/``<commit>``/
    ``<optimize>``/``<rollback>`` elements.  ``<field>`` supports
    ``null="true"``, repeated names (multiValued list), and the atomic
    ``update="set|add|inc|remove"`` forms, which collect into the
    {field: {op: value}} extended-value map exactly as readDoc does.
    Solr parses the body as an event stream, so multiple root elements
    are legal — a synthetic wrapper keeps ElementTree happy."""
    import xml.etree.ElementTree as ET

    stripped = payload.strip()
    if stripped.startswith("<update"):
        root = ET.fromstring(stripped)
    else:
        root = ET.fromstring(f"<update>{stripped}</update>")
    cmds = UpdateCommands()
    for el in root:
        tag = el.tag
        if tag == "add":
            if "commitWithin" in el.attrib:
                cmds.commit_within = int(el.attrib["commitWithin"])
            for doc_el in el.findall("doc"):
                cmds.adds.append(_xml_doc(doc_el))
        elif tag == "delete":
            for id_el in el.findall("id"):
                cmds.delete_ids.append(id_el.text or "")
            for q_el in el.findall("query"):
                cmds.delete_queries.append(q_el.text or "")
        elif tag == "commit":
            cmds.commit = True
        elif tag == "optimize":
            cmds.optimize = True
        elif tag == "rollback":
            cmds.rollback = True
        else:
            raise ValueError(f"Unexpected <{tag}> at update root")
    return cmds


def _xml_doc(doc_el) -> dict:
    doc: dict[str, Any] = {}
    update_map: dict[str, dict] = {}
    for f in doc_el:
        if f.tag != "field":
            raise ValueError(
                f"XML element <doc> has invalid child: <{f.tag}>"
            )
        name = f.attrib["name"]
        v = None if f.attrib.get("null") == "true" else (f.text or "")
        op = f.attrib.get("update")
        if op is not None:
            ext = update_map.setdefault(name, {})
            if op in ext:  # multiple values for one op -> list
                prev = ext[op]
                ext[op] = (prev if isinstance(prev, list) else [prev]) + [v]
            else:
                ext[op] = v
            continue
        if name in doc:  # repeated field name -> multiValued
            prev = doc[name]
            doc[name] = (prev if isinstance(prev, list) else [prev]) + [v]
        else:
            doc[name] = v
    doc.update(update_map)
    return doc


def parse_javabin_update(payload: bytes) -> UpdateCommands:
    """JavaBinUpdateRequestCodec.unmarshal analog (solr/solrj/src/java/
    org/apache/solr/client/solrj/request/JavaBinUpdateRequestCodec.java
    :54-83 marshal envelope): a javabin NamedList with "params"
    (commitWithin), "delById"/"delByIdMap", "delByQ", and "docs" — an
    iterator of SolrInputDocuments.  Field and document boosts are
    accepted and dropped (index-time boosts fold into norms upstream of
    this layer, like the 4.10 URP chain does)."""
    from lucene_solr_spark import javabin as jb

    tree = jb.loads(payload)
    if not isinstance(tree, jb.NamedList):
        raise ValueError("javabin update root must be a NamedList")
    cmds = UpdateCommands()
    params = tree.get("params")
    if isinstance(params, jb.NamedList):
        cw = params.get("commitWithin")
        cw = cw.value if isinstance(cw, jb._Wrapper) else cw
        if cw is not None and int(cw) >= 0:
            cmds.commit_within = int(cw)
    for did in tree.get("delById") or []:
        cmds.delete_ids.append(str(did))
    del_map = tree.get("delByIdMap")
    if del_map:
        for did in del_map:
            cmds.delete_ids.append(str(did))
    for q in tree.get("delByQ") or []:
        cmds.delete_queries.append(str(q))
    for doc in tree.get("docs") or []:
        out: dict[str, Any] = {}
        for name, val, _boost in doc.fields:
            if isinstance(val, jb._Wrapper):
                val = val.value
            if name in out:
                prev = out[name]
                out[name] = (
                    prev if isinstance(prev, list) else [prev]
                ) + [val]
            else:
                out[name] = val
        cmds.adds.append(out)
    return cmds


def apply_update(
    spark: SparkSession,
    root: str,
    cmds: UpdateCommands,
    key_col: str = "url",
):
    """Drive parsed commands against a committed store, in Solr's effective
    order for a single request: deletes first (delete-by-id, then DBQ),
    then adds as one update generation.  ``rollback`` discards the
    request's mutations entirely (nothing was committed yet, so it is a
    no-op on the store).  Returns the final Snapshot or None if nothing
    mutated.

    Adds require the streaming (gen-partitioned) store layout —
    update_documents appends a generation, exactly like Solr's /update
    into an NRT core; delete-only requests work on either layout."""
    from lucene_solr_spark.store.store import delete_by_key, delete_by_query
    from lucene_solr_spark.streaming.incremental import update_documents

    if cmds.rollback:
        return None
    snap = None
    if cmds.delete_ids:
        snap = delete_by_key(spark, root, cmds.delete_ids, key_col=key_col)
    for q in cmds.delete_queries:
        snap = delete_by_query(spark, root, q)
    if cmds.adds:
        from pyspark.sql import functions as F

        from lucene_solr_spark.pages import WARC_EPOCH

        df: DataFrame = spark.createDataFrame(cmds.adds)  # type: ignore[arg-type]
        # normalize to the store's pages shape (url, warc_ts, html, text,
        # lang): /update documents carry fields, not crawl artifacts, so
        # missing columns get the same deterministic synthesis
        # pages_from_documents uses
        if "html" not in df.columns:
            df = df.withColumn(
                "html",
                F.encode(
                    F.concat(
                        F.lit("<html><body><p>"), F.col("text"),
                        F.lit("</p></body></html>"),
                    ),
                    "UTF-8",
                ),
            )
        if "warc_ts" not in df.columns:
            df = df.withColumn(
                "warc_ts", F.timestamp_seconds(F.lit(WARC_EPOCH))
            )
        if "lang" not in df.columns:
            df = df.withColumn("lang", F.lit("en"))
        snap = update_documents(spark, root, df)
    return snap
