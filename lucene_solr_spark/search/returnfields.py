"""fl= return-fields: projection with renames and function pseudo-fields.

Reference: SolrReturnFields (solr/core/src/java/org/apache/solr/search/
SolrReturnFields.java:80-131 parseFieldList): a comma/space-separated field
list where each entry is a stored field (``lang``), a rename
(``alias:field`` -> RenameFieldTransformer, :131), a function pseudo-field
(``len:log(n_chars)`` -> the function-query compiler), the ``score``
pseudo-field, or ``*`` (all stored fields).

Spark shape: the whole fl spec compiles to ONE ``select`` projection —
column pruning reaches the Parquet scan (ReadSchema lists only the fl
sources), and function pseudo-fields are codegen'd Catalyst expressions from
the same registry the func QParser uses.

Doc transformers (solr/core/src/java/org/apache/solr/response/transform/
TransformerFactory.java:95-103 defaultFactories): ``[docid]``
(DocIdAugmenterFactory — here the engine docid IS the stable id),
``[value v=.. t=..]`` (ValueAugmenterFactory — a typed constant column),
and ``[explain]`` (ExplainAugmenterFactory — resolved by handler.select,
which holds the query context; the projection here just passes the
pre-joined column through).
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_IDENT_RE = re.compile(r"^[A-Za-z_][A-Za-z0-9_.]*$")
_ALIAS_RE = re.compile(r"^([A-Za-z_][A-Za-z0-9_]*)\s*:\s*(.+)$", re.DOTALL)


def _split_entries(fl: str) -> list[str]:
    """Split on commas/whitespace at paren depth 0 — function pseudo-fields
    nest arbitrarily deep, so this is a scanner, not a regex."""
    entries: list[str] = []
    buf: list[str] = []
    depth = 0
    for ch in fl:
        if ch in "([":
            depth += 1
        elif ch in ")]":
            depth -= 1
            if depth < 0:
                raise ValueError(f"unbalanced parens in fl: {fl!r}")
        if depth == 0 and ch in ", \t\n":
            if buf:
                entries.append("".join(buf))
                buf = []
            continue
        buf.append(ch)
    if depth != 0:
        raise ValueError(f"unbalanced parens in fl: {fl!r}")
    if buf:
        entries.append("".join(buf))
    return entries


def parse_return_fields(
    fl: str, now_epoch_ms: int | None = None
) -> list[tuple[str, "Column | str"]]:
    """Parse an fl spec -> [(output_name, column-or-'*')]."""
    from lucene_solr_spark.functions import parse_function_query

    out: list[tuple[str, Column | str]] = []
    for entry in _split_entries(fl):
        alias = None
        body = entry
        m = _ALIAS_RE.match(entry)
        if m:
            alias, body = m.group(1), m.group(2)
        if body == "*":
            if alias:
                raise ValueError("'*' cannot be aliased")
            out.append(("*", "*"))
        elif body.startswith("["):
            if not body.endswith("]"):
                raise ValueError(f"bad transformer entry: {entry!r}")
            inner = body[1:-1].strip()
            tname, _, targs = inner.partition(" ")
            if tname == "docid":
                out.append((alias or "[docid]", F.col("docid")))
            elif tname == "value":
                kv = dict(
                    p.split("=", 1) for p in targs.split() if "=" in p
                )
                if "v" not in kv:
                    raise ValueError("[value] needs v=<literal>")
                t = kv.get("t", "str")
                if t == "date":
                    # ValueAugmenterFactory t=date yields a Date object —
                    # parse to a real timestamp, not a string passthrough
                    col = F.to_timestamp(F.lit(kv["v"]))
                else:
                    casts = {"int": "long", "float": "double",
                             "double": "double", "str": "string"}
                    if t not in casts:
                        raise ValueError(
                            f"[value] unknown t={t!r} (int|float|double|date|str)"
                        )
                    col = F.lit(kv["v"]).cast(casts[t])
                out.append((alias or "[value]", col))
            elif tname == "explain":
                # resolved upstream: handler.select joins the explanation
                # column before projecting
                out.append((alias or "[explain]", F.col("[explain]")))
            else:
                raise ValueError(f"unknown doc transformer: {body!r}")
        elif "(" in body:
            if not alias:
                raise ValueError(f"function pseudo-field needs alias: {body!r}")
            out.append((alias, parse_function_query(body, now_epoch_ms=now_epoch_ms)))
        elif _IDENT_RE.match(body):
            out.append((alias or body, F.col(body)))
        else:
            raise ValueError(f"bad fl entry: {entry!r}")
    if not out:
        raise ValueError("empty fl")
    return out


def return_fields(
    df: DataFrame, fl: str, now_epoch_ms: int | None = None
) -> DataFrame:
    """Apply an fl spec to a result frame (the doc page after search/join —
    ``score`` is just a column here, matching the score pseudo-field).

    ``*`` expands to the frame's columns, skipping any name an explicit
    entry already emits (Solr's fl dedupes — a field never appears twice)."""
    entries = parse_return_fields(fl, now_epoch_ms=now_epoch_ms)
    explicit = {name for name, col in entries if not isinstance(col, str)}
    cols = []
    emitted: set[str] = set()
    for name, col in entries:
        if isinstance(col, str) and col == "*":
            for c in df.columns:
                if c not in explicit and c not in emitted:
                    cols.append(F.col(c))
                    emitted.add(c)
        elif name not in emitted:
            cols.append(col.alias(name))
            emitted.add(name)
    return df.select(*cols)


def attach_child_docs(
    parents: DataFrame,
    children: DataFrame,
    parent_key: str = "docid",
    child_parent_col: str = "parent_id",
    child_filter=None,
    limit: int = 10,
    out: str = "_childDocuments_",
) -> DataFrame:
    """``[child parentFilter=.. childFilter=.. limit=..]`` — the
    ChildDocTransformer (solr/core/src/java/org/apache/solr/response/
    transform/ChildDocTransformerFactory.java): each parent row in the
    result page gains an array of its (optionally filtered) child documents,
    at most ``limit`` per parent, in child-key order.

    ``children`` carries ``child_parent_col`` plus whatever child columns
    should appear; ``child_filter`` is an optional Column predicate (the
    childFilter query).  Spark shape: the parent frame is the k-bounded
    RESULT PAGE, so the join's left side is tiny; children aggregate once
    per parent key with a sort_array + slice for the limit — no window, no
    per-parent query loop (Lucene's block-adjacency walk becomes the keyed
    aggregation, same as to_parent_block_join)."""
    ch = children
    if child_filter is not None:
        ch = ch.where(child_filter)
    child_cols = [c for c in ch.columns if c != child_parent_col]
    packed = (
        ch.select(
            F.col(child_parent_col).alias(parent_key),
            F.struct(*[F.col(c) for c in child_cols]).alias("_c"),
        )
        .groupBy(parent_key)
        .agg(F.slice(F.array_sort(F.collect_list("_c")), 1, int(limit)).alias(out))
    )
    return parents.join(packed, parent_key, "left")
