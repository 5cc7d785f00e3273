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
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_ENTRY_RE = re.compile(
    r"""\s*(?:(?P<alias>[A-Za-z_][A-Za-z0-9_]*)\s*:\s*)?"""
    r"""(?P<body>\*|[A-Za-z_][A-Za-z0-9_.]*(?:\([^()]*(?:\([^()]*\)[^()]*)*\))?)\s*"""
)


def parse_return_fields(
    fl: str, now_epoch_ms: int | None = None
) -> list[tuple[str, "Column | str"]]:
    """Parse an fl spec -> [(output_name, column-or-'*')]."""
    from lucene_solr_spark.functions import parse_function_query

    out: list[tuple[str, Column | str]] = []
    pos = 0
    while pos < len(fl):
        if fl[pos] in ", ":
            pos += 1
            continue
        m = _ENTRY_RE.match(fl, pos)
        if not m or m.end() == pos:
            raise ValueError(f"bad fl entry at {fl[pos:]!r}")
        pos = m.end()
        alias, body = m.group("alias"), m.group("body")
        if body == "*":
            if alias:
                raise ValueError("'*' cannot be aliased")
            out.append(("*", "*"))
        elif "(" in body:
            if not alias:
                raise ValueError(f"function pseudo-field needs alias: {body!r}")
            out.append((alias, parse_function_query(body, now_epoch_ms=now_epoch_ms)))
        else:
            out.append((alias or body, F.col(body)))
    if not out:
        raise ValueError("empty fl")
    return out


def return_fields(
    df: DataFrame, fl: str, now_epoch_ms: int | None = None
) -> DataFrame:
    """Apply an fl spec to a result frame (the doc page after search/join —
    ``score`` is just a column here, matching the score pseudo-field)."""
    entries = parse_return_fields(fl, now_epoch_ms=now_epoch_ms)
    cols = []
    for name, col in entries:
        if isinstance(col, str) and col == "*":
            cols.append(F.col("*"))
        else:
            cols.append(col.alias(name))
    return df.select(*cols)
