"""EnumField analog: a closed string vocabulary stored/sorted/ranged by its
configured ordinal.

Reference: solr/core/src/java/org/apache/solr/schema/EnumField.java —
``enumsConfig`` xml declares the ordered values; the field indexes the INT
(the declared order, not lexicographic), so sorts and ranges follow enum
severity rather than string order.  Mapping semantics:

- ``stringValueToIntValue`` (:414-432): known string -> its int; else parse
  as int and accept when that int names a value; else ``DEFAULT_VALUE`` (-1).
- ``intValueToStringValue`` (:398-407): known int -> its string; else "-1".
- ``getSortField`` (:179-185): int sort, missing sorts as Integer.MIN_VALUE
  (i.e. first ascending / last descending).
- ``getRangeQuery`` (:223-243): bounds through stringValueToIntValue, then a
  numeric int range.

Scale shape: the vocabulary is schema config (bounded, typically <100
values), so every operation compiles to a literal CASE chain inside
whole-stage codegen — no join, no UDF, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEFAULT_VALUE = -1  # EnumField.DEFAULT_VALUE
_MISSING_SORT = -(1 << 31)  # Integer.MIN_VALUE missing-value sort key


class EnumFieldType:
    def __init__(self, values: list[str]):
        if len(values) != len(set(values)):
            raise ValueError("enum values must be unique")
        self.values = list(values)
        self._to_int = {v: i for i, v in enumerate(values)}

    # driver-side mappings (query bounds, stored-value render)
    def string_to_int(self, s: str | None) -> int | None:
        if s is None:
            return None
        if s in self._to_int:
            return self._to_int[s]
        try:
            i = int(s)
        except ValueError:
            return DEFAULT_VALUE
        return i if 0 <= i < len(self.values) else DEFAULT_VALUE

    def int_to_string(self, i: int | None) -> str | None:
        if i is None:
            return None
        if 0 <= i < len(self.values):
            return self.values[i]
        return str(DEFAULT_VALUE)

    # column-side mappings
    def ord_col(self, col: Column) -> Column:
        """String column -> enum ordinal (stringValueToIntValue for stored
        values: unknown strings map to DEFAULT_VALUE, null stays null)."""
        expr = None
        for v, i in self._to_int.items():
            expr = (
                F.when(col == v, F.lit(i))
                if expr is None
                else expr.when(col == v, F.lit(i))
            )
        return F.when(col.isNull(), F.lit(None).cast("int")).otherwise(
            expr.otherwise(F.lit(DEFAULT_VALUE))
        )

    def str_col(self, ord_col: Column) -> Column:
        """Enum ordinal column -> display string (intValueToStringValue)."""
        expr = None
        for v, i in self._to_int.items():
            expr = (
                F.when(ord_col == i, F.lit(v))
                if expr is None
                else expr.when(ord_col == i, F.lit(v))
            )
        return F.when(
            ord_col.isNull(), F.lit(None).cast("string")
        ).otherwise(expr.otherwise(F.lit(str(DEFAULT_VALUE))))

    def sort_key(self, col: Column) -> Column:
        """getSortField: the ordinal with missing -> Integer.MIN_VALUE."""
        return F.coalesce(self.ord_col(col), F.lit(_MISSING_SORT))

    def term_filter(self, col: Column, value: str) -> Column:
        """Term query: equality on the resolved ordinal."""
        return self.ord_col(col) == F.lit(self.string_to_int(value))

    def range_filter(
        self,
        col: Column,
        low: str | None,
        high: str | None,
        min_inclusive: bool = True,
        max_inclusive: bool = True,
    ) -> Column:
        """getRangeQuery: bounds via stringValueToIntValue, numeric int
        range over the ordinal (docs with missing/unknown values carry
        ordinal null/-1 and fall out of positive-ordinal ranges)."""
        o = self.ord_col(col)
        pred = o.isNotNull()
        lo = self.string_to_int(low)
        hi = self.string_to_int(high)
        if lo is not None:
            pred = pred & (o >= lo if min_inclusive else o > lo)
        if hi is not None:
            pred = pred & (o <= hi if max_inclusive else o < hi)
        return pred

    def oracle_ord_sql(self, col_sql: str) -> str:
        """The ordinal mapping as ANSI SQL (for DuckDB oracles)."""
        whens = " ".join(
            f"WHEN '{v}' THEN {i}" for v, i in self._to_int.items()
        )
        return (
            f"CASE WHEN {col_sql} IS NULL THEN NULL "
            f"ELSE (CASE {col_sql} {whens} ELSE {DEFAULT_VALUE} END) END"
        )
