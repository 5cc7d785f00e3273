"""CollationField analog — locale-aware sort/range semantics.

Reference: solr/core/src/java/org/apache/solr/schema/CollationField.java:84
(a FieldType that indexes java.text.Collator sort keys so sorting and range
queries follow locale order, configured by language/country/variant +
strength 'primary'|'secondary'|'tertiary'|'identical' + decomposition —
CollationField.java:62-80) and the ICU twin
(solr/contrib/analysis-extras/.../ICUCollationField.java).

Spark-first mapping: Spark 4 ships ICU collations as a native string-type
property (`F.collate(col, name)`); a collated column sorts and compares in
locale order inside Tungsten — no UDF, no sort-key bytes to manage, and the
collation survives shuffles because it is part of the data type.  Strength
maps onto Spark's collation-name modifiers:

    tertiary  (reference default) -> '<locale>'        (case+accent aware)
    secondary                     -> '<locale>_CI'     (case differences
                                                        ignored)
    primary                       -> '<locale>_CI_AI'  (case+accent folded)
    identical                     -> '<locale>' (documented approximation:
                                     Spark exposes no identical-strength
                                     variant; tertiary is its closest order)

Scale shape: collation is a column-type annotation — sorts/ranges stay in
whole-stage codegen and TakeOrderedAndProject; nothing leaves the JVM.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_STRENGTHS = ("primary", "secondary", "tertiary", "identical")


def collation_name(
    language: str, country: str | None = None, strength: str = "tertiary"
) -> str:
    """Spark collation name for a CollationField locale + strength spec."""
    if strength not in _STRENGTHS:
        raise ValueError(
            f"strength must be one of {_STRENGTHS}, got {strength!r}"
        )
    loc = language if not country else f"{language}_{country}"
    if strength == "primary":
        return f"{loc}_CI_AI"
    if strength == "secondary":
        return f"{loc}_CI"
    return loc  # tertiary / identical (documented approximation)


def collated(
    col: Column | str,
    language: str,
    country: str | None = None,
    strength: str = "tertiary",
) -> Column:
    """The column with locale collation applied (sorts/compares in locale
    order; usable directly in orderBy and range predicates)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.collate(c, collation_name(language, country, strength))


def collation_range(
    col: Column | str,
    low: str | None,
    high: str | None,
    language: str,
    country: str | None = None,
    strength: str = "tertiary",
    include_low: bool = True,
    include_high: bool = True,
) -> Column:
    """Locale-order range predicate (CollationField.getRangeQuery —
    CollationField.java:227-240: range over collated sort keys)."""
    c = collated(col, language, country, strength)
    name = collation_name(language, country, strength)
    pred = F.lit(True)
    if low is not None:
        lo = F.collate(F.lit(low), name)
        pred = pred & (c >= lo if include_low else c > lo)
    if high is not None:
        hi = F.collate(F.lit(high), name)
        pred = pred & (c <= hi if include_high else c < hi)
    return pred
