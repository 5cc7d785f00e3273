"""CurrencyField analog: money values as ``"amount,CODE"`` strings with
exchange-rate conversion, range filtering, sorting, and the ``currency()``
value source.

Reference semantics (solr/core/src/java/org/apache/solr/schema/
CurrencyField.java):

- ``CurrencyValue.parse`` (:912-940): split at ',', default currency when no
  code; amount -> ``Math.round(value * 10^fractionDigits)`` long minor units.
- ``convertAmount`` (:986-1003): ``value = amount * rate`` as double, then a
  LOOP of ``*0.1`` / ``*10.0`` per fraction-digit delta (NOT one pow —
  repeated IEEE multiplies), truncated ``(long) value``.  We replay the same
  op sequence as Catalyst doubles, so results are bit-identical.
- ``RawCurrencyValueSource`` (:476+): per-doc amount converted into a target
  currency's minor units (long); same-currency docs short-circuit to the
  raw amount.  Used by range queries (:325-341, bounds in the bound's own
  currency) and sort (:344-347, default currency).
- ``ConvertedCurrencyValueSource`` (:369-431): the ``currency(field[,CODE])``
  function (ValueSourceParser.java:393-407) — raw source targeting the
  field's default currency, ONE more rate hop default->CODE, divided by
  ``10^targetFractionDigits`` into a major-units double.
- ``FileExchangeRateProvider.getExchangeRate`` (:690-713): same code -> 1.0,
  direct rate, else 1/inverse rate, else error.

Scale shape: everything compiles to one whole-stage-codegen projection over
a bounded CASE chain keyed by the currency code column — no UDF, no join,
no shuffle.  The rate table is engine config (a ``currency.xml`` analog),
broadcast implicitly as literals.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

# java.util.Currency#getDefaultFractionDigits (ISO 4217) for the codes the
# engine's default config knows.  Adding a currency = adding a row here and
# a rate below (schema config, like Solr's currencyConfig file).
FRACTION_DIGITS: dict[str, int] = {
    "USD": 2,
    "EUR": 2,
    "GBP": 2,
    "CHF": 2,
    "CAD": 2,
    "AUD": 2,
    "JPY": 0,
    "KRW": 0,
    "KWD": 3,
}

# Engine-local exchange-rate config (the currency.xml analog; values are
# this engine's own fixture config, not reference data).  Asymmetric rates
# are allowed exactly as in FileExchangeRateProvider; missing direct pairs
# fall back to 1/inverse.
DEFAULT_RATES: dict[tuple[str, str], float] = {
    ("USD", "EUR"): 0.92,
    ("USD", "GBP"): 0.79,
    ("USD", "JPY"): 147.0,
    ("USD", "KRW"): 1350.0,
    ("USD", "CHF"): 0.88,
    ("USD", "CAD"): 1.36,
    ("USD", "AUD"): 1.52,
    ("USD", "KWD"): 0.31,
}


def exchange_rate(
    src: str, tgt: str, rates: dict[tuple[str, str], float] | None = None
) -> float:
    """FileExchangeRateProvider.getExchangeRate: same code -> 1.0, direct
    rate, else the inverse of the reverse pair, else an error."""
    rates = DEFAULT_RATES if rates is None else rates
    if src == tgt:
        return 1.0
    if (src, tgt) in rates:
        return rates[(src, tgt)]
    if (tgt, src) in rates:
        return 1.0 / rates[(tgt, src)]
    raise ValueError(f"no available conversion rate between {src} and {tgt}")


def fraction_digits(code: str) -> int:
    if code not in FRACTION_DIGITS:
        raise ValueError(f"currency code not supported: {code}")
    return FRACTION_DIGITS[code]


def parse_currency_value(external: str, default_currency: str = "USD"):
    """CurrencyValue.parse for a driver-side string (query bounds): returns
    ``(amount_minor_units, code)`` or ``None`` for null/'*' bounds."""
    if external is None:
        return None
    amount, code = external, default_currency
    if "," in external:
        amount, code = external.split(",", 1)
    if amount == "*":
        return None
    d = fraction_digits(code)
    # Java Math.round(double) == floor(x + 0.5)
    return int(math.floor(float(amount) * (10.0**d) + 0.5)), code


def currency_code_col(col: Column, default_currency: str = "USD") -> Column:
    """The code component of an ``amount,CODE`` string column.

    Codegen note (applies to this whole module): every construct here
    references its input column exactly ONCE — `split().getItem()` instead
    of `when(contains).otherwise()`, literal-map `element_at` lookups
    instead of per-currency CASE chains.  CollapseProject inlines aliased
    input expressions into every reference site, so an N-way CASE over a
    computed `code` column duplicates the code expression N times and the
    nested amount/rate CASEs multiplied the tree ~100x — past janino's
    64 KB method limit, silently disabling whole-stage codegen."""
    return F.coalesce(
        F.get(F.split(col, ",", 2), 1), F.lit(default_currency)
    )


def _digits_col(code: Column) -> Column:
    """fractionDigits as a literal-map lookup over the code column (unknown
    codes -> null, which nulls everything downstream).  element_at on a
    literal map references `code` once (vs N times for a CASE chain)."""
    m = F.create_map(
        *[x for c, d in FRACTION_DIGITS.items() for x in (F.lit(c), F.lit(d))]
    )
    return F.element_at(m, code)


def currency_amount_col(col: Column, default_currency: str = "USD") -> Column:
    """The minor-units long component (CurrencyValue.parse arithmetic:
    Math.round(value * 10^digits) per the value's own currency).

    Codegen note: the scale factor is ``pow(10.0, digits)`` over a small
    literal CASE rather than one CASE branch per currency duplicating the
    parse expression — nested per-currency CASEs multiplied the expression
    tree ~80x and pushed generated methods past janino's 64 KB limit
    (whole-stage codegen then silently falls back to interpreted eval).
    ``pow(10.0, d)`` is IEEE-exact for d in 0..3, so minor units are
    unchanged."""
    code = currency_code_col(col, default_currency)
    v = F.get(F.split(col, ",", 2), 0).cast("double")
    scale = F.pow(F.lit(10.0), _digits_col(code).cast("double"))
    return F.floor(v * scale + F.lit(0.5)).cast("long")


def _convert_chain(amount: Column, rate: float, src_digits: int, tgt_digits: int) -> Column:
    """convertAmount(rate, srcDigits, amount, tgtDigits) as the reference's
    exact double-op sequence: amount*rate, then one *0.1 or *10.0 per digit
    of delta, then a (long) truncation."""
    v = amount.cast("double") * F.lit(float(rate))
    delta = tgt_digits - src_digits
    for _ in range(-delta if delta < 0 else delta):
        v = v * F.lit(0.1 if delta < 0 else 10.0)
    return v.cast("long")


def raw_currency_col(
    col: Column,
    target_code: str,
    default_currency: str = "USD",
    rates: dict[tuple[str, str], float] | None = None,
) -> Column:
    """RawCurrencyValueSource: each value converted to ``target_code`` minor
    units (long).  The rate is a literal-map lookup keyed by the code
    column (the reference caches it per-segment ord — here Catalyst folds
    it); the digit-shift chain is one CASE branch per DISTINCT
    fraction-digit delta (<=3 branches), not per currency, keeping the
    generated code small (see currency_code_col's codegen note).

    The reference throws per-doc when no rate exists (getExchangeRate ->
    SolrException); a columnar plan can't throw per-row, so unconvertible
    source currencies yield null (excluded from ranges/sorts).  Driver-side
    bound parsing still raises eagerly via exchange_rate()."""
    code = currency_code_col(col, default_currency)
    amount = currency_amount_col(col, default_currency)
    tgt_d = fraction_digits(target_code)
    rate_pairs: list[Column] = []
    deltas: dict[int, list[str]] = {}
    for c, d in FRACTION_DIGITS.items():
        if c == target_code:
            continue
        try:
            rate = exchange_rate(c, target_code, rates)
        except ValueError:
            continue
        rate_pairs.extend([F.lit(c), F.lit(float(rate))])
        deltas.setdefault(tgt_d - d, []).append(c)
    if not rate_pairs:
        return F.when(code == target_code, amount)
    # null rate (unconvertible / same-code) -> null v
    v = amount.cast("double") * F.element_at(F.create_map(*rate_pairs), code)
    conv = None
    for delta, codes in deltas.items():
        w = v
        for _ in range(-delta if delta < 0 else delta):
            w = w * F.lit(0.1 if delta < 0 else 10.0)
        cond = code.isin(codes)
        conv = F.when(cond, w) if conv is None else conv.when(cond, w)
    return F.when(code == target_code, amount).otherwise(conv.cast("long"))


def converted_currency_col(
    col: Column,
    target_code: str | None = None,
    default_currency: str = "USD",
    rates: dict[tuple[str, str], float] | None = None,
) -> Column:
    """The ``currency(field[,CODE])`` value source
    (ValueSourceParser.java:393-407 -> ConvertedCurrencyValueSource):
    raw-convert into the field's default currency, apply the single
    default->CODE rate with another convertAmount truncation, divide by
    10^targetDigits into major units (double)."""
    tgt = target_code or default_currency
    raw = raw_currency_col(col, default_currency, default_currency, rates)
    tgt_d = fraction_digits(tgt)
    if tgt == default_currency:
        conv = raw
    else:
        rate = exchange_rate(default_currency, tgt, rates)
        conv = _convert_chain(raw, rate, fraction_digits(default_currency), tgt_d)
    return conv.cast("double") / F.lit(10.0**tgt_d)


def currency_range_filter(
    col: Column,
    lower: str | None,
    upper: str | None,
    min_inclusive: bool = True,
    max_inclusive: bool = True,
    default_currency: str = "USD",
    rates: dict[tuple[str, str], float] | None = None,
) -> Column:
    """CurrencyField.getRangeQuery (:312-341): bounds must share a currency;
    each doc's value is converted into the BOUND currency and compared in
    minor units; docs without a value never match."""
    p1 = parse_currency_value(lower, default_currency)
    p2 = parse_currency_value(upper, default_currency)
    if p1 is not None and p2 is not None and p1[1] != p2[1]:
        raise ValueError(
            "range queries only supported when upper and lower bound "
            "have same currency"
        )
    bound_code = (p1 or p2 or (0, default_currency))[1]
    v = raw_currency_col(col, bound_code, default_currency, rates)
    pred = col.isNotNull()
    if p1 is not None:
        pred = pred & (v >= p1[0] if min_inclusive else v > p1[0])
    if p2 is not None:
        pred = pred & (v <= p2[0] if max_inclusive else v < p2[0])
    return pred


def convert_amount(
    amount: int,
    src: str,
    tgt: str,
    rates: dict[tuple[str, str], float] | None = None,
) -> int:
    """Driver-side convertAmount (for tests/oracles): the same op sequence
    as _convert_chain in pure Python doubles."""
    if src == tgt:
        return amount
    rate = exchange_rate(src, tgt, rates)
    v = float(amount) * rate
    delta = fraction_digits(tgt) - fraction_digits(src)
    for _ in range(-delta if delta < 0 else delta):
        v = v * (0.1 if delta < 0 else 10.0)
    return int(v)  # Java (long) cast truncates toward zero
