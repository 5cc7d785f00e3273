"""CurrencyField / EnumField analogs + the round-4 value-source additions
(literal, currency(), boost(), vector()).

Independent-oracle discipline: the Spark columns are differentialed against
pure-Python replays of the reference arithmetic (CurrencyValue.parse /
convertAmount in `convert_amount`, EnumField's mapping tables), not against
the generated DuckDB SQL.
"""

from __future__ import annotations

import math

import pytest

from lucene_solr_spark.functions import parse_function_query
from lucene_solr_spark.functions.currency import (
    convert_amount,
    converted_currency_col,
    currency_amount_col,
    currency_code_col,
    currency_range_filter,
    exchange_rate,
    fraction_digits,
    parse_currency_value,
    raw_currency_col,
)
from lucene_solr_spark.index.enumfield import EnumFieldType


# ---------------------------------------------------------------------------
# CurrencyField — driver-side semantics
# ---------------------------------------------------------------------------


def test_exchange_rate_lookup():
    """FileExchangeRateProvider.getExchangeRate: identity, direct,
    1/inverse, error (CurrencyField.java:690-713)."""
    assert exchange_rate("USD", "USD") == 1.0
    assert exchange_rate("USD", "EUR") == 0.92
    assert exchange_rate("EUR", "USD") == pytest.approx(1.0 / 0.92)
    with pytest.raises(ValueError, match="no available conversion rate"):
        exchange_rate("EUR", "GBP")  # no direct or inverse pair configured


def test_parse_currency_value():
    """CurrencyValue.parse (:912-940): ',' split, default code, minor-unit
    rounding per the value's own fractionDigits, '*'/null bounds -> None."""
    assert parse_currency_value("10.00,USD") == (1000, "USD")
    assert parse_currency_value("10.005,USD") == (1001, "USD")  # round half up
    assert parse_currency_value("5") == (500, "USD")  # default currency
    assert parse_currency_value("5", "JPY") == (5, "JPY")  # 0 digits
    assert parse_currency_value("1.2345,KWD") == (1235, "KWD")  # 3 digits
    assert parse_currency_value("*") is None
    assert parse_currency_value(None) is None
    with pytest.raises(ValueError, match="not supported"):
        parse_currency_value("1,XXX")


def test_convert_amount_digit_shifts():
    """convertAmount (:986-1003) replays the loop of *0.1/*10.0 per digit
    delta with a final (long) truncation — NOT round()."""
    # USD(2) -> JPY(0): 1000 minor USD * 147.0 = 147000.0, *0.1*0.1 -> 1470
    assert convert_amount(1000, "USD", "JPY") == 1470
    # JPY(0) -> USD(2): 1470 * (1/147) = 10.0, *10*10 -> 1000
    assert convert_amount(1470, "JPY", "USD") == 999 or convert_amount(
        1470, "JPY", "USD"
    ) == 1000  # inverse-rate doubles may land just under; truncation decides
    # truncation, not rounding: 999 USD minor * 0.92 = 919.08 -> 919
    assert convert_amount(999, "USD", "EUR") == 919
    assert convert_amount(42, "USD", "USD") == 42


# ---------------------------------------------------------------------------
# CurrencyField — Spark columns vs the pure-Python replay
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def money_df(spark):
    rows = [
        (1, "10.00,USD"),
        (2, "9.20,EUR"),
        (3, "1470,JPY"),
        (4, "7.90,GBP"),
        (5, "25"),  # no code -> default USD
        (6, None),
        (7, "0.005,USD"),  # rounds to 1 minor unit
        (8, "123.45,KWD"),
    ]
    return spark.createDataFrame(rows, "id long, price string")


def test_currency_code_and_amount_cols(spark, money_df):
    got = {
        r.id: (r.code, r.amt)
        for r in money_df.select(
            "id",
            currency_code_col("price").alias("code") if False else
            currency_code_col(money_df.price).alias("code"),
            currency_amount_col(money_df.price).alias("amt"),
        ).collect()
    }
    for i, price in [(1, "10.00,USD"), (2, "9.20,EUR"), (3, "1470,JPY"),
                     (4, "7.90,GBP"), (5, "25"), (7, "0.005,USD"),
                     (8, "123.45,KWD")]:
        amt, code = parse_currency_value(price)
        assert got[i] == (code, amt), price
    assert got[6] == (None, None) or got[6][1] is None


def test_raw_currency_col_differential(spark, money_df):
    """Every configured currency as the target: Spark column == the
    pure-Python convertAmount replay, bit for bit.  Source currencies with
    no configured rate to the target yield null (the columnar analog of the
    reference's per-doc SolrException)."""
    targets = ["USD", "EUR", "JPY", "KWD"]
    cols = [raw_currency_col(money_df.price, t).alias(t) for t in targets]
    got = {r.id: r.asDict() for r in money_df.select("id", *cols).collect()}
    prices = {1: "10.00,USD", 2: "9.20,EUR", 3: "1470,JPY", 4: "7.90,GBP",
              5: "25", 7: "0.005,USD", 8: "123.45,KWD"}
    for i, price in prices.items():
        amt, code = parse_currency_value(price)
        for t in targets:
            try:
                expect = convert_amount(amt, code, t)
            except ValueError:
                expect = None  # unconvertible pair -> null column
            assert got[i][t] == expect, (i, t)
    assert all(got[6][t] is None for t in targets)


def test_currency_range_filter_semantics(spark, money_df):
    """getRangeQuery (:312-341): per-doc conversion into the BOUND's
    currency; mixed-currency bounds error; nulls never match."""
    ids = lambda pred: {  # noqa: E731
        r.id for r in money_df.filter(pred).select("id").collect()
    }
    # [9.00,USD TO 11.00,USD]: USD 10.00 in; EUR 9.20 -> 1000 USD minor in;
    # JPY 1470 -> ~999-1000 in; GBP 7.90 -> 1000 in; 25 out; KWD huge out
    got = ids(currency_range_filter(money_df.price, "9.00,USD", "11.00,USD"))
    expect = set()
    for i, price in [(1, "10.00,USD"), (2, "9.20,EUR"), (3, "1470,JPY"),
                     (4, "7.90,GBP"), (5, "25"), (7, "0.005,USD"),
                     (8, "123.45,KWD")]:
        amt, code = parse_currency_value(price)
        if 900 <= convert_amount(amt, code, "USD") <= 1100:
            expect.add(i)
    assert got == expect and 1 in got and 5 not in got and 6 not in got
    # exclusive bounds
    got_ex = ids(
        currency_range_filter(
            money_df.price, "10.00,USD", "25.00,USD",
            min_inclusive=False, max_inclusive=False,
        )
    )
    assert 1 not in got_ex and 5 not in got_ex
    # open-ended upper
    assert ids(currency_range_filter(money_df.price, "10.00,USD", None)) >= {1, 5, 8}
    with pytest.raises(ValueError, match="same currency"):
        currency_range_filter(money_df.price, "1,USD", "2,EUR")


def test_converted_currency_and_function_query(spark, money_df):
    """currency(field[,CODE]) (ValueSourceParser.java:393-407): raw into
    the default currency, one more hop to CODE, major-units double."""
    got = {
        r.id: (r.usd, r.eur, r.jpy)
        for r in money_df.select(
            "id",
            parse_function_query("currency(price)").alias("usd"),
            parse_function_query("currency(price,'EUR')").alias("eur"),
            parse_function_query("currency(price,'JPY')").alias("jpy"),
        ).collect()
    }
    for i, price in [(1, "10.00,USD"), (2, "9.20,EUR"), (3, "1470,JPY")]:
        amt, code = parse_currency_value(price)
        raw_usd = convert_amount(amt, code, "USD")
        assert got[i][0] == raw_usd / 100.0
        assert got[i][1] == convert_amount(raw_usd, "USD", "EUR") / 100.0
        assert got[i][2] == convert_amount(raw_usd, "USD", "JPY") / 1.0
    # column API parity
    c = {
        r.id: r.v
        for r in money_df.select(
            "id", converted_currency_col(money_df.price, "EUR").alias("v")
        ).collect()
    }
    assert c[1] == got[1][1] and c[2] == got[2][1]


# ---------------------------------------------------------------------------
# EnumField
# ---------------------------------------------------------------------------

SEV = EnumFieldType(["Not Available", "Low", "Medium", "High", "Critical"])


def test_enum_driver_mappings():
    """stringValueToIntValue (:414-432) / intValueToStringValue (:398-407)."""
    assert SEV.string_to_int("Low") == 1
    assert SEV.string_to_int("Critical") == 4
    assert SEV.string_to_int("3") == 3  # numeric string naming a value
    assert SEV.string_to_int("99") == -1  # out-of-range int -> DEFAULT_VALUE
    assert SEV.string_to_int("bogus") == -1
    assert SEV.string_to_int(None) is None
    assert SEV.int_to_string(2) == "Medium"
    assert SEV.int_to_string(77) == "-1"
    with pytest.raises(ValueError, match="unique"):
        EnumFieldType(["a", "a"])


@pytest.fixture(scope="module")
def enum_df(spark):
    rows = [
        (1, "Low"), (2, "Critical"), (3, "Medium"), (4, None),
        (5, "bogus"), (6, "High"), (7, "Not Available"),
    ]
    return spark.createDataFrame(rows, "id long, sev string")


def test_enum_ord_and_str_cols(spark, enum_df):
    got = {
        r.id: (r.o, r.s)
        for r in enum_df.select(
            "id",
            SEV.ord_col(enum_df.sev).alias("o"),
            SEV.str_col(SEV.ord_col(enum_df.sev)).alias("s"),
        ).collect()
    }
    assert got[1] == (1, "Low")
    assert got[2] == (4, "Critical")
    assert got[4] == (None, None)
    assert got[5] == (-1, "-1")  # unknown -> DEFAULT_VALUE -> "-1"
    assert got[7] == (0, "Not Available")


def test_enum_sort_declared_order(spark, enum_df):
    """getSortField (:179-185): declared order, missing first ascending
    (Integer.MIN_VALUE) — NOT lexicographic (Critical < Low as strings)."""
    order = [
        r.id
        for r in enum_df.orderBy(
            SEV.sort_key(enum_df.sev).asc(), enum_df.id.asc()
        ).collect()
    ]
    # missing(4) first, then unknown(5,-1), then declared severity order
    assert order == [4, 5, 7, 1, 3, 6, 2]


def test_enum_range_filter(spark, enum_df):
    """getRangeQuery (:223-243): [Low TO High] spans the DECLARED order —
    includes Medium (lexicographically above Low AND High)."""
    ids = {
        r.id
        for r in enum_df.filter(
            SEV.range_filter(enum_df.sev, "Low", "High")
        ).collect()
    }
    assert ids == {1, 3, 6}
    # half-open + exclusive
    ids2 = {
        r.id
        for r in enum_df.filter(
            SEV.range_filter(enum_df.sev, "Medium", None, min_inclusive=False)
        ).collect()
    }
    assert ids2 == {2, 6}


def test_enum_oracle_sql_matches():
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES ('Low'), ('bogus'), "
        "(NULL), ('Critical')) v(sev)"
    )
    rows = con.execute(
        f"SELECT {SEV.oracle_ord_sql('sev')} FROM t"
    ).fetchall()
    assert [r[0] for r in rows] == [1, -1, None, 4]


# ---------------------------------------------------------------------------
# Round-4 value-source additions: literal / vector / boost
# ---------------------------------------------------------------------------


def test_literal_value_source(spark):
    d = spark.createDataFrame([(1,)], "id long")
    got = d.select(
        parse_function_query("literal('hello world')").alias("v")
    ).collect()
    assert got[0].v == "hello world"
    # strdist over a literal (LiteralValueSource's typical use)
    got2 = d.select(
        parse_function_query(
            "strdist(literal('kitten'),literal('kitten'),\"edit\")"
        ).alias("v")
    ).collect()
    assert got2[0].v == pytest.approx(1.0)


def test_vector_value_source(spark):
    """vector() (ValueSourceParser.java:268-273): MultiValueSource flattened
    into dist/sqedist component lists."""
    d = spark.createDataFrame(
        [(1, 1.0, 2.0, 4.0, 6.0)],
        "id long, x1 double, y1 double, x2 double, y2 double",
    )
    v = lambda q: d.select(  # noqa: E731
        parse_function_query(q).alias("v")
    ).collect()[0].v
    assert v("sqedist(vector(x1,y1),vector(x2,y2))") == 25.0
    assert v("dist(2,vector(x1,y1),vector(x2,y2))") == 5.0
    # mixed marker + scalars still lines up dimension-wise
    assert v("dist(1,vector(x1,y1),x2,y2)") == 7.0
    with pytest.raises(ValueError, match="at least one"):
        parse_function_query("vector()")


def test_boost_value_source_end_to_end(spark, sf_dir):
    """boost(q, vs) (ValueSourceParser.java:286-293): subquery score * vs
    for matches, 0 otherwise."""
    from lucene_solr_spark.driver_queries import get_index
    from lucene_solr_spark.search.bm25 import search
    from lucene_solr_spark.search.qparsers import qparser_search

    index = get_index(spark, sf_dir)
    want = {
        r.docid: r.score for r in search(index, "table", k=1000).collect()
    }
    got = {
        r.docid: r.score
        for r in qparser_search(
            index, "{!func}boost($qq, 2)", k=1000, req={"qq": "table"}
        ).collect()
        if r.score != 0.0
    }
    assert set(got) == set(want)
    for docid, s in got.items():
        assert s == pytest.approx(2.0 * want[docid], rel=1e-4), docid
    with pytest.raises(ValueError, match="quoted string"):
        parse_function_query("boost(sum(1,2), 2)", subqueries=[])
