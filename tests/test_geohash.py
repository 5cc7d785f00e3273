"""Geohash value sources: published vectors, Catalyst-vs-pure-Python
differential (two independent realizations: iterative range-halving vs
closed-form quantization + bit spread), decode round trips, ghhsin."""

import random

import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.functions.geohash import (
    geohash_decode,
    geohash_decode_cols,
    geohash_encode,
    geohash_encode_col,
    quant_of_hash,
)
from lucene_solr_spark.functions.value_sources import parse_function_query


def test_published_vectors():
    # geohash.org / Niemeyer's canonical examples
    assert geohash_encode(42.6, -5.6, 5) == "ezs42"
    assert geohash_encode(57.64911, 10.40744, 11) == "u4pruydqqvj"
    lat, lon = geohash_decode("ezs42")
    assert lat == pytest.approx(42.605, abs=1e-3)
    assert lon == pytest.approx(-5.603, abs=1e-3)
    # poles and date line stay in range
    assert len(geohash_encode(90.0, 180.0)) == 12
    assert len(geohash_encode(-90.0, -180.0)) == 12


def test_catalyst_matches_python(spark):
    rng = random.Random(7)
    rows = [
        (i, rng.uniform(-90, 90), rng.uniform(-180, 180)) for i in range(300)
    ]
    df = spark.createDataFrame(rows, "id long, lat double, lon double")
    got = df.select(
        "id", "lat", "lon",
        geohash_encode_col(F.col("lat"), F.col("lon")).alias("gh"),
    ).collect()
    for r in got:
        assert r.gh == geohash_encode(r.lat, r.lon), (r.lat, r.lon)
    # decode round trip: column decode == python decode, and quants agree
    dec = (
        spark.createDataFrame([(r.gh,) for r in got], "gh string")
        .select("gh", *[
            c.alias(n)
            for c, n in zip(geohash_decode_cols(F.col("gh")), ("clat", "clon"))
        ])
        .collect()
    )
    for r in dec:
        plat, plon = geohash_decode(r.gh)
        assert r.clat == pytest.approx(plat, abs=1e-12)
        assert r.clon == pytest.approx(plon, abs=1e-12)


def test_ghhsin_function_query(spark):
    df = spark.createDataFrame(
        [(1, 48.8566, 2.3522), (2, 51.5074, -0.1278)],
        "id long, lat double, lon double",
    )
    ref = geohash_encode(48.8566, 2.3522)
    col = parse_function_query(
        f"ghhsin(6371.0087714, geohash(lat,lon), '{ref}')"
    )
    out = {r.id: r.d for r in df.select("id", col.alias("d")).collect()}
    # same cell -> exactly 0.0 (the reference's equal-hash short-circuit)
    assert out[1] == 0.0
    # Paris-London great-circle ~343-344 km between cell centers
    assert out[2] == pytest.approx(343.5, abs=1.5)
    # string-column path agrees with the literal path
    gh2 = geohash_encode(51.5074, -0.1278)
    df2 = spark.createDataFrame([(2, gh2)], "id long, h string")
    col2 = parse_function_query(f"ghhsin(6371.0087714, h, '{ref}')")
    out2 = df2.select(col2.alias("d")).first().d
    assert out2 == pytest.approx(out[2], abs=1e-9)
    # quant_of_hash inverts the encode's interleave
    assert quant_of_hash(ref) == quant_of_hash(geohash_encode(48.8566, 2.3522))


def test_ghhsin_requires_literal_radius(spark):
    with pytest.raises(ValueError, match="radius"):
        parse_function_query("ghhsin(lat, geohash(lat,lon), 'ezs42')")
