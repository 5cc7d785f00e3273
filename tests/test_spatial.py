"""Spatial: geofilt/bbox vs a pure-Python haversine oracle, box math edge
cases (date line, poles), bbox-encloses-geofilt invariant."""

import math

import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.search.spatial import (
    EARTH_MEAN_RADIUS_KM,
    bbox_docset,
    calc_box,
    geodist_km_col,
    geofilt_docset,
    geofilt_topk,
    parse_pt,
    with_synthetic_latlon,
)


def _py_dist_km(lat1, lon1, lat2, lon2):
    la1, lo1, la2, lo2 = map(math.radians, (lat1, lon1, lat2, lon2))
    dlat, dlon = (la2 - la1) / 2, (lo2 - lo1) / 2
    h = math.sin(dlat) ** 2 + math.cos(la1) * math.cos(la2) * math.sin(dlon) ** 2
    return EARTH_MEAN_RADIUS_KM * 2 * math.asin(math.sqrt(h))


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    d = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select(F.col("doc_id").alias("docid"))
    )
    return with_synthetic_latlon(d, "docid", "loc").cache()


@pytest.fixture(scope="module")
def coords(docs):
    return {
        int(r.docid): (r.loc_0_coordinate, r.loc_1_coordinate)
        for r in docs.collect()
    }


PT, D = "48.8566,2.3522", 3000.0


def test_geofilt_matches_python(docs, coords):
    got = {int(r.docid) for r in geofilt_docset(docs, "loc", PT, D).collect()}
    lat, lon = parse_pt(PT)
    want = {
        d for d, (la, lo) in coords.items() if _py_dist_km(la, lo, lat, lon) <= D
    }
    assert got == want and got  # non-empty at sf0.001


def test_bbox_encloses_geofilt(docs):
    inside = {int(r.docid) for r in geofilt_docset(docs, "loc", PT, D).collect()}
    box = {int(r.docid) for r in bbox_docset(docs, "loc", PT, D).collect()}
    assert inside <= box


def test_bbox_matches_box_math(docs, coords):
    lat_min, lat_max, lon_ranges = calc_box(*parse_pt(PT), D)
    got = {int(r.docid) for r in bbox_docset(docs, "loc", PT, D).collect()}
    want = {
        d
        for d, (la, lo) in coords.items()
        if lat_min <= la <= lat_max
        and any(lo_r <= lo <= hi_r for lo_r, hi_r in lon_ranges)
    }
    assert got == want


def test_dateline_crossing_box():
    lat_min, lat_max, ranges = calc_box(10.0, 179.5, 200.0)
    assert len(ranges) == 2
    (a_lo, a_hi), (b_lo, b_hi) = ranges
    assert a_hi == 180.0 and b_lo == -180.0
    # a point just across the date line is inside
    assert any(lo <= -179.8 <= hi for lo, hi in ranges)


def test_polar_box_full_lon_sweep():
    lat_min, lat_max, ranges = calc_box(89.0, 0.0, 500.0)
    assert ranges == [(-180.0, 180.0)]
    assert lat_max == 90.0


def test_geofilt_dateline_correct(spark):
    rows = [(1, 10.0, -179.8), (2, 10.0, 179.2), (3, 10.0, 170.0)]
    df = spark.createDataFrame(
        rows, "docid long, loc_0_coordinate double, loc_1_coordinate double"
    )
    got = {
        int(r.docid)
        for r in geofilt_docset(df, "loc", "10.0,179.5", 200.0).collect()
    }
    # doc 1 is ~77 km away across the date line; doc 3 is ~1000 km away
    assert got == {1, 2}


def test_geofilt_topk_distance_score(docs, coords):
    out = geofilt_topk(docs, "loc", PT, D, k=5, score="distance").collect()
    lat, lon = parse_pt(PT)
    want = sorted(
        (
            (round(_py_dist_km(la, lo, lat, lon), 4), d)
            for d, (la, lo) in coords.items()
            if _py_dist_km(la, lo, lat, lon) <= D
        ),
    )[:5]
    assert [(float(r.score), int(r.docid)) for r in out] == [
        (s, d) for s, d in want
    ]


def test_geofilt_topk_constant_and_recip(docs):
    const = geofilt_topk(docs, "loc", PT, D, k=5, score="none", boost=2.5).collect()
    assert all(float(r.score) == 2.5 for r in const)
    recip = geofilt_topk(docs, "loc", PT, D, k=5, score="recipDistance").collect()
    assert all(0.0 < float(r.score) <= 1.0 for r in recip)


def test_prefilter_bbox_is_pure_pruning(docs):
    a = {int(r.docid) for r in geofilt_docset(docs, "loc", PT, D, prefilter_bbox=True).collect()}
    b = {int(r.docid) for r in geofilt_docset(docs, "loc", PT, D, prefilter_bbox=False).collect()}
    assert a == b


@pytest.fixture(scope="module")
def geo_index(spark, sf_dir):
    from lucene_solr_spark.index.builder import build_index

    docs = with_synthetic_latlon(
        spark.read.parquet(f"{sf_dir}/documents.parquet"), "doc_id", "loc"
    )
    return build_index(
        spark, docs, key_col="doc_id", docid_col="doc_id",
        num_index_partitions=4,
        passthrough_cols=("loc_0_coordinate", "loc_1_coordinate"),
    )


def test_qparser_geofilt_front_door(geo_index, coords):
    from lucene_solr_spark.search.qparsers import qparser_search

    out = qparser_search(
        geo_index, "{!geofilt sfield=loc pt=48.8566,2.3522 d=3000 score=distance}",
        k=5,
    ).collect()
    lat, lon = parse_pt(PT)
    want = sorted(
        (round(_py_dist_km(la, lo, lat, lon), 4), d)
        for d, (la, lo) in coords.items()
        if _py_dist_km(la, lo, lat, lon) <= D
    )[:5]
    assert [(float(r.score), int(r.docid)) for r in out] == [(s, d) for s, d in want]


def test_qparser_bbox_front_door(geo_index, docs):
    from lucene_solr_spark.search.qparsers import qparser_search

    out = qparser_search(
        geo_index, "{!bbox sfield=loc pt=48.8566,2.3522 d=3000}", k=10**6
    ).collect()
    want = {int(r.docid) for r in bbox_docset(docs, "loc", PT, D).collect()}
    assert {int(r.docid) for r in out} == want
    assert all(float(r.score) == 1.0 for r in out)


def test_geofilt_as_fq(geo_index):
    """fq={!geofilt ...} composes with a scored q (the common Solr shape)."""
    from lucene_solr_spark.search.filtercache import search_filtered

    hits = search_filtered(
        geo_index, "table",
        fqs=["{!geofilt sfield=loc pt=48.8566,2.3522 d=6000}"], k=10,
    ).collect()
    assert hits
    allowed = {
        int(r.docid)
        for r in geofilt_docset(geo_index.docs, "loc", PT, 6000.0).collect()
    }
    assert {int(r.docid) for r in hits} <= allowed


def test_geofilt_undefined_sfield(geo_index):
    from lucene_solr_spark.search.qparsers import qparser_search

    with pytest.raises(ValueError, match="spatial field"):
        qparser_search(geo_index, "{!geofilt sfield=nope pt=1,2 d=5}", k=5)
