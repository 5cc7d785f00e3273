"""Round-5 spatial shapes: circle on the RPT grid (must equal plain
geofilt by construction) and the buffered linestring (vs a pure-Python
segment-distance oracle)."""

import math

import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.search.rpt import circle_cover, rpt_circle_docset
from lucene_solr_spark.search.spatial import (
    _haversine_py,
    linestring_buffer_docset,
    with_synthetic_latlon,
)


@pytest.fixture(scope="module")
def geo(spark, sf_dir):
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select(F.col("doc_id").alias("docid"))
    )
    return with_synthetic_latlon(docs, "docid", "loc")


@pytest.mark.parametrize(
    "pt,d", [("-10.0,60.0", 2500.0), ("48.8566,2.3522", 3000.0),
             ("80.0,0.0", 1500.0), ("0.0,179.5", 2000.0)]
)
def test_rpt_circle_equals_geofilt(geo, pt, d):
    from lucene_solr_spark.search.spatial import geofilt_docset

    want = sorted(r.docid for r in geofilt_docset(geo, "loc", pt, d).collect())
    got = sorted(r.docid for r in rpt_circle_docset(geo, "loc", pt, d).collect())
    assert got == want
    assert want  # non-degenerate


def test_circle_cover_classification_sound():
    """Every WITHIN cell is wholly inside; no point of a dropped cell is
    inside (probed on a dense sample)."""
    pt_lat, pt_lon, d, level = -10.0, 60.0, 2500.0, 5
    within, edge = circle_cover(pt_lat, pt_lon, d, level)
    from lucene_solr_spark.search.rpt import WORLD, _cell_bounds

    n = 1 << level
    ids = set(within) | set(edge)
    for cid in within:
        cy, cx = divmod(cid, n)
        lo_x, hi_x, lo_y, hi_y = _cell_bounds(cx, cy, level)
        for fy in (0.0, 0.25, 0.5, 0.75, 1.0):
            for fx in (0.0, 0.25, 0.5, 0.75, 1.0):
                la = lo_y + fy * (hi_y - lo_y)
                lo = lo_x + fx * (hi_x - lo_x)
                assert _haversine_py(la, lo, pt_lat, pt_lon) <= d + 1e-6
    # a sampled point inside the circle always lands in a kept cell
    for k in range(500):
        la = -90 + (k * 137.0) % 180
        lo = -180 + (k * 251.0) % 360
        if _haversine_py(la, lo, pt_lat, pt_lon) <= d:
            cx = min(n - 1, int((lo - WORLD[0]) / ((WORLD[1] - WORLD[0]) / n)))
            cy = min(n - 1, int((la - WORLD[2]) / ((WORLD[3] - WORLD[2]) / n)))
            assert cy * n + cx in ids, (la, lo)


def _seg_dist(px, py, ax, ay, bx, by):
    dx, dy = bx - ax, by - ay
    len2 = dx * dx + dy * dy
    if len2 == 0:
        return math.hypot(px - ax, py - ay)
    t = max(0.0, min(1.0, ((px - ax) * dx + (py - ay) * dy) / len2))
    return math.hypot(px - (ax + t * dx), py - (ay + t * dy))


LINE = [(-150.0, -60.0), (-50.0, -20.0), (50.0, 20.0), (150.0, 60.0)]


def test_linestring_buffer_vs_python(geo):
    buf = 9.0
    rows = geo.collect()
    want = sorted(
        r.docid
        for r in rows
        if min(
            _seg_dist(r.loc_1_coordinate, r.loc_0_coordinate, ax, ay, bx, by)
            for (ax, ay), (bx, by) in zip(LINE, LINE[1:])
        )
        <= buf
    )
    got = sorted(
        r.docid for r in linestring_buffer_docset(geo, "loc", LINE, buf).collect()
    )
    assert got == want
    assert want


def test_linestring_degenerate_segment(spark):
    df = spark.createDataFrame(
        [(1, 0.0, 0.0), (2, 5.0, 5.0)],
        "docid long, loc_0_coordinate double, loc_1_coordinate double",
    )
    out = linestring_buffer_docset(df, "loc", [(0.0, 0.0), (0.0, 0.0)], 1.0)
    assert [r.docid for r in out.collect()] == [1]
