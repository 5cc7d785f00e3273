"""RPT polygon spatial (search/rpt.py): WKT parsing, covering soundness,
and the grid-pruned filter's exact equivalence to plain ray-casting —
differential in Spark AND against the pure-Python mirror."""

import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.search.rpt import (
    choose_level,
    grid_cell_col,
    parse_polygon,
    point_in_polygon_col,
    point_in_polygon_py,
    point_in_polygon_sql,
    polygon_cover,
    rpt_intersects_docset,
)
from lucene_solr_spark.search.spatial import coord_cols, with_synthetic_latlon

# a convex pentagon and a non-convex (star-ish) polygon; vertices off the
# synthetic 0.01-degree grid so no point lands exactly on an edge
PENTAGON = [(-10.005, -5.005), (15.005, -12.005), (30.005, 10.005),
            (5.005, 25.005), (-20.005, 12.005)]
STAR = [(0.005, 30.005), (8.005, 8.005), (30.005, 8.005), (12.005, -4.005),
        (18.005, -28.005), (0.005, -12.005), (-18.005, -28.005),
        (-12.005, -4.005), (-30.005, 8.005), (-8.005, 8.005)]


def test_parse_polygon_forms():
    wkt = "POLYGON((-10 -5, 15 -12, 30 10, -10 -5))"
    assert parse_polygon(wkt) == [(-10.0, -5.0), (15.0, -12.0), (30.0, 10.0)]
    q = "Intersects(POLYGON((-10 -5, 15 -12, 30 10, -10 -5)))"
    assert parse_polygon(q) == parse_polygon(wkt)
    with pytest.raises(ValueError):
        parse_polygon("Intersects(CIRCLE(0 0 5))")
    with pytest.raises(ValueError):
        parse_polygon("POLYGON((0 0, 1 1, 0 0))")


@pytest.mark.parametrize("verts", [PENTAGON, STAR], ids=["convex", "star"])
def test_python_raycast_basics(verts):
    assert point_in_polygon_py(0.0, 0.0, verts)          # center inside
    assert not point_in_polygon_py(89.0, 179.0, verts)   # far outside
    assert not point_in_polygon_py(-89.0, -179.0, verts)


def test_star_concavity():
    # between two star arms: inside the bbox but OUTSIDE the polygon
    assert not point_in_polygon_py(-20.0, 0.005, STAR)
    assert point_in_polygon_py(0.0, 0.005, STAR)


@pytest.mark.parametrize("verts", [PENTAGON, STAR], ids=["convex", "star"])
def test_cover_soundness(verts):
    """Dropped cells contain no inside points; within cells only inside
    points — probed on a dense lattice."""
    level = choose_level(verts, 512)
    within, edge = polygon_cover(verts, level)
    assert within and edge
    n = 1 << level
    w, h = 360.0 / n, 180.0 / n
    import itertools
    for lat, lon in itertools.product(
        [x / 2.0 - 40 for x in range(160)], [-35.0, -10.0, 0.5, 10.0, 35.0]
    ):
        cid = (int((lat + 90) / h)) * n + int((lon + 180) / w)
        inside = point_in_polygon_py(lat, lon, verts)
        if cid in set(within):
            assert inside, (lat, lon)
        elif cid not in set(edge):
            assert not inside, (lat, lon)


@pytest.fixture(scope="module")
def points(spark):
    df = spark.range(0, 4000).select(F.col("id").alias("docid"))
    return with_synthetic_latlon(df, "docid", "loc")


@pytest.mark.parametrize("verts", [PENTAGON, STAR], ids=["convex", "star"])
def test_rpt_filter_equals_raycast(spark, points, verts):
    wkt = "POLYGON((" + ", ".join(f"{x} {y}" for x, y in verts) + \
        f", {verts[0][0]} {verts[0][1]}))"
    got = {r.docid for r in rpt_intersects_docset(points, "loc", wkt).collect()}
    lat_c, lon_c = coord_cols("loc")
    exp = {
        r.docid
        for r in points.filter(
            point_in_polygon_col(F.col(lat_c), F.col(lon_c), verts)
        ).collect()
    }
    assert got == exp and len(got) > 20

    # pure-Python mirror on the same rows
    rows = points.collect()
    exp_py = {r.docid for r in rows
              if point_in_polygon_py(r[lat_c], r[lon_c], verts)}
    assert got == exp_py


def test_rpt_disjoint_complement(spark, points):
    wkt = "POLYGON((" + ", ".join(f"{x} {y}" for x, y in PENTAGON) + \
        f", {PENTAGON[0][0]} {PENTAGON[0][1]}))"
    inside = {r.docid for r in rpt_intersects_docset(points, "loc", wkt).collect()}
    disjoint = {r.docid for r in
                rpt_intersects_docset(points, "loc", wkt, negate=True).collect()}
    assert inside.isdisjoint(disjoint)
    assert len(inside) + len(disjoint) == points.count()


def test_sql_matches_python(spark):
    """The SQL text evaluates identically to the Python mirror (DuckDB)."""
    import duckdb

    sql = point_in_polygon_sql("lat", "lon", STAR)
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE pts AS SELECT"
        " CAST((range % 140) * 0.5 - 35.0 AS DOUBLE) AS lat,"
        " CAST((range * 7 % 140) * 0.5 - 35.0 AS DOUBLE) AS lon"
        " FROM range(0, 1000)"
    )
    got = con.execute(f"SELECT lat, lon, {sql} AS inside FROM pts").fetchall()
    for lat, lon, inside in got:
        assert inside == point_in_polygon_py(lat, lon, STAR), (lat, lon)


def test_grid_cell_col_matches_python(spark):
    level = 6
    n = 1 << level
    df = spark.createDataFrame(
        [(-90.0, -180.0), (0.0, 0.0), (89.99, 179.99), (90.0, 180.0),
         (-45.5, 170.25)],
        "lat double, lon double",
    )
    got = [r.c for r in df.select(
        grid_cell_col(F.col("lat"), F.col("lon"), level).alias("c")).collect()]
    exp = []
    for lat, lon in [(-90.0, -180.0), (0.0, 0.0), (89.99, 179.99),
                     (90.0, 180.0), (-45.5, 170.25)]:
        cx = min(int((lon + 180) / (360.0 / n)), n - 1)
        cy = min(int((lat + 90) / (180.0 / n)), n - 1)
        exp.append(cy * n + cx)
    assert got == exp
