"""Spatial search: geofilt / bbox filters and geodist ranking (Solr 4.10
LatLonType family) — closes the former SURVEY §2.13 spatial gap.

Reference semantics (/root/reference):

- ``LatLonType`` stores a point as two coordinate subfields
  ``{field}_0_coordinate`` (lat) / ``{field}_1_coordinate`` (lon)
  (solr/core/src/java/org/apache/solr/schema/LatLonType.java:77-108) — here
  those are two double columns on the docs table, the columnar projection of
  the same schema convention.
- ``{!geofilt sfield=... pt=lat,lon d=km}`` keeps documents within great-
  circle distance ``d`` of ``pt`` (SpatialDistanceQueryParser /
  LatLonType.createSpatialQuery :147-216): haversine over the earth mean
  radius, inclusive bound.
- ``{!bbox}`` filters by the lat/lon box enclosing that circle
  (SpatialUtils / spatial4j DistanceUtils.calcBoxByDistFromPtDEG): latitude
  band ± d/R; longitude delta asin(sin(d/R)/cos(lat)); poles clamp to a full
  longitude sweep; date-line crossings split into a two-range disjunction
  (LatLonType.java:155-196 builds the same range queries).
- ``geodist()`` ranking reuses the HaversineFunction column from
  functions/value_sources (same formula TEXT both engines).

Scale shape: both filters are pure Catalyst range/arith predicates over two
double columns — pushed to the Parquet scan (bbox becomes min/max-prunable
range predicates; geofilt keeps the trig in the filter but NEVER shuffles).
The classic two-step plan at 100 TB is bbox-prune THEN exact geofilt, which
``geofilt_docset(..., prefilter_bbox=True)`` emits as one composed filter.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from lucene_solr_spark.functions.value_sources import _haversine

# spatial4j DistanceUtils.EARTH_MEAN_RADIUS_KM (GeodesicSphereDistCalc)
EARTH_MEAN_RADIUS_KM = 6371.0087714


def coord_cols(sfield: str) -> tuple[str, str]:
    """LatLonType's polyField subfield names (LatLonType.java:77-86)."""
    return f"{sfield}_0_coordinate", f"{sfield}_1_coordinate"


def parse_pt(pt: str) -> tuple[float, float]:
    """SpatialUtils.parsePoint: 'lat,lon' in degrees."""
    lat_s, lon_s = pt.split(",", 1)
    lat, lon = float(lat_s.strip()), float(lon_s.strip())
    if not (-90.0 <= lat <= 90.0 and -180.0 <= lon <= 180.0):
        raise ValueError(f"point out of bounds: {pt!r}")
    return lat, lon


def geodist_km_col(lat_col: Column, lon_col: Column, pt_lat: float, pt_lon: float) -> Column:
    """Great-circle km from each row's point to a fixed point — identical
    formula text to the geodist() value source (HaversineConstFunction)."""
    return F.lit(EARTH_MEAN_RADIUS_KM) * _haversine(
        F.radians(lat_col), F.radians(lon_col),
        F.radians(F.lit(pt_lat)), F.radians(F.lit(pt_lon)),
    )


def calc_box(pt_lat: float, pt_lon: float, d_km: float) -> tuple[float, float, list[tuple[float, float]]]:
    """spatial4j DistanceUtils.calcBoxByDistFromPtDEG: the enclosing lat/lon
    box of a distance circle.  Returns (lat_min, lat_max, lon_ranges) in
    degrees; lon_ranges is one (lo, hi) pair, or two when the box crosses
    the date line, or the full sweep when a pole is inside the circle."""
    r = d_km / EARTH_MEAN_RADIUS_KM  # angular radius, radians
    lat = math.radians(pt_lat)
    lat_min, lat_max = lat - r, lat + r
    half_pi = math.pi / 2
    if lat_min <= -half_pi or lat_max >= half_pi:
        # circle touches a pole: latitude clamps, longitude unconstrained
        return (
            math.degrees(max(lat_min, -half_pi)),
            math.degrees(min(lat_max, half_pi)),
            [(-180.0, 180.0)],
        )
    lon_delta = math.degrees(math.asin(math.sin(r) / math.cos(lat)))
    lon_lo, lon_hi = pt_lon - lon_delta, pt_lon + lon_delta
    if lon_lo < -180.0:  # date-line crossing westward
        ranges = [(-180.0, lon_hi), (lon_lo + 360.0, 180.0)]
    elif lon_hi > 180.0:  # eastward
        ranges = [(lon_lo, 180.0), (-180.0, lon_hi - 360.0)]
    else:
        ranges = [(lon_lo, lon_hi)]
    return math.degrees(lat_min), math.degrees(lat_max), ranges


def bbox_cond(docs_lat: Column, docs_lon: Column, pt_lat: float, pt_lon: float, d_km: float) -> Column:
    lat_min, lat_max, lon_ranges = calc_box(pt_lat, pt_lon, d_km)
    cond = docs_lat.between(lat_min, lat_max)
    lon = None
    for lo, hi in lon_ranges:
        piece = docs_lon.between(lo, hi)
        lon = piece if lon is None else (lon | piece)
    return cond & lon


def bbox_docset(docs: DataFrame, sfield: str, pt: str, d_km: float) -> DataFrame:
    """{!bbox}: docids inside the enclosing box (constant-score filter)."""
    lat_c, lon_c = coord_cols(sfield)
    pt_lat, pt_lon = parse_pt(pt)
    return docs.filter(
        bbox_cond(F.col(lat_c), F.col(lon_c), pt_lat, pt_lon, d_km)
    ).select("docid")


def geofilt_docset(
    docs: DataFrame, sfield: str, pt: str, d_km: float,
    prefilter_bbox: bool = True,
) -> DataFrame:
    """{!geofilt}: docids within d km (inclusive) of pt.

    ``prefilter_bbox`` composes the min/max-prunable box predicate in front
    of the exact haversine test — the scan-prune shape for 100 TB; it never
    changes results (the box encloses the circle)."""
    lat_c, lon_c = coord_cols(sfield)
    pt_lat, pt_lon = parse_pt(pt)
    cond = geodist_km_col(F.col(lat_c), F.col(lon_c), pt_lat, pt_lon) <= F.lit(
        float(d_km)
    )
    if prefilter_bbox:
        cond = bbox_cond(F.col(lat_c), F.col(lon_c), pt_lat, pt_lon, d_km) & cond
    return docs.filter(cond).select("docid")


def geofilt_topk(
    docs: DataFrame, sfield: str, pt: str, d_km: float,
    k: int = 10, score: str = "none", boost: float = 1.0, round_dp: int = 4,
) -> DataFrame:
    """The geofilt/bbox qparser result frame: (docid, score) top-k.

    ``score``: 'none' (constant, SolrConstantScoreQuery), 'distance' /
    'kilometers' (geodist km), 'recipDistance' (1/(1+km), larger = closer —
    LatLonType SpatialDistanceQuery score modes)."""
    lat_c, lon_c = coord_cols(sfield)
    pt_lat, pt_lon = parse_pt(pt)
    hits = docs.filter(
        bbox_cond(F.col(lat_c), F.col(lon_c), pt_lat, pt_lon, d_km)
        & (geodist_km_col(F.col(lat_c), F.col(lon_c), pt_lat, pt_lon) <= F.lit(float(d_km)))
    )
    if score in ("distance", "kilometers"):
        sc = geodist_km_col(F.col(lat_c), F.col(lon_c), pt_lat, pt_lon)
        out = hits.select("docid", F.round(sc * F.lit(boost), round_dp).alias("score"))
        # distance scores rank closest-first
        return out.orderBy(F.col("score").asc(), F.col("docid").asc()).limit(k)
    if score == "recipDistance":
        sc = F.lit(1.0) / (
            F.lit(1.0) + geodist_km_col(F.col(lat_c), F.col(lon_c), pt_lat, pt_lon)
        )
        out = hits.select("docid", F.round(sc * F.lit(boost), round_dp).alias("score"))
    else:
        out = hits.select("docid", F.lit(float(boost)).alias("score"))
    return out.orderBy(F.col("score").desc(), F.col("docid").asc()).limit(k)


# ---------------------------------------------------------------------------
# Synthetic coordinates for tests/benchmarks (north rule: no external data).
# Pure integer arithmetic so Spark and DuckDB derive bit-identical doubles.
# ---------------------------------------------------------------------------

def with_synthetic_latlon(df: DataFrame, key_col: str, sfield: str = "loc") -> DataFrame:
    """Deterministic lat/lon from an integer key: lat in [-85, 85), lon in
    [-180, 180).  Mirror of synthetic_latlon_sql (oracle side)."""
    lat_c, lon_c = coord_cols(sfield)
    k = F.col(key_col).cast("long")
    lat = ((k * 7919) % 17000).cast("double") / 100.0 - 85.0
    lon = ((k * 104729) % 36000).cast("double") / 100.0 - 180.0
    return df.withColumn(lat_c, lat).withColumn(lon_c, lon)


def synthetic_latlon_sql(key_expr: str) -> tuple[str, str]:
    """DuckDB SQL for the identical synthetic coordinates."""
    lat = f"(CAST(({key_expr} * 7919) % 17000 AS DOUBLE) / 100.0 - 85.0)"
    lon = f"(CAST(({key_expr} * 104729) % 36000 AS DOUBLE) / 100.0 - 180.0)"
    return lat, lon


def geodist_km_sql(lat_expr: str, lon_expr: str, pt_lat: float, pt_lon: float) -> str:
    """DuckDB haversine km with the identical formula text/op order."""
    la1, lo1 = f"radians({lat_expr})", f"radians({lon_expr})"
    la2, lo2 = f"radians({pt_lat!r})", f"radians({pt_lon!r})"
    return (
        f"6371.0087714 * (2 * asin(sqrt("
        f"sin(({la2} - {la1}) / 2) * sin(({la2} - {la1}) / 2)"
        f" + (cos({la1}) * cos({la2})"
        f" * sin(({lo2} - {lo1}) / 2) * sin(({lo2} - {lo1}) / 2))"
        f")))"
    )


def _haversine_py(lat1: float, lon1: float, lat2: float, lon2: float) -> float:
    """Driver-side great-circle km (same formula as geodist_km_col) — used
    by the RPT circle cover's cell classification."""
    p1, p2 = math.radians(lat1), math.radians(lat2)
    dlat = math.radians(lat2 - lat1) / 2
    dlon = math.radians(lon2 - lon1) / 2
    a = math.sin(dlat) ** 2 + math.cos(p1) * math.cos(p2) * math.sin(dlon) ** 2
    return EARTH_MEAN_RADIUS_KM * 2 * math.asin(min(1.0, math.sqrt(a)))


# ---------------------------------------------------------------------------
# BufferedLineString — the spatial4j linestring shape
# (spatial4j BufferedLineString / BufferedLine: planar 2D degree space, as
# the reference constructs it for non-geo contexts; lucene/spatial's
# prefix-tree tests exercise it via ShapeFactory linestrings).  A point
# matches when its euclidean degree-space distance to ANY segment is
# <= buf.  One unrolled least()-chain of per-segment point-to-segment
# distances — pure codegen, shuffle-free, and the SAME formula text renders
# the SQL oracle (shared-text discipline).
# ---------------------------------------------------------------------------

def _seg_dist2_text(ax: float, ay: float, bx: float, by: float,
                    px: str, py: str) -> str:
    """Squared planar distance from point (px,py) to segment (a,b) — one
    formula string valid in both Spark SQL and DuckDB (clamped projection;
    degenerate zero-length segments fall back to the endpoint)."""
    dx, dy = bx - ax, by - ay
    len2 = dx * dx + dy * dy
    if len2 == 0.0:
        return (f"(({px}) - {ax!r}) * (({px}) - {ax!r})"
                f" + (({py}) - {ay!r}) * (({py}) - {ay!r})")
    t = (f"greatest(0.0, least(1.0,"
         f" ((({px}) - {ax!r}) * {dx!r} + (({py}) - {ay!r}) * {dy!r})"
         f" / {len2!r}))")
    return (f"((({px}) - ({ax!r} + {t} * {dx!r}))"
            f" * (({px}) - ({ax!r} + {t} * {dx!r}))"
            f" + (({py}) - ({ay!r} + {t} * {dy!r}))"
            f" * (({py}) - ({ay!r} + {t} * {dy!r})))")


def linestring_dist2_sql(
    verts: list[tuple[float, float]], lon_expr: str, lat_expr: str
) -> str:
    """least() over the per-segment squared distances — the shared text."""
    parts = [
        _seg_dist2_text(ax, ay, bx, by, lon_expr, lat_expr)
        for (ax, ay), (bx, by) in zip(verts, verts[1:])
    ]
    if len(parts) == 1:
        return parts[0]
    return "least(" + ", ".join(parts) + ")"


def linestring_buffer_docset(
    docs: DataFrame,
    sfield: str,
    verts: list[tuple[float, float]],
    buf_deg: float,
) -> DataFrame:
    """Intersects(BufferedLineString) for point data: docids whose point
    lies within ``buf_deg`` (planar degrees) of the polyline through
    ``verts`` [(lon, lat), ...].  Bbox conjuncts (line bbox expanded by the
    buffer — Parquet min/max-prunable) guard the distance chain."""
    if len(verts) < 2:
        raise ValueError("linestring needs >= 2 vertices")
    lat_c, lon_c = coord_cols(sfield)
    xs = [x for x, _ in verts]
    ys = [y for _, y in verts]
    cond = (
        F.col(lat_c).between(min(ys) - buf_deg, max(ys) + buf_deg)
        & F.col(lon_c).between(min(xs) - buf_deg, max(xs) + buf_deg)
        & (
            F.expr(linestring_dist2_sql(verts, lon_c, lat_c))
            <= F.lit(buf_deg * buf_deg)
        )
    )
    return docs.filter(cond).select("docid")
