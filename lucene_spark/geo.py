"""Geo-point queries — the LatLonPoint family re-expressed as Catalyst plans.

Reference surface (all under /root/reference/lucene/core/src/java/org/apache/lucene/):

- ``document/LatLonPoint.java`` — points are quantized to 32 bits per axis
  before indexing; every query operates on the QUANTIZED coordinates.
- ``geo/GeoEncodingUtils.java:40-130`` — ``encodeLatitude`` = floor(lat /
  LAT_DECODE) with LAT_DECODE = 180/2^32 (exact in binary: 45·2^-30), the
  +90/+180 maximum nextDown'd before encoding; ``encodeLatitudeCeil`` rounds
  toward +90 for box minima; decode multiplies back (exact: |enc|·45 < 2^37).
- ``util/SloppyMath.java:47-58,86-97`` — ``haversinMeters`` with mean earth
  radius 6_371_008.7714 m.  The reference clobbers the sort key's low 3
  mantissa bits and uses table-driven cos/asin ("sloppy", ≤40 cm error); the
  numpy form here is bit-faithful to the masking but uses exact libm
  cos/asin, and the Catalyst/SQL form skips the masking so the engine and
  its DuckDB oracle twin evaluate the IDENTICAL double expression — the
  divergence from the reference is bounded by the reference's own
  documented 40 cm slop.
- ``document/LatLonPointDistanceQuery.java`` — match iff haversine(origin,
  quantized point) ≤ radius; the BKD tree prunes by bounding box first.
  Spark analog: a raw-coordinate bounding-box prefilter (parquet min/max +
  row-group pruning reach the scan) then the exact haversine test — the
  same two-phase shape, with Catalyst/parquet stats playing the BKD role.
- ``document/LatLonPoint.java`` ``newBoxQuery`` + ``geo/GeoEncodingUtils
  .java:232-235`` — box minima encode with ceil, maxima with floor; a box
  crossing the dateline (minLon > maxLon) splits into a longitude OR.
- ``document/LatLonPointSortField.java`` / ``LatLonPointDistanceComparator
  .java`` — sort by haversine distance ascending, ties by docid.
- ``document/LatLonPointDistanceFeatureQuery.java:130-131,293-295`` —
  score = (float)(boost * pivot / (pivot + distance)).

Scale notes (10^12 docs): every operator here is a narrow projection +
filter over the docs table — no shuffle, no UDF; the box prefilter is a
plain range predicate on the raw lat/lon columns, so parquet footer min/max
stats prune row groups and `PushedFilters` carries it to the scan.  The
nearest-k sort is a TakeOrderedAndProject (per-partition top-k, k rows to
the driver).
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# GeoEncodingUtils.java:40-43 — exact binary constants (180/2^32 = 45·2^-30)
LAT_DECODE = 180.0 / (1 << 32)
LON_DECODE = 360.0 / (1 << 32)
# SloppyMath.java:200 — mean earth radius in meters
TO_METERS = 6_371_008.7714

_MAX_ENC = (1 << 31) - 1


# ------------------------------------------------------------- scalar encode
# (query bounds are computed driver-side; rows encode via the Column forms)


def encode_latitude(lat: float) -> int:
    """GeoEncodingUtils.encodeLatitude (:58-65): floor toward -90."""
    if not -90.0 <= lat <= 90.0:
        raise ValueError(f"latitude out of bounds: {lat}")
    if lat == 90.0:
        lat = math.nextafter(lat, -math.inf)
    return int(math.floor(lat / LAT_DECODE))


def encode_latitude_ceil(lat: float) -> int:
    """GeoEncodingUtils.encodeLatitudeCeil (:74-81): ceil toward +90."""
    if not -90.0 <= lat <= 90.0:
        raise ValueError(f"latitude out of bounds: {lat}")
    if lat == 90.0:
        lat = math.nextafter(lat, -math.inf)
    return int(math.ceil(lat / LAT_DECODE))


def encode_longitude(lon: float) -> int:
    """GeoEncodingUtils.encodeLongitude (:90-97): floor toward -180."""
    if not -180.0 <= lon <= 180.0:
        raise ValueError(f"longitude out of bounds: {lon}")
    if lon == 180.0:
        lon = math.nextafter(lon, -math.inf)
    return int(math.floor(lon / LON_DECODE))


def encode_longitude_ceil(lon: float) -> int:
    """GeoEncodingUtils.encodeLongitudeCeil (:106-113)."""
    if not -180.0 <= lon <= 180.0:
        raise ValueError(f"longitude out of bounds: {lon}")
    if lon == 180.0:
        lon = math.nextafter(lon, -math.inf)
    return int(math.ceil(lon / LON_DECODE))


def decode_latitude(encoded: int) -> float:
    """GeoEncodingUtils.decodeLatitude (:121-126)."""
    return encoded * LAT_DECODE


def decode_longitude(encoded: int) -> float:
    """GeoEncodingUtils.decodeLongitude (:139-149)."""
    return encoded * LON_DECODE


# ------------------------------------------------------------- Column encode


def encode_lat_col(lat: Column) -> Column:
    """Per-row encodeLatitude as a Catalyst expression (whole-stage codegen).

    The division by the exact binary constant LAT_DECODE and the floor are
    IEEE-deterministic, so Spark and any ANSI-SQL twin (DuckDB) produce the
    same integer for the same double input.
    """
    return F.when(lat == F.lit(90.0), F.lit(_MAX_ENC)).otherwise(
        F.floor(lat / F.lit(LAT_DECODE))
    ).cast("int")


def encode_lon_col(lon: Column) -> Column:
    return F.when(lon == F.lit(180.0), F.lit(_MAX_ENC)).otherwise(
        F.floor(lon / F.lit(LON_DECODE))
    ).cast("int")


def quantize_lat_col(lat: Column) -> Column:
    """decode(encode(lat)) — the coordinate every LatLonPoint query sees."""
    return encode_lat_col(lat).cast("double") * F.lit(LAT_DECODE)


def quantize_lon_col(lon: Column) -> Column:
    return encode_lon_col(lon).cast("double") * F.lit(LON_DECODE)


# ----------------------------------------------------------------- haversine


def haversin_meters_cols(
    lat1: float, lon1: float, lat2: Column, lon2: Column
) -> Column:
    """SloppyMath.haversinMeters(:47-58) over haversinSortKey(:86-97) as one
    Catalyst expression: h = (1-cos(x1-x2)) + cos(x1)cos(x2)(1-cos(dlon)),
    d = R·2·asin(min(1, sqrt(h/2))).  Exact asin/cos instead of the
    reference's table-driven ones, no low-bit clobber — see module docstring.
    """
    x1 = math.radians(lat1)
    x2 = F.radians(lat2)
    h1 = F.lit(1.0) - F.cos(F.lit(x1) - x2)
    h2 = F.lit(1.0) - F.cos(F.radians(F.lit(lon1) - lon2))
    h = h1 + F.lit(math.cos(x1)) * F.cos(x2) * h2
    return F.lit(TO_METERS * 2.0) * F.asin(
        F.least(F.lit(1.0), F.sqrt(h * F.lit(0.5)))
    )


def haversin_meters_sql(lat1: float, lon1: float, lat2: str, lon2: str) -> str:
    """The IDENTICAL expression as ANSI SQL (the DuckDB oracle twin)."""
    x1 = math.radians(lat1)
    return (
        f"({TO_METERS!r} * 2.0 * asin(least(1.0, sqrt((("
        f"(1.0 - cos({x1!r} - radians({lat2})))"
        f" + {math.cos(x1)!r} * cos(radians({lat2}))"
        f" * (1.0 - cos(radians({lon1!r} - ({lon2}))))"
        f") * 0.5)))))"
    )


def haversin_meters_np(
    lat1: float, lon1: float, lat2: np.ndarray, lon2: np.ndarray
) -> np.ndarray:
    """Bit-faithful numpy form INCLUDING the reference's low-3-bit mantissa
    clobber of the sort key (SloppyMath.java:95-96) — used by unit tests to
    bound the Catalyst form's divergence."""
    x1 = math.radians(lat1)
    x2 = np.radians(np.asarray(lat2, dtype=np.float64))
    h1 = 1.0 - np.cos(x1 - x2)
    h2 = 1.0 - np.cos(np.radians(lon1 - np.asarray(lon2, dtype=np.float64)))
    h = h1 + math.cos(x1) * np.cos(x2) * h2
    h = np.frombuffer(
        (h.view(np.uint64) & np.uint64(0xFFFFFFFFFFFFFFF8)).tobytes(),
        dtype=np.float64,
    )
    return TO_METERS * 2.0 * np.arcsin(np.minimum(1.0, np.sqrt(h * 0.5)))


# ----------------------------------------------------- bounding-box prefilter


def distance_bounding_box(
    lat: float, lon: float, radius_m: float
) -> tuple[float, float, float | None, float | None]:
    """Rectangle.fromPointDistance analog (geo/Rectangle.java:130-160): the
    smallest lat/lon box containing the circle.  Returns (minLat, maxLat,
    minLon, maxLon); lon bounds are None when the circle crosses a pole or
    wraps past the dateline (callers then skip the lon prefilter — the box
    is only ever a SUPERSET prefilter, exactness comes from the haversine
    test)."""
    theta = radius_m / TO_METERS  # angular radius, radians
    d = math.degrees(theta)
    min_lat, max_lat = lat - d, lat + d
    if min_lat <= -90.0 or max_lat >= 90.0 or theta >= math.pi / 2:
        return max(min_lat, -90.0), min(max_lat, 90.0), None, None
    dlon = math.degrees(
        math.asin(min(1.0, math.sin(theta) / math.cos(math.radians(lat))))
    )
    min_lon, max_lon = lon - dlon, lon + dlon
    if min_lon < -180.0 or max_lon > 180.0:
        return min_lat, max_lat, None, None
    return min_lat, max_lat, min_lon, max_lon


# --------------------------------------------------------------------- queries

# quantization can move a stored point by at most one encoding step
# (~4.2e-8 degrees); the raw-coordinate prefilter widens by this so it stays
# a superset of the quantized-coordinate match set.
_Q_SLOP = 1e-6


def distance_query(
    docs: DataFrame,
    lat_col: str,
    lon_col: str,
    lat: float,
    lon: float,
    radius_m: float,
    dist_name: str = "distance_m",
) -> DataFrame:
    """LatLonPoint.newDistanceQuery analog (LatLonPointDistanceQuery.java):
    rows whose QUANTIZED coordinates lie within ``radius_m`` haversine meters
    of the origin, with the distance attached.

    Two-phase like the reference (BKD box prune → exact test): a raw-column
    bounding-box prefilter that parquet min/max stats can push down, then
    the exact haversine over quantized coordinates.
    """
    min_lat, max_lat, min_lon, max_lon = distance_bounding_box(
        lat, lon, radius_m
    )
    out = docs.filter(
        (F.col(lat_col) >= F.lit(min_lat - _Q_SLOP))
        & (F.col(lat_col) <= F.lit(max_lat + _Q_SLOP))
    )
    if min_lon is not None:
        out = out.filter(
            (F.col(lon_col) >= F.lit(min_lon - _Q_SLOP))
            & (F.col(lon_col) <= F.lit(max_lon + _Q_SLOP))
        )
    d = haversin_meters_cols(
        lat, lon, quantize_lat_col(F.col(lat_col)),
        quantize_lon_col(F.col(lon_col)),
    )
    return out.withColumn(dist_name, d).filter(
        F.col(dist_name) <= F.lit(float(radius_m))
    )


def box_query(
    docs: DataFrame,
    lat_col: str,
    lon_col: str,
    min_lat: float,
    max_lat: float,
    min_lon: float,
    max_lon: float,
) -> DataFrame:
    """LatLonPoint.newBoxQuery analog: encoded-space range match — minima
    encode with ceil, maxima with floor (GeoEncodingUtils.java:232-235); a
    dateline-crossing box (min_lon > max_lon) splits into a longitude OR
    (LatLonPoint.java newBoxQuery).  The predicate compares the per-row
    ENCODED ints, so boundary semantics are exactly the reference's."""
    lat_lo, lat_hi = encode_latitude_ceil(min_lat), encode_latitude(max_lat)
    lon_lo, lon_hi = encode_longitude_ceil(min_lon), encode_longitude(max_lon)
    enc_lat = encode_lat_col(F.col(lat_col))
    enc_lon = encode_lon_col(F.col(lon_col))
    lat_pred = (enc_lat >= F.lit(lat_lo)) & (enc_lat <= F.lit(lat_hi))
    if min_lon > max_lon:  # crosses the dateline
        lon_pred = (enc_lon >= F.lit(lon_lo)) | (enc_lon <= F.lit(lon_hi))
    else:
        lon_pred = (enc_lon >= F.lit(lon_lo)) & (enc_lon <= F.lit(lon_hi))
    return docs.filter(lat_pred & lon_pred)


def nearest(
    docs: DataFrame,
    lat_col: str,
    lon_col: str,
    lat: float,
    lon: float,
    k: int,
    id_col: str = "doc_id",
    dist_name: str = "distance_m",
) -> DataFrame:
    """LatLonPointSortField / LatLonPointDistanceComparator analog: the k
    rows nearest the origin by quantized haversine distance, ties by id.
    Plan: TakeOrderedAndProject — per-partition top-k, k rows to the driver.
    """
    d = haversin_meters_cols(
        lat, lon, quantize_lat_col(F.col(lat_col)),
        quantize_lon_col(F.col(lon_col)),
    )
    return (
        docs.withColumn(dist_name, d)
        .orderBy(F.col(dist_name).asc(), F.col(id_col).asc())
        .limit(k)
    )


def distance_feature_score(
    docs: DataFrame,
    lat_col: str,
    lon_col: str,
    lat: float,
    lon: float,
    pivot_m: float,
    boost: float = 1.0,
    score_name: str = "score",
) -> DataFrame:
    """LatLonPointDistanceFeatureQuery analog (:130-131,293-295):
    score = (float)(boost * pivot / (pivot + haversine)).  The float32 cast
    is the reference's — kept so an oracle twin casting to REAL matches
    bit-for-bit."""
    if pivot_m <= 0:
        raise ValueError(f"pivotDistance must be > 0, got {pivot_m}")
    d = haversin_meters_cols(
        lat, lon, quantize_lat_col(F.col(lat_col)),
        quantize_lon_col(F.col(lon_col)),
    )
    s = (F.lit(float(boost)) * F.lit(float(pivot_m))
         / (F.lit(float(pivot_m)) + d)).cast("float")
    return docs.withColumn(score_name, s)


def polygon_query(
    docs: DataFrame,
    lat_col: str,
    lon_col: str,
    polygon: list[tuple[float, float]],
) -> DataFrame:
    """LatLonPoint.newPolygonQuery analog (geo/Polygon2D.java:107-117 —
    contains = bounding-box test + edge-tree crossing test; geo/
    EdgeTree.java implements the classic even-odd ray-crossing rule):
    rows whose QUANTIZED coordinates fall inside the polygon.

    ``polygon``: [(lat, lon), ...] vertices, implicitly closed, no holes
    (single-ring subset; Lucene's holes/multi-polygons would compose as
    AND NOT / OR of this predicate).

    The crossing test is UNROLLED into a literal Catalyst expression —
    one when()-term per edge XOR-folded via integer parity, whole-stage
    codegen, no UDF — preceded by the vertex bounding box as a raw-column
    prefilter that parquet min/max stats push down (the BKD-prune analog,
    same two-phase shape as :func:`distance_query`).
    """
    if len(polygon) < 3:
        raise ValueError("polygon needs >= 3 vertices")
    lats = [float(p[0]) for p in polygon]
    lons = [float(p[1]) for p in polygon]
    min_lat, max_lat = min(lats), max(lats)
    min_lon, max_lon = min(lons), max(lons)
    out = docs.filter(
        (F.col(lat_col) >= F.lit(min_lat - _Q_SLOP))
        & (F.col(lat_col) <= F.lit(max_lat + _Q_SLOP))
        & (F.col(lon_col) >= F.lit(min_lon - _Q_SLOP))
        & (F.col(lon_col) <= F.lit(max_lon + _Q_SLOP))
    )
    y = quantize_lat_col(F.col(lat_col))
    x = quantize_lon_col(F.col(lon_col))
    crossings = F.lit(0)
    m = len(polygon)
    for i in range(m):
        yi, xi = lats[i], lons[i]
        yj, xj = lats[(i + 1) % m], lons[(i + 1) % m]
        if yi == yj:
            continue  # horizontal edge never crosses a horizontal ray test
        cond = (
            ((F.lit(yi) > y) != (F.lit(yj) > y))
            & (
                x
                < (F.lit(xj - xi)) * (y - F.lit(yi)) / F.lit(yj - yi)
                + F.lit(xi)
            )
        )
        crossings = crossings + F.when(cond, F.lit(1)).otherwise(F.lit(0))
    return out.filter(crossings % 2 == 1)


def polygon_sql(
    lat_expr: str, lon_expr: str, polygon: list[tuple[float, float]]
) -> str:
    """The IDENTICAL even-odd crossing predicate as ANSI SQL (the DuckDB
    oracle twin of :func:`polygon_query`'s exact phase)."""
    lats = [float(p[0]) for p in polygon]
    lons = [float(p[1]) for p in polygon]
    m = len(polygon)
    terms = []
    for i in range(m):
        yi, xi = lats[i], lons[i]
        yj, xj = lats[(i + 1) % m], lons[(i + 1) % m]
        if yi == yj:
            continue
        terms.append(
            f"(CASE WHEN (({yi!r} > {lat_expr}) <> ({yj!r} > {lat_expr}))"
            f" AND ({lon_expr} < {xj - xi!r} * ({lat_expr} - {yi!r})"
            f" / {yj - yi!r} + {xi!r}) THEN 1 ELSE 0 END)"
        )
    return "((" + " + ".join(terms) + ") % 2 = 1)"


# --------------------------------------------------------- XYPoint (cartesian)

_XY_SLOP = 1e-3  # raw-column prefilter slop covering float32 quantization


def quantize_xy_col(c: Column) -> Column:
    """XYEncodingUtils analog (geo/XYEncodingUtils.java:29-45): XYPoint
    stores coordinates as exact float32 — quantization is one float cast."""
    return c.cast("float").cast("double")


def xy_box_query(
    docs: DataFrame,
    x_col: str,
    y_col: str,
    min_x: float,
    max_x: float,
    min_y: float,
    max_y: float,
) -> DataFrame:
    """XYPointField.newBoxQuery (document/XYPointField.java:118): inclusive
    cartesian box over float32-quantized coords.  Two-phase like the
    lat/lon path: raw-column slop prefilter (parquet min/max pushdown —
    the BKD prune analog) then the exact quantized test."""
    out = docs.filter(
        (F.col(x_col) >= F.lit(float(min_x) - _XY_SLOP))
        & (F.col(x_col) <= F.lit(float(max_x) + _XY_SLOP))
        & (F.col(y_col) >= F.lit(float(min_y) - _XY_SLOP))
        & (F.col(y_col) <= F.lit(float(max_y) + _XY_SLOP))
    )
    x = quantize_xy_col(F.col(x_col))
    y = quantize_xy_col(F.col(y_col))
    return out.filter(
        (x >= F.lit(float(min_x))) & (x <= F.lit(float(max_x)))
        & (y >= F.lit(float(min_y))) & (y <= F.lit(float(max_y)))
    )


def xy_distance_query(
    docs: DataFrame,
    x_col: str,
    y_col: str,
    x: float,
    y: float,
    radius: float,
) -> DataFrame:
    """XYPointField.newDistanceQuery (document/XYPointField.java:150;
    comparator math in geo/XYGeometry cartesian distance): planar
    (dx² + dy²) <= r² in double over float32-quantized coords — no sqrt,
    so the predicate is exact.  Bounding-box prefilter pushes down."""
    r = float(radius)
    out = docs.filter(
        (F.col(x_col) >= F.lit(float(x) - r - _XY_SLOP))
        & (F.col(x_col) <= F.lit(float(x) + r + _XY_SLOP))
        & (F.col(y_col) >= F.lit(float(y) - r - _XY_SLOP))
        & (F.col(y_col) <= F.lit(float(y) + r + _XY_SLOP))
    )
    dx = quantize_xy_col(F.col(x_col)) - F.lit(float(x))
    dy = quantize_xy_col(F.col(y_col)) - F.lit(float(y))
    return out.filter(dx * dx + dy * dy <= F.lit(r * r))


def xy_polygon_query(
    docs: DataFrame,
    x_col: str,
    y_col: str,
    polygon: list[tuple[float, float]],
) -> DataFrame:
    """XYPointField.newPolygonQuery: even-odd crossing test over float32-
    quantized cartesian coords — the identical unrolled whole-stage-codegen
    predicate as :func:`polygon_query`, with (x, y) in place of (lon, lat).
    ``polygon``: [(x, y), ...] vertices, implicitly closed, single ring."""
    if len(polygon) < 3:
        raise ValueError("polygon needs >= 3 vertices")
    xs = [float(p[0]) for p in polygon]
    ys = [float(p[1]) for p in polygon]
    out = docs.filter(
        (F.col(x_col) >= F.lit(min(xs) - _XY_SLOP))
        & (F.col(x_col) <= F.lit(max(xs) + _XY_SLOP))
        & (F.col(y_col) >= F.lit(min(ys) - _XY_SLOP))
        & (F.col(y_col) <= F.lit(max(ys) + _XY_SLOP))
    )
    x = quantize_xy_col(F.col(x_col))
    y = quantize_xy_col(F.col(y_col))
    crossings = F.lit(0)
    m = len(polygon)
    for i in range(m):
        yi, xi = ys[i], xs[i]
        yj, xj = ys[(i + 1) % m], xs[(i + 1) % m]
        if yi == yj:
            continue
        cond = (
            ((F.lit(yi) > y) != (F.lit(yj) > y))
            & (x < (F.lit(xj - xi)) * (y - F.lit(yi)) / F.lit(yj - yi)
               + F.lit(xi))
        )
        crossings = crossings + F.when(cond, F.lit(1)).otherwise(F.lit(0))
    return out.filter(crossings % 2 == 1)
