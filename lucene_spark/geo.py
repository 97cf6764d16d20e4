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


# ---------------------------------------------------------------- shapes
# LatLonShape analog: documents ARE shapes (vertex-ring arrays), queries
# are boxes with the four ShapeQuery relations.  Reference:
# document/LatLonShape.java:60-120 (createIndexableFields tessellates a
# polygon and indexes per-triangle bboxes), document/
# LatLonShapeBoundingBoxQuery.java + spatial/ShapeQuery QueryRelation
# {INTERSECTS, WITHIN, DISJOINT, CONTAINS}.  The Spark shape: the ring's
# bbox rides as plain min/max columns (the triangulated-bbox BKD analog —
# parquet min/max stats prune files/row-groups), the exact phase is one
# vectorized numpy pass over the surviving rows' edges.

SHAPE_RELATIONS = ("intersects", "within", "disjoint", "contains")


def _shape_exact_flags(
    lats_list, lons_list, min_lat, max_lat, min_lon, max_lon
):
    """Per-row (any_vertex_in_box, any_corner_in_polygon, any_edge_hits_box,
    all_corners_in_polygon) over a batch of vertex rings — fully
    vectorized: every ring's edges are flattened into one edge table.

    Exact contracts (shared verbatim with the SQL oracle twins):
    - vertex-in-box: inclusive bounds.
    - corner-in-polygon: even-odd ray crossing, the PNPOLY/EdgeTree rule
      (geo/EdgeTree.java) — boundary behavior follows the raw predicate.
    - edge-hits-box: edge bbox overlaps the box (inclusive) AND the four
      box corners are NOT all strictly on one side of the edge's line
      (the separating-axis test for a segment vs an AABB; touching
      counts as a hit).
    """
    lens = np.array([len(a) for a in lats_list], dtype=np.int64)
    total = int(lens.sum())
    if total == 0:
        z = np.zeros(len(lats_list), dtype=bool)
        return z, z, z, z
    y = np.concatenate([np.asarray(a, dtype=np.float64) for a in lats_list])
    x = np.concatenate([np.asarray(a, dtype=np.float64) for a in lons_list])
    row = np.repeat(np.arange(len(lens)), lens)
    starts = np.cumsum(lens) - lens
    nxt = np.arange(total) + 1
    ends = np.cumsum(lens) - 1
    nxt[ends] = starts
    y2, x2 = y[nxt], x[nxt]
    n_rows = len(lens)

    # (a) any vertex inside the box
    vin = (y >= min_lat) & (y <= max_lat) & (x >= min_lon) & (x <= max_lon)
    any_vin = np.zeros(n_rows, dtype=bool)
    np.logical_or.at(any_vin, row, vin)

    # (b) box corners inside the polygon (even-odd crossings per corner)
    corners = [(min_lat, min_lon), (min_lat, max_lon),
               (max_lat, min_lon), (max_lat, max_lon)]
    inside = np.zeros((4, n_rows), dtype=np.int64)
    nz = y2 != y
    for ci, (cy, cx) in enumerate(corners):
        cross = nz & ((y > cy) != (y2 > cy))
        with np.errstate(divide="ignore", invalid="ignore"):
            xs = np.where(nz, (x2 - x) * (cy - y) / np.where(nz, y2 - y, 1.0) + x, 0.0)
        hit = cross & (cx < xs)
        np.add.at(inside[ci], row, hit.astype(np.int64))
    corner_in = (inside % 2) == 1          # (4, n_rows)
    any_corner = corner_in.any(axis=0)
    all_corners = corner_in.all(axis=0)

    # (c) any edge hits the box: bbox overlap + segment-vs-AABB side test
    elo_y, ehi_y = np.minimum(y, y2), np.maximum(y, y2)
    elo_x, ehi_x = np.minimum(x, x2), np.maximum(x, x2)
    overlap = (ehi_y >= min_lat) & (elo_y <= max_lat) \
        & (ehi_x >= min_lon) & (elo_x <= max_lon)
    dx, dy = x2 - x, y2 - y
    all_pos = np.ones(total, dtype=bool)
    all_neg = np.ones(total, dtype=bool)
    for cy, cx in corners:
        side = dx * (cy - y) - dy * (cx - x)
        all_pos &= side > 0
        all_neg &= side < 0
    edge_hit = overlap & ~(all_pos | all_neg)
    any_edge = np.zeros(n_rows, dtype=bool)
    np.logical_or.at(any_edge, row, edge_hit)
    return any_vin, any_corner, any_edge, all_corners


def shape_box_query(
    shapes: DataFrame,
    min_lat: float,
    max_lat: float,
    min_lon: float,
    max_lon: float,
    relation: str = "intersects",
    id_col: str = "doc_id",
    lats_col: str = "lats",
    lons_col: str = "lons",
) -> DataFrame:
    """ShapeQuery-relation box query over indexed vertex rings — ids of
    shapes whose relation to the box holds.

    - ``within``  (shape inside box): every vertex inside — for a convex
      query region this is exact, and it is PURE Catalyst (array_min/max
      against the bounds: the whole relation folds into the bbox columns
      the scan pushes down).
    - ``intersects``: bbox-overlap Catalyst prefilter, then the exact
      phase: any vertex in box OR any box corner in the polygon OR any
      edge hitting the box.
    - ``disjoint``: NOT intersects (full scan by nature — same as the
      reference's DISJOINT, LatLonShapeBoundingBoxQuery semantics).
    - ``contains`` (shape contains box): all four corners in the polygon
      AND no edge hits the box.
    """
    if relation not in SHAPE_RELATIONS:
        raise ValueError(f"relation must be one of {SHAPE_RELATIONS}")
    la, lo = F.col(lats_col), F.col(lons_col)
    bbox_within = (
        (F.array_min(la) >= F.lit(min_lat)) & (F.array_max(la) <= F.lit(max_lat))
        & (F.array_min(lo) >= F.lit(min_lon)) & (F.array_max(lo) <= F.lit(max_lon))
    )
    if relation == "within":
        return shapes.filter(bbox_within).select(id_col)
    bbox_overlap = (
        (F.array_max(la) >= F.lit(min_lat)) & (F.array_min(la) <= F.lit(max_lat))
        & (F.array_max(lo) >= F.lit(min_lon)) & (F.array_min(lo) <= F.lit(max_lon))
    )
    cand = shapes if relation == "disjoint" else shapes.filter(bbox_overlap)
    rel = relation
    mnla, mxla, mnlo, mxlo = (
        float(min_lat), float(max_lat), float(min_lon), float(max_lon))

    def exact(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            vin, any_c, any_e, all_c = _shape_exact_flags(
                pdf[lats_col].tolist(), pdf[lons_col].tolist(),
                mnla, mxla, mnlo, mxlo)
            inter = vin | any_c | any_e
            if rel == "intersects":
                keep = inter
            elif rel == "disjoint":
                keep = ~inter
            else:  # contains
                keep = all_c & ~any_e
            yield pdf.loc[keep, [id_col]]

    return cand.mapInPandas(exact, schema=f"{id_col} long")


# ----------------------------------------------- polygon / line shape queries
# LatLonShape.newPolygonQuery / newLineQuery (document/LatLonShape.java:144,
# 152 → LatLonShapeQuery.java wrapping a Component2D) — the query geometry is
# a polygon or polyline instead of a box, under the same QueryRelation set.
# Line queries reject WITHIN exactly as the reference does
# (LatLonShapeQuery.java:45-53: "line queries do not support within").
#
# Exact contracts (shared verbatim with the SQL oracle twins):
# - point-in-polygon: even-odd ray crossing, the PNPOLY/EdgeTree rule — the
#   same predicate _shape_exact_flags uses for box corners.
# - segment-vs-segment: orientation products ≤ 0 on both segments AND the
#   segments' bboxes overlap (the bbox guard makes the collinear case exact:
#   collinear-disjoint pairs have zero orientations but disjoint bboxes).
#   Touching counts as a hit, matching the box-relation contracts above.


def _pnpoly_many(y: np.ndarray, x: np.ndarray, qys, qxs) -> np.ndarray:
    """Even-odd crossing test of N points against ONE query ring (m small,
    constant per query) — vectorized over the points, looped over the m
    query edges."""
    inside = np.zeros(len(y), dtype=bool)
    m = len(qys)
    for i in range(m):
        yi, xi = qys[i], qxs[i]
        yj, xj = qys[(i + 1) % m], qxs[(i + 1) % m]
        if yi == yj:
            continue
        cross = (yi > y) != (yj > y)
        xs = (xj - xi) * (y - yi) / (yj - yi) + xi
        inside ^= cross & (x < xs)
    return inside


def _edges_cross_query(y, x, y2, x2, qedges) -> np.ndarray:
    """True per doc edge (y,x)->(y2,x2) when it hits ANY query edge in
    ``qedges`` (list of (cy, cx, cy2, cx2)) — orientation products ≤ 0 both
    ways plus the bbox-overlap guard; touching counts."""
    hit = np.zeros(len(y), dtype=bool)
    dlo_y, dhi_y = np.minimum(y, y2), np.maximum(y, y2)
    dlo_x, dhi_x = np.minimum(x, x2), np.maximum(x, x2)
    dx, dy = x2 - x, y2 - y
    for cy, cx, cy2, cx2 in qedges:
        # orientations of the query endpoints about the doc edge
        o1 = dx * (cy - y) - dy * (cx - x)
        o2 = dx * (cy2 - y) - dy * (cx2 - x)
        # orientations of the doc endpoints about the query edge
        qdx, qdy = cx2 - cx, cy2 - cy
        o3 = qdx * (y - cy) - qdy * (x - cx)
        o4 = qdx * (y2 - cy) - qdy * (x2 - cx)
        bb = (
            (dhi_y >= min(cy, cy2)) & (dlo_y <= max(cy, cy2))
            & (dhi_x >= min(cx, cx2)) & (dlo_x <= max(cx, cx2))
        )
        hit |= bb & (o1 * o2 <= 0) & (o3 * o4 <= 0)
    return hit


def _shape_geom_flags(lats_list, lons_list, qys, qxs, closed: bool):
    """Per-row (any_doc_vertex_in_Q, any_Q_vertex_in_doc, any_edge_cross,
    all_doc_vertices_in_Q, all_Q_vertices_in_doc) for a batch of doc rings
    against ONE query geometry — ``closed`` distinguishes a polygon ring
    (its closing edge participates and point-in-Q is meaningful) from an
    open polyline (no closing edge; point-in-Q tests are vacuous and
    reported False/True-by-convention as documented on the callers)."""
    lens = np.array([len(a) for a in lats_list], dtype=np.int64)
    n_rows = len(lens)
    total = int(lens.sum())
    if total == 0:
        z = np.zeros(n_rows, dtype=bool)
        return z, z, z, z, z
    y = np.concatenate([np.asarray(a, dtype=np.float64) for a in lats_list])
    x = np.concatenate([np.asarray(a, dtype=np.float64) for a in lons_list])
    row = np.repeat(np.arange(n_rows), lens)
    starts = np.cumsum(lens) - lens
    nxt = np.arange(total) + 1
    ends = np.cumsum(lens) - 1
    nxt[ends] = starts
    y2, x2 = y[nxt], x[nxt]

    qys = [float(v) for v in qys]
    qxs = [float(v) for v in qxs]
    m = len(qys)
    if closed:
        qedges = [(qys[i], qxs[i], qys[(i + 1) % m], qxs[(i + 1) % m])
                  for i in range(m)]
    else:
        qedges = [(qys[i], qxs[i], qys[i + 1], qxs[i + 1])
                  for i in range(m - 1)]

    # (a) doc vertices inside the query polygon (vacuously False for lines)
    if closed:
        vin = _pnpoly_many(y, x, qys, qxs)
    else:
        vin = np.zeros(total, dtype=bool)
    any_vin = np.zeros(n_rows, dtype=bool)
    np.logical_or.at(any_vin, row, vin)
    all_vin = np.ones(n_rows, dtype=bool)
    np.logical_and.at(all_vin, row, vin)

    # (b) query vertices inside each doc ring (even-odd over doc edges)
    inside_counts = np.zeros((m, n_rows), dtype=np.int64)
    nz = y2 != y
    for qi in range(m):
        cy, cx = qys[qi], qxs[qi]
        cross = nz & ((y > cy) != (y2 > cy))
        with np.errstate(divide="ignore", invalid="ignore"):
            xs = np.where(
                nz, (x2 - x) * (cy - y) / np.where(nz, y2 - y, 1.0) + x, 0.0)
        hit = cross & (cx < xs)
        np.add.at(inside_counts[qi], row, hit.astype(np.int64))
    q_in = (inside_counts % 2) == 1       # (m, n_rows)
    any_qin = q_in.any(axis=0)
    all_qin = q_in.all(axis=0)

    # (c) any doc edge hits any query edge
    cross_e = _edges_cross_query(y, x, y2, x2, qedges)
    any_cross = np.zeros(n_rows, dtype=bool)
    np.logical_or.at(any_cross, row, cross_e)
    return any_vin, any_qin, any_cross, all_vin, all_qin


def _shape_geometry_query(
    shapes: DataFrame,
    qlats,
    qlons,
    relation: str,
    closed: bool,
    id_col: str,
    lats_col: str,
    lons_col: str,
) -> DataFrame:
    qys = [float(v) for v in qlats]
    qxs = [float(v) for v in qlons]
    qmin_lat, qmax_lat = min(qys), max(qys)
    qmin_lon, qmax_lon = min(qxs), max(qxs)
    la, lo = F.col(lats_col), F.col(lons_col)
    bbox_within = (
        (F.array_min(la) >= F.lit(qmin_lat)) & (F.array_max(la) <= F.lit(qmax_lat))
        & (F.array_min(lo) >= F.lit(qmin_lon)) & (F.array_max(lo) <= F.lit(qmax_lon))
    )
    bbox_overlap = (
        (F.array_max(la) >= F.lit(qmin_lat)) & (F.array_min(la) <= F.lit(qmax_lat))
        & (F.array_max(lo) >= F.lit(qmin_lon)) & (F.array_min(lo) <= F.lit(qmax_lon))
    )
    # bbox prefilter (the BKD/triangle-bbox analog — pure Catalyst, pushed
    # down to the scan); DISJOINT is a full scan by nature, WITHIN's exact
    # candidates are bbox-within by necessity
    if relation == "disjoint":
        cand = shapes
    elif relation == "within":
        cand = shapes.filter(bbox_within)
    else:
        cand = shapes.filter(bbox_overlap)
    rel = relation

    def exact(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            any_vin, any_qin, any_cross, all_vin, all_qin = _shape_geom_flags(
                pdf[lats_col].tolist(), pdf[lons_col].tolist(), qys, qxs,
                closed)
            inter = any_vin | any_qin | any_cross
            if rel == "intersects":
                keep = inter
            elif rel == "disjoint":
                keep = ~inter
            elif rel == "within":
                keep = all_vin & ~any_cross
            else:  # contains: doc shape contains the whole query geometry
                keep = all_qin & ~any_cross
            yield pdf.loc[keep, [id_col]]

    return cand.mapInPandas(exact, schema=f"{id_col} long")


def shape_polygon_query(
    shapes: DataFrame,
    qlats,
    qlons,
    relation: str = "intersects",
    id_col: str = "doc_id",
    lats_col: str = "lats",
    lons_col: str = "lons",
) -> DataFrame:
    """LatLonShape.newPolygonQuery analog (LatLonShape.java:152): ids of
    indexed rings whose relation to the query POLYGON holds.

    - ``intersects``: any doc vertex in Q, any Q vertex in the doc ring,
      or any edge pair hitting (touching counts).
    - ``within`` (doc ring inside Q): every doc vertex in Q and no edge
      pair hitting — exact for simple rings (a vertex-inside ring whose
      edge escapes a concavity necessarily crosses Q's boundary).
    - ``disjoint``: NOT intersects (full scan by nature).
    - ``contains`` (doc ring contains Q): every Q vertex inside the doc
      ring and no edge pair hitting.
    """
    if relation not in SHAPE_RELATIONS:
        raise ValueError(f"relation must be one of {SHAPE_RELATIONS}")
    if len(qlats) < 3:
        raise ValueError("a query polygon needs >= 3 vertices")
    return _shape_geometry_query(
        shapes, qlats, qlons, relation, True, id_col, lats_col, lons_col)


def shape_line_query(
    shapes: DataFrame,
    qlats,
    qlons,
    relation: str = "intersects",
    id_col: str = "doc_id",
    lats_col: str = "lats",
    lons_col: str = "lons",
) -> DataFrame:
    """LatLonShape.newLineQuery analog (LatLonShape.java:144): ids of
    indexed rings whose relation to the query POLYLINE (open; m-1 segments)
    holds.  WITHIN is rejected exactly as the reference rejects it
    (LatLonShapeQuery.java:45-53); ``contains`` = every line vertex inside
    the doc ring and no segment hitting the ring's boundary."""
    if relation not in SHAPE_RELATIONS:
        raise ValueError(f"relation must be one of {SHAPE_RELATIONS}")
    if relation == "within":
        raise ValueError(
            "line queries do not support the WITHIN relation "
            "(LatLonShapeQuery.java:45-53)")
    if len(qlats) < 2:
        raise ValueError("a query line needs >= 2 vertices")
    return _shape_geometry_query(
        shapes, qlats, qlons, relation, False, id_col, lats_col, lons_col)


# ------------------------------------------------------- indexed box fields
# LatLonBoundingBox (sandbox/document/LatLonBoundingBox.java:40-210): docs
# ARE boxes (a 2D range field); queries relate a search box to each doc box
# with the RangeFieldQuery relations INTERSECTS / WITHIN / CONTAINS /
# CROSSES (sandbox RangeFieldQuery.QueryType semantics: CROSSES = overlaps
# without either containment).

BOX_RELATIONS = ("intersects", "within", "contains", "crosses")


def box_field_query(
    boxes: DataFrame,
    min_lat: float,
    max_lat: float,
    min_lon: float,
    max_lon: float,
    relation: str = "intersects",
    id_col: str = "doc_id",
    cols: tuple = ("min_lat", "max_lat", "min_lon", "max_lon"),
) -> DataFrame:
    """Ids of doc boxes whose relation to the query box holds — interval
    algebra per axis, 100% Catalyst column predicates (every relation is
    sargable: parquet min/max stats prune the scan, the BKD analog).

    - intersects: inclusive overlap on both axes
    - within: doc box inside the query box
    - contains: doc box contains the query box
    - crosses: intersects AND NOT within AND NOT contains
      (RangeFieldQuery.QueryType.CROSSES)
    """
    if relation not in BOX_RELATIONS:
        raise ValueError(f"relation must be one of {BOX_RELATIONS}")
    dmnla, dmxla, dmnlo, dmxlo = (F.col(c) for c in cols)
    inter = (
        (dmxla >= F.lit(min_lat)) & (dmnla <= F.lit(max_lat))
        & (dmxlo >= F.lit(min_lon)) & (dmnlo <= F.lit(max_lon))
    )
    within = (
        (dmnla >= F.lit(min_lat)) & (dmxla <= F.lit(max_lat))
        & (dmnlo >= F.lit(min_lon)) & (dmxlo <= F.lit(max_lon))
    )
    contains = (
        (dmnla <= F.lit(min_lat)) & (dmxla >= F.lit(max_lat))
        & (dmnlo <= F.lit(min_lon)) & (dmxlo >= F.lit(max_lon))
    )
    pred = {
        "intersects": inter,
        "within": within,
        "contains": contains,
        "crosses": inter & ~within & ~contains,
    }[relation]
    return boxes.filter(pred).select(id_col)


def point_nearest(
    docs: DataFrame,
    cols: list,
    origin: list,
    k: int,
    id_col: str = "doc_id",
    dist_name: str = "dist_sq",
) -> DataFrame:
    """FloatPointNearestNeighbor analog (sandbox/search/FloatPointNearest
    Neighbor.java:40-300): the k docs nearest an origin in n-dimensional
    euclidean point space, ties by id.  The reference's best-first BKD
    cell traversal becomes a TakeOrderedAndProject over the squared-
    distance expression (per-partition top-k, k rows to the driver); the
    comparison key is the SQUARED distance exactly as the reference
    compares (euclideanDistanceSquared — no sqrt in the hot loop).

    ``cols``: the point's dimension columns; ``origin``: matching floats.
    Values are float32-quantized first (FloatPoint stores float32) so the
    distances every comparison sees are the indexed ones.
    """
    if len(cols) != len(origin):
        raise ValueError("origin arity must match cols")
    d = None
    for c, o in zip(cols, origin):
        q = F.col(c).cast("float").cast("double")
        t = (q - F.lit(float(np.float32(o)))) * (q - F.lit(float(np.float32(o))))
        d = t if d is None else d + t
    return (
        docs.withColumn(dist_name, d)
        .orderBy(F.col(dist_name).asc(), F.col(id_col).asc())
        .limit(k)
    )
