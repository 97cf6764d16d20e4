"""LatLonPoint-family geo queries: encoding goldens vs GeoEncodingUtils
semantics, haversine vs known distances, Catalyst forms vs the bit-faithful
numpy form, query duels vs brute force, and parquet pushdown of the
bounding-box prefilter."""

import math

import numpy as np
import pytest

from lucene_spark.geo import (
    LAT_DECODE,
    LON_DECODE,
    box_query,
    decode_latitude,
    decode_longitude,
    distance_bounding_box,
    distance_feature_score,
    distance_query,
    encode_latitude,
    encode_latitude_ceil,
    encode_longitude,
    encode_longitude_ceil,
    haversin_meters_np,
    nearest,
)


def test_encode_goldens():
    """GeoEncodingUtils.java:58-113 boundary semantics."""
    assert encode_latitude(0.0) == 0
    assert encode_latitude(90.0) == (1 << 31) - 1      # nextDown'd max
    assert encode_latitude(-90.0) == -(1 << 31)
    assert encode_longitude(180.0) == (1 << 31) - 1
    assert encode_longitude(-180.0) == -(1 << 31)
    # floor vs ceil: a value strictly between two quanta
    v = 12.3456789
    assert encode_latitude_ceil(v) == encode_latitude(v) + 1
    # a value exactly on a quantum boundary: floor == ceil
    q = decode_latitude(12345)
    assert encode_latitude(q) == encode_latitude_ceil(q) == 12345
    with pytest.raises(ValueError):
        encode_latitude(90.0001)
    with pytest.raises(ValueError):
        encode_longitude(-180.0001)


def test_decode_roundtrip_error_bound():
    rng = np.random.default_rng(7)
    lats = rng.uniform(-90, 90, 1000)
    lons = rng.uniform(-180, 180, 1000)
    for lat in lats[:200]:
        assert 0 <= lat - decode_latitude(encode_latitude(float(lat))) < LAT_DECODE
    for lon in lons[:200]:
        assert 0 <= lon - decode_longitude(encode_longitude(float(lon))) < LON_DECODE


def test_haversine_known_distance():
    # NYC -> London great-circle distance ~5570 km (mean-radius haversine)
    d = haversin_meters_np(40.7128, -74.0060, np.array([51.5074]),
                           np.array([-0.1278]))[0]
    assert d == pytest.approx(5_570_200, abs=5_000)
    # zero distance, antipodal ~ pi*R
    assert haversin_meters_np(10.0, 20.0, np.array([10.0]), np.array([20.0]))[0] == 0.0
    anti = haversin_meters_np(0.0, 0.0, np.array([0.0]), np.array([180.0]))[0]
    assert anti == pytest.approx(math.pi * 6_371_008.7714, rel=1e-9)


def test_bounding_box_superset():
    """The prefilter box must contain every point within the radius."""
    rng = np.random.default_rng(3)
    for lat, lon, r in [(40.0, -74.0, 2e6), (80.0, 10.0, 3e6), (0.0, 179.5, 1e5)]:
        mn_lat, mx_lat, mn_lon, mx_lon = distance_bounding_box(lat, lon, r)
        lats = rng.uniform(-90, 90, 5000)
        lons = rng.uniform(-180, 180, 5000)
        d = haversin_meters_np(lat, lon, lats, lons)
        inside = d <= r
        assert (lats[inside] >= mn_lat - 1e-9).all()
        assert (lats[inside] <= mx_lat + 1e-9).all()
        if mn_lon is not None:
            assert (lons[inside] >= mn_lon - 1e-9).all()
            assert (lons[inside] <= mx_lon + 1e-9).all()


def _geo_df(spark, n=3000, seed=11):
    rng = np.random.default_rng(seed)
    lats = rng.uniform(-90, 90, n)
    lons = rng.uniform(-180, 180, n)
    rows = [(i, float(lats[i]), float(lons[i])) for i in range(n)]
    return (
        spark.createDataFrame(rows, "doc_id long, lat double, lon double"),
        lats, lons,
    )


def _quant(lats, lons):
    qlat = np.array([decode_latitude(encode_latitude(float(v))) for v in lats])
    qlon = np.array([decode_longitude(encode_longitude(float(v))) for v in lons])
    return qlat, qlon


def test_distance_query_duel(spark):
    df, lats, lons = _geo_df(spark)
    qlat, qlon = _quant(lats, lons)
    for olat, olon, r in [(40.0, -74.0, 3e6), (-85.0, 0.0, 2e6), (0.0, 179.0, 5e5)]:
        got = sorted(
            r_.doc_id for r_ in distance_query(
                df, "lat", "lon", olat, olon, r).collect()
        )
        d = haversin_meters_np(olat, olon, qlat, qlon)
        want = sorted(np.nonzero(d <= r)[0].tolist())
        assert got == want, (olat, olon, r)


def test_box_query_duel_and_dateline(spark):
    df, lats, lons = _geo_df(spark)
    enc_lat = np.array([encode_latitude(float(v)) for v in lats])
    enc_lon = np.array([encode_longitude(float(v)) for v in lons])

    def brute(mn_lat, mx_lat, mn_lon, mx_lon):
        lat_ok = (enc_lat >= encode_latitude_ceil(mn_lat)) & (
            enc_lat <= encode_latitude(mx_lat))
        lo, hi = encode_longitude_ceil(mn_lon), encode_longitude(mx_lon)
        if mn_lon > mx_lon:
            lon_ok = (enc_lon >= lo) | (enc_lon <= hi)
        else:
            lon_ok = (enc_lon >= lo) & (enc_lon <= hi)
        return sorted(np.nonzero(lat_ok & lon_ok)[0].tolist())

    for bounds in [(-10.0, 30.0, -20.0, 40.0), (50.0, 60.0, 170.0, -170.0)]:
        got = sorted(
            r.doc_id for r in box_query(df, "lat", "lon", *bounds).collect())
        assert got == brute(*bounds), bounds
    # quantized boundary inclusion: a point exactly on the encoded min edge
    edge = decode_latitude(encode_latitude(25.0))
    one = spark.createDataFrame(
        [(0, float(edge), 0.0)], "doc_id long, lat double, lon double")
    assert box_query(one, "lat", "lon", edge, 30.0, -1.0, 1.0).count() == 1


def test_nearest_duel(spark):
    df, lats, lons = _geo_df(spark, n=2000)
    qlat, qlon = _quant(lats, lons)
    d = haversin_meters_np(40.0, -74.0, qlat, qlon)
    order = np.lexsort((np.arange(len(d)), d))[:10]
    got = nearest(df, "lat", "lon", 40.0, -74.0, 10).collect()
    assert [r.doc_id for r in got] == order.tolist()
    # distances ascend
    dist = [r.distance_m for r in got]
    assert dist == sorted(dist)


def test_distance_feature_score(spark):
    df, lats, lons = _geo_df(spark, n=500)
    qlat, qlon = _quant(lats, lons)
    pivot = 1e6
    got = {r.doc_id: r.score for r in distance_feature_score(
        df, "lat", "lon", 10.0, 20.0, pivot, boost=2.0).collect()}
    d = haversin_meters_np(10.0, 20.0, qlat, qlon)
    for i in range(500):
        want = np.float32(2.0 * pivot / (pivot + d[i]))
        # Catalyst form differs from the masked numpy form by < the
        # reference's own 40cm slop; float32 cast absorbs it
        assert got[i] == pytest.approx(float(want), rel=1e-5)
    with pytest.raises(ValueError):
        distance_feature_score(df, "lat", "lon", 0.0, 0.0, 0.0)


def test_box_prefilter_pushes_down(spark, tmp_path):
    """The distance query's raw-coordinate prefilter must reach the parquet
    scan (the BKD-prune analog)."""
    df, _, _ = _geo_df(spark, n=500)
    path = str(tmp_path / "geodocs")
    df.write.mode("overwrite").parquet(path)
    docs = spark.read.parquet(path)
    plan = distance_query(
        docs, "lat", "lon", 40.0, -74.0, 1e6
    )._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "GreaterThanOrEqual(lat" in plan


def test_polygon_query_duel(spark):
    """Even-odd crossing rule (Polygon2D.java:107-117 / EdgeTree) vs a
    pure-Python ray-casting twin on quantized coordinates."""
    from lucene_spark.geo import polygon_query

    df, lats, lons = _geo_df(spark, n=2500, seed=23)
    qlat, qlon = _quant(lats, lons)
    # a non-convex pentagon around the origin
    poly = [(10.0, -20.0), (40.0, 0.0), (10.0, 25.0), (-25.0, 15.0),
            (0.0, -2.0)]

    def inside(y, x):
        c = 0
        m = len(poly)
        for i in range(m):
            yi, xi = poly[i]
            yj, xj = poly[(i + 1) % m]
            if yi == yj:
                continue
            if ((yi > y) != (yj > y)) and (
                x < (xj - xi) * (y - yi) / (yj - yi) + xi
            ):
                c += 1
        return c % 2 == 1

    got = sorted(r.doc_id for r in polygon_query(
        df, "lat", "lon", poly).collect())
    want = sorted(i for i in range(2500) if inside(qlat[i], qlon[i]))
    assert got == want and len(want) > 10
    with pytest.raises(ValueError):
        polygon_query(df, "lat", "lon", [(0.0, 0.0), (1.0, 1.0)])


# ------------------------------------------------------- LatLonShape analog


def test_shape_box_relations(spark):
    from lucene_spark.geo import shape_box_query

    # shapes: (id, lats, lons)
    shapes = spark.createDataFrame(
        [
            # 1: small triangle fully inside the box
            (1, [1.0, 2.0, 1.0], [1.0, 2.0, 3.0]),
            # 2: big diamond that CONTAINS the box
            (2, [20.0, 0.0, -20.0, 0.0], [0.0, 25.0, 0.0, -25.0]),
            # 3: far away -> disjoint
            (3, [50.0, 51.0, 50.0], [50.0, 51.0, 52.0]),
            # 4: long thin triangle PASSING THROUGH the box: no vertex in
            #    the box, no box corner inside it -> pure edge-hit case
            (4, [0.1, 0.3, 40.0], [-40.0, 40.0, 40.0]),
            # 5: overlaps the boundary (one vertex in, rest out)
            (5, [4.0, 30.0, 30.0], [4.0, 30.0, 35.0]),
        ],
        "doc_id long, lats array<double>, lons array<double>",
    )
    box = (-5.0, 5.0, -5.0, 5.0)

    def ids(rel):
        return sorted(
            r["doc_id"]
            for r in shape_box_query(shapes, *box, relation=rel).collect())

    assert ids("within") == [1]
    assert ids("intersects") == [1, 2, 4, 5]
    assert ids("disjoint") == [3]
    assert ids("contains") == [2]


def test_shape_box_bbox_prefilter_is_catalyst(spark):
    # WITHIN compiles to pure column predicates (no python stage): the
    # plan must show a Filter over array_min/array_max, no mapInPandas
    from lucene_spark.geo import shape_box_query

    shapes = spark.createDataFrame(
        [(1, [1.0, 2.0], [1.0, 2.0])],
        "doc_id long, lats array<double>, lons array<double>")
    plan = shape_box_query(
        shapes, -5.0, 5.0, -5.0, 5.0, relation="within"
    )._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" not in plan


def test_geo3d_circle_dateline_and_polygon(spark):
    from lucene_spark.geo3d import circle3d_query, convex_polygon3d_query

    pts = spark.createDataFrame(
        [
            (1, 10.0, 175.0),    # center itself
            (2, 10.0, -178.0),   # across the dateline, ~7 deg away
            (3, 10.0, 140.0),    # 35 deg west: outside cutoff 30
            (4, 60.0, 175.0),    # 50 deg north: outside, band-pruned
            (5, 0.0, 0.0),
        ],
        "doc_id long, lat double, lon double",
    )
    got = sorted(r["doc_id"] for r in circle3d_query(
        pts, "lat", "lon", 10.0, 175.0, 30.0).collect())
    assert got == [1, 2]  # dateline wrap works without splitting the circle
    tri = [(0.0, 0.0), (0.0, 20.0), (20.0, 10.0)]  # CCW triangle
    pts2 = spark.createDataFrame(
        [(1, 5.0, 10.0), (2, 19.0, 10.0), (3, 5.0, 25.0), (4, -1.0, 10.0)],
        "doc_id long, lat double, lon double")
    got2 = sorted(r["doc_id"] for r in convex_polygon3d_query(
        pts2, "lat", "lon", tri).collect())
    assert got2 == [1, 2]  # inside; near-apex inside; east/south outside


def test_box_field_relations(spark):
    from lucene_spark.geo import box_field_query

    boxes = spark.createDataFrame(
        [
            (1, -1.0, 1.0, -1.0, 1.0),      # inside the query box
            (2, -10.0, 10.0, -10.0, 10.0),  # contains the query box
            (3, 4.0, 8.0, 0.0, 2.0),        # crosses the top edge
            (4, 20.0, 30.0, 20.0, 30.0),    # disjoint
            (5, -5.0, 5.0, -5.0, 5.0),      # equal: within AND contains
        ],
        "doc_id long, min_lat double, max_lat double, min_lon double, max_lon double",
    )
    box = (-5.0, 5.0, -5.0, 5.0)

    def ids(rel):
        return sorted(r["doc_id"] for r in
                      box_field_query(boxes, *box, relation=rel).collect())

    assert ids("intersects") == [1, 2, 3, 5]
    assert ids("within") == [1, 5]
    assert ids("contains") == [2, 5]
    assert ids("crosses") == [3]  # equal box is NOT crosses


def test_shape_polygon_relations(spark):
    """shape_polygon_query under all four relations on hand-verifiable
    rings: doc 1 inside Q, doc 2 far away, doc 3 containing Q, doc 4
    straddling Q's boundary."""
    from lucene_spark.geo import shape_polygon_query

    rows = [
        (1, [0.0, 0.0, 1.0, 1.0], [0.0, 1.0, 1.0, 0.0]),
        (2, [50.0, 50.0, 51.0, 51.0], [50.0, 51.0, 51.0, 50.0]),
        (3, [-20.0, -20.0, 20.0, 20.0], [-20.0, 20.0, 20.0, -20.0]),
        (4, [4.0, 4.0, 6.0, 6.0], [4.0, 6.0, 6.0, 4.0]),
    ]
    shp = spark.createDataFrame(
        rows, "doc_id long, lats array<double>, lons array<double>")
    q_lats, q_lons = [-5.0, -5.0, 5.0, 5.0], [-5.0, 5.0, 5.0, -5.0]
    want = {"intersects": [1, 3, 4], "within": [1],
            "disjoint": [2], "contains": [3]}
    for rel, ids in want.items():
        got = sorted(r.doc_id for r in
                     shape_polygon_query(shp, q_lats, q_lons, rel).collect())
        assert got == ids, rel


def test_shape_line_relations(spark):
    """shape_line_query: diagonal polyline intersections, containment of a
    short in-ring segment, and the reference's WITHIN rejection
    (LatLonShapeQuery.java:45-53)."""
    import pytest as _pytest
    from lucene_spark.geo import shape_line_query

    rows = [
        (1, [0.0, 0.0, 1.0, 1.0], [0.0, 1.0, 1.0, 0.0]),
        (2, [50.0, 50.0, 51.0, 51.0], [50.0, 51.0, 51.0, 50.0]),
        (3, [-20.0, -20.0, 20.0, 20.0], [-20.0, 20.0, 20.0, -20.0]),
        (4, [4.0, 4.0, 6.0, 6.0], [4.0, 6.0, 6.0, 4.0]),
    ]
    shp = spark.createDataFrame(
        rows, "doc_id long, lats array<double>, lons array<double>")
    # the y=x diagonal passes through docs 1, 3, 4; it is fully inside 3
    got = sorted(r.doc_id for r in shape_line_query(
        shp, [-10.0, 10.0], [-10.0, 10.0], "intersects").collect())
    assert got == [1, 3, 4]
    got = sorted(r.doc_id for r in shape_line_query(
        shp, [-10.0, 10.0], [-10.0, 10.0], "disjoint").collect())
    assert got == [2]
    got = sorted(r.doc_id for r in shape_line_query(
        shp, [-10.0, 10.0], [-10.0, 10.0], "contains").collect())
    assert got == [3]
    # endpoint exactly on doc 4's boundary corner: touching counts
    got = sorted(r.doc_id for r in shape_line_query(
        shp, [6.0, 8.0], [6.0, 8.0], "intersects").collect())
    assert 4 in got
    with _pytest.raises(ValueError, match="WITHIN"):
        shape_line_query(shp, [-10.0, 10.0], [-10.0, 10.0], "within")
