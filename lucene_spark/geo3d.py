"""Geo3D analog — unit-sphere geometry compiled to Catalyst trig.

Reference: lucene/spatial3d (org.apache.lucene.spatial3d.geom): GeoPoint
embeds (lat, lon) on the unit sphere (GeoPoint.java:73-80 —
x = cos(lat)cos(lon), y = cos(lat)sin(lon), z = sin(lat));
GeoStandardCircle.isWithin is an angular-distance cutoff
(GeoStandardCircle.java:73-87, arcDistance(p) <= cutoffAngle, i.e.
dot(p, center) >= cos(cutoff)); GeoConvexPolygon membership is the
conjunction of SidedPlane tests — the point must sit on the interior
side of every edge's great-circle plane (GeoConvexPolygon.java:338-352,
SidedPlane.isWithin = signed evaluation >= 0).

Spark shape: Geo3DPoint.newShapeQuery evaluates shape.isWithin per doc
over doc values; here every predicate is a whole-stage-codegen trig
expression over plain (lat, lon) columns — no UDF, no shuffle, and the
circle's latitude bounding band rides in front as a raw-column prefilter
that parquet min/max stats push down (the XYZBounds analog,
spatial3d/geom/XYZBounds.java).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _xyz(lat_col: str, lon_col: str) -> tuple[Column, Column, Column]:
    """Unit-sphere embedding of (lat, lon) degree columns
    (GeoPoint.java:73-80), spherical model."""
    la = F.radians(F.col(lat_col))
    lo = F.radians(F.col(lon_col))
    return (
        F.cos(la) * F.cos(lo),
        F.cos(la) * F.sin(lo),
        F.sin(la),
    )


def point_xyz(lat: float, lon: float) -> tuple[float, float, float]:
    """Driver-side GeoPoint: the same embedding in python doubles."""
    la, lo = math.radians(lat), math.radians(lon)
    return (math.cos(la) * math.cos(lo), math.cos(la) * math.sin(lo),
            math.sin(la))


def circle3d_query(
    docs: DataFrame,
    lat_col: str,
    lon_col: str,
    center_lat: float,
    center_lon: float,
    cutoff_degrees: float,
) -> DataFrame:
    """GeoStandardCircle membership (GeoStandardCircle.java:73-87):
    docs whose unit-sphere point lies within ``cutoff_degrees`` angular
    distance of the center — dot(p, c) >= cos(cutoff).

    A latitude band [center - cutoff, center + cutoff] prefilters on the
    raw column (the circle cannot leave its latitude band on a sphere),
    so the scan prunes before any trig runs.
    """
    cx, cy, cz = point_xyz(center_lat, center_lon)
    thresh = math.cos(math.radians(cutoff_degrees))
    band = docs.filter(
        (F.col(lat_col) >= F.lit(center_lat - cutoff_degrees))
        & (F.col(lat_col) <= F.lit(center_lat + cutoff_degrees))
    )
    x, y, z = _xyz(lat_col, lon_col)
    dot = x * F.lit(cx) + y * F.lit(cy) + z * F.lit(cz)
    return band.filter(dot >= F.lit(thresh))


def edge_normals(vertices: list[tuple[float, float]]) -> list[tuple[float, float, float]]:
    """One plane normal per edge of a counter-clockwise ring: v_i x v_{i+1}
    (the SidedPlane through the origin and both endpoints; interior of a
    sub-hemisphere CCW polygon is the non-negative side)."""
    pts = [point_xyz(la, lo) for la, lo in vertices]
    out = []
    m = len(pts)
    for i in range(m):
        ax, ay, az = pts[i]
        bx, by, bz = pts[(i + 1) % m]
        out.append((ay * bz - az * by, az * bx - ax * bz, ax * by - ay * bx))
    return out


def convex_polygon3d_query(
    docs: DataFrame,
    lat_col: str,
    lon_col: str,
    vertices: list[tuple[float, float]],
) -> DataFrame:
    """GeoConvexPolygon membership (GeoConvexPolygon.java:338-352): the
    point must lie on the interior side of EVERY edge plane.  ``vertices``
    is a counter-clockwise [(lat, lon), ...] ring smaller than a
    hemisphere (the convex single-ring subset; Geo3D's composite/holed
    polygons compose as OR / AND NOT of this predicate)."""
    if len(vertices) < 3:
        raise ValueError("polygon needs >= 3 vertices")
    x, y, z = _xyz(lat_col, lon_col)
    cond = None
    for nx, ny, nz in edge_normals(vertices):
        side = x * F.lit(nx) + y * F.lit(ny) + z * F.lit(nz)
        c = side >= F.lit(0.0)
        cond = c if cond is None else (cond & c)
    return docs.filter(cond)


def circle3d_sql(lat_expr: str, lon_expr: str, center_lat: float,
                 center_lon: float, cutoff_degrees: float) -> str:
    """The IDENTICAL circle predicate as ANSI SQL (DuckDB oracle twin)."""
    cx, cy, cz = point_xyz(center_lat, center_lon)
    thresh = math.cos(math.radians(cutoff_degrees))
    x = f"(cos(radians({lat_expr})) * cos(radians({lon_expr})))"
    y = f"(cos(radians({lat_expr})) * sin(radians({lon_expr})))"
    z = f"(sin(radians({lat_expr})))"
    return (
        f"({lat_expr} >= {center_lat - cutoff_degrees!r} AND "
        f"{lat_expr} <= {center_lat + cutoff_degrees!r} AND "
        f"{x} * {cx!r} + {y} * {cy!r} + {z} * {cz!r} >= {thresh!r})"
    )


def convex_polygon3d_sql(lat_expr: str, lon_expr: str,
                         vertices: list[tuple[float, float]]) -> str:
    """The IDENTICAL convex-polygon predicate as ANSI SQL."""
    x = f"(cos(radians({lat_expr})) * cos(radians({lon_expr})))"
    y = f"(cos(radians({lat_expr})) * sin(radians({lon_expr})))"
    z = f"(sin(radians({lat_expr})))"
    parts = [
        f"({x} * {nx!r} + {y} * {ny!r} + {z} * {nz!r} >= 0.0)"
        for nx, ny, nz in edge_normals(vertices)
    ]
    return "(" + " AND ".join(parts) + ")"
