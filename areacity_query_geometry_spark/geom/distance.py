"""Distance + probe-shape helpers reproducing the reference arithmetic
bit-for-bit (required for Q2 `PointDistance` parity).

- haversine: /root/reference/AreaCityQuery.java:1379-1386 (R=6378137,
  the `e = (1-cos(Δφ) + (1-cos(Δλ))·cosφ1·cosφ2)/2` form).
- 24-gon circle: CreateSimpleCircle, AreaCityQuery.java:1388-1405
  (step-ladder degree scale a ∈ {0.01, 0.1, 1, 10} by radius bucket).
- rect from corners: CreateRect, AreaCityQuery.java:1407-1413.
"""
from __future__ import annotations

import math

import numpy as np

from . import core

EARTH_R = 6378137.0


def haversine(lng1, lat1, lng2, lat2):
    """Reference-exact haversine, meters. Accepts scalars or numpy arrays."""
    d = math.pi / 180.0
    f = np.multiply(lat1, d)
    h = np.multiply(lat2, d)
    i = np.multiply(lng2, d) - np.multiply(lng1, d)
    e = (1 - np.cos(h - f) + (1 - np.cos(i)) * np.cos(f) * np.cos(h)) / 2.0
    return 2 * EARTH_R * np.arcsin(np.sqrt(e))


def haversine_sql(lng1: str, lat1: str, lng2: str, lat2: str) -> str:
    """The same formula as a Spark-SQL (and DuckDB-compatible) expression
    string, so the hot path stays JVM-side / codegen'd."""
    return (
        f"2 * {EARTH_R} * asin(sqrt((1 - cos(radians({lat2}) - radians({lat1}))"
        f" + (1 - cos(radians({lng2}) - radians({lng1})))"
        f" * cos(radians({lat1})) * cos(radians({lat2}))) / 2))"
    )


def simple_circle(lng: float, lat: float, radius_m: float, point_count: int = 24) -> dict:
    """The reference's crude polygon circle — reproduced exactly
    (AreaCityQuery.java:1388-1405), including the float step-loop."""
    km = radius_m / 1000.0
    a = 0.01 if km < 5 else 0.1 if km < 50 else 1.0 if km < 500 else 10.0
    b = float(haversine(lng, lat, lng + a, lat))
    c = float(haversine(lng, lat, lng, lat + a))
    rb = radius_m / b * a
    rc = radius_m / c * a
    arr = np.zeros((point_count + 1, 2), dtype=np.float64)
    step = 360.0 / point_count
    big_n = 360.0 - step / 2.0
    n = 0.0
    i = 0
    while n < big_n:
        arr[i, 0] = lng + rb * math.cos(n * math.pi / 180.0)
        arr[i, 1] = lat + rc * math.sin(n * math.pi / 180.0)
        i += 1
        n += step
    arr[point_count] = arr[0]
    return {"type": "Polygon", "rings": [arr]}


def circle_dirs(point_count: int = 24) -> tuple[np.ndarray, np.ndarray]:
    """simple_circle's direction table: (cos, sin) per vertex of the
    CLOSED ring, computed with the identical math.cos/math.sin float
    step-loop — so vectorized callers reconstruct simple_circle's
    vertices bit-for-bit as `lng + rb*cos, lat + rc*sin` (the batched
    24-gon escape test in engine's tolerance kernels)."""
    cs = np.zeros(point_count + 1, dtype=np.float64)
    sn = np.zeros(point_count + 1, dtype=np.float64)
    step = 360.0 / point_count
    big_n = 360.0 - step / 2.0
    n = 0.0
    i = 0
    while n < big_n:
        cs[i] = math.cos(n * math.pi / 180.0)
        sn[i] = math.sin(n * math.pi / 180.0)
        i += 1
        n += step
    cs[point_count] = cs[0]
    sn[point_count] = sn[0]
    return cs, sn


def rect(lng1: float, lat1: float, lng2: float, lat2: float) -> dict:
    return core.polygon(
        [(lng1, lat1), (lng1, lat2), (lng2, lat2), (lng2, lat1), (lng1, lat1)]
    )
