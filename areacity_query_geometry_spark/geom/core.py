"""Geometry representation for the numpy kernel.

A geometry is a plain dict (cheap to build inside Arrow UDF batches, no
class-pickling overhead when closures capture them):

    {"type": "Point",        "xy":   np.ndarray (2,)}
    {"type": "LineString",   "xy":   np.ndarray (N,2)}
    {"type": "Polygon",      "rings": [shell (N,2), hole1 (M,2), ...]}
    {"type": "MultiPolygon", "polys": [[shell, hole...], [shell, ...]]}
    {"type": "MultiPoint",       "xy":    np.ndarray (N,2)}
    {"type": "MultiLineString",  "lines": [np.ndarray (N,2), ...]}
    {"type": "GeometryCollection", "geoms": [geometry dict, ...]}

Rings are CLOSED (first coordinate repeated at the end), matching the
GeoJSON/WKT/WKB on-disk contract. All coordinates are float64 lon/lat
degrees, planar math throughout (matching the reference's use of JTS
with a floating PrecisionModel in degree space,
/root/reference/AreaCityQuery.java:615).

This module is deliberately dependency-free (numpy only): the container
has no shapely/GEOS, and the engine's geometry layer is built from
scratch per the project brief.
"""
from __future__ import annotations

import numpy as np

__all__ = [
    "point",
    "linestring",
    "polygon",
    "multipolygon",
    "multipoint",
    "multilinestring",
    "geometrycollection",
    "flatten",
    "all_rings",
    "polygons_of",
    "bounds",
    "is_empty",
    "ensure_closed",
    "ring_area",
]


def point(x: float, y: float) -> dict:
    return {"type": "Point", "xy": np.array([x, y], dtype=np.float64)}


def linestring(coords) -> dict:
    return {"type": "LineString", "xy": np.asarray(coords, dtype=np.float64)}


def polygon(shell, holes=()) -> dict:
    rings = [ensure_closed(np.asarray(shell, dtype=np.float64))]
    rings.extend(ensure_closed(np.asarray(h, dtype=np.float64)) for h in holes)
    return {"type": "Polygon", "rings": rings}


def multipolygon(polys) -> dict:
    """polys: iterable of ring-lists ([shell, hole, ...])."""
    out = []
    for rings in polys:
        out.append([ensure_closed(np.asarray(r, dtype=np.float64)) for r in rings])
    return {"type": "MultiPolygon", "polys": out}


def multipoint(coords) -> dict:
    return {"type": "MultiPoint",
            "xy": np.asarray(coords, dtype=np.float64).reshape(-1, 2)}


def multilinestring(lines) -> dict:
    return {"type": "MultiLineString",
            "lines": [np.asarray(l, dtype=np.float64) for l in lines]}


def geometrycollection(geoms) -> dict:
    return {"type": "GeometryCollection", "geoms": list(geoms)}


def flatten(geom: dict):
    """Yield the non-collection members of a geometry, recursing through
    GeometryCollection nesting (the reference hands ANY parsed JTS
    geometry to QueryGeometry, /root/reference/AreaCityQuery.java:175-179;
    `intersects` over a collection is the union of per-member hits)."""
    if geom["type"] == "GeometryCollection":
        for g in geom["geoms"]:
            yield from flatten(g)
    else:
        yield geom


def ensure_closed(ring: np.ndarray) -> np.ndarray:
    ring = np.asarray(ring, dtype=np.float64)
    if len(ring) == 0:
        return ring.reshape(0, 2)
    if not np.array_equal(ring[0], ring[-1]):
        ring = np.vstack([ring, ring[:1]])
    return ring


def all_rings(geom: dict) -> list[np.ndarray]:
    """Every ring (shells + holes) of a polygonal geometry, flat list."""
    t = geom["type"]
    if t == "Polygon":
        return list(geom["rings"])
    if t == "MultiPolygon":
        return [r for rings in geom["polys"] for r in rings]
    return []


def polygons_of(geom: dict) -> list[list[np.ndarray]]:
    """List of ring-lists — one entry per simple polygon part."""
    t = geom["type"]
    if t == "Polygon":
        return [geom["rings"]]
    if t == "MultiPolygon":
        return list(geom["polys"])
    return []


def is_empty(geom: dict) -> bool:
    t = geom["type"]
    if t == "Point":
        return geom["xy"].size == 0 or bool(np.any(np.isnan(geom["xy"])))
    if t in ("LineString", "MultiPoint"):
        return len(geom["xy"]) == 0
    if t == "Polygon":
        return not geom["rings"] or len(geom["rings"][0]) < 4
    if t == "MultiPolygon":
        return not geom["polys"] or all(
            (not rs or len(rs[0]) < 4) for rs in geom["polys"]
        )
    if t == "MultiLineString":
        return all(len(l) == 0 for l in geom["lines"])
    if t == "GeometryCollection":
        return all(is_empty(g) for g in geom["geoms"])
    return True


def bounds(geom: dict) -> tuple[float, float, float, float]:
    """(minx, miny, maxx, maxy). Raises on empty geometry."""
    t = geom["type"]
    if t == "Point":
        x, y = geom["xy"]
        return (x, y, x, y)
    if t in ("LineString", "MultiPoint"):
        xy = geom["xy"]
    elif t == "Polygon":
        xy = geom["rings"][0]
    elif t == "MultiLineString":
        xy = np.vstack([l for l in geom["lines"] if len(l)])
    elif t == "GeometryCollection":
        bs = np.array([bounds(g) for g in geom["geoms"] if not is_empty(g)])
        return (float(bs[:, 0].min()), float(bs[:, 1].min()),
                float(bs[:, 2].max()), float(bs[:, 3].max()))
    else:  # MultiPolygon: bounds over all shells
        xy = np.vstack([rs[0] for rs in geom["polys"] if len(rs[0])])
    mn = xy.min(axis=0)
    mx = xy.max(axis=0)
    return (float(mn[0]), float(mn[1]), float(mx[0]), float(mx[1]))


def ring_area(ring: np.ndarray) -> float:
    """Signed shoelace area of a closed ring (planar, degree^2)."""
    if len(ring) < 4:
        return 0.0
    x, y = ring[:, 0], ring[:, 1]
    return 0.5 * float(np.sum(x[:-1] * y[1:] - x[1:] * y[:-1]))
