"""WKT codec for POINT / LINESTRING / POLYGON / MULTIPOLYGON plus
MULTIPOINT / MULTILINESTRING / GEOMETRYCOLLECTION (the reference feeds
ANY WKT the JTS WKTReader accepts into QueryGeometry — "任意图形",
/root/reference/Test_HttpApiServer.java:117-137, AreaCityQuery.java:175-179).

Output format mirrors JTS `Geometry.toText()` (the reference returns
full-geometry WKT from its wkbs file, /root/reference/AreaCityQuery.java:204-206,
328-399): `POLYGON ((x y, x y, ...), (...))` with a single space after
the type keyword and `, ` between coordinates.
"""
from __future__ import annotations

import re

import numpy as np

from . import core

_NUM = r"[-+0-9.eE]+"


def dumps(geom: dict) -> str:
    t = geom["type"]
    if core.is_empty(geom):
        return f"{t.upper()} EMPTY"
    if t == "Point":
        x, y = geom["xy"]
        return f"POINT ({_f(x)} {_f(y)})"
    if t == "LineString":
        return f"LINESTRING ({_coords(geom['xy'])})"
    if t == "Polygon":
        return f"POLYGON {_poly(geom['rings'])}"
    if t == "MultiPolygon":
        body = ", ".join(_poly(rings) for rings in geom["polys"])
        return f"MULTIPOLYGON ({body})"
    if t == "MultiPoint":
        # parenthesized-point form (JTS >= 1.17 toText style)
        body = ", ".join(f"({_f(x)} {_f(y)})" for x, y in geom["xy"])
        return f"MULTIPOINT ({body})"
    if t == "MultiLineString":
        body = ", ".join(f"({_coords(l)})" for l in geom["lines"])
        return f"MULTILINESTRING ({body})"
    if t == "GeometryCollection":
        body = ", ".join(dumps(g) for g in geom["geoms"])
        return f"GEOMETRYCOLLECTION ({body})"
    raise ValueError(f"unsupported geometry type for WKT: {t}")


def _f(v: float) -> str:
    # repr-style shortest float, but integers render without ".0" padding noise
    s = repr(float(v))
    return s[:-2] if s.endswith(".0") else s


def _coords(xy: np.ndarray) -> str:
    return ", ".join(f"{_f(x)} {_f(y)}" for x, y in xy)


def _poly(rings) -> str:
    return "(" + ", ".join(f"({_coords(r)})" for r in rings) + ")"


def loads(text: str) -> dict:
    s = text.strip()
    m = re.match(r"^\s*(\w+)\s*(.*)$", s, re.S)
    if not m:
        raise ValueError(f"bad WKT: {text[:80]}")
    kind = m.group(1).upper()
    body = m.group(2).strip()
    if body.upper() == "EMPTY":
        if kind == "POINT":
            return {"type": "Point", "xy": np.array([], dtype=np.float64)}
        if kind == "POLYGON":
            return {"type": "Polygon", "rings": []}
        if kind == "MULTIPOLYGON":
            return {"type": "MultiPolygon", "polys": []}
        if kind == "LINESTRING":
            return core.linestring(np.zeros((0, 2)))
        if kind == "MULTIPOINT":
            return core.multipoint(np.zeros((0, 2)))
        if kind == "MULTILINESTRING":
            return core.multilinestring([])
        if kind == "GEOMETRYCOLLECTION":
            return core.geometrycollection([])
        raise ValueError(f"unsupported WKT type: {kind}")
    if kind == "GEOMETRYCOLLECTION":
        return core.geometrycollection(
            loads(m) for m in _split_members(body.strip()[1:-1]))
    nums, tree = _parse_parens(body)
    if kind == "POINT":
        xy = _coord_list(body.strip("() "))
        return core.point(xy[0][0], xy[0][1])
    if kind == "LINESTRING":
        return core.linestring(_coord_list(body.strip("() ")))
    if kind == "POLYGON":
        return {"type": "Polygon", "rings": [np.asarray(r) for r in tree]}
    if kind == "MULTIPOLYGON":
        return {"type": "MultiPolygon", "polys": [[np.asarray(r) for r in p] for p in nums]}
    if kind == "MULTIPOINT":
        # both spellings: MULTIPOINT (1 2, 3 4) and ((1 2), (3 4))
        pts = [p.strip(" ()\t\n") for p in body.strip()[1:-1].split(",")]
        return core.multipoint(_coord_list(", ".join(pts)))
    if kind == "MULTILINESTRING":
        return core.multilinestring([np.asarray(l) for l in tree])
    raise ValueError(f"unsupported WKT type: {kind}")


def _split_members(body: str) -> list[str]:
    """Split a GEOMETRYCOLLECTION body at its depth-0 commas."""
    out: list[str] = []
    depth = 0
    start = 0
    for i, ch in enumerate(body):
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "," and depth == 0:
            out.append(body[start:i])
            start = i + 1
    tail = body[start:].strip()
    if tail:
        out.append(tail)
    return out


def _coord_list(seg: str) -> np.ndarray:
    pts = []
    for pair in seg.split(","):
        parts = pair.split()
        pts.append((float(parts[0]), float(parts[1])))
    return np.asarray(pts, dtype=np.float64)


def _parse_parens(body: str):
    """Parse nested parenthesized coordinate lists.

    Returns (multipolygon_tree, polygon_tree): for MULTIPOLYGON input the
    3-deep nesting, for POLYGON the 2-deep ring list.
    """
    # find innermost parenthesized groups = coordinate rings
    rings: list[np.ndarray] = []
    spans: list[tuple[int, int]] = []
    depth = 0
    start = -1
    max_depth = 0
    for i, ch in enumerate(body):
        if ch == "(":
            depth += 1
            max_depth = max(max_depth, depth)
            start = i + 1
        elif ch == ")":
            if start >= 0 and start <= i:
                seg = body[start:i]
                if seg.strip() and "(" not in seg:
                    rings.append(_coord_list(seg))
                    spans.append((start, i))
            start = -1
            depth -= 1
    if max_depth <= 2:
        return [rings], rings
    # MULTIPOLYGON: group rings by their enclosing depth-2 parens
    polys: list[list[np.ndarray]] = []
    depth = 0
    cur: list[np.ndarray] | None = None
    ring_i = 0
    for i, ch in enumerate(body):
        if ch == "(":
            depth += 1
            if depth == 2:
                cur = []
        elif ch == ")":
            if depth == 2 and cur is not None:
                polys.append(cur)
                cur = None
            depth -= 1
        if spans and ring_i < len(spans) and i == spans[ring_i][1]:
            if cur is not None:
                cur.append(rings[ring_i])
            ring_i += 1
    return polys, rings
