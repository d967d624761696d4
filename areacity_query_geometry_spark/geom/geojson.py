"""GeoJSON geometry + line-delimited feature parsing.

The reference consumes a `FeatureCollection` laid out one-feature-per-
line (/root/reference/AreaCityQuery.java:502-505) and hand-parses each
line (JSONLineParse, AreaCityQuery.java:1206-1304) accepting only
Polygon / MultiPolygon (AreaCityQuery.java:898-899). We use Python's
json module per line (inside Arrow batch UDFs — batch-level, not a JVM
round trip per row) and keep the raw properties JSON substring verbatim
for output parity (AreaCityQuery.java:836-840 slices it as a string).
"""
from __future__ import annotations

import json
import re


from . import core

_PROP_RE = re.compile(r'"properties"\s*:\s*(\{.*?\})\s*,\s*"geometry"', re.S)
_PROP_RE_TAIL = re.compile(r'"properties"\s*:\s*(\{.*\})\s*\}\s*,?\s*$', re.S)


def geometry_from_geojson(obj: dict) -> dict:
    t = obj.get("type")
    coords = obj.get("coordinates", [])
    if t == "Point":
        return core.point(coords[0], coords[1])
    if t == "LineString":
        return core.linestring(coords)
    if t == "Polygon":
        if not coords:
            return {"type": "Polygon", "rings": []}
        return core.polygon(coords[0], coords[1:])
    if t == "MultiPolygon":
        return core.multipolygon(coords)
    raise ValueError(f"geometry type must be Polygon/MultiPolygon/Point/LineString, got {t}")


def parse_feature_line(line: str) -> tuple[str, dict] | None:
    """Parse one feature line → (prop_json_string, geometry dict).

    Returns None for non-feature lines (the `"features": [` header, the
    `]` terminator, empty lines) — mirroring the sentinel scan at
    AreaCityQuery.java:773-785.
    """
    s = line.strip()
    if s.endswith(","):
        s = s[:-1]
    if not s or not s.startswith("{"):
        return None
    try:
        obj = json.loads(s)
    except json.JSONDecodeError:
        return None
    if obj.get("type") != "Feature":
        return None
    # raw prop substring for byte parity where possible; fall back to re-dump
    m = _PROP_RE.search(line) or _PROP_RE_TAIL.search(line)
    prop_json = m.group(1) if m else json.dumps(obj.get("properties", {}), ensure_ascii=False)
    geom_obj = obj.get("geometry")
    if geom_obj is None or not geom_obj.get("coordinates"):
        geom = {"type": "Polygon", "rings": []}  # EMPTY kept, excluded from index
    else:
        geom = geometry_from_geojson(geom_obj)
        if geom["type"] not in ("Polygon", "MultiPolygon"):
            raise ValueError(f"feature geometry must be Polygon|MultiPolygon, got {geom['type']}")
    return prop_json, geom


# property extractors matching the reference's regex semantics
# (AreaCityQuery.java:164-165 — matches both "deep":"0" and "deep": 0)
_DEEP_RE = re.compile(r'"deep[\s":]+(\d+)')


def extract_deep(prop_json: str) -> int:
    m = _DEEP_RE.search(prop_json)
    return int(m.group(1)) if m else -1


def extract_str(prop_json: str, key: str) -> str:
    m = re.search(r'"%s"\s*:\s*"((?:[^"\\]|\\.)*)"' % re.escape(key), prop_json)
    if m:
        return m.group(1)
    m = re.search(r'"%s"\s*:\s*([-0-9.eE]+)' % re.escape(key), prop_json)
    return m.group(1) if m else ""
