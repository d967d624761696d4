"""Minimal WKB (well-known binary) codec for Point / LineString /
Polygon / MultiPolygon, little-endian, 2-D.

Standard OGC WKB layout (public spec): byte order flag (1 = LE),
uint32 geometry type (1 point, 2 linestring, 3 polygon, 6 multipolygon),
then type-specific payload. This replaces the reference's reliance on
JTS WKBWriter/WKBReader (/root/reference/AreaCityQuery.java:253-258,
970-980) — geometry travels through Spark as `binary` columns.
"""
from __future__ import annotations

import struct

import numpy as np

from . import core

_LE = 1
T_POINT = 1
T_LINESTRING = 2
T_POLYGON = 3
T_MULTIPOLYGON = 6


def dumps(geom: dict) -> bytes:
    t = geom["type"]
    if t == "Point":
        x, y = geom["xy"]
        return struct.pack("<BIdd", _LE, T_POINT, x, y)
    if t == "LineString":
        xy = np.ascontiguousarray(geom["xy"], dtype="<f8")
        return struct.pack("<BII", _LE, T_LINESTRING, len(xy)) + xy.tobytes()
    if t == "Polygon":
        return _poly_body(geom["rings"])
    if t == "MultiPolygon":
        parts = [_poly_body(rings) for rings in geom["polys"]]
        return struct.pack("<BII", _LE, T_MULTIPOLYGON, len(parts)) + b"".join(parts)
    raise ValueError(f"unsupported geometry type for WKB: {t}")


def _poly_body(rings) -> bytes:
    out = [struct.pack("<BII", _LE, T_POLYGON, len(rings))]
    for r in rings:
        r = np.ascontiguousarray(r, dtype="<f8")
        out.append(struct.pack("<I", len(r)))
        out.append(r.tobytes())
    return b"".join(out)


def loads(buf: bytes) -> dict:
    geom, _ = _read(memoryview(buf), 0)
    return geom


def _read(mv: memoryview, off: int) -> tuple[dict, int]:
    bo = mv[off]
    fmt = "<" if bo == 1 else ">"
    (gtype,) = struct.unpack_from(fmt + "I", mv, off + 1)
    off += 5
    if gtype == T_POINT:
        x, y = struct.unpack_from(fmt + "dd", mv, off)
        return core.point(x, y), off + 16
    if gtype == T_LINESTRING:
        (n,) = struct.unpack_from(fmt + "I", mv, off)
        off += 4
        xy = np.frombuffer(mv, dtype=fmt + "f8", count=2 * n, offset=off)
        return core.linestring(xy.reshape(n, 2)), off + 16 * n
    if gtype == T_POLYGON:
        rings, off = _read_rings(mv, off, fmt)
        return {"type": "Polygon", "rings": rings}, off
    if gtype == T_MULTIPOLYGON:
        (nparts,) = struct.unpack_from(fmt + "I", mv, off)
        off += 4
        polys = []
        for _ in range(nparts):
            sub, off = _read(mv, off)
            polys.append(sub["rings"])
        return {"type": "MultiPolygon", "polys": polys}, off
    raise ValueError(f"unsupported WKB geometry type {gtype}")


def _read_rings(mv: memoryview, off: int, fmt: str):
    (nrings,) = struct.unpack_from(fmt + "I", mv, off)
    off += 4
    rings = []
    for _ in range(nrings):
        (n,) = struct.unpack_from(fmt + "I", mv, off)
        off += 4
        xy = np.frombuffer(mv, dtype=fmt + "f8", count=2 * n, offset=off)
        rings.append(xy.reshape(n, 2).astype(np.float64))
        off += 16 * n
    return rings, off
