"""Deterministic synthetic spatial world ("rectangle world") used by the
driver correctness gate and benchmarks.

Why rectangles: the DuckDB oracle has no spatial extension, so
point-in-polygon must be expressible in ANSI SQL. A hierarchy of
axis-aligned admin regions (4 provinces → 16 cities → 64 districts,
plus one region with a hole, one MultiPolygon enclave pair and one
EMPTY-geometry feature) makes every reference semantics SQL-checkable:
closed-rect containment = edge-touch duality, open-hole exclusion =
hole semantics, multi-part DISTINCT = MultiPolygon dedup
(/root/reference/AreaCityQuery.java:69-85, Test.java:454-476 analogs).

All coordinates are dyadic rationals (multiples of 1/64) so every
border comparison is exact in IEEE float on BOTH engines — no epsilon
ambiguity between the numpy kernel and the SQL oracle.

The same probe/region definitions are emitted as (a) a Spark
boundaries DataFrame feeding the real tile engine and (b) SQL text
fragments (VALUES literals) runnable verbatim by Spark SQL and DuckDB.
"""
from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession

from .geom import core, wkb
from .sources.geojson_source import BOUNDARY_SCHEMA

# ------------------------------------------------------------------ regions

WORLD = 40.0  # regions tile [0, 40] x [0, 40] degrees


def _rect(x0, y0, x1, y1):
    return (float(x0), float(y0), float(x1), float(y1))


def region_rows():
    """[(ord, code, deep, parts=[(x0,y0,x1,y1)], hole|None)] — hole is
    carved from every part it falls inside (only region P00/D0000)."""
    rows = []
    ordn = 1
    hole = _rect(2.0, 2.0, 3.0, 3.0)
    # provinces: 2x2 of 20°
    for i in range(2):
        for j in range(2):
            code = f"P{i}{j}"
            rows.append((ordn, code, 0, [_rect(20 * i, 20 * j, 20 * (i + 1), 20 * (j + 1))],
                         hole if (i, j) == (0, 0) else None))
            ordn += 1
    # cities: 4 per province, 10°
    for i in range(4):
        for j in range(4):
            code = f"C{i}{j}"
            rows.append((ordn, code, 1, [_rect(10 * i, 10 * j, 10 * (i + 1), 10 * (j + 1))], None))
            ordn += 1
    # districts: 5°
    for i in range(8):
        for j in range(8):
            code = f"D{i}{j}"
            rows.append((ordn, code, 2, [_rect(5 * i, 5 * j, 5 * (i + 1), 5 * (j + 1))],
                         hole if (i, j) == (0, 0) else None))
            ordn += 1
    # multipart special region (enclave/exclave analog, Test.java:454-476)
    rows.append((ordn, "S1", 3, [_rect(37, 1, 39, 2), _rect(1, 37, 2, 39)], None))
    ordn += 1
    # EMPTY geometry feature (AreaCityQuery.java:909-916 analog)
    rows.append((ordn, "E1", 3, [], None))
    return rows


def region_parts_values_sql() -> str:
    """One VALUES row per simple part: (ord, code, deep, x0, y0, x1, y1,
    hx0, hy0, hx1, hy1). Runs verbatim in Spark SQL and DuckDB."""
    vals = []
    for ordn, code, deep, parts, hole in region_rows():
        for (x0, y0, x1, y1) in parts:
            h = hole if hole and hole[0] >= x0 and hole[2] <= x1 and hole[1] >= y0 and hole[3] <= y1 else None
            hx = ", ".join(repr(v) for v in h) if h else "CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE)"
            vals.append(f"({ordn}, '{code}', {deep}, {x0!r}, {y0!r}, {x1!r}, {y1!r}, {hx})")
    return (
        "(VALUES " + ", ".join(vals)
        + ") AS r(ord, code, deep, x0, y0, x1, y1, hx0, hy0, hx1, hy1)"
    )


def boundaries_df(spark: SparkSession) -> DataFrame:
    """The same regions as a real boundaries DataFrame (engine input)."""
    rows = []
    for ordn, code, deep, parts, hole in region_rows():
        if not parts:
            gwkb = None
        else:
            polys = []
            for (x0, y0, x1, y1) in parts:
                shell = [(x0, y0), (x1, y0), (x1, y1), (x0, y1), (x0, y0)]
                holes = []
                if hole and hole[0] >= x0 and hole[2] <= x1 and hole[1] >= y0 and hole[3] <= y1:
                    hx0, hy0, hx1, hy1 = hole
                    holes.append([(hx0, hy0), (hx1, hy0), (hx1, hy1), (hx0, hy1), (hx0, hy0)])
                polys.append([core.ensure_closed(np.asarray(shell, dtype=np.float64))]
                             + [core.ensure_closed(np.asarray(h, dtype=np.float64)) for h in holes])
            geom = {"type": "MultiPolygon", "polys": polys} if len(polys) > 1 else \
                   {"type": "Polygon", "rings": polys[0]}
            gwkb = wkb.dumps(geom)
        prop = f'{{"id":"{code}","pid":"0","deep":"{deep}","name":"{code}","ext_path":"{code}"}}'
        rows.append((ordn, code, "0", deep, code, code, "", prop, gwkb))
    return spark.createDataFrame(rows, BOUNDARY_SCHEMA)


# ------------------------------------------------------------------ probes

def point_probes_sql(events: str = "events") -> str:
    """Deterministic probe points from the events table — multiples of
    1/64° spread over [0, 40)². Identical SQL for Spark and DuckDB."""
    return (
        f"SELECT event_id AS point_id, "
        f"CAST(event_id * 37 % 2560 AS DOUBLE) / 64 AS lng, "
        f"CAST(event_id * 101 % 2560 AS DOUBLE) / 64 AS lat "
        f"FROM {events}"
    )


def overlay_probes_sql(events: str = "events") -> str:
    """Deterministic dyadic probe WINDOWS for the overlay-area join:
    corners on the 1/64° grid, widths/heights multiples of 1/8° up to
    12° — every coordinate a multiple of 2^-10, so probe∩region areas
    are exact in IEEE doubles on BOTH engines. Identical SQL for Spark
    and DuckDB."""
    return (
        f"SELECT event_id AS probe_id, "
        f"CAST(event_id * 19 % 2048 AS DOUBLE) / 64 AS x0, "
        f"CAST(event_id * 23 % 2048 AS DOUBLE) / 64 AS y0, "
        f"CAST(event_id * 19 % 2048 AS DOUBLE) / 64"
        f" + (1.0 + CAST(event_id * 5 % 96 AS DOUBLE)) / 8 AS x1, "
        f"CAST(event_id * 23 % 2048 AS DOUBLE) / 64"
        f" + (1.0 + CAST(event_id * 11 % 96 AS DOUBLE)) / 8 AS y1 "
        f"FROM {events} WHERE event_id % 200 = 0"
    )


def zonal_raster_cells_sql(events: str = "events") -> str:
    """Deterministic raster VALUE grid for the zonal-sum gate: res-8
    cells (w = 45/32°, corners exact dyadics) spanning the fixture
    world, one row per distinct (ix, iy), value a dyadic multiple of
    1/16 derived from the cell position itself (so the DISTINCT can't
    produce conflicting values). Identical SQL in Spark and DuckDB."""
    return (
        f"SELECT DISTINCT "
        f"128 + (event_id * 7) % 29 AS ix, "
        f"64 + (event_id * 11) % 29 AS iy, "
        f"CAST(1 + ((128 + (event_id * 7) % 29) * 7"
        f" + (64 + (event_id * 11) % 29) * 13) % 32 AS DOUBLE) / 16 AS value "
        f"FROM {events} WHERE event_id % 100 = 0"
    )


def line_zonal_probes_sql(events: str = "events") -> str:
    """Deterministic AXIS-ALIGNED probe segments for the per-region
    line-length join: the varying axis runs between 1/64° dyadics, the
    constant axis sits at odd multiples of 1/128° — never collinear
    with a region edge (even/128) or any cell/sub-tile gridline
    (multiples of 45·2^(3-res), also even/128), so every crossing
    coordinate is copied exactly and lengths are exact dyadics in both
    engines. Identical SQL for Spark and DuckDB."""
    return (
        f"SELECT event_id AS probe_id, "
        f"CASE WHEN event_id % 2 = 0 THEN CAST(event_id * 13 % 2432 AS DOUBLE) / 64 "
        f"     ELSE CAST(2 * (event_id * 29 % 2560) + 1 AS DOUBLE) / 128 END AS x1, "
        f"CASE WHEN event_id % 2 = 0 THEN CAST(2 * (event_id * 29 % 2560) + 1 AS DOUBLE) / 128 "
        f"     ELSE CAST(event_id * 13 % 2432 AS DOUBLE) / 64 END AS y1, "
        f"CASE WHEN event_id % 2 = 0 THEN CAST(event_id * 13 % 2432 AS DOUBLE) / 64"
        f" + (1.0 + CAST(event_id * 7 % 512 AS DOUBLE)) / 64 "
        f"     ELSE CAST(2 * (event_id * 29 % 2560) + 1 AS DOUBLE) / 128 END AS x2, "
        f"CASE WHEN event_id % 2 = 0 THEN CAST(2 * (event_id * 29 % 2560) + 1 AS DOUBLE) / 128 "
        f"     ELSE CAST(event_id * 13 % 2432 AS DOUBLE) / 64"
        f" + (1.0 + CAST(event_id * 7 % 512 AS DOUBLE)) / 64 END AS y2 "
        f"FROM {events} WHERE event_id % 150 = 0"
    )


def poly_probe_params_sql(events: str = "events") -> str:
    """Deterministic dyadic L-SHAPE parameters for the rectilinear
    polygon overlay gate: each probe is rect A = [a, a+u]×[b, b+v]
    plus rect B = [a, a+p]×[b+v, b+v+q] with p = u/2 (a staircase
    hexagon). All values dyadic; identical SQL in Spark and DuckDB —
    the oracle consumes the two rects, the Spark gate builds the ring
    WKT from the same six numbers."""
    return (
        f"SELECT event_id AS probe_id, "
        f"CAST(event_id * 19 % 2048 AS DOUBLE) / 64 AS a, "
        f"CAST(event_id * 23 % 2048 AS DOUBLE) / 64 AS b, "
        f"(2.0 + CAST(event_id * 5 % 94 AS DOUBLE)) / 8 AS u, "
        f"(1.0 + CAST(event_id * 11 % 96 AS DOUBLE)) / 8 AS v, "
        f"(2.0 + CAST(event_id * 5 % 94 AS DOUBLE)) / 16 AS p, "
        f"(1.0 + CAST(event_id * 17 % 96 AS DOUBLE)) / 8 AS q "
        f"FROM {events} WHERE event_id % 250 = 0"
    )


def miss_probes_sql(events: str = "events") -> str:
    """Probes strictly OUTSIDE the region world (negative lng) for the
    tolerance/kNN query; 1/64° grid again."""
    return (
        f"SELECT event_id AS point_id, "
        f"0.0 - (CAST(event_id * 13 % 320 AS DOUBLE) / 64 + 0.015625) AS lng, "
        f"CAST(event_id * 7 % 2560 AS DOUBLE) / 64 AS lat "
        f"FROM {events} WHERE event_id % 20 = 0"
    )


def line_probes_sql(orders: str = "orders") -> str:
    """Deterministic single-segment line probes (Q3 line analog) —
    diagonal segments with varying direction, dyadic endpoints."""
    return (
        f"SELECT o_orderkey AS probe_id, "
        f"CAST(o_orderkey * 7 % 2048 AS DOUBLE) / 64 AS x1, "
        f"CAST(o_orderkey * 17 % 2048 AS DOUBLE) / 64 AS y1, "
        f"CAST(o_orderkey * 7 % 2048 AS DOUBLE) / 64 + 1 + CAST(o_orderkey % 192 AS DOUBLE) / 64 AS x2, "
        f"CAST(o_orderkey * 17 % 2048 AS DOUBLE) / 64 - 1 + CAST(o_orderkey * 5 % 256 AS DOUBLE) / 64 AS y2 "
        f"FROM {orders} WHERE o_orderkey % 53 = 0"
    )


def diamond_probes_sql(orders: str = "orders") -> str:
    """Deterministic diamond (rotated-square) polygon probes — the
    non-axis-aligned Q3 case; half-diagonals 2..8° so some diamonds
    fully CONTAIN whole districts (the containment path no segment
    test can see). All parameters dyadic."""
    return (
        f"SELECT o_orderkey AS probe_id, "
        f"CAST(o_orderkey * 13 % 2048 AS DOUBLE) / 64 AS cx, "
        f"CAST(o_orderkey * 19 % 2048 AS DOUBLE) / 64 AS cy, "
        f"2 + CAST(o_orderkey % 384 AS DOUBLE) / 64 AS a, "
        f"2 + CAST(o_orderkey * 3 % 384 AS DOUBLE) / 64 AS b "
        f"FROM {orders} WHERE o_orderkey % 61 = 0"
    )


def rect_probes_sql(orders: str = "orders") -> str:
    """Deterministic rectangle probes from orders (Q3 analog)."""
    return (
        f"SELECT o_orderkey AS probe_id, "
        f"CAST(o_orderkey * 11 % 2048 AS DOUBLE) / 64 AS qx0, "
        f"CAST(o_orderkey * 29 % 2048 AS DOUBLE) / 64 AS qy0, "
        f"CAST(o_orderkey * 11 % 2048 AS DOUBLE) / 64 + 1 + CAST(o_orderkey % 128 AS DOUBLE) / 64 AS qx1, "
        f"CAST(o_orderkey * 29 % 2048 AS DOUBLE) / 64 + 1 + CAST(o_orderkey * 3 % 128 AS DOUBLE) / 64 AS qy1 "
        f"FROM {orders} WHERE o_orderkey % 37 = 0"
    )
