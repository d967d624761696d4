"""Unit tests for the from-scratch numpy geometry kernel.

Covers the reference's documented point-query semantics
(/root/reference/AreaCityQuery.java:69-85): edge-touch matches,
hole-interior does not, hole-boundary does; plus codecs and tiling
primitives.
"""
import numpy as np
import pytest

from areacity_query_geometry_spark import grid
from areacity_query_geometry_spark.geom import core, distance, geojson, predicates, wkb, wkt


def square(x0, y0, x1, y1):
    return [(x0, y0), (x1, y0), (x1, y1), (x0, y1), (x0, y0)]


@pytest.fixture
def donut():
    # 10x10 square with a 2x2 hole in the middle
    return core.polygon(square(0, 0, 10, 10), [square(4, 4, 6, 6)])


class TestPointInPolygon:
    def test_inside(self, donut):
        px = np.array([1.0, 9.9, 5.0])
        py = np.array([1.0, 9.9, 3.0])
        res = predicates.points_intersect_rings(px, py, donut["rings"])
        assert res.tolist() == [True, True, True]

    def test_outside(self, donut):
        px = np.array([-1.0, 11.0, 20.0])
        py = np.array([5.0, 5.0, 20.0])
        assert predicates.points_intersect_rings(px, py, donut["rings"]).tolist() == [False] * 3

    def test_hole_interior_excluded(self, donut):
        px, py = np.array([5.0]), np.array([5.0])
        assert not predicates.points_intersect_rings(px, py, donut["rings"])[0]

    def test_hole_boundary_matches(self, donut):
        # on hole ring = on polygon boundary = intersects (AreaCityQuery.java:73)
        px, py = np.array([4.0, 5.0]), np.array([5.0, 6.0])
        assert predicates.points_intersect_rings(px, py, donut["rings"]).tolist() == [True, True]

    def test_outer_edge_and_vertex(self, donut):
        px = np.array([0.0, 5.0, 10.0, 0.0])
        py = np.array([5.0, 0.0, 10.0, 0.0])
        assert predicates.points_intersect_rings(px, py, donut["rings"]).tolist() == [True] * 4

    def test_edge_touch_matches_both_neighbors(self):
        left = core.polygon(square(0, 0, 5, 10))
        right = core.polygon(square(5, 0, 10, 10))
        px, py = np.array([5.0]), np.array([3.0])
        assert predicates.points_intersect_rings(px, py, left["rings"])[0]
        assert predicates.points_intersect_rings(px, py, right["rings"])[0]


class TestCodecs:
    def test_wkb_roundtrip_polygon(self, donut):
        g2 = wkb.loads(wkb.dumps(donut))
        assert g2["type"] == "Polygon"
        assert len(g2["rings"]) == 2
        np.testing.assert_allclose(g2["rings"][0], donut["rings"][0])

    def test_wkb_roundtrip_multipolygon(self):
        mp = core.multipolygon([[square(0, 0, 1, 1)], [square(2, 2, 3, 3), square(2.2, 2.2, 2.5, 2.5)]])
        g2 = wkb.loads(wkb.dumps(mp))
        assert g2["type"] == "MultiPolygon"
        assert len(g2["polys"]) == 2
        assert len(g2["polys"][1]) == 2

    def test_wkb_point_linestring(self):
        p = core.point(114.5, 22.1)
        np.testing.assert_allclose(wkb.loads(wkb.dumps(p))["xy"], p["xy"])
        ls = core.linestring([(0, 0), (1, 1), (2, 0)])
        np.testing.assert_allclose(wkb.loads(wkb.dumps(ls))["xy"], ls["xy"])

    def test_wkt_roundtrip(self, donut):
        g2 = wkt.loads(wkt.dumps(donut))
        assert len(g2["rings"]) == 2
        np.testing.assert_allclose(g2["rings"][1], donut["rings"][1])

    def test_wkt_multipolygon_roundtrip(self):
        mp = core.multipolygon([[square(0, 0, 1, 1)], [square(2, 2, 3, 3), square(2.2, 2.2, 2.5, 2.5)]])
        g2 = wkt.loads(wkt.dumps(mp))
        assert g2["type"] == "MultiPolygon"
        assert len(g2["polys"]) == 2
        assert len(g2["polys"][1]) == 2

    def test_wkt_point(self):
        g = wkt.loads("POINT (114.044346 22.691963)")
        np.testing.assert_allclose(g["xy"], [114.044346, 22.691963])

    def test_wkt_multipoint_both_spellings(self):
        a = wkt.loads("MULTIPOINT ((1 2), (3.5 4))")
        b = wkt.loads("MULTIPOINT (1 2, 3.5 4)")
        assert a["type"] == b["type"] == "MultiPoint"
        np.testing.assert_allclose(a["xy"], b["xy"])
        assert wkt.loads(wkt.dumps(a))["xy"].shape == (2, 2)

    def test_wkt_multilinestring_roundtrip(self):
        g = wkt.loads("MULTILINESTRING ((0 0, 1 1, 2 0), (5 5, 6 6))")
        assert g["type"] == "MultiLineString"
        assert [len(l) for l in g["lines"]] == [3, 2]
        g2 = wkt.loads(wkt.dumps(g))
        np.testing.assert_allclose(g2["lines"][0], g["lines"][0])

    def test_wkt_geometrycollection_roundtrip(self):
        src = ("GEOMETRYCOLLECTION (POINT (1 2), LINESTRING (0 0, 3 3), "
               "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0)), "
               "GEOMETRYCOLLECTION (MULTIPOINT ((9 9))))")
        g = wkt.loads(src)
        assert g["type"] == "GeometryCollection"
        members = [m["type"] for m in core.flatten(g)]
        assert members == ["Point", "LineString", "Polygon", "MultiPoint"]
        g2 = wkt.loads(wkt.dumps(g))
        assert [m["type"] for m in core.flatten(g2)] == members
        assert core.bounds(g) == (0.0, 0.0, 9.0, 9.0)

    def test_wkt_new_types_empty(self):
        for t in ("MULTIPOINT", "MULTILINESTRING", "GEOMETRYCOLLECTION"):
            g = wkt.loads(f"{t} EMPTY")
            assert core.is_empty(g)
            assert wkt.dumps(g).endswith("EMPTY")

    def test_geojson_feature_line(self):
        line = '{"type":"Feature","properties":{"id":110000,"name":"北京","deep":0},"geometry":{"type":"Polygon","coordinates":[[[0,0],[1,0],[1,1],[0,1],[0,0]]]}},'
        prop, geom = geojson.parse_feature_line(line)
        assert '"deep":0' in prop.replace(" ", "")
        assert geom["type"] == "Polygon"
        assert geojson.extract_deep(prop) == 0
        assert geojson.extract_str(prop, "name") == "北京"

    def test_geojson_sentinels_skipped(self):
        assert geojson.parse_feature_line('"features": [') is None
        assert geojson.parse_feature_line("]}") is None


class TestDistance:
    def test_haversine_zero(self):
        assert distance.haversine(114.0, 22.0, 114.0, 22.0) == 0.0

    def test_haversine_known(self):
        # one degree of longitude at the equator ≈ 111.3 km with R=6378137
        d = distance.haversine(0.0, 0.0, 1.0, 0.0)
        assert abs(d - 111319.49) < 1.0

    def test_simple_circle_shape(self):
        c = distance.simple_circle(121.0, 29.0, 2500.0, 24)
        ring = c["rings"][0]
        assert len(ring) == 25
        np.testing.assert_allclose(ring[0], ring[-1])
        # all vertices ≈ 2500 m away (reference's own calibration)
        d = distance.haversine(121.0, 29.0, ring[:-1, 0], ring[:-1, 1])
        assert np.all(np.abs(d - 2500.0) < 25.0)

    def test_nearest_on_segments(self):
        segs = predicates.segments_of_rings([core.ensure_closed(np.array(square(0, 0, 10, 10)))])
        nx, ny, d = predicates.nearest_on_segments(np.array([15.0]), np.array([5.0]), segs)
        assert (nx[0], ny[0]) == (10.0, 5.0)
        assert d[0] == 5.0


class TestGrid:
    def test_cell_roundtrip(self):
        cid = int(grid.cell_of(114.044346, 22.691963, 12))
        minx, miny, maxx, maxy = grid.cell_bounds(cid)
        assert minx <= 114.044346 <= maxx
        assert miny <= 22.691963 <= maxy

    def test_cell_sql_expr_matches_numpy(self):
        import duckdb
        lon, lat, res = 114.044346, 22.691963, 12
        expr = grid.cell_id_sql_expr(str(lon), str(lat), res)
        # DuckDB groks the same ANSI arithmetic (minus the L suffix)
        val = duckdb.sql("select " + expr.replace("L", "")).fetchone()[0]
        assert val == int(grid.cell_of(lon, lat, res))

    def test_children_cover_parent(self):
        cid = int(grid.cell_of(10.0, 10.0, 8))
        kids = grid.children(cid)
        pminx, pminy, pmaxx, pmaxy = grid.cell_bounds(cid)
        for k in kids:
            minx, miny, maxx, maxy = grid.cell_bounds(int(k))
            assert minx >= pminx and maxx <= pmaxx and miny >= pminy and maxy <= pmaxy

    def test_polyfill_classify(self):
        poly = core.polygon(square(0, 0, 10, 10))
        cells, kinds = grid.polyfill(poly, 7)  # cell width 2.8125°
        assert len(cells) > 4
        assert set(kinds.tolist()) == {0, 1}
        # center of an interior cell must be inside; probe one
        interior = cells[kinds == 1]
        minx, miny, maxx, maxy = grid.cells_bounds(interior)
        assert np.all(minx >= 0) and np.all(maxx <= 10)

    def test_k_ring(self):
        cells = grid.k_ring(114.0, 22.0, 10, 2)
        assert len(cells) == 25

    def test_clip_ring(self):
        ring = core.ensure_closed(np.array(square(0, 0, 10, 10), dtype=float))
        clipped = predicates.clip_ring_to_rect(ring, 5, 5, 20, 20)
        assert abs(abs(core.ring_area(clipped)) - 25.0) < 1e-9

    def test_clip_ring_disjoint(self):
        ring = core.ensure_closed(np.array(square(0, 0, 1, 1), dtype=float))
        assert len(predicates.clip_ring_to_rect(ring, 5, 5, 6, 6)) == 0
