"""raster↔vector operator tests (north-rule capability)."""
import numpy as np
import pytest
from pyspark.sql import functions as F

from areacity_query_geometry_spark import grid
from areacity_query_geometry_spark.engine import _dissolve_cells
from areacity_query_geometry_spark.geom import core, predicates, wkt


class TestDissolve:
    def test_block_dissolves_to_one_ring(self):
        # a 2x2 block of res-10 cells → one ring, area = 4 cells
        base = int(grid.cell_of(10.0, 10.0, 10))
        r, ix, iy = (int(v) for v in grid.unpack(base))
        ids = np.array([int(grid.pack(r, ix + dx, iy + dy))
                        for dx in (0, 1) for dy in (0, 1)])
        polys = _dissolve_cells(ids)
        assert len(polys) == 1
        w = grid.cell_width(10)
        area = abs(core.ring_area(core.ensure_closed(polys[0][0])))
        assert abs(area - 4 * w * w) < 1e-12

    def test_disjoint_cells_two_rings(self):
        a = int(grid.cell_of(10.0, 10.0, 10))
        b = int(grid.cell_of(50.0, 50.0, 10))
        polys = _dissolve_cells(np.array([a, b]))
        assert len(polys) == 2

    def test_ring_with_hole(self):
        # 3x3 block minus center → outer ring + hole ring (even-odd)
        base = int(grid.cell_of(10.0, 10.0, 10))
        r, ix, iy = (int(v) for v in grid.unpack(base))
        ids = [int(grid.pack(r, ix + dx, iy + dy))
               for dx in range(3) for dy in range(3) if (dx, dy) != (1, 1)]
        polys = _dissolve_cells(np.array(ids))
        rings = [p[0] for p in polys]
        assert len(rings) == 2
        # PIP with even-odd over both rings: center cell center is OUT
        cx0, cy0, cx1, cy1 = grid.cell_bounds(int(grid.pack(r, ix + 1, iy + 1)))
        mid = ((cx0 + cx1) / 2, (cy0 + cy1) / 2)
        rings_closed = [core.ensure_closed(rr) for rr in rings]
        out = predicates.points_intersect_rings(
            np.array([mid[0]]), np.array([mid[1]]), rings_closed)
        assert not out[0]
        # a point in the top-left cell is IN
        tx0, ty0, tx1, ty1 = grid.cell_bounds(int(grid.pack(r, ix, iy)))
        inn = predicates.points_intersect_rings(
            np.array([(tx0 + tx1) / 2]), np.array([(ty0 + ty1) / 2]), rings_closed)
        assert inn[0]


class TestRasterVector:
    def test_rasterize_then_vectorize_covers_golden(self, province_engine):
        ras = province_engine.rasterize_regions(8, where="name = '广东省'")
        cells = ras.filter(F.col("kind") >= 0)
        vec = province_engine.vectorize_cells(cells).collect()
        assert len(vec) == 1
        g = wkt.loads(vec[0].wkt)
        rings = [core.ensure_closed(r) for rings in core.polygons_of(g) for r in rings]
        hit = predicates.points_intersect_rings(
            np.array([114.044346]), np.array([22.691963]), rings)
        assert hit[0]

    def test_rasterize_kinds(self, province_engine):
        ras = province_engine.rasterize_regions(7, where="deep = 0").cache()
        kinds = {r.kind for r in ras.select("kind").distinct().collect()}
        assert kinds == {0, 1}
        # uniform resolution (res packed in the top bits)
        assert ras.filter(F.expr("shiftright(cell_id, 56) != 7")).count() == 0
