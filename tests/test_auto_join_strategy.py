"""broadcast_tiles="auto" resolution (engine.py) — the byte-aware join
strategy. Measured basis (BENCH/TOWNSHIP.md r4 re-measure): at 1.04M
tiles / 0.3 GB boundary WKB, whole-table broadcast is the losing leg
even though the row count sits far under the 3M ceiling — so "auto"
must look at bytes, and the per-branch boundary broadcast must too.
"""
import pytest
from pyspark.sql import functions as F

from areacity_query_geometry_spark.engine import SpatialEngine


def _pts(spark, pts):
    return spark.createDataFrame(
        [(i, float(x), float(y)) for i, (x, y) in enumerate(pts)],
        "point_id long, lng double, lat double")


PROBES = [(114.044346, 22.691963), (116.407526, 39.904030),
          (121.473701, 31.230416), (0.0, 0.0), (108.0, 34.0)]


class TestAutoResolution:
    def test_fixture_resolves_broadcast(self, province_engine):
        # the province fixture is tiny on both axes → broadcast
        assert province_engine._broadcast_tiles_cfg == "auto"
        assert province_engine.broadcast_tiles is True

    def test_byte_budget_refuses_broadcast(self, spark, province_engine):
        eng = SpatialEngine(
            spark, province_engine.boundaries, province_engine.tiles,
            base_res=province_engine.base_res, broadcast_wkb_budget=0)
        assert eng.broadcast_tiles is False

    def test_explicit_pin_wins(self, spark, province_engine):
        eng = SpatialEngine(
            spark, province_engine.boundaries, province_engine.tiles,
            base_res=province_engine.base_res, broadcast_tiles=True,
            broadcast_wkb_budget=0)
        assert eng.broadcast_tiles is True

    def test_setter_revalidates(self, spark, province_engine):
        eng = SpatialEngine(
            spark, province_engine.boundaries, province_engine.tiles,
            base_res=province_engine.base_res)
        with pytest.raises(ValueError):
            eng.broadcast_tiles = 1  # int is not a pin

    def test_wkb_stat_cached_once(self, province_engine):
        a = province_engine._boundary_wkb_bytes()
        assert a > 0
        assert province_engine._boundary_wkb_bytes() is not None
        assert province_engine._wkb_bytes == a


class TestAutoFallbackParity:
    def test_per_branch_leg_matches_broadcast(self, spark, province_engine):
        """Force the auto rule onto the per-branch path (byte budget 0
        also disables the boundary-branch broadcast AND the boundary
        index) and require identical hits to the broadcast engine —
        the same cross-leg equality TOWNSHIP hash-checks at 1M tiles."""
        eng = SpatialEngine(
            spark, province_engine.boundaries, province_engine.tiles,
            base_res=province_engine.base_res, broadcast_wkb_budget=0)
        assert eng.broadcast_tiles is False
        probes = _pts(spark, PROBES)
        got = sorted((r["point_id"], r["region_id"]) for r in
                     eng.query_points(probes, with_props=False).collect())
        want = sorted((r["point_id"], r["region_id"]) for r in
                      province_engine.query_points(
                          probes, with_props=False).collect())
        assert got == want
        assert len(want) >= 3  # the three on-land probes all resolve

    def test_store_meta_seeds_stats(self, spark, province_engine, tmp_path):
        from areacity_query_geometry_spark.sources import tile_store

        path = str(tmp_path / "store")
        tile_store.save(province_engine, path,
                        {"base_res": province_engine.base_res,
                         "max_res": 14, "seg_budget": 48})
        eng = tile_store.load(spark, path)
        # stats seeded from _meta.json — resolving "auto" runs no job
        assert eng._wkb_bytes == province_engine._boundary_wkb_bytes()
        assert eng._kind_counts == province_engine._tile_counts_by_kind()
        assert eng.broadcast_tiles is True
