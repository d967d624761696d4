"""Observe-metrics, kNN k>1, and hypothesis property tests for the
geometry kernel."""
import numpy as np
import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from areacity_query_geometry_spark.geom import core, predicates, wkb, wkt


class TestMetrics:
    def test_query_metrics_counts(self, spark, province_engine):
        pts = spark.range(2000).select(
            F.col("id").alias("point_id"),
            (73.0 + (F.col("id") * 37 % 62000) / 1000.0).alias("lng"),
            (18.0 + (F.col("id") * 101 % 36000) / 1000.0).alias("lat"),
        )
        df, obs = province_engine.query_points_with_metrics(pts)
        total = df.count()
        interior = obs["interior"].get["rows"]
        refined = obs["refined"].get["rows"]
        assert interior + refined == total
        assert interior > 0
        # equals plain query_points
        assert total == province_engine.query_points(pts, with_props=False).count()


class TestKnn:
    def test_iterative_rounds_equal_direct_scan(self, spark, province_engine):
        """Force the radius-doubling cover rounds (small_direct=0) and
        assert they produce the same winners as the direct terminal
        scan (small_direct=huge) — the gates usually take the
        small-input fast path, so this is the rounds' coverage."""
        from pyspark.sql import functions as F

        pts = spark.createDataFrame(
            [(i, 121.9 + i * 0.01, 29.5 + i * 0.01) for i in range(8)],
            "point_id long, lng double, lat double")
        tiles = province_engine.tiles.filter(F.col("kind") == 0)

        from pyspark.sql import Window

        def winners(small_direct):
            d = province_engine._dists_unlimited_iterative(
                pts, tiles, 2, small_direct=small_direct)
            per = d.groupBy("point_id", "region_id") \
                   .agg(F.min("dist_m").alias("dist_m")) \
                   .join(province_engine.boundaries.select("region_id", "deep"),
                         "region_id")
            w = Window.partitionBy("point_id", "deep") \
                      .orderBy("dist_m", "region_id")
            top = per.withColumn("rn", F.row_number().over(w)) \
                     .filter(F.col("rn") <= 2)
            return sorted((r.point_id, r.deep, r.region_id,
                           round(r.dist_m, 6)) for r in top.collect())

        w_iter = winners(0)
        iter_stats = dict(province_engine.last_q2_iter_stats)
        assert w_iter == winners(10**9)

        # telemetry contract (VERDICT r3 #7): the forced-rounds run
        # (small_direct=0) pins one cover round on this fixture — the
        # coastal points' 2nd-nearest province sits beyond the r/4
        # certification margin, so round 1 freezes nothing and the
        # frontier-stall guard hands the 8 surviving pairs to the
        # terminal full scan instead of burning more rounds
        st = iter_stats
        assert st["start_pd_pairs"] == 8
        assert st["rounds"] == 1
        assert st["round_radius_m"] == [262144.0]
        assert st["round_candidates"] == [40]
        assert st["round_frontier_after"] == [8]
        assert st["terminal_full_scan"] is True
        assert st["terminal_reason"] == "frontier_stall"

    def test_iter_stats_small_frontier_path(self, spark, province_engine):
        """The gate-sized path (frontier ≤ small_direct) must record
        that it skipped cover rounds entirely."""
        from pyspark.sql import functions as F

        pts = spark.createDataFrame(
            [(0, 121.9, 29.5)], "point_id long, lng double, lat double")
        tiles = province_engine.tiles.filter(F.col("kind") == 0)
        province_engine._dists_unlimited_iterative(pts, tiles, 1).count()
        st = province_engine.last_q2_iter_stats
        assert st["rounds"] == 0 and st["terminal_full_scan"] is True
        assert st["terminal_reason"] == "small_frontier"

    def test_k2_returns_two_per_level(self, spark, province_engine):
        pts = spark.createDataFrame(
            [(0, 121.993491, 29.524288)], "point_id long, lng double, lat double")
        r1 = province_engine.query_points_with_tolerance(pts, -1, k=1).collect()
        r2 = province_engine.query_points_with_tolerance(pts, -1, k=2).collect()
        assert len(r1) == 1 and len(r2) == 2
        d = sorted(r.point_distance for r in r2)
        assert r1[0].point_distance == d[0]  # k=1 winner is the nearest
        assert d[0] < d[1]


coord = st.floats(min_value=-179.0, max_value=179.0, allow_nan=False,
                  width=64).map(lambda v: round(v, 6))


class TestKernelProperties:
    @given(st.lists(st.tuples(coord, coord), min_size=3, max_size=20))
    @settings(max_examples=200, deadline=None)
    def test_wkb_roundtrip(self, pts):
        g = core.polygon(pts + [pts[0]])
        g2 = wkb.loads(wkb.dumps(g))
        np.testing.assert_array_equal(g2["rings"][0], g["rings"][0])

    @given(st.lists(st.tuples(coord, coord), min_size=2, max_size=12))
    @settings(max_examples=200, deadline=None)
    def test_wkt_roundtrip_linestring(self, pts):
        g = core.linestring(pts)
        g2 = wkt.loads(wkt.dumps(g))
        np.testing.assert_allclose(g2["xy"], g["xy"], rtol=0, atol=0)

    @given(
        st.floats(min_value=-10, max_value=10, allow_nan=False),
        st.floats(min_value=-10, max_value=10, allow_nan=False),
        st.floats(min_value=0.1, max_value=5),
        st.floats(min_value=0.1, max_value=5),
    )
    @settings(max_examples=200, deadline=None)
    def test_rect_pip_matches_interval_logic(self, x0, y0, w, h):
        """PIP on an axis-aligned rect == closed interval containment."""
        ring = core.ensure_closed(np.array(
            [(x0, y0), (x0 + w, y0), (x0 + w, y0 + h), (x0, y0 + h)]))
        rng = np.random.default_rng(0)
        px = rng.uniform(x0 - 1, x0 + w + 1, 64)
        py = rng.uniform(y0 - 1, y0 + h + 1, 64)
        got = predicates.points_intersect_rings(px, py, [ring])
        want = (px >= x0) & (px <= x0 + w) & (py >= y0) & (py <= y0 + h)
        assert np.array_equal(got, want)

    @given(st.integers(min_value=0, max_value=10_000_000),
           st.integers(min_value=4, max_value=20))
    @settings(max_examples=200, deadline=None)
    def test_cell_contains_its_point(self, seed, res):
        from areacity_query_geometry_spark import grid

        rng = np.random.default_rng(seed)
        lon = float(rng.uniform(-179.9, 179.9))
        lat = float(rng.uniform(-89.9, 89.9))
        cid = int(grid.cell_of(lon, lat, res))
        minx, miny, maxx, maxy = grid.cell_bounds(cid)
        assert minx <= lon < maxx + 1e-9
        assert miny <= lat < maxy + 1e-9

    @given(st.lists(st.tuples(coord, coord), min_size=3, max_size=15))
    @settings(max_examples=100, deadline=None)
    def test_clip_stays_within_window(self, pts):
        ring = core.ensure_closed(np.asarray(pts + [pts[0]], dtype=float))
        out = predicates.clip_ring_to_rect(ring, -50, -50, 50, 50)
        if len(out):
            assert out[:, 0].min() >= -50 - 1e-9 and out[:, 0].max() <= 50 + 1e-9
            assert out[:, 1].min() >= -50 - 1e-9 and out[:, 1].max() <= 50 + 1e-9

    @given(st.integers(min_value=0, max_value=10_000_000))
    @settings(max_examples=150, deadline=None)
    def test_seg_rect_kernel_matches_scalar(self, seed):
        """Vectorized segs_intersect_rects ≡ scalar geoms_intersect
        (seg as LineString vs rect polygon) on random configurations,
        including snapped-to-grid cases that force touches."""
        from areacity_query_geometry_spark.geom import distance

        rng = np.random.default_rng(seed)
        n = 32
        snap = lambda a: np.round(a * 4) / 4  # force exact touches often
        px1 = snap(rng.uniform(-10, 10, n)); py1 = snap(rng.uniform(-10, 10, n))
        px2 = snap(rng.uniform(-10, 10, n)); py2 = snap(rng.uniform(-10, 10, n))
        rx0 = snap(rng.uniform(-10, 8, n)); ry0 = snap(rng.uniform(-10, 8, n))
        rx1 = rx0 + snap(rng.uniform(0.25, 4, n)); ry1 = ry0 + snap(rng.uniform(0.25, 4, n))
        got = predicates.segs_intersect_rects(px1, py1, px2, py2, rx0, ry0, rx1, ry1)
        for i in range(n):
            seg = {"type": "LineString",
                   "xy": np.array([[px1[i], py1[i]], [px2[i], py2[i]]])}
            want = predicates.geoms_intersect(seg, distance.rect(rx0[i], ry0[i], rx1[i], ry1[i]))
            assert bool(got[i]) == want, (i, px1[i], py1[i], px2[i], py2[i],
                                          rx0[i], ry0[i], rx1[i], ry1[i])

    @given(st.integers(min_value=0, max_value=10_000_000))
    @settings(max_examples=100, deadline=None)
    def test_seg_vs_segs_kernel_matches_scalar(self, seed):
        rng = np.random.default_rng(seed)
        snap = lambda a: np.round(a * 4) / 4
        segs = np.column_stack([snap(rng.uniform(-5, 5, 12)) for _ in range(4)])
        px1 = snap(rng.uniform(-6, 6, 16)); py1 = snap(rng.uniform(-6, 6, 16))
        px2 = snap(rng.uniform(-6, 6, 16)); py2 = snap(rng.uniform(-6, 6, 16))
        got = predicates.segs_intersect_segs_any(px1, py1, px2, py2, segs)
        for i in range(16):
            a = np.array([[px1[i], py1[i], px2[i], py2[i]]])
            want = predicates.any_segment_intersection(a, segs)
            assert bool(got[i]) == want
