"""Exact grid-bucketed kNN point→point join (knn.py) vs numpy brute
force. Coordinates live on the 1/64° dyadic lattice so squared
distances are exact doubles — any mismatch is a logic bug, never fp
noise."""
import numpy as np
import pytest

from areacity_query_geometry_spark import knn


def _brute(probes, points, k):
    want = set()
    for pid, px, py in probes:
        if not points:
            continue
        ids = np.array([i for i, _, _ in points], dtype=np.int64)
        d2 = np.array([(px - x) ** 2 + (py - y) ** 2
                       for _, x, y in points])
        order = np.lexsort((ids, d2))[:k]
        for rank, j in enumerate(order, start=1):
            want.add((pid, rank, int(ids[j]), float(d2[j])))
    return want


def _run(spark, probes, points, k, **kw):
    pdf = spark.createDataFrame(probes, "probe_id long, lng double, lat double")
    sdf = spark.createDataFrame(points, "point_id long, lng double, lat double")
    got = knn.knn_point_join(pdf, sdf, k=k, **kw)
    return {(r.probe_id, r.rank, r.point_id, r.d2) for r in got.collect()}


class TestKnnPointJoin:
    def test_matches_brute_force(self, spark):
        rng = np.random.default_rng(42)
        points = [(i, int(rng.integers(-8000, 8000)) / 64,
                   int(rng.integers(-4000, 4000)) / 64) for i in range(500)]
        probes = [(1000 + i, int(rng.integers(-8000, 8000)) / 64,
                   int(rng.integers(-4000, 4000)) / 64) for i in range(80)]
        assert _run(spark, probes, points, 3) == _brute(probes, points, 3)

    def test_ring_expansion_far_probe(self, spark):
        """A probe in the far corner of the grid sees no candidate in
        its first boxes — it must keep expanding and still return the
        exact k winners from the distant cluster."""
        points = [(i, 100.0 + i / 64, 30.0) for i in range(10)]
        probes = [(1, -179.0, -89.0), (2, 100.0, 30.0)]
        got = _run(spark, probes, points, 3)
        assert got == _brute(probes, points, 3)
        assert sum(1 for r in got if r[0] == 1) == 3

    def test_fewer_points_than_k(self, spark):
        points = [(7, 10.0, 10.0), (8, 20.0, 20.0)]
        probes = [(1, 0.0, 0.0)]
        got = _run(spark, probes, points, 5)
        assert got == _brute(probes, points, 5)
        assert len(got) == 2

    def test_exact_ties_break_by_point_id(self, spark):
        """Four points equidistant from the probe: ranks are assigned
        by ascending point_id, identically in any engine."""
        probes = [(1, 0.0, 0.0)]
        points = [(13, 1.0, 0.0), (11, -1.0, 0.0),
                  (12, 0.0, 1.0), (14, 0.0, -1.0)]
        got = _run(spark, probes, points, 3)
        assert got == {(1, 1, 11, 1.0), (1, 2, 12, 1.0), (1, 3, 13, 1.0)}

    def test_empty_probes(self, spark):
        got = _run(spark, [], [(1, 0.0, 0.0)], 3)
        assert got == set()


class TestRangePointJoin:
    def test_matches_brute_force(self, spark):
        rng = np.random.default_rng(7)
        points = [(i, int(rng.integers(0, 640)) / 64,
                   int(rng.integers(0, 640)) / 64) for i in range(400)]
        probes = [(100 + i, int(rng.integers(0, 640)) / 64,
                   int(rng.integers(0, 640)) / 64) for i in range(40)]
        r = 1.5
        pdf = spark.createDataFrame(
            probes, "probe_id long, lng double, lat double")
        sdf = spark.createDataFrame(
            points, "point_id long, lng double, lat double")
        got = {(row.probe_id, row.point_id, row.d2)
               for row in knn.range_point_join(pdf, sdf, r).collect()}
        want = set()
        for pid, px, py in probes:
            for sid, sx, sy in points:
                d2 = (px - sx) ** 2 + (py - sy) ** 2
                if d2 <= r * r:
                    want.add((pid, sid, d2))
        assert got == want
        assert len(got) > 50  # the fixture actually exercises pairs

    def test_boundary_pair_included(self, spark):
        """d² exactly ρ² must be included — the ≤ boundary is part of
        the contract and lands identically in the oracle."""
        pdf = spark.createDataFrame(
            [(1, 0.0, 0.0)], "probe_id long, lng double, lat double")
        sdf = spark.createDataFrame(
            [(2, 0.5, 0.0), (3, 0.5, 0.5)],
            "point_id long, lng double, lat double")
        got = {(row.probe_id, row.point_id)
               for row in knn.range_point_join(pdf, sdf, 0.5).collect()}
        assert got == {(1, 2)}
