"""Tiler bridge-dissolve pass (_dissolve_window_runs): stored tile
rings must be clean component boundaries — no Sutherland–Hodgman
bridge runs along the clip window — so exported `.wkbs` polygons are
valid for JTS consumers and no downstream kernel ever sees a segment
outside the region."""
import numpy as np
import pytest

from areacity_query_geometry_spark import tiler
from areacity_query_geometry_spark.geom import core, predicates, wkb


def _rev_pairs(ring):
    a, b = ring[:-1], ring[1:]
    fwd = {(x1, y1, x2, y2)
           for (x1, y1), (x2, y2) in zip(map(tuple, a), map(tuple, b))}
    return any((x2, y2, x1, y1) in fwd for (x1, y1, x2, y2) in fwd)


def _overlapping_window_runs(ring, wx0, wy0, wx1, wy1):
    """Antiparallel OVERLAP detector (stronger than exact pairs):
    per window line, any two opposite-direction collinear intervals
    that overlap with positive length."""
    a, b = ring[:-1], ring[1:]
    for axis, c in (("x", wx0), ("x", wx1), ("y", wy0), ("y", wy1)):
        runs = []
        for (x1, y1), (x2, y2) in zip(map(tuple, a), map(tuple, b)):
            if axis == "x" and x1 == x2 == c and y1 != y2:
                runs.append((min(y1, y2), max(y1, y2), np.sign(y2 - y1)))
            if axis == "y" and y1 == y2 == c and x1 != x2:
                runs.append((min(x1, x2), max(x1, x2), np.sign(x2 - x1)))
        for i in range(len(runs)):
            for j in range(i + 1, len(runs)):
                if runs[i][2] != runs[j][2] and \
                        min(runs[i][1], runs[j][1]) > max(runs[i][0],
                                                          runs[j][0]):
                    return True
    return False


class TestDissolve:
    def test_two_prong_ring_splits_clean(self):
        e = tiler.CLIP_EPS
        ring = np.array([(1.0, 10), (1, 4), (2, 4), (2, 9), (5, 9),
                         (5, 4), (6, 4), (6, 10), (1, 10)])
        c = predicates.clip_ring_to_rect(ring, -e, -e, 8 + e, 8 + e)
        assert _overlapping_window_runs(c, -e, -e, 8 + e, 8 + e)
        loops = tiler._dissolve_window_runs(c, -e, -e, 8 + e, 8 + e)
        assert len(loops) == 2
        total = 0.0
        for L in loops:
            assert not _rev_pairs(L)
            assert not _overlapping_window_runs(L, -e, -e, 8 + e, 8 + e)
            total += core.ring_area(L)
        assert total == pytest.approx(core.ring_area(c), rel=1e-12)

    def test_bridge_free_ring_is_byte_identical(self):
        e = tiler.CLIP_EPS
        ring = np.array([(1.0, 1), (7, 1), (7, 9), (1, 9), (1, 1)])
        c = predicates.clip_ring_to_rect(ring, -e, -e, 8 + e, 8 + e)
        out = tiler._dissolve_window_runs(c, -e, -e, 8 + e, 8 + e)
        assert len(out) == 1 and out[0] is c  # the SAME array object

    def test_partial_overlap_bridge(self):
        # forward bridge [2,5] cancelled against a LONGER return run
        # [1,6] — requires the subdivision step, not just exact pairs
        e = tiler.CLIP_EPS
        w = 8 + e
        edges = [(0.5, w, 6.5, w), (6.5, w, 6.5, 4.0), (6.5, 4.0, 5.0, 4.0),
                 (5.0, 4.0, 5.0, w), (5.0, w, 2.0, w), (2.0, w, 2.0, 4.0),
                 (2.0, 4.0, 0.5, 4.0), (0.5, 4.0, 0.5, w)]
        ring = np.asarray([(x1, y1) for (x1, y1, _, _) in edges]
                          + [(edges[0][0], edges[0][1])])
        loops = tiler._dissolve_window_runs(ring, -e, -e, w, w)
        assert len(loops) == 2
        areas = sorted(abs(core.ring_area(L)) for L in loops)
        want = sorted([1.5 * (w - 4.0), 1.5 * (w - 4.0)])
        assert areas == pytest.approx(want, rel=1e-12)
        for L in loops:
            assert not _overlapping_window_runs(L, -e, -e, w, w)

    def test_province_tiles_all_clean(self, province_engine):
        """Every stored boundary tile on the REAL province file must be
        bridge-free (no antiparallel overlapping window runs) — the
        exported .wkbs validity guarantee."""
        from pyspark.sql import functions as F

        from areacity_query_geometry_spark import grid

        rows = province_engine.tiles.filter(F.col("kind") == 0).select(
            "minx", "miny", "maxx", "maxy", "tile_wkb").collect()
        assert rows
        e = tiler.CLIP_EPS
        bad = 0
        for r in rows:
            g = wkb.loads(bytes(r["tile_wkb"]))
            for ring in core.all_rings(g):
                if _overlapping_window_runs(
                        ring, r["minx"] - e, r["miny"] - e,
                        r["maxx"] + e, r["maxy"] + e):
                    bad += 1
        assert bad == 0
