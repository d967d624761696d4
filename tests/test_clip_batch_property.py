"""Property tests: the batched CSR clip (predicates.clip_ring_to_rects,
the tile builder's kernel) must agree BIT-FOR-BIT with the scalar
Sutherland–Hodgman reference (predicates.clip_ring_to_rect) on every
(ring, rect) pair — random rings, dyadic edge-sharing rings, and
degenerate cases. No Spark session needed."""
import numpy as np
import pytest

from areacity_query_geometry_spark.geom import predicates


def _batch_vs_scalar(ring, rects, **kw):
    minxs = np.array([r[0] for r in rects])
    minys = np.array([r[1] for r in rects])
    maxxs = np.array([r[2] for r in rects])
    maxys = np.array([r[3] for r in rects])
    vx, vy, offs = predicates.clip_ring_to_rects(
        ring, minxs, minys, maxxs, maxys, **kw)
    for k, (x0, y0, x1, y1) in enumerate(rects):
        scalar = predicates.clip_ring_to_rect(ring, x0, y0, x1, y1)
        s, e = int(offs[k]), int(offs[k + 1])
        if e == s:
            assert len(scalar) == 0, (k, scalar)
            continue
        n = e - s
        batch = np.empty((n + 1, 2))
        batch[:n, 0] = vx[s:e]
        batch[:n, 1] = vy[s:e]
        batch[n] = batch[0]
        assert scalar.shape == batch.shape, (k, scalar, batch)
        # bit-for-bit: the batched kernel replicates the scalar pass's
        # arithmetic exactly (same t, same emission order)
        assert np.array_equal(scalar, batch), (k, scalar, batch)


def _close(pts):
    pts = np.asarray(pts, dtype=np.float64)
    return np.vstack([pts, pts[:1]])


class TestClipBatchEquivalence:
    def test_random_rings_random_rects(self):
        rng = np.random.default_rng(7)
        for _ in range(30):
            n = int(rng.integers(3, 60))
            ring = _close(rng.uniform(-10, 10, size=(n, 2)))
            rects = []
            for _ in range(25):
                x0, y0 = rng.uniform(-12, 10, size=2)
                w, h = rng.uniform(0.1, 8, size=2)
                rects.append((x0, y0, x0 + w, y0 + h))
            _batch_vs_scalar(ring, rects)

    def test_dyadic_grid_aligned(self):
        # edges exactly ON clip borders (the tiler's every-day case:
        # dyadic fixture regions against dyadic cell rects)
        ring = _close([(0, 0), (4, 0), (4, 4), (0, 4)])
        rects = [(i / 2, j / 2, i / 2 + 2, j / 2 + 2)
                 for i in range(-2, 10) for j in range(-2, 10)]
        _batch_vs_scalar(ring, rects)

    def test_degenerates(self):
        ring = _close([(0, 0), (10, 0), (10, 10), (0, 10)])
        rects = [
            (20, 20, 30, 30),      # fully outside
            (2, 2, 3, 3),          # fully inside (rect ⊂ ring: clip = rect)
            (-5, -5, 15, 15),      # ring ⊂ rect (clip = ring)
            (10, 10, 20, 20),      # corner touch only
            (0, 0, 10, 0.0),       # zero-height rect
        ]
        _batch_vs_scalar(ring, rects)

    def test_chunked_path_bit_for_bit(self):
        # force the per-chunk concat/offset reassembly (chunk_elems far
        # below the 4M default) so chunk-boundary stitching is asserted
        # bit-for-bit too, across random AND grid-aligned inputs
        rng = np.random.default_rng(11)
        ring = _close(rng.uniform(-10, 10, size=(23, 2)))
        rects = []
        for _ in range(40):
            x0, y0 = rng.uniform(-12, 10, size=2)
            w, h = rng.uniform(0.1, 8, size=2)
            rects.append((x0, y0, x0 + w, y0 + h))
        for chunk in (16, 64, 257):
            _batch_vs_scalar(ring, rects, chunk_elems=chunk)
        grid_ring = _close([(0, 0), (4, 0), (4, 4), (0, 4)])
        grid_rects = [(i / 2, j / 2, i / 2 + 2, j / 2 + 2)
                      for i in range(-2, 10) for j in range(-2, 10)]
        _batch_vs_scalar(grid_ring, grid_rects, chunk_elems=64)

    def test_concave_and_spike(self):
        ring = _close([(0, 0), (8, 0), (8, 6), (4, 2), (0, 6)])  # concave
        spike = _close([(0, 0), (6, 0), (3, 0.0001), (3, 5)])    # near-degenerate
        rects = [(x, y, x + 3, y + 3) for x in (-1, 1, 3, 5) for y in (-1, 1, 3)]
        _batch_vs_scalar(ring, rects)
        _batch_vs_scalar(spike, rects)

    def test_open_ring_and_tiny(self):
        open_ring = np.array([(0.0, 0.0), (5.0, 0.0), (5.0, 5.0)])  # unclosed
        _batch_vs_scalar(open_ring, [(1, -1, 6, 2), (-1, -1, 0.5, 0.5)])
        with_two = np.array([(0.0, 0.0), (5.0, 0.0)])
        vx, vy, offs = predicates.clip_ring_to_rects(
            with_two, np.array([0.0]), np.array([0.0]),
            np.array([1.0]), np.array([1.0]))
        assert len(vx) == 0 and offs[-1] == 0


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
