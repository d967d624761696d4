"""engine._ambiguous_circle_keep must be BIT-identical to the per-row
formulation it replaced (one simple_circle + segs_intersect_segs_any +
points_parity per ambiguous (point, tile) pair — the escape test of
both tolerance kernels, ≙ the circle∩polygon step of
QueryPointWithTolerance, /root/reference/AreaCityQuery.java:102-163).

Pure numpy — no Spark session needed."""
import numpy as np

from areacity_query_geometry_spark.engine import _ambiguous_circle_keep
from areacity_query_geometry_spark.geom import core, distance, predicates


def _loop_reference(ppx, ppy, tol, seg_flat, seg_start, seg_cnt):
    out = np.zeros(len(ppx), dtype=bool)
    for i in range(len(ppx)):
        j0 = int(seg_start[i])
        j1 = j0 + int(seg_cnt[i])
        circ = distance.simple_circle(float(ppx[i]), float(ppy[i]), tol, 24)
        csegs = predicates.segments_of_rings(core.all_rings(circ))
        out[i] = bool(
            predicates.segs_intersect_segs_any(
                seg_flat[j0:j1, 0], seg_flat[j0:j1, 1],
                seg_flat[j0:j1, 2], seg_flat[j0:j1, 3], csegs).any()
            or predicates.points_parity(
                seg_flat[j0:j1, 0], seg_flat[j0:j1, 1], csegs).any())
    return out


def _radii(ppx, ppy, tol):
    km = tol / 1000.0
    a = 0.01 if km < 5 else 0.1 if km < 50 else 1.0 if km < 500 else 10.0
    b = np.asarray(distance.haversine(ppx, ppy, ppx + a, ppy))
    c = np.asarray(distance.haversine(ppx, ppy, ppx, ppy + a))
    return tol / b * a, tol / c * a


def test_matches_loop_reference_across_regimes():
    # deterministic pseudo-random pairs around several latitudes, with
    # tile segments placed from just-inside to just-outside the circle
    # radius so hits, misses, and tangent-grazing rows all occur —
    # swept at three tolerance rungs of the step ladder
    rng = np.random.RandomState(20260819)
    for tol in (2_500.0, 25_000.0, 250_000.0):
        n = 400
        ppx = 100.0 + rng.randint(0, 64000, n) / 1000.0 * 0.0001
        ppy = rng.choice([5.0, 25.0, 45.0, 62.0], n) \
            + rng.randint(0, 1000, n) / 1000.0
        rb, rc = _radii(ppx, ppy, tol)
        seg_cnt = rng.randint(1, 7, n).astype(np.int64)
        seg_start = np.zeros(n, dtype=np.int64)
        np.cumsum(seg_cnt[:-1], out=seg_start[1:])
        T = int(seg_cnt.sum())
        row = np.repeat(np.arange(n), seg_cnt)
        # segment midpoint distance from the point: 0.5–1.5 radii
        scale = 0.5 + rng.rand(T)
        ang = rng.rand(T) * 2 * np.pi
        mx = ppx[row] + rb[row] * scale * np.cos(ang)
        my = ppy[row] + rc[row] * scale * np.sin(ang)
        dx = (rng.rand(T) - 0.5) * rb[row]
        dy = (rng.rand(T) - 0.5) * rc[row]
        seg_flat = np.column_stack([mx - dx, my - dy, mx + dx, my + dy])
        want = _loop_reference(ppx, ppy, tol, seg_flat, seg_start, seg_cnt)
        got = _ambiguous_circle_keep(
            ppx, ppy, rb, rc,
            np.ascontiguousarray(seg_flat[:, 0]),
            np.ascontiguousarray(seg_flat[:, 1]),
            np.ascontiguousarray(seg_flat[:, 2]),
            np.ascontiguousarray(seg_flat[:, 3]),
            seg_start, seg_cnt, block=64)  # force multi-block path
        assert (got == want).all(), \
            f"tol={tol}: {int((got != want).sum())} rows diverge"
        assert want.any() and not want.all(), \
            "sweep must contain both hits and misses"


def test_degenerate_and_vertex_on_boundary():
    # zero-length tile segments and a vertex exactly ON a gon vertex
    tol = 25_000.0
    ppx = np.array([110.0, 110.0])
    ppy = np.array([30.0, 30.0])
    rb, rc = _radii(ppx, ppy, tol)
    # row 0: degenerate segment at the exact east gon vertex (touch);
    # row 1: degenerate segment far outside (miss)
    seg_flat = np.array([
        [110.0 + rb[0], 30.0, 110.0 + rb[0], 30.0],
        [110.0 + 3 * rb[1], 30.0, 110.0 + 3 * rb[1], 30.0],
    ])
    seg_start = np.array([0, 1], dtype=np.int64)
    seg_cnt = np.array([1, 1], dtype=np.int64)
    want = _loop_reference(ppx, ppy, tol, seg_flat, seg_start, seg_cnt)
    got = _ambiguous_circle_keep(
        ppx, ppy, rb, rc,
        np.ascontiguousarray(seg_flat[:, 0]),
        np.ascontiguousarray(seg_flat[:, 1]),
        np.ascontiguousarray(seg_flat[:, 2]),
        np.ascontiguousarray(seg_flat[:, 3]),
        seg_start, seg_cnt)
    assert (got == want).all()
    assert bool(want[0]) and not bool(want[1])
