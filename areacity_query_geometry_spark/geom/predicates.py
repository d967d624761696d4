"""Vectorized planar geometry predicates (numpy only).

These kernels are the distributed engine's replacement for JTS's exact
predicates used by the reference (`subGeom.intersects(geom)`,
/root/reference/AreaCityQuery.java:260-263). Semantics follow OGC SFS
`intersects` — boundary contact counts as a hit (the reference's
documented edge-touch duality, AreaCityQuery.java:72-73): a point on a
shared edge matches BOTH neighbours; a point strictly inside a hole
matches none; a point ON a hole's ring matches (it is on the polygon
boundary).

All functions are vectorized over batches of probe points — they are
called from Arrow/pandas UDFs on Arrow-batch columns, never per row.
"""
from __future__ import annotations

import numpy as np

# perpendicular-distance tolerance (degrees) for "point on segment";
# ~1e-12 deg ≈ 0.1 µm — exact-coordinate touches are caught, nothing else.
EPS = 1e-12


def segments_of_rings(rings) -> np.ndarray:
    """Stack closed rings into an (S, 4) array of segments x1,y1,x2,y2."""
    segs = []
    for r in rings:
        if len(r) < 2:
            continue
        segs.append(np.hstack([r[:-1], r[1:]]))
    if not segs:
        return np.zeros((0, 4), dtype=np.float64)
    return np.vstack(segs)


def points_on_segments(px: np.ndarray, py: np.ndarray, segs: np.ndarray) -> np.ndarray:
    """(M,) bool: point lies on any segment (within EPS perpendicular)."""
    if len(segs) == 0 or len(px) == 0:
        return np.zeros(len(px), dtype=bool)
    x1, y1, x2, y2 = segs[:, 0], segs[:, 1], segs[:, 2], segs[:, 3]
    dx, dy = x2 - x1, y2 - y1
    ln = np.hypot(dx, dy)
    degen = ln == 0
    ln = np.where(degen, 1.0, ln)
    # broadcast (M, S)
    qx = px[:, None] - x1[None, :]
    qy = py[:, None] - y1[None, :]
    cross = np.abs(qx * dy[None, :] - qy * dx[None, :]) / ln[None, :]
    # zero-length segment: "distance to the line" is meaningless — use
    # distance to the point itself (otherwise every probe matches it)
    cross = np.where(degen[None, :], np.hypot(qx, qy), cross)
    t = (qx * dx[None, :] + qy * dy[None, :]) / (ln[None, :] ** 2)
    t = np.where(degen[None, :], 0.0, t)
    on = (cross <= EPS) & (t >= -EPS) & (t <= 1 + EPS)
    return on.any(axis=1)


def points_parity(px: np.ndarray, py: np.ndarray, segs: np.ndarray) -> np.ndarray:
    """(M,) bool: even-odd crossing parity over ALL ring segments.

    Odd parity == strictly inside the polygon-with-holes (even-odd rule
    handles holes for free since hole rings sit inside the shell).
    Behaviour exactly on the boundary is undefined here — callers OR in
    `points_on_segments` for SFS `intersects` semantics.
    """
    if len(segs) == 0 or len(px) == 0:
        return np.zeros(len(px), dtype=bool)
    x1, y1, x2, y2 = segs[:, 0], segs[:, 1], segs[:, 2], segs[:, 3]
    # standard half-open crossing rule; guard div-by-zero on horizontal segs
    yd = y2 - y1
    yd_safe = np.where(yd == 0, 1.0, yd)
    cond = (y1[None, :] > py[:, None]) != (y2[None, :] > py[:, None])
    xint = x1[None, :] + (py[:, None] - y1[None, :]) / yd_safe[None, :] * (x2 - x1)[None, :]
    crossings = cond & (px[:, None] < xint)
    return (crossings.sum(axis=1) % 2).astype(bool)


def points_intersect_rings(px, py, rings) -> np.ndarray:
    """(M,) bool OGC `intersects(point, polygon)` over a ring list
    (shells + holes together, even-odd)."""
    segs = segments_of_rings(rings)
    return points_parity(px, py, segs) | points_on_segments(px, py, segs)


def points_intersect_prepared(px, py, segs) -> np.ndarray:
    """Same as points_intersect_rings but with pre-stacked segments."""
    return points_parity(px, py, segs) | points_on_segments(px, py, segs)


# ---------------------------------------------------------------- rect ops

def segments_intersect_rect(segs: np.ndarray, minx, miny, maxx, maxy) -> np.ndarray:
    """(S,) bool: segment has any point inside/on the rect (Liang-Barsky)."""
    if len(segs) == 0:
        return np.zeros(0, dtype=bool)
    x1, y1, x2, y2 = segs[:, 0], segs[:, 1], segs[:, 2], segs[:, 3]
    dx, dy = x2 - x1, y2 - y1
    t0 = np.zeros(len(segs))
    t1 = np.ones(len(segs))
    ok = np.ones(len(segs), dtype=bool)
    for p, q in (
        (-dx, x1 - minx),
        (dx, maxx - x1),
        (-dy, y1 - miny),
        (dy, maxy - y1),
    ):
        par = p == 0
        ok &= ~(par & (q < 0))  # parallel and outside
        with np.errstate(divide="ignore", invalid="ignore"):
            r = np.where(par, 0.0, q / np.where(p == 0, 1.0, p))
        ent = (~par) & (p < 0)
        ext = (~par) & (p > 0)
        t0 = np.where(ent, np.maximum(t0, r), t0)
        t1 = np.where(ext, np.minimum(t1, r), t1)
    return ok & (t0 <= t1)


def segments_in_cells(segs: np.ndarray, cell_minx, cell_miny, cell_maxx, cell_maxy,
                      chunk_elems: int = 4_000_000) -> np.ndarray:
    """(C,) bool per cell: does ANY segment touch the cell rect.

    Fully vectorized (C cells × S segments) Liang-Barsky, chunked over
    cells so the broadcast stays under ``chunk_elems`` floats.
    """
    C = len(cell_minx)
    out = np.zeros(C, dtype=bool)
    S = len(segs)
    if S == 0 or C == 0:
        return out
    x1, y1, x2, y2 = segs[:, 0], segs[:, 1], segs[:, 2], segs[:, 3]
    dx, dy = x2 - x1, y2 - y1
    step = max(1, chunk_elems // S)
    for c0 in range(0, C, step):
        c1 = min(C, c0 + step)
        mnx = np.asarray(cell_minx[c0:c1])[:, None]
        mny = np.asarray(cell_miny[c0:c1])[:, None]
        mxx = np.asarray(cell_maxx[c0:c1])[:, None]
        mxy = np.asarray(cell_maxy[c0:c1])[:, None]
        t0 = np.zeros((c1 - c0, S))
        t1 = np.ones((c1 - c0, S))
        ok = np.ones((c1 - c0, S), dtype=bool)
        for p, q in (
            (-dx[None, :], x1[None, :] - mnx),
            (dx[None, :], mxx - x1[None, :]),
            (-dy[None, :], y1[None, :] - mny),
            (dy[None, :], mxy - y1[None, :]),
        ):
            par = p == 0
            ok &= ~(par & (q < 0))
            with np.errstate(divide="ignore", invalid="ignore"):
                r = np.where(par, 0.0, q / np.where(p == 0, 1.0, p))
            t0 = np.where((~par) & (p < 0), np.maximum(t0, r), t0)
            t1 = np.where((~par) & (p > 0), np.minimum(t1, r), t1)
        out[c0:c1] = (ok & (t0 <= t1)).any(axis=1)
    return out


def segment_counts_in_cells(segs: np.ndarray, cell_minx, cell_miny, cell_maxx, cell_maxy) -> np.ndarray:
    """(C,) int: number of segments whose bbox overlaps each cell —
    the density signal driving adaptive tile splitting (the distributed
    analog of the reference's gridFactor point-count budget,
    /root/reference/AreaCityQuery.java:1310-1375)."""
    C = len(cell_minx)
    if len(segs) == 0 or C == 0:
        return np.zeros(C, dtype=np.int64)
    sminx = np.minimum(segs[:, 0], segs[:, 2])[None, :]
    smaxx = np.maximum(segs[:, 0], segs[:, 2])[None, :]
    sminy = np.minimum(segs[:, 1], segs[:, 3])[None, :]
    smaxy = np.maximum(segs[:, 1], segs[:, 3])[None, :]
    hit = (
        (sminx <= np.asarray(cell_maxx)[:, None])
        & (smaxx >= np.asarray(cell_minx)[:, None])
        & (sminy <= np.asarray(cell_maxy)[:, None])
        & (smaxy >= np.asarray(cell_miny)[:, None])
    )
    return hit.sum(axis=1)


def clip_ring_to_rect(ring: np.ndarray, minx, miny, maxx, maxy) -> np.ndarray:
    """Sutherland–Hodgman clip of one closed ring against an axis-aligned
    rect. Returns a closed ring (possibly empty). The clip region is
    convex so the output is a single ring; degenerate output (area 0)
    returns empty. This is the distributed analog of the reference's
    `polygon.intersection(gridRect)` tiling step
    (/root/reference/AreaCityQuery.java:1310-1375)."""
    pts = ring[:-1] if len(ring) and np.array_equal(ring[0], ring[-1]) else ring
    if len(pts) < 3:
        return np.zeros((0, 2))

    def clip_edge(poly, inside_fn, intersect_fn):
        if len(poly) == 0:
            return poly
        out = []
        prev = poly[-1]
        prev_in = inside_fn(prev)
        for cur in poly:
            cur_in = inside_fn(cur)
            if cur_in:
                if not prev_in:
                    out.append(intersect_fn(prev, cur))
                out.append(cur)
            elif prev_in:
                out.append(intersect_fn(prev, cur))
            prev, prev_in = cur, cur_in
        return np.asarray(out) if out else np.zeros((0, 2))

    def ix_x(xc):
        def f(a, b):
            t = (xc - a[0]) / (b[0] - a[0])
            return np.array([xc, a[1] + t * (b[1] - a[1])])
        return f

    def ix_y(yc):
        def f(a, b):
            t = (yc - a[1]) / (b[1] - a[1])
            return np.array([a[0] + t * (b[0] - a[0]), yc])
        return f

    poly = np.asarray(pts, dtype=np.float64)
    poly = clip_edge(poly, lambda p: p[0] >= minx, ix_x(minx))
    poly = clip_edge(poly, lambda p: p[0] <= maxx, ix_x(maxx))
    poly = clip_edge(poly, lambda p: p[1] >= miny, ix_y(miny))
    poly = clip_edge(poly, lambda p: p[1] <= maxy, ix_y(maxy))
    if len(poly) < 3:
        return np.zeros((0, 2))
    # drop consecutive duplicates (and the wrap-around duplicate, so the
    # final closing vstack never creates a zero-length segment)
    keep = np.ones(len(poly), dtype=bool)
    keep[1:] = np.any(poly[1:] != poly[:-1], axis=1)
    poly = poly[keep]
    if len(poly) > 1 and np.array_equal(poly[0], poly[-1]):
        poly = poly[:-1]
    if len(poly) < 3:
        return np.zeros((0, 2))
    return np.vstack([poly, poly[:1]])


# ------------------------------------------------------------- distances

def nearest_on_segments(px: np.ndarray, py: np.ndarray, segs: np.ndarray):
    """For each point, the planar-nearest point on any segment.

    Returns (nx, ny, dist) arrays of shape (M,). Mirrors JTS
    `DistanceOp.nearestPoints(tileGeom, point)` in degree space
    (/root/reference/AreaCityQuery.java:131) for points outside the
    geometry.
    """
    M = len(px)
    if len(segs) == 0 or M == 0:
        nan = np.full(M, np.nan)
        return nan, nan, np.full(M, np.inf)
    ax, ay, bx, by = segs[:, 0], segs[:, 1], segs[:, 2], segs[:, 3]
    dx, dy = bx - ax, by - ay
    ln2 = dx * dx + dy * dy
    ln2 = np.where(ln2 == 0, 1.0, ln2)
    qx = px[:, None] - ax[None, :]
    qy = py[:, None] - ay[None, :]
    t = np.clip((qx * dx[None, :] + qy * dy[None, :]) / ln2[None, :], 0.0, 1.0)
    cx = ax[None, :] + t * dx[None, :]
    cy = ay[None, :] + t * dy[None, :]
    d2 = (px[:, None] - cx) ** 2 + (py[:, None] - cy) ** 2
    j = d2.argmin(axis=1)
    i = np.arange(M)
    return cx[i, j], cy[i, j], np.sqrt(d2[i, j])


# ------------------------------------------- segment × segment (line probes)

def _orient(ax, ay, bx, by, cx, cy):
    return (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)


def any_segment_intersection(a: np.ndarray, b: np.ndarray) -> bool:
    """True if any segment in a (A,4) intersects any segment in b (B,4),
    boundary-inclusive."""
    if len(a) == 0 or len(b) == 0:
        return False
    ax1, ay1, ax2, ay2 = (a[:, k][:, None] for k in range(4))
    bx1, by1, bx2, by2 = (b[:, k][None, :] for k in range(4))
    d1 = _orient(ax1, ay1, ax2, ay2, bx1, by1)
    d2 = _orient(ax1, ay1, ax2, ay2, bx2, by2)
    d3 = _orient(bx1, by1, bx2, by2, ax1, ay1)
    d4 = _orient(bx1, by1, bx2, by2, ax2, ay2)
    proper = ((d1 > 0) != (d2 > 0)) & ((d3 > 0) != (d4 > 0)) & \
             (d1 != 0) & (d2 != 0) & (d3 != 0) & (d4 != 0)
    if proper.any():
        return True
    # collinear / endpoint touches
    def on(dx, px_, py_, sx1, sy1, sx2, sy2):
        return (dx == 0) & (np.minimum(sx1, sx2) <= px_) & (px_ <= np.maximum(sx1, sx2)) & \
               (np.minimum(sy1, sy2) <= py_) & (py_ <= np.maximum(sy1, sy2))
    touch = (
        on(d1, bx1, by1, ax1, ay1, ax2, ay2)
        | on(d2, bx2, by2, ax1, ay1, ax2, ay2)
        | on(d3, ax1, ay1, bx1, by1, bx2, by2)
        | on(d4, ax2, ay2, bx1, by1, bx2, by2)
    )
    return bool(touch.any())


def _pair_seg_intersect(ax1, ay1, ax2, ay2, bx1, by1, bx2, by2):
    """Elementwise (broadcastable) segment×segment intersect,
    boundary-inclusive — exact orientation arithmetic (no division), so
    results are bit-reproducible against an oracle computing the same
    products on dyadic-rational coordinates."""
    d1 = _orient(ax1, ay1, ax2, ay2, bx1, by1)
    d2 = _orient(ax1, ay1, ax2, ay2, bx2, by2)
    d3 = _orient(bx1, by1, bx2, by2, ax1, ay1)
    d4 = _orient(bx1, by1, bx2, by2, ax2, ay2)
    proper = ((d1 > 0) != (d2 > 0)) & ((d3 > 0) != (d4 > 0)) & \
             (d1 != 0) & (d2 != 0) & (d3 != 0) & (d4 != 0)

    def on(dv, px_, py_, sx1, sy1, sx2, sy2):
        return (dv == 0) & (np.minimum(sx1, sx2) <= px_) & (px_ <= np.maximum(sx1, sx2)) & \
               (np.minimum(sy1, sy2) <= py_) & (py_ <= np.maximum(sy1, sy2))

    touch = (
        on(d1, bx1, by1, ax1, ay1, ax2, ay2)
        | on(d2, bx2, by2, ax1, ay1, ax2, ay2)
        | on(d3, ax1, ay1, bx1, by1, bx2, by2)
        | on(d4, ax2, ay2, bx1, by1, bx2, by2)
    )
    return proper | touch


def segs_intersect_rects(px1, py1, px2, py2, rx0, ry0, rx1, ry1) -> np.ndarray:
    """(N,) bool: probe segment i intersects closed rect i — endpoint
    containment OR any of the 4 rect edges, all exact orientation math
    (division-free, unlike Liang-Barsky)."""
    hit = ((px1 >= rx0) & (px1 <= rx1) & (py1 >= ry0) & (py1 <= ry1)) | \
          ((px2 >= rx0) & (px2 <= rx1) & (py2 >= ry0) & (py2 <= ry1))
    for ex1, ey1, ex2, ey2 in (
        (rx0, ry0, rx1, ry0), (rx1, ry0, rx1, ry1),
        (rx1, ry1, rx0, ry1), (rx0, ry1, rx0, ry0),
    ):
        hit |= _pair_seg_intersect(px1, py1, px2, py2, ex1, ey1, ex2, ey2)
    return hit


def segs_intersect_segs_any(px1, py1, px2, py2, segs: np.ndarray) -> np.ndarray:
    """(P,) bool: probe segment p intersects ANY of the (S,4) segments
    (boundary-inclusive). (P × S) orientation broadcast, reduced per
    probe."""
    P = len(px1)
    if len(segs) == 0 or P == 0:
        return np.zeros(P, dtype=bool)
    hit = _pair_seg_intersect(
        px1[:, None], py1[:, None], px2[:, None], py2[:, None],
        segs[None, :, 0], segs[None, :, 1], segs[None, :, 2], segs[None, :, 3],
    )
    return hit.any(axis=1)


def geoms_intersect(a: dict, b: dict) -> bool:
    """OGC SFS `intersects` between two geometries (Point / LineString /
    Polygon / MultiPolygon), boundary-inclusive — the engine-side analog
    of JTS `geom.intersects(subGeom)` used by Q3
    (/root/reference/AreaCityQuery.java:260-263)."""
    from . import core as _core

    if a["type"] == "Point":
        return _point_hits(a["xy"][0], a["xy"][1], b)
    if b["type"] == "Point":
        return _point_hits(b["xy"][0], b["xy"][1], a)
    sa = _segs_of(a)
    sb = _segs_of(b)
    if any_segment_intersection(sa, sb):
        return True
    # no edge crossings: containment — one's first vertex inside the other
    if a["type"] in ("Polygon", "MultiPolygon") and len(sb):
        if _point_hits(sb[0, 0], sb[0, 1], a):
            return True
    if b["type"] in ("Polygon", "MultiPolygon") and len(sa):
        if _point_hits(sa[0, 0], sa[0, 1], b):
            return True
    return False


def _segs_of(g: dict) -> np.ndarray:
    from . import core as _core

    if g["type"] == "LineString":
        xy = g["xy"]
        if len(xy) < 2:
            return np.zeros((0, 4))
        return np.hstack([xy[:-1], xy[1:]])
    return segments_of_rings(_core.all_rings(g))


def _point_hits(x: float, y: float, g: dict) -> bool:
    from . import core as _core

    px, py = np.array([x]), np.array([y])
    if g["type"] in ("Polygon", "MultiPolygon"):
        return bool(points_intersect_rings(px, py, _core.all_rings(g))[0])
    return bool(points_on_segments(px, py, _segs_of(g))[0])
