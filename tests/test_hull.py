"""Distributed convex hull (hull.py): exactness vs an independent
brute-force oracle, canonical order, degenerate inputs, and
partitioning invariance (the map-side-combine identity)."""
import numpy as np
import pandas as pd
import pytest

from areacity_query_geometry_spark import hull


def _brute_hull(px, py):
    """Independent O(n^3) oracle: a point is a STRICT hull vertex iff
    some closed half-plane through it contains all points with no
    other point on its boundary line... simpler: walk gift-wrap with
    plain python. Returns CCW ring starting at lex min."""
    pts = sorted(set(zip(px, py)))
    if len(pts) <= 2:
        return pts
    start = pts[0]
    ring = [start]
    cur = start
    while True:
        nxt = None
        for p in pts:
            if p == cur:
                continue
            if nxt is None:
                nxt = p
                continue
            cr = (nxt[0] - cur[0]) * (p[1] - cur[1]) \
                - (nxt[1] - cur[1]) * (p[0] - cur[0])
            if cr < 0:  # p strictly right of cur→nxt: nxt wasn't the
                nxt = p  # CCW extreme (CCW keeps all points LEFT)
            elif cr == 0:  # collinear: take the farther (strict hull)
                dn = (nxt[0] - cur[0]) ** 2 + (nxt[1] - cur[1]) ** 2
                dp = (p[0] - cur[0]) ** 2 + (p[1] - cur[1]) ** 2
                if dp > dn:
                    nxt = p
        if nxt is None or nxt == start:
            break
        ring.append(nxt)
        cur = nxt
    return ring


def _spark_hull(spark, rows, n_parts=4):
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["group_id", "lng", "lat"])
    ).repartition(n_parts)
    out = hull.convex_hull(df)
    pdf = out.toPandas().sort_values(["group_id", "rank"])
    res = {}
    for g, grp in pdf.groupby("group_id"):
        assert list(grp["rank"]) == list(range(len(grp)))
        res[g] = list(zip((grp["lng"] * 64).round().astype(int),
                          (grp["lat"] * 64).round().astype(int)))
    return res


def _mk_rows(g, ixy):
    return [(g, x / 64.0, y / 64.0) for x, y in ixy]


def test_hull_matches_brute_force_random(spark):
    rng = np.random.RandomState(7)
    rows = []
    expect = {}
    for gi in range(4):
        g = f"g{gi}"
        n = int(rng.randint(5, 400))
        ix = rng.randint(0, 2560, n)
        iy = rng.randint(0, 2560, n)
        rows += _mk_rows(g, zip(ix.tolist(), iy.tolist()))
        expect[g] = _brute_hull(ix.tolist(), iy.tolist())
    got = _spark_hull(spark, rows)
    assert got == expect


@pytest.mark.parametrize("n_parts", [1, 3, 13])
def test_hull_partitioning_invariance(spark, n_parts):
    rng = np.random.RandomState(11)
    ix = rng.randint(0, 512, 300)
    iy = rng.randint(0, 512, 300)
    rows = _mk_rows("g", zip(ix.tolist(), iy.tolist()))
    got = _spark_hull(spark, rows, n_parts=n_parts)
    assert got["g"] == _brute_hull(ix.tolist(), iy.tolist())


def test_hull_degenerate_groups(spark):
    rows = (
        _mk_rows("single", [(5, 9)])
        + _mk_rows("pair", [(1, 2), (9, 1)])
        + _mk_rows("dup", [(3, 3)] * 7)
        + _mk_rows("collinear", [(i, 2 * i) for i in range(9)])
        + _mk_rows("square_with_edge_points",
                   [(0, 0), (8, 0), (8, 8), (0, 8), (4, 0), (0, 4),
                    (4, 4), (8, 4)])
    )
    got = _spark_hull(spark, rows)
    assert got["single"] == [(5, 9)]
    assert got["pair"] == [(1, 2), (9, 1)]
    assert got["dup"] == [(3, 3)]
    assert got["collinear"] == [(0, 0), (8, 16)]
    # strictly convex: edge-interior collinear points dropped, CCW
    assert got["square_with_edge_points"] == [(0, 0), (8, 0), (8, 8), (0, 8)]


def test_octagon_filter_keeps_all_hull_vertices():
    rng = np.random.RandomState(3)
    for trial in range(50):
        n = int(rng.randint(3, 200))
        px = rng.randint(-1000, 1000, n).astype(np.int64)
        py = rng.randint(-1000, 1000, n).astype(np.int64)
        mask = hull._octagon_filter(px, py)
        kept = set(zip(px[mask].tolist(), py[mask].tolist()))
        for v in _brute_hull(px.tolist(), py.tolist()):
            assert v in kept, (trial, v)


def test_chain_on_circle_fallback():
    # all points in convex position: the filter keeps everything and
    # the chain must still return the full ring
    ang = np.linspace(0, 2 * np.pi, 24, endpoint=False)
    px = np.round(1000 * np.cos(ang)).astype(np.int64)
    py = np.round(1000 * np.sin(ang)).astype(np.int64)
    hx, hy = hull._chain(px, py)
    assert set(zip(hx.tolist(), hy.tolist())) \
        == set(zip(px.tolist(), py.tolist()))
