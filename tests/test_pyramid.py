"""Cell pyramid rollup (pyramid.py): level-by-level coarsening must
equal direct aggregation from raw at every level (the reassociation
identity), including negative coordinates; floor-vs-shift semantics
pinned."""
import numpy as np
import pandas as pd
import pytest

from areacity_query_geometry_spark import pyramid


def _direct(pts, res):
    w = 360.0 / (1 << res)
    agg = {}
    for x, y, v in pts:
        c = (int(np.floor(x / w)), int(np.floor(y / w)))
        n, s = agg.get(c, (0, 0))
        agg[c] = (n + 1, s + v)
    return agg


@pytest.mark.parametrize("n_parts", [1, 6])
def test_pyramid_equals_direct_aggregation(spark, n_parts):
    rng = np.random.RandomState(37)
    pts = [(rng.randint(-2560, 2560) / 64.0,
            rng.randint(-2560, 2560) / 64.0,
            int(rng.randint(0, 97))) for _ in range(2000)]
    df = spark.createDataFrame(
        pd.DataFrame(pts, columns=["lng", "lat", "val"])
    ).repartition(n_parts)
    out = pyramid.cell_pyramid(df, finest_res=8, coarser=(6, 4),
                               value_col="val")
    got = {}
    for r in out.collect():
        got.setdefault(r.res, {})[(r.cell_x, r.cell_y)] = \
            (r.n_points, r.sum_val)
    for res in (8, 6, 4):
        assert got[res] == _direct(pts, res), res
    # per-level totals conserve
    for res in (6, 4):
        assert sum(n for n, _ in got[res].values()) == len(pts)
        assert sum(s for _, s in got[res].values()) \
            == sum(v for _, _, v in pts)


def test_pyramid_without_values(spark):
    df = spark.createDataFrame(
        [(0.5, 0.5), (0.7, 0.5), (-0.5, -0.5)], "lng double, lat double")
    out = pyramid.cell_pyramid(df, finest_res=2, coarser=(1,))
    rows = {(r.res, r.cell_x, r.cell_y): r.n_points for r in out.collect()}
    # res 2: width 90 → cells (0,0) and (-1,-1)
    assert rows[(2, 0, 0)] == 2
    assert rows[(2, -1, -1)] == 1
    # res 1: width 180 → floor coarsening keeps the negative cell at -1
    assert rows[(1, 0, 0)] == 2
    assert rows[(1, -1, -1)] == 1


def test_rejects_non_descending_levels(spark):
    df = spark.createDataFrame([(0.5, 0.5)], "lng double, lat double")
    with pytest.raises(ValueError):
        pyramid.cell_pyramid(df, finest_res=4, coarser=(4,)).collect()
