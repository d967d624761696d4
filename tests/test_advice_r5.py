"""Round-5 ADVICE hardening: each low-severity advisory item gets a
regression test — non-string hull group columns, reserved point_cols
rejection in range_point_join, grid-cluster key-stride aliasing guard,
and the simplify tolerance-quantization warning.
"""
from __future__ import annotations

import warnings

import pytest
from pyspark.sql import functions as F

from areacity_query_geometry_spark import cluster, hull, knn, simplify


def test_convex_hull_long_group_column(spark):
    # ADVICE: hardcoded 'g string' broke long group ids at Arrow
    # conversion — the intermediate schema must carry the caller's type
    pts = spark.createDataFrame(
        [(7, 0.0, 0.0), (7, 1.0, 0.0), (7, 1.0, 1.0), (7, 0.0, 1.0),
         (7, 0.5, 0.5),
         (9, 2.0, 2.0), (9, 3.0, 2.0), (9, 2.0, 3.0)],
        "region long, lng double, lat double")
    out = hull.convex_hull(pts, group_col="region").collect()
    assert out and all(isinstance(r["region"], int) for r in out)
    by_g = {}
    for r in out:
        by_g.setdefault(r["region"], []).append((r["lng"], r["lat"]))
    assert len(by_g[7]) == 4  # interior point dropped
    assert len(by_g[9]) == 3


def test_range_point_join_rejects_reserved_point_cols(spark):
    probes = spark.createDataFrame([(1, 0.0, 0.0)],
                                   "probe_id long, lng double, lat double")
    pts = spark.createDataFrame([(1, 0.1, 0.1, 5.0)],
                                "point_id long, lng double, lat double,"
                                " rho double")
    with pytest.raises(ValueError, match="collide with internal"):
        knn.range_point_join(probes, pts, 0.5, point_cols=("rho",))


def test_grid_clusters_key_stride_guard(spark):
    # indices at ±8 with stride 16 sit exactly on the aliasing boundary
    pts = spark.createDataFrame(
        [(float(s * 8.5), float(s * 8.5)) for s in (1, -1) for _ in range(3)],
        "lng double, lat double")
    with pytest.raises(ValueError, match="key_stride"):
        cluster.grid_density_clusters(pts, cell_deg=1.0, min_pts=1,
                                      key_stride=16)
    # a sufficient stride on the same data succeeds
    ok = cluster.grid_density_clusters(pts, cell_deg=1.0, min_pts=1,
                                       key_stride=64).collect()
    assert len(ok) == 2


def test_simplify_sub_lattice_eps_warns(spark):
    verts = spark.createDataFrame(
        [(1, i, float(i), 0.0) for i in range(4)],
        "line_id long, seq long, lng double, lat double")
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        out = simplify.simplify_lines(verts, eps_deg=1e-6).collect()
    assert any("quantizes to 0" in str(x.message) for x in w)
    # eps snapped to 0: collinear interior vertices still drop
    assert {r["seq"] for r in out} == {0, 3}
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        simplify.simplify_lines(verts, eps_deg=0.5).collect()
    assert not any("quantizes" in str(x.message) for x in w)
