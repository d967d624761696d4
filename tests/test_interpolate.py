"""Kernel-weighted interpolation (interpolate.py): brute-force
equality on dyadic inputs, boundary-weight semantics, and the
column-passthrough seam in knn.range_point_join."""
import numpy as np
import pandas as pd

from areacity_query_geometry_spark import interpolate, knn


def _brute(probes, points, rho):
    out = {}
    for pid, px, py in probes:
        n, num, den = 0, 0.0, 0.0
        for _sid, sx, sy, v in points:
            d2 = (sx - px) ** 2 + (sy - py) ** 2
            if d2 <= rho * rho:
                n += 1
                num += v * (rho * rho - d2)
                den += rho * rho - d2
        if n:
            out[pid] = (n, num, den)
    return out


def test_matches_brute_force(spark):
    rng = np.random.RandomState(13)
    probes = [(i, rng.randint(0, 640) / 64.0, rng.randint(0, 640) / 64.0)
              for i in range(40)]
    points = [(i, rng.randint(0, 640) / 64.0, rng.randint(0, 640) / 64.0,
               float(rng.randint(0, 97)))
              for i in range(500)]
    pdf = spark.createDataFrame(
        pd.DataFrame(probes, columns=["probe_id", "lng", "lat"]))
    sdf = spark.createDataFrame(
        pd.DataFrame(points, columns=["point_id", "lng", "lat", "val"]))
    out = interpolate.kernel_interpolate(pdf, sdf, radius_deg=0.5, res=6)
    got = {r.probe_id: (r.n_samples, r.num, r.den) for r in out.collect()}
    want = _brute(probes, points, 0.5)
    # dyadic arithmetic end-to-end → exact equality, no tolerance
    assert got == want


def test_boundary_sample_counts_but_weighs_zero(spark):
    # one sample exactly at d = rho: included in n_samples, weight 0
    pdf = spark.createDataFrame([(1, 10.0, 10.0)],
                                "probe_id long, lng double, lat double")
    sdf = spark.createDataFrame(
        [(1, 10.5, 10.0, 7.0), (2, 10.25, 10.0, 3.0)],
        "point_id long, lng double, lat double, val double")
    rows = interpolate.kernel_interpolate(pdf, sdf, 0.5, res=6).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.n_samples == 2
    assert r.den == 0.25 - 0.0625          # only the interior sample
    assert r.num == 3.0 * (0.25 - 0.0625)


def test_range_join_passthrough_columns(spark):
    pdf = spark.createDataFrame([(1, 5.0, 5.0)],
                                "probe_id long, lng double, lat double")
    sdf = spark.createDataFrame(
        [(9, 5.125, 5.0, 42.0)],
        "point_id long, lng double, lat double, val double")
    rows = knn.range_point_join(pdf, sdf, 0.5, res=6,
                                point_cols=("val",)).collect()
    assert [(r.probe_id, r.point_id, r.d2, r.val) for r in rows] \
        == [(1, 9, 0.015625, 42.0)]
