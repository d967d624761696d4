"""Reference-EXECUTION parity: the unmodified reference Java engine
(compiled in /tmp from /root/reference + its bundled JTS jar, driven as
a black-box oracle) answers the same probes as the Spark engine on the
reference's own committed province fixture, and every answer is diffed.

Full-scale sweep + report: `python tools/reference_parity.py`
(REFPARITY.md). These tests run reduced lattices of the same legs:

  QueryPoint               /root/reference/AreaCityQuery.java:87
  QueryPointWithTolerance  /root/reference/AreaCityQuery.java:102
  QueryGeometry            /root/reference/AreaCityQuery.java:179
"""
import os
import shutil
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))
import reference_parity as rp  # noqa: E402

pytestmark = pytest.mark.skipif(
    shutil.which("javac") is None or shutil.which("java") is None,
    reason="JDK not available")


@pytest.fixture(scope="module")
def oracle():
    rp.compile_oracle()


class TestReferenceParity:
    def test_query_point_hit_sets_identical(self, oracle, spark,
                                            province_engine):
        pts = rp.lattice(1.0)  # 2,470 probes across the padded bbox
        ref, _ = rp.run_oracle(
            "point", [f"{i}\t{lng!r}\t{lat!r}" for i, lng, lat in pts])
        mine = rp.spark_points(spark, province_engine, pts)
        assert mine == ref

    def test_tolerance_2500m_exact_including_distance_text(
            self, oracle, spark, province_engine):
        # at the reference's own headline tolerance (Test.java:323) the
        # two engines' "0.00"-formatted distances agree EXACTLY on the
        # full sweep (REFPARITY.md) — assert that here on a sub-lattice
        pts = rp.lattice(2.0)
        ref, _ = rp.run_oracle(
            "tolerance", [f"{i}\t{lng!r}\t{lat!r}" for i, lng, lat in pts],
            tol=2500)
        mine = rp.spark_tolerance(spark, province_engine, pts, 2500)
        assert mine == ref

    def test_tolerance_25km_hit_sets_and_one_sided_distance(
            self, oracle, spark, province_engine):
        # at 25 km the engines may disagree on distance TEXT (this
        # engine's finer tiling yields a denser candidate set — see
        # REFPARITY.md's ground-truth adjudication) but never on the
        # hit-set, and our distance must never exceed the reference's:
        # a larger value would mean a candidate the reference found
        # and we missed.
        pts = rp.lattice(1.0)
        ref, _ = rp.run_oracle(
            "tolerance", [f"{i}\t{lng!r}\t{lat!r}" for i, lng, lat in pts],
            tol=25000)
        mine = rp.spark_tolerance(spark, province_engine, pts, 25000)
        leg = rp.compare("tol25km", ref, mine, dist_mode=True)
        assert leg["hitset_mismatches"] == 0
        assert leg["ours_larger_m"] <= 0.01
        # the divergences are the documented rare case, not the norm
        assert leg["distance_text_mismatches"] <= len(pts) * 0.005

    def test_query_geometry_hit_sets_identical(self, oracle, spark,
                                               province_engine):
        probes = rp.geom_probes(2.0)  # rect / line / diamond cycle
        ref, _ = rp.run_oracle(
            "geometry", [f"{i}\t{wkt}" for i, wkt in probes])
        mine = rp.spark_geometry(spark, province_engine, probes)
        assert mine == ref
