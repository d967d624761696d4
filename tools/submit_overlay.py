"""Overlay-area join scaling job for `spark-submit --py-files`.

Same methodology as tools/submit_job.py (fresh JVM, full untimed warm
pass, best-of-3 with per-run steal% + membw probe), measuring
`overlay.overlay_rect_area` over the reference-density boundary set
(fixtures_dense: 3,502 nested prov/city/district features): N windows
of 0.25–0.75°, each returning the EXACT area of intersection with
every overlapping region at all 3 admin levels.

Because the dense fixture is a watertight 3-level PARTITION, the sum
of district areas == sum of city areas == sum of province areas ==
the total window area for interior windows — the job reports per-deep
row counts and area sums so the bench can assert that invariant and
cross-leg (N vs 4N) equality, the overlay analog of the headline's
hit-count check.

Usage: spark-submit ... tools/submit_overlay.py [n_windows] [base_res]
"""
from __future__ import annotations

import json
import sys

from pyspark.sql import SparkSession, functions as F

from areacity_query_geometry_spark import fixtures_dense, overlay
from areacity_query_geometry_spark.engine import SpatialEngine
from areacity_query_geometry_spark.hostload import TimedRuns, membw_probe_gbps


def main():
    # base_res 9 ≈ 8 > 10 ≫ 13 measured at 100k windows on local[8]
    # (7.8k/s vs 7.9k vs 5.2k vs 0.5k): windows this size want coarse
    # cover cells — the CSR clip kernel amortizes boundary tiles far
    # better than the cover join amortizes 16× more interior rows.
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    base_res = int(sys.argv[2]) if len(sys.argv) > 2 else 9
    spark = SparkSession.builder.appName("aqgs-overlay").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    cpus = spark.sparkContext.defaultParallelism

    geojson_path = fixtures_dense.ensure()  # cached; untimed
    build = TimedRuns()
    eng = build.run(lambda: SpatialEngine.from_geojson(
        spark, geojson_path, base_res=base_res))

    # windows strictly interior to the warped extent (the displacement
    # field moves boundaries < 0.3°, so [74.5,131.25]×[19.5,50.25] is
    # safely inside) — every window's area splits EXACTLY across each
    # admin level. Dyadic corners/widths keep per-tile contributions
    # reproducible; the fixture itself is curved, so cross-leg area
    # equality is asserted to 1e-9 relative, row counts exactly.
    wins = spark.range(n).selectExpr(
        "id AS probe_id",
        "73.5 + CAST(id * 37 % 58368 AS DOUBLE) / 1024 AS x0",
        "19.5 + CAST(id * 101 % 30720 AS DOUBLE) / 1024 AS y0",
    ).selectExpr(
        "probe_id", "x0", "y0",
        "x0 + 0.25 + CAST(probe_id * 7 % 512 AS DOUBLE) / 1024 AS x1",
        "y0 + 0.25 + CAST(probe_id * 11 % 512 AS DOUBLE) / 1024 AS y1")

    deep = F.broadcast(eng.boundaries.select("region_id", "deep"))

    def job():
        out = overlay.overlay_rect_area(eng, wins)
        rows = (out.join(deep, "region_id")
                .groupBy("deep")
                .agg(F.count("*").alias("pairs"),
                     F.sum("area").alias("area"))
                .collect())
        return {int(r["deep"]): (int(r["pairs"]), float(r["area"]))
                for r in rows}

    job()  # full untimed warm pass (dense tile working set, JIT, codegen)
    membw = membw_probe_gbps()
    timed = TimedRuns()
    stats = None
    for _ in range(3):
        stats = timed.run(job)

    print(json.dumps({
        "cpus": cpus, "n": n, "base_res": base_res, "sec": timed.best,
        "throughput": round(n / timed.best, 1),
        "build_sec": build.best, "membw_gbps": membw,
        "pairs_by_deep": {str(k): v[0] for k, v in sorted(stats.items())},
        "area_by_deep": {str(k): round(v[1], 6)
                         for k, v in sorted(stats.items())},
        **timed.detail(),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
