"""Q3 geometry-intersects scaling job for `spark-submit --py-files`.

Same methodology as tools/submit_q2.py (fresh JVM, full untimed warm
pass, best-of-3 with per-run steal% + membw probe), measuring
`SpatialEngine.query_geometry` — the reference's QueryGeometry
(/root/reference/AreaCityQuery.java:179-309) — through the r4
BROADCAST-INDEX refine (zero shuffle Exchanges: decomposition, cover,
CSR candidate lookup, kernels and dedup in one mapInPandas) at the
reference-density boundary set (fixtures_dense: 3,502 nested
prov/city/district features, ~732k ring points).

Probes: a deterministic lattice of WKT geometries over the bbox
EXPANDED by 1° on every side, cycling rect / line / diamond by
probe_id so rect-overlap, segment-crossing, containment (pkind 3) and
miss regimes all fire. Each probe spans ~0.15° (≈3-4 res-13 cells per
axis). Checksums are order-independent and asserted bit-equal across
parallelism legs by tools/q3_bench.py:
  rows      — (probe, region) hit count
  hit_hash  — Σ xxhash64(probe_id, region_id) as DECIMAL(38,0)

Usage: spark-submit ... tools/submit_q3.py [n_probes] [base_res]
"""
from __future__ import annotations

import json
import sys

from pyspark.sql import SparkSession, functions as F

from areacity_query_geometry_spark.engine import SpatialEngine
from areacity_query_geometry_spark.hostload import TimedRuns, membw_probe_gbps


def main():
    n_probes = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    base_res = int(sys.argv[2]) if len(sys.argv) > 2 else 13
    spark = SparkSession.builder.appName("aqgs-q3").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    cpus = spark.sparkContext.defaultParallelism

    from areacity_query_geometry_spark import fixtures_dense

    geojson_path = fixtures_dense.ensure()  # cached; untimed
    build = TimedRuns()
    eng = build.run(lambda: SpatialEngine.from_geojson(
        spark, geojson_path, base_res=base_res))
    assert eng._boundary_index() is not None \
        and eng._interior_index() is not None, \
        "dense set must fit the index budgets (this bench measures " \
        "the broadcast-index path)"

    # WKT probe lattice over [72,136]×[17,55] — 1° beyond the dense
    # set's warped bbox; kind = probe_id % 3 cycles rect / line /
    # diamond, each ~0.15° across (a few res-13 cells per axis)
    probes = spark.range(n_probes).selectExpr(
        "id AS probe_id",
        "72.0 + CAST(id * 37 % 64000 AS DOUBLE) / 1000.0 AS x",
        "17.0 + CAST(id * 101 % 38000 AS DOUBLE) / 1000.0 AS y",
    ).selectExpr(
        "probe_id",
        """CASE CAST(probe_id % 3 AS INT)
           WHEN 0 THEN concat('POLYGON ((', x, ' ', y, ', ', x + 0.15,
               ' ', y, ', ', x + 0.15, ' ', y + 0.15, ', ', x, ' ',
               y + 0.15, ', ', x, ' ', y, '))')
           WHEN 1 THEN concat('LINESTRING (', x, ' ', y, ', ',
               x + 0.15, ' ', y + 0.15, ')')
           ELSE concat('POLYGON ((', x, ' ', y + 0.075, ', ',
               x + 0.075, ' ', y + 0.15, ', ', x + 0.15, ' ',
               y + 0.075, ', ', x + 0.075, ' ', y, ', ', x, ' ',
               y + 0.075, '))')
           END AS wkt""")

    def checksums() -> dict:
        out = eng.query_geometry(probes, with_props=False)
        row = out.agg(
            F.count(F.lit(1)).alias("rows"),
            F.expr("sum(CAST(xxhash64(probe_id, region_id) "
                   "AS DECIMAL(38,0)))").alias("hit_hash"),
        ).collect()[0]
        return {"rows": int(row["rows"]),
                "hit_hash": int(row["hit_hash"] or 0)}

    checksums()  # full untimed warm pass (index build + JIT + workers)
    membw = membw_probe_gbps()
    timed = TimedRuns()
    sums: dict = {}
    for _ in range(3):
        sums = timed.run(checksums)

    print(json.dumps({
        "cpus": cpus, "n": n_probes, "base_res": base_res,
        "sec": timed.best,
        "throughput": round(n_probes / timed.best, 1),
        "build_sec": build.best, "membw_gbps": membw,
        **sums, **timed.detail(),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
