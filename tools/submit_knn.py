"""kNN point→point join scaling job for `spark-submit --py-files`.

Same methodology as tools/submit_job.py / submit_overlay.py (fresh
JVM, full untimed warm pass, best-of-3 with per-run steal% + membw
probe), measuring `knn.knn_point_join` (grid-bucketed ring expansion,
never a cross join) over deterministic dyadic lattices: N probes find
their k=3 nearest of M points by planar squared-degree distance.

Coordinates are 1/64° dyadics, so every d² is an exact dyadic and the
checksums (row count, Σd², Σ point_id·rank) are order-independent —
the bench asserts bit-exact equality across parallelism legs, the kNN
analog of the headline's hit-count check.

Usage: spark-submit ... tools/submit_knn.py [n_probes] [n_points] [res] [k]
"""
from __future__ import annotations

import json
import sys

from pyspark.sql import SparkSession, functions as F

from areacity_query_geometry_spark import knn
from areacity_query_geometry_spark.hostload import TimedRuns, membw_probe_gbps


def main():
    # res 12 measured optimal at this density (55k probes/s at local[8]
    # vs 5.5k at res 10 and 27k at res 13, 200k/1M smoke): cells hold
    # ~5 points, so round 1 sees ~40 candidates/probe and resolves
    # nearly everything (expected 3rd-neighbour radius ≈ 0.04° < the
    # 0.088° cell). Checksums are bit-identical across res choices.
    n_probes = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_points = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    res = int(sys.argv[3]) if len(sys.argv) > 3 else 12
    k = int(sys.argv[4]) if len(sys.argv) > 4 else 3
    spark = SparkSession.builder.appName("aqgs-knn").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    cpus = spark.sparkContext.defaultParallelism

    # dyadic 1/64° lattices over [0,40]² (2560 slots per axis), probe
    # and point streams decorrelated by different multipliers
    probes = spark.range(n_probes).selectExpr(
        "id AS probe_id",
        "CAST(id * 41 % 2560 AS DOUBLE) / 64 AS lng",
        "CAST(id * 67 % 2560 AS DOUBLE) / 64 AS lat")
    points = spark.range(n_points).selectExpr(
        "id AS point_id",
        "CAST((id * 53 + id DIV 2560) % 2560 AS DOUBLE) / 64 AS lng",
        "CAST((id * 89 + id DIV 6553600) % 2560 AS DOUBLE) / 64 AS lat")

    def job():
        out = knn.knn_point_join(probes, points, k=k, res=res)
        row = out.agg(
            F.count("*").alias("rows"),
            F.sum("d2").alias("sum_d2"),
            F.sum(F.expr("point_id * rank")).alias("sum_pr")).collect()[0]
        return {"rows": int(row["rows"]),
                "sum_d2": float(row["sum_d2"]),
                "sum_pr": int(row["sum_pr"])}

    job()  # untimed warm pass (JIT, codegen, shuffle services)
    membw = membw_probe_gbps()
    timed = TimedRuns()
    stats = None
    for _ in range(3):
        stats = timed.run(job)

    print(json.dumps({
        "cpus": cpus, "n_probes": n_probes, "n_points": n_points,
        "res": res, "k": k, "sec": timed.best,
        "throughput": round(n_probes / timed.best, 1),
        "membw_gbps": membw, **stats, **timed.detail(),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
