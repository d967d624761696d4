"""Douglas–Peucker simplification scaling job for `spark-submit
--py-files` — the Arrow-kernel-bound leg of the north-rule evidence
(the headline/knn/overlay legs are join-bound; this one spends its
time inside the vectorized DP kernel, so it measures how the
applyInPandas kernel path scales with cores).

Deterministic dyadic polylines: n_verts vertices split into lines of
per_line each, coordinates decorrelated multiplier lattices. Checksums
(kept rows, Σ seq, Σ line_id·rank mod 2^61, Σ scaled x+y) are exact
integer sums over the KEEP-set, which is partitioning-independent —
asserted bit-equal across parallelism legs.

Two modes:
- `clustered` (default): lines are GENERATED line-contiguous inside
  their partitions (spark.range over line ids + sequence/explode —
  the layout a trajectory store's bucketing gives for free), and the
  operator runs with assume_clustered=True: ZERO shuffle, the leg
  measures the Arrow hop + kernel.
- `general`: arbitrary row layout; the operator pays its
  repartition + sortWithinPartitions first. On this host that data
  movement is the bandwidth-bound part, so the general row is
  reported as context, not the headline.

Usage: spark-submit ... tools/submit_simplify.py [n_verts] [per_line] [eps] [mode]
"""
from __future__ import annotations

import json
import sys

from pyspark.sql import SparkSession, functions as F

from areacity_query_geometry_spark import simplify
from areacity_query_geometry_spark.hostload import TimedRuns, membw_probe_gbps


def main():
    n_verts = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    per_line = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
    eps = float(sys.argv[3]) if len(sys.argv) > 3 else 5.0
    mode = sys.argv[4] if len(sys.argv) > 4 else "clustered"
    spark = SparkSession.builder.appName("aqgs-simplify").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    cpus = spark.sparkContext.defaultParallelism

    n_lines = n_verts // per_line
    if mode == "clustered":
        # vertices generated per line INSIDE its partition: line-
        # contiguous, seq-sorted, never straddling a partition
        verts = (spark.range(n_lines).repartition(cpus * 2)
                 .selectExpr(
            "id AS line_id",
            f"explode(sequence(0, {per_line - 1})) AS seq")
            .selectExpr(
            "line_id", "seq",
            f"CAST(((line_id * {per_line} + seq) * 31"
            f" + (line_id * {per_line} + seq) DIV 2560) % 2560"
            " AS DOUBLE) / 64 AS lng",
            f"CAST(((line_id * {per_line} + seq) * 73"
            f" + (line_id * {per_line} + seq) DIV 6553600) % 2560"
            " AS DOUBLE) / 64 AS lat"))
    else:
        verts = spark.range(n_verts).selectExpr(
            f"id DIV {per_line} AS line_id",
            f"id % {per_line} AS seq",
            "CAST((id * 31 + id DIV 2560) % 2560 AS DOUBLE) / 64 AS lng",
            "CAST((id * 73 + id DIV 6553600) % 2560 AS DOUBLE) / 64 AS lat")

    def job():
        out = simplify.simplify_lines(
            verts, eps_deg=eps, assume_clustered=(mode == "clustered"))
        row = out.agg(
            F.count("*").alias("rows"),
            F.sum("seq").alias("sum_seq"),
            F.sum(F.expr("line_id * rank % 2305843009213693951"))
             .alias("sum_lr"),
            F.sum(F.expr("CAST(round(lng * 64) + round(lat * 64) AS BIGINT)"))
             .alias("sum_xy")).collect()[0]
        return {"rows": int(row["rows"]), "sum_seq": int(row["sum_seq"]),
                "sum_lr": int(row["sum_lr"]), "sum_xy": int(row["sum_xy"])}

    job()  # untimed warm pass
    membw = membw_probe_gbps()
    timed = TimedRuns()
    stats = None
    for _ in range(3):
        stats = timed.run(job)

    print(json.dumps({
        "cpus": cpus, "n_verts": n_verts, "per_line": per_line,
        "eps": eps, "mode": mode, "sec": timed.best,
        "throughput": round(n_verts / timed.best, 1),
        "membw_gbps": membw, **stats, **timed.detail(),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
