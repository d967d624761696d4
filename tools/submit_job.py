"""Headline point-lookup job for `spark-submit --py-files` (north rule).

The engine package ships as a zip on --py-files — exactly how the job
reaches a real multi-executor cluster — and is imported from there (the
scaling bench runs this from a neutral cwd so the zip is the ONLY
source of the package). Master/parallelism/memory come from the
spark-submit command line, e.g.:

    spark-submit --master "local[8]" \
        --conf spark.sql.shuffle.partitions=8 \
        --driver-memory 60g \
        --py-files dist/areacity_query_geometry_spark.zip \
        tools/submit_job.py 100000000

Prints ONE JSON line: {"cpus": ..., "n": ..., "sec": ..., "throughput":
..., "hits": ...} (best of 3 steady-state runs, matching the
reference's steady-state QPS methodology, Test.java:437-603).
"""
from __future__ import annotations

import json
import sys
import time

from pyspark.sql import SparkSession, functions as F

from areacity_query_geometry_spark.engine import SpatialEngine

GEOJSON = "/root/reference/仅供测试-全国省级GeoJSON数据-大幅简化粗略版.json"


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    spark = SparkSession.builder.appName("aqgs-submit").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    cpus = spark.sparkContext.defaultParallelism

    eng = SpatialEngine.from_geojson(spark, GEOJSON, base_res=13)
    probes = spark.range(n).select(
        F.col("id").alias("point_id"),
        (73.0 + (F.col("id") * 37 % 62000) / 1000.0).alias("lng"),
        (18.0 + (F.col("id") * 101 % 36000) / 1000.0).alias("lat"),
    )
    eng.query_points(probes.sample(0.02, seed=1), with_props=False).count()  # warm
    best = None
    hits = 0
    for _ in range(3):
        t0 = time.time()
        hits = eng.query_points(probes, with_props=False).count()
        dt = time.time() - t0
        best = dt if best is None or dt < best else best
    print(json.dumps({"cpus": cpus, "n": n, "sec": round(best, 3),
                      "throughput": round(n / best, 1), "hits": hits}))
    spark.stop()


if __name__ == "__main__":
    main()
