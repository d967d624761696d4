"""MinHash+LSH near-dup scaling job for `spark-submit --py-files`.

Same methodology as tools/submit_job.py / submit_knn.py / submit_q2.py
(fresh JVM, full untimed warm pass, best-of-3 with per-run steal% +
membw probe), measuring the SAME pipeline the oracle gate runs
(pipeline/minhash.py::near_dup_sql — shingle → one-pass 16-way min-agg
→ banded bucket join → exact Jaccard verify) over a deterministic
synthetic corpus with controlled near-duplicate structure:

  docs come in clusters of 8 sharing a 50-word template; each variant
  rewrites the ~6 positions where j % 8 == doc_id % 8 with a
  doc-unique token, so within-cluster Jaccard sits around 0.6-0.75 —
  the regime LSH banding is built for. All tokens derive from integer
  arithmetic on doc_id; the corpus is bit-identical at any parallelism.

Checksums (order-independent, asserted bit-equal across legs by
tools/dedup_bench.py): pair count, Σ xxhash64(d1, d2) as decimal, and
Σ round(jaccard·10⁴) (each jaccard is an exact ratio of integer
shingle counts rounded once — partitioning cannot move it).

Usage: spark-submit ... tools/submit_dedup.py [n_docs]
"""
from __future__ import annotations

import json
import sys

from pyspark.sql import SparkSession, functions as F

from areacity_query_geometry_spark.hostload import TimedRuns, membw_probe_gbps
from areacity_query_geometry_spark.pipeline import minhash


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    spark = SparkSession.builder.appName("aqgs-dedup").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    cpus = spark.sparkContext.defaultParallelism

    spark.range(n_docs).selectExpr(
        "id AS doc_id",
        """array_join(transform(sequence(0, 49), j ->
             CASE WHEN pmod(j, 8) = pmod(id, 8)
                  THEN concat('x', CAST(id AS STRING), '_', CAST(j AS STRING))
                  ELSE concat('w', CAST(pmod((id DIV 8) * 1009 + j * 131,
                                             50000) AS STRING))
             END), ' ') AS text""",
    ).createOrReplaceTempView("bench_docs")

    def checksums() -> dict:
        out = spark.sql(minhash.near_dup_sql("bench_docs"))
        row = out.agg(
            F.count(F.lit(1)).alias("pairs"),
            F.expr("sum(CAST(xxhash64(d1, d2) AS DECIMAL(38,0)))")
             .alias("pair_hash"),
            F.expr("sum(CAST(round(jaccard * 10000) AS DECIMAL(38,0)))")
             .alias("jacc_sum"),
        ).collect()[0]
        return {"pairs": int(row["pairs"]),
                "pair_hash": int(row["pair_hash"] or 0),
                "jacc_sum": int(row["jacc_sum"] or 0)}

    checksums()  # full untimed warm pass
    # no-silent-caps: report how many (band, bsig) buckets exceeded the
    # hot-bucket guard and degraded to the star expansion (0 on this
    # corpus — clusters of 8 sit far below MAX_BUCKET)
    capped = spark.sql(minhash.capped_buckets_sql("bench_docs")).count()
    membw = membw_probe_gbps()
    timed = TimedRuns()
    sums: dict = {}
    for _ in range(3):
        sums = timed.run(checksums)

    print(json.dumps({
        "cpus": cpus, "n": n_docs, "sec": timed.best,
        "throughput": round(n_docs / timed.best, 1),
        "membw_gbps": membw, "capped_buckets": capped,
        **sums, **timed.detail(),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
