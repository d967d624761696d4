"""Resumable checkpointed execution of the docs↔regions join.

North-rule capability (not in the reference — its nearest analog is the
wkbs fast-start cache, /root/reference/AreaCityQuery.java:663-669): the
probe space is split into deterministic buckets by doc_id hash; each
bucket is joined and written as its own partition of the output
(idempotent per-bucket overwrite), and a lineage row
(run_id, bucket, rows_in, rows_matched, duration_ms, status) is
appended to a checkpoint table. A rerun reads the checkpoint, skips
completed buckets, and produces byte-identical output.

At cluster scale each bucket is a full distributed job over 1/Nth of
the documents — bucket count trades restart granularity against
scheduling overhead (64–1024 for a 10^12-doc table).
"""
from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F

CHECKPOINT_SCHEMA = (
    "run_id string, bucket int, rows_in long, rows_matched long, "
    "duration_ms long, status string"
)


def _bucket_expr(n_buckets: int):
    return F.pmod(F.xxhash64("doc_id"), F.lit(n_buckets)).cast("int")


def completed_buckets(spark: SparkSession, checkpoint_dir: str) -> set[int]:
    if not os.path.exists(checkpoint_dir):
        return set()
    try:
        df = spark.read.schema(CHECKPOINT_SCHEMA).parquet(checkpoint_dir)
    except Exception:
        return set()
    rows = df.filter(F.col("status") == "done").select("bucket").distinct().collect()
    return {r.bucket for r in rows}


def run_checkpointed_geo_join(
    engine,
    docs: DataFrame,
    out_dir: str,
    n_buckets: int = 16,
    run_id: str | None = None,
    where: str | None = None,
    fail_after_bucket: int | None = None,
    files_per_bucket: int = 1,
) -> str:
    """Execute the span-preserving docs→regions join bucket by bucket.

    Output: parquet partitioned by bucket under ``out_dir/data``;
    lineage under ``out_dir/checkpoint``. Returns the run_id.
    ``fail_after_bucket`` injects a crash after N completed buckets
    (used by the resume test)."""
    from .. import docs as docsmod

    spark = docs.sparkSession
    run_id = run_id or uuid.uuid4().hex[:12]
    data_dir = os.path.join(out_dir, "data")
    ckpt_dir = os.path.join(out_dir, "checkpoint")
    done = completed_buckets(spark, ckpt_dir)

    bucketed = docs.withColumn("bucket", _bucket_expr(n_buckets))
    for b in range(n_buckets):
        if b in done:
            continue
        t0 = time.time()
        part = bucketed.filter(F.col("bucket") == b).drop("bucket")
        rows_in = part.count()
        joined = docsmod.join_docs_to_regions(engine, part, where=where)
        # idempotent per-bucket overwrite: a crashed bucket is rewritten
        # whole on retry, never appended twice. files_per_bucket=1 gives
        # byte-identical resume output at test scale; at cluster scale
        # raise it (output stays deterministic per file: hash partition
        # by doc_id + sort within)
        (joined.withColumn("bucket", F.lit(b))
               .repartition(files_per_bucket, "doc_id")
               .sortWithinPartitions("doc_id")
               .write.mode("overwrite")
               .parquet(os.path.join(data_dir, f"bucket={b}")))
        rows_matched = joined.filter(F.col("regions").isNotNull()).count()
        lineage = spark.createDataFrame(
            [(run_id, b, rows_in, rows_matched,
              int((time.time() - t0) * 1000), "done")],
            CHECKPOINT_SCHEMA,
        )
        lineage.coalesce(1).write.mode("append").parquet(ckpt_dir)
        if fail_after_bucket is not None and b >= fail_after_bucket:
            raise RuntimeError(f"injected failure after bucket {b}")
    # run-level manifest
    with open(os.path.join(out_dir, "_manifest.json"), "w") as f:
        json.dump({"run_id": run_id, "n_buckets": n_buckets, "where": where}, f)
    return run_id


def read_result(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.option("basePath", os.path.join(out_dir, "data")) \
        .parquet(os.path.join(out_dir, "data"))


def read_lineage(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.schema(CHECKPOINT_SCHEMA).parquet(
        os.path.join(out_dir, "checkpoint"))
