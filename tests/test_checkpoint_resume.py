"""Resume test (north rule / FIXTURES.md §4): kill a run mid-join,
rerun, assert completed buckets are skipped and the final output is
identical to an uninterrupted run."""
import shutil

import pytest
from pyspark.sql import functions as F

from areacity_query_geometry_spark import docs as docsmod
from areacity_query_geometry_spark.pipeline import checkpoint as ckpt


@pytest.fixture(scope="module")
def docs_df(spark):
    return docsmod.generate_docs(spark, n_docs=200, seed=11).cache()


def _canon(df):
    rows = df.select("doc_id", "spans", "regions").collect()
    return sorted((r.doc_id, str(r.spans), str(r.regions)) for r in rows)


def test_resume_after_crash(tmp_path, spark, province_engine, docs_df):
    straight = str(tmp_path / "straight")
    resumed = str(tmp_path / "resumed")

    # uninterrupted run
    ckpt.run_checkpointed_geo_join(province_engine, docs_df, straight, n_buckets=6)
    want = _canon(ckpt.read_result(spark, straight))

    # crashed run: fails after bucket 2
    with pytest.raises(RuntimeError, match="injected failure"):
        ckpt.run_checkpointed_geo_join(
            province_engine, docs_df, resumed, n_buckets=6, fail_after_bucket=2,
            run_id="run-a",
        )
    done_before = ckpt.completed_buckets(spark, resumed + "/checkpoint")
    assert done_before == {0, 1, 2}

    # resume: must process ONLY buckets 3..5
    ckpt.run_checkpointed_geo_join(
        province_engine, docs_df, resumed, n_buckets=6, run_id="run-b")
    lineage = ckpt.read_lineage(spark, resumed)
    by_run = {r["run_id"]: r["cnt"] for r in
              lineage.groupBy("run_id").agg(F.count("*").alias("cnt")).collect()}
    assert by_run == {"run-a": 3, "run-b": 3}

    got = _canon(ckpt.read_result(spark, resumed))
    assert got == want


def test_lineage_row_counts(tmp_path, spark, province_engine, docs_df):
    out = str(tmp_path / "lineage")
    ckpt.run_checkpointed_geo_join(province_engine, docs_df, out, n_buckets=4)
    lin = ckpt.read_lineage(spark, out)
    assert lin.count() == 4
    total_in = lin.agg(F.sum("rows_in")).collect()[0][0]
    assert total_in == docs_df.count()
    assert lin.filter(F.col("status") != "done").count() == 0
    assert lin.filter(F.col("duration_ms") < 0).count() == 0
