"""Stream↔stream interval join (streaming/join_stream.py).

The gate (stream_interval_join_gate) hash-checks single-batch
semantics against the DuckDB batch interval join; these tests cover
what the gate cannot: cross-micro-batch matching (the buffered-state
property that makes it a STREAM join), the interval bounds, and the
batch-DF guard.
"""
import os

import pytest

from areacity_query_geometry_spark.streaming import join_stream

H = 3600


def _write_file(spark, tmp_path, src, name, rows, schema):
    df = spark.createDataFrame(rows, schema)
    stage = str(tmp_path / ("s_" + name))
    df.coalesce(1).write.mode("overwrite").parquet(stage)
    part = [f for f in os.listdir(stage) if f.endswith(".parquet")][0]
    os.makedirs(src, exist_ok=True)
    os.rename(os.path.join(stage, part), os.path.join(src, name + ".parquet"))


V_SCHEMA = "view_id long, user_id long, view_ts timestamp"
C_SCHEMA = "click_id long, user_id long, click_ts timestamp"


def _ts(epoch):
    import datetime
    return datetime.datetime.utcfromtimestamp(epoch)


def _run(spark, vsrc, csrc, ckpt, sink):
    views = spark.readStream.schema(V_SCHEMA).parquet(vsrc)
    clicks = spark.readStream.schema(C_SCHEMA).parquet(csrc)
    out = join_stream.stream_interval_join(
        views, clicks, key="user_id", left_ts="view_ts",
        right_ts="click_ts", max_lag="1 hour", watermark="2 hours")
    q = (out.writeStream.format("parquet").option("path", sink)
         .outputMode("append").option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination()
    return sorted((r.user_id, r.view_id, r.click_id)
                  for r in spark.read.parquet(sink).collect())


class TestStreamIntervalJoin:
    def test_interval_bounds_single_batch(self, spark, tmp_path):
        vsrc, csrc = str(tmp_path / "v"), str(tmp_path / "c")
        _write_file(spark, tmp_path, vsrc, "a",
                    [(1, 7, _ts(1000)), (2, 8, _ts(5000))], V_SCHEMA)
        _write_file(spark, tmp_path, csrc, "a",
                    [(10, 7, _ts(1000)),          # lag 0: inclusive
                     (11, 7, _ts(1000 + H)),      # lag = max_lag: inclusive
                     (12, 7, _ts(1000 + H + 1)),  # beyond: dropped
                     (13, 7, _ts(999)),           # before the view: dropped
                     (14, 8, _ts(5003)),          # other key
                     (15, 9, _ts(1000))],         # unmatched key
                    C_SCHEMA)
        got = _run(spark, vsrc, csrc,
                   str(tmp_path / "ck"), str(tmp_path / "out"))
        assert got == [(7, 1, 10), (7, 1, 11), (8, 2, 14)]

    def test_match_across_micro_batches(self, spark, tmp_path):
        """View arrives in batch 1, click in batch 2: the buffered
        view state must still produce the pair — the property a batch
        join re-run per file would also give but a stateless
        stream-static join cannot."""
        vsrc, csrc = str(tmp_path / "v"), str(tmp_path / "c")
        ckpt, sink = str(tmp_path / "ck"), str(tmp_path / "out")
        _write_file(spark, tmp_path, vsrc, "a",
                    [(1, 7, _ts(1000))], V_SCHEMA)
        _write_file(spark, tmp_path, csrc, "a",
                    [(10, 99, _ts(1000))], C_SCHEMA)  # keeps batch 0 nonempty
        assert _run(spark, vsrc, csrc, ckpt, sink) == []
        _write_file(spark, tmp_path, csrc, "b",
                    [(11, 7, _ts(1500))], C_SCHEMA)
        got = _run(spark, vsrc, csrc, ckpt, sink)  # resumes from ckpt
        assert got == [(7, 1, 11)]

    def test_rejects_batch_inputs(self, spark):
        v = spark.createDataFrame([(1, 7, _ts(0))], V_SCHEMA)
        c = spark.createDataFrame([(2, 7, _ts(0))], C_SCHEMA)
        with pytest.raises(ValueError):
            join_stream.stream_interval_join(
                v, c, key="user_id", left_ts="view_ts",
                right_ts="click_ts")
