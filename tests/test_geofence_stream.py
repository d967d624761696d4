"""Stateful streaming geofence transitions (streaming/geofence_stream.py).

The gate (stream_geofence_gate) hash-checks single-batch semantics
against a DuckDB lag-window oracle; these tests cover what the gate
cannot: cross-micro-batch state carry (the reason the operator is
stateful at all), skip-of-unmatched probes, and the batch-DF guard.
"""
import os

import pytest
from pyspark.sql import functions as F

from areacity_query_geometry_spark.streaming import geofence_stream

BJ = (116.407387, 39.904179)   # 北京市 interior
GD = (114.044346, 22.691963)   # 广东省 interior
SEA = (121.993491, 29.524288)  # offshore — matches no province


def _run(spark, engine, src, ckpt, sink):
    stream = (spark.readStream
              .schema("user_id long, point_id long, epoch_s long, "
                      "lng double, lat double")
              .parquet(src))
    out = geofence_stream.stream_geofence(engine, stream, deep=0)
    q = (out.writeStream.format("parquet").option("path", sink)
         .outputMode("append").option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination()
    return sorted(
        (r.user_id, r.point_id, r.epoch_s, r.from_code, r.to_code)
        for r in spark.read.parquet(sink).collect())


def _write_file(spark, tmp_path, src, name, rows):
    df = spark.createDataFrame(
        rows, "user_id long, point_id long, epoch_s long, "
              "lng double, lat double")
    stage = str(tmp_path / ("s_" + name))
    df.coalesce(1).write.mode("overwrite").parquet(stage)
    part = [f for f in os.listdir(stage) if f.endswith(".parquet")][0]
    os.makedirs(src, exist_ok=True)
    os.rename(os.path.join(stage, part), os.path.join(src, name + ".parquet"))


class TestGeofenceStream:
    def test_single_batch_transitions(self, spark, province_engine, tmp_path):
        """Enter + change + re-enter within one batch; unmatched probes
        drop out of the observation sequence without emitting."""
        src = str(tmp_path / "in")
        rows = [
            (7, 1, 100, *BJ),
            (7, 2, 200, *BJ),    # same fence — no emit
            (7, 3, 300, *SEA),   # no fence — not an observation
            (7, 4, 400, *GD),    # BJ → GD
            (7, 5, 500, *BJ),    # GD → BJ
            (8, 6, 150, *GD),    # second entity: independent state
        ]
        _write_file(spark, tmp_path, src, "a", rows)
        got = _run(spark, province_engine, src,
                   str(tmp_path / "ck"), str(tmp_path / "out"))
        assert [(u, p, e) for (u, p, e, _f, _t) in got] == \
            [(7, 1, 100), (7, 4, 400), (7, 5, 500), (8, 6, 150)]
        (t1, t2, t3, t4) = got
        bj, gd = t1[4], t2[4]
        assert bj != gd
        assert (t1[3], t1[4]) == (geofence_stream.NO_FENCE, bj)
        assert (t2[3], t2[4]) == (bj, gd)
        assert (t3[3], t3[4]) == (gd, bj)
        assert (t4[3], t4[4]) == (geofence_stream.NO_FENCE, gd)

    def test_state_carries_across_batches(self, spark, province_engine,
                                          tmp_path):
        """The cross-batch case a stateless lag cannot express: the
        fence held at the end of batch 1 suppresses batch 2's equal
        observation and seeds its first transition."""
        src = str(tmp_path / "in")
        ckpt, sink = str(tmp_path / "ck"), str(tmp_path / "out")
        _write_file(spark, tmp_path, src, "a",
                    [(7, 1, 100, *BJ), (7, 2, 200, *GD)])
        got1 = _run(spark, province_engine, src, ckpt, sink)
        assert [(p, e) for (_u, p, e, _f, _t) in got1] == [(1, 100), (2, 200)]
        gd = got1[1][4]

        # batch 2: still GD (no emit), then back to BJ (emit GD→BJ)
        _write_file(spark, tmp_path, src, "b",
                    [(7, 3, 300, *GD), (7, 4, 400, *BJ)])
        got2 = _run(spark, province_engine, src, ckpt, sink)
        assert len(got2) == 3
        new = [r for r in got2 if r[1] == 4]
        assert len(new) == 1
        assert (new[0][3], new[0][4]) == (gd, got1[0][4])
        assert not any(r[1] == 3 for r in got2)

    def test_rejects_batch_df(self, spark, province_engine):
        batch = spark.range(3).select(
            F.col("id").alias("user_id"), F.col("id").alias("point_id"),
            F.col("id").alias("epoch_s"),
            F.lit(116.4).alias("lng"), F.lit(39.9).alias("lat"))
        with pytest.raises(ValueError):
            geofence_stream.stream_geofence(province_engine, batch, deep=0)
