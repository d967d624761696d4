"""Structured-Streaming point lookup — the streaming face of Q1.

The reference serves lookups request/response over HTTP
(/root/reference/Test_HttpApiServer.java); the Spark-native equivalent
is a stream→static join: a stream of coordinates joins the static
(broadcast) tile table with the same interior-shortcut + Arrow-refine
plan as the batch path. Stateless (no watermark needed); every batch
operator (cell expr, equi-join, mapInPandas refine) is
streaming-compatible, so the batch engine method is reused verbatim.
"""
from __future__ import annotations

from pyspark.sql import DataFrame


def stream_point_lookup(engine, stream_points: DataFrame,
                        where: str | None = None) -> DataFrame:
    """stream_points: STREAMING DataFrame with (point_id, lng, lat).
    Returns the streaming matches (point_id, region_id) — attach
    .writeStream with any sink/trigger."""
    if not stream_points.isStreaming:
        raise ValueError("stream_points must be a streaming DataFrame")
    return engine.query_points(stream_points, where=where, with_props=False)


def stream_region_window_counts(engine, stream_points: DataFrame,
                                window_dur: str = "1 minute",
                                watermark_delay: str = "2 minutes",
                                time_col: str = "ts",
                                where: str | None = None) -> DataFrame:
    """Event-time windowed per-region lookup counts with a watermark —
    the streaming face of the engine's only aggregation surface
    (per-region counts, SURVEY.md §2.6): stream → spatial join →
    `withWatermark` → `groupBy(window(ts), region_id).count()`.

    Append-mode semantics: a (window, region) row emits once the
    watermark passes the window end; rows later than
    `watermark_delay` behind the stream's max event time are DROPPED
    (bounded state — the property that lets this run forever against a
    firehose of documents)."""
    if not stream_points.isStreaming:
        raise ValueError("stream_points must be a streaming DataFrame")
    from pyspark.sql import functions as F

    m = engine.query_points(stream_points, where=where, with_props=False,
                            id_cols=("point_id", time_col))
    return (
        m.withWatermark(time_col, watermark_delay)
        .groupBy(F.window(F.col(time_col), window_dur).alias("win"),
                 F.col("region_id"))
        .count()
    )


def run_to_memory(engine, stream_points: DataFrame, table_name: str,
                  where: str | None = None):
    """Drain the stream into an in-memory sink with availableNow (test
    and demo helper). Returns the StreamingQuery after completion."""
    out = stream_point_lookup(engine, stream_points, where)
    q = (out.writeStream.format("memory")
         .queryName(table_name)
         .outputMode("append")
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    return q
