"""Stream↔stream event-time interval join — the fourth Structured
Streaming shape next to the stream→static spatial join
(point_stream.py), the watermarked windowed aggregation, and the
stateful dedup (dedup_stream.py).

Two live streams correlate on a key within a time window (the
view→click / request→response / enter→exit pattern). Spark's
stream-stream inner join buffers both sides in keyed state; the
watermarks PLUS the event-time interval condition are what let it
drop buffered rows once the other side's watermark passes the
interval — bounded state against an infinite firehose, the same
property the windowed-agg gate pins for aggregation. Without the
interval bound the state grows forever; this module refuses to build
the join without one.

Emission semantics (inner join): a pair emits in the micro-batch
where BOTH sides are present — watermarks bound state, not inner-join
output. The gate stages each side as ONE coalesced file (the repo's
single-batch delivery pin), so every pair lands in batch 0 and the
drained sink is exactly the batch interval join the DuckDB oracle
computes.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def stream_interval_join(left: DataFrame, right: DataFrame, key: str,
                         left_ts: str, right_ts: str,
                         max_lag: str = "1 hour",
                         watermark: str = "2 hours") -> DataFrame:
    """Inner-join two STREAMING DataFrames on `key` where
    right_ts ∈ [left_ts, left_ts + max_lag]. Both sides get
    `watermark`; the interval condition is part of the join predicate
    so Spark's state store evicts matched-out rows as the watermarks
    advance. Column names must be disjoint apart from `key`."""
    if not (left.isStreaming and right.isStreaming):
        raise ValueError("stream_interval_join needs two streaming DataFrames")
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    cond = (
        (lw[key] == rw[key])
        & (F.col(right_ts) >= F.col(left_ts))
        & (F.col(right_ts) <= F.expr(f"{left_ts} + interval {max_lag}"))
    )
    return lw.join(rw, cond, "inner").drop(rw[key])
