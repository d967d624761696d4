"""Streaming geofence transitions — the stateful streaming face of Q1.

The reference answers "which admin region contains this point?" one
request at a time (Test_HttpApiServer.java:326-468 serves QueryPoint
over HTTP); the continuous-monitoring analog every real geofencing
deployment needs is "tell me when a tracked entity CROSSES a boundary".
This module composes the engine's stream→static cell-grid join (the
same interior-shortcut + Arrow-refine plan as batch Q1) with a custom
stateful operator (`applyInPandasWithState`, keyed by entity): state is
the entity's last fence observation, and each micro-batch emits one row
per observed transition — including transitions that straddle
micro-batch boundaries, which a stateless window/lag could never see.

Semantics (deterministic by construction):
- A "fence observation" for a probe point is the lexicographic MIN
  region code among its deep-level matches — edge-touch points match
  both neighbours (AreaCityQuery.java:69-85), so the min collapses the
  observation to a single stable value.
- Observations are ordered by (epoch_s, point_id) within each entity;
  a transition is emitted whenever the fence differs from the previous
  observation (the first-ever observation transitions from 'NONE').
- Probes that match no fence are simply absent from the sequence
  (transitions are between consecutive OBSERVATIONS; "outside every
  fence" is not an observation — matching the reference, whose
  QueryPoint returns an empty result set for such points).

100 TB shape: the stream shuffles once on the entity key (the stateful
groupBy); state is O(1) per entity (one last-observation record);
the geo join before it is the same zero/one-exchange plan as batch Q1.
Inside the state function everything is vectorized pandas (sort +
shift + boolean mask) — no per-row Python.
"""
from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType, StringType, StructField, StructType,
)

GEOFENCE_OUT_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("point_id", LongType()),
    StructField("epoch_s", LongType()),
    StructField("from_code", StringType()),
    StructField("to_code", StringType()),
])
# last observation carried across micro-batches
GEOFENCE_STATE_SCHEMA = StructType([
    StructField("epoch_s", LongType()),
    StructField("point_id", LongType()),
    StructField("fence", StringType()),
])

NO_FENCE = "NONE"


def _transitions(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
    """Emit this entity's fence transitions for the batch; carry the
    last observation forward in state. Vectorized: min-aggregate per
    probe, sort, shift-compare."""
    chunks = [pdf for pdf in pdfs if len(pdf)]
    if not chunks:
        return iter(())
    obs = pd.concat(chunks, ignore_index=True)
    # one observation per probe point: min fence (edge-touch dedup)
    obs = (obs.groupby(["epoch_s", "point_id"], as_index=False)["fence"]
           .min()
           .sort_values(["epoch_s", "point_id"], ignore_index=True))
    prev = obs["fence"].shift(1)
    if state.exists:
        last_epoch, last_point, last_fence = state.get
        prev.iloc[0] = last_fence
    else:
        prev.iloc[0] = None
    changed = prev.isna() | (prev != obs["fence"])
    tail = obs.iloc[-1]
    state.update((int(tail["epoch_s"]), int(tail["point_id"]),
                  str(tail["fence"])))
    out = obs[changed]
    if len(out) == 0:
        return iter(())
    return iter([pd.DataFrame({
        "user_id": key[0],
        "point_id": out["point_id"].astype("int64"),
        "epoch_s": out["epoch_s"].astype("int64"),
        "from_code": prev[changed].fillna(NO_FENCE),
        "to_code": out["fence"],
    })])


def stream_geofence(engine, stream_points: DataFrame,
                    deep: int = 2,
                    user_col: str = "user_id",
                    time_col: str = "epoch_s") -> DataFrame:
    """stream_points: STREAMING DataFrame with
    (user_id long, point_id long, epoch_s long, lng double, lat double).
    Returns the transition stream (user_id, point_id, epoch_s,
    from_code, to_code) — attach .writeStream with a checkpoint; the
    per-entity last-observation state recovers on restart."""
    if not stream_points.isStreaming:
        raise ValueError("stream_points must be a streaming DataFrame")
    m = engine.query_points(stream_points, where=f"deep = {int(deep)}",
                            with_props=False,
                            id_cols=(user_col, "point_id", time_col))
    obs = m.join(
        F.broadcast(engine.boundaries.select(
            "region_id", F.col("id").alias("fence"))),
        "region_id",
    ).select(F.col(user_col).cast("long").alias("user_id"),
             F.col("point_id").cast("long"),
             F.col(time_col).cast("long").alias("epoch_s"),
             "fence")
    return obs.groupBy("user_id").applyInPandasWithState(
        _transitions,
        outputStructType=GEOFENCE_OUT_SCHEMA,
        stateStructType=GEOFENCE_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
