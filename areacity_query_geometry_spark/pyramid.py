"""Multi-resolution cell pyramid: per-cell aggregates at a finest
grid resolution, rolled up level by level to coarser resolutions —
the tile-pyramid every map-serving / heatmap backend builds, and the
hierarchical-rollup shape (hypertable continuous aggregate) the
engine's grid makes exact.

Each coarser level aggregates the PREVIOUS LEVEL, never the raw
table: at 10^12 input rows the finest groupBy (map-side combining,
group count capped by the grid, skew-proof) touches the data once,
and every rollup after that runs on ≤ 4^res rows — the coarsening is
integer floor-division of cell coordinates (grid widths are
360/2^res, dyadic, so child→parent assignment is exact and
engine-independent). Aggregates must be reassociable (counts, sums —
exact here: integer values and dyadic coords); the union of levels
is tagged by a `res` column.
"""
from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, functions as F


def cell_pyramid(points: DataFrame, finest_res: int,
                 coarser: tuple = (), lng_col: str = "lng",
                 lat_col: str = "lat",
                 value_col: str | None = None) -> DataFrame:
    """points → one row per (res, cell_x, cell_y) for finest_res and
    every res in `coarser` (each < finest_res), with n_points and
    (if value_col) sum_val aggregated exactly. Cell width at res r is
    360/2^r degrees; cells index floor(coord/width) (negative-safe)."""
    w = 360.0 / (1 << finest_res)
    aggs = [F.count("*").alias("n_points")]
    if value_col:
        aggs.append(F.sum(value_col).alias("sum_val"))
    base = (points.select(
        F.floor(F.col(lng_col) / w).cast("long").alias("cell_x"),
        F.floor(F.col(lat_col) / w).cast("long").alias("cell_y"),
        *([F.col(value_col)] if value_col else []))
        .groupBy("cell_x", "cell_y").agg(*aggs)
        .withColumn("res", F.lit(finest_res).cast("long")))

    sum_aggs = [F.sum("n_points").alias("n_points")]
    if value_col:
        sum_aggs.append(F.sum("sum_val").alias("sum_val"))
    levels = [base]
    prev, prev_res = base, finest_res
    for r in sorted(coarser, reverse=True):
        if r >= prev_res:
            raise ValueError("coarser levels must descend from finest_res")
        shift = prev_res - r
        # floor-division (not >>) so negative cell indexes coarsen
        # correctly; Spark DIV truncates toward zero, so use
        # floor(x / 2^shift) explicitly
        lvl = (prev.select(
            F.floor(F.col("cell_x") / (1 << shift)).cast("long")
             .alias("cell_x"),
            F.floor(F.col("cell_y") / (1 << shift)).cast("long")
             .alias("cell_y"),
            "n_points", *(["sum_val"] if value_col else []))
            .groupBy("cell_x", "cell_y").agg(*sum_aggs)
            .withColumn("res", F.lit(r).cast("long")))
        levels.append(lvl)
        prev, prev_res = lvl, r
    cols = ["res", "cell_x", "cell_y", "n_points"] \
        + (["sum_val"] if value_col else [])
    return reduce(lambda a, b: a.unionByName(b),
                  [lv.select(*cols) for lv in levels])
