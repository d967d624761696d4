"""SpatialEngine — the session-level facade (the analog of the
reference's 10 static `Instances[0-9]`, /root/reference/AreaCityQuery.java:62-66,
re-expressed as named boundary/tile DataFrame pairs).

Query surface mirrors the reference's four verbs
(AreaCityQuery.java:87-399):

    query_points(points_df, ...)                 ≙ QueryPoint          (Q1)
    query_points_with_tolerance(points_df, m)    ≙ QueryPointWithTolerance (Q2)
    query_geometry(wkt, ...)                     ≙ QueryGeometry       (Q3)
    read_wkt_features(where, ...)                ≙ ReadWKT_FromWkbsFile (Q4)
    debug_tile_splits_wkt(where)                 ≙ Debug_ReadGeometryGridSplitsWKT (Q5)

but batch-first: the probe side is a DataFrame of millions/billions of
points (rows of the docs table), not a single coordinate — the reference
answers one coordinate per call; this engine answers them all in one
distributed join.
"""
from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import LongType, StructField, StructType

from . import grid, tiler
from .geom import core, predicates, wkb
from .sources import geojson_source

_REFINE_SCHEMA = StructType([
    StructField("point_id", LongType()),
    StructField("region_id", LongType()),
])


def _refine_point_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Exact point-in-tile refine, vectorized per (cell, region) group —
    the JTS `subGeom.intersects(point)` analog
    (/root/reference/AreaCityQuery.java:260-263). One WKB decode per
    tile; all points probing that tile tested in one numpy call."""
    for pdf in it:
        if len(pdf) == 0:
            yield pd.DataFrame({"point_id": [], "region_id": []}).astype(
                {"point_id": "int64", "region_id": "int64"})
            continue
        pids, rids = [], []
        for (cid, rid), grp in pdf.groupby(["cell_id", "region_id"], sort=False):
            geom = wkb.loads(bytes(grp["tile_wkb"].iloc[0]))
            hit = predicates.points_intersect_rings(
                grp["lng"].to_numpy(), grp["lat"].to_numpy(), core.all_rings(geom)
            )
            if hit.any():
                pids.append(grp["point_id"].to_numpy()[hit])
                rids.append(pd.Series([rid] * int(hit.sum())))
        if pids:
            import numpy as np
            yield pd.DataFrame({
                "point_id": np.concatenate(pids).astype("int64"),
                "region_id": pd.concat(rids).to_numpy().astype("int64"),
            })
        else:
            yield pd.DataFrame({"point_id": [], "region_id": []}).astype(
                {"point_id": "int64", "region_id": "int64"})


class SpatialEngine:
    """Boundary set + tile index + query operators."""

    def __init__(
        self,
        spark: SparkSession,
        boundaries: DataFrame,
        tiles: DataFrame,
        res_levels: list[int],
        broadcast_tiles: bool = True,
    ):
        self.spark = spark
        self.boundaries = boundaries
        self.tiles = tiles
        self.res_levels = sorted(res_levels)
        self.broadcast_tiles = broadcast_tiles

    # ------------------------------------------------------------ build

    @classmethod
    def from_geojson(
        cls,
        spark: SparkSession,
        path: str,
        base_res: int = 12,
        max_res: int | None = None,
        seg_budget: int = 48,
        cache: bool = True,
    ) -> "SpatialEngine":
        boundaries = geojson_source.read_boundaries(spark, path)
        tiles = tiler.build_tiles(boundaries, base_res, max_res, seg_budget)
        if cache:
            boundaries = boundaries.cache()
            tiles = tiles.cache()
        levels = [r["res"] for r in tiles.select("res").distinct().collect()]
        n_tiles = tiles.count()
        return cls(spark, boundaries, tiles, levels, broadcast_tiles=n_tiles < 3_000_000)

    # ------------------------------------------------- shared join spine

    def _probe_cells(self, points: DataFrame, lng="lng", lat="lat") -> DataFrame:
        """Attach cell_id per tile-resolution level — pure Spark SQL
        (whole-stage codegen'd); L levels → L probe rows per point."""
        exprs = [F.expr(grid.cell_id_sql_expr(lng, lat, r)) for r in self.res_levels]
        return points.withColumn("cell_id", F.explode(F.array(*exprs)))

    def _tiles_for(self, where: str | None) -> DataFrame:
        t = self.tiles
        if where:
            keep = self.boundaries.filter(where).select("region_id")
            t = t.join(F.broadcast(keep), "region_id", "left_semi")
        return F.broadcast(t) if self.broadcast_tiles else t

    def _match_points(self, points: DataFrame, where: str | None = None,
                      lng="lng", lat="lat") -> DataFrame:
        """Core spatial join: (point_id, lng, lat) → (point_id, region_id).

        interior-tile hits never leave the JVM; only boundary-tile rows
        cross into the Arrow refine UDF.
        """
        probe = self._probe_cells(points, lng, lat)
        joined = probe.join(self._tiles_for(where), "cell_id")
        interior = joined.filter(F.col("kind") == 1).select("point_id", "region_id")
        boundary = joined.filter(F.col("kind") == 0).select(
            "point_id", F.col(lng).alias("lng"), F.col(lat).alias("lat"),
            "cell_id", "region_id", "tile_wkb",
        )
        refined = boundary.mapInPandas(_refine_point_batches, _REFINE_SCHEMA)
        # a point hits at most one tile per region by construction (tiles
        # partition each region's cover), so no dedup shuffle is needed.
        return interior.unionByName(refined)

    def _with_props(self, matches: DataFrame) -> DataFrame:
        cols = ["region_id", "id", "pid", "deep", "name", "ext_path", "prop_json"]
        return matches.join(F.broadcast(self.boundaries.select(*cols)), "region_id")

    # ---------------------------------------------------------- Q1

    def query_points(self, points: DataFrame, where: str | None = None,
                     with_props: bool = True, lng="lng", lat="lat") -> DataFrame:
        """Q1 — point∩polygon join (≙ QueryPoint, AreaCityQuery.java:87-90).

        points: DataFrame with (point_id long, lng double, lat double).
        Returns one row per (point, matching region); edge-touch matches
        both neighbours, hole interiors match none (AreaCityQuery.java:69-85).
        """
        m = self._match_points(points, where, lng, lat)
        return self._with_props(m) if with_props else m
