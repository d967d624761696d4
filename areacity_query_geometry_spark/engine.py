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

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window, functions as F
from pyspark.sql.types import (
    DoubleType, LongType, StringType, StructField, StructType,
)

from . import grid, tiler
from .geom import core, distance, predicates, wkb, wkt as wkt_codec
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

    # ---------------------------------------------------------- Q2

    def query_points_with_tolerance(
        self, points: DataFrame, tolerance_m: float,
        where: str | None = None, lng="lng", lat="lat",
    ) -> DataFrame:
        """Q2 — nearest-boundary fallback (≙ QueryPointWithTolerance,
        /root/reference/AreaCityQuery.java:102-163).

        Points matched by Q1 return their Q1 rows (point_distance null).
        Unmatched points probe a 24-gon circle of radius tolerance_m
        (the whole world for -1); per admin level (`deep`) the single
        nearest feature wins, annotated with PointDistance (haversine
        meters, "0.00") and PointDistanceID (feature ordinal) exactly
        as the reference injects them (AreaCityQuery.java:142).
        """
        pts = points.select(
            F.col("point_id"), F.col(lng).alias("lng"), F.col(lat).alias("lat")
        )
        base = self._match_points(pts, where).cache()
        base_out = self._with_props(base).withColumn(
            "point_distance", F.lit(None).cast("double")
        ).withColumn("point_distance_id", F.lit(None).cast("long")) \
         .withColumn("prop_json_out", F.col("prop_json"))
        if tolerance_m == 0:
            return base_out
        misses = pts.join(base.select("point_id").distinct(), "point_id", "left_anti")

        levels = self.res_levels
        if tolerance_m > 0:
            cover_schema = StructType([
                StructField("point_id", LongType()),
                StructField("lng", DoubleType()),
                StructField("lat", DoubleType()),
                StructField("cell_id", LongType()),
            ])

            def cover_fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
                for pdf in it:
                    pid_o, lng_o, lat_o, cid_o = [], [], [], []
                    for pid, x, y in zip(pdf["point_id"], pdf["lng"], pdf["lat"]):
                        circ = distance.simple_circle(x, y, tolerance_m, 24)
                        minx, miny, maxx, maxy = core.bounds(circ)
                        for r in levels:
                            cells = grid.cover_bbox(minx, miny, maxx, maxy, r)
                            pid_o.extend([pid] * len(cells))
                            lng_o.extend([x] * len(cells))
                            lat_o.extend([y] * len(cells))
                            cid_o.extend(cells.tolist())
                    yield pd.DataFrame(
                        {"point_id": pid_o, "lng": lng_o, "lat": lat_o, "cell_id": cid_o}
                    ).astype({"point_id": "int64", "cell_id": "int64"})

            cover = misses.mapInPandas(cover_fn, cover_schema)
            cand = cover.join(
                self._tiles_for(where).filter(F.col("kind") == 0), "cell_id"
            ).select("point_id", "lng", "lat", "region_id", "tile_wkb")
            # no dedup needed: the cover emits each cell once per point and
            # each tile owns exactly one cell, so (point, tile) pairs are unique
        else:  # tolerance -1: unlimited — every boundary tile is a candidate
            t = self.tiles.filter(F.col("kind") == 0)
            if where:
                keep = self.boundaries.filter(where).select("region_id")
                t = t.join(F.broadcast(keep), "region_id", "left_semi")
            cand = misses.crossJoin(F.broadcast(t.select("region_id", "tile_wkb")))

        dist_schema = StructType([
            StructField("point_id", LongType()),
            StructField("region_id", LongType()),
            StructField("dist_m", DoubleType()),
        ])
        tol = float(tolerance_m)

        def dist_fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in it:
                pids, rids, ds = [], [], []
                for (pid,), grp in pdf.groupby(["point_id"], sort=False):
                    x = float(grp["lng"].iloc[0]); y = float(grp["lat"].iloc[0])
                    circ = distance.simple_circle(x, y, tol, 24) if tol > 0 else None
                    for twkb, rid in zip(grp["tile_wkb"], grp["region_id"]):
                        g = wkb.loads(bytes(twkb))
                        # exact candidate gate: tile must intersect the 24-gon
                        # (the reference's refine step before the process hook)
                        if circ is not None and not predicates.geoms_intersect(g, circ):
                            continue
                        segs = predicates.segments_of_rings(core.all_rings(g))
                        nx, ny, _ = predicates.nearest_on_segments(
                            np.array([x]), np.array([y]), segs)
                        d = float(distance.haversine(nx[0], ny[0], x, y))
                        pids.append(pid); rids.append(rid); ds.append(d)
                yield pd.DataFrame({"point_id": pids, "region_id": rids, "dist_m": ds}) \
                    .astype({"point_id": "int64", "region_id": "int64", "dist_m": "float64"})

        dists = cand.mapInPandas(dist_fn, dist_schema)
        per_feature = dists.groupBy("point_id", "region_id").agg(
            F.min("dist_m").alias("dist_m"))
        joined = per_feature.join(
            F.broadcast(self.boundaries.select(
                "region_id", "id", "pid", "deep", "name", "ext_path", "prop_json")),
            "region_id")
        w = Window.partitionBy("point_id", "deep").orderBy("dist_m", "region_id")
        winners = joined.withColumn("_rn", F.row_number().over(w)) \
                        .filter(F.col("_rn") == 1).drop("_rn")
        # reference prop annotation (AreaCityQuery.java:142):
        #   {...props, "PointDistanceID": N, "PointDistance": D.DD}
        annotated = winners.withColumn(
            "prop_json_out",
            F.concat(
                F.expr("substring(prop_json, 1, length(prop_json) - 1)"),
                F.lit(', "PointDistanceID": '), F.col("region_id").cast("string"),
                F.lit(', "PointDistance": '), F.format_string("%.2f", F.col("dist_m")),
                F.lit("}"),
            ),
        ).withColumn("point_distance", F.col("dist_m")) \
         .withColumn("point_distance_id", F.col("region_id")) \
         .drop("dist_m")
        return base_out.unionByName(annotated)

    # ---------------------------------------------------------- Q3

    def query_geometry(self, probes: DataFrame, where: str | None = None,
                       with_props: bool = True) -> DataFrame:
        """Q3 — geometry-intersects join (≙ QueryGeometry,
        /root/reference/AreaCityQuery.java:179-309). `probes` has
        (probe_id long, wkt string); any POINT/LINESTRING/POLYGON/
        MULTIPOLYGON probe. Returns (probe_id, region_id [, props])
        for every boundary the probe intersects (boundary-touch counts).
        """
        levels = self.res_levels
        cover_schema = StructType([
            StructField("probe_id", LongType()),
            StructField("wkt", StringType()),
            StructField("cell_id", LongType()),
        ])

        def cover_fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in it:
                pid_o, wkt_o, cid_o = [], [], []
                for pid, w_ in zip(pdf["probe_id"], pdf["wkt"]):
                    g = wkt_codec.loads(w_)
                    if core.is_empty(g):
                        continue
                    b = core.bounds(g)
                    for r in levels:
                        cells = grid.cover_bbox(*b, r)
                        pid_o.extend([pid] * len(cells))
                        wkt_o.extend([w_] * len(cells))
                        cid_o.extend(cells.tolist())
                yield pd.DataFrame({"probe_id": pid_o, "wkt": wkt_o, "cell_id": cid_o}) \
                    .astype({"probe_id": "int64", "cell_id": "int64"})

        cover = probes.select("probe_id", "wkt").mapInPandas(cover_fn, cover_schema)
        joined = cover.join(self._tiles_for(where), "cell_id")

        refine_schema = StructType([
            StructField("probe_id", LongType()),
            StructField("region_id", LongType()),
        ])

        def refine_fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in it:
                seen: set[tuple[int, int]] = set()
                probe_cache: dict[int, dict] = {}
                pids, rids = [], []
                for pid, w_, cid, rid, kind, twkb in zip(
                    pdf["probe_id"], pdf["wkt"], pdf["cell_id"], pdf["region_id"],
                    pdf["kind"], pdf["tile_wkb"],
                ):
                    key = (pid, rid)
                    if key in seen:  # per-feature first-hit short-circuit
                        continue
                    g = probe_cache.get(pid)
                    if g is None:
                        g = probe_cache[pid] = wkt_codec.loads(w_)
                    if kind == 1:
                        minx, miny, maxx, maxy = grid.cell_bounds(int(cid))
                        tile = distance.rect(minx, miny, maxx, maxy)
                    else:
                        tile = wkb.loads(bytes(twkb))
                    if predicates.geoms_intersect(g, tile):
                        seen.add(key)
                        pids.append(pid)
                        rids.append(rid)
                yield pd.DataFrame({"probe_id": pids, "region_id": rids}).astype(
                    {"probe_id": "int64", "region_id": "int64"})

        matches = joined.select(
            "probe_id", "wkt", "cell_id", "region_id", "kind", "tile_wkb"
        ).mapInPandas(refine_fn, refine_schema).dropDuplicates(["probe_id", "region_id"])
        if not with_props:
            return matches
        cols = ["region_id", "id", "pid", "deep", "name", "ext_path", "prop_json"]
        return matches.join(F.broadcast(self.boundaries.select(*cols)), "region_id")

    # ---------------------------------------------------------- Q4

    def read_wkt_features(self, where: str | None = None,
                          with_wkt: bool = True) -> DataFrame:
        """Q4 — attribute full-scan + WKT fetch (≙ ReadWKT_FromWkbsFile,
        /root/reference/AreaCityQuery.java:328-399): a plain Catalyst
        scan+filter over `boundaries`, with full-geometry WKT
        reconstructed from WKB on demand."""
        df = self.boundaries
        if where:
            df = df.filter(where)
        if not with_wkt:
            return df.drop("geom_wkb")

        out_schema = StructType(
            [f for f in df.schema.fields if f.name != "geom_wkb"]
            + [StructField("wkt", StringType())]
        )

        def to_wkt(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in it:
                wkts = [
                    wkt_codec.dumps(wkb.loads(bytes(b))) if b is not None else "EMPTY"
                    for b in pdf["geom_wkb"]
                ]
                out = pdf.drop(columns=["geom_wkb"])
                out["wkt"] = wkts
                yield out

        return df.mapInPandas(to_wkt, out_schema)

    # ---------------------------------------------------------- Q5

    def debug_tile_splits_wkt(self, where: str | None = None) -> DataFrame:
        """Q5 — tiling introspection (≙ Debug_ReadGeometryGridSplitsWKT,
        /root/reference/AreaCityQuery.java:412-492): reassemble each
        matching feature's tiles into one MULTIPOLYGON WKT (interior
        cells as their rects, boundary cells as clipped pieces)."""
        t = self.tiles
        if where:
            keep = self.boundaries.filter(where).select("region_id")
            t = t.join(F.broadcast(keep), "region_id", "left_semi")
        grouped = t.groupBy("region_id").agg(
            F.collect_list(F.struct("cell_id", "kind", "tile_wkb")).alias("tiles"),
            F.count("*").alias("n_tiles"),
        )
        schema = StructType([
            StructField("region_id", LongType()),
            StructField("n_tiles", LongType()),
            StructField("tiles_wkt", StringType()),
        ])

        def assemble(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in it:
                rids, counts, wkts = [], [], []
                for rid, n, tile_list in zip(pdf["region_id"], pdf["n_tiles"], pdf["tiles"]):
                    polys = []
                    for trow in tile_list:
                        cid, kind, twkb = trow["cell_id"], trow["kind"], trow["tile_wkb"]
                        if kind == 1:
                            minx, miny, maxx, maxy = grid.cell_bounds(int(cid))
                            polys.append(distance.rect(minx, miny, maxx, maxy)["rings"])
                        else:
                            g = wkb.loads(bytes(twkb))
                            polys.append(g["rings"])
                    rids.append(rid)
                    counts.append(n)
                    wkts.append(wkt_codec.dumps({"type": "MultiPolygon", "polys": polys}))
                yield pd.DataFrame({"region_id": rids, "n_tiles": counts, "tiles_wkt": wkts})

        out = grouped.mapInPandas(assemble, schema)
        cols = ["region_id", "id", "deep", "name", "ext_path"]
        return out.join(F.broadcast(self.boundaries.select(*cols)), "region_id")
