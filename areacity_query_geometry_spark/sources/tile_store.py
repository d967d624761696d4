"""Persisted tile/boundary store — the Spark-native replacement for the
reference's `.wkbs` structured cache file
(/root/reference/AreaCityQuery.java:509-511): build once from GeoJSON,
reuse on every start; a cached store is only valid if its metadata
matches the requested build parameters, exactly like the wkbs
`@Version`/`@GridFactor` header check (`AvailableWkbsFile`,
AreaCityQuery.java:1100-1120).

Layout:
    <path>/boundaries/   parquet
    <path>/tiles/        parquet, partitioned-ready (sorted by cell_id)
    <path>/_meta.json    {grid_version, base_res, max_res, seg_budget,
                          n_features, n_tiles}

(If an Iceberg catalog is configured, swap the parquet writes for
`writeTo(...).createOrReplace()` — semantics identical; this container
ships no Iceberg runtime jar, so the store is plain parquet with the
same snapshot-style validation.)
"""
from __future__ import annotations

import json
import os

from pyspark.sql import SparkSession

from .. import GRID_VERSION, tiler
from ..engine import SpatialEngine
from . import geojson_source


def save(engine: SpatialEngine, path: str, params: dict) -> None:
    engine.boundaries.write.mode("overwrite").parquet(os.path.join(path, "boundaries"))
    (engine.tiles.repartition("cell_id")
        .sortWithinPartitions("cell_id")
        .write.mode("overwrite")
        .parquet(os.path.join(path, "tiles")))
    meta = {
        "grid_version": GRID_VERSION,
        "n_features": engine.boundaries.count(),
        "n_tiles": engine.tiles.count(),
        **params,
    }
    with open(os.path.join(path, "_meta.json"), "w") as f:
        json.dump(meta, f)


def available(path: str, base_res: int, max_res: int, seg_budget: int) -> bool:
    """The AvailableWkbsFile analog: metadata must match exactly."""
    meta_path = os.path.join(path, "_meta.json")
    if not os.path.exists(meta_path):
        return False
    try:
        with open(meta_path) as f:
            meta = json.load(f)
    except (OSError, json.JSONDecodeError):
        return False
    return (
        meta.get("grid_version") == GRID_VERSION
        and meta.get("base_res") == base_res
        and meta.get("max_res") == max_res
        and meta.get("seg_budget") == seg_budget
    )


def load(spark: SparkSession, path: str) -> SpatialEngine:
    with open(os.path.join(path, "_meta.json")) as f:
        meta = json.load(f)
    boundaries = spark.read.parquet(os.path.join(path, "boundaries")).cache()
    tiles = spark.read.parquet(os.path.join(path, "tiles")).cache()
    eng = SpatialEngine(
        spark, boundaries, tiles, base_res=meta["base_res"],
        broadcast_tiles=meta["n_tiles"] < 3_000_000,
    )
    # DataFromWkbsFile analog (QueryInitInfo, AreaCityQuery.java:1562-1565)
    eng._init_meta = {"data_from_store": True, "store_path": path,
                      "polygon_count": meta.get("n_tiles"), **meta}
    return eng


def save_bucketed(engine: SpatialEngine, table: str, n_buckets: int = 64) -> None:
    """Persist the tile set as a BUCKETED table on `cell_id` (Hive-style
    bucketing in the session warehouse). At scale this is the
    shuffle-free co-located join path: a sort-merge join of probes
    against a cell_id-bucketed tile table reads the tile side without
    any Exchange — only the skinny probe rows shuffle (SURVEY.md §4
    "co-locate joins via bucketing"). The broadcast path stays the
    default for small tile sets; this is the 100TB tile-table variant
    (e.g. township-level boundaries at fine resolution)."""
    (engine.tiles.write.mode("overwrite")
        .bucketBy(n_buckets, "cell_id")
        .sortBy("cell_id")
        .format("parquet")
        .saveAsTable(table))


def load_bucketed(spark: SparkSession, table: str, base_res: int,
                  boundaries=None) -> SpatialEngine:
    """Engine over the bucketed tile table, forced onto the shuffle-join
    path (broadcast_tiles=False) so the bucketed scan is actually used."""
    tiles = spark.table(table)
    return SpatialEngine(spark, boundaries, tiles, base_res=base_res,
                         broadcast_tiles=False)


def load_or_build(
    spark: SparkSession,
    geojson_path: str,
    store_path: str,
    base_res: int = 10,
    max_res: int | None = None,
    seg_budget: int = 48,
) -> SpatialEngine:
    """Init_* analog with autoUseExistsWkbsFile=True
    (AreaCityQuery.java:663-669): reuse the persisted store when its
    parameters match, else rebuild and persist."""
    from .. import grid

    if max_res is None:
        max_res = min(grid.MAX_RES, base_res + 4)
    if available(store_path, base_res, max_res, seg_budget):
        return load(spark, store_path)
    boundaries = geojson_source.read_boundaries(spark, geojson_path).cache()
    tiles = tiler.build_tiles(boundaries, base_res, max_res, seg_budget).cache()
    n_tiles = tiles.count()
    engine = SpatialEngine(spark, boundaries, tiles, base_res,
                           broadcast_tiles=n_tiles < 3_000_000)
    save(engine, store_path,
         {"base_res": base_res, "max_res": max_res, "seg_budget": seg_budget})
    return load(spark, store_path)
