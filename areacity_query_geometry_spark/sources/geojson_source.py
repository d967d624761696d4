"""Line-delimited GeoJSON → `boundaries` DataFrame.

Reference contract: one feature per line inside a FeatureCollection
(/root/reference/AreaCityQuery.java:502-505, sentinel scan 773-785).
`spark.read.text` splits on lines for free, making the scan trivially
parallel (the reference needed a 5-thread pool behind a reader lock,
AreaCityQuery.java:1024-1047 — Spark's data parallelism replaces it).

Output schema (SURVEY.md §1.5):
    region_id  long      — feature line ordinal (reference uses line no
                           as the feature id, e.g. PointDistanceID)
    id, pid    string    — admin codes from properties
    deep       int       — admin level (regex-extracted, both "0" and 0)
    name       string
    ext_path   string
    geo_wkt    string    — center point WKT from properties
    prop_json  string    — raw properties JSON, verbatim (parity)
    geom_wkb   binary    — Polygon/MultiPolygon WKB; null for EMPTY
"""
from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    BinaryType, IntegerType, LongType, StringType, StructField, StructType,
)

from ..geom import geojson, wkb

BOUNDARY_SCHEMA = StructType([
    StructField("region_id", LongType()),
    StructField("id", StringType()),
    StructField("pid", StringType()),
    StructField("deep", IntegerType()),
    StructField("name", StringType()),
    StructField("ext_path", StringType()),
    StructField("geo_wkt", StringType()),
    StructField("prop_json", StringType()),
    StructField("geom_wkb", BinaryType()),
])


def _parse_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in it:
        rows = []
        for rid, line in zip(pdf["region_id"], pdf["value"]):
            parsed = geojson.parse_feature_line(line)
            if parsed is None:
                continue
            prop, geom = parsed
            rows.append({
                "region_id": rid,
                "id": geojson.extract_str(prop, "id"),
                "pid": geojson.extract_str(prop, "pid"),
                "deep": geojson.extract_deep(prop),
                "name": geojson.extract_str(prop, "name"),
                "ext_path": geojson.extract_str(prop, "ext_path"),
                "geo_wkt": geojson.extract_str(prop, "geo_wkt"),
                "prop_json": prop,
                "geom_wkb": wkb.dumps(geom) if geom["rings" if geom["type"] == "Polygon" else "polys"] else None,
            })
        yield pd.DataFrame(rows, columns=[f.name for f in BOUNDARY_SCHEMA.fields])


def read_boundaries(spark: SparkSession, path: str) -> DataFrame:
    """Read a one-feature-per-line GeoJSON FeatureCollection.

    Boundary sets are small relative to the probe side (thousands of
    admin regions), so the line-ordinal window here is a build-time-only
    single-partition step — the probe-side hot path never sees it.
    """
    from pyspark.sql import Window

    lines = spark.read.text(path)
    lines = lines.withColumn(
        "region_id",
        F.row_number().over(Window.orderBy(F.monotonically_increasing_id())).cast("long"),
    )
    n_parts = max(2, spark.sparkContext.defaultParallelism)
    return (
        lines.filter(F.trim(F.col("value")).startswith("{"))
        .repartition(n_parts)
        .mapInPandas(_parse_batches, BOUNDARY_SCHEMA)
    )
