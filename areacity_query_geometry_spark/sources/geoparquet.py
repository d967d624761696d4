"""GeoParquet 1.0 sink/source — standards-compliant geometry interop.

The reference's only geometry export is its private `.wkbs` cache and
WKT text over HTTP (/root/reference/AreaCityQuery.java:735-744,
Test_HttpApiServer.java). A Spark-native engine should speak the
lakehouse-standard geometry container instead: GeoParquet (public spec
https://geoparquet.org, v1.0.0) is plain parquet whose footer carries a
``geo`` key-value metadata entry describing the geometry column (WKB
encoding, bbox, geometry types, CRS) — readable by GDAL/OGR, GeoPandas,
DuckDB-spatial, QGIS, Sedona.

Writer shape (100-TB honest): one ``mapInPandas`` pass — every
partition writes its OWN ``part-<pid>.parquet`` file with a per-file
footer ``geo`` entry (per-file bboxes are what engine-side file pruning
reads), and returns a single manifest row. Only the metadata-sized
manifest (one row per partition: path, row count, bbox) reaches the
driver, which writes the root ``_geoparquet_manifest.json`` with the
merged global bbox. Data never moves through the driver and never
shuffles. The partition's Arrow batches are buffered to compute the
exact bbox before the footer is written — bounded by
``spark.sql.files.maxPartitionBytes`` like any scan partition.

Spark's JVM parquet writer cannot attach custom footer metadata from
PySpark, hence the pyarrow-per-partition writer; reading back needs no
special path at all (``spark.read.parquet`` — geometry stays a binary
WKB column that `geom.wkb.loads` / any OGC reader decodes).

Paths are filesystem paths visible to all executors (local here; a
shared object store on a real cluster).
"""
from __future__ import annotations

import glob
import json
import os
import shutil
import struct
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession

GEO_KEY = b"geo"
SPEC_VERSION = "1.0.0"
_WKB_TYPE_NAMES = {1: "Point", 2: "LineString", 3: "Polygon",
                   4: "MultiPoint", 5: "MultiLineString", 6: "MultiPolygon",
                   7: "GeometryCollection"}

MANIFEST_SCHEMA = ("file string, n_rows long, minx double, miny double, "
                   "maxx double, maxy double, geometry_types array<string>")


def _geom_bbox_and_type(buf: bytes):
    """(minx, miny, maxx, maxy, type_name) of one OGC WKB value.

    Coordinate extents come out of numpy views over the coordinate
    blocks (geom.wkb.loads already parses ring payloads with
    np.frombuffer); only the fixed-size headers are walked in Python.
    """
    from ..geom import wkb as wkb_codec

    code = struct.unpack_from("<I" if buf[0] == 1 else ">I", buf, 1)[0]
    name = _WKB_TYPE_NAMES.get(code)
    if name is None:
        raise ValueError(f"unsupported WKB geometry type {code}")
    geom = wkb_codec.loads(bytes(buf))
    t = geom["type"]
    if t == "Point":
        x, y = geom["xy"]
        return float(x), float(y), float(x), float(y), name
    if t == "LineString":
        xy = geom["xy"]
        return (float(xy[:, 0].min()), float(xy[:, 1].min()),
                float(xy[:, 0].max()), float(xy[:, 1].max()), name)
    rings = (geom["rings"] if t == "Polygon"
             else [r for rs in geom["polys"] for r in rs])
    minx = min(float(r[:, 0].min()) for r in rings)
    miny = min(float(r[:, 1].min()) for r in rings)
    maxx = max(float(r[:, 0].max()) for r in rings)
    maxy = max(float(r[:, 1].max()) for r in rings)
    return minx, miny, maxx, maxy, name


def _geo_metadata(column: str, bbox, geometry_types) -> dict:
    return {
        "version": SPEC_VERSION,
        "primary_column": column,
        "columns": {
            column: {
                "encoding": "WKB",
                "geometry_types": sorted(geometry_types),
                "bbox": [bbox[0], bbox[1], bbox[2], bbox[3]],
                # absent/null crs ⇒ OGC:CRS84 (lon/lat WGS84) per spec —
                # exactly this engine's coordinate convention
                "crs": None,
            }
        },
    }


def write_geoparquet(df: DataFrame, path: str, geometry_col: str,
                     mode: str = "overwrite") -> list[dict]:
    """Write `df` (one binary OGC-WKB column named `geometry_col`) as a
    GeoParquet 1.0 dataset at `path`. Returns the per-file manifest
    (path, n_rows, bbox) — one entry per non-empty partition."""
    if geometry_col not in df.columns:
        raise ValueError(f"no column {geometry_col!r} in {df.columns}")
    if mode not in ("overwrite", "error"):
        raise ValueError(f"unsupported mode {mode!r}")
    if os.path.exists(path):
        if mode == "error":
            raise FileExistsError(path)
        shutil.rmtree(path)
    os.makedirs(path, exist_ok=True)

    def _write_partition(it: Iterator) -> Iterator:
        import pandas as pd
        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        tables = []
        minx = miny = float("inf")
        maxx = maxy = float("-inf")
        gtypes: set[str] = set()
        n = 0
        for pdf in it:
            for buf in pdf[geometry_col]:
                x0, y0, x1, y1, name = _geom_bbox_and_type(buf)
                minx, miny = min(minx, x0), min(miny, y0)
                maxx, maxy = max(maxx, x1), max(maxy, y1)
                gtypes.add(name)
            n += len(pdf)
            tables.append(pa.Table.from_pandas(pdf, preserve_index=False))
        if n:
            table = pa.concat_tables(tables)
            meta = dict(table.schema.metadata or {})
            meta[GEO_KEY] = json.dumps(_geo_metadata(
                geometry_col, (minx, miny, maxx, maxy), gtypes)).encode()
            fname = os.path.join(path, f"part-{pid:05d}.parquet")
            pq.write_table(table.replace_schema_metadata(meta), fname)
            yield pd.DataFrame({
                "file": [fname], "n_rows": [n],
                "minx": [minx], "miny": [miny],
                "maxx": [maxx], "maxy": [maxy],
                "geometry_types": [sorted(gtypes)],
            })

    manifest = [r.asDict() for r in
                df.mapInPandas(_write_partition, MANIFEST_SCHEMA).collect()]
    root = {
        "version": SPEC_VERSION,
        "primary_column": geometry_col,
        "n_rows": sum(m["n_rows"] for m in manifest),
        "n_files": len(manifest),
        "bbox": [min(m["minx"] for m in manifest),
                 min(m["miny"] for m in manifest),
                 max(m["maxx"] for m in manifest),
                 max(m["maxy"] for m in manifest)] if manifest else None,
        "files": [{k: m[k] for k in
                   ("file", "n_rows", "minx", "miny", "maxx", "maxy")}
                  for m in sorted(manifest, key=lambda m: m["file"])],
    }
    with open(os.path.join(path, "_geoparquet_manifest.json"), "w") as f:
        json.dump(root, f, indent=1)
    return manifest


def read_geoparquet(spark: SparkSession, path: str) -> DataFrame:
    """GeoParquet needs no special read path in Spark: it IS parquet
    (the interop floor the spec is built on). Geometry arrives as the
    binary WKB column named by the footer metadata."""
    return spark.read.parquet(path)


def is_geoparquet_dataset(path: str) -> bool:
    """True when `path` is a directory written by `write_geoparquet`
    (or any GeoParquet dataset laid out as part files + our manifest)."""
    return (os.path.isdir(path) and
            (os.path.exists(os.path.join(path, "_geoparquet_manifest.json"))
             or bool(glob.glob(os.path.join(path, "part-*.parquet")))))


def read_boundaries(spark: SparkSession, path: str) -> DataFrame:
    """On-board a GeoParquet boundary dataset as an engine boundary
    table (the third ingestion format next to GeoJSON lines and
    reference `.wkbs` caches). The footer is validated (spec-shaped
    ``geo`` entry, WKB encoding) and the geometry column is renamed to
    the engine's `geom_wkb`; every other BOUNDARY_SCHEMA column must
    already be present — which a `write_geoparquet` round-trip of a
    boundary table preserves byte-for-byte."""
    from pyspark.sql import functions as F

    from .geojson_source import BOUNDARY_SCHEMA

    meta = geoparquet_meta(path)  # raises unless every footer is valid
    gcol = meta["primary_column"]
    df = spark.read.parquet(path)
    if gcol != "geom_wkb":
        df = df.withColumnRenamed(gcol, "geom_wkb")
    missing = [f.name for f in BOUNDARY_SCHEMA.fields
               if f.name not in df.columns]
    if missing:
        raise ValueError(
            f"GeoParquet dataset at {path} lacks boundary columns "
            f"{missing}; export the full boundary table "
            f"(write_geoparquet(engine.boundaries, ...))")
    return df.select(*[F.col(f.name) for f in BOUNDARY_SCHEMA.fields])


def geoparquet_meta(path: str) -> dict:
    """Driver-side validation: open every part file's footer, require a
    spec-shaped ``geo`` entry, and merge. Raises on a missing/
    inconsistent footer — the contract a GeoParquet consumer relies on."""
    import pyarrow.parquet as pq

    files = sorted(glob.glob(os.path.join(path, "part-*.parquet")))
    if not files:
        raise FileNotFoundError(f"no part-*.parquet under {path}")
    merged: dict | None = None
    bbox = [float("inf"), float("inf"), float("-inf"), float("-inf")]
    gtypes: set[str] = set()
    for f in files:
        kv = pq.ParquetFile(f).schema_arrow.metadata or {}
        if GEO_KEY not in kv:
            raise ValueError(f"{f}: no 'geo' footer metadata")
        geo = json.loads(kv[GEO_KEY])
        col = geo["primary_column"]
        spec = geo["columns"][col]
        if spec["encoding"] != "WKB":
            raise ValueError(f"{f}: encoding {spec['encoding']!r} != 'WKB'")
        if merged is None:
            merged = geo
        elif geo["primary_column"] != merged["primary_column"]:
            raise ValueError(f"{f}: primary_column mismatch")
        b = spec["bbox"]
        bbox = [min(bbox[0], b[0]), min(bbox[1], b[1]),
                max(bbox[2], b[2]), max(bbox[3], b[3])]
        gtypes.update(spec["geometry_types"])
    col = merged["primary_column"]
    merged["columns"][col]["bbox"] = bbox
    merged["columns"][col]["geometry_types"] = sorted(gtypes)
    merged["n_files"] = len(files)
    return merged
