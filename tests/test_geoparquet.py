"""GeoParquet 1.0 sink/source (sources/geoparquet.py).

The reference exports geometry only through its private `.wkbs` cache
and WKT-over-HTTP (/root/reference/AreaCityQuery.java:735-744); the
Spark engine additionally speaks the lakehouse-standard container.
Checks here: byte-exact WKB round-trip through Spark, spec-shaped
``geo`` footer metadata in EVERY part file, per-file and global bbox
correctness against independently recomputed extents, and third-party
readability (pyarrow as plain parquet, DuckDB scan + row parity).
"""
import json
import os

import numpy as np
import pytest

from areacity_query_geometry_spark.sources import geoparquet
from areacity_query_geometry_spark.geom import wkb as wkb_codec


@pytest.fixture(scope="module")
def gp_path(tmp_path_factory):
    return str(tmp_path_factory.mktemp("gp") / "boundaries_gp")


@pytest.fixture(scope="module")
def written(spark, province_engine, gp_path):
    df = province_engine.boundaries.select(
        "region_id", "id", "name", "deep", "geom_wkb").repartition(4)
    manifest = geoparquet.write_geoparquet(df, gp_path, "geom_wkb")
    return df, manifest


class TestWrite:
    def test_manifest_covers_all_rows(self, written, province_engine):
        df, manifest = written
        assert sum(m["n_rows"] for m in manifest) == df.count()
        assert 1 <= len(manifest) <= 4  # one file per non-empty partition

    def test_every_file_has_spec_footer(self, written, gp_path):
        import pyarrow.parquet as pq

        _, manifest = written
        for m in manifest:
            kv = pq.ParquetFile(m["file"]).schema_arrow.metadata
            geo = json.loads(kv[b"geo"])
            assert geo["version"] == "1.0.0"
            assert geo["primary_column"] == "geom_wkb"
            col = geo["columns"]["geom_wkb"]
            assert col["encoding"] == "WKB"
            assert set(col["geometry_types"]) <= {"Polygon", "MultiPolygon"}
            assert col["crs"] is None  # spec: null ⇒ OGC:CRS84 (lon/lat)
            assert col["bbox"] == [m["minx"], m["miny"], m["maxx"], m["maxy"]]

    def test_bbox_matches_recomputed_extents(self, written):
        """Per-file bbox == exact min/max over that file's ring
        coordinates, recomputed here straight from the parquet bytes."""
        import pyarrow.parquet as pq

        _, manifest = written
        for m in manifest:
            t = pq.read_table(m["file"])
            lo = np.array([np.inf, np.inf])
            hi = np.array([-np.inf, -np.inf])
            for buf in t.column("geom_wkb").to_pylist():
                g = wkb_codec.loads(buf)
                rings = (g["rings"] if g["type"] == "Polygon"
                         else [r for rs in g["polys"] for r in rs])
                for r in rings:
                    lo = np.minimum(lo, r.min(axis=0))
                    hi = np.maximum(hi, r.max(axis=0))
            assert [m["minx"], m["miny"]] == lo.tolist()
            assert [m["maxx"], m["maxy"]] == hi.tolist()

    def test_root_manifest(self, written, gp_path):
        _, manifest = written
        root = json.load(open(os.path.join(gp_path,
                                           "_geoparquet_manifest.json")))
        assert root["n_files"] == len(manifest)
        assert root["n_rows"] == sum(m["n_rows"] for m in manifest)
        assert root["bbox"][0] == min(m["minx"] for m in manifest)
        assert root["bbox"][3] == max(m["maxy"] for m in manifest)

    def test_mode_error_refuses_overwrite(self, written, spark, gp_path,
                                          province_engine):
        df = province_engine.boundaries.select("region_id", "geom_wkb")
        with pytest.raises(FileExistsError):
            geoparquet.write_geoparquet(df, gp_path, "geom_wkb",
                                        mode="error")

    def test_missing_column_raises(self, province_engine, tmp_path):
        with pytest.raises(ValueError, match="no column"):
            geoparquet.write_geoparquet(
                province_engine.boundaries, str(tmp_path / "x"), "nope")


class TestReadBack:
    def test_spark_roundtrip_byte_exact(self, written, spark, gp_path):
        df, _ = written
        back = geoparquet.read_geoparquet(spark, gp_path)
        a = {r["region_id"]: r for r in df.collect()}
        b = {r["region_id"]: r for r in back.collect()}
        assert a.keys() == b.keys()
        for k in a:
            assert bytes(a[k]["geom_wkb"]) == bytes(b[k]["geom_wkb"])
            assert a[k]["name"] == b[k]["name"]

    def test_merged_meta(self, written, gp_path):
        _, manifest = written
        meta = geoparquet.geoparquet_meta(gp_path)
        assert meta["n_files"] == len(manifest)
        col = meta["columns"]["geom_wkb"]
        assert col["bbox"][0] == min(m["minx"] for m in manifest)
        assert col["bbox"][2] == max(m["maxx"] for m in manifest)
        assert "MultiPolygon" in col["geometry_types"] \
            or "Polygon" in col["geometry_types"]

    def test_duckdb_reads_it(self, written, gp_path):
        """Interop floor: a third-party engine scans the dataset as
        plain parquet — row count, attribute values, and WKB payload
        lengths all agree."""
        import duckdb

        df, _ = written
        con = duckdb.connect()
        rows = con.execute(
            f"SELECT region_id, name, octet_length(geom_wkb) AS nb "
            f"FROM read_parquet('{gp_path}/part-*.parquet') "
            f"ORDER BY region_id").fetchall()
        mine = sorted((r["region_id"], r["name"], len(bytes(r["geom_wkb"])))
                      for r in df.collect())
        assert [(r[0], r[1], r[2]) for r in rows] == mine

    def test_meta_rejects_plain_parquet(self, spark, tmp_path):
        """A parquet dir without the footer entry is NOT GeoParquet."""
        p = str(tmp_path / "plain")
        spark.range(3).write.parquet(p)
        import glob as g
        import shutil

        plainfile = g.glob(p + "/part-*.parquet")[0]
        dst = str(tmp_path / "gp_fake")
        os.makedirs(dst)
        shutil.copy(plainfile, os.path.join(dst, "part-00000.parquet"))
        with pytest.raises(ValueError, match="no 'geo'"):
            geoparquet.geoparquet_meta(dst)


class TestOnboarding:
    def test_load_or_build_from_geoparquet(self, spark, province_engine,
                                           tmp_path):
        """Third ingestion format: export the boundary table as
        GeoParquet, then `load_or_build` an engine straight from the
        dataset directory — same hits as the GeoJSON-built engine."""
        from areacity_query_geometry_spark.sources import (
            geoparquet as gp, tile_store)

        bpath = str(tmp_path / "bounds_gp")
        gp.write_geoparquet(province_engine.boundaries, bpath, "geom_wkb")
        eng = tile_store.load_or_build(
            spark, bpath, str(tmp_path / "store"),
            base_res=province_engine.base_res)
        probes = spark.createDataFrame(
            [(0, 114.044346, 22.691963), (1, 116.407526, 39.904030)],
            "point_id long, lng double, lat double")
        got = sorted((r["point_id"], r["name"]) for r in
                     eng.query_points(probes).collect())
        assert got == [(0, "广东省"), (1, "北京市")]

    def test_onboarding_requires_boundary_columns(self, spark,
                                                  province_engine,
                                                  tmp_path):
        from areacity_query_geometry_spark.sources import geoparquet as gp

        p = str(tmp_path / "partial_gp")
        gp.write_geoparquet(
            province_engine.boundaries.select("region_id", "geom_wkb"),
            p, "geom_wkb")
        with pytest.raises(ValueError, match="lacks boundary columns"):
            gp.read_boundaries(spark, p)


class TestTilesExport:
    def test_boundary_tiles_export(self, province_engine, tmp_path):
        """The tile table itself exports: boundary tiles (kind≠1) carry
        the clipped polygon WKB — after the build-time bridge-run
        dissolve these are clean components any OGC consumer accepts."""
        from pyspark.sql import functions as F

        tiles = (province_engine.tiles.filter(F.col("kind") != 1)
                 .select("cell_id", "region_id", "kind",
                         F.col("tile_wkb").alias("geom")))
        path = str(tmp_path / "tiles_gp")
        manifest = geoparquet.write_geoparquet(tiles, path, "geom")
        assert sum(m["n_rows"] for m in manifest) == tiles.count()
        meta = geoparquet.geoparquet_meta(path)
        assert meta["columns"]["geom"]["encoding"] == "WKB"
