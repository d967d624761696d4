"""IcebergStoreFormat seam contract (VERDICT r2 next-round #9).

No iceberg-spark-runtime jar exists in this container, so the
`writeTo(...).using("iceberg")` data path cannot execute here — these
tests pin everything AROUND it so the seam is tested code, not trusted
code:

1. the loud-failure contract: constructing against an unconfigured
   catalog raises immediately with actionable guidance; a configured
   but jar-less catalog fails loudly at first use, never silently;
2. the metadata path (write_meta/read_meta) EXECUTES FOR REAL against
   the Spark session catalog — SET/SHOW TBLPROPERTIES is the same SQL
   surface Iceberg tables expose — including the quote-escaping and
   JSON round-trip symmetry fixed in ADVICE r2 #2.
"""
from __future__ import annotations

import pytest

from areacity_query_geometry_spark.sources.store_format import (
    IcebergStoreFormat, ParquetStoreFormat,
)


class TestLoudFailure:
    def test_unconfigured_catalog_raises_at_construction(self, spark):
        with pytest.raises(RuntimeError, match="no Spark catalog 'lake'"):
            IcebergStoreFormat(spark, "lake")

    def test_error_names_the_fix(self, spark):
        with pytest.raises(RuntimeError, match="iceberg-spark-runtime"):
            IcebergStoreFormat(spark, "lake")

    def test_configured_but_jarless_catalog_fails_loudly(self, spark):
        # conf points at the Iceberg catalog impl, but the jar is absent:
        # construction passes (the conf exists), first USE must raise —
        # never a silent no-op write
        spark.conf.set("spark.sql.catalog.fakecat",
                       "org.apache.iceberg.spark.SparkCatalog")
        try:
            fmt = IcebergStoreFormat(spark, "fakecat")
            df = spark.range(3).selectExpr("id AS region_id")
            with pytest.raises(Exception):
                fmt.write_boundaries(df, "ns")
        finally:
            spark.conf.unset("spark.sql.catalog.fakecat")


class TestMetaPathExecutes:
    """write_meta/read_meta run the real SET/SHOW TBLPROPERTIES SQL
    against the session catalog — identical command surface to an
    Iceberg table, minus the jar."""

    @pytest.fixture()
    def fmt_and_store(self, spark, tmp_path):
        spark.sql("CREATE DATABASE IF NOT EXISTS aqgs_seam_test")
        spark.sql("DROP TABLE IF EXISTS spark_catalog.aqgs_seam_test.tiles")
        spark.range(2).write.saveAsTable("spark_catalog.aqgs_seam_test.tiles")
        fmt = IcebergStoreFormat.__new__(IcebergStoreFormat)
        fmt.catalog = "spark_catalog"
        yield fmt, "aqgs_seam_test"
        spark.sql("DROP TABLE IF EXISTS spark_catalog.aqgs_seam_test.tiles")
        spark.sql("DROP DATABASE IF EXISTS aqgs_seam_test")

    def test_meta_roundtrip_types(self, spark, fmt_and_store):
        fmt, store = fmt_and_store
        meta = {"version": 3, "res": 7, "budget": 48, "label": "cn-2024"}
        fmt.write_meta(spark, store, meta)
        assert fmt.read_meta(spark, store) == meta

    def test_meta_quote_injection_safe(self, spark, fmt_and_store):
        # a value with single quotes must neither break the statement
        # nor inject into it (ADVICE r2 #2)
        fmt, store = fmt_and_store
        meta = {"note": "it's a 'quoted' value", "n": 1}
        fmt.write_meta(spark, store, meta)
        assert fmt.read_meta(spark, store) == meta

    def test_read_meta_none_for_missing_table(self, spark, fmt_and_store):
        fmt, _ = fmt_and_store
        assert fmt.read_meta(spark, "aqgs_seam_test_nonexistent") is None


class TestFormatInterchange:
    def test_parquet_format_same_interface(self, spark, tmp_path):
        """The two formats expose the identical surface — swapping is
        one constructor argument (the seam's whole point)."""
        store = str(tmp_path / "store")
        fmt = ParquetStoreFormat()
        df = spark.range(4).selectExpr(
            "id AS cell_id", "id * 10 AS region_id")
        fmt.write_tiles(df, store)
        fmt.write_meta(spark, store, {"version": 1})
        back = fmt.read_tiles(spark, store)
        assert sorted(r.cell_id for r in back.collect()) == [0, 1, 2, 3]
        assert fmt.read_meta(spark, store) == {"version": 1}
        for name in ("write_boundaries", "write_tiles", "write_meta",
                     "read_boundaries", "read_tiles", "read_meta"):
            assert hasattr(IcebergStoreFormat, name)
            assert hasattr(ParquetStoreFormat, name)
