import os
import sys

import pytest

os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
# glibc malloc tunables BEFORE the JVM starts (workers inherit): large
# numpy temporaries otherwise mmap/munmap per call and the page-fault
# churn serializes concurrent Arrow kernels (hostload.MALLOC_TUNING)
os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", "1073741824")
os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", "1073741824")


@pytest.fixture(scope="session")
def spark():
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder
        .master("local[4]")
        .appName("aqgs-tests")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


PROVINCE_FIXTURE = "/root/reference/仅供测试-全国省级GeoJSON数据-大幅简化粗略版.json"
CONTINENT_FIXTURE = "/root/reference/仅供测试-世界七大洲GeoJSON数据-大幅简化粗略版.json"


@pytest.fixture(scope="session")
def province_engine(spark):
    from areacity_query_geometry_spark.engine import SpatialEngine

    return SpatialEngine.from_geojson(spark, PROVINCE_FIXTURE, base_res=10)
