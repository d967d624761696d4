"""Console entry point — the ergonomic analog of the reference's
interactive console (/root/reference/Test.java menu):

    python -m areacity_query_geometry_spark build <geojson> <store_dir> [res]
    python -m areacity_query_geometry_spark query <store_dir> <lng> <lat> [tolerance_m]
    python -m areacity_query_geometry_spark probe <store_dir> <wkt>

`build` parses line-delimited GeoJSON, tiles it, and persists the
store (wkbs-cache analog; rerunning with matching params reuses it).
`query`/`probe` load the store and print one prop-JSON per hit.
"""
from __future__ import annotations

import os
import sys

os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")


def _spark():
    from pyspark.sql import SparkSession

    s = (SparkSession.builder.master(os.environ.get("SPARK_MASTER", "local[*]"))
         .appName("aqgs-cli").config("spark.ui.enabled", "false")
         .getOrCreate())
    s.sparkContext.setLogLevel("ERROR")
    return s


def main(argv: list[str]) -> int:
    if len(argv) < 3:
        print(__doc__)
        return 2
    cmd = argv[1]
    from .sources import tile_store

    if cmd == "build":
        geojson, store = argv[2], argv[3]
        res = int(argv[4]) if len(argv) > 4 else 13
        eng = tile_store.load_or_build(_spark(), geojson, store, base_res=res)
        print(f"store ready: {store} "
              f"(features={eng.boundaries.count()}, tiles={eng.tiles.count()})")
        return 0

    if cmd == "query":
        store = argv[2]
        lng, lat = float(argv[3]), float(argv[4])
        tol = float(argv[5]) if len(argv) > 5 else 0.0
        spark = _spark()
        eng = tile_store.load(spark, store)
        pts = spark.createDataFrame([(0, lng, lat)],
                                    "point_id long, lng double, lat double")
        if tol != 0:
            rows = eng.query_points_with_tolerance(pts, tol).collect()
            for r in rows:
                print(r.prop_json_out)
        else:
            for r in eng.query_points(pts).collect():
                print(r.prop_json)
        return 0

    if cmd == "probe":
        store, wkt = argv[2], argv[3]
        spark = _spark()
        eng = tile_store.load(spark, store)
        probes = spark.createDataFrame([(0, wkt)], "probe_id long, wkt string")
        for r in eng.query_geometry(probes).collect():
            print(r.prop_json)
        return 0

    print(f"unknown command {cmd!r}\n{__doc__}")
    return 2


if __name__ == "__main__":
    raise SystemExit(main(sys.argv))
