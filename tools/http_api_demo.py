"""Thin HTTP front-end demo over the engine — S8 parity
(/root/reference/Test_HttpApiServer.java): the same four verbs, the same
`{c, v, m}` JSON envelope and `/{instance}/verb` routing, served from
`http.server`. This is a DEMO driver (one Spark job per request); the
batch engine is the product — at scale, "requests" are rows of the docs
table, not HTTP calls.

Usage: python tools/http_api_demo.py [port] [geojson_path]
Routes (GET, or POST with a urlencoded body — the reference accepts
both, Test_HttpApiServer.java:326-468 / param parse :274-318; POST is
how big-WKT QueryGeometry probes that won't fit in a query string
arrive):
    /0/querypoint?lng=..&lat=..[&tolerance=..][&where=deep=0]
    /0/querygeometry?wkt=POLYGON((...))
    /0/readwkt?where=name='北京市'
    /0/debugreadgridsplits?where=deep=0
"""
from __future__ import annotations

import json
import os
import sys
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
# glibc malloc tunables BEFORE the JVM starts (workers inherit): large
# numpy temporaries otherwise mmap/munmap per call and the page-fault
# churn serializes concurrent Arrow kernels (hostload.MALLOC_TUNING)
os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", "1073741824")
os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", "1073741824")

from areacity_query_geometry_spark import registry as ENGINES_REG


class _Reg:
    def __contains__(self, k):
        return k in ENGINES_REG.instances()

    def __getitem__(self, k):
        return ENGINES_REG.get(k)

    def __setitem__(self, k, v):
        ENGINES_REG.register(k, v)


ENGINES = _Reg()

# big-WKT response cap (≙ AllowResponseBigWKT,
# /root/reference/Test_HttpApiServer.java:38-39, enforced :220-241).
# Counts only the WKT payload bytes (like the reference), NOT the whole
# envelope; both knobs are env-overridable at runtime so the cap can be
# lifted/tightened without editing source.


def _allow_big_wkt() -> bool:
    return os.environ.get("AQGS_ALLOW_BIG_WKT", "0") == "1"


def _max_wkt_bytes() -> int:
    return int(os.environ.get("AQGS_MAX_WKT_BYTES", str(20 * 1024 * 1024)))


def envelope(c: int, v, m: str = "") -> bytes:
    return json.dumps({"c": c, "v": v, "m": m}, ensure_ascii=False).encode()


def _injected_wkt_bytes(rows: list[str], wkt_key: str) -> int:
    """WKT payload size of prop_json rows carrying an injected
    `"<key>": "<wkt>"` suffix (Set_ReturnWKTKey echo) — everything from
    the key marker on is the WKT portion."""
    marker = f'"{wkt_key}": "'
    total = 0
    for p in rows:
        i = p.rfind(marker)
        if i >= 0:
            total += len(p[i + len(marker):].encode()) - 2  # strip `"}`
    return total


class Handler(BaseHTTPRequestHandler):
    def log_message(self, *a):  # quiet
        pass

    def _send(self, body: bytes, code: int = 200):
        self.send_response(code)
        self.send_header("Content-Type", "application/json; charset=utf-8")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):
        self._dispatch(body=None)

    def do_POST(self):
        # reference parity: POST params arrive urlencoded in the body
        # (Test_HttpApiServer.java:326-468) and merge with any query-
        # string params; body values win on key collision, matching the
        # reference's read-body-after-query ordering.
        try:
            n = int(self.headers.get("Content-Length", 0) or 0)
            body = self.rfile.read(n).decode("utf-8") if n else ""
        except Exception as e:
            self._send(envelope(500, None, f"bad body: {e}"), 500)
            return
        self._dispatch(body=body)

    def _dispatch(self, body):
        try:
            parts = self.path.split("?", 1)
            route = parts[0].strip("/").split("/")
            qs = urllib.parse.parse_qs(parts[1]) if len(parts) > 1 else {}
            if body:
                qs.update(urllib.parse.parse_qs(body))
            if len(route) != 2 or route[0] not in ENGINES:
                self._send(envelope(404, None, "unknown instance/route"), 404)
                return
            eng = ENGINES[route[0]]
            verb = route[1].lower()
            where = qs.get("where", [None])[0]
            wkt_key = qs.get("returnWKTKey", [None])[0]
            if where is None:
                # reference-style param filters (Test_HttpApiServer.java:184-219)
                from areacity_query_geometry_spark.functions import filters
                preds = []
                if "id" in qs:
                    preds.append(filters.id_where(qs["id"][0]))
                if "pid" in qs:
                    preds.append(filters.id_where(qs["pid"][0], col="pid"))
                if "deep" in qs:
                    preds.append(filters.deep_where(int(qs["deep"][0])))
                if "extPath" in qs:
                    preds.append(filters.ext_path_where(qs["extPath"][0]))
                where = " AND ".join(preds) if preds else None
            wkt_bytes = 0
            if verb == "querypoint":
                lng = float(qs["lng"][0])
                lat = float(qs["lat"][0])
                tol = float(qs.get("tolerance", [0])[0])
                pts = eng.spark.createDataFrame(
                    [(0, lng, lat)], "point_id long, lng double, lat double")
                if tol != 0:
                    df = eng.query_points_with_tolerance(pts, tol, where=where)
                    rows = [r.prop_json_out for r in df.collect()]
                else:
                    df = eng.query_points(pts, where=where,
                                          return_wkt_key=wkt_key)
                    rows = [r.prop_json for r in df.collect()]
                if wkt_key:
                    wkt_bytes = _injected_wkt_bytes(rows, wkt_key)
            elif verb == "querygeometry":
                wkt_in = qs["wkt"][0]
                # reject unparseable WKT with an error envelope (the
                # reference errors on bad params, Test_HttpApiServer.java)
                # instead of silently matching nothing
                from areacity_query_geometry_spark.geom import (
                    core as _core, wkt as _wkt,
                )
                if _core.is_empty(_wkt.loads(wkt_in)) and "EMPTY" not in wkt_in.upper():
                    self._send(envelope(500, None, "wkt invalid"), 500)
                    return
                probes = eng.spark.createDataFrame(
                    [(0, wkt_in)], "probe_id long, wkt string")
                rows = [r.prop_json for r in eng.query_geometry(
                    probes, where=where, return_wkt_key=wkt_key).collect()]
                if wkt_key:
                    wkt_bytes = _injected_wkt_bytes(rows, wkt_key)
            elif verb == "readwkt":
                rows = [
                    {"prop": r.prop_json, "wkt": r.wkt}
                    for r in eng.read_wkt_features(where=where).collect()
                ]
                wkt_bytes = sum(len(r["wkt"].encode()) for r in rows)
            elif verb == "debugreadgridsplits":
                rows = [
                    {"name": r.name, "n_tiles": r.n_tiles, "wkt": r.tiles_wkt}
                    for r in eng.debug_tile_splits_wkt(where=where).collect()
                ]
                wkt_bytes = sum(len(r["wkt"].encode()) for r in rows)
            else:
                self._send(envelope(404, None, f"unknown verb {verb}"), 404)
                return
            cap = _max_wkt_bytes()
            if not _allow_big_wkt() and wkt_bytes > cap:
                self._send(envelope(
                    500, None,
                    f"matched {len(rows)} rows but their WKT payload "
                    f"({wkt_bytes} bytes) exceeds the {cap}-byte limit; set "
                    "AQGS_ALLOW_BIG_WKT=1 to lift it"), 500)
                return
            self._send(envelope(200, {"list": rows}))
        except Exception as e:  # envelope the error like the reference does
            self._send(envelope(500, None, f"{type(e).__name__}: {e}"), 500)


def main():
    port = int(sys.argv[1]) if len(sys.argv) > 1 else 9527
    path = sys.argv[2] if len(sys.argv) > 2 else \
        "/root/reference/仅供测试-全国省级GeoJSON数据-大幅简化粗略版.json"

    from pyspark.sql import SparkSession

    from areacity_query_geometry_spark.engine import SpatialEngine

    spark = (SparkSession.builder.master("local[4]")
             .appName("aqgs-http").config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    ENGINES["0"] = SpatialEngine.from_geojson(spark, path, base_res=11)
    continents = ("/root/reference/"
                  "仅供测试-世界七大洲GeoJSON数据-大幅简化粗略版.json")
    ENGINES["1"] = SpatialEngine.from_geojson(spark, continents, base_res=7)
    print(f"serving instance 0 ({path}) + 1 (continents) on :{port}")
    ThreadingHTTPServer(("127.0.0.1", port), Handler).serve_forever()


if __name__ == "__main__":
    main()
