"""S8 HTTP surface smoke tests (VERDICT r1 "next" #10): the four verbs,
the `{c, v, m}` envelope, `/{instance}/verb` routing, error envelopes
and the big-WKT cap — served by the real handler over the rectangle
fixture world, no golden-file server needed.
"""
from __future__ import annotations

import json
import threading
import urllib.parse
import urllib.request
from http.server import ThreadingHTTPServer

import pytest

from areacity_query_geometry_spark import fixtures, registry, tiler
from areacity_query_geometry_spark.engine import SpatialEngine


@pytest.fixture(scope="module")
def server(spark):
    import tools.http_api_demo as demo

    boundaries = fixtures.boundaries_df(spark).localCheckpoint(eager=True)
    tiles = tiler.build_tiles(boundaries, base_res=7, max_res=9) \
        .localCheckpoint(eager=True)
    registry.register("0", SpatialEngine(spark, boundaries, tiles, base_res=7))
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), demo.Handler)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{httpd.server_address[1]}"
    httpd.shutdown()


def _get(base, path, **params):
    qs = urllib.parse.urlencode(params)
    url = f"{base}{path}" + (f"?{qs}" if qs else "")
    try:
        with urllib.request.urlopen(url) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def _post(base, path, body_params, **qs_params):
    qs = urllib.parse.urlencode(qs_params)
    url = f"{base}{path}" + (f"?{qs}" if qs else "")
    data = urllib.parse.urlencode(body_params).encode()
    req = urllib.request.Request(
        url, data=data,
        headers={"Content-Type": "application/x-www-form-urlencoded"})
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_querypoint_envelope_and_hits(server):
    code, env = _get(server, "/0/querypoint", lng=1.5, lat=1.5)
    assert code == 200 and set(env) == {"c", "v", "m"} and env["c"] == 200
    names = {json.loads(p)["name"] for p in env["v"]["list"]}
    assert names == {"P00", "C00", "D00"}


def test_querypoint_hole_semantics(server):
    # (2.5, 2.5) sits in the hole carved from P00 and D00 — only the
    # hole-less city C00 matches (AreaCityQuery.java:69-85 analog)
    code, env = _get(server, "/0/querypoint", lng=2.5, lat=2.5)
    names = {json.loads(p)["name"] for p in env["v"]["list"]}
    assert names == {"C00"}


def test_querypoint_tolerance_radius(server):
    # 3 km west of the world: within 24-gon reach → nearest per level,
    # annotated with PointDistance
    code, env = _get(server, "/0/querypoint",
                     lng=-0.015625, lat=7.25, tolerance=2500)
    rows = [json.loads(p) for p in env["v"]["list"]]
    assert rows and all("PointDistance" in r for r in rows)
    # far west: beyond reach → zero rows, clean envelope
    code, env = _get(server, "/0/querypoint",
                     lng=-3.0, lat=7.25, tolerance=2500)
    assert code == 200 and env["v"]["list"] == []


def test_querygeometry_rect_and_bad_wkt(server):
    code, env = _get(server, "/0/querygeometry",
                     wkt="POLYGON ((1.5 1.5, 1.5 6.5, 3.5 6.5, 3.5 1.5, 1.5 1.5))")
    names = {json.loads(p)["name"] for p in env["v"]["list"]}
    assert {"P00", "C00", "D00", "D01"} <= names
    code, env = _get(server, "/0/querygeometry", wkt="NOT A WKT")
    assert code == 500 and env["c"] == 500


def test_querygeometry_arbitrary_wkt_types(server):
    """The reference's HTTP surface accepts ANY WKT
    (Test_HttpApiServer.java:117-137) — MULTILINESTRING, MULTIPOINT and
    GEOMETRYCOLLECTION probes must answer, not 500."""
    code, env = _get(server, "/0/querygeometry",
                     wkt="MULTILINESTRING ((1.5 1.5, 1.5 6.5), (21 21, 22 22))")
    assert code == 200
    names = {json.loads(p)["name"] for p in env["v"]["list"]}
    assert {"D00", "D01", "C22", "D44"} <= names  # both parts' hits union
    code, env = _get(server, "/0/querygeometry",
                     wkt="MULTIPOINT ((1.5 1.5), (21 21))")
    assert code == 200
    names = {json.loads(p)["name"] for p in env["v"]["list"]}
    assert {"D00", "D44"} <= names
    code, env = _get(server, "/0/querygeometry",
                     wkt="GEOMETRYCOLLECTION (POINT (1.5 1.5), "
                         "LINESTRING (21 21, 22 22))")
    assert code == 200
    names = {json.loads(p)["name"] for p in env["v"]["list"]}
    assert {"D00", "D44"} <= names


def test_readwkt_where_and_payload(server):
    code, env = _get(server, "/0/readwkt", where="id = 'S1'")
    assert code == 200
    rows = env["v"]["list"]
    assert len(rows) == 1 and rows[0]["wkt"].startswith("MULTIPOLYGON")


def test_debugreadgridsplits(server):
    code, env = _get(server, "/0/debugreadgridsplits", where="deep = 0")
    assert code == 200
    rows = env["v"]["list"]
    assert len(rows) == 4 and all(r["n_tiles"] > 0 for r in rows)


def test_post_matches_get(server):
    """Reference parity (Test_HttpApiServer.java:326-468): every verb
    answers POST with urlencoded-body params identically to GET."""
    _, get_env = _get(server, "/0/querypoint", lng=1.5, lat=1.5)
    code, post_env = _post(server, "/0/querypoint",
                           {"lng": "1.5", "lat": "1.5"})
    assert code == 200 and post_env == get_env


def test_post_body_merges_and_wins_over_query_string(server):
    # lat rides the query string, lng the body; a body lng overrides a
    # query-string lng (read-body-after-query ordering)
    code, env = _post(server, "/0/querypoint",
                      {"lng": "1.5"}, lng="99.0", lat="1.5")
    assert code == 200
    names = {json.loads(p)["name"] for p in env["v"]["list"]}
    assert names == {"P00", "C00", "D00"}


def test_post_big_wkt_probe(server):
    """The reference's stated reason for POST: WKT probes too big for a
    query string (Test_HttpApiServer.java:326). A ~600 KB polygon ring
    around (1.5, 1.5) must answer through the body."""
    import math

    pts = [
        (1.5 + 0.4 * math.cos(2 * math.pi * i / 20000),
         1.5 + 0.4 * math.sin(2 * math.pi * i / 20000))
        for i in range(20000)
    ]
    pts.append(pts[0])
    wkt = "POLYGON ((" + ", ".join(f"{x:.10f} {y:.10f}" for x, y in pts) + "))"
    assert len(wkt) > 500_000
    code, env = _post(server, "/0/querygeometry", {"wkt": wkt})
    assert code == 200
    names = {json.loads(p)["name"] for p in env["v"]["list"]}
    assert {"P00", "C00", "D00"} <= names


def test_routing_404(server):
    code, env = _get(server, "/9/querypoint", lng=1, lat=1)
    assert code == 404 and env["c"] == 404
    code, env = _get(server, "/0/nosuchverb")
    assert code == 404 and env["c"] == 404


def test_big_wkt_cap_counts_wkt_only(server, monkeypatch):
    # tiny cap: readwkt (real WKT payload) is refused...
    monkeypatch.setenv("AQGS_MAX_WKT_BYTES", "10")
    code, env = _get(server, "/0/readwkt", where="id = 'S1'")
    assert code == 500 and "WKT payload" in env["m"]
    # ...but a WKT-free response of any size passes (the cap counts WKT
    # bytes, not the whole envelope)
    code, env = _get(server, "/0/querypoint", lng=1.5, lat=1.5)
    assert code == 200 and len(json.dumps(env)) > 10
    # and the env-var escape hatch lifts it without editing source
    monkeypatch.setenv("AQGS_ALLOW_BIG_WKT", "1")
    code, env = _get(server, "/0/readwkt", where="id = 'S1'")
    assert code == 200
