"""Dense reference-shape boundary set (VERDICT r3 next-round #1): the
synthetic prov+city+district lattice must be deterministic, the right
shape (3,502 features / ~732k ring points at defaults), watertight
(shared edges sample identical vertices), and behave like the real
thing through the engine — every interior probe hits exactly its
district, city, and province, properly nested.
"""
from __future__ import annotations

import json

import numpy as np
import pytest
from pyspark.sql import functions as F

from areacity_query_geometry_spark import fixtures_dense as fd


def test_default_shape_and_determinism(tmp_path):
    p1, p2 = str(tmp_path / "a.json"), str(tmp_path / "b.json")
    info = fd.generate(p1)
    assert info["features"] == 3502  # 3264 districts + 204 cities + 34 prov
    assert 700_000 <= info["ring_points"] <= 760_000
    fd.generate(p2)
    assert open(p1, "rb").read() == open(p2, "rb").read()


def test_lines_parse_and_nest(tmp_path):
    path = str(tmp_path / "small.json")
    fd.generate(path, nx=8, ny=8, city_bx=2, city_by=2,
                prov_bx=4, prov_by=4, pts_per_edge=4)
    feats = []
    with open(path) as f:
        for line in f:
            if line.startswith('{"type":"Feature"'):
                feats.append(json.loads(line.rstrip(",\n")))
    assert len(feats) == 64 + 16 + 4
    by_deep: dict[str, list] = {}
    for ft in feats:
        pr = ft["properties"]
        by_deep.setdefault(pr["deep"], []).append(pr)
        ring = ft["geometry"]["coordinates"][0]
        assert ring[0] == ring[-1]  # closed
    assert [len(by_deep[d]) for d in ("0", "1", "2")] == [4, 16, 64]
    # id prefixes encode the nesting: district id startswith city id
    # prefix, city id startswith province prefix
    prov_ids = {p["id"] for p in by_deep["0"]}
    for c in by_deep["1"]:
        assert c["pid"] in prov_ids and c["id"][:2] == c["pid"][:2]
    city_ids = {c["id"] for c in by_deep["1"]}
    for d in by_deep["2"]:
        assert d["pid"] in city_ids and d["id"][:4] == d["pid"][:4]


def test_watertight_shared_edges(tmp_path):
    """Adjacent districts and their parent city/province must emit the
    SAME vertex coordinates along shared boundary — string-identical in
    the serialized JSON (the whole point of canonical edge sampling)."""
    path = str(tmp_path / "small.json")
    fd.generate(path, nx=4, ny=4, city_bx=2, city_by=2,
                prov_bx=2, prov_by=2, pts_per_edge=5)
    rings: dict[str, list] = {}
    with open(path) as f:
        for line in f:
            if line.startswith('{"type":"Feature"'):
                ft = json.loads(line.rstrip(",\n"))
                rings[ft["properties"]["name"]] = \
                    ft["geometry"]["coordinates"][0]
    pts = {n: {tuple(p) for p in r} for n, r in rings.items()}
    # district (0,0) shares its right edge with district (1,0): the
    # intersection must hold ≥ pts_per_edge+1 exact-equal vertices
    d00, d10 = pts["D110100"], pts["D110101"]
    assert len(d00 & d10) >= 6
    # the city containing both reproduces the outer vertices verbatim
    c = pts["C110100"]
    assert len(c & d00) >= 6


def test_probes_hit_exactly_three_nested_levels(spark, tmp_path):
    path = str(tmp_path / "mid.json")
    fd.generate(path, nx=8, ny=8, city_bx=2, city_by=2,
                prov_bx=4, prov_by=4, pts_per_edge=6)
    from areacity_query_geometry_spark.engine import SpatialEngine

    eng = SpatialEngine.from_geojson(spark, path, base_res=9)
    pts = spark.range(400).select(
        F.col("id").alias("point_id"),
        (73.5 + (F.col("id") * 37 % 6000) / 100.0).alias("lng"),
        (18.5 + (F.col("id") * 101 % 3400) / 100.0).alias("lat"))
    out = eng.query_points(pts).select("point_id", "deep", "id").collect()
    by_pt: dict[int, dict] = {}
    for r in out:
        by_pt.setdefault(r.point_id, {})[int(r.deep)] = r.id
    assert len(by_pt) == 400
    for v in by_pt.values():
        assert sorted(v) == [0, 1, 2]
        assert v[2][:4] == v[1][:4] and v[1][:2] == v[0][:2]
