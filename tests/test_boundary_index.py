"""Broadcast boundary-index refine (engine._boundary_index /
_make_index_refine_fn) — the unshuffled Q1 boundary leg.

Must produce hit-sets IDENTICAL to the join-based refine on the same
tile table (same kernels; only the pair-formation plumbing differs),
respect the WKB byte budget, and fall back cleanly when over budget.
"""
import pyspark.sql.functions as F

from areacity_query_geometry_spark.engine import SpatialEngine


def _pts(spark, n):
    return spark.range(n).select(
        F.col("id").alias("point_id"),
        (73.0 + (F.col("id") * 37 % 6200) / 100.0).alias("lng"),
        (18.0 + (F.col("id") * 101 % 3600) / 100.0).alias("lat"),
    )


def _hits(eng, pts):
    return {(r.point_id, r.region_id)
            for r in eng.query_points(pts, with_props=False).collect()}


def test_index_path_equals_join_path(spark, province_engine):
    pts = _pts(spark, 3000)
    joined = SpatialEngine(
        spark, province_engine.boundaries, province_engine.tiles,
        base_res=province_engine.base_res,
        boundary_index_wkb_bytes=0)  # join-based refine
    assert province_engine._boundary_index() is not None
    assert joined._boundary_index() is None
    assert _hits(province_engine, pts) == _hits(joined, pts)


def test_budget_fallback(spark, province_engine):
    tiny = SpatialEngine(
        spark, province_engine.boundaries, province_engine.tiles,
        base_res=province_engine.base_res,
        boundary_index_wkb_bytes=1)
    assert tiny._boundary_index() is None
    assert tiny._bindex_off  # decision cached, no re-agg per query
    # and the engine still answers correctly through the join path
    pts = _pts(spark, 500)
    assert _hits(tiny, pts) == _hits(province_engine, pts)


def test_index_cell_table_matches_distinct_boundary_cells(
        spark, province_engine):
    bc, bcells = province_engine._boundary_index()
    n_expected = (province_engine.tiles.filter("kind != 1")
                  .select("cell_id").distinct().count())
    assert bcells.count() == n_expected
    idx = bc.value
    assert len(idx["cells"]) == n_expected
    assert idx["cell_ptr"][-1] == len(idx["region"])
    assert idx["seg_ptr"][-1] == len(idx["X1"])
    # kind-0 tiles all carry segments; kind-2 carry none
    import numpy as np

    seg_len = np.diff(idx["seg_ptr"])
    assert (seg_len[idx["kind"] == 0] > 0).all()
    assert (seg_len[idx["kind"] == 2] == 0).all()


def test_where_filter_stays_on_index_path_and_agrees(spark,
                                                     province_engine):
    """`where` rides the index path as an in-kernel keep-region array
    (since late r4): its hits must equal post-filtering the unfiltered
    hits, AND equal the join path's LEFT SEMI pruning."""
    eng = province_engine
    pts = _pts(spark, 2000)
    wh = "name = '广东省'"
    filtered = {
        (r.point_id, r.region_id)
        for r in eng.query_points(pts, where=wh, with_props=False).collect()}
    keep = {r.region_id for r in
            eng.boundaries.filter(wh).select("region_id").collect()}
    full = {(p, rid) for (p, rid) in _hits(eng, pts) if rid in keep}
    assert filtered == full
    saved = (eng._bindex, eng._bindex_off)
    try:
        eng._bindex, eng._bindex_off = None, True
        joined = {
            (r.point_id, r.region_id)
            for r in eng.query_points(
                pts, where=wh, with_props=False).collect()}
    finally:
        eng._bindex, eng._bindex_off = saved
    assert filtered == joined
