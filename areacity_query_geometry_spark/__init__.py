"""areacity_query_geometry_spark — a PySpark-native spatial-join +
tiling engine with the query capabilities of
xiangyuecn/AreaCity-Query-Geometry, built from scratch on the
DataFrame/SQL API (cell-grid equi-join + vectorized Arrow UDF refine
instead of an in-heap JTS STRtree).
"""
__version__ = "0.1.0"

GRID_VERSION = 2  # bump to invalidate persisted tile tables (wkbs @Version analog)
# v2: tiler._dissolve_window_runs splits Sutherland–Hodgman bridge runs
# out of clipped tile rings (clean multipolygon components; bridge-free
# tiles are byte-identical to v1)
