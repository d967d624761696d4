"""Tile builder: boundaries DataFrame → `tiles` DataFrame.

The distributed replacement for the reference's init-time grid split +
STRtree build (/root/reference/AreaCityQuery.java:1310-1375, 684):
each feature is polyfilled into grid cells by quadtree descent
(grid.polyfill_adaptive); fully-interior cells are emitted WITHOUT
geometry (point lookups on them skip exact math entirely — the
distributed analog of the reference's 4-point-rectangle shortcut,
README.md:288-296); boundary cells carry the feature's rings clipped to
the cell rect (the `polygon.intersection(gridRect)` analog) as WKB.

Single-level join key (hot-path design): every tile is keyed by its
BASE-resolution cell so the probe side computes exactly ONE cell id per
point (pure Spark SQL, whole-stage codegen) and the spatial join is a
plain equi-join with no per-point fan-out. Tiles finer than base_res
(adaptive splits over dense boundaries) are keyed by their base-res
ancestor; interior tiles coarser than base_res are expanded to their
base-res descendants.

Tile schema:
    cell_id   long    — BASE-res cell (the join key)
    res       int     — actual grid resolution of this tile
    region_id long    — owning feature
    deep      int     — denormalized admin level (join-time pushdown)
    kind      int     — 1 whole-cell interior (JVM-side accept),
                        2 interior sub-cell (vectorized rect test),
                        0 boundary (exact geometry refine)
    minx,miny,maxx,maxy double — tile cell rect (kind 2 test + stats)
    tile_wkb  binary  — clipped rings (even-odd), null for interior
    n_pts     int     — clipped-ring vertex count (skew statistics)
"""
from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType, DoubleType, IntegerType, LongType, StructField, StructType,
)

from . import grid
from .geom import core, predicates, wkb

TILE_SCHEMA = StructType([
    StructField("cell_id", LongType()),
    StructField("res", IntegerType()),
    StructField("region_id", LongType()),
    StructField("deep", IntegerType()),
    StructField("kind", IntegerType()),
    StructField("minx", DoubleType()),
    StructField("miny", DoubleType()),
    StructField("maxx", DoubleType()),
    StructField("maxy", DoubleType()),
    StructField("tile_wkb", BinaryType()),
    StructField("n_pts", IntegerType()),
])

# expand the clip window a hair so zero-width slivers (a region edge
# running exactly along a grid line) survive as testable thin polygons —
# without this, a point ON such an edge would false-negative.
CLIP_EPS = 1e-9


def clip_geom_to_cell(geom: dict, cell_id: int) -> bytes | None:
    minx, miny, maxx, maxy = grid.cell_bounds(cell_id)
    minx -= CLIP_EPS
    miny -= CLIP_EPS
    maxx += CLIP_EPS
    maxy += CLIP_EPS
    rings_out = []
    for rings in core.polygons_of(geom):
        for r in rings:
            c = predicates.clip_ring_to_rect(r, minx, miny, maxx, maxy)
            if len(c):
                rings_out.append(c)
    if not rings_out:
        return None
    return wkb.dumps({"type": "Polygon", "rings": rings_out})


def _expand_to_base(cid: int, base_res: int) -> np.ndarray:
    """All base_res descendants of a coarser cell (pure int math)."""
    r, ix, iy = (int(v) for v in grid.unpack(cid))
    k = base_res - r
    n = 1 << k
    xs = (ix << k) + np.arange(n, dtype=np.int64)
    ys = (iy << k) + np.arange(n, dtype=np.int64)
    gx, gy = np.meshgrid(xs, ys, indexing="ij")
    return grid.pack(base_res, gx.ravel(), gy.ravel())


def _ancestor_at(cid: int, base_res: int) -> int:
    r, ix, iy = (int(v) for v in grid.unpack(cid))
    k = r - base_res
    return int(grid.pack(base_res, ix >> k, iy >> k))


def _tile_batches(base_res: int, max_res: int, seg_budget: int):
    cols = ("cell_id", "res", "region_id", "deep", "kind",
            "minx", "miny", "maxx", "maxy", "tile_wkb", "n_pts")

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {k: [] for k in cols}

            def emit(key, res, rid, deep, kind, bounds, twkb, npts):
                out["cell_id"].append(key)
                out["res"].append(res)
                out["region_id"].append(rid)
                out["deep"].append(deep)
                out["kind"].append(kind)
                out["minx"].append(bounds[0])
                out["miny"].append(bounds[1])
                out["maxx"].append(bounds[2])
                out["maxy"].append(bounds[3])
                out["tile_wkb"].append(twkb)
                out["n_pts"].append(npts)

            for rid, deep, gwkb in zip(pdf["region_id"], pdf["deep"], pdf["geom_wkb"]):
                if gwkb is None:
                    continue  # EMPTY features stay queryable by attribute scan only (T4)
                geom = wkb.loads(bytes(gwkb))
                cells, kinds = grid.polyfill_adaptive(
                    geom, base_res=base_res, max_res=max_res, seg_budget=seg_budget
                )
                # batched clip: every boundary cell of this feature is
                # clipped against every ring in four vectorized passes
                # (predicates.clip_ring_to_rects) instead of re-walking
                # the full ring once per cell
                b_pos = np.nonzero(kinds == 0)[0]
                ring_csrs = []
                cell_rank: dict[int, int] = {}
                if len(b_pos):
                    bc = cells[b_pos]
                    bminx, bminy, bmaxx, bmaxy = grid.cells_bounds(bc)
                    bminx = bminx - CLIP_EPS
                    bminy = bminy - CLIP_EPS
                    bmaxx = bmaxx + CLIP_EPS
                    bmaxy = bmaxy + CLIP_EPS
                    for rings in core.polygons_of(geom):
                        for ring0 in rings:
                            ring_csrs.append(predicates.clip_ring_to_rects(
                                np.asarray(ring0, dtype=np.float64),
                                bminx, bminy, bmaxx, bmaxy))
                    cell_rank = {int(c): i for i, c in enumerate(bc.tolist())}
                for cid, kind in zip(cells.tolist(), kinds.tolist()):
                    r = cid >> 56
                    bounds = grid.cell_bounds(cid)
                    if kind == 1:
                        if r < base_res:
                            for key in _expand_to_base(cid, base_res).tolist():
                                emit(key, base_res, rid, deep, 1,
                                     grid.cell_bounds(key), None, 0)
                        elif r == base_res:
                            emit(cid, r, rid, deep, 1, bounds, None, 0)
                        else:  # interior sub-cell of a dense boundary cell
                            emit(_ancestor_at(cid, base_res), r, rid, deep, 2,
                                 bounds, None, 0)
                    else:
                        i = cell_rank[cid]
                        rings_out = []
                        for vx, vy, offsets in ring_csrs:
                            s, e2 = int(offsets[i]), int(offsets[i + 1])
                            if e2 > s:
                                n = e2 - s
                                ringarr = np.empty((n + 1, 2))
                                ringarr[:n, 0] = vx[s:e2]
                                ringarr[:n, 1] = vy[s:e2]
                                ringarr[n] = ringarr[0]
                                rings_out.append(ringarr)
                        if not rings_out:
                            continue
                        twkb = wkb.dumps({"type": "Polygon", "rings": rings_out})
                        key = cid if r == base_res else _ancestor_at(cid, base_res)
                        emit(key, r, rid, deep, 0, bounds, twkb,
                             (len(twkb) // 16) & 0x7FFFFFFF)
            yield pd.DataFrame(out)
    return fn


def build_tiles(
    boundaries: DataFrame,
    base_res: int = 10,
    max_res: int | None = None,
    seg_budget: int = 48,
) -> DataFrame:
    """One Spark job; features spread across all cores (the reference
    capped init at 5 threads, AreaCityQuery.java:551-552 — here the
    cluster width is the cap)."""
    if max_res is None:
        max_res = min(grid.MAX_RES, base_res + 4)
    spark = boundaries.sparkSession
    n_parts = max(2, spark.sparkContext.defaultParallelism * 2)
    src = boundaries.select("region_id", "deep", "geom_wkb").repartition(n_parts, "region_id")
    return src.mapInPandas(_tile_batches(base_res, max_res, seg_budget), TILE_SCHEMA)
