"""Distributed convex-hull aggregate: per-group hull vertices in
canonical CCW order, exact on dyadic-lattice coordinates.

The reference engine exposes no hull operator; this is part of the
§2.6 spatial-analytics widening (like knn.py / overlay.py /
linework.py): the classic "combine partial results" aggregation shape
that a driver-side or single-node engine cannot express but Spark
states naturally in two stages:

- Stage 1 (map-side combine, NO shuffle): `mapInPandas` reduces every
  input partition to the hull vertices of the points it holds. Any
  vertex of hull(S) is a vertex of hull(P) for every P ⊆ S containing
  it, so per-partition hulls are a LOSSLESS superset of the global
  hull's vertices — the classical distributed-hull identity. The
  reduction is numpy-vectorized: the Akl–Toussaint octagon filter
  (8 extreme-direction points; anything strictly inside their octagon
  is provably interior) discards the bulk of each batch in O(n)
  vector ops, and only the few survivors enter the monotone-chain
  walk, keeping per-row Python off the hot path (CLAUDE.md rule). A
  degenerate all-on-a-circle partition falls back to an O(n) chain —
  correct, just not sublinear.
- Stage 2 (ONE shuffle of hull-sized data): `groupBy(group)`
  `applyInPandas` re-runs the same chain over the union of partial
  hulls — O(groups × partitions × hull_size) rows cross the wire, not
  the input. At 10^12 points that is the difference between a
  terabyte shuffle and kilobytes.

Exactness: callers pass dyadic 1/`scale` coordinates (repo
convention); points scale to int64 exactly, all orientation tests are
int64 cross products (|coord| < 2^20 → products < 2^41, no overflow),
and the DuckDB oracle's gift-wrapping recursive CTE (see
__spark_entry__.events_convex_hull) reproduces the identical vertex
sequence bit-for-bit.

Canonical order: strictly convex vertices (collinear edge-interior
points dropped), CCW, rank 0 at the lexicographically smallest
(x, y). Degenerate groups: 1 point → 1 vertex; collinear set → its 2
extreme points.
"""
from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F


def _octagon_filter(px: np.ndarray, py: np.ndarray) -> np.ndarray:
    """Akl–Toussaint: boolean mask of points NOT strictly inside the
    octagon spanned by the 8 direction-extreme points. Pure vector
    ops; keeps every possible hull vertex."""
    if px.size <= 16:
        return np.ones(px.size, bool)
    ex = np.empty(8, np.int64)
    ey = np.empty(8, np.int64)
    # extremes of x, y, x+y, x-y (min and max of each)
    for i, proj in enumerate((px, py, px + py, px - py)):
        ex[2 * i] = px[np.argmin(proj)]
        ey[2 * i] = py[np.argmin(proj)]
        ex[2 * i + 1] = px[np.argmax(proj)]
        ey[2 * i + 1] = py[np.argmax(proj)]
    # order the (≤8 distinct) extreme points CCW around their mean
    # (float angles only ORDER the filter polygon — the containment
    # test below stays integer-exact, so fp here cannot lose a vertex)
    ang = np.arctan2(ey - ey.mean(), ex - ex.mean())
    order = np.argsort(ang)
    ox, oy = ex[order], ey[order]
    keep_poly = np.ones(len(ox), bool)
    keep_poly[1:] = (np.diff(ox) != 0) | (np.diff(oy) != 0)
    ox, oy = ox[keep_poly], oy[keep_poly]
    if len(ox) < 3:
        return np.ones(px.size, bool)
    inside = np.ones(px.size, bool)
    for i in range(len(ox)):
        ax, ay = ox[i], oy[i]
        bx, by = ox[(i + 1) % len(ox)], oy[(i + 1) % len(ox)]
        # strictly-left test per edge; on-edge points are kept (they
        # may be hull vertices of the full set)
        inside &= (bx - ax) * (py - ay) - (by - ay) * (px - ax) > 0
    return ~inside


def _chain(px: np.ndarray, py: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Strict monotone chain over int64 coords → CCW hull vertices
    starting at the lexicographic (x, y) minimum. Runs AFTER the
    octagon filter, so its Python loop sees only candidate vertices."""
    pts = np.unique(np.stack([px, py], axis=1), axis=0)  # lex-sorted
    n = len(pts)
    if n <= 2:
        return pts[:, 0], pts[:, 1]

    def half(p: np.ndarray) -> list[np.ndarray]:
        out: list[np.ndarray] = []
        for row in p:
            while len(out) >= 2:
                ox, oy = out[-2]
                ax, ay = out[-1]
                if (ax - ox) * (row[1] - oy) - (ay - oy) * (row[0] - ox) <= 0:
                    out.pop()
                else:
                    break
            out.append(row)
        return out

    lower = half(pts)
    upper = half(pts[::-1])
    ring = lower[:-1] + upper[:-1]
    if len(ring) == 0:  # fully collinear: keep the two extremes
        ring = [pts[0], pts[-1]]
    arr = np.stack(ring, axis=0)
    return arr[:, 0], arr[:, 1]


def _reduce_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    out = []
    for g, grp in pdf.groupby("g", sort=False):
        px = grp["x"].to_numpy(np.int64)
        py = grp["y"].to_numpy(np.int64)
        m = _octagon_filter(px, py)
        hx, hy = _chain(px[m], py[m])
        out.append(pd.DataFrame({"g": g, "x": hx, "y": hy}))
    if not out:
        return pd.DataFrame({"g": pd.Series(dtype=object),
                             "x": pd.Series(dtype=np.int64),
                             "y": pd.Series(dtype=np.int64)})
    return pd.concat(out, ignore_index=True)


def convex_hull(points: DataFrame, group_col: str = "group_id",
                lng_col: str = "lng", lat_col: str = "lat",
                scale: int = 64) -> DataFrame:
    """Per-group convex hull of (lng, lat) points on the 1/scale
    dyadic lattice. Returns (group_col, rank, lng, lat): strictly
    convex CCW ring, rank 0 at the lexicographic min vertex.

    Plan shape: scan → mapInPandas (partial hulls, no exchange) →
    ONE hash exchange of hull-sized rows → applyInPandas merge.
    """
    spark = points.sparkSession
    # Intermediate schemas carry the caller's group column type through
    # both Arrow hops — a long/int group id must not be forced to string
    # (ADVICE r4: hardcoded 'g string' broke non-string group columns at
    # Arrow conversion inside mapInPandas).
    g_type = points.schema[group_col].dataType.simpleString()
    scaled = points.select(
        F.col(group_col).alias("g"),
        F.round(F.col(lng_col) * scale).cast("long").alias("x"),
        F.round(F.col(lat_col) * scale).cast("long").alias("y"),
    )
    schema = f"g {g_type}, x long, y long"

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _reduce_batch(pdf)

    partials = scaled.mapInPandas(partial, schema=schema)

    out_schema = f"g {g_type}, rank long, x long, y long"

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        red = _reduce_batch(pdf)
        red["rank"] = red.groupby("g", sort=False).cumcount()
        return red[["g", "rank", "x", "y"]]

    merged = partials.groupBy("g").applyInPandas(merge, schema=out_schema)
    return merged.select(
        F.col("g").alias(group_col),
        F.col("rank"),
        (F.col("x").cast("double") / scale).alias(lng_col),
        (F.col("y").cast("double") / scale).alias(lat_col),
    )
