"""Douglas–Peucker polyline simplification, exact on the dyadic
lattice — the generalization operator a map-serving pipeline runs
before shipping geometry to a renderer (the reference ships
pre-simplified fixtures: its 大幅简化粗略版 files are exactly this
operator's output at a coarse tolerance).

Division-free: the classic split test "max perpendicular distance to
the chord > ε" is evaluated as cross² > ε²·|chord|² (both sides exact
int64 on 1/scale coordinates — cross ≤ 2·(scale·span)², fine through
span·scale < 2^15), so the recursion's every branch decision is
integer-exact and the DuckDB recursive-CTE oracle
(__spark_entry__.events_simplify_lines) reproduces the identical
vertex keep-set. Ties (two vertices equally farthest) split at the
SMALLEST index — numpy argmax's first-hit and the oracle's NOT
EXISTS tiebreak agree by construction. A degenerate chord (equal
endpoints) falls back to point distance² > ε².

Spark shape: ONE shuffle keys vertices by line id; each line
simplifies in a vectorized kernel (`applyInPandas`) — the explicit
stack iterates over OUTPUT splits (≤ kept vertices), while every
distance sweep inside an interval is a numpy vector op, the same
loop-over-results-not-rows budget as hull.py's chain walk. Lines are
independent, so 10^12 total vertices scale by line count; a single
pathological multi-billion-vertex line would need chunked DP (not
implemented — documented ceiling: per-line vertex count must fit an
executor's Arrow batch).
"""
from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F


def dp_keep_mask(ix: np.ndarray, iy: np.ndarray, eps2: int) -> np.ndarray:
    """Boolean keep-mask for one polyline's scaled-int vertices.
    eps2 = (ε·scale)². Endpoints always kept."""
    n = len(ix)
    keep = np.zeros(n, bool)
    if n == 0:
        return keep
    keep[0] = keep[-1] = True
    if n <= 2:
        return keep
    ix = ix.astype(np.int64)
    iy = iy.astype(np.int64)
    stack = [(0, n - 1)]
    while stack:
        i, j = stack.pop()
        if j - i < 2:
            continue
        kx = ix[i + 1:j]
        ky = iy[i + 1:j]
        dx = ix[j] - ix[i]
        dy = iy[j] - iy[i]
        ln2 = dx * dx + dy * dy
        if ln2 == 0:
            d = (kx - ix[i]) ** 2 + (ky - iy[i]) ** 2
            k = int(np.argmax(d))
            if d[k] > eps2:
                keep[i + 1 + k] = True
                stack.append((i, i + 1 + k))
                stack.append((i + 1 + k, j))
            continue
        cr = dx * (ky - iy[i]) - dy * (kx - ix[i])
        c2 = cr * cr
        k = int(np.argmax(c2))
        if c2[k] > eps2 * ln2:
            keep[i + 1 + k] = True
            stack.append((i, i + 1 + k))
            stack.append((i + 1 + k, j))
    return keep


def simplify_lines(vertices: DataFrame, eps_deg: float,
                   line_col: str = "line_id", seq_col: str = "seq",
                   lng_col: str = "lng", lat_col: str = "lat",
                   scale: int = 64) -> DataFrame:
    """vertices: one row per polyline vertex (line_col, seq_col,
    lng_col, lat_col), dyadic 1/scale coordinates, seq 0-based dense
    per line. Returns the kept vertices re-ranked:
    (line_col, rank, seq_col, lng_col, lat_col)."""
    eps2 = int(round(eps_deg * scale)) ** 2
    scaled = vertices.select(
        F.col(line_col).alias("line_id"),
        F.col(seq_col).cast("long").alias("seq"),
        F.round(F.col(lng_col) * scale).cast("long").alias("x"),
        F.round(F.col(lat_col) * scale).cast("long").alias("y"),
    )

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("seq")
        keep = dp_keep_mask(pdf["x"].to_numpy(), pdf["y"].to_numpy(), eps2)
        out = pdf[keep].copy()
        out["rank"] = np.arange(len(out), dtype=np.int64)
        return out[["line_id", "rank", "seq", "x", "y"]]

    kept = scaled.groupBy("line_id").applyInPandas(
        run, "line_id long, rank long, seq long, x long, y long")
    return kept.select(
        F.col("line_id").alias(line_col), "rank",
        F.col("seq").alias(seq_col),
        (F.col("x").cast("double") / scale).alias(lng_col),
        (F.col("y").cast("double") / scale).alias(lat_col),
    )
