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

Spark shape: ONE shuffle keys vertices by line id
(repartition + sortWithinPartitions, so whole Arrow batches of
line-contiguous vertices reach `mapInPandas`), then the BATCH kernel
(`dp_keep_mask_batch`) advances every active interval of every line
in the batch per round with segment-wise vector ops
(`maximum.reduceat` argmax, exact first-index tiebreak) — the Python
loop runs O(max recursion depth) times total, not per line or per
split (measured ~10× over the per-line groupBy·applyInPandas
formulation at 1000-vertex lines, where pandas group dispatch and the
per-line stack dominated). Lines are independent, so 10^12 total
vertices scale by line count; a single pathological
multi-billion-vertex line would need chunked DP (not implemented —
documented ceiling: per-LINE vertex count must fit an executor's
memory; the kernel already carries lines across Arrow batch splits).
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


def dp_keep_mask_batch(ix: np.ndarray, iy: np.ndarray,
                       line_starts: np.ndarray, eps2: int) -> np.ndarray:
    """Breadth-first DP over MANY concatenated polylines at once:
    every active interval (across every line in the batch) advances
    per ROUND with segment-wise vector ops (`maximum.reduceat` argmax
    with exact first-index tiebreak), so the Python loop runs
    O(max recursion depth) times — not once per line or per split.
    Identical output to per-line `dp_keep_mask` by construction (the
    split vertex of an interval depends only on the interval, so
    traversal order is irrelevant); tests/test_simplify.py pins it.

    ix, iy: concatenated scaled-int vertices; line_starts: start
    offset per line plus a final sentinel len(ix)."""
    n = len(ix)
    keep = np.zeros(n, bool)
    if n == 0:
        return keep
    ix = ix.astype(np.int64)
    iy = iy.astype(np.int64)
    starts = line_starts[:-1]
    ends = line_starts[1:] - 1
    keep[starts] = True
    keep[ends] = True
    live = ends - starts >= 2
    I = starts[live].astype(np.int64)
    J = ends[live].astype(np.int64)
    while len(I):
        L = J - I - 1                       # interior vertices per interval
        seg = np.repeat(np.arange(len(I)), L)
        k = np.arange(L.sum()) - np.repeat(np.cumsum(L) - L, L) \
            + np.repeat(I + 1, L)           # global interior indices
        dxs = ix[J] - ix[I]
        dys = iy[J] - iy[I]
        ln2 = dxs * dxs + dys * dys
        dxv = dxs[seg]
        dyv = dys[seg]
        ax = ix[I][seg]
        ay = iy[I][seg]
        cr = dxv * (iy[k] - ay) - dyv * (ix[k] - ax)
        m = cr * cr
        deg = ln2[seg] == 0
        if deg.any():                       # closed-loop chords
            m = np.where(deg, (ix[k] - ax) ** 2 + (iy[k] - ay) ** 2, m)
        bounds = np.cumsum(L) - L
        seg_max = np.maximum.reduceat(m, bounds)
        # first index achieving the max (== dp_keep_mask's argmax)
        cand = np.where(m == seg_max[seg], k, np.iinfo(np.int64).max)
        split_at = np.minimum.reduceat(cand, bounds)
        thr = np.where(ln2 == 0, eps2, eps2 * ln2)
        do = seg_max > thr
        ks = split_at[do]
        keep[ks] = True
        I2 = np.concatenate([I[do], ks])
        J2 = np.concatenate([ks, J[do]])
        live = J2 - I2 >= 2
        I, J = I2[live], J2[live]
    return keep


_CHUNK_VERTS = 1 << 16  # ~64k verts → ≤ ~5 MB of round arrays: the
# breadth-first rounds stay cache-resident instead of streaming the
# whole partition's hundreds of MB through memory every round (the
# batched kernel's bandwidth cost was what broke 2→8-thread scaling
# on this host); python overhead stays O(rounds) per chunk of ~dozens
# of lines, not per line


def _simplify_block(pdf: pd.DataFrame, eps2: int) -> pd.DataFrame:
    """Run the batch kernel over a line-contiguous, seq-sorted block
    and attach per-line 0-based ranks (vectorized cumsum algebra).
    Lines are processed in cache-sized chunks of whole lines."""
    lid = pdf["line_id"].to_numpy()
    starts = np.flatnonzero(np.r_[True, lid[1:] != lid[:-1]])
    line_starts = np.r_[starts, len(lid)]
    seqs = pdf["seq"].to_numpy()
    interior = np.ones(len(lid), bool)
    interior[starts] = False
    if not (seqs[interior] > seqs[np.flatnonzero(interior) - 1]).all():
        raise ValueError(
            "simplify_lines: vertices not seq-sorted within line runs — "
            "input declared clustered but is not")
    x = pdf["x"].to_numpy()
    y = pdf["y"].to_numpy()
    keep = np.empty(len(lid), bool)
    c0 = 0
    while c0 < len(starts):
        c1 = int(np.searchsorted(line_starts,
                                 line_starts[c0] + _CHUNK_VERTS, "left"))
        c1 = min(max(c1, c0 + 1), len(starts))  # ≥1 line, ≤ sentinel
        lo, hi = line_starts[c0], line_starts[c1]
        keep[lo:hi] = dp_keep_mask_batch(
            x[lo:hi], y[lo:hi], line_starts[c0:c1 + 1] - lo, eps2)
        c0 = c1
    kcum = np.cumsum(keep)
    kept_before = np.r_[0, kcum[starts[1:] - 1]] if len(starts) > 1 \
        else np.zeros(1, np.int64)
    offs = np.repeat(kept_before, np.diff(line_starts))
    rank = (kcum - 1) - offs
    out = pdf[keep].copy()
    out["rank"] = rank[keep]
    return out[["line_id", "rank", "seq", "x", "y"]]


def simplify_lines(vertices: DataFrame, eps_deg: float,
                   line_col: str = "line_id", seq_col: str = "seq",
                   lng_col: str = "lng", lat_col: str = "lat",
                   scale: int = 64,
                   assume_clustered: bool = False) -> DataFrame:
    """vertices: one row per polyline vertex (line_col, seq_col,
    lng_col, lat_col), dyadic 1/scale coordinates, seq 0-based dense
    per line. Returns the kept vertices re-ranked:
    (line_col, rank, seq_col, lng_col, lat_col).

    assume_clustered=True skips the repartition + sort for inputs
    whose lines are ALREADY contiguous and seq-sorted within
    partitions with no line straddling a partition boundary — the
    layout trajectory stores actually use (bucketed/clustered by line
    id), and the zero-shuffle plan the engine's index paths set the
    pattern for: the only cost left is the Arrow hop and the kernel.
    The kernel asserts per-batch seq-contiguity, so a mis-declared
    unsorted input fails loudly; a line SPLIT ACROSS PARTITIONS is
    undetectable locally (each half looks valid) and yields two
    independently simplified halves — the caller owns that contract.

    The tolerance is quantized to the 1/scale lattice: the kernel
    compares integer-lattice squared distances against
    round(eps_deg*scale)^2, so any eps_deg below 1/(2*scale) snaps to
    0 (keep every non-collinear vertex). That sub-lattice request is
    almost certainly a unit mistake, so it warns (ADVICE r4)."""
    eps_l = int(round(eps_deg * scale))
    if eps_deg > 0 and eps_l == 0:
        import warnings
        warnings.warn(
            f"simplify_lines: eps_deg={eps_deg!r} is below the 1/{scale} "
            f"coordinate lattice and quantizes to 0 (no simplification "
            f"beyond collinear removal); smallest effective tolerance "
            f"is {1.0 / (2 * scale)} deg", stacklevel=2)
    eps2 = eps_l ** 2
    scaled = vertices.select(
        F.col(line_col).alias("line_id"),
        F.col(seq_col).cast("long").alias("seq"),
        F.round(F.col(lng_col) * scale).cast("long").alias("x"),
        F.round(F.col(lat_col) * scale).cast("long").alias("y"),
    )

    def run(batches):
        # one hash partition's lines arrive line-contiguous and
        # seq-sorted (repartition + sortWithinPartitions below);
        # Arrow may still split a partition into several batches, so
        # carry the tail line of each batch into the next
        carry = None
        seen: set = set()  # line-run revisit guard (clustered contract)
        for pdf in batches:
            if carry is not None:
                pdf = pd.concat([carry, pdf], ignore_index=True)
            if len(pdf) == 0:
                continue
            lid = pdf["line_id"].to_numpy()
            bound = np.flatnonzero(lid[1:] != lid[:-1])
            last_start = int(bound[-1]) + 1 if len(bound) else 0
            carry = pdf.iloc[last_start:]
            head = pdf.iloc[:last_start]
            if len(head):
                hl = head["line_id"].to_numpy()
                for g in hl[np.r_[True, hl[1:] != hl[:-1]]]:
                    if g in seen:
                        raise ValueError(
                            f"simplify_lines: line {g} appears in two "
                            "separate runs — input declared clustered "
                            "but is not line-contiguous")
                    seen.add(g)
                yield _simplify_block(head, eps2)
        if carry is not None and len(carry):
            g = carry["line_id"].iloc[0]
            if g in seen:
                raise ValueError(
                    f"simplify_lines: line {g} appears in two separate "
                    "runs — input declared clustered but is not "
                    "line-contiguous")
            yield _simplify_block(carry, eps2)

    part = scaled if assume_clustered \
        else scaled.repartition("line_id") \
                   .sortWithinPartitions("line_id", "seq")
    kept = part.mapInPandas(
        run, "line_id long, rank long, seq long, x long, y long")
    return kept.select(
        F.col("line_id").alias(line_col), "rank",
        F.col("seq").alias(seq_col),
        (F.col("x").cast("double") / scale).alias(lng_col),
        (F.col("y").cast("double") / scale).alias(lat_col),
    )
