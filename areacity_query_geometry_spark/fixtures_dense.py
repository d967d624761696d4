"""Deterministic reference-shape boundary set (VERDICT r3 next-round
#1): the official headline measured 34 provinces, but the reference's
11,034-QPS baseline runs on its FULL prov+city+district dataset —
3,632 features / ~700k ring points (/root/reference/README.md:174-196,
176 MB export). This module synthesizes a boundary set of exactly that
shape so the headline can be measured apples-to-apples at the
reference's own density — no external data, reproducible bytes.

Construction: a 3-level nested lattice over the China bbox
(lng 73–135, lat 18–54) — nx×ny fine cells are the districts
(deep=2), 4×4 blocks of them the cities (deep=1), 24×4 blocks the
provinces (deep=0); defaults give 3,264 + 204 + 34 = 3,502 features.
Every fine-cell edge is sampled at `pts_per_edge`+1 canonical vertices
shared verbatim by both neighbours and by the parent levels (cities
and provinces walk the SAME fine-edge polylines), then the whole
vertex cloud passes through one smooth global displacement field
(sin/cos warp, |∂D| < 1 so the map is injective): boundaries become
oblique wiggly curves — no axis-aligned shortcuts — while the
partition stays watertight and exactly nested. Every interior probe
therefore hits exactly 3 features (its district, city, province),
the reference's own hit pattern on prov+city+district data.

Defaults: 3,502 features, 4 × 40 × 3,264 + ... ≈ 729k ring points,
~30 MB of GeoJSON in the reference's one-feature-per-line layout.
"""
from __future__ import annotations

import os

import numpy as np

VERSION = "v1"
X0, X1, Y0, Y1 = 73.0, 135.0, 18.0, 54.0


def _displace(x: np.ndarray, y: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Smooth global warp (injective: |gradient| ≈ 0.5 < 1). Two
    octaves — a continental swell plus a short-wave ripple — so edge
    directions are diverse at both tile and segment scale."""
    dx = (0.22 * np.sin(2 * np.pi * y / 7.3) * np.cos(2 * np.pi * x / 11.1)
          + 0.03 * np.sin(2 * np.pi * y / 0.71 + 0.13 * x))
    dy = (0.22 * np.cos(2 * np.pi * x / 8.7) * np.sin(2 * np.pi * y / 9.4)
          + 0.03 * np.sin(2 * np.pi * x / 0.83 + 0.11 * y))
    return x + dx, y + dy


def _block_ring(i0: int, j0: int, i1: int, j1: int, xs: np.ndarray,
                ys: np.ndarray, m: int) -> tuple[np.ndarray, np.ndarray]:
    """Closed CCW ring of the straight-lattice block [i0,i1]×[j0,j1],
    walking fine-cell edges with the CANONICAL m+1-point sampling per
    edge (linspace incl. both endpoints; consecutive edges drop the
    duplicated corner) — neighbours and parents reproduce identical
    vertices, so the partition is watertight by construction."""
    bx, by = [], []

    def seg(xa, ya, xb, yb):
        ex = np.linspace(xa, xb, m + 1)[:-1]
        ey = np.linspace(ya, yb, m + 1)[:-1]
        bx.append(ex)
        by.append(ey)

    for c in range(i0, i1):          # bottom, left→right
        seg(xs[c], ys[j0], xs[c + 1], ys[j0])
    for r in range(j0, j1):          # right, bottom→top
        seg(xs[i1], ys[r], xs[i1], ys[r + 1])
    for c in range(i1, i0, -1):      # top, right→left
        seg(xs[c], ys[j1], xs[c - 1], ys[j1])
    for r in range(j1, j0, -1):      # left, top→bottom
        seg(xs[i0], ys[r], xs[i0], ys[r - 1])
    rx = np.concatenate(bx)
    ry = np.concatenate(by)
    rx = np.append(rx, rx[0])        # close the ring
    ry = np.append(ry, ry[0])
    return rx, ry


def generate(path: str, nx: int = 48, ny: int = 68,
             city_bx: int = 4, city_by: int = 4,
             prov_bx: int = 24, prov_by: int = 4,
             pts_per_edge: int = 40) -> dict:
    """Write the dense fixture GeoJSON to `path` (one feature per line,
    the reference export layout the line scan expects). Returns
    {"features": n, "ring_points": n}."""
    if nx % city_bx or ny % city_by or nx % prov_bx or ny % prov_by:
        raise ValueError("block sizes must divide the fine grid")
    xs = np.linspace(X0, X1, nx + 1)
    ys = np.linspace(Y0, Y1, ny + 1)
    m = pts_per_edge

    lines: list[str] = ['{"type":"FeatureCollection","features":[']
    n_pts = 0
    specs: list[tuple[int, str, str, int, int, int, int]] = []
    # provinces (deep 0) → cities (deep 1) → districts (deep 2); id is
    # the reference-style numeric admin code, pid the parent's
    for pj in range(ny // prov_by):
        for pi in range(nx // prov_bx):
            p = pj * (nx // prov_bx) + pi
            specs.append((0, f"{p + 11:02d}0000", "0",
                          pi * prov_bx, pj * prov_by,
                          (pi + 1) * prov_bx, (pj + 1) * prov_by))
    for cj in range(ny // city_by):
        for ci in range(nx // city_bx):
            c = cj * (nx // city_bx) + ci
            pi = (ci * city_bx) // prov_bx
            pj = (cj * city_by) // prov_by
            p = pj * (nx // prov_bx) + pi
            specs.append((1, f"{p + 11:02d}{c + 1:02d}00", f"{p + 11:02d}0000",
                          ci * city_bx, cj * city_by,
                          (ci + 1) * city_bx, (cj + 1) * city_by))
    for j in range(ny):
        for i in range(nx):
            d = j * nx + i
            ci = i // city_bx
            cj = j // city_by
            c = cj * (nx // city_bx) + ci
            pi = i // prov_bx
            pj = j // prov_by
            p = pj * (nx // prov_bx) + pi
            specs.append((2, f"{p + 11:02d}{c + 1:02d}{d % 100:02d}",
                          f"{p + 11:02d}{c + 1:02d}00", i, j, i + 1, j + 1))

    level_name = {0: "P", 1: "C", 2: "D"}
    for k, (deep, fid, pid, i0, j0, i1, j1) in enumerate(specs):
        rx, ry = _block_ring(i0, j0, i1, j1, xs, ys, m)
        wx, wy = _displace(rx, ry)
        cx, cy = _displace(np.array([(xs[i0] + xs[i1]) / 2]),
                           np.array([(ys[j0] + ys[j1]) / 2]))
        coords = ",".join(f"[{x:.6f},{y:.6f}]" for x, y in zip(wx, wy))
        name = f"{level_name[deep]}{fid}"
        ext_path = f"{name} L{deep}"
        tail = "," if k < len(specs) - 1 else ""
        lines.append(
            '{"type":"Feature","properties":{'
            f'"id":"{fid}","pid":"{pid}","deep":"{deep}","name":"{name}",'
            f'"ext_path":"{ext_path}",'
            f'"geo_wkt":"POINT ({cx[0]:.6f} {cy[0]:.6f})"'
            '},"geometry":{"type":"Polygon","coordinates":[['
            + coords + "]]}}" + tail)
        n_pts += len(wx)
    lines.append("]}")
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        f.write("\n".join(lines))
    os.replace(tmp, path)
    return {"features": len(specs), "ring_points": n_pts}


def ensure(path: str | None = None) -> str:
    """Default-config fixture, cached on disk (generation is a few
    seconds of numpy; every bench JVM calls this untimed)."""
    if path is None:
        path = f"/tmp/aqgs_dense_fixture_{VERSION}.json"
    if not os.path.exists(path):
        generate(path)
    return path
