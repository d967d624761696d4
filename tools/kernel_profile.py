"""cProfile the index-refine kernel on a saved index snapshot (no
Spark): `python tools/kernel_profile.py build` once to snapshot the
dense index to /tmp/aqgs_dense_index.npz, then
`python tools/kernel_profile.py [n] [batch]` to profile the kernel.
"""
from __future__ import annotations

import cProfile
import os
import pstats
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
# glibc malloc tunables BEFORE the JVM starts (workers inherit): large
# numpy temporaries otherwise mmap/munmap per call and the page-fault
# churn serializes concurrent Arrow kernels (hostload.MALLOC_TUNING)
os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", "1073741824")
os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", "1073741824")

import numpy as np
import pandas as pd

SNAP = "/tmp/aqgs_dense_index.npz"


class FakeBroadcast:
    def __init__(self, v):
        self.value = v


def build():
    from pyspark.sql import SparkSession

    from areacity_query_geometry_spark import fixtures_dense
    from areacity_query_geometry_spark.engine import SpatialEngine

    spark = (SparkSession.builder.master("local[8]")
             .config("spark.driver.memory", "32g")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    eng = SpatialEngine.from_geojson(
        spark, fixtures_dense.ensure(), base_res=13)
    t0 = time.time()
    bc, _ = eng._boundary_index()
    print(f"index_build_sec={time.time() - t0:.1f}")
    np.savez(SNAP, **bc.value)
    spark.stop()


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "build":
        build()
        return
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 130_000
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 65536
    idx = {k: v for k, v in np.load(SNAP).items()}

    from areacity_query_geometry_spark import grid
    from areacity_query_geometry_spark.engine import _make_index_refine_fn

    rng = np.arange(n, dtype=np.int64)
    cells = idx["cells"][rng % len(idx["cells"])]
    bx0, by0, bx1, by1 = grid.cells_bounds(cells)
    fx = ((rng * 2654435761) % 1000) / 1000.0
    fy = ((rng * 40503) % 1000) / 1000.0
    px = bx0 + (bx1 - bx0) * fx
    py = by0 + (by1 - by0) * fy
    fn = _make_index_refine_fn(("point_id",), FakeBroadcast(idx))

    def run():
        total = 0
        for s in range(0, n, batch):
            pdf = pd.DataFrame({
                "point_id": rng[s:s + batch], "lng": px[s:s + batch],
                "lat": py[s:s + batch], "cell_id": cells[s:s + batch]})
            for out in fn(iter([pdf])):
                total += len(out)
        return total

    run()  # warm
    t0 = time.time()
    total = run()
    print(f"plain: {time.time() - t0:.2f}s hits={total}")
    pr = cProfile.Profile()
    pr.enable()
    run()
    pr.disable()
    pstats.Stats(pr).sort_stats("cumulative").print_stats(18)


if __name__ == "__main__":
    main()
