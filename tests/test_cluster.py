"""Grid-density clustering (cluster.py): connected-components
correctness vs a python BFS oracle, negative-coordinate keys, and
partitioning invariance."""
import numpy as np
import pandas as pd
import pytest

from areacity_query_geometry_spark import cluster


def _bfs_components(edges, nodes):
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    label = {}
    for n in nodes:
        if n in label:
            continue
        comp = {n}
        frontier = [n]
        while frontier:
            cur = frontier.pop()
            for m in adj.get(cur, ()):
                if m not in comp:
                    comp.add(m)
                    frontier.append(m)
        root = min(comp)
        for m in comp:
            label[m] = root
    return label


def test_connected_components_vs_bfs(spark):
    rng = np.random.RandomState(5)
    nodes = list(range(100))
    edges = [(int(rng.randint(100)), int(rng.randint(100)))
             for _ in range(60)]
    edges = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame(pd.DataFrame(edges, columns=["a", "b"]))
    got = dict(cluster.connected_components(df).collect())
    want = _bfs_components(edges, {a for e in edges for a in e})
    assert got == want


def _brute_clusters(pts, cell_deg=1.0, min_pts=3):
    counts = {}
    for x, y in pts:
        c = (int(np.floor(x / cell_deg)), int(np.floor(y / cell_deg)))
        counts[c] = counts.get(c, 0) + 1
    dense = {c for c, n in counts.items() if n >= min_pts}
    edges = []
    for (cx, cy) in dense:
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                if (dx, dy) != (0, 0) and (cx + dx, cy + dy) in dense:
                    edges.append(((cx, cy), (cx + dx, cy + dy)))
    label = _bfs_components(edges, dense)
    for c in dense:
        label.setdefault(c, c)
    return {c: (counts[c], label[c]) for c in dense}


@pytest.mark.parametrize("n_parts", [1, 7])
def test_grid_density_clusters_vs_brute(spark, n_parts):
    rng = np.random.RandomState(9)
    # three blobs + noise, including NEGATIVE coordinates
    blobs = [(-5.5, -3.5), (0.5, 0.5), (7.5, 2.5)]
    pts = []
    for bx, by in blobs:
        for _ in range(60):
            pts.append((bx + rng.randint(-96, 96) / 64.0,
                        by + rng.randint(-96, 96) / 64.0))
    for _ in range(40):  # sparse noise
        pts.append((rng.randint(-640, 640) / 64.0,
                    rng.randint(-640, 640) / 64.0))
    df = spark.createDataFrame(
        pd.DataFrame(pts, columns=["lng", "lat"])).repartition(n_parts)
    out = cluster.grid_density_clusters(df, cell_deg=1.0, min_pts=3)
    got = {(r.cell_x, r.cell_y): (r.n_points, r.cluster_id)
           for r in out.collect()}
    want = _brute_clusters(pts, min_pts=3)
    stride, half = 1 << 20, 1 << 19
    want_keyed = {
        c: (n, (root[0] + half) * stride + root[1] + half)
        for c, (n, root) in want.items()
    }
    assert got == want_keyed


def test_distributed_loop_equals_kernel_path(spark):
    """small_graph_edges=0 forces the pointer-doubling loop; it must
    land the identical fixpoint as the default in-kernel solve."""
    rng = np.random.RandomState(21)
    edges = [(int(rng.randint(200)), int(rng.randint(200)))
             for _ in range(150)]
    edges = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame(pd.DataFrame(edges, columns=["a", "b"]))
    fast = dict(cluster.connected_components(df).collect())
    slow = dict(cluster.connected_components(
        df, small_graph_edges=0).collect())
    assert fast == slow
    assert fast == _bfs_components(edges, {a for e in edges for a in e})


def test_key_offset_roundtrip_negative_cells(spark):
    # one dense cell far in the negative quadrant: its cluster_id must
    # decode back to itself through the offset formula
    pts = [(-100.0 + i / 64.0, -80.0 + i / 64.0) for i in range(10)]
    df = spark.createDataFrame(pd.DataFrame(pts, columns=["lng", "lat"]))
    out = cluster.grid_density_clusters(df, cell_deg=1.0, min_pts=5)
    rows = out.collect()
    assert len(rows) == 1
    r = rows[0]
    stride, half = 1 << 20, 1 << 19
    assert r.cluster_id == (r.cell_x + half) * stride + r.cell_y + half
    assert (r.cell_x, r.cell_y) == (-100, -80)
