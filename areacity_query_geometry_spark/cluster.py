"""Grid-density spatial clustering (DBSCAN's grid variant): dense
cells → 8-neighbour adjacency → connected components.

The missing clustering face of the spatial-analytics surface (next to
knn.py's point kNN, overlay.py's zonal algebra, linework.py's length
join): find contiguous high-density areas of a point table. The grid
formulation (cells with ≥ min_pts points, merged across the
8-neighbourhood) is the scale-correct DBSCAN relaxation — the classic
eps-ball formulation needs a distance self-join; the grid needs ONE
aggregation plus a components loop over the (tiny) dense-cell graph.

100 TB shape: the point table is touched exactly once, by a single
map-side-combining groupBy(cell).count() — the skew-proof kind (cell
count caps the group count). Everything after runs on dense CELLS,
|dense| ≤ points/min_pts, typically orders of magnitude smaller.
Components use the same iterative min-label propagation the dedup
pipeline proved out (__spark_entry__.dedup_cluster_cc): one keyed
shuffle per round, localCheckpoint-truncated lineage, changed-flag
convergence on materialized data (no recount job), rounds = graph
diameter.

Exactness: cells and labels are integer arithmetic end-to-end —
bit-identical to the DuckDB oracle's recursive-CTE closure
(__spark_entry__.events_density_clusters).
"""
from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _solve_components_numpy(a, b):
    """In-memory min-label fixpoint with pointer jumping over int64
    edge arrays (both directions present). Vectorized numpy only —
    np.minimum.at scatters neighbour minima, fancy indexing jumps
    label chains; rounds = O(log diameter)."""
    import numpy as np

    nodes = np.unique(np.concatenate([a, b]))
    ia = np.searchsorted(nodes, a)
    ib = np.searchsorted(nodes, b)
    labels = nodes.copy()
    while True:
        new = labels.copy()
        np.minimum.at(new, ib, labels[ia])      # neighbour min
        new = np.minimum(new, new[np.searchsorted(nodes, new)])  # jump
        if np.array_equal(new, labels):
            return nodes, labels
        labels = new


def connected_components(edges: DataFrame,
                         small_graph_edges: int = 1 << 22) -> DataFrame:
    """Min-label connected components of an undirected edge list
    (columns a, b: long node keys). Returns (node, label) with label =
    min node key in the component. Nodes with no edges are absent —
    callers union singletons back (they map to themselves).

    Min-label propagation WITH pointer doubling (the hash-to-min
    recipe, Rastogi et al., "Finding Connected Components in
    Map-Reduce in Logarithmic Rounds"): each round a node takes the
    least of (its label, its neighbours' labels, its LABEL'S label).
    The third term — one self-join — halves label-chain lengths every
    round, so rounds are O(log diameter) instead of O(diameter);
    plain propagation stalled ~10 s on a diameter-~60 grid component
    (sf0.1 density gate) where doubling converges in ~7 rounds. Label
    values are always component node-keys, so the self-join lookup
    never misses. Per round: one keyed shuffle each for the
    neighbour-min and the jump; lineage cut by localCheckpoint
    (ContextCleaner-reclaimed, repo convention); convergence read from
    a changed-flag riding the checkpointed output.

    Size-aware: a graph whose (bidirectional) edge list fits
    `small_graph_edges` solves in ONE vectorized Arrow kernel
    (`_solve_components_numpy` — the same budgeted collect-to-kernel
    philosophy as the engine's broadcast indexes: the EDGE set is what
    near-dup/density discovery found, orders of magnitude smaller than
    the corpus, so at the default 4M-edge budget the kernel task holds
    ~64 MB while the distributed loop would pay ~0.5 s of
    shuffle+checkpoint overhead PER ROUND). Past-budget graphs run the
    pointer-doubling loop unchanged; both paths land the identical
    min-label fixpoint.
    """
    bidir = (edges.selectExpr("a", "b")
             .unionByName(edges.selectExpr("b AS a", "a AS b"))
             .localCheckpoint(eager=True))
    if bidir.count() <= small_graph_edges:
        import pandas as pd

        def solve(pdf):
            nodes, labels = _solve_components_numpy(
                pdf["a"].to_numpy("int64"), pdf["b"].to_numpy("int64"))
            return pd.DataFrame({"node": nodes, "label": labels})

        return (bidir.groupBy(F.lit(1).alias("_g"))
                .applyInPandas(lambda pdf: solve(pdf),
                               "node long, label long"))
    labels = (bidir.select(F.col("a").alias("node")).distinct()
              .selectExpr("node", "node AS label")
              .localCheckpoint(eager=True))
    while True:
        neigh = (bidir.join(labels, bidir.a == labels.node)
                 .groupBy(F.col("b").alias("node"))
                 .agg(F.min("label").alias("nlabel")))
        jump = labels.selectExpr("node AS jnode", "label AS jlabel")
        new = (labels.join(neigh, "node")
               .join(jump, F.col("label") == F.col("jnode"))
               .select("node",
                       F.least("label", "nlabel", "jlabel").alias("label"),
                       (F.least("nlabel", "jlabel")
                        < F.col("label")).alias("chg"))
               .localCheckpoint(eager=True))
        labels = new.select("node", "label")
        if new.filter("chg").isEmpty():
            break
    return labels


def grid_density_clusters(points: DataFrame, lng_col: str = "lng",
                          lat_col: str = "lat", cell_deg: float = 1.0,
                          min_pts: int = 10,
                          key_stride: int = 1 << 20) -> DataFrame:
    """Cluster a point table by grid density. Returns one row per
    DENSE cell: (cell_x, cell_y, n_points, cluster_id) where
    cluster_id is the minimum cell key (cell_x * key_stride + cell_y)
    of the cell's 8-connected dense component.

    cell_deg must be exactly representable (1, 0.5, 0.25 …) so the
    floor is engine-independent on dyadic inputs. Cell keys offset by
    key_stride/2 per axis, so coordinates in ±key_stride/2 cells map
    collision-free (whole-Earth at 0.25° needs stride ≥ 2^11; the
    2^20 default leaves 9 bits of headroom).
    """
    half = key_stride // 2
    cells = (points.select(
        F.floor(F.col(lng_col) / cell_deg).cast("long").alias("cell_x"),
        F.floor(F.col(lat_col) / cell_deg).cast("long").alias("cell_y"))
        .groupBy("cell_x", "cell_y").agg(F.count("*").alias("n_points"))
        .filter(F.col("n_points") >= min_pts)
        .withColumn("key", (F.col("cell_x") + half) * key_stride
                    + F.col("cell_y") + half)
        .localCheckpoint(eager=True))

    # Key packing is collision-free only while |cell index| < stride/2;
    # a small cell_deg over wide-range coordinates would otherwise alias
    # keys silently, creating phantom adjacency edges and merged
    # clusters (ADVICE r4). The dense-cell set is already materialized
    # by the localCheckpoint, so the bound check is one tiny agg.
    ext = cells.agg(
        F.greatest(F.max(F.abs("cell_x")),
                   F.max(F.abs("cell_y"))).alias("m")).collect()[0]["m"]
    if ext is not None and ext >= half:
        raise ValueError(
            f"grid_density_clusters: max |cell index| {ext} >= "
            f"key_stride/2 ({half}); cell keys would alias. Raise "
            f"key_stride (>= {2 * (ext + 1)}) or use a coarser cell_deg.")

    # 8-neighbour adjacency among dense cells: generate each cell's
    # neighbour keys JVM-side (two tiny sequence explodes), equi-join
    # back to the dense set. a < b keeps each undirected edge once.
    nbr = (cells.select("key", "cell_x", "cell_y")
           .withColumn("dx", F.explode(F.sequence(F.lit(-1), F.lit(1))))
           .withColumn("dy", F.explode(F.sequence(F.lit(-1), F.lit(1))))
           .filter("NOT (dx = 0 AND dy = 0)")
           .select(F.col("key").alias("a"),
                   ((F.col("cell_x") + F.col("dx") + half) * key_stride
                    + F.col("cell_y") + F.col("dy") + half).alias("b"))
           .filter("a < b"))
    edges = nbr.join(cells.select(F.col("key").alias("b")), "b", "inner")

    labels = connected_components(edges)
    out = (cells.join(labels, cells.key == labels.node, "left")
           .select("cell_x", "cell_y", "n_points",
                   F.coalesce("label", "key").alias("cluster_id")))
    return out
