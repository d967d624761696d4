"""Parameterized approximate-nearest-neighbour search over an
embedding column — the production generalization of the fixture-bound
`embedding_ann_lsh` / `embedding_ann_ivf` gates in __spark_entry__.py.

Two bucketing families, both with the filter-refine shape of the
spatial engine (coarse bucket join → exact cosine rank within
candidates; cf. /root/reference/AreaCityQuery.java:209-262's
envelope-filter → exact-geometry refine):

- IVF: spherical k-means coarse centroids (deterministic strided
  init, Lloyd iterations run as distributed partial-sum aggregations;
  only k×dims floats ever reach the driver), assignment via one Arrow
  matmul per partition, queries probe their `nprobe` nearest lists.
- sign-LSH: hyperplanes from a deterministic strided sample of the
  data itself (no RNG), bucket = sign bits; multiprobe expands each
  query to every bucket within hamming ≤ `multiprobe` (standard
  recall lever — candidates stay an equi-join, never a θ-join).

Recall quality (not just determinism) is measured against exact
brute-force top-k in tests/test_ann_recall.py on a 10k-vector
clustered set (VERDICT r3 next-round #6).
"""
from __future__ import annotations

import itertools

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    DoubleType, IntegerType, LongType, StructField, StructType,
)

__all__ = ["kmeans_centroids", "ivf_topk", "lsh_topk"]


def _strided_rows(emb: DataFrame, n: int, id_col: str, vec_col: str,
                  count: int | None = None) -> np.ndarray:
    """n deterministic sample vectors spread across the id space (ids
    are assumed roughly uniform — the doc/vec id space here is dense).
    Collect is n×dims floats: metadata-sized, same class as the IVF
    gate's 16-row centroid collect."""
    total = count if count is not None else emb.count()
    stride = max(total // n, 1)
    rows = (emb.filter(F.pmod(F.col(id_col), F.lit(stride)) == 0)
            .orderBy(id_col).limit(n).collect())
    return np.array([r[vec_col] for r in rows], dtype=np.float64)


def _normalize(M: np.ndarray) -> np.ndarray:
    nrm = np.linalg.norm(M, axis=1, keepdims=True)
    nrm[nrm == 0] = 1.0
    return M / nrm


def kmeans_centroids(emb: DataFrame, k: int, iters: int = 4,
                     id_col: str = "vec_id",
                     vec_col: str = "embedding") -> np.ndarray:
    """Spherical k-means (cosine Lloyd) coarse centroids, (k × dims),
    unit-normalized. Init = strided id sample (deterministic). Each
    iteration: one mapInPandas pass emits per-batch PARTIAL sums as
    (cid, dim, s, cnt) rows — k×dims rows per batch, so the shuffle
    carries centroid-sized data no matter the corpus size — then one
    group-by finishes the mean and only k×dims floats return to the
    driver. This is how IVF coarse quantizers train at 100 TB: the full
    data is touched once per iteration, entirely executor-side."""
    Cn = _normalize(_strided_rows(emb, k, id_col, vec_col))
    sc = emb.sparkSession.sparkContext
    schema = StructType([
        StructField("cid", IntegerType()),
        StructField("dim", IntegerType()),
        StructField("s", DoubleType()),
        StructField("cnt", LongType()),
    ])
    for _ in range(iters):
        b_c = sc.broadcast(Cn)

        def partial(it, b_c=b_c):
            C = b_c.value
            kk, d = C.shape
            for pdf in it:
                if not len(pdf):
                    continue
                M = np.array(list(pdf[vec_col]), dtype=np.float64)
                best = (_normalize(M) @ C.T).argmax(axis=1)
                cnt = np.bincount(best, minlength=kk)
                sums = np.zeros((kk, d))
                np.add.at(sums, best, M)
                nz = np.nonzero(cnt)[0]
                yield pd.DataFrame({
                    "cid": np.repeat(nz, d).astype("int32"),
                    "dim": np.tile(np.arange(d, dtype="int32"), len(nz)),
                    "s": sums[nz].ravel(),
                    "cnt": np.repeat(cnt[nz], d).astype("int64"),
                })

        agg = (emb.select(vec_col).mapInPandas(partial, schema)
               .groupBy("cid", "dim")
               .agg(F.sum("s").alias("s"), F.sum("cnt").alias("cnt"))
               .collect())
        C2 = Cn.copy()  # empty cluster keeps its old centroid
        acc = np.zeros_like(Cn)
        cnts = np.zeros(len(Cn), dtype=np.int64)
        for r in agg:
            acc[r.cid, r.dim] = r.s
            cnts[r.cid] = r.cnt
        nz = cnts > 0
        C2[nz] = acc[nz] / cnts[nz, None]
        Cn = _normalize(C2)
    return Cn


def _assignments(emb: DataFrame, Cn: np.ndarray, query_ids: list[int],
                 nprobe: int, id_col: str, vec_col: str) -> DataFrame:
    """(vec_id, cid, rnk): every vector's nearest-centroid list (rnk=1);
    query vectors additionally emit their 2..nprobe nearest lists. One
    Arrow matmul per batch — the only stage that touches every row."""
    sc = emb.sparkSession.sparkContext
    b_c = sc.broadcast(Cn)
    qarr = np.array(sorted(int(q) for q in query_ids), dtype="int64")
    schema = StructType([
        StructField("vec_id", LongType()),
        StructField("cid", IntegerType()),
        StructField("rnk", IntegerType()),
    ])

    def assign(it):
        C = b_c.value
        for pdf in it:
            if not len(pdf):
                continue
            vid = pdf[id_col].to_numpy().astype("int64")
            sims = _normalize(np.array(list(pdf[vec_col]),
                                       dtype=np.float64)) @ C.T
            order = np.argsort(-sims, axis=1, kind="stable")
            out_v = [vid]
            out_c = [order[:, 0].astype("int32")]
            out_r = [np.ones(len(vid), dtype="int32")]
            qm = np.isin(vid, qarr)
            for p in range(1, min(nprobe, C.shape[0])):
                if qm.any():
                    out_v.append(vid[qm])
                    out_c.append(order[qm, p].astype("int32"))
                    out_r.append(np.full(int(qm.sum()), p + 1, dtype="int32"))
            yield pd.DataFrame({
                "vec_id": np.concatenate(out_v),
                "cid": np.concatenate(out_c),
                "rnk": np.concatenate(out_r),
            })

    return emb.select(id_col, vec_col).mapInPandas(assign, schema)


def _rank_candidates(emb: DataFrame, cand: DataFrame, k: int,
                     id_col: str, vec_col: str) -> DataFrame:
    """Exact cosine over (qid, nid) candidate pairs, top-k per query —
    all JVM higher-order functions (aggregate/zip_with), no Python."""
    n = emb.select(
        F.col(id_col).alias("vid"),
        F.expr(f"transform({vec_col}, x -> CAST(x AS DOUBLE))").alias("v"),
    ).withColumn(
        "nrm", F.expr("sqrt(aggregate(v, 0D, (acc, z) -> acc + z * z))"))
    sims = (cand.join(n.selectExpr("vid AS qid", "v AS qv", "nrm AS qn"), "qid")
            .join(n.selectExpr("vid AS nid", "v AS nv", "nrm AS nn"), "nid")
            .withColumn("sim", F.expr(
                "aggregate(zip_with(qv, nv, (x, y) -> x * y), 0D,"
                " (acc, z) -> acc + z) / (qn * nn)"))
            .select("qid", "nid", "sim"))
    from pyspark.sql import Window
    w = Window.partitionBy("qid").orderBy(F.desc("sim"), "nid")
    return (sims.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= k).drop("rn"))


def ivf_topk(emb: DataFrame, query_ids: list[int], k: int = 10,
             n_centroids: int = 64, nprobe: int = 2, iters: int = 4,
             centroids: np.ndarray | None = None,
             id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """(qid, nid, sim) — IVF ANN top-k: k-means coarse lists, queries
    probe their `nprobe` nearest lists, exact cosine refine within
    candidates. Candidate volume per query ≈ nprobe × n/n_centroids —
    bucketed, never all-pairs."""
    if centroids is None:
        centroids = kmeans_centroids(emb, n_centroids, iters, id_col, vec_col)
    a = _assignments(emb, centroids, query_ids, nprobe, id_col, vec_col)
    a.localCheckpoint(eager=True).createOrReplaceTempView("_ann_ivf_assign")
    sess = emb.sparkSession
    cand = sess.sql("""
        SELECT DISTINCT p.vec_id AS qid, a.vec_id AS nid
        FROM _ann_ivf_assign p
        JOIN _ann_ivf_assign a
          ON a.cid = p.cid AND a.rnk = 1 AND a.vec_id != p.vec_id
        WHERE p.vec_id IN ({})
    """.format(", ".join(str(int(q)) for q in query_ids)))
    out = _rank_candidates(emb, cand, k, id_col, vec_col)
    sess.catalog.dropTempView("_ann_ivf_assign")
    return out


def lsh_topk(emb: DataFrame, query_ids: list[int], k: int = 10,
             n_planes: int = 8, multiprobe: int = 1,
             id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """(qid, nid, sim) — sign-LSH ANN top-k. Hyperplanes are a strided
    sample of the data (deterministic); bucket = n_planes sign bits.
    Multiprobe m expands each QUERY to all buckets within hamming ≤ m
    (C(n_planes, ≤m) extra rows per query — query-side only), keeping
    candidates an equi-join on bucket."""
    sess = emb.sparkSession
    H = _normalize(_strided_rows(emb, n_planes, id_col, vec_col))
    b_h = sess.sparkContext.broadcast(H)
    schema = StructType([
        StructField("vec_id", LongType()),
        StructField("bucket", LongType()),
    ])

    def bucketize(it):
        Hp = b_h.value
        weights = 1 << np.arange(Hp.shape[0], dtype=np.int64)
        for pdf in it:
            if not len(pdf):
                continue
            M = np.array(list(pdf[vec_col]), dtype=np.float64)
            bits = (M @ Hp.T) > 0
            yield pd.DataFrame({
                "vec_id": pdf[id_col].to_numpy().astype("int64"),
                "bucket": bits @ weights,
            })

    bk = (emb.select(id_col, vec_col).mapInPandas(bucketize, schema)
          .localCheckpoint(eager=True))
    qb = bk.filter(F.col("vec_id").isin([int(q) for q in query_ids]))
    # expand query buckets by every ≤-multiprobe bit flip (pure driver
    # arithmetic over C(n_planes, ≤m) masks — a broadcast-sized dim)
    masks = [0]
    for m in range(1, multiprobe + 1):
        for bits in itertools.combinations(range(n_planes), m):
            masks.append(sum(1 << b for b in bits))
    mdf = sess.createDataFrame([(m,) for m in masks], "mask long")
    probes = (qb.crossJoin(F.broadcast(mdf))
              .select(F.col("vec_id").alias("qid"),
                      F.col("bucket").bitwiseXOR(F.col("mask"))
                      .alias("bucket")))
    cand = (probes.join(bk, "bucket")
            .filter(F.col("vec_id") != F.col("qid"))
            .select("qid", F.col("vec_id").alias("nid"))
            .distinct())
    return _rank_candidates(emb, cand, k, id_col, vec_col)
