"""Exactness + pruning properties of pipeline/embedding_exact.py.

The angle-band pruned scan must return EXACTLY the brute-force cosine
threshold pairs (same pairs, same 4dp sims) for any distribution —
including the adversarial all-in-one-band case — while shuffling
strictly fewer vector copies than the r3 all-block-pairs design when
the threshold leaves room to prune.
"""
import math

import numpy as np
import pytest

from areacity_query_geometry_spark.pipeline.embedding_exact import (
    near_dup_pairs,
    pivot_vector,
)


def _brute(vectors: np.ndarray, threshold: float) -> set:
    M = vectors / np.linalg.norm(vectors, axis=1, keepdims=True)
    sims = M @ M.T
    n = len(M)
    out = set()
    for i in range(n):
        for j in range(i + 1, n):
            if sims[i, j] >= threshold:
                out.add((i, j, round(float(np.round(sims[i, j], 4)), 4)))
    return out


def _spark_pairs(spark, vectors: np.ndarray, threshold: float,
                 band_width: float) -> set:
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vectors)],
        "vec_id long, embedding array<double>")
    rows = near_dup_pairs(df, threshold, band_width=band_width).collect()
    return {(r.v1, r.v2, round(r.sim, 4)) for r in rows}


def _mixture(seed: int, n: int, dims: int = 16) -> np.ndarray:
    """Spread + clustered mixture: half isotropic (angles spread over
    the pivot sphere), half in two tight clusters (near-dup heavy)."""
    rng = np.random.default_rng(seed)
    spread = rng.normal(size=(n // 2, dims))
    c1, c2 = rng.normal(size=dims), rng.normal(size=dims)
    clustered = np.concatenate([
        c1 + 0.05 * rng.normal(size=(n // 4, dims)),
        c2 + 0.08 * rng.normal(size=(n - n // 2 - n // 4, dims)),
    ])
    return np.concatenate([spread, clustered])


@pytest.mark.parametrize("threshold,band_width", [
    (0.4, 0.25), (0.8, 0.15), (0.95, 0.08),
])
def test_matches_brute_force(spark, threshold, band_width):
    vectors = _mixture(seed=7, n=120)
    assert _spark_pairs(spark, vectors, threshold, band_width) == \
        _brute(vectors, threshold)


def test_adversarial_single_band_still_exact(spark):
    """Every vector within a few degrees of the pivot: zero pruning
    possible — the answer must still be exact (graceful degradation)."""
    rng = np.random.default_rng(11)
    base = rng.normal(size=12)
    vectors = base + 0.02 * rng.normal(size=(60, 12))
    assert _spark_pairs(spark, vectors, 0.9, 0.1) == _brute(vectors, 0.9)


def test_antipodal_and_orthogonal_edges(spark):
    """Band extremes: pivot itself, its negation (angle π, the last
    band), orthogonal vectors (angle π/2), and boundary-straddling
    near-copies."""
    d = 8
    e0 = np.eye(d)[0]
    vectors = np.stack([
        e0, -e0, np.eye(d)[1], -np.eye(d)[1],
        e0 + 1e-7 * np.eye(d)[2],          # ~identical to pivot
        -e0 + 1e-7 * np.eye(d)[3],         # ~identical to antipode
    ])
    for threshold in (0.4, 0.99):
        assert _spark_pairs(spark, vectors, threshold, 0.2) == \
            _brute(vectors, threshold)


def test_pruning_reduces_replication(spark):
    """At t=0.95 / w=0.08 the reach is ⌊0.3176/0.08⌋+2 = 5 bands each
    way — every vector ships ≤ 11 copies regardless of how many bands
    the corpus occupies, and band pairs farther apart never exist.
    (The r3 design shipped every vector to ALL B blocks.)"""
    vectors = _mixture(seed=3, n=200)
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vectors)],
        "vec_id long, embedding array<double>")
    threshold, w = 0.95, 0.08
    reach = int(math.floor(math.acos(threshold) / w)) + 2
    pivot = pivot_vector(df, "vec_id", "embedding")

    # reconstruct the keyed relation the module builds and count copies
    from areacity_query_geometry_spark.pipeline import embedding_exact as ee
    import pyspark.sql.functions as F

    banded = df.selectExpr(
        "vec_id",
        "CAST(floor(acos(greatest(-1D, least(1D, "
        + ee._dot_sql("transform(embedding, x -> CAST(x AS DOUBLE))", pivot)
        + " / sqrt(aggregate(transform(embedding, x -> CAST(x AS DOUBLE)),"
        " 0D, (acc, z) -> acc + z * z))))) / 0.08D) AS INT) AS band")
    n_bands = banded.select("band").distinct().count()
    assert n_bands > reach + 1, "fixture must spread beyond one reach"

    copies = (banded.withColumn("other", F.explode(F.sequence(
        F.greatest(F.lit(0), F.col("band") - reach),
        F.col("band") + reach))).count())
    assert copies <= len(vectors) * (2 * reach + 1)
    # and the result at that pruned replication is still exact
    assert _spark_pairs(spark, vectors, threshold, w) == \
        _brute(vectors, threshold)
