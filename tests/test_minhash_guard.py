"""MinHash hot-bucket guard (VERDICT r4 "what's wrong" #3).

An adversarial boilerplate corpus — thousands of docs with IDENTICAL
text, the worst case for LSH banding since every doc lands in the same
(band, bsig) bucket in every band — must complete with candidate
volume linear in the bucket size (star expansion to the min-doc_id
representative), not quadratic. Below the cap the guarded query must
be byte-identical to the unguarded one.
"""
from __future__ import annotations

import pytest

from areacity_query_geometry_spark.pipeline import minhash

N_IDENTICAL = 10_000


@pytest.fixture(scope="module")
def corpora(spark):
    # 10k identical docs + 3 small genuine near-dup clusters so the
    # guard demonstrably leaves sub-cap buckets untouched
    spark.range(N_IDENTICAL).selectExpr(
        "id AS doc_id",
        "'the same boilerplate template text repeated verbatim"
        " across every single document' AS text",
    ).createOrReplaceTempView("mh_hot")
    spark.range(24).selectExpr(
        "id AS doc_id",
        """concat('cluster ', CAST(id DIV 8 AS STRING),
                  ' shared body of words one two three four five six ',
                  'tail', CAST(id AS STRING)) AS text""",
    ).createOrReplaceTempView("mh_small")
    return "mh_hot", "mh_small"


def test_hot_bucket_star_expansion_bounds_candidates(spark, corpora):
    hot, _ = corpora
    out = spark.sql(minhash.near_dup_sql(hot)).collect()
    # star expansion: every doc pairs with the representative (doc 0)
    # exactly once — (N-1) pairs, not N*(N-1)/2 ≈ 50M
    assert len(out) == N_IDENTICAL - 1
    assert {r["d1"] for r in out} == {0}
    assert {r["d2"] for r in out} == set(range(1, N_IDENTICAL))
    assert all(r["jaccard"] == 1.0 for r in out)


def test_capped_buckets_reported(spark, corpora):
    hot, small = corpora
    capped = spark.sql(minhash.capped_buckets_sql(hot)).collect()
    # all 4 bands collapse to one oversized bucket each
    assert len(capped) == 4
    assert all(r["n"] == N_IDENTICAL for r in capped)
    assert spark.sql(minhash.capped_buckets_sql(small)).count() == 0


def test_sub_cap_output_identical_to_unguarded(spark, corpora):
    _, small = corpora
    guarded = sorted(map(tuple, spark.sql(
        minhash.near_dup_sql(small)).collect()))
    unguarded = sorted(map(tuple, spark.sql(
        minhash.near_dup_sql(small, max_bucket=None)).collect()))
    assert guarded == unguarded
    # sanity: the comparison is over real full-pairwise output, not two
    # empty sets — LSH recall is probabilistic so the exact pair count
    # is banding-dependent, but well over half the 84 within-cluster
    # pairs must land (measured: 78)
    assert len([t for t in guarded if t[0] // 8 == t[1] // 8]) > 42
