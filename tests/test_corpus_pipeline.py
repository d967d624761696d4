"""Composed corpus-curation pipeline: quality filter → exact dedup →
geo-annotation → per-region stats, with the span-sequence invariant
held end to end."""
from pyspark.sql import functions as F

from areacity_query_geometry_spark import docs as docsmod
from areacity_query_geometry_spark.pipeline import corpus


def _docs_with_dups(spark):
    base = docsmod.generate_docs(spark, n_docs=120, seed=11)
    # duplicate 10 docs under new ids (same text spans → same fingerprint)
    dups = base.filter(F.col("doc_id") < "doc-00000010").select(
        F.concat(F.lit("dup-"), "doc_id").alias("doc_id"), "spans")
    return base.unionByName(dups)


class TestCorpusCuration:
    def test_dedup_quality_and_span_preservation(self, spark, province_engine):
        docs = _docs_with_dups(spark)
        curated, region_stats = corpus.curate(province_engine, docs, min_tokens=1)
        got = {r.doc_id for r in curated.select("doc_id").collect()}

        # every dup-* doc loses to its canonical "doc-*" twin (min doc_id)
        assert not any(d.startswith("dup-") for d in got)

        # quality floor: docs with zero text tokens are gone
        stats = corpus.text_stats(docs)
        no_text = {r.doc_id for r in stats.filter("n_tokens < 1").collect()}
        assert got.isdisjoint(no_text)

        # span-sequence invariant: surviving docs carry their ORIGINAL
        # spans bit-for-bit
        orig = {r.doc_id: r.spans for r in docs.collect()}
        for r in curated.collect():
            assert r.spans == orig[r.doc_id]

        # region stats: counts are distinct-doc counts joined to names
        rows = region_stats.collect()
        assert rows
        assert all(r.n_docs > 0 and r.name for r in rows)
        total_annotated = curated.filter(F.col("regions").isNotNull()).count()
        assert sum(r.n_docs for r in rows) >= max(1, total_annotated) // 1

    def test_fingerprint_is_order_sensitive(self, spark):
        a = spark.createDataFrame(
            [("d1", [("text", "alpha beta", None, 0), ("text", "gamma", None, 1)]),
             ("d2", [("text", "gamma", None, 0), ("text", "alpha beta", None, 1)])],
            docsmod.DOCS_SCHEMA)
        fps = {r.doc_id: r.fp for r in corpus.doc_fingerprint(a).collect()}
        assert fps["d1"] != fps["d2"]
