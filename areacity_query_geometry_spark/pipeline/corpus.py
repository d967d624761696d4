"""End-to-end corpus curation over the interleaved docs table — the
composed form of the engine's training-data operators (the individual
operators are gate queries; this is how they stack in production):

    quality filter → exact dedup → geo-annotation → per-region stats

Every stage is DataFrame-native: the text statistics are Spark SQL
higher-order functions (JVM-side), dedup is one hash aggregation, the
geo join is the engine's cell-grid join, and the spans column is
carried through UNTOUCHED end to end (input_hint span-sequence
invariant — curation must never rewrite a surviving document).
"""
from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .. import docs as docsmod


def text_stats(docs: DataFrame) -> DataFrame:
    """(doc_id, n_text_spans, n_tokens, stopword_ratio) from the text
    spans — all JVM-side expressions, no Python."""
    stop = "'the','of','and','to','a','in','is','it','on','for'"
    texts = F.expr("filter(spans, s -> s.kind = 'text')")
    tokens = F.expr(
        "flatten(transform(filter(spans, s -> s.kind = 'text'),"
        " s -> split(s.text, ' ')))")
    return docs.select(
        "doc_id",
        F.size(texts).alias("n_text_spans"),
        F.size(tokens).alias("n_tokens"),
        (F.size(F.expr(
            f"filter(flatten(transform(filter(spans, s -> s.kind = 'text'),"
            f" s -> split(s.text, ' '))), t -> t IN ({stop}))"))
         / F.greatest(F.size(tokens), F.lit(1))).alias("stopword_ratio"),
    )


def doc_fingerprint(docs: DataFrame) -> DataFrame:
    """Exact-dedup key: md5 over the concatenated text-span contents
    (order-preserving — swapped spans give a different fingerprint)."""
    return docs.select(
        "doc_id",
        F.md5(F.expr(
            "concat_ws('\\u0001', transform(filter(spans, s -> s.kind = 'text'),"
            " s -> s.text))")).alias("fp"),
    )


def curate(engine, docs: DataFrame,
           min_tokens: int = 3,
           where: str | None = None) -> tuple[DataFrame, DataFrame]:
    """Returns (curated_docs, region_stats).

    curated_docs: input docs minus quality failures and duplicates
    (canonical = min doc_id per fingerprint), geo-annotated with a
    `regions` array column; the original `spans` column is bit-for-bit
    untouched. region_stats: (region_id, id, name, n_docs).
    """
    stats = text_stats(docs)
    quality = stats.filter(F.col("n_tokens") >= min_tokens).select("doc_id")
    fps = doc_fingerprint(docs).join(quality, "doc_id", "left_semi")
    canonical = fps.groupBy("fp").agg(F.min("doc_id").alias("doc_id")) \
                   .select("doc_id")
    kept = docs.join(canonical, "doc_id", "left_semi")
    annotated = docsmod.join_docs_to_regions(engine, kept, where=where)
    region_stats = (
        annotated.select("doc_id", F.explode_outer("regions").alias("r"))
        .filter(F.col("r").isNotNull())
        .select("doc_id", F.col("r.region_id").alias("region_id"))
        .distinct()
        .groupBy("region_id")
        .agg(F.count("*").alias("n_docs"))
        .join(F.broadcast(engine.boundaries.select("region_id", "id", "name")),
              "region_id")
    )
    return annotated, region_stats
