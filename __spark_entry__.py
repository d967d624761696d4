"""Driver contract for the spark-graft builder (PySpark target).

Queries q1–q5 exercise the real spatial engine (tile build → cell-grid
equi-join → Arrow refine) over the deterministic "rectangle world"
(areacity_query_geometry_spark.fixtures) whose point-in-polygon
semantics are expressible in ANSI SQL for the DuckDB oracle. The
remaining queries are the training-data pipeline operators over the
documents/embeddings tables.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from areacity_query_geometry_spark import fixtures
from areacity_query_geometry_spark.engine import SpatialEngine
from areacity_query_geometry_spark.geom.distance import haversine_sql

_ENGINE_CACHE: dict[int, SpatialEngine] = {}


def _engine(spark: SparkSession) -> SpatialEngine:
    key = id(spark)
    eng = _ENGINE_CACHE.get(key)
    if eng is None:
        from areacity_query_geometry_spark import tiler

        boundaries = fixtures.boundaries_df(spark).cache()
        tiles = tiler.build_tiles(boundaries, base_res=7, max_res=9).cache()
        tiles.count()  # materialize once
        eng = SpatialEngine(spark, boundaries, tiles, base_res=7)
        _ENGINE_CACHE[key] = eng
    return eng


def _register(spark: SparkSession, sf_dir: str, names=("events", "orders", "documents", "embeddings")):
    for n in names:
        spark.read.parquet(f"{sf_dir}/{n}.parquet").createOrReplaceTempView(n)


# ------------------------------------------------------------------ spatial

def q1_point_region_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    _register(spark, sf_dir, ("events",))
    eng = _engine(spark)
    probes = spark.sql(fixtures.point_probes_sql("events"))
    out = eng.query_points(probes)
    return out.select(
        F.col("point_id").cast("long").alias("point_id"),
        F.col("id").alias("region_code"),
        F.col("deep").cast("long").alias("deep"),
    )


def q2_nearest_region_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    _register(spark, sf_dir, ("events",))
    eng = _engine(spark)
    probes = spark.sql(fixtures.miss_probes_sql("events"))
    out = eng.query_points_with_tolerance(probes, tolerance_m=-1)
    return out.select(
        F.col("point_id").cast("long").alias("point_id"),
        F.col("id").alias("region_code"),
        F.col("deep").cast("long").alias("deep"),
        F.round(F.col("point_distance"), 2).alias("dist_m"),
    )


def q3_rect_probe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    _register(spark, sf_dir, ("orders",))
    eng = _engine(spark)
    rects = spark.sql(fixtures.rect_probes_sql("orders"))
    probes = rects.select(
        F.col("probe_id"),
        F.concat(
            F.lit("POLYGON (("),
            F.col("qx0"), F.lit(" "), F.col("qy0"), F.lit(", "),
            F.col("qx0"), F.lit(" "), F.col("qy1"), F.lit(", "),
            F.col("qx1"), F.lit(" "), F.col("qy1"), F.lit(", "),
            F.col("qx1"), F.lit(" "), F.col("qy0"), F.lit(", "),
            F.col("qx0"), F.lit(" "), F.col("qy0"), F.lit("))"),
        ).alias("wkt"),
    )
    out = eng.query_geometry(probes)
    return out.select(
        F.col("probe_id").cast("long").alias("probe_id"),
        F.col("id").alias("region_code"),
        F.col("deep").cast("long").alias("deep"),
    )


def q4_attribute_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    eng = _engine(spark)
    out = eng.read_wkt_features(where="deep >= 2 AND ext_path LIKE 'D0%'", with_wkt=False)
    return out.select(
        F.col("id").alias("region_code"),
        F.col("deep").cast("long").alias("deep"),
        F.col("name"),
    )


def q5_tile_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tiling introspection — engine-specific (no SQL oracle): the tile
    count and interior share per region (Q5 analog)."""
    eng = _engine(spark)
    return (
        eng.tiles.groupBy("region_id")
        .agg(
            F.count("*").alias("n_tiles"),
            F.sum(F.expr("CAST(kind = 1 AS BIGINT)")).alias("n_interior"),
        )
        .join(F.broadcast(eng.boundaries.select("region_id", F.col("id").alias("region_code"))), "region_id")
        .select("region_code", "n_tiles", "n_interior")
    )


# ----------------------------------------------------------------- pipeline

_STOPWORDS = "'the','of','and','to','a','in','is','it','on','for'"


def doc_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    _register(spark, sf_dir, ("documents",))
    return spark.sql("""
        SELECT CAST(doc_id AS BIGINT) AS doc_id,
               CAST(size(split(text, ' ')) AS BIGINT) AS n_tokens,
               CAST(size(array_distinct(split(text, ' '))) AS BIGINT) AS n_uniq_tokens,
               CAST(length(text) AS BIGINT) AS n_chars_actual
        FROM documents
    """)


def doc_lang_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    _register(spark, sf_dir, ("documents",))
    return spark.sql(f"""
        SELECT CAST(doc_id AS BIGINT) AS doc_id,
               round(CAST(size(filter(split(text, ' '), x -> x IN ({_STOPWORDS}))) AS DOUBLE)
                     / size(split(text, ' ')), 4) AS stopword_ratio,
               CAST(size(filter(split(text, ' '), x -> x IN ({_STOPWORDS}))) > 0 AS BOOLEAN)
                   AS looks_english
        FROM documents
    """)


def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    _register(spark, sf_dir, ("documents",))
    return spark.sql("""
        SELECT CAST(doc_id AS BIGINT) AS doc_id,
               md5(lower(text)) AS fp
        FROM documents
    """)


def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: canonical doc per fingerprint + group size."""
    _register(spark, sf_dir, ("documents",))
    return spark.sql("""
        SELECT md5(lower(text)) AS fp,
               CAST(min(doc_id) AS BIGINT) AS canonical_doc_id,
               CAST(count(*) AS BIGINT) AS group_size
        FROM documents
        GROUP BY md5(lower(text))
    """)


def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup candidate pairs by 3-gram word-shingle Jaccard ≥ 0.08."""
    _register(spark, sf_dir, ("documents",))
    return spark.sql("""
        WITH words AS (
            SELECT doc_id, split(text, ' ') AS w FROM documents
        ),
        shingles AS (
            SELECT doc_id,
                   explode(array_distinct(transform(
                       sequence(0, size(w) - 3),
                       i -> concat_ws(' ', w[i], w[i+1], w[i+2])
                   ))) AS g
            FROM words WHERE size(w) >= 3
        ),
        counts AS (SELECT doc_id, count(*) AS n FROM shingles GROUP BY doc_id),
        pairs AS (
            SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS shared
            FROM shingles a JOIN shingles b ON a.g = b.g AND a.doc_id < b.doc_id
            GROUP BY a.doc_id, b.doc_id
        )
        SELECT CAST(p.d1 AS BIGINT) AS d1, CAST(p.d2 AS BIGINT) AS d2,
               round(CAST(p.shared AS DOUBLE) / (c1.n + c2.n - p.shared), 4) AS jaccard
        FROM pairs p
        JOIN counts c1 ON p.d1 = c1.doc_id
        JOIN counts c2 ON p.d2 = c2.doc_id
        WHERE CAST(p.shared AS DOUBLE) / (c1.n + c2.n - p.shared) >= 0.08
    """)


def embedding_topk_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-5 neighbours for query vectors vec_id < 8."""
    _register(spark, sf_dir, ("embeddings",))
    return spark.sql("""
        WITH e AS (
            SELECT vec_id, transform(embedding, x -> CAST(x AS DOUBLE)) AS v
            FROM embeddings
        ),
        q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 8),
        sims AS (
            SELECT q.qid, e.vec_id AS nid,
                   aggregate(zip_with(q.qv, e.v, (x, y) -> x * y), 0D, (acc, z) -> acc + z)
                   / (sqrt(aggregate(q.qv, 0D, (acc, z) -> acc + z * z))
                      * sqrt(aggregate(e.v, 0D, (acc, z) -> acc + z * z))) AS sim
            FROM q JOIN e ON e.vec_id != q.qid
        ),
        ranked AS (
            SELECT qid, nid, sim,
                   row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rn
            FROM sims
        )
        SELECT CAST(qid AS BIGINT) AS qid, CAST(nid AS BIGINT) AS nid,
               round(sim, 4) AS sim
        FROM ranked WHERE rn <= 5
    """)


# ------------------------------------------------------------------ contract

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the Q1 point↔region spatial join at sf0.001."""
    return q1_point_region_join(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "q1_point_region_join": q1_point_region_join,
        "q2_nearest_region_tolerance": q2_nearest_region_tolerance,
        "q3_rect_probe_join": q3_rect_probe_join,
        "q4_attribute_scan": q4_attribute_scan,
        "q5_tile_stats": q5_tile_stats,
        "doc_token_stats": doc_token_stats,
        "doc_lang_quality": doc_lang_quality,
        "doc_fingerprint": doc_fingerprint,
        "dedup_exact": dedup_exact,
        "ngram_jaccard_pairs": ngram_jaccard_pairs,
        "embedding_topk_cosine": embedding_topk_cosine,
    }


def oracle_sql() -> dict[str, str]:
    regions = fixtures.region_parts_values_sql()
    probes = fixtures.point_probes_sql("events")
    miss = fixtures.miss_probes_sql("events")
    rects = fixtures.rect_probes_sql("orders")
    hav = haversine_sql(
        "p.lng", "p.lat",
        "greatest(r.x0, least(p.lng, r.x1))",
        "greatest(r.y0, least(p.lat, r.y1))",
    )
    return {
        "q1_point_region_join": f"""
            WITH probes AS ({probes})
            SELECT DISTINCT p.point_id, r.code AS region_code, CAST(r.deep AS BIGINT) AS deep
            FROM probes p
            JOIN {regions}
              ON p.lng >= r.x0 AND p.lng <= r.x1 AND p.lat >= r.y0 AND p.lat <= r.y1
             AND NOT (r.hx0 IS NOT NULL AND p.lng > r.hx0 AND p.lng < r.hx1
                      AND p.lat > r.hy0 AND p.lat < r.hy1)
        """,
        "q2_nearest_region_tolerance": f"""
            WITH probes AS ({miss}),
            cand AS (
                SELECT p.point_id, r.ord, r.code, r.deep, {hav} AS dist_m
                FROM probes p CROSS JOIN {regions}
            ),
            feat AS (
                SELECT point_id, ord, code, deep, min(dist_m) AS dist_m
                FROM cand GROUP BY point_id, ord, code, deep
            ),
            win AS (
                SELECT point_id, code, deep, dist_m,
                       row_number() OVER (PARTITION BY point_id, deep
                                          ORDER BY dist_m, ord) AS rn
                FROM feat
            )
            SELECT point_id, code AS region_code, CAST(deep AS BIGINT) AS deep,
                   round(dist_m, 2) AS dist_m
            FROM win WHERE rn = 1
        """,
        "q3_rect_probe_join": f"""
            WITH probes AS ({rects})
            SELECT DISTINCT p.probe_id, r.code AS region_code, CAST(r.deep AS BIGINT) AS deep
            FROM probes p
            JOIN {regions}
              ON p.qx0 <= r.x1 AND p.qx1 >= r.x0 AND p.qy0 <= r.y1 AND p.qy1 >= r.y0
             AND NOT (r.hx0 IS NOT NULL AND p.qx0 > r.hx0 AND p.qx1 < r.hx1
                      AND p.qy0 > r.hy0 AND p.qy1 < r.hy1)
        """,
        "q4_attribute_scan": f"""
            SELECT DISTINCT code AS region_code, CAST(deep AS BIGINT) AS deep,
                   code AS name
            FROM {regions}
            WHERE deep >= 2 AND code LIKE 'D0%'
        """,
        "doc_token_stats": """
            SELECT CAST(doc_id AS BIGINT) AS doc_id,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
                   CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_uniq_tokens,
                   CAST(length(text) AS BIGINT) AS n_chars_actual
            FROM documents
        """,
        "doc_lang_quality": f"""
            SELECT CAST(doc_id AS BIGINT) AS doc_id,
                   round(CAST(len(list_filter(string_split(text, ' '),
                                              x -> x IN ({_STOPWORDS}))) AS DOUBLE)
                         / len(string_split(text, ' ')), 4) AS stopword_ratio,
                   len(list_filter(string_split(text, ' '),
                                   x -> x IN ({_STOPWORDS}))) > 0 AS looks_english
            FROM documents
        """,
        "doc_fingerprint": """
            SELECT CAST(doc_id AS BIGINT) AS doc_id, md5(lower(text)) AS fp
            FROM documents
        """,
        "dedup_exact": """
            SELECT md5(lower(text)) AS fp,
                   CAST(min(doc_id) AS BIGINT) AS canonical_doc_id,
                   CAST(count(*) AS BIGINT) AS group_size
            FROM documents
            GROUP BY md5(lower(text))
        """,
        "ngram_jaccard_pairs": """
            WITH words AS (
                SELECT doc_id, string_split(text, ' ') AS w FROM documents
            ),
            shingles AS (
                SELECT doc_id, unnest(list_distinct(list_transform(
                           range(1, len(w) - 1),
                           i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                       ))) AS g
                FROM words WHERE len(w) >= 3
            ),
            counts AS (SELECT doc_id, count(*) AS n FROM shingles GROUP BY doc_id),
            pairs AS (
                SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS shared
                FROM shingles a JOIN shingles b ON a.g = b.g AND a.doc_id < b.doc_id
                GROUP BY a.doc_id, b.doc_id
            )
            SELECT CAST(p.d1 AS BIGINT) AS d1, CAST(p.d2 AS BIGINT) AS d2,
                   round(CAST(p.shared AS DOUBLE) / (c1.n + c2.n - p.shared), 4) AS jaccard
            FROM pairs p
            JOIN counts c1 ON p.d1 = c1.doc_id
            JOIN counts c2 ON p.d2 = c2.doc_id
            WHERE CAST(p.shared AS DOUBLE) / (c1.n + c2.n - p.shared) >= 0.08
        """,
        "embedding_topk_cosine": """
            WITH e AS (
                SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
                FROM embeddings
            ),
            q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 8),
            sims AS (
                SELECT q.qid, e.vec_id AS nid,
                       list_dot_product(q.qv, e.v)
                       / (sqrt(list_dot_product(q.qv, q.qv))
                          * sqrt(list_dot_product(e.v, e.v))) AS sim
                FROM q JOIN e ON e.vec_id != q.qid
            ),
            ranked AS (
                SELECT qid, nid, sim,
                       row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rn
                FROM sims
            )
            SELECT CAST(qid AS BIGINT) AS qid, CAST(nid AS BIGINT) AS nid,
                   round(sim, 4) AS sim
            FROM ranked WHERE rn <= 5
        """,
    }
