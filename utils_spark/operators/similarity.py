"""Similarity-search operators over embedding columns (north-star surface).

Brute-force cosine top-k as the exact baseline; IVF bucket routing as the
scale path (see queries/vector.py ann_ivf_bucketed for the wired version).
All vector math is JVM-side (zip_with/aggregate) — no Python in the loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from utils_spark.functions import cosine_similarity, to_double_array


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    query_key: str,
    corpus_key: str,
    vec_col: str = "embedding",
    k: int = 5,
    round_digits: int | None = 6,
) -> DataFrame:
    """Exact top-k cosine neighbors of every query vector:
    (query_id, neighbor_id, cosine), k rows per query.

    Scale shape: queries broadcast; the corpus streams partition-parallel
    (never shuffled); per-query top-k reduces on the tiny query key.
    `round_digits` stabilizes ordering across engines; None disables.
    """
    q = queries.select(
        F.col(query_key).alias("query_id"), to_double_array(vec_col).alias("__qv")
    )
    c = corpus.select(
        F.col(corpus_key).alias("neighbor_id"), to_double_array(vec_col).alias("__nv")
    )
    sim = cosine_similarity(F.col("__qv"), F.col("__nv"))
    if round_digits is not None:
        sim = F.round(sim, round_digits)
    sims = (
        F.broadcast(q)
        .join(c, F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", sim.alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return sims.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") <= k).drop("__rn")


def pairwise_distances(
    df: DataFrame, key_col: str, vec_col: str = "embedding", metric: str = "cosine"
) -> DataFrame:
    """All-pairs similarity/distance (key_a < key_b). O(n²) — intended for
    SMALL inputs (sample-level distance matrices, reference M21
    R/qc_rna.R:93-115 sample clustering); for large inputs use LSH/IVF."""
    v = df.select(F.col(key_col).alias("k"), to_double_array(vec_col).alias("v"))
    a, b = v.alias("a"), v.alias("b")
    joined = a.join(b, F.col("a.k") < F.col("b.k"))
    if metric == "cosine":
        m = cosine_similarity(F.col("a.v"), F.col("b.v"))
    elif metric == "euclidean":
        m = F.sqrt(
            F.aggregate(
                F.zip_with("a.v", "b.v", lambda x, y: (x - y) * (x - y)),
                F.lit(0.0),
                lambda acc, d: acc + d,
            )
        )
    else:
        raise ValueError(f"unknown metric: {metric}")
    return joined.select(F.col("a.k").alias("key_a"), F.col("b.k").alias("key_b"), m.alias(metric))
