"""Sampling operators (reference W7/W8: R/reference.R:144-155 seeded
stratified exact-N sampling; R/tradeseq.R:24 random gene subset).

Determinism rule (SURVEY §7.2): never F.rand(seed) — its output depends on
partition layout. We order by md5(key:seed), which is engine-, partition-
and cluster-size-independent, and take exact N per stratum.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from utils_spark.functions import det_order_key


def stratified_sample_exact(
    df: DataFrame,
    strata: list[str] | str,
    key: str,
    n_per_stratum: int,
    seed: int = 290,
) -> DataFrame:
    """Exactly min(N, stratum size) rows per stratum, seeded-deterministic.

    Mirrors the reference's ``.SD[sample(.N, min(500, .N))], by=group``
    (R/reference.R:150-155, seed 290). `key` must uniquely identify rows.

    Scale: one shuffle on the strata key(s); the per-stratum sort is local.
    """
    strata = [strata] if isinstance(strata, str) else list(strata)
    w = Window.partitionBy(*strata).orderBy(det_order_key(key, seed))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n_per_stratum)
        .drop("__rn")
    )


def random_subset(df: DataFrame, key: str, n: int, seed: int = 290) -> DataFrame:
    """Seeded-deterministic global subset of n rows (reference W8:
    R/tradeseq.R:24 nGenes=500). TakeOrderedAndProject — no full sort."""
    return df.orderBy(det_order_key(key, seed)).limit(n)


def split_train_holdout(df: DataFrame, key: str, holdout_fraction: float, seed: int = 290) -> tuple[DataFrame, DataFrame]:
    """Deterministic hash-split (train, holdout). Row membership depends only
    on (key, seed) — stable across runs, partitionings, and engines."""
    from utils_spark.functions import md5_long

    bucket: Column = md5_long(det_order_key(key, seed)) % 1_000_000
    cut = int(holdout_fraction * 1_000_000)
    return df.filter(bucket >= cut), df.filter(bucket < cut)


def weighted_sample_exact(
    df: DataFrame,
    strata: list[str] | str | None,
    key: str,
    weight_col: str,
    n: int,
    seed: int = 290,
) -> DataFrame:
    """Deterministic weighted sampling without replacement (Efraimidis-
    Spirakis exponential race): each row gets score -ln(u)/w with u a
    seeded md5-derived uniform; the n SMALLEST scores win. Inclusion
    probability is proportional to weight; fully deterministic across
    engines and partitionings (same md5 discipline as
    stratified_sample_exact) — the distributed weighted-reservoir
    algorithm, expressed as a window top-n."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    from utils_spark.functions import md5_long

    strata = [strata] if isinstance(strata, str) else (strata or [])
    # u in (0,1]: (md5_60bit("key:seed") + 1) / 2^60 — hash the seeded key
    # string directly (det_order_key would yield an md5 hex to re-hash)
    seeded = F.concat_ws(":", F.col(key).cast("string"), F.lit(str(seed)))
    u = (md5_long(seeded) + F.lit(1).cast("double")) / F.lit(float(1 << 60))
    score = -F.log(u) / F.col(weight_col)
    w = Window.partitionBy(*strata).orderBy(F.asc("__score"), F.asc(key))
    return (
        df.withColumn("__score", score)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n)
        .drop("__score", "__rn")
    )
