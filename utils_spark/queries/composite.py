"""Composite queries wiring the UDF-backed operator stack (ORA, grouped
model fits, batch correction) onto the star schema so the driver's checks
see them. These are rows-only entries (no oracle): the hypergeometric /
least-squares / iterative kernels aren't reasonably SQL-expressible, but
their math is unit-tested against exact references in tests/.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from utils_spark.io import load_table
from utils_spark.registry import register


@register(
    "ora_enrichment",
    oracle=None,  # hypergeometric sf is a pandas_udf; math unit-tested vs exact comb
    tags=("composite", "M17", "enrichment"),
)
def ora_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Over-representation analysis on the star schema (reference M17:
    R/funx_enrichment.R:89-140): items = parts, terms = words of p_type
    ('PROMO', 'BRUSHED', ...), foreground = small parts (p_size < 10).
    Which type-words are over-represented among small parts?"""
    from utils_spark.operators.enrichment import over_representation

    p = load_table(spark, sf_dir, "part")
    memberships = p.select(
        F.col("p_partkey").alias("item"), F.explode(F.split("p_type", " ")).alias("term")
    )
    foreground = p.filter(F.col("p_size") < 10).select(F.col("p_partkey").alias("item"))
    universe = p.select(F.col("p_partkey").alias("item"))
    return over_representation(foreground, memberships, universe=universe)


@register(
    "grouped_trend_fits",
    oracle=None,  # least-squares + F sf in applyInPandas; unit-tested vs closed forms
    tags=("composite", "M14", "M15", "modelfit"),
)
def grouped_trend_fits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group association tests (reference M14: tradeSeq associationTest
    shape): within each (l_returnflag, l_linestatus) group, does discount
    explain net price? applyInPandas grouped fit + BH across groups."""
    from utils_spark.operators.modelfit import grouped_polyfit
    from utils_spark.operators.stats import bh_adjust

    li = load_table(spark, sf_dir, "lineitem").select(
        F.concat_ws("_", "l_returnflag", "l_linestatus").alias("grp"),
        F.col("l_discount").alias("x"),
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("y"),
    )
    fits = grouped_polyfit(li, "grp", "x", "y", degree=1)
    return bh_adjust(fits, "pvalue", out_col="p_adjusted", tiebreak_col="group")


@register(
    "batch_correction",
    oracle=None,  # iterative centroid correction; property-tested in tests/test_ml.py
    tags=("composite", "M8", "integration"),
)
def batch_correction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Harmony-style batch correction on embeddings (reference M8:
    R/integrate.R:100-123): treat label parity as a 'batch', cluster, and
    subtract per-(cluster, batch) centroid offsets. Returns per-vector
    corrected arrays; the property test asserts batch separation shrinks."""
    from utils_spark.operators.ml import harmony_lite

    e = load_table(spark, sf_dir, "embeddings")
    d = e.select(
        "vec_id",
        (F.col("label") % 2).cast("string").alias("batch"),
        F.transform("embedding", lambda x: x.cast("double")).alias("vec"),
    )
    corrected = harmony_lite(d, "vec_id", "vec", "batch", k=4, n_iter=2)
    return corrected.select("vec_id", "batch", F.round(F.element_at("corrected", 1), 6).alias("c1"))
