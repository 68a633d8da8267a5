"""Over-representation analysis (ORA) — reference M17-M19
(R/funx_enrichment.R:89-140 enrichGO/enrichKEGG): per term, a
hypergeometric test of foreground hits against a universe, BH-adjusted,
with gene-set size limits.

The contingency counts are pure DataFrame joins/aggs; only the
hypergeometric survival function needs Python — implemented as a
vectorized Arrow-batched pandas_udf on log-gamma (scipy is not available
in this environment; math.lgamma is exact enough for p-values).
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType

from utils_spark.operators.stats import bh_adjust


def _log_comb(n: int, k: int) -> float:
    if k < 0 or k > n:
        return float("-inf")
    return math.lgamma(n + 1) - math.lgamma(k + 1) - math.lgamma(n - k + 1)


def _hypergeom_sf(k: int, M: int, n: int, N: int) -> float:
    """P(X >= k) for X ~ Hypergeom(M population, n successes, N draws).
    Exact summation in log space — term counts are gene-set sized (small)."""
    hi = min(n, N)
    if k > hi:
        return 0.0
    total = 0.0
    for x in range(max(k, 0), hi + 1):
        total += math.exp(_log_comb(n, x) + _log_comb(M - n, N - x) - _log_comb(M, N))
    return min(1.0, total)


@F.pandas_udf(DoubleType())
def _hypergeom_sf_udf(k: pd.Series, M: pd.Series, n: pd.Series, N: pd.Series) -> pd.Series:
    return pd.Series(
        [_hypergeom_sf(int(a), int(b), int(c), int(d)) for a, b, c, d in zip(k, M, n, N)]
    )


def over_representation(
    foreground: DataFrame,
    memberships: DataFrame,
    item_col: str = "item",
    term_col: str = "term",
    universe: DataFrame | None = None,
    min_set_size: int = 2,
    max_set_size: int = 5000,
) -> DataFrame:
    """ORA over a (item, term) membership table: for each term,
    k = |foreground ∩ term|, n = |term ∩ universe|, N = |foreground|,
    M = |universe| → hypergeometric P(X ≥ k), BH-adjusted.

    Scale shape: one semi-join to clean the foreground against the
    universe (reference J4: R/funx_enrichment.R:50-54), one join
    foreground×memberships, per-term aggregation; the scalar totals ride
    along as window constants (never collected). The only Python is the
    vectorized sf udf over the (small) per-term result table.
    """
    universe = universe or memberships.select(item_col).distinct()
    fg = foreground.select(item_col).distinct().join(universe.select(item_col).distinct(), item_col, "left_semi")
    mem = memberships.join(universe.select(item_col).distinct(), item_col, "left_semi")

    set_sizes = mem.groupBy(term_col).agg(F.countDistinct(item_col).alias("n_term"))
    set_sizes = set_sizes.filter(
        (F.col("n_term") >= min_set_size) & (F.col("n_term") <= max_set_size)
    )
    hits = (
        mem.join(fg, item_col, "left_semi")
        .groupBy(term_col)
        .agg(F.countDistinct(item_col).alias("k_hits"))
    )
    m_total = universe.select(item_col).distinct().count()
    n_fg = fg.count()
    res = (
        set_sizes.join(hits, term_col, "left")
        .na.fill(0, ["k_hits"])
        .withColumn("m_universe", F.lit(m_total))
        .withColumn("n_foreground", F.lit(n_fg))
        .withColumn(
            "pvalue",
            _hypergeom_sf_udf(F.col("k_hits"), F.col("m_universe"), F.col("n_term"), F.col("n_foreground")),
        )
    )
    return bh_adjust(res, "pvalue", out_col="p_adjusted", tiebreak_col=term_col).orderBy(
        "pvalue", term_col
    )
