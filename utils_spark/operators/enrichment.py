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


def semantic_similarity_pairs(
    term_anc: DataFrame,
    node_ic: DataFrame,
    metric: str = "lin",
    min_sim: float = 0.0,
    min_anc_ic: float = 0.0,
) -> DataFrame:
    """Information-content semantic similarity between ontology terms
    (reference M19: R/funx_enrichment.R:174-234 calculateSimMatrix with
    Resnik/Lin/Rel over GO) — VERDICT r1 item 7.

    Inputs: ``term_anc`` (term, anc) — each term's ancestor set, including
    itself; ``node_ic`` (node, ic) — information content −ln p(node) per
    ontology node. For each pair sharing an ancestor, MICA = the most
    informative common ancestor; resnik = IC(MICA),
    lin = 2·IC(MICA)/(IC(a)+IC(b)), rel = lin·(1−p(MICA)).

    Scale shape: one equi-self-join on the ancestor key + a max-agg per
    pair — the shingle-join pattern, never an all-pairs term join. Hub
    ancestors (the root, top levels) are the skew AND are provably
    irrelevant when ``min_anc_ic`` > 0: an ancestor with IC below the
    threshold can never be the MICA of a pair that clears ``min_sim`` —
    prune them before the join (pushed to the scan).

    Returns (term_a, term_b, sim).
    """
    ta = term_anc.select(F.col("term").alias("__t"), F.col("anc"))
    ic = node_ic.select(F.col("node").alias("anc"), F.col("ic"))
    if min_anc_ic > 0:
        ic = ic.filter(F.col("ic") >= min_anc_ic)
    with_ic = ta.join(ic, "anc")  # drops pruned ancestors
    a, b = with_ic.alias("a"), with_ic.alias("b")
    mica = (
        a.join(b, (F.col("a.anc") == F.col("b.anc")) & (F.col("a.__t") < F.col("b.__t")))
        .groupBy(F.col("a.__t").alias("term_a"), F.col("b.__t").alias("term_b"))
        .agg(F.max(F.col("a.ic")).alias("mica_ic"))
    )
    term_ic = node_ic.select(F.col("node"), F.col("ic"))
    scored = (
        mica.join(term_ic.withColumnRenamed("node", "term_a").withColumnRenamed("ic", "ic_a"), "term_a")
        .join(term_ic.withColumnRenamed("node", "term_b").withColumnRenamed("ic", "ic_b"), "term_b")
    )
    lin = 2.0 * F.col("mica_ic") / (F.col("ic_a") + F.col("ic_b"))
    if metric == "resnik":
        sim = F.col("mica_ic")
    elif metric == "lin":
        sim = lin
    elif metric == "rel":
        sim = lin * (1.0 - F.exp(-F.col("mica_ic")))
    else:
        raise ValueError(f"unknown metric: {metric}")
    return scored.select("term_a", "term_b", sim.alias("sim")).filter(F.col("sim") >= min_sim)


def reduce_term_clusters(
    sim_pairs: DataFrame,
    term_scores: DataFrame,
    threshold: float = 0.5,
) -> DataFrame:
    """Cluster terms whose similarity clears `threshold` (connected
    components) and pick each cluster's representative by max score
    (reference M19: rrvgo reduceSimMatrix — R/funx_enrichment.R:210-234).
    ``term_scores``: (term, score). Singleton terms keep themselves as
    representative. Returns (term, component, representative)."""
    from pyspark.sql import Window

    from utils_spark.operators.dedup import duplicate_clusters

    edges = sim_pairs.filter(F.col("sim") >= threshold).select("term_a", "term_b")
    cc = duplicate_clusters(edges, "term_a", "term_b")
    assigned = (
        term_scores.select(F.col("term"), F.col("score"))
        .join(cc.withColumnRenamed("key", "term"), "term", "left")
        .select("term", "score", F.coalesce("component", F.col("term")).alias("component"))
    )
    w = Window.partitionBy("component").orderBy(F.desc("score"), F.asc("term"))
    reps = (
        assigned.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(F.col("component"), F.col("term").alias("representative"))
    )
    return assigned.select("term", "component").join(reps, "component")


def _fisher_two_sided(a: int, b: int, c: int, d: int) -> float:
    """Two-sided Fisher exact p for a 2x2 table [[a, b], [c, d]] — the
    sum of all hypergeometric point probabilities no larger than the
    observed one (R fisher.test's default two-sided criterion, with its
    1 + 1e-7 relative tolerance). Exact lgamma summation; the support is
    min(row1, col1)-sized, bounded by the table's smaller margin."""
    M, K, n = a + b + c + d, a + b, a + c
    lo, hi = max(0, K + n - M), min(K, n)
    lp_obs = _log_comb(K, a) + _log_comb(M - K, n - a) - _log_comb(M, n)
    p_obs = math.exp(lp_obs)
    total = 0.0
    for x in range(lo, hi + 1):
        px = math.exp(_log_comb(K, x) + _log_comb(M - K, n - x) - _log_comb(M, n))
        if px <= p_obs * (1.0 + 1e-7):
            total += px
    return min(1.0, total)


@F.pandas_udf(DoubleType())
def _fisher_two_sided_udf(a: pd.Series, b: pd.Series, c: pd.Series, d: pd.Series) -> pd.Series:
    return pd.Series(
        [_fisher_two_sided(int(w), int(x), int(y), int(z)) for w, x, y, z in zip(a, b, c, d)]
    )
