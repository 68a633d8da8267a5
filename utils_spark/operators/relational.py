"""Generic relational helpers mirroring the reference's table utilities.

(reference: R/utils.R:24-52 label-mapping checks and frequency-ordered
factors, R/wrapper.R:38-42 make.unique, R/integrate.R:231-235 crosstab
proportions, R/wrapper.R:364-374 UpSet membership matrices.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from utils_spark.functions import make_unique


def with_unique_names(df: DataFrame, name_col: str, order_col: str, out_col: str | None = None) -> DataFrame:
    """R ``make.unique``: suffix duplicate names `.1`, `.2`, ... with a
    deterministic tiebreak ordering (reference P22: R/wrapper.R:38-42)."""
    return df.withColumn(out_col or name_col, make_unique(name_col, order_col))


def check_functional_dependency(df: DataFrame, group_col: str, label_col: str) -> DataFrame:
    """One-label-per-group validation (reference A4: R/utils.R:24-41):
    returns groups violating the dependency with their distinct-label count.
    Empty result ⇔ the dependency holds. Exact count-distinct."""
    return (
        df.groupBy(group_col)
        .agg(F.countDistinct(label_col).alias("n_labels"))
        .filter(F.col("n_labels") > 1)
    )


def freq_ordered_levels(df: DataFrame, col: str) -> DataFrame:
    """Category levels ranked by frequency (reference P21: R/utils.R:46-52
    `sort(table(x))` factor levels): (level, n, level_rank)."""
    w = Window.orderBy(F.desc("n"), F.asc("level"))
    return (
        df.groupBy(F.col(col).alias("level"))
        .agg(F.count("*").alias("n"))
        .withColumn("level_rank", F.dense_rank().over(w))
    )


def crosstab_proportions(df: DataFrame, row_col: str, col_col: str) -> DataFrame:
    """Long-format contingency table with row proportions (reference A5/A6:
    R/integrate.R:231-232). Stays long (SURVEY §7.5 — wide pivots capped)."""
    counts = df.groupBy(row_col, col_col).agg(F.count("*").alias("n"))
    w = Window.partitionBy(row_col)
    return counts.withColumn("row_prop", F.col("n") / F.sum("n").over(w))


def pivot_membership(df: DataFrame, element_col: str, set_col: str, set_values: list[str]) -> DataFrame:
    """0/1 membership matrix, element × set (reference J8:
    R/wrapper.R:364-374 UpSet fromList). `set_values` passed explicitly →
    single-pass pivot with bounded width."""
    return (
        df.groupBy(element_col)
        .pivot(set_col, set_values)
        .agg(F.lit(1))
        .na.fill(0, set_values)
    )


def reorder_to_input(df: DataFrame, position_col: str) -> DataFrame:
    """Restore original input order after joins (reference O9:
    R/funx_enrichment.R:228-231) — position must be carried as a column
    (design rule: keys/positions are columns, never implicit row order)."""
    return df.orderBy(position_col)
