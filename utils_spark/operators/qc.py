"""QC metric bundles over long-format data (reference E2 pipeline,
SURVEY §3: do_basicQC → get_outliers → filter_features).

The reference operates on genes×cells matrices; our long format is
(entity_id, feature_id, value) rows. All bundles are single-pass hash
aggregations with conditional expressions — partial aggregation map-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def per_entity_qc(
    df: DataFrame,
    entity_col: str,
    value_col: str,
    subset_patterns: dict[str, str] | None = None,
    feature_col: str | None = None,
) -> DataFrame:
    """Per-entity QC metrics (reference A8: R/wrapper.R:78-117
    perCellQCMetrics): `total` (sum), `detected` (count of value>0), and
    `subsets_<name>_percent` — % of total in features matching a regex
    (mito `^MT-`, ribo `^RP[SL]` in the reference, R/wrapper.R:100-107).

    ONE aggregation pass computes every metric (no per-subset re-scan).
    """
    aggs = [
        F.sum(value_col).alias("total"),
        F.count(F.when(F.col(value_col) > 0, 1)).alias("detected"),
    ]
    for name, pattern in (subset_patterns or {}).items():
        if feature_col is None:
            raise ValueError("feature_col required when subset_patterns given")
        aggs.append(
            (
                100.0
                * F.coalesce(
                    F.sum(F.when(F.col(feature_col).rlike(pattern), F.col(value_col))), F.lit(0.0)
                )
                / F.sum(value_col)
            ).alias(f"subsets_{name}_percent")
        )
    return df.groupBy(entity_col).agg(*aggs)


def per_feature_support(
    df: DataFrame,
    feature_col: str,
    value_col: str,
    min_count: float = 0,
) -> DataFrame:
    """Per-feature support: in how many rows is the feature expressed above
    min_count (reference A9: R/wrapper.R:231-239 numDetectedAcrossCells)."""
    return df.groupBy(feature_col).agg(
        F.count(F.when(F.col(value_col) > min_count, 1)).alias("n_detected"),
        F.count("*").alias("n_total"),
    )


def filter_features_by_support(
    df: DataFrame,
    feature_col: str,
    value_col: str,
    min_detected: int,
    drop_patterns: list[str] | None = None,
) -> DataFrame:
    """Keep rows whose feature passes a detection-support threshold,
    optionally dropping regex-matched features (reference A10:
    R/wrapper.R:223-252). Support table is small → broadcast semi-join."""
    support = (
        per_feature_support(df, feature_col, value_col)
        .filter(F.col("n_detected") >= min_detected)
        .select(feature_col)
    )
    out = df.join(F.broadcast(support), feature_col, "left_semi")
    for pat in drop_patterns or []:
        out = out.filter(~F.col(feature_col).rlike(pat))
    return out


def module_score(
    df: DataFrame,
    entity_col: str,
    feature_col: str,
    value_col: str,
    feature_set: list[str],
    control_set: list[str],
) -> DataFrame:
    """Module score per entity: mean(value | feature in set) − mean(value |
    feature in control set) (reference A24: R/wrapper.R:254-257
    CellCycleScoring shape). Single conditional-aggregation pass."""
    if not feature_set or not control_set:
        raise ValueError("feature_set and control_set must be non-empty")
    return df.groupBy(entity_col).agg(
        (
            F.avg(F.when(F.col(feature_col).isin(feature_set), F.col(value_col)))
            - F.avg(F.when(F.col(feature_col).isin(control_set), F.col(value_col)))
        ).alias("module_score"),
        F.count(F.when(F.col(feature_col).isin(feature_set), 1)).alias("n_set"),
        F.count(F.when(F.col(feature_col).isin(control_set), 1)).alias("n_control"),
    )


def log_normalize(
    df: DataFrame, entity_col: str, value_col: str, out_col: str = "log_norm"
) -> DataFrame:
    """Library-size log-normalization (reference R/reference.R:161
    logNormCounts): log2(value / size_factor + 1) where size_factor =
    entity total scaled to mean 1. Two aggregate passes, map-side expr."""
    totals = df.groupBy(entity_col).agg(F.sum(value_col).alias("__total"))
    mean_total = totals.agg(F.avg("__total").alias("__mean_total"))
    return (
        df.join(totals, entity_col)
        .crossJoin(F.broadcast(mean_total))
        .withColumn(out_col, F.log2(F.col(value_col) / (F.col("__total") / F.col("__mean_total")) + 1))
        .drop("__total", "__mean_total")
    )
