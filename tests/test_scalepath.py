"""Bound the approximate scale-path aggregates against exact answers."""

from __future__ import annotations

from pyspark.sql import functions as F

from utils_spark.io import load_table
from utils_spark.registry import load_all

REGISTRY = load_all()


def test_approx_sketches_within_tolerance(spark, sf_dir):
    approx = {r["l_returnflag"]: r for r in REGISTRY["approx_sketch_aggs"].fn(spark, sf_dir).collect()}
    li = load_table(spark, sf_dir, "lineitem")
    exact = {
        r["l_returnflag"]: r
        for r in li.groupBy("l_returnflag")
        .agg(
            F.expr("percentile(l_extendedprice, 0.5)").alias("median_exact"),
            F.countDistinct("l_orderkey").alias("orders_exact"),
        )
        .collect()
    }
    for flag, a in approx.items():
        e = exact[flag]
        assert abs(a["median_approx"] - e["median_exact"]) / e["median_exact"] < 0.02
        assert abs(a["orders_approx"] - e["orders_exact"]) / e["orders_exact"] < 0.05
