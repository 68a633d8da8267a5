"""Bound the approximate scale-path aggregates against exact answers."""

from __future__ import annotations

from pyspark.sql import functions as F

from utils_spark.io import load_table
from utils_spark.registry import load_all

REGISTRY = load_all()


def test_approx_sketches_within_tolerance(spark, sf_dir):
    """approx_sketch_aggs now emits bound-satisfaction booleans (its driver
    oracle is the constant all-true table); the test additionally checks
    the raw sketches against TIGHTER tolerances than the query's bounds."""
    rows = REGISTRY["approx_sketch_aggs"].fn(spark, sf_dir).collect()
    assert rows, "no groups"
    for r in rows:
        assert r["median_in_bounds"], r
        assert r["distinct_in_bounds"], r
    li = load_table(spark, sf_dir, "lineitem")
    approx = {
        r["l_returnflag"]: r
        for r in li.groupBy("l_returnflag")
        .agg(
            F.percentile_approx("l_extendedprice", 0.5, 10000).alias("median_approx"),
            F.approx_count_distinct("l_orderkey", 0.01).alias("orders_approx"),
        )
        .collect()
    }
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


def test_lsh_near_dup_recall_on_planted_pairs(spark):
    """The LSH candidate path must recall every planted near-dup pair and
    report the same cosines as the numpy brute-force oracle."""
    import numpy as np

    rs = np.random.RandomState(42)
    base = rs.standard_normal((300, 64))
    rows = [(i, [float(x) for x in base[i]]) for i in range(300)]
    # plant 10 near-dup partners: small additive noise => cosine ~0.95-0.99
    for j in range(10):
        noisy = base[j] + rs.standard_normal(64) * (0.05 + 0.02 * j)
        rows.append((1000 + j, [float(x) for x in noisy]))
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")

    from utils_spark.operators.similarity import lsh_near_dup_pairs

    got = {
        (r["key_a"], r["key_b"]): r["cosine"]
        for r in lsh_near_dup_pairs(df, "vec_id", "embedding", threshold=0.9, dim=64).collect()
    }
    M = np.array([r[1] for r in rows])
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    C = Mn @ Mn.T
    ids = [r[0] for r in rows]
    want = {}
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a, b = sorted((ids[i], ids[j]))
            if C[i, j] >= 0.9:
                want[(a, b)] = round(float(C[i, j]), 6)
    assert len(want) >= 10  # the planted pairs qualify
    assert set(got) == set(want), (set(want) - set(got), set(got) - set(want))
    for k in want:
        assert abs(got[k] - want[k]) < 1e-5
