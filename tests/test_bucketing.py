"""Bucketed co-located joins: pre-bucketing both sides of a recurring join
key eliminates the shuffle entirely — THE optimization for repeated
fact-fact joins at 100 TB (SURVEY §4: bucketing for co-located joins).
"""

from __future__ import annotations

import uuid

import pytest
from pyspark.sql import functions as F

from utils_spark.io import load_table
from utils_spark.plans import plan_summary


def test_bucketed_join_eliminates_shuffle(spark, sf_dir, tmp_path_factory):
    suffix = uuid.uuid4().hex[:8]
    li_tbl, o_tbl = f"li_b_{suffix}", f"o_b_{suffix}"
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    try:
        (li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").mode("overwrite").saveAsTable(li_tbl))
        (o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").mode("overwrite").saveAsTable(o_tbl))
        lb, ob = spark.table(li_tbl), spark.table(o_tbl)
        # MERGE hint: at test SF the tables are broadcast-sized, which would
        # sidestep the bucketing path we're demonstrating; at real scale
        # sort-merge is what the planner picks on its own
        joined = (
            lb.hint("merge")
            .join(ob, lb.l_orderkey == ob.o_orderkey)
            .groupBy("o_orderstatus")
            .agg(F.sum("l_quantity").alias("q"))
        )
        p = plan_summary(joined)
        # co-located buckets: the join itself needs NO Exchange; only the
        # final small aggregation may shuffle
        assert p.n_sortmerge_joins == 1
        assert p.n_exchanges <= 1, p.text[:1500]
        # correctness unchanged vs the unbucketed join
        plain = (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("o_orderstatus")
            .agg(F.sum("l_quantity").alias("q"))
        )
        got = {r["o_orderstatus"]: round(r["q"], 4) for r in joined.collect()}
        want = {r["o_orderstatus"]: round(r["q"], 4) for r in plain.collect()}
        assert got == want
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {li_tbl}")
        spark.sql(f"DROP TABLE IF EXISTS {o_tbl}")
