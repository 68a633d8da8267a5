"""Quickstart: the utils_spark operator API on the driver star schema.

Run: python examples/quickstart.py  (expects /root/testdata/sf0.001)

Each block mirrors a workflow from the reference library (SURVEY.md §2-§3)
on distributed DataFrames. See COVERAGE.md for the full inventory.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from utils_spark import get_spark, load_table
from utils_spark.operators import (
    bh_adjust,
    cosine_topk,
    exact_dedup,
    mad_outlier_flags,
    minhash_lsh_candidates,
    pairwise_ks_test,
    per_entity_qc,
    stratified_sample_exact,
)

SF = "/root/testdata/sf0.001"


def main() -> None:
    spark = get_spark(app_name="quickstart", cpus=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    customers = load_table(spark, SF, "customer")
    orders = load_table(spark, SF, "orders")
    events = load_table(spark, SF, "events")
    docs = load_table(spark, SF, "documents")
    emb = load_table(spark, SF, "embeddings")

    # 1. QC metric bundle + MAD outlier flagging (reference do_basicQC → isOutlier)
    qc = per_entity_qc(orders, "o_custkey", "o_totalprice")
    flagged = mad_outlier_flags(qc, "total", nmads=3)
    print("outliers:", flagged.filter("is_outlier").count(), "/", flagged.count())

    # 2. Seeded exact-N stratified sampling (reference .SD[sample(.N, 500)])
    sample = stratified_sample_exact(customers, "c_mktsegment", "c_custkey", 25, seed=290)
    sample.groupBy("c_mktsegment").count().show()

    # 3. All-pairs KS tests with BH correction (the reference's declared stub)
    ks = pairwise_ks_test(events, "value", "event_type")
    bh_adjust(ks, "p_asymptotic", tiebreak_col="group_a").show(3)

    # 4. Text dedup: exact + MinHash/LSH near-dup candidates
    print("exact-unique docs:", exact_dedup(docs, ["text"], "doc_id").count())
    print("near-dup candidates:", minhash_lsh_candidates(docs, "text", "doc_id").count())

    # 5. Similarity search: top-3 cosine neighbors for 5 query vectors
    q = emb.filter(F.col("vec_id") < 5)
    cosine_topk(q, emb, "vec_id", "vec_id", k=3).show()

    spark.stop()


if __name__ == "__main__":
    main()
