"""Temporal + semi-structured operators: date truncation roll-ups, tumbling
event-time windows (batch twin of the streaming path), JSON extraction.

The reference has no date/JSON surface (SURVEY §2.7) — Spark gives these
free and the driver's `events.props` / `orders.o_orderdate` call for them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from utils_spark.io import load_table
from utils_spark.registry import register


@register(
    "monthly_rollup",
    oracle="""
    SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS order_month,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS month_revenue,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers
    FROM orders GROUP BY 1
    """,
    tags=("temporal", "bench"),
)
def monthly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar roll-up by month: count, revenue, exact distinct customers.
    date_trunc is a map-side expression; one hash agg on ~80 month keys."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy(F.to_date(F.date_trunc("month", "o_orderdate")).alias("order_month"))
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("month_revenue"),
            F.countDistinct("o_custkey").alias("n_customers"),
        )
    )


@register(
    "tumbling_window",
    oracle="""
    SELECT time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)) AS window_start,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(value), 4) AS total_value,
           CAST(ROUND(SUM(value * 100)) AS BIGINT) / 100.0 / COUNT(value) AS avg_value
    FROM events GROUP BY 1, 2
    """,
    tags=("temporal", "streaming-batch", "bench"),
)
def tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time windows via F.window — the exact operator
    Structured Streaming uses (utils_spark.streaming wires the same
    expression behind readStream + watermark); running it in batch proves
    semantic equivalence of the two paths."""
    e = load_table(spark, sf_dir, "events")
    # avg via exact-integer-numerator division: events.value is 2-decimal
    # quantized, so sum/count with power-of-2 counts lands exactly on
    # round-half boundaries where engines disagree at the last ulp (found
    # at sf0.1: a 32-event window hit avg=...8125 → 6dp boundary)
    exact_avg = F.round(F.sum(F.col("value") * 100)).cast("long") / 100.0 / F.count("value")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 4).alias("total_value"),
            exact_avg.alias("avg_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "total_value", "avg_value")
    )


@register(
    "json_extract",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(AVG(CAST(json_extract_string(props, '$.k') AS DOUBLE)), 6) AS avg_k,
           ROUND(MAX(CAST(json_extract_string(props, '$.k') AS DOUBLE)), 4) AS max_k
    FROM events GROUP BY event_type
    """,
    tags=("temporal", "json"),
)
def json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON scalar extraction from the semi-structured props column
    (SURVEY §2.7: exposed for events.props). get_json_object is JVM-side;
    at scale prefer from_json with an explicit schema once fields are known
    so Catalyst can prune."""
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("double")
    return e.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.round(F.avg(k), 6).alias("avg_k"),
        F.round(F.max(k), 4).alias("max_k"),
    )
