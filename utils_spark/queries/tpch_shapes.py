"""Additional TPC-H-shaped query patterns: correlated-minimum join-back
(Q2), HAVING-threshold semi-aggregation (Q18), attribute-level distinct
counting (Q16), and date arithmetic — realistic composite shapes over the
star schema that exercise optimizer paths the simpler queries don't
(aggregate-then-self-join, having pushback, multi-column distinct).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from utils_spark.io import load_table
from utils_spark.registry import register


@register(
    "min_per_group_join_back",
    oracle="""
    WITH mins AS (
      SELECT p_type, MIN(p_retailprice) AS min_price FROM part GROUP BY p_type
    )
    SELECT p.p_type, p.p_partkey, p.p_brand, ROUND(p.p_retailprice, 4) AS p_retailprice
    FROM part p JOIN mins m
      ON p.p_type = m.p_type AND p.p_retailprice = m.min_price
    """,
    tags=("tpch", "joins", "Q2-shape"),
)
def min_per_group_join_back(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: the correlated-subquery 'row achieving the group
    minimum' decorrelated into aggregate + join-back (what Catalyst's
    subquery decorrelation produces). All rows tying the minimum are kept
    — identical semantics to the correlated form, exact float equality on
    stored values."""
    p = load_table(spark, sf_dir, "part")
    # alias the aggregate's key to avoid self-join column ambiguity
    mins = p.groupBy(F.col("p_type").alias("mt")).agg(F.min("p_retailprice").alias("min_price"))
    return (
        p.join(
            F.broadcast(mins),
            (F.col("p_type") == F.col("mt")) & (F.col("p_retailprice") == F.col("min_price")),
        )
        .select("p_type", "p_partkey", "p_brand", F.round("p_retailprice", 4).alias("p_retailprice"))
    )


@register(
    "having_threshold_join",
    oracle="""
    WITH big AS (
      SELECT l_orderkey, SUM(l_quantity) AS total_qty
      FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 150
    )
    SELECT o.o_orderkey, o.o_orderdate, ROUND(o.o_totalprice, 4) AS o_totalprice,
           ROUND(b.total_qty, 4) AS total_qty
    FROM big b JOIN orders o ON b.l_orderkey = o.o_orderkey
    """,
    tags=("tpch", "joins", "Q18-shape"),
)
def having_threshold_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: aggregate with a HAVING threshold, then join the
    (small) surviving key set back to the dimension fact — the aggregate
    acts as a semi-join reducer, so the orders join input is tiny."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 150)
    )
    return big.join(o, big.l_orderkey == o.o_orderkey).select(
        "o_orderkey",
        "o_orderdate",
        F.round("o_totalprice", 4).alias("o_totalprice"),
        F.round("total_qty", 4).alias("total_qty"),
    )


@register(
    "distinct_suppliers_per_attr",
    oracle="""
    SELECT p.p_brand, split_part(p.p_type, ' ', 1) AS type_head,
           CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS n_suppliers,
           CAST(COUNT(DISTINCT p.p_partkey) AS BIGINT) AS n_parts
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_size >= 10
    GROUP BY p.p_brand, split_part(p.p_type, ' ', 1)
    """,
    tags=("tpch", "aggregates", "Q16-shape"),
)
def distinct_suppliers_per_attr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: exact multi-column distinct counting per attribute
    combination after a dimension join+filter (supplier diversity per
    brand/type). Distinct aggregation expands then hash-dedups — the
    expensive-but-exact path; approx_count_distinct is the scale switch."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_size") >= 10)
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", F.split(F.col("p_type"), " ").getItem(0).alias("type_head"))
        .agg(
            F.countDistinct("l_suppkey").alias("n_suppliers"),
            F.countDistinct("p_partkey").alias("n_parts"),
        )
    )


@register(
    "date_arithmetic",
    oracle="""
    SELECT o_orderkey,
           CAST(EXTRACT(year FROM o_orderdate) AS INT) AS order_year,
           CAST(EXTRACT(month FROM o_orderdate) AS INT) AS order_month,
           CAST(EXTRACT(dow FROM o_orderdate) AS INT) AS day_of_week,
           CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS due_date,
           CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2000-01-01') AS INT)
             AS days_to_y2k
    FROM orders
    """,
    tags=("temporal", "scalar", "dates"),
)
def date_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date scalar surface (SURVEY §2.7: free from Spark, exposed over the
    driver's timestamps): extract year/month/day-of-week, interval
    arithmetic, day differences. DuckDB dow and Spark dayofweek differ by
    convention (Sunday=0 vs Sunday=1) — normalized to Sunday=0."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        (F.dayofweek("o_orderdate") - 1).cast("int").alias("day_of_week"),
        F.to_date(F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).alias("due_date"),
        F.datediff(F.lit("2000-01-01").cast("date"), F.to_date("o_orderdate"))
        .cast("int")
        .alias("days_to_y2k"),
    )


@register(
    "late_shipment_priority_counts",
    # Q4 shape adapted to the fixture schema (no l_commitdate): orders in
    # a half-year window with AT LEAST ONE line shipped after the order
    # date, counted by priority — the decorrelated-EXISTS (left-semi with
    # an extra non-equi conjunct) optimizer path
    oracle="""
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1996-07-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate)
    GROUP BY o_orderpriority
    """,
    tags=("tpch", "semi-join", "Q4-shape"),
)
def late_shipment_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS-correlated subquery → left-semi join with a
    compound (equi + non-equi) condition, then a tiny priority rollup.
    Catalyst plans the semi join on the equi key with the date comparison
    as a join residual — the date window pushes into the orders scan, and
    the semi join never duplicates orders however many late lines match.

    Scale shape: the filtered orders side is the small build side; the
    lineitem probe shuffles on l_orderkey only. No aggregation-before-join
    is needed because semi-join semantics dedup matches for free."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-07-01")
    )
    li = load_table(spark, sf_dir, "lineitem")
    late = o.join(
        li,
        (o.o_orderkey == li.l_orderkey) & (li.l_shipdate > o.o_orderdate),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count("*").alias("order_count"))


@register(
    "priority_class_line_counts",
    # Q12 shape adapted (no l_shipmode): per returnflag, count lines of
    # high- vs low-priority orders shipped inside one year — the
    # two-conditional-aggregate pattern over a fact-fact join
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY l_returnflag
    """,
    tags=("tpch", "joins", "Q12-shape"),
)
def priority_class_line_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: join the filtered fact to orders and split the
    count by a priority predicate inside two conditional aggregates —
    exercises join + CASE-in-agg codegen. The ship-date window pushes
    into the lineitem scan; only (l_orderkey, l_returnflag) survive the
    projection, so the shuffle carries two columns."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    ).select("l_orderkey", "l_returnflag")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(hi.cast("long")).cast("long").alias("high_line_count"),
            F.sum((~hi).cast("long")).cast("long").alias("low_line_count"),
        )
    )


@register(
    "top_revenue_supplier",
    # Q15 shape: quarterly revenue per supplier (an aggregate "view"),
    # then the supplier(s) achieving the MAXIMUM of that aggregate —
    # max-over-aggregate join-back; revenue rounded to 4dp BEFORE the max
    # so tie/argmax selection is engine-stable
    oracle="""
    WITH rev AS (
      SELECT l_suppkey, ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s JOIN rev r ON s.s_suppkey = r.l_suppkey
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM rev)
    """,
    tags=("tpch", "aggregates", "Q15-shape"),
)
def top_revenue_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: build the revenue 'view' (one agg over the
    date-filtered fact), take its scalar max, and join back to keep every
    supplier tying the maximum — aggregate-of-aggregate with a
    broadcast-scalar comparison rather than a window (no per-row ranking
    pass over the view). The date filter pushes into the lineitem scan."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    rev = li.groupBy(F.col("l_suppkey")).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
            "total_revenue"
        )
    )
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    top = rev.crossJoin(F.broadcast(mx)).filter(F.col("total_revenue") == F.col("mx"))
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return s.join(top, s.s_suppkey == top.l_suppkey).select(
        "s_suppkey", "s_name", "total_revenue"
    )


@register(
    "important_part_values",
    # Q11 shape: per-part value, kept only when above a FRACTION OF THE
    # GLOBAL TOTAL — the scalar-subquery-threshold pattern (HAVING vs a
    # second aggregate over the same view)
    oracle="""
    WITH val AS (
      SELECT l_partkey, SUM(l_extendedprice * (1 - l_discount)) AS v
      FROM lineitem GROUP BY l_partkey
    )
    SELECT l_partkey, ROUND(v, 4) AS part_value
    FROM val WHERE ROUND(v, 4) > (SELECT ROUND(SUM(v) * 0.0005, 4) FROM val)
    """,
    tags=("tpch", "aggregates", "Q11-shape"),
)
def important_part_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: per-group value filtered against a fraction of the
    GLOBAL total of the same aggregate — the scalar-subquery HAVING
    pattern. The view aggregates once; the global total is a 1-row
    broadcast compared map-side, so the second 'pass' over the view is
    free (no re-aggregation, no window). Both sides of the threshold
    comparison are rounded to 4dp before comparing (mirroring
    `top_revenue_supplier`): Spark and DuckDB sum in different orders, so
    an unrounded compare could flip a part sitting within float noise of
    the global 0.0005 cut."""
    li = load_table(spark, sf_dir, "lineitem")
    val = li.groupBy("l_partkey").agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("v")
    )
    thr = val.agg(F.round(F.sum("v") * 0.0005, 4).alias("thr"))
    return (
        val.crossJoin(F.broadcast(thr))
        .filter(F.round(F.col("v"), 4) > F.col("thr"))
        .select("l_partkey", F.round("v", 4).alias("part_value"))
    )


@register(
    "customer_order_distribution",
    # Q13 shape: distribution of customers by order count INCLUDING
    # zero-order customers — the left-outer + double-aggregate pattern
    oracle="""
    WITH per_cust AS (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey
    )
    SELECT CAST(c_count AS BIGINT) AS c_count,
           CAST(COUNT(*) AS BIGINT) AS custdist
    FROM per_cust GROUP BY c_count
    """,
    tags=("tpch", "joins", "aggregates", "Q13-shape"),
)
def customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: how many customers placed exactly k orders, with
    zero-order customers kept by the LEFT OUTER join (COUNT of the
    nullable key, not COUNT(*)). Two-level aggregation: the first is
    custkey-keyed (the only real shuffle), the second collapses to at
    most max-orders-per-customer keys — effectively free."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist")).select(
        F.col("c_count").cast("long").alias("c_count"), "custdist"
    )


@register(
    "sole_late_supplier_counts",
    # Q21 shape (adapted to this schema's columns: "late" = shipped more
    # than 90 days after the order date): suppliers who were the ONLY
    # late shipper on a multi-supplier order — EXISTS (another supplier
    # on the order) AND NOT EXISTS (another LATE supplier) composed as
    # semi/anti joins over a per-(order, supplier) rollup.
    oracle="""
    WITH os AS (
      SELECT l.l_orderkey, l.l_suppkey,
             MAX(CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
                      THEN 1 ELSE 0 END) AS is_late
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
      GROUP BY l.l_orderkey, l.l_suppkey
    ),
    stats AS (
      SELECT l_orderkey, COUNT(*) AS n_supp, SUM(is_late) AS n_late
      FROM os GROUP BY l_orderkey
    ),
    sole AS (
      SELECT os.l_suppkey
      FROM os JOIN stats USING (l_orderkey)
      WHERE os.is_late = 1 AND stats.n_supp > 1 AND stats.n_late = 1
    )
    SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM sole JOIN supplier s ON s.s_suppkey = sole.l_suppkey
    GROUP BY s.s_name
    """,
    tags=("tpch", "joins", "exists", "Q21-shape"),
)
def sole_late_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (suppliers who kept orders waiting), adapted to
    this schema: per (order, supplier) compute a late flag (shipped > 90
    days after the order date), then keep suppliers who were LATE on an
    order that HAD other suppliers (EXISTS) where NO other supplier was
    late (NOT EXISTS). Both EXISTS conditions collapse into one bounded
    per-order stats aggregate joined back — the set-logic of Q21 without
    correlated per-row subqueries, which is exactly how a distributed
    planner should execute it."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    late = F.max(
        (F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 90)).cast("int")
    ).alias("is_late")
    os_ = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "l_suppkey")
        .agg(late)
    )
    stats = os_.groupBy("l_orderkey").agg(
        F.count("*").alias("n_supp"), F.sum("is_late").alias("n_late")
    )
    sole = (
        os_.join(stats, "l_orderkey")
        .filter((F.col("is_late") == 1) & (F.col("n_supp") > 1) & (F.col("n_late") == 1))
        .select("l_suppkey")
    )
    return (
        sole.join(F.broadcast(s), sole.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )
