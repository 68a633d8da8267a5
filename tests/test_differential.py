"""Seeded random differential testing (mini-SQLancer): generate random
filter + group-by + aggregate queries over the star schema, run them
through BOTH the Spark DataFrame API and DuckDB SQL, and compare exactly.

Complements the hand-written oracle suite with breadth: each seed yields a
different query shape, so engine-semantics differences (null handling,
predicate edge cases, type coercion) surface without hand-writing cases.
All generated aggregates follow the repo's cross-engine float conventions
(counts, min/max of stored values, 4dp-rounded sums — no boundary-prone
averages).
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

TABLES = {
    "lineitem": {
        "numeric": ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        "cat": ["l_returnflag", "l_linestatus"],
        "key": "l_orderkey",
    },
    "orders": {
        "numeric": ["o_totalprice"],
        "cat": ["o_orderstatus", "o_orderpriority"],
        "key": "o_orderkey",
    },
    "customer": {
        "numeric": ["c_acctbal"],
        "cat": ["c_mktsegment"],
        "key": "c_custkey",
    },
    # north-star tables: the text/streaming domains get the same random
    # differential breadth as the TPC-H core
    "documents": {
        "numeric": ["n_chars"],
        "cat": ["lang", "source"],
        "key": "doc_id",
    },
    "events": {
        "numeric": ["value"],
        "cat": ["event_type"],
        "key": "event_id",
    },
}

CAT_VALUES = {
    "l_returnflag": ["A", "N", "R"],
    "l_linestatus": ["O", "F"],
    "o_orderstatus": ["O", "F", "P"],
    "o_orderpriority": ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"],
    "c_mktsegment": ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"],
    "lang": ["de", "en", "es", "fr", "zh"],
    "source": [f"src{i}" for i in range(20)],
    "event_type": ["click", "error", "purchase", "signup", "view"],
}

NUM_RANGES = {
    "l_quantity": (1, 50),
    "l_extendedprice": (900, 100000),
    "l_discount": (0.0, 0.1),
    "l_tax": (0.0, 0.08),
    "o_totalprice": (800, 550000),
    "c_acctbal": (-1000, 10000),
    "n_chars": (40, 600),
    "value": (0.0, 500.0),
}


def _gen_query(rng: random.Random):
    """Returns (table, predicates, group_col_or_None, agg_specs)."""
    table = rng.choice(list(TABLES))
    meta = TABLES[table]
    preds = []
    for _ in range(rng.randint(0, 3)):
        if rng.random() < 0.5:
            col = rng.choice(meta["numeric"])
            lo, hi = NUM_RANGES[col]
            a = round(rng.uniform(lo, hi), 2)
            op = rng.choice([">", "<", ">=", "<="])
            preds.append((col, op, a))
        else:
            col = rng.choice(meta["cat"])
            vals = rng.sample(CAT_VALUES[col], rng.randint(1, len(CAT_VALUES[col])))
            neg = rng.random() < 0.3
            preds.append((col, "not in" if neg else "in", vals))
    group = rng.choice(meta["cat"] + [None])
    num = rng.choice(meta["numeric"])
    aggs = rng.sample(
        [
            ("count", "*"),
            ("sum4", num),
            ("min", num),
            ("max", num),
            ("count_distinct", rng.choice(meta["cat"])),
        ],
        rng.randint(1, 3),
    )
    return table, preds, group, aggs


def _spark_run(spark, sf_dir, table, preds, group, aggs):
    from utils_spark.io import load_table

    df = load_table(spark, sf_dir, table)
    for col, op, val in preds:
        c = F.col(col)
        if op == "in":
            df = df.filter(c.isin(val))
        elif op == "not in":
            df = df.filter(~c.isin(val))
        elif op == ">":
            df = df.filter(c > val)
        elif op == "<":
            df = df.filter(c < val)
        elif op == ">=":
            df = df.filter(c >= val)
        else:
            df = df.filter(c <= val)
    exprs = []
    for i, (kind, col) in enumerate(aggs):
        name = f"a{i}"
        if kind == "count":
            exprs.append(F.count("*").alias(name))
        elif kind == "sum4":
            # cast to double FIRST so integer columns stringify identically
            # in both engines (Spark bigint '30428' vs DuckDB ROUND '30428.0')
            exprs.append(F.round(F.sum(F.col(col).cast("double")), 4).alias(name))
        elif kind == "min":
            exprs.append(F.min(col).alias(name))
        elif kind == "max":
            exprs.append(F.max(col).alias(name))
        else:
            exprs.append(F.countDistinct(col).alias(name))
    return (df.groupBy(group) if group else df.groupBy()).agg(*exprs)


def _sql_lit(v):
    return f"'{v}'" if isinstance(v, str) else repr(v)


def _duck_sql(table, preds, group, aggs):
    where = []
    for col, op, val in preds:
        if op in ("in", "not in"):
            where.append(f"{col} {op.upper()} ({', '.join(_sql_lit(v) for v in val)})")
        else:
            where.append(f"{col} {op} {val}")
    sel = []
    for i, (kind, col) in enumerate(aggs):
        name = f"a{i}"
        if kind == "count":
            sel.append(f"CAST(COUNT(*) AS BIGINT) AS {name}")
        elif kind == "sum4":
            sel.append(f"ROUND(SUM(CAST({col} AS DOUBLE)), 4) AS {name}")
        elif kind == "min":
            sel.append(f"MIN({col}) AS {name}")
        elif kind == "max":
            sel.append(f"MAX({col}) AS {name}")
        else:
            sel.append(f"CAST(COUNT(DISTINCT {col}) AS BIGINT) AS {name}")
    cols = ([group] if group else []) + sel
    sql = f"SELECT {', '.join(cols)} FROM {table}"
    if where:
        sql += " WHERE " + " AND ".join(where)
    if group:
        sql += f" GROUP BY {group}"
    return sql


N_SEEDS = int(__import__("os").environ.get("SPARK_GRAFT_DIFF_SEEDS", "25"))


@pytest.mark.parametrize("seed", range(N_SEEDS))
def test_random_differential(spark, duck, sf_dir, seed):
    rng = random.Random(1000 + seed)
    table, preds, group, aggs = _gen_query(rng)
    sdf = _spark_run(spark, sf_dir, table, preds, group, aggs)
    srows = sorted(tuple(str(x) for x in r) for r in sdf.collect())
    drows = sorted(tuple(str(x) for x in r) for r in duck.execute(_duck_sql(table, preds, group, aggs)).fetchall())
    assert srows == drows, (
        f"seed={seed} table={table} preds={preds} group={group} aggs={aggs}\n"
        f"spark={srows[:3]}\nduck={drows[:3]}"
    )


@pytest.mark.parametrize("seed", range(max(15, N_SEEDS // 2)))
def test_random_differential_joins(spark, duck, sf_dir, seed):
    """Join-shaped differential queries: orders ⋈ customer with random
    filters on both sides, grouped on a random side's category."""
    from utils_spark.io import load_table

    rng = random.Random(9000 + seed)
    o_pred = round(rng.uniform(*NUM_RANGES["o_totalprice"]), 2)
    c_pred = round(rng.uniform(*NUM_RANGES["c_acctbal"]), 2)
    group = rng.choice(["c_mktsegment", "o_orderpriority", "o_orderstatus"])
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > o_pred)
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_acctbal") < c_pred)
    sdf = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy(group)
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("o_totalprice"), 4).alias("s"),
            F.countDistinct("o_custkey").alias("cd"),
        )
    )
    sql = f"""
        SELECT {group}, CAST(COUNT(*) AS BIGINT) AS n,
               ROUND(SUM(o_totalprice), 4) AS s,
               CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS cd
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        WHERE o_totalprice > {o_pred} AND c_acctbal < {c_pred}
        GROUP BY {group}
    """
    srows = sorted(tuple(str(x) for x in r) for r in sdf.collect())
    drows = sorted(tuple(str(x) for x in r) for r in duck.execute(sql).fetchall())
    assert srows == drows, f"seed={seed} group={group} o>{o_pred} c<{c_pred}"


@pytest.mark.parametrize("seed", [11, 23, 47])
def test_knn_graph_differential_vs_numpy_lsh_union(spark, seed):
    """Whole-operator differential for knn_graph (hash → bucket join →
    r14 per-bucket top-k prefilter → cross-table dedup → global top-k)
    against an independent numpy re-derivation of the SAME LSH scheme:
    hashes = floor(v·u_j / L) per table, candidates = union over tables
    of same-bucket others, exact distances, top-k by (dist, dst). Pins
    the r14 prefilter's exactness argument permanently — any cut that
    drops a true global winner diverges here. Integer-valued vectors
    keep every distance float-exact, so ties at the k boundary (which
    the fixture deliberately contains via repeated coordinates) compare
    with == not tolerance."""
    import math
    import random as _random

    from utils_spark.operators.ml import _fitted_brp_lsh, _to_vector_col, knn_graph

    rng = _random.Random(seed)
    n, d, k, L, tables = 300, 3, 5, 3.0, 3
    pts = {i: [float(rng.randrange(0, 12)) for _ in range(d)] for i in range(n)}
    df = spark.createDataFrame(
        [(i, v) for i, v in pts.items()], "id bigint, v array<double>"
    )
    got = {
        (r.src, r.dst): r.dist
        for r in knn_graph(df, "id", "v", k=k, bucket_length=L, num_hash_tables=tables).collect()
    }

    work = _to_vector_col(df, "v", "__feat").select(F.col("id").alias("__key"), "__feat")
    model = _fitted_brp_lsh(work, L, tables)
    units = [
        [float(x) for x in u.toArray()]
        for u in model._java_obj.randUnitVectors()  # type: ignore[attr-defined]
    ]
    buckets: dict[tuple[int, int], list[int]] = {}
    for i, v in pts.items():
        for t, u in enumerate(units):
            h = math.floor(sum(a * b for a, b in zip(v, u)) / L)
            buckets.setdefault((t, h), []).append(i)
    want: dict[tuple[int, int], float] = {}
    for i, v in pts.items():
        cand = set()
        for t, u in enumerate(units):
            h = math.floor(sum(a * b for a, b in zip(v, u)) / L)
            cand.update(j for j in buckets[(t, h)] if j != i)
        scored = sorted(
            (math.sqrt(sum((a - b) ** 2 for a, b in zip(v, pts[j]))), j) for j in cand
        )
        for dist, j in scored[:k]:
            want[(i, j)] = dist
    assert set(got) == set(want), (
        f"edge sets diverge: missing={sorted(set(want) - set(got))[:5]} "
        f"extra={sorted(set(got) - set(want))[:5]}"
    )
    assert all(got[e] == want[e] for e in want)
