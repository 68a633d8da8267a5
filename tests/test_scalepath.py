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


def test_zorder_write_prunes_both_dimensions(spark, sf_dir, tmp_path):
    """Drive the Z-order layout through an actual sorted parquet write and
    verify the data-skipping property on the FILES: after
    repartitionByRange(morton) + sortWithinPartitions(morton), a selective
    predicate on EITHER interleaved key overlaps only a small fraction of
    files' min/max footprints — the judgment a parquet reader makes from
    row-group stats. A single-column sort gives this for one key only."""
    from utils_spark.io import load_table
    from utils_spark.functions import morton_interleave

    li = load_table(spark, sf_dir, "lineitem")
    ext = F.broadcast(
        li.agg(
            F.min("l_orderkey").alias("minx"),
            F.max("l_orderkey").alias("maxx"),
            F.min("l_partkey").alias("miny"),
            F.max("l_partkey").alias("maxy"),
        )
    )
    z = (
        li.select("l_orderkey", "l_partkey")
        .crossJoin(ext)
        .select(
            "l_orderkey",
            "l_partkey",
            F.expr("((l_orderkey - minx) * 256) DIV (maxx - minx + 1)").alias("xb"),
            F.expr("((l_partkey - miny) * 256) DIV (maxy - miny + 1)").alias("yb"),
        )
        .withColumn("morton", morton_interleave("xb", "yb", bits=8))
    )
    out = str(tmp_path / "zsorted")
    n_files = 16
    z.repartitionByRange(n_files, "morton").sortWithinPartitions("morton").write.mode(
        "overwrite"
    ).parquet(out)

    # per-file footprints = the min/max stats a reader prunes with
    import pyarrow.parquet as pq
    import glob as _glob

    foot = []
    for f in sorted(_glob.glob(out + "/part-*.parquet")):
        md = pq.read_metadata(f)
        xs, ys = [], []
        for rg in range(md.num_row_groups):
            row = md.row_group(rg)
            cols = {row.column(i).path_in_schema: row.column(i) for i in range(row.num_columns)}
            xs += [cols["xb"].statistics.min, cols["xb"].statistics.max]
            ys += [cols["yb"].statistics.min, cols["yb"].statistics.max]
        foot.append((min(xs), max(xs), min(ys), max(ys)))
    assert len(foot) == n_files

    # a 1/16-wide predicate on EITHER dimension must overlap only a
    # minority of file footprints (perfect Z-layout: ~1/4 of files for a
    # 1/16 slice at 16 files; a single-column sort leaves the OTHER
    # dimension overlapping EVERY file)
    def overlapping(lo, hi, dim):
        a, b = (0, 1) if dim == "x" else (2, 3)
        return sum(1 for ft in foot if not (ft[b] < lo or ft[a] > hi))

    x_hit = overlapping(0, 15, "x")
    y_hit = overlapping(0, 15, "y")
    assert x_hit <= n_files // 2, (x_hit, foot)
    assert y_hit <= n_files // 2, (y_hit, foot)


def test_morton_interleave_bijective_and_local(spark):
    """morton_interleave must be a bijection [0,2^b)² → [0,4^b) matching
    the reference bit-interleave, and adjacent codes must stay adjacent in
    at least one dimension (the locality that makes Z-order prune)."""
    from utils_spark.functions import morton_interleave

    bits = 4  # exhaustive 16×16 grid
    rows = [(x, y) for x in range(1 << bits) for y in range(1 << bits)]
    df = spark.createDataFrame(rows, ["xb", "yb"]).withColumn(
        "m", morton_interleave("xb", "yb", bits=bits)
    )
    got = {(r.xb, r.yb): r.m for r in df.collect()}

    def ref(x, y):
        m = 0
        for b in range(bits):
            m |= ((x >> b) & 1) << (2 * b)
            m |= ((y >> b) & 1) << (2 * b + 1)
        return m

    assert all(got[(x, y)] == ref(x, y) for x, y in rows)
    assert len(set(got.values())) == len(rows)  # bijection
    assert sorted(got.values()) == list(range(len(rows)))  # onto [0, 4^b)
