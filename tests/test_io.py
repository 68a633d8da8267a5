"""Round-trip tests for the scan/sink surface (reference S1-S4, S8-S9)."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from utils_spark.io import load_table, read_delimited, write_csv, write_parquet


def test_tsv_roundtrip(spark):
    with tempfile.TemporaryDirectory() as d:
        src = load_table(spark, "/root/testdata/sf0.001", "nation")
        path = os.path.join(d, "nation_tsv")
        src.write.option("sep", "\t").option("header", "true").csv(path)
        back = read_delimited(spark, path, sep="\t")
        assert sorted(r["n_name"] for r in back.collect()) == sorted(
            r["n_name"] for r in src.collect()
        )
        assert dict(back.dtypes)["n_nationkey"] == "int"  # inferSchema


def test_csv_sink_and_scan(spark):
    with tempfile.TemporaryDirectory() as d:
        src = load_table(spark, "/root/testdata/sf0.001", "region")
        path = os.path.join(d, "region_csv")
        write_csv(src, path)
        back = read_delimited(spark, path, sep=",")
        assert back.count() == 5


def test_parquet_sink_partitioned(spark):
    with tempfile.TemporaryDirectory() as d:
        src = load_table(spark, "/root/testdata/sf0.001", "customer")
        path = os.path.join(d, "cust_parq")
        write_parquet(src, path, partition_by=["c_mktsegment"])
        # partition pruning: reading one segment touches one directory
        seg = spark.read.parquet(path).filter(F.col("c_mktsegment") == "BUILDING")
        assert seg.count() == src.filter(F.col("c_mktsegment") == "BUILDING").count()
        assert any("c_mktsegment=BUILDING" in p for p in os.listdir(path))


def test_gz_scan_transparent(spark):
    import gzip

    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "t.tsv.gz")
        with gzip.open(p, "wt") as f:
            f.write("a\tb\n1\tx\n2\ty\n")
        df = read_delimited(spark, p, sep="\t")
        assert df.count() == 2 and dict(df.dtypes)["a"] == "int"


def test_events_reads_on_vanilla_session(spark):
    """Driver-environment regression guard (VERDICT r1 item 1).

    The driver supplies its OWN SparkSession, not our session factory, so
    load_table must set spark.sql.legacy.parquet.nanosAsLong at runtime.
    newSession() shares the JVM but gets a FRESH SQLConf — exactly the
    vanilla-session scenario that broke 6 queries in round 1.
    """
    vanilla = spark.newSession()
    # newSession inherits builder-time conf from the SparkContext; unset to
    # reproduce a session that never saw our factory at all.
    vanilla.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    assert vanilla.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true"
    e = load_table(vanilla, "/root/testdata/sf0.001", "events")
    assert dict(e.dtypes)["ts"] == "timestamp"
    assert e.count() > 0
