"""Structured Streaming tests: run each streaming operator over the events
table as a file stream (availableNow trigger → memory sink) and certify
the results against the batch twin computed with plain DataFrame ops.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from utils_spark.io import load_table
from utils_spark.streaming import (
    read_events_stream,
    sessionized_stream,
    stateful_dedup_stream,
    windowed_counts_stream,
)


def _run_stream(df, name: str, timeout: int = 120):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete" if name != "dedup" else "append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout)
    return q


def test_windowed_counts_matches_batch(spark, sf_dir):
    stream = windowed_counts_stream(read_events_stream(spark, sf_dir))
    _run_stream(stream, "win_counts")
    got = {
        (r["window_start"], r["event_type"]): (r["n"], r["total_value"])
        for r in spark.sql("SELECT * FROM win_counts").collect()
    }
    batch = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("total_value"))
    )
    want = {
        (r["w"]["start"], r["event_type"]): (r["n"], r["total_value"]) for r in batch.collect()
    }
    assert got == want


def test_sessionized_stream_matches_batch_gaps(spark, sf_dir):
    stream = sessionized_stream(read_events_stream(spark, sf_dir))
    _run_stream(stream, "sessions")
    got = spark.sql("SELECT * FROM sessions").collect()
    # batch twin: gap-based sessionization (same 30-min gap); session end in
    # session_window semantics = last event + gap
    from utils_spark.registry import load_all

    batch = load_all()["sessionize"].fn(spark, sf_dir).collect()
    assert len(got) == len(batch), "session count must match batch sessionization"
    got_counts = sorted((r["user_id"], r["n_events"]) for r in got)
    want_counts = sorted((r["user_id"], r["n_events"]) for r in batch)
    assert got_counts == want_counts


def test_stateful_dedup_stream(spark, sf_dir):
    ev = read_events_stream(spark, sf_dir)
    # duplicate the stream rows deterministically → dedup must restore counts
    doubled = ev.union(ev)
    q = (
        stateful_dedup_stream(doubled)
        .writeStream.format("memory")
        .queryName("dedup")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    n = spark.sql("SELECT count(*) AS n FROM dedup").collect()[0]["n"]
    n_batch = load_table(spark, sf_dir, "events").count()
    assert n == n_batch


def test_sliding_window_stream_matches_batch(spark, sf_dir):
    stream = windowed_counts_stream(
        read_events_stream(spark, sf_dir), window="1 hour", slide="30 minutes"
    )
    _run_stream(stream, "slide_counts")
    got = {
        (r["window_start"], r["event_type"]): r["n"]
        for r in spark.sql("SELECT * FROM slide_counts").collect()
    }
    batch = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
    )
    want = {(r["w"]["start"], r["event_type"]): r["n"] for r in batch.collect()}
    assert got == want
