"""Streaming window operators (tumbling, sliding, session) + stateful dedup.

Scale design: watermarks bound state; aggregations are partial+final like
batch; session windows use Spark's native session_window state store. At
100 TB/day the same code runs against Kafka/file sources — only the
readStream source line changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)


def _events_raw_schema(ts_type) -> StructType:
    return StructType(
        [
            StructField("event_id", LongType()),
            StructField("ts", ts_type),
            StructField("user_id", LongType()),
            StructField("event_type", StringType()),
            StructField("value", DoubleType()),
            StructField("props", StringType()),
        ]
    )


# rounds 1-2 testdata: ts = TIMESTAMP(NANOS) read as long nanos
# (see utils_spark.io.load_table for the batch twin of this conversion)
EVENTS_RAW_SCHEMA = _events_raw_schema(LongType())


def read_events_stream(spark: SparkSession, sf_dir: str, max_files_per_trigger: int | None = None) -> DataFrame:
    """File-source stream over the events table (stand-in for Kafka in this
    environment). `events.ts` has shipped as TIMESTAMP(NANOS) and as
    TIMESTAMP(MICROS, ntz) across testdata regenerations; we probe the
    stored type with one batch footer read, then mirror ``load_table``'s
    two normalization branches so stream and batch schemas are identical
    (a unit test pins that equality)."""
    # one-footer probe of the STORED parquet type (lazy scan — only the
    # schema is materialized). The conf guards below duplicate load_table's
    # defensive pattern on purpose: a caller-supplied vanilla session must
    # read identically (nanosAsLong set BEFORE the probe, UTC keeping the
    # ntz cast and window/hour extraction wall-clock-exact vs the oracles).
    if spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # no sentinel default — Spark 4 validates unset-conf defaults (see io.py)
    if spark.conf.get("spark.sql.session.timeZone") != "UTC":
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    stored_ts = dict(spark.read.parquet(f"{sf_dir}/events.parquet").dtypes)["ts"]
    if stored_ts == "bigint":
        schema = EVENTS_RAW_SCHEMA
    else:
        from pyspark.sql.types import TimestampNTZType, TimestampType

        schema = _events_raw_schema(
            TimestampNTZType() if stored_ts == "timestamp_ntz" else TimestampType()
        )
    reader = spark.readStream.schema(schema).option("pathGlobFilter", "events.parquet")
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    # the file source needs a DIRECTORY; select just the events file by glob
    df = reader.parquet(sf_dir)
    if stored_ts == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif stored_ts == "timestamp_ntz":
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def read_documents_stream(
    spark: SparkSession, sf_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream over the documents table — the ingest stand-in
    for a document firehose (Kafka/queue in production). Schema comes
    from the batch loader so stream and batch agree by construction
    (documents has no legacy-timestamp branches, so no further
    normalization is needed)."""
    from utils_spark.io import load_table

    schema = load_table(spark, sf_dir, "documents").schema
    reader = spark.readStream.schema(schema).option("pathGlobFilter", "documents.parquet")
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    # the file source needs a DIRECTORY; select just the documents file
    return reader.parquet(sf_dir)


def windowed_counts_stream(
    events: DataFrame,
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling (or sliding, if `slide` given) event-time windowed
    aggregation with a watermark bounding late data and state size.
    Identical expressions to the batch `tumbling_window` query."""
    win = F.window("ts", window, slide) if slide else F.window("ts", window)
    return (
        events.withWatermark("ts", watermark)
        .groupBy(win.alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 4).alias("total_value"),
            F.round(F.avg("value"), 6).alias("avg_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "total_value", "avg_value")
    )


def sessionized_stream(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Per-user session windows with an inactivity gap — the streaming twin
    of the batch `sessionize` query. Spark's native session_window merges
    events whose gaps are < `gap`; state is bounded by the watermark."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("session_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "session_value",
        )
    )


def stateful_dedup_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Stateful exact dedup on event_id within the watermark horizon
    (dropDuplicatesWithinWatermark): duplicates arriving within the state
    window are dropped; state is purged as the watermark advances — the
    streaming form of hash-groupBy exact dedup with bounded memory."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(["event_id"])


def running_user_stats_stream(events: DataFrame, timeout: str = "NoTimeout") -> DataFrame:
    """CUSTOM stateful streaming operator via applyInPandasWithState: a
    per-user running profile (event count, value total, max single value)
    maintained in explicit GroupState across micro-batches — the escape
    hatch for stateful logic that windowed aggregation can't express
    (task brief: 'applyInPandasWithState for custom stateful operators').

    Each trigger emits the user's updated running totals. State is a
    3-tuple (n, total, vmax) per user — O(1) per key, no event retention."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )
    import pandas as pd

    out_schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("n_events", LongType()),
            StructField("total_value", DoubleType()),
            StructField("max_value", DoubleType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("n", LongType()),
            StructField("total", DoubleType()),
            StructField("vmax", DoubleType()),
        ]
    )

    def update(key, pdf_iter, state: "GroupState"):
        (user_id,) = key
        if state.exists:
            n, total, vmax = state.get
        else:
            n, total, vmax = 0, 0.0, float("-inf")
        for pdf in pdf_iter:
            vals = pd.to_numeric(pdf["value"], errors="coerce").dropna()
            n += len(pdf)
            total += float(vals.sum())
            if len(vals):
                vmax = max(vmax, float(vals.max()))
        state.update((n, total, vmax))
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_events": [n],
                "total_value": [round(total, 4)],
                "max_value": [vmax if vmax != float("-inf") else None],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )
