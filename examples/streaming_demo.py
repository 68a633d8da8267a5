"""Structured Streaming on utils_spark: every streaming topology, live.

Run: python examples/streaming_demo.py  (expects /root/testdata/sf0.001)

Each block runs a REAL streaming job (file source → availableNow trigger →
memory sink) through the registered driver queries, so everything shown
here is also cross-engine verified against DuckDB SQL at three scale
factors (see utils_spark/queries/streaming_live.py). On a cluster the
identical plans run unbounded against Kafka with a processing-time
trigger; availableNow is the bounded-backfill form of the same plan.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from utils_spark import get_spark
from utils_spark.registry import load_all

SF = "/root/testdata/sf0.001"


def main() -> None:
    spark = get_spark(app_name="streaming_demo", cpus=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    reg = load_all()

    def show(name: str, n: int = 5) -> None:
        print(f"\n=== {name} — {reg[name].doc.strip().splitlines()[0]}")
        reg[name].fn(spark, SF).show(n, truncate=80)

    # event-time windowed aggregation with watermarked state
    show("stream_tumbling_counts")
    # native session windows (inactivity-gap merging in the state store)
    show("stream_session_windows")
    # stateful exact dedup: the stream arrives DOUBLED, one copy survives
    show("stream_stateful_dedup")
    # custom per-key state via applyInPandasWithState
    show("stream_custom_state_profile")
    # stream-static broadcast enrichment
    show("stream_static_enrich")
    # stream-stream interval self-join (two-sided time bound = bounded state)
    show("stream_stream_interval_join")

    spark.stop()


if __name__ == "__main__":
    main()
