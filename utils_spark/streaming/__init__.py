"""Structured Streaming operators over event streams.

The reference is batch-only (SURVEY §2.9); this module provides the
streaming surface the north star requires (BASELINE.json): tumbling/
sliding event-time windows with watermarks, gap-based session windows,
and stateful deduplication — each the streaming twin of a batch query in
utils_spark.queries (tumbling_window / sessionize / exact_dedup), sharing
the same expressions so batch results certify streaming semantics.
"""

from utils_spark.streaming.windows import (  # noqa: F401
    read_events_stream,
    sessionized_stream,
    stateful_dedup_stream,
    windowed_counts_stream,
)
