"""utils_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the query / data-processing capabilities of
the reference library ``liezeltamon/utils`` (an R data-wrangling toolkit —
see SURVEY.md), built Spark-first: DataFrame/SQL logical plans optimized by
Catalyst, MLlib for ML operators, Structured Streaming for event streams.
Every operator is designed for horizontally-partitioned execution at 100 TB
scale — long-format data models, broadcast joins for dimensions, no
driver-side materialization of bulk data.

Layout:
    session    SparkSession factory with scale-tuned defaults
    io         parquet/csv scans + table loader for the test star schema
    functions  reusable Column-expression builders (pure, JVM-side)
    operators  composite reusable operators (sampling, stats, dedup, ...)
    queries    the registered query surface (one entry per SURVEY.md §2 op)
    registry   query registration + lookup (drives __spark_entry__.py)
    streaming  Structured Streaming operators over the events table
"""

__version__ = "0.1.0"

from utils_spark.session import get_spark  # noqa: F401
from utils_spark.io import load_table, register_views  # noqa: F401
