"""Physical-plan introspection: assert the plans we designed for are the
plans Catalyst actually produces (pushdown reached the scan, dimensions
broadcast, shuffle counts bounded) — the 100 TB design contract, checked
mechanically in tests rather than by eyeballing .explain output.
"""

from __future__ import annotations

import re
from contextlib import contextmanager
from dataclasses import dataclass

from pyspark.sql import DataFrame


@dataclass
class PlanSummary:
    n_exchanges: int  # shuffle boundaries
    n_broadcast_joins: int
    n_sortmerge_joins: int
    pushed_filters: list[str]  # non-empty PushedFilters specs per scan
    read_schemas: list[str]  # ReadSchema per scan (column pruning evidence)
    n_codegen_stages: int
    text: str


def plan_summary(df: DataFrame) -> PlanSummary:
    qe = df._jdf.queryExecution()  # type: ignore[attr-defined]
    jvm = df._sc._jvm  # type: ignore[attr-defined]
    text = jvm.PythonSQLUtils.explainString(qe, "formatted")
    codegen_text = jvm.PythonSQLUtils.explainString(qe, "codegen")
    # count only the numbered detail-section nodes — the tree header would
    # double-count every operator
    node = lambda name: len(re.findall(rf"^\(\d+\) {name}\b", text, re.MULTILINE))
    m = re.search(r"Found (\d+) WholeStageCodegen subtrees", codegen_text)
    return PlanSummary(
        n_exchanges=node("Exchange") + node("AQEShuffleRead") * 0,
        n_broadcast_joins=node("BroadcastHashJoin") + node("BroadcastNestedLoopJoin"),
        n_sortmerge_joins=node("SortMergeJoin"),
        pushed_filters=[m2 for m2 in re.findall(r"PushedFilters: \[([^\]]*)\]", text) if m2.strip()],
        read_schemas=re.findall(r"ReadSchema: struct<([^>]*)>", text),
        n_codegen_stages=int(m.group(1)) if m else 0,
        text=text,
    )


def cut_lineage(df: DataFrame) -> DataFrame:
    """``localCheckpoint`` + plan-statistics reset, for iterative algorithms.

    ``Dataset.localCheckpoint`` truncates the lineage but copies the child
    plan's ``sizeInBytes`` statistic into the resulting ``LogicalRDD``.
    Join-heavy iterative plans then MULTIPLY those carried BigIntegers every
    round (``SizeInBytesOnlyStatsPlanVisitor.visitJoin``), so the stat's
    digit count grows geometrically with the iteration count and the driver
    ends up burning unbounded CPU on BigInteger Karatsuba/Toom-Cook math
    (observed: 3× digits and ~3× planning time per sweep in Louvain by
    sweep 15). Rebuilding the DataFrame over the already-checkpointed
    internal RDD drops the carried stat to the bounded default; AQE
    re-derives true sizes at runtime, so join strategies are unaffected.

    Falls back to the plain checkpoint if the internal constructor moves.
    """
    ck = df.localCheckpoint()
    try:
        spark = ck.sparkSession
        jrdd = ck._jdf.queryExecution().toRdd()  # type: ignore[attr-defined]
        jdf = spark._jsparkSession.internalCreateDataFrame(  # type: ignore[attr-defined]
            jrdd, ck._jdf.schema(), False  # type: ignore[attr-defined]
        )
        return DataFrame(jdf, spark)
    except Exception:
        return ck


@contextmanager
def scaled_shuffle_partitions(spark, n_rows: int, rows_per_partition: int = 100_000):
    """Temporarily size ``spark.sql.shuffle.partitions`` from a MEASURED
    row count, for iterative/multi-join algorithms over bounded data.

    The session default is sized for corpus-scale scans; an iterative
    algorithm that shuffles the same small graph dozens of times would pay
    scheduling for hundreds of near-empty tasks per sweep (AQE coalesces
    post-shuffle reads, but each pre-coalesce stage still schedules the
    full task count). On real 100 TB inputs ``n_rows/rows_per_partition``
    exceeds the session setting and this is a NO-OP — it only ever shrinks
    parallelism for provably small inputs, never grows past the session's
    choice. Floor of 2 partitions: a single partition serializes the whole
    multi-stage chain onto one core (measured ~+40% on the Louvain sweeps
    vs 2). Conf restored on exit.
    """
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    parts = min(int(prev), max(2, -(-max(n_rows, 1) // rows_per_partition)))
    parts = max(parts, 1)
    spark.conf.set("spark.sql.shuffle.partitions", str(parts))
    try:
        yield parts
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
