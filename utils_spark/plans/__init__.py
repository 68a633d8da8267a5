"""Physical-plan introspection: assert the plans we designed for are the
plans Catalyst actually produces (pushdown reached the scan, dimensions
broadcast, shuffle counts bounded) — the 100 TB design contract, checked
mechanically in tests rather than by eyeballing .explain output.
"""

from __future__ import annotations

import re
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
