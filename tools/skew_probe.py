"""Partition-skew probe: straggler-risk evidence for the 100 TB story.

The shuffle-volume probe (tools/shuffle_probe.py) witnesses that network
cost scales linearly — but linear TOTAL bytes can still concentrate on
one hot key, and at 1000 executors one reduce partition holding 10× the
median becomes the stage's straggler (everything else waits). Per-task
shuffle-READ bytes are the signal: Spark's status REST API serves
min/median/max task quantiles per stage, so the max/median ratio of the
heaviest fresh stage is a deterministic straggler-risk witness for a
fixed plan + dataset.

    python tools/skew_probe.py q1 q2 ...            # named registry queries
    python tools/skew_probe.py --check 8 q1 ...     # custom skew ratio gate
    python tools/skew_probe.py --sf DIR q1 ...      # custom SF dir (default sf0.1)

For each query the probe runs the plan to the noop sink in one warm
UI-enabled JVM, then for every fresh stage that READ at least MIN_STAGE
bytes fetches the task summary and reports the worst max/median read
ratio (plus the stage's task count — AQE-coalesced single-task stages
cannot exhibit skew and read as 1.0×). A flag needs BOTH ratio > CHECK
and max > MIN_TASK bytes, so trivial absolute volumes never flag.

Caveat: at local test scale AQE coalesces small shuffles, so a clean
reading here is necessary-not-sufficient for 100 TB; a FLAGGED reading,
however, is a real hot key already visible at 600k rows.
"""

from __future__ import annotations

import json
import sys
import urllib.request

REPO = __file__.rsplit("/tools/", 1)[0]
sys.path.insert(0, REPO)

SF_DEFAULT = "/root/testdata/sf0.1"
MIN_STAGE = 256 * 1024  # ignore stages reading < 256 KB total
MIN_TASK = 1024 * 1024  # a flag needs a >1 MB max task read


def completed_stages(ui_url: str, app_id: str) -> list[dict]:
    with urllib.request.urlopen(
        f"{ui_url}/api/v1/applications/{app_id}/stages?status=complete"
    ) as r:
        return json.load(r)


def task_read_quantiles(
    ui_url: str, app_id: str, stage_id: int, attempt: int
) -> tuple[float, float, float, float]:
    """(min, median, max) per-task shuffle-read bytes of one stage, plus
    the stage's max per-task peakExecutionMemory — the positive witness
    that partitions FIT (spill=0 only witnesses that none overflowed)."""
    with urllib.request.urlopen(
        f"{ui_url}/api/v1/applications/{app_id}/stages/{stage_id}/{attempt}"
        f"/taskSummary?quantiles=0.0,0.5,1.0"
    ) as r:
        summary = json.load(r)
    q = summary["shuffleReadMetrics"]["readBytes"]
    peak = summary.get("peakExecutionMemory", [0.0, 0.0, 0.0])[-1]
    return q[0], q[1], q[2], peak


def skew_ratio(median: float, mx: float) -> float:
    """max/median task read; a median of 0 with a nonzero max is reported
    as the max against a 1-byte floor (all-but-one-empty partitions IS
    maximal skew, not a divide-by-zero to hide)."""
    return mx / max(median, 1.0)


def skew_flag(median: float, mx: float, check: float) -> str | None:
    """Flag when the worst task reads CHECK× the median AND the absolute
    volume is big enough to matter (> MIN_TASK)."""
    if mx > MIN_TASK and skew_ratio(median, mx) > check:
        return f"**CHECK >{check:g}×**"
    return None


def fmt_bytes(n: float) -> str:
    for unit in ("B", "KB", "MB", "GB"):
        if n < 1024 or unit == "GB":
            return f"{n:.1f} {unit}" if unit != "B" else f"{int(n)} B"
        n /= 1024
    return f"{n:.1f} GB"


def main() -> int:
    import os

    args = list(sys.argv[1:])
    check = 8.0
    if "--check" in args:
        i = args.index("--check")
        if i + 1 >= len(args):
            print("--check needs a ratio value", file=sys.stderr)
            return 2
        try:
            check = float(args[i + 1])
        except ValueError:
            print(f"--check needs a ratio value, got {args[i + 1]!r}", file=sys.stderr)
            return 2
        del args[i : i + 2]
    sf_dir = SF_DEFAULT
    if "--sf" in args:
        i = args.index("--sf")
        if i + 1 >= len(args) or not os.path.isdir(args[i + 1]):
            got = args[i + 1] if i + 1 < len(args) else None
            print(f"--sf needs an existing directory, got {got!r}", file=sys.stderr)
            return 2
        sf_dir = args[i + 1]
        del args[i : i + 2]
    if not args:
        print("usage: skew_probe.py [--check N] [--sf DIR] query [query ...]", file=sys.stderr)
        return 2

    from utils_spark.registry import load_all

    reg = load_all()
    unknown = [n for n in args if n not in reg]
    if unknown:
        print(f"unknown query names: {unknown}", file=sys.stderr)
        return 2

    from utils_spark.session import get_spark

    spark = get_spark(app_name="skew_probe", extra_conf={"spark.ui.enabled": "true"})
    spark.sparkContext.setLogLevel("ERROR")
    ui_url = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    if not ui_url:
        print("Spark UI unavailable (existing session with ui disabled?)", file=sys.stderr)
        return 2

    spark.range(100_000).selectExpr("id % 7 AS k").groupBy("k").count().write.format(
        "noop"
    ).mode("overwrite").save()

    flagged = []
    print(
        "| query | worst stage read | tasks | median task | max task "
        "| max/median | peak task mem |"
    )
    print("|---|---|---|---|---|---|---|")
    for name in args:
        before = {
            (s["stageId"], s.get("attemptId", 0))
            for s in completed_stages(ui_url, app_id)
        }
        reg[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        fresh = [
            s
            for s in completed_stages(ui_url, app_id)
            if (s["stageId"], s.get("attemptId", 0)) not in before
            and s.get("shuffleReadBytes", 0) >= MIN_STAGE
        ]
        worst = None  # (ratio, stage_read, n_tasks, med, mx, flag)
        peak_mem = 0.0  # max per-task peakExecutionMemory over probed stages
        for s in fresh:
            _, med, mx, peak = task_read_quantiles(
                ui_url, app_id, s["stageId"], s.get("attemptId", 0)
            )
            peak_mem = max(peak_mem, peak)
            r = skew_ratio(med, mx)
            if worst is None or r > worst[0]:
                worst = (r, s["shuffleReadBytes"], s.get("numCompleteTasks", 0), med, mx,
                         skew_flag(med, mx, check))
        if worst is None:
            print(f"| {name} | (no stage ≥ {fmt_bytes(MIN_STAGE)} read) | — | — | — | — | — |")
            continue
        r, stage_read, n_tasks, med, mx, flag = worst
        mark = f" {flag}" if flag else ""
        if flag:
            flagged.append(name)
        print(
            f"| {name} | {fmt_bytes(stage_read)} | {n_tasks} | {fmt_bytes(med)} "
            f"| {fmt_bytes(mx)} | {r:.1f}×{mark} | {fmt_bytes(peak_mem)} |"
        )

    spark.stop()
    if flagged:
        print(f"\nSKEW-flagged (max task read > {check:g}× median, > {fmt_bytes(MIN_TASK)}): {flagged}")
        return 1
    print(f"\nno stage's max task read exceeds {check:g}× its median — no straggler keys at test scale")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
