"""sf0.01 → sf0.1 scaling probe for named registry queries.

Run from the repo root on an IDLE box (the bench discipline):

    python tools/scaling_probe.py q1 q2 ...          # probe listed queries
    python tools/scaling_probe.py --trials 3 q1 ...  # min-of-N (default 2)
    python tools/scaling_probe.py --noop q1 ...      # noop-sink timing
                                                     # (bench.py protocol)
    python tools/scaling_probe.py --check-threshold 1.5 q1 ...
                                                     # custom CHECK ratio

One warm local[32] JVM; two timing protocols. Default: each query is
timed to full materialization (count of collected rows) at both SFs, min
over trials — comparable with the r8-r10 probe tables, but it charges
driver-side output materialization to the query. --noop times to the
noop sink instead (bench.py's protocol), isolating plan cost from output
volume. In default mode, any >3.0x CHECK flag whose output row count also
grew >3x is auto-re-timed under noop and both numbers are printed, so
output-bound ratios adjudicate themselves (r11 lesson: sessionize read
3.43x under collect but 0.99x under noop — its output grows 10x with the
data). Table rows print in the BENCH_NOTES.md format.
"""

from __future__ import annotations

import sys
import time

REPO = __file__.rsplit("/tools/", 1)[0]
sys.path.insert(0, REPO)


def main() -> None:
    args = [a for a in sys.argv[1:]]
    trials = 2
    if "--trials" in args:
        i = args.index("--trials")
        trials = int(args[i + 1])
        del args[i : i + 2]
    # CHECK-flag ratio; lower it to force the auto-adjudication path on a
    # query that sits under 3.0x (e.g. to validate the noop re-timing).
    check_threshold = 3.0
    if "--check-threshold" in args:
        i = args.index("--check-threshold")
        check_threshold = float(args[i + 1])
        del args[i : i + 2]
    # --noop: time to the noop sink (bench.py's protocol) instead of
    # .collect(). collect() charges driver-side row materialization to the
    # query, so output-proportional queries (sessionize: 9.5k -> 95k rows)
    # read ~3x for 10x data while their actual plan is flat (1.04x under
    # noop). Use --noop when adjudicating a CHECK flag; the default stays
    # collect() for comparability with the r8-r10 probe tables.
    use_noop = "--noop" in args
    if use_noop:
        args.remove("--noop")
    names = args
    if not names:
        print("usage: python tools/scaling_probe.py [--trials N] query ...")
        return

    from utils_spark.registry import load_all
    from utils_spark.session import get_spark

    spark = get_spark()
    reg = load_all()
    rows = []
    for name in names:
        qd = reg[name]
        times = {}
        for sf_dir in ("/root/testdata/sf0.01", "/root/testdata/sf0.1"):
            best = None
            for _ in range(trials):
                t0 = time.perf_counter()
                if use_noop:
                    qd.fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
                    n = -1
                else:
                    n = len(qd.fn(spark, sf_dir).collect())
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            times[sf_dir] = (best, n)
        t1, t10 = times["/root/testdata/sf0.01"][0], times["/root/testdata/sf0.1"][0]
        n1, n10 = times["/root/testdata/sf0.01"][1], times["/root/testdata/sf0.1"][1]
        rows.append((name, t1, t10, t10 / t1, n1, n10))
        print(f"| {name} | {t1:.2f} s | {t10:.2f} s | {t10 / t1:.2f}× |", flush=True)
    print()
    for name, t1, t10, r, n1, n10 in sorted(rows, key=lambda x: -x[3]):
        flag = "  <-- CHECK" if r > check_threshold else ""
        print(f"{name}: {t1:.2f} -> {t10:.2f} ({r:.2f}x){flag}")
        # Auto-adjudicate output-bound CHECK flags: if the flagged query's
        # output also grew >3x, the collect() protocol is charging driver
        # materialization to the plan — re-time under the noop sink and
        # print both so the flag carries its own adjudication.
        if r > check_threshold and not use_noop and n1 > 0 and n10 / n1 > 3.0:
            qd = reg[name]
            noop = {}
            for sf_dir in ("/root/testdata/sf0.01", "/root/testdata/sf0.1"):
                best = None
                for _ in range(trials):
                    t0 = time.perf_counter()
                    qd.fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
                    dt = time.perf_counter() - t0
                    best = dt if best is None else min(best, dt)
                noop[sf_dir] = best
            nt1, nt10 = noop["/root/testdata/sf0.01"], noop["/root/testdata/sf0.1"]
            print(
                f"  output grew {n1} -> {n10} rows ({n10 / n1:.1f}x); "
                f"noop-sink adjudication: {nt1:.2f} -> {nt10:.2f} "
                f"({nt10 / nt1:.2f}x)"
            )
    spark.stop()


if __name__ == "__main__":
    main()
