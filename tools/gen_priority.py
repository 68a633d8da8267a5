"""Regenerate (or check) `__spark_entry__._PRIORITY` from driver evidence.

The driver samples a ~50-query prefix of `queries()` each round; evidence
ages as code is refactored underneath green queries, so the prefix must
always hold the queries whose latest driver-green round is OLDEST (or
that were never sampled). This tool derives that ordering mechanically
from the committed CORRECTNESS_r*.json files.

    python tools/gen_priority.py          # print the evidence histogram +
                                          # the ordered tuple body to paste
    python tools/gen_priority.py --check  # exit 1 unless the CURRENT
                                          # 50-prefix is exactly the 50
                                          # stalest queries (set-wise)

Run --check at the START of every round, after the driver drops the new
CORRECTNESS file; regenerate and hand-tune tier-0 lead order (highest
plan-complexity first) when it fails.
"""

from __future__ import annotations

import glob
import json
import re
import sys

REPO = __file__.rsplit("/tools/", 1)[0]
sys.path.insert(0, REPO)


def evidence() -> dict[str, int | None]:
    """query -> latest round it was driver-sampled in (None = never)."""
    from utils_spark.registry import load_all

    latest: dict[str, int] = {}
    for f in sorted(glob.glob(f"{REPO}/CORRECTNESS_r*.json")):
        rnd = int(re.search(r"r0*(\d+)", f.rsplit("/", 1)[1]).group(1))
        for q in json.load(open(f)):
            latest[q] = max(rnd, latest.get(q, 0))
    return {q: latest.get(q) for q in load_all()}


def stale_order(ev: dict[str, int | None]) -> list[str]:
    """Never-sampled first (registry order), then oldest-latest-green."""
    return sorted(ev, key=lambda q: (ev[q] is not None, ev[q] or 0))


def main() -> None:
    ev = evidence()
    order = stale_order(ev)
    hist: dict[str, int] = {}
    for q in ev:
        key = "never" if ev[q] is None else f"r{ev[q]}"
        hist[key] = hist.get(key, 0) + 1
    print("evidence histogram:", dict(sorted(hist.items())), file=sys.stderr)

    if "--check" in sys.argv:
        import __spark_entry__ as E

        prefix = set(list(E.queries())[:50])
        want = set(order[:50])
        # ties at the 50-boundary: accept any prefix drawn from queries at
        # most as fresh as the 50th-stalest round
        cut = ev[order[49]]
        eligible = {q for q in ev if ev[q] is None or (cut is not None and ev[q] <= cut)}
        bad = prefix - eligible
        missing_never = {q for q in ev if ev[q] is None} - prefix
        if bad or missing_never:
            print(f"STALE-ROTATION CHECK FAILED", file=sys.stderr)
            if bad:
                print(f"  fresher-than-needed in prefix: {sorted(bad)}", file=sys.stderr)
            if missing_never:
                print(f"  never-sampled NOT in prefix: {sorted(missing_never)}", file=sys.stderr)
            sys.exit(1)
        print("rotation check OK: 50-prefix covers the stalest evidence", file=sys.stderr)
        return

    for q in order:
        tag = "never" if ev[q] is None else f"r{ev[q]}"
        print(f'    "{q}",  # {tag}')


if __name__ == "__main__":
    main()
