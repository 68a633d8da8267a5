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


# Never-sampled queries rank BETWEEN r5 and r6 evidence, not first:
# VERDICT r9 soft-unfreeze rule — new round-10+ queries are inserted BELOW
# the stale r3/r4/r5 block so they never displace old evidence, and are
# picked up naturally once that backlog clears (they still outrank every
# round ≥ 6). Before round 10 every registered query had been sampled at
# least once, so this tier only ever holds post-freeze additions.
NEW_QUERY_TIER = 5.5


def stale_key(ev_round: int | None) -> float:
    return NEW_QUERY_TIER if ev_round is None else float(ev_round)


def stale_order(ev: dict[str, int | None]) -> list[str]:
    """Oldest-latest-green first; never-sampled at NEW_QUERY_TIER."""
    return sorted(ev, key=lambda q: stale_key(ev[q]))


def rewrite_priority(path: str, body: str) -> None:
    """Replace the `_PRIORITY = (...)` tuple body in `path` in place.

    The new source is built in memory and `ast.parse`d BEFORE the file is
    touched, so a body that would produce a SyntaxError leaves the
    committed file byte-identical (round-11 lesson: a hand-paste once left
    a stray tuple tail behind; round-12 ADVICE: the original --write wrote
    first and validated after, leaving the broken file on disk).
    """
    import ast

    src = open(path).read()
    start = src.index("_PRIORITY = (") + len("_PRIORITY = (")
    end = src.index("\n)", start)
    new_src = src[:start] + "\n" + body + src[end:]
    ast.parse(new_src)  # refuse to leave a broken file
    open(path, "w").write(new_src)


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
        # ties at the 50-boundary: accept any prefix drawn from queries at
        # most as stale-ranked as the 50th-stalest (never-sampled queries
        # rank at NEW_QUERY_TIER per the VERDICT r9 soft-unfreeze rule)
        cut = stale_key(ev[order[49]])
        eligible = {q for q in ev if stale_key(ev[q]) <= cut}
        bad = prefix - eligible
        if bad:
            print(f"STALE-ROTATION CHECK FAILED", file=sys.stderr)
            print(f"  fresher-than-needed in prefix: {sorted(bad)}", file=sys.stderr)
            sys.exit(1)
        print("rotation check OK: 50-prefix covers the stalest evidence", file=sys.stderr)
        return

    body = "\n".join(
        f'    "{q}",  # {"new" if ev[q] is None else f"r{ev[q]}"}' for q in order
    )

    if "--write" in sys.argv:
        # Rewrite the `_PRIORITY = (...)` tuple in __spark_entry__.py in
        # place (round-11 lesson: hand-pasting the 272-line body once left
        # a stray tuple tail behind — a SyntaxError the checker then hit).
        # Only the tuple body changes; the explanatory comment block above
        # it is the round author's to update.
        path = f"{REPO}/__spark_entry__.py"
        rewrite_priority(path, body)
        print(f"wrote {len(order)}-entry _PRIORITY to {path}", file=sys.stderr)
        return

    print(body)


if __name__ == "__main__":
    main()
