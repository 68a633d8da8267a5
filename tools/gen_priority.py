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


def rewrite_priority(path: str, body: str, comment: str | None = None) -> None:
    """Replace the `_PRIORITY = (...)` tuple body in `path` in place.

    The new source is built in memory and `ast.parse`d BEFORE the file is
    touched, so a body that would produce a SyntaxError leaves the
    committed file byte-identical (round-11 lesson: a hand-paste once left
    a stray tuple tail behind; round-12 ADVICE: the original --write wrote
    first and validated after, leaving the broken file on disk).

    When `comment` is given, the contiguous `#` comment block immediately
    above `_PRIORITY = (` is replaced too (round-12 VERDICT #4: the
    hand-maintained rationale went stale — the r11 narrative sat above the
    r12 tuple — so --write now emits a round-stamped rationale atomically
    with the tuple it describes).
    """
    import ast

    src = open(path).read()
    decl = src.index("_PRIORITY = (")
    start = decl + len("_PRIORITY = (")
    end = src.index("\n)", start)
    head = src[:decl]
    if comment is not None:
        # Strip the contiguous trailing comment block (if any) above the
        # declaration, then install the freshly generated one.
        lines = head.splitlines(keepends=True)
        while lines and lines[-1].lstrip().startswith("#"):
            lines.pop()
        head = "".join(lines) + comment.rstrip("\n") + "\n"
    new_src = head + "_PRIORITY = (" + "\n" + body + src[end:]
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
        # Rewrite the `_PRIORITY = (...)` tuple AND its rationale comment
        # in __spark_entry__.py in place (round-11 lesson: hand-pasting the
        # 272-line body once left a stray tuple tail behind; round-12
        # VERDICT #4: the hand-maintained comment went stale — generate it).
        rounds = sorted(
            int(re.search(r"r0*(\d+)", f.rsplit("/", 1)[1]).group(1))
            for f in glob.glob(f"{REPO}/CORRECTNESS_r*.json")
        )
        comp: dict[str, int] = {}
        for q in order[:50]:
            key = "never-sampled" if ev[q] is None else f"r{ev[q]}-latest"
            comp[key] = comp.get(key, 0) + 1
        comp_str = " + ".join(
            f"{n} {k}" for k, n in sorted(comp.items(), key=lambda kv: stale_key(
                None if kv[0] == "never-sampled" else int(kv[0][1:-7])))
        )
        comment = "\n".join([
            "# Least-verified-RECENTLY first: the driver samples a ~50-query prefix of",
            "# this dict (rows+schema+hash vs the DuckDB oracle -> CORRECTNESS_r{N}).",
            "# GENERATED by `python tools/gen_priority.py --write` from",
            f"# CORRECTNESS_r{rounds[0]:02d}..r{rounds[-1]:02d}.json — do not hand-edit.",
            "# Latest-green histogram at generation: "
            + str({k: hist[k] for k in sorted(
                hist, key=lambda k: 0.0 if k == "never" else float(k[1:]))})
            + ".",
            f"# The 50-slot sample for round {rounds[-1] + 1} is: {comp_str};",
            "# the remainder continues in oldest-evidence order (never-sampled",
            "# queries rank at tier 5.5 per the VERDICT r9 soft-unfreeze rule).",
            "# Verify with `python tools/gen_priority.py --check` (must exit 0).",
        ])
        path = f"{REPO}/__spark_entry__.py"
        rewrite_priority(path, body, comment)
        print(f"wrote {len(order)}-entry _PRIORITY to {path}", file=sys.stderr)
        return

    print(body)


if __name__ == "__main__":
    main()
