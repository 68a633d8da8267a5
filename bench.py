#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Each query is executed TWICE and the MINIMUM of the two runs is reported:
per-query-shape codegen/JIT compilation costs 2-3x on the first execution
of a shape, and a single-run protocol measured exactly that on a cold or
contended machine (BENCH_r03's apparent +39% was machine state, not code —
re-runs of the identical harness landed at the best total of any round).
Min-of-2 lands the compilation outside the measurement per query, matching
how a long-lived cluster session behaves, and makes rounds comparable.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BENCH_QUERIES = [
    "grouped_quantiles",      # hash agg + exact percentiles (TPC-H Q1 shape)
    "multiway_join_revenue",  # fact-fact join + broadcast dims (Q5 shape)
    "pseudobulk_sum",         # high-cardinality groupBy
    "mad_outliers",           # two-pass grouped medians + broadcast-join flags
    "bh_adjust",              # window chains per family
    "sessionize",             # per-user ordered windows + session agg
    "tumbling_window",        # event-time windows
    "monthly_rollup",         # date_trunc rollup + count distinct
    "ks_test",                # ECDF windows over pooled distinct values
    "pairwise_ks",            # all-pairs KS (broadcast pair table)
    "asof_join",              # as-of via last-non-null ordered windows
    "ngram_jaccard_pairs",    # shingle self-join (dedup hot path)
    "minhash_lsh_pairs",      # signature + band join (dedup scale path)
    "cosine_topk",            # brute-force ANN baseline
    "mean_var_topk",          # feature-variance modeling + top-k
    "atlas_loader_pipeline",  # E1: filter→map-join→sample→normalize chain
    "qc_filter_pipeline",     # E2: metrics→MAD flags→support filter chain
]

# Iterative/ML queries timed and reported under "tracked" but NOT summed
# into the headline total, so the total stays composition-stable and
# comparable round-over-round (the headline set is fixed since round 1).
TRACKED_QUERIES = [
    "louvain_communities",    # iterative KNN→SNN→Louvain (tracks the
                              # cut_lineage flat-sweep + early-stop claims)
    "curation_pipeline",      # north-star e2e: strip→quality→dedup→pack
    "suffix_lcp_dedup",       # r10: SA+LCP maximal-span dedup (real
                              # per-core data volume — suffix explode)
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    from utils_spark.plans import release_scratch_caches
    from utils_spark.registry import load_all
    from utils_spark.session import get_spark

    registry = load_all()
    # shuffle partitions stay at the session default (= core count): AQE
    # coalescing already shrinks the few-MB bench shuffles at runtime, so
    # explicitly forcing 8 (round 2) bought nothing the optimizer wasn't
    # doing — and measurably hurt the scan-parallel queries (cosine_topk /
    # mean_var_topk / ks_test +24-32% in BENCH_r02). Side-by-side sweep in
    # BENCH_NOTES.md: 32 ≥ 8 on totals and restores those three queries.
    spark = get_spark(app_name="utils_spark_bench")
    spark.sparkContext.setLogLevel("ERROR")

    # session warm-up through the SAME noop-sink path the timed runs use:
    # a collect() warm-up (rounds 1-4) left the noop DataWritingCommand
    # classload + write-path codegen to the first timed query, which is why
    # slot 1 (grouped_quantiles) ran ~2x its mid-run time in every BENCH_rN
    (
        registry["grouped_quantiles"]
        .fn(spark, sf_dir)
        .write.mode("overwrite")
        .format("noop")
        .save()
    )

    def time_floor() -> float:
        # Per-job scheduling floor: a trivial single-stage agg through the
        # SAME noop sink the timed queries use (scheduler round-trip + warm
        # codegen + noop write; no scan). At 600k-row SFs this floor — not
        # plan quality — dominates the spark/duckdb per-query ratio (DuckDB's
        # in-process engine pays ~0 here); recording it in the artifact makes
        # the BENCH_NOTES overhead decomposition mechanical per round.
        runs = []
        for _rep in range(3):
            t0 = time.perf_counter()
            (
                spark.range(100_000)
                .selectExpr("sum(id) as s")
                .write.mode("overwrite")
                .format("noop")
                .save()
            )
            runs.append(time.perf_counter() - t0)
        print(f"# spark_floor: {min(runs):.3f}s", file=sys.stderr)
        return round(min(runs), 4)

    def time_query(name: str) -> float:
        qd = registry[name]
        runs = []
        for _rep in range(2):
            t0 = time.perf_counter()
            df = qd.fn(spark, sf_dir)
            # noop sink fully materializes EVERY output column (a bare count()
            # would let Catalyst prune unaggregated projections → fake timings)
            df.write.mode("overwrite").format("noop").save()
            runs.append(time.perf_counter() - t0)
            # Measurement-bug fix (r16, VERDICT r15 item 1a): operators that
            # persist scratch intermediates (minhash signatures, shingle
            # frames, knn hash tables) leaked them across reps — Spark's
            # CacheManager matches the second rep's identical plan to the
            # first rep's materialized cache, so min-of-2 partially measured
            # warm-cache reads instead of per-run work. Releasing between
            # reps (outside the timed region) makes both reps compute from
            # the parquet inputs. Expect the persisting queries' numbers to
            # RISE vs r15's artifact; the r15 values stand in BENCH_r15.json.
            release_scratch_caches()
        print(f"# {name}: {min(runs):.3f}s (runs: {', '.join(f'{r:.3f}' for r in runs)})", file=sys.stderr)
        return round(min(runs), 4)

    floor = time_floor()
    timings = {name: time_query(name) for name in BENCH_QUERIES}
    tracked = {name: time_query(name) for name in TRACKED_QUERIES}

    total = round(sum(timings.values()), 4)
    # Stop Spark BEFORE the DuckDB baseline (ADVICE r6): measuring DuckDB
    # with the full Spark JVM (heap + executor threads) still resident
    # biased the 2x-gate denominator in Spark's favor and contradicted the
    # idle-machine protocol. Both engines now see comparable machine state.
    spark.stop()
    duck_total, duck_timings = _duckdb_baseline(registry, sf_dir)
    print(
        json.dumps(
            {
                "metric": "utils_spark_headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "tracked": tracked,
                # same-box DuckDB min-of-2 of the SAME 17 headline oracles on
                # the SAME parquet, recorded in the artifact so the 2x-gate
                # ratio is self-contained per round (VERDICT r5 item 4)
                # min-of-3 trivial-job time: the irreducible per-query
                # scheduling/codegen floor the 2x-gate ratios sit on
                "spark_floor_sec": floor,
                "duckdb_sec": duck_total,
                "duckdb_queries": duck_timings,
                "spark_vs_duckdb": round(total / duck_total, 2) if duck_total else None,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


_DUCK_CHILD = r"""
import json, sys, time
import duckdb

spec = json.load(open(sys.argv[1]))
con = duckdb.connect()
for t in spec["tables"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{spec['sf_dir']}/{t}.parquet'")
timings = {}
for name, sql in spec["oracles"]:
    runs = []
    for _rep in range(2):
        t0 = time.perf_counter()
        con.execute(sql).fetchall()  # full materialization, like the noop sink
        runs.append(time.perf_counter() - t0)
    print(f"# duckdb {name}: {min(runs):.3f}s", file=sys.stderr)
    timings[name] = round(min(runs), 4)
print(json.dumps(timings))
"""


def _duckdb_baseline(registry, sf_dir: str) -> tuple[float, dict[str, float]]:
    """Min-of-2 DuckDB timings of the headline queries' oracle SQL on the
    same parquet files — the brief's 2x gate denominator, run in a FRESH
    python subprocess. spark.stop() (ADVICE r6) is not enough: the py4j
    JVM (~3 GB RSS) outlives it inside the bench process, and DuckDB
    measured in that process reads 1.3-2.4x slower than in a clean one
    (round 12: in-process minhash 4.6-8.6 s vs 2.6-3.0 s fresh — an
    INFLATED denominator that flattered the spark_vs_duckdb ratio on
    hosts where the residue bites). A fresh process gives DuckDB the
    same clean machine state Spark's own JVM got at launch."""
    import subprocess
    import tempfile

    from utils_spark.io import TABLES

    oracles = [(n, registry[n].oracle) for n in BENCH_QUERIES if registry[n].oracle]
    with tempfile.NamedTemporaryFile("w", suffix=".json", delete=False) as f:
        json.dump({"tables": list(TABLES), "sf_dir": sf_dir, "oracles": oracles}, f)
        spec_path = f.name
    try:
        out = subprocess.run(
            [sys.executable, "-c", _DUCK_CHILD, spec_path],
            capture_output=True,
            text=True,
        )
    finally:
        # even on KeyboardInterrupt/OSError mid-run (round-12 ADVICE: the
        # spec file used to leak when subprocess.run itself raised)
        os.unlink(spec_path)
    # surface the child's stderr whether it succeeded (per-query progress
    # lines) or died (the actual DuckDB error) — an opaque CalledProcessError
    # would leave the driver's BENCH_rN tail useless for diagnosis
    print(out.stderr, file=sys.stderr, end="")
    stdout_lines = out.stdout.strip().splitlines()
    if out.returncode != 0 or not stdout_lines:
        # empty stdout with rc=0 hits the same diagnostic path as a crash —
        # an IndexError here would mask the stderr just printed above
        raise RuntimeError(f"duckdb baseline subprocess failed (rc={out.returncode})")
    timings: dict[str, float] = json.loads(stdout_lines[-1])
    return round(sum(timings.values()), 4), timings


if __name__ == "__main__":
    main()
