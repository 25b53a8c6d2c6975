#!/usr/bin/env python
"""Isolated profiling for bench watch-list entries (VERDICT r11 task 2,
generalized to CLI in r13 per VERDICT r12 task 2).

When a driver bench run pushes entries toward the 2x-vs-first-recorded
gate while same-code builder runs sit much lower, this script
adjudicates: it runs EXACTLY the named entries, in isolation, >=8 reps
each at sf0.1 with the same session config + warm-up as bench.py, and
prints one JSON line: per-entry median / min / max / per-rep times and
the ratio against the FIRST-RECORDED bench value.  Verdict rule:
steady state <= 1.3x of first-recorded => environment-attributed
(recorded in the README bench drift block); above => bisect for a real
cause (the r12 precedent: run the first-recorded round's code on the
same host as a control — see the README drift block).

Usage:
  python scripts/profile_watchlist.py [entry=first_recorded ...]

e.g.  python scripts/profile_watchlist.py q3_topk_revenue=1.343 \
          q_window_topk_per_group=0.959
With no arguments it runs the r12-verdict tpch watch-list (the four
entries the r12 driver run measured at 1.75-1.95x of first-recorded,
all inside one slow wall-clock window).  One Spark JVM at a time.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if HERE not in sys.path:
    sys.path.insert(0, HERE)
if HERE not in os.environ.get("PYTHONPATH", "").split(os.pathsep):
    os.environ["PYTHONPATH"] = (
        HERE + os.pathsep + os.environ.get("PYTHONPATH", "")
    ).rstrip(os.pathsep)

# Default watch-list (VERDICT r12 task 2): the tpch-family entries the
# r12 driver run measured at 1.75-1.95x of first-recorded while the
# builder's four same-code r12 runs put them at ~1.03-1.14x.  First
# values: each entry's first committed BENCH_r*.json appearance — the
# denominator of the driver's 2x gate (all four from BENCH_r01).
DEFAULT_WATCHLIST = {
    "q3_topk_revenue": 1.343,          # BENCH_r01
    "q_window_topk_per_group": 0.959,  # BENCH_r01
    "q5_regional_revenue": 1.507,      # BENCH_r01
    "q1_pricing_summary": 1.030,       # BENCH_r01
}
# r11 dedup watch-list values kept for reruns of that adjudication:
#   d_winnowing_fingerprints=1.731 t_dup_span_coverage=0.750   (r05)
#   d_exact_substring_spans=2.007  d_snapshot_dedup=1.347      (r06)
# r13 minhash flag (adjudicated r14 — README drift block):
#   d_minhash_lsh_pairs=3.306                (r12 cross-run median)


def _infer_round() -> int | None:
    """Current round from the driver artifacts — the SAME rule as
    bench.py main()'s inline inference (CORRECTNESS_rN present with no
    BENCH_rN ⇒ we are round N; both present ⇒ round N+1).  Duplicated
    here ON PURPOSE rather than extracted into bench.py: bench.py is
    part of the per-vote code_hash, so refactoring it mid-round would
    invalidate every already-recorded vote for a change with zero
    timing impact (r16 learned this the expensive way — keep the two
    in sync by hand if the rule ever changes)."""
    import glob
    import re

    try:
        rounds = [
            int(m.group(1))
            for p in glob.glob(os.path.join(HERE, "CORRECTNESS_r*.json"))
            if (m := re.search(r"_r(\d+)\.json$", p))
        ]
        max_corr = max(rounds or [0])
        return max(1, max_corr + (
            1 if os.path.exists(
                os.path.join(HERE, f"BENCH_r{max_corr:02d}.json")
            ) or os.path.exists(
                os.path.join(HERE, f"BENCH_r{max_corr}.json")
            ) else 0
        ))
    except (OSError, ValueError):
        return None


def parse_watchlist(argv: list[str]) -> dict[str, float]:
    if not argv:
        return dict(DEFAULT_WATCHLIST)
    out: dict[str, float] = {}
    for arg in argv:
        name, _, first = arg.partition("=")
        if not _ or not name:
            raise SystemExit(
                f"bad argument {arg!r}: expected entry=first_recorded_sec"
            )
        try:
            out[name] = float(first)
        except ValueError:
            # ADVICE r13: a non-numeric value must fail with the same
            # clean usage message, not a float() traceback
            raise SystemExit(
                f"bad argument {arg!r}: expected entry=first_recorded_sec"
            ) from None
    return out


def main() -> None:
    watchlist = parse_watchlist(sys.argv[1:])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    reps = max(8, int(os.environ.get("SPARK_GRAFT_PROFILE_REPS", "8")))

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("watchlist_profile")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from datafusion_randgen_spark import queries as cat
    from datafusion_randgen_spark.sources import load_table

    unknown = sorted(n for n in watchlist if n not in cat.QUERIES)
    if unknown:
        raise SystemExit(f"unknown catalog entries: {unknown}")

    # same warm-up discipline as bench.py: JIT/codegen + page cache
    spark.range(0, 1_000_000, 1, int(cpus)).selectExpr("sum(id) AS s").collect()
    load_table(spark, sf_dir, "documents").count()
    load_table(spark, sf_dir, "lineitem").count()

    def _warm(path: str) -> None:
        # recursive like bench.py's _warm: a *.parquet DIRECTORY may
        # nest partition subdirectories; a non-recursive walk would
        # leave those files cold — the exact trap this script avoids
        if os.path.isdir(path):
            for sub in sorted(os.listdir(path)):
                _warm(os.path.join(path, sub))
            return
        try:
            with open(path, "rb") as fh:
                while fh.read(1 << 22):
                    pass
        except OSError:
            pass

    for fname in sorted(os.listdir(sf_dir)):
        if fname.endswith(".parquet"):
            _warm(os.path.join(sf_dir, fname))

    out: dict[str, dict] = {}
    for name, first in watchlist.items():
        fn = cat.QUERIES[name]
        runs: list[float] = []
        for _ in range(reps):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            runs.append(round(time.perf_counter() - t0, 3))
        med = round(statistics.median(runs), 3)
        out[name] = {
            "median": med,
            "min": min(runs),
            "max": max(runs),
            "runs": runs,
            "first_recorded": first,
            "ratio_vs_first": round(med / first, 3),
            "verdict": (
                "environment_attributed" if med <= 1.3 * first
                else "NEEDS_BISECT"
            ),
        }
        print(f"# {name}: median {med}s ({reps} reps, "
              f"{out[name]['ratio_vs_first']}x of first-recorded "
              f"{first}s) -> {out[name]['verdict']}", file=sys.stderr)
    result = {
        "sf_dir": sf_dir,
        "reps": reps,
        "recorded_unix": int(time.time()),
        # stamp the round (r16): PROFILE_HISTORY consumers (bench.py's
        # queries_isolated_median, future adjudications) need to know
        # WHICH round an isolated steady state belongs to; the r15
        # lines carried it only when hand-added
        "round": _infer_round(),
        "entries": out,
    }
    print(json.dumps(result))
    # persist the adjudication (r15): isolation evidence used to close
    # UNATTRIBUTED bench flags previously lived only in README prose;
    # a machine-readable append-only log lets future rounds re-audit
    # the per-rep data behind every environment_attributed verdict
    try:
        with open(os.path.join(HERE, "PROFILE_HISTORY.jsonl"), "a") as fh:
            fh.write(json.dumps(result) + "\n")
    except OSError as exc:
        print(f"# PROFILE_HISTORY.jsonl append failed: {exc!r}",
              file=sys.stderr)


if __name__ == "__main__":
    main()
