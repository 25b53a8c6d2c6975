#!/usr/bin/env python
"""Isolated profiling for the r11 dedup watch-list (VERDICT r11 task 2).

Four entries drifted toward the 2x-vs-first-recorded gate on driver
runs (committed r11: d_exact_substring_spans 1.75x, d_winnowing_
fingerprints 1.67x, d_snapshot_dedup 1.63x, t_dup_span_coverage 1.61x)
while the builder's same-code runs sat at ~1.1-1.2x.  This script runs
EXACTLY those entries, in isolation, >=8 reps each at sf0.1 with the
same session config + warm-up as bench.py, and prints one JSON line:
per-entry median / min / max / per-rep times and the ratio against the
FIRST-RECORDED bench value.  Verdict rule: steady state <= 1.3x of
first-recorded => environment-attributed (recorded in the README bench
drift block); above => bisect r6..r11 for a real cause.

Usage:  python scripts/profile_watchlist.py   (one Spark JVM at a time)
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

# first value each entry ever recorded in a committed BENCH_r*.json —
# the denominator of the driver's 2x gate
FIRST_RECORDED = {
    "d_winnowing_fingerprints": 1.731,  # BENCH_r05
    "t_dup_span_coverage": 0.750,       # BENCH_r05
    "d_exact_substring_spans": 2.007,   # BENCH_r06
    "d_snapshot_dedup": 1.347,          # BENCH_r06
}


def main() -> None:
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

    # same warm-up discipline as bench.py: JIT/codegen + page cache
    spark.range(0, 1_000_000, 1, int(cpus)).selectExpr("sum(id) AS s").collect()
    load_table(spark, sf_dir, "documents").count()

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
    for name, first in FIRST_RECORDED.items():
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
    print(json.dumps({"sf_dir": sf_dir, "reps": reps, "entries": out}))


if __name__ == "__main__":
    main()
