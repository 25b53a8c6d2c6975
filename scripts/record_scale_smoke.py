#!/usr/bin/env python
"""Run the opt-in scale smoke suite (tests/test_scale_smoke.py, ~40×
the sf0.1 fixture) once and record SCALE_SMOKE.json at the repo root —
bench.py embeds that file into bench_detail.json so every driver bench
run carries the supra-sf0.1 trend line (VERDICT r6 task 6 / r7 task 4).

Run once per round, with no other Spark JVM live:

    python scripts/record_scale_smoke.py
"""
from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def split_trend_lines(lines) -> tuple[dict, dict]:
    """Route parsed trend JSONL lines into (trend_sec_by_ndocs,
    trend_counts_by_ndocs), each ``{op: {str(n_docs): value}}``.

    ADVICE r17: non-time series (candidate-pair row counts, the
    informational kcap ratio) used to land in the seconds map with the
    unit encoded in the key suffix, which quietly eroded the schema
    for any consumer assuming wall times.  Lines now carry an optional
    ``kind`` field ("sec" default); anything non-"sec" files into the
    sibling counts map.  Pure function for unit-testability."""
    trend: dict[str, dict[str, float]] = {}
    counts: dict[str, dict[str, float]] = {}
    for ent in lines:
        if ent.get("kind", "sec") == "sec":
            trend.setdefault(ent["op"], {})[str(ent["n_docs"])] = ent["sec"]
        else:
            # non-sec lines carry their value under "value" (code
            # review r18: the field name must not claim seconds)
            counts.setdefault(ent["op"], {})[str(ent["n_docs"])] = ent[
                "value"
            ]
    return trend, counts


def main() -> int:
    trend_path = os.path.join(REPO, ".scale_trend.jsonl")
    try:
        os.remove(trend_path)  # stale entries must not survive a re-run
    except OSError:
        pass
    env = dict(
        os.environ,
        SPARK_GRAFT_SCALE_TESTS="1",
        SPARK_GRAFT_TREND_OUT=trend_path,
    )
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/test_scale_smoke.py",
         "-q", "--durations=0", "--durations-min=0.01"],
        cwd=REPO, env=env, capture_output=True, text=True,
    )
    wall = round(time.time() - t0, 1)
    # per-test call durations from pytest's --durations report
    durations = {
        m.group(2): float(m.group(1))
        for m in re.finditer(
            r"^([0-9.]+)s call\s+\S+?::(\S+)", proc.stdout, re.M
        )
    }
    lines = [ln for ln in proc.stdout.strip().splitlines() if ln.strip()]
    # cross-scale trend (VERDICT r9 task 5): two wall-time points per
    # heavy dedup op, written by the trend tests — {op: {n_docs: sec}};
    # non-time series (pair counts, ratios) go to the sibling counts
    # map (ADVICE r17, see split_trend_lines)
    parsed = []
    try:
        with open(trend_path) as fh:
            parsed = [json.loads(ln) for ln in fh]
        os.remove(trend_path)
    except OSError:
        pass
    trend, trend_counts = split_trend_lines(parsed)
    record = {
        "rc": proc.returncode,
        "wall_sec": wall,
        "summary": lines[-1] if lines else "",
        "durations_sec": durations,
        "trend_sec_by_ndocs": trend,
        "trend_counts_by_ndocs": trend_counts,
        "recorded_unix": int(t0),
    }
    with open(os.path.join(REPO, "SCALE_SMOKE.json"), "w") as fh:
        json.dump(record, fh, indent=1)
    print(json.dumps(record))
    if proc.returncode != 0:
        sys.stderr.write(proc.stdout[-4000:] + proc.stderr[-2000:])
    return proc.returncode


if __name__ == "__main__":
    sys.exit(main())
