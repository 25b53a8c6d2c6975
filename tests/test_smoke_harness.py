"""Unit tests for the scale-smoke HARNESS helpers (ADVICE r17) —
trend-line kind routing, the pair-envelope empty-frame guard, and the
recorder's sec/counts split.  No SparkSession on purpose: these run in
the default (non-opt-in) suite, where test_scale_smoke.py's own tests
are skip-gated behind SPARK_GRAFT_SCALE_TESTS=1 — importing that
module is fine (the gate is a pytest mark, not an import guard).
"""

from __future__ import annotations

import json
import os
import sys

import pytest

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))
sys.path.insert(0, os.path.join(os.path.dirname(_HERE), "scripts"))

import record_scale_smoke  # noqa: E402
import test_scale_smoke as smoke  # noqa: E402


def test_record_trend_tags_non_sec_kinds(tmp_path, monkeypatch):
    # ADVICE r17: wall-time lines stay bare (kind omitted ⇒ "sec");
    # counts/ratios carry an explicit kind so the recorder can route
    # them out of the seconds map.
    out = tmp_path / "trend.jsonl"
    monkeypatch.setenv("SPARK_GRAFT_TREND_OUT", str(out))
    smoke._record_trend("minhash_lsh_pairs", 200_000, 11.7)
    smoke._record_trend(
        "semantic_dedup_pair_rows", 200_000, 1_234_567.0, kind="count"
    )
    smoke._record_trend(
        "semantic_dedup_kcap_ratio_vs_200k", 1_000_000, 0.83, kind="ratio"
    )
    lines = [json.loads(ln) for ln in out.read_text().splitlines()]
    assert "kind" not in lines[0] and lines[0]["sec"] == 11.7
    # code review r18: a non-time value must not ride in a field
    # NAMED "sec" either — it serializes under "value"
    assert lines[1]["kind"] == "count" and lines[1]["value"] == 1_234_567.0
    assert lines[2]["kind"] == "ratio" and lines[2]["value"] == 0.83
    assert "sec" not in lines[1] and "sec" not in lines[2]


def test_record_trend_noop_without_env(tmp_path, monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_TREND_OUT", raising=False)
    smoke._record_trend("x", 1, 1.0)  # must not raise or write


def test_split_trend_lines_routes_by_kind():
    trend, counts = record_scale_smoke.split_trend_lines(
        [
            {"op": "semantic_dedup", "n_docs": 200_000, "sec": 20.3},
            {"op": "semantic_dedup", "n_docs": 1_000_000, "sec": 153.8},
            {
                "op": "semantic_dedup_pair_rows",
                "n_docs": 1_000_000,
                "value": 28_900_000.0,
                "kind": "count",
            },
            {
                "op": "semantic_dedup_kcap_ratio_vs_200k",
                "n_docs": 1_000_000,
                "value": 5.9,
                "kind": "ratio",
            },
        ]
    )
    assert trend == {
        "semantic_dedup": {"200000": 20.3, "1000000": 153.8}
    }
    assert counts == {
        "semantic_dedup_pair_rows": {"1000000": 28_900_000.0},
        "semantic_dedup_kcap_ratio_vs_200k": {"1000000": 5.9},
    }
    # the seconds map must never carry a non-"sec" line again
    assert not any("pair_rows" in k or "ratio" in k for k in trend)


def test_require_pair_rows_guards_empty_frame():
    # ADVICE r17: an empty dedup output used to surface as a bare
    # TypeError (float(None)); now it is an explicit assertion naming
    # the op, and a 0-coercion vacuous pass is impossible.
    with pytest.raises(AssertionError, match="semantic_dedup.*EMPTY"):
        smoke._require_pair_rows(None, "semantic_dedup")
    assert smoke._require_pair_rows(42, "semantic_dedup") == 42.0
