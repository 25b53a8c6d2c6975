"""Unit tests for the scale-smoke HARNESS helpers (ADVICE r17) —
trend-line kind routing, the pair-envelope empty-frame guard, and the
recorder's sec/counts split.  No SparkSession on purpose: these run in
the default (non-opt-in) suite, where test_scale_smoke.py's own tests
are skip-gated behind SPARK_GRAFT_SCALE_TESTS=1 — importing that
module is fine (the gate is a pytest mark, not an import guard).

ADVICE r18: the two modules under test are loaded HERE via importlib
from explicit file paths instead of module-scope ``sys.path``
prepends — a prepended ``scripts/`` entry would shadow any installed
package whose name collides with a file in scripts/ for every test
imported afterward, and relying on pytest's implicit prepend of
``tests/`` breaks under ``--import-mode=importlib`` or a packaged
test layout.  The one path tweak that remains (the repo root, so
``test_scale_smoke``'s ``import datafusion_randgen_spark`` resolves
when the suite is launched from elsewhere) is APPENDED, not
prepended, and only if the package isn't already importable.
"""

from __future__ import annotations

import importlib.util
import json
import os
import sys

import pytest

_HERE = os.path.dirname(os.path.abspath(__file__))
_REPO = os.path.dirname(_HERE)

if importlib.util.find_spec("datafusion_randgen_spark") is None:
    sys.path.append(_REPO)


def _load_module(name: str, path: str):
    """Load a file as a module under a test-local name — no sys.path
    mutation, no collision with pytest's own collection of the same
    file.  If some already-imported module was loaded from the same
    file (pytest's own collection of test_scale_smoke in a full-suite
    run), reuse it instead of executing the module body a second time
    (code review r19: two divergent copies of module state would let a
    harness test silently assert on the wrong one)."""
    real = os.path.realpath(path)
    for mod in list(sys.modules.values()):
        if os.path.realpath(getattr(mod, "__file__", "") or "") == real:
            # register the reused copy under our test-local name too, so
            # consumers (and the registration test) can look it up by
            # `name` regardless of which import created it first
            sys.modules[name] = mod
            return mod
    spec = importlib.util.spec_from_file_location(name, path)
    assert spec is not None and spec.loader is not None, path
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    # ADVICE r19: register the fresh copy in sys.modules so the reuse
    # check above works in BOTH collection orders.  Default alphabetical
    # collection imports test_scale_smoke before this file, so the scan
    # finds pytest's copy; but under explicit CLI ordering or
    # pytest-randomly THIS file can execute the module first — register
    # it under the test-local name AND the file stem so pytest's later
    # import_module(stem) reuses this copy instead of exec'ing a second
    # one.  (Cost when that path triggers: the reused copy skipped
    # pytest's assertion rewrite, so failing asserts in it lose rich
    # introspection — acceptable vs two divergent module states.)
    # LIMIT (code review r20): the stem key only helps pytest's default
    # prepend import mode — under --import-mode=importlib pytest binds
    # a rootdir-derived dotted name via its own loader and a second
    # copy still arises in harness-first order.  Harmless today (the
    # functions under test are stateless); full closure would need a
    # conftest hook, which isn't worth it for a diagnostics helper.
    sys.modules[name] = mod
    stem = os.path.splitext(os.path.basename(path))[0]
    if stem not in sys.modules:
        sys.modules[stem] = mod
    return mod


record_scale_smoke = _load_module(
    "_smoke_harness_recorder", os.path.join(_REPO, "scripts", "record_scale_smoke.py")
)
smoke = _load_module(
    "_smoke_harness_smoke", os.path.join(_HERE, "test_scale_smoke.py")
)


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


def test_split_trend_lines_skips_malformed(capsys):
    # ADVICE r18: a line missing the value field its kind promises, a
    # non-dict line, or one missing op/n_docs must skip-and-warn — not
    # KeyError after the ~14-minute smoke already ran.
    trend, counts = record_scale_smoke.split_trend_lines(
        [
            {"op": "minhash_lsh_pairs", "n_docs": 200_000, "sec": 14.5},
            {"op": "broken_count", "n_docs": 200_000, "kind": "count"},
            {"op": "no_sec_field", "n_docs": 200_000},
            {"n_docs": 200_000, "sec": 1.0},
            "not even a dict",
        ]
    )
    assert trend == {"minhash_lsh_pairs": {"200000": 14.5}}
    assert counts == {}
    err = capsys.readouterr().err
    assert err.count("skipping") == 4


def test_split_trend_lines_routes_legacy_count_under_sec_to_counts():
    # ADVICE r18/r19: a stale pre-r18 file carries pair counts/ratios
    # under "sec" with no "kind" — the known non-time op names must not
    # reach the seconds map, but their values (the count tripwire's
    # input) are preserved under the counts map, with a warning.
    warnings = []
    trend, counts = record_scale_smoke.split_trend_lines(
        [
            {"op": "semantic_dedup", "n_docs": 200_000, "sec": 20.3},
            {
                "op": "semantic_dedup_pair_rows",
                "n_docs": 200_000,
                "sec": 5_920_000.0,
            },
            {
                "op": "semantic_dedup_kcap_ratio_vs_200k",
                "n_docs": 1_000_000,
                "sec": 5.9,
            },
        ],
        warn=warnings.append,
    )
    assert trend == {"semantic_dedup": {"200000": 20.3}}
    assert counts == {
        "semantic_dedup_pair_rows": {"200000": 5_920_000.0},
        "semantic_dedup_kcap_ratio_vs_200k": {"1000000": 5.9},
    }
    assert len(warnings) == 2 and all("pre-r18" in w for w in warnings)


def test_parse_trend_file_skips_torn_lines(tmp_path):
    # ADVICE r18: a torn final line from a crashed writer must not kill
    # the recorder; valid lines before and after it survive.
    p = tmp_path / "trend.jsonl"
    p.write_text(
        '{"op": "a", "n_docs": 1, "sec": 2.0}\n'
        "\n"
        '{"op": "b", "n_docs": 1, "sec":\n'
        '{"op": "c", "n_docs": 1, "sec": 3.0}\n'
    )
    warnings = []
    parsed = record_scale_smoke.parse_trend_file(str(p), warn=warnings.append)
    assert [e["op"] for e in parsed] == ["a", "c"]
    assert len(warnings) == 1 and "line 3" in warnings[0]
    # missing file: empty recording, no warning, no raise — as before
    assert record_scale_smoke.parse_trend_file(str(tmp_path / "nope")) == []


def test_parse_trend_file_warns_on_midread_oserror(tmp_path, monkeypatch):
    # code review r19: an I/O error MID-file keeps the lines read so
    # far but must warn — a silent partial parse looks complete.
    import builtins

    p = tmp_path / "trend.jsonl"
    p.write_text(
        '{"op": "a", "n_docs": 1, "sec": 2.0}\n'
        '{"op": "b", "n_docs": 1, "sec": 3.0}\n'
    )
    real_open = builtins.open

    class FlakyFile:
        def __init__(self, fh):
            self._fh, self._n = fh, 0

        def __enter__(self):
            return self

        def __exit__(self, *exc):
            self._fh.close()

        def __iter__(self):
            return self

        def __next__(self):
            self._n += 1
            if self._n > 1:
                raise OSError("simulated mid-read failure")
            return next(self._fh)

    monkeypatch.setattr(
        builtins, "open", lambda *a, **kw: FlakyFile(real_open(*a, **kw))
    )
    warnings = []
    parsed = record_scale_smoke.parse_trend_file(str(p), warn=warnings.append)
    assert [e["op"] for e in parsed] == ["a"]
    assert len(warnings) == 1 and "mid-read" in warnings[0]


def test_fresh_trend_file_fixture_truncates(tmp_path, monkeypatch):
    # ADVICE r18: a direct pytest invocation with SPARK_GRAFT_TREND_OUT
    # set used to append to a stale file; the autouse fixture truncates
    # it once at module start.
    out = tmp_path / "trend.jsonl"
    out.write_text('{"op": "stale", "n_docs": 1, "sec": 9.9}\n')
    monkeypatch.setenv("SPARK_GRAFT_TREND_OUT", str(out))
    smoke._truncate_trend_file()  # the fixture's whole setup body
    assert out.read_text() == ""
    smoke._record_trend("fresh", 1, 1.0)
    lines = [json.loads(ln) for ln in out.read_text().splitlines()]
    assert [e["op"] for e in lines] == ["fresh"]


def test_truncate_trend_file_warns_on_oserror(tmp_path, monkeypatch, capsys):
    # code review r19: a failed truncation must say so — silence would
    # reproduce the stale-schema leak the fixture exists to prevent.
    monkeypatch.setenv(
        "SPARK_GRAFT_TREND_OUT", str(tmp_path / "no_such_dir" / "t.jsonl")
    )
    smoke._truncate_trend_file()  # must not raise
    assert "could not truncate" in capsys.readouterr().err


def test_require_pair_rows_guards_empty_frame():
    # ADVICE r17: an empty dedup output used to surface as a bare
    # TypeError (float(None)); now it is an explicit assertion naming
    # the op, and a 0-coercion vacuous pass is impossible.
    with pytest.raises(AssertionError, match="semantic_dedup.*EMPTY"):
        smoke._require_pair_rows(None, "semantic_dedup")
    assert smoke._require_pair_rows(42, "semantic_dedup") == 42.0


def test_load_module_registers_in_sys_modules():
    # ADVICE r19: _load_module must register its fresh copies so the
    # reuse scan works in both collection orders — if this file is
    # imported FIRST (explicit CLI ordering, pytest-randomly), pytest's
    # later import of test_scale_smoke must find this copy in
    # sys.modules instead of exec'ing a second, divergent one.
    assert sys.modules.get("_smoke_harness_recorder") is record_scale_smoke
    assert sys.modules.get("_smoke_harness_smoke") is smoke
    # file-stem keys: either pytest imported the module first (the scan
    # returned its copy, same object) or we registered ours under the
    # stem — both ways the stem maps to the SAME module object we use.
    for stem, ours in (
        ("record_scale_smoke", record_scale_smoke),
        ("test_scale_smoke", smoke),
    ):
        by_stem = sys.modules.get(stem)
        if by_stem is not None:
            assert by_stem is ours, stem


def test_parse_trend_file_warns_on_open_oserror(tmp_path, monkeypatch):
    # ADVICE r19: only a MISSING file is the silent empty-recording
    # case — a PermissionError (or EIO) at open() must warn, else an
    # empty SCALE_SMOKE.json masquerades as a complete run.
    import builtins

    p = tmp_path / "trend.jsonl"
    p.write_text('{"op": "a", "n_docs": 1, "sec": 2.0}\n')

    def denied(*a, **kw):
        raise PermissionError(13, "Permission denied", str(p))

    monkeypatch.setattr(builtins, "open", denied)
    warnings = []
    parsed = record_scale_smoke.parse_trend_file(str(p), warn=warnings.append)
    assert parsed == []
    assert len(warnings) == 1 and "could not read" in warnings[0]
