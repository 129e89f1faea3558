"""Deliberate-regression test of bench.py's gate logic (VERDICT r4 next-#4):
a regressed metric, a nan (parse-drift) metric, or a never-recorded gate must
flip the summary to rc=1; an in-bounds run must return rc=0."""

import importlib
import io
import sys

import pytest


@pytest.fixture()
def bench(monkeypatch):
    # bench.py configures the jax compilation cache at import — harmless on
    # CPU. Reset gate state per test.
    mod = importlib.import_module("bench")
    monkeypatch.setattr(mod, "_GATE_RESULTS", [])
    return mod


def _summary_rc(mod, expected):
    err = io.StringIO()
    old = sys.stderr
    sys.stderr = err
    try:
        rc = mod.gate_summary(expected=expected)
    finally:
        sys.stderr = old
    return rc, err.getvalue()


def test_all_gates_pass(bench):
    assert bench._gate("a", 10.0, lo=5.0)
    assert bench._gate("b", 10.0, hi=20.0)
    rc, out = _summary_rc(bench, expected=("a", "b"))
    assert rc == 0
    assert "PASS a" in out and "rc=0" in out


def test_floor_regression_fails(bench):
    bench._gate("clips", 60.0, lo=84.0)  # deliberate regression
    rc, out = _summary_rc(bench, expected=("clips",))
    assert rc == 1
    assert "FAIL clips" in out


def test_ceiling_regression_fails(bench):
    bench._gate("step_ms", 600.0, hi=450.0)
    rc, _ = _summary_rc(bench, expected=("step_ms",))
    assert rc == 1


def test_nan_parse_drift_fails(bench):
    # a cli.py print-format drift parses as nan — must FAIL, not pass
    bench._gate("metric", float("nan"), lo=1.0)
    rc, out = _summary_rc(bench, expected=("metric",))
    assert rc == 1
    assert "FAIL metric" in out


def test_none_fails(bench):
    bench._gate("metric", None, lo=1.0)
    rc, _ = _summary_rc(bench, expected=("metric",))
    assert rc == 1


def test_missing_gate_fails(bench):
    # a _safe()-swallowed section never records its gate: still rc=1
    bench._gate("present", 2.0, lo=1.0)
    rc, out = _summary_rc(bench, expected=("present", "absent"))
    assert rc == 1
    assert "absent NOT RECORDED" in out


def test_expected_gate_list_matches_declarations(bench):
    # every name in _EXPECTED_GATES must be gated somewhere in bench.py
    import pathlib

    src = pathlib.Path(bench.__file__).read_text()
    for name in bench._EXPECTED_GATES:
        assert f'_gate("{name}"' in src, name
