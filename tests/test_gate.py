"""tools/gate.py exit-code contract (r6 VERDICT ask 7): the snapshot
gate composes pytest + the full oracle, fail-fast, 0 only when all
green. The steps themselves are exercised elsewhere (the whole tests/
tree; tools/check_correctness.py via test_catalog_oracle.py) — here the
subprocess boundary is stubbed so the contract is testable in-process."""

from __future__ import annotations

import importlib.util
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_gate():
    spec = importlib.util.spec_from_file_location(
        "gate", os.path.join(ROOT, "tools", "gate.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_usage_error_exits_2():
    assert _load_gate().main(["--bogus"]) == 2


def test_green_runs_both_steps(monkeypatch):
    g = _load_gate()
    calls = []
    monkeypatch.setattr(
        g.subprocess, "call", lambda cmd, cwd: (calls.append(cmd), 0)[1]
    )
    assert g.main([]) == 0
    assert len(calls) == 2
    assert "pytest" in " ".join(calls[0])
    assert "check_correctness" in " ".join(calls[1])


def test_red_step_fails_fast(monkeypatch):
    g = _load_gate()
    calls = []
    monkeypatch.setattr(
        g.subprocess, "call", lambda cmd, cwd: (calls.append(cmd), 1)[1]
    )
    assert g.main([]) == 1
    assert len(calls) == 1, "oracle must not run after a red pytest"


def test_quick_skips_pytest(monkeypatch):
    g = _load_gate()
    calls = []
    monkeypatch.setattr(
        g.subprocess, "call", lambda cmd, cwd: (calls.append(cmd), 0)[1]
    )
    assert g.main(["--quick"]) == 0
    assert len(calls) == 1
    assert "check_correctness" in " ".join(calls[0])


def test_gate_uses_current_interpreter():
    g = _load_gate()
    # the gate must run the same venv's python (sys.executable), not a
    # PATH lookup that could resolve a different environment
    assert g.sys.executable == sys.executable
