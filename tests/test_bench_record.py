"""bench.py's certification lookup: the recommended-mode verdict must
distinguish report-absent / mode-ungated / unarmed-report instead of
silently claiming a certificate (ADVICE round 4 + round-5 gate arming)."""
import importlib.util
import json
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def bench():
    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(REPO, "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _report(tmp_path, **kw):
    path = os.path.join(str(tmp_path), "report.json")
    with open(path, "w") as f:
        json.dump(kw, f)
    return path


def test_report_absent(bench, tmp_path):
    assert bench.gate_certification(
        os.path.join(str(tmp_path), "missing.json"), "m") == ("UNMEASURED",
                                                              False)


def test_report_unreadable(bench, tmp_path):
    path = os.path.join(str(tmp_path), "report.json")
    with open(path, "w") as f:
        f.write("{not json")
    assert bench.gate_certification(path, "m") == ("UNMEASURED", False)


def test_mode_never_gated(bench, tmp_path):
    path = _report(tmp_path, report_armed=True,
                   modes={"other": {"verdict": "PASS"}})
    assert bench.gate_certification(path, "m") == ("UNMEASURED", True)


def test_unarmed_report_refused(bench, tmp_path):
    """An unarmed report's PASS is a blind spot, not a certificate — the
    round-4 rubber-stamp failure mode must be structurally refused."""
    path = _report(tmp_path, report_armed=False,
                   modes={"m": {"verdict": "PASS"}})
    assert bench.gate_certification(path, "m") == ("UNARMED", False)


def test_armed_verdict_surfaced(bench, tmp_path):
    path = _report(tmp_path, report_armed=True,
                   modes={"m": {"verdict": "FAIL"}})
    assert bench.gate_certification(path, "m") == ("FAIL", True)


def test_recommended_mode_is_certified_at_head(bench):
    """The shipped recommendation↔certification pair must agree: the
    committed trained_L report contains the recommended-mode spec, is
    armed, and its verdict is PASS (round-4 verdict weak #1: bench.py must
    never again ship a recommendation whose own certificate fails)."""
    path = os.path.join(REPO, "quality_gate", "trained_L", "report.json")
    verdict, certified = bench.gate_certification(
        path, bench.RECOMMENDED_MODE_SPEC)
    assert certified, "trained_L report missing or unciteable at HEAD"
    assert verdict == "PASS", (
        f"recommended mode {bench.RECOMMENDED_MODE_SPEC!r} is {verdict}; "
        "either re-certify it or demote the recommendation")
