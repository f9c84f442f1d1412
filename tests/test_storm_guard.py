"""Supervisor-logic tests for tools/storm_guard.py (no Spark needed).

Covers the round-4 advisor's medium finding: the live 10 s poll loop
exits before the bench's FINAL round_result line lands in the log, so
run_session must do a post-exit read and apply the storm rule to those
late rounds too — a session stormy only in its last round must be
recorded as aborted, not "wall-clean completed".
"""

from __future__ import annotations

import json
import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

import storm_guard  # noqa: E402


def _fake_bench(tmp_path, rounds, result):
    """Write a stand-in scaling_bench.py that prints the given
    round_result lines and writes the result json, then exits."""
    bench = tmp_path / "scaling_bench.py"
    bench.write_text(
        "import json, sys\n"
        f"rounds = {rounds!r}\n"
        "for r in rounds:\n"
        "    print(json.dumps({'round_result': r}), flush=True)\n"
        f"json.dump({result!r}, open({str(tmp_path / 'result.json')!r}, 'w'))\n"
    )
    return bench


def _round(i, w8, w32):
    eff = round((w8 / w32) / 4, 3)
    return {"round": i, "scaling_efficiency": eff,
            "levels": {"8": {"wall_s": w8}, "32": {"wall_s": w32}}}


@pytest.fixture
def guard_env(tmp_path, monkeypatch):
    monkeypatch.setattr(storm_guard, "TOOLS", str(tmp_path))
    monkeypatch.setattr(storm_guard, "ATTEMPTS",
                        str(tmp_path / "attempts.jsonl"))
    monkeypatch.setattr(storm_guard, "RESULT", str(tmp_path / "result.json"))
    monkeypatch.setattr(storm_guard, "FLAG", str(tmp_path / "inflight.flag"))
    monkeypatch.setattr(storm_guard, "SUCCESS", str(tmp_path / "success.flag"))
    return tmp_path


def _attempts(tmp_path):
    p = tmp_path / "attempts.jsonl"
    if not p.exists():
        return []
    return [json.loads(x) for x in p.read_text().splitlines()]


def _popen_and_wait(monkeypatch):
    """Patch storm_guard's Popen to block until the child exits before
    returning — proc.poll() is then never None, the live 10 s loop never
    runs, and EVERY round_result line is only visible to the post-exit
    scan. This is the deterministic stand-in for the real race the
    advisor flagged (the bench's final line landing after the last poll)."""
    real_popen = storm_guard.subprocess.Popen

    def popen(*a, **kw):
        proc = real_popen(*a, **kw)
        proc.wait()
        return proc

    monkeypatch.setattr(storm_guard.subprocess, "Popen", popen)


def test_final_round_storm_detected_after_exit(guard_env, monkeypatch):
    """A session whose ONLY stormy round is the last one (printed just
    before exit, after the live loop stopped polling) must be recorded
    as aborted — this was the advisor's medium finding."""
    _popen_and_wait(monkeypatch)
    rounds = [_round(0, 45.0, 14.5), _round(1, 44.0, 14.2),
              _round(2, 80.0, 14.4)]  # storm only in the final round
    result = {"rows": 1000, "scaling_efficiency": 0.9, "all_rounds": rounds,
              "calibration_percore_slowdown_at_4N": 1.0,
              "scaling_efficiency_hw_normalized": 0.9}
    _fake_bench(guard_env, rounds, result)
    report = storm_guard.run_session("1000", 99, floor8=52.0, floor32=16.5)
    assert report is None
    (att,) = _attempts(guard_env)
    assert att["aborted"] is True
    assert "detected after bench exit" in att["reason"]
    assert att["walls_8"] == [45.0, 44.0, 80.0]  # all rounds were parsed
    assert not os.path.exists(str(guard_env / "inflight.flag"))


def test_clean_session_records_every_round(guard_env, monkeypatch):
    _popen_and_wait(monkeypatch)
    rounds = [_round(0, 45.0, 14.5), _round(1, 44.0, 14.2),
              _round(2, 46.0, 14.8)]
    result = {"rows": 1000, "scaling_efficiency": 0.78, "all_rounds": rounds,
              "calibration_percore_slowdown_at_4N": 1.05,
              "scaling_efficiency_hw_normalized": 0.82}
    _fake_bench(guard_env, rounds, result)
    report = storm_guard.run_session("1000", 99, floor8=52.0, floor32=16.5)
    assert report is not None and report["scaling_efficiency"] == 0.78
    (att,) = _attempts(guard_env)
    assert att.get("aborted") is not True
    # the completed record's floor note covers ALL rounds, incl. the final
    assert att["walls_8"] == [45.0, 44.0, 46.0]
    assert "8<= 46.0" in att["note"] and "32<= 14.8" in att["note"]


def test_next_session_no_derived_from_log(guard_env):
    assert storm_guard.next_session_no() == 1
    with open(str(guard_env / "attempts.jsonl"), "w") as fh:
        fh.write(json.dumps({"code": "r4 storm-guard session 5"}) + "\n")
        fh.write("not json\n")
        fh.write(json.dumps({"code": "r4 session 6 (storm-guarded)"}) + "\n")
        fh.write(json.dumps({"code": "no session number here"}) + "\n")
    assert storm_guard.next_session_no() == 7
