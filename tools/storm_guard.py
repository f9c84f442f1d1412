"""Storm-guarded supervisor for the 8->32 scaling benchmark.

Round-4 evidence (tools/scaling_attempts.jsonl, sessions 1-4): this
shared host's stall storms arrive on minute scales, so a clean health
probe at launch does not guarantee a clean ~12-minute session — session
4 launched into a 0.955-slowdown probe window and still recorded trial
walls of 60-124 s (vs 43.6/14.0 s floors) within two minutes. The one
scheduling lever left is SUPERVISION: watch each completed round's best
trial walls against the known interference-free floors and abort +
requeue the session the moment a storm is visible. Aborted sessions are
logged to the attempt history like everything else; the measurement
protocol itself (tools/scaling_bench.py) is byte-identical to r3's.

Storm rule — on WALLS only, never on the efficiency statistic: a
completed round whose best 8-leg wall exceeds FLOOR8_MAX (default 52 s
vs the 43.6-46.3 s clean floor across seven sessions) or best 32-leg
wall exceeds FLOOR32_MAX (default 16.5 s vs 14.0-15.9 s) is
storm-contaminated; completing that session would record host weather,
not engine scaling. Completed (wall-clean) sessions are recorded
whatever their efficiency turns out to be.

Usage: python tools/storm_guard.py [rows]
  env: SPARK_GRAFT_DEADLINE_TS (epoch; stop launching new sessions
  after this), SPARK_GRAFT_FLOOR8_MAX (52), SPARK_GRAFT_FLOOR32_MAX
  (16.5), SPARK_GRAFT_MAX_SLOWDOWN / SPARK_GRAFT_MAX_UNIT /
  SPARK_GRAFT_PROBE_INTERVAL_S (probe gate, see clean_window_launch).

Writes tools/scaling_inflight.flag while a bench session is running and
tools/scaling_success.flag when a session records raw efficiency >= 0.8.
"""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import time

TOOLS = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(TOOLS)
sys.path.insert(0, TOOLS)
from clean_window_launch import probe  # noqa: E402

ATTEMPTS = os.path.join(TOOLS, "scaling_attempts.jsonl")
RESULT = os.path.join(TOOLS, "scaling_result_8to32.json")
FLAG = os.path.join(TOOLS, "scaling_inflight.flag")
SUCCESS = os.path.join(TOOLS, "scaling_success.flag")


def _log(obj: dict) -> None:
    print(json.dumps(obj), flush=True)


def _append_attempt(obj: dict) -> None:
    with open(ATTEMPTS, "a") as fh:
        fh.write(json.dumps(obj) + "\n")


def wait_clean(max_slow: float, max_unit: float, interval: float,
               deadline: float) -> bool:
    while time.time() < deadline:
        p = probe()
        clean = p["slowdown"] <= max_slow and p["unit8"] <= max_unit
        _log({"probe": p, "clean": clean})
        if clean:
            return True
        time.sleep(interval)
    return False


ROUND_TAG = os.environ.get("SPARK_GRAFT_ROUND_TAG", "r5")


def run_session(rows: str, session_no: int, floor8: float, floor32: float,
                ) -> dict | None:
    """Launch one bench session; abort on the first stormy round.

    The storm rule is applied to EVERY round the bench prints, including
    the final one (read after proc.wait() — the live loop's 10 s poll
    almost always exits before the last round_result line lands in the
    log). Returns the bench's final report dict, or None if
    aborted/stalled/storm-contaminated.
    """
    log_path = f"/tmp/scaling_guard_s{session_no}.log"
    # BENCH.md regeneration is opt-in in scaling_bench.py (default off),
    # so guard-launched sessions can't wipe the curated history
    env = dict(os.environ)
    with open(FLAG, "w") as fh:
        fh.write(json.dumps({"session": session_no, "t": time.time()}))
    lf = open(log_path, "w")
    proc = subprocess.Popen(
        [sys.executable, os.path.join(TOOLS, "scaling_bench.py"), rows],
        stdout=lf, stderr=subprocess.STDOUT, env=env,
        start_new_session=True)
    t0 = time.time()
    seen_rounds: list[dict] = []
    pos = 0
    abort_reason = None

    def scan_new_rounds() -> str | None:
        """Parse any new round_result lines; return a storm reason or None."""
        nonlocal pos
        with open(log_path) as fh:
            fh.seek(pos)
            new = fh.read()
            pos = fh.tell()
        for line in new.splitlines():
            if not line.startswith('{"round_result"'):
                continue
            r = json.loads(line)["round_result"]
            seen_rounds.append(r)
            w8 = r["levels"]["8"]["wall_s"]
            w32 = r["levels"]["32"]["wall_s"]
            _log({"session": session_no, "round": r["round"],
                  "wall8": w8, "wall32": w32,
                  "eff": r["scaling_efficiency"]})
            if w8 > floor8 or w32 > floor32:
                return (f"round {r['round']} best walls 8={w8} 32={w32} "
                        f"exceed clean floors (max {floor8}/{floor32})")
        return None

    def record_abort(reason: str) -> None:
        _append_attempt({
            "pair": "8to32", "rows": int(rows), "aborted": True,
            "code": f"{ROUND_TAG} storm-guard session {session_no}",
            "rounds_completed": [r["scaling_efficiency"]
                                 for r in seen_rounds],
            "walls_8": [r["levels"]["8"]["wall_s"] for r in seen_rounds],
            "walls_32": [r["levels"]["32"]["wall_s"] for r in seen_rounds],
            "reason": reason})
        _log({"session": session_no, "aborted": reason})

    try:
        while proc.poll() is None:
            time.sleep(10)
            # hard cap: a clean session is ~12 min; 30 min means the
            # host (or the JVM) is wedged beyond what walls can show
            if time.time() - t0 > 1800:
                abort_reason = "session exceeded 30 min hard cap"
                break
            abort_reason = scan_new_rounds()
            if abort_reason:
                break
        if abort_reason:
            try:
                os.killpg(proc.pid, signal.SIGKILL)
            except ProcessLookupError:
                pass
            try:
                proc.wait(timeout=30)  # reap — no zombie per aborted session
            except subprocess.TimeoutExpired:
                pass
            record_abort(abort_reason)
            return None
        proc.wait()
        # final read: the last round's round_result line lands just before
        # exit, after the live loop has already stopped polling — the storm
        # rule must cover it too, else a session stormy only in its final
        # round would be recorded as wall-clean
        late_reason = scan_new_rounds()
        if late_reason:
            record_abort(late_reason + " (detected after bench exit)")
            return None
        with open(RESULT) as fh:
            report = json.load(fh)
        mins8 = [r["levels"]["8"]["wall_s"] for r in seen_rounds]
        mins32 = [r["levels"]["32"]["wall_s"] for r in seen_rounds]
        _append_attempt({
            "pair": "8to32", "rows": report["rows"],
            "code": f"{ROUND_TAG} session {session_no} (storm-guarded)",
            "raw_eff": report["scaling_efficiency"],
            "rounds": [r["scaling_efficiency"] for r in
                       report["all_rounds"]],
            "walls_8": mins8, "walls_32": mins32,
            "cal_slowdown": report["calibration_percore_slowdown_at_4N"],
            "hw_norm_eff": report["scaling_efficiency_hw_normalized"],
            "note": ("completed under storm-guard: every round's best "
                     "walls within the clean floors "
                     + (f"(8<= {max(mins8)}, 32<= {max(mins32)})"
                        if mins8 and mins32 else "(no rounds parsed)"))})
        _log({"session": session_no, "completed": True,
              "eff": report["scaling_efficiency"]})
        return report
    finally:
        lf.close()
        if os.path.exists(FLAG):
            os.remove(FLAG)


def next_session_no() -> int:
    """Derive the next storm-guard session number from the attempt log
    (not hardcoded — reruns in later rounds must not duplicate labels)."""
    import re
    last = 0
    if os.path.exists(ATTEMPTS):
        with open(ATTEMPTS) as fh:
            for line in fh:
                try:
                    code = json.loads(line).get("code", "")
                except json.JSONDecodeError:
                    continue
                m = re.search(r"session (\d+)", code)
                if m:
                    last = max(last, int(m.group(1)))
    return last + 1


def main() -> int:
    rows = sys.argv[1] if len(sys.argv) > 1 else "8000000"
    deadline = float(os.environ.get("SPARK_GRAFT_DEADLINE_TS",
                                    time.time() + 5400))
    floor8 = float(os.environ.get("SPARK_GRAFT_FLOOR8_MAX", "52"))
    floor32 = float(os.environ.get("SPARK_GRAFT_FLOOR32_MAX", "16.5"))
    max_slow = float(os.environ.get("SPARK_GRAFT_MAX_SLOWDOWN", "1.06"))
    max_unit = float(os.environ.get("SPARK_GRAFT_MAX_UNIT", "0.48"))
    interval = float(os.environ.get("SPARK_GRAFT_PROBE_INTERVAL_S", "150"))
    session_no = next_session_no()
    first_session = session_no
    while time.time() < deadline:
        if not wait_clean(max_slow, max_unit, interval, deadline):
            break
        report = run_session(rows, session_no, floor8, floor32)
        session_no += 1
        if report and report["scaling_efficiency"] >= 0.8:
            with open(SUCCESS, "w") as fh:
                fh.write(json.dumps(report))
            _log({"done": "success", "eff": report["scaling_efficiency"]})
            return 0
    _log({"done": "deadline", "sessions_tried": session_no - first_session})
    return 1


if __name__ == "__main__":
    raise SystemExit(main())
