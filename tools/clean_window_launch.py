"""Probe-gated launcher for the two-parallelism scaling benchmark.

The shared host's speed varies up to 2x across the day (see BENCH.md
"Measurement variance"); round-4 sessions 1-3 all ran the identical
protocol inside measurably throttled windows (calibration slowdown
1.10-1.21) and recorded 0.69-0.74 raw against the r3 clean-window 0.808.
Choosing WHEN to measure is the legitimate lever left: this tool polls a
cheap pure-python host-health probe and launches `scaling_bench.py`
(unchanged protocol, every attempt still logged) only when the host
looks like the r3 clean window did.

Clean-window criteria (from tools/scaling_attempts.jsonl history):
  * per-core slowdown at 32 vs 8 concurrent probe processes <= MAX_SLOWDOWN
    (clean sessions measured 1.01-1.05; throttled ones 1.10-1.21), and
  * the single-process probe unit time <= MAX_UNIT seconds (clean ~0.37-0.45;
    stall-storm windows 0.53+).

Usage: python tools/clean_window_launch.py [rows]
  env: SPARK_GRAFT_MAX_SLOWDOWN (default 1.06), SPARK_GRAFT_MAX_UNIT
  (default 0.48), SPARK_GRAFT_PROBE_INTERVAL_S (default 180),
  SPARK_GRAFT_MAX_WAIT_S (default 10800).

On launch it writes tools/scaling_inflight.flag (removed by the launched
wrapper when the bench exits) so other tooling can keep the box quiet,
then exits; the bench itself runs detached under setsid.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import shlex
import subprocess
import sys
import time


def _probe_work(_):
    import time as _t

    import numpy as _np
    blob = (b"the quick brown fox jumps over the lazy dog " * 50000)
    t0 = _t.perf_counter()
    syms = [b"quick", b"brown", b"jumps", b"lazy", b"dog", b"over",
            b"fox", b"the"] * 12
    for i, sym in enumerate(syms):
        blob.replace(sym, bytes([200 + (i % 8)]))
    a = _np.frombuffer(blob, _np.uint8)
    for _ in range(6):
        _np.bincount(a, minlength=256)
    return _t.perf_counter() - t0


def probe() -> dict:
    """~25 s host-health probe: per-core time at 8 and 32 concurrent
    processes (same workload as scaling_bench's calibrate(), fewer
    repeats — this is a gate, not the recorded calibration)."""
    out = {}
    for n in (8, 32):
        with mp.Pool(n) as pool:
            pool.map(_probe_work, range(n))  # warm
        with mp.Pool(n) as pool:
            r = pool.map(_probe_work, range(n * 2))
        out[n] = sum(r) / len(r)
    out["slowdown"] = round(out[32] / out[8], 4)
    out["unit8"] = round(out[8], 4)
    return out


def main() -> int:
    rows = str(int(sys.argv[1])) if len(sys.argv) > 1 else "8000000"
    max_slow = float(os.environ.get("SPARK_GRAFT_MAX_SLOWDOWN", "1.06"))
    max_unit = float(os.environ.get("SPARK_GRAFT_MAX_UNIT", "0.48"))
    interval = float(os.environ.get("SPARK_GRAFT_PROBE_INTERVAL_S", "180"))
    max_wait = float(os.environ.get("SPARK_GRAFT_MAX_WAIT_S", "10800"))
    tools = os.path.dirname(os.path.abspath(__file__))
    flag = os.path.join(tools, "scaling_inflight.flag")
    bench = os.path.join(tools, "scaling_bench.py")
    log = os.environ.get("SPARK_GRAFT_SCALING_LOG",
                         "/tmp/scaling_clean_window.log")
    t_start = time.time()
    while True:
        p = probe()
        waited = round(time.time() - t_start)
        clean = p["slowdown"] <= max_slow and p["unit8"] <= max_unit
        print(json.dumps({"t": waited, "slowdown": p["slowdown"],
                          "unit8": p["unit8"], "clean": clean}), flush=True)
        if clean:
            with open(flag, "w") as fh:
                fh.write(json.dumps({"launched_at": waited, "probe": p}))
            # wrapper shell removes the flag when the bench exits, pass
            # or fail, so a crash cannot leave the box marked busy forever
            q = shlex.quote
            cmd = (f"{q(sys.executable)} {q(bench)} {q(rows)} "
                   f"> {q(log)} 2>&1; rm -f {q(flag)}")
            subprocess.Popen(["setsid", "bash", "-c", cmd],
                             start_new_session=True)
            print(json.dumps({"launched": True, "log": log}), flush=True)
            return 0
        if time.time() - t_start > max_wait:
            print(json.dumps({"launched": False, "reason": "max_wait"}),
                  flush=True)
            return 1
        time.sleep(interval)


if __name__ == "__main__":
    raise SystemExit(main())
