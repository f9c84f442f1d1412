"""FSST-kernel scaling microbench: the encode kernel alone at N vs 4N
pinned concurrent worker processes (no Spark, no JVM — isolates the
Python/numpy kernel from shared-host JVM jitter).

This is the component-level complement to tools/scaling_bench.py: the
full-pipeline number includes single-box shuffle/Arrow/parquet overheads
and shared-tenancy noise; this one shows the dominant compute kernel
itself scales.

Usage: python tools/kernel_scaling.py  → one JSON line.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", "268435456")
os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", "268435456")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LEVELS = tuple(int(x) for x in os.environ.get(
    "SPARK_GRAFT_LEVELS", "8,32").split(","))
BLOB_MB = 8


def _make_blob() -> bytes:
    """Deterministic multilingual web-text blob (same phrase bank as the
    synthetic table generator; no Spark needed)."""
    import numpy as np

    from json_to_parquet_spark.sources.webpages import _PHRASES
    rng = np.random.default_rng(42)
    picks = rng.integers(0, len(_PHRASES), 300_000)
    return ("".join(_PHRASES[i] for i in picks)
            .encode("utf-8")[: BLOB_MB << 20])


def _work(args):
    path, reps = args
    import pickle
    with open(path, "rb") as fh:   # page-cache-shared, not pickled per
        d = pickle.load(fh)        # task through the parent's one pipe
    blob, symbols, codes = d["blob"], d["symbols"], d["codes"]
    from json_to_parquet_spark.functions.codecs import fsst
    fsst.apply_table(blob, symbols, codes)  # warm (import, JIT caches)
    t0 = time.perf_counter()
    for _ in range(reps):
        fsst.apply_table(blob, symbols, codes)
    return (time.perf_counter() - t0) / reps


def main() -> int:
    import pickle
    import tempfile

    from json_to_parquet_spark.functions.codecs import fsst
    blob = _make_blob()
    free = fsst.free_code_bytes(blob)
    symbols, codes = fsst.build_symbol_table(blob, free)
    enc = fsst.apply_table(blob, symbols, codes)
    out = {"blob_mb": len(blob) / 1e6, "n_symbols": len(symbols),
           "ratio": round(len(blob) / len(enc), 3), "levels": {}}
    path = os.path.join(tempfile.gettempdir(),
                        f"kernel_scaling_{os.getpid()}.pkl")
    with open(path, "wb") as fh:
        pickle.dump({"blob": blob, "symbols": symbols, "codes": codes}, fh)
    reps = 4
    for nproc in LEVELS:
        os.system(f"taskset -cp 0-{nproc - 1} {os.getpid()} >/dev/null")
        ctx = mp.get_context("spawn")
        with ctx.Pool(nproc) as pool:
            pool.map(_work, [(path, 1)] * nproc)  # warm pool
            walls = pool.map(_work, [(path, reps)] * nproc)
        # per-core walls: every worker times identical work concurrently —
        # immune to the parent's single-threaded task dispatch
        out["levels"][nproc] = {
            "mb_per_s_per_core": round(len(blob) / 1e6
                                       / (sum(walls) / len(walls)), 2),
            "aggregate_mb_per_s": round(nproc * len(blob) / 1e6
                                        / (sum(walls) / len(walls)), 1)}
    os.system(f"taskset -cp 0-31 {os.getpid()} >/dev/null")
    os.unlink(path)
    lo, hi = (out["levels"][n]["mb_per_s_per_core"] for n in LEVELS)
    out["scaling_efficiency"] = round(hi / lo, 3)
    print(json.dumps(out))
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "tools", "kernel_scaling_result.json"),
              "w") as fh:
        json.dump(out, fh)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
