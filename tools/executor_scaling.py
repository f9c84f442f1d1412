"""N-vs-4N EXECUTOR scaling benchmark — the closest sandbox analogue of
the north rule's "run at two cluster sizes (N and 4N executors)".

`tools/scaling_bench.py` compares local[8] vs local[32]: one JVM whose
single heap/GC/scheduler and thread pool are shared by all tasks — a
layout no real cluster has. This bench instead uses Spark's
local-cluster mode, which launches REAL separate executor JVMs (own
heap, own GC, own python workers) wired to one driver, with the
inter-executor shuffle going through actual block transfers:

  N  = local-cluster[1,8,<mem>]   (1 executor  x 8 cores)
  4N = local-cluster[4,8,<mem>]   (4 executors x 8 cores)

Per-executor memory is constant across legs — exactly how a real
scale-out adds memory with nodes. The two legs still share one box's
DRAM bandwidth and thermal envelope (a real 4-node cluster would not),
so the number is still a conservative lower bound on cluster scaling.

Protocol matches scaling_bench.py: identical job (same rows, same codec
plan, same n_chunks), separate JVMs per level, interleaved rounds,
median round recorded, every attempt logged by the caller.

Usage: python tools/executor_scaling.py [rows]  → writes
tools/executor_scaling_result.json and prints it.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
EXEC_CORES = int(os.environ.get("SPARK_GRAFT_EXEC_CORES", "8"))
EXEC_MEM_MB = int(os.environ.get("SPARK_GRAFT_EXEC_MEM_MB", "20480"))
LEVELS = tuple(int(x) for x in os.environ.get(
    "SPARK_GRAFT_EXECUTORS", "1,4").split(","))
N_CHUNKS = 256
ROUNDS = int(os.environ.get("SPARK_GRAFT_ROUNDS", "3"))

_CHILD = r"""
import sys, time, tempfile, json, shutil, os
sys.path.insert(0, {repo!r})
n_exec = {n_exec}
rows = {rows}
from json_to_parquet_spark.session import get_spark
from json_to_parquet_spark.sources.webpages import synth_webpages
from json_to_parquet_spark.operators.stats import collect_stats
from json_to_parquet_spark.operators.selector import build_codec_plan
from json_to_parquet_spark.operators.encode import encode_chunks
import pyspark.sql.functions as F
total_cores = n_exec * {exec_cores}
spark = get_spark(app=f"xscale{{n_exec}}",
                  master=f"local-cluster[{{n_exec}},{exec_cores},{exec_mem}]",
                  shuffle_partitions=total_cores)
pages = synth_webpages(spark, rows, seed=42, partitions=64).persist()
n = pages.count()
plan = build_codec_plan(collect_stats(pages, sample_fraction=0.02), pages.schema)
tmp_root = "/dev/shm" if os.path.isdir("/dev/shm") else None
warm = tempfile.mkdtemp(prefix=f"xwarm{{n_exec}}_", dir=tmp_root)
encode_chunks(pages.limit(1000000), "url", plan, n_chunks={n_chunks},
              store_dir=warm + "/chunks"
              ).write.mode("overwrite").parquet(warm + "/manifest")
shutil.rmtree(warm, ignore_errors=True)
best, m, walls = None, None, []
for trial in range(4):
    out = tempfile.mkdtemp(prefix=f"xscale{{n_exec}}_", dir=tmp_root)
    t0 = time.perf_counter()
    rows_df = encode_chunks(pages, "url", plan, n_chunks={n_chunks},
                            store_dir=out + "/chunks")
    rows_df.write.mode("overwrite").parquet(out + "/manifest")
    wall = time.perf_counter() - t0
    walls.append(round(wall, 2))
    if best is None or wall < best:
        best = wall
        m = spark.read.parquet(out + "/manifest").agg(
            F.sum("raw_bytes").alias("r"),
            F.sum("enc_bytes").alias("e")).collect()[0]
    shutil.rmtree(out, ignore_errors=True)
print("RESULT " + json.dumps({{
    "executors": n_exec, "exec_cores": {exec_cores}, "rows": n,
    "wall_s": round(best, 2), "trial_walls": walls,
    "raw_bytes": int(m.r), "enc_bytes": int(m.e),
    "gb_per_s": round(m.r / best / 1e9, 4)}}))
"""


def run_level(n_exec: int) -> dict:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    code = _CHILD.format(repo=repo, n_exec=n_exec, rows=ROWS,
                         n_chunks=N_CHUNKS, exec_cores=EXEC_CORES,
                         exec_mem=EXEC_MEM_MB)
    env = dict(os.environ)
    # the driver JVM does no task work in this layout; modest heap
    env.setdefault("SPARK_GRAFT_DRIVER_MEM", "8g")
    # executor heap = the worker slice offered in the master URL (the
    # URL memory is capacity only; the executor asks spark.executor.memory)
    env.setdefault("SPARK_GRAFT_EXECUTOR_MEM", f"{EXEC_MEM_MB}m")
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, env=env, timeout=3600)
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    sys.stderr.write(out.stdout[-2000:] + "\n" + out.stderr[-4000:])
    raise RuntimeError(f"no RESULT from executors={n_exec}")


def main() -> int:
    rounds = []
    for i in range(ROUNDS):
        levels = {n: run_level(n) for n in LEVELS}
        lo, hi = LEVELS
        factor = (levels[hi]["executors"] * levels[hi]["exec_cores"]) / (
            levels[lo]["executors"] * levels[lo]["exec_cores"])
        speedup = levels[lo]["wall_s"] / levels[hi]["wall_s"]
        eff = speedup / factor
        rounds.append({"round": i, "levels": levels,
                       "speedup": round(speedup, 2),
                       "scaling_efficiency": round(eff, 3)})
        print(json.dumps({"round_result": rounds[-1]}))
    ordered = sorted(rounds, key=lambda r: r["scaling_efficiency"])
    rec = dict(ordered[(len(ordered) - 1) // 2])  # lower median
    rec["protocol"] = ("median round of same-round pairs; real executor "
                       "JVMs via local-cluster mode")
    rec["all_rounds"] = [{k: v for k, v in r.items() if k != "levels"}
                         for r in rounds]
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "executor_scaling_result.json")
    with open(path, "w") as f:
        json.dump(rec, f)
    print(json.dumps(rec))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
