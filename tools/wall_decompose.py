"""Decompose the encode-pipeline wall at one parallelism level into
kernel vs envelope: runs the identical job three ways —

  full   = production codec plan, direct chunk-store write
  plain  = all-plain codecs (no compression kernel), same store write
  nosink = all-plain codecs, manifest-only (payloads returned, no store)

wall(full) - wall(plain)  ≈ compression-kernel time
wall(plain) - wall(nosink) ≈ chunk-store parquet write
wall(nosink)               ≈ scan + shuffle + Arrow IPC + sort + overhead

Usage: taskset -c 0-{cores-1} python tools/wall_decompose.py <cores> [rows]
Prints one JSON line per mode.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

cores = int(sys.argv[1]) if len(sys.argv) > 1 else 32
rows = int(sys.argv[2]) if len(sys.argv) > 2 else 8_000_000
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", f"{3 * cores}g")

from json_to_parquet_spark.operators.encode import encode_chunks  # noqa: E402
from json_to_parquet_spark.operators.selector import build_codec_plan  # noqa: E402
from json_to_parquet_spark.operators.stats import collect_stats  # noqa: E402
from json_to_parquet_spark.session import get_spark  # noqa: E402
from json_to_parquet_spark.sources.webpages import synth_webpages  # noqa: E402

spark = get_spark(app=f"decomp{cores}", cores=cores, shuffle_partitions=cores)
pages = synth_webpages(spark, rows, seed=42, partitions=64).persist()
n = pages.count()
plan = build_codec_plan(collect_stats(pages, sample_fraction=0.02), pages.schema)
plain = {c: "plain" for c in plan}
tmp_root = "/dev/shm" if os.path.isdir("/dev/shm") else None

MODES = [("full", plan, True), ("plain", plain, True),
         ("nosink", plain, False)]
N_CHUNKS = 256

# warm-up (full path JIT)
warm = tempfile.mkdtemp(prefix=f"dwarm{cores}_", dir=tmp_root)
encode_chunks(pages.limit(1000000), "url", plan, n_chunks=N_CHUNKS,
              store_dir=warm + "/chunks"
              ).write.mode("overwrite").parquet(warm + "/manifest")
shutil.rmtree(warm, ignore_errors=True)

for name, codecs, sink in MODES:
    walls = []
    for _ in range(3):
        out = tempfile.mkdtemp(prefix=f"dec{cores}_", dir=tmp_root)
        t0 = time.perf_counter()
        if sink:
            encode_chunks(pages, "url", codecs, n_chunks=N_CHUNKS,
                          store_dir=out + "/chunks"
                          ).write.mode("overwrite").parquet(out + "/manifest")
        else:
            # no store: payload rows come back through the JVM; count()
            # materializes without collecting payloads to the driver
            encode_chunks(pages, "url", codecs, n_chunks=N_CHUNKS).count()
        walls.append(round(time.perf_counter() - t0, 2))
        shutil.rmtree(out, ignore_errors=True)
    print("MODE " + json.dumps({"mode": name, "cores": cores, "rows": n,
                                "best": min(walls), "walls": walls}))
