"""Dump formatted physical plans of the headline queries to PLANS.md —
reviewable evidence of pushdown/pruning/broadcast/codegen plan quality.

Usage: python tools/plan_snapshot.py [sf_dir]
"""

from __future__ import annotations

import contextlib
import io
import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry  # noqa: E402
from json_to_parquet_spark.session import get_spark  # noqa: E402

SHOW = [
    ("q_tpch_pricing", "partial+final aggregation, pruned scan"),
    ("q_revenue_by_nation", "broadcast join of the small dimension"),
    ("q_top_lineitems", "TakeOrderedAndProject (no global sort)"),
    ("q_minhash_candidates", "map-side partial min-aggregation"),
    ("q_encode_roundtrip", "single-exchange encode + decode + verify"),
]


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app="plan_snapshot", cores=8)
    qs = entry.queries()
    parts = ["# PLANS — physical-plan snapshots of headline queries\n",
             f"Generated from `{sf}`; see tests/test_plans.py for the "
             "assertions that gate these shapes.\n"]
    for name, why in SHOW:
        df = qs[name](spark, sf)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        if len(plan) > 6000:
            plan = plan[:6000] + "\n... (truncated)\n"
        parts.append(f"\n## {name} — {why}\n\n```\n{plan}```\n")
    with open("/root/repo/PLANS.md", "w") as fh:
        fh.write("".join(parts))
    print("wrote PLANS.md")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
