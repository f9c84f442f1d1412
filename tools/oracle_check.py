"""Local stand-in for the driver's correctness harness: runs every
queries() entry and its oracle_sql() twin on the same sf dir, compares
row count, column names, and order-insensitive values.

Usage: python tools/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys

sys.path.insert(0, "/root/repo")

import duckdb  # noqa: E402

import __spark_entry__ as entry  # noqa: E402
from json_to_parquet_spark.session import get_spark  # noqa: E402

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    try:
        import decimal
        if isinstance(v, decimal.Decimal):
            return str(v.normalize())
    except Exception:
        pass
    return repr(v)


def canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm(r[i]) for i in order) for r in rows]
    return sorted(cols), sorted(out)


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark(app="oracle_check", cores=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf}/{t}.parquet')")
    qs, oracles = entry.queries(), entry.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        sql = oracles.get(name)
        try:
            sdf = fn(spark, sf)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:
            print(f"FAIL {name}: spark error {type(e).__name__}: {e}")
            failures += 1
            continue
        if sql is None:
            print(f"rows-only {name}: {len(srows)} rows")
            continue
        try:
            res = con.sql(sql)
            dcols = res.columns
            drows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error {e}")
            failures += 1
            continue
        sc, sv = canon(scols, [tuple(r) for r in srows])
        dc, dv = canon(dcols, drows)
        if sc != dc:
            print(f"FAIL {name}: columns {sc} vs {dc}")
            failures += 1
        elif len(sv) != len(dv):
            print(f"FAIL {name}: rowcount {len(sv)} vs {len(dv)}")
            failures += 1
        elif sv != dv:
            diff = [i for i, (x, y) in enumerate(zip(sv, dv)) if x != y][:3]
            print(f"FAIL {name}: values differ, e.g.")
            for i in diff:
                print(f"   spark={sv[i]}\n   duck ={dv[i]}")
            failures += 1
        else:
            print(f"OK   {name}: {len(sv)} rows")
    print("FAILURES:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
