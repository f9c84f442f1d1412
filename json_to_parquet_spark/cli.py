"""spark-submit entry point.

Package for a cluster:
    cd /root/repo && zip -r engine.zip json_to_parquet_spark
    spark-submit --py-files engine.zip -m json_to_parquet_spark.cli ...

Subcommands (capability parity with the reference CLI, Manager.main at
reference src/Manager.java:8-34, plus the new engine surface):

    json2parquet IN OUT     reference pipeline: JSON docs → inferred-schema
                            Parquet (dictionary on, uncompressed yardstick)
    gen OUT --rows N        deterministic synthetic web-pages table
    encode SRC OUT          two-pass encode pipeline (resumable)
    decode ENC OUT          chunk store → Parquet of the original table
    verify SRC ENC          round-trip bit-identity gate (exit 1 on fail)
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="json_to_parquet_spark")
    p.add_argument("--cores", type=int, default=None)
    sub = p.add_subparsers(dest="cmd", required=True)

    j2p = sub.add_parser("json2parquet")
    j2p.add_argument("input")
    j2p.add_argument("output")
    j2p.add_argument("--multiline", action="store_true")
    j2p.add_argument("--quirk-parity", action="store_true")
    j2p.add_argument("--concat", action="store_true",
                     help="accept back-to-back {...}{...} documents "
                          "(the reference splitter's input shape)")

    gen = sub.add_parser("gen")
    gen.add_argument("output")
    gen.add_argument("--rows", type=int, default=100_000)
    gen.add_argument("--seed", type=int, default=42)

    enc = sub.add_parser("encode")
    enc.add_argument("source")
    enc.add_argument("output")
    enc.add_argument("--key", default="url")
    enc.add_argument("--n-chunks", type=int, default=None)
    enc.add_argument("--max-chunks", type=int, default=None)
    enc.add_argument("--no-resume", action="store_true")

    dec = sub.add_parser("decode")
    dec.add_argument("encoded")
    dec.add_argument("output")

    ver = sub.add_parser("verify")
    ver.add_argument("source")
    ver.add_argument("encoded")

    args = p.parse_args(argv)

    from .session import get_spark
    spark = get_spark(app=f"j2ps-{args.cmd}", cores=args.cores)

    if args.cmd == "json2parquet":
        from .sources.ingest import json_to_parquet
        df = json_to_parquet(spark, args.input, args.output,
                             multi_line=args.multiline,
                             quirk_parity=args.quirk_parity,
                             concat=args.concat)
        print(json.dumps({"rows": df.count(),
                          "schema": df.schema.simpleString()}))
        return 0
    if args.cmd == "gen":
        from .sources.webpages import synth_webpages
        synth_webpages(spark, args.rows, seed=args.seed) \
            .write.mode("overwrite").parquet(args.output)
        print(json.dumps({"rows": args.rows, "path": args.output}))
        return 0
    if args.cmd == "encode":
        from .plans.pipeline import run_encode
        from .sources.webpages import load_table
        src = load_table(spark, args.source)
        m = run_encode(spark, src, args.output, key=args.key,
                       n_chunks=args.n_chunks,
                       max_chunks_this_run=args.max_chunks,
                       resume=not args.no_resume)
        print(json.dumps(m))
        return 0
    if args.cmd == "decode":
        from .plans.pipeline import read_encoded
        from .sources.webpages import write_table
        fmt = write_table(read_encoded(spark, args.encoded), args.output)
        print(json.dumps({"path": args.output, "format": fmt}))
        return 0
    if args.cmd == "verify":
        from .plans.pipeline import verify_encoded
        from .sources.webpages import load_table
        res = verify_encoded(spark, load_table(spark, args.source),
                             args.encoded)
        print(json.dumps(res))
        return 0 if res["ok"] else 1
    return 2


if __name__ == "__main__":
    sys.exit(main())
