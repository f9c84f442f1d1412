"""End-to-end encode pipeline (SURVEY §3.4): the engine's flagship plan.

    source DF
      → pass 1: sampled column stats (stats.collect_stats)
      → driver codec decision (selector.choose_codecs)
      → deterministic chunk assignment pmod(xxhash64(key), n_chunks)
      → pass 2: groupBy(chunk).applyInPandas encode (codecs.*)
      → chunk store  (parquet, partitioned by chunk_id, dynamic overwrite)
      → manifest     (parquet append: per-(chunk,column) codec/bytes/
                      checksum/wall — lineage + metrics checkpoint)
      → run metrics  (json per run)

Resumability: a chunk is *complete* when the manifest holds rows for all
its columns. A restarted run recomputes only incomplete chunks; dynamic
partition overwrite replaces any half-written chunk directories from the
crashed attempt, so the final chunk store is identical to a single-shot
run (chunk payloads are deterministic — sorted by key within a chunk).

Scale notes (the 100 TB design point):
  - chunk membership is a pure row function → no global coordination;
    the only shuffle is the hash partition by chunk id, sized by
    `target_chunk_bytes` so one chunk ≈ one comfortable Arrow group.
  - completed-chunk filtering and zone-map pruning are broadcast
    anti-joins against the (tiny) manifest — never a collected id list:
    at 100 TB / 32 MB chunks there are ~3M chunk ids, and an `isin`
    literal list of that size is a driver-side plan bomb.
  - pass 1 samples a bounded NUMBER of rows (`sample_rows`, default 1M),
    not a fraction — codec choice needs distribution shape, and 25% of
    10^12 docs would be a 25 TB "sample".
"""

from __future__ import annotations

import json
import math
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators.chunking import CHUNK_COL, with_chunk_id
from ..operators.encode import decode_chunks, encode_chunks, verify_roundtrip
from ..operators.selector import (build_codec_plan, choose_codecs,
                                  choose_sort_order)
from ..operators.stats import collect_stats


def _plan_to_json(plan: dict[str, dict]) -> dict:
    out = {}
    for c, e in plan.items():
        j = {"codec": e["codec"]}
        if "symbols" in e:
            j["symbols"] = [s.hex() for s in e["symbols"]]
            j["codes"] = list(e["codes"])
        if "post" in e:
            j["post"] = e["post"]
        out[c] = j
    return out


def _plan_from_json(j: dict) -> dict[str, dict]:
    plan = {}
    for c, e in j.items():
        p = {"codec": e["codec"]}
        if "symbols" in e:
            p["symbols"] = [bytes.fromhex(s) for s in e["symbols"]]
            p["codes"] = list(e["codes"])
        if "post" in e:
            p["post"] = e["post"]
        plan[c] = p
    return plan

_TYPE_WIDTHS = {"bigint": 8, "double": 8, "int": 4, "float": 4, "boolean": 1,
                "timestamp": 8, "date": 4}


def _estimate_row_bytes(schema: T.StructType, stats: dict) -> float:
    total = 0.0
    for f in schema.fields:
        s = stats.get(f.name, {})
        if s.get("avg_len") is not None:
            total += float(s["avg_len"]) + 4
        else:
            total += _TYPE_WIDTHS.get(f.dataType.simpleString(), 8)
    return max(1.0, total)


def _manifest_path(out_dir: str) -> str:
    return os.path.join(out_dir, "manifest")


def _chunks_path(out_dir: str) -> str:
    return os.path.join(out_dir, "chunks")


def _meta_file(out_dir: str) -> str:
    return os.path.join(out_dir, "table_meta.json")


def completed_chunks(spark: SparkSession, out_dir: str,
                     n_cols: int) -> DataFrame | None:
    """Chunk ids whose manifest rows cover every column (lineage check).

    Returns a one-column (`chunk_id`) DataFrame — kept as a DataFrame so
    callers filter with a broadcast anti-join instead of collecting
    potentially millions of ids into an `isin` literal list. None when no
    manifest exists yet."""
    path = _manifest_path(out_dir)
    # existence pre-check via the Hadoop FS API (works for any scheme the
    # session can reach, not just local paths): a fresh run has no manifest,
    # and letting DataFrameReader.parquet throw PATH_NOT_FOUND makes log4j
    # print a full JVM stack trace to stderr on EVERY fresh encode — pure
    # noise in batch logs. The except stays for the crash-resume corner
    # where a killed run left a directory the reader can't infer from.
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(hpath):
        return None
    try:
        m = spark.read.parquet(path)
    except Exception:
        return None
    # rows from a SKIP_STORE_WRITE perf run carry status='skipped' — they
    # have no backing chunk files and must not mark a chunk complete
    m = m.filter(F.col("status") == "ok")
    return (m.groupBy("chunk_id")
            .agg(F.countDistinct("column").alias("ncols"))
            .filter(F.col("ncols") >= n_cols)
            .select("chunk_id"))


def run_encode(spark: SparkSession, src: DataFrame, out_dir: str,
               key: str = "url", codecs: dict[str, str] | None = None,
               n_chunks: int | None = None,
               sample_fraction: float | None = None,
               sample_rows: int = 1_000_000,
               target_chunk_bytes: int = 32 << 20, resume: bool = True,
               max_chunks_this_run: int | None = None,
               post_compress: str | None = None,
               direct_store: bool | None = None,
               store_is_shared: bool = False) -> dict:
    """Run (or resume) the encode pipeline. Returns run metrics.

    Pass-1 sampling is capped by ROWS (`sample_rows`), not fraction —
    stats need distribution shape, so the pass reads O(constant) rows at
    any table size. `sample_fraction` overrides the derived fraction when
    set explicitly.

    direct_store=True: chunk files are written by the encode workers
    themselves (see operators.encode.encode_chunks store_dir) —
    identical store layout, but encoded payloads never round-trip
    through the JVM writer. Workers write `out_dir` with plain POSIX
    I/O, so the path must be reachable from every executor: on a
    multi-node master that means a shared mount, which only the caller
    can attest (`store_is_shared=True`). Default (None) auto-enables it
    exactly when that is provable — local/local-cluster masters (one
    machine) or an explicit `store_is_shared` — and otherwise falls back
    to the Spark partitioned-write path rather than silently scattering
    chunk files across executor-local filesystems. Passing
    direct_store=True on a multi-node master without `store_is_shared`
    raises."""
    t0 = time.perf_counter()
    worker_local_fs = (spark.sparkContext.master or "").startswith("local")
    if direct_store is None:
        direct_store = worker_local_fs or store_is_shared
    elif direct_store and not (worker_local_fs or store_is_shared):
        raise ValueError(
            "direct_store=True on a non-local master: executors would "
            "write chunk files to THEIR local filesystems and the store "
            "would be silently incomplete. Pass store_is_shared=True if "
            f"{out_dir!r} is on a mount every executor can reach, or use "
            "direct_store=False for the Spark partitioned-write path.")
    os.makedirs(out_dir, exist_ok=True)
    columns = [f.name for f in src.schema.fields]

    # --- resume: an existing table_meta pins the whole codec plan AND
    # n_chunks (chunk membership is a function of n_chunks — changing it
    # mid-table would orphan completed chunks), and skips pass 1 entirely.
    existing = None
    if os.path.exists(_meta_file(out_dir)):
        if resume:
            with open(_meta_file(out_dir)) as fh:
                existing = json.load(fh)
        else:
            # fresh run over a used out_dir: stale chunk directories from
            # an older (possibly different-n_chunks) layout would survive
            # dynamic partition overwrite and leak ghost rows into reads
            import shutil
            for sub in (_chunks_path(out_dir), _manifest_path(out_dir)):
                shutil.rmtree(sub, ignore_errors=True)
            os.remove(_meta_file(out_dir))

    stats_wall = 0.0
    if existing is not None:
        codecs = existing["codecs"]
        plan = _plan_from_json(existing["codec_plan"])
        n_chunks = existing["n_chunks"]
        sort_order = existing.get("sort_order", [key])
    else:
        # --- pass 1: sampled stats → codec decision + shared encoder state
        t_stats = time.perf_counter()
        if sample_fraction is None:
            est_rows = src.count()  # column-less scan (parquet: metadata)
            sample_fraction = min(1.0, sample_rows / max(est_rows, 1))
        else:
            est_rows = None
        stats = collect_stats(src, sample_fraction=sample_fraction)
        if codecs is None:
            codecs = choose_codecs(stats, src.schema)
        plan = build_codec_plan(stats, src.schema, codecs)
        if post_compress:
            for entry in plan.values():
                entry["post"] = post_compress
        sort_order = choose_sort_order(stats, src.schema, key)
        stats_wall = time.perf_counter() - t_stats
        if est_rows is None:
            rows_sampled = next(iter(stats.values()))["rows"] if stats else 0
            est_rows = (int(rows_sampled / max(sample_fraction, 1e-9))
                        if sample_fraction < 1.0 else rows_sampled)
        if n_chunks is None:
            est_bytes = est_rows * _estimate_row_bytes(src.schema, stats)
            # floor at 4x the cluster parallelism: chunks land in shuffle
            # partitions by hash, so with n_chunks ≈ cores balls-in-bins
            # collisions serialize several chunks per core while others
            # idle; ~4 chunks/task keeps all cores busy and statistically
            # balanced (at 100 TB the bytes term dominates anyway)
            n_chunks = max(1, 4 * spark.sparkContext.defaultParallelism,
                           math.ceil(est_bytes / target_chunk_bytes))
        # persist table meta (schema + full codec-decision manifest)
        with open(_meta_file(out_dir), "w") as fh:
            json.dump({"schema": src.schema.json(), "key": key,
                       "n_chunks": n_chunks, "codecs": codecs,
                       "codec_plan": _plan_to_json(plan),
                       "sort_order": sort_order,
                       "stats": {c: {k: v for k, v in s.items()
                                     if k != "sample_blob"}
                                 for c, s in stats.items()}},
                      fh, default=str)

    # --- resume: restrict to incomplete chunks via broadcast anti-join
    # (the done set can be millions of ids — never an isin literal list)
    done = completed_chunks(spark, out_dir, len(columns)) if resume else None
    done_count = done.count() if done is not None else 0
    todo_limited = None
    chunked = with_chunk_id(src, key, n_chunks)
    if done_count:
        chunked = chunked.join(
            F.broadcast(done.withColumnRenamed("chunk_id", CHUNK_COL)),
            CHUNK_COL, "left_anti")
    if max_chunks_this_run is not None:
        todo_limited = spark.range(n_chunks) \
            .select(F.col("id").cast("int").alias("chunk_id"))
        if done_count:
            todo_limited = todo_limited.join(F.broadcast(done), "chunk_id",
                                             "left_anti")
        todo_rows = (todo_limited.orderBy("chunk_id")
                     .limit(max_chunks_this_run).collect())
        if not todo_rows:
            # terminal iteration of an incremental driver loop: every chunk
            # already complete → no-op (createDataFrame on an empty list
            # would raise CANNOT_INFER_EMPTY_SCHEMA)
            return {"run_id": None, "n_chunks": n_chunks,
                    "chunks_encoded": 0, "chunks_skipped": done_count,
                    "rows": 0, "raw_bytes": 0, "enc_bytes": 0,
                    "codecs": codecs,
                    "wall_s": time.perf_counter() - t0,
                    "stats_s": round(stats_wall, 3),
                    "encode_s": 0.0, "manifest_s": 0.0}
        todo_limited = spark.createDataFrame(todo_rows, "chunk_id int")
        chunked = chunked.join(
            F.broadcast(todo_limited.withColumnRenamed("chunk_id", CHUNK_COL)),
            CHUNK_COL, "left_semi")

    # --- pass 2: encode + persist chunk store
    # encode_chunks re-derives the (identical) chunk id itself
    t_encode = time.perf_counter()
    run_id = uuid.uuid4().hex[:12]
    if direct_store:
        # direct store write: each Arrow group persists its own chunk
        # file (atomic rename into the chunk_id=N layout) and only the
        # payload-free manifest rows flow back through Spark — the JVM
        # never re-serializes the encoded bytes (at 100 TB, ~50 TB that
        # previously crossed Arrow→JVM→parquet-writer for nothing).
        # Writing the manifest IS the action that runs the encode job.
        os.makedirs(_chunks_path(out_dir), exist_ok=True)
        rows = encode_chunks(chunked.drop(CHUNK_COL), key, plan, n_chunks,
                             sort_cols=sort_order,
                             store_dir=_chunks_path(out_dir))
        # the perf-isolation hook suppresses the worker chunk-file writes;
        # its manifest rows must say so, or a stray env var would yield a
        # store that claims 'ok' with zero data files (and resume would
        # treat the hollow chunks as complete)
        status = ("skipped" if os.environ.get("SPARK_GRAFT_SKIP_STORE_WRITE")
                  else "ok")
        manifest = rows.select(
            "chunk_id", "column", "codec", "n_rows", "raw_bytes",
            "enc_bytes", "checksum", "wall_ms", "min_val", "max_val") \
            .withColumn("run_id", F.lit(run_id)) \
            .withColumn("status", F.lit(status))
        manifest.write.mode("append").parquet(_manifest_path(out_dir))
        encode_wall = time.perf_counter() - t_encode
        t_manifest = time.perf_counter()
        manifest = spark.read.parquet(_manifest_path(out_dir)) \
            .filter(F.col("run_id") == run_id)
    else:
        chunks = encode_chunks(chunked.drop(CHUNK_COL), key, plan, n_chunks,
                               sort_cols=sort_order)
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        # dynamic partition overwrite on chunk_id: a resumed run replaces
        # only the chunk directories it re-encodes. Each chunk's rows sit
        # in one task (grouped by chunk id), so the store is one file per
        # chunk.
        (chunks.write.mode("overwrite").partitionBy("chunk_id")
               .parquet(_chunks_path(out_dir)))
        encode_wall = time.perf_counter() - t_encode

        # --- manifest append (lineage + metrics checkpoint, no payloads)
        t_manifest = time.perf_counter()
        try:
            written = spark.read.parquet(_chunks_path(out_dir))
        except Exception:
            # empty input → nothing was written; synthesize an empty store
            from ..operators.encode import CHUNK_SCHEMA
            written = spark.createDataFrame([], CHUNK_SCHEMA)
        if done_count:
            written = written.join(F.broadcast(done), "chunk_id", "left_anti")
        if todo_limited is not None:
            written = written.join(F.broadcast(todo_limited), "chunk_id",
                                   "left_semi")
        manifest = written.select(
            "chunk_id", "column", "codec", "n_rows", "raw_bytes", "enc_bytes",
            "checksum", "wall_ms", "min_val", "max_val") \
            .withColumn("run_id", F.lit(run_id)) \
            .withColumn("status", F.lit("ok"))
        manifest.write.mode("append").parquet(_manifest_path(out_dir))

    # --- write invariant for the read path: the direct (pyarrow) writer
    # emits each chunk file in ONE write_table call over ~n_columns rows,
    # so it can never produce a second row group; recording that lets
    # read_encoded skip its driver-side multi-row-group probe (a serial
    # stat pass over ~3M files at 100 TB). The JVM partitioned writer
    # flushes by parquet.block.size and CAN split a >128 MB chunk, so the
    # flag is only true while every run over this store was direct.
    # Mutating chunk files in place without updating the meta is out of
    # contract (manifest checksums already catch it).
    with open(_meta_file(out_dir)) as fh:
        meta_j = json.load(fh)
    meta_j["single_row_group"] = bool(direct_store) and \
        meta_j.get("single_row_group", True)
    with open(_meta_file(out_dir), "w") as fh:
        json.dump(meta_j, fh, default=str)

    # --- run metrics
    agg = manifest.agg(
        F.countDistinct("chunk_id").alias("chunks"),
        F.sum(F.when(F.col("column") == key, F.col("n_rows")).otherwise(0)).alias("rows"),
        F.sum("raw_bytes").alias("raw_bytes"),
        F.sum("enc_bytes").alias("enc_bytes")).collect()[0]
    metrics = {
        "run_id": run_id, "n_chunks": n_chunks,
        "chunks_encoded": agg["chunks"] or 0,
        "chunks_skipped": done_count,
        "rows": int(agg["rows"] or 0),
        "raw_bytes": int(agg["raw_bytes"] or 0),
        "enc_bytes": int(agg["enc_bytes"] or 0),
        "codecs": codecs,
        "wall_s": time.perf_counter() - t0,
        "stats_s": round(stats_wall, 3),
        "encode_s": round(encode_wall, 3),
        "manifest_s": round(time.perf_counter() - t_manifest, 3),
    }
    with open(os.path.join(out_dir, f"metrics_{run_id}.json"), "w") as fh:
        json.dump(metrics, fh)
    return metrics


def _batch_dirs(out_dir: str) -> list[str]:
    """Sub-stores of a streaming (per-micro-batch) store, oldest first."""
    root = os.path.join(out_dir, "batches")
    if os.path.exists(_meta_file(out_dir)) or not os.path.isdir(root):
        return []
    return [os.path.join(root, d) for d in sorted(os.listdir(root))
            if os.path.exists(_meta_file(os.path.join(root, d)))]


def _parse_byte_conf(s: str) -> int:
    """Spark size-conf string ('128MB', '4194304b', '1g') → bytes."""
    t = s.strip().lower()
    for suf, mult in (("pb", 1 << 50), ("tb", 1 << 40), ("gb", 1 << 30),
                      ("mb", 1 << 20), ("kb", 1 << 10), ("p", 1 << 50),
                      ("t", 1 << 40), ("g", 1 << 30), ("m", 1 << 20),
                      ("k", 1 << 10), ("b", 1)):
        if t.endswith(suf):
            return int(float(t[: -len(suf)])) * mult
    return int(t)


def _store_needs_shuffle_decode(spark: SparkSession, chunks_dir: str) -> bool:
    """True when some chunk file could have its rows SPLIT across scan
    partitions — the one shape the zero-shuffle mapInArrow decode cannot
    group in-task. Spark splits a parquet file only when its size exceeds
    maxSplitBytes >= min(maxPartitionBytes, openCostInBytes), and a split
    file straddles only if it holds >1 row group (row groups map whole to
    the slice containing their midpoint). The engine's own writers emit
    one row group per chunk file, so this scan normally finds nothing —
    it exists for foreign/rewritten stores and for JVM-written stores
    whose chunks outgrew parquet.block.size. Driver-side footer reads are
    limited to files above the split threshold, with early exit."""
    import pyarrow.parquet as pq
    thresh = min(
        _parse_byte_conf(spark.conf.get("spark.sql.files.maxPartitionBytes",
                                        "128MB")),
        _parse_byte_conf(spark.conf.get("spark.sql.files.openCostInBytes",
                                        "4MB")))
    for root, _, files in os.walk(chunks_dir):
        for f in files:
            if f.startswith((".", "_")) or not f.endswith(".parquet"):
                continue
            p = os.path.join(root, f)
            try:
                if (os.path.getsize(p) > thresh
                        and pq.ParquetFile(p).metadata.num_row_groups > 1):
                    return True
            except OSError:
                continue
    return False


def read_encoded(spark: SparkSession, out_dir: str,
                 columns: list[str] | None = None,
                 where: tuple | None = None,
                 shuffle: bool | None = None) -> DataFrame:
    """Decode the chunk store back to a DataFrame. A streaming store
    (per-batch sub-stores under out_dir/batches/) is unioned
    transparently.

    columns — decode only these columns (others' payloads never read).
    where — (col, lo, hi) range predicate: chunks whose zone map
    [min_val, max_val] PROVABLY cannot intersect [lo, hi] are pruned via
    a broadcast anti-join on the manifest BEFORE any payload is touched
    (lo/hi None = open-ended); the exact residual filter is applied after
    decode. Pruning is conservative: chunks with NULL bounds (binary
    columns, min/max failures) and chunks missing from the manifest
    (crash window between store write and manifest append) are KEPT.
    shuffle — None (default) auto-detects whether any chunk file could
    straddle scan partitions (splittable multi-row-group file) and falls
    back to the groupBy decode for the whole read instead of failing
    mid-job; False skips the detection walk (caller asserts a
    one-row-group-per-file store — the engine's own writers guarantee
    it); True forces the shuffle path."""
    batches = _batch_dirs(out_dir)
    if batches:
        out = read_encoded(spark, batches[0], columns, where, shuffle)
        for b in batches[1:]:
            out = out.unionByName(
                read_encoded(spark, b, columns, where, shuffle))
        return out
    with open(_meta_file(out_dir)) as fh:
        meta = json.load(fh)
    schema = T.StructType.fromJson(json.loads(meta["schema"]))
    if shuffle is None:
        # stores written entirely by the direct (pyarrow) writer record
        # the one-row-group-per-file invariant at encode time — trust it
        # and skip the per-file footer probe (serial stat pass over ~3M
        # files at 100 TB); otherwise detect
        shuffle = (False if meta.get("single_row_group")
                   else _store_needs_shuffle_decode(spark,
                                                    _chunks_path(out_dir)))
    chunks = spark.read.parquet(_chunks_path(out_dir))
    residual = None
    if where is not None:
        col, lo, hi = where
        dtype = dict((f.name, f.dataType) for f in schema.fields)[col]
        if isinstance(dtype, (T.LongType, T.IntegerType, T.ShortType,
                              T.ByteType)):
            bound_t = "bigint"  # NOT double: int64 > 2^53 would round
        elif isinstance(dtype, (T.DoubleType, T.FloatType)):
            bound_t = "double"
        else:
            bound_t = None  # stringified bounds compare lexically
        m = spark.read.parquet(_manifest_path(out_dir)) \
            .filter(F.col("column") == col)
        # try_cast: a malformed bound under ANSI mode must degrade to
        # NULL (→ chunk kept), never fail the whole read
        mn = F.col("min_val").try_cast(bound_t) if bound_t \
            else F.col("min_val")
        mx = F.col("max_val").try_cast(bound_t) if bound_t \
            else F.col("max_val")
        # provably-excluded predicate; NULL bounds → false → chunk kept
        excl = F.lit(False)
        if lo is not None:
            excl = excl | F.coalesce(mx < F.lit(lo), F.lit(False))
        if hi is not None:
            excl = excl | F.coalesce(mn > F.lit(hi), F.lit(False))
        pruned = m.filter(excl).select("chunk_id").distinct()
        chunks = chunks.join(F.broadcast(pruned), "chunk_id", "left_anti")
        residual = F.lit(True)
        if lo is not None:
            residual = residual & (F.col(col) >= F.lit(lo))
        if hi is not None:
            residual = residual & (F.col(col) <= F.lit(hi))
        if columns is not None and col not in columns:
            columns = list(columns) + [col]
    out = decode_chunks(chunks, schema, columns=columns, shuffle=shuffle)
    if residual is not None:
        out = out.filter(residual)
    return out


def required_columns(spark: SparkSession, out_dir: str) -> dict[str, bool]:
    """column → True when no encoded chunk holds a NULL for it.

    Quirk parity with the reference's `required` repetition for
    never-null fields (src/SchemaBuilder.java:91-99): the per-chunk null
    counts are already in every chunk row's codec meta, so this is one
    tiny aggregation over the chunk store's meta column (payloads are
    never read — parquet column pruning)."""
    chunks = spark.read.parquet(_chunks_path(out_dir))
    nulls = (chunks.select(
        "column",
        F.get_json_object("meta", "$.null_count").cast("long").alias("nc"))
        .groupBy("column").agg(F.sum("nc").alias("nulls")))
    return {r["column"]: r["nulls"] == 0 for r in nulls.collect()}


def tighten_nullability(spark: SparkSession, out_dir: str) -> T.StructType:
    """Derive required/optional per column from the encoded chunks and
    record it in table_meta.json; returns the tightened schema. Spark's
    JSON inference marks everything nullable — this pass recovers the
    reference's `required` emission for never-null fields."""
    req = required_columns(spark, out_dir)
    with open(_meta_file(out_dir)) as fh:
        meta = json.load(fh)
    schema = T.StructType.fromJson(json.loads(meta["schema"]))
    tightened = T.StructType([
        T.StructField(f.name, f.dataType,
                      nullable=not req.get(f.name, False),
                      metadata=f.metadata)
        for f in schema.fields])
    meta["required"] = sorted(c for c, r in req.items() if r)
    meta["schema_tightened"] = tightened.json()
    with open(_meta_file(out_dir), "w") as fh:
        json.dump(meta, fh, default=str)
    return tightened


def verify_encoded(spark: SparkSession, src: DataFrame, out_dir: str,
                   mode: str = "join") -> dict:
    """Round-trip gate: decode chunk store, compare to src bit-identically.
    mode="checksum" verifies via per-column aggregate checksums with no
    join/table shuffle (see operators.encode.verify_roundtrip)."""
    batches = _batch_dirs(out_dir)
    meta_dir = batches[0] if batches else out_dir
    with open(_meta_file(meta_dir)) as fh:
        meta = json.load(fh)
    decoded = read_encoded(spark, out_dir)
    row = verify_roundtrip(src, decoded, meta["key"],
                           mode=mode).collect()[0].asDict()
    row["ok"] = all(v == 0 for k, v in row.items()
                    if k.endswith("_bad") or k == "key_missing")
    return row
