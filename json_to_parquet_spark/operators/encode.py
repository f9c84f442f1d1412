"""Pass-2 chunk encoder (SURVEY §2C): DataFrame → encoded column chunks.

One chunk = all rows with the same deterministic chunk id
(`pmod(xxhash64(key), n_chunks)` — see operators/chunking.py). Chunks are
encoded with `groupBy(chunk_id).applyInArrow`: each group arrives as one
pyarrow Table (NO pandas bridge — the pandas path materializes a Python
bytes object per value for string/binary columns, which dominated encode
wall time), is sorted by key (so chunk payloads are bit-identical across
runs and cluster sizes), and every column is encoded by the vectorized
kernels in functions/codecs — zero per-row Python.

Output: one row per (chunk_id, column) with the payload blob, codec
actually used, JSON meta, sizes, sha256 checksum, and wall time — the
same rows double as the lineage/metrics manifest entries.

Capability ancestor: the implicit dictionary/RLE/bit-pack encoding
parquet-mr applies for the reference at src/Writer.java:25-26; here the
encoding layer is explicit and native to the engine.
"""

from __future__ import annotations

import hashlib
import os
import time

import pyarrow as pa
import pyarrow.compute as pc

# One executor slot = one python worker = ONE core's budget. pyarrow's
# internal pool defaults to os.cpu_count() threads PER WORKER (used by
# take/sort_indices/parquet writes), so 32 concurrent workers spawn up
# to 32x32 runnable threads and the sort/store phases thrash the
# scheduler — measured as the encode stage scaling 0.70 while the
# GIL-bound kernel alone scales 0.84. Executors import this module in
# every worker process; the driver pays nothing (its arrow work is
# row-count-sized).
try:
    pa.set_cpu_count(int(os.environ.get("SPARK_GRAFT_WORKER_ARROW_THREADS",
                                        "1")))
    pa.set_io_thread_count(
        int(os.environ.get("SPARK_GRAFT_WORKER_ARROW_IO_THREADS", "1")))
except Exception:  # pragma: no cover - pool already started
    pass
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.codecs.column import (decode_column, encode_column,
                                       meta_from_json, meta_to_json)
from .chunking import CHUNK_COL, perfect_shuffle_salts, with_chunk_id

# shuffle/group relabeling column (see encode_chunks straggler notes)
SALT_COL = "__chunk_salt"

CHUNK_SCHEMA = T.StructType([
    T.StructField("chunk_id", T.IntegerType(), False),
    T.StructField("column", T.StringType(), False),
    T.StructField("codec", T.StringType(), False),
    T.StructField("n_rows", T.LongType(), False),
    T.StructField("raw_bytes", T.LongType(), False),
    T.StructField("enc_bytes", T.LongType(), False),
    T.StructField("payload", T.BinaryType(), False),
    T.StructField("meta", T.StringType(), False),
    T.StructField("checksum", T.StringType(), False),
    T.StructField("wall_ms", T.DoubleType(), False),
    T.StructField("min_val", T.StringType(), True),
    T.StructField("max_val", T.StringType(), True),
])

_SPARK_TO_ARROW = {
    T.ByteType: pa.int8(),
    T.ShortType: pa.int16(),
    T.IntegerType: pa.int32(),
    T.LongType: pa.int64(),
    T.FloatType: pa.float32(),
    T.DoubleType: pa.float64(),
    T.BooleanType: pa.bool_(),
    T.StringType: pa.string(),
    T.BinaryType: pa.binary(),
    T.DateType: pa.date32(),
}


def arrow_schema_for(schema: T.StructType, tz: str | None = None) -> pa.Schema:
    """Arrow schema for a Spark schema. `tz` set = the Arrow-interchange
    shape Spark expects from applyInArrow output (session-tz timestamps);
    tz None = the naive shape the codec layer stores."""
    fields = []
    for f in schema.fields:
        if isinstance(f.dataType, T.TimestampType):
            at = pa.timestamp("us", tz=tz) if tz else pa.timestamp("us")
        elif isinstance(f.dataType, T.TimestampNTZType):
            at = pa.timestamp("us")  # NTZ interchanges tz-naive
        else:
            at = _SPARK_TO_ARROW.get(type(f.dataType))
            if at is None:
                raise ValueError(f"unsupported column type {f.dataType}")
        fields.append(pa.field(f.name, at, nullable=f.nullable))
    return pa.schema(fields)


CHUNK_ARROW = [
    ("chunk_id", pa.int32()), ("column", pa.string()), ("codec", pa.string()),
    ("n_rows", pa.int64()), ("raw_bytes", pa.int64()),
    ("enc_bytes", pa.int64()), ("payload", pa.binary()),
    ("meta", pa.string()), ("checksum", pa.string()),
    ("wall_ms", pa.float64()),
    ("min_val", pa.string()), ("max_val", pa.string()),
]

# manifest-only shape returned when the group fn writes the store itself
MANIFEST_SCHEMA = T.StructType(
    [f for f in CHUNK_SCHEMA.fields if f.name != "payload"])

_STORE_FILE = "part-00000.parquet"


def _write_chunk_file(store_dir: str, chunk_id: int, table: pa.Table) -> None:
    """Persist one chunk's payload rows as
    `store_dir/chunk_id=<id>/part-00000.parquet` — the exact layout
    Spark's partitioned writer produces, so every reader (read_encoded,
    manifest scans, resume) is unchanged.

    Idempotent and crash-safe: the file is written to a dot-prefixed
    temp name at the store root (Spark's file index ignores `.`/`_`
    prefixes, so a crash can never leak half-written rows into reads)
    and atomically renamed into place; a re-encode or speculative twin
    replaces it with identical deterministic bytes. Leftover files from
    an older Spark-written layout (different part names) are removed so
    a resumed store never double-counts a chunk."""
    import os
    import uuid

    import pyarrow.parquet as pq

    d = os.path.join(store_dir, f"chunk_id={chunk_id}")
    os.makedirs(d, exist_ok=True)
    tmp = os.path.join(store_dir, f".tmp-{uuid.uuid4().hex}.parquet")
    # payloads are already codec-compressed — snappy on top would burn
    # CPU in exactly the stage the scaling criterion measures. Likewise
    # pyarrow's DEFAULTS are hostile here: use_dictionary hashes every
    # multi-MB payload value into a dict that can never win, and
    # write_statistics computes min/max comparisons over those same
    # blobs — at 32 concurrent workers that burned 2-3x the encode
    # kernel's own core-seconds. PLAIN, stats off.
    pq.write_table(table, tmp, compression="none", use_dictionary=False,
                   write_statistics=False)
    os.replace(tmp, os.path.join(d, _STORE_FILE))
    for f in os.listdir(d):
        if f != _STORE_FILE:
            try:
                os.unlink(os.path.join(d, f))
            except OSError:
                pass


def _encode_group_fn(key_col: str, columns: list[str], codecs: dict,
                     arrow_schema: pa.Schema, sort_cols: list[str],
                     store_dir: str | None = None,
                     presorted: bool = False,
                     skip_store_write: bool = False):
    out_fields = CHUNK_ARROW
    sort_keys = [(c, "ascending") for c in sort_cols]

    def fn(table: pa.Table) -> pa.Table:
        chunk_id = int(table.column(CHUNK_COL)[0].as_py())
        # deterministic chunk-local row permutation: low-cardinality
        # columns first (→ long runs for RLE/dict), then
        # timestamps/ints (→ narrow deltas), unique key last as the
        # total-order tiebreak (cf. column-permutation-for-RLE,
        # SIGMOD 2020). When `presorted`, the permutation was already
        # applied by the JVM's Tungsten sort inside the shuffle-read
        # stage (sortWithinPartitions with asc_nulls_last — the same
        # order pyarrow's at_end produces), so the worker skips the
        # sort AND the 2x-chunk-size take() gather.
        if not presorted:
            order = pc.sort_indices(table, sort_keys=sort_keys)
            table = table.take(order)
        cols: dict[str, list] = {name: [] for name, _ in out_fields}
        for c in columns:
            t0 = time.perf_counter()
            arr = table.column(c).combine_chunks()
            if arr.type != arrow_schema.field(c).type:
                arr = arr.cast(arrow_schema.field(c).type)
            raw = sum(b.size for b in arr.buffers() if b is not None)
            payload, meta = encode_column(arr, codecs.get(c, "plain"))
            vmin = vmax = None
            if len(arr) > arr.null_count and not pa.types.is_binary(arr.type):
                try:  # zone map: per-chunk min/max for chunk pruning
                    mm = pc.min_max(arr)
                    vmin, vmax = str(mm["min"].as_py()), str(mm["max"].as_py())
                except Exception:
                    pass
            cols["chunk_id"].append(chunk_id)
            cols["column"].append(c)
            cols["codec"].append(meta["codec"])
            cols["n_rows"].append(len(arr))
            cols["raw_bytes"].append(int(raw))
            cols["enc_bytes"].append(len(payload))
            cols["payload"].append(payload)
            cols["meta"].append(meta_to_json(meta))
            cols["checksum"].append(hashlib.sha256(payload).hexdigest())
            cols["wall_ms"].append((time.perf_counter() - t0) * 1000.0)
            cols["min_val"].append(vmin)
            cols["max_val"].append(vmax)
        if store_dir is None:
            return pa.table(
                {name: pa.array(cols[name], type=t) for name, t in out_fields})
        # direct store write: persist the payload rows HERE (Arrow →
        # parquet, no JVM round-trip) and return manifest rows only —
        # the partition column chunk_id lives in the directory name
        if not skip_store_write:  # perf-isolation hook (flag captured
            # DRIVER-side at plan time so manifest status can't disagree
            # with what the workers actually did)
            file_tbl = pa.table(
                {name: pa.array(cols[name], type=t)
                 for name, t in out_fields if name != "chunk_id"})
            _write_chunk_file(store_dir, chunk_id, file_tbl)
        return pa.table(
            {name: pa.array(cols[name], type=t) for name, t in out_fields
             if name != "payload"})
    return fn


def encode_chunks(df: DataFrame, key: str, codecs: dict,
                  n_chunks: int, sort_cols: list[str] | None = None,
                  store_dir: str | None = None) -> DataFrame:
    """Encode `df` into per-(chunk, column) payload rows.

    `codecs` maps column → codec name or codec-plan dict (shared state).
    `sort_cols` is the chunk-local row permutation (key appended as the
    unique tiebreak; default = key only).

    With `store_dir` set, each group WRITES its own chunk parquet file
    (same `chunk_id=N/` layout as Spark's partitioned writer, atomic
    rename, idempotent) and the returned DataFrame carries only the
    payload-free manifest rows (MANIFEST_SCHEMA). This keeps the encoded
    bytes out of the JVM entirely — the default path sends every payload
    Arrow→JVM and through the JVM parquet writer, which at 32 cores was
    the dominant non-kernel cost of the N→4N scaling criterion (and at
    100 TB means the JVM re-serializes ~50 TB it never needs to see).

    The explicit repartition pins the shuffle width to ~one chunk per
    task instead of `spark.sql.shuffle.partitions` (= cores): with the
    default width, 256 chunks hash into 32 partitions as 5-13-chunk
    lumps, and the straggler tail costs ~45% of wall at 32 cores (the
    4N side of the scaling criterion suffers more than the N side —
    relative imbalance shrinks with chunks-per-task). The groupBy reuses
    this exchange (ClusteredDistribution on the grouping column is
    already satisfied), so the plan still has exactly ONE shuffle.

    Straggler control: hashing k distinct chunk ids into k partitions is
    balls-in-bins — ~37% of tasks get nothing while others serialize 2-3
    chunks, and that tail quantum hurts the wide (4N) leg of the scaling
    criterion far more than the narrow one (a 2-chunk straggler is a
    whole extra chunk-encode on the last of 8 waves at 32 cores, but
    noise across 32 waves at 8). So for ≤8192 chunks the shuffle/group
    column is `perfect_shuffle_salts(n)[chunk_id]` — a bijective
    relabeling whose Murmur3 perfect-hashes into exactly one chunk per
    partition, zero empties (the group fn reads the REAL chunk id from
    the chunk column, so ids stay 0..n-1 everywhere downstream). Beyond
    8192 chunks (the 100 TB regime, ~3M chunks) tasks carry ~50 chunks
    each under a 65536-partition cap and collisions average out."""
    columns = [f.name for f in df.schema.fields]
    aschema = arrow_schema_for(df.schema)
    sort_cols = [c for c in (sort_cols or []) if c != key] + [key]
    chunked = with_chunk_id(df, key, n_chunks)
    # The chunk-local row permutation rides the JVM's OWN group sort:
    # groupBy().applyInArrow requires child ordering on the grouping
    # column, and sortWithinPartitions(group, *sort_cols) satisfies that
    # prefix — Catalyst inserts NO second sort (plan-asserted in tests),
    # so the full permutation costs one Tungsten radix sort inside the
    # shuffle-read stage and the python worker skips pc.sort_indices +
    # the 2x-chunk-size take() gather. asc_nulls_last == pyarrow at_end,
    # keeping payload bytes identical to the worker-sorted path
    # (SPARK_GRAFT_PYSORT=1 forces the old path; bit-identity is tested).
    presort = not os.environ.get("SPARK_GRAFT_PYSORT")
    skip_write = bool(os.environ.get("SPARK_GRAFT_SKIP_STORE_WRITE"))
    fn = _encode_group_fn(key, columns, codecs, aschema, sort_cols,
                          store_dir=store_dir, presorted=presort,
                          skip_store_write=skip_write)
    out_schema = MANIFEST_SCHEMA if store_dir is not None else CHUNK_SCHEMA
    order = [F.asc_nulls_last(c) for c in sort_cols]
    if n_chunks <= 8192:
        salts = perfect_shuffle_salts(n_chunks)
        salt_col = F.element_at(
            F.array(*[F.lit(v) for v in salts]),
            F.col(CHUNK_COL) + 1).alias(SALT_COL)
        chunked = chunked.withColumn(SALT_COL, salt_col)
        chunked = chunked.repartition(n_chunks, SALT_COL)
        if presort:
            # group col uses plain asc (nulls-first default) so the
            # child ordering STRUCTURALLY satisfies applyInArrow's
            # required ordering — a nulls-last salt would make Catalyst
            # insert its own (order-destroying) re-sort. Salt is
            # non-null, so the payload bytes are unaffected.
            chunked = chunked.sortWithinPartitions(
                F.asc(SALT_COL), *order)
        return chunked.groupBy(SALT_COL).applyInArrow(fn, schema=out_schema)
    n_part = min(max(n_chunks, 1), 65536)
    chunked = chunked.repartition(n_part, CHUNK_COL)
    if presort:
        chunked = chunked.sortWithinPartitions(F.asc(CHUNK_COL), *order)
    return chunked.groupBy(CHUNK_COL).applyInArrow(fn, schema=out_schema)


def _decode_group_fn(schema: T.StructType, arrow_schema: pa.Schema):
    columns = [f.name for f in schema.fields]

    def fn(table: pa.Table) -> pa.Table:
        names = table.column("column").to_pylist()  # one entry per column
        metas = table.column("meta").to_pylist()
        payloads = table.column("payload").to_pylist()
        arrays = {}
        for name, meta_s, payload in zip(names, metas, payloads):
            arrays[name] = decode_column(bytes(payload),
                                         meta_from_json(meta_s))
        return pa.table({c: arrays[c].cast(arrow_schema.field(c).type)
                         for c in columns}, schema=arrow_schema)
    return fn


def _decode_map_fn(schema: T.StructType, arrow_schema: pa.Schema):
    """Shuffle-free decode: group chunk rows by chunk_id WITHIN each scan
    task. Valid because every producer emits whole chunks per partition —
    the chunk store is one file per chunk (parquet files split only at
    row-group boundaries, and a chunk's handful of payload rows is one
    row group), and encode_chunks's output is grouped by chunk id. A
    chunk decodes (and its buffers release) the moment its last column
    row is seen, so peak memory is ~one chunk regardless of task size."""
    columns = [f.name for f in schema.fields]
    expected = frozenset(columns)

    def fn(batches):
        pending: dict[int, dict[str, tuple[str, bytes]]] = {}

        def emit(got: dict[str, tuple[str, bytes]]):
            arrays = {}
            for name, (meta_s, payload) in got.items():
                arrays[name] = decode_column(payload, meta_from_json(meta_s))
            table = pa.table(
                {c: arrays[c].cast(arrow_schema.field(c).type)
                 for c in columns}, schema=arrow_schema)
            yield from table.to_batches()

        for rb in batches:
            idx = {n: rb.schema.get_field_index(n)
                   for n in ("chunk_id", "column", "meta", "payload")}
            cids = rb.column(idx["chunk_id"]).to_pylist()
            names = rb.column(idx["column"]).to_pylist()
            metas = rb.column(idx["meta"]).to_pylist()
            payloads = rb.column(idx["payload"])
            for i, (cid, name) in enumerate(zip(cids, names)):
                if name not in expected:
                    continue
                got = pending.setdefault(cid, {})
                got[name] = (metas[i], bytes(payloads[i].as_py()))
                if len(got) == len(expected):
                    yield from emit(pending.pop(cid))
        if pending:
            raise RuntimeError(
                f"chunks {sorted(pending)} are missing column rows within "
                f"this task — their rows straddle scan partitions (multi-"
                f"row-group chunk file?). Decode with shuffle=True.")
    return fn


def decode_chunks(chunks: DataFrame, schema: T.StructType,
                  columns: list[str] | None = None,
                  shuffle: bool = False) -> DataFrame:
    """Inverse of encode_chunks: encoded chunk rows → original-schema rows.

    `columns` selects a subset to decode — the untouched columns' payloads
    are never read (the filter on `column` pushes down to the chunk-store
    parquet scan), the columnar payoff of the format.

    Default is the SHUFFLE-FREE path: `mapInArrow` over the scan, grouping
    rows by chunk id within each task. Both producers of chunk rows keep
    whole chunks inside one partition (the store is one file per chunk;
    encode output is grouped by chunk id), so at the 100 TB design point
    this reads the table back with ZERO payload Exchange — the groupBy
    variant (`shuffle=True`) re-shuffled every encoded byte just to
    co-locate rows that already were. The map path detects the (not
    observed in practice) straddling case and fails with instructions
    rather than decoding wrongly."""
    if columns is not None:
        schema = T.StructType([f for f in schema.fields
                               if f.name in set(columns)])
        chunks = chunks.filter(F.col("column").isin(list(columns)))
    tz = chunks.sparkSession.conf.get("spark.sql.session.timeZone", "UTC")
    aschema = arrow_schema_for(schema, tz=tz)
    if shuffle:
        return chunks.groupBy("chunk_id").applyInArrow(
            _decode_group_fn(schema, aschema), schema=schema)
    sel = chunks.select("chunk_id", "column", "meta", "payload")
    return sel.mapInArrow(_decode_map_fn(schema, aschema), schema=schema)


def verify_roundtrip(src: DataFrame, decoded: DataFrame, key: str,
                     mode: str = "join") -> DataFrame:
    """Per-column bit-identity check. Returns one row: `rows`,
    `key_missing`, and one `<col>_bad` count per column — all zeros (and
    matching row counts) = round-trip success.

    mode="join": full-outer join on `key`, exact per-row null-safe
    comparison. Two full scans plus a key shuffle of the entire table —
    fine as a gate at test scale, a ~100 TB shuffle at the design point.

    mode="checksum": per-column order-independent aggregate checksum
    `bit_xor(xxhash64(key, col))` computed INDEPENDENTLY on each side —
    zero join, zero table-data shuffle (each side folds to one row
    map-side; the only exchanges are single-row partial-agg gathers).
    Detects any single-row difference with probability 1 - 2^-64-ish;
    `<col>_bad` is 0/1 (checksums agree or not) rather than a row count.
    XOR cancellation needs unique keys — guaranteed here (`key` is the
    chunking key). NULL values hash as absent (Spark hash functions skip
    NULLs), so value↔NULL flips are still caught via the key term."""
    cols = [f.name for f in src.schema.fields if f.name != key]
    if mode == "checksum":
        def side(df: DataFrame, p: str):
            aggs = [F.count(F.lit(1)).alias(f"{p}_rows"),
                    F.bit_xor(F.xxhash64(F.col(key))).alias(f"{p}_key")]
            for c in cols:
                aggs.append(F.bit_xor(F.xxhash64(F.col(key), F.col(c)))
                            .alias(f"{p}_{c}"))
            return df.agg(*aggs)
        j = side(src, "s").crossJoin(side(decoded, "d"))  # 1 row × 1 row
        out = [F.col("s_rows").alias("rows"),
               F.when((F.col("s_rows") == F.col("d_rows"))
                      & F.col("s_key").eqNullSafe(F.col("d_key")), 0)
               .otherwise(1).alias("key_missing")]
        for c in cols:
            out.append(
                F.when(F.col(f"s_{c}").eqNullSafe(F.col(f"d_{c}")), 0)
                .otherwise(1).alias(f"{c}_bad"))
        return j.select(*out)
    s = src.alias("s")
    d = decoded.alias("d")
    joined = s.join(d, F.col(f"s.{key}") == F.col(f"d.{key}"), "full_outer")
    aggs = [
        F.count(F.lit(1)).alias("rows"),
        F.sum(F.when(F.col(f"s.{key}").isNull() | F.col(f"d.{key}").isNull(),
                     1).otherwise(0)).alias("key_missing"),
    ]
    for c in cols:
        aggs.append(
            F.sum(F.when(F.col(f"s.{c}").eqNullSafe(F.col(f"d.{c}")), 0)
                  .otherwise(1)).alias(f"{c}_bad"))
    return joined.agg(*aggs)
