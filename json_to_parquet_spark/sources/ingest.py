"""Reference-parity JSON ingest (SURVEY §1.3, §2A #1-17).

The reference (Zhengsheng-Wang/Json-to-Parquet) converts raw JSON files to
Parquet with inferred schemas. Its semantics map almost entirely onto
Spark's JSON source:

  reference behavior                      │ here
  ───────────────────────────────────────┼────────────────────────────────
  brace-balance doc splitting             │ spark.read.json (JSON-lines or
   (src/JsonFormater.java:10-50)          │ multiLine=true) — quote-aware,
                                          │ unlike the reference's splitter
  per-record schema infer + union         │ JSON source union-schema
   (src/Manager.java:23-29, last-schema   │ inference (the *intended*
   bug at src/Writer.java:24)             │ batch-unified semantics)
  long→double widening                    │ inference compatibleType
   (src/JsonFactory.java:54-146)          │ (automatic)
  missing key ≡ explicit null             │ native null semantics
   (src/JsonFactory.java:151-215)         │
  always-NULL column dropped              │ dropFieldIfAllNull=true
   (src/SchemaBuilder.java:92-95)         │
  nested arrays flattened to one level    │ flatten_nested_arrays (optional
   (src/SchemaBuilder.java:22-36)         │ quirk-parity transform)
  empty group → NULL                      │ empty_structs_to_null (optional)
  Parquet write, dict-on + UNCOMPRESSED   │ write_reference_parquet — the
   (src/Writer.java:25-26 defaults)       │ compressed-size yardstick

The reference's lossy narrowing (long→int32, double→float at
src/Writer.java:98-102) is intentionally NOT reproduced.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def ingest_json(spark: SparkSession, path: str, multi_line: bool = False,
                drop_all_null: bool = True) -> DataFrame:
    """Read JSON documents with reference-equivalent inference semantics."""
    return (spark.read
            .option("multiLine", "true" if multi_line else "false")
            .option("dropFieldIfAllNull", "true" if drop_all_null else "false")
            .option("prefersDecimal", "false")
            .json(path))


def _split_concat_docs(blob: str) -> list[str]:
    """Split back-to-back `{...}{...}` JSON objects (quote-aware) and
    normalize each document to one physical line, JSON-lines-safe.

    The reference accepts such files via brace counting
    (src/JsonFormater.java:32-46) but counts braces INSIDE string values
    too; this splitter tracks strings and escapes, so documents like
    {"a": "}"} split correctly. Vectorized numpy state machine — one pass
    over the file bytes, no per-char Python.

    Newline handling (quote-aware, NOT a blanket replace): \\n/\\r
    OUTSIDE string values are insignificant inter-token whitespace →
    space; raw \\n/\\r INSIDE string values — illegal JSON that lenient
    parsers (incl. Spark's) accept — are rewritten to the proper
    two-byte escapes \\\\n/\\\\r, so the string CONTENT survives the
    downstream JSON parse bit-exactly while every emitted document stays
    a single line."""
    import numpy as np
    data = blob.encode("utf-8")
    b = np.frombuffer(data, dtype=np.uint8)
    n = len(b)
    if n == 0:
        return []
    idx = np.arange(n)
    bs = b == ord("\\")
    # consecutive-backslash run length ending just before each position:
    # a quote is escaped iff that run length is odd
    prev_non_bs = np.maximum.accumulate(np.where(~bs, idx, -1))
    run_before = idx - 1 - np.concatenate(([0], prev_non_bs[:-1]))
    run_before[0] = 0
    quote = (b == ord('"')) & (run_before % 2 == 0)
    # inside-string parity BEFORE each position (exclusive cumsum)
    qcum = np.cumsum(quote)
    outside = ((qcum - quote) % 2) == 0
    opens = (b == ord("{")) & outside
    closes = (b == ord("}")) & outside
    depth = np.cumsum(opens.astype(np.int32)) - np.cumsum(closes.astype(np.int32))
    ends = np.flatnonzero(closes & (depth == 0))  # inclusive end offsets
    starts = np.flatnonzero(opens & (depth == 1))  # depth AFTER the open
    # --- newline normalization over the whole buffer, positions remapped
    nl = (b == 0x0A) | (b == 0x0D)
    out = b.copy()
    out[nl & outside] = ord(" ")
    inside_nl = np.flatnonzero(nl & ~outside)
    if len(inside_nl):
        # expand each in-string newline byte to '\' + ('n'|'r')
        reps = np.ones(n, dtype=np.int64)
        reps[inside_nl] = 2
        pos = np.cumsum(reps, dtype=np.int64) - reps  # input→output offset
        exp = np.empty(int(pos[-1] + reps[-1]), dtype=np.uint8)
        exp[pos] = out
        exp[pos[inside_nl]] = ord("\\")
        exp[pos[inside_nl] + 1] = np.where(
            b[inside_nl] == 0x0A, ord("n"), ord("r")).astype(np.uint8)
        out_bytes = exp.tobytes()

        def span(s: int, e: int) -> bytes:  # '{'/'}' never expand
            return out_bytes[pos[s]: pos[e] + 1]
    else:
        out_bytes = out.tobytes()

        def span(s: int, e: int) -> bytes:
            return out_bytes[s: e + 1]
    docs = []
    prev_end = -1
    for e in ends:
        s_candidates = starts[(starts > prev_end) & (starts <= e)]
        if len(s_candidates) == 0:
            continue
        s = int(s_candidates[0])
        docs.append(span(s, int(e)).decode("utf-8", "replace"))
        prev_end = int(e)
    return docs


def ingest_json_concat(spark: SparkSession, path: str,
                       drop_all_null: bool = True,
                       scratch_dir: str | None = None) -> DataFrame:
    """Read files of CONCATENATED JSON objects (`{...}{...}`, newline or
    not) — the input shape the reference's splitter accepts but Spark's
    JSON source turns into `_corrupt_record`.

    Plan (DataFrame-only, per the input hint — no RDD hop): wholetext
    scan → per-file vectorized quote-aware splitter (mapInPandas), which
    emits each document as one physical line (out-of-string newlines →
    space; lenient raw in-string newlines → proper \\n/\\r escapes, so
    string contents are preserved exactly) → spill the one-doc-per-line
    stream to `scratch_dir` as text → standard JSON-lines union-schema
    inference over it. Each input file is one row in the text scan (same
    whole-file memory model as the reference); at scale, line-delimited
    JSON remains the fast path — this is the parity path for legacy
    concatenated files. On a cluster pass a shared `scratch_dir`
    (defaults to a driver-local temp dir, removed at interpreter exit —
    the staged text must outlive this call because the returned
    DataFrame scans it lazily)."""
    import tempfile
    from collections.abc import Iterator

    import pandas as pd

    raw = (spark.read.format("text").option("wholetext", "true").load(path))

    def split_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for blob in pdf["value"]:
                out.extend(_split_concat_docs(blob))
            yield pd.DataFrame({"value": out})

    docs = raw.mapInPandas(split_fn, "value string")
    if scratch_dir is None:
        import atexit
        import shutil
        scratch_dir = tempfile.mkdtemp(prefix="j2ps_concat_")
        atexit.register(shutil.rmtree, scratch_dir, ignore_errors=True)
    staged = f"{scratch_dir}/docs_jsonl"
    docs.write.mode("overwrite").text(staged)
    return (spark.read
            .option("dropFieldIfAllNull", "true" if drop_all_null else "false")
            .option("prefersDecimal", "false")
            .json(staged))


def _flatten_type(dt: T.DataType) -> T.DataType:
    if isinstance(dt, T.ArrayType):
        inner = dt.elementType
        while isinstance(inner, T.ArrayType):
            inner = inner.elementType
        return T.ArrayType(_flatten_type(inner), True)
    if isinstance(dt, T.StructType):
        return T.StructType([
            T.StructField(f.name, _flatten_type(f.dataType), True)
            for f in dt.fields])
    return dt


def _flatten_col(col: Column, dt: T.DataType) -> Column:
    if isinstance(dt, T.ArrayType):
        depth = 0
        inner = dt
        while isinstance(inner, T.ArrayType):
            depth += 1
            inner = inner.elementType
        out = col
        for _ in range(depth - 1):
            out = F.flatten(out)
        if isinstance(inner, T.StructType):
            out = F.transform(out, lambda x: _flatten_col(x, inner))
        return out
    if isinstance(dt, T.StructType):
        return F.struct(*[
            _flatten_col(col.getField(f.name), f.dataType).alias(f.name)
            for f in dt.fields])
    return col


def flatten_nested_arrays(df: DataFrame) -> DataFrame:
    """Quirk-parity: collapse array<array<...>> to a single repeated level,
    as the reference does (src/SchemaBuilder.java:22-36, Writer.java:48-50)."""
    return df.select(*[
        _flatten_col(F.col(f.name), f.dataType).alias(f.name)
        for f in df.schema.fields])


def _null_empty_struct(col: Column, dt: T.DataType) -> Column:
    if isinstance(dt, T.StructType):
        fixed = F.struct(*[
            _null_empty_struct(col.getField(f.name), f.dataType).alias(f.name)
            for f in dt.fields])
        all_null = None
        for f in dt.fields:
            c = col.getField(f.name).isNull()
            all_null = c if all_null is None else (all_null & c)
        if all_null is None:  # zero-field struct
            return F.lit(None).cast(dt)
        return F.when(all_null, F.lit(None).cast(dt)).otherwise(fixed)
    return col


def empty_structs_to_null(df: DataFrame) -> DataFrame:
    """Quirk-parity: structs whose fields are all NULL become NULL, like the
    reference's empty-group nullification (src/JsonFactory.java:34-48)."""
    return df.select(*[
        _null_empty_struct(F.col(f.name), f.dataType).alias(f.name)
        for f in df.schema.fields])


def write_reference_parquet(df: DataFrame, path: str) -> None:
    """The compressed-size yardstick: Parquet with the same effective
    settings as the reference's parquet-mr defaults (dictionary encoding
    on, UNCOMPRESSED codec — src/Writer.java:25-26)."""
    (df.write.mode("overwrite")
       .option("compression", "uncompressed")
       .option("parquet.enable.dictionary", "true")
       .parquet(path))


def json_to_parquet(spark: SparkSession, in_path: str, out_path: str,
                    multi_line: bool = False, quirk_parity: bool = False,
                    concat: bool = False) -> DataFrame:
    """The reference's whole CLI pipeline (src/Manager.java:8-34) as one
    call: read JSON → (optional quirk transforms) → reference-style Parquet.
    `concat=True` accepts back-to-back `{...}{...}` files (the reference's
    brace-balance splitter input shape)."""
    if concat:
        df = ingest_json_concat(spark, in_path)
    else:
        df = ingest_json(spark, in_path, multi_line=multi_line)
    if quirk_parity:
        df = empty_structs_to_null(flatten_nested_arrays(df))
    write_reference_parquet(df, out_path)
    return df
