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
                    multi_line: bool = False, quirk_parity: bool = False
                    ) -> DataFrame:
    """The reference's whole CLI pipeline (src/Manager.java:8-34) as one
    call: read JSON → (optional quirk transforms) → reference-style Parquet."""
    df = ingest_json(spark, in_path, multi_line=multi_line)
    if quirk_parity:
        df = empty_structs_to_null(flatten_nested_arrays(df))
    write_reference_parquet(df, out_path)
    return df
