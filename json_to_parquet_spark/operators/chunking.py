"""Deterministic chunk assignment.

A chunk is the unit of encoding, checkpointing, and resume. Chunk id is a
pure function of the row key — `pmod(xxhash64(key), n_chunks)` — so chunk
membership is identical across runs, partition counts, and cluster sizes
(unlike `repartitionByRange`, whose sampled boundaries are not stable).
xxhash64 of a url key is uniformly distributed, so chunks are inherently
balanced even when business keys (lang, domain) are Zipf-hot; the salting
helper below is for *aggregations over skewed keys*, not for chunking.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

CHUNK_COL = "__chunk_id"


def with_chunk_id(df: DataFrame, key: str, n_chunks: int) -> DataFrame:
    """Attach the deterministic chunk id column.

    NULL keys land in chunk 0 (xxhash64 of NULL is NULL — coalesced so
    such rows are still encoded rather than silently grouped apart).
    For bit-reproducible chunk payloads the key should be UNIQUE per row
    (it is the sort tiebreak; duplicate keys make intra-chunk order of
    those rows arbitrary — correct but not checksum-stable)."""
    return df.withColumn(
        CHUNK_COL,
        F.coalesce(F.pmod(F.xxhash64(F.col(key)), F.lit(n_chunks)),
                   F.lit(0)).cast("int")
    )


def salted(key: Column, buckets: int, salt_from: Column) -> Column:
    """Salted composite key for two-stage aggregation over hot keys:
    stage 1 groups by (key, salt) — spreads a hot key over `buckets`
    reducers — stage 2 merges partials by key alone."""
    return F.pmod(F.xxhash64(salt_from), F.lit(buckets)).cast("int")


def salted_count(df: DataFrame, key: str, salt_from: str,
                 buckets: int = 32) -> DataFrame:
    """count(*) per `key` with skew-safe two-stage aggregation."""
    stage1 = (
        df.groupBy(F.col(key), salted(F.col(key), buckets, F.col(salt_from))
                   .alias("__salt"))
        .agg(F.count(F.lit(1)).alias("__partial"))
    )
    return stage1.groupBy(key).agg(F.sum("__partial").alias("cnt"))
