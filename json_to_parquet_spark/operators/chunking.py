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

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

CHUNK_COL = "__chunk_id"


def with_chunk_id(df: DataFrame, key: str, n_chunks: int,
                  hash_fn: Callable[[Column], Column] = F.xxhash64
                  ) -> DataFrame:
    """Attach the deterministic chunk id column.

    NULL keys land in chunk 0 (the hash of NULL is NULL — coalesced so
    such rows are still encoded rather than silently grouped apart).
    For bit-reproducible chunk payloads the key should be UNIQUE per row
    (it is the sort tiebreak; duplicate keys make intra-chunk order of
    those rows arbitrary — correct but not checksum-stable).

    `hash_fn` swaps the key hash (production: xxhash64). The md5-lane
    oracle twin (q_chunk_assignment_md5) passes dedup.md5_lane_hash so a
    DuckDB oracle can reproduce the identical pmod assignment closed-form
    — value-checking this function's coalesce/pmod/cast structure."""
    return df.withColumn(
        CHUNK_COL,
        F.coalesce(F.pmod(hash_fn(F.col(key)), F.lit(n_chunks)),
                   F.lit(0)).cast("int")
    )


def _murmur3_int32(x: int, seed: int = 42) -> int:
    """Murmur3_x86_32 of one 32-bit int — bit-identical to Spark's
    `hash()` / HashPartitioning for IntegerType (single 4-byte block,
    seed 42). Public algorithm (Appleby's MurmurHash3)."""
    c1, c2 = 0xCC9E2D51, 0x1B873593
    k = (x & 0xFFFFFFFF) * c1 & 0xFFFFFFFF
    k = ((k << 15) | (k >> 17)) & 0xFFFFFFFF
    k = k * c2 & 0xFFFFFFFF
    h = (seed ^ k) & 0xFFFFFFFF
    h = ((h << 13) | (h >> 19)) & 0xFFFFFFFF
    h = (h * 5 + 0xE6546B64) & 0xFFFFFFFF
    h ^= 4  # total byte length
    h ^= h >> 16
    h = h * 0x85EBCA6B & 0xFFFFFFFF
    h ^= h >> 13
    h = h * 0xC2B2AE35 & 0xFFFFFFFF
    h ^= h >> 16
    return h - (1 << 32) if h >= (1 << 31) else h


def perfect_shuffle_salts(n: int) -> list[int]:
    """`salts[cid]` = smallest non-negative int whose Spark hash lands in
    partition `cid` of an `n`-partition HashPartitioning — i.e.
    `pmod(murmur3(salts[cid]), n) == cid`.

    Shuffling on `salts[chunk_id]` instead of `chunk_id` places EXACTLY
    one chunk in each of `n` partitions: hashing k distinct ids into k
    partitions is balls-in-bins (~37% empty partitions, multi-chunk
    straggler tasks whose tail quantum dominates the last wave at high
    core counts), while the salt relabeling is a perfect hash. Driver
    cost is ~n·ln n murmur evaluations (coupon collector) — ~ms for the
    ≤8192-chunk regime where whole-chunk stragglers matter; larger chunk
    counts run many chunks per task and average out instead."""
    salts: list[int | None] = [None] * n
    left, v = n, 0
    while left:
        cid = _murmur3_int32(v) % n  # python % == pmod for positive n
        if salts[cid] is None:
            salts[cid] = v
            left -= 1
        v += 1
    return salts  # type: ignore[return-value]


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
