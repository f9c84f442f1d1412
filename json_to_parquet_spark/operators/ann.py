"""Similarity search over embedding columns (array<float>).

Three tiers:
  brute_force_topk  exact cosine top-k, pure JVM exprs (zip_with/aggregate)
                    — the correctness baseline, and the right answer when
                    the query set is small (broadcast query, one scan).
  lsh_topk          random-hyperplane bucketing: probe only rows whose
                    sign-signature is hamming-close to the query's —
                    bounded candidate set at 100 TB scale.
  ivf_topk          inverted-file: deterministic coarse centroids (sampled
                    seed rows), one vectorized assignment pass
                    (pandas_udf matmul), probe nearest `nprobe` lists.

All exact math runs in the JVM; only the matrix products (assignment,
signatures) use Arrow-batched numpy.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.pandas.functions import pandas_udf
from pyspark.sql.types import IntegerType

from .dedup import cosine_expr, hyperplane_signature


def _query_lit(query_vec) -> F.Column:
    return F.array(*[F.lit(float(x)) for x in query_vec]).cast("array<double>")


def brute_force_topk(df: DataFrame, query_vec, k: int = 10,
                     vec_col: str = "embedding", id_col: str = "vec_id",
                     ) -> DataFrame:
    """Exact cosine top-k. One scan, partial top-k per partition (Spark's
    TakeOrderedAndProject), no full sort."""
    q = _query_lit(query_vec)
    scored = df.select(
        F.col(id_col),
        cosine_expr(F.col(vec_col).cast("array<double>"), q).alias("cosine"))
    return scored.orderBy(F.desc("cosine"), F.asc(id_col)).limit(k)


def lsh_topk(df: DataFrame, query_vec, k: int = 10, vec_col: str = "embedding",
             id_col: str = "vec_id", nbits: int = 12, max_hamming: int = 2,
             seed: int = 42) -> DataFrame:
    """Approximate top-k: candidates = rows whose hyperplane signature is
    within `max_hamming` bits of the query signature; exact cosine rerank."""
    dim = len(query_vec)
    sig_udf = hyperplane_signature(dim, nbits, seed)
    s = df.select(F.col(id_col), F.col(vec_col).alias("v"),
                  sig_udf(F.col(vec_col)).alias("sig"))
    qsig = _qsig(query_vec, _planes(dim, nbits, seed))
    cand = s.filter(
        F.bit_count(F.col("sig").bitwiseXOR(F.lit(qsig))) <= max_hamming)
    q = _query_lit(query_vec)
    return (cand.select(F.col(id_col),
                        cosine_expr(F.col("v").cast("array<double>"), q)
                        .alias("cosine"))
            .orderBy(F.desc("cosine"), F.asc(id_col)).limit(k))


def _planes(dim: int, nbits: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((dim, nbits)).astype(np.float64)


def _qsig(query_vec, planes: np.ndarray) -> int:
    bits = (np.asarray(query_vec, dtype=np.float64) @ planes) > 0
    padded = np.zeros(8, dtype=np.uint8)
    pb = np.packbits(bits, bitorder="little")
    padded[: len(pb)] = pb
    return int(padded.view(np.int64)[0])


def batch_topk(df: DataFrame, queries: DataFrame, k: int = 5,
               vec_col: str = "embedding", id_col: str = "vec_id",
               q_id_col: str = "q_id", q_vec_col: str = "q_vec") -> DataFrame:
    """Exact cosine top-k for a whole query SET in one job: broadcast the
    query table, score every (row, query) pair JVM-side, keep top-k per
    query with a window (rank ties broken by id — deterministic).

    At scale: queries are broadcast (small side), the corpus is scanned
    once, and the window's partial top-k runs map-side before the
    per-query shuffle."""
    from pyspark.sql import Window
    scored = (df.join(F.broadcast(queries))
              .select(F.col(q_id_col), F.col(id_col),
                      cosine_expr(F.col(vec_col).cast("array<double>"),
                                  F.col(q_vec_col).cast("array<double>"))
                      .alias("cosine")))
    w = Window.partitionBy(q_id_col).orderBy(F.desc("cosine"), F.asc(id_col))
    return (scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= k).drop("rn"))


def choose_centroids(df: DataFrame, n_centroids: int,
                     vec_col: str = "embedding", id_col: str = "vec_id"
                     ) -> np.ndarray:
    """Deterministic coarse centroids: the vectors whose xxhash64(id) is
    smallest — a seeded uniform sample with no RNG state (stable across
    cluster sizes). Collected to the driver (n_centroids × dim — tiny)."""
    rows = (df.select(F.col(id_col), F.col(vec_col))
              .orderBy(F.xxhash64(F.col(id_col)), F.col(id_col))
              .limit(n_centroids).collect())
    return np.stack([np.asarray(r[1], dtype=np.float64) for r in rows])


def _assign_udf(centroids: np.ndarray):
    c = centroids / np.linalg.norm(centroids, axis=1, keepdims=True)

    @pandas_udf(IntegerType())
    def assign(vecs: pd.Series) -> pd.Series:
        mat = np.stack(vecs.to_numpy()).astype(np.float64)
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        sims = (mat / norms) @ c.T  # (n, n_centroids) one matmul per batch
        return pd.Series(np.argmax(sims, axis=1).astype(np.int32))

    return assign


def refine_centroids(df: DataFrame, centroids: np.ndarray,
                     vec_col: str = "embedding", iters: int = 2
                     ) -> np.ndarray:
    """Distributed Lloyd iterations: assign (vectorized matmul) →
    per-list mean via posexplode + groupBy(list, dim) partial aggregation
    — the shuffle carries only n_centroids x dim partial sums. At 10^12
    docs this runs on a sample; centroids stay driver-sized."""
    dim = centroids.shape[1]
    for _ in range(iters):
        assigned = df.withColumn("list_id",
                                 _assign_udf(centroids)(F.col(vec_col)))
        means = (assigned
                 .select("list_id", F.posexplode(vec_col).alias("dim", "v"))
                 .groupBy("list_id", "dim").agg(F.avg("v").alias("m"))
                 .collect())
        new = centroids.copy()
        sums: dict[int, np.ndarray] = {}
        for r in means:
            sums.setdefault(r.list_id, np.zeros(dim))[r.dim] = r.m
        for lid, vec in sums.items():
            new[lid] = vec
        centroids = new
    return centroids


def ivf_index(df: DataFrame, n_centroids: int = 16,
              vec_col: str = "embedding", id_col: str = "vec_id",
              refine_iters: int = 0) -> tuple[DataFrame, np.ndarray]:
    """Build the IVF assignment: (df + `list_id` column, centroids).
    `refine_iters` > 0 runs distributed Lloyd refinement on the sampled
    seed centroids. At scale the assigned table is written back
    partitioned by list_id so probes touch only nprobe/n_centroids."""
    cents = choose_centroids(df, n_centroids, vec_col, id_col)
    if refine_iters:
        cents = refine_centroids(df, cents, vec_col, refine_iters)
    assigned = df.withColumn("list_id", _assign_udf(cents)(F.col(vec_col)))
    return assigned, cents


def ivf_topk(assigned: DataFrame, centroids: np.ndarray, query_vec,
             k: int = 10, nprobe: int = 4, vec_col: str = "embedding",
             id_col: str = "vec_id") -> DataFrame:
    """Probe the `nprobe` centroid lists nearest the query; exact rerank."""
    qn = np.asarray(query_vec, dtype=np.float64)
    qn = qn / (np.linalg.norm(qn) or 1.0)
    cn = centroids / np.linalg.norm(centroids, axis=1, keepdims=True)
    probe = np.argsort(-(cn @ qn), kind="stable")[:nprobe].tolist()
    q = _query_lit(query_vec)
    return (assigned.filter(F.col("list_id").isin(probe))
            .select(F.col(id_col),
                    cosine_expr(F.col(vec_col).cast("array<double>"), q)
                    .alias("cosine"))
            .orderBy(F.desc("cosine"), F.asc(id_col)).limit(k))
