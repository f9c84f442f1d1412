"""Quality metrics for the approximate operators: the LSH/IVF tiers must
actually find what brute force finds (recall), and MinHash-LSH candidates
must cover the truly-similar pairs (recall vs exact Jaccard)."""

import pyspark.sql.functions as F
import pytest

from json_to_parquet_spark.operators import ann, dedup
from json_to_parquet_spark.sources.webpages import load_table

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


def test_load_table_parquet_fallback(spark):
    df = load_table(spark, f"{SF}/documents.parquet")
    assert df.count() == 500


def test_lsh_recall_vs_brute(spark, emb):
    """Mean recall@10 of the LSH tier over 5 queries >= 0.5 (and exact=1.0
    when max_hamming spans all buckets)."""
    queries = [r.embedding for r in
               emb.filter("vec_id < 5").orderBy("vec_id").collect()]
    recalls = []
    for q in queries:
        truth = {r.vec_id for r in ann.brute_force_topk(emb, q, k=10).collect()}
        approx = {r.vec_id for r in
                  ann.lsh_topk(emb, q, k=10, nbits=12, max_hamming=5)
                  .collect()}
        recalls.append(len(truth & approx) / 10)
    assert sum(recalls) / len(recalls) >= 0.5, recalls
    # degenerate check: hamming >= nbits probes everything → exact
    q = queries[0]
    truth = [r.vec_id for r in ann.brute_force_topk(emb, q, k=10).collect()]
    full = [r.vec_id for r in
            ann.lsh_topk(emb, q, k=10, nbits=12, max_hamming=12).collect()]
    assert truth == full


def test_ivf_recall_vs_brute(spark, emb):
    assigned, cents = ann.ivf_index(emb, n_centroids=8, refine_iters=1)
    assigned = assigned.cache()
    queries = [r.embedding for r in
               emb.filter("vec_id < 5").orderBy("vec_id").collect()]
    recalls = []
    for q in queries:
        truth = {r.vec_id for r in ann.brute_force_topk(emb, q, k=10).collect()}
        approx = {r.vec_id for r in
                  ann.ivf_topk(assigned, cents, q, k=10, nprobe=4).collect()}
        recalls.append(len(truth & approx) / 10)
    assert sum(recalls) / len(recalls) >= 0.4, recalls


def test_minhash_recall_vs_exact_jaccard(spark):
    """Pairs with exact CHAR-5-gram Jaccard >= 0.9 (the same shingle
    universe MinHash estimates) must appear among the LSH candidates
    (16 bands x 4 rows ⇒ P(catch | J=0.9) ≈ 1-(1-0.9^4)^16 ≈ 1.0)."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    exact = dedup.ngram_jaccard_pairs(
        docs, block_cols=[], threshold=0.9, use_words=False, shingle_k=5)
    truth = {(r.id_a, r.id_b) for r in exact.collect()}
    if not truth:
        pytest.skip("no high-jaccard pairs at this sf")
    cand = {(r.id_a, r.id_b) for r in
            dedup.minhash_lsh_candidates(docs).collect()}
    missed = truth - cand
    assert len(missed) <= max(1, len(truth) // 20), (len(truth), len(missed))
