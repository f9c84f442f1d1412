"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)`   — flagship: full encode→decode→verify pipeline on a
                   deterministic synthetic web-pages table + the sf0.001
                   documents table; returns the per-chunk manifest with
                   round-trip status.
`queries()`      — one entry per implemented operator family
                   (SURVEY.md §2 + training-data ops).
`oracle_sql()`   — DuckDB twins for every SQL-expressible query; value
                   parity relies on: integer aggregates cast to BIGINT,
                   money aggregates summed as DECIMAL(18,2) (exact,
                   associative), raw parquet doubles passed through
                   untouched, and identical scalar expression trees for
                   per-row doubles.

Column names are aliased identically on both sides (the driver hashes
values after sorting columns by name).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _ship_package(spark: SparkSession) -> None:
    """Make json_to_parquet_spark importable inside Python workers of ANY
    SparkSession (the driver harness builds its own session without this
    repo on the workers' path). addPyFile distributes a zip of the
    package and extends worker sys.path at runtime."""
    if getattr(spark, "_j2ps_shipped", False):
        return
    import os
    import sys
    import tempfile
    import zipfile
    repo = os.path.dirname(os.path.abspath(__file__))
    if repo not in sys.path:
        sys.path.insert(0, repo)
    pkg = os.path.join(repo, "json_to_parquet_spark")
    zpath = os.path.join(tempfile.gettempdir(),
                         f"json_to_parquet_spark_{os.getpid()}.zip")
    # always rebuild: a stale zip from an earlier run would ship old code
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    zf.write(full, os.path.relpath(full, repo))
    try:
        spark.sparkContext.addPyFile(zpath)
    except Exception:
        pass  # already added in this context
    spark._j2ps_shipped = True


# --------------------------------------------------------------------------
# flagship


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the two-pass encode pipeline end-to-end, twice —
    (a) on the sf0.001 `documents` table, (b) on the deterministic
    synthetic web-pages table (BASELINE input_hint shape, which the
    testdata set lacks). Returns the combined manifests with per-table
    round-trip verification flags."""
    import tempfile

    from json_to_parquet_spark.plans import pipeline
    from json_to_parquet_spark.sources.webpages import synth_webpages

    _ship_package(spark)

    def run(src: DataFrame, key: str, tag: str) -> DataFrame:
        out = tempfile.mkdtemp(prefix=f"j2ps_entry_{tag}_")
        pipeline.run_encode(spark, src, out, key=key, n_chunks=4)
        ok = pipeline.verify_encoded(spark, src, out)["ok"]
        return (spark.read.parquet(f"{out}/manifest")
                .select("chunk_id", "column", "codec", "n_rows",
                        "raw_bytes", "enc_bytes", "checksum")
                .withColumn("table", F.lit(tag))
                .withColumn("roundtrip_ok", F.lit(bool(ok))))

    docs = _t(spark, "/root/testdata/sf0.001", "documents")
    pages = synth_webpages(spark, 2000, seed=42)
    return run(docs, "doc_id", "documents").unionByName(
        run(pages, "url", "webpages"))


# --------------------------------------------------------------------------
# oracle-checked queries


def q_doc_stats(spark, sf):
    return (_t(spark, sf, "documents").groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
        F.countDistinct("source").alias("n_sources")))


def q_token_stats(spark, sf):
    from json_to_parquet_spark.functions.text import token_count
    d = _t(spark, sf, "documents")
    return (d.select("lang", token_count(F.col("text")).alias("tc"))
            .groupBy("lang")
            .agg(F.sum("tc").alias("total_tokens"),
                 F.max("tc").alias("max_tokens"),
                 F.min("tc").alias("min_tokens")))


def q_fingerprint_dupes(spark, sf):
    from json_to_parquet_spark.functions.text import fingerprint
    d = _t(spark, sf, "documents")
    return d.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct(fingerprint(F.col("text"))).alias("n_unique"))


def q_dup_cluster_hist(spark, sf):
    from json_to_parquet_spark.operators.dedup import duplicate_clusters
    cl = duplicate_clusters(_t(spark, sf, "documents"))
    return (cl.groupBy("n_docs").agg(F.count(F.lit(1)).alias("n_clusters")))


def q_ngram_jaccard(spark, sf):
    from json_to_parquet_spark.operators.dedup import ngram_jaccard_pairs
    pairs = ngram_jaccard_pairs(_t(spark, sf, "documents"),
                                block_cols=["lang"], threshold=0.5,
                                use_words=True)
    return pairs.select("id_a", "id_b", F.round("jaccard", 4).alias("jac4"))


def q_lang_id_counts(spark, sf):
    from json_to_parquet_spark.functions.text import lang_id
    d = _t(spark, sf, "documents")
    return (d.select(lang_id(F.col("text")).alias("lang_guess"))
            .groupBy("lang_guess").agg(F.count(F.lit(1)).alias("n")))


def q_quality_by_source(spark, sf):
    from json_to_parquet_spark.functions.text import quality_score
    d = _t(spark, sf, "documents")
    return (d.select("source",
                     F.floor(quality_score(F.col("text")) * 10000)
                     .alias("q4"))
            .groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("q4").alias("quality_sum")))


def q_tpch_pricing(spark, sf):
    """Money aggregates as integer cents (×100 / ×10000): decimal sums are
    exact on both engines, but their *renderings* differ (scale padding),
    which flips the driver's value hash — BIGINT is rendering-stable."""
    li = _t(spark, sf, "lineitem")
    return (li.groupBy("l_returnflag", "l_linestatus").agg(
        (F.sum(F.col("l_quantity").cast("decimal(18,2)")) * 100)
        .cast("bigint").alias("sum_qty"),
        (F.sum(F.col("l_extendedprice").cast("decimal(18,2)")) * 100)
        .cast("bigint").alias("sum_price"),
        (F.sum(F.col("l_extendedprice").cast("decimal(18,2)")
               * (F.lit(1) - F.col("l_discount")).cast("decimal(18,2)"))
         .cast("decimal(28,4)") * 10000).cast("bigint").alias("sum_disc_price"),
        F.count(F.lit(1)).alias("count_order")))


def q_revenue_by_nation(spark, sf):
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders")
    n = _t(spark, sf, "nation")
    return (o.join(c, o.o_custkey == c.c_custkey)
             .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
             .groupBy("n_name")
             .agg((F.sum(F.col("o_totalprice").cast("decimal(18,2)")) * 100)
                  .cast("bigint").alias("revenue"),
                  F.count(F.lit(1)).alias("n_orders")))


def q_top_order_per_customer(spark, sf):
    from pyspark.sql import Window
    o = _t(spark, sf, "orders")
    w = (Window.partitionBy("o_custkey")
         .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey")))
    return (o.withColumn("rn", F.row_number().over(w)).filter("rn = 1")
            .select("o_custkey", "o_orderkey", "o_totalprice"))


def q_top_lineitems(spark, sf):
    li = _t(spark, sf, "lineitem")
    return (li.orderBy(F.desc("l_extendedprice"), F.asc("l_orderkey"),
                       F.asc("l_linenumber"))
            .select("l_orderkey", "l_linenumber", "l_extendedprice")
            .limit(10))


def q_salted_lang_counts(spark, sf):
    """Two-stage salted aggregation over the skewed `lang` key — must
    produce exactly the same counts as a plain GROUP BY (the oracle)."""
    from json_to_parquet_spark.operators.chunking import salted_count
    d = _t(spark, sf, "documents")
    return salted_count(d, "lang", "doc_id", buckets=16) \
        .select("lang", F.col("cnt").cast("long").alias("cnt"))


def q_rollup_orders(spark, sf):
    o = _t(spark, sf, "orders")
    return (o.rollup("o_orderpriority", "o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n_orders"),
                 (F.sum(F.col("o_totalprice").cast("decimal(18,2)")) * 100)
                 .cast("bigint").alias("total")))


def q_pivot_status_counts(spark, sf):
    o = _t(spark, sf, "orders")
    return (o.groupBy("o_orderpriority").agg(
        F.sum(F.when(F.col("o_orderstatus") == "O", 1).otherwise(0))
        .alias("n_open"),
        F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0))
        .alias("n_filled"),
        F.sum(F.when(F.col("o_orderstatus") == "P", 1).otherwise(0))
        .alias("n_pending")))


def q_events_json(spark, sf):
    e = _t(spark, sf, "events")
    return (e.select("event_type",
                     F.get_json_object("props", "$.k").cast("long").alias("k"))
            .groupBy("event_type")
            .agg(F.sum("k").alias("k_sum"), F.count(F.lit(1)).alias("n"),
                 F.min("k").alias("k_min"), F.max("k").alias("k_max")))


def q_sessionize_events(spark, sf):
    """Sessionization: a >30-minute gap starts a new session (lag window
    + conditional sum) — per-user session and event counts."""
    from pyspark.sql import Window
    e = _t(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    tsec = F.col("ts").cast("timestamp").cast("long")  # NTZ → epoch s (UTC)
    gap = tsec - F.lag(tsec).over(w)
    new_sess = F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    return (e.withColumn("ns", new_sess)
            .groupBy("user_id")
            .agg(F.sum("ns").alias("n_sessions"),
                 F.count(F.lit(1)).alias("n_events")))


def q_corpus_pipeline(spark, sf):
    """Training-data pipeline composition: quality filter → exact dedup
    (min doc_id per fingerprint) → per-language token/char stats."""
    from json_to_parquet_spark.functions.text import (fingerprint,
                                                      quality_score,
                                                      token_count)
    d = _t(spark, sf, "documents")
    scored = d.select("doc_id", "lang", "text",
                      quality_score(F.col("text")).alias("q"),
                      fingerprint(F.col("text")).alias("fp"),
                      token_count(F.col("text")).alias("tc"))
    kept = scored.filter(F.col("q") >= 0.5)
    reps = kept.groupBy("fp").agg(F.min("doc_id").alias("doc_id"))
    deduped = kept.join(reps, ["fp", "doc_id"], "inner")
    return (deduped.groupBy("lang")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("tc").alias("total_tokens")))


def q_users_without_orders(spark, sf):
    e = _t(spark, sf, "events").select("user_id").distinct()
    o = _t(spark, sf, "orders").select(F.col("o_custkey").alias("user_id"))
    return e.join(o, "user_id", "left_anti").agg(
        F.count(F.lit(1)).alias("n_users"))


def q_col_stats_lineitem(spark, sf):
    li = _t(spark, sf, "lineitem")
    return li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
        F.min("l_shipdate").alias("min_ship"),
        F.max("l_shipdate").alias("max_ship"),
        F.sum(F.when(F.col("l_discount").isNull(), 1).otherwise(0))
        .alias("null_discounts"))


def q_ann_topk(spark, sf):
    from json_to_parquet_spark.operators.ann import brute_force_topk
    emb = _t(spark, sf, "embeddings")
    qv = emb.filter("vec_id = 0").select("embedding").collect()[0][0]
    top = brute_force_topk(emb, qv, k=5)
    return top.select("vec_id", F.round("cosine", 6).alias("cos6"))


def q_ann_batch_topk(spark, sf):
    from json_to_parquet_spark.operators.ann import batch_topk
    emb = _t(spark, sf, "embeddings")
    queries = (emb.filter("vec_id < 4")
               .select(F.col("vec_id").alias("q_id"),
                       F.col("embedding").alias("q_vec")))
    top = batch_topk(emb, queries, k=3)
    return top.select("q_id", "vec_id", F.round("cosine", 6).alias("cos6"))


def q_minhash_candidates_md5(spark, sf):
    """Banded MinHash-LSH candidates with md5 lane hashes — the
    oracle-checkable twin of q_minhash_candidates (DuckDB reproduces the
    identical shingles, lane minima, band keys, and pair join)."""
    from json_to_parquet_spark.operators.dedup import \
        minhash_lsh_candidates_md5
    return minhash_lsh_candidates_md5(_t(spark, sf, "documents"))


def q_minhash_dedup_dropped_md5(spark, sf):
    """The FULL near-dup-removal pipeline on the md5 lane: LSH
    candidates → exact shingle-Jaccard confirm (≥0.6) → connected
    components → dropped docs with their component representative.
    DuckDB reproduces the components with a recursive CTE, so the
    transitive-chain clustering is value-checkable end-to-end."""
    from json_to_parquet_spark.operators.dedup import minhash_lsh_dedup_md5
    return minhash_lsh_dedup_md5(_t(spark, sf, "documents"), threshold=0.6)


def q_simhash_md5(spark, sf):
    """Per-document 60-bit SimHash from md5 token hashes — validates the
    vectorized bit-majority kernel value-exactly against DuckDB."""
    from json_to_parquet_spark.operators.dedup import simhash_md5
    return simhash_md5(_t(spark, sf, "documents"))


def q_chunk_assignment_md5(spark, sf):
    """Md5-lane twin of the engine-core chunk assignment: per-chunk row
    counts under pmod(md5_lane_hash(doc_id), 7) computed by the REAL
    `with_chunk_id` (hash swapped for the oracle-computable lane) —
    DuckDB reproduces the assignment closed-form, value-checking the
    coalesce/pmod/cast structure that chunk membership, resume, and the
    store layout all hang off."""
    from json_to_parquet_spark.operators.chunking import with_chunk_id
    from json_to_parquet_spark.operators.dedup import md5_lane_hash
    d = _t(spark, sf, "documents")
    chunked = with_chunk_id(
        d, "doc_id", 7,
        hash_fn=lambda c: md5_lane_hash(c.cast("string"), 0))
    return (chunked.groupBy(F.col("__chunk_id").alias("chunk_id"))
            .agg(F.count(F.lit(1)).alias("n_rows")))


def q_hyperplane_bucket_md5(spark, sf):
    """Md5-plane twin of the hyperplane-LSH signature kernel: per-vector
    12-bit bucket under H[d,b] = md5_lane('hp:'||d, b)/2^60 - 0.5 —
    DuckDB recomputes the projection sums and sign-bit packing
    closed-form, value-checking the pandas_udf matmul + packbits
    (endianness, element indexing, sign convention) that every
    hyperplane-LSH operator (embedding_neardup_pairs, ann.lsh_topk)
    hangs off. The production path keeps the seeded gaussian planes."""
    from json_to_parquet_spark.operators.dedup import (
        hyperplane_signature, md5_hyperplane_matrix)
    sig = hyperplane_signature(64, 12, planes=md5_hyperplane_matrix(64, 12))
    return _t(spark, sf, "embeddings").select(
        "vec_id", sig(F.col("embedding")).alias("bucket"))


def q_embedding_neardup(spark, sf):
    from json_to_parquet_spark.operators.dedup import cosine_expr
    emb = _t(spark, sf, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v"))
    a, b = emb.alias("a"), emb.alias("b")
    pairs = (a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
             .select(F.col("a.vec_id").alias("id_a"),
                     F.col("b.vec_id").alias("id_b"),
                     cosine_expr(F.col("a.v"), F.col("b.v")).alias("c")))
    return (pairs.filter(F.col("c") >= 0.8)
            .select("id_a", "id_b", F.round("c", 6).alias("cos6")))


# --------------------------------------------------------------------------
# rows-only queries (no SQL oracle: hash-seeded / pipeline / stubbed ops)


def q_minhash_candidates(spark, sf):
    from json_to_parquet_spark.operators.dedup import minhash_lsh_candidates
    return minhash_lsh_candidates(_t(spark, sf, "documents"))


def q_minhash_dedup_kept(spark, sf):
    from json_to_parquet_spark.operators.dedup import minhash_lsh_dedup
    kept = minhash_lsh_dedup(_t(spark, sf, "documents"), threshold=0.6)
    return kept.agg(F.count(F.lit(1)).alias("n_kept"))


def q_simhash_bands(spark, sf):
    from json_to_parquet_spark.operators.dedup import simhash_neardup_pairs
    return simhash_neardup_pairs(_t(spark, sf, "documents"))


def q_embedding_neardup_lsh(spark, sf):
    from json_to_parquet_spark.operators.dedup import embedding_neardup_pairs
    return embedding_neardup_pairs(_t(spark, sf, "embeddings"),
                                   threshold=0.95)


def q_ann_lsh_topk(spark, sf):
    from json_to_parquet_spark.operators.ann import lsh_topk
    emb = _t(spark, sf, "embeddings")
    qv = emb.filter("vec_id = 0").select("embedding").collect()[0][0]
    return lsh_topk(emb, qv, k=5, max_hamming=4)


def q_ann_ivf_topk(spark, sf):
    from json_to_parquet_spark.operators.ann import ivf_index, ivf_topk
    emb = _t(spark, sf, "embeddings")
    qv = emb.filter("vec_id = 0").select("embedding").collect()[0][0]
    assigned, cents = ivf_index(emb, n_centroids=8)
    return ivf_topk(assigned, cents, qv, k=5, nprobe=3)


def q_codec_selection(spark, sf):
    """Codec auto-selection on the EXACT-stats oracle lane: deterministic
    per-column stats (exact distinct, run count over doc_id order, full
    byte histogram) feed the REAL `choose_codec` decision function; the
    DuckDB twin recomputes the same stats in SQL and replays the same
    decision rules — value-checkable end to end. (The production pass-1
    uses sampled/batched collectors whose outputs depend on partitioning
    and therefore cannot be value-pinned.)"""
    from json_to_parquet_spark.operators.selector import choose_codec
    from json_to_parquet_spark.operators.stats import (exact_byte_histogram,
                                                       exact_column_stats)
    d = _t(spark, sf, "documents")
    cols = [f.name for f in d.schema.fields]
    str_cols = [f.name for f in d.schema.fields
                if f.dataType.simpleString() == "string"]
    stats = exact_column_stats(d, cols, "doc_id")
    per: dict[str, list] = {}
    for r in exact_byte_histogram(d, str_cols).collect():
        per.setdefault(r["column"], []).append(r["cnt"])
    for c, cnts in per.items():
        stats[c]["distinct_bytes"] = len(cnts)
        stats[c]["top_byte_frac"] = max(cnts) / sum(cnts)
    dtypes = {f.name: f.dataType for f in d.schema.fields}
    codecs = {c: choose_codec(stats[c], dtypes[c]) for c in cols}
    return spark.createDataFrame(sorted(codecs.items()),
                                 "column string, codec string")


def q_encode_roundtrip(spark, sf):
    from json_to_parquet_spark.operators.encode import (decode_chunks,
                                                        encode_chunks,
                                                        verify_roundtrip)
    from json_to_parquet_spark.operators.selector import choose_codecs
    from json_to_parquet_spark.operators.stats import collect_stats
    d = _t(spark, sf, "documents")
    codecs = choose_codecs(collect_stats(d), d.schema)
    chunks = encode_chunks(d, "doc_id", codecs, n_chunks=4)
    return verify_roundtrip(d, decode_chunks(chunks, d.schema), "doc_id")


def q_chunk_stats(spark, sf):
    """Pass-1 stats signals on the exact oracle lane: per string column,
    row count, value-change count over doc_id order (the RLE signal),
    total payload bytes, and exact distinct count (the DICT signal) —
    each value-checkable against plain SQL."""
    from json_to_parquet_spark.operators.stats import exact_column_stats
    d = _t(spark, sf, "documents")
    cols = ["lang", "source", "text"]
    stats = exact_column_stats(d, cols, "doc_id")
    rows = [(c, int(stats[c]["rows"]), int(stats[c]["run_count"]),
             int(stats[c]["total_bytes"]), int(stats[c]["distinct"]))
            for c in cols]
    return spark.createDataFrame(
        rows, "column string, n bigint, n_changes bigint, "
              "total_bytes bigint, n_distinct bigint")


def q_media_meta(spark, sf):
    from json_to_parquet_spark.operators.multimodal import (extract_media_meta,
                                                            synth_media)
    media = synth_media(spark, 500)
    return (extract_media_meta(media).groupBy("kind")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum("n_bytes").alias("bytes"),
                 F.max("width").alias("max_w")))


def q_frame_plan(spark, sf):
    from json_to_parquet_spark.operators.multimodal import (frame_sample_plan,
                                                            synth_media)
    return frame_sample_plan(synth_media(spark, 300), every_n=24)


def q_media_meta_md5(spark, sf):
    """Md5-lane twin of q_media_meta: synthetic media metadata derives
    from md5, so the DuckDB oracle recomputes the EXPECTED width/height/
    frame counts closed-form while Spark round-trips them through the
    binary header and the mapInPandas decoder — value-checking the whole
    multimodal plumbing loop."""
    from json_to_parquet_spark.operators.multimodal import (
        extract_media_meta, synth_media_md5)
    media = synth_media_md5(spark, 500)
    return (extract_media_meta(media).groupBy("kind")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum("n_bytes").alias("bytes"),
                 F.max("width").alias("max_w"),
                 F.sum(F.col("n_frames").cast("bigint")).alias("frames")))


def q_frame_plan_md5(spark, sf):
    """Md5-lane twin of q_frame_plan: per-video sampled frame indices,
    oracle-checkable because n_frames is a closed-form md5 function."""
    from json_to_parquet_spark.operators.multimodal import (frame_sample_plan,
                                                            synth_media_md5)
    return frame_sample_plan(synth_media_md5(spark, 300), every_n=24)


def q_webpages_encode_manifest(spark, sf):
    import tempfile

    from json_to_parquet_spark.plans import pipeline
    from json_to_parquet_spark.sources.webpages import synth_webpages
    pages = synth_webpages(spark, 1000, seed=42)
    out = tempfile.mkdtemp(prefix="j2ps_q_")
    pipeline.run_encode(spark, pages, out, n_chunks=3)
    return (spark.read.parquet(f"{out}/manifest")
            .select("chunk_id", "column", "codec", "n_rows", "checksum"))


def _shipped(fn):
    def wrapped(spark, sf):
        _ship_package(spark)
        return fn(spark, sf)
    wrapped.__name__ = fn.__name__
    return wrapped


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        # stats / text analysis (oracle-checked)
        "q_doc_stats": _shipped(q_doc_stats),
        "q_token_stats": _shipped(q_token_stats),
        "q_fingerprint_dupes": _shipped(q_fingerprint_dupes),
        "q_dup_cluster_hist": _shipped(q_dup_cluster_hist),
        "q_ngram_jaccard": _shipped(q_ngram_jaccard),
        "q_lang_id_counts": _shipped(q_lang_id_counts),
        "q_quality_by_source": _shipped(q_quality_by_source),
        # relational coverage (oracle-checked)
        "q_tpch_pricing": _shipped(q_tpch_pricing),
        "q_revenue_by_nation": _shipped(q_revenue_by_nation),
        "q_top_order_per_customer": _shipped(q_top_order_per_customer),
        "q_top_lineitems": _shipped(q_top_lineitems),
        "q_salted_lang_counts": _shipped(q_salted_lang_counts),
        "q_rollup_orders": _shipped(q_rollup_orders),
        "q_pivot_status_counts": _shipped(q_pivot_status_counts),
        "q_events_json": _shipped(q_events_json),
        "q_sessionize_events": _shipped(q_sessionize_events),
        "q_corpus_pipeline": _shipped(q_corpus_pipeline),
        "q_users_without_orders": _shipped(q_users_without_orders),
        "q_col_stats_lineitem": _shipped(q_col_stats_lineitem),
        # similarity (oracle-checked)
        "q_ann_topk": _shipped(q_ann_topk),
        "q_ann_batch_topk": _shipped(q_ann_batch_topk),
        "q_embedding_neardup": _shipped(q_embedding_neardup),
        "q_minhash_candidates_md5": _shipped(q_minhash_candidates_md5),
        "q_minhash_dedup_dropped_md5": _shipped(q_minhash_dedup_dropped_md5),
        "q_simhash_md5": _shipped(q_simhash_md5),
        "q_chunk_assignment_md5": _shipped(q_chunk_assignment_md5),
        "q_hyperplane_bucket_md5": _shipped(q_hyperplane_bucket_md5),
        # rows-only (hash-seeded / pipeline / stubbed)
        "q_minhash_candidates": _shipped(q_minhash_candidates),
        "q_minhash_dedup_kept": _shipped(q_minhash_dedup_kept),
        "q_simhash_bands": _shipped(q_simhash_bands),
        "q_embedding_neardup_lsh": _shipped(q_embedding_neardup_lsh),
        "q_ann_lsh_topk": _shipped(q_ann_lsh_topk),
        "q_ann_ivf_topk": _shipped(q_ann_ivf_topk),
        # oracle-checked since round 3 (exact-stats lane)
        "q_codec_selection": _shipped(q_codec_selection),
        "q_chunk_stats": _shipped(q_chunk_stats),
        "q_encode_roundtrip": _shipped(q_encode_roundtrip),
        "q_media_meta": _shipped(q_media_meta),
        "q_frame_plan": _shipped(q_frame_plan),
        "q_media_meta_md5": _shipped(q_media_meta_md5),
        "q_frame_plan_md5": _shipped(q_frame_plan_md5),
        "q_webpages_encode_manifest": _shipped(q_webpages_encode_manifest),
    }


# --------------------------------------------------------------------------
# DuckDB oracles

_STOP = "the|a|an|and|of|to|in|is|for|on|with|that|as|are|was|by"

_TOKENS = r"len(regexp_split_to_array(trim(text), '\s+'))"

_QUALITY = f"""
  0.35 * (len(regexp_extract_all(text, '[A-Za-z]')) * 1.0 / greatest(length(text), 1))
+ 0.25 * least(len(regexp_extract_all(lower(text), '\\b({_STOP})\\b')) * 1.0
               / greatest({_TOKENS}, 1), 1.0)
+ 0.2 * (1.0 - least((len(regexp_extract_all(text, '[.!?,;:]')) * 1.0
                      / greatest(length(text), 1)) * 5, 1.0))
+ 0.2 * least(greatest({_TOKENS}, 1) / 100.0, 1.0)
"""

_FP = r"md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))))"


def _lane_sql(expr: str, lane: int) -> str:
    """DuckDB twin of dedup.md5_lane_hash: first 15 md5 hex digits."""
    return (f"CAST(('0x' || substring(md5({expr} || ':{lane}'), 1, 15)) "
            f"AS BIGINT)")


def _minhash_cand_ctes(num_hashes: int = 16, bands: int = 4,
                       shingle_k: int = 5) -> str:
    """Shared CTE block: shingles → lane minima → band keys → candidate
    pairs (the DuckDB twin of minhash_lsh_candidates_md5)."""
    r = num_hashes // bands
    k = shingle_k
    mins = ",\n              ".join(
        f"min({_lane_sql('s', i)}) AS m{i}" for i in range(num_hashes))
    band_selects = " UNION ALL ".join(
        "SELECT doc_id, {b} AS band, {key} AS key FROM sig".format(
            b=b, key=" || ',' || ".join(
                f"CAST(m{b * r + j} AS VARCHAR)" for j in range(r)))
        for b in range(bands))
    return f"""sh AS (
          SELECT doc_id, unnest(list_distinct(
                   [substring(text, i, {k})
                    for i in range(1, greatest(length(text) - {k - 1}, 0) + 1)]
                 )) AS s
          FROM documents),
        sig AS (
          SELECT doc_id,
              {mins}
          FROM sh GROUP BY doc_id),
        bands AS ({band_selects}),
        cand AS (
          SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
          FROM bands a JOIN bands b
            ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id)"""


def _minhash_md5_sql(num_hashes: int = 16, bands: int = 4,
                     shingle_k: int = 5) -> str:
    return f"""
        WITH {_minhash_cand_ctes(num_hashes, bands, shingle_k)}
        SELECT id_a, id_b FROM cand"""


def _minhash_dedup_md5_sql(threshold: float = 0.6, num_hashes: int = 16,
                           bands: int = 4, shingle_k: int = 5) -> str:
    """DuckDB twin of minhash_lsh_dedup_md5: candidates → exact
    shingle-Jaccard confirm → min-label connected components via a
    recursive CTE (reach = all (vertex, reachable-vertex) pairs; the
    component representative is the minimum reachable id) → the dropped
    docs. UNION (not UNION ALL) dedups the recursive frontier, so the
    recursion terminates at the transitive closure."""
    k = shingle_k
    return f"""
        WITH RECURSIVE {_minhash_cand_ctes(num_hashes, bands, shingle_k)},
        shl AS (
          SELECT doc_id, list_distinct(
                   [substring(text, i, {k})
                    for i in range(1, greatest(length(text) - {k - 1}, 0) + 1)]
                 ) AS sl
          FROM documents),
        confirmed AS (
          SELECT c.id_a, c.id_b
          FROM cand c
          JOIN shl a ON a.doc_id = c.id_a
          JOIN shl b ON b.doc_id = c.id_b
          WHERE CAST(len(list_intersect(a.sl, b.sl)) AS DOUBLE)
                / len(list_distinct(a.sl || b.sl)) >= {threshold}),
        edges AS (
          SELECT id_a AS s, id_b AS d FROM confirmed
          UNION
          SELECT id_b AS s, id_a AS d FROM confirmed),
        reach AS (
          SELECT s AS id, s AS r FROM edges
          UNION
          SELECT e.d AS id, reach.r AS r
          FROM edges e JOIN reach ON e.s = reach.id)
        SELECT id AS doc_id, min(r) AS component
        FROM reach GROUP BY id HAVING id <> min(r)"""


def _col_stats_cte(c: str, is_str: bool) -> str:
    """Exact per-column stats CTE (twin of stats.exact_column_stats):
    n, non-null, exact distinct, run-change count over doc_id order,
    total utf8 bytes (strings only)."""
    tb = (f"CAST(sum(octet_length(CAST(v AS BLOB))) AS BIGINT) AS tb, "
          if is_str else "CAST(NULL AS BIGINT) AS tb, ")
    return (f"c_{c} AS (SELECT CAST(count(*) AS BIGINT) AS n, "
            f"CAST(count(v) AS BIGINT) AS nn, "
            f"CAST(count(DISTINCT v) AS BIGINT) AS nd, {tb}"
            f"CAST(sum(CASE WHEN v IS DISTINCT FROM pv THEN 1 ELSE 0 END) "
            f"AS BIGINT) AS runs "
            f"FROM (SELECT {c} AS v, lag({c}) OVER (ORDER BY doc_id) AS pv "
            f"FROM documents))")


def _byte_hist_cte(c: str) -> str:
    """Exact byte-histogram CTE (twin of stats.exact_byte_histogram):
    distinct byte values + top-byte frequency fraction of a string
    column's utf8 bytes, via hex-pair unnesting."""
    return (f"b_{c} AS (SELECT CAST(count(*) AS BIGINT) AS db, "
            f"CAST(max(cnt) AS DOUBLE) / sum(cnt) AS tf FROM ("
            f"SELECT byte, count(*) AS cnt FROM ("
            f"SELECT unnest([substring(hex(CAST({c} AS BLOB)), 2*i+1, 2) "
            f"for i in range(octet_length(CAST({c} AS BLOB)))]) AS byte "
            f"FROM documents WHERE {c} IS NOT NULL) GROUP BY byte))")


# faithful SQL replay of selector.choose_codec's decision rules
_CODEC_CASE_STR = (
    "CASE WHEN n * 1.0 / greatest(runs, 1) >= 3.0 THEN 'rle' "
    "WHEN nd <= greatest(CASE WHEN nn > 0 THEN nn ELSE n END, 1) / 4.0 "
    "AND nd <= 1048576 THEN 'dict' "
    "WHEN db <= 248 AND (tf >= 0.02 OR db <= 128) THEN 'fsst' "
    "ELSE 'plain' END")
_CODEC_CASE_INT = (
    "CASE WHEN n * 1.0 / greatest(runs, 1) >= 3.0 THEN 'rle' "
    "WHEN nd <= greatest(CASE WHEN nn > 0 THEN nn ELSE n END, 1) / 8.0 "
    "AND nd <= 65536 THEN 'dict' "
    "ELSE 'for' END")


def _codec_selection_sql() -> str:
    int_cols = ["doc_id", "n_chars"]
    str_cols = ["lang", "source", "text"]
    ctes = ([_col_stats_cte(c, False) for c in int_cols]
            + [_col_stats_cte(c, True) for c in str_cols]
            + [_byte_hist_cte(c) for c in str_cols])
    selects = [f"SELECT '{c}' AS column, {_CODEC_CASE_INT} AS codec "
               f"FROM c_{c}" for c in int_cols]
    selects += [f"SELECT '{c}' AS column, {_CODEC_CASE_STR} AS codec "
                f"FROM c_{c}, b_{c}" for c in str_cols]
    return "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL ".join(selects)


def _chunk_stats_sql() -> str:
    cols = ["lang", "source", "text"]
    ctes = [_col_stats_cte(c, True) for c in cols]
    selects = [f"SELECT '{c}' AS column, n, runs AS n_changes, "
               f"tb AS total_bytes, nd AS n_distinct FROM c_{c}"
               for c in cols]
    return "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL ".join(selects)


def _simhash_md5_sql() -> str:
    bit_sums = ",\n              ".join(
        f"sum((hv >> {j}) & 1) AS s{j}" for j in range(60))
    combine = " + ".join(
        f"(CASE WHEN 2 * s{j} > n THEN CAST({1 << j} AS BIGINT) "
        f"ELSE 0 END)" for j in range(60))
    return f"""
        WITH tok AS (
          SELECT doc_id, unnest(list_distinct(
                   regexp_split_to_array(lower(trim(text)), '\\s+'))) AS t
          FROM documents WHERE length(trim(text)) > 0),
        h AS (SELECT doc_id, {_lane_sql('t', 0)} AS hv FROM tok),
        votes AS (
          SELECT doc_id, CAST(count(*) AS BIGINT) AS n,
              {bit_sums}
          FROM h GROUP BY doc_id)
        SELECT doc_id, CAST({combine} AS BIGINT) AS simhash FROM votes"""


def _media_h_sql(tag: str) -> str:
    """DuckDB twin of multimodal.synth_media_md5's 60-bit md5 lane."""
    return (f"CAST(('0x' || substring(md5(id::VARCHAR || ':{tag}'), 1, 15)) "
            f"AS BIGINT)")


def _media_meta_md5_sql() -> str:
    # n_bytes is structural: 9 magic + 18 header + 256 body bytes = 283
    return f"""
        WITH ids AS (SELECT unnest(generate_series(0, 499)) AS id),
        m AS (SELECT id,
                ['image','audio','video'][({_media_h_sql('k')} % 3) + 1]
                  AS kind,
                ({_media_h_sql('w')} % 1920) + 8 AS w,
                ({_media_h_sql('f')} % 240) + 1 AS nf
              FROM ids)
        SELECT kind, CAST(count(*) AS BIGINT) AS n,
               CAST(count(*) * 283 AS BIGINT) AS bytes,
               CAST(max(w) AS INTEGER) AS max_w,
               CAST(sum(nf) AS BIGINT) AS frames
        FROM m GROUP BY kind"""


def _frame_plan_md5_sql() -> str:
    return f"""
        WITH ids AS (SELECT unnest(generate_series(0, 299)) AS id),
        m AS (SELECT id AS media_id,
                {_media_h_sql('k')} % 3 AS kr,
                ({_media_h_sql('f')} % 240) + 1 AS nf
              FROM ids)
        SELECT media_id,
               CAST(unnest(generate_series(0, nf - 1, 24)) AS INTEGER)
                 AS frame_idx
        FROM m WHERE kr = 2"""


def oracle_sql() -> dict[str, str]:
    return {
        "q_doc_stats": """
            SELECT lang,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(n_chars) AS BIGINT) AS total_chars,
                   CAST(min(n_chars) AS BIGINT) AS min_chars,
                   CAST(max(n_chars) AS BIGINT) AS max_chars,
                   CAST(count(DISTINCT source) AS BIGINT) AS n_sources
            FROM documents GROUP BY lang""",
        "q_token_stats": f"""
            SELECT lang,
                   CAST(sum(tc) AS BIGINT) AS total_tokens,
                   CAST(max(tc) AS BIGINT) AS max_tokens,
                   CAST(min(tc) AS BIGINT) AS min_tokens
            FROM (SELECT lang,
                         CASE WHEN length(trim(text)) = 0 THEN 0
                              ELSE {_TOKENS} END AS tc
                  FROM documents) GROUP BY lang""",
        "q_fingerprint_dupes": f"""
            SELECT CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(count(DISTINCT {_FP}) AS BIGINT) AS n_unique
            FROM documents""",
        "q_dup_cluster_hist": f"""
            SELECT n_docs, CAST(count(*) AS BIGINT) AS n_clusters
            FROM (SELECT {_FP} AS fp, CAST(count(*) AS BIGINT) AS n_docs
                  FROM documents GROUP BY fp)
            GROUP BY n_docs""",
        "q_ngram_jaccard": r"""
            WITH s AS (
              SELECT doc_id, lang,
                     list_distinct(regexp_split_to_array(lower(trim(text)),
                                                         '\s+')) AS sh
              FROM documents)
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   round(len(list_intersect(a.sh, b.sh)) * 1.0
                         / len(list_distinct(list_concat(a.sh, b.sh))), 4)
                     AS jac4
            FROM s a JOIN s b
              ON a.doc_id < b.doc_id AND a.lang = b.lang
            WHERE len(list_intersect(a.sh, b.sh)) * 1.0
                  / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.5""",
        "q_lang_id_counts": r"""
            WITH g AS (
              SELECT CASE
                WHEN len(regexp_extract_all(text, '[\p{Hiragana}\p{Katakana}]')) * 1.0
                     / greatest(length(text), 1) > 0.05 THEN 'ja'
                WHEN len(regexp_extract_all(text, '\p{Han}')) * 1.0
                     / greatest(length(text), 1) > 0.15 THEN 'zh'
                WHEN len(regexp_extract_all(text, '\p{Hangul}')) * 1.0
                     / greatest(length(text), 1) > 0.15 THEN 'ko'
                WHEN len(regexp_extract_all(text, '\p{Cyrillic}')) * 1.0
                     / greatest(length(text), 1) > 0.25 THEN 'ru'
                WHEN len(regexp_extract_all(text, '\p{Arabic}')) * 1.0
                     / greatest(length(text), 1) > 0.25 THEN 'ar'
                WHEN len(regexp_extract_all(text, '\p{Greek}')) * 1.0
                     / greatest(length(text), 1) > 0.25 THEN 'el'
                WHEN len(regexp_extract_all(text, '\p{Hebrew}')) * 1.0
                     / greatest(length(text), 1) > 0.25 THEN 'he'
                WHEN len(regexp_extract_all(text, '\p{Thai}')) * 1.0
                     / greatest(length(text), 1) > 0.25 THEN 'th'
                WHEN len(regexp_extract_all(text, '\p{Latin}')) * 1.0
                     / greatest(length(text), 1) > 0.3 THEN 'latin'
                ELSE 'unknown' END AS lang_guess
              FROM documents)
            SELECT lang_guess, CAST(count(*) AS BIGINT) AS n
            FROM g GROUP BY lang_guess""",
        "q_quality_by_source": f"""
            SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(q4) AS BIGINT) AS quality_sum
            FROM (SELECT source, floor(({_QUALITY}) * 10000) AS q4
                  FROM documents)
            GROUP BY source""",
        "q_tpch_pricing": """
            SELECT l_returnflag, l_linestatus,
                   CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) * 100 AS BIGINT) AS sum_qty,
                   CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS sum_price,
                   CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2))) AS DECIMAL(28,4)) * 10000 AS BIGINT) AS sum_disc_price,
                   CAST(count(*) AS BIGINT) AS count_order
            FROM lineitem GROUP BY l_returnflag, l_linestatus""",
        "q_revenue_by_nation": """
            SELECT n_name,
                   CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS revenue,
                   CAST(count(*) AS BIGINT) AS n_orders
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            GROUP BY n_name""",
        "q_top_order_per_customer": """
            SELECT o_custkey, o_orderkey, o_totalprice FROM (
              SELECT o_custkey, o_orderkey, o_totalprice,
                     row_number() OVER (PARTITION BY o_custkey
                                        ORDER BY o_totalprice DESC,
                                                 o_orderkey ASC) AS rn
              FROM orders) WHERE rn = 1""",
        "q_top_lineitems": """
            SELECT l_orderkey, l_linenumber, l_extendedprice
            FROM lineitem
            ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC
            LIMIT 10""",
        "q_salted_lang_counts": """
            SELECT lang, CAST(count(*) AS BIGINT) AS cnt
            FROM documents GROUP BY lang""",
        "q_rollup_orders": """
            SELECT o_orderpriority, o_orderstatus,
                   CAST(count(*) AS BIGINT) AS n_orders,
                   CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100
                        AS BIGINT) AS total
            FROM orders
            GROUP BY ROLLUP (o_orderpriority, o_orderstatus)""",
        "q_pivot_status_counts": """
            SELECT o_orderpriority,
                   CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_open,
                   CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_filled,
                   CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_pending
            FROM orders GROUP BY o_orderpriority""",
        "q_events_json": """
            SELECT event_type,
                   CAST(sum(k) AS BIGINT) AS k_sum,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(min(k) AS BIGINT) AS k_min,
                   CAST(max(k) AS BIGINT) AS k_max
            FROM (SELECT event_type,
                         CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
                  FROM events)
            GROUP BY event_type""",
        "q_sessionize_events": """
            WITH g AS (
              SELECT user_id, event_id,
                     CAST(floor(epoch(ts)) AS BIGINT) AS tsec,
                     lag(CAST(floor(epoch(ts)) AS BIGINT)) OVER (
                        PARTITION BY user_id ORDER BY ts, event_id) AS prev
              FROM events)
            SELECT user_id,
                   CAST(sum(CASE WHEN prev IS NULL OR tsec - prev > 1800
                                 THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions,
                   CAST(count(*) AS BIGINT) AS n_events
            FROM g GROUP BY user_id""",
        "q_corpus_pipeline": f"""
            WITH scored AS (
              SELECT doc_id, lang, ({_QUALITY}) AS q, {_FP} AS fp,
                     CASE WHEN length(trim(text)) = 0 THEN 0
                          ELSE {_TOKENS} END AS tc
              FROM documents),
            kept AS (SELECT * FROM scored WHERE q >= 0.5),
            reps AS (SELECT fp, min(doc_id) AS doc_id FROM kept GROUP BY fp)
            SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(tc) AS BIGINT) AS total_tokens
            FROM kept JOIN reps USING (fp, doc_id)
            GROUP BY lang""",
        "q_users_without_orders": """
            SELECT CAST(count(*) AS BIGINT) AS n_users
            FROM (SELECT DISTINCT user_id FROM events) e
            WHERE NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_custkey = e.user_id)""",
        "q_col_stats_lineitem": """
            SELECT CAST(count(*) AS BIGINT) AS n_rows,
                   CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders,
                   min(l_quantity) AS min_qty,
                   max(l_quantity) AS max_qty,
                   min(l_shipdate) AS min_ship,
                   max(l_shipdate) AS max_ship,
                   CAST(sum(CASE WHEN l_discount IS NULL THEN 1 ELSE 0 END)
                        AS BIGINT) AS null_discounts
            FROM lineitem""",
        "q_ann_topk": """
            WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv
                       FROM embeddings WHERE vec_id = 0),
            scored AS (
              SELECT e.vec_id,
                     list_inner_product(CAST(e.embedding AS DOUBLE[]), q.qv)
                     / (sqrt(list_inner_product(CAST(e.embedding AS DOUBLE[]),
                                                CAST(e.embedding AS DOUBLE[])))
                        * sqrt(list_inner_product(q.qv, q.qv))) AS c
              FROM embeddings e, q)
            SELECT vec_id, round(c, 6) AS cos6
            FROM scored ORDER BY c DESC, vec_id ASC LIMIT 5""",
        "q_ann_batch_topk": """
            WITH q AS (SELECT vec_id AS q_id,
                              CAST(embedding AS DOUBLE[]) AS qv
                       FROM embeddings WHERE vec_id < 4),
            scored AS (
              SELECT q.q_id, e.vec_id,
                     list_inner_product(CAST(e.embedding AS DOUBLE[]), q.qv)
                     / (sqrt(list_inner_product(CAST(e.embedding AS DOUBLE[]),
                                                CAST(e.embedding AS DOUBLE[])))
                        * sqrt(list_inner_product(q.qv, q.qv))) AS c
              FROM embeddings e, q),
            ranked AS (
              SELECT q_id, vec_id, c,
                     row_number() OVER (PARTITION BY q_id
                                        ORDER BY c DESC, vec_id ASC) AS rn
              FROM scored)
            SELECT q_id, vec_id, round(c, 6) AS cos6
            FROM ranked WHERE rn <= 3""",
        "q_minhash_candidates_md5": _minhash_md5_sql(),
        "q_minhash_dedup_dropped_md5": _minhash_dedup_md5_sql(),
        "q_simhash_md5": _simhash_md5_sql(),
        "q_chunk_assignment_md5": f"""
            SELECT CAST(h % 7 AS INTEGER) AS chunk_id,
                   CAST(count(*) AS BIGINT) AS n_rows
            FROM (SELECT {_lane_sql('doc_id::VARCHAR', 0)} AS h
                  FROM documents)
            GROUP BY 1""",
        "q_hyperplane_bucket_md5": """
            WITH planes AS (
              SELECT d.d, b.b,
                     CAST(('0x' || substring(md5('hp:' || d.d || ':' || b.b),
                                             1, 15))
                          AS BIGINT) / 1152921504606846976.0 - 0.5 AS h
              FROM range(64) d(d), range(12) b(b)),
            v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ev
                  FROM embeddings),
            proj AS (
              SELECT v.vec_id, p.b, sum(v.ev[p.d + 1] * p.h) AS s
              FROM v, planes p GROUP BY v.vec_id, p.b)
            SELECT vec_id,
                   CAST(sum(CASE WHEN s > 0
                                 THEN (CAST(1 AS BIGINT) << b)
                                 ELSE 0 END) AS BIGINT) AS bucket
            FROM proj GROUP BY vec_id""",
        "q_chunk_stats": _chunk_stats_sql(),
        "q_codec_selection": _codec_selection_sql(),
        "q_media_meta_md5": _media_meta_md5_sql(),
        "q_frame_plan_md5": _frame_plan_md5_sql(),
        "q_embedding_neardup": """
            WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ev
                       FROM embeddings)
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   round(list_inner_product(a.ev, b.ev)
                         / (sqrt(list_inner_product(a.ev, a.ev))
                            * sqrt(list_inner_product(b.ev, b.ev))), 6) AS cos6
            FROM v a JOIN v b ON a.vec_id < b.vec_id
            WHERE list_inner_product(a.ev, b.ev)
                  / (sqrt(list_inner_product(a.ev, a.ev))
                     * sqrt(list_inner_product(b.ev, b.ev))) >= 0.8""",
    }
