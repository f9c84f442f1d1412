"""Physical-plan hygiene (SURVEY §4.2): predicate pushdown, column
pruning, broadcast joins, whole-stage codegen, and shuffle counts —
asserted on .explain output so regressions in plan shape fail CI."""

import contextlib
import io

import pyspark.sql.functions as F

SF = "/root/testdata/sf0.01"


def plan_of(df, mode="formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def test_filter_pushdown_and_pruning(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    q = (li.filter(F.col("l_quantity") > 45)
           .select("l_orderkey", "l_quantity"))
    plan = plan_of(q)
    assert "PushedFilters: [" in plan and "l_quantity" in plan.split(
        "PushedFilters")[1][:200]
    # projection pruned to the two referenced columns at the scan
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_orderkey" in read_schema and "l_quantity" in read_schema
    assert "l_extendedprice" not in read_schema


def test_broadcast_join_for_small_dim(spark):
    import __spark_entry__ as e
    plan = plan_of(e.q_revenue_by_nation(spark, SF))
    assert "BroadcastHashJoin" in plan


def test_whole_stage_codegen_aggregation(spark):
    import __spark_entry__ as e
    df = e.q_tpch_pricing(spark, SF)
    plan = plan_of(df, mode="simple")
    assert plan.count("HashAggregate") >= 2  # partial + final
    codegen = plan_of(df, mode="codegen")
    assert "WholeStageCodegen" in codegen


def test_encode_plan_single_shuffle(spark):
    """The encode pipeline must shuffle exactly once (the chunk-id hash
    partition) — no hidden extra exchange."""
    from json_to_parquet_spark.operators.encode import encode_chunks
    from json_to_parquet_spark.sources.webpages import synth_webpages
    pages = synth_webpages(spark, 1000, partitions=8)
    chunks = encode_chunks(pages, "url", {"text": "fsst"}, n_chunks=4)
    plan = plan_of(chunks, mode="simple")
    assert plan.count("Exchange") == 1, plan
    # the one exchange is the explicit chunk-width repartition (pinned to
    # ~1 chunk/task; REPARTITION_BY_NUM so AQE cannot re-lump it) and the
    # groupBy reuses it rather than adding its own
    assert "REPARTITION_BY_NUM" in plan, plan
    one = encode_chunks(synth_webpages(spark, 200, partitions=1), "url",
                        {"text": "plain"}, n_chunks=2)
    assert plan_of(one, mode="simple").count("Exchange") == 1


def test_decode_plan_shuffle_free(spark, tmp_path):
    """read_encoded must decode the chunk store with ZERO Exchange: the
    store is laid out one file per chunk, so the mapInArrow decode groups
    rows in-task — at 100 TB the old groupBy path re-shuffled every
    encoded payload byte just to read the table back."""
    from json_to_parquet_spark.plans import pipeline
    from json_to_parquet_spark.sources.webpages import synth_webpages
    pages = synth_webpages(spark, 800, partitions=4)
    out = str(tmp_path / "store")
    pipeline.run_encode(spark, pages, out, n_chunks=3)
    decoded = pipeline.read_encoded(spark, out)
    plan = plan_of(decoded, mode="simple")
    assert "Exchange" not in plan, plan
    assert decoded.count() == 800
    # zone-map pruned read: exchanges may only touch the tiny manifest id
    # set (the distinct beneath the BroadcastExchange) — never payload
    # rows, so every Exchange line must sit BELOW the BroadcastExchange
    # in the plan tree (the payload scan feeds MapInArrow directly)
    pruned = pipeline.read_encoded(spark, out, columns=["lang"],
                                   where=("lang", "aa", "zz"))
    plan2 = plan_of(pruned, mode="simple")
    lines = plan2.splitlines()
    bcast_at = next(i for i, ln in enumerate(lines)
                    if "BroadcastExchange" in ln)
    for i, ln in enumerate(lines):
        if "Exchange" in ln and "BroadcastExchange" not in ln:
            assert i > bcast_at, plan2  # manifest-side subtree only


def test_decode_map_detects_straddled_chunk(spark):
    """A chunk whose column rows straddle scan partitions must FAIL with
    instructions (shuffle=True), never decode wrongly."""
    import pytest
    from json_to_parquet_spark.operators.encode import (decode_chunks,
                                                        encode_chunks)
    from json_to_parquet_spark.sources.webpages import synth_webpages
    pages = synth_webpages(spark, 300, partitions=2)
    chunks = encode_chunks(pages, "url", {"text": "plain"}, n_chunks=2)
    # repartition WITHOUT the chunk key: rows of one chunk now spread
    # over several partitions — the map-path decode must refuse
    straddled = chunks.repartition(6)
    with pytest.raises(Exception, match="straddle|shuffle=True"):
        decode_chunks(straddled, pages.schema).count()
    # the documented fallback handles exactly this shape
    assert decode_chunks(straddled, pages.schema, shuffle=True).count() == 300


def test_embedding_neardup_single_scan(spark):
    """embedding_neardup_pairs must read the embeddings table ONCE: the
    old bucket self-join expanded into two subtrees that each recomputed
    the hyperplane pandas_udf and the scan."""
    from json_to_parquet_spark.operators.dedup import embedding_neardup_pairs
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    plan = plan_of(embedding_neardup_pairs(emb), mode="simple")
    assert plan.count("Scan parquet") == 1, plan
    assert plan.count("ArrowEvalPython") == 1, plan  # hyperplane udf once


def test_read_encoded_auto_fallback_multi_rowgroup(spark, tmp_path):
    """A chunk store containing a splittable multi-row-group chunk file
    (foreign writer / JVM block-size overflow) must decode correctly via
    the auto-detected shuffle path instead of failing mid-read with
    instructions; shuffle=False opts out of the detection walk and keeps
    the zero-Exchange map path."""
    import pyarrow.parquet as pq

    from json_to_parquet_spark.plans import pipeline
    from json_to_parquet_spark.sources.webpages import synth_webpages
    pages = synth_webpages(spark, 500, partitions=4)
    out = str(tmp_path / "store")
    pipeline.run_encode(spark, pages, out, n_chunks=3)
    # the direct writer records its one-row-group-per-file invariant
    import json
    with open(out + "/table_meta.json") as fh:
        meta = json.load(fh)
    assert meta["single_row_group"] is True
    # rewrite one chunk file one-row-group-PER-ROW (foreign-writer shape);
    # a foreign rewriter does not carry the engine's write invariant
    f = out + "/chunks/chunk_id=1/part-00000.parquet"
    pq.write_table(pq.read_table(f), f, row_group_size=1,
                   compression="none")
    del meta["single_row_group"]
    with open(out + "/table_meta.json", "w") as fh:
        json.dump(meta, fh)
    meta = pq.ParquetFile(f).metadata
    assert meta.num_row_groups > 1
    import os
    old_mpb = spark.conf.get("spark.sql.files.maxPartitionBytes")
    old_open = spark.conf.get("spark.sql.files.openCostInBytes")
    try:
        # force Spark to split the rewritten file across scan partitions
        spark.conf.set("spark.sql.files.maxPartitionBytes", "8192")
        spark.conf.set("spark.sql.files.openCostInBytes", "0")
        assert os.path.getsize(f) > 8192  # genuinely splittable
        decoded = pipeline.read_encoded(spark, out)
        assert "Exchange" in plan_of(decoded, mode="simple")  # auto-shuffle
        assert decoded.count() == 500
        # explicit opt-out (caller asserts single-row-group store) keeps
        # the zero-Exchange map plan
        fast = pipeline.read_encoded(spark, out, shuffle=False)
        assert "Exchange" not in plan_of(fast, mode="simple")
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old_mpb)
        spark.conf.set("spark.sql.files.openCostInBytes", old_open)


def test_topk_uses_partial_limit(spark):
    """orderBy().limit(k) must plan TakeOrderedAndProject, not a full
    global sort."""
    import __spark_entry__ as e
    plan = plan_of(e.q_top_lineitems(spark, SF), mode="simple")
    assert "TakeOrderedAndProject" in plan


def test_minhash_partial_aggregation(spark):
    """MinHash signature aggregation must do map-side partial aggregation
    (shuffle carries per-doc partials, not exploded shingles)."""
    from json_to_parquet_spark.operators.dedup import minhash_signatures
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = plan_of(minhash_signatures(docs), mode="simple")
    first_agg = plan.rindex("HashAggregate")  # bottom-most = map side
    assert "partial_min" in plan[first_agg:first_agg + 4000] or \
        plan.count("HashAggregate") >= 2


def test_perfect_shuffle_salts_bijection():
    """salts[cid] must land chunk cid in partition cid of an n-partition
    HashPartitioning — checked against a pure-python Murmur3 that the
    Spark-parity test below pins to the real hash()."""
    from json_to_parquet_spark.operators.chunking import (
        _murmur3_int32, perfect_shuffle_salts)
    for n in (1, 2, 7, 64, 256, 1024):
        salts = perfect_shuffle_salts(n)
        assert sorted(_murmur3_int32(v) % n for v in salts) == list(range(n))


def test_murmur3_matches_spark_hash(spark):
    from json_to_parquet_spark.operators.chunking import _murmur3_int32
    rows = (spark.range(0, 200, 7)
            .select(F.col("id").cast("int").alias("i"),
                    F.hash(F.col("id").cast("int")).alias("h")).collect())
    assert all(_murmur3_int32(r.i) == r.h for r in rows)


def test_encode_one_chunk_per_task(spark):
    """With the perfect-salt shuffle column, every encode task holds
    EXACTLY one chunk: n_chunks tasks, no empties, no 2-chunk stragglers
    (balls-in-bins would leave ~37% empty). Asserted by counting rows per
    output partition of the single-exchange plan."""
    from json_to_parquet_spark.operators.encode import encode_chunks
    from json_to_parquet_spark.sources.webpages import synth_webpages
    pages = synth_webpages(spark, 4000, partitions=8)
    chunks = encode_chunks(pages, "url", {"text": "plain"}, n_chunks=16)
    sizes = (chunks.select(F.spark_partition_id().alias("p"), "chunk_id")
             .groupBy("p").agg(F.countDistinct("chunk_id").alias("k"))
             .collect())
    assert len(sizes) == 16 and all(r.k == 1 for r in sizes)


def test_encode_jvm_presort_one_sort_bit_identical(spark, monkeypatch):
    """The chunk-local row permutation rides the JVM group sort: the plan
    has exactly ONE Sort (sortWithinPartitions satisfies applyInArrow's
    required ordering — no Catalyst re-sort that could scramble rows) and
    ONE Exchange, and payload checksums are byte-identical to the
    worker-side pyarrow sort path (null ordering included)."""
    import os

    from json_to_parquet_spark.operators.encode import encode_chunks
    from json_to_parquet_spark.sources.webpages import synth_webpages
    df = synth_webpages(spark, 6000, seed=11)
    codecs = {"url": "fsst", "lang": "dict", "warc_ts": "for"}
    chunks = encode_chunks(df, "url", codecs, n_chunks=5)
    plan = chunks._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Sort ") == 1 and plan.count("Exchange") == 1
    a = {(r.chunk_id, r.column): r.checksum for r in chunks.collect()}
    monkeypatch.setenv("SPARK_GRAFT_PYSORT", "1")
    b = {(r.chunk_id, r.column): r.checksum
         for r in encode_chunks(df, "url", codecs, n_chunks=5).collect()}
    assert a == b and len(a) == 25
