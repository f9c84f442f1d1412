"""Querying the encoded chunk store: selective column decode and
zone-map chunk pruning (the columnar payoffs of the format)."""

import pyspark.sql.functions as F
import pytest

from json_to_parquet_spark.plans import pipeline


@pytest.fixture(scope="module")
def store(spark, pages, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("store") / "enc")
    pipeline.run_encode(spark, pages, out, n_chunks=8)
    return out


def test_selective_column_decode(spark, pages, store):
    two = pipeline.read_encoded(spark, store, columns=["url", "lang"])
    assert two.columns == ["url", "lang"]
    assert two.count() == 2000
    got = {r.lang: r.cnt for r in
           two.groupBy("lang").agg(F.count("*").alias("cnt")).collect()}
    want = {r.lang: r.cnt for r in
            pages.groupBy("lang").agg(F.count("*").alias("cnt")).collect()}
    assert got == want


def test_zone_map_pruning_numeric(spark, tmp_path):
    """Range predicate on a numeric column must prune chunks via the
    manifest zone map and still return exactly the right rows."""
    df = spark.range(0, 20000).select(
        F.concat(F.lit("k"), F.col("id").cast("string")).alias("k"),
        F.col("id").alias("v"),
        (F.col("id") * 2).alias("w"))
    out = str(tmp_path / "enc")
    pipeline.run_encode(spark, df, out, key="k", n_chunks=10)
    lo, hi = 5000, 5999
    got = pipeline.read_encoded(spark, out, where=("v", lo, hi))
    rows = got.select("v").collect()
    assert sorted(r.v for r in rows) == list(range(lo, hi + 1))


def test_zone_map_prunes_chunk_count(spark, tmp_path):
    """With a key aligned to the predicate column, pruning must actually
    skip most chunks (not just filter rows post-decode)."""
    df = spark.range(0, 20000).select(
        F.lpad(F.col("id").cast("string"), 8, "0").alias("k"),
        F.col("id").alias("v"))
    out = str(tmp_path / "enc2")
    # chunk id from xxhash is content-uniform → zone maps of v are wide;
    # use the manifest to measure what survives for a narrow range anyway
    pipeline.run_encode(spark, df, out, n_chunks=16, key="k")
    m = spark.read.parquet(out + "/manifest").filter("column = 'v'")
    total = m.select("chunk_id").distinct().count()
    live = m.filter((F.col("max_val").cast("double") >= 0)
                    & (F.col("min_val").cast("double") <= 10)).count()
    assert total == 16
    # hash chunking spreads values, but per-chunk minima still prune a
    # narrow v<=10 predicate to the chunks whose min is small enough
    assert 1 <= live < total
    # and the predicate path returns exactly the right rows
    got = pipeline.read_encoded(spark, out, where=("v", None, 10))
    assert got.count() == 11


def test_zone_map_keeps_chunks_missing_from_manifest(spark, tmp_path):
    """Crash window: a chunk present in the store but absent from the
    manifest (store write succeeded, manifest append did not) must be
    KEPT by zone-map pruning, not silently dropped."""
    df = spark.range(0, 5000).select(
        F.concat(F.lit("k"), F.col("id").cast("string")).alias("k"),
        F.col("id").alias("v"))
    out = str(tmp_path / "enc")
    pipeline.run_encode(spark, df, out, key="k", n_chunks=6)
    # simulate the crash window: drop manifest rows for half the chunks
    m = spark.read.parquet(out + "/manifest")
    kept_manifest = m.filter(F.col("chunk_id") < 3)
    kept_manifest.write.mode("overwrite").parquet(str(tmp_path / "m2"))
    import shutil
    shutil.rmtree(out + "/manifest")
    shutil.move(str(tmp_path / "m2"), out + "/manifest")
    got = pipeline.read_encoded(spark, out, where=("v", 100, 4900))
    assert got.count() == 4801  # nothing lost from manifest-less chunks


def test_zone_map_null_bounds_kept(spark, tmp_path):
    """Chunks whose min/max are NULL (e.g. all-null values in the chunk /
    min-max failure) must be kept: NULL bounds prove nothing."""
    df = spark.range(0, 4000).select(
        F.concat(F.lit("k"), F.col("id").cast("string")).alias("k"),
        F.col("id").alias("v"))
    out = str(tmp_path / "enc_nb")
    pipeline.run_encode(spark, df, out, key="k", n_chunks=4)
    # null out the bounds of every manifest row for v
    m = spark.read.parquet(out + "/manifest")
    nulled = m.withColumn(
        "min_val", F.when(F.col("column") == "v",
                          F.lit(None).cast("string"))
        .otherwise(F.col("min_val"))).withColumn(
        "max_val", F.when(F.col("column") == "v",
                          F.lit(None).cast("string"))
        .otherwise(F.col("max_val")))
    nulled.write.mode("overwrite").parquet(str(tmp_path / "m3"))
    import shutil
    shutil.rmtree(out + "/manifest")
    shutil.move(str(tmp_path / "m3"), out + "/manifest")
    got = pipeline.read_encoded(spark, out, where=("v", 10, 20))
    assert got.count() == 11


def test_zone_map_int64_beyond_double_precision(spark, tmp_path):
    """int64 bounds above 2^53 must compare exactly (bigint, not double)."""
    base = 1 << 60
    df = spark.range(0, 3000).select(
        F.concat(F.lit("k"), F.col("id").cast("string")).alias("k"),
        (F.col("id") + F.lit(base)).alias("v"))
    out = str(tmp_path / "enc_big")
    pipeline.run_encode(spark, df, out, key="k", n_chunks=4)
    got = pipeline.read_encoded(spark, out, where=("v", base + 7, base + 9))
    assert sorted(r.v for r in got.select("v").collect()) == [
        base + 7, base + 8, base + 9]


def test_fresh_run_cleans_stale_layout(spark, tmp_path):
    """resume=False over a used out_dir must not leak ghost rows from an
    older (different n_chunks) layout or keep appending to the old
    manifest."""
    df = spark.range(0, 3000).select(
        F.concat(F.lit("k"), F.col("id").cast("string")).alias("k"),
        F.col("id").alias("v"))
    out = str(tmp_path / "enc_fresh")
    pipeline.run_encode(spark, df, out, key="k", n_chunks=9)
    smaller = df.filter(F.col("v") < 1000)
    pipeline.run_encode(spark, smaller, out, key="k", n_chunks=3,
                        resume=False)
    got = pipeline.read_encoded(spark, out)
    assert got.count() == 1000  # no ghost rows from the 9-chunk layout
    m = spark.read.parquet(out + "/manifest")
    assert m.select("chunk_id").distinct().count() == 3


def test_resume_filter_scales_to_many_chunks(spark, tmp_path):
    """Resume filtering is a broadcast anti-join, not an isin literal
    list: with 50k completed chunks the plan must stay small and the run
    must complete."""
    import json
    import os
    df = spark.range(0, 500).select(
        F.concat(F.lit("k"), F.col("id").cast("string")).alias("k"),
        F.col("id").alias("v"))
    out = str(tmp_path / "enc_many")
    n_chunks = 60_000
    # seed a manifest claiming 50k chunks complete (both columns present)
    fake = spark.range(0, 50_000).selectExpr(
        "cast(id as int) as chunk_id").crossJoin(
        spark.createDataFrame([("k",), ("v",)], "column string"))
    fake = fake.select(
        "chunk_id", "column", F.lit("plain").alias("codec"),
        F.lit(0).cast("long").alias("n_rows"),
        F.lit(0).cast("long").alias("raw_bytes"),
        F.lit(0).cast("long").alias("enc_bytes"),
        F.lit("x").alias("checksum"), F.lit(0.0).alias("wall_ms"),
        F.lit(None).cast("string").alias("min_val"),
        F.lit(None).cast("string").alias("max_val"),
        F.lit("seed").alias("run_id"), F.lit("ok").alias("status"))
    os.makedirs(out, exist_ok=True)
    fake.coalesce(4).write.mode("overwrite").parquet(out + "/manifest")
    with open(out + "/table_meta.json", "w") as fh:
        json.dump({"schema": df.schema.json(), "key": "k",
                   "n_chunks": n_chunks, "codecs": {"k": "plain", "v": "for"},
                   "codec_plan": {"k": {"codec": "plain"},
                                  "v": {"codec": "for"}},
                   "sort_order": ["k"]}, fh)
    m = pipeline.run_encode(spark, df, out, key="k", n_chunks=n_chunks)
    assert m["chunks_skipped"] == 50_000
    # only rows hashing OUTSIDE the 50k "done" chunks were encoded
    from json_to_parquet_spark.operators.chunking import with_chunk_id
    expect = with_chunk_id(df, "k", n_chunks) \
        .filter(F.col("__chunk_id") >= 50_000).count()
    assert m["rows"] == expect


def test_skip_store_write_marks_manifest_skipped(spark, tmp_path,
                                                 monkeypatch):
    """The SPARK_GRAFT_SKIP_STORE_WRITE perf-isolation hook suppresses
    chunk-file writes; its manifest rows must carry status='skipped' (not
    'ok'), and a later real run must NOT treat the hollow chunks as
    complete (ADVICE r3)."""
    df = spark.range(0, 3000).select(
        F.concat(F.lit("k"), F.col("id").cast("string")).alias("k"),
        F.col("id").alias("v"))
    out = str(tmp_path / "enc")
    monkeypatch.setenv("SPARK_GRAFT_SKIP_STORE_WRITE", "1")
    pipeline.run_encode(spark, df, out, key="k", n_chunks=4)
    man = spark.read.parquet(out + "/manifest")
    assert man.filter(F.col("status") != "skipped").count() == 0
    import glob
    assert glob.glob(out + "/chunks/chunk_id=*/*.parquet") == []
    monkeypatch.delenv("SPARK_GRAFT_SKIP_STORE_WRITE")
    # resumed REAL run: skipped chunks don't count as done → full encode
    m = pipeline.run_encode(spark, df, out, key="k", n_chunks=4)
    assert m["chunks_skipped"] == 0 and m["chunks_encoded"] == 4
    assert pipeline.read_encoded(spark, out).count() == 3000


def test_direct_store_guard_non_local_master(spark, tmp_path):
    """direct_store=True without a provably-shared store filesystem
    (non-local master, no store_is_shared attestation) must raise instead
    of silently scattering chunk files across executor-local disks
    (ADVICE r3 medium)."""
    import pytest as _pytest

    df = spark.range(0, 10).select(
        F.concat(F.lit("k"), F.col("id").cast("string")).alias("k"))

    class _FakeSC:
        master = "spark://cluster:7077"

    class _FakeSpark:
        sparkContext = _FakeSC()

    with _pytest.raises(ValueError, match="store_is_shared"):
        pipeline.run_encode(_FakeSpark(), df, str(tmp_path / "x"),
                            key="k", direct_store=True)
    # attested shared mount on the same fake master resolves to the
    # direct path without raising at the guard (local spark does the run)
    m = pipeline.run_encode(spark, df, str(tmp_path / "y"), key="k",
                            n_chunks=2, direct_store=True,
                            store_is_shared=True)
    assert m["chunks_encoded"] == 2
