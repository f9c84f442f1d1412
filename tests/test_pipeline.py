"""End-to-end pipeline tests: stats → selection → encode → decode →
bit-identity verify, plus resume-from-manifest semantics (SURVEY §5.2)."""

import pyspark.sql.functions as F
import pytest

from json_to_parquet_spark.operators.encode import (decode_chunks,
                                                    encode_chunks,
                                                    verify_roundtrip)
from json_to_parquet_spark.operators.selector import choose_codecs
from json_to_parquet_spark.operators.stats import collect_stats
from json_to_parquet_spark.plans import pipeline


def fingerprint(df):
    cols = [f.name for f in df.schema.fields]
    return df.select(F.expr(
        f"bit_xor(xxhash64({', '.join(cols)}))").alias("h")).collect()[0].h


def test_webpages_deterministic(spark, pages):
    from json_to_parquet_spark.sources.webpages import synth_webpages
    again = synth_webpages(spark, 2000, seed=42)
    assert fingerprint(pages) == fingerprint(again)
    assert pages.count() == 2000
    assert pages.select("url").distinct().count() == 2000


def test_stats_and_selection(spark, pages):
    stats = collect_stats(pages)
    assert stats["lang"]["distinct"] <= 35
    assert stats["url"]["non_null"] == 2000
    assert stats["warc_ts"]["avg_run"] > 3  # runs of 16 by construction
    codecs = choose_codecs(stats, pages.schema)
    assert codecs["lang"] == "dict"
    assert codecs["warc_ts"] == "rle"
    assert codecs["text"] in ("fsst", "plain")


def test_roundtrip_all_codecs(spark, pages):
    stats = collect_stats(pages)
    codecs = choose_codecs(stats, pages.schema)
    chunks = encode_chunks(pages, "url", codecs, n_chunks=7).cache()
    # every chunk present, one row per (chunk, column)
    per = chunks.groupBy("chunk_id").count().collect()
    assert len(per) == 7 and all(r["count"] == 5 for r in per)
    decoded = decode_chunks(chunks, pages.schema)
    row = verify_roundtrip(pages, decoded, "url").collect()[0].asDict()
    assert row["rows"] == 2000
    assert all(v == 0 for k, v in row.items() if k.endswith("_bad"))
    assert row["key_missing"] == 0


def test_compression_beats_raw(spark, pages):
    codecs = choose_codecs(collect_stats(pages), pages.schema)
    chunks = encode_chunks(pages, "url", codecs, n_chunks=4)
    agg = chunks.agg(F.sum("raw_bytes").alias("r"),
                     F.sum("enc_bytes").alias("e")).collect()[0]
    assert agg["e"] < agg["r"]


def test_pipeline_run_and_verify(spark, pages, tmp_path):
    out = str(tmp_path / "enc")
    m = pipeline.run_encode(spark, pages, out, n_chunks=6)
    assert m["chunks_encoded"] == 6 and m["rows"] == 2000
    res = pipeline.verify_encoded(spark, pages, out)
    assert res["ok"], res
    # re-run: everything complete → nothing encoded
    m2 = pipeline.run_encode(spark, pages, out, n_chunks=6)
    assert m2["chunks_encoded"] == 0 and m2["chunks_skipped"] == 6


def test_pipeline_resume_identical(spark, pages, tmp_path):
    """Kill-and-resume: partial run + resumed run == single-shot run."""
    out_a = str(tmp_path / "partial")
    m1 = pipeline.run_encode(spark, pages, out_a, n_chunks=6,
                             max_chunks_this_run=2)
    assert m1["chunks_encoded"] == 2
    m2 = pipeline.run_encode(spark, pages, out_a, n_chunks=6)
    assert m2["chunks_skipped"] == 2 and m2["chunks_encoded"] == 4

    # terminal iteration of the incremental loop: all chunks complete AND
    # max_chunks_this_run still set → must no-op, not crash (empty
    # createDataFrame raises CANNOT_INFER_EMPTY_SCHEMA when unguarded)
    m3 = pipeline.run_encode(spark, pages, out_a, n_chunks=6,
                             max_chunks_this_run=2)
    assert m3["chunks_encoded"] == 0 and m3["chunks_skipped"] == 6
    assert m3["run_id"] is None

    out_b = str(tmp_path / "oneshot")
    pipeline.run_encode(spark, pages, out_b, n_chunks=6)

    ca = spark.read.parquet(out_a + "/chunks").select(
        "chunk_id", "column", "checksum").orderBy("chunk_id", "column")
    cb = spark.read.parquet(out_b + "/chunks").select(
        "chunk_id", "column", "checksum").orderBy("chunk_id", "column")
    assert [r.asDict() for r in ca.collect()] == [r.asDict() for r in cb.collect()]
    assert pipeline.verify_encoded(spark, pages, out_a)["ok"]


def test_checksum_verify_mode(spark, pages, tmp_path):
    """Aggregate-checksum verify: no join, no table-data shuffle — and it
    must still detect a genuinely corrupted chunk in the store."""
    import contextlib
    import io
    import shutil

    import pyspark.sql.functions as F
    out = str(tmp_path / "enc")
    pipeline.run_encode(spark, pages, out, n_chunks=4)
    res = pipeline.verify_encoded(spark, pages, out, mode="checksum")
    assert res["ok"], res

    # plan hygiene: zero SortMergeJoin, zero hash-partition Exchange of
    # table rows (only single-row partial-agg gathers remain)
    decoded = pipeline.read_encoded(spark, out)
    from json_to_parquet_spark.operators.encode import verify_roundtrip
    vdf = verify_roundtrip(pages, decoded, "url", mode="checksum")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        vdf.explain("simple")
    plan = buf.getvalue()
    assert "SortMergeJoin" not in plan, plan
    assert "Exchange hashpartitioning" not in plan, plan

    # REAL chunk corruption: replace one chunk directory with the same
    # chunk from a store built over tampered rows (same n_chunks & key →
    # identical layout, different payload bytes) — must be detected
    tampered = pages.withColumn(
        "text", F.when(F.xxhash64("url") % 17 == 0,
                       F.concat(F.col("text"), F.lit("X"))).otherwise(
            F.col("text")))
    out_t = str(tmp_path / "enc_t")
    pipeline.run_encode(spark, tampered, out_t, n_chunks=4)
    shutil.rmtree(f"{out}/chunks/chunk_id=0")
    shutil.copytree(f"{out_t}/chunks/chunk_id=0", f"{out}/chunks/chunk_id=0")
    res_bad = pipeline.verify_encoded(spark, pages, out, mode="checksum")
    assert not res_bad["ok"], res_bad
    assert res_bad["text_bad"] == 1


def test_verify_detects_corruption(spark, pages, tmp_path):
    """The round-trip gate must FAIL when the source is perturbed — a
    verifier that can't fail is no gate."""
    import pyspark.sql.functions as F
    out = str(tmp_path / "enc_c")
    pipeline.run_encode(spark, pages, out, n_chunks=3)
    tampered = pages.withColumn(
        "text", F.when(F.xxhash64("url") % 100 == 0,
                       F.concat(F.col("text"), F.lit("!"))).otherwise(
            F.col("text")))
    res = pipeline.verify_encoded(spark, tampered, out)
    assert not res["ok"]
    assert res["text_bad"] > 0 and res["lang_bad"] == 0


def test_empty_input_pipeline(spark, tmp_path):
    """Empty source: pipeline completes with zero chunks, no crash."""
    empty = spark.createDataFrame(
        [], "url string, warc_ts timestamp, html binary, text string, "
            "lang string")
    m = pipeline.run_encode(spark, empty, str(tmp_path / "e"), n_chunks=4)
    assert m["rows"] == 0 and m["chunks_encoded"] == 0


def test_decode_via_read_encoded(spark, pages, tmp_path):
    out = str(tmp_path / "enc2")
    pipeline.run_encode(spark, pages, out, n_chunks=3)
    decoded = pipeline.read_encoded(spark, out)
    assert decoded.count() == 2000
    assert fingerprint(decoded.orderBy("url")) == fingerprint(pages.orderBy("url"))
