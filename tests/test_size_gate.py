"""North-rule size gate: the engine's encoded output must be <= the
reference's JSON->Parquet output size on the same data.

Reference yardstick = parquet-mr ExampleParquetWriter defaults
(dictionary encoding ON, UNCOMPRESSED codec — reference
src/Writer.java:25-26), reproduced with Spark's Parquet writer.
"""

import os

import pytest

from json_to_parquet_spark.plans import pipeline
from json_to_parquet_spark.sources.ingest import write_reference_parquet


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _, files in os.walk(path):
        for f in files:
            if not f.startswith(("_", ".")):
                total += os.path.getsize(os.path.join(root, f))
    return total


@pytest.fixture(scope="module")
def sized(spark, tmp_path_factory):
    from json_to_parquet_spark.sources.webpages import synth_webpages
    pages = synth_webpages(spark, 20000, seed=42).cache()
    pages.count()
    root = tmp_path_factory.mktemp("sizegate")
    ref = str(root / "reference_style.parquet")
    write_reference_parquet(pages, ref)
    enc = str(root / "encoded")
    pipeline.run_encode(spark, pages, enc, n_chunks=16)
    return pages, ref, enc


def test_encoded_beats_reference_parquet(spark, sized):
    _, ref, enc = sized
    ref_bytes = _dir_bytes(ref)
    enc_bytes = _dir_bytes(os.path.join(enc, "chunks"))
    assert enc_bytes <= ref_bytes, (enc_bytes, ref_bytes)
    # and it still round-trips bit-identically
    ratio = ref_bytes / enc_bytes
    assert ratio >= 1.0


def test_roundtrip_after_size_gate(spark, sized):
    pages, _, enc = sized
    assert pipeline.verify_encoded(spark, pages, enc)["ok"]
