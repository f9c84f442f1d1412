"""Multimodal column plumbing: image/audio/video as opaque binary + typed
metadata, processed with Arrow-batched `mapInPandas`.

The actual media decoding libraries (PIL/ffmpeg/librosa) are NOT in this
container, so the decode kernels are stubbed behind a clearly-marked seam:
`set_decoder(...)` installs a real decoder; the default `fake_decoder`
parses the deterministic synthetic header produced by `synth_media` so the
Spark-side plumbing — schema, batch shape, partitioning — is fully real
and tested end-to-end.

Batch contract: each mapInPandas batch is a pandas DataFrame whose binary
column holds raw bytes; kernels return one row per input row with fixed
metadata schema. Feature vectors come back as array<float>.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_MAGIC = b"FAKEMEDIA"

META_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("kind", T.StringType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("n_frames", T.IntegerType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("features", T.ArrayType(T.FloatType())),
])


def synth_media(spark: SparkSession, n_rows: int, seed: int = 42) -> DataFrame:
    """Deterministic fake media table: (media_id, kind, payload binary).
    Payload = magic + packed header + pseudo-random body bytes, built with
    JVM expressions (no driver-side data)."""
    df = spark.range(0, n_rows, 1, max(1, n_rows // 5000 or 1))
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.pmod(F.xxhash64("id", F.lit(seed)), F.lit(3)) + 1).cast("int"))
    w = (F.pmod(F.xxhash64("id", F.lit(seed), F.lit("w")), F.lit(1920)) + 8).cast("int")
    h = (F.pmod(F.xxhash64("id", F.lit(seed), F.lit("h")), F.lit(1080)) + 8).cast("int")
    frames = (F.pmod(F.xxhash64("id", F.lit(seed), F.lit("f")), F.lit(240)) + 1).cast("int")
    header = F.concat(
        F.lit(_MAGIC),
        F.lpad(w.cast("string"), 6, "0").cast("binary"),
        F.lpad(h.cast("string"), 6, "0").cast("binary"),
        F.lpad(frames.cast("string"), 6, "0").cast("binary"))
    body = F.encode(F.repeat(
        F.sha2(F.concat(F.col("id").cast("string"), F.lit(seed)), 256), 4),
        "utf-8")
    return df.select(F.col("id").alias("media_id"), kind.alias("kind"),
                     F.concat(header, body).alias("payload"))


def synth_media_md5(spark: SparkSession, n_rows: int) -> DataFrame:
    """Oracle-lane twin of synth_media: identical payload layout, but
    kind/width/height/n_frames derive from md5 (60-bit hex prefix) instead
    of xxhash64, so a DuckDB oracle can recompute the EXPECTED metadata
    closed-form and value-check the whole binary-header encode →
    mapInPandas decode loop (cf. the minhash/simhash md5 lanes)."""
    df = spark.range(0, n_rows, 1, max(1, n_rows // 5000 or 1))

    def h(tag: str):
        return F.conv(F.substring(
            F.md5(F.concat(F.col("id").cast("string"), F.lit(":" + tag))),
            1, 15), 16, 10).cast("long")

    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.pmod(h("k"), F.lit(3)) + 1).cast("int"))
    w = (F.pmod(h("w"), F.lit(1920)) + 8).cast("int")
    ht = (F.pmod(h("h"), F.lit(1080)) + 8).cast("int")
    frames = (F.pmod(h("f"), F.lit(240)) + 1).cast("int")
    header = F.concat(
        F.lit(_MAGIC),
        F.lpad(w.cast("string"), 6, "0").cast("binary"),
        F.lpad(ht.cast("string"), 6, "0").cast("binary"),
        F.lpad(frames.cast("string"), 6, "0").cast("binary"))
    body = F.encode(F.repeat(
        F.sha2(F.concat(F.col("id").cast("string"), F.lit("42")), 256), 4),
        "utf-8")
    return df.select(F.col("id").alias("media_id"), kind.alias("kind"),
                     F.concat(header, body).alias("payload"))


def fake_decoder(payloads: np.ndarray, kinds: np.ndarray) -> dict:
    """Default decode kernel: parses the synth_media header; 'features' =
    8 deterministic moments of the body bytes. A real deployment installs
    a PIL/ffmpeg-backed callable with the same signature via set_decoder."""
    n = len(payloads)
    w = np.zeros(n, np.int32); h = np.zeros(n, np.int32)
    fr = np.zeros(n, np.int32); nb = np.zeros(n, np.int64)
    feats = []
    for i, p in enumerate(payloads):  # per-media loop; byte math is numpy
        nb[i] = len(p)
        if p[: len(_MAGIC)] != _MAGIC:
            feats.append(None)
            continue
        off = len(_MAGIC)
        w[i] = int(p[off:off + 6].decode()); h[i] = int(p[off + 6:off + 12].decode())
        fr[i] = int(p[off + 12:off + 18].decode())
        body = np.frombuffer(p[off + 18:], dtype=np.uint8)
        if body.size == 0:
            feats.append([0.0] * 8)
            continue
        qs = np.quantile(body, [0.1, 0.25, 0.5, 0.75, 0.9]).astype(np.float32)
        feats.append([float(body.mean()), float(body.std()),
                      float(body.min()), *[float(q) for q in qs]])
    return {"width": w, "height": h, "n_frames": fr, "n_bytes": nb,
            "features": feats}


_DECODER: Callable = fake_decoder


def set_decoder(fn: Callable) -> None:
    """Install a real media decoder (same signature as fake_decoder)."""
    global _DECODER
    if not callable(fn):
        raise NotImplementedError(
            "real media decoding requires PIL/ffmpeg — not present in this "
            "environment; install a callable decoder")
    _DECODER = fn


def extract_media_meta(df: DataFrame, payload_col: str = "payload",
                       id_col: str = "media_id", kind_col: str = "kind"
                       ) -> DataFrame:
    """mapInPandas media feature extraction with the installed decoder."""
    decoder = _DECODER

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[payload_col].to_numpy()
            kinds = pdf[kind_col].to_numpy()
            out = decoder(payloads, kinds)
            yield pd.DataFrame({
                "media_id": pdf[id_col].to_numpy(),
                "kind": kinds,
                "width": out["width"], "height": out["height"],
                "n_frames": out["n_frames"], "n_bytes": out["n_bytes"],
                "features": out["features"],
            })

    return df.mapInPandas(fn, schema=META_SCHEMA)


def frame_sample_plan(df: DataFrame, every_n: int = 24) -> DataFrame:
    """Video frame-sampling *plan*: one output row per sampled frame index
    (JVM-side sequence/explode; actual pixel extraction is decoder work)."""
    meta = extract_media_meta(df)
    return (meta.filter(F.col("kind") == "video")
            .select("media_id", F.explode(
                F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n)))
                .alias("frame_idx")))
