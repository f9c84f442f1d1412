"""Structured Streaming surface.

The north rule's resumability story is batch (per-partition manifest
checkpoints, plans/pipeline.py), but the engine also exposes a streaming
ingest path for continuously-arriving web pages:

  readStream (json / parquet dir)
    → foreachBatch: run_encode(batch) into a PER-BATCH chunk store
      (out_dir/batches/<batch_id>). Chunk ids are url-hash based, so
      nearly every chunk id appears in every batch — encoding batches
      into one shared store would make each batch's dynamic partition
      overwrite replace the previous batches' chunk directories (only the
      last batch would survive). Per-batch stores make replayed batches
      idempotent (same batch_id → same directory, fresh overwrite) while
      `plans.pipeline.read_encoded` unions the sub-stores transparently;
      checkpointLocation makes the stream itself resumable.

plus a classic watermark + tumbling-window aggregation over the events
table shape, demonstrating late-data handling with built-in operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

WEBPAGE_SCHEMA = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("warc_ts", T.TimestampType()),
    T.StructField("html", T.BinaryType()),
    T.StructField("text", T.StringType()),
    T.StructField("lang", T.StringType()),
])


def encode_stream(spark: SparkSession, src_dir: str, out_dir: str,
                  checkpoint_dir: str, fmt: str = "parquet",
                  n_chunks: int = 64, trigger_once: bool = True):
    """Stream web pages from a directory into an encoded chunk store.

    Each micro-batch runs the batch pipeline into its own sub-store
    `out_dir/batches/<batch_id>`; a replayed batch re-encodes the same
    directory deterministically (resume=False wipes any half-written
    attempt first). Returns the StreamingQuery."""
    import os

    from ..plans.pipeline import run_encode

    reader = spark.readStream.format(fmt).schema(WEBPAGE_SCHEMA)
    stream = reader.load(src_dir)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        batch_dir = os.path.join(out_dir, "batches", f"{batch_id:010d}")
        run_encode(batch_df.sparkSession, batch_df, batch_dir,
                   n_chunks=n_chunks, resume=False, sample_fraction=0.5)

    writer = (stream.writeStream.foreachBatch(sink)
              .option("checkpointLocation", checkpoint_dir))
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def dedup_stream(pages: DataFrame, key: str = "url",
                 buckets: int = 64) -> DataFrame:
    """Custom STATEFUL streaming operator: drop rows whose key was already
    seen in ANY earlier micro-batch (exactly-once ingest de-duplication).

    Implementation: `applyInPandasWithState` over hash buckets of the key
    — state per bucket is the set of xxhash64(key) values seen so far
    (stored as one binary int64 blob; numpy set-union per batch, no
    per-row Python). Grouping by bucket (not by key) keeps state objects
    coarse: ~`buckets` state rows total instead of one per key."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = pages.schema
    state_schema = "seen binary"

    hashed = pages.withColumn("__kh", F.xxhash64(F.col(key))) \
                  .withColumn("__bucket",
                              F.pmod(F.col("__kh"), F.lit(buckets)))

    cols = [f.name for f in pages.schema.fields]

    def fn(key_tuple, pdfs, state):
        seen = np.frombuffer(state.get[0], dtype=np.int64) \
            if state.exists else np.empty(0, dtype=np.int64)
        for pdf in pdfs:
            kh = pdf["__kh"].to_numpy()
            fresh_mask = ~np.isin(kh, seen)
            # also drop duplicates within the batch itself (keep first)
            first_idx = pd.Series(kh).duplicated().to_numpy()
            keep = fresh_mask & ~first_idx
            seen = np.union1d(seen, kh[keep])
            if keep.any():
                yield pdf.loc[keep, cols]
        state.update((seen.tobytes(),))

    return (hashed.groupBy("__bucket")
            .applyInPandasWithState(fn, outputStructType=out_schema,
                                    stateStructType=state_schema,
                                    outputMode="append",
                                    timeoutConf=GroupStateTimeout.NoTimeout))


def windowed_event_counts(events: DataFrame, window: str = "1 minute",
                          watermark: str = "2 minutes") -> DataFrame:
    """Watermarked tumbling-window aggregation (works on a batch OR
    streaming DataFrame with (ts, event_type, value))."""
    # event-time ops need TIMESTAMP (ltz); parquet sources may infer NTZ
    src = events.withColumn("ts", F.col("ts").cast("timestamp"))
    if events.isStreaming:
        src = src.withWatermark("ts", watermark)
    return (src.groupBy(F.window("ts", window).alias("w"), "event_type")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum("value").alias("value_sum"))
            .select(F.col("w.start").alias("window_start"),
                    "event_type", "n", "value_sum"))
