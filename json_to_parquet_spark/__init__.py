"""json_to_parquet_spark — a PySpark-native per-column lightweight-compression engine.

Capability-equivalent rebuild (NOT a port) of Zhengsheng-Wang/Json-to-Parquet
(reference at /root/reference: a single-threaded Java JSON→Parquet converter,
see SURVEY.md). Where the reference delegates columnar encoding wholesale to
parquet-mr defaults (reference src/Writer.java:25-26), this engine implements
the lightweight codecs natively — dictionary, RLE, bit-packing,
frame-of-reference, and an FSST-style symbol-table text codec — with
per-chunk codec auto-selection driven by a statistics pass, all expressed as
vectorized Arrow/pandas stages over Spark DataFrames (zero per-row Python).

Layout:
  functions/codecs/   numpy/pyarrow codec kernels (no Spark dependency)
  functions/          column-expression helpers (text quality, lang-id, hashing)
  sources/            synthetic web-pages generator, testdata loaders, JSON ingest
  operators/          stats pass, codec selection, encode/decode, dedup, ANN
  plans/              end-to-end pipeline orchestration + checkpoint/resume
  streaming/          incremental (micro-batch) encode
"""

__version__ = "0.1.0"
