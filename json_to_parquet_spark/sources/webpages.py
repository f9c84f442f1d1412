"""Deterministic synthetic Common-Crawl-style web-pages table (FIXTURES.md F1).

Schema fixed by BASELINE.json input_hint:
    (url: string, warc_ts: timestamp, html: binary, text: string, lang: string)

Every column is a pure function of (row id, seed) built from JVM-side
expressions (xxhash64 → deterministic pseudo-randomness), so the table is
identical across runs, partition counts, and cluster sizes — required for
the resume test (same chunks → same checksums) and for scaling benchmarks
on "the same input".

Skew is deliberate:
  - `lang` Zipf over ~30 values (hot 'en') → exercises DICT + salting
  - domains Zipf-ish (heavy head) → hot-key skew in url space
  - `warc_ts` monotone with runs of equal values → RLE-friendly
  - `text` multilingual incl. CJK/emoji, heavy-tailed length
  - `html` wraps text in boilerplate plus NON-UTF8 byte sprinkles
    (bit-identity guard: html must round-trip as raw bytes)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Zipf-weighted language bank (weight 1/rank).
LANGS = [
    "en", "zh", "es", "de", "fr", "ja", "ru", "pt", "it", "nl",
    "pl", "tr", "ar", "ko", "sv", "cs", "fi", "hu", "el", "da",
    "ro", "uk", "he", "th", "vi", "id", "no", "hi", "bg", "sk",
]

_PHRASES = [
    "The quick brown fox jumps over the lazy dog. ",
    "Pack my box with five dozen liquor jugs! ",
    "All human beings are born free and equal in dignity and rights. ",
    "Lorem ipsum dolor sit amet, consectetur adipiscing elit. ",
    "Der schnelle braune Fuchs springt über den faulen Hund. ",
    "El veloz murciélago hindú comía feliz cardillo y kiwi. ",
    "Portez ce vieux whisky au juge blond qui fume. ",
    "中文网页内容包含大量汉字和标点符号。",
    "日本語のテキストもここにあります。",
    "한글 텍스트 샘플입니다. ",
    "النص العربي هنا للاختبار. ",
    "Русский текст для проверки кодировки. ",
    "Emoji test \U0001f600\U0001f680✨ and more text after. ",
    "Numbers 1234567890 and punctuation !?,;:() everywhere. ",
    "A very common boilerplate footer about cookies and privacy. ",
    "Subscribe to our newsletter for weekly updates and offers. ",
]

_TITLES = ["Home", "News", "Blog", "About", "Products", "Contact",
           "Archive", "Docs"]


def _u(seed: int, tag: str, mod: int = 1_000_000):
    """Deterministic uniform in (0, 1] as a Column, from row id."""
    h = F.xxhash64(F.col("id"), F.lit(seed), F.lit(tag))
    return (F.pmod(h, F.lit(mod)) + 1) / float(mod)


def _pick(seed: int, tag: str, values: list[str]):
    """Uniform pick from a literal array (1-based element_at)."""
    h = F.pmod(F.xxhash64(F.col("id"), F.lit(seed), F.lit(tag)),
               F.lit(len(values))) + 1
    return F.element_at(F.array(*[F.lit(v) for v in values]), h.cast("int"))


def _zipf_pick(u, values: list[str]):
    """Map uniform u∈(0,1] to a Zipf(1)-weighted pick via chained whens."""
    weights = [1.0 / (i + 1) for i in range(len(values))]
    total = sum(weights)
    cdf, acc = [], 0.0
    for w in weights:
        acc += w / total
        cdf.append(acc)
    # build from the tail up so the first matching threshold wins
    result = F.lit(values[-1])
    for v, c in reversed(list(zip(values[:-1], cdf[:-1]))):
        result = F.when(u <= F.lit(c), F.lit(v)).otherwise(result)
    return result


def synth_webpages(spark: SparkSession, n_rows: int, seed: int = 42,
                   partitions: int | None = None) -> DataFrame:
    """Generate the deterministic web-pages table with `n_rows` rows."""
    if partitions is None:
        partitions = max(1, min(64, n_rows // 2000 or 1))
    df = spark.range(0, n_rows, 1, partitions)

    lang = _zipf_pick(_u(seed, "lang"), LANGS)
    # heavy-head domain distribution: u^3 * n_domains concentrates near 0
    n_domains = max(10, n_rows // 50)
    domain_id = F.floor(F.pow(_u(seed, "dom"), F.lit(3.0)) * F.lit(n_domains))
    domain = F.concat(F.lit("www.site"), domain_id.cast("string"), F.lit(".example"))
    url = F.concat(F.lit("https://"), domain, F.lit("/page/"),
                   F.col("id").cast("string"))

    # monotone timestamp with runs: 16 consecutive ids share one value,
    # step 1s, small deterministic jitter every run
    base_us = 1_500_000_000_000_000  # 2017-07-14 UTC, microseconds
    run = F.floor(F.col("id") / 16)
    ts = F.timestamp_micros(
        (F.lit(base_us) + run * 1_000_000
         + F.pmod(F.xxhash64(run, F.lit(seed), F.lit("jit")), F.lit(1000))
         ).cast("long"))

    # heavy-tailed text: 1..~60 phrase picks (pareto-ish via 1/u^0.6)
    reps = F.least(F.lit(60), F.ceil(F.pow(_u(seed, "len"), F.lit(-0.6))))
    pieces = [
        F.when(F.lit(i) < reps, _pick(seed, f"p{i}", _PHRASES)).otherwise(F.lit(""))
        for i in range(60)
    ]
    text = F.concat(_pick(seed, "p_first", _PHRASES), *pieces)

    title = _pick(seed, "title", _TITLES)
    # html: boilerplate + raw non-UTF8 byte sprinkles around the text
    html = F.concat(
        F.lit(b"<html><head><title>"),
        F.encode(title, "utf-8"),
        F.lit(b"</title>\xc0\xff\x80</head><body><p>"),
        F.encode(text, "utf-8"),
        F.lit(b"</p>\xfe\x01</body></html>"),
    )

    return df.select(
        url.alias("url"),
        ts.alias("warc_ts"),
        html.alias("html"),
        text.alias("text"),
        lang.alias("lang"),
    )


def iceberg_available(spark: SparkSession) -> bool:
    """True when the session is configured for Iceberg: the Iceberg SQL
    extensions are registered, or any `spark.sql.catalog.*` entry points
    at an Iceberg catalog implementation. An explicit configuration probe
    — NOT a try/except around the write — so genuine Iceberg failures
    (schema mismatch, permissions, partial write) propagate to the caller
    instead of being masked as a silent Parquet fallback."""
    try:
        conf = dict(spark.sparkContext.getConf().getAll())
    except Exception:
        return False
    if "IcebergSparkSessionExtensions" in conf.get("spark.sql.extensions", ""):
        return True
    return any(k.startswith("spark.sql.catalog.") and "iceberg" in str(v).lower()
               for k, v in conf.items())


def load_table(spark: SparkSession, target: str) -> DataFrame:
    """Source seam (SURVEY §7.1).

    Argument contract: with an Iceberg runtime configured, `target` is a
    CATALOG TABLE IDENTIFIER (`catalog.db.table` — read via
    `spark.read.format("iceberg").load(identifier)`, per the public
    Iceberg-Spark docs). Without one (this sandbox), `target` is a
    FILESYSTEM PATH read as plain Parquet. Callers pick the shape that
    matches their deployment; the two are not interchangeable."""
    if iceberg_available(spark):
        return spark.read.format("iceberg").load(target)
    return spark.read.parquet(target)


def write_table(df: DataFrame, target: str, mode: str = "overwrite") -> str:
    """Sink seam mirroring `load_table` (BASELINE.json names Iceberg
    tables as the input/output model).

    Argument contract: with an Iceberg runtime configured, `target` is a
    CATALOG TABLE IDENTIFIER and the write is `df.writeTo(identifier)`
    (append / createOrReplace); without one, `target` is a FILESYSTEM
    PATH written as plain Parquet. Iceberg presence is decided by the
    explicit `iceberg_available` configuration probe — real Iceberg write
    errors are never swallowed into a Parquet fallback.

    Returns the format actually used ("iceberg" | "parquet") so callers
    and tests can assert which seam fired."""
    spark = getattr(df, "sparkSession", None)
    if spark is not None and iceberg_available(spark):
        writer = df.writeTo(target).using("iceberg")
        if mode == "append":
            writer.append()
        else:
            writer.createOrReplace()
        return "iceberg"
    df.write.mode(mode).parquet(target)
    return "parquet"
