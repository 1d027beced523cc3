"""Document sources — mirrors of the reference's ingestion helpers.

- ``read_csv_docs``: header-row CSV -> document rows (the reference's
  ``vecs->maps``, document.clj:39-51, used by its test fixtures).
- ``split_multivalued``: comma-separated cell -> trimmed string array
  (the reference's ``process-csv-column``, tests_common.clj:32-40),
  for multi-valued keyword fields like albumlist Genre/Subgenre.
- ``webpages_schema`` + ``synthesize_webpages``: the BASELINE.json
  ``input_hint`` table shape (url, warc_ts, html, text, lang) with a
  deterministic generator for tests/benchmarks (Zipfian vocabulary,
  punctuation/apostrophe/CJK rows to exercise UAX#29 — FIXTURES.md §1).
"""

from __future__ import annotations

import datetime as dt
import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def read_csv_docs(
    spark: SparkSession,
    path: str,
    multi_valued: list[str] | None = None,
) -> DataFrame:
    """CSV with header row -> documents DataFrame; listed multi_valued
    columns are split on commas into trimmed arrays."""
    df = spark.read.option("header", True).csv(path)
    for c in multi_valued or []:
        df = df.withColumn(c, split_multivalued(F.col(c)))
    return df


def split_multivalued(col):
    """Comma-separated cell -> array of trimmed non-empty strings."""
    return F.filter(
        F.transform(F.split(col, ","), lambda x: F.trim(x)),
        lambda x: x != F.lit(""),
    )


WEBPAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)

_VOCAB = [
    # Zipf-ish web vocabulary (deterministic)
    "the", "and", "for", "with", "page", "site", "data", "search", "index",
    "query", "result", "link", "home", "about", "contact", "news", "article",
    "world", "time", "people", "year", "market", "science", "code", "open",
    "free", "online", "service", "product", "review", "guide", "learn",
]
_SPICE = [
    "don't", "it's", "3.14", "1,000", "e.g", "web2.0", "日本語", "中文",
    "café", "naïve", "C++", "a_b",
]


def _rand(seed: str) -> int:
    return int(hashlib.md5(seed.encode()).hexdigest()[:8], 16)


def synthesize_webpages(
    spark: SparkSession, n: int, seed: int = 42
) -> DataFrame:
    """Deterministic Common-Crawl-shaped corpus (see module docstring).
    Pure function of (n, seed): same rows at any parallelism."""
    rows = []
    langs = ["en", "de", "fr", "es", "zh"]
    base_ts = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
    for i in range(n):
        r = _rand(f"{seed}:{i}")
        length = 20 + r % 180
        words = []
        for j in range(length):
            rj = _rand(f"{seed}:{i}:{j}")
            # Zipf-ish: low ranks much more likely
            idx = rj % (1 + rj % len(_VOCAB))
            words.append(_VOCAB[idx % len(_VOCAB)])
        if r % 7 == 0:  # sprinkle tokenizer-edge-case rows
            words.append(_SPICE[r % len(_SPICE)])
        text = " ".join(words)
        url = f"https://example.org/{seed}/{i:08d}"
        html = f"<html><body>{text}</body></html>".encode()
        rows.append(
            (
                url,
                base_ts + dt.timedelta(seconds=i),
                bytearray(html),
                text,
                langs[r % len(langs)],
            )
        )
    return spark.createDataFrame(rows, WEBPAGES_SCHEMA)


def extract_text_from_html(html_col):
    """html binary -> text: strip tags (simple deterministic extractor
    for the synthetic corpus; real-world extraction would plug in here).
    Kept as a JVM expression so extraction is shuffle-free and
    byte-deterministic per url (the per-row invariant)."""
    s = F.decode(html_col, "UTF-8")
    return F.trim(F.regexp_replace(s, r"<[^>]*>", " "))
