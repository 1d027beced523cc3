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


# Two-label public suffixes recognized by the registered-domain
# extractor. A deliberately small, documented subset of the Mozilla
# Public Suffix List: at 100 TB the full PSL (~9k rules) would load
# the same way — a literal-folded when-chain or a broadcast map — and
# the regex shape below is unchanged.
PUBLIC_SUFFIXES_2 = (
    "co.uk", "org.uk", "ac.uk", "com.au", "co.jp", "com.br", "co.in",
)


def url_parts(pages: DataFrame, url_col: str = "url") -> DataFrame:
    """Adds parsed URL columns — the first step of every per-domain
    crawl operation (dedup budgets, robots grouping, host-level
    quality priors): ``scheme``, ``host`` (no port/userinfo),
    ``path`` ('' when absent), and ``registered_domain`` (the
    pay-level domain: last two labels, or last three when the final
    two are a known two-label public suffix; single-label hosts map
    to themselves).

    All JVM ``regexp_extract`` expressions over one projection — no
    Python, no shuffle; the extraction arithmetic is 1:1 expressible
    in ANSI SQL for oracle checking."""
    u = F.col(url_col)
    # scheme and host are case-insensitive per RFC 3986 — lowercase
    # both so case-variant spellings of one site aggregate together
    # (per-domain caps over 'WWW.Example.COM' vs 'www.example.com'
    # must see ONE domain); paths stay case-sensitive
    scheme = F.lower(
        F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1)
    )
    host_full = F.regexp_extract(
        u, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1
    )
    # strip userinfo@ and :port. An IPv6 literal keeps its brackets
    # ('http://[::1]:8080/' -> host '[::1]'): the bracket alternative
    # matches first, so the :port strip never truncates inside the
    # address (ADVICE r04). Scheme-less inputs parse to empty
    # scheme/host/registered_domain by design — callers doing crawl
    # hygiene should pre-filter `scheme != ''` (a row with an empty
    # host is the flag for an unparseable URL).
    host = F.lower(
        F.regexp_extract(host_full, r"^(?:[^@]*@)?(\[[^\]]*\]|[^:]+)", 1)
    )
    path = F.regexp_extract(
        u, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(/[^?#]*)?", 1
    )
    reg = None
    for suf in PUBLIC_SUFFIXES_2:
        esc = suf.replace(".", r"\.")
        cand = F.regexp_extract(host, r"([^.]+\." + esc + r")$", 1)
        reg = cand if reg is None else F.when(reg != "", reg).otherwise(cand)
    last2 = F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1)
    reg = F.when(reg != "", reg).otherwise(
        F.when(last2 != "", last2).otherwise(host)
    )
    return pages.select(
        "*",
        scheme.alias("scheme"),
        host.alias("host"),
        path.alias("path"),
        reg.alias("registered_domain"),
    )


def host_stats(
    pages: DataFrame,
    url_col: str = "url",
    size_col: str | None = None,
) -> DataFrame:
    """Per-registered-domain corpus statistics: (registered_domain,
    n_pages, n_hosts, total_size?) — the aggregation behind crawl-side
    per-domain caps and host-level quality priors. One hash aggregate
    on the parsed domain (map-side combined; n_hosts is an exact
    distinct, a second partial pass); domains are the natural skew
    point of a crawl, and a count-shaped aggregate tolerates skew —
    only (domain, partial-count) rows shuffle, never pages."""
    parts = url_parts(pages, url_col)
    aggs = [
        F.count(F.lit(1)).alias("n_pages"),
        F.countDistinct("host").alias("n_hosts"),
    ]
    if size_col is not None:
        aggs.append(
            F.sum(F.col(size_col).cast("long")).alias("total_size")
        )
    return parts.groupBy("registered_domain").agg(*aggs)
