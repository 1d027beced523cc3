"""Text-analysis operators for corpus preparation.

All operators take a docs DataFrame with (doc_id, <text_col>) and return
DataFrames; the arithmetic is chosen to be expressible 1:1 in ANSI SQL
(DuckDB) for oracle checking. Token streams come from the engine's
standard analyzer (byte-identical to the index side).

Portable hash: ``int64(parse_hex(md5(s)[0:8]))`` — identical in Spark
(``conv(substr(md5(s),1,8),16,10)``) and DuckDB
(``('0x' || substr(md5(s),1,8))::BIGINT``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from lucene_clj_spark.analysis import Analyzer, STANDARD

# compact stop set used for quality scoring (fixed, documented — NOT the
# analyzer stop set, which defaults to empty)
QUALITY_STOPWORDS = (
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
)


def portable_hash(c: Column) -> Column:
    """First 32 bits of md5 as a non-negative int64 (see module doc)."""
    return F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("long")


def portable_hash_sql(expr: str) -> str:
    return f"CAST(('0x' || substr(md5({expr}), 1, 8)) AS BIGINT)"


def tokens_col(text: Column, analyzer: Analyzer = STANDARD) -> Column:
    return analyzer.udf()(text)


def token_stats(
    docs: DataFrame,
    text_col: str = "text",
    analyzer: Analyzer = STANDARD,
) -> DataFrame:
    """Per-document token statistics + a composite quality score.

    Columns: doc_id, n_tokens, n_distinct, ttr (type/token ratio),
    stopword_ratio, avg_token_len, quality — all double-rounded
    downstream by callers that need hash-stable output.

    quality = ttr * (1 - stopword_ratio) * min(n_tokens, 256)/256 —
    a simple monotone heuristic: repetitive, stopword-heavy, or very
    short documents score low.
    """
    toks = F.col("__toks")
    stop_arr = F.array(*[F.lit(s) for s in QUALITY_STOPWORDS])
    n_tokens = F.size(toks)
    n_distinct = F.size(F.array_distinct(toks))
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    sum_len = F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
    )
    out = (
        docs.withColumn("__toks", tokens_col(F.col(text_col), analyzer))
        .select(
            "doc_id",
            n_tokens.cast("long").alias("n_tokens"),
            n_distinct.cast("long").alias("n_distinct"),
            (n_distinct.cast("double") / n_tokens.cast("double")).alias("ttr"),
            (n_stop.cast("double") / n_tokens.cast("double")).alias(
                "stopword_ratio"
            ),
            (sum_len.cast("double") / n_tokens.cast("double")).alias(
                "avg_token_len"
            ),
        )
        .withColumn(
            "quality",
            F.col("ttr")
            * (F.lit(1.0) - F.col("stopword_ratio"))
            * (
                F.least(F.col("n_tokens"), F.lit(256)).cast("double")
                / F.lit(256.0)
            ),
        )
    )
    return out


# ASCII whitespace spelled as an explicit class: Java's default \s is
# [ \t\n\x0B\f\r] but RE2's omits vertical tab, so a bare \s silently
# diverges between Spark and the DuckDB oracle twins on \x0B. An
# explicit class parses identically in both.
WS_CLASS = r"[ \t\n\x0B\f\r]"

# BPE-ish pre-tokenizer pattern (the GPT-2-family shape): contraction
# suffixes, Unicode letter runs, digit runs capped at 3 (modern BPE
# vocabularies split numbers into 1-3 digit groups), punctuation runs
# (apostrophes separate so contractions win), standalone apostrophe
# runs. Chosen to count IDENTICALLY under Java regex (Spark) and RE2
# (DuckDB) — branches are start-disjoint except the contraction/quote
# pair, where leftmost-first and leftmost-longest agree, and
# whitespace is the explicit WS_CLASS, not the engine-dependent \s.
BPE_ISH_PATTERN = (
    r"'(?:s|t|re|ve|m|ll|d)|\p{L}+|\p{N}{1,3}"
    r"|[^\p{L}\p{N} \t\n\x0B\f\r']+|'+"
)


def _ws_words(c: Column) -> Column:
    """Whitespace-delimited words with edge-empty fields removed:
    ``split`` keeps a leading empty field when text starts with
    whitespace (and ``trim`` strips only ASCII spaces, not newlines),
    so the split is followed by an explicit non-empty filter — a doc
    of pure whitespace yields [], not phantom empty words."""
    return F.filter(
        F.split(c, WS_CLASS + "+"), lambda t: t != F.lit("")
    )


def token_count_estimates(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Per-document token-count estimators for training-data budgeting:
    (doc_id, ws_tokens, bpe_ish_tokens, n_bytes, bytes_per_token).

    ``ws_tokens`` = whitespace-delimited word count; ``bpe_ish_tokens``
    = matches of :data:`BPE_ISH_PATTERN` — a regex approximation of a
    GPT-2-family BPE pre-tokenizer, the standard quick estimator when
    the real tokenizer is too expensive to run over a whole corpus
    (counts are typically within ~10-25% of a real BPE count on web
    text, always >= the real count's pre-merge pieces for ASCII);
    ``bytes_per_token`` = UTF-8 bytes / bpe_ish_tokens (NULL when 0
    tokens) — the compression-ratio proxy used to spot
    boilerplate/binary junk. Everything is JVM-side (regexp_count /
    split / octet_length): one narrow projection, no Python, no
    shuffle."""
    c = F.col(text_col)
    bpe = F.regexp_count(c, F.lit(BPE_ISH_PATTERN))
    ws = F.size(_ws_words(c))
    nb = F.octet_length(c)
    return docs.select(
        "doc_id",
        ws.cast("long").alias("ws_tokens"),
        bpe.cast("long").alias("bpe_ish_tokens"),
        nb.cast("long").alias("n_bytes"),
        F.when(bpe > 0, nb.cast("double") / bpe.cast("double")).alias(
            "bytes_per_token"
        ),
    )


def fingerprint(
    docs: DataFrame,
    text_col: str = "text",
    analyzer: Analyzer = STANDARD,
) -> DataFrame:
    """Deterministic content fingerprint: (doc_id, n_tokens,
    min/max/sum-mod of token hashes). Join-key-sized digest for
    content-lineage tracking across pipeline stages."""
    toks = F.col("__toks")
    hashes = F.transform(toks, lambda t: portable_hash(t))
    return docs.withColumn(
        "__toks", tokens_col(F.col(text_col), analyzer)
    ).select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.array_min(hashes).alias("min_hash"),
        F.array_max(hashes).alias("max_hash"),
        F.pmod(
            F.aggregate(hashes, F.lit(0).cast("long"), lambda a, x: a + x),
            F.lit(2**31 - 1),
        ).alias("sum_hash_mod"),
    )


def quality_flags(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Gopher-style document-quality filter flags (the published rule
    family from Rae et al. 2021 "Scaling Language Models" Appendix A,
    plus C4's stopword-presence heuristic), per document:

    - ``ok_word_count``: 50 <= words <= 100,000
    - ``ok_mean_word_len``: mean word length in [3, 10]
    - ``ok_alpha``: >= 80% of words contain an alphabetic character
    - ``ok_stop``: >= 2 DISTINCT common stopwords present
    - ``ok_repetition``: most-frequent word <= 20% of all words
      (the cheap proxy for Gopher's duplicate-n-gram rules)
    - ``keep`` = the conjunction

    Columns: (doc_id, n_words, mean_word_len, top_word_ratio,
    ok_word_count, ok_mean_word_len, ok_alpha, ok_stop,
    ok_repetition, keep). Whitespace words, not analyzer tokens —
    quality filtering runs BEFORE analysis in a real pipeline.
    Everything is JVM higher-order array functions over one split:
    one narrow projection, no Python, no shuffle."""
    c = F.col(text_col)
    toks = _ws_words(c)
    n = F.size(toks)
    nd = n.cast("double")
    mean_len = F.when(n > 0, F.aggregate(
        toks, F.lit(0).cast("long"), lambda a, t: a + F.length(t)
    ).cast("double") / nd)
    n_alpha = F.size(F.filter(toks, lambda t: t.rlike("[A-Za-z]")))
    stop_arr = F.array(*[F.lit(s) for s in QUALITY_STOPWORDS])
    # lowercase before the membership test: 'The'/'A' at sentence
    # starts count toward the stopword gate, matching the published
    # Gopher/C4 heuristic (ADVICE r04 — the raw form was stricter)
    n_stop_distinct = F.size(
        F.filter(F.array_distinct(F.transform(toks, F.lower)),
                 lambda t: F.array_contains(stop_arr, t))
    )
    # top term frequency in O(n log n): sort, then one fold tracking
    # the current and best run length (the naive per-distinct-token
    # filter scan is O(n_distinct * n) — quadratic on exactly the
    # large documents this function gates)
    zero = F.lit(0).cast("long")
    acc0 = F.struct(
        F.lit("").alias("prev"), zero.alias("run"), zero.alias("best")
    )

    def _run_step(a, t):
        run = F.when(t == a["prev"], a["run"] + 1).otherwise(
            F.lit(1).cast("long")
        )
        return F.struct(
            t.alias("prev"), run.alias("run"),
            F.greatest(a["best"], run).alias("best"),
        )

    top_tf = F.when(
        n > 0, F.aggregate(F.array_sort(toks), acc0, _run_step)["best"]
    )
    top_ratio = top_tf.cast("double") / nd
    ok_wc = (n >= 50) & (n <= 100000)
    ok_mwl = F.coalesce(
        (mean_len >= 3.0) & (mean_len <= 10.0), F.lit(False)
    )
    ok_alpha = F.when(
        n > 0, n_alpha.cast("double") / nd >= 0.8
    ).otherwise(F.lit(False))
    ok_stop = n_stop_distinct >= 2
    ok_rep = F.coalesce(top_ratio <= 0.2, F.lit(False))
    return docs.select(
        "doc_id",
        n.cast("long").alias("n_words"),
        mean_len.alias("mean_word_len"),
        top_ratio.alias("top_word_ratio"),
        ok_wc.alias("ok_word_count"),
        ok_mwl.alias("ok_mean_word_len"),
        ok_alpha.alias("ok_alpha"),
        ok_stop.alias("ok_stop"),
        ok_rep.alias("ok_repetition"),
        (ok_wc & ok_mwl & ok_alpha & ok_stop & ok_rep).alias("keep"),
    )


def top_tfidf_terms(
    docs: DataFrame,
    k: int = 5,
    text_col: str = "text",
    analyzer: Analyzer = STANDARD,
) -> DataFrame:
    """Per-document top-k terms by tf-idf — keyword extraction (the
    query-term selection step of MoreLikeThis, exposed standalone for
    tagging/labeling pipelines). tfidf = tf * ln(N / df) over analyzer
    tokens; rank ties break (tfidf desc, term asc). Returns (doc_id,
    term, tf, df, tfidf, rank).

    Scale shape: one tokenize+explode -> (doc, term) tf aggregate; the
    df side is vocabulary-sized and joins on term (map-side combined
    aggregates both); the per-doc top-k is a rank window whose k-bound
    pushes pre-shuffle (WindowGroupLimit), so only k rows per doc
    survive the final exchange."""
    from pyspark.sql import Window

    # explode_outer + null filter for the same reason as
    # dedup.doc_shingles: a plain explode of the tokenizer UDF output
    # makes InferFiltersFromGenerate evaluate the UDF twice per row
    toks = docs.select(
        "doc_id",
        F.explode_outer(
            tokens_col(F.col(text_col), analyzer)
        ).alias("term"),
    ).filter(F.col("term").isNotNull())
    tf = toks.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).alias("tf")
    )
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    # N as a 1-row crossJoin, not an eager .count(): the builder stays
    # lazy (no job at call time) and the input lineage is evaluated
    # once by the final plan, not once extra for a driver-side literal
    n_docs = docs.agg(
        F.count(F.lit(1)).cast("double").alias("__n")
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("tfidf"), F.asc("term")
    )
    return (
        tf.join(df_, "term")
        .crossJoin(n_docs)
        .withColumn(
            "tfidf",
            F.col("tf").cast("double")
            * F.log(F.col("__n") / F.col("df").cast("double")),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("doc_id", "term", "tf", "df", "tfidf", "rank")
    )


# Language-ID: tiny stopword-profile heuristic. The synthetic corpus has
# an English-ish vocabulary, so this is exercised via pytest goldens on
# constructed sentences (rows-only for the driver oracle).
_LANG_PROFILES = {
    "en": {"the", "and", "of", "to", "is", "in", "that", "it", "you", "for"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ich", "ein", "zu"},
    "fr": {"le", "la", "les", "et", "est", "je", "un", "une", "que", "pas"},
    "es": {"el", "la", "los", "las", "es", "y", "un", "una", "que", "no"},
}


def lang_id(
    docs: DataFrame,
    text_col: str = "text",
    analyzer: Analyzer = STANDARD,
) -> DataFrame:
    """(doc_id, pred_lang, lang_score): argmax over stopword-profile hit
    ratios; 'und' (undetermined) when no profile matches."""
    toks = F.col("__toks")
    out = docs.withColumn("__toks", tokens_col(F.col(text_col), analyzer))
    def _contains(arr):
        # 1-arg closure: F.filter passes (elem, idx) to 2-arg lambdas
        return lambda t: F.array_contains(arr, t)

    scores = []
    for lang, words in sorted(_LANG_PROFILES.items()):
        arr = F.array(*[F.lit(w) for w in sorted(words)])
        hit = F.size(F.filter(toks, _contains(arr)))
        scores.append(
            F.struct(
                (hit.cast("double") / F.greatest(F.size(toks), F.lit(1))).alias(
                    "score"
                ),
                F.lit(lang).alias("lang"),
            )
        )
    best = F.array_max(F.array(*scores))
    return out.select(
        "doc_id",
        F.when(best["score"] > 0, best["lang"]).otherwise("und").alias(
            "pred_lang"
        ),
        best["score"].alias("lang_score"),
    )
