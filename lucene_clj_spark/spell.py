"""Spell correction — Lucene ``DirectSpellChecker`` ("did you mean")
over the term dictionary.

The reference exposes fuzzy SEARCH (query.clj:126-147) but no
dictionary-level corrector; this is the companion surface every search
box needs, built from the same vocab-scan machinery as the fuzzy path
(search._fuzzy_expansions). Semantics follow Lucene's
DirectSpellChecker (public defaults):

- candidates come from the TERM DICTIONARY (vocab-sized — never the
  postings) within ``max_edits`` Damerau-Levenshtein edits
  (transposition = 1 edit, FuzzyTermsEnum's metric), sharing the
  query's first ``prefix_length`` characters (minPrefix=1);
- similarity = ``1 - d / min(|query|, |candidate|)`` (Lucene's
  internal string distance), candidates below ``accuracy`` (0.5) are
  dropped;
- the query term itself is never suggested, and when the query term
  EXISTS in the dictionary a candidate must be strictly MORE frequent
  than it (DirectSpellChecker skips docFreq <= queryTermFreq);
- no suggestions at all when the query term's docFreq / N exceeds
  ``max_query_frequency`` (0.01) — a common term is probably not a
  typo;
- ranking: similarity desc, docFreq desc, term asc (the
  SuggestWordQueue order, made fully deterministic).

Scale shape: ONE scan of the field's slice of the terms table with a
length-window + first-char prefix prune, the Damerau DP evaluated by
the same Arrow-batched kernel the fuzzy query path uses, and a
``k``-row TakeOrderedAndProject — the postings are never touched. The
terms table is per-field distinct vocabulary (10^6-10^8 at web scale,
vs 10^11+ postings), so a correction costs a pruned vocab scan
regardless of corpus size.

Deletes: the term dictionary (and its docFreq weights) stays STALE
while tombstones are pending — corrections may rank by pre-delete
frequencies, or suggest a term whose only docs are deleted, until
``Index.purge_deletes`` recomputes the dictionary. Same staleness
window Lucene's DirectSpellChecker has over a reader with deletes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lucene_clj_spark.errors import ValidationError


def spell_suggest(
    index,
    field: str,
    term: str,
    *,
    k: int = 5,
    max_edits: int = 2,
    prefix_length: int = 1,
    accuracy: float = 0.5,
    max_query_frequency: float = 0.01,
) -> DataFrame:
    """Top-``k`` dictionary corrections for ``term`` (verbatim — pass
    the analyzed form, same contract as TermInSetQ). Returns
    (suggestion, df, score) ordered by (score desc, df desc,
    suggestion asc)."""
    from lucene_clj_spark._udfs import edit_distance_udf
    from lucene_clj_spark.search import _lookup_term_stats

    if not term:
        raise ValidationError("spell_suggest needs a non-empty term",
                              {"term": term})
    if max_edits < 1 or max_edits > 2:
        raise ValidationError(
            "max_edits must be 1 or 2 (LevenshteinAutomata bound)",
            {"max_edits": max_edits},
        )
    st = index.field_stats(field)
    empty = index.spark.createDataFrame(
        [], "suggestion string, df long, score double"
    )
    n = int(st["N"])
    stats = _lookup_term_stats(index, [(field, term)])
    df_q = int(stats.get((field, term), 0))
    if n and df_q / n > max_query_frequency:
        return empty  # common term — not a typo (Lucene gate)

    qlen = len(term)
    cand = index.terms.filter(F.col("field") == field).filter(
        F.abs(F.length("term") - F.lit(qlen)) <= max_edits
    )
    if prefix_length > 0:
        cand = cand.filter(
            F.col("term").startswith(term[:prefix_length])
        )
    cand = cand.filter(F.col("term") != term)
    if df_q:
        # an existing (just rare) query term only yields suggestions
        # that are strictly more frequent than it
        cand = cand.filter(F.col("df") > df_q)
    score = F.when(
        F.col("__edits") == 0, F.lit(1.0)
    ).otherwise(
        F.lit(1.0)
        - F.col("__edits").cast("double")
        / F.least(F.length("term"), F.lit(qlen)).cast("double")
    )
    return (
        cand.withColumn(
            "__edits",
            edit_distance_udf(term, max_edits)(F.col("term")),
        )
        .filter(F.col("__edits") <= max_edits)
        .withColumn("score", score)
        .filter(F.col("score") >= accuracy)
        .orderBy(F.desc("score"), F.desc("df"), F.asc("term"))
        .limit(k)
        .select(
            F.col("term").alias("suggestion"),
            F.col("df").cast("long").alias("df"),
            "score",
        )
    )
