"""Search execution — scoring, top-k, pagination.

Mirrors reference search.clj:49-78 (`IndexSearcher.search(query, k)` ->
TopDocs sorted by (score desc, docID asc)), :page looping
(search.clj:27-47) and :search-after keyset pagination (search.clj:8-32).

Compilation strategy (scale-first):

- Each AST node compiles to a lazy DataFrame ``(doc_id, score)``.
- Term/phrase/fuzzy plans start from a postings FILTER on (field, term):
  against a disk index this prunes to one ``bucket=`` directory
  (partition pruning via the same xxhash64 the writer used) and then
  row-group min/max skipping on the sorted ``term`` column — the Spark
  analogue of Lucene's term-dictionary seek. `.explain()` shows
  PartitionFilters + PushedFilters.
- BM25 constants (N, avgdl) are driver-side scalars folded into the
  score expression -> whole-stage codegen, no joins for stats.
- The per-term df joins the (tiny) filtered ``terms`` row via an
  explicit ``F.broadcast``.
- Top-k = ``orderBy(score desc, doc_id asc).limit(k)`` which Spark
  executes as TakeOrderedAndProject: per-partition bounded heaps + a
  driver merge — no global shuffle/sort of the scored set.
- ``page=p`` fetches ``(p+1)*k`` rows the same way and drops the first
  ``p*k`` (the reference re-scores each page too, search.clj:27-47).
- ``search_after`` applies the keyset predicate
  ``score < s OR (score = s AND doc_id > d)`` BEFORE the top-k, so the
  predicate participates in pruning (SURVEY.md §4.1).
"""

from __future__ import annotations

from functools import reduce
from typing import Any

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from lucene_clj_spark import bm25
from lucene_clj_spark.errors import ValidationError
from lucene_clj_spark.query import (
    MUST,
    SHOULD,
    BoolQ,
    ExactQ,
    FuzzyQ,
    MatchNone,
    Node,
    PhraseQ,
    TermQ,
    combine_fuzzy,
    parse,
)

DEFAULT_RESULTS_PER_PAGE = 10  # reference search.clj:33-35


def _term_postings(index, field: str, term: str) -> DataFrame:
    p = index.postings.filter(
        (F.col("field") == field) & (F.col("term") == term)
    )
    if "bucket" in index.postings.columns:
        nb = index.n_buckets()
        p = p.filter(
            F.col("bucket") == F.pmod(F.xxhash64(F.lit(term)), F.lit(nb))
        )
    return p


def _scored_term(index, node: TermQ) -> DataFrame:
    st = index.field_stats(node.field)
    post = _term_postings(index, node.field, node.term)
    dfreq = F.broadcast(
        index.terms.filter(
            (F.col("field") == node.field) & (F.col("term") == node.term)
        ).select("field", "term", "df")
    )
    scored = post.join(dfreq, ["field", "term"]).select(
        "doc_id",
        (
            F.lit(node.boost)
            * bm25.score_col(
                F.col("tf"),
                F.col("dl"),
                F.col("df"),
                F.lit(st["N"]),
                F.lit(st["avgdl"]),
            )
        ).alias("score"),
    )
    return scored


def _scored_phrase(index, node: PhraseQ) -> DataFrame:
    """Positions-aware exact-adjacency phrase (slop 0), scored as BM25
    over the phrase frequency — public Lucene PhraseQuery semantics
    (reference query.clj:70-75, tested lucene_test.clj:63-72)."""
    st = index.field_stats(node.field)
    terms = list(node.terms)
    if not terms:
        return _empty_scores(index)
    def _shift(offset):
        # NOTE: F.transform calls 2-arg lambdas as (elem, idx); keep a
        # 1-arg closure so `offset` is the phrase offset, not the index.
        return lambda x: x - F.lit(offset)

    parts = []
    for i, t in enumerate(terms):
        p = _term_postings(index, node.field, t).select(
            "doc_id",
            F.col("dl").alias(f"__dl_{i}"),
            F.transform(F.col("positions"), _shift(i)).alias(f"__pos_{i}"),
        )
        parts.append(p)
    joined = reduce(lambda a, b: a.join(b, "doc_id"), parts)
    inter = reduce(
        lambda acc, i: F.array_intersect(acc, F.col(f"__pos_{i}")),
        range(1, len(terms)),
        F.col("__pos_0"),
    )
    freq = F.size(inter)
    # phrase df: number of docs containing the exact phrase — computed
    # from the same plan (Lucene uses min over term df for idf of the
    # phrase weight; it sums the idfs of the constituent terms).
    # Public semantics: PhraseQuery idf = sum of per-term idfs.
    idf_sum = None
    for t in set(terms):
        d = F.broadcast(
            index.terms.filter(
                (F.col("field") == node.field) & (F.col("term") == t)
            ).select(F.first("df").alias("df"))
        )
        # scalar subquery via crossJoin of a 1-row frame
        joined = joined.crossJoin(
            d.select(F.col("df").alias(f"__df_{abs(hash(t)) % 10**8}"))
        )
        e = bm25.idf_col(
            F.col(f"__df_{abs(hash(t)) % 10**8}"), F.lit(st["N"])
        ) * F.lit(terms.count(t))
        idf_sum = e if idf_sum is None else (idf_sum + e)
    qdl = bm25.quantized_dl_col(F.col("__dl_0"))
    denom = freq.cast("double") + F.lit(bm25.K1) * (
        F.lit(1.0 - bm25.B)
        + F.lit(bm25.B) * qdl.cast("double") / F.lit(st["avgdl"])
    )
    return (
        joined.withColumn("__freq", freq)
        .filter(F.col("__freq") > 0)
        .select(
            "doc_id",
            (F.lit(node.boost) * idf_sum * F.col("__freq").cast("double") / denom).alias(
                "score"
            ),
        )
    )


def _scored_exact(index, node: ExactQ) -> DataFrame:
    if node.value_type == "keyword":
        return _scored_term(
            index, TermQ(node.boost, node.field, str(node.value))
        )
    # typed point query -> docs-table filter, constant score 1.0 * boost
    # (Lucene point exact queries are constant-score)
    col = F.col(node.field)
    if node.value_type == "instant":
        # compare at epoch-millis resolution (reference values.clj:76-95)
        cond = F.unix_millis(col) == F.lit(node.value)
    else:
        cond = col == F.lit(node.value)
    return index.docs.filter(cond).select(
        "doc_id", F.lit(float(node.boost)).alias("score")
    )


def _scored_fuzzy(index, node: FuzzyQ) -> DataFrame:
    """FuzzyQuery: expand the term against the term dictionary within
    max_edits, cap expansions (Lucene default 50, ranked by boost then
    df), then score each expanded term with its own idf multiplied by
    the closeness boost ``1 - edits/min(|q|,|t|)`` and OR-combine
    (public FuzzyTermsEnum semantics; reference query.clj:126-147,
    behavior shown in README.org:803-832)."""
    st = index.field_stats(node.field)
    q = node.term
    qlen = len(q)
    cand = (
        index.terms.filter(F.col("field") == node.field)
        .filter(F.abs(F.length("term") - F.lit(qlen)) <= node.max_edits)
        .withColumn("__edits", F.levenshtein(F.col("term"), F.lit(q)))
        .filter(F.col("__edits") <= node.max_edits)
    )
    if node.prefix_length > 0:
        cand = cand.filter(
            F.col("term").startswith(q[: node.prefix_length])
        )
    cand = (
        cand.withColumn(
            "__fboost",
            F.when(F.col("__edits") == 0, F.lit(1.0)).otherwise(
                F.lit(1.0)
                - F.col("__edits").cast("double")
                / F.least(F.length("term"), F.lit(qlen)).cast("double")
            ),
        )
        .orderBy(F.desc("__fboost"), F.desc("df"), F.asc("term"))
        .limit(node.max_expansions)
        .select("field", "term", "df", "__fboost")
    )
    post = index.postings.filter(F.col("field") == node.field).join(
        F.broadcast(cand), ["field", "term"]
    )
    scored = post.select(
        "doc_id",
        (
            F.lit(node.boost)
            * F.col("__fboost")
            * bm25.score_col(
                F.col("tf"),
                F.col("dl"),
                F.col("df"),
                F.lit(st["N"]),
                F.lit(st["avgdl"]),
            )
        ).alias("score"),
    )
    return scored.groupBy("doc_id").agg(F.sum("score").alias("score"))


def _empty_scores(index) -> DataFrame:
    return index.spark.createDataFrame([], "doc_id long, score double")


def _scored_bool(index, node: BoolQ) -> DataFrame:
    musts = [n for occ, n in node.clauses if occ == MUST]
    shoulds = [n for occ, n in node.clauses if occ == SHOULD]
    must_nots = [n for occ, n in node.clauses if occ == "MUST_NOT"]

    def c(n: Node) -> DataFrame:
        return compile_node(index, n)

    base: DataFrame | None = None
    if musts:
        dfs = [c(n).withColumnRenamed("score", f"__s{i}") for i, n in enumerate(musts)]
        base = reduce(lambda a, b: a.join(b, "doc_id"), dfs)
        total = reduce(
            lambda a, i: a + F.col(f"__s{i}"),
            range(1, len(musts)),
            F.col("__s0"),
        )
        base = base.select("doc_id", total.alias("score"))
        if shoulds:
            opt = (
                reduce(DataFrame.unionByName, [c(n) for n in shoulds])
                .groupBy("doc_id")
                .agg(F.sum("score").alias("__opt"))
            )
            base = base.join(opt, "doc_id", "left").select(
                "doc_id",
                (F.col("score") + F.coalesce(F.col("__opt"), F.lit(0.0))).alias(
                    "score"
                ),
            )
    elif shoulds:
        base = (
            reduce(DataFrame.unionByName, [c(n) for n in shoulds])
            .groupBy("doc_id")
            .agg(F.sum("score").alias("score"))
        )
    else:
        base = _empty_scores(index)
    if must_nots and base is not None:
        neg = reduce(DataFrame.unionByName, [c(n).select("doc_id") for n in must_nots])
        base = base.join(neg, "doc_id", "left_anti")
    if node.boost != 1.0:
        base = base.select(
            "doc_id", (F.col("score") * F.lit(node.boost)).alias("score")
        )
    return base


def compile_node(index, node: Node) -> DataFrame:
    """AST -> lazy scored DataFrame ``(doc_id, score double)``."""
    if isinstance(node, TermQ):
        return _scored_term(index, node)
    if isinstance(node, PhraseQ):
        return _scored_phrase(index, node)
    if isinstance(node, ExactQ):
        return _scored_exact(index, node)
    if isinstance(node, FuzzyQ):
        return _scored_fuzzy(index, node)
    if isinstance(node, BoolQ):
        return _scored_bool(index, node)
    if isinstance(node, MatchNone):
        return _empty_scores(index)
    raise ValidationError(f"cannot compile node {node!r}", {})


def _validate_opts(results_per_page, page, search_after):
    if not isinstance(results_per_page, int) or results_per_page <= 0:
        raise ValidationError(
            "results_per_page must be a positive int "
            "(reference validation.clj:46-72)",
            {"results_per_page": results_per_page},
        )
    if page is not None and search_after is not None:
        raise ValidationError(
            "page and search_after are mutually exclusive "
            "(reference validation.clj:46-72)",
            {},
        )
    if page is not None and (not isinstance(page, int) or page < 0):
        raise ValidationError("page must be a non-negative int", {"page": page})


def search(
    index,
    query: Any,
    *,
    field_name: str | None = None,
    results_per_page: int = DEFAULT_RESULTS_PER_PAGE,
    page: int | None = None,
    search_after: Any = None,
    fuzzy: bool = False,
    hit_columns: list[str] | None = None,
    with_hit: bool = True,
) -> DataFrame:
    """Top-k search -> DataFrame (doc_id, score [, stored columns]),
    ordered by (score desc, doc_id asc). See module docstring."""
    _validate_opts(results_per_page, page, search_after)
    if fuzzy:
        ast = combine_fuzzy(query, index.specs)  # (query.clj:132-147)
    else:
        ast = parse(query, index.specs, index.analyzers, field_name)
    scores = compile_node(index, ast)

    k = results_per_page
    if search_after is not None:
        sa = (
            search_after
            if isinstance(search_after, dict)
            else search_after.asDict()
        )
        s, d = float(sa["score"]), int(sa["doc_id"])
        scores = scores.filter(
            (F.col("score") < F.lit(s))
            | ((F.col("score") == F.lit(s)) & (F.col("doc_id") > F.lit(d)))
        )
    fetch = k * ((page or 0) + 1)
    top = scores.orderBy(F.desc("score"), F.asc("doc_id")).limit(fetch)
    if page:
        w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
        top = (
            top.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") > page * k)
            .drop("__rn")
        )
    if with_hit:
        cols = hit_columns or [
            c for c in index.docs.columns if not c.startswith("__")
        ]
        if "doc_id" not in cols:
            cols = ["doc_id"] + cols
        top = F.broadcast(top).join(index.docs.select(*cols), "doc_id")
        top = top.orderBy(F.desc("score"), F.asc("doc_id"))
    return top
