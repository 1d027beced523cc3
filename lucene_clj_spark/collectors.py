"""Result collectors beyond top-k-by-score — Lucene collector parity.

Lucene's ``IndexSearcher`` accepts pluggable ``Collector``s; the
reference surfaces only the top-k search collector (reference
search.clj:56-77), but every real deployment of a Lucene index also
leans on the stock collectors around it. This module supplies the four
that matter at corpus scale, each as a declarative DataFrame plan over
the same query ASTs ``search()`` compiles:

- ``count_hits``    — ``IndexSearcher.count(query)`` /
                      ``TotalHitCountCollector``: total matching docs,
                      no scores materialized per hit.
- ``facets``        — ``FacetsCollector`` + ``Facets.getTopChildren``:
                      value counts of a stored keyword/typed field over
                      the FULL match set (not the top-k page).
- ``search_sorted`` — ``IndexSearcher.search(query, n, Sort)``: top-k
                      ordered by a stored field (Lucene doc-values
                      sort), relevance not computed.
- ``explain_score`` — ``IndexSearcher.explain(query, doc)``: the
                      per-term BM25 decomposition (tf, dl, quantized
                      dl, df, idf, contribution) for one document,
                      arithmetic-identical to what ``search`` sums.
- ``search_collapsed`` — the grouping module's
                      ``CollapsingTopDocsCollector``: top-k hits
                      keeping at most n docs per distinct value of a
                      stored field ("one result per site").
- ``facet_ranges``  — the facet module's ``LongRangeFacetCounts``:
                      per-range document counts over the FULL match
                      set, one aggregation pass for all ranges.

Scale notes (100 TB): count and facets are full-match-set operators,
so the exhaustive DataFrame compiler (``search.compile_node``) is the
RIGHT plan — block-max WAND pruning only ever helps top-k, and Catalyst
keeps the postings scan bucket-pruned + column-pruned exactly as the
search path does. ``facets``/``search_sorted`` join the match set
(doc_id only — one long per match) to the stored-fields table pruned
to exactly (doc_id, <field>); both sides hash-partition on doc_id, and
on a deployment whose docs table is bucketed on doc_id (Index.write
range-partitions it) the stored side needs no shuffle. The facet
aggregate runs with map-side partial aggregation (value cardinality,
not match cardinality, crosses the wire) and the sorted search
compiles to TakeOrderedAndProject — no full sort materializes
anywhere. ``explain_score`` is a single bucket-pruned postings seek of
len(terms) rows.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from lucene_clj_spark import bm25
from lucene_clj_spark.errors import ValidationError
from lucene_clj_spark.query import BoolQ, Node, TermQ, parse
from lucene_clj_spark.search import _lookup_term_stats, compile_node


def _compile(index, query: Any, field_name: str | None) -> DataFrame:
    """Parse + compile the full (un-truncated) per-doc score set."""
    ast = parse(query, index.specs, index.analyzers, field_name)
    return compile_node(index, ast)


def count_hits(index, query: Any, *, field_name: str | None = None
               ) -> DataFrame:
    """Total matching documents — ``IndexSearcher.count(query)``.

    Returns a one-row DataFrame ``(n_hits long)``. The aggregate is a
    count over the per-doc match set, so Catalyst collapses it to a
    partial-count + single-row exchange; per-hit scores never
    materialize into the final plan."""
    return _compile(index, query, field_name).agg(
        F.count("*").cast("long").alias("n_hits")
    )


def facets(
    index,
    query: Any,
    facet_field: str,
    *,
    field_name: str | None = None,
    max_values: int = 10,
) -> DataFrame:
    """Top facet values by document count over the FULL match set.

    Lucene analogue: ``FacetsCollector.search`` + ``getTopChildren``
    on a taxonomy/SSDV facet field. The stored-fields table stands in
    for doc values: it is pruned to exactly (doc_id, facet_field), the
    join key is doc_id on both sides, and the count aggregates with
    map-side combine so only (value, partial_count) pairs shuffle.

    Returns ``(facet_value, n_docs)`` ordered by (n_docs desc,
    facet_value asc), limited to ``max_values``."""
    if facet_field not in index.docs.columns:
        raise ValidationError(
            f"facet field {facet_field!r} is not a stored field",
            {"facet_field": facet_field,
             "stored": [c for c in index.docs.columns
                        if not c.startswith("__")]},
        )
    matches = _compile(index, query, field_name).select("doc_id")
    vals = index.docs.select("doc_id", facet_field)
    return (
        matches.join(vals, "doc_id")
        .groupBy(F.col(facet_field).alias("facet_value"))
        .agg(F.count("*").cast("long").alias("n_docs"))
        .orderBy(F.desc("n_docs"), F.asc("facet_value"))
        .limit(max_values)
    )


def facet_ranges(
    index,
    query: Any,
    facet_field: str,
    ranges: list[tuple[str, Any, Any]],
    *,
    field_name: str | None = None,
) -> DataFrame:
    """Numeric range facet counts over the FULL match set — Lucene's
    facet-module ``LongRangeFacetCounts`` / ``DoubleRangeFacetCounts``.

    ``ranges`` is ``[(label, lo, hi), ...]`` with Lucene LongRange
    default bounds: lo inclusive, hi EXCLUSIVE; ``None`` = open end.
    Ranges may overlap (a doc counts once per range it falls in,
    exactly like Lucene); a range nothing matches still appears with
    count 0 (``getTopChildren`` reports every requested range).

    Plan shape: same as ``facets`` — the match set joins the stored
    table pruned to (doc_id, field); each range is one conditional
    partial-count in a SINGLE aggregation pass (no per-range scans),
    so only len(ranges) longs cross the wire per map partition.

    Returns ``(facet_value, n_docs)`` in the caller's range order."""
    if facet_field not in index.docs.columns:
        raise ValidationError(
            f"facet field {facet_field!r} is not a stored field",
            {"facet_field": facet_field},
        )
    if not ranges:
        raise ValidationError("ranges must be non-empty", {})
    labels = [lbl for lbl, _, _ in ranges]
    if len(set(labels)) != len(labels):
        raise ValidationError(
            "range labels must be unique", {"labels": labels}
        )
    matches = _compile(index, query, field_name).select("doc_id")
    vals = index.docs.select("doc_id", facet_field)
    joined = matches.join(vals, "doc_id")
    col = F.col(facet_field)
    aggs = []
    for lbl, lo, hi in ranges:
        cond = F.lit(True)
        if lo is not None:
            cond = cond & (col >= F.lit(lo))
        if hi is not None:
            cond = cond & (col < F.lit(hi))
        aggs.append(F.sum(F.when(cond, 1).otherwise(0)).cast("long"))
    aggs = [a.alias(f"__r{i}") for i, a in enumerate(aggs)]
    wide = joined.agg(*aggs)
    # one row per range, caller order (Lucene reports ranges as given)
    kvs = [
        F.struct(
            F.lit(lbl).alias("facet_value"),
            F.coalesce(F.col(f"__r{i}"), F.lit(0)).alias("n_docs"),
        )
        for i, lbl in enumerate(labels)
    ]
    return wide.select(F.explode(F.array(*kvs)).alias("kv")).select(
        "kv.facet_value", "kv.n_docs"
    )


def search_sorted(
    index,
    query: Any,
    sort_field: str,
    *,
    ascending: bool = False,
    field_name: str | None = None,
    results_per_page: int = 10,
) -> DataFrame:
    """Top-k matches ordered by a stored field — ``search(query, n,
    Sort(SortField(...)))``.

    Relevance is not computed into the result (Lucene skips scoring
    under a non-relevance Sort unless asked); ties break on doc_id
    ascending, mirroring Lucene's implicit docID tie-break. Compiles
    to TakeOrderedAndProject over the match-set join — per-partition
    bounded heaps, no global sort.

    Returns ``(doc_id, <sort_field>)`` limited to
    ``results_per_page``."""
    if sort_field not in index.docs.columns:
        raise ValidationError(
            f"sort field {sort_field!r} is not a stored field",
            {"sort_field": sort_field},
        )
    if not isinstance(results_per_page, int) or results_per_page <= 0:
        raise ValidationError(
            "results_per_page must be a positive int",
            {"results_per_page": results_per_page},
        )
    matches = _compile(index, query, field_name).select("doc_id")
    vals = index.docs.select("doc_id", sort_field)
    key = F.asc(sort_field) if ascending else F.desc(sort_field)
    return (
        matches.join(vals, "doc_id")
        .orderBy(key, F.asc("doc_id"))
        .limit(results_per_page)
    )


def search_collapsed(
    index,
    query: Any,
    collapse_field: str,
    *,
    field_name: str | None = None,
    results_per_page: int = 10,
    hits_per_group: int = 1,
) -> DataFrame:
    """Field collapsing — Lucene's grouping module
    (``CollapsingTopDocsCollector`` / grouping ``TopGroups``): the
    top-k hits by relevance keeping at most ``hits_per_group``
    documents per distinct value of a stored field. The classic
    "one result per site" search page.

    Plan shape (scale notes): the scored match set joins the stored
    table pruned to exactly ``(doc_id, collapse_field)``; the per-group
    rank is a ``row_number`` window partitioned on the collapse key —
    Spark's ``WindowGroupLimit`` pushes the ``rank <= n`` bound into a
    per-partition bounded heap BEFORE the window shuffle, so only ~n
    candidate rows per (partition, group) cross the wire, not the full
    match set. The final top-k is TakeOrderedAndProject. Group-key
    skew (one giant site) is absorbed by that same pre-shuffle bound.

    Returns ``(doc_id, <collapse_field>, score)`` ordered by
    (score desc, doc_id asc), ties within a group broken the same way
    (Lucene's implicit docID tie-break)."""
    if collapse_field not in index.docs.columns:
        raise ValidationError(
            f"collapse field {collapse_field!r} is not a stored field",
            {"collapse_field": collapse_field},
        )
    if not isinstance(results_per_page, int) or results_per_page <= 0:
        raise ValidationError(
            "results_per_page must be a positive int",
            {"results_per_page": results_per_page},
        )
    if not isinstance(hits_per_group, int) or hits_per_group <= 0:
        raise ValidationError(
            "hits_per_group must be a positive int",
            {"hits_per_group": hits_per_group},
        )
    scores = _compile(index, query, field_name)
    vals = index.docs.select("doc_id", collapse_field)
    joined = scores.join(vals, "doc_id")
    w = (
        Window.partitionBy(collapse_field)
        .orderBy(F.desc("score"), F.asc("doc_id"))
    )
    return (
        joined.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= hits_per_group)
        .select("doc_id", collapse_field, "score")
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(results_per_page)
    )


def _scored_term_leaves(node: Node) -> list[TermQ]:
    """Scoring TermQ leaves of an AST — MUST/SHOULD clauses only.

    MUST_NOT never scores and FILTER is constant-unscored (Lucene
    BooleanWeight skips both in explain()), so they are excluded."""
    if isinstance(node, TermQ):
        return [node]
    if isinstance(node, BoolQ):
        out: list[TermQ] = []
        for occ, child in node.clauses:
            if occ in ("MUST", "SHOULD"):
                out.extend(_scored_term_leaves(child))
        return out
    return []


def explain_score(
    index,
    query: Any,
    doc_id: int,
    *,
    field_name: str | None = None,
) -> DataFrame:
    """Per-term BM25 score decomposition for one document —
    ``IndexSearcher.explain(query, docID)``.

    One row per scoring term present in the document:
    ``(field, term, tf, dl, qdl, df, idf, contribution)`` ordered by
    (field, term). ``qdl`` is the byte-quantized doc length actually
    used by the formula (bm25.quantized_dl_col — Lucene's SmallFloat
    norm), ``contribution = boost * idf * tf / (tf + k1*(1-b+b*qdl/
    avgdl))`` — the identical arithmetic ``search`` sums, so
    sum(contribution) over the rows reproduces the hit's score for
    pure AND/OR term queries. idf and contribution are rounded to 6dp
    for stable comparison; terms the doc lacks yield no row.

    Plan: a single bucket-pruned postings seek (term IN + doc_id
    pushed to the scan) of at most len(terms) rows; df/N/avgdl fold in
    as literals from the driver-side term-stats cache — no join."""
    ast = parse(query, index.specs, index.analyzers, field_name)
    leaves = _scored_term_leaves(ast)
    if not leaves:
        raise ValidationError(
            "explain_score supports term and boolean-of-term queries "
            "(MUST/SHOULD scoring clauses)",
            {"query": repr(query)},
        )
    pairs = [(leaf.field, leaf.term) for leaf in leaves]
    dfs = _lookup_term_stats(index, pairs)
    boosts = {(leaf.field, leaf.term): leaf.boost for leaf in leaves}

    post = index.postings
    cond = None
    for f, t in dict.fromkeys(pairs):
        c = (F.col("field") == f) & (F.col("term") == t)
        cond = c if cond is None else (cond | c)
    post = post.filter(cond & (F.col("doc_id") == int(doc_id))).select(
        "field", "term", "doc_id", "tf", "dl"
    )

    def fold(mapping: dict, cast: str):
        expr = None
        for (f, t), v in mapping.items():
            c = (F.col("field") == f) & (F.col("term") == t)
            lit = F.lit(v).cast(cast)
            expr = F.when(c, lit) if expr is None else expr.when(c, lit)
        return expr

    df_expr = fold({p: dfs.get(p, 0) for p in pairs}, "long")
    n_expr = fold(
        {p: index.field_stats(p[0])["N"] for p in pairs}, "long")
    avgdl_expr = fold(
        {p: index.field_stats(p[0])["avgdl"] for p in pairs}, "double")
    boost_expr = fold(boosts, "double")

    contribution = boost_expr * bm25.score_col(
        F.col("tf"), F.col("dl"), df_expr, n_expr, avgdl_expr
    )
    return (
        post.filter(df_expr > 0)
        .select(
            "field",
            "term",
            F.col("doc_id").cast("long").alias("doc_id"),
            F.col("tf").cast("long").alias("tf"),
            F.col("dl").cast("long").alias("dl"),
            bm25.quantized_dl_col(F.col("dl")).alias("qdl"),
            df_expr.alias("df"),
            F.round(bm25.idf_col(df_expr, n_expr), 6).alias("idf"),
            F.round(contribution, 6).alias("contribution"),
        )
        .orderBy("field", "term")
    )
