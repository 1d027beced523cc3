"""search_batch: M queries in one job, result-identical per query to
index.search. Each shape in the supported one-level family is pinned
against the single-query path on the reference sample corpus."""

from __future__ import annotations

import pytest

from lucene_clj_spark.errors import ValidationError
from lucene_clj_spark.query import parse_dsl


def _hits(df):
    return [
        (r["doc_id"], round(r["score"], 6))
        for r in df.orderBy(df.score.desc(), df.doc_id.asc()).collect()
    ]


def _batch_hits(df, qid):
    rows = [r for r in df.collect() if r["query_id"] == qid]
    rows.sort(key=lambda r: (-r["score"], r["doc_id"]))
    return [(r["doc_id"], round(r["score"], 6)) for r in rows]


SHAPES = {
    "term": ("antics", {"field_name": "bio"}),
    "and_pair": (["strong", "antics"], {"field_name": "bio"}),
    "or_set": ({"bio": {"strong", "peace", "antics"}}, {}),
    "multi_field": ({"bio": "antics", "gender": "m"}, {}),
}


def test_batch_matches_single_query_per_shape(sample_index):
    queries = {qid: q for qid, (q, _) in SHAPES.items()}
    # field_name applies batch-wide; the shapes that need it are
    # strings/lists, the rest carry their own fields
    out = sample_index.search_batch(
        queries, field_name="bio", results_per_page=10
    )
    assert out.columns == ["query_id", "doc_id", "score"]
    for qid, (q, opts) in SHAPES.items():
        single = sample_index.search(
            q, results_per_page=10, with_hit=False, **opts
        )
        assert _batch_hits(out, qid) == _hits(single), qid


def test_batch_fuzzy_matches_single(sample_index):
    out = sample_index.search_batch(
        {"fz": {"bio": "stron"}}, fuzzy=True, results_per_page=10
    )
    single = sample_index.search(
        {"bio": "stron"}, fuzzy=True, results_per_page=10, with_hit=False
    )
    assert _batch_hits(out, "fz") == _hits(single)


def test_batch_dsl_not_and_groups(sample_index):
    dsl = "(strong OR peace) NOT kryptonite"
    node = parse_dsl(dsl, "bio", sample_index.specs, sample_index.analyzers)
    out = sample_index.search_batch({"q": node}, results_per_page=10)
    single = sample_index.search(node, results_per_page=10, with_hit=False)
    assert _batch_hits(out, "q") == _hits(single)
    assert len(_batch_hits(out, "q")) > 0


def test_batch_boost_rides(sample_index):
    node = parse_dsl(
        "strong^3 antics", "bio", sample_index.specs,
        sample_index.analyzers,
    )
    out = sample_index.search_batch({"b": node}, results_per_page=10)
    single = sample_index.search(node, results_per_page=10, with_hit=False)
    assert _batch_hits(out, "b") == _hits(single)


def test_missing_must_term_empties_only_that_query(sample_index):
    out = sample_index.search_batch(
        {
            "dead": ["antics", "zzzznotaword"],
            "alive": "antics",
        },
        field_name="bio",
    )
    assert _batch_hits(out, "dead") == []
    assert _batch_hits(out, "alive") == _hits(
        sample_index.search("antics", field_name="bio", with_hit=False)
    )


def test_missing_should_term_is_dropped_not_fatal(sample_index):
    out = sample_index.search_batch(
        {"q": {"bio": {"antics", "zzzznotaword"}}}
    )
    single = sample_index.search(
        {"bio": {"antics"}}, with_hit=False
    )
    assert _batch_hits(out, "q") == _hits(single)


def test_batch_k_bounds_each_query(sample_index):
    out = sample_index.search_batch(
        {"a": "antics", "b": {"bio": {"strong", "love"}}},
        field_name="bio", results_per_page=2,
    )
    assert len(_batch_hits(out, "a")) == 2
    assert len(_batch_hits(out, "b")) == 2


def test_batch_with_hit_fetches_stored_columns(sample_index):
    out = sample_index.search_batch(
        {"q": "antics"}, field_name="bio", with_hit=True,
        hit_columns=["first_name", "last_name"],
    )
    rows = out.collect()
    assert out.columns == [
        "query_id", "doc_id", "score", "first_name", "last_name"
    ]
    assert all(r["first_name"] for r in rows)


def test_batch_rejects_phrase_and_empty(sample_index):
    with pytest.raises(ValidationError):
        sample_index.search_batch({"p": "wonderful innocent"},
                                  field_name="bio")
    with pytest.raises(ValidationError):
        sample_index.search_batch({})


def test_batch_df_matches_dict_variant(sample_index, spark):
    """search_batch_df on the explicit clause relation == search_batch
    on the equivalent query dict (singleton clauses)."""
    node = parse_dsl(
        "(strong OR peace) NOT kryptonite", "bio",
        sample_index.specs, sample_index.analyzers,
    )
    dict_out = sample_index.search_batch(
        {
            "and2": ["strong", "antics"],
            "or3": {"bio": {"strong", "peace", "antics"}},
            "term": "antics",
            "notq": node,
        },
        field_name="bio",
    )
    rows = [
        ("and2", "bio", "strong", 1.0, "MUST"),
        ("and2", "bio", "antics", 1.0, "MUST"),
        ("or3", "bio", "strong", 1.0, "SHOULD"),
        ("or3", "bio", "peace", 1.0, "SHOULD"),
        ("or3", "bio", "antics", 1.0, "SHOULD"),
        ("term", "bio", "antics", 1.0, "SHOULD"),
        ("notq", "bio", "strong", 1.0, "SHOULD"),
        ("notq", "bio", "peace", 1.0, "SHOULD"),
        ("notq", "bio", "kryptonite", 1.0, "MUST_NOT"),
    ]
    qdf = spark.createDataFrame(
        rows, "query_id string, field string, term string, "
        "boost double, occ string",
    )
    df_out = sample_index.search_batch_df(qdf)
    for qid in ("and2", "or3", "term", "notq"):
        assert _batch_hits(df_out, qid) == _batch_hits(dict_out, qid), qid


def test_batch_df_missing_must_empties_query(sample_index, spark):
    qdf = spark.createDataFrame(
        [("dead", "bio", "antics"), ("dead", "bio", "zzqqnotaword"),
         ("alive", "bio", "antics")],
        "query_id string, field string, term string",
    )  # no boost/occ columns: defaults SHOULD... but force MUST:
    from pyspark.sql import functions as F

    qdf = qdf.withColumn(
        "occ",
        F.when(F.col("query_id") == "dead", "MUST").otherwise("SHOULD"),
    )
    out = sample_index.search_batch_df(qdf)
    assert _batch_hits(out, "dead") == []
    assert _batch_hits(out, "alive") == _hits(
        sample_index.search("antics", field_name="bio", with_hit=False)
    )


def test_batch_df_default_columns(sample_index, spark):
    qdf = spark.createDataFrame(
        [("q", "bio", "antics")],
        "query_id string, field string, term string",
    )
    out = sample_index.search_batch_df(qdf)
    assert _batch_hits(out, "q") == _hits(
        sample_index.search("antics", field_name="bio", with_hit=False)
    )


def test_batch_df_validates_columns(sample_index, spark):
    qdf = spark.createDataFrame([("q", "antics")],
                                "query_id string, term string")
    with pytest.raises(ValidationError):
        sample_index.search_batch_df(qdf)


def test_batch_df_rejects_malformed_occ(sample_index, spark):
    qdf = spark.createDataFrame(
        [("q", "bio", "antics", "SHULD")],
        "query_id string, field string, term string, occ string",
    )
    with pytest.raises(ValidationError):
        sample_index.search_batch_df(qdf)


def _rarest_terms(index, doc_id, field, n):
    from pyspark.sql import functions as F

    doc_terms = {
        r["term"]
        for r in index.postings.filter(
            (F.col("field") == field) & (F.col("doc_id") == doc_id)
        ).select("term").collect()
    }
    stats = index.terms.filter(
        (F.col("field") == field) & F.col("term").isin(list(doc_terms))
    ).select("term", "df").collect()
    ranked = sorted(stats, key=lambda r: (r["df"], r["term"]))
    return [r["term"] for r in ranked[:n]]


def test_more_like_this_matches_or_query(sample_index):
    """MLT for one doc == an OR query over that doc's n rarest terms,
    with the self-match dropped."""
    terms = _rarest_terms(sample_index, 0, "bio", 5)
    expected = [
        h for h in _hits(
            sample_index.search({"bio": set(terms)}, with_hit=False,
                                results_per_page=13)
        ) if h[0] != 0
    ][:3]
    mlt = sample_index.more_like_this(
        "bio", top_terms=5, results_per_page=3
    )
    got = [
        (r["doc_id"], round(r["score"], 6))
        for r in mlt.collect() if r["query_doc_id"] == 0
    ]
    assert got == expected


def test_more_like_this_no_self_by_default(sample_index):
    mlt = sample_index.more_like_this("bio", top_terms=5).collect()
    assert mlt and all(r["query_doc_id"] != r["doc_id"] for r in mlt)
    with_self = sample_index.more_like_this(
        "bio", top_terms=5, include_self=True
    ).collect()
    # every doc's own terms match itself; with include_self the self
    # row exists and is that doc's best hit
    best = {}
    for r in with_self:
        q = r["query_doc_id"]
        if q not in best or (-r["score"], r["doc_id"]) < best[q][0]:
            best[q] = ((-r["score"], r["doc_id"]), r["doc_id"])
    assert all(doc == q for q, (_, doc) in best.items())


def test_more_like_this_max_df(sample_index):
    """max_df=1 restricts query terms to hapaxes: every returned
    score must then come from terms no other doc shares... meaning NO
    matches at all (a df-1 term exists in exactly one doc — the query
    doc itself, which is excluded)."""
    mlt = sample_index.more_like_this("bio", top_terms=5, max_df=1)
    assert mlt.count() == 0


def test_duplicated_docs_score_bit_identically(spark):
    """Canonical-order score summation: verbatim copies of a doc must
    receive BIT-identical batch/MLT scores regardless of partition
    arrival order — plain F.sum adds in arrival order and IEEE
    addition is not associative, which broke top-k tie selection on
    the 320x-duplicated sf1 corpus (copies 1 ulp apart)."""
    from pyspark.sql import functions as F

    from lucene_clj_spark import create_index
    from tests.conftest import SAMPLE_COLUMNS, SAMPLE_ROWS

    copies = 64
    rows = [
        (i + c * len(SAMPLE_ROWS), *r)
        for c in range(copies)
        for i, r in enumerate(SAMPLE_ROWS)
    ]
    df = spark.createDataFrame(
        rows, ["doc_id"] + SAMPLE_COLUMNS
    ).repartition(8)
    idx = create_index(
        spark, df.select("doc_id", "bio"), {"bio": "text"},
        id_column="doc_id",
    )
    out = idx.search_batch(
        {"q": {"bio": {"strong", "antics", "love", "peace", "soul"}}},
        results_per_page=13 * copies,
    ).collect()
    by_base = {}
    for r in out:
        by_base.setdefault(r["doc_id"] % 13, set()).add(r["score"])
    # every copy family collapses to ONE full-precision score
    assert by_base and all(len(s) == 1 for s in by_base.values()), {
        k: len(v) for k, v in by_base.items()
    }
    mlt = idx.more_like_this(
        "bio", doc_ids=range(13), top_terms=5,
        results_per_page=13 * copies, include_self=True,
    ).collect()
    per_q = {}
    for r in mlt:
        per_q.setdefault(
            (r["query_doc_id"], r["doc_id"] % 13), set()
        ).add(r["score"])
    assert per_q and all(len(s) == 1 for s in per_q.values())


def test_batch_plan_shape(sample_index):
    """ONE postings scan serves the whole batch (not one per query),
    and the per-query top-k is map-side bounded: Spark compiles the
    row_number window with WindowGroupLimit Partial BEFORE the
    query_id exchange, so a wide-matching query forwards at most
    k * n_partitions rows into the shuffle."""
    import re

    out = sample_index.search_batch(
        {f"q{i}": {"bio": {"strong", "antics"}} for i in range(8)}
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    scans = len(re.findall(
        r"InMemoryTableScan|Scan parquet|LocalTableScan", plan
    ))
    assert scans == 1, plan
    assert plan.count("WindowGroupLimit") == 2, plan  # Partial + Final
