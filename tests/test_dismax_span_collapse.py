"""DisjunctionMaxQuery, SpanFirstQuery, field collapse.

Pins: dismax score == max + tie*(sum-max) recomputed from per-disjunct
score maps; tie=1 == the SHOULD-OR sum; the one-scan term fast path is
result-identical to the general union path; span_first freq == the
hand-counted positions-below-end tally fed through BM25 (and equals
the plain term query when end covers every position); collapse keeps
at most n hits per group and matches a pandas recount; the collapse
plan carries WindowGroupLimit (rank bound pushed before the shuffle).
"""

from __future__ import annotations

import math

import pytest

from lucene_clj_spark import create_index
from lucene_clj_spark.bm25 import B, K1, quantize_length_np
from lucene_clj_spark.errors import ValidationError
from lucene_clj_spark.query import (
    SHOULD,
    BoolQ,
    DisMaxQ,
    MUST,
    PhraseQ,
    SpanFirstQ,
    TermQ,
)
from lucene_clj_spark import search as S

ROWS = [
    (0, "alpha beta gamma delta epsilon zeta eta theta", "en", 10),
    (1, "beta beta beta alpha", "en", 20),
    (2, "gamma delta", "de", 30),
    (3, "alpha alpha beta gamma gamma gamma", "de", 40),
    (4, "zeta eta theta iota kappa", "fr", 50),
    (5, "alpha beta", "fr", 60),
]


@pytest.fixture(scope="module")
def idx(spark):
    df = spark.createDataFrame(
        ROWS, "doc_id long, text string, lang string, n_chars long"
    )
    return create_index(
        spark, df,
        {"text": "text", "lang": "keyword", "n_chars": "long"},
        id_column="doc_id",
    )


def _scores(df):
    return {r["doc_id"]: r["score"] for r in df.collect()}


def _node_scores(idx, node):
    return _scores(S.compile_node(idx, node))


DISJUNCTS = (
    TermQ(1.0, "text", "alpha"),
    BoolQ(1.0, ((SHOULD, TermQ(1.0, "text", "gamma")),
                (SHOULD, TermQ(1.0, "text", "delta")))),
)


def _expected_dismax(idx, disjuncts, tie, boost=1.0):
    maps = [_node_scores(idx, d) for d in disjuncts]
    docs = set().union(*maps)
    out = {}
    for d in docs:
        vals = [m[d] for m in maps if d in m]
        out[d] = boost * (max(vals) + tie * (sum(vals) - max(vals)))
    return out


def test_dismax_matches_per_disjunct_recombination(idx):
    for tie in (0.0, 0.3, 1.0):
        got = _node_scores(idx, DisMaxQ(1.0, DISJUNCTS, tie))
        want = _expected_dismax(idx, DISJUNCTS, tie)
        assert set(got) == set(want)
        for d in got:
            assert got[d] == pytest.approx(want[d], abs=1e-12)


def test_dismax_tie1_equals_should_or_sum(idx):
    # tie_breaker=1: max + 1*(sum-max) = sum — exactly the SHOULD-OR
    got = _node_scores(idx, DisMaxQ(1.0, DISJUNCTS, 1.0))
    or_node = BoolQ(1.0, tuple((SHOULD, d) for d in DISJUNCTS))
    want = _node_scores(idx, or_node)
    assert set(got) == set(want)
    for d in got:
        assert got[d] == pytest.approx(want[d], abs=1e-12)


def test_dismax_fast_path_equals_general_union(idx, monkeypatch):
    node = DisMaxQ(2.0, DISJUNCTS, 0.4)
    assert S._dismax_term_groups(node) is not None  # fast-path eligible
    fast = _node_scores(idx, node)
    monkeypatch.setattr(S, "_dismax_term_groups", lambda n: None)
    general = _node_scores(idx, node)
    assert set(fast) == set(general)
    for d in fast:
        assert fast[d] == pytest.approx(general[d], abs=1e-12)


def test_dismax_general_path_with_phrase_disjunct(idx):
    disjuncts = (
        PhraseQ(1.0, "text", ("alpha", "beta")),
        TermQ(1.0, "text", "gamma"),
    )
    node = DisMaxQ(1.0, disjuncts, 0.5)
    assert S._dismax_term_groups(node) is None  # phrase -> general path
    got = _node_scores(idx, node)
    want = _expected_dismax(idx, disjuncts, 0.5)
    assert set(got) == set(want)
    for d in got:
        assert got[d] == pytest.approx(want[d], abs=1e-12)


def test_dismax_boost_and_single_disjunct_docs(idx):
    # a doc matched by exactly one disjunct scores that disjunct alone
    # (tie never kicks in), scaled by the dismax boost
    node = DisMaxQ(3.0, DISJUNCTS, 0.7)
    got = _node_scores(idx, node)
    term_only = _node_scores(idx, DISJUNCTS[0])
    group_only = _node_scores(idx, DISJUNCTS[1])
    solo = {d for d in got if (d in term_only) ^ (d in group_only)}
    assert solo  # the fixture has single-disjunct matches
    for d in solo:
        base = term_only.get(d, group_only.get(d))
        assert got[d] == pytest.approx(3.0 * base, abs=1e-12)


def test_dismax_nested_inside_boolean(idx):
    inner = DisMaxQ(1.0, DISJUNCTS, 0.2)
    node = BoolQ(1.0, ((MUST, TermQ(1.0, "text", "beta")),
                       (SHOULD, inner)))
    got = _node_scores(idx, node)
    beta = _node_scores(idx, TermQ(1.0, "text", "beta"))
    dm = _node_scores(idx, inner)
    want = {d: s + dm.get(d, 0.0) for d, s in beta.items()}
    assert set(got) == set(want)
    for d in got:
        assert got[d] == pytest.approx(want[d], abs=1e-12)


def test_dismax_validation_and_empty(idx):
    with pytest.raises(ValidationError):
        idx.search(DisMaxQ(1.0, DISJUNCTS, 1.5), with_hit=False).collect()
    with pytest.raises(ValidationError):
        idx.search(DisMaxQ(1.0, DISJUNCTS, -0.1), with_hit=False).collect()
    assert _node_scores(idx, DisMaxQ(1.0, (), 0.0)) == {}
    # absent term in one disjunct: the other still serves
    node = DisMaxQ(1.0, (TermQ(1.0, "text", "zzznotaword"),
                         TermQ(1.0, "text", "alpha")), 0.3)
    assert set(_node_scores(idx, node)) == {0, 1, 3, 5}


# --- SpanFirstQuery ----------------------------------------------------


def test_span_first_match_set_and_freq(idx):
    # alpha at position 0: docs 0, 3, 5 (doc 1 has alpha at pos 3)
    got = _node_scores(idx, SpanFirstQ(1.0, "text", "alpha", 1))
    assert set(got) == {0, 3, 5}
    # end=4 admits doc 1 (pos 3) and doubles doc 3's freq (pos 0, 1)
    got4 = set(_node_scores(idx, SpanFirstQ(1.0, "text", "alpha", 4)))
    assert got4 == {0, 1, 3, 5}


def test_span_first_scores_hand_computed(idx):
    st = idx.field_stats("text")
    n, avgdl = st["N"], st["avgdl"]
    df_ = 4  # alpha appears in docs 0, 1, 3, 5
    idf = math.log(1.0 + (n - df_ + 0.5) / (df_ + 0.5))

    def bm25_score(freq, dl):
        qdl = float(quantize_length_np(__import__("numpy").array([dl]))[0])
        return idf * freq / (freq + K1 * (1 - B + B * qdl / avgdl))

    got = _node_scores(idx, SpanFirstQ(1.0, "text", "alpha", 2))
    # doc 0: alpha@0 (dl 8) freq 1; doc 3: alpha@0,1 (dl 6) freq 2;
    # doc 5: alpha@0 (dl 2) freq 1
    want = {0: bm25_score(1, 8), 3: bm25_score(2, 6), 5: bm25_score(1, 2)}
    assert set(got) == set(want)
    for d in got:
        assert got[d] == pytest.approx(want[d], abs=1e-12)


def test_span_first_covering_end_equals_term_query(idx):
    got = _node_scores(idx, SpanFirstQ(1.0, "text", "alpha", 10_000))
    want = _node_scores(idx, TermQ(1.0, "text", "alpha"))
    assert set(got) == set(want)
    for d in got:
        assert got[d] == pytest.approx(want[d], abs=1e-12)


def test_span_first_edge_cases(idx):
    assert _node_scores(idx, SpanFirstQ(1.0, "text", "alpha", 0)) == {}
    assert _node_scores(idx, SpanFirstQ(1.0, "text", "zzznope", 5)) == {}
    with pytest.raises(ValidationError):
        idx.search(SpanFirstQ(1.0, "text", "alpha", -1),
                   with_hit=False).collect()


# --- field collapse ----------------------------------------------------


def _full_hits(idx, query, **kw):
    return idx.search(query, results_per_page=100, with_hit=False,
                      **kw).collect()


def test_collapse_one_per_group(idx):
    rows = idx.search_collapsed({"text": {"alpha", "beta", "gamma"}},
                                "lang", results_per_page=10).collect()
    langs = [r["lang"] for r in rows]
    assert len(langs) == len(set(langs))  # at most one hit per lang
    # expected: best-scoring doc per lang from the FULL match set
    full = _full_hits(idx, {"text": {"alpha", "beta", "gamma"}})
    lang_of = {r[0]: r[2] for r in ROWS}
    best = {}
    for r in sorted(full, key=lambda r: (-r["score"], r["doc_id"])):
        best.setdefault(lang_of[r["doc_id"]], r["doc_id"])
    assert {r["doc_id"] for r in rows} == set(best.values())
    # ordering: score desc, doc_id asc
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_collapse_hits_per_group(idx):
    rows = idx.search_collapsed({"text": {"alpha", "beta", "gamma"}},
                                "lang", results_per_page=10,
                                hits_per_group=2).collect()
    from collections import Counter

    c = Counter(r["lang"] for r in rows)
    assert all(v <= 2 for v in c.values())
    assert c["en"] == 2  # both en docs match


def test_collapse_validation(idx):
    with pytest.raises(ValidationError):
        idx.search_collapsed("alpha", "nosuchfield", field_name="text")
    with pytest.raises(ValidationError):
        idx.search_collapsed("alpha", "lang", field_name="text",
                             hits_per_group=0)
    with pytest.raises(ValidationError):
        idx.search_collapsed("alpha", "lang", field_name="text",
                             results_per_page=0)


def test_collapse_plan_pushes_group_limit(idx):
    out = idx.search_collapsed("alpha", "lang", field_name="text")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan


# --- ConstantScoreQuery -------------------------------------------------


def test_constant_score_basic(idx):
    from lucene_clj_spark.query import ConstantScoreQ

    node = ConstantScoreQ(2.5, TermQ(1.0, "text", "alpha"))
    got = _node_scores(idx, node)
    want_docs = set(_node_scores(idx, TermQ(1.0, "text", "alpha")))
    assert got == {d: 2.5 for d in want_docs}
    # inner boosts don't leak: wrapping a boosted inner scores the same
    node_b = ConstantScoreQ(2.5, TermQ(7.0, "text", "alpha"))
    assert _node_scores(idx, node_b) == got


def test_constant_score_inside_boolean(idx):
    from lucene_clj_spark.query import ConstantScoreQ

    # merge-style bonus: BM25 on alpha, +2.0 flat if the doc has beta
    node = BoolQ(1.0, ((MUST, TermQ(1.0, "text", "alpha")),
                       (SHOULD, ConstantScoreQ(2.0, TermQ(1.0, "text",
                                                          "beta")))))
    got = _node_scores(idx, node)
    alpha = _node_scores(idx, TermQ(1.0, "text", "alpha"))
    beta = set(_node_scores(idx, TermQ(1.0, "text", "beta")))
    want = {d: s + (2.0 if d in beta else 0.0) for d, s in alpha.items()}
    assert set(got) == set(want)
    for d in got:
        assert got[d] == pytest.approx(want[d], abs=1e-12)


def test_constant_score_wraps_boolean_and_empty(idx):
    from lucene_clj_spark.query import ConstantScoreQ

    inner = BoolQ(1.0, ((MUST, TermQ(1.0, "text", "alpha")),
                        (MUST, TermQ(1.0, "text", "gamma"))))
    got = _node_scores(idx, ConstantScoreQ(1.0, inner))
    assert got == {d: 1.0 for d in _node_scores(idx, inner)}
    assert _node_scores(idx, ConstantScoreQ(1.0, None)) == {}


# --- numeric range facets ----------------------------------------------


def test_facet_ranges_counts_and_order(idx):
    # alpha matches docs 0 (n_chars 10), 1 (20), 3 (40), 5 (60)
    rows = idx.facet_ranges(
        "alpha", "n_chars",
        [("small", None, 25), ("mid", 25, 50), ("big", 50, None)],
        field_name="text",
    ).collect()
    assert [(r["facet_value"], r["n_docs"]) for r in rows] == [
        ("small", 2), ("mid", 1), ("big", 1),
    ]


def test_facet_ranges_overlap_open_and_empty(idx):
    rows = idx.facet_ranges(
        "alpha", "n_chars",
        [("all", None, None), ("le20", None, 21), ("ge20", 20, None),
         ("none", 1000, None)],
        field_name="text",
    ).collect()
    got = {r["facet_value"]: r["n_docs"] for r in rows}
    # overlapping ranges each count the doc (Lucene range semantics);
    # hi is exclusive, lo inclusive; empty ranges still reported
    assert got == {"all": 4, "le20": 2, "ge20": 3, "none": 0}


def test_facet_ranges_validation(idx):
    with pytest.raises(ValidationError):
        idx.facet_ranges("alpha", "nosuch", [("a", 0, 1)],
                         field_name="text")
    with pytest.raises(ValidationError):
        idx.facet_ranges("alpha", "n_chars", [], field_name="text")
    with pytest.raises(ValidationError):
        idx.facet_ranges("alpha", "n_chars", [("a", 0, 1), ("a", 1, 2)],
                         field_name="text")
