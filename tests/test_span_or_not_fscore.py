"""SpanOrQ / SpanNotQ / FunctionScoreQ — hand-computed goldens.

SpanOrQuery: freq POOLS the clause tfs (positional union of width-1
spans) before ONE BM25 saturation; idf sums the present terms' idfs.
SpanNotQuery: include positions survive unless an exclude position
lands in [p - pre, p + post]; BM25 on the include term's FULL df.
FunctionScoreQuery: stored-field DoubleValuesSource — multiply
(boostByValue) / replace, NULL -> missing.
"""

from __future__ import annotations

import math

import pytest

from lucene_clj_spark import bm25, create_index
from lucene_clj_spark.errors import ValidationError
from lucene_clj_spark.query import (
    SHOULD,
    BoolQ,
    FunctionScoreQ,
    SpanNotQ,
    SpanOrQ,
    TermQ,
)

K1, B = bm25.K1, bm25.B

#          doc_id, text,            val
ROWS = [
    (0, "a b a", 10),
    (1, "a x x", 20),
    (2, "b y", None),     # NULL stored value -> `missing`
    (3, "z z z", 40),
    (4, "a z b z a b", 50),
]
N = 5
DLS = {0: 3, 1: 3, 2: 2, 3: 3, 4: 6}
AVGDL = sum(DLS.values()) / N
DF_A, DF_B = 3, 3  # a in {0,1,4}, b in {0,2,4}


@pytest.fixture(scope="module")
def idx(spark):
    df = spark.createDataFrame(ROWS, ["doc_id", "text", "val"])
    return create_index(
        spark, df, {"text": "text", "val": "long"}, id_column="doc_id"
    )


def _idf(df_: int) -> float:
    return math.log(1.0 + (N - df_ + 0.5) / (df_ + 0.5))


def _bm25(freq: float, dl: int, idf: float) -> float:
    return idf * freq / (freq + K1 * (1 - B + B * dl / AVGDL))


def _hits(out):
    return {r["doc_id"]: r["score"] for r in out.collect()}


# --- SpanOrQ ----------------------------------------------------------

def test_span_or_pools_tfs(idx):
    got = _hits(
        idx.search(SpanOrQ(1.0, "text", ("a", "b")), with_hit=False)
    )
    idf = _idf(DF_A) + _idf(DF_B)
    want = {
        0: _bm25(3, 3, idf),   # tf_a=2 + tf_b=1
        1: _bm25(1, 3, idf),
        2: _bm25(1, 2, idf),
        4: _bm25(4, 6, idf),
    }
    assert set(got) == set(want)
    for d, s in want.items():
        assert got[d] == pytest.approx(s, abs=1e-12)


def test_span_or_differs_from_bool_or(idx):
    """The pooled-tf saturation is NOT the per-term-saturate-then-sum
    of BoolQ(SHOULD) — doc 0 (tf 2+1) must disagree."""
    span = _hits(
        idx.search(SpanOrQ(1.0, "text", ("a", "b")), with_hit=False)
    )
    boolq = _hits(
        idx.search(
            BoolQ(1.0, ((SHOULD, TermQ(1.0, "text", "a")),
                        (SHOULD, TermQ(1.0, "text", "b")))),
            with_hit=False,
        )
    )
    assert span[0] != pytest.approx(boolq[0])


def test_span_or_absent_terms_skipped(idx):
    """df=0 clauses drop from matching AND the idf sum (the
    termStatistics-null contract)."""
    got = _hits(
        idx.search(SpanOrQ(1.0, "text", ("a", "nosuch")), with_hit=False)
    )
    idf = _idf(DF_A)
    assert got == {
        d: pytest.approx(_bm25(tf, DLS[d], idf), abs=1e-12)
        for d, tf in {0: 2, 1: 1, 4: 2}.items()
    }
    # all-absent -> empty, not an error
    out = idx.search(SpanOrQ(1.0, "text", ("nosuch",)), with_hit=False)
    assert out.count() == 0


def test_span_or_boost_and_dedup(idx):
    plain = _hits(
        idx.search(SpanOrQ(1.0, "text", ("a", "b")), with_hit=False)
    )
    boosted = _hits(
        idx.search(SpanOrQ(2.0, "text", ("a", "b", "a")), with_hit=False)
    )
    for d in plain:
        assert boosted[d] == pytest.approx(2 * plain[d], abs=1e-12)


def test_span_or_empty_raises(idx):
    with pytest.raises(ValidationError):
        idx.search(SpanOrQ(1.0, "text", ()), with_hit=False)


# --- SpanNotQ ---------------------------------------------------------

def test_span_not_zero_window_keeps_all(idx):
    """pre=post=0: width-1 spans only collide at the SAME position,
    impossible for distinct terms -> every include position survives
    (freq == tf), scores == the plain term query's."""
    got = _hits(
        idx.search(SpanNotQ(1.0, "text", "a", "b", 0, 0), with_hit=False)
    )
    term = _hits(idx.search(TermQ(1.0, "text", "a"), with_hit=False))
    assert got == term


def test_span_not_post_window(idx):
    # doc 0 "a b a": a@0 (b@1 in [0,1] -> rejected), a@2 survives
    # doc 4 "a z b z a b": a@0 (b in [0,1]? no), a@4 (b@5 -> rejected)
    got = _hits(
        idx.search(SpanNotQ(1.0, "text", "a", "b", 0, 1), with_hit=False)
    )
    idf = _idf(DF_A)
    want = {
        0: _bm25(1, 3, idf),
        1: _bm25(1, 3, idf),  # no b at all -> tf survives whole
        4: _bm25(1, 6, idf),
    }
    assert set(got) == set(want)
    for d, s in want.items():
        assert got[d] == pytest.approx(s, abs=1e-12)


def test_span_not_pre_window(idx):
    # pre=1, post=0: reject a@p iff b in [p-1, p]
    # doc 0: a@0 (b@1? [-1,0] no), a@2 (b@1 in [1,2] -> rejected)
    # doc 4: a@0 ([-1,0] no), a@4 (b@2? [3,4] no; b@5? no) survives both
    got = _hits(
        idx.search(SpanNotQ(1.0, "text", "a", "b", 1, 0), with_hit=False)
    )
    idf = _idf(DF_A)
    want = {0: _bm25(1, 3, idf), 1: _bm25(1, 3, idf),
            4: _bm25(2, 6, idf)}
    assert set(got) == set(want)
    for d, s in want.items():
        assert got[d] == pytest.approx(s, abs=1e-12)


def test_span_not_all_rejected_drops_doc(idx):
    # wide window: doc 0 and 4 lose every `a`; doc 1 (no b) keeps all
    got = _hits(
        idx.search(SpanNotQ(1.0, "text", "a", "b", 6, 6), with_hit=False)
    )
    assert set(got) == {1}


def test_span_not_uses_include_full_df(idx):
    """BM25 idf stays the include term's FULL df even when the window
    filters positions — compare doc 1 against the plain term score."""
    got = _hits(
        idx.search(SpanNotQ(1.0, "text", "a", "b", 0, 1), with_hit=False)
    )
    term = _hits(idx.search(TermQ(1.0, "text", "a"), with_hit=False))
    assert got[1] == pytest.approx(term[1], abs=1e-12)


def test_span_not_validation(idx):
    with pytest.raises(ValidationError):
        idx.search(SpanNotQ(1.0, "text", "a", "b", -1, 0),
                   with_hit=False)
    # absent include -> empty
    out = idx.search(SpanNotQ(1.0, "text", "nosuch", "b", 0, 0),
                     with_hit=False)
    assert out.count() == 0


# --- FunctionScoreQ ---------------------------------------------------

def test_function_score_multiply(idx):
    inner = TermQ(1.0, "text", "b")
    term = _hits(idx.search(inner, with_hit=False))
    got = _hits(
        idx.search(
            FunctionScoreQ(1.0, inner, "val", "multiply", 0.0),
            with_hit=False,
        )
    )
    vals = {0: 10.0, 2: 0.0, 4: 50.0}  # doc 2 NULL -> missing=0
    assert set(got) == set(term)
    for d in term:
        assert got[d] == pytest.approx(term[d] * vals[d], abs=1e-9)


def test_function_score_replace_and_missing(idx):
    got = _hits(
        idx.search(
            FunctionScoreQ(1.0, TermQ(1.0, "text", "b"), "val",
                           "replace", 7.5),
            with_hit=False,
        )
    )
    assert got == {0: 10.0, 2: 7.5, 4: 50.0}


def test_function_score_boost_and_nesting(idx):
    inner = TermQ(1.0, "text", "b")
    base = _hits(
        idx.search(FunctionScoreQ(1.0, inner, "val", "replace", 0.0),
                   with_hit=False)
    )
    boosted = _hits(
        idx.search(FunctionScoreQ(3.0, inner, "val", "replace", 0.0),
                   with_hit=False)
    )
    for d in base:
        assert boosted[d] == pytest.approx(3 * base[d], abs=1e-12)
    # nested inside a boolean SHOULD: contributes its value-score
    term_a = _hits(idx.search(TermQ(1.0, "text", "a"), with_hit=False))
    nested = _hits(
        idx.search(
            BoolQ(1.0, ((SHOULD, TermQ(1.0, "text", "a")),
                        (SHOULD, FunctionScoreQ(1.0, inner, "val",
                                                "replace", 0.0)))),
            with_hit=False,
        )
    )
    assert nested[4] == pytest.approx(term_a[4] + 50.0, abs=1e-9)


def test_function_score_validation(idx):
    with pytest.raises(ValidationError):
        idx.search(
            FunctionScoreQ(1.0, TermQ(1.0, "text", "b"), "val", "bogus"),
            with_hit=False,
        )
    with pytest.raises(ValidationError):
        idx.search(
            FunctionScoreQ(1.0, TermQ(1.0, "text", "b"), "nosuch_field",
                           "multiply"),
            with_hit=False,
        )
    # empty inner -> empty result
    out = idx.search(FunctionScoreQ(1.0, None, "val", "multiply"),
                     with_hit=False)
    assert out.count() == 0
