"""SpanNearQ (Lucene SpanNearQuery over single-term clauses) —
ordered (NearSpansOrdered minimal-completion greedy) and unordered
(sloppy greedy over unshifted positions with the span bias).
Match rule: matchSlop = covering-interval-length - k <= slop; each
match weighs 1/(1+matchSlop); BM25 over the float freq with summed
idfs (the sloppy-family scorer). Hand-computed goldens below."""

from __future__ import annotations

import math

import pytest

from lucene_clj_spark import bm25, create_index
from lucene_clj_spark.errors import ValidationError
from lucene_clj_spark.query import (
    MUST,
    SHOULD,
    BoolQ,
    SpanNearQ,
    TermQ,
    render,
)

K1, B = bm25.K1, bm25.B

ROWS = [
    (0, "a x b"),        # a@0 b@2: ms=1 both directions
    (1, "b a"),          # ordered no match; unordered ms=0
    (2, "a b a"),        # ordered 1 match; unordered 2 matches
    (3, "a y y b"),      # ms=2
    (4, "x b a z b"),    # ordered w=1/2; unordered 1 + 1/2
    (5, "a b c"),        # 3-clause adjacency
]


@pytest.fixture(scope="module")
def idx(spark):
    df = spark.createDataFrame(ROWS, ["doc_id", "text"])
    return create_index(spark, df, {"text": "text"}, id_column="doc_id")


def _idf(df_: int, n: int) -> float:
    return math.log(1.0 + (n - df_ + 0.5) / (df_ + 0.5))


def _score(freq: float, dl: int, idf: float, avgdl: float) -> float:
    return idf * freq / (freq + K1 * (1 - B + B * dl / avgdl))


N, AVGDL = 6, 20 / 6
IDF_AB = _idf(6, N) + _idf(6, N)  # a and b occur in every doc


def _hits(out):
    return {r["doc_id"]: r["score"] for r in out.collect()}


def test_ordered_matches_and_weights(idx):
    got = _hits(idx.search(
        SpanNearQ(1.0, "text", ("a", "b"), 1, True),
        results_per_page=10, with_hit=False))
    # d0 ms=1 w=1/2; d1 none; d2 one adjacent match w=1; d3 ms=2
    # over slop; d4 a@2->b@4 ms=1 w=1/2; d5 adjacent w=1
    assert set(got) == {0, 2, 4, 5}
    assert got[0] == pytest.approx(_score(0.5, 3, IDF_AB, AVGDL))
    assert got[2] == pytest.approx(_score(1.0, 3, IDF_AB, AVGDL))
    assert got[4] == pytest.approx(_score(0.5, 5, IDF_AB, AVGDL))
    assert got[5] == pytest.approx(_score(1.0, 3, IDF_AB, AVGDL))


def test_unordered_admits_reversed(idx):
    got = _hits(idx.search(
        SpanNearQ(1.0, "text", ("a", "b"), 1, False),
        results_per_page=10, with_hit=False))
    assert set(got) == {0, 1, 2, 4, 5}
    # d1 "b a": interval 2, ms=0, full weight
    assert got[1] == pytest.approx(_score(1.0, 2, IDF_AB, AVGDL))
    # d2 "a b a": two ms=0 matches
    assert got[2] == pytest.approx(_score(2.0, 3, IDF_AB, AVGDL))
    # d4: (b,a) ms=0 + (a,b) ms=1 -> 1.5
    assert got[4] == pytest.approx(_score(1.5, 5, IDF_AB, AVGDL))


def test_slop_gates_distance(idx):
    got0 = _hits(idx.search(SpanNearQ(1.0, "text", ("a", "b"), 0, True),
                            results_per_page=10, with_hit=False))
    assert set(got0) == {2, 5}  # only exact adjacency
    got2 = _hits(idx.search(SpanNearQ(1.0, "text", ("a", "b"), 2, True),
                            results_per_page=10, with_hit=False))
    assert 3 in got2  # d3 ms=2 admitted, weight 1/3
    idf = IDF_AB
    assert got2[3] == pytest.approx(_score(1 / 3, 4, idf, AVGDL))


def test_three_clause_ordered(idx):
    got = _hits(idx.search(
        SpanNearQ(1.0, "text", ("a", "b", "c"), 0, True),
        results_per_page=10, with_hit=False))
    assert set(got) == {5}
    idf3 = _idf(6, N) + _idf(6, N) + _idf(1, N)
    assert got[5] == pytest.approx(_score(1.0, 3, idf3, AVGDL))


def test_boolean_nesting_and_boost(idx):
    base = _hits(idx.search(SpanNearQ(1.0, "text", ("a", "b"), 1, True),
                            results_per_page=10, with_hit=False))
    boosted = _hits(idx.search(
        SpanNearQ(2.0, "text", ("a", "b"), 1, True),
        results_per_page=10, with_hit=False))
    for d, sc in base.items():
        assert boosted[d] == pytest.approx(2.0 * sc)
    combo = _hits(idx.search(
        BoolQ(1.0, ((MUST, TermQ(1.0, "text", "x")),
                    (SHOULD, SpanNearQ(1.0, "text", ("a", "b"), 1,
                                       True)))),
        results_per_page=10, with_hit=False))
    assert set(combo) == {0, 4}  # docs containing x
    idf_x = _idf(2, N)
    assert combo[0] == pytest.approx(
        _score(1.0, 3, idf_x, AVGDL) + base[0])


def test_validation_and_render(idx):
    with pytest.raises(ValidationError):
        idx.search(SpanNearQ(1.0, "text", ("a",), 0, True),
                   with_hit=False)
    with pytest.raises(ValidationError):
        idx.search(SpanNearQ(1.0, "text", ("a", "a"), 0, True),
                   with_hit=False)
    with pytest.raises(ValidationError):
        idx.search(SpanNearQ(1.0, "text", ("a", "b"), -1, True),
                   with_hit=False)
    # absent term -> empty, not an error (Lucene: no matching spans)
    assert idx.search(SpanNearQ(1.0, "text", ("a", "zzz"), 1, True),
                      with_hit=False).count() == 0
    assert (render(SpanNearQ(1.0, "t", ("a", "b"), 2, True))
            == "spanNear([t:a, t:b], 2, true)")
    assert (render(SpanNearQ(2.0, "t", ("a", "b"), 0, False))
            == "(spanNear([t:a, t:b], 0, false))^2.0")
