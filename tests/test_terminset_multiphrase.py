"""TermInSetQ (Lucene TermInSetQuery) + MultiPhraseQ (Lucene
MultiPhraseQuery) — prebuilt-only passthrough surface (reference
query.clj:50-52 passes ``Query`` instances through untouched; these
nodes are that surface's set-membership and synonym-phrase members).

Semantics pinned here:
- TermInSetQuery: constant-score rewrite — every doc containing >=1
  set term scores exactly boost, one row per doc, terms VERBATIM.
- MultiPhraseQuery: exact-adjacency phrase with per-slot alternatives;
  freq counts phrase occurrences with union-deduplicated slot
  positions; idf sums every PRESENT (slot, term) entry (absent
  alternatives drop out like Lucene's null termStatistics at df 0).
"""

from __future__ import annotations

import math

import pytest

from lucene_clj_spark import bm25, create_index
from lucene_clj_spark.errors import ValidationError
from lucene_clj_spark.query import (
    MUST,
    SHOULD,
    BoolQ,
    MultiPhraseQ,
    PhraseQ,
    TermInSetQ,
    TermQ,
    render,
)

K1, B = bm25.K1, bm25.B


def _idf(df_: int, n: int) -> float:
    return math.log(1.0 + (n - df_ + 0.5) / (df_ + 0.5))


def _bm25(tf: int, dl: int, idf: float, avgdl: float) -> float:
    # dl below 16 is quantization-exact (int4 identity range)
    return idf * tf / (tf + K1 * (1 - B + B * dl / avgdl))


ROWS = [
    (0, "the app store sells apps"),
    (1, "the application store is busy"),
    (2, "app nothing here store"),
    (3, "store app the the"),
    (4, "unrelated words only"),
    (5, "a store b store"),
]


@pytest.fixture(scope="module")
def idx(spark):
    df = spark.createDataFrame(ROWS, ["doc_id", "text"])
    return create_index(spark, df, {"text": "text"}, id_column="doc_id")


def _hits(out):
    return [(r["doc_id"], r["score"]) for r in out.collect()]


# --- TermInSetQuery -----------------------------------------------------

def test_term_in_set_constant_score_union(idx):
    out = idx.search(
        TermInSetQ(1.0, "text", ("app", "application", "missing")),
        results_per_page=10, with_hit=False,
    )
    # docs 0,2,3 contain 'app'; doc 1 'application'; one row per doc,
    # flat score (docID asc at equal scores)
    assert _hits(out) == [(0, 1.0), (1, 1.0), (2, 1.0), (3, 1.0)]


def test_term_in_set_boost_and_multi_match_dedup(idx):
    # doc 0 contains BOTH 'app' and 'apps' -> still one row, score =
    # boost (constant-score: matching twice is not worth more)
    out = idx.search(
        TermInSetQ(2.5, "text", ("app", "apps")),
        results_per_page=10, with_hit=False,
    )
    assert _hits(out) == [(0, 2.5), (2, 2.5), (3, 2.5)]


def test_term_in_set_verbatim_terms(idx):
    # Lucene TermInSetQuery takes BytesRef terms verbatim — no
    # analyzer normalization; 'APP' does not match the lowercased index
    out = idx.search(
        TermInSetQ(1.0, "text", ("APP",)), with_hit=False
    )
    assert out.count() == 0


def test_term_in_set_empty_and_unknown_field(idx):
    assert idx.search(
        TermInSetQ(1.0, "text", ()), with_hit=False
    ).count() == 0
    assert idx.search(
        TermInSetQ(1.0, "nope", ("app",)), with_hit=False
    ).count() == 0


def test_term_in_set_inside_boolean(idx):
    # MUST term + SHOULD TermInSet: BM25('the') plus flat 2.0 for set
    # members
    out = idx.search(
        BoolQ(1.0, ((MUST, TermQ(1.0, "text", "the")),
                    (SHOULD, TermInSetQ(2.0, "text", ("app",))))),
        results_per_page=10, with_hit=False,
    )
    got = dict(_hits(out))
    n, avgdl = 6, 25 / 6
    idf_the = _idf(3, n)
    assert got[0] == pytest.approx(_bm25(1, 5, idf_the, avgdl) + 2.0)
    assert got[3] == pytest.approx(_bm25(2, 4, idf_the, avgdl) + 2.0)
    assert got[1] == pytest.approx(_bm25(1, 5, idf_the, avgdl))
    assert 2 not in got  # no 'the'


def test_term_in_set_render(idx):
    assert render(TermInSetQ(1.0, "text", ("a", "b"))) == "text:(a b)"
    assert render(TermInSetQ(2.0, "f", ("x",))) == "(f:(x))^2.0"


def test_term_in_set_disk_plan_prunes(spark, tmp_path):
    """Scale contract: ONE postings scan with the IN predicate pushed
    to the reader, the set's bucket directories partition-pruned, no
    positions read, bounded top-k heap."""
    rows = [(i, f"alpha{i} beta gamma") for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, t string")
    idx = create_index(
        spark, df, {"t": "text"}, id_column="doc_id",
        path=str(tmp_path / "idx"), index_type="disk", re_create=True,
    )
    out = idx.search(
        TermInSetQ(1.0, "t", ("alpha3", "alpha7")),
        results_per_page=5, with_hit=False,
    )
    s = out._jdf.queryExecution().executedPlan().toString()
    assert s.count("Scan parquet") == 1  # one scan, not per-term
    assert "In(term, [alpha3,alpha7])" in s
    read_schema = s.split("ReadSchema:", 1)[1].splitlines()[0]
    assert "positions" not in read_schema
    assert _hits(out) == [(3, 1.0), (7, 1.0)]


# --- MultiPhraseQuery ---------------------------------------------------

def test_multi_phrase_synonym_slot(idx):
    out = idx.search(
        MultiPhraseQ(1.0, "text", (("app", "application"), ("store",))),
        results_per_page=10, with_hit=False,
    )
    got = dict(_hits(out))
    assert set(got) == {0, 1}
    n, avgdl = 6, 25 / 6
    idf_sum = _idf(3, n) + _idf(1, n) + _idf(5, n)  # app+application+store
    assert got[0] == pytest.approx(_bm25(1, 5, idf_sum, avgdl))
    assert got[1] == pytest.approx(_bm25(1, 5, idf_sum, avgdl))


def test_multi_phrase_single_slots_match_phrase_query(idx):
    mp = idx.search(
        MultiPhraseQ(1.0, "text", (("app",), ("store",))),
        results_per_page=10, with_hit=False,
    )
    ph = idx.search(
        PhraseQ(1.0, "text", ("app", "store")),
        results_per_page=10, with_hit=False,
    )
    assert _hits(mp) == _hits(ph)


def test_multi_phrase_freq_counts_distinct_occurrences(idx):
    # doc 5 "a store b store": slot0 alternatives a|b match at 0 and
    # 2, anchor 'store' at 1 and 3 -> freq 2
    out = idx.search(
        MultiPhraseQ(1.0, "text", (("a", "b"), ("store",))),
        results_per_page=10, with_hit=False,
    )
    got = dict(_hits(out))
    assert set(got) == {5}
    n, avgdl = 6, 25 / 6
    idf_sum = _idf(1, n) + _idf(1, n) + _idf(5, n)
    assert got[5] == pytest.approx(_bm25(2, 4, idf_sum, avgdl))


def test_multi_phrase_absent_alternative_drops_out(idx):
    # an absent alternative contributes neither matches nor idf
    # (Lucene termStatistics is null at df 0) — identical result to
    # the query without it
    w = idx.search(
        MultiPhraseQ(1.0, "text", (("app", "zzzz"), ("store",))),
        results_per_page=10, with_hit=False,
    )
    wo = idx.search(
        MultiPhraseQ(1.0, "text", (("app",), ("store",))),
        results_per_page=10, with_hit=False,
    )
    assert _hits(w) == _hits(wo)


def test_multi_phrase_edges(idx):
    # zero slots -> MatchNoDocs; fully-absent slot -> no match;
    # empty slot -> Builder.add rejection
    assert idx.search(
        MultiPhraseQ(1.0, "text", ()), with_hit=False
    ).count() == 0
    assert idx.search(
        MultiPhraseQ(1.0, "text", (("zzzz",), ("store",))),
        with_hit=False,
    ).count() == 0
    with pytest.raises(ValidationError):
        idx.search(
            MultiPhraseQ(1.0, "text", (("app",), ())), with_hit=False
        )


def test_multi_phrase_boost_scales_linearly(idx):
    base = dict(_hits(idx.search(
        MultiPhraseQ(1.0, "text", (("app", "application"), ("store",))),
        results_per_page=10, with_hit=False)))
    boosted = dict(_hits(idx.search(
        MultiPhraseQ(3.0, "text", (("app", "application"), ("store",))),
        results_per_page=10, with_hit=False)))
    for d, s in base.items():
        assert boosted[d] == pytest.approx(3.0 * s)


def test_multi_phrase_render():
    assert (
        render(MultiPhraseQ(1.0, "t", (("a", "b"), ("c",))))
        == 't:"(a b) c"'
    )
