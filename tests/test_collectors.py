"""Collectors (count / facets / field-sort / explain) + highlighting.

Pins: count == full match-set size; facet counts == pandas recount;
field sort compiles to TakeOrderedAndProject (bounded heaps, no global
sort); explain rows sum to the search score and use the byte-quantized
dl; offsets tokenization is token-identical to Analyzer.tokens; snippet
goldens incl. window clipping, multi-match wrapping, original-text
punctuation, per-analyzer behavior.
"""

from __future__ import annotations

import pytest

from lucene_clj_spark import create_index
from lucene_clj_spark.analysis import Analyzer
from lucene_clj_spark.bm25 import quantize_length_np
from lucene_clj_spark.errors import ValidationError
from lucene_clj_spark.highlight import make_snippet, tokens_with_offsets

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


def test_count_hits_matches_match_set(idx):
    # OR of two terms: docs containing alpha or beta = 0,1,3,5
    n = idx.count_hits({"text": {"alpha", "beta"}}).collect()[0]["n_hits"]
    assert n == 4
    # AND: docs containing both = 0,1,3,5 too (all have both? check)
    n_and = idx.count_hits(["alpha", "beta"],
                           field_name="text").collect()[0]["n_hits"]
    assert n_and == 4
    n_term = idx.count_hits("gamma", field_name="text").collect()[0]["n_hits"]
    assert n_term == 3


def test_facets_counts(idx):
    rows = idx.facets({"text": {"alpha", "beta"}}, "lang").collect()
    got = {(r["facet_value"], r["n_docs"]) for r in rows}
    assert got == {("en", 2), ("de", 1), ("fr", 1)}
    # ordering: count desc, value asc
    assert [r["facet_value"] for r in rows] == ["en", "de", "fr"]
    # max_values truncates
    assert len(idx.facets({"text": {"alpha", "beta"}}, "lang",
                          max_values=1).collect()) == 1


def test_facets_rejects_unknown_field(idx):
    with pytest.raises(ValidationError):
        idx.facets("alpha", "nope", field_name="text")


def test_search_sorted_order_and_plan(idx):
    rows = idx.search_sorted("alpha", "n_chars", field_name="text",
                             results_per_page=3).collect()
    assert [(r["doc_id"], r["n_chars"]) for r in rows] == [
        (5, 60), (3, 40), (1, 20)]
    asc = idx.search_sorted("alpha", "n_chars", field_name="text",
                            ascending=True, results_per_page=2).collect()
    assert [(r["doc_id"], r["n_chars"]) for r in asc] == [(0, 10), (1, 20)]
    plan = idx.search_sorted("alpha", "n_chars", field_name="text")\
        ._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_explain_sums_to_search_score(idx):
    top = idx.search(["alpha", "beta"], field_name="text",
                     with_hit=False, results_per_page=1).collect()[0]
    rows = idx.explain_score(["alpha", "beta"], top["doc_id"],
                             field_name="text").collect()
    assert {r["term"] for r in rows} == {"alpha", "beta"}
    assert sum(r["contribution"] for r in rows) == pytest.approx(
        top["score"], abs=2e-6)
    for r in rows:
        assert r["qdl"] == int(quantize_length_np(r["dl"]))
        assert r["df"] > 0 and r["idf"] > 0


def test_explain_skips_absent_and_unscored_terms(idx):
    # doc 2 = "gamma delta": no alpha row
    rows = idx.explain_score(["gamma", "alpha"], 2,
                             field_name="text").collect()
    assert [r["term"] for r in rows] == ["gamma"]
    # MUST_NOT clause never contributes
    from lucene_clj_spark.query import parse_dsl
    ast = parse_dsl("gamma NOT delta", "text", idx.specs, idx.analyzers)
    rows = idx.explain_score(ast, 3).collect()
    assert [r["term"] for r in rows] == ["gamma"]
    with pytest.raises(ValidationError):
        idx.explain_score({"n_chars": 10}, 0)


# --- offsets tokenization parity ---------------------------------------

@pytest.mark.parametrize("kind,text", [
    ("standard", "Can't stop the A.B.C. mid,dle 3,141 foo_bar"),
    ("standard", "  spaces   and\ttabs\nnewlines  "),
    ("standard", "漢字かな Katakana カタカナ mixed"),
    ("simple", "Digits123 split456 on-digits and_underscores"),
    ("whitespace", "Case IS Kept here's,punct"),
    ("keyword", "One Whole Token, verbatim!"),
])
def test_offsets_tokens_match_analyzer(kind, text):
    an = Analyzer(kind)
    toks, base = tokens_with_offsets(text, an)
    assert [t for t, _s, _e in toks] == an.tokens(text)
    low_ok = kind in ("standard", "simple")
    for t, s, e in toks:
        raw = base[s:e]
        assert (raw.lower() if low_ok else raw) == t


def test_offsets_chunking_and_stop_words():
    an = Analyzer("standard", max_token_length=4)
    toks, _ = tokens_with_offsets("abcdefghij xy", an)
    assert [t for t, _s, _e in toks] == an.tokens("abcdefghij xy") \
        == ["abcd", "efgh", "ij", "xy"]
    assert [(s, e) for _t, s, e in toks] == [(0, 4), (4, 8), (8, 10),
                                             (11, 13)]
    an2 = Analyzer("standard", stop_words=frozenset({"the"}))
    toks2, _ = tokens_with_offsets("the quick the fox", an2)
    assert [t for t, _s, _e in toks2] == ["quick", "fox"]


# --- snippets -----------------------------------------------------------

STD = Analyzer("standard")


def test_snippet_window_and_wrapping():
    text = "a b c d target e f g h"
    s = make_snippet(text, STD, frozenset({"target"}), 3, "<em>", "</em>")
    assert s == "b c d <em>target</em> e f g"
    # clipped at the start
    s = make_snippet("target x y z w v u", STD, frozenset({"target"}),
                     3, "[", "]")
    assert s == "[target] x y z"
    # clipped at the end
    s = make_snippet("q w e r target", STD, frozenset({"target"}), 3,
                     "[", "]")
    assert s == "w e r [target]"
    # every match inside the window wraps, not just the first
    s = make_snippet("x target y target z", STD, frozenset({"target"}),
                     3, "[", "]")
    assert s == "x [target] y [target] z"
    # no match -> None
    assert make_snippet("nothing here", STD, frozenset({"target"}),
                        3, "[", "]") is None


def test_snippet_preserves_original_text():
    # standard analyzer lowercases tokens for MATCHING, but the snippet
    # slices the original text: casing + punctuation survive
    text = "Intro words... The Merge, then Window: done now."
    # first match "merge" is token 3; window 2 spans tokens 1..5
    s = make_snippet(text, STD, frozenset({"merge", "window"}), 2,
                     "<em>", "</em>")
    assert s == "words... The <em>Merge</em>, then <em>Window</em>"


def test_highlight_end_to_end(idx):
    out = idx.highlight({"text": {"beta", "gamma"}}, "text",
                        results_per_page=5, window=2).collect()
    assert len(out) == 5
    top = idx.search({"text": {"beta", "gamma"}}, with_hit=False,
                     results_per_page=5).collect()
    assert [r["doc_id"] for r in out] == [r["doc_id"] for r in top]
    assert [r["score"] for r in out] == pytest.approx(
        [r["score"] for r in top])
    by_id = {r["doc_id"]: r["snippet"] for r in out}
    # doc 1 "beta beta beta alpha": first beta at 0, window clips
    assert by_id[1] == "<em>beta</em> <em>beta</em> <em>beta</em>"
    with pytest.raises(ValidationError):
        idx.highlight({"n_chars": 10}, "text")
    with pytest.raises(ValidationError):
        idx.highlight("beta", "missing_field", field_name="text")


def test_highlight_null_when_field_unmatched(idx):
    # multi-field query: hit matches via lang, text lacks the term
    out = idx.highlight({"text": "nosuchterm", "lang": "de"}, "text",
                        strategy="dataframe").collect()
    assert out == [] or all(r["snippet"] is None for r in out)


def test_highlight_phrase_members(idx):
    out = idx.highlight("gamma delta", "text",
                        results_per_page=2, window=1).collect()
    assert out
    snip = {r["doc_id"]: r["snippet"] for r in out}
    assert snip[2] == "<em>gamma</em> <em>delta</em>"
