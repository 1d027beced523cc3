"""DirectSpellChecker analogue (spell.py) — dictionary "did you mean"
with Lucene's public defaults: Damerau candidates within max_edits
sharing the first prefix_length chars, similarity
1 - d/min(|q|,|cand|) with the 0.5 accuracy floor, the
common-query-term gate (max_query_frequency), the
more-frequent-than-the-typo rule for existing terms, and
(score desc, df desc, term asc) ranking."""

from __future__ import annotations

import pytest

from lucene_clj_spark import create_index
from lucene_clj_spark.errors import ValidationError

ROWS = [
    (0, "store store store merge"),
    (1, "store merge window"),
    (2, "stork merge window window"),
    (3, "story merge"),
    (4, "sore merge"),
    (5, "tore merge"),
]


@pytest.fixture(scope="module")
def idx(spark):
    df = spark.createDataFrame(ROWS, ["doc_id", "text"])
    return create_index(spark, df, {"text": "text"}, id_column="doc_id")


def _sug(out):
    return [(r["suggestion"], r["df"], round(r["score"], 6))
            for r in out.collect()]


def test_basic_correction_scores_and_order(idx):
    # 'stre': store (+o, d=1, score 1-1/4=.75), stork (d=2, .5),
    # story (d=2, .5), sore (d=1 delete t... 'stre'->'sore': replace
    # t->o = 1 edit, score 1-1/4=.75). 'tore' fails the first-char
    # prefix. Ties (.75): store df=2 > sore df=1; (.5): stork vs
    # story by term asc.
    got = _sug(idx.spell_suggest("text", "stre"))
    assert got == [
        ("store", 2, 0.75),
        ("sore", 1, 0.75),
        ("stork", 1, 0.5),
        ("story", 1, 0.5),
    ]


def test_transposition_is_one_edit(idx):
    # 'sotre' -> 'store' is ONE transposition: score 1 - 1/5 = 0.8
    got = _sug(idx.spell_suggest("text", "sotre"))
    assert ("store", 2, 0.8) in got


def test_accuracy_floor(idx):
    got = _sug(idx.spell_suggest("text", "stre", accuracy=0.6))
    assert got == [("store", 2, 0.75), ("sore", 1, 0.75)]


def test_prefix_length_zero_admits_other_first_chars(idx):
    got = dict(
        (s, d) for s, d, _ in
        _sug(idx.spell_suggest("text", "stre", prefix_length=0))
    )
    assert "tore" in got  # d=1 ('s' deleted), no prefix requirement


def test_existing_term_needs_more_frequent_suggestion(idx):
    # 'stork' exists (df 1): only candidates with df > 1 may be
    # suggested — 'store' (df 2) qualifies, 'story'/'sore' (df 1) do
    # not. Also: a df-1 term in a 6-doc corpus is under the 1% gate
    # only if we widen it; use max_query_frequency=0.5 to pass the
    # common-term gate (1/6 > 0.01 default would return empty).
    got = _sug(idx.spell_suggest(
        "text", "stork", max_query_frequency=0.5))
    assert all(d > 1 for _, d, _ in got)
    assert got and got[0][0] == "store"


def test_common_query_term_gate(idx):
    # 'merge' df=6/6 docs — way past max_query_frequency: no
    # suggestions, the term is not a typo
    assert idx.spell_suggest("text", "merge").count() == 0


def test_k_and_validation(idx):
    assert len(_sug(idx.spell_suggest("text", "stre", k=1))) == 1
    with pytest.raises(ValidationError):
        idx.spell_suggest("text", "")
    with pytest.raises(ValidationError):
        idx.spell_suggest("text", "stre", max_edits=3)
    with pytest.raises(ValidationError):
        idx.spell_suggest("nope", "stre")
