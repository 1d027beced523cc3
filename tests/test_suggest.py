"""Suggest subsystem goldens — mirror of reference lucene_test.clj
suggestions tests (:74-97, :169-180) and contract_test.clj (:159-174)."""

import pytest

from tests.conftest import names


def sugg(index, field, prefix, **opts):
    return index.suggest_(field, prefix, **opts)


def test_suggest_first_names_S(sample_index):
    got = names(sugg(sample_index, "first_name", "S"))
    assert sorted(got) == ["Sabu", "Shikari", "Stanley", "Suppandi"]


def test_suggest_first_names_Cha(sample_index):
    got = names(sugg(sample_index, "first_name", "Cha"))
    assert sorted(got) == ["Chacha", "Charlie"]


def test_suggest_with_context(sample_index):
    # without context: both Olivers; with context ["true"]: only Hardy
    got = names(sugg(sample_index, "first_name", "Oli"))
    assert sorted(got) == ["Oliver", "Oliver"]
    got_ctx = sugg(sample_index, "first_name", "Oli", contexts=["true"])
    rows = got_ctx.collect()
    assert [(r["first_name"], r["last_name"], r["real"]) for r in rows] == [
        ("Oliver", "Hardy", "True")
    ]


def test_suggest_max_results(sample_index):
    assert len(sugg(sample_index, "first_name", "S", max_results=2).collect()) == 2
    r4 = sugg(sample_index, "first_name", "S", max_results=4).collect()
    assert sorted(r["first_name"] for r in r4) == [
        "Sabu", "Shikari", "Stanley", "Suppandi",
    ]


def test_suggest_no_hidden_cap(sample_index):
    # contract_test.clj:159-167 — max_results honored beyond 10
    got = sugg(sample_index, "first_name", "S", max_results=15).collect()
    assert len(got) == 4  # all matches, no cap at play


def test_suggest_fuzzy(sample_index):
    # FuzzyCompletionQuery tolerance: "Olivr" ~ "Oliver" (1 edit)
    got = names(sugg(sample_index, "first_name", "Olivr", fuzzy=True))
    assert "Oliver" in got


def test_suggest_skip_duplicates(sample_index):
    got = names(
        sugg(sample_index, "first_name", "Oli", skip_duplicates=True)
    )
    assert got == ["Oliver"]


def test_suggest_validation(sample_index):
    from lucene_clj_spark.errors import ValidationError

    with pytest.raises(ValidationError):
        sugg(sample_index, "bio", "x")  # not suggest-enabled
    with pytest.raises(ValidationError):
        sugg(sample_index, "first_name", "S", max_results=0)
