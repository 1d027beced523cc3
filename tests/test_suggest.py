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


def test_disk_suggest_plan_prunes(spark, tmp_path):
    """On a persisted index, a prefix suggest must (a) push the
    StartsWith predicate into the parquet scan (range-partitioned,
    key-sorted files -> row-group min/max skipping) and (b) run top-k
    as TakeOrderedAndProject, not a global sort — the §2.5 scale
    contract."""
    from lucene_clj_spark import create_index
    from lucene_clj_spark.indexer import Index

    docs = spark.read.parquet(
        "/root/testdata/sf0.01/documents.parquet"
    ).limit(200)
    path = str(tmp_path / "sugidx")
    create_index(
        spark, docs,
        {"text": "text",
         "source": {"type": "keyword", "suggest": {"weight": 2}}},
        id_column="doc_id", path=path, index_type="disk",
        re_create=True, ignore_extra_columns=True,
    )
    idx = Index.load(spark, path)
    out = idx.suggest_("source", "sr", with_hit=False)
    s = out._jdf.queryExecution().executedPlan().toString()
    # the PushedFilters list is elided in toString; the prefix shows
    assert "StringStartsWith(completion_" in s
    assert "EqualTo(field,source)" in s
    assert "TakeOrderedAndProject" in s
    assert out.count() >= 0  # executes cleanly


def test_suggest_validation(sample_index):
    from lucene_clj_spark.errors import ValidationError

    with pytest.raises(ValidationError):
        sugg(sample_index, "bio", "x")  # not suggest-enabled
    with pytest.raises(ValidationError):
        sugg(sample_index, "first_name", "S", max_results=0)
