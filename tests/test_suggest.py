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


def test_disk_fuzzy_suggest_partition_prunes(spark, tmp_path):
    """Round-5 layout contract: the suggest table is directory-
    partitioned by first completion char (indexer._write_suggest), so
    the FUZZY probe's first-char-exact prune is a real PartitionFilters
    prune — the scan reads one ckey1 directory, not the whole table."""
    import os

    from lucene_clj_spark import create_index
    from lucene_clj_spark.indexer import Index

    docs = spark.read.parquet(
        "/root/testdata/sf0.01/documents.parquet"
    ).limit(200)
    path = str(tmp_path / "sugidx2")
    create_index(
        spark, docs,
        {"text": "text",
         "source": {"type": "keyword", "suggest": {"weight": 2}}},
        id_column="doc_id", path=path, index_type="disk",
        re_create=True, ignore_extra_columns=True,
    )
    # the layout itself: ckey1=<char> directories on disk
    subdirs = {d for d in os.listdir(f"{path}/suggest")
               if d.startswith("ckey1=")}
    assert subdirs, "suggest table must be first-char partitioned"
    idx = Index.load(spark, path)
    out = idx.suggest_("source", "sre1", fuzzy=True, with_hit=False)
    s = out._jdf.queryExecution().executedPlan().toString()
    pf = s.split("PartitionFilters", 1)
    assert len(pf) == 2, "fuzzy suggest scan has no PartitionFilters"
    assert "ckey1" in pf[1][:300]
    # results identical to an in-memory (unpartitioned) index
    mem = create_index(
        spark, docs,
        {"text": "text",
         "source": {"type": "keyword", "suggest": {"weight": 2}}},
        id_column="doc_id", ignore_extra_columns=True,
    )
    want = [(r["doc_id"], r["completion"], r["score"])
            for r in mem.suggest_("source", "sre1", fuzzy=True,
                                  with_hit=False).collect()]
    got = [(r["doc_id"], r["completion"], r["score"])
           for r in out.collect()]
    assert got == want
    # exact-prefix probes prune too
    out2 = idx.suggest_("source", "sr", with_hit=False)
    s2 = out2._jdf.queryExecution().executedPlan().toString()
    assert "ckey1" in s2.split("PartitionFilters", 1)[1][:300]


def test_suggest_validation(sample_index):
    from lucene_clj_spark.errors import ValidationError

    with pytest.raises(ValidationError):
        sugg(sample_index, "bio", "x")  # not suggest-enabled
    with pytest.raises(ValidationError):
        sugg(sample_index, "first_name", "S", max_results=0)


def test_suggest_sees_appended_documents(spark, tmp_path):
    """add_documents must extend the suggest table too (Lucene's
    completion postings are written per segment, so a reopened reader
    suggests freshly indexed docs) — on a DISK index the append goes
    through the on-disk suggest dir, and a reload must also see it."""
    from lucene_clj_spark import create_index
    from lucene_clj_spark.indexer import Index
    from tests.conftest import SAMPLE_COLUMNS, SAMPLE_FIELDS, SAMPLE_ROWS

    rows = [(i, *r) for i, r in enumerate(SAMPLE_ROWS)]
    df = spark.createDataFrame(rows, ["doc_id"] + SAMPLE_COLUMNS)
    base = df.filter("doc_id < 5")
    extra = df.filter("doc_id >= 5")
    path = str(tmp_path / "sug_append_idx")
    idx = create_index(
        spark, base, SAMPLE_FIELDS, id_column="doc_id",
        path=path, index_type="disk", re_create=True,
    )
    before = {r["first_name"] for r in
              idx.suggest_("first_name", "S").collect()}
    idx.add_documents(extra)
    after = {r["first_name"] for r in
             idx.suggest_("first_name", "S").collect()}
    # the appended half contributes new completions
    appended_names = {r[0] for r in SAMPLE_ROWS[5:] if r[0].startswith("S")}
    assert appended_names, "sample split must put S-names in the append"
    assert after == before | appended_names
    # context filtering still derives from the appended rows' fields
    reopened = Index.load(spark, path)
    got = {r["first_name"] for r in
           reopened.suggest_("first_name", "S").collect()}
    assert got == after
    # a COLD reopen cannot round-trip the callable contexts_from: a
    # further append through it must fail with the re-supply hint,
    # and Index.load(contexts_fns=...) must make it work again
    from lucene_clj_spark.errors import ValidationError

    extra2 = spark.createDataFrame(
        [(100, "Sherlock", "Holmes", "60", "false", "m", "Detective.")],
        ["doc_id"] + SAMPLE_COLUMNS,
    )
    with pytest.raises(ValidationError, match="contexts_fns"):
        reopened.add_documents(extra2)
    resupplied = Index.load(
        spark, path,
        contexts_fns={"first_name": lambda doc: [doc["real"].lower()]},
    )
    resupplied.add_documents(extra2)
    rows = resupplied.suggest_(
        "first_name", "Sherl", contexts=["false"]
    ).collect()
    assert [r["first_name"] for r in rows] == ["Sherlock"]
