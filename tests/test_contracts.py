"""Contract/validation + typed round-trip tests — mirror of reference
contract_test.clj and document_test.clj (SURVEY.md §5 levels 2-4)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from lucene_clj_spark.errors import (
    CardinalityError,
    SchemaError,
    UnknownFieldError,
    ValidationError,
    ValueTypeError,
)
from lucene_clj_spark.schema import FieldSpec, normalize_field_specs
from lucene_clj_spark.values import normalize_value


# --- schema validation (contract_test.clj:176-186, schema.clj:93-109) --

def test_unknown_type_rejected():
    with pytest.raises(SchemaError):
        normalize_field_specs({"f": "strange"})


def test_empty_schema_rejected():
    with pytest.raises(SchemaError):
        normalize_field_specs({})


def test_legacy_bucketed_options_rejected():
    with pytest.raises(SchemaError):
        normalize_field_specs({"stored-fields": ["a"]})


def test_suggest_only_on_text_keyword():
    with pytest.raises(SchemaError):
        normalize_field_specs({"n": {"type": "long", "suggest": {"weight": 2}}})


def test_field_must_do_something():
    with pytest.raises(SchemaError):
        normalize_field_specs({"f": {"type": "text", "stored": False,
                                     "indexed": False}})


def test_suggest_weight_positive():
    with pytest.raises(SchemaError):
        normalize_field_specs({"f": {"type": "text",
                                     "suggest": {"weight": 0}}})


def test_defaults_applied():
    specs = normalize_field_specs({"f": "text"})
    fs = specs["f"]
    assert fs.stored and fs.indexed and not fs.multi_valued
    assert fs.suggest is None


# --- value normalization (document_test.clj:36-83, values.clj) ---------

def test_nil_text_raises():
    with pytest.raises(ValueTypeError):
        normalize_value("text", None)


def test_nested_map_raises():
    with pytest.raises(ValueTypeError):
        normalize_value("text", {"a": 1})


def test_collection_on_single_valued_raises():
    with pytest.raises(CardinalityError):
        normalize_value("text", ["a", "b"], multi_valued=False)


def test_multi_valued_normalizes_to_list():
    assert normalize_value("keyword", ("a", "b"), multi_valued=True) == ["a", "b"]
    assert normalize_value("keyword", "a", multi_valued=True) == ["a"]


def test_long_range_checked():
    assert normalize_value("long", 2**63 - 1) == 2**63 - 1
    with pytest.raises(ValueTypeError):
        normalize_value("long", 2**63)
    with pytest.raises(ValueTypeError):
        normalize_value("long", "42")


def test_double_finiteness():
    assert normalize_value("double", 1.5) == 1.5
    with pytest.raises(ValueTypeError):
        normalize_value("double", float("nan"))
    with pytest.raises(ValueTypeError):
        normalize_value("double", float("inf"))


def test_boolean_strict():
    assert normalize_value("boolean", True) is True
    with pytest.raises(ValueTypeError):
        normalize_value("boolean", "true")


def test_instant_epoch_millis():
    t = dt.datetime(2024, 1, 2, 3, 4, 5, tzinfo=dt.timezone.utc)
    assert normalize_value("instant", t) == int(t.timestamp() * 1000)


def test_text_coercions():
    import uuid

    assert normalize_value("text", 42) == "42"
    assert normalize_value("text", True) == "true"
    u = uuid.uuid4()
    assert normalize_value("text", u) == str(u)


# --- property tests (values_property_test.clj:28-37) -------------------

def test_property_text_normalization_total():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    scalars = st.one_of(
        st.text(max_size=30), st.integers(), st.booleans(),
        st.floats(allow_nan=False, allow_infinity=False), st.uuids(),
    )

    @settings(max_examples=100, deadline=None)
    @given(scalars)
    def check(v):
        out = normalize_value("text", v)
        assert isinstance(out, str)

    check()


def test_property_multi_value_cardinality_preserved():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=100, deadline=None)
    @given(st.lists(st.text(max_size=10), max_size=8))
    def check(vs):
        out = normalize_value("keyword", vs, multi_valued=True)
        assert len(out) == len(vs)

    check()


# --- typed round-trip + reopen persistence (contract_test.clj:53-151) --

@pytest.fixture(scope="module")
def typed_index(spark, tmp_path_factory):
    from lucene_clj_spark import create_index

    rows = [
        (0, "alpha", 1999, 4.5, dt.datetime(2020, 1, 1, tzinfo=dt.timezone.utc),
         True),
        (1, "beta", 2005, 3.25, dt.datetime(2021, 6, 2, tzinfo=dt.timezone.utc),
         False),
        (2, "gamma", 1999, 4.5, dt.datetime(2020, 1, 1, tzinfo=dt.timezone.utc),
         False),
    ]
    df = spark.createDataFrame(
        rows, ["doc_id", "title", "year", "rating", "published_at", "active"]
    )
    path = str(tmp_path_factory.mktemp("idx") / "typed")
    return create_index(
        spark,
        df,
        {
            "title": "keyword",
            "year": "long",
            "rating": "double",
            "published_at": "instant",
            "active": "boolean",
        },
        id_column="doc_id",
        path=path,
        index_type="disk",
        re_create=True,
    )


def test_exact_long(typed_index):
    got = typed_index.search({"year": 1999}).collect()
    assert sorted(r["title"] for r in got) == ["alpha", "gamma"]


def test_exact_double(typed_index):
    got = typed_index.search({"rating": 3.25}).collect()
    assert [r["title"] for r in got] == ["beta"]


def test_exact_boolean(typed_index):
    got = typed_index.search({"active": True}).collect()
    assert [r["title"] for r in got] == ["alpha"]


def test_exact_instant(typed_index):
    t = dt.datetime(2021, 6, 2, tzinfo=dt.timezone.utc)
    got = typed_index.search({"published_at": t}).collect()
    assert [r["title"] for r in got] == ["beta"]


def test_exact_keyword(typed_index):
    got = typed_index.search({"title": "alpha"}).collect()
    assert [r["doc_id"] for r in got] == [0]


def test_typed_value_on_wrong_field_raises(typed_index):
    with pytest.raises(ValueTypeError):
        typed_index.search({"title": 42}).collect()
    with pytest.raises(ValueTypeError):
        typed_index.search({"year": True}).collect()


def test_reopen_persists_field_specs(spark, typed_index):
    """Schema travels with the index (contract_test.clj:90-119)."""
    from lucene_clj_spark import Index

    reopened = Index.load(spark, typed_index.path)
    assert reopened.specs["year"].type == "long"
    got = reopened.search({"year": 1999}).collect()
    assert sorted(r["title"] for r in got) == ["alpha", "gamma"]


def test_session_reuse(sample_index):
    """contract_test.clj:153-157 — one session, many searches."""
    from lucene_clj_spark import open_session

    with open_session(sample_index) as s:
        a = s.search({"bio": "love"}).collect()
        b = s.search({"bio": "antics"}).collect()
        c = s.suggest("first_name", "S").collect()
        assert a and b and c


# --- create/index option validation (contract_test.clj:14-26) ----------

def test_create_index_validation(spark, sample_docs):
    from lucene_clj_spark import create_index

    with pytest.raises(ValidationError):
        create_index(spark, sample_docs, {"first_name": "text"},
                     index_type="weird")
    with pytest.raises(ValidationError):
        create_index(spark, sample_docs, {"first_name": "text"},
                     index_type="disk")  # no path
    with pytest.raises(UnknownFieldError):
        create_index(spark, sample_docs, {"first_name": "text"},
                     id_column=None, order_by=["first_name"])


# --- instant exact on TIMESTAMP_NTZ columns (parquet default) ----------

def test_exact_instant_ntz_column(spark, tmp_path_factory):
    """Parquet timestamps load as TIMESTAMP_NTZ in Spark 4; the instant
    exact query must cast before unix_millis (regression: the events
    table's ts column)."""
    from lucene_clj_spark import create_index

    p = str(tmp_path_factory.mktemp("ntz") / "t.parquet")
    df = spark.createDataFrame(
        [(0, "a", dt.datetime(2024, 1, 1)), (1, "b", dt.datetime(2024, 1, 2))],
        "doc_id long, title string, at timestamp",
    ).withColumn("at", F.col("at").cast("timestamp_ntz"))
    df.write.mode("overwrite").parquet(p)
    loaded = spark.read.parquet(p)
    assert "timestamp_ntz" in loaded.schema["at"].dataType.simpleString()
    idx = create_index(
        spark, loaded, {"title": "keyword", "at": "instant"},
        id_column="doc_id",
    )
    got = idx.search(
        {"at": dt.datetime(2024, 1, 2, tzinfo=dt.timezone.utc)}
    ).collect()
    assert [r["doc_id"] for r in got] == [1]


def test_instant_exact_session_tz_independent(spark):
    """Instant exact queries on TIMESTAMP_NTZ columns must not depend
    on spark.sql.session.timeZone (ADVICE r01): the NTZ wall clock is
    interpreted as UTC via an NTZ-literal range, never cast through the
    session zone."""
    from lucene_clj_spark import create_index

    df = spark.sql(
        "SELECT * FROM VALUES "
        "(0, TIMESTAMP_NTZ '2024-01-01 00:00:00', 'alpha'), "
        "(1, TIMESTAMP_NTZ '2024-01-02 00:00:00', 'beta') "
        "AS t(doc_id, at, body)"
    )
    idx = create_index(
        spark, df, {"at": "instant", "body": "text"}, id_column="doc_id"
    )
    old = spark.conf.get("spark.sql.session.timeZone")
    try:
        for tz in ("UTC", "Asia/Kolkata", "America/New_York"):
            spark.conf.set("spark.sql.session.timeZone", tz)
            got = idx.search(
                {"at": dt.datetime(2024, 1, 2, tzinfo=dt.timezone.utc)}
            ).collect()
            assert [r["doc_id"] for r in got] == [1], tz
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)


def test_truncate_clears_index(spark):
    """clear! analogue (reference indexer.clj:68-77): docs/postings/
    terms empty, stats zeroed, term-stats cache dropped."""
    from lucene_clj_spark import create_index

    df = spark.createDataFrame(
        [(0, "alpha beta"), (1, "beta gamma")], "doc_id long, body string"
    )
    idx = create_index(spark, df, {"body": "text"}, id_column="doc_id")
    assert idx.search("beta", field_name="body").count() == 2
    idx.truncate()
    assert idx.docs.count() == 0
    assert idx.postings.count() == 0
    assert idx.terms.count() == 0
    assert idx.stats["body"]["N"] == 0


def test_truncate_disk_index_clears_disk(spark, tmp_path):
    """A persisted index's truncate must clear the DISK as well
    (reference deleteAll+commit, indexer.clj:68-77): reopening the
    path yields an empty index, segments/manifests are gone, and a
    rebuilt index over the path works (VERDICT r01 missing-item 4)."""
    import os

    from lucene_clj_spark import create_index
    from lucene_clj_spark.indexer import Index
    from lucene_clj_spark.segments import build_segments

    path = str(tmp_path / "trunc_idx")
    df = spark.createDataFrame(
        [(0, "alpha beta"), (1, "beta gamma")], "doc_id long, body string"
    )
    idx = create_index(
        spark, df, {"body": "text"}, id_column="doc_id",
        path=path, index_type="disk", re_create=True,
    )
    build_segments(idx, n_buckets=2, chunk_span=64, block_size=16)
    assert os.path.isdir(os.path.join(path, "segments"))
    idx.truncate()
    assert idx.search("beta", field_name="body").count() == 0
    assert not os.path.isdir(os.path.join(path, "segments"))
    assert not os.path.isdir(os.path.join(path, "manifests"))
    reopened = Index.load(spark, path)
    assert reopened.docs.count() == 0
    assert reopened.postings.count() == 0
    assert reopened.terms.count() == 0
    assert reopened.stats["body"]["N"] == 0
    assert reopened.search("beta", field_name="body").count() == 0


def test_truncate_disk_then_add_documents(spark, tmp_path):
    """clear! then index! on a DISK index (reference usage pattern):
    the post-truncate postings dir must stay compatible with the
    partitioned append layout — Spark must be able to read the result
    (ADVICE r02: the flat empty relation + bucket= dirs mix was
    unreadable)."""
    from lucene_clj_spark import create_index
    from lucene_clj_spark.indexer import Index

    path = str(tmp_path / "trunc_add_idx")
    schema = "doc_id long, body string"
    idx = create_index(
        spark, spark.createDataFrame([(0, "alpha beta")], schema),
        {"body": "text"}, id_column="doc_id",
        path=path, index_type="disk", re_create=True,
    )
    idx.truncate()
    idx.add_documents(
        spark.createDataFrame([(5, "gamma delta"), (6, "delta")], schema)
    )
    got = idx.search("delta", field_name="body", with_hit=False)
    assert sorted(r["doc_id"] for r in got.collect()) == [5, 6]
    # the old (pre-truncate) corpus must NOT resurrect
    assert idx.search("alpha", field_name="body").count() == 0
    reopened = Index.load(spark, path)
    assert reopened.docs.count() == 2
    assert reopened.search("gamma", field_name="body").count() == 1


def test_write_custom_buckets_then_add_documents(spark, tmp_path):
    """Index.write(path, n_buckets=N) followed by add_documents on the
    SAME object must append under the recorded bucket layout, not the
    default — otherwise the query-time bucket pruning misses the
    appended postings (ADVICE r02)."""
    import os

    from lucene_clj_spark import create_index

    path = str(tmp_path / "nb_idx")
    schema = "doc_id long, body string"
    idx = create_index(
        spark, spark.createDataFrame([(0, "alpha beta")], schema),
        {"body": "text"}, id_column="doc_id",
    )
    idx.write(path, n_buckets=4)
    assert idx.buckets == 4
    idx.add_documents(spark.createDataFrame([(1, "beta gamma")], schema))
    buckets = {
        d for d in os.listdir(os.path.join(path, "postings"))
        if d.startswith("bucket=")
    }
    assert all(int(b.split("=")[1]) < 4 for b in buckets)
    # pruned query still sees the appended posting
    got = idx.search("gamma", field_name="body", with_hit=False)
    assert [r["doc_id"] for r in got.collect()] == [1]


def test_add_documents_identical_to_single_build(spark):
    """Repeated index! (reference indexer.clj:89-111): an incremental
    add must produce the SAME index as one batch build over the union —
    postings, term dictionary, corpus stats, and therefore scores."""
    from lucene_clj_spark import create_index

    a = [(0, "alpha beta gamma"), (1, "beta gamma delta")]
    b = [(2, "alpha alpha epsilon"), (3, "beta zeta")]
    schema = "doc_id long, body string"
    fields = {"body": "text"}
    idx = create_index(spark, spark.createDataFrame(a, schema), fields,
                       id_column="doc_id")
    idx.add_documents(spark.createDataFrame(b, schema))
    ref = create_index(spark, spark.createDataFrame(a + b, schema), fields,
                       id_column="doc_id")
    assert idx.stats == ref.stats
    t1 = sorted(map(tuple, idx.terms.collect()))
    t2 = sorted(map(tuple, ref.terms.collect()))
    assert t1 == t2
    for q in ("beta", "alpha", "epsilon"):
        got = idx.search(q, field_name="body", with_hit=False).collect()
        want = ref.search(q, field_name="body", with_hit=False).collect()
        assert [(r["doc_id"], round(r["score"], 12)) for r in got] == [
            (r["doc_id"], round(r["score"], 12)) for r in want
        ], q
    # stored-field retrieval covers the appended docs too
    hit = idx.search("epsilon", field_name="body").collect()
    assert [r["body"] for r in hit] == ["alpha alpha epsilon"]


def test_add_documents_rejects_id_collision(spark):
    from lucene_clj_spark import create_index
    from lucene_clj_spark.errors import ValidationError

    schema = "doc_id long, body string"
    idx = create_index(
        spark, spark.createDataFrame([(0, "alpha")], schema),
        {"body": "text"}, id_column="doc_id",
    )
    with pytest.raises(ValidationError):
        idx.add_documents(spark.createDataFrame([(0, "beta")], schema))


def test_add_documents_interrupted_append_refuses(spark, tmp_path):
    """A surviving _append_pending.json marks a partial append: both
    reopen and further appends must refuse instead of silently
    double-counting postings (code-review r02 finding 1)."""
    import json
    import os

    from lucene_clj_spark import create_index
    from lucene_clj_spark.errors import ValidationError
    from lucene_clj_spark.indexer import APPEND_PENDING, Index

    path = str(tmp_path / "pend_idx")
    schema = "doc_id long, body string"
    idx = create_index(
        spark, spark.createDataFrame([(0, "alpha")], schema),
        {"body": "text"}, id_column="doc_id",
        path=path, index_type="disk", re_create=True,
    )
    with open(os.path.join(path, APPEND_PENDING), "w") as f:
        json.dump({"n_new_docs": 1}, f)
    with pytest.raises(ValidationError, match="interrupted append"):
        Index.load(spark, path)
    with pytest.raises(ValidationError, match="interrupted append"):
        idx.add_documents(spark.createDataFrame([(1, "beta")], schema))
    os.remove(os.path.join(path, APPEND_PENDING))
    idx.add_documents(spark.createDataFrame([(1, "beta")], schema))
    assert not os.path.exists(os.path.join(path, APPEND_PENDING))
    assert Index.load(spark, path).docs.count() == 2


def test_add_documents_missing_stored_columns_raises(spark):
    from lucene_clj_spark import create_index
    from lucene_clj_spark.errors import ValidationError

    idx = create_index(
        spark,
        spark.createDataFrame([(0, "alpha", "en")],
                              "doc_id long, body string, lang string"),
        {"body": "text", "lang": "keyword"}, id_column="doc_id",
    )
    with pytest.raises(ValidationError, match="missing stored columns"):
        idx.add_documents(
            spark.createDataFrame([(1, "beta")], "doc_id long, body string")
        )


def test_add_documents_disk_appends_delta_segments(spark, tmp_path):
    """Append to a disk index with built segments: the base segment
    files are NOT invalidated — the batch lands as delta blocks
    (Lucene's flush-then-merge model), and segment-kernel answers
    include the new docs without a build_segments rerun."""
    import os

    from lucene_clj_spark import create_index
    from lucene_clj_spark.indexer import Index
    from lucene_clj_spark.segments import build_segments

    path = str(tmp_path / "app_idx")
    schema = "doc_id long, body string"
    idx = create_index(
        spark, spark.createDataFrame([(0, "alpha beta")], schema),
        {"body": "text"}, id_column="doc_id",
        path=path, index_type="disk", re_create=True,
    )
    build_segments(idx, n_buckets=2, chunk_span=64, block_size=16)
    idx.add_documents(
        spark.createDataFrame([(1, "beta gamma"), (2, "gamma")], schema)
    )
    # segments stay valid; the append is recorded as a delta manifest
    assert os.path.isdir(os.path.join(path, "segments"))
    manifests = os.listdir(os.path.join(path, "manifests"))
    assert any(m.startswith("delta_") for m in manifests)
    assert idx.search("gamma", field_name="body",
                      with_hit=False).count() == 2
    reopened = Index.load(spark, path)
    assert reopened.docs.count() == 3
    assert reopened.stats["body"]["N"] == 3
    got = reopened.search("beta", field_name="body", with_hit=False)
    assert sorted(r["doc_id"] for r in got.collect()) == [0, 1]
    # the kernel path answers over base + delta WITHOUT a rebuild,
    # score-identical to the exhaustive DataFrame path
    from lucene_clj_spark.wand import wand_topk

    kern = wand_topk(reopened, "body", ["beta", "gamma"], k=10).collect()
    exhaustive = reopened.search(
        {"beta", "gamma"}, field_name="body", with_hit=False,
        strategy="dataframe",
    ).collect()
    assert [(r["doc_id"], r["score"]) for r in kern] == [
        (r["doc_id"], r["score"]) for r in exhaustive
    ]


def test_multi_valued_text_field(spark):
    """Multi-valued text: tf sums across values; phrases can match
    across value boundaries (Lucene's default position-increment gap
    is 0 for StandardAnalyzer)."""
    from lucene_clj_spark import create_index

    df = spark.createDataFrame(
        [(0, ["red fox", "fox den"]), (1, ["blue bird"])],
        "doc_id long, body array<string>",
    )
    idx = create_index(
        spark, df, {"body": {"type": "text", "multi_valued": True}},
        id_column="doc_id",
    )
    rows = idx.postings.filter(F.col("term") == "fox").collect()
    assert len(rows) == 1 and rows[0]["tf"] == 2 and rows[0]["dl"] == 4
    # cross-value phrase "fox fox" exists at positions (1,2)
    got = idx.search("fox fox", field_name="body", with_hit=False).collect()
    assert [r["doc_id"] for r in got] == [0]


def test_multi_valued_text_with_null_element(spark):
    """Null elements inside a multi-valued text array are dropped
    (null-safe join), matching the previous F.array_join behavior."""
    from lucene_clj_spark import create_index

    df = spark.createDataFrame(
        [(0, ["red fox", None]), (1, None)],
        "doc_id long, body array<string>",
    )
    idx = create_index(
        spark, df, {"body": {"type": "text", "multi_valued": True}},
        id_column="doc_id",
    )
    got = idx.search("fox", field_name="body", with_hit=False).collect()
    assert [r["doc_id"] for r in got] == [0]


def test_empty_corpus_index_searches_empty(spark):
    """An index over zero documents yields zeroed stats and empty
    search results, not a missing-stats error."""
    from lucene_clj_spark import create_index

    df = spark.createDataFrame([], "doc_id long, body string")
    idx = create_index(spark, df, {"body": "text"}, id_column="doc_id")
    assert idx.stats["body"] == {"N": 0, "sum_dl": 0, "avgdl": 0.0}
    assert idx.search("anything", field_name="body").count() == 0


def test_empty_disk_index_create_then_stream_pattern(spark, tmp_path):
    """Day-one streaming pattern: create an EMPTY disk index, append
    into it, reopen. Requires the persisted table schemas (empty
    parquet dirs have nothing to infer from)."""
    from lucene_clj_spark import create_index
    from lucene_clj_spark.indexer import Index

    schema = "doc_id long, body string"
    path = str(tmp_path / "empty_idx")
    idx = create_index(
        spark, spark.createDataFrame([], schema), {"body": "text"},
        id_column="doc_id", path=path, index_type="disk", re_create=True,
    )
    assert idx.docs.count() == 0
    assert idx.search("anything", field_name="body",
                      with_hit=False).count() == 0
    idx.add_documents(
        spark.createDataFrame([(5, "gamma alpha"), (6, "gamma")], schema)
    )
    reopened = Index.load(spark, path)
    assert reopened.docs.count() == 2
    assert sorted(
        r["doc_id"]
        for r in reopened.search("gamma", field_name="body",
                                 with_hit=False).collect()
    ) == [5, 6]


def test_reopen_persists_analyzer_config(spark, tmp_path):
    """A custom stop set / token-length cap must survive reopen —
    otherwise the reloaded index tokenizes queries differently than it
    indexed documents (silent result loss, not an error)."""
    from lucene_clj_spark import create_index
    from lucene_clj_spark.analysis import Analyzer
    from lucene_clj_spark.indexer import Index

    path = str(tmp_path / "an_cfg_idx")
    an = Analyzer("standard", stop_words=frozenset({"the"}),
                  max_token_length=5)
    idx = create_index(
        spark,
        spark.createDataFrame(
            [(0, "the quick brownfox"), (1, "quick the the")],
            "doc_id long, body string",
        ),
        {"body": "text"}, id_column="doc_id", analyzer=an,
        path=path, index_type="disk", re_create=True,
    )
    reopened = Index.load(spark, path)
    got = reopened.analyzer_for("body")
    assert got.stop_words == frozenset({"the"})
    assert got.max_token_length == 5
    # stop word: indexed as nothing, and the QUERY side must agree
    assert reopened.search("the", field_name="body",
                           with_hit=False).count() == 0
    # >5-char tokens were chunked at index time ("brownfox" ->
    # "brown" + "fox"); the reopened query analyzer must chunk the
    # same way or the term is unfindable
    assert [r["doc_id"] for r in reopened.search(
        "brownfox", field_name="body", with_hit=False).collect()] == [0]


def test_write_refuses_overwriting_own_source_dir(spark, tmp_path):
    """Index.write(self.path) would have Spark overwrite the parquet
    dirs its own lazy tables read from — refuse instead of corrupting."""
    from lucene_clj_spark import create_index
    from lucene_clj_spark.errors import ValidationError

    path = str(tmp_path / "self_wr_idx")
    idx = create_index(
        spark,
        spark.createDataFrame([(0, "alpha")], "doc_id long, body string"),
        {"body": "text"}, id_column="doc_id",
        path=path, index_type="disk", re_create=True,
    )
    with pytest.raises(ValidationError, match="reading from"):
        idx.write(path)
    # a distinct path still works, and the original stays servable
    idx.write(str(tmp_path / "copy_idx"))
    assert idx.search("alpha", field_name="body").count() == 1
