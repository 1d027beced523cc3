"""Structured-Streaming ingestion: micro-batch add_documents through
foreachBatch, equivalence with the one-shot batch build, and restart
(checkpoint) behavior."""

import pytest

from lucene_clj_spark import create_index
from lucene_clj_spark.errors import ValidationError
from lucene_clj_spark.streaming import stream_index

SCHEMA = "doc_id long, body string"


def _write_batch(spark, path, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(path)


@pytest.fixture()
def stream_dirs(tmp_path):
    return str(tmp_path / "in"), str(tmp_path / "ckpt")


def test_stream_ingest_matches_batch_build(spark, stream_dirs):
    src, ckpt = stream_dirs
    a = [(0, "alpha beta gamma"), (1, "beta gamma delta")]
    b = [(2, "alpha alpha epsilon"), (3, "beta zeta")]
    _write_batch(spark, src, a)
    _write_batch(spark, src, b)

    idx = create_index(
        spark, spark.createDataFrame([], SCHEMA), {"body": "text"},
        id_column="doc_id",
    )
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    q = stream_index(stream, idx, checkpoint=ckpt)
    q.awaitTermination(120)

    ref = create_index(
        spark, spark.createDataFrame(a + b, SCHEMA), {"body": "text"},
        id_column="doc_id",
    )
    assert idx.stats == ref.stats
    assert sorted(map(tuple, idx.terms.collect())) == sorted(
        map(tuple, ref.terms.collect())
    )
    got = idx.search("beta", field_name="body", with_hit=False).collect()
    want = ref.search("beta", field_name="body", with_hit=False).collect()
    assert [(r["doc_id"], round(r["score"], 12)) for r in got] == [
        (r["doc_id"], round(r["score"], 12)) for r in want
    ]


def test_stream_restart_does_not_duplicate(spark, stream_dirs):
    src, ckpt = stream_dirs
    _write_batch(spark, src, [(0, "alpha beta")])
    idx = create_index(
        spark, spark.createDataFrame([], SCHEMA), {"body": "text"},
        id_column="doc_id",
    )
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    stream_index(stream, idx, checkpoint=ckpt).awaitTermination(120)
    assert idx.stats["body"]["N"] == 1

    # restart on the SAME checkpoint: the already-committed file must
    # not replay; a genuinely new file must land
    _write_batch(spark, src, [(1, "beta gamma")])
    stream2 = spark.readStream.schema(SCHEMA).parquet(src)
    stream_index(stream2, idx, checkpoint=ckpt).awaitTermination(120)
    assert idx.stats["body"]["N"] == 2
    assert idx.search("beta", field_name="body",
                      with_hit=False).count() == 2


def test_ingest_batch_replay_is_idempotent(spark):
    """A batch replayed after a crash between sink completion and
    checkpoint commit must be SKIPPED (all its doc_ids already landed),
    not fail the query forever; a partial overlap is a genuine
    collision and still fails (ADVICE r02)."""
    from lucene_clj_spark.streaming import ingest_batch

    idx = create_index(
        spark, spark.createDataFrame([], SCHEMA), {"body": "text"},
        id_column="doc_id",
    )
    batch = spark.createDataFrame([(0, "alpha beta"), (1, "beta")], SCHEMA)
    assert ingest_batch(idx, batch) is True
    assert idx.stats["body"]["N"] == 2
    # full replay of the same batch: skipped, index unchanged
    assert ingest_batch(idx, batch) is False
    assert idx.stats["body"]["N"] == 2
    assert idx.search("beta", field_name="body",
                      with_hit=False).count() == 2
    # partial overlap: genuine collision
    bad = spark.createDataFrame([(1, "beta"), (9, "gamma")], SCHEMA)
    with pytest.raises(ValidationError, match="partially collide"):
        ingest_batch(idx, bad)


def test_stream_index_rejects_batch_df(spark):
    idx = create_index(
        spark, spark.createDataFrame([(0, "alpha")], SCHEMA),
        {"body": "text"}, id_column="doc_id",
    )
    with pytest.raises(ValidationError):
        stream_index(
            spark.createDataFrame([], SCHEMA), idx, checkpoint="/tmp/x"
        )


def test_ingest_replay_with_different_content_refuses(spark):
    """Same doc_ids, different content is a conflicting re-ingest, not
    a crash replay — it must raise, never be silently dropped
    (code-review r03)."""
    import pytest

    from lucene_clj_spark import create_index
    from lucene_clj_spark.errors import ValidationError
    from lucene_clj_spark.streaming import ingest_batch

    schema = "doc_id long, body string"
    idx = create_index(
        spark, spark.createDataFrame([(0, "alpha"), (1, "beta")], schema),
        {"body": "text"}, id_column="doc_id",
    )
    # true replay: identical rows -> skipped, no error
    assert ingest_batch(
        idx, spark.createDataFrame([(0, "alpha"), (1, "beta")], schema)
    ) is False
    # conflicting re-ingest: same ids, new content -> refused
    with pytest.raises(ValidationError, match="DIFFERENT content"):
        ingest_batch(
            idx,
            spark.createDataFrame([(0, "alpha"), (1, "CHANGED")], schema),
        )


def test_stream_merge_policy_compacts_deltas(spark, tmp_path):
    """Continuous ingest with merge_every_deltas: delta segment files
    accumulate per batch and are compacted by the merge policy, with
    kernel answers staying identical to a from-scratch build."""
    import os

    from lucene_clj_spark import create_index
    from lucene_clj_spark.segments import build_segments, n_deltas
    from lucene_clj_spark.streaming import stream_index
    from lucene_clj_spark.wand import wand_topk

    src_dir = str(tmp_path / "src")
    path = str(tmp_path / "sidx")
    schema = "doc_id long, body string"
    spark.createDataFrame(
        [(0, "alpha beta"), (1, "beta gamma")], schema
    ).write.mode("overwrite").parquet(src_dir)
    idx = create_index(
        spark, spark.read.parquet(src_dir).limit(0), {"body": "text"},
        id_column="doc_id", path=path, index_type="disk", re_create=True,
    )
    build_segments(idx, n_buckets=2, chunk_span=32, block_size=8)
    # stream with maxFilesPerTrigger=1 -> one batch per file; policy
    # merges once 2 deltas accumulate
    spark.createDataFrame([(2, "gamma delta"), (3, "delta alpha")], schema
                          ).write.mode("append").parquet(src_dir)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src_dir)
    )
    q = stream_index(
        stream, idx, checkpoint=str(tmp_path / "ckpt"),
        merge_every_deltas=2,
    )
    q.awaitTermination(120)
    assert n_deltas(path) < 2  # policy compacted
    got = [(r["doc_id"], r["score"])
           for r in wand_topk(idx, "body", ["alpha", "gamma"],
                              k=10).collect()]
    want = [(r["doc_id"], r["score"])
            for r in idx.search({"body": {"alpha", "gamma"}},
                                with_hit=False,
                                strategy="dataframe").collect()]
    assert got == want and len(got) == 4


# --- CDC-lite delete rows (op_column) -----------------------------------

OP_SCHEMA = "doc_id long, body string, op string"


def _write_op_batch(spark, path, rows):
    spark.createDataFrame(rows, OP_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(path)


def test_stream_delete_rows_tombstone(spark, tmp_path):
    src, ckpt = str(tmp_path / "in"), str(tmp_path / "ckpt")
    # epoch 1: three adds; epoch 2: retire doc 0, introduce doc 3.
    # maxFilesPerTrigger=1 pins one file per epoch — availableNow
    # would otherwise fold both files into ONE batch, making this a
    # same-epoch delete+re-add of doc 0 (an upsert, refused by design
    # — covered below)
    _write_op_batch(spark, src, [
        (0, "alpha beta", "add"),
        (1, "beta gamma", "add"),
        (2, "gamma delta", None),   # null op = add
    ])
    import time as _time

    _time.sleep(1.05)  # distinct mtimes: file-source epoch order
    _write_op_batch(spark, src, [
        (0, None, "delete"),
        (3, "beta epsilon", "add"),
    ])
    idx = create_index(
        spark, spark.createDataFrame([], SCHEMA), {"body": "text"},
        id_column="doc_id",
    )
    stream = (
        spark.readStream.schema(OP_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = stream_index(stream, idx, checkpoint=ckpt, op_column="op")
    q.awaitTermination(120)

    assert idx.tombstones == frozenset({0})
    got = {r["doc_id"] for r in idx.search(
        "beta", field_name="body", with_hit=False).collect()}
    assert got == {1, 3}
    # stats stay stale until purge (delete contract); after purge the
    # index equals a batch build over the live rows
    idx.purge_deletes()
    ref = create_index(
        spark,
        spark.createDataFrame(
            [(1, "beta gamma"), (2, "gamma delta"),
             (3, "beta epsilon")], SCHEMA),
        {"body": "text"}, id_column="doc_id",
    )
    a = [(r["doc_id"], round(r["score"], 12)) for r in idx.search(
        "beta", field_name="body", with_hit=False).collect()]
    b = [(r["doc_id"], round(r["score"], 12)) for r in ref.search(
        "beta", field_name="body", with_hit=False).collect()]
    assert a == b


def test_stream_delete_only_batch_and_replay(spark, tmp_path):
    from lucene_clj_spark.streaming import ingest_batch

    idx = create_index(
        spark,
        spark.createDataFrame(
            [(0, "alpha beta"), (1, "beta gamma")], SCHEMA),
        {"body": "text"}, id_column="doc_id",
    )
    batch = spark.createDataFrame(
        [(0, None, "delete")], OP_SCHEMA)
    assert ingest_batch(idx, batch, op_column="op") is True
    assert idx.tombstones == frozenset({0})
    # replay: re-deleting is a set-union no-op, adds side is empty
    assert ingest_batch(idx, batch, op_column="op") is True
    assert idx.tombstones == frozenset({0})
    # missing op column fails loudly
    with pytest.raises(ValidationError, match="op_column"):
        ingest_batch(
            idx, spark.createDataFrame([(9, "x")], SCHEMA),
            op_column="op",
        )
    # unrecognized op codes fail loudly (a Debezium-style 'd' marker
    # must not be silently indexed as a document)
    with pytest.raises(ValidationError, match="unrecognized"):
        ingest_batch(
            idx,
            spark.createDataFrame([(9, "x", "d")], OP_SCHEMA),
            op_column="op",
        )


def test_stream_same_epoch_upsert_refused(spark):
    # delete + re-add of the same id in ONE batch is an upsert —
    # refused (a tombstoned id needs purge_deletes before re-use),
    # even when the id never existed before the batch
    from lucene_clj_spark.streaming import ingest_batch

    idx = create_index(
        spark,
        spark.createDataFrame([(5, "old text")], SCHEMA),
        {"body": "text"}, id_column="doc_id",
    )
    batch = spark.createDataFrame(
        [(5, None, "delete"), (5, "new text", "add")], OP_SCHEMA)
    with pytest.raises(ValidationError, match="TOMBSTONED"):
        ingest_batch(idx, batch, op_column="op")
    # never-existed variant: the guard still refuses (rows appended
    # after the filtered views were built would leak past the mask)
    batch2 = spark.createDataFrame(
        [(9, None, "delete"), (9, "fresh", "add")], OP_SCHEMA)
    with pytest.raises(ValidationError, match="TOMBSTONED"):
        ingest_batch(idx, batch2, op_column="op")
