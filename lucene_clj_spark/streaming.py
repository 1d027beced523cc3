"""Structured-Streaming ingestion — micro-batch ``index!`` over a
stream of documents.

The reference is batch-only (README.org:43-46), but its repeated
``index!``-on-an-open-writer usage pattern maps directly onto Spark's
micro-batch model: each epoch is one ``Index.add_documents`` call
(indexer.py) inside ``foreachBatch``.

Delivery semantics — no-duplicates, replay-idempotent:

1. the streaming checkpoint commits source offsets only AFTER the
   batch function returns, so a crashed epoch replays;
2. a replayed batch whose doc_ids are ALL already present is detected
   and skipped (the crash happened between sink completion and
   checkpoint commit — the batch is fully applied, re-applying would
   duplicate), so restarts make progress instead of tripping the
   collision guard forever;
3. a batch whose doc_ids are only PARTIALLY present is a genuine id
   collision with pre-existing documents and fails the query (the
   engine keys on doc_id; Lucene would happily duplicate);
4. a crash in the MIDDLE of an append leaves ``_append_pending.json``
   on the index — ``Index.load`` and further appends refuse until the
   index is rebuilt (re_create) or restored. Recovery is manual by
   design: the parquet layout has no transactional catalog (an
   Iceberg-backed deployment gets atomic appends and loses this case).

Scale notes: each micro-batch runs the same one-pass flat inversion as
the batch build (no token shuffle) and appends to the bucket-
partitioned postings layout via the shared writer; if compressed
segments are built, each append encodes the batch into DELTA segment
files per bucket (segments.append_segments) — Lucene's flush-then-merge
model — so WAND queries see new docs without a rebuild; schedule
``segments.merge_segments`` on a cadence, exactly like Lucene's
background merges.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lucene_clj_spark.errors import ValidationError


def ingest_batch(
    index: Any,
    batch_df: DataFrame,
    *,
    id_column: str = "doc_id",
    ignore_extra_columns: bool = False,
    op_column: str | None = None,
) -> bool:
    """Apply one micro-batch to ``index`` idempotently. Returns True if
    the batch was appended, False if it was recognized as a fully
    applied replay and skipped. Raises on partial overlap (genuine
    doc_id collision) AND on a full-overlap batch whose CONTENT differs
    from what is stored — same ids with different documents is a
    conflicting re-ingest, not a crash replay, and silently dropping it
    would lose data.

    ``op_column``: CDC-lite mode. Rows whose ``op_column`` value is
    ``'delete'`` tombstone their doc_id (indexer.delete_documents — a
    sidecar write, naturally replay-idempotent: re-deleting is a set
    union no-op); every other row is an add (the op column is dropped
    before indexing). Deletes apply BEFORE adds within a batch, so a
    recrawl batch can retire url A and introduce url B in one epoch.
    Re-adding an id the SAME batch deleted is refused by the add-side
    guard — per the engine's delete contract, a tombstoned id needs
    ``purge_deletes`` before re-use (use batch update_documents for
    in-place replacement; streaming upsert would hide a compaction
    inside every epoch)."""
    if op_column is not None:
        if op_column not in batch_df.columns:
            raise ValidationError(
                f"op_column {op_column!r} not in the batch",
                {"columns": batch_df.columns},
            )
        # fail LOUDLY on unrecognized op values: a Debezium-style feed
        # using 'd'/'u'/'DELETE' must not have its delete markers
        # silently indexed as documents
        bad_ops = [
            r[0]
            for r in batch_df.select(op_column)
            .distinct()
            .collect()
            if r[0] is not None and r[0] not in ("add", "delete")
        ]
        if bad_ops:
            raise ValidationError(
                f"unrecognized {op_column!r} values {sorted(bad_ops)} "
                "— expected 'add', 'delete', or NULL (= add); map "
                "your CDC feed's op codes before ingesting",
                {"ops": sorted(bad_ops)},
            )
        del_ids = [
            int(r[0])
            for r in batch_df.filter(F.col(op_column) == "delete")
            .select(F.col(id_column).cast("long"))
            .distinct()
            .collect()
        ]
        if del_ids:
            index.delete_documents(del_ids)
        batch_df = batch_df.filter(
            (F.col(op_column) != "delete")
            | F.col(op_column).isNull()
        ).drop(op_column)
        if batch_df.isEmpty():
            return bool(del_ids)
    ids = batch_df.select(
        F.col(id_column).cast("long").alias("doc_id")
    ).distinct()
    counts = ids.join(
        index.docs.select("doc_id"), "doc_id", "left_semi"
    ).count(), ids.count()
    present, total = counts
    if total and present == total:
        # verify it really is a replay: row-for-row content equality on
        # the shared columns (md5 of the canonical JSON row), joined on
        # doc_id — one bounded job on the (rare) suspected-replay path
        shared = sorted(
            (set(batch_df.columns) - {id_column})
            & set(index.docs.columns)
        )
        if not shared:
            return False  # ids-only batch: nothing to compare

        def _digest(df, idc):
            return df.select(
                F.col(idc).cast("long").alias("doc_id"),
                F.md5(F.to_json(F.struct(*shared))).alias("__h"),
            )

        mismatched = (
            _digest(batch_df, id_column)
            .join(
                _digest(index.docs, "doc_id").withColumnRenamed(
                    "__h", "__h_stored"
                ),
                "doc_id",
            )
            .filter(F.col("__h") != F.col("__h_stored"))
            .count()
        )
        if mismatched:
            raise ValidationError(
                "streaming batch re-uses ALL existing doc_ids but "
                f"{mismatched}/{total} rows carry DIFFERENT content — "
                "a conflicting re-ingest, not a crash replay; refusing "
                "to drop it silently",
                {"mismatched": mismatched, "total": total},
            )
        return False  # fully applied replay — skip (idempotent)
    if present:
        raise ValidationError(
            "streaming batch doc_ids partially collide with existing "
            f"documents ({present}/{total} present) — not a replay; "
            "refusing to double-apply",
            {"present": present, "total": total},
        )
    index.add_documents(
        batch_df,
        id_column=id_column,
        ignore_extra_columns=ignore_extra_columns,
    )
    return True


def stream_index(
    stream_df: DataFrame,
    index: Any,
    *,
    checkpoint: str,
    id_column: str = "doc_id",
    ignore_extra_columns: bool = False,
    trigger: dict | None = None,
    query_name: str = "lucene_clj_spark_ingest",
    merge_every_deltas: int | None = None,
    op_column: str | None = None,
):
    """Start a streaming query that appends every micro-batch of
    ``stream_df`` (a streaming DataFrame) into ``index``.

    ``op_column``: enable CDC-lite delete rows — see ``ingest_batch``
    (rows marked ``'delete'`` tombstone their id, the rest are adds;
    schedule ``Index.purge_deletes`` on a cadence alongside
    ``merge_every_deltas``, the two compactions of this engine).

    ``trigger``: kwargs for ``DataStreamWriter.trigger`` — defaults to
    ``{"availableNow": True}`` (drain what exists, then stop), use
    e.g. ``{"processingTime": "30 seconds"}`` for continuous ingest.
    Returns the started ``StreamingQuery``.

    ``merge_every_deltas``: if set and the index has built segments,
    run ``segments.maybe_merge`` after each applied batch — compacting
    base + delta segment files once that many appends accumulate
    (Lucene's background-merge cadence). The merge commits by an
    atomic generation-pointer swap and never renames or deletes the
    live generation (one grace generation is kept for in-flight
    readers), so a crash at ANY point leaves a fully servable segment
    set — see segments.merge_segments.
    """
    if not stream_df.isStreaming:
        raise ValidationError(
            "stream_index needs a streaming DataFrame (spark.readStream)",
            {},
        )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        applied = ingest_batch(
            index, batch_df,
            id_column=id_column,
            ignore_extra_columns=ignore_extra_columns,
            op_column=op_column,
        )
        if applied and merge_every_deltas:
            from lucene_clj_spark.segments import maybe_merge

            maybe_merge(index, max_deltas=merge_every_deltas)

    writer = (
        stream_df.writeStream.foreachBatch(sink)
        .queryName(query_name)
        .option("checkpointLocation", checkpoint)
        .trigger(**(trigger or {"availableNow": True}))
    )
    return writer.start()
