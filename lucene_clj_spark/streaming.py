"""Structured-Streaming ingestion — micro-batch ``index!`` over a
stream of documents.

The reference is batch-only (README.org:43-46), but its repeated
``index!``-on-an-open-writer usage pattern maps directly onto Spark's
micro-batch model: each epoch is one ``Index.add_documents`` call
(indexer.py) inside ``foreachBatch``. Exactly-once ingestion comes
from two independent layers:

1. the streaming checkpoint (source offsets are committed only after
   the batch function returns, so a crashed epoch replays), and
2. the engine's own guards — the doc_id collision check rejects a
   replayed batch that already landed, and the ``_append_pending``
   journal refuses an index left partial by a mid-append crash.

Scale notes: each micro-batch runs the same one-pass flat inversion as
the batch build (no token shuffle) and appends to the bucket-
partitioned postings layout via the shared writer; derived segments
are invalidated per append, so schedule ``build_segments`` on a cadence
(e.g. every N epochs or on a timer), exactly like Lucene's background
merges.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame

from lucene_clj_spark.errors import ValidationError


def stream_index(
    stream_df: DataFrame,
    index: Any,
    *,
    checkpoint: str,
    id_column: str = "doc_id",
    ignore_extra_columns: bool = False,
    trigger: dict | None = None,
    query_name: str = "lucene_clj_spark_ingest",
):
    """Start a streaming query that appends every micro-batch of
    ``stream_df`` (a streaming DataFrame) into ``index``.

    ``trigger``: kwargs for ``DataStreamWriter.trigger`` — defaults to
    ``{"availableNow": True}`` (drain what exists, then stop), use
    e.g. ``{"processingTime": "30 seconds"}`` for continuous ingest.
    Returns the started ``StreamingQuery``.
    """
    if not stream_df.isStreaming:
        raise ValidationError(
            "stream_index needs a streaming DataFrame (spark.readStream)",
            {},
        )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        index.add_documents(
            batch_df,
            id_column=id_column,
            ignore_extra_columns=ignore_extra_columns,
        )

    writer = (
        stream_df.writeStream.foreachBatch(sink)
        .queryName(query_name)
        .option("checkpointLocation", checkpoint)
        .trigger(**(trigger or {"availableNow": True}))
    )
    return writer.start()
