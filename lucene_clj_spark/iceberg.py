"""Iceberg table-format integration — the documented "one-line swap"
shipped as a code path.

The parquet+sidecar layout (indexer.Index.write) hand-rolls what an
Iceberg catalog gives natively: snapshot-pinned reads (session.py),
atomic multi-file commits (the _append_pending journal), and
schema-travels-with-the-index (the _field_specs.json sidecar —
reference contract schema.clj:121-140). When a deployment HAS an
Iceberg catalog, ``Index.write(..., table_format="iceberg",
catalog_table="cat.db.myindex")`` writes every index table through
``DataFrameWriterV2.writeTo(...).using("iceberg")`` instead:

- ``<prefix>_postings`` partitioned by the explicit ``bucket`` column
  (same ``pmod(xxhash64(term), n_buckets)`` the parquet layout uses,
  so query-side bucket pruning — search._bucket_pruned — works
  unchanged on the catalog read), with the field specs, corpus stats,
  analyzer config and bucket count as REAL table properties.
- ``<prefix>_docs`` / ``<prefix>_terms`` / ``<prefix>_suggest`` as
  unpartitioned tables (terms and suggest are vocab-sized).

The writer objects are built lazily (no Iceberg jar needed to
construct them — pytest covers that); ``createOrReplace()`` executes
the commit and needs the runtime jar + a configured catalog, which
this container does not ship. ``have_iceberg_catalog`` gates the
execution attempt so callers fail fast with a clear message.

Deletes map 1:1 onto Iceberg v2 merge-on-read: the tombstone sidecar
(indexer.delete_documents) is exactly an equality-delete file on
``doc_id`` — a catalog deployment writes the same id list as an
Iceberg equality delete against ``<prefix>_docs``/``_postings`` (query
engines then apply the mask natively) and ``purge_deletes`` becomes
``rewrite_data_files``/``rewrite_position_delete_files`` compaction.
The engine-side semantics (immediate masking, stats stale until
compaction) are identical in both representations, so the swap stays
one line.

Offline execution-probe result (round 5, 2026-08-21): an executed
filesystem-catalog round-trip (``hadoop``-type catalog on a local
path) was attempted in this container and is NOT possible offline —
the probe searched the whole filesystem plus the Spark distribution
(``/opt/spark-4.1.2-bin-hadoop3/jars``) and the pyspark wheel for an
``iceberg-spark-runtime`` (or any iceberg/delta/hudi) jar and found
none, and the container has no network to fetch one. Configuring
``spark.sql.catalog.local=org.apache.iceberg.spark.SparkCatalog``
without the jar fails at session/catalog load with a
ClassNotFoundException, as expected. The construction-only tests
(tests/test_iceberg.py) therefore remain the executable gate:
they pin writer construction, partitioning spec, and property
payloads; ``have_iceberg_catalog`` keeps the execution attempt
fail-fast with a clear message on deployments that do ship the jar.
"""

from __future__ import annotations

import json

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from lucene_clj_spark.errors import ValidationError

#: table properties the postings table carries — the Iceberg analogue
#: of the _field_specs.json/_stats.json sidecars
PROP_FIELD_SPECS = "lucene_clj_spark.field_specs"
PROP_STATS = "lucene_clj_spark.stats"
PROP_ANALYZERS = "lucene_clj_spark.analyzers"
PROP_N_BUCKETS = "lucene_clj_spark.n_buckets"
PROP_FORMAT = "lucene_clj_spark.format"


def have_iceberg_catalog(spark: SparkSession, table: str) -> bool:
    """True iff ``table``'s catalog is configured (a
    ``spark.sql.catalog.<name>`` conf entry exists). Does not probe the
    jar — a configured catalog with a missing jar still fails at
    execution with Spark's own error, which is the right message."""
    cat = table.split(".", 1)[0] if "." in table else None
    if cat is None:
        return False
    try:
        spark.conf.get(f"spark.sql.catalog.{cat}")
        return True
    except Exception:
        return False


def _sidecar_properties(index, n_buckets: int) -> dict[str, str]:
    from lucene_clj_spark.schema import specs_to_json

    return {
        PROP_FIELD_SPECS: specs_to_json(index.specs),
        PROP_STATS: json.dumps(index.stats),
        PROP_ANALYZERS: json.dumps(
            {
                str(k): {
                    "kind": a.kind,
                    "stop_words": sorted(a.stop_words),
                    "max_token_length": a.max_token_length,
                }
                for k, a in index.analyzers.items()
            }
        ),
        PROP_N_BUCKETS: str(n_buckets),
        PROP_FORMAT: "1",
    }


def iceberg_writers(index, table_prefix: str,
                    n_buckets: int | None = None) -> dict:
    """Build (but do not execute) a DataFrameWriterV2 per index table:
    ``{"postings": w, "docs": w, "terms": w[, "suggest": w]}``.
    Separated from the execute step so the plan construction is unit-
    testable without the Iceberg runtime jar."""
    if not table_prefix or table_prefix.endswith("."):
        raise ValidationError(
            "iceberg write needs a catalog table prefix like "
            "'catalog.db.myindex'", {"catalog_table": table_prefix},
        )
    nb = n_buckets or index.n_buckets()
    props = _sidecar_properties(index, nb)

    post = index.postings
    if "bucket" in post.columns:
        post = post.drop("bucket")
    post = post.withColumn(
        "bucket", F.pmod(F.xxhash64("term"), F.lit(nb))
    )
    pw = post.writeTo(f"{table_prefix}_postings").using("iceberg")
    pw = pw.partitionedBy(F.col("bucket"))
    for k, v in props.items():
        pw = pw.tableProperty(k, v)

    writers = {
        "postings": pw,
        "docs": index.docs.writeTo(f"{table_prefix}_docs").using("iceberg"),
        "terms": index.terms.writeTo(f"{table_prefix}_terms").using(
            "iceberg"
        ),
    }
    if index.suggest is not None:
        writers["suggest"] = index.suggest.writeTo(
            f"{table_prefix}_suggest"
        ).using("iceberg")
    return writers


def _index_from_properties(spark: SparkSession, props: dict,
                           docs, postings, terms, suggest=None):
    """Rehydrate an Index from catalog-table DataFrames + the sidecar
    table properties (the inverse of _sidecar_properties). Separated
    from the catalog read so the rehydration is unit-testable without
    an Iceberg runtime."""
    from lucene_clj_spark.analysis import (
        Analyzer,
        DEFAULT_MAX_TOKEN_LENGTH,
    )
    from lucene_clj_spark.indexer import Index
    from lucene_clj_spark.schema import specs_from_json

    missing = [k for k in (PROP_FIELD_SPECS, PROP_STATS, PROP_ANALYZERS)
               if k not in props]
    if missing:
        raise ValidationError(
            "postings table lacks the engine's sidecar properties "
            f"{missing} — was it written by Index.write("
            "table_format='iceberg')?", {"missing": missing},
        )

    def _an(v: dict) -> Analyzer:
        # explicit None check (not `or default`): a persisted falsy cap
        # must round-trip, same contract as Index.load (ADVICE r03)
        cap = v.get("max_token_length")
        return Analyzer(
            v["kind"],
            stop_words=frozenset(v.get("stop_words") or ()),
            max_token_length=(
                int(cap) if cap is not None else DEFAULT_MAX_TOKEN_LENGTH
            ),
        )

    analyzers = {
        (None if k == "None" else k): _an(v)
        for k, v in json.loads(props[PROP_ANALYZERS]).items()
    }
    nb = props.get(PROP_N_BUCKETS)
    return Index(
        spark=spark,
        specs=specs_from_json(props[PROP_FIELD_SPECS]),
        analyzers=analyzers,
        docs=docs,
        postings=postings,
        terms=terms,
        stats=json.loads(props[PROP_STATS]),
        suggest=suggest,
        path=None,
        buckets=int(nb) if nb is not None else None,
    )


def load_iceberg(spark: SparkSession, table_prefix: str):
    """Reopen an index written with ``Index.write(table_format=
    "iceberg")``: reads the catalog tables and rehydrates specs /
    stats / analyzers from the postings table's properties — the
    catalog-native form of Index.load's sidecar read. Queries run
    against the catalog tables directly (snapshot isolation comes from
    the catalog instead of session.py's cache pinning)."""
    if not have_iceberg_catalog(spark, table_prefix):
        raise ValidationError(
            f"no Spark catalog configured for {table_prefix!r} "
            "(set spark.sql.catalog.<name> to an Iceberg catalog and "
            "ship the iceberg-spark-runtime jar)",
            {"catalog_table": table_prefix},
        )
    props = {
        r["key"]: r["value"]
        for r in spark.sql(
            f"SHOW TBLPROPERTIES {table_prefix}_postings"
        ).collect()
    }
    # JSON-valued properties come back as strings — exactly what
    # _index_from_properties parses
    try:
        suggest = spark.table(f"{table_prefix}_suggest")
    except Exception:
        suggest = None
    return _index_from_properties(
        spark,
        props,
        docs=spark.table(f"{table_prefix}_docs"),
        postings=spark.table(f"{table_prefix}_postings"),
        terms=spark.table(f"{table_prefix}_terms"),
        suggest=suggest,
    )


def write_iceberg(index, table_prefix: str,
                  n_buckets: int | None = None) -> None:
    """Execute the Iceberg write: one ``createOrReplace()`` per table —
    each an ATOMIC Iceberg snapshot commit (the catalog provides what
    the parquet layout's _append_pending journal approximates)."""
    if not have_iceberg_catalog(index.spark, table_prefix):
        raise ValidationError(
            f"no Spark catalog configured for {table_prefix!r} "
            "(set spark.sql.catalog.<name> to an Iceberg catalog and "
            "ship the iceberg-spark-runtime jar); use the default "
            "parquet table_format otherwise",
            {"catalog_table": table_prefix},
        )
    for w in iceberg_writers(index, table_prefix, n_buckets).values():
        w.createOrReplace()
