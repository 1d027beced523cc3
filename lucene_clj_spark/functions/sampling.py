"""Deterministic sampling + ordering for training-data pipelines.

The operations a mixture builder runs at 10^12-doc scale, made
DETERMINISTIC (same rows selected on every engine, every run, every
partition layout) by keying decisions on ``portable_hash`` (first 32
md5 bits — text.py) instead of RNG state:

- ``stratified_sample``: per-stratum keep-fractions (the training-mix
  knob: 80% of common-crawl, 40% of wiki, ...). A row survives iff
  ``hash(key, seed) % 2^20 < fraction * 2^20`` — one shuffle-free
  scan, no sampleBy RNG (Spark's sampleBy draws per-partition RNG
  streams, so results change with the partition layout; this doesn't).
- ``deterministic_shuffle``: a reproducible global "random" order —
  ``shuffle_key = hash(key, seed)``, range-partitioned + sorted. The
  hash is uniform, so ranges balance without sampling skew; a
  different ``seed`` gives an independent order (epoch reshuffling).

Both are expressible in ANSI SQL over md5 (the DuckDB oracle twins run
the SAME arithmetic), and both survive 100x scale-up: sampling is a
pushed filter on a computed column (no shuffle, no state), shuffling
is one range exchange on a uniform key (the balanced version of the
sort every training-data writer pays anyway).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from lucene_clj_spark.errors import ValidationError
from lucene_clj_spark.functions.text import portable_hash

#: sampling-decision resolution: fractions quantize to 1/2^20
#: (~1e-6); documented so the oracle twin uses the same constant
SAMPLE_BUCKETS = 1 << 20


def _decision_hash(key: Column, seed: int) -> Column:
    return portable_hash(
        F.concat_ws("\x1f", key.cast("string"), F.lit(str(seed)))
    ) % F.lit(SAMPLE_BUCKETS)


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    *,
    key_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Keep each stratum at its fraction, deterministically. Strata
    absent from ``fractions`` are DROPPED (sampleBy semantics — an
    explicit 1.0 keeps a stratum whole)."""
    if not fractions:
        raise ValidationError("stratified_sample needs fractions", {})
    for k, v in fractions.items():
        if not (0.0 <= float(v) <= 1.0):
            raise ValidationError(
                f"fraction for stratum {k!r} must be in [0, 1]",
                {"stratum": k, "fraction": v},
            )
    thresh = F.create_map(
        *[
            x
            for k, v in sorted(fractions.items())
            for x in (F.lit(k),
                      F.lit(int(round(float(v) * SAMPLE_BUCKETS))))
        ]
    )[F.col(strata_col)]
    return df.filter(
        thresh.isNotNull()
        & (_decision_hash(F.col(key_col), seed) < thresh)
    )


def deterministic_shuffle(
    df: DataFrame,
    *,
    key_col: str = "doc_id",
    seed: int = 0,
    n_partitions: int | None = None,
    key_out: str = "shuffle_key",
) -> DataFrame:
    """A reproducible pseudo-random global order: rows carry
    ``key_out = portable_hash(key, seed)`` and come back
    range-partitioned + sorted on it. Same seed -> bit-identical
    order everywhere; new seed -> independent epoch order."""
    keyed = df.withColumn(
        key_out,
        portable_hash(
            F.concat_ws("\x1f", F.col(key_col).cast("string"),
                        F.lit(str(seed)))
        ),
    )
    n = n_partitions or df.sparkSession.sparkContext.defaultParallelism
    return (
        keyed.repartitionByRange(n, key_out, key_col)
        .sortWithinPartitions(key_out, key_col)
    )


def sample_sql_predicate(strata_expr: str, key_expr: str,
                         fractions: dict[str, float],
                         seed: int = 0) -> str:
    """The DuckDB/ANSI twin of stratified_sample's keep-predicate —
    used by the oracle entries and handy for pushdown into external
    engines."""
    from lucene_clj_spark.functions.text import portable_hash_sql

    h = portable_hash_sql(
        f"concat_ws(chr(31), CAST({key_expr} AS VARCHAR), '{seed}')"
    )
    cases = " ".join(
        f"WHEN '{k}' THEN {int(round(float(v) * SAMPLE_BUCKETS))}"
        for k, v in sorted(fractions.items())
    )
    return (
        f"(({h}) % {SAMPLE_BUCKETS}) < "
        f"(CASE {strata_expr} {cases} ELSE -1 END)"
    )
