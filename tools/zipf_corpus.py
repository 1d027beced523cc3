"""Deterministic Zipf web-corpus synthesizer — the realistic-vocabulary
input for tools/bench_zipf.py (VERDICT r04 next-round item 2).

The official bench corpus has ~31 distinct words, so its per-query
records measure a degenerate term dictionary. This synthesizer emits a
corpus whose TERM DICTIONARY is web-shaped: ``vocab`` distinct terms
(default 50k) drawn rank-wise from a Zipf(s=1) law (rank = floor(V^u)
— P(rank=r) ~ 1/r), lognormal-ish document lengths (median ~50 tokens,
tail to 3,000 — the Common-Crawl text-extract shape), and an optional
near-duplicate tail: ``dup_frac`` of the docs are per-token mutations
(rate ``mut_rate``) of a uniformly-chosen base doc, which is what
MinHash/LSH pipelines see in a real crawl (verbatim x320 duplication —
the sf1 gate's shape — makes pair-finding quadratic by construction
and proves nothing).

Everything is JVM-side (xxhash64 -> uniform -> inverse-CDF transforms
inside F.transform over F.sequence): no Python in the generation plan,
no RNG state — synthesis is deterministic in (seed, n_docs, vocab,
dup_frac, mut_rate) and embarrassingly parallel, so the same corpus
reproduces on any cluster size. The schema matches the driver's
documents table: (doc_id, url, text, lang, source, n_chars).

Usage:
  python tools/zipf_corpus.py --out /tmp/zipf --n-docs 160000
  python tools/zipf_corpus.py --out /tmp/zipf1m --n-docs 1000000 \
      --dup-frac 0.3
"""

from __future__ import annotations

import argparse
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

#: modulus for the hash -> uniform(0,1) transform
_U_MOD = 1_000_000_007

LANGS = ["en", "en", "en", "en", "en", "en", "de", "de", "fr", "zh"]


def _u01(*cols):
    """xxhash64 of the argument columns folded to uniform (0, 1) —
    the deterministic RNG every draw goes through."""
    return (
        (F.pmod(F.xxhash64(*cols), F.lit(_U_MOD)) + F.lit(0.5))
        / F.lit(float(_U_MOD))
    )


def synthesize(
    spark: SparkSession,
    n_docs: int,
    vocab: int = 50_000,
    dup_frac: float = 0.0,
    mut_rate: float = 0.05,
    seed: int = 20260821,
    min_len: int = 10,
    max_len: int = 3_000,
) -> DataFrame:
    """The corpus as a DataFrame (unmaterialized — write or cache it).

    Docs [0, n_base) are originals; docs [n_base, n_docs) are
    near-duplicates: the SOURCE doc's token stream re-generated from
    the source's seed, with each token independently replaced (rate
    ``mut_rate``) by a fresh Zipf draw keyed to the duplicate's own
    id — Jaccard(orig, dup) ~ (1-mut_rate)/(1+mut_rate) over unigrams,
    lower over 5-gram shingles, the classic near-dup regime."""
    if not 0.0 <= dup_frac < 1.0:
        raise ValueError("dup_frac must be in [0, 1)")
    n_base = max(1, int(n_docs * (1.0 - dup_frac)))
    s = F.lit(int(seed))
    ids = spark.range(0, int(n_docs)).select(
        F.col("id").cast("long").alias("doc_id")
    )
    d = F.col("doc_id")
    # the doc whose token stream this row carries (itself, or its
    # near-dup source)
    eff = F.when(d < n_base, d).otherwise(
        F.pmod(F.xxhash64(s, d, F.lit("src")), F.lit(n_base))
    )
    # lognormal-ish length from the SOURCE seed (a near-dup keeps its
    # source's length): z ~ N(0,1) via a 4-uniform CLT fold
    z = (
        _u01(s, eff, F.lit("l1")) + _u01(s, eff, F.lit("l2"))
        + _u01(s, eff, F.lit("l3")) + _u01(s, eff, F.lit("l4"))
        - F.lit(2.0)
    ) * F.lit(math.sqrt(3.0))
    dl = F.greatest(
        F.lit(min_len),
        F.least(
            F.lit(max_len),
            F.floor(F.exp(F.lit(3.9) + F.lit(0.8) * z)).cast("int"),
        ),
    )

    def zipf_term(key_doc, j, salt):
        # rank = floor(V^u) in [1, V]: P(rank = r) ~ 1/(r ln V)
        rank = F.floor(
            F.pow(F.lit(float(vocab)), _u01(s, key_doc, j, F.lit(salt)))
        ).cast("long")
        return F.concat(F.lit("t"), rank.cast("string"))

    def token_at(j):
        base = zipf_term(eff, j, "tok")
        if dup_frac <= 0.0:
            return base
        mutated = zipf_term(d, j, "mut")
        return F.when(
            (d >= n_base)
            & (_u01(s, d, j, F.lit("mr")) < F.lit(float(mut_rate))),
            mutated,
        ).otherwise(base)

    toks = F.transform(F.sequence(F.lit(0), dl - F.lit(1)), token_at)
    text = F.concat_ws(" ", toks)
    lang = F.element_at(
        F.array(*[F.lit(x) for x in LANGS]),
        F.pmod(F.xxhash64(s, d, F.lit("lang")), F.lit(len(LANGS)))
        .cast("int") + F.lit(1),
    )
    host = F.concat(
        F.lit("host"),
        F.pmod(F.xxhash64(s, eff, F.lit("host")), F.lit(997))
        .cast("string"),
    )
    url = F.concat(
        F.lit("https://www."), host, F.lit(".example.com/doc/"),
        d.cast("string"),
    )
    return ids.select(
        "doc_id",
        url.alias("url"),
        text.alias("text"),
        lang.alias("lang"),
        F.lit("zipf").alias("source"),
        F.length(text).cast("long").alias("n_chars"),
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--n-docs", type=int, default=160_000)
    ap.add_argument("--vocab", type=int, default=50_000)
    ap.add_argument("--dup-frac", type=float, default=0.0)
    ap.add_argument("--mut-rate", type=float, default=0.05)
    ap.add_argument("--seed", type=int, default=20260821)
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    args = ap.parse_args()
    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .config("spark.sql.shuffle.partitions", str(args.cpus))
        .config("spark.driver.memory", "32g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    df = synthesize(spark, args.n_docs, args.vocab, args.dup_frac,
                    args.mut_rate, args.seed)
    (
        df.repartition(max(2, args.cpus * 2))
        .write.mode("overwrite")
        .parquet(args.out)
    )
    n = spark.read.parquet(args.out).count()
    print(f"wrote {n} docs to {args.out}")


if __name__ == "__main__":
    main()
